"""Minimal protobuf wire-format primitives for the Jelly RDF schema.

The sandbox has no ``protobuf`` runtime, so this module hand-rolls the
subset of the proto3 wire format that the Jelly protocol uses: varints,
length-delimited fields, and a tolerant field walker for decoding.

Schema source of truth: the public Jelly protocol
(``eu.ostrzyciel.jelly.core.proto.v1``), as carried by the reference's
generated descriptor (/root/reference/pyjelly/jelly/rdf_pb2.py:27).
Field numbers were extracted from that descriptor and are mirrored in
:mod:`pyjelly_spark.jelly.constants`.

Encoding here is deterministic by construction: fields are emitted in
ascending tag order, matching protobuf's deterministic serialization
(the reference relies on ``deterministic=True``,
/root/reference/pyjelly/serialize/ioutils.py:13).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple


def _uvarint_raw(value: int) -> bytes:
    if value < 0x80:
        return bytes((value,))
    out = bytearray()
    while value > 0x7F:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


# Precomputed encodings for the values that dominate real streams (tags,
# lookup ids, frame-row lengths): ~35% of encoder CPU went into re-encoding
# these same small varints (profile: wire.uvarint 900k calls / 30k stmts).
_UV_CACHE = tuple(_uvarint_raw(v) for v in range(1 << 14))


def uvarint(value: int) -> bytes:
    """Encode a non-negative int as a base-128 varint."""
    if 0 <= value < 1 << 14:
        return _UV_CACHE[value]
    if value < 0:
        raise ValueError(f"cannot varint-encode negative value {value}")
    return _uvarint_raw(value)


def read_uvarint(buf: bytes, pos: int) -> Tuple[int, int]:
    """Decode a varint from ``buf`` at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def tag_bytes(field_number: int, wire_type: int) -> bytes:
    return uvarint((field_number << 3) | wire_type)


def varint_field(field_number: int, value: int) -> bytes:
    """A varint-typed field; caller decides whether 0 is emitted."""
    tag = field_number << 3
    head = _UV_CACHE[tag] if tag < 1 << 14 else _uvarint_raw(tag)
    return head + uvarint(value)


def len_field(field_number: int, payload: bytes) -> bytes:
    """A length-delimited field (string / bytes / sub-message)."""
    tag = (field_number << 3) | 2
    head = _UV_CACHE[tag] if tag < 1 << 14 else _uvarint_raw(tag)
    n = len(payload)
    if n < 1 << 14:
        return head + _UV_CACHE[n] + payload
    return head + _uvarint_raw(n) + payload


def str_field(field_number: int, value: str) -> bytes:
    return len_field(field_number, value.encode("utf-8"))


def iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Walk a serialized message, yielding (field_number, wire_type, value).

    value is an int for varints and a memoryview-compatible bytes slice for
    length-delimited fields. Fixed32/64 are surfaced as raw bytes (unused by
    the Jelly schema but tolerated for forward compatibility).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_uvarint(buf, pos)
        field_number = tag >> 3
        wire_type = tag & 7
        if wire_type == 0:
            value, pos = read_uvarint(buf, pos)
        elif wire_type == 2:
            length, pos = read_uvarint(buf, pos)
            value = buf[pos : pos + length]
            if len(value) != length:
                raise ValueError("truncated length-delimited field")
            pos += length
        elif wire_type == 5:
            value = buf[pos : pos + 4]
            pos += 4
        elif wire_type == 1:
            value = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        yield field_number, wire_type, value


def fields_to_list(buf: bytes) -> List[Tuple[int, int, object]]:
    return list(iter_fields(buf))
