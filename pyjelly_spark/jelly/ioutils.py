"""File-level framing: delimited sniffing, frame iteration, read/write.

Replicates the reference's 3-byte delimitedness truth table
(/root/reference/pyjelly/parse/ioutils.py:14-54) and varint
length-prefixed frame walking (parse/ioutils.py:57-59).
"""

from __future__ import annotations

from typing import IO, Dict, Iterator, List, Optional, Tuple

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.decoder import (
    StreamDecoder,
    parse_options_row,
    split_frame,
)
from pyjelly_spark.jelly.encoder import delimit
from pyjelly_spark.jelly.wire import iter_fields, read_uvarint


def looks_delimited(head: bytes) -> bool:
    """Sniff delimited vs single-frame from the first 3 bytes.

    0x0A is both "varint 10" and the tag of RdfStreamFrame.rows — the
    truth table disambiguates (parse/ioutils.py:14-54):

      byte0 != 0A                    -> delimited
      0A, byte1 != 0A                -> non-delimited
      0A, 0A, byte2 != 0A            -> delimited (first frame is 10 bytes)
      0A, 0A, 0A                     -> non-delimited
    """
    if len(head) < 3:
        return False
    return head[0] != 0x0A or (head[1] == 0x0A and head[2] != 0x0A)


def iter_delimited_frames(data: bytes) -> Iterator[bytes]:
    """Walk varint-length-prefixed frames in a byte buffer."""
    pos = 0
    end = len(data)
    while pos < end:
        length, pos = read_uvarint(data, pos)
        frame = data[pos : pos + length]
        if len(frame) != length:
            raise c.JellyError("truncated frame")
        pos += length
        yield frame


def frames_from_bytes(data: bytes) -> Iterator[bytes]:
    """All frames of a Jelly byte buffer, delimited or not."""
    if looks_delimited(data[:3]):
        yield from iter_delimited_frames(data)
    elif data:
        yield data


def read_stream_options(data: bytes) -> c.StreamOptions:
    """Extract the options row from the first non-empty frame."""
    delimited = looks_delimited(data[:3])
    for frame in frames_from_bytes(data):
        rows, _meta = split_frame(frame)
        if rows:
            fields = list(iter_fields(rows[0]))
            if fields and fields[0][0] == c.ROW_OPTIONS:
                return parse_options_row(bytes(fields[0][2]), delimited=delimited)
            raise c.JellyError("first row of the stream is not an options row")
    raise c.JellyError("no non-empty frames found in the stream")


def decode_file(path: str) -> Iterator[tuple]:
    """Decode a (possibly gzipped) .jelly file into flat statement
    events."""
    data = read_file_bytes(path)
    from pyjelly_spark.jelly.decoder import decode_flat

    yield from decode_flat(frames_from_bytes(data))


def decode_file_frames(
    path: str,
) -> Iterator[Tuple[List[tuple], Dict[str, bytes]]]:
    """Decode a .jelly file frame-by-frame: (events, frame metadata)."""
    with open(path, "rb") as handle:
        data = handle.read()
    decoder = StreamDecoder()
    for frame in frames_from_bytes(data):
        rows, metadata = split_frame(frame)
        events = [e for e in (decoder.decode_row(r) for r in rows) if e is not None]
        yield events, metadata


def write_frames(
    frames: Iterator[bytes],
    out: IO[bytes],
    *,
    delimited: bool = True,
) -> int:
    """Write frames to a binary stream; returns bytes written."""
    written = 0
    if delimited:
        for frame in frames:
            chunk = delimit(frame)
            out.write(chunk)
            written += len(chunk)
    else:
        collected = list(frames)
        if len(collected) > 1:
            raise c.JellyError("non-delimited output must be a single frame")
        for frame in collected:
            out.write(frame)
            written += len(frame)
    return written


def sniff_file(path: str, head_bytes: Optional[bytes] = None) -> bool:
    """Delimitedness of a file on disk (reads only 3 bytes)."""
    if head_bytes is None:
        with open(path, "rb") as handle:
            head_bytes = handle.read(3)
    return looks_delimited(head_bytes)


def buffered_options(inp: IO[bytes]) -> Tuple[c.StreamOptions, bytes]:
    """Non-seekable-safe: buffer the input fully, return (options, data).

    Mirrors the reference's BufferedReader peek fallback for network
    streams (parse/ioutils.py:81-89), simplified for batch use: batch
    decoding always consumes the whole stream, so one full read serves
    both the sniff and the decode regardless of seekability.
    """
    data = inp.read()
    return read_stream_options(data), data


def read_file_bytes(path: str) -> bytes:
    """Read a (possibly gzip-compressed) jelly stream's bytes.

    Gzip is detected by magic (1f 8b), not extension, so `.jelly.gz`
    and mislabeled files both work — the reference has no compressed-
    stream support; this matches how its rdflib plugin would receive
    already-decompressed input while letting our CLI/tools take .gz
    directly.
    """
    with open(path, "rb") as handle:
        head = handle.read(2)
        handle.seek(0)
        if head == b"\x1f\x8b":
            import gzip

            with gzip.open(handle) as gz:
                return gz.read()
        return handle.read()


def build_frame_index(path: str) -> List[Tuple[int, int, int]]:
    """Byte-offset index of a delimited .jelly file: one
    (byte_offset, byte_length, n_rows) triple per frame, in order.

    The Jelly framing is length-prefixed, so the index is built with a
    single sequential varint walk — no row decoding — and enables
    random access (``read_frame_at``) into streams too large to decode
    front-to-back: the seekable-source pattern (HTTP range requests,
    object-store reads) the delimited format exists to support.
    """
    with open(path, "rb") as handle:
        data = handle.read()
    if not looks_delimited(data[:3]):
        raise c.JellyError("frame index requires a delimited stream")
    from pyjelly_spark.jelly.decoder import split_frame

    index: List[Tuple[int, int, int]] = []
    pos = 0
    n = len(data)
    while pos < n:
        length, body_start = read_uvarint(data, pos)
        body_end = body_start + length
        if body_end > n:
            raise c.JellyError("truncated frame at end of stream")
        rows, _meta = split_frame(data[body_start:body_end])
        index.append((pos, body_end - pos, len(rows)))
        pos = body_end
    return index


def _frame_head_is_options(frame) -> bool:
    """True iff the frame's FIRST row is an options row.

    Pure varint-header walk: parses field headers until the first rows
    field, then only the first row's first tag — no term decoding, no
    lookup state. Used by :func:`scan_stream_segments` as the
    concatenation-boundary probe: every self-contained stream OPENS
    with an options row (the reference's decoder enforces
    options-first, parse/decode.py; our StreamDecoder raises on any
    other shape), so in a byte-concatenation of streams each member
    starts at an options-headed frame.
    """
    for num, _wt, val in iter_fields(frame):
        if num != c.FRAME_ROWS:
            continue
        for rnum, _rwt, _rval in iter_fields(bytes(val)):
            return rnum == c.ROW_OPTIONS
        return False
    return False


def scan_stream_segments(data: bytes) -> List[Tuple[int, int, int]]:
    """Split points of a (possibly concatenated) delimited Jelly buffer:
    one ``(byte_start, byte_end, first_frame_idx)`` per independent
    stream segment.

    A segment starts at byte 0 and at every frame whose first row is an
    options row (see :func:`_frame_head_is_options`). CONTRACT — this
    is concatenation semantics, and it is opt-in for a reason: the
    Jelly protocol also permits a single continuing stream to RE-EMIT
    its options row mid-stream (the reference validates repeated
    options against stream state and keeps its lookup tables,
    /root/reference/pyjelly/parse/decode.py:259-267). The two shapes
    are byte-indistinguishable, so the caller declares which one the
    file is. For genuine concatenations (``cat a.jelly b.jelly`` — the
    append-to-one-object pattern) segment decoding with a FRESH decoder
    per segment is the ONLY correct read: a single sequential decoder
    carries stream A's lookup tables and auto-increment counters into
    stream B and silently resolves B's references against them (every
    Jelly implementation, the reference included, mis-decodes that
    shape). For re-emitting single streams, segment decoding would be
    wrong the opposite way — leave the default whole-file path on.

    A single-encoder file (one options row, at the head) yields one
    segment, so the scan is shape-safe for the common case either way.
    Cost: one varint length-walk over the frame framing plus a 2-tag
    peek per frame — no row/term decode, bandwidth-bound.
    Non-delimited buffers are one segment by definition.
    """
    if not looks_delimited(bytes(data[:3])):
        return [(0, len(data), 0)]
    mv = memoryview(data)
    n = len(data)
    starts: List[Tuple[int, int]] = []
    pos = 0
    fidx = 0
    while pos < n:
        length, body_start = read_uvarint(data, pos)
        body_end = body_start + length
        if body_end > n:
            raise c.JellyError("truncated frame at end of stream")
        if fidx == 0 or _frame_head_is_options(mv[body_start:body_end]):
            starts.append((pos, fidx))
        pos = body_end
        fidx += 1
    if not starts:
        return [(0, n, 0)]
    return [
        (start, starts[i + 1][0] if i + 1 < len(starts) else n, first_frame)
        for i, (start, first_frame) in enumerate(starts)
    ]


def read_frame_at(path: str, offset: int, length: int) -> bytes:
    """Read one delimited frame's body given its index entry."""
    with open(path, "rb") as handle:
        handle.seek(offset)
        chunk = handle.read(length)
    flen, body_start = read_uvarint(chunk, 0)
    return chunk[body_start : body_start + flen]
