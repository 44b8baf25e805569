"""Jelly stream decoder: framed wire bytes -> statement tuples.

Decode-side duals of the encoder, replicating the reference semantics:

- lookup assignment with ``0 => last assigned + 1``
  (/root/reference/pyjelly/parse/lookup.py:37-43)
- prefix slot ``0`` = sticky last-used (or "" when never used)
  (/root/reference/pyjelly/parse/lookup.py:53-57)
- name slot ``0`` = last-used + 1 (parse/lookup.py:59-64)
- datatype slot must be explicit (parse/lookup.py:66-70)
- repeated terms: an absent oneof repeats the slot's previous term
  (/root/reference/pyjelly/parse/decode.py:391-425)
- quoted triples forbid repeated terms (parse/decode.py:431-443)

Statements come out as the same plain tuples the encoder consumes.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.wire import iter_fields

Term = tuple


class DecodeTable:
    """Decoder-side lookup table: index -> string with delta defaults."""

    __slots__ = ("capacity", "_values", "last_set", "last_used")

    def __init__(self, capacity: int) -> None:
        if capacity > c.MAX_TABLE:
            raise c.JellyError(f"lookup size cannot be larger than {c.MAX_TABLE}")
        self.capacity = capacity
        self._values: List[Optional[str]] = [None] * capacity
        self.last_set = 0
        self.last_used = 0

    def put(self, index: int, value: str) -> None:
        if index == 0:
            index = self.last_set + 1
        self._values[index - 1] = value
        self.last_set = index

    def fetch(self, index: int) -> str:
        self.last_used = index
        value = self._values[index - 1]
        if value is None:
            raise c.JellyError(f"lookup index {index} was never assigned")
        return value

    def prefix_at(self, index: int) -> str:
        effective = index or self.last_used
        if effective == 0:
            return ""
        return self.fetch(effective)

    def name_at(self, index: int) -> str:
        effective = index or self.last_used + 1
        if effective == 0:
            raise c.JellyError("0 is not a valid name term index")
        return self.fetch(effective)

    def datatype_at(self, index: int) -> str:
        if index == 0:
            raise c.JellyError("0 is not a valid datatype term index")
        return self.fetch(index)


def parse_options_row(body: bytes, delimited: bool) -> c.StreamOptions:
    """Materialize a StreamOptions from an RdfStreamOptions message body."""
    values: Dict[int, object] = {}
    for field, _wt, value in iter_fields(body):
        values[field] = value
    version = int(values.get(c.OPT_VERSION, 0))
    return c.StreamOptions(
        physical_type=int(values.get(c.OPT_PHYSICAL_TYPE, 0)),
        logical_type=int(values.get(c.OPT_LOGICAL_TYPE, 0)),
        preset=c.TablePreset(
            names=int(values.get(c.OPT_MAX_NAMES, 0)),
            prefixes=int(values.get(c.OPT_MAX_PREFIXES, 0)),
            datatypes=int(values.get(c.OPT_MAX_DATATYPES, 0)),
        ),
        stream_name=bytes(values.get(c.OPT_STREAM_NAME, b"")).decode("utf-8"),
        generalized=bool(values.get(c.OPT_GENERALIZED, 0)),
        rdf_star=bool(values.get(c.OPT_RDF_STAR, 0)),
        # the parser infers namespace support from version >= 2
        # (/root/reference/pyjelly/parse/decode.py:64-66)
        namespace_declarations=version >= c.PROTO_VERSION_WITH_NAMESPACES,
        delimited=delimited,
    )


def split_frame(frame: bytes) -> Tuple[List[bytes], Dict[str, bytes]]:
    """One RdfStreamFrame -> (row byte-strings, metadata map)."""
    rows: List[bytes] = []
    metadata: Dict[str, bytes] = {}
    for field, _wt, value in iter_fields(frame):
        if field == c.FRAME_ROWS:
            rows.append(bytes(value))
        elif field == c.FRAME_METADATA:
            key, payload = "", b""
            for mf, _mw, mv in iter_fields(bytes(value)):
                if mf == 1:
                    key = bytes(mv).decode("utf-8")
                elif mf == 2:
                    payload = bytes(mv)
            metadata[key] = payload
    return rows, metadata


class StreamDecoder:
    """Decodes the rows of one Jelly stream, maintaining all stream state.

    Emits event tuples:
      ("triple", s, p, o) | ("quad", s, p, o, g)
      | ("graph_start", g) | ("graph_end",) | ("namespace", label, iri_term)
    """

    def __init__(self, options: Optional[c.StreamOptions] = None) -> None:
        self.options = options
        self._names: Optional[DecodeTable] = None
        self._prefixes: Optional[DecodeTable] = None
        self._datatypes: Optional[DecodeTable] = None
        self._repeated: List[Optional[Term]] = [None, None, None, None]
        if options is not None:
            self._allocate(options)

    def _allocate(self, options: c.StreamOptions) -> None:
        self._names = DecodeTable(options.preset.names)
        self._prefixes = DecodeTable(options.preset.prefixes)
        self._datatypes = DecodeTable(options.preset.datatypes)

    # --------------------------------------------------------------- terms
    def _decode_iri(self, body: bytes) -> Term:
        prefix_id = name_id = 0
        for field, _wt, value in iter_fields(body):
            if field == 1:
                prefix_id = int(value)
            elif field == 2:
                name_id = int(value)
        name = self._names.name_at(name_id)
        prefix = self._prefixes.prefix_at(prefix_id) if self._prefixes.capacity else ""
        return ("iri", prefix + name)

    def _decode_literal(self, body: bytes) -> Term:
        lex, lang, datatype = "", "", ""
        datatype_id = None
        for field, _wt, value in iter_fields(body):
            if field == 1:
                lex = bytes(value).decode("utf-8")
            elif field == 2:
                lang = bytes(value).decode("utf-8")
            elif field == 3:
                datatype_id = int(value)
        if not lang and datatype_id is not None and self._datatypes.capacity:
            datatype = self._datatypes.datatype_at(datatype_id)
        return ("lit", lex, lang, datatype)

    def _decode_slot_term(self, kind_offset: int, value: object) -> Term:
        if kind_offset == 0:
            return self._decode_iri(bytes(value))
        if kind_offset == 1:
            return ("bnode", bytes(value).decode("utf-8"))
        if kind_offset == 2:
            return self._decode_literal(bytes(value))
        return self._decode_quoted(bytes(value))

    def _decode_quoted(self, body: bytes) -> Term:
        slots: List[Optional[Term]] = [None, None, None]
        for field, _wt, value in iter_fields(body):
            slot, offset = divmod(field - 1, 4)
            slots[slot] = self._decode_slot_term(offset, value)
        if any(term is None for term in slots):
            raise c.JellyError("repeated terms are not allowed in quoted triples")
        return ("qt", slots[0], slots[1], slots[2])

    def _decode_graph_term(self, offset: int, value: object) -> Term:
        # offsets within the graph oneof: 0=iri 1=bnode 2=default 3=literal
        if offset == 0:
            return self._decode_iri(bytes(value))
        if offset == 1:
            return ("bnode", bytes(value).decode("utf-8"))
        if offset == 2:
            return ("dg",)
        return self._decode_literal(bytes(value))

    # ---------------------------------------------------------------- rows
    def _decode_statement(self, body: bytes, is_quad: bool) -> Term:
        present: Dict[int, Term] = {}
        graph_term: Optional[Term] = None
        saw_graph = False
        for field, _wt, value in iter_fields(body):
            if field >= c.QUAD_G_IRI:
                graph_term = self._decode_graph_term(field - c.QUAD_G_IRI, value)
                saw_graph = True
            else:
                slot, offset = divmod(field - 1, 4)
                present[slot] = self._decode_slot_term(offset, value)
        repeated = self._repeated
        terms: List[Term] = []
        for slot in range(3):
            term = present.get(slot)
            if term is None:
                term = repeated[slot]
                if term is None:
                    raise c.JellyError(f"missing repeated term in slot {slot}")
            else:
                repeated[slot] = term
            terms.append(term)
        if not is_quad:
            return ("triple", terms[0], terms[1], terms[2])
        if saw_graph:
            repeated[3] = graph_term
        else:
            graph_term = repeated[3]
            if graph_term is None:
                raise c.JellyError("missing repeated graph term")
        return ("quad", terms[0], terms[1], terms[2], graph_term)

    def decode_row(self, row: bytes) -> Optional[Term]:
        """Decode one RdfStreamRow; lookup rows return None (state only)."""
        fields = list(iter_fields(row))
        if not fields:
            return None
        field, _wt, value = fields[0]
        payload = bytes(value) if not isinstance(value, int) else b""
        if field == c.ROW_TRIPLE:
            return self._decode_statement(payload, is_quad=False)
        if field == c.ROW_QUAD:
            return self._decode_statement(payload, is_quad=True)
        if field == c.ROW_NAME_ENTRY:
            entry_id, text = _entry(payload)
            self._names.put(entry_id, text)
            return None
        if field == c.ROW_PREFIX_ENTRY:
            entry_id, text = _entry(payload)
            self._prefixes.put(entry_id, text)
            return None
        if field == c.ROW_DATATYPE_ENTRY:
            entry_id, text = _entry(payload)
            self._datatypes.put(entry_id, text)
            return None
        if field == c.ROW_OPTIONS:
            parsed = parse_options_row(payload, delimited=True)
            if self.options is None:
                self.options = parsed
                self._allocate(parsed)
            else:
                self._validate(parsed)
            return None
        if field == c.ROW_GRAPH_START:
            graph_fields = list(iter_fields(payload))
            if not graph_fields:
                raise c.JellyError("graph_start row without a graph term")
            gf, _gw, gv = graph_fields[0]
            return ("graph_start", self._decode_graph_term(gf - 1, gv))
        if field == c.ROW_GRAPH_END:
            return ("graph_end",)
        if field == c.ROW_NAMESPACE:
            label, iri_term = "", None
            for nf, _nw, nv in iter_fields(payload):
                if nf == 1:
                    label = bytes(nv).decode("utf-8")
                elif nf == 2:
                    iri_term = self._decode_iri(bytes(nv))
            return ("namespace", label, iri_term)
        raise c.JellyError(f"unknown stream row field {field}")

    def _validate(self, parsed: c.StreamOptions) -> None:
        """Options rows after the first must agree with the stream
        (/root/reference/pyjelly/parse/decode.py:259-267)."""
        expected = self.options
        if (
            parsed.physical_type != expected.physical_type
            or parsed.logical_type != expected.logical_type
            or parsed.preset != expected.preset
            or parsed.stream_name != expected.stream_name
        ):
            raise c.JellyError("stream options row contradicts stream state")

    # --------------------------------------------------------------- frames
    def decode_frame(self, frame: bytes) -> Iterator[Term]:
        rows, _metadata = split_frame(frame)
        for row in rows:
            event = self.decode_row(row)
            if event is not None:
                yield event


def _entry(payload: bytes) -> Tuple[int, str]:
    entry_id, text = 0, ""
    for field, _wt, value in iter_fields(payload):
        if field == 1:
            entry_id = int(value)
        elif field == 2:
            text = bytes(value).decode("utf-8")
    return entry_id, text


def decode_flat(frames: Iterable[bytes]) -> Iterator[Term]:
    """All frames -> flat statement events; GRAPHS brackets are resolved
    into quads with the current graph term
    (/root/reference/pyjelly/integrations/generic/parse.py:150-160)."""
    decoder = StreamDecoder()
    current_graph: Optional[Term] = None
    for frame in frames:
        for event in decoder.decode_frame(frame):
            kind = event[0]
            if kind == "graph_start":
                current_graph = event[1]
            elif kind == "graph_end":
                current_graph = None
            elif kind == "triple" and current_graph is not None:
                yield ("quad", event[1], event[2], event[3], current_graph)
            else:
                yield event
