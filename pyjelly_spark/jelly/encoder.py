"""Jelly stream encoder: statement tuples -> framed wire bytes.

Semantics replicated from the reference implementation (parity cites):

- LRU lookup with recycled 1-based indices
  (/root/reference/pyjelly/serialize/lookup.py:12-55)
- delta/zero-default index encoding per slot
  (/root/reference/pyjelly/serialize/lookup.py:81-137)
- IRI prefix splitting at last '#' else last '/'
  (/root/reference/pyjelly/serialize/encode.py:14-31)
- repeated-term suppression (unset oneof = repeat previous)
  (/root/reference/pyjelly/serialize/encode.py:250-285)
- xsd:string datatype suppression (encode.py:147)
- bounded frames flushed at N *stream rows* including options/lookup rows
  (/root/reference/pyjelly/serialize/flows.py:111-121)
- options row emitted once, first (serialize/streams.py:98-112)

Architecture is deliberately different from the reference: no message
objects — every row is built directly as wire bytes, and the encoder is a
single flat state machine designed to run inside one Spark partition
(one output file/partition == one independent Jelly stream).
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.wire import (
    _UV_CACHE,
    len_field,
    str_field,
    uvarint,
    varint_field,
)

Term = tuple
_ROW_TAG_CACHE: Dict[int, bytes] = {}


def split_iri(iri: str) -> Tuple[str, str]:
    """Split an IRI at the last '#', else the last '/', into (prefix, local).

    The separator stays with the prefix. IRIs without either separator
    yield ("", iri). Mirrors /root/reference/pyjelly/serialize/encode.py:14-31.
    """
    hash_at = iri.rfind("#")
    if hash_at >= 0:
        return iri[: hash_at + 1], iri[hash_at + 1 :]
    slash_at = iri.rfind("/")
    if slash_at >= 0:
        return iri[: slash_at + 1], iri[slash_at + 1 :]
    return "", iri


class LruIndex:
    """Fixed-capacity 1-based string->index map with LRU slot recycling.

    Indices grow 1..capacity, then evictions hand their index to the new
    key (the protocol requires recycled, never-growing indices —
    /root/reference/pyjelly/serialize/lookup.py:39-51). Implemented on a
    plain insertion-ordered dict: a hit re-inserts the key to refresh
    recency; eviction pops the oldest entry.
    """

    __slots__ = ("capacity", "_slots", "_full")

    def __init__(self, capacity: int) -> None:
        self.capacity = capacity
        self._slots: Dict[str, int] = {}
        self._full = False

    def __len__(self) -> int:
        return len(self._slots)

    def hit(self, key: str) -> Optional[int]:
        """Return the key's index refreshing its recency, or None if absent."""
        slots = self._slots
        index = slots.pop(key, None)
        if index is None:
            return None
        slots[key] = index
        return index

    def get(self, key: str) -> Optional[int]:
        """Index WITHOUT a recency refresh (ref-pass read).

        Safe for the ref pass only: refs replay the ensure pass's keys in
        the identical order, so re-refreshing them would leave the
        last-occurrence (recency) order — and therefore every future
        eviction — unchanged. Skipping the refresh is byte- and
        eviction-identical while halving the dict work per term.
        """
        return self._slots.get(key)

    def add(self, key: str) -> int:
        """Insert an absent key, recycling the LRU slot once full."""
        if not self.capacity:
            raise c.JellyError("lookup table disabled (capacity 0)")
        slots = self._slots
        if self._full:
            oldest = next(iter(slots))
            index = slots.pop(oldest)
        else:
            index = len(slots) + 1
            if index == self.capacity:
                self._full = True
        slots[key] = index
        return index


class TableState:
    """One lookup table + the delta-encoding registers that ride with it.

    ``last_set`` = last assigned entry id; ``last_used`` = last id referenced
    from a statement (reference: last_assigned_index / last_reused_index,
    /root/reference/pyjelly/serialize/lookup.py:73-79).
    """

    __slots__ = ("table", "last_set", "last_used")

    def __init__(self, capacity: int) -> None:
        self.table = LruIndex(capacity)
        self.last_set = 0
        self.last_used = 0

    # -- entry rows ----------------------------------------------------------
    def entry_id(self, key: str) -> Optional[int]:
        """Id to put in a lookup-entry row, or None when no row is needed.

        0 compresses "previous assigned + 1"; any other value is explicit.
        (/root/reference/pyjelly/serialize/lookup.py:81-106)
        """
        if self.table.hit(key) is not None:
            return None
        index = self.table.add(key)
        emitted = 0 if index == self.last_set + 1 else index
        self.last_set = index
        return emitted

    # -- term-slot references --------------------------------------------------
    def _use(self, key: str) -> int:
        index = self.table.get(key)
        if index is None:
            # pass-2 miss: a later slot's entry evicted this key between
            # the ensure pass and the ref pass — the statement references
            # more distinct entries than the table holds, which the wire
            # format cannot express (all entry rows precede the statement
            # row, so both values cannot coexist for the decoder)
            raise c.JellyError(
                f"lookup table (capacity {self.table.capacity}) too small "
                f"to express this statement: entry {key!r} was evicted by "
                "a later term of the same row"
            )
        self.last_used = index
        return index

    def prefix_ref(self, key: str) -> int:
        """Prefix slot id: 0 is sticky "same as last prefix" / never-used-empty.

        (/root/reference/pyjelly/serialize/lookup.py:114-125)
        """
        if not self.table.capacity:
            return 0
        previous = self.last_used
        if not key and previous == 0:
            return 0
        current = self._use(key)
        if previous == 0:
            return current
        return 0 if current == previous else current

    def name_ref(self, key: str) -> int:
        """Name slot id: 0 means "previous used + 1" (auto-increment).

        (/root/reference/pyjelly/serialize/lookup.py:127-132)
        """
        previous = self.last_used
        current = self._use(key)
        return 0 if current == previous + 1 else current

    def datatype_ref(self, key: str) -> int:
        """Datatype slot id: always explicit (lookup.py:134-137)."""
        if not self.table.capacity:
            return 0
        return self._use(key)


def _row(row_field: int, payload: bytes) -> bytes:
    """Wrap a sub-message as one RdfStreamRow."""
    return len_field(row_field, payload)


# Constant RdfStreamRow field heads for the two statement row kinds —
# add_triple/add_quad wrap one row per statement, so the head lookup is
# hoisted out of the loop entirely.
_TRIPLE_ROW_HEAD = _UV_CACHE[(c.ROW_TRIPLE << 3) | 2]
_QUAD_ROW_HEAD = _UV_CACHE[(c.ROW_QUAD << 3) | 2]


def _evicted(state: "TableState", key: str) -> c.JellyError:
    """Ref-pass miss: same condition TableState._use guards (see there)."""
    return c.JellyError(
        f"lookup table (capacity {state.table.capacity}) too small "
        f"to express this statement: entry {key!r} was evicted by "
        "a later term of the same row"
    )


def _entry_payload(entry_id: int, value: str) -> bytes:
    """RdfNameEntry / RdfPrefixEntry / RdfDatatypeEntry body (defaults omitted)."""
    body = b""
    if entry_id:
        body += varint_field(1, entry_id)
    if value:
        body += str_field(2, value)
    return body


class StreamEncoder:
    """Encodes one Jelly stream (one partition's worth of statements).

    Yields complete frame byte-strings (RdfStreamFrame messages, not yet
    length-prefixed); the caller picks delimited vs bare framing.
    """

    def __init__(self, options: c.StreamOptions) -> None:
        self.options = options
        preset = options.preset
        self.names = TableState(preset.names)
        self.prefixes = TableState(preset.prefixes)
        self.datatypes = TableState(preset.datatypes)
        # last term seen per slot: 0=s 1=p 2=o 3=g
        self._last_terms: List[Optional[Term]] = [None, None, None, None]
        # memoized split_iri results: every IRI occurrence needs its split
        # twice (ensure pass + ref pass) and hot IRIs recur constantly;
        # bounded so a pathological stream of unique IRIs can't grow it
        self._splits: Dict[str, Tuple[str, str]] = {}
        self._rows: List[bytes] = []
        self._started = False
        # Bounded (row-count) framing applies to delimited FLAT_* /
        # unspecified logical types; GRAPHS / DATASETS logical types frame
        # per group via explicit take_frame(), and non-delimited streams
        # buffer everything into one frame
        # (/root/reference/pyjelly/serialize/streams.py:69-96,
        #  serialize/flows.py:74-159).
        logical_base = options.logical_type % 10
        self._bounded = options.delimited and logical_base in (
            c.LOGICAL_UNSPECIFIED,
            c.LOGICAL_FLAT_TRIPLES,
            c.LOGICAL_FLAT_QUADS,
        )

    # ------------------------------------------------------------------ rows
    def _options_row(self) -> bytes:
        o = self.options
        body = b""
        if o.stream_name:
            body += str_field(c.OPT_STREAM_NAME, o.stream_name)
        if o.physical_type:
            body += varint_field(c.OPT_PHYSICAL_TYPE, o.physical_type)
        if o.generalized:
            body += varint_field(c.OPT_GENERALIZED, 1)
        if o.rdf_star:
            body += varint_field(c.OPT_RDF_STAR, 1)
        if o.preset.names:
            body += varint_field(c.OPT_MAX_NAMES, o.preset.names)
        if o.preset.prefixes:
            body += varint_field(c.OPT_MAX_PREFIXES, o.preset.prefixes)
        if o.preset.datatypes:
            body += varint_field(c.OPT_MAX_DATATYPES, o.preset.datatypes)
        if o.logical_type:
            body += varint_field(c.OPT_LOGICAL_TYPE, o.logical_type)
        body += varint_field(c.OPT_VERSION, o.version)
        return _row(c.ROW_OPTIONS, body)

    def _begin(self) -> None:
        if not self._started:
            self._rows.append(self._options_row())
            self._started = True

    # ------------------------------------------------------------- term encode
    # Two-phase statement encoding: phase 1 ("ensure") appends every
    # lookup-entry row a statement needs; phase 2 ("body") computes the
    # term refs against the now-final table state — exactly the state the
    # decoder has when the statement row arrives, since all entry rows
    # precede it on the wire. A single interleaved pass (one slot at a
    # time) silently corrupts streams whenever a later slot's entry
    # EVICTS an earlier slot's key from a small table: the earlier slot's
    # already-chosen index then resolves to the new value. Found by
    # property fuzzing (tests/test_codec_fuzz.py); with no mid-row
    # eviction the two phases emit byte-identical wire to the single
    # pass (entry order, delta ids, and end-of-row recency all match).
    def _split(self, iri: str) -> Tuple[str, str]:
        got = self._splits.get(iri)
        if got is None:
            if len(self._splits) >= (1 << 20):
                self._splits.clear()
            got = self._splits[iri] = split_iri(iri)
        return got

    def _ensure_iri(self, iri: str) -> None:
        rows = self._rows
        if self.prefixes.table.capacity:
            prefix, local = self._split(iri)
            prefix_entry = self.prefixes.entry_id(prefix)
            if prefix_entry is not None:
                rows.append(
                    _row(c.ROW_PREFIX_ENTRY, _entry_payload(prefix_entry, prefix))
                )
        else:
            local = iri
        name_entry = self.names.entry_id(local)
        if name_entry is not None:
            rows.append(_row(c.ROW_NAME_ENTRY, _entry_payload(name_entry, local)))

    def _ensure_literal(self, datatype: str) -> None:
        if datatype and datatype != c.XSD_STRING:
            if not self.datatypes.table.capacity:
                raise c.JellyError(
                    f"literal datatype {datatype!r} used with datatype table disabled"
                )
            entry = self.datatypes.entry_id(datatype)
            if entry is not None:
                self._rows.append(
                    _row(c.ROW_DATATYPE_ENTRY, _entry_payload(entry, datatype))
                )

    def _ensure_term(self, term: Term) -> None:
        kind = term[0]
        if kind == "iri":
            self._ensure_iri(term[1])
        elif kind == "lit":
            self._ensure_literal(term[3])
        elif kind == "qt":
            for sub in term[1:4]:
                self._ensure_term(sub)

    def _iri_body(self, iri: str) -> bytes:
        """IRI body refs (entry rows already ensured).

        When the prefix table is disabled the whole IRI goes through the
        name table (/root/reference/pyjelly/serialize/encode.py:69-73).
        """
        # The delta rules below are TableState.prefix_ref / name_ref inlined
        # (those remain the semantic reference, exercised by the ported
        # vectors in tests/test_lookup_vectors.py); inlining removes ~6
        # function calls per IRI occurrence on the encode hot path.
        pt = self.prefixes
        if pt.table.capacity:
            prefix, local = self._split(iri)
            prev = pt.last_used
            if not prefix and prev == 0:
                prefix_id = 0
            else:
                cur = pt.table.get(prefix)
                if cur is None:
                    raise _evicted(pt, prefix)
                pt.last_used = cur
                prefix_id = cur if prev == 0 or cur != prev else 0
        else:
            local = iri
            prefix_id = 0
        nt = self.names
        cur_n = nt.table.get(local)
        if cur_n is None:
            raise _evicted(nt, local)
        name_id = 0 if cur_n == nt.last_used + 1 else cur_n
        nt.last_used = cur_n
        # inline varint_field(1, ...) / varint_field(2, ...): the field
        # heads are the constant bytes 0x08 / 0x10 and the ids are table
        # indices (uvarint handles any width) — saves two calls per
        # changed-IRI occurrence on the innermost encode path
        if prefix_id:
            if name_id:
                return b"\x08" + uvarint(prefix_id) + b"\x10" + uvarint(name_id)
            return b"\x08" + uvarint(prefix_id)
        if name_id:
            return b"\x10" + uvarint(name_id)
        return b""

    def _literal_body(self, lex: str, lang: str, datatype: str) -> bytes:
        datatype_id = 0
        if datatype and datatype != c.XSD_STRING:
            datatype_id = self.datatypes.datatype_ref(datatype)
        body = b""
        if lex:
            body += str_field(1, lex)
        if datatype_id:
            body += varint_field(3, datatype_id)
        elif lang:
            body += str_field(2, lang)
        return body

    def _quoted_triple_body(self, term: Term) -> bytes:
        """RDF-star quoted triple: no repeated-term suppression inside
        (/root/reference/pyjelly/serialize/encode.py:170-197)."""
        body = b""
        for slot_base, sub in zip(
            (c.SLOT_SUBJECT_BASE, c.SLOT_PREDICATE_BASE, c.SLOT_OBJECT_BASE),
            term[1:4],
        ):
            body += self._term_field(sub, slot_base)
        return body

    def _term_field(self, term: Term, base: int) -> bytes:
        """Encode one s/p/o term as its oneof field (iri/bnode/lit/qt)."""
        kind = term[0]
        if kind == "iri":
            # inline len_field: IRI bodies are two small varint fields
            # (<= ~22 bytes), so both the tag and the length come from
            # the varint cache unconditionally
            body = self._iri_body(term[1])
            return _UV_CACHE[(base << 3) | 2] + _UV_CACHE[len(body)] + body
        if kind == "bnode":
            return str_field(base + 1, term[1])
        if kind == "lit":
            return len_field(base + 2, self._literal_body(term[1], term[2], term[3]))
        if kind == "qt":
            return len_field(base + 3, self._quoted_triple_body(term))
        raise c.JellyError(f"cannot encode term kind {kind!r} in s/p/o slot")

    def _graph_field(self, term: Term, iri_f: int, bnode_f: int, dg_f: int, lit_f: int) -> bytes:
        kind = term[0]
        if kind == "iri":
            return len_field(iri_f, self._iri_body(term[1]))
        if kind == "bnode":
            return str_field(bnode_f, term[1])
        if kind == "dg":
            return len_field(dg_f, b"")
        if kind == "lit":
            return len_field(lit_f, self._literal_body(term[1], term[2], term[3]))
        raise c.JellyError(f"cannot encode term kind {kind!r} in graph slot")

    # ------------------------------------------------------------- statements
    def add_triple(self, s: Term, p: Term, o: Term) -> Optional[bytes]:
        """Feed one triple; returns a finished frame when one fills up.

        s/p/o with repeated-term suppression (encode.py:250-285), ensure
        pass over all changed slots first, then the ref pass — see the
        phase comment above the ensure helpers. Unrolled: this is the
        innermost loop of the distributed encode stage.
        """
        if not self._started:
            self._begin()
        last = self._last_terms
        cs = last[0] != s
        cp = last[1] != p
        co = last[2] != o
        if cs:
            self._ensure_term(s)
        if cp:
            self._ensure_term(p)
        if co:
            self._ensure_term(o)
        body = b""
        if cs:
            body += self._term_field(s, c.SLOT_SUBJECT_BASE)
            last[0] = s
        if cp:
            body += self._term_field(p, c.SLOT_PREDICATE_BASE)
            last[1] = p
        if co:
            body += self._term_field(o, c.SLOT_OBJECT_BASE)
            last[2] = o
        rows = self._rows
        n = len(body)
        rows.append(
            _TRIPLE_ROW_HEAD + _UV_CACHE[n] + body
            if n < 1 << 14
            else len_field(c.ROW_TRIPLE, body)
        )
        if self._bounded and len(rows) >= self.options.frame_rows:
            return self.take_frame()
        return None

    def add_quad(self, s: Term, p: Term, o: Term, g: Term) -> Optional[bytes]:
        """Same unrolled two-phase shape as add_triple, plus the graph slot."""
        if not self._started:
            self._begin()
        last = self._last_terms
        cs = last[0] != s
        cp = last[1] != p
        co = last[2] != o
        cg = last[3] != g
        if cs:
            self._ensure_term(s)
        if cp:
            self._ensure_term(p)
        if co:
            self._ensure_term(o)
        if cg:
            self._ensure_term(g)
        body = b""
        if cs:
            body += self._term_field(s, c.SLOT_SUBJECT_BASE)
            last[0] = s
        if cp:
            body += self._term_field(p, c.SLOT_PREDICATE_BASE)
            last[1] = p
        if co:
            body += self._term_field(o, c.SLOT_OBJECT_BASE)
            last[2] = o
        if cg:
            body += self._graph_field(
                g, c.QUAD_G_IRI, c.QUAD_G_BNODE, c.QUAD_G_DEFAULT, c.QUAD_G_LITERAL
            )
            last[3] = g
        rows = self._rows
        n = len(body)
        rows.append(
            _QUAD_ROW_HEAD + _UV_CACHE[n] + body
            if n < 1 << 14
            else len_field(c.ROW_QUAD, body)
        )
        if self._bounded and len(rows) >= self.options.frame_rows:
            return self.take_frame()
        return None

    def begin_graph(self, graph: Term) -> None:
        """GRAPHS physical type: bracket open (streams.py:243-274)."""
        self._begin()
        self._ensure_term(graph)
        body = self._graph_field(
            graph, c.START_G_IRI, c.START_G_BNODE, c.START_G_DEFAULT, c.START_G_LITERAL
        )
        self._rows.append(_row(c.ROW_GRAPH_START, body))

    def end_graph(self) -> Optional[bytes]:
        self._rows.append(_row(c.ROW_GRAPH_END, b""))
        return self._maybe_flush()

    def declare_namespace(self, label: str, iri: str) -> None:
        """Namespace declaration row (protocol v2; encode.py:343-365)."""
        self._begin()  # options row must precede any namespace row
        self._ensure_iri(iri)
        iri_body = self._iri_body(iri)
        body = b""
        if label:
            body += str_field(1, label)
        body += len_field(2, iri_body)
        self._rows.append(_row(c.ROW_NAMESPACE, body))

    # ----------------------------------------------------------------- frames
    def _maybe_flush(self) -> Optional[bytes]:
        if self._bounded and len(self._rows) >= self.options.frame_rows:
            return self.take_frame()
        return None

    def take_frame(self, metadata: Optional[Dict[str, bytes]] = None) -> Optional[bytes]:
        """Drain buffered rows into one RdfStreamFrame (bytes), or None."""
        if not self._rows and not metadata:
            return None
        parts = [len_field(c.FRAME_ROWS, row_bytes) for row_bytes in self._rows]
        self._rows.clear()
        if metadata:
            for key in sorted(metadata):
                entry = str_field(1, key) + len_field(2, metadata[key])
                parts.append(len_field(c.FRAME_METADATA, entry))
        return b"".join(parts)

    @property
    def pending_rows(self) -> int:
        return len(self._rows)


def encode_flat(
    statements: Iterable[Tuple[Term, ...]],
    options: c.StreamOptions,
) -> Iterator[bytes]:
    """Encode a flat statement iterable into frame byte-strings.

    Statement arity decides triple vs quad handling; the stream's
    physical type in ``options`` must agree.
    """
    encoder = StreamEncoder(options)
    quads = options.physical_type == c.PHYSICAL_QUADS
    for stmt in statements:
        frame = (
            encoder.add_quad(stmt[0], stmt[1], stmt[2], stmt[3])
            if quads
            else encoder.add_triple(stmt[0], stmt[1], stmt[2])
        )
        if frame is not None:
            yield frame
    encoder._begin()  # an empty stream still carries its options row
    tail = encoder.take_frame()
    if tail is not None:
        yield tail


def delimit(frame: bytes) -> bytes:
    """Length-prefix one frame for delimited on-disk framing
    (/root/reference/pyjelly/serialize/ioutils.py:8-9)."""
    return uvarint(len(frame)) + frame
