"""Property-based codec fuzz: encode -> decode identity under arbitrary
term streams, tiny lookup tables (forced LRU eviction/recycling), and
extreme frame sizes.

Complements the ported reference vectors (tests/test_lookup_vectors.py)
and the e2e fixture grid (tests/test_roundtrip.py): hypothesis explores
the eviction/delta state space the fixed corpora cannot — the exact
subtlety SURVEY §7.3 flags as the top risk (reference semantics:
/root/reference/pyjelly/serialize/lookup.py, parse/lookup.py).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.decoder import decode_flat
from pyjelly_spark.jelly.encoder import delimit, encode_flat
from pyjelly_spark.jelly.ioutils import frames_from_bytes

# Small alphabets keep collisions (and thus table-hit/evict churn) high.
_LOCAL = st.sampled_from(["a", "b", "cc", "ddd", "e1", "x", "é中"])
_PREFIX = st.sampled_from(
    [
        "http://ex.org/",
        "http://ex.org/ns#",
        "http://other.example/a/",
        "urn:x:",
        "",
    ]
)
_LANG = st.sampled_from(["", "en", "de-DE"])
_DT = st.sampled_from(
    [
        "",
        "http://www.w3.org/2001/XMLSchema#int",
        "http://www.w3.org/2001/XMLSchema#string",
        "http://ex.org/dt#d1",
    ]
)


def _iri():
    return st.tuples(_PREFIX, _LOCAL).map(lambda t: ("iri", t[0] + t[1]))


def _bnode():
    return _LOCAL.map(lambda s: ("bnode", s))


def _literal(allow_datatype: bool):
    def build(lex, lang, dt):
        if lang:
            return ("lit", lex, lang, "")
        return ("lit", lex, "", dt)

    dt = _DT if allow_datatype else st.just("")
    return st.builds(build, _LOCAL, _LANG, dt)


def _term(allow_datatype: bool):
    return st.one_of(_iri(), _bnode(), _literal(allow_datatype))


def _norm_term(term):
    """Expected-side normalization: an explicit xsd:string datatype is
    suppressed on the wire (reference encode.py:147), so it decodes as a
    plain literal — RDF-equal, tuple-different."""
    if term[0] == "lit" and term[3] == c.XSD_STRING:
        return ("lit", term[1], term[2], "")
    if term[0] == "qt":
        return ("qt",) + tuple(_norm_term(t) for t in term[1:4])
    return term


def _norm(statements):
    return [tuple(_norm_term(t) for t in stmt) for stmt in statements]


def _statements(allow_datatype: bool, quads: bool):
    # graph slot exercises ALL four oneof offsets, incl. the two whose
    # field numbers need multi-byte tags on the wire (bnode=14, lit=16)
    graph = st.one_of(
        st.just(("dg",)), _iri(), _bnode(), _literal(allow_datatype)
    )
    if quads:
        stmt = st.tuples(
            _term(allow_datatype), _iri(), _term(allow_datatype), graph
        )
    else:
        stmt = st.tuples(_term(allow_datatype), _iri(), _term(allow_datatype))
    return st.lists(stmt, min_size=0, max_size=60)


# Tiny tables force eviction/recycling churn between statements, while
# staying >= the per-row expressibility floor (a quad row can reference
# up to 4 distinct prefixes and 2 distinct datatypes with this term
# generator; below that the encoder correctly REFUSES — covered by
# TestInexpressibleRows, not fuzz).
_PRESETS = st.sampled_from(
    [
        c.TablePreset(),  # defaults
        c.TablePreset(names=8, prefixes=4, datatypes=2),  # brutal eviction
        c.TablePreset(names=9, prefixes=5, datatypes=3),
        c.TablePreset(names=16, prefixes=0, datatypes=4),  # no prefix table
        c.TablePreset(names=8, prefixes=8, datatypes=0),  # no datatype table
    ]
)
_FRAME_ROWS = st.sampled_from([1, 2, 7, 250])


@settings(max_examples=120, deadline=None)
@given(data=st.data(), preset=_PRESETS, frame_rows=_FRAME_ROWS)
def test_triples_roundtrip_fuzz(data, preset, frame_rows):
    statements = data.draw(
        _statements(allow_datatype=preset.datatypes > 0, quads=False)
    )
    options = c.StreamOptions(preset=preset, frame_rows=frame_rows)
    payload = b"".join(
        delimit(f) for f in encode_flat(iter(statements), options)
    )
    back = [
        (e[1], e[2], e[3]) for e in decode_flat(frames_from_bytes(payload))
    ]
    assert back == _norm(statements)


@settings(max_examples=80, deadline=None)
@given(data=st.data(), preset=_PRESETS, frame_rows=_FRAME_ROWS)
def test_quads_roundtrip_fuzz(data, preset, frame_rows):
    statements = data.draw(
        _statements(allow_datatype=preset.datatypes > 0, quads=True)
    )
    options = c.StreamOptions(
        physical_type=c.PHYSICAL_QUADS,
        logical_type=c.LOGICAL_FLAT_QUADS,
        preset=preset,
        frame_rows=frame_rows,
    )
    payload = b"".join(
        delimit(f) for f in encode_flat(iter(statements), options)
    )
    back = [tuple(e[1:]) for e in decode_flat(frames_from_bytes(payload))]
    assert back == _norm(statements)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_rdf_star_roundtrip_fuzz(data):
    """Quoted triples in s/o slots (RDF-star), nested one level."""
    inner = st.tuples(_iri(), _iri(), _term(True)).map(
        lambda t: ("qt", t[0], t[1], t[2])
    )
    stmt = st.tuples(st.one_of(_iri(), inner), _iri(), st.one_of(_term(True), inner))
    statements = data.draw(st.lists(stmt, min_size=0, max_size=30))
    options = c.StreamOptions(rdf_star=True)
    payload = b"".join(
        delimit(f) for f in encode_flat(iter(statements), options)
    )
    back = [
        (e[1], e[2], e[3]) for e in decode_flat(frames_from_bytes(payload))
    ]
    assert back == _norm(statements)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_generalized_roundtrip_fuzz(data):
    """Generalized RDF: literals/bnodes allowed in any s/p/o slot."""
    stmt = st.tuples(_term(True), _term(True), _term(True))
    statements = data.draw(st.lists(stmt, min_size=0, max_size=30))
    options = c.StreamOptions(generalized=True)
    payload = b"".join(
        delimit(f) for f in encode_flat(iter(statements), options)
    )
    back = [
        (e[1], e[2], e[3]) for e in decode_flat(frames_from_bytes(payload))
    ]
    assert back == _norm(statements)


class TestInexpressibleRows:
    """A statement referencing more distinct lookup entries than the
    table holds cannot exist on the wire (all entry rows precede the
    statement row). The single-pass encoder used to CORRUPT such
    streams silently; it must refuse instead."""

    def test_two_prefixes_capacity_one_raises(self):
        import pytest

        enc_opts = c.StreamOptions(
            preset=c.TablePreset(names=8, prefixes=1, datatypes=0)
        )
        stmts = [
            (
                ("iri", "http://ex.org/a"),
                ("iri", "http://ex.org/a"),
                ("iri", "http://ex.org/ns#a"),
            )
        ]
        with pytest.raises(c.JellyError, match="too small"):
            list(encode_flat(iter(stmts), enc_opts))

    def test_two_prefixes_capacity_two_roundtrips(self):
        enc_opts = c.StreamOptions(
            preset=c.TablePreset(names=8, prefixes=2, datatypes=0)
        )
        stmts = [
            (
                ("iri", "http://ex.org/a"),
                ("iri", "http://ex.org/a"),
                ("iri", "http://ex.org/ns#a"),
            ),
            (
                ("iri", "http://other.example/a/x"),
                ("iri", "http://ex.org/ns#a"),
                ("iri", "http://other.example/a/y"),
            ),
        ]
        payload = b"".join(delimit(f) for f in encode_flat(iter(stmts), enc_opts))
        back = [
            (e[1], e[2], e[3]) for e in decode_flat(frames_from_bytes(payload))
        ]
        assert back == stmts

    def test_two_datatypes_capacity_one_raises(self):
        import pytest

        enc_opts = c.StreamOptions(
            preset=c.TablePreset(names=8, prefixes=4, datatypes=1)
        )
        stmts = [
            (
                ("lit", "1", "", "http://ex.org/dt#a"),
                ("iri", "http://ex.org/p"),
                ("lit", "2", "", "http://ex.org/dt#b"),
            )
        ]
        with pytest.raises(c.JellyError, match="too small"):
            list(
                encode_flat(
                    iter(stmts),
                    c.StreamOptions(
                        generalized=True, preset=enc_opts.preset
                    ),
                )
            )


def test_quad_graph_slot_all_offsets_roundtrip():
    """Direct cover of every graph oneof offset, incl. the two whose
    field numbers (bnode=14, literal=16) need multi-byte wire tags —
    the decoder's inline statement walk must fall back to the generic
    varint read for those."""
    from pyjelly_spark.jelly.encoder import StreamEncoder

    opts = c.StreamOptions(
        physical_type=c.PHYSICAL_QUADS,
        logical_type=c.LOGICAL_FLAT_QUADS,
        generalized=True,
    )
    encoder = StreamEncoder(opts)
    quads = [
        (("iri", "http://e/s"), ("iri", "http://e/p"), ("iri", "http://e/o"),
         ("lit", "graphlit", "", "")),
        (("iri", "http://e/s2"), ("iri", "http://e/p"), ("lit", "v", "", ""),
         ("bnode", "g1")),
        (("iri", "http://e/s3"), ("iri", "http://e/p"), ("iri", "http://e/o"),
         ("dg",)),
        (("iri", "http://e/s4"), ("iri", "http://e/p"), ("iri", "http://e/o"),
         ("lit", "graphlit2", "en", "")),
        (("iri", "http://e/s4"), ("iri", "http://e/p"), ("iri", "http://e/o"),
         ("iri", "http://e/g")),
    ]
    out = bytearray()
    for quad in quads:
        frame = encoder.add_quad(*quad)
        if frame:
            out += delimit(frame)
    tail = encoder.take_frame()
    if tail:
        out += delimit(tail)
    back = [tuple(e[1:]) for e in decode_flat(frames_from_bytes(bytes(out)))]
    assert back == quads


@given(
    n_stmts=st.integers(min_value=0, max_value=60),
    frame_rows=st.sampled_from([1, 3, 10, 250]),
)
@settings(max_examples=25, deadline=None)
def test_frame_index_random_access_fuzz(n_stmts, frame_rows):
    """build_frame_index covers any generated stream contiguously and
    read_frame_at reproduces each frame byte-for-byte."""
    import os
    import tempfile

    from pyjelly_spark.jelly import StreamOptions, encode_flat
    from pyjelly_spark.jelly.ioutils import (
        build_frame_index,
        frames_from_bytes,
        read_frame_at,
        write_frames,
    )

    stmts = [
        (
            ("iri", f"http://x.example/s{i % 7}"),
            ("iri", f"http://x.example/p{i % 3}"),
            ("lit", f"v{i}", "", ""),
        )
        for i in range(n_stmts)
    ]
    opts = StreamOptions(frame_rows=frame_rows)
    fd, path = tempfile.mkstemp(suffix=".jelly")
    try:
        with os.fdopen(fd, "wb") as out:
            write_frames(encode_flat(iter(stmts), opts), out)
        idx = build_frame_index(path)
        with open(path, "rb") as f:
            data = f.read()
        assert [read_frame_at(path, o, l) for o, l, _ in idx] == list(
            frames_from_bytes(data)
        )
        assert sum(l for _, l, _ in idx) == len(data)
    finally:
        os.unlink(path)
