"""logical_type_strict gate: the reference's strict logical-type check.

Ports the decision matrix of
/root/reference/tests/integration_tests/test_generic/test_logical_types.py
(:230-340) against this engine's decode surfaces: a GROUPED parse under
strict mode must see a grouped logical type, a FLAT parse a flat one;
lenient mode (the default) routes by physical type only. UNSPECIFIED
fails both strict modes. The same gate rides the distributed
``read_jelly(..., logical_type_strict=...)`` read path.
"""

from __future__ import annotations

import pytest

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.constants import JellyError, StreamOptions
from pyjelly_spark.jelly.decoder import decode_flat
from pyjelly_spark.jelly.encoder import encode_flat
from pyjelly_spark.jelly.grouped import (
    decode_grouped,
    encode_grouped,
    grouped_options,
)


def iri(v):
    return ("iri", v)


def _flat_triples_frames(logical=c.LOGICAL_FLAT_TRIPLES):
    stmts = [
        (iri("http://e/s1"), iri("http://e/p"), iri("http://e/o1")),
        (iri("http://e/s2"), iri("http://e/p"), iri("http://e/o2")),
    ]
    return list(
        encode_flat(
            iter(stmts),
            StreamOptions(
                physical_type=c.PHYSICAL_TRIPLES, logical_type=logical
            ),
        )
    )


def _flat_quads_frames():
    stmts = [
        (
            iri("http://e/s1"),
            iri("http://e/p"),
            iri("http://e/o1"),
            iri("http://e/g"),
        ),
    ]
    return list(
        encode_flat(
            iter(stmts),
            StreamOptions(
                physical_type=c.PHYSICAL_QUADS,
                logical_type=c.LOGICAL_FLAT_QUADS,
            ),
        )
    )


def _grouped_graphs_frames():
    groups = [
        (iri("http://e/g1"), [(iri("http://e/s"), iri("http://e/p"), iri("http://e/o"))]),
        (iri("http://e/g2"), [(iri("http://e/s"), iri("http://e/p"), iri("http://e/o2"))]),
    ]
    return list(
        encode_grouped(groups, grouped_options(c.PHYSICAL_GRAPHS))
    )


def _physical_graphs_flat_logical_frames():
    """Physical GRAPHS carrying a FLAT_QUADS logical type — the
    base-compatible-but-flat stream the strict grouped parse must
    reject (reference matrix rows :267-303)."""
    groups = [
        (iri("http://e/g1"), [(iri("http://e/s"), iri("http://e/p"), iri("http://e/o"))]),
    ]
    opts = StreamOptions(
        physical_type=c.PHYSICAL_GRAPHS,
        logical_type=c.LOGICAL_FLAT_QUADS,
    )
    return list(encode_grouped(groups, opts))


CASES = [
    # (frames_factory, parser, strict, raises, match)
    (_flat_triples_frames, "flat", True, False, None),
    (_flat_triples_frames, "flat", False, False, None),
    (_flat_triples_frames, "grouped", True, True, "expected GROUPED"),
    (_flat_triples_frames, "grouped", False, False, None),
    (_flat_quads_frames, "flat", True, False, None),
    (_flat_quads_frames, "flat", False, False, None),
    (_flat_quads_frames, "grouped", True, True, "expected GROUPED"),
    (_flat_quads_frames, "grouped", False, False, None),
    (_grouped_graphs_frames, "grouped", True, False, None),
    (_grouped_graphs_frames, "grouped", False, False, None),
    (_grouped_graphs_frames, "flat", True, True, "expected FLAT"),
    (_grouped_graphs_frames, "flat", False, False, None),
    (_physical_graphs_flat_logical_frames, "flat", True, False, None),
    (_physical_graphs_flat_logical_frames, "flat", False, False, None),
    (
        _physical_graphs_flat_logical_frames,
        "grouped",
        True,
        True,
        "expected GROUPED",
    ),
    (_physical_graphs_flat_logical_frames, "grouped", False, False, None),
]


@pytest.mark.parametrize(
    ("factory", "parser", "strict", "raises", "match"), CASES
)
def test_strict_matrix(factory, parser, strict, raises, match):
    frames = factory()
    if parser == "flat":
        run = lambda: list(  # noqa: E731
            decode_flat(frames, logical_type_strict=strict)
        )
    else:
        run = lambda: list(  # noqa: E731
            decode_grouped(frames, logical_type_strict=strict)
        )
    if raises:
        with pytest.raises(JellyError, match=match):
            run()
    else:
        assert run()


def test_strict_unspecified_rejected_by_both():
    frames = _flat_triples_frames(logical=c.LOGICAL_UNSPECIFIED)
    with pytest.raises(JellyError, match="expected FLAT"):
        list(decode_flat(frames, logical_type_strict=True))
    with pytest.raises(JellyError, match="expected GROUPED"):
        list(decode_grouped(frames, logical_type_strict=True))


def test_strict_requires_options():
    """A stream with no options at all fails strict mode (reference
    test_generic_flat_strict_requires_stream_types)."""
    with pytest.raises(JellyError, match="requires stream options"):
        list(decode_flat([b""], logical_type_strict=True))
    assert list(decode_flat([b""], logical_type_strict=False)) == []


def test_strict_requires_options_grouped_and_empty_stream():
    """decode_grouped must reject options-less streams under strict
    mode exactly like decode_flat (reference parse_jelly_grouped,
    parse.py:263) — including the fully-empty stream, where the frame
    loop never runs."""
    with pytest.raises(JellyError, match="requires stream options"):
        list(decode_grouped([b""], logical_type_strict=True))
    with pytest.raises(JellyError, match="requires stream options"):
        list(decode_grouped([], logical_type_strict=True))
    with pytest.raises(JellyError, match="requires stream options"):
        list(decode_flat([], logical_type_strict=True))
    # Lenient mode accepts all of these as empty.
    assert list(decode_grouped([], logical_type_strict=False)) == []
    assert list(decode_flat([], logical_type_strict=False)) == []


def test_strict_empty_first_frame_late_options_accepted():
    """A stream whose FIRST frame is empty and whose options row arrives
    in a later frame never violates statement-before-options ordering,
    so strict mode must accept it (the per-frame fallback that rejected
    this was removed per r3 advisory)."""
    frames = _flat_triples_frames()
    padded = [b""] + frames
    out = list(decode_flat(padded, logical_type_strict=True))
    assert len(out) == 2
    g_frames = [b""] + _grouped_graphs_frames()
    groups = list(decode_grouped(g_frames, logical_type_strict=True))
    assert sum(len(ev) for ev, _m in groups) == 2


def test_read_jelly_strict_rejects_optionsless_file(spark, tmp_path):
    """_decode_bytes_batches end-of-stream fallback: an options-less
    (single empty frame) file fails strict read, passes lenient."""
    from pyjelly_spark.jelly.encoder import delimit
    from pyjelly_spark.sources.jelly_io import read_jelly

    bad = tmp_path / "optless.jelly"
    # Three empty delimited frames (1-byte files are below the 3-byte
    # sniff minimum of the reference's delimitedness truth table).
    bad.write_bytes(delimit(b"") * 3)
    assert read_jelly(spark, str(bad)).count() == 0
    with pytest.raises(Exception, match="requires stream options"):
        read_jelly(spark, str(bad), logical_type_strict="flat").count()


def test_read_jelly_strict_distributed(spark, tmp_path):
    """The strict gate rides the distributed read: a flat file read
    with logical_type_strict='grouped' fails the decode task; the
    matching mode succeeds."""
    from pyjelly_spark.jelly.encoder import delimit
    from pyjelly_spark.sources.jelly_io import read_jelly

    flat = tmp_path / "flat.jelly"
    with open(flat, "wb") as f:
        for frame in _flat_triples_frames():
            f.write(delimit(frame))
    grouped = tmp_path / "grouped.jelly"
    with open(grouped, "wb") as f:
        for frame in _grouped_graphs_frames():
            f.write(delimit(frame))

    assert read_jelly(spark, str(flat), logical_type_strict="flat").count() == 2
    assert (
        read_jelly(spark, str(grouped), logical_type_strict="grouped").count()
        == 2
    )
    with pytest.raises(Exception, match="expected GROUPED"):
        read_jelly(spark, str(flat), logical_type_strict="grouped").count()
    with pytest.raises(Exception, match="expected FLAT"):
        read_jelly(spark, str(grouped), logical_type_strict="flat").count()
    with pytest.raises(ValueError, match="logical_type_strict"):
        read_jelly(spark, str(flat), logical_type_strict="bogus")


def test_read_jelly_stream_strict(spark, tmp_path):
    """The strict gate rides the streaming source too: a flat landing
    file read with logical_type_strict='grouped' fails its micro-batch;
    the matching mode drains fine under availableNow."""
    from pyjelly_spark.jelly.encoder import delimit
    from pyjelly_spark.sources.jelly_io import read_jelly_stream

    land = tmp_path / "land"
    land.mkdir()
    with open(land / "a.jelly", "wb") as f:
        for frame in _flat_triples_frames():
            f.write(delimit(frame))

    out_ok = str(tmp_path / "ok")
    q = (
        read_jelly_stream(spark, str(land), logical_type_strict="flat")
        .writeStream.format("parquet")
        .option("path", out_ok)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_ok).count() == 2

    q2 = (
        read_jelly_stream(spark, str(land), logical_type_strict="grouped")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "bad"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="expected GROUPED"):
        q2.awaitTermination(120)

    with pytest.raises(ValueError, match="logical_type_strict"):
        read_jelly_stream(spark, str(land), logical_type_strict="nope")
