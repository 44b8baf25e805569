"""Segment-parallel decode of concatenated .jelly files
(read_jelly(split_foreign_files=True) + ioutils.scan_stream_segments).

Concatenation semantics: `cat a.jelly b.jelly` is byte-legal but a
single sequential decoder carries stream A's lookup tables and
auto-increment counters into stream B and silently mis-resolves B's
references (the reference validates-and-continues on repeated options
rows — parse/decode.py:259-267 — which serves mid-stream options
RE-EMISSION by one continuing encoder, not concatenation). These tests
pin: segment-scan correctness, golden equality of the split read
against per-member sequential reads (fresh state per segment must
reproduce each member exactly), the documented sequential-reader
mis-decode that motivates the flag, file-global frame_ids, and that a
2-segment file actually decodes as 2 tasks (the straggler win).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyjelly_spark.jelly import constants as jc
from pyjelly_spark.jelly.encoder import StreamEncoder, delimit
from pyjelly_spark.jelly.ioutils import (
    iter_delimited_frames,
    scan_stream_segments,
)


def _stream_bytes(n_triples: int, base: str, frame_rows: int = 10) -> bytes:
    """One self-contained delimited Jelly stream of n_triples."""
    enc = StreamEncoder(jc.StreamOptions(frame_rows=frame_rows))
    out = b""
    for i in range(n_triples):
        frame = enc.add_triple(
            ("iri", f"http://ex.org/{base}/s{i}"),
            ("iri", f"http://ex.org/{base}/p{i % 7}"),
            ("lit", f"v{i}", "", ""),
        )
        if frame is not None:
            out += delimit(frame)
    tail = enc.take_frame()
    if tail is not None:
        out += delimit(tail)
    return out


def _n_frames(data: bytes) -> int:
    return sum(1 for _ in iter_delimited_frames(data))


class TestScanStreamSegments:
    def test_single_stream_is_one_segment(self):
        data = _stream_bytes(55, "a")
        assert scan_stream_segments(data) == [(0, len(data), 0)]

    def test_concatenation_splits_at_options_frames(self):
        a = _stream_bytes(35, "a")
        b = _stream_bytes(20, "b")
        c = _stream_bytes(5, "c")
        segs = scan_stream_segments(a + b + c)
        assert [s[0] for s in segs] == [0, len(a), len(a) + len(b)]
        assert [s[1] for s in segs] == [
            len(a),
            len(a) + len(b),
            len(a) + len(b) + len(c),
        ]
        # frame offsets accumulate across segments (file-global)
        assert [s[2] for s in segs] == [
            0,
            _n_frames(a),
            _n_frames(a) + _n_frames(b),
        ]
        # segment bytes ARE the original streams
        data = a + b + c
        assert data[segs[1][0] : segs[1][1]] == b

    def test_empty_and_non_delimited(self):
        assert scan_stream_segments(b"") == [(0, 0, 0)]
        enc = StreamEncoder(jc.StreamOptions(delimited=False))
        enc.add_triple(
            ("iri", "http://e/s"), ("iri", "http://e/p"), ("iri", "http://e/o")
        )
        single = enc.take_frame()
        assert scan_stream_segments(single) == [(0, len(single), 0)]


@pytest.fixture(scope="module")
def split_fixture(tmp_path_factory):
    """parts/ holds the member streams as separate files; concat/ holds
    their byte concatenation as ONE file plus an untouched single."""
    root = tmp_path_factory.mktemp("split_decode")
    a = _stream_bytes(120, "a")
    b = _stream_bytes(80, "b")
    parts = root / "parts"
    concat = root / "concat"
    parts.mkdir()
    concat.mkdir()
    (parts / "a.jelly").write_bytes(a)
    (parts / "b.jelly").write_bytes(b)
    (concat / "concat.jelly").write_bytes(a + b)
    (concat / "single.jelly").write_bytes(_stream_bytes(40, "z"))
    return {"root": str(root), "parts": str(parts), "concat": str(concat),
            "n_frames_a": _n_frames(a)}


VALUE_COLS = ["s_value", "p_value", "o_value", "stmt_idx"]


class TestSplitRead:
    def test_split_matches_per_member_sequential(self, spark, split_fixture):
        """Golden equality: the split read of the concatenation equals
        the sequential reads of the members — fresh state per segment
        reproduces each member stream exactly (incl. per-segment
        stmt_idx, which matches the members' per-file stmt_idx)."""
        from pyjelly_spark.sources.jelly_io import read_jelly

        members = sorted(
            map(
                tuple,
                read_jelly(spark, split_fixture["parts"])
                .select(*VALUE_COLS)
                .collect(),
            )
        )
        split = sorted(
            map(
                tuple,
                read_jelly(
                    spark,
                    os.path.join(split_fixture["concat"], "concat.jelly"),
                    split_foreign_files=True,
                )
                .select(*VALUE_COLS)
                .collect(),
            )
        )
        assert split == members
        assert len(split) == 200

    def test_sequential_misdecodes_concatenation(self, spark, split_fixture):
        """The motivating defect (documented in read_jelly): a single
        sequential decoder resolves stream B's references against
        stream A's leftover lookup state, so the default reader does
        NOT reproduce the members — which is exactly why concatenated
        objects must opt into split_foreign_files."""
        from pyjelly_spark.sources.jelly_io import read_jelly

        members = {
            r["s_value"]
            for r in read_jelly(spark, split_fixture["parts"])
            .select("s_value")
            .collect()
        }
        seq = {
            r["s_value"]
            for r in read_jelly(
                spark, os.path.join(split_fixture["concat"], "concat.jelly")
            )
            .select("s_value")
            .collect()
        }
        assert seq != members

    def test_single_stream_split_equals_default(self, spark, split_fixture):
        """A single-encoder file is one segment: split output is
        row-identical to the default reader (same frame_ids, same
        stmt_idx)."""
        from pyjelly_spark.sources.jelly_io import read_jelly

        path = os.path.join(split_fixture["concat"], "single.jelly")
        cols = ["frame_id", "stmt_idx", "s_value", "p_value", "o_value"]
        seq = sorted(map(tuple, read_jelly(spark, path).select(*cols).collect()))
        par = sorted(
            map(
                tuple,
                read_jelly(spark, path, split_foreign_files=True)
                .select(*cols)
                .collect(),
            )
        )
        assert par == seq
        assert len(par) == 40

    def test_frame_ids_stay_file_global(self, spark, split_fixture):
        from pyjelly_spark.sources.jelly_io import read_jelly

        df = read_jelly(
            spark,
            os.path.join(split_fixture["concat"], "concat.jelly"),
            split_foreign_files=True,
        )
        # stream b's rows carry frame_ids offset by stream a's frame count
        b_min = (
            df.where(F.col("s_value").startswith("http://ex.org/b/"))
            .agg(F.min("frame_id").alias("mn"))
            .collect()[0]["mn"]
        )
        assert b_min == split_fixture["n_frames_a"]

    def test_segments_decode_as_separate_tasks(self, spark, split_fixture):
        """The straggler win: one concatenated file decodes across two
        tasks. Proxy: distinct task partition ids in the decode stage."""
        from pyjelly_spark.sources.jelly_io import read_jelly

        df = read_jelly(
            spark,
            os.path.join(split_fixture["concat"], "concat.jelly"),
            split_foreign_files=True,
        ).withColumn("pid", F.spark_partition_id())
        assert df.select("pid").distinct().count() == 2
