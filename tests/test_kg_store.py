"""Predicate-partitioned KG store: pruning, collision safety, BGP parity."""

import io
import shutil
import tempfile
from contextlib import redirect_stdout

import pytest

TRIPLES = [
    ("s1", "http://ex/defines", "sym1"),
    ("s2", "http://ex/defines", "sym2"),
    ("s1", "http://ex/calls", "sym2"),
    ("s3", "http://ex/calls", "sym1"),
    ("r1", "http://ex/contains", "s1"),
    ("r1", "http://ex/contains", "s2"),
    ("r2", "http://ex/contains", "s3"),
]


@pytest.fixture()
def store(spark):
    from pyjelly_spark.sources.kg_store import write_kg_store

    df = spark.createDataFrame(TRIPLES, "s: string, p: string, o: string")
    path = tempfile.mkdtemp(prefix="kg_store_test_")
    write_kg_store(df, path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_scan_pattern_prunes_partitions(spark, store):
    from pyjelly_spark.sources.kg_store import scan_pattern

    scan = scan_pattern(spark, store, "http://ex/defines")
    rows = {(r["s"], r["o"]) for r in scan.collect()}
    assert rows == {("s1", "sym1"), ("s2", "sym2")}
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain(True)
    plan = buf.getvalue()
    # the p_part equality must reach the file index, not a post-scan filter
    assert "PartitionFilters" in plan
    assert "p_part" in plan.split("PartitionFilters", 1)[1][:120]
    assert "http___ex_defines" in plan


def test_token_collision_is_correctness_safe(spark):
    from pyjelly_spark.sources.kg_store import (
        predicate_token,
        scan_pattern,
        write_kg_store,
    )

    # two predicates folding to the same hive-safe token
    assert predicate_token("a:b") == predicate_token("a.b") == "a_b"
    df = spark.createDataFrame(
        [("s1", "a:b", "x"), ("s2", "a.b", "y")],
        "s: string, p: string, o: string",
    )
    path = tempfile.mkdtemp(prefix="kg_store_coll_")
    try:
        write_kg_store(df, path)
        got_colon = [(r["s"], r["o"]) for r in scan_pattern(spark, path, "a:b").collect()]
        got_dot = [(r["s"], r["o"]) for r in scan_pattern(spark, path, "a.b").collect()]
        assert got_colon == [("s1", "x")]
        assert got_dot == [("s2", "y")]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_bgp_match_store_parity(spark, store):
    from pyjelly_spark.operators.bgp import bgp_match
    from pyjelly_spark.sources.kg_store import bgp_match_store

    graph = spark.createDataFrame(TRIPLES, "s: string, p: string, o: string")
    patterns = [
        ("?repo", "http://ex/contains", "?file"),
        ("?file", "http://ex/defines", "?sym"),
    ]
    optional = [("?caller", "http://ex/calls", "?sym")]
    want = {
        tuple(sorted(r.asDict().items()))
        for r in bgp_match(graph, patterns, optional=optional).collect()
    }
    got = {
        tuple(sorted(r.asDict().items()))
        for r in bgp_match_store(spark, store, patterns, optional=optional).collect()
    }
    assert got == want and len(got) == 2


def test_snapshot_commit_timetravel_and_diff(spark):
    import pytest as _pytest

    from pyjelly_spark.sources.kg_store import (
        diff_snapshots,
        read_kg_snapshot,
        snapshots,
        write_kg_snapshot,
    )

    path = tempfile.mkdtemp(prefix="kg_snap_test_")
    try:
        v1 = spark.createDataFrame(
            [("s1", "p", "a"), ("s2", "p", "b")], "s: string, p: string, o: string"
        )
        v2 = spark.createDataFrame(
            [("s1", "p", "a"), ("s3", "q", "c")], "s: string, p: string, o: string"
        )
        assert snapshots(path) == []
        assert write_kg_snapshot(v1, path) == 1
        assert write_kg_snapshot(v2, path) == 2
        assert snapshots(path) == [1, 2]
        # time travel: snapshot 1 is immutable and still readable
        old = {(r["s"], r["o"]) for r in read_kg_snapshot(spark, path, 1).collect()}
        assert old == {("s1", "a"), ("s2", "b")}
        # latest by default
        new = {(r["s"], r["o"]) for r in read_kg_snapshot(spark, path).collect()}
        assert new == {("s1", "a"), ("s3", "c")}
        got = {
            (r["op"], r["s"], r["o"])
            for r in diff_snapshots(spark, path, 1, 2).collect()
        }
        assert got == {("add", "s3", "c"), ("del", "s2", "b")}
        with _pytest.raises(ValueError):
            write_kg_snapshot(v1, path, snapshot_id=2)  # double commit
        with _pytest.raises(ValueError):
            read_kg_snapshot(spark, path, 9)            # unknown snapshot
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_vacuum_and_compaction(spark):
    import glob
    import os

    from pyjelly_spark.sources.kg_store import (
        compact_snapshot,
        read_kg_snapshot,
        snapshots,
        vacuum,
        write_kg_snapshot,
    )

    path = tempfile.mkdtemp(prefix="kg_vac_test_")
    try:
        df = spark.createDataFrame(
            [(f"s{i}", "p" if i % 2 else "q", f"o{i}") for i in range(40)],
            "s: string, p: string, o: string",
        )
        assert write_kg_snapshot(df.repartition(8), path) == 1
        # simulate a crashed writer: data dir without a commit record
        os.makedirs(os.path.join(path, "snap=99", "p_part=zz"), exist_ok=True)
        assert vacuum(path) == ["snap=99"]
        assert not os.path.exists(os.path.join(path, "snap=99"))
        assert snapshots(path) == [1]  # committed snapshot untouched

        sid = compact_snapshot(spark, path, files_per_predicate=1)
        assert sid == 2
        before = {
            tuple(r) for r in read_kg_snapshot(spark, path, 1).select("s", "p", "o").collect()
        }
        after = {
            tuple(r) for r in read_kg_snapshot(spark, path, 2).select("s", "p", "o").collect()
        }
        assert before == after  # content identical
        # compaction reduced per-partition file counts to 1
        n1 = len(glob.glob(os.path.join(path, "snap=1", "p_part=p", "*.parquet")))
        n2 = len(glob.glob(os.path.join(path, "snap=2", "p_part=p", "*.parquet")))
        assert n1 > 1 and n2 == 1
    finally:
        shutil.rmtree(path, ignore_errors=True)
