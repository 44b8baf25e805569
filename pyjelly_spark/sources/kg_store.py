"""Predicate-partitioned KG store: the on-disk layout for BGP at scale.

A knowledge graph's access pattern is predicate-skewed: BGP triple
patterns almost always carry a constant predicate, and real KGs have
few distinct predicates over trillions of triples. Laying the (s, p, o)
relation out as parquet partitioned by a filesystem-safe predicate
token turns every constant-predicate pattern into a *partition-pruned*
scan — Spark's file index eliminates every other predicate's files
before a single row is read, so a point pattern over a 100 TB store
touches only its own partition's bytes. (The reference's rdflib-backed
store is a driver-side in-memory graph — `/root/reference/pyjelly/
integrations/rdflib/parse.py` materializes into `rdflib.Graph` — so
this layout is the Spark-native answer to the same "store then query"
need, not a port.)

Layout contract:
- partition column ``p_part`` = predicate with every non-alphanumeric
  byte folded to ``_`` (hive-safe). Folding can collide, so the full
  ``p`` column is stored too and every pruned scan re-filters on it —
  pruning is an optimization, never the correctness boundary.
- data columns: s, p, o (strings, same flat schema the BGP layer uses).

``scan_pattern`` returns the pruned scan for one constant predicate;
``bgp_match_store`` runs a whole BGP where each constant-predicate
pattern reads only its partition (patterns with a variable predicate
fall back to the full store scan).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SAFE = re.compile(r"[^A-Za-z0-9]")


def predicate_token(predicate: str) -> str:
    return _SAFE.sub("_", predicate)


def write_kg_store(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an (s, p, o) frame as a predicate-partitioned parquet store.

    One directory per predicate token; within a predicate the rows keep
    the writer's partitioning (callers with skewed predicates can
    ``repartition(n, "s")`` first — the layout composes with any
    in-partition strategy).
    """
    (
        triples.select("s", "p", "o")
        .withColumn("p_part", F.regexp_replace(F.col("p"), "[^A-Za-z0-9]", "_"))
        .write.partitionBy("p_part")
        .mode(mode)
        .parquet(path)
    )


def read_kg_store(spark: SparkSession, path: str) -> DataFrame:
    """Full-store scan (s, p, o, p_part)."""
    return spark.read.parquet(path)


def scan_pattern(spark: SparkSession, path: str, predicate: str) -> DataFrame:
    """Pruned (s, p, o) scan for one constant predicate.

    The ``p_part`` equality prunes partitions at planning time (shows up
    as PartitionFilters in the physical plan — asserted in tests); the
    residual ``p`` equality guards against token collisions.
    """
    return (
        read_kg_store(spark, path)
        .where(F.col("p_part") == predicate_token(predicate))
        .where(F.col("p") == predicate)
        .select("s", "p", "o")
    )


def bgp_match_store(
    spark: SparkSession,
    path: str,
    patterns: Sequence[tuple[str, str, str]],
    **kwargs,
) -> DataFrame:
    """BGP over the store: constant-predicate patterns scan only their
    partition; variable-predicate patterns fall back to the full scan.

    Delegates the join planning to ``operators/bgp.py::bgp_match`` with
    a per-pattern graph override, so ordering/broadcast behavior is
    identical to the in-memory path.
    """
    from pyjelly_spark.operators.bgp import bgp_match

    def graph_for(p: str) -> DataFrame:
        if p.startswith("?"):
            return read_kg_store(spark, path).select("s", "p", "o")
        return scan_pattern(spark, path, p)

    all_patterns = list(patterns) + list(kwargs.get("optional", ()))
    graphs = [graph_for(p) for (_s, p, _o) in all_patterns]
    return bgp_match(graphs, patterns, **kwargs)


# --- snapshot versioning (Iceberg-style time travel) -----------------------
#
# A versioned store is a directory of immutable snapshot layouts plus a
# tiny manifest log:
#   <path>/snap=<id>/...          predicate-partitioned parquet (immutable)
#   <path>/_snapshots/<id>.json   commit record (row count, parent)
# Readers resolve "latest" from the manifest log, never by mtime, so
# concurrent writers on a shared store commit atomically (the manifest
# write is the commit point — a crashed writer leaves an orphan data
# dir that no reader ever resolves). All metadata I/O goes through
# pyarrow.fs like the jelly writers, so executors/drivers on different
# machines see the same store.


def _snap_fs(path: str):
    from pyjelly_spark.sources.jelly_io import _fs_for

    return _fs_for(path)


def snapshots(path: str) -> list[int]:
    """Committed snapshot ids, ascending."""
    from pyjelly_spark.sources.jelly_io import _fs_listdir

    filesystem, local = _snap_fs(path)
    out = []
    for p in _fs_listdir(filesystem, f"{local.rstrip('/')}/_snapshots"):
        name = p.rsplit("/", 1)[-1]
        if name.endswith(".json"):
            out.append(int(name[: -len(".json")]))
    return sorted(out)


def write_kg_snapshot(
    triples: DataFrame, path: str, snapshot_id: int | None = None
) -> int:
    """Commit a new immutable snapshot of the store; returns its id.

    The data directory is written first, the manifest record last —
    the manifest IS the commit (readers only resolve manifested ids).
    """
    import json

    existing = snapshots(path)
    sid = snapshot_id if snapshot_id is not None else (
        existing[-1] + 1 if existing else 1
    )
    if sid in existing:
        raise ValueError(f"snapshot {sid} already committed")
    base = path.rstrip("/")
    write_kg_store(triples, f"{base}/snap={sid}", mode="errorifexists")
    filesystem, local = _snap_fs(path)
    meta_dir = f"{local.rstrip('/')}/_snapshots"
    filesystem.create_dir(meta_dir, recursive=True)
    record = json.dumps(
        {"snapshot": sid, "parent": existing[-1] if existing else None}
    ).encode()
    with filesystem.open_output_stream(f"{meta_dir}/{sid}.json") as out:
        out.write(record)
    return sid


def read_kg_snapshot(
    spark: SparkSession, path: str, snapshot: int | None = None
) -> DataFrame:
    """Read a committed snapshot (default: latest) — time travel is
    just naming an older id."""
    ids = snapshots(path)
    if not ids:
        raise ValueError(f"no committed snapshots under {path}")
    sid = ids[-1] if snapshot is None else snapshot
    if sid not in ids:
        raise ValueError(f"snapshot {sid} not committed (have {ids})")
    return read_kg_store(spark, f"{path.rstrip('/')}/snap={sid}")


def diff_snapshots(
    spark: SparkSession, path: str, old: int, new: int
) -> DataFrame:
    """Triple-level delta between two snapshots: (op, s, p, o) with op
    'add' (in new only) or 'del' (in old only). Two left-anti joins on
    the full key — no window, no collect; at scale both sides are
    partition-pruned scans of immutable data."""
    # set semantics (a store is a triple SET): dedupe both sides so the
    # delta matches EXCEPT, not per-row anti-join multiplicities
    a = read_kg_snapshot(spark, path, old).select("s", "p", "o").distinct()
    b = read_kg_snapshot(spark, path, new).select("s", "p", "o").distinct()
    added = b.join(a, ["s", "p", "o"], "left_anti").select(
        F.lit("add").alias("op"), "s", "p", "o"
    )
    removed = a.join(b, ["s", "p", "o"], "left_anti").select(
        F.lit("del").alias("op"), "s", "p", "o"
    )
    return added.unionByName(removed)


def vacuum(path: str) -> list[str]:
    """Remove snapshot data directories not referenced by any committed
    manifest — the garbage a crashed writer leaves behind (its data dir
    exists, its commit record does not). Never touches committed
    snapshots; returns the removed directory names."""
    from pyjelly_spark.sources.jelly_io import _fs_listdir

    committed = {f"snap={sid}" for sid in snapshots(path)}
    filesystem, local = _snap_fs(path)
    removed = []
    for p in _fs_listdir(filesystem, local.rstrip("/")):
        name = p.rsplit("/", 1)[-1]
        if name.startswith("snap=") and name not in committed:
            filesystem.delete_dir(p)
            removed.append(name)
    return removed


def compact_snapshot(
    spark: SparkSession,
    path: str,
    snapshot: int | None = None,
    files_per_predicate: int = 1,
) -> int:
    """Small-file compaction: rewrite a snapshot's triples into a NEW
    committed snapshot with ``files_per_predicate`` files per predicate
    partition (repartitioned by predicate so each partition's rows
    coalesce), leaving the source snapshot immutable for time travel.
    Returns the new snapshot id — readers following "latest" pick up
    the compacted layout on their next resolve."""
    df = read_kg_snapshot(spark, path, snapshot).select("s", "p", "o")
    balanced = df.repartition(files_per_predicate, "p")
    return write_kg_snapshot(balanced, path)
