"""Connected components via alternating large-star / small-star joins.

The O(log n)-round MapReduce CC algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed as DataFrame
aggregations — the scale path for canonicalizing entities over edge sets
far too large for any single machine. The reference has no counterpart
(SURVEY.md §2.9); this exists for the pipeline's canonicalization stage
per BASELINE.json north_star.

Node ids are strings (IRIs); component representative = lexicographic
minimum, so the canonical IRI is stable and meaningful.

Scale notes:
- each round is one shuffle (groupBy node) + one projection; rounds are
  O(log n) in the worst case, 2-4 in practice for social-ish graphs;
- ``localCheckpoint`` every round truncates the lineage so plans don't
  grow exponentially (iterative joins are the classic Spark lineage bomb);
- convergence test compares a cheap global aggregate (count + hash sum),
  not a full collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    forward = edges.select(F.col("src"), F.col("dst"))
    backward = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return forward.unionByName(backward).where(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u (over the SYMMETRIZED adjacency): connect every
    strictly-larger neighbor to min(N(u) ∪ {u}).

    Symmetrizing inside each round matters: small-star emits a directed
    node->root forest, and large-star's neighborhood definition is
    undirected (Kiveris et al. §3).
    """
    both = _symmetrize(edges)
    mins = both.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        both.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high->low; for each node u connect all small neighbors
    (and u itself) to the minimum of that neighborhood."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    relinked = (
        oriented.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return relinked


def _signature(edges: DataFrame):
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38) sum: immune to ANSI long-overflow on hash sums
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame, max_rounds: int = 25, checkpoint: bool = True
) -> DataFrame:
    """Edge list (src, dst strings) -> (node, component) assignment.

    ``component`` is the lexicographically smallest node id reachable.
    Isolated nodes don't appear (they are their own components trivially);
    callers union them in if needed.

    AQE is suspended for the iterative rounds: each round is many tiny
    shuffles, and AQE's per-query-stage jobs multiply the scheduling
    overhead (~2x wall on graphs that converge in 2-3 rounds) without
    helping — partition counts here are already small and uniform.
    """
    spark = edges.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    parts_before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        current = _symmetrize(edges)
        if checkpoint:
            current = current.localCheckpoint(eager=True)
        # right-size round shuffles to the (now materialized) edge count:
        # with AQE off, a 2k-edge graph would otherwise run every round
        # across the full session partition count, paying pure task-
        # scheduling overhead; big graphs keep the session setting.
        n_edges = current.count()
        round_parts = max(4, min(int(parts_before), n_edges // 50_000 + 1))
        spark.conf.set("spark.sql.shuffle.partitions", str(round_parts))
        previous_sig = None
        for _ in range(max_rounds):
            current = _small_star(_large_star(current))
            if checkpoint:
                # lazy checkpoint: the signature collect below is the
                # materializing action, so each round costs ONE job
                # (eager=True would run a second, redundant one)
                current = current.localCheckpoint(eager=False)
            sig = _signature(current)
            if sig == previous_sig:
                break
            previous_sig = sig
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", parts_before)
    # post-state: every edge points node -> component representative
    members = current.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = current.select(F.col("dst").alias("node"), F.col("dst").alias("component"))
    return (
        members.unionByName(roots)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
