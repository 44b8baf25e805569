"""Distributed k-means over embedding columns, in integer arithmetic.

Training-data pipelines cluster embeddings constantly — IVF coarse
quantizers (operators/similarity.py::ivf_topk consumes exactly such
centroids), topic-balanced data mixing, diversity sampling. The
reference has no counterpart (SURVEY.md §2.10 family); this is the
trainable dual of the fixed sha-derived centroids the IVF path ships
with.

Why integer: Lloyd's algorithm is a fixed recurrence, but float
summation order varies with partitioning, so a float implementation is
not oracle-gateable. Here vectors are scaled to BIGINT once
(``round(x * scale)`` — both engines round half-away-from-zero over
identical doubles), distances are exact integer sums of squares, and
centroid updates are exact integer means (``(s - s % n) div n`` — the
numerator is exactly divisible, so truncation-vs-floor division
semantics can't diverge). Every step is associative integer math →
bit-identical results regardless of engine, partitioning, or summation
order, and the DuckDB oracle unrolls the same recurrence
(queries.py::SQL_EMBEDDING_KMEANS). Same determinism design as
``pagerank_int`` / ``label_propagation`` (components.py).

Scale shape (per iteration):
- assignment is SHUFFLE-FREE: the k centroids are driver state (k*d
  longs — the same regime as MLlib's KMeans, whose centers live on the
  driver between iterations) embedded as an array literal, and the
  per-row argmin runs as one whole-stage-codegen ``aggregate`` over
  that k-element array. The corpus is never joined or re-keyed;
- update: ``posexplode`` of assigned vectors -> groupBy (cid, pos).
  Map-side partial aggregation means the one exchange per iteration
  moves O(k * d * partitions) partial sums, not the corpus;
- the corpus table is checkpointed once up front; nothing iterative
  accumulates lineage on it.

Seeding: the k lexicographically-smallest ids' vectors — deterministic,
engine-portable, and cheap (a k-row sorted take). A cluster that loses
all its points keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**6


def _int_vecs(
    vecs: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    v = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
    )
    return vecs.select(F.col(id_col).alias("vid"), v.alias("v"))


def _sqdist(a: Column, b: Column) -> Column:
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0).cast("long"), lambda acc, d: acc + d)


def _nearest_cid(centers: list[tuple[int, list[int]]]) -> Column:
    """Argmin over a literal centroid array, ties to the smallest cid —
    one codegen expression, no join, no shuffle."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).cast("long").alias("cid"),
                F.array(*[F.lit(int(x)).cast("long") for x in c]).alias("c"),
            )
            for cid, c in centers
        ]
    )
    init = F.struct(
        F.lit(None).cast("long").alias("dist"), F.lit(None).cast("long").alias("cid")
    )

    def step(acc: Column, e: Column) -> Column:
        d = _sqdist(F.col("v"), e.getField("c"))
        better = acc.getField("dist").isNull() | (d < acc.getField("dist"))
        return F.when(
            better, F.struct(d.alias("dist"), e.getField("cid").alias("cid"))
        ).otherwise(acc)

    return F.aggregate(cent_arr, init, step).getField("cid")


def _assign(pts: DataFrame, centers: list[tuple[int, list[int]]]) -> DataFrame:
    return pts.select("vid", "v", _nearest_cid(centers).alias("cid"))


def _update(
    assigned: DataFrame, centers: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    flat = assigned.select("cid", F.posexplode("v").alias("pos", "val"))
    sums = (
        flat.groupBy("cid", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("cid", "pos", F.expr("(s - (s % n)) div n").alias("m"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for row in sums:
        by_cid.setdefault(row["cid"], {})[row["pos"]] = row["m"]
    out = []
    for cid, prev in centers:
        got = by_cid.get(cid)
        if got is None:
            out.append((cid, prev))  # empty cluster keeps its centroid
        else:
            out.append((cid, [got[i] for i in range(len(prev))]))
    return out


def kmeans_int(
    vecs: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fixed-iteration integer Lloyd's k-means. Returns the final
    assignment ``(vid, cid)`` (cid in 1..k) for every input vector,
    labeled against the post-update centroids — the same convention the
    unrolled DuckDB oracle uses.
    """
    pts = _int_vecs(vecs, id_col, vec_col, scale).localCheckpoint(eager=True)
    seed_rows = pts.orderBy("vid").limit(k).collect()
    centers = [(i + 1, list(r["v"])) for i, r in enumerate(seed_rows)]
    for _ in range(iterations):
        centers = _update(_assign(pts, centers), centers)
    return _assign(pts, centers).select("vid", "cid")


def cluster_profile(assignment: DataFrame, pts_src: DataFrame) -> DataFrame:
    """Per-cluster summary (size, id range) — the grouped view a data-
    mixing stage consumes."""
    return assignment.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("vid").alias("min_vid"),
        F.max("vid").alias("max_vid"),
    )
