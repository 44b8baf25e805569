"""Similarity search over embedding columns (array<float>).

Two paths, per the driver brief:

- brute-force cosine top-k — the exact baseline. All arithmetic is
  JVM-side higher-order functions (``zip_with`` + ``aggregate`` fold), no
  Python per row. O(n^2) dot products; right answer for re-ranking and
  for oracle checks.
- bucketed ANN (sign-LSH) — the scale path: deterministic hyperplanes
  derived from hashed unit directions, docs bucketed by the sign pattern;
  top-k is computed within (multi-probed) buckets. Recall < 1 by design;
  at 100 TB this is the only tractable shape (the bucket join replaces
  the n^2 cross join, and each bucket fits one task).

No counterpart in the reference (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the pairwise products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return emb.withColumn("v", v).withColumn(
        "norm", F.sqrt(_dot(F.col("v"), F.col("v")))
    )


def cosine_topk(
    emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (vec_id, neighbor_id,
    rank, score).

    Plan shape: broadcast one side of the self-join (the vector table is
    assumed to be the small, index-able side at query time; for
    corpus x corpus at scale use :func:`ann_topk`). Rank ties break on
    neighbor_id ascending, so output is fully deterministic.
    """
    base = with_norm(emb, vec_col).select(
        F.col(id_col).alias("id"), "v", "norm"
    )
    left = base.select(
        F.col("id").alias("vec_id"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    right = base.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    scored = (
        left.join(F.broadcast(right), left.vec_id != right.neighbor_id)
        .withColumn("score", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .select("vec_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            "rank",
            # floor-scaling, not round(): rounding-mode-proof across engines
            (F.floor(F.col("score") * 10000) / 10000).alias("score"),
        )
    )


def _hyperplane(dim: int, p: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane p (no RNG state:
    closed-form from (p, i) via a splitmix-style integer mix)."""
    out = []
    for i in range(dim):
        z = (p * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z = (z ^ (z >> 31)) * 0x94D049BB133111EB & ((1 << 64) - 1)
        out.append(((z >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH bucketing (100 TB path).

    ``n_tables`` independent hash tables of ``n_planes`` sign bits each
    (signs of dots with deterministic hyperplanes); candidates are pairs
    colliding in any table's bucket, with 1-bit multi-probe on the query
    side for recall. The per-bucket equi-join replaces the n^2 cross
    join; recall follows the classic LSH 1-(1-p^r)^L curve.
    """
    dim = len(emb.select(vec_col).first()[0])
    base = with_norm(emb, vec_col).select(F.col(id_col).alias("id"), "v", "norm")
    sig_cols = []
    for t in range(n_tables):
        sig = F.lit(0)
        for p in range(n_planes):
            plane = _hyperplane(dim, t * n_planes + p)
            plane_col = F.array(*[F.lit(x) for x in plane])
            sig = sig + F.when(
                _dot(F.col("v"), plane_col) > 0, F.lit(1 << p)
            ).otherwise(F.lit(0))
        sig_cols.append((sig + F.lit(t << 16)).alias(f"sig{t}"))
    signed = base.select("id", "v", "norm", *sig_cols).cache()
    anchor_buckets = [F.col(f"sig{t}") for t in range(n_tables)]
    probe_buckets = []
    for t in range(n_tables):
        probe_buckets.append(F.col(f"sig{t}"))
        probe_buckets += [
            F.col(f"sig{t}").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    anchors = signed.select(
        F.col("id").alias("vec_id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        F.explode(F.array(*anchor_buckets)).alias("bucket"),
    )
    cands = signed.select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        F.explode(F.array(*probe_buckets)).alias("bucket"),
    )
    scored = (
        anchors.join(cands, "bucket")
        .where(F.col("vec_id") != F.col("neighbor_id"))
        .withColumn(
            "score", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        )
        .select("vec_id", "neighbor_id", "score")
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            "rank",
            # floor-scaling, not round(): rounding-mode-proof across engines
            (F.floor(F.col("score") * 10000) / 10000).alias("score"),
        )
    )
