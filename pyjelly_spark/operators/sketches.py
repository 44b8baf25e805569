"""Distinct-count sketches with engine-portable hashes.

KMV (k-minimum-values): over a set S of keys hashed uniformly into
[0, 2^60), the k-th smallest hash R_k estimates |S| as
(k-1) * 2^60 / R_k. Unlike Spark's built-in HLL
(``approx_count_distinct``), the KMV synopsis here is built on the
repo's portable 60-bit sha256 hash (functions/text.py::hex_hash), so a
DuckDB oracle computes the *identical* integer estimate — the sketch
itself is gate-able, not just its error bound.

Scale shape (the part that matters at 100 TB): the naive plan sorts
every distinct hash per group to find the k-th — a per-group sort of
potentially billions of rows. This operator prunes first: a cheap
HLL pass estimates each group's cardinality n, and only hashes below
~margin*k/n * 2^60 survive into the sort (expected survivors ~margin*k
per group, i.e. hundreds, regardless of n). The threshold only ever
*removes* rows above the k-th value, so the answer is unchanged; a
driver-side safety check recomputes any group the prune left with < k
survivors (can only happen under adversarial hash skew, and group
counts are tiny), so correctness never depends on the HLL estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyjelly_spark.functions.text import hex_hash

_HASH_SPACE = 1 << 60
# (k-1) * 2^60 exceeds int64 for k=16 -> route through decimal(38,0)
# in Spark / HUGEINT in DuckDB; `div` keeps the result integral.


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 16,
    prune_margin: int = 8,
    prune_min: int = 4096,
) -> DataFrame:
    """K-minimum-values distinct-count sketch of ``key_col`` per
    ``group_col``.

    Returns (group, kth_hash, est_distinct, exact_n): the k-th smallest
    distinct 60-bit hash, the integer KMV estimate
    (k-1)*2^60 // kth_hash, and the exact distinct count (carried for
    the correctness gate / error inspection; a production rollup would
    drop it).

    Groups with fewer than k distinct keys are omitted (the sketch is
    undefined there — standard KMV falls back to exact counting below
    k, which ``exact_n`` already covers).
    """
    hashes = (
        df.select(F.col(group_col).alias("g"), hex_hash(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )

    # Prune pass: per-group HLL estimate -> broadcast threshold map.
    # Skip groups the HLL thinks are small (threshold would not pay for
    # itself) by setting their threshold to the full hash space.
    apx = df.groupBy(F.col(group_col).alias("g")).agg(
        F.approx_count_distinct(key_col).alias("apx")
    )
    thr = apx.select(
        "g",
        F.when(
            F.col("apx") >= prune_min,
            F.expr(f"cast({_HASH_SPACE * prune_margin * k} as decimal(38,0))")
            / F.col("apx"),
        )
        .otherwise(F.expr(f"cast({_HASH_SPACE} as decimal(38,0))"))
        .cast("long")
        .alias("thr"),
    )
    pruned = hashes.join(F.broadcast(thr), "g").where(F.col("h") <= F.col("thr"))

    # Safety net: any group the prune starved below k survivors (or
    # dropped entirely) falls back to its unpruned hashes. The check is
    # one tiny aggregate (one row per group).
    starved = [
        r["g"]
        for r in apx.join(
            pruned.groupBy("g").agg(F.count(F.lit(1)).alias("surv")), "g", "left"
        )
        .where((F.col("surv").isNull()) | (F.col("surv") < k))
        .select("g")
        .collect()
    ]
    cand = pruned.select("g", "h")
    if starved:
        cand = cand.where(~F.col("g").isin(starved)).unionByName(
            hashes.where(F.col("g").isin(starved))
        )

    w = Window.partitionBy("g").orderBy("h")
    kth = (
        cand.select("g", "h", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == k)
        .select("g", F.col("h").alias("kth_hash"))
    )
    exact = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("k_"))
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    est_num = (k - 1) * _HASH_SPACE
    return (
        kth.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "kth_hash",
            F.expr(
                f"cast(cast({est_num} as decimal(38,0)) div kth_hash as bigint)"
            ).alias("est_distinct"),
            "exact_n",
        )
    )
