"""Distributed order statistics WITHOUT a global sort.

``kth_smallest`` finds the exact k-th smallest value of an integer
column by iterative histogram bisection: each round is ONE bounded
aggregation job (counts into <= ``buckets`` range buckets — map-side
combined, so the shuffle moves O(buckets) rows per task regardless of
input size), after which the driver walks the tiny histogram to find
the bucket holding rank k and narrows the range. log_buckets(range)
rounds total — 2 rounds for 32-bit ranges at 256 buckets vs the
O(n log n) total sort a naive ORDER BY/OFFSET pays, and no single
partition ever holds more than its share of the scan.

This is the selection-algorithm complement to the sort-based
``percentile`` aggregate (exact but per-group sort) and the
TakeOrderedAndProject top-k (k must be small): here k can be anything
(median of 10^12 rows) with bounded memory everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kth_smallest(
    df: DataFrame,
    col: Column,
    k: int,
    buckets: int = 256,
    max_rounds: int = 16,
) -> int:
    """Exact k-th smallest (1-based, duplicates counted) of an integer
    column. Raises if k is out of range."""
    vals = df.select(col.cast("long").alias("v")).where(F.col("v").isNotNull())
    row = vals.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    ).collect()[0]
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if n == 0 or not (1 <= k <= n):
        raise ValueError(f"k={k} out of range for {n} rows")
    rank = k
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        span = hi - lo + 1
        width = (span + buckets - 1) // buckets
        # integer div (not FP /) so bucket assignment is exact at any
        # magnitude
        hist = dict(
            vals.where((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(F.expr(f"(v - {lo}) div {width}").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        acc = 0
        for b in range(buckets):
            c = hist.get(b, 0)
            if acc + c >= rank:
                rank -= acc
                lo, hi = lo + b * width, min(hi, lo + (b + 1) * width - 1)
                break
            acc += c
        else:  # pragma: no cover - rank always lands in some bucket
            raise AssertionError("rank not bracketed")
    if lo != hi:  # pragma: no cover - 16 rounds cover any int64 range
        raise AssertionError("did not converge")
    return lo
