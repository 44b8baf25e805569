"""Exact closed-form regression via distributed sufficient statistics.

The 100 TB shape for linear models: a SINGLE aggregation pass collects
the normal-equation sufficient statistics (sum, cross-products) with
map-side partial aggregation — the shuffle moves one tiny row per task,
never the data — and the solve is O(d^3) driver-free arithmetic on a
1-row frame. With integer features the statistics are exact integers,
so Cramer's rule over decimal(38,0)/HUGEINT yields COEFFICIENTS THAT
ARE EXACT RATIONALS truncated identically in any engine: the whole fit
is oracle-gateable bit-for-bit, unlike float OLS whose summation order
drifts under partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_fit_2feature(
    rows: DataFrame,
    x1: str,
    x2: str,
    y: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact OLS fit of ``y ~ 1 + x1 + x2`` over integer columns.

    Returns one row (n, beta0_x1e6, beta1_x1e6, beta2_x1e6, singular):
    the intercept and slopes as Cramer-determinant ratios scaled by 1e6
    and truncated (``div``), computed entirely in decimal(38,0) —
    integer-exact at any partitioning. Sums fit decimal(38,0) for
    n * max(|x|)^2 * max(|y|) well past 10^30; inputs beyond that need
    a rescale (documented contract, asserted nowhere hot).

    ``singular`` is true when the normal-equation determinant is zero
    (collinear or constant features); the betas are then NULL (guarded
    explicitly, so ANSI mode cannot raise DIVIDE_BY_ZERO) and the flag
    makes that outcome explicit instead of silent.
    """
    s = rows.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col(x1)).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col(x2)).cast("decimal(38,0)").alias("s2"),
        F.sum(F.col(y)).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col(x1) * F.col(x1)).cast("decimal(38,0)").alias("s11"),
        F.sum(F.col(x1) * F.col(x2)).cast("decimal(38,0)").alias("s12"),
        F.sum(F.col(x2) * F.col(x2)).cast("decimal(38,0)").alias("s22"),
        F.sum(F.col(x1) * F.col(y)).cast("decimal(38,0)").alias("s1y"),
        F.sum(F.col(x2) * F.col(y)).cast("decimal(38,0)").alias("s2y"),
    )
    # det of [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] and the three
    # b-substituted determinants, b = (sy, s1y, s2y).
    det = (
        "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
    )
    det0 = (
        "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)"
        " + s2*(s1y*s12 - s11*s2y))"
    )
    det1 = (
        "(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)"
        " + s2*(s1*s2y - s1y*s2))"
    )
    det2 = (
        "(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)"
        " + sy*(s1*s12 - s11*s2))"
    )
    def beta(num: str, name: str):
        # IF short-circuits, so a singular design matrix yields NULL in
        # both ANSI (where div 0 would raise) and non-ANSI mode
        return F.expr(
            f"IF({det} = 0, NULL, cast({num} * {scale} div {det} as bigint))"
        ).alias(name)

    return s.select(
        F.col("n").cast("long").alias("n"),
        beta(det0, "beta0_x1e6"),
        beta(det1, "beta1_x1e6"),
        beta(det2, "beta2_x1e6"),
        F.expr(f"{det} = 0").alias("singular"),
    )
