"""Sequential time-series recurrences that Catalyst windows can't express.

An EWMA with per-step integer floor division is a *data-dependent
recurrence*: m_t = (a*c_t + (d-a)*m_{t-1}) // d has no closed form once
each step floors, so it cannot be rewritten as a window aggregate the
way the trailing z-score (queries.py::q_events_anomaly) can. The
correct distributed shape is therefore: one hash exchange on the series
key, then a per-key sequential scan inside an Arrow-batched
``applyInPandas`` — parallelism comes *across* keys (billions of users
at 100 TB), while each key's scan is inherently serial and short.

Because every step is integer arithmetic, the result is bit-exact and
the DuckDB oracle can unroll the identical recurrence as a recursive
CTE (queries.py::SQL_EVENTS_EWMA) — no float variance between engines.

Reference parity note: the reference pipeline (pyjelly) has no
time-series surface; this extends the engine for training-data
curation workloads (smoothed activity signals for sampling weights).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma_int(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Integer-exact EWMA of ``value`` cents per user, ordered by
    (ts, event_id).

    m_1 = c_1;  m_t = (alpha_num*c_t + (alpha_den-alpha_num)*m_{t-1})
    // alpha_den.  With the default alpha = 1/4 each step is
    (c + 3*m) // 4.  All int64: cents fit in ~2^26 and the recurrence
    is a convex combination, so no overflow is possible.

    Plan shape: project to 4 columns -> one hash exchange on user_id ->
    per-group Arrow batch -> sequential numpy scan. The Python-level
    loop is per *key*, not per row-at-a-time UDF calls: Arrow moves the
    whole group in one batch and the loop body is 3 integer ops. At
    100 TB the exchange is the cost and it is the minimum possible one
    (the recurrence forces co-location of each key's history).
    """
    a, d = alpha_num, alpha_den
    if not (0 < a < d):
        raise ValueError("require 0 < alpha_num < alpha_den")
    b = d - a

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        c = pdf["cents"].to_numpy(dtype=np.int64)
        m = np.empty_like(c)
        if len(c):
            acc = int(c[0])
            m[0] = acc
            for i in range(1, len(c)):
                acc = (a * int(c[i]) + b * acc) // d
                m[i] = acc
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "cents": c,
                "ewma": m,
            }
        )

    base = events.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return base.groupBy("user_id").applyInPandas(
        compute, "user_id long, event_id long, cents long, ewma long"
    )


def holt_int(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
) -> DataFrame:
    """Integer-exact Holt double exponential smoothing (level + trend)
    of ``value`` cents per user, ordered by (ts, event_id).

    l_1 = c_1, b_1 = 0; then with f = l_{t-1} + b_{t-1}:
        l_t = floor((alpha*c_t + (1-alpha)*f))         [fixed-point]
        b_t = floor((beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}))
    Every step floors (floor division toward -inf, matching Python //;
    the DuckDB oracle emulates it for negative trends, where DuckDB's
    ``//`` truncates toward zero instead).

    Same plan shape as :func:`ewma_int`: one hash exchange on user_id,
    per-key Arrow batch, 6-integer-op sequential loop — the minimum
    co-location the recurrence admits.
    """
    a, d = alpha_num, alpha_den
    p, q = beta_num, beta_den
    if not (0 < a < d and 0 < p < q):
        raise ValueError("require 0 < alpha < 1 and 0 < beta < 1")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        c = pdf["cents"].to_numpy(dtype=np.int64)
        lv = np.empty_like(c)
        tr = np.empty_like(c)
        if len(c):
            level, trend = int(c[0]), 0
            lv[0], tr[0] = level, trend
            for i in range(1, len(c)):
                f = level + trend
                new_level = (a * int(c[i]) + (d - a) * f) // d
                trend = (p * (new_level - level) + (q - p) * trend) // q
                level = new_level
                lv[i], tr[i] = level, trend
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "cents": c,
                "level": lv,
                "trend": tr,
            }
        )

    base = events.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return base.groupBy("user_id").applyInPandas(
        compute,
        "user_id long, event_id long, cents long, level long, trend long",
    )


def holt_winters_int(
    daily: DataFrame,
    season: int = 7,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
    gamma_num: int = 1,
    gamma_den: int = 4,
) -> DataFrame:
    """Integer-exact additive Holt-Winters (level + trend + seasonal)
    over per-key daily totals ``(key, d, cents)``, row-ordered by d.

    Deterministic integer init over the first ``season`` rows:
        l_m = floor(sum(c_1..c_m) / m), b_m = 0, s_i = c_i - l_m.
    For t > m (the only rows emitted), with fdiv = floor division:
        forecast_t = l_{t-1} + b_{t-1} + s_{t-m}
        l_t = fdiv(a*(c_t - s_{t-m}) + (d-a)*(l_{t-1}+b_{t-1}), d)
        b_t = fdiv(p*(l_t - l_{t-1}) + (q-p)*b_{t-1}, q)
        s_t = fdiv(g*(c_t - l_t) + (h-g)*s_{t-m}, h)
    Every division floors (Python ``//``); the DuckDB oracle emulates
    flooring for the negative intermediates (trend/seasonal go
    negative), the same cross-engine hazard holt_int pins.

    Keys with <= ``season`` rows emit nothing. The recurrence is
    row-ordered (rn), not calendar-aligned — compose with a gap-fill
    when the calendar matters. One hash exchange on the key; the
    per-key Arrow batch runs the O(n) integer loop.
    """
    a, d = alpha_num, alpha_den
    p, q = beta_num, beta_den
    g, h = gamma_num, gamma_den
    m = season
    if not (0 < a < d and 0 < p < q and 0 < g < h and m >= 2):
        raise ValueError("require 0 < alpha,beta,gamma < 1 and season >= 2")

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d", kind="mergesort")
        c = pdf["cents"].to_numpy(dtype=np.int64)
        n = len(c)
        if n <= m:
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=object),
                    "rn": pd.Series([], dtype=np.int64),
                    "cents": pd.Series([], dtype=np.int64),
                    "level": pd.Series([], dtype=np.int64),
                    "trend": pd.Series([], dtype=np.int64),
                    "seasonal": pd.Series([], dtype=np.int64),
                    "forecast": pd.Series([], dtype=np.int64),
                }
            )
        level = int(c[:m].sum()) // m
        trend = 0
        seas = [int(c[i]) - level for i in range(m)]  # s_1..s_m
        out_rn, out_c, out_l, out_b, out_s, out_f = [], [], [], [], [], []
        for t in range(m, n):  # 0-based; rn = t+1
            s_lag = seas[t - m]
            f = level + trend + s_lag
            new_level = (a * (int(c[t]) - s_lag) + (d - a) * (level + trend)) // d
            new_trend = (p * (new_level - level) + (q - p) * trend) // q
            new_seas = (g * (int(c[t]) - new_level) + (h - g) * s_lag) // h
            level, trend = new_level, new_trend
            seas.append(new_seas)
            out_rn.append(t + 1)
            out_c.append(int(c[t]))
            out_l.append(level)
            out_b.append(trend)
            out_s.append(new_seas)
            out_f.append(f)
        key = pdf["key"].iloc[0]
        return pd.DataFrame(
            {
                "key": [key] * len(out_rn),
                "rn": np.array(out_rn, dtype=np.int64),
                "cents": np.array(out_c, dtype=np.int64),
                "level": np.array(out_l, dtype=np.int64),
                "trend": np.array(out_b, dtype=np.int64),
                "seasonal": np.array(out_s, dtype=np.int64),
                "forecast": np.array(out_f, dtype=np.int64),
            }
        )

    return daily.groupBy("key").applyInPandas(
        compute,
        "key string, rn long, cents long, level long, trend long, "
        "seasonal long, forecast long",
    )


def fifo_allocate(
    events: DataFrame,
    supply_type: str = "purchase",
    demand_type: str = "click",
) -> DataFrame:
    """FIFO allocation of demand against supply lots per user — the
    warehouse/cost-basis matching primitive (FIFO inventory, tax-lot
    accounting) — WITHOUT the quadratic lot x demand pairing join.

    In cumulative space, supply lot i owns the interval
    (S_{i-1}, S_i] of its running total and demand j owns
    (D_{j-1}, D_j]; a FIFO allocation is exactly the overlap of the
    two partitions of [0, T], T = min(S_total, D_total). The sweep
    unions the two breakpoint sets, and each gap between consecutive
    distinct breakpoints is one allocation whose lot/demand ordinals
    are running counts of breakpoints strictly before it — so the
    number of allocation rows is <= n_lots + n_demands - 1 (never
    n_lots * n_demands) and the whole operator is ONE shuffle on
    user_id shared by every window (cumsums, lag, running ordinal
    counts). Zero-amount lots collapse naturally: their duplicate
    breakpoint advances the ordinal without emitting a segment.

    Amounts are floor(value*100) integer cents, so every cumsum,
    ordinal and checksum is exact on any partitioning/engine.

    Returns per user (only users with both a supply and a demand row):
    n_lots, n_demands, n_allocs, allocated_c (= T), surplus_c,
    unfilled_c, alloc_chk — the checksum folds each segment's
    (length, lot ordinal, demand ordinal) triple, pinning the exact
    FIFO pairing, not just the totals.
    """
    w_order = ["ts", "event_id"]

    def cums(kind: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(*w_order)
        return (
            events.where(F.col("event_type") == kind)
            .select(
                "user_id",
                "ts",
                "event_id",
                F.floor(F.col("value") * 100).cast("long").alias("amt"),
            )
            .select(
                "user_id",
                F.sum("amt").over(w).alias("pos"),
            )
        )

    sup = cums(supply_type)
    dem = cums(demand_type)
    tot = (
        sup.groupBy("user_id").agg(F.max("pos").alias("s_tot"), F.count(F.lit(1)).alias("n_lots"))
        .join(
            dem.groupBy("user_id").agg(F.max("pos").alias("d_tot"), F.count(F.lit(1)).alias("n_demands")),
            "user_id",
        )
        .select(
            "user_id", "n_lots", "n_demands", "s_tot", "d_tot",
            F.least("s_tot", "d_tot").alias("t_alloc"),
        )
    )
    pts = (
        sup.select("user_id", "pos", F.lit(1).alias("sc"), F.lit(0).alias("dc"))
        .unionByName(
            dem.select("user_id", "pos", F.lit(0).alias("sc"), F.lit(1).alias("dc"))
        )
        .groupBy("user_id", "pos")
        .agg(F.sum("sc").alias("sc"), F.sum("dc").alias("dc"))
    )
    wp = Window.partitionBy("user_id").orderBy("pos")
    wprev = wp.rowsBetween(Window.unboundedPreceding, -1)
    segs = (
        pts.select(
            "user_id",
            "pos",
            F.coalesce(F.lag("pos").over(wp), F.lit(0)).alias("prev_pos"),
            (F.coalesce(F.sum("sc").over(wprev), F.lit(0)) + 1).alias("lot_ord"),
            (F.coalesce(F.sum("dc").over(wprev), F.lit(0)) + 1).alias("dem_ord"),
        )
        .join(tot, "user_id")
        .where((F.col("pos") <= F.col("t_alloc")) & (F.col("pos") > F.col("prev_pos")))
        .select(
            "user_id",
            "n_lots",
            "n_demands",
            "s_tot",
            "d_tot",
            "t_alloc",
            (F.col("pos") - F.col("prev_pos")).alias("seg_len"),
            "lot_ord",
            "dem_ord",
        )
    )
    return (
        segs.groupBy("user_id")
        .agg(
            F.first("n_lots").cast("long").alias("n_lots"),
            F.first("n_demands").cast("long").alias("n_demands"),
            F.count(F.lit(1)).cast("long").alias("n_allocs"),
            F.first("t_alloc").cast("long").alias("allocated_c"),
            (F.first("s_tot") - F.first("t_alloc")).cast("long").alias("surplus_c"),
            (F.first("d_tot") - F.first("t_alloc")).cast("long").alias("unfilled_c"),
            F.sum(
                F.col("seg_len")
                * F.pmod(F.col("lot_ord") * 31 + F.col("dem_ord"), F.lit(1000003))
            ).cast("long").alias("alloc_chk"),
        )
    )
