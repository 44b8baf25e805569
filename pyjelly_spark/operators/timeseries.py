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
from pyspark.sql import DataFrame
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
