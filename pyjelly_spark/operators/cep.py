"""Complex-event-processing over batch event logs: time-constrained
sequence matching — the MATCH_RECOGNIZE / Flink-CEP analogue for the
``A then B then C, each within T of the previous`` pattern family.

Semantics: greedy earliest extension (AFTER MATCH SKIP ... 'earliest'
family): step 1 anchors at the key's earliest step-1 event; each later
step takes the earliest qualifying event strictly after the previous
step's match and within ``within_s`` seconds of it. Greedy matching is
deterministic and expressible as an unrolled SQL recurrence (what the
driver oracle runs); like Flink's default it can miss chains a
backtracking matcher would find when a later anchor would qualify —
that trade is documented, not hidden.

Scale shape: one filtered scan + one (min) aggregation per step, keyed
by the sequence key; each step's frame is one row per surviving key, so
the chaining joins broadcast the shrinking side under AQE. No window
over the whole event stream, no per-key state materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_sequence(
    events: DataFrame,
    steps: Sequence[str],
    within_s: int,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Keys completing the whole pattern, with each step's match time.

    Returns one row per matching key: (key, t_1 .. t_n) where t_i is
    the i-th step's matched timestamp under greedy earliest extension.
    """
    if not steps:
        raise ValueError("match_sequence requires at least one step")
    ev = events.select(key, type_col, ts_col)
    acc: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        e = ev.where(F.col(type_col) == step)
        if acc is not None:
            e = e.join(acc, key).where(
                (F.col(ts_col) > F.col(f"t_{i - 1}"))
                & (
                    F.col(ts_col)
                    <= F.col(f"t_{i - 1}") + F.expr(f"INTERVAL {within_s} SECOND")
                )
            )
        matched = e.groupBy(key, *[f"t_{j}" for j in range(1, i) if acc is not None]).agg(
            F.min(ts_col).alias(f"t_{i}")
        )
        acc = matched
    return acc


# Viterbi decoding cost model (integer costs ~ negative log-likelihoods):
# two hidden states over the five event types in alphabetical order
# [click, error, purchase, signup, view]. Shared verbatim with the
# DuckDB oracle's unrolled DP.
VITERBI_INIT = [0, 2]
VITERBI_TRANS = [[1, 4], [3, 1]]  # TRANS[s_prev][s_next]
VITERBI_EMIT = [[1, 5, 1, 2, 3], [4, 1, 3, 3, 1]]  # EMIT[state][obs]
VITERBI_OBS = ["click", "error", "purchase", "signup", "view"]
VITERBI_MAX_OBS = 40


def viterbi_decode(events: DataFrame) -> DataFrame:
    """Min-cost hidden-state decoding (Viterbi) of each user's first
    40 events under the fixed integer cost model above — the sequence
    DP that is genuinely SEQUENTIAL per key, implemented the way a
    100 TB Spark pipeline should: ``applyInPandas`` over user groups,
    Arrow-batched, with a numpy DP whose state is 2 costs per user —
    the per-key work is O(len * states^2) and keys parallelize
    perfectly. Integer costs mean the result is bit-exact on any
    engine, so the oracle (a 40-round unrolled min-plus recurrence)
    gates the distributed run exactly.

    Returns per user: n_obs, cost0, cost1 (final per-state costs),
    best_cost, best_state (ties to state 0).
    """
    import numpy as np
    import pandas as pd

    obs_idx = {t: i for i, t in enumerate(VITERBI_OBS)}
    init = np.array(VITERBI_INIT, dtype=np.int64)
    trans = np.array(VITERBI_TRANS, dtype=np.int64)
    emit = np.array(VITERBI_EMIT, dtype=np.int64)

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).head(VITERBI_MAX_OBS)
        seq = pdf["event_type"].map(obs_idx).to_numpy()
        d = init + emit[:, seq[0]]
        for o in seq[1:]:
            # d_next[s] = min_{s'} d[s'] + trans[s'][s] + emit[s][o]
            d = (d[:, None] + trans).min(axis=0) + emit[:, o]
        best = int(d.argmin())  # argmin ties to the lower index
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_obs": [len(seq)],
                "cost0": [int(d[0])],
                "cost1": [int(d[1])],
                "best_cost": [int(d.min())],
                "best_state": [best],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        # the cost model defines exactly these observations; an unseen
        # type would otherwise map to NaN and crash the numpy DP with an
        # opaque executor error deep inside the pandas UDF
        .where(F.col("event_type").isin(VITERBI_OBS))
        .groupBy("user_id")
        .applyInPandas(
            decode,
            "user_id long, n_obs long, cost0 long, cost1 long,"
            " best_cost long, best_state long",
        )
    )
