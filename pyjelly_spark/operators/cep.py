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
