"""Change-data-capture operators: log compaction and snapshot MERGE.

The lakehouse maintenance primitives (Delta/Iceberg ``MERGE INTO``
semantics, Kafka-style log compaction) expressed as Catalyst plans:

- ``compact_log``: collapse a keyed change log (upserts + deletes) to
  the final state per key — last writer wins under an explicit total
  order, deletes drop the key. ONE hash exchange (the key window);
  no joins, no driver state.
- ``merge_snapshot``: apply a change log to a base snapshot. The base
  is treated as the oldest log segment (every base row an upsert that
  loses to any real change), so MERGE is a union + the same one-
  exchange compaction instead of the textbook join-then-case plan.
  At the physical layer a table format would prune untouched files;
  logically the result is exactly ``MERGE WHEN MATCHED UPDATE /
  WHEN MATCHED AND op='D' DELETE / WHEN NOT MATCHED INSERT``.

Determinism contract: ``order_cols`` must be a total order within each
key (callers append a unique tiebreaker such as ``event_id``); with
ties the result would be partition-order-dependent, which the driver's
oracle gate would catch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_log(
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Final state per key from a change log: the row with the highest
    ``order_cols`` wins; if that row is a delete the key is absent.
    Output drops the op column and keeps every other change column.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .where(F.col(op_col) != delete_op)
        .drop("__rn", op_col)
    )


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE a change log into a base snapshot.

    ``base`` carries the change schema minus ``op_col`` and
    ``order_cols``; it is injected as the oldest log segment (op =
    upsert, order columns NULL, which ``desc_nulls_last`` ranks below
    every real change), then the union compacts in one exchange.
    """
    aligned = base.withColumn(op_col, F.lit("U"))
    for c in order_cols:
        dtype = dict(changes.dtypes)[c]
        aligned = aligned.withColumn(c, F.lit(None).cast(dtype))
    aligned = aligned.select(*changes.columns)
    return compact_log(
        aligned.unionByName(changes), keys, order_cols, op_col, delete_op
    )


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log:
    every upsert opens an interval valid from its own first order
    column until the NEXT change for the key (lead over the full
    order — a delete closes the prior interval and opens none);
    ``is_current`` marks still-open intervals. Same one-key-window
    exchange shape as ``compact_log``; the two compose (compacted
    state == the is_current slice of the history, minus deletes).
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        changes.withColumn("valid_to", F.lead(F.col(order_cols[0])).over(w))
        .where(F.col(op_col) != delete_op)
        .withColumnRenamed(order_cols[0], "valid_from")
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col)
    )


def maintain_counts(
    view: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    count_col: str = "n",
    op_col: str = "op",
    add_op: str = "add",
) -> DataFrame:
    """Incremental view maintenance for count aggregates: apply a
    (op, keys) delta stream to a materialized per-key count view
    without recomputing from base data — adds contribute +1, every
    other op -1, groups that reach zero vanish. One groupBy over the
    (small) delta plus one full-outer join against the view: cost
    scales with |delta| + |view|, never with the base relation, which
    is the whole point of IVM at 100 TB."""
    d = delta.groupBy(*keys).agg(
        F.sum(
            F.when(F.col(op_col) == add_op, F.lit(1)).otherwise(F.lit(-1))
        ).cast("long").alias("__d")
    )
    merged = view.join(d, list(keys), "full")
    new_n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("__d"), F.lit(0)
    )
    return (
        merged.withColumn(count_col, new_n.cast("long"))
        .where(F.col(count_col) > 0)
        .drop("__d")
    )
