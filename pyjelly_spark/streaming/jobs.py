"""Structured Streaming jobs over the events stream.

The reference's "streaming" is bounded-memory incremental iteration
(SURVEY.md §2.8) — no event time, no watermarks. These jobs are the
Spark-native generalization the driver brief asks for, covering the
five canonical Structured Streaming shapes: event-time windowed
aggregation with watermarks for late data, a custom stateful operator
via ``applyInPandasWithState`` (sessionization), watermarked
exactly-once ingest dedup, a stream-stream event-time range join, and
stream-static dimension enrichment.

All jobs read the events parquet directory as a file stream
(``readStream``) and can run incrementally (``availableNow`` drains the
backlog and stops — used by tests and the batch-equivalence oracle).
At scale the same code points at a Kafka/file firehose; state stores
partition by the grouping key, so sizing = keys x window retention.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-stream over the events table.

    ``events_path`` may be a directory or a single ``*.parquet`` file
    (the file stream source requires a directory, so a file path becomes
    parent-dir + glob filter).
    """
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 4)
    if events_path.endswith(".parquet") and os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    return reader.parquet(events_path)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window per event_type with late-data watermark.

    Batch-equivalent semantics: with availableNow + complete/append drain,
    the result equals the batch groupBy on date_trunc(hour) — that
    equivalence is the DuckDB oracle for this operator.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


class _drain_partitions:
    """Temporarily lower ``spark.sql.shuffle.partitions`` while a
    bounded availableNow drain starts.

    Stateful streaming operators create one state-store instance per
    shuffle partition, and every micro-batch pays a per-partition commit
    (snapshot + WAL) regardless of how little state lives there — at the
    batch-job default (2x cores) an attribution join over 40k buffered
    rows spends ~10x longer committing 64 near-empty stores than joining.
    The partition count is captured when the query STARTS (it is baked
    into the state checkpoint), so setting it before ``.start()`` and
    restoring after the drain affects only the streaming query. A real
    long-lived stream sizes this to keys x retention instead; 8 is right
    for the bounded drains the tests and oracle gate run.
    """

    def __init__(self, spark: SparkSession, n: int = 8):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def run_windowed_counts_batchmode(
    spark: SparkSession, events_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Drain the event backlog with availableNow into a memory sink and
    return the final result table (used by tests and the oracle gate)."""
    result = windowed_counts(read_event_stream(spark, events_dir), window=window)
    name = "windowed_counts_sink"
    with _drain_partitions(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("last_ts", DoubleType(), False),
        StructField("session_id", LongType(), False),
    ]
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_id", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

SESSION_GAP_S = 1800.0


def _sessionize(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user session assignment with a 30 min
    inactivity gap, state carried across micro-batches.

    Vectorized: session breaks come from one diff-against-previous over
    the sorted timestamp array; closed-session sizes are diffs of the
    break positions. No per-event Python."""
    import numpy as np

    if state.exists:
        n_events, last_ts, session_id = state.get
    else:
        n_events, last_ts, session_id = 0, float("-inf"), 0
    out_sessions = []
    out_counts = []
    for pdf in batches:
        if not len(pdf):
            continue
        t = np.sort(
            pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        ) / 1e9
        prev = np.concatenate(([last_ts], t[:-1]))
        is_break = (t - prev) > SESSION_GAP_S
        if n_events == 0:
            is_break[0] = False  # nothing accumulated -> nothing to close
        breaks = np.nonzero(is_break)[0]
        if len(breaks):
            counts = np.diff(np.concatenate(([0], breaks)))
            counts[0] += n_events  # carried events close with session 0
            out_sessions.append(session_id + np.arange(len(breaks)))
            out_counts.append(counts)
            session_id += len(breaks)
            n_events = int(len(t) - breaks[-1])
        else:
            n_events += len(t)
        last_ts = float(t[-1])
    state.update((n_events, last_ts, session_id))
    if out_sessions:
        sessions = np.concatenate(out_sessions)
        yield pd.DataFrame(
            {
                "user_id": np.full(len(sessions), key[0], dtype="int64"),
                "session_id": sessions,
                "n_events": np.concatenate(out_counts),
            }
        )


def sessionized_counts(events: DataFrame) -> DataFrame:
    """applyInPandasWithState sessionization (custom stateful operator)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionized_batchmode(
    spark: SparkSession, events_dir: str, checkpoint_dir: Optional[str] = None
) -> DataFrame:
    events = read_event_stream(spark, events_dir)
    name = "sessionized_sink"
    writer = (
        sessionized_counts(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    with _drain_partitions(spark):
        q = writer.start()
        q.awaitTermination()
    return spark.table(name)


def deduped_type_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once ingest dedup: drop re-delivered events by
    key before aggregating — the standard at-least-once -> exactly-once
    repair in a training-data ingest path.

    ``dropDuplicates`` on a stream keeps per-key state; the watermark
    bounds that state (keys older than the watermark are evicted, so
    state is O(events within the watermark window), not O(stream
    history)) — the property that makes the operator viable on an
    unbounded 100 TB feed. Duplicates are exact copies (same ``ts``), so
    eviction can never split a duplicate pair across the watermark
    boundary.
    """
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def run_stream_dedup_batchmode(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Drain the event backlog with availableNow, with deterministic
    duplicate injection (every event_id % 3 == 0 event is delivered
    twice via a self-union of the stream — the at-least-once redelivery
    pattern), deduped by ``deduped_type_counts``. The result must equal
    the batch per-type distinct counts — the driver oracle gate
    (queries.py::SQL_STREAM_DEDUP)."""
    from pyspark.sql import functions as F

    ev = read_event_stream(spark, events_dir)
    redelivered = ev.where(F.col("event_id") % 3 == 0)
    result = deduped_type_counts(ev.unionByName(redelivered))
    name = "stream_dedup_sink"
    with _drain_partitions(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def view_purchase_pairs(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    horizon_minutes: int = 60,
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    every (view, purchase) pair by the same user where the purchase
    lands within ``horizon_minutes`` after the view — the attribution
    join of a clickstream pipeline.

    Both sides carry a watermark and the join condition bounds purchase
    time to [view_ts, view_ts + horizon], so Spark can evict buffered
    state from BOTH sides once the watermark passes the horizon: state
    is O(events inside watermark + horizon), never O(stream history) —
    what keeps a stream-stream join viable on an unbounded feed. The
    join output is append-only and, once the backlog drains, equal to
    the batch range join (the driver oracle).
    """
    v = (
        views.select(
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        ).withWatermark("view_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        ).withWatermark("purchase_ts", watermark)
    )
    joined = v.join(
        p,
        F.expr(
            f"""
            user_id = p_user_id AND
            purchase_ts >= view_ts AND
            purchase_ts <= view_ts + interval {horizon_minutes} minutes
            """
        ),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        # microsecond-exact difference (truncating each side to seconds
        # first would be off by one around sub-second boundaries)
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000"
        ).alias("secs_to_purchase"),
    )


def run_stream_join_batchmode(spark: SparkSession, events_dir: str) -> DataFrame:
    """Drain the backlog through the stream-stream attribution join with
    availableNow. Views and purchases are two INDEPENDENT file-stream
    sources over the same directory (each with its own offsets/state, as
    two Kafka topics would be), so the join exercises genuine two-source
    stream-stream buffering, not a self-union."""
    views = read_event_stream(spark, events_dir).where(
        F.col("event_type") == "view"
    )
    purchases = read_event_stream(spark, events_dir).where(
        F.col("event_type") == "purchase"
    )
    result = view_purchase_pairs(views, purchases)
    name = "stream_join_sink"
    with _drain_partitions(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def enriched_nation_counts(
    events: DataFrame, customer: DataFrame
) -> DataFrame:
    """Stream-static enrichment: the unbounded event stream inner-joins
    the static customer dimension (user -> nation), then aggregates per
    (nation, event type) — the standard dimension-join shape of a
    streaming ingest path.

    The static side is planned per micro-batch (Spark re-resolves it
    each trigger, so a dimension refresh is picked up without restarting
    the query) and is broadcast while it fits — no stream-side state is
    needed for a stream-static inner join, so this composes freely with
    downstream stateful aggregation. Value sums are exact integer cents
    (floor-scaled) so the batch oracle compares bit-exactly.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return (
        events.join(dim, "user_id")
        .groupBy("nationkey", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "sum_cents"
            ),
        )
    )


def run_stream_enrich_batchmode(
    spark: SparkSession, events_dir: str, customer_path: str
) -> DataFrame:
    """Drain the event backlog through the stream-static enrichment with
    availableNow; must equal the batch join+aggregate."""
    ev = read_event_stream(spark, events_dir)
    customer = spark.read.parquet(customer_path)
    result = enriched_nation_counts(ev, customer)
    name = "stream_enrich_sink"
    with _drain_partitions(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


ANOMALY_STATE_SCHEMA = StructType(
    [
        # trailing window of the last <=8 cents values, oldest first
        StructField("ring", StringType(), False),
    ]
)

ANOMALY_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("cents", LongType(), False),
        StructField("s8", LongType(), False),
        StructField("q8", LongType(), False),
    ]
)

ANOMALY_WINDOW = 8


def _rolling_anomaly(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: rolling z-score anomaly detection with
    a fixed ring of the user's last 8 values carried across
    micro-batches.

    Vectorized: one lexsort per batch (ts, event_id — the deterministic
    event order), rolling sums as cumsum differences over
    [carried ring || batch]. The 2-sigma test is the integer
    rearrangement (8c - S)^2 > 4(8Q - S^2), identical to the batch
    query/oracle (queries.py::SQL_EVENTS_ANOMALY), so the drained
    stream is gated bit-exactly against the batch rule. The ring is
    serialized as a comma string (state rows don't support arrays in
    the Arrow state codec across all versions).
    """
    import numpy as np

    if state.exists and state.get[0]:
        ring = np.array(
            [int(x) for x in state.get[0].split(",")], dtype="int64"
        )
    else:
        ring = np.empty(0, dtype="int64")
    w = ANOMALY_WINDOW
    outs = []
    for pdf in batches:
        if not len(pdf):
            continue
        order = np.lexsort(
            (
                pdf["event_id"].to_numpy(dtype="int64"),
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64"),
            )
        )
        cents = np.floor(
            pdf["value"].to_numpy(dtype="float64")[order] * 100
        ).astype("int64")
        eid = pdf["event_id"].to_numpy(dtype="int64")[order]
        full = np.concatenate([ring, cents])
        cs = np.concatenate(([0], np.cumsum(full)))
        qs = np.concatenate(([0], np.cumsum(full * full)))
        idx = np.arange(len(ring), len(full))
        has_window = idx >= w
        lo = np.maximum(idx - w, 0)
        s8 = cs[idx] - cs[lo]
        q8 = qs[idx] - qs[lo]
        dev = w * full[idx] - s8
        flag = has_window & (dev * dev > 4 * (w * q8 - s8 * s8))
        if flag.any():
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(
                            int(flag.sum()), key[0], dtype="int64"
                        ),
                        "event_id": eid[flag],
                        "cents": full[idx][flag],
                        "s8": s8[flag],
                        "q8": q8[flag],
                    }
                )
            )
        ring = full[-w:] if len(full) >= w else full
    state.update((",".join(str(int(x)) for x in ring),))
    yield from outs


def anomaly_flags(events: DataFrame) -> DataFrame:
    """applyInPandasWithState rolling z-score anomaly stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _rolling_anomaly,
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_anomaly_batchmode(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Drain the backlog through the stateful anomaly detector; must
    equal the batch window query (SQL_EVENTS_ANOMALY)."""
    events = read_event_stream(spark, events_dir)
    name = "stream_anomaly_sink"
    with _drain_partitions(spark):
        q = (
            anomaly_flags(events)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# --- streaming CDC: last-writer-wins upsert view ---------------------------

CDC_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("st", StringType(), True),
        StructField("val", LongType(), True),
        StructField("op", StringType(), True),
        StructField("ver", LongType(), True),
    ]
)

CDC_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ver", LongType(), False),
        StructField("op", StringType(), False),
        StructField("state", StringType(), True),
        StructField("val_cents", LongType(), True),
    ]
)


def _cdc_state(key, batches, state):
    """Per-key last-writer-wins under the (ts, event_id) total order,
    carried across micro-batches; emits the running winner once per
    batch the key appears in, with a monotonically increasing version
    so downstream keeps only each key's final emission. Deterministic
    under ANY file->micro-batch split: the state compares the batch
    winner against the carried winner on the same total order the
    batch oracle uses."""
    import numpy as np
    import pandas as pd

    if state.exists:
        ts_us, eid, st, val, op, ver = state.get
    else:
        ts_us, eid, st, val, op, ver = -1, -1, None, None, None, 0
    outs = []
    for pdf in batches:
        if not len(pdf):
            continue
        t = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        e = pdf["event_id"].to_numpy(dtype="int64")
        i = int(np.lexsort((e, t))[-1])  # batch winner under (ts, event_id)
        if (int(t[i]), int(e[i])) > (ts_us, eid):
            ts_us, eid = int(t[i]), int(e[i])
            et = str(pdf["event_type"].iloc[i])
            op = "D" if et == "error" else "U"
            st = et
            val = int(np.floor(float(pdf["value"].iloc[i]) * 100))
        ver += 1
        outs.append(
            pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "ver": [ver],
                    "op": [op],
                    "state": [st],
                    "val_cents": [val],
                }
            )
        )
    state.update((ts_us, eid, st, val, op, ver))
    yield from outs


def cdc_view(changes: DataFrame) -> DataFrame:
    """applyInPandasWithState streaming MERGE: the per-user running
    winner stream (filter to each key's max ``ver`` and drop op='D'
    rows to materialize the current upsert view)."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _cdc_state,
        outputStructType=CDC_OUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_cdc_batchmode(spark: SparkSession, events_dir: str) -> DataFrame:
    """Drain the change log through the stateful MERGE; the final
    emission per key (max ver), minus deletes, must equal batch
    compact_log over the same log."""
    from pyspark.sql.window import Window

    events = read_event_stream(spark, events_dir)
    changes = events.where(F.col("event_id") % 5 != 0)
    name = "stream_cdc_sink"
    with _drain_partitions(spark):
        q = (
            cdc_view(changes)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("ver").desc())
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "state", "val_cents")
    )


# --- streaming KMV distinct-count sketch ------------------------------------

KMV_K = 12

KMV_STATE_SCHEMA = StructType(
    [
        StructField("hs", StringType(), True),   # csv of the <=k smallest hashes
        StructField("ver", LongType(), True),
    ]
)

KMV_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("ver", LongType(), False),
        StructField("n_min", LongType(), False),
        StructField("kth_hash", LongType(), True),
    ]
)


def _kmv_update(key, pdfs, state):
    """Mergeable-synopsis state update: the k smallest distinct portable
    hashes seen so far. KMV's defining property — the sketch of a union
    is the k-min merge of the sketches — is what makes the streaming
    final state provably equal the batch sketch REGARDLESS of
    micro-batch boundaries; the gate exploits exactly that."""
    import hashlib

    import pandas as pd

    if state.exists:
        hs, ver = state.get
        cur = set(int(x) for x in hs.split(",")) if hs else set()
    else:
        cur, ver = set(), 0
    for pdf in pdfs:
        for u in set(pdf["user_id"].astype("int64").astype(str)):
            cur.add(int(hashlib.sha256(u.encode()).hexdigest()[:15], 16))
    mins = sorted(cur)[:KMV_K]
    ver += 1
    state.update((",".join(str(h) for h in mins), ver))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "ver": [ver],
            "n_min": [len(mins)],
            "kth_hash": [mins[KMV_K - 1] if len(mins) >= KMV_K else None],
        }
    )


def kmv_sketches(events: DataFrame) -> DataFrame:
    """applyInPandasWithState streaming KMV (distinct users per type)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _kmv_update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_kmv_batchmode(spark: SparkSession, events_dir: str) -> DataFrame:
    """Drain the backlog through the stateful KMV; the final emission
    per type (max ver) must equal the batch k-minimum-values sketch
    over the whole table (merge property, see _kmv_update)."""
    from pyspark.sql.window import Window

    events = read_event_stream(spark, events_dir)
    name = "stream_kmv_sink"
    with _drain_partitions(spark):
        q = (
            kmv_sketches(events)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = spark.table(name)
    w = Window.partitionBy("event_type").orderBy(F.col("ver").desc())
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & F.col("kth_hash").isNotNull())
        .select("event_type", "kth_hash")
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionization via Spark's BUILT-IN session_window operator —
    the engine-managed route (merging window state, watermark eviction)
    complementing the custom applyInPandasWithState sessionizer above.
    Boundary note: session_window merges events with gap < 30min
    (strict), the batch lag-rule merges <= 30min; the two agree on any
    input without an exact-boundary gap (asserted impossible-by-
    measurement on the test corpus at all scale factors)."""
    return events.groupBy(
        "user_id", F.session_window("ts", gap).alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))


def run_session_window_batchmode(
    spark: SparkSession, events_dir: str
) -> DataFrame:
    """Drain the backlog through the built-in session windows; the
    final windows must equal the batch gap-rule sessions (start =
    first event, count per session)."""
    events = read_event_stream(spark, events_dir)
    name = "session_window_sink"
    with _drain_partitions(spark):
        q = (
            session_window_counts(events)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.col("n_events").cast("long").alias("n_events"),
    )


def leaderboard_counts(events: DataFrame) -> DataFrame:
    """Unwindowed streaming aggregation for a live leaderboard: running
    (event_type, user_id) event counts. State is one long per distinct
    key — the engine-managed complete-mode aggregate (contrast with the
    bounded-state KMV/sketch routes above); at corpus scale the key
    space is users x 5 types, the same cardinality any batch groupBy
    shuffles."""
    return events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def run_stream_topk_batchmode(
    spark: SparkSession, events_dir: str, k: int = 3
) -> DataFrame:
    """Drain the backlog through the complete-mode leaderboard and
    return the final top-k users per event type; must equal the batch
    groupBy + rank exactly (complete mode re-emits the full state each
    trigger, so the last emission IS the total aggregate)."""
    from pyspark.sql.window import Window

    result = leaderboard_counts(read_event_stream(spark, events_dir))
    name = "stream_topk_sink"
    with _drain_partitions(spark):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    return (
        spark.table(name)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            "event_type", "user_id", F.col("cnt").cast("long").alias("cnt"),
            "rnk",
        )
    )
