"""Bucketed-table evidence: co-located joins plan with NO shuffle.

At 100 TB the dominant cost of repeated joins on the same key (triples
on subject, links on symbol) is the exchange. Bucketing materializes
the partitioning INTO the table layout: `bucketBy(k, key)` +
`saveAsTable` records the hash-partitioning in the catalog, and every
later equi-join between two tables bucketed on the same key with the
same bucket count plans as a zip of pre-sorted buckets — zero Exchange
nodes, zero shuffle bytes, at any scale.

These tests prove the plan property itself (the artifact a 1000-executor
job relies on), not a wall-time: the bucketed self-join of the triples
frame and the bucketed join against the definitions dictionary both
plan without a single Exchange, while the identical un-bucketed join
plans with two.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # session warehouse is fixed at session start; use a unique db to
    # avoid cross-test table collisions instead
    db = "bucketing_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path: a broadcast join would bypass bucketing
    entirely on these (deliberately small) test tables — at 100 TB both
    sides are far past any broadcast threshold and SMJ-over-buckets is
    the plan being proven here."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_plans_without_shuffle(spark, warehouse, no_broadcast, source_files_500):
    from pyjelly_spark.operators.extract import extract_all

    spo = extract_all(source_files_500).select(
        F.col("s").cast("string").alias("s"),
        F.col("p").cast("string").alias("p"),
        F.sha2(F.to_json(F.struct("o")), 256).alias("o_key"),
    )
    for name in ("spo_a", "spo_b"):
        (
            spo.write.mode("overwrite")
            .bucketBy(8, "s")
            .sortBy("s")
            .saveAsTable(f"{warehouse}.{name}")
        )
    a = spark.table(f"{warehouse}.spo_a")
    b = spark.table(f"{warehouse}.spo_b")

    joined = a.join(b, "s")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert _n_exchanges(joined) == 0, f"bucketed join must not shuffle:\n{plan}"
    assert "Bucketed: true" in plan
    # and it computes the same thing as the shuffling plan
    plain = spark.createDataFrame(a.collect(), a.schema).join(
        spark.createDataFrame(b.collect(), b.schema), "s"
    )
    assert _n_exchanges(plain) > 0, "un-bucketed baseline should shuffle"
    assert joined.count() == plain.count()


def test_bucketed_aggregation_avoids_exchange(spark, warehouse, no_broadcast):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    (
        df.write.mode("overwrite")
        .bucketBy(8, "k")
        .sortBy("k")
        .saveAsTable(f"{warehouse}.kv")
    )
    agg = spark.table(f"{warehouse}.kv").groupBy("k").agg(F.sum("v").alias("s"))
    assert _n_exchanges(agg) == 0, "groupBy on the bucket key must not shuffle"
    rows = {r["k"]: r["s"] for r in agg.collect()}
    assert rows[0] == sum(v for v in range(0, 10_000) if v % 97 == 0)
