"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: full KG triple construction (extraction +
  linking + canonicalization) over the derived source-code table at
  sf0.001; returns the flat (s, p, o) triples DataFrame.
- ``queries()`` / ``oracle_sql()`` — one entry per implemented operator
  family; see pyjelly_spark/queries.py for the definitions and the
  closed-form DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from pyjelly_spark import queries as Q

    structural = Q.q_kg_structural(spark, SF0001)
    imports = Q.q_kg_imports(spark, SF0001)
    defs = Q.q_kg_defs(spark, SF0001)
    calls = Q.q_kg_calls(spark, SF0001)
    canonical = Q.q_kg_canonical(spark, SF0001)
    return (
        structural.unionByName(imports)
        .unionByName(defs)
        .unionByName(calls)
        .unionByName(canonical)
        .orderBy("s", "p", "o")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyjelly_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pyjelly_spark.queries import ORACLES

    return dict(ORACLES)
