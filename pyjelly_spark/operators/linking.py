"""Entity linking: resolve call/import mentions to defining entities.

Candidate generation is an equi-join on the normalized symbol; scoring is
pure column arithmetic (JVM-side); winner selection is one shuffle on the
mention key. The defs dictionary is usually orders of magnitude smaller
than the mention stream — callers can force a broadcast join for it
(``broadcast_dictionary=True``) or leave it to AQE.

No counterpart in the reference (SURVEY.md §2.9); required by
BASELINE.json north_star ("entity-link candidate generation ... link
scoring ... broadcast when dictionary small").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyjelly_spark.operators.extract import (
    P_CALLS_RESOLVED,
    iri,
)

DEF_SITE_BASE = "http://kg.example/def/"


def def_site_iri(repo, path, symbol):
    return F.concat(
        F.lit(DEF_SITE_BASE), repo, F.lit("/"), path, F.lit("#"), symbol
    )


def score_candidates(candidates: DataFrame) -> DataFrame:
    """Deterministic link score: same repo >> same package >> anything.

    Vectorized column expressions; swap in a pandas-UDF model here if
    scoring ever needs learned features.
    """
    same_repo = (F.col("repo") == F.col("def_repo")).cast("int")
    caller_pkg = F.regexp_extract("path", r"^src/(pkg\d+)/", 1)
    def_pkg = F.regexp_extract("def_path", r"^src/(pkg\d+)/", 1)
    same_pkg = (caller_pkg == def_pkg).cast("int")
    return candidates.withColumn("link_score", same_repo * 100 + same_pkg * 10)


def link_mentions(
    mentions: DataFrame,
    definitions: DataFrame,
    broadcast_dictionary: bool = False,
) -> DataFrame:
    """Resolve each (repo, path, symbol) mention to its best definition.

    mentions:     (repo, path, symbol)
    definitions:  (def_repo, def_path, symbol)
    returns:      mentions + (def_repo, def_path, link_score), one winner
                  per mention — max score, ties to the smallest def site
                  (fully deterministic).
    """
    dictionary = definitions.select("def_repo", "def_path", "symbol")
    if broadcast_dictionary:
        dictionary = F.broadcast(dictionary)
    candidates = mentions.join(dictionary, "symbol", "inner")
    scored = score_candidates(candidates)
    # one shuffle on the mention key; count(candidates per mention) is tiny
    window = Window.partitionBy("repo", "path", "symbol").orderBy(
        F.col("link_score").desc(), F.col("def_repo").asc(), F.col("def_path").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") == 1)
        .drop("rank")
    )


def resolved_call_triples(linked: DataFrame) -> DataFrame:
    """Winner links -> file --callsResolved--> def-site triples."""
    from pyjelly_spark.operators.extract import file_iri

    return linked.select(
        F.col("repo"),
        F.col("path"),
        F.lit(6).cast("int").alias("kind_rank"),
        iri(file_iri(F.col("repo"), F.col("path"))).alias("s"),
        iri(F.lit(P_CALLS_RESOLVED)).alias("p"),
        iri(def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol"))).alias(
            "o"
        ),
    )
