"""PROV-O lineage-graph export: per-partition provenance as triples.

The pipeline already writes per-partition lineage sidecars (manifest
rows with stream path + triple counts, ``sources/jelly_io.py``); this
operator materializes the same lineage *inside the graph*, as W3C PROV-O
entities, so provenance is queryable with the engine's own BGP/SPARQL
operators instead of living in an out-of-band JSON file:

    stream --prov:wasDerivedFrom--> repo
    stream --prov:wasGeneratedBy--> activity
    activity --prov:used--> repo
    stream --kg:nFiles-->  "<count>"
    stream --kg:nTriples--> "<count>"

Reference parity: pyjelly has no provenance surface (single-process, no
partitions); the analogue here follows the north-star requirement of
per-partition lineage + triple-count metrics alongside each snapshot.

Scale shape: one aggregation keyed by the container (repo) — counts are
partial-aggregated map-side, the container→file mapping rides the same
``contains`` edges the graph already holds (broadcast regime: containers
number in the millions, triples in the trillions, so the per-file→repo
join is the only wide exchange and it reuses the subject partitioning
of the count aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROV = "http://www.w3.org/ns/prov#"


def prov_graph(
    triples: DataFrame,
    *,
    contains_pred: str,
    ns: str,
    stream_prefix: str,
    activity_iri: str,
) -> DataFrame:
    """Derive the PROV lineage graph of ``triples``.

    ``contains_pred`` is the container→member predicate (repo contains
    file); every triple whose subject is a member is attributed to its
    container, the container's own ``contains`` edges count toward it as
    well.  One stream entity is minted per container under
    ``stream_prefix``; ``activity_iri`` names the generating run (pass a
    deterministic id — e.g. a config fingerprint — NOT a timestamp, so
    output is reproducible)."""
    contains = triples.filter(F.col("p") == contains_pred).select(
        F.col("s").alias("container"), F.col("o").alias("member")
    )
    n_files = contains.groupBy("container").agg(
        F.count("*").alias("n_files")
    )
    # Triples attributed per container: member-subject triples plus the
    # container's own contains edges.
    member_counts = (
        triples.groupBy(F.col("s").alias("member"))
        .agg(F.count("*").alias("n"))
        .join(contains, "member")
        .groupBy("container")
        .agg(F.sum("n").alias("n_member_triples"))
    )
    stats = n_files.join(member_counts, "container", "left").select(
        "container",
        "n_files",
        (F.coalesce("n_member_triples", F.lit(0)) + F.col("n_files")).alias(
            "n_triples"
        ),
    )
    stream = F.concat(
        F.lit(stream_prefix),
        F.regexp_extract("container", r"([^/]+)$", 1),
    )
    rows = [
        stats.select(stream.alias("s"),
                     F.lit(PROV + "wasDerivedFrom").alias("p"),
                     F.col("container").alias("o")),
        stats.select(stream.alias("s"),
                     F.lit(PROV + "wasGeneratedBy").alias("p"),
                     F.lit(activity_iri).alias("o")),
        stats.select(F.lit(activity_iri).alias("s"),
                     F.lit(PROV + "used").alias("p"),
                     F.col("container").alias("o")),
        stats.select(stream.alias("s"),
                     F.lit(ns + "nFiles").alias("p"),
                     F.col("n_files").cast("string").alias("o")),
        stats.select(stream.alias("s"),
                     F.lit(ns + "nTriples").alias("p"),
                     F.col("n_triples").cast("string").alias("o")),
    ]
    out = rows[0]
    for df in rows[1:]:
        out = out.unionByName(df)
    return out
