"""SHACL-lite shape validation over a flat (s, p, o) triples frame.

A KG-construction pipeline needs a constraint gate between
materialization and publishing: shapes declare what well-formed entities
look like (cardinalities, value patterns, node kinds, enumerations) and
validation emits a violations report instead of letting malformed
entities poison downstream joins.  This is the SHACL *core constraint*
subset re-expressed as one declarative DataFrame program:

- ``sh:minCount`` / ``sh:maxCount``   (cardinality per focus node)
- ``sh:pattern``                      (regex every value must match)
- ``sh:nodeKind``                     (IRI vs Literal, by lexical form)
- ``sh:in``                           (closed value enumeration)
- targets: ``sh:targetClass`` (focus = instances of a class, so shapes
  compose with ``inference.rdfs_materialize`` — inferred types are valid
  targets) or ``target_subjects_of`` (focus = subjects of a predicate).

Reference parity: pyjelly is a codec and performs no validation; in the
reference ecosystem this is pySHACL over a driver-side rdflib graph.
Here the same checks run distributed, where the graph lives.

Execution shape (100 TB graph, handful of shapes):

- The shape table is a broadcast on every path: value constraints are a
  single map-side broadcast-join + filter over the triples scan (no
  shuffle at all).
- Cardinality constraints aggregate ``groupBy(s, p).count()`` once for
  ALL count shapes together (one shuffle keyed by subject), then join
  the focus set — also keyed by subject, so AQE plans it shuffle-local.
  ``minCount`` needs the focus set (an absent path never appears in the
  aggregate); focus extraction is a broadcast-joined filter of the type
  triples.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyjelly_spark.operators.inference import RDF_TYPE


@dataclass(frozen=True)
class Shape:
    """One property shape: a target selector plus one constraint group.

    Exactly one of ``target_class`` / ``target_subjects_of`` selects the
    focus nodes.  ``path`` is the constrained predicate.  Count bounds
    count (focus, path) occurrences as given — feed a deduplicated graph
    (e.g. the RDFS closure, which is a set) for set semantics.  Value
    constraints apply to every value of ``path`` on any focus.
    """

    shape_id: str
    path: str
    target_class: str | None = None
    target_subjects_of: str | None = None
    min_count: int | None = None
    max_count: int | None = None
    pattern: str | None = None
    node_kind: str | None = None  # "IRI" | "Literal"
    in_values: tuple[str, ...] | None = None


def _is_iri(col):
    # Lexical node-kind test for the flat string schema: IRIs are the
    # values the pipeline mints with a scheme; everything else (hashes,
    # language tags, counts) is a plain literal.
    return col.startswith("http://") | col.startswith("https://") | col.startswith("urn:")


def validate(data: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Validate ``data`` against ``shapes``; return the violations.

    Output columns: ``shape_id``, ``constraint`` (min_count / max_count /
    pattern / node_kind / in), ``focus`` (the failing node), ``value``
    (offending value, or the observed count for cardinality shapes, as a
    string).  Conforming data yields zero rows.
    """
    spark = data.sparkSession
    triples = data.select("s", "p", "o")

    value_shapes = [
        s for s in shapes if s.pattern or s.node_kind or s.in_values
    ]
    count_shapes = [
        s for s in shapes if s.min_count is not None or s.max_count is not None
    ]

    out: list[DataFrame] = []

    if value_shapes:
        vs = spark.createDataFrame(
            [
                (s.shape_id, s.path, s.pattern, s.node_kind,
                 list(s.in_values) if s.in_values else None)
            for s in value_shapes],
            "shape_id string, path string, pattern string, "
            "node_kind string, in_values array<string>",
        )
        joined = triples.join(F.broadcast(vs), triples["p"] == vs["path"])
        bad_pattern = F.col("pattern").isNotNull() & ~F.regexp_like(
            F.col("o"), F.col("pattern")
        )
        bad_kind = F.col("node_kind").isNotNull() & (
            ((F.col("node_kind") == "IRI") & ~_is_iri(F.col("o")))
            | ((F.col("node_kind") == "Literal") & _is_iri(F.col("o")))
        )
        bad_in = F.col("in_values").isNotNull() & ~F.array_contains(
            F.col("in_values"), F.col("o")
        )
        for cname, cond in (
            ("pattern", bad_pattern),
            ("node_kind", bad_kind),
            ("in", bad_in),
        ):
            out.append(
                joined.filter(cond).select(
                    "shape_id",
                    F.lit(cname).alias("constraint"),
                    F.col("s").alias("focus"),
                    F.col("o").alias("value"),
                )
            )

    if count_shapes:
        cs = spark.createDataFrame(
            [
                (s.shape_id, s.path, s.target_class, s.target_subjects_of,
                 s.min_count, s.max_count)
            for s in count_shapes],
            "shape_id string, path string, target_class string, "
            "target_subjects_of string, min_count int, max_count int",
        )
        types = triples.filter(F.col("p") == RDF_TYPE)
        focus_by_class = types.join(
            F.broadcast(cs.filter(F.col("target_class").isNotNull())),
            types["o"] == F.col("target_class"),
        ).select("shape_id", "path", "min_count", "max_count",
                 F.col("s").alias("focus"))
        focus_by_subj = triples.join(
            F.broadcast(cs.filter(F.col("target_subjects_of").isNotNull())),
            triples["p"] == F.col("target_subjects_of"),
        ).select("shape_id", "path", "min_count", "max_count",
                 F.col("s").alias("focus")).distinct()
        focus = focus_by_class.unionByName(focus_by_subj)

        paths = sorted({s.path for s in count_shapes})
        counts = (
            triples.filter(F.col("p").isin(paths))
            .groupBy(F.col("s").alias("focus"), F.col("p").alias("path"))
            .agg(F.count("*").alias("cnt"))
        )
        with_counts = focus.join(counts, ["focus", "path"], "left").select(
            "shape_id", "min_count", "max_count", "focus",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        out.append(
            with_counts.filter(
                F.col("min_count").isNotNull()
                & (F.col("cnt") < F.col("min_count"))
            ).select(
                "shape_id", F.lit("min_count").alias("constraint"),
                "focus", F.col("cnt").cast("string").alias("value"),
            )
        )
        out.append(
            with_counts.filter(
                F.col("max_count").isNotNull()
                & (F.col("cnt") > F.col("max_count"))
            ).select(
                "shape_id", F.lit("max_count").alias("constraint"),
                "focus", F.col("cnt").cast("string").alias("value"),
            )
        )

    if not out:
        return spark.createDataFrame(
            [], "shape_id string, constraint string, focus string, value string"
        )
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result
