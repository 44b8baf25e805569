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

- ALL value constraints run in ONE pass: the shape table is aggregated
  into a per-path array, broadcast, left-joined to the triples scan,
  and exploded — every pattern/node-kind/enumeration check for every
  shape happens inside a single whole-stage-codegen projection, zero
  shuffles, and the input is scanned exactly once no matter how many
  shapes are declared (never one union branch per shape, which would
  rescan a 10^12-row input per shape).
- ALL cardinality constraints share one ``groupBy(s, p).count()`` over
  the constrained/target predicates (partial aggregation map-side, one
  shuffle keyed by subject), re-aggregated to one row per subject
  (path→count map + type set) and cross-checked against the broadcast
  shape list — ``minCount`` violations fall out of the map lookup
  defaulting to 0, no separate focus-set join.
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
        # Compile every value shape into one array per path: the scan is
        # joined once and each (triple, shape, constraint-kind) check
        # happens inside the same codegen stage.
        vs = spark.createDataFrame(
            [
                (s.path, s.shape_id, s.pattern, s.node_kind,
                 list(s.in_values) if s.in_values else None)
            for s in value_shapes],
            "path string, shape_id string, pattern string, "
            "node_kind string, in_values array<string>",
        ).groupBy("path").agg(
            F.collect_list(
                F.struct("shape_id", "pattern", "node_kind", "in_values")
            ).alias("shapes")
        )
        o = F.col("o")
        per_shape = triples.join(
            F.broadcast(vs), triples["p"] == vs["path"]
        ).select("s", "o", F.explode("shapes").alias("sh"))
        checks = F.filter(
            F.array(
                F.struct(
                    F.lit("pattern").alias("constraint"),
                    (F.col("sh.pattern").isNotNull()
                     & ~F.regexp_like(o, F.col("sh.pattern"))).alias("bad"),
                ),
                F.struct(
                    F.lit("node_kind").alias("constraint"),
                    (F.col("sh.node_kind").isNotNull() & (
                        ((F.col("sh.node_kind") == "IRI") & ~_is_iri(o))
                        | ((F.col("sh.node_kind") == "Literal") & _is_iri(o))
                    )).alias("bad"),
                ),
                F.struct(
                    F.lit("in").alias("constraint"),
                    (F.col("sh.in_values").isNotNull()
                     & ~F.array_contains(F.col("sh.in_values"), o)).alias("bad"),
                ),
            ),
            lambda c: c["bad"],
        )
        out.append(
            per_shape.select(
                F.col("sh.shape_id").alias("shape_id"),
                F.explode(checks).alias("c"),
                F.col("s").alias("focus"),
                F.col("o").alias("value"),
            ).select(
                "shape_id", F.col("c.constraint").alias("constraint"),
                "focus", "value",
            )
        )

    if count_shapes:
        cs_rows = [
            (s.shape_id, s.path, s.target_class, s.target_subjects_of,
             s.min_count, s.max_count)
            for s in count_shapes
        ]
        cs = spark.createDataFrame(
            cs_rows,
            "shape_id string, path string, target_class string, "
            "target_subjects_of string, min_count int, max_count int",
        )
        relevant = sorted(
            {s.path for s in count_shapes}
            | {s.target_subjects_of for s in count_shapes
               if s.target_subjects_of}
            | {RDF_TYPE}
        )
        # One row per subject: path->count map plus the subject's type
        # set. Partial-aggregated map-side; the per-subject row count is
        # bounded by the number of relevant predicates.
        per_sp = (
            triples.filter(F.col("p").isin(relevant))
            .groupBy("s", "p")
            .agg(
                F.count("*").alias("cnt"),
                F.collect_set(
                    F.when(F.col("p") == RDF_TYPE, F.col("o"))
                ).alias("classes"),
            )
        )
        per_s = per_sp.groupBy("s").agg(
            F.map_from_entries(
                F.collect_list(F.struct("p", "cnt"))
            ).alias("pcnt"),
            F.flatten(F.collect_list("classes")).alias("classes"),
        )
        checked = per_s.join(F.broadcast(cs)).filter(
            (F.col("target_class").isNotNull()
             & F.array_contains("classes", F.col("target_class")))
            | (F.col("target_subjects_of").isNotNull()
               & F.col("pcnt")[F.col("target_subjects_of")].isNotNull())
        ).select(
            "shape_id", "min_count", "max_count",
            F.col("s").alias("focus"),
            F.coalesce(F.col("pcnt")[F.col("path")], F.lit(0)).alias("cnt"),
        )
        bounds = F.filter(
            F.array(
                F.struct(
                    F.lit("min_count").alias("constraint"),
                    (F.col("min_count").isNotNull()
                     & (F.col("cnt") < F.col("min_count"))).alias("bad"),
                ),
                F.struct(
                    F.lit("max_count").alias("constraint"),
                    (F.col("max_count").isNotNull()
                     & (F.col("cnt") > F.col("max_count"))).alias("bad"),
                ),
            ),
            lambda c: c["bad"],
        )
        out.append(
            checked.select(
                "shape_id", F.explode(bounds).alias("c"), "focus",
                F.col("cnt").cast("string").alias("value"),
            ).select(
                "shape_id", F.col("c.constraint").alias("constraint"),
                "focus", "value",
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
