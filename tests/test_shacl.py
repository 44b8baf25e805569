"""SHACL-lite validation (operators/shacl.py) on hand-built graphs."""

from __future__ import annotations

from pyjelly_spark.operators.inference import RDF_TYPE
from pyjelly_spark.operators.shacl import Shape, validate

_SPO = "s string, p string, o string"


def _violations(spark, triples, shapes):
    data = spark.createDataFrame(triples, _SPO)
    return {tuple(r) for r in validate(data, shapes).collect()}


class TestCountShapes:
    def test_min_count_missing_path_counts_zero(self, spark):
        # A focus node with NO triple on the path must still violate
        # min_count (the left join, not the aggregate, finds it).
        got = _violations(
            spark,
            [("f1", RDF_TYPE, "File")],
            [Shape("S", "defines", target_class="File", min_count=1)],
        )
        assert got == {("S", "min_count", "f1", "0")}

    def test_min_and_max_window(self, spark):
        triples = [
            ("f1", RDF_TYPE, "File"),
            ("f2", RDF_TYPE, "File"),
            ("f3", RDF_TYPE, "File"),
            ("f2", "p", "a"),
            ("f3", "p", "a"), ("f3", "p", "b"), ("f3", "p", "c"),
        ]
        shapes = [
            Shape("Lo", "p", target_class="File", min_count=1),
            Shape("Hi", "p", target_class="File", max_count=2),
        ]
        got = _violations(spark, triples, shapes)
        assert got == {
            ("Lo", "min_count", "f1", "0"),
            ("Hi", "max_count", "f3", "3"),
        }

    def test_target_subjects_of(self, spark):
        triples = [
            ("x", "anchor", "v"),
            ("y", "anchor", "v"), ("y", "p", "a"),
            ("z", "p", "a"),  # not a target: no anchor triple
        ]
        got = _violations(
            spark,
            triples,
            [Shape("S", "p", target_subjects_of="anchor", min_count=1)],
        )
        assert got == {("S", "min_count", "x", "0")}

    def test_untargeted_nodes_ignored(self, spark):
        got = _violations(
            spark,
            [("f1", RDF_TYPE, "Other"), ("f1", "p", "a")],
            [Shape("S", "p", target_class="File", max_count=0)],
        )
        assert got == set()


class TestValueShapes:
    def test_pattern_node_kind_and_in(self, spark):
        triples = [
            ("f1", "sha", "abc123"),
            ("f2", "sha", "XYZ"),
            ("f3", "sha", "http://not-a-hash"),
            ("f1", "lang", "python"),
            ("f2", "lang", "klingon"),
        ]
        shapes = [
            Shape("Hex", "sha", pattern="^[0-9a-f]+$"),
            Shape("Lit", "sha", node_kind="Literal"),
            Shape("Lang", "lang", in_values=("python", "go")),
        ]
        got = _violations(spark, triples, shapes)
        assert got == {
            ("Hex", "pattern", "f2", "XYZ"),
            ("Hex", "pattern", "f3", "http://not-a-hash"),
            ("Lit", "node_kind", "f3", "http://not-a-hash"),
            ("Lang", "in", "f2", "klingon"),
        }

    def test_iri_node_kind(self, spark):
        triples = [
            ("f1", "link", "http://ok"),
            ("f2", "link", "urn:also-ok"),
            ("f3", "link", "plain literal"),
        ]
        got = _violations(
            spark, triples, [Shape("Iri", "link", node_kind="IRI")]
        )
        assert got == {("Iri", "node_kind", "f3", "plain literal")}

    def test_conforming_graph_yields_zero_rows(self, spark):
        triples = [("f1", RDF_TYPE, "File"), ("f1", "p", "good")]
        shapes = [
            Shape("C", "p", target_class="File", min_count=1, max_count=1),
            Shape("V", "p", pattern="^good$"),
        ]
        assert _violations(spark, triples, shapes) == set()

    def test_no_shapes_empty_schema(self, spark):
        data = spark.createDataFrame([("a", "b", "c")], _SPO)
        out = validate(data, [])
        assert out.columns == ["shape_id", "constraint", "focus", "value"]
        assert out.count() == 0


class TestPlan:
    def test_value_shapes_are_shuffle_free(self, spark):
        """Value constraints must be a map-side broadcast join + filter:
        no exchange on the triples side at all."""
        data = spark.createDataFrame(
            [(f"s{i}", "sha", "ff") for i in range(50)], _SPO
        )
        out = validate(data, [Shape("Hex", "sha", pattern="^[0-9a-f]+$")])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "hashpartitioning(s" not in plan  # no data-side shuffle
