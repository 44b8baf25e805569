"""RDFS materialization (operators/inference.py) on hand-built graphs.

Rule-by-rule expectations follow the RDFS entailment rules the reference
ecosystem delegates to rdflib/OWL-RL; each test pins the exact inferred
triple set for a tiny graph so a wrong/missing/extra conclusion fails
loudly.
"""

from __future__ import annotations

import pytest

from pyjelly_spark.operators.inference import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_materialize,
    transitive_closure_small,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


_SPO = "s string, p string, o string"


def _closure(spark, instance, schema):
    inst = spark.createDataFrame(instance, _SPO)
    sch = spark.createDataFrame(schema, _SPO)
    return rdfs_materialize(inst, sch)


class TestTransitiveClosure:
    def test_chain_closes(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d")], ["sub", "sup"]
        )
        got = _rows(transitive_closure_small(edges))
        assert got == {
            ("a", "b"), ("b", "c"), ("c", "d"),
            ("a", "c"), ("b", "d"), ("a", "d"),
        }

    def test_cycle_terminates(self, spark):
        edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["sub", "sup"])
        got = _rows(transitive_closure_small(edges, max_rounds=10))
        # Cycles close to the full cross product (incl. reflexive pairs
        # reached through the cycle) and the fixpoint test terminates.
        assert got == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}

    def test_deep_chain_beyond_round_doubling(self, spark):
        n = 20  # needs ceil(log2(20)) = 5 rounds via squaring
        edges = spark.createDataFrame(
            [(f"c{i}", f"c{i + 1}") for i in range(n)], ["sub", "sup"]
        )
        got = transitive_closure_small(edges)
        assert got.count() == n * (n + 1) // 2


class TestRdfsRules:
    def test_rdfs7_property_inheritance(self, spark):
        closed = _closure(
            spark,
            [("x", "p", "y")],
            [("p", RDFS_SUBPROP, "q"), ("q", RDFS_SUBPROP, "r")],
        )
        assert _rows(closed) == {
            ("x", "p", "y", True),
            ("x", "q", "y", False),
            ("x", "r", "y", False),  # via the CLOSED hierarchy
        }

    def test_rdfs2_rdfs3_domain_range(self, spark):
        closed = _closure(
            spark,
            [("x", "p", "y")],
            [("p", RDFS_DOMAIN, "C"), ("p", RDFS_RANGE, "D")],
        )
        assert _rows(closed) == {
            ("x", "p", "y", True),
            ("x", RDF_TYPE, "C", False),
            ("y", RDF_TYPE, "D", False),
        }

    def test_domain_of_superproperty_applies(self, spark):
        # (x p y), p sub q, domain(q)=C  =>  x type C (rdfs7 then rdfs2)
        closed = _closure(
            spark,
            [("x", "p", "y")],
            [("p", RDFS_SUBPROP, "q"), ("q", RDFS_DOMAIN, "C")],
        )
        assert ("x", RDF_TYPE, "C", False) in _rows(closed)

    def test_rdfs9_type_inheritance(self, spark):
        closed = _closure(
            spark,
            [("x", RDF_TYPE, "A")],
            [("A", RDFS_SUBCLASS, "B"), ("B", RDFS_SUBCLASS, "C")],
        )
        assert _rows(closed) == {
            ("x", RDF_TYPE, "A", True),
            ("x", RDF_TYPE, "B", False),
            ("x", RDF_TYPE, "C", False),
        }

    def test_inferred_type_feeds_subclass_rule(self, spark):
        # range typing (rdfs3) output must flow into rdfs9.
        closed = _closure(
            spark,
            [("x", "p", "y")],
            [("p", RDFS_RANGE, "D"), ("D", RDFS_SUBCLASS, "E")],
        )
        got = _rows(closed)
        assert ("y", RDF_TYPE, "D", False) in got
        assert ("y", RDF_TYPE, "E", False) in got

    def test_asserted_wins_over_derived(self, spark):
        # The same triple both asserted and derivable stays asserted=True
        # and appears exactly once.
        closed = _closure(
            spark,
            [("x", "p", "y"), ("x", RDF_TYPE, "C")],
            [("p", RDFS_DOMAIN, "C")],
        )
        rows = [tuple(r) for r in closed.collect()]
        assert rows.count(("x", RDF_TYPE, "C", True)) == 1
        assert ("x", RDF_TYPE, "C", False) not in rows

    def test_no_schema_is_identity(self, spark):
        closed = _closure(spark, [("x", "p", "y")], [])
        assert _rows(closed) == {("x", "p", "y", True)}

    def test_duplicate_assertions_collapse(self, spark):
        closed = _closure(
            spark, [("x", "p", "y"), ("x", "p", "y")], []
        )
        assert closed.count() == 1


class TestClosurePlan:
    def test_instance_side_has_no_extra_shuffle(self, spark):
        """The instance-scale path must shuffle exactly once (the final
        groupBy); every schema join must be broadcast."""
        inst = spark.createDataFrame(
            [(f"s{i}", "p", f"o{i}") for i in range(100)], ["s", "p", "o"]
        )
        sch = spark.createDataFrame(
            [("p", RDFS_SUBPROP, "q"), ("q", RDFS_DOMAIN, "C")],
            ["s", "p", "o"],
        )
        plan = rdfs_materialize(inst, sch)._jdf.queryExecution().executedPlan().toString()
        # No SortMergeJoin / ShuffledHashJoin anywhere: schema joins are
        # all BroadcastHashJoin (the tiny schema side may shuffle for its
        # own closure aggregates, which is fine — those exchanges sit
        # under broadcast builds, not on the instance stream).
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "BroadcastHashJoin" in plan


@pytest.mark.usefixtures("spark")
def test_schema_empty_instance(spark):
    closed = _closure(
        spark, [], [("A", RDFS_SUBCLASS, "B")]
    )
    assert closed.count() == 0
