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

    def test_meta_ontology_refused(self, spark):
        for bad_schema in (
            [("p", RDFS_SUBPROP, RDF_TYPE)],
            [(RDF_TYPE, RDFS_SUBPROP, "q")],
            [(RDF_TYPE, RDFS_DOMAIN, "C")],
        ):
            with pytest.raises(ValueError, match="meta-ontology"):
                _closure(spark, [("x", "p", "y")], bad_schema).collect()

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


class TestSameasSmush:
    def _smush(self, spark, triples):
        from pyjelly_spark.operators.inference import sameas_smush

        return {
            tuple(r)
            for r in sameas_smush(
                spark.createDataFrame(triples, _SPO)
            ).collect()
        }

    def test_chain_closes_transitively(self, spark):
        from pyjelly_spark.operators.inference import OWL_SAMEAS

        got = self._smush(
            spark,
            [
                ("b", OWL_SAMEAS, "c"),
                ("c", OWL_SAMEAS, "a"),  # class {a,b,c} -> rep "a"
                ("x", "calls", "b"),
                ("c", "defines", "y"),  # subject side rewrites too
                ("u", "calls", "v"),    # untouched
            ],
        )
        assert got == {
            ("x", "calls", "a"),
            ("a", "defines", "y"),
            ("u", "calls", "v"),
        }

    def test_aliases_collapse_duplicates(self, spark):
        from pyjelly_spark.operators.inference import OWL_SAMEAS

        got = self._smush(
            spark,
            [
                ("a", OWL_SAMEAS, "b"),
                ("x", "calls", "a"),
                ("x", "calls", "b"),  # same triple after smushing
            ],
        )
        assert got == {("x", "calls", "a")}

    def test_no_sameas_is_identity_set(self, spark):
        got = self._smush(
            spark, [("x", "p", "y"), ("x", "p", "y")]
        )
        assert got == {("x", "p", "y")}


def test_closure_roundtrips_through_jelly(spark, tmp_path):
    """The inferred graph is a first-class citizen of the engine: the
    RDFS closure serializes through the distributed Jelly writer and
    decodes back identical (composition of the semantic layer with the
    codec layer)."""
    from pyspark.sql import functions as F

    from pyjelly_spark.sources.jelly_io import read_jelly, write_jelly

    closed = _closure(
        spark,
        [
            ("http://x/a", "http://x/p", "http://x/b"),
            ("http://x/b", "http://x/p", "http://x/c"),
        ],
        [
            ("http://x/p", RDFS_SUBPROP, "http://x/q"),
            ("http://x/p", RDFS_DOMAIN, "http://x/C"),
        ],
    ).select("s", "p", "o")
    flat = closed.select(
        F.lit("iri").alias("s_kind"), F.col("s").alias("s_value"),
        F.lit(None).cast("string").alias("s_lang"),
        F.lit(None).cast("string").alias("s_datatype"),
        F.lit("iri").alias("p_kind"), F.col("p").alias("p_value"),
        F.lit(None).cast("string").alias("p_lang"),
        F.lit(None).cast("string").alias("p_datatype"),
        F.lit("iri").alias("o_kind"), F.col("o").alias("o_value"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("string").alias("o_datatype"),
    ).repartition(2)
    out = str(tmp_path / "closure_jelly")
    write_jelly(flat, out)
    back = read_jelly(spark, out).select(
        F.col("s_value").alias("s"), F.col("p_value").alias("p"),
        F.col("o_value").alias("o"),
    )
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in closed.collect()
    }


def _naive_fixpoint(instance, schema):
    """Independent evaluator: apply the one-step RDFS rules repeatedly
    until nothing new appears (transitivity emerges from iteration, not
    from a precomputed hierarchy closure — a genuinely different
    evaluation strategy than the operator's compiled dispatch)."""
    spp = {(s, o) for s, p, o in schema if p == RDFS_SUBPROP}
    sco = {(s, o) for s, p, o in schema if p == RDFS_SUBCLASS}
    dom = {(s, o) for s, p, o in schema if p == RDFS_DOMAIN}
    rng = {(s, o) for s, p, o in schema if p == RDFS_RANGE}
    triples = set(instance)
    while True:
        new = set()
        for s, p, o in triples:
            if p == RDF_TYPE:
                for c1, c2 in sco:
                    if o == c1:
                        new.add((s, RDF_TYPE, c2))
            else:
                for p1, p2 in spp:
                    if p == p1:
                        new.add((s, p2, o))
                for pr, c in dom:
                    if p == pr:
                        new.add((s, RDF_TYPE, c))
                for pr, c in rng:
                    if p == pr:
                        new.add((o, RDF_TYPE, c))
        if new <= triples:
            return triples
        triples |= new


def test_rdfs_differential_random(spark):
    """Seeded random instance graphs + random ontologies: the compiled
    broadcast-dispatch operator must equal the naive rule-iteration
    fixpoint on the full (s, p, o, asserted) relation."""
    import random

    rng = random.Random(1234)
    preds = [f"p{i}" for i in range(6)]
    classes = [f"C{i}" for i in range(6)]
    nodes = [f"n{i}" for i in range(12)]
    for trial in range(12):
        schema = set()
        for _ in range(rng.randint(0, 8)):
            kind = rng.random()
            if kind < 0.35:
                schema.add((rng.choice(preds), RDFS_SUBPROP, rng.choice(preds)))
            elif kind < 0.6:
                schema.add((rng.choice(classes), RDFS_SUBCLASS, rng.choice(classes)))
            elif kind < 0.8:
                schema.add((rng.choice(preds), RDFS_DOMAIN, rng.choice(classes)))
            else:
                schema.add((rng.choice(preds), RDFS_RANGE, rng.choice(classes)))
        instance = set()
        for _ in range(rng.randint(1, 25)):
            if rng.random() < 0.2:
                instance.add((rng.choice(nodes), RDF_TYPE, rng.choice(classes)))
            else:
                instance.add(
                    (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
                )
        expected = {
            (s, p, o, (s, p, o) in instance)
            for s, p, o in _naive_fixpoint(instance, schema)
        }
        got = _rows(_closure(spark, sorted(instance), sorted(schema)))
        assert got == expected, f"trial {trial}: schema={sorted(schema)}"
