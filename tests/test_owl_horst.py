"""OWL-Horst materialization (operators/inference.py::owl_horst_materialize).

Property-rule expectations (inverseOf / SymmetricProperty /
TransitiveProperty on top of the RDFS rules), a refusal test for
interleaved transitive closures, and a seeded differential fuzz against
a naive rule-iteration fixpoint.
"""

from __future__ import annotations

import pytest

from pyjelly_spark.operators.inference import (
    OWL_INVERSE,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    owl_horst_materialize,
)

_SPO = "s string, p string, o string"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _closure(spark, instance, schema):
    return owl_horst_materialize(
        spark.createDataFrame(instance, _SPO),
        spark.createDataFrame(schema, _SPO),
    )


class TestPropertyRules:
    def test_inverse_of(self, spark):
        got = _rows(_closure(
            spark, [("a", "p", "b")], [("p", OWL_INVERSE, "q")]
        ))
        assert got == {("a", "p", "b", True), ("b", "q", "a", False)}

    def test_inverse_of_other_direction(self, spark):
        got = _rows(_closure(
            spark, [("a", "q", "b")], [("p", OWL_INVERSE, "q")]
        ))
        assert got == {("a", "q", "b", True), ("b", "p", "a", False)}

    def test_symmetric(self, spark):
        got = _rows(_closure(
            spark, [("a", "p", "b")], [("p", RDF_TYPE, OWL_SYMMETRIC)]
        ))
        assert got == {("a", "p", "b", True), ("b", "p", "a", False)}

    def test_transitive_chain(self, spark):
        got = _rows(_closure(
            spark,
            [("a", "t", "b"), ("b", "t", "c"), ("c", "t", "d")],
            [("t", RDF_TYPE, OWL_TRANSITIVE)],
        ))
        derived = {(x, "t", y, False) for x, y in [
            ("a", "c"), ("a", "d"), ("b", "d")]}
        asserted = {(x, "t", y, True) for x, y in [
            ("a", "b"), ("b", "c"), ("c", "d")]}
        assert got == asserted | derived

    def test_transitive_pairs_inherit_to_superproperty(self, spark):
        got = _rows(_closure(
            spark,
            [("a", "t", "b"), ("b", "t", "c")],
            [
                ("t", RDF_TYPE, OWL_TRANSITIVE),
                ("t", RDFS_SUBPROP, "rel"),
            ],
        ))
        # The CLOSED pair (a,c) must reach the superproperty too.
        assert ("a", "rel", "c", False) in got
        assert ("a", "t", "c", False) in got

    def test_transitive_with_inverse_feed(self, spark):
        # q-edges invert into t before t closes.
        got = _rows(_closure(
            spark,
            [("b", "q", "a"), ("b", "t", "c")],
            [
                ("t", RDF_TYPE, OWL_TRANSITIVE),
                ("t", OWL_INVERSE, "q"),
            ],
        ))
        assert ("a", "t", "b", False) in got  # inverted
        assert ("a", "t", "c", False) in got  # closed through it
        assert ("c", "q", "a", False) in got  # closure pair inverted back

    def test_symmetric_transitive_full_component(self, spark):
        got = _rows(_closure(
            spark,
            [("a", "t", "b"), ("b", "t", "c")],
            [
                ("t", RDF_TYPE, OWL_TRANSITIVE),
                ("t", RDF_TYPE, OWL_SYMMETRIC),
            ],
        ))
        nodes = {"a", "b", "c"}
        expect = set()
        for x in nodes:
            for y in nodes:
                if (x, y) in {("a", "b"), ("b", "c")}:
                    expect.add((x, "t", y, True))
                else:
                    expect.add((x, "t", y, False))
        # symmetric+transitive over a connected set = full clique incl.
        # reflexive pairs (a ~ b ~ a).
        assert got == expect

    def test_domain_range_through_inverse(self, spark):
        got = _rows(_closure(
            spark,
            [("a", "p", "b")],
            [
                ("p", OWL_INVERSE, "q"),
                ("q", RDFS_DOMAIN, "C"),
                ("q", RDFS_RANGE, "D"),
                ("D", RDFS_SUBCLASS, "E"),
            ],
        ))
        # (b q a): domain types b, range types a, plus subclass lift.
        assert ("b", RDF_TYPE, "C", False) in got
        assert ("a", RDF_TYPE, "D", False) in got
        assert ("a", RDF_TYPE, "E", False) in got

    def test_interleaved_transitives_refused(self, spark):
        with pytest.raises(ValueError, match="interleaved"):
            _closure(
                spark,
                [("a", "t1", "b")],
                [
                    ("t1", RDF_TYPE, OWL_TRANSITIVE),
                    ("t2", RDF_TYPE, OWL_TRANSITIVE),
                    ("t1", RDFS_SUBPROP, "t2"),
                ],
            ).collect()

    def test_rdf_type_in_property_schema_refused(self, spark):
        with pytest.raises(ValueError, match="meta-ontology"):
            _closure(
                spark,
                [("a", "p", "b")],
                [("p", OWL_INVERSE, RDF_TYPE)],
            ).collect()


def _naive_fixpoint(instance, schema):
    spp = {(s, o) for s, p, o in schema if p == RDFS_SUBPROP}
    inv = {(s, o) for s, p, o in schema if p == OWL_INVERSE}
    sym = {s for s, p, o in schema if p == RDF_TYPE and o == OWL_SYMMETRIC}
    trans = {s for s, p, o in schema if p == RDF_TYPE and o == OWL_TRANSITIVE}
    sco = {(s, o) for s, p, o in schema if p == RDFS_SUBCLASS}
    dom = {(s, o) for s, p, o in schema if p == RDFS_DOMAIN}
    rng = {(s, o) for s, p, o in schema if p == RDFS_RANGE}
    triples = set(instance)
    while True:
        new = set()
        for s, p, o in triples:
            if p == RDF_TYPE:
                new.update((s, RDF_TYPE, c2) for c1, c2 in sco if o == c1)
                continue
            new.update((s, p2, o) for p1, p2 in spp if p == p1)
            new.update((o, q, s) for p1, q in inv if p == p1)
            new.update((o, q, s) for q, p1 in inv if p == p1)
            if p in sym:
                new.add((o, p, s))
            if p in trans:
                new.update(
                    (s, p, o2) for s2, p2, o2 in triples
                    if p2 == p and s2 == o
                )
            new.update((s, RDF_TYPE, c) for pr, c in dom if p == pr)
            new.update((o, RDF_TYPE, c) for pr, c in rng if p == pr)
        if new <= triples:
            return triples
        triples |= new


def test_owl_horst_differential_random(spark):
    """Seeded random graphs + random OWL-Horst ontologies (at most one
    transitive property, so no refused configurations) vs the naive
    rule-iteration fixpoint."""
    import random

    rng_ = random.Random(4321)
    preds = [f"p{i}" for i in range(5)]
    classes = [f"C{i}" for i in range(4)]
    nodes = [f"n{i}" for i in range(10)]
    for trial in range(10):
        schema = set()
        if rng_.random() < 0.7:
            schema.add((rng_.choice(preds), RDF_TYPE, OWL_TRANSITIVE))
        for _ in range(rng_.randint(0, 7)):
            kind = rng_.random()
            if kind < 0.25:
                schema.add((rng_.choice(preds), RDFS_SUBPROP, rng_.choice(preds)))
            elif kind < 0.45:
                schema.add((rng_.choice(preds), OWL_INVERSE, rng_.choice(preds)))
            elif kind < 0.6:
                schema.add((rng_.choice(preds), RDF_TYPE, OWL_SYMMETRIC))
            elif kind < 0.75:
                schema.add((rng_.choice(classes), RDFS_SUBCLASS, rng_.choice(classes)))
            elif kind < 0.9:
                schema.add((rng_.choice(preds), RDFS_DOMAIN, rng_.choice(classes)))
            else:
                schema.add((rng_.choice(preds), RDFS_RANGE, rng_.choice(classes)))
        instance = set()
        for _ in range(rng_.randint(1, 18)):
            if rng_.random() < 0.15:
                instance.add((rng_.choice(nodes), RDF_TYPE, rng_.choice(classes)))
            else:
                instance.add(
                    (rng_.choice(nodes), rng_.choice(preds), rng_.choice(nodes))
                )
        try:
            got = _rows(_closure(spark, sorted(instance), sorted(schema)))
        except ValueError:
            # single-transitive generator shouldn't trip the guard
            raise AssertionError(f"trial {trial}: unexpected refusal")
        expected = {
            (s, p, o, (s, p, o) in instance)
            for s, p, o in _naive_fixpoint(instance, schema)
        }
        assert got == expected, f"trial {trial}: schema={sorted(schema)}"
