"""PROV lineage export (operators/provenance.py) on hand-built graphs."""

from __future__ import annotations

from pyjelly_spark.operators.provenance import PROV, prov_graph

_SPO = "s string, p string, o string"


def _prov(spark, triples):
    graph = spark.createDataFrame(triples, _SPO)
    return prov_graph(
        graph,
        contains_pred="contains",
        ns="kg:",
        stream_prefix="stream/",
        activity_iri="run-1",
    )


def test_counts_and_edges(spark):
    triples = [
        ("http://x/repo/r1", "contains", "f1"),
        ("http://x/repo/r1", "contains", "f2"),
        ("f1", "lang", "python"),
        ("f1", "calls", "s1"),
        ("f2", "lang", "python"),
        ("http://x/repo/r2", "contains", "f3"),
        # f3 has no member triples: n_triples falls back to contains only
    ]
    got = {tuple(r) for r in _prov(spark, triples).collect()}
    assert got == {
        ("stream/r1", PROV + "wasDerivedFrom", "http://x/repo/r1"),
        ("stream/r1", PROV + "wasGeneratedBy", "run-1"),
        ("run-1", PROV + "used", "http://x/repo/r1"),
        ("stream/r1", "kg:nFiles", "2"),
        ("stream/r1", "kg:nTriples", "5"),  # 2 contains + 3 member triples
        ("stream/r2", PROV + "wasDerivedFrom", "http://x/repo/r2"),
        ("stream/r2", PROV + "wasGeneratedBy", "run-1"),
        ("run-1", PROV + "used", "http://x/repo/r2"),
        ("stream/r2", "kg:nFiles", "1"),
        ("stream/r2", "kg:nTriples", "1"),
    }


def test_empty_graph(spark):
    assert _prov(spark, []).count() == 0


def test_non_member_subjects_do_not_count(spark):
    # A triple whose subject is in no container is not attributed.
    triples = [
        ("http://x/repo/r1", "contains", "f1"),
        ("orphan", "lang", "python"),
    ]
    rows = {(r.p, r.o) for r in _prov(spark, triples).collect()
            if r.p == "kg:nTriples"}
    assert rows == {("kg:nTriples", "1")}
