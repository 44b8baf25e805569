"""Strongly-connected-components operator (operators/scc.py) and the
kg_scc / kg_condensation gated queries.

Hand-sized graphs with known SCC decompositions, the discrimination
case (SCC != undirected CC), the real generator import graph (a single
affine-permutation orbit -> one SCC covering every module), and the
closed-form census over a partial last group.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pyjelly_spark.operators.scc import (
    condensation_levels,
    strongly_connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def _assign(spark, pairs, nodes=None):
    ndf = (
        spark.createDataFrame([(n,) for n in nodes], "node: long")
        if nodes is not None
        else None
    )
    out = strongly_connected_components(_edges(spark, pairs), ndf)
    return {r["node"]: r["scc"] for r in out.collect()}


def test_scc_two_cycles_one_chord(spark):
    """1->2->3->1 and 10->11->10 with a chord 1->10: two SCCs (the
    chord is one-way, so no merge) plus the chord keeps both cores
    un-trimmable."""
    got = _assign(
        spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (1, 10)]
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_scc_differs_from_undirected_cc(spark):
    """A directed path 1->2->3 is weakly connected (undirected CC would
    say one component) but has three singleton SCCs."""
    got = _assign(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 2, 3: 3}


def test_scc_back_edge_merges(spark):
    """Adding 3->1 to the path makes it one SCC."""
    got = _assign(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_scc_isolated_and_self_loop_nodes(spark):
    """Nodes without cycle participation (isolated via the nodes frame,
    self-loop only) are singleton SCCs."""
    got = _assign(spark, [(1, 1), (2, 3), (3, 2)], nodes=[1, 2, 3, 4])
    assert got == {1: 1, 2: 2, 3: 2, 4: 4}


def test_scc_nested_structure(spark):
    """Two 2-cycles bridged both ways through a middle singleton chain
    merge into ONE SCC; a dangling tail stays out."""
    pairs = [
        (1, 2), (2, 1),        # cycle A
        (5, 6), (6, 5),        # cycle B
        (2, 4), (4, 5),        # A -> mid -> B
        (6, 1),                # B -> A  (closes the big loop through 4)
        (6, 9),                # tail out of B
    ]
    got = _assign(spark, pairs)
    assert got == {1: 1, 2: 1, 4: 1, 5: 1, 6: 1, 9: 9}


def test_condensation_levels_chain(spark):
    """Cycle {1,2} -> 3 -> cycle {5,6}: levels 0, 1, 2."""
    pairs = [(1, 2), (2, 1), (2, 3), (3, 5), (5, 6), (6, 5)]
    e = _edges(spark, pairs)
    a = strongly_connected_components(e)
    lv = {r["scc"]: r["level"] for r in condensation_levels(e, a).collect()}
    assert lv == {1: 0, 3: 1, 5: 2}


def test_scc_import_graph_is_one_orbit(spark):
    """The generator's module import graph (first import edge is the
    affine permutation v -> 31 v + 18 mod n, plus extra chords) is a
    single strongly connected orbit — every module in ONE SCC. This is
    the degenerate case that motivated the closed-form census graph in
    queries._dep_graph."""
    from pyjelly_spark.operators import extract as X
    from pyjelly_spark.queries import derived_source_files

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):  # pragma: no cover
        pytest.skip("testdata missing")
    files = derived_source_files(spark, sf).withColumn(
        "s", F.regexp_extract("path", r"/mod_(\d+)\.py$", 1).cast("long")
    )
    edges = (
        files.select(
            "s",
            F.explode(
                F.regexp_extract_all("content", F.lit(X.IMPORT_RE), F.lit(1))
            ).alias("m"),
        )
        .withColumn("t", F.regexp_extract("m", r"\.mod_(\d+)$", 1).cast("long"))
        .select(F.col("s").alias("src"), F.col("t").alias("dst"))
    )
    nodes = files.select(F.col("s").alias("node"))
    n = nodes.count()
    out = strongly_connected_components(edges, nodes)
    sizes = (
        out.groupBy("scc").count().select("count").collect()
    )
    assert sorted(r["count"] for r in sizes) == [n]


def _write_doc_ids(spark, n):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(1).cast("long").alias("n_chars"),
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_kg_scc_census_partial_group(spark):
    """n=85: group 0 = 3-cycle + 37 tails, group 1 = 10-cycle + 30
    tails, group 2 partial (5 nodes, L=17 > 5: the cycle degrades to a
    chain of singletons). Census: {3: 1, 10: 1, 1: 72}."""
    from pyjelly_spark.queries import q_kg_scc

    d = _write_doc_ids(spark, 85)
    got = [tuple(r) for r in q_kg_scc(spark, d).collect()]
    assert got == [(1, 72), (3, 1), (10, 1)]


def test_kg_condensation_partial_group(spark):
    """Same n=85 graph: tails and the chain head sit at level 0, the
    group-0 cycle at 1, the group-1 cycle at 2 (chord 1->41), and the
    group-2 chain 81->82->83->84 at 3..6 (chord 41->81)."""
    from pyjelly_spark.queries import q_kg_condensation

    d = _write_doc_ids(spark, 85)
    got = [tuple(r) for r in q_kg_condensation(spark, d).collect()]
    assert got == [
        (0, 68, 68),
        (1, 1, 3),
        (2, 1, 10),
        (3, 1, 1),
        (4, 1, 1),
        (5, 1, 1),
        (6, 1, 1),
    ]


def _tarjan_sccs(n_nodes, pairs):
    """Reference Tarjan (iterative) over nodes 0..n_nodes-1: returns
    {node: min node id of its SCC}."""
    adj = {v: [] for v in range(n_nodes)}
    for s, t in pairs:
        if s != t:
            adj[s].append(t)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]

    for root in range(n_nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return result


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=2, max_value=12).flatmap(
            lambda n: st.tuples(
                st.just(n),
                st.lists(
                    st.tuples(
                        st.integers(0, n - 1), st.integers(0, n - 1)
                    ),
                    max_size=3 * n,
                ),
            )
        )
    )
    @settings(max_examples=8, deadline=None)
    def test_scc_matches_tarjan_reference(spark, graph):
        """Distributed FW-BW-Trim coloring == sequential Tarjan on
        arbitrary small digraphs (duplicate edges, self-loops, isolated
        nodes included)."""
        n, pairs = graph
        want = _tarjan_sccs(n, pairs)
        got = _assign(spark, pairs or [(0, 0)], nodes=list(range(n)))
        assert got == want

except ImportError:  # pragma: no cover
    pass


def test_kg_pathcount_partial_group(spark):
    """n=85 graph condensation: 68 sources (tails + chain head) have
    1 trivial path each; cycle0 is fed by 37 tails + itself-as-nonsource
    -> paths = 37 (its tails) ... hand-derived below:
    cycle0: 37 tail paths; cycle1: 30 tails + (cycle0's 37 via chord)
    = 67; 81: chain head 80 (1) + cycle1's 67 = 68; 82..84 inherit 68."""
    from pyjelly_spark.queries import q_kg_pathcount

    from tests.test_scc import _write_doc_ids  # self-import safe

    d = _write_doc_ids(spark, 85)
    got = [tuple(r) for r in q_kg_pathcount(spark, d).collect()]
    assert got == [(1, 68), (37, 1), (67, 1), (68, 4)]
