"""BGP matcher: closed-form bindings, bag/set semantics, plan shape."""

from __future__ import annotations

import pytest

from pyjelly_spark.operators.bgp import bgp_match

NS = "http://kg.example/ns#"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("f1", NS + "defines", "sym_a"),
        ("f1", NS + "defines", "sym_b"),
        ("f2", NS + "defines", "sym_a"),
        ("f1", NS + "calls", "sym_a"),
        ("f2", NS + "calls", "sym_b"),
        ("f3", NS + "calls", "sym_a"),
        ("r1", NS + "contains", "f1"),
        ("r1", NS + "contains", "f2"),
        ("r2", NS + "contains", "f3"),
        ("loop", NS + "self", "loop"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"])


def _sols(df):
    return {tuple(r[c] for c in sorted(df.columns)) for r in df.collect()}


def test_single_pattern_bindings(triples):
    out = bgp_match(triples, [("?f", NS + "defines", "?sym")])
    assert sorted(out.columns) == ["f", "sym"]
    assert _sols(out) == {("f1", "sym_a"), ("f1", "sym_b"), ("f2", "sym_a")}


def test_two_pattern_join_on_shared_var(triples):
    # callers of symbols that some file defines
    out = bgp_match(
        triples,
        [("?d", NS + "defines", "?sym"), ("?c", NS + "calls", "?sym")],
    )
    assert _sols(out) == {
        ("f1", "f1", "sym_a"),
        ("f3", "f1", "sym_a"),
        ("f1", "f2", "sym_a"),
        ("f3", "f2", "sym_a"),
        ("f2", "f1", "sym_b"),
    }


def test_three_pattern_chain(triples):
    out = bgp_match(
        triples,
        [
            ("?r", NS + "contains", "?d"),
            ("?d", NS + "defines", "?sym"),
            ("?c", NS + "calls", "?sym"),
        ],
    )
    # every (d, sym, c) solution above, extended with d's repo (all r1)
    assert out.count() == 5
    assert {r["r"] for r in out.collect()} == {"r1"}


def test_duplicate_variable_in_pattern_matches_self_loops(triples):
    out = bgp_match(triples, [("?x", NS + "self", "?x")])
    assert _sols(out) == {("loop",)}


def test_ground_pattern_is_existence_gate(triples):
    hit = bgp_match(
        triples,
        [("?r", NS + "contains", "?f"), ("loop", NS + "self", "loop")],
    )
    assert hit.count() == 3
    assert sorted(hit.columns) == ["f", "r"]
    miss = bgp_match(
        triples,
        [("?r", NS + "contains", "?f"), ("loop", NS + "self", "nope")],
    )
    assert miss.count() == 0


def test_disconnected_patterns_cross_join(triples):
    out = bgp_match(
        triples,
        [("?r", NS + "contains", "f1"), ("?x", NS + "self", "?y")],
    )
    assert _sols(out) == {("r1", "loop", "loop")}


def test_bag_vs_set_semantics(spark):
    dup = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "b")], ["s", "p", "o"]
    )
    assert bgp_match(dup, [("?x", "p", "?y")]).count() == 2
    assert bgp_match(dup, [("?x", "p", "?y")], distinct=True).count() == 1


def test_selective_pattern_broadcasts(triples):
    out = bgp_match(
        triples,
        [("?d", NS + "defines", "sym_a"), ("?c", NS + "calls", "?x")],
        broadcast_constants=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_validation_errors(triples):
    with pytest.raises(ValueError):
        bgp_match(triples, [])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?x", "?", "?y")])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?x", "p")])  # type: ignore[list-item]


def test_optional_pattern_left_join(triples):
    out = bgp_match(
        triples,
        [("?d", NS + "defines", "?sym")],
        optional=[("?c", NS + "calls", "?sym")],
    )
    sols = _sols(out)  # columns sorted: c, d, sym
    # sym_b defined by f1 and called by f2; sym_a has two callers
    assert ("f2", "f1", "sym_b") in sols
    # every (d, sym) required solution survives
    assert {(d, s) for _, d, s in sols} == {
        ("f1", "sym_a"), ("f1", "sym_b"), ("f2", "sym_a")
    }
    assert all(c is not None for c, _, _ in sols)  # every sym has a caller


def test_optional_pattern_preserves_unmatched(spark):
    t = spark.createDataFrame(
        [("f1", "defines", "x"), ("f2", "defines", "y"), ("c1", "calls", "x")],
        ["s", "p", "o"],
    )
    out = bgp_match(
        t, [("?d", "defines", "?sym")], optional=[("?c", "calls", "?sym")]
    )
    assert _sols(out) == {("c1", "f1", "x"), (None, "f2", "y")}


def test_filters_apply_to_solutions(triples):
    out = bgp_match(
        triples,
        [("?d", NS + "defines", "?sym"), ("?c", NS + "calls", "?sym")],
        filters=["d != c"],
    )
    assert all(r["d"] != r["c"] for r in out.collect())
    assert out.count() == 4  # drops the (f1, f1, sym_a) self-solution


def test_optional_without_shared_variable_rejected(triples):
    with pytest.raises(ValueError):
        bgp_match(
            triples,
            [("?d", NS + "defines", "?sym")],
            optional=[("?x", NS + "self", "?y")],
        )


def test_bgp_differential_random(spark):
    """Seeded random graphs + random pattern conjunctions vs a pure-Python
    bag-semantics evaluator (nested loops over all variable bindings)."""
    import itertools
    import random

    rng = random.Random(42)
    nodes = ["n0", "n1", "n2", "n3"]
    preds = ["p0", "p1"]

    def py_eval(rows, patterns):
        var_names = []
        for pat in patterns:
            for t in pat:
                if t.startswith("?") and t[1:] not in var_names:
                    var_names.append(t[1:])
        sols = []
        # bag semantics: count, per binding, the product of matching
        # triple multiplicities
        def matches(pat, binding):
            n = 0
            for row in rows:
                ok = True
                local = dict(binding)
                for term, val in zip(pat, row):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in local and local[v] != val:
                            ok = False
                            break
                        local[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    n += 1
            return n

        universe = sorted({v for r in rows for v in r})
        for vals in itertools.product(universe, repeat=len(var_names)):
            binding = dict(zip(var_names, vals))
            mult = 1
            for pat in patterns:
                ground = tuple(
                    binding[t[1:]] if t.startswith("?") else t for t in pat
                )
                mult *= sum(1 for r in rows if r == ground)
                if mult == 0:
                    break
            if mult:
                sols.extend([tuple(binding[v] for v in sorted(var_names))] * mult)
        return sorted(sols)

    for case in range(12):
        n_triples = rng.randint(3, 10)
        # RDF graphs are triple SETS — dedupe so the ground-pattern
        # existence gate (multiplicity 1) agrees with the evaluator
        rows = sorted({
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(n_triples)
        })
        n_pat = rng.randint(1, 3)
        patterns = []
        var_pool = ["?a", "?b", "?c"]
        for _ in range(n_pat):
            pat = tuple(
                rng.choice(var_pool)
                if rng.random() < 0.6
                else rng.choice(nodes if slot != 1 else preds)
                for slot in range(3)
            )
            patterns.append(pat)
        if not any(t.startswith("?") for pat in patterns for t in pat):
            patterns[0] = ("?a", patterns[0][1], patterns[0][2])
        expected = py_eval(rows, patterns)
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        out = bgp_match(df, patterns)
        got = sorted(
            tuple(r[c] for c in sorted(out.columns)) for r in out.collect()
        )
        assert got == expected, (case, rows, patterns)


def test_characteristic_sets_hand_graph(spark):
    from pyjelly_spark.operators.bgp import characteristic_sets

    triples = spark.createDataFrame(
        [
            ("s1", "name", "a"), ("s1", "age", "1"),
            ("s2", "age", "2"), ("s2", "name", "b"), ("s2", "name", "c"),
            ("s3", "name", "d"),
        ],
        "s: string, p: string, o: string",
    )
    got = {r["charset"]: (r["n_subjects"], r["n_triples"])
           for r in characteristic_sets(triples).collect()}
    assert got == {"age,name": (2, 5), "name": (1, 1)}


def test_void_stats_hand_graph(spark):
    from pyjelly_spark.operators.bgp import void_stats

    triples = spark.createDataFrame(
        [
            ("s1", "name", "a"), ("s2", "name", "a"), ("s2", "name", "b"),
            ("s1", "age", "1"),
        ],
        "s: string, p: string, o: string",
    )
    got = {r["p"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
           for r in void_stats(triples).collect()}
    assert got == {"name": (3, 2, 2), "age": (1, 1, 1)}


def test_estimate_cardinality_model():
    from pyjelly_spark.operators.bgp import estimate_cardinality

    stats = {"defines": (1000, 100, 500), "calls": (10, 5, 5)}
    # constant predicate -> its partition count
    assert estimate_cardinality(("?s", "defines", "?o"), stats) == 1000
    # constant subject divides by distinct subjects
    assert estimate_cardinality(("s1", "defines", "?o"), stats) == 10
    # constant object divides by distinct objects
    assert estimate_cardinality(("?s", "defines", "o1"), stats) == 2
    # variable predicate -> total triples
    assert estimate_cardinality(("?s", "?p", "?o"), stats) == 1010
    # unknown predicate -> empty scan
    assert estimate_cardinality(("?s", "nope", "?o"), stats) == 0


def test_stats_join_order_anchors_on_cheapest(spark):
    from pyjelly_spark.operators.bgp import (
        _compile_pattern,
        _join_order,
        estimate_cardinality,
    )

    graph = spark.createDataFrame(
        [("s", "p", "o")], "s: string, p: string, o: string"
    )
    # pattern 0 has 2 constants (default heuristic anchors it) but a huge
    # estimated partition; pattern 1 has 1 constant over a tiny partition
    patterns = [
        ("?f", "big", "const"),
        ("?f", "tiny", "?sym"),
        ("?caller", "mid", "?sym"),
    ]
    stats = {"big": (10_000_000, 10, 10), "tiny": (10, 10, 10),
             "mid": (1000, 10, 10)}
    scans = [_compile_pattern(graph, p, i) for i, p in enumerate(patterns)]
    default_order = [sc.index for sc in _join_order(scans, None)]
    assert default_order[0] == 0  # constant-count heuristic anchors big
    ests = {i: estimate_cardinality(p, stats) for i, p in enumerate(patterns)}
    stats_order = [sc.index for sc in _join_order(scans, ests)]
    # selectivity-first: tiny anchor, then mid (connected via ?sym),
    # then big (connected via ?f)
    assert stats_order == [1, 2, 0]


def test_bgp_match_with_stats_same_bag(spark):
    from pyjelly_spark.operators.bgp import bgp_match, void_stats

    triples = spark.createDataFrame(
        [
            ("r1", "contains", "f1"), ("r1", "contains", "f2"),
            ("f1", "defines", "x"), ("f2", "defines", "y"),
            ("f2", "calls", "x"),
        ],
        "s: string, p: string, o: string",
    )
    patterns = [
        ("?repo", "contains", "?file"),
        ("?file", "defines", "?sym"),
        ("?caller", "calls", "?sym"),
    ]
    want = sorted(
        tuple(sorted(r.asDict().items()))
        for r in bgp_match(triples, patterns).collect()
    )
    got = sorted(
        tuple(sorted(r.asDict().items()))
        for r in bgp_match(triples, patterns, stats=void_stats(triples)).collect()
    )
    assert got == want and len(got) == 1


def test_stats_plan_bag_equivalence_randomized(spark):
    """Property: for random graphs/BGPs/stats, the selectivity-first
    plan computes the same solution bag as the default plan."""
    import random

    from pyjelly_spark.operators.bgp import bgp_match, void_stats

    rng = random.Random(7)
    preds = ["a", "b", "c"]
    nodes = [f"n{i}" for i in range(12)]
    triples = [
        (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
        for _ in range(80)
    ]
    graph = spark.createDataFrame(triples, "s: string, p: string, o: string")
    stats_df = void_stats(graph)
    for trial in range(4):
        k = rng.randint(2, 3)
        vars_ = ["?x", "?y", "?z"]
        patterns = []
        for i in range(k):
            s = rng.choice(vars_ + [rng.choice(nodes)])
            o = rng.choice(vars_ + [rng.choice(nodes)])
            patterns.append((s, rng.choice(preds), o))
        if not any(p[0].startswith("?") or p[2].startswith("?") for p in patterns):
            patterns[0] = ("?x", patterns[0][1], patterns[0][2])
        want = sorted(
            tuple(sorted(r.asDict().items()))
            for r in bgp_match(graph, patterns).collect()
        )
        got = sorted(
            tuple(sorted(r.asDict().items()))
            for r in bgp_match(graph, patterns, stats=stats_df).collect()
        )
        assert got == want, f"trial {trial}: {patterns}"


def test_summarize_graph_hand_quotient(spark):
    from pyjelly_spark.operators.bgp import summarize_graph

    triples = spark.createDataFrame(
        [
            # class A = "knows,name": s1, s2; class B = "name": s3
            ("s1", "name", "lit1"), ("s1", "knows", "s3"),
            ("s2", "name", "lit2"), ("s2", "knows", "s1"),
            ("s3", "name", "lit3"),
        ],
        "s: string, p: string, o: string",
    )
    got = {
        (r["src_class"], r["p"], r["dst_class"]): r["n_edges"]
        for r in summarize_graph(triples).collect()
    }
    assert got == {
        ("knows,name", "name", "<lit>"): 2,
        ("knows,name", "knows", "name"): 1,       # s1 -> s3
        ("knows,name", "knows", "knows,name"): 1,  # s2 -> s1
        ("name", "name", "<lit>"): 1,
    }
