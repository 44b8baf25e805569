"""Connected components vs a driver-side union-find oracle."""

import random

from pyspark.sql import functions as F

from pyjelly_spark.operators.components import connected_components


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {node: find(node) for node in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src: string, dst: string")
    result = {
        row["node"]: row["component"]
        for row in connected_components(df).collect()
    }
    oracle = _union_find_oracle(edges)
    # canonical representative = lexicographic min of each component
    groups = {}
    for node, root in oracle.items():
        groups.setdefault(root, []).append(node)
    expected = {
        node: min(members) for members in groups.values() for node in members
    }
    assert result == expected


def test_single_edge(spark):
    _check(spark, [("b", "a")])


def test_chain(spark):
    _check(spark, [(f"n{i}", f"n{i+1}") for i in range(9)])


def test_star(spark):
    _check(spark, [("hub", f"leaf{i}") for i in range(8)])


def test_two_components(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")])


def test_self_loops_ignored(spark):
    _check(spark, [("a", "a"), ("a", "b"), ("c", "c"), ("c", "d")])


def test_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}")
            for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, edges)


def test_long_path_log_rounds(spark):
    """A 64-node path needs multiple star rounds — exercises convergence."""
    _check(spark, [(f"p{i:02d}", f"p{i+1:02d}") for i in range(63)])


def test_hashed_path_matches_string_path(spark):
    """The hashed-id rounds (forced via hash_ids=True) must return exactly
    the string-keyed result, including the lexicographic representative."""
    import random

    rng = random.Random(7)
    nodes = [f"http://kg.example/def/r{i}/p{i}#s{i % 17}" for i in range(300)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(500)
    ]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    via_strings = {
        (r["node"], r["component"])
        for r in connected_components(df, hash_ids=False).collect()
    }
    via_hashes = {
        (r["node"], r["component"])
        for r in connected_components(df, hash_ids=True).collect()
    }
    assert via_hashes == via_strings


def test_bfs_reachable_min_depth_and_bound(spark):
    from pyjelly_spark.operators.components import bfs_reachable

    # a -> b -> c -> d -> e, plus shortcut a -> c and a cycle e -> a
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"),
         ("e", "a")],
        ["src", "dst"],
    )
    src = spark.createDataFrame([("a",)], ["node"])
    out = {r["node"]: r["depth"] for r in bfs_reachable(edges, src).collect()}
    # c is at depth 1 via the shortcut, not 2; cycle does not re-add a
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}

    capped = {
        r["node"]: r["depth"]
        for r in bfs_reachable(edges, src, max_depth=2).collect()
    }
    assert capped == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_reachable_multi_source_and_isolated(spark):
    from pyjelly_spark.operators.components import bfs_reachable

    edges = spark.createDataFrame(
        [("a", "b"), ("x", "y")], ["src", "dst"]
    )
    src = spark.createDataFrame([("a",), ("x",), ("a",)], ["node"])
    out = {r["node"]: r["depth"] for r in bfs_reachable(edges, src).collect()}
    assert out == {"a": 0, "x": 0, "b": 1, "y": 1}
