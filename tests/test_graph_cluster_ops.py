"""k-core peeling and integer k-means vs brute-force driver oracles."""

import random

from pyspark.sql import functions as F

from pyjelly_spark.operators.clustering import kmeans_int
from pyjelly_spark.operators.components import kcore


def _brute_kcore(edges, k, rounds):
    """Replicate the fixed-round peel exactly: symmetrize+dedup, then per
    round drop nodes with degree < k and their edges."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    for _ in range(rounds):
        deg = {}
        for a, _b in und:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        und = {(a, b) for a, b in und if a in alive and b in alive}
    out = {}
    for a, _b in und:
        out[a] = out.get(a, 0) + 1
    return out


class TestKCore:
    def test_triangle_with_tail(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
        df = spark.createDataFrame(edges, "src: string, dst: string")
        got = {r["node"]: r["deg"] for r in kcore(df, k=2, rounds=3).collect()}
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_random_graphs_match_brute_force(self, spark):
        rng = random.Random(20260818)
        for trial in range(4):
            n = rng.randint(8, 30)
            m = rng.randint(n, 3 * n)
            edges = [
                (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
                for _ in range(m)
            ]
            for k in (2, 3):
                df = spark.createDataFrame(edges, "src: string, dst: string")
                got = {
                    r["node"]: r["deg"]
                    for r in kcore(df, k=k, rounds=5).collect()
                }
                assert got == _brute_kcore(edges, k, 5), (trial, k)

    def test_fixed_rounds_reach_fixpoint_on_chain(self, spark):
        # a chain peels one layer per round from each end; 5 rounds
        # suffice for a 6-node chain at k=2 (everything dies)
        edges = [(f"c{i}", f"c{i+1}") for i in range(5)]
        df = spark.createDataFrame(edges, "src: string, dst: string")
        assert kcore(df, k=2, rounds=5).count() == 0
        # and a clique survives any number of rounds intact
        clique = [
            (f"q{i}", f"q{j}") for i in range(4) for j in range(i + 1, 4)
        ]
        df2 = spark.createDataFrame(clique, "src: string, dst: string")
        got = {r["node"]: r["deg"] for r in kcore(df2, k=3, rounds=6).collect()}
        assert got == {f"q{i}": 3 for i in range(4)}


def _brute_kmeans(vecs, k, iterations, scale):
    """The exact integer recurrence, in plain Python."""
    import math

    # Python round() is banker's rounding and Python % is floor-mod;
    # replicate Spark/DuckDB semantics exactly: round half away from
    # zero, integer mean = truncation-toward-zero division.
    def r(x):
        return int(math.floor(x + 0.5)) if x >= 0 else -int(
            math.floor(-x + 0.5)
        )

    def trunc_div(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    pts = {vid: [r(float(x) * scale) for x in v] for vid, v in vecs}
    seeds = sorted(pts)[:k]
    centers = {i + 1: list(pts[vid]) for i, vid in enumerate(seeds)}

    def assign():
        out = {}
        for vid, v in pts.items():
            best = None
            for cid in sorted(centers):
                d = sum((a - b) * (a - b) for a, b in zip(v, centers[cid]))
                if best is None or d < best[0]:
                    best = (d, cid)
            out[vid] = best[1]
        return out

    for _ in range(iterations):
        asg = assign()
        by = {}
        for vid, cid in asg.items():
            by.setdefault(cid, []).append(pts[vid])
        for cid, members in by.items():
            n = len(members)
            centers[cid] = [
                trunc_div(sum(col), n) for col in zip(*members)
            ]
    return assign()


class TestKMeansInt:
    def test_matches_brute_force_recurrence(self, spark):
        rng = random.Random(7)
        vecs = [
            (f"v{i:03d}", [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(vecs, "vec_id: string, embedding: array<double>")
        got = {
            r["vid"]: r["cid"]
            for r in kmeans_int(df, k=4, iterations=2).collect()
        }
        assert got == _brute_kmeans(vecs, 4, 2, 10**6)

    def test_deterministic_across_partitionings(self, spark):
        rng = random.Random(11)
        vecs = [
            (f"v{i:03d}", [rng.uniform(-1, 1) for _ in range(6)])
            for i in range(30)
        ]
        df1 = spark.createDataFrame(
            vecs, "vec_id: string, embedding: array<double>"
        ).repartition(1)
        df8 = spark.createDataFrame(
            vecs, "vec_id: string, embedding: array<double>"
        ).repartition(8)
        a1 = sorted(map(tuple, kmeans_int(df1, k=3, iterations=2).collect()))
        a8 = sorted(map(tuple, kmeans_int(df8, k=3, iterations=2).collect()))
        assert a1 == a8

    def test_empty_cluster_keeps_centroid(self, spark):
        # two tight blobs, k=3: the third seed is inside blob one and
        # loses all points after the first update; the run must not fail
        # and every point must still get a label in 1..3
        vecs = [(f"a{i}", [0.0 + i * 1e-4, 0.0]) for i in range(3)] + [
            (f"b{i}", [1.0 + i * 1e-4, 1.0]) for i in range(3)
        ]
        df = spark.createDataFrame(vecs, "vec_id: string, embedding: array<double>")
        out = kmeans_int(df, k=3, iterations=3).collect()
        assert len(out) == 6
        assert {r["cid"] for r in out} <= {1, 2, 3}


def _brute_sssp(edges, sources, rounds):
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a == b:
                continue
            if a in dist and (b not in nxt or dist[a] + w < nxt[b]):
                nxt[b] = min(nxt.get(b, 1 << 60), dist[a] + w)
        dist = nxt
    return dist


class TestSsspInt:
    def test_weighted_beats_hop_count(self, spark):
        # a->c direct costs 10; a->b->c costs 2+3=5: min COST must win
        edges = [("a", "c", 10), ("a", "b", 2), ("b", "c", 3)]
        df = spark.createDataFrame(edges, "src: string, dst: string, w: long")
        src = spark.createDataFrame([("a",)], ["node"])
        from pyjelly_spark.operators.components import sssp_int

        got = {r["node"]: r["dist"] for r in sssp_int(df, src, rounds=3).collect()}
        assert got == {"a": 0, "b": 2, "c": 5}

    def test_random_graphs_match_brute_force_and_fixpoint(self, spark):
        from pyjelly_spark.operators.components import sssp_int

        rng = random.Random(99)
        for trial in range(3):
            n = rng.randint(6, 15)
            edges = [
                (
                    f"n{rng.randrange(n)}",
                    f"n{rng.randrange(n)}",
                    rng.randint(1, 9),
                )
                for _ in range(3 * n)
            ]
            df = spark.createDataFrame(
                edges, "src: string, dst: string, w: long"
            )
            src = spark.createDataFrame([("n0",), ("n1",)], ["node"])
            rounds = n  # >= diameter: fixpoint reached
            got = {
                r["node"]: r["dist"]
                for r in sssp_int(df, src, rounds=rounds).collect()
            }
            assert got == _brute_sssp(edges, ["n0", "n1"], rounds), trial
            # one extra round is a no-op at the fixpoint
            again = {
                r["node"]: r["dist"]
                for r in sssp_int(df, src, rounds=rounds + 1).collect()
            }
            assert again == got


def test_clustering_coefficient_closed_form(spark):
    """Triangle + pendant graph: a-b-c triangle (each coeff 1.0), d
    attached to a (a's coeff drops to 2*1/(3*2)=0.3333, d excluded
    with degree 1)."""
    from pyjelly_spark.operators.components import clustering_coefficient

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")], ["src", "dst"]
    )
    out = {r["node"]: r for r in clustering_coefficient(edges).collect()}
    assert set(out) == {"a", "b", "c"}  # d has degree 1
    assert out["a"]["degree"] == 3 and out["a"]["triangles"] == 1
    assert out["a"]["coeff_x10000"] == 3333
    for n in ("b", "c"):
        assert out[n]["degree"] == 2 and out[n]["coeff_x10000"] == 10000


def test_node_similarity_hub_cap(spark):
    """hub_cap excludes high-in-degree neighbors from candidate
    generation: pairs meeting ONLY at the hub disappear; pairs sharing a
    non-hub neighbor keep their non-hub intersection count."""
    from pyjelly_spark.operators.components import node_similarity

    edges = []
    # hub h imported by a,b,c,d; a,b also share private neighbor p
    for s in ("a", "b", "c", "d"):
        edges.append((s, "h"))
    edges += [("a", "p"), ("b", "p")]
    df = spark.createDataFrame(edges, "src string, dst string")

    full = {
        (r["a"], r["b"]): r["shared"]
        for r in node_similarity(df, min_shared=1).collect()
    }
    capped = {
        (r["a"], r["b"]): (r["shared"], r["deg_a"], r["deg_b"])
        for r in node_similarity(df, min_shared=1, hub_cap=3).collect()
    }
    # uncapped: all 6 pairs of {a,b,c,d} meet at h; (a,b) shares 2
    assert full[("a", "b")] == 2 and len(full) == 6
    # capped at 3 (< indeg(h)=4): only (a,b) survives via p, shared=1;
    # degrees are also computed on the capped edge set
    assert capped == {("a", "b"): (1, 1, 1)}


def test_bipartite_doubled_cover_known_graphs(spark):
    """Doubled-cover bipartiteness on hand-built graphs: even cycle
    (bipartite), odd cycle (not), even cycle + odd chord (not), path
    with pendant tree (bipartite)."""
    from pyspark.sql import functions as F

    from pyjelly_spark.operators.components import connected_components

    def census(edges):
        e = spark.createDataFrame(edges, "s: string, t: string")
        cover = e.select(
            F.concat("s", F.lit("#0")).alias("src"),
            F.concat("t", F.lit("#1")).alias("dst"),
        ).unionByName(
            e.select(
                F.concat("s", F.lit("#1")).alias("src"),
                F.concat("t", F.lit("#0")).alias("dst"),
            )
        )
        cc = connected_components(cover, checkpoint=False)
        per = (
            cc.select(
                F.substring_index("node", "#", 1).alias("v"),
                F.col("component").alias("cf"),
            )
            .groupBy("v")
            .agg(F.countDistinct("cf").alias("n_cover"))
        )
        return {r["v"]: r["n_cover"] == 2 for r in per.collect()}

    # C4 a-b-c-d-a: bipartite
    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert all(census(c4).values())
    # C3: odd
    c3 = [("x", "y"), ("y", "z"), ("z", "x")]
    assert not any(census(c3).values())
    # C4 + chord a-c: triangle -> odd
    c4c = c4 + [("a", "c")]
    assert not any(census(c4c).values())
    # path + pendant: bipartite
    tree = [("p", "q"), ("q", "r"), ("q", "s")]
    assert all(census(tree).values())


def test_boruvka_matches_kruskal_on_random_graphs(spark):
    """boruvka_msf == a sequential Kruskal (union-find) on several
    small random-ish graphs with distinct deterministic weights,
    including multi-component forests and chains."""
    from pyjelly_spark.operators.components import boruvka_msf

    def kruskal(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        tree = []
        for w, s, t in sorted((w, s, t) for s, t, w in edges):
            rs, rt = find(s), find(t)
            if rs != rt:
                parent[rs] = rt
                tree.append((min(s, t), max(s, t), w))
        return set(tree)

    import hashlib

    def wt(a, b):
        a, b = min(a, b), max(a, b)
        return int(hashlib.sha256(f"{a}:{b}".encode()).hexdigest()[:15], 16)

    graphs = [
        # two triangles + bridge-less second component
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (10, 12)],
        # chain of 9 (tests pointer-jump depth)
        [(i, i + 1) for i in range(9)],
        # dense K5
        [(a, b) for a in range(5) for b in range(a + 1, 5)],
    ]
    for g in graphs:
        edges = [(s, t, wt(s, t)) for s, t in g]
        df = spark.createDataFrame(edges, "s: long, t: long, w: long")
        got = {
            (r["s"], r["t"], r["w"]) for r in boruvka_msf(df).collect()
        }
        assert got == kruskal(edges), g


def test_densest_peel_recovers_planted_clique(spark):
    """Parallel peeling isolates a planted K6 (density 2.5) from a
    sparse background path, and the per-round stats shrink
    monotonically."""
    from pyjelly_spark.operators.components import densest_subgraph_peel

    path = [(100 + i, 101 + i) for i in range(30)]
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(path + k6, "s: long, t: long")
    stats = densest_subgraph_peel(df)
    assert [s[1] for s in stats] == sorted(
        [s[1] for s in stats], reverse=True
    )
    best = max(stats, key=lambda x: (x[2] * 10**12 // x[1], -x[0]))
    assert best[1] == 6 and best[2] == 15
    assert best[3] == sum(range(6))


def test_local_dominant_matching_is_maximal_matching(spark):
    """Matched set is a valid matching (no shared endpoints) and
    maximal (every unmatched edge touches a matched node), on a path,
    a clique, and a star."""
    from pyjelly_spark.operators.components import local_dominant_matching

    import hashlib

    def wt(a, b):
        a, b = min(a, b), max(a, b)
        return int(hashlib.sha256(f"{a}:{b}".encode()).hexdigest()[:15], 16)

    graphs = [
        [(i, i + 1) for i in range(10)],                      # path
        [(a, b) for a in range(6) for b in range(a + 1, 6)],  # K6
        [(0, i) for i in range(1, 8)],                        # star
    ]
    for g in graphs:
        edges = [(s, t, wt(s, t)) for s, t in g]
        df = spark.createDataFrame(edges, "s: long, t: long, w: long")
        m = [(r["s"], r["t"]) for r in local_dominant_matching(df).collect()]
        used = [v for e in m for v in e]
        assert len(used) == len(set(used)), "not a matching"
        mset = set(used)
        for s, t in g:
            assert s in mset or t in mset, f"edge {(s, t)} unmatched-free"


def test_luby_mis_independent_and_maximal(spark):
    """MIS output is independent (no edge inside) and maximal (every
    non-member has a member neighbor) on path, cycle, clique, star."""
    from pyjelly_spark.operators.components import luby_mis

    graphs = [
        [(i, i + 1) for i in range(12)],                       # path
        [(i, (i + 1) % 9) for i in range(9)],                  # C9
        [(a, b) for a in range(5) for b in range(a + 1, 5)],   # K5
        [(0, i) for i in range(1, 9)],                         # star
    ]
    for g in graphs:
        df = spark.createDataFrame(g, "s: long, t: long")
        mis = {r["node"] for r in luby_mis(df).collect()}
        adj = {}
        for s, t in g:
            adj.setdefault(s, set()).add(t)
            adj.setdefault(t, set()).add(s)
        for s, t in g:
            assert not (s in mis and t in mis), (g, mis)
        for v in adj:
            assert v in mis or adj[v] & mis, (g, v, mis)


def test_luby_mis_empty_edges(spark):
    """Empty edge input returns an empty (node, round) frame, not an
    IndexError on a never-filled round list."""
    from pyjelly_spark.operators.components import luby_mis

    df = spark.createDataFrame([], "s: long, t: long")
    out = luby_mis(df)
    assert out.columns == ["node", "round"]
    assert out.count() == 0


def test_coreness_hindex_matches_peeling(spark):
    """h-index iteration == classic min-degree peeling on K5 + path +
    a C4-with-chord, and the 12-round cap is past the fixpoint
    (12 and 15 rounds agree)."""
    from pyjelly_spark.operators.components import coreness_hindex

    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]   # K5: core 4
        + [(4, 100), (100, 101), (101, 102)]                  # tail: core 1
        + [(200, 201), (201, 202), (202, 203), (203, 200), (200, 202)]
    )                                                         # C4+chord: 2
    df = spark.createDataFrame(edges, "s: long, t: long")
    got = {r["node"]: r["coreness"] for r in coreness_hindex(df).collect()}
    got15 = {r["node"]: r["coreness"]
             for r in coreness_hindex(df, rounds=15).collect()}
    assert got == got15  # converged well before the cap

    # python peeling
    adj = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    live = dict(deg)
    k = 0
    while live:
        k = max(k, min(live.values()))
        peel = [v for v, d in live.items() if d <= k]
        while peel:
            v = peel.pop()
            if v not in live:
                continue
            core[v] = k
            del live[v]
            for u in adj[v]:
                if u in live:
                    live[u] -= 1
                    if live[u] <= k:
                        peel.append(u)
    assert got == core
