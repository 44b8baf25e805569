"""Distributed k-means over embedding columns, in integer arithmetic.

Training-data pipelines cluster embeddings constantly — IVF coarse
quantizers (operators/similarity.py::ivf_topk consumes exactly such
centroids), topic-balanced data mixing, diversity sampling. The
reference has no counterpart (SURVEY.md §2.10 family); this is the
trainable dual of the fixed sha-derived centroids the IVF path ships
with.

Why integer: Lloyd's algorithm is a fixed recurrence, but float
summation order varies with partitioning, so a float implementation is
not oracle-gateable. Here vectors are scaled to BIGINT once
(``round(x * scale)`` — both engines round half-away-from-zero over
identical doubles), distances are exact integer sums of squares, and
centroid updates are exact integer means (``(s - s % n) div n`` — the
numerator is exactly divisible, so truncation-vs-floor division
semantics can't diverge). Every step is associative integer math →
bit-identical results regardless of engine, partitioning, or summation
order, and the DuckDB oracle unrolls the same recurrence
(queries.py::SQL_EMBEDDING_KMEANS). Same determinism design as
``pagerank_int`` / ``label_propagation`` (components.py).

Scale shape (per iteration):
- assignment is SHUFFLE-FREE: the k centroids are driver state (k*d
  longs — the same regime as MLlib's KMeans, whose centers live on the
  driver between iterations) closed over an Arrow-batched
  ``mapInPandas``; the per-batch distance matrix is exact int64 numpy.
  The corpus is never joined or re-keyed;
- update: per-partition numpy partial sums (one (cid, sum-vec, count)
  row per cluster per partition), collected and combined on the driver
  — O(k * d * partitions) values move, never the corpus, and there is
  NO shuffle at all in an iteration;
- the corpus table is checkpointed once up front; nothing iterative
  accumulates lineage on it.

Seeding: the k lexicographically-smallest ids' vectors — deterministic,
engine-portable, and cheap (a k-row sorted take). A cluster that loses
all its points keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**6


def _int_vecs(
    vecs: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    v = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
    )
    return vecs.select(F.col(id_col).alias("vid"), v.alias("v"))


def _assign(pts: DataFrame, centers: list[tuple[int, list[int]]]) -> DataFrame:
    """Shuffle-free nearest-centroid assignment: the k x d integer
    centroid matrix closes over an Arrow-batched ``mapInPandas`` and the
    per-batch distance matrix is exact int64 numpy — the MLlib regime
    (vectorized math against broadcast driver-state centers), preferred
    over a k*d-literal codegen expression whose generated code grows
    with k*d (compile time dominated the wall at k=8, d=64). Ties go to
    the smallest cid: ``centers`` is ordered by cid and ``argmin`` keeps
    the first minimum."""
    import numpy as np
    import pandas as pd

    ordered = sorted(centers)
    cids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    cmat = np.array([c for _, c in ordered], dtype=np.int64)  # k x d

    def run(batches):
        for b in batches:
            if not len(b):
                continue
            vmat = np.array(list(b["v"]), dtype=np.int64)  # n x d
            # per-centroid pass keeps the intermediate at n x d (not
            # n x k x d), exact int64 throughout
            dists = np.empty((len(vmat), len(cids)), dtype=np.int64)
            for j in range(len(cids)):
                diff = vmat - cmat[j]
                dists[:, j] = (diff * diff).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vid": b["vid"],
                    "v": b["v"],
                    "cid": cids[np.argmin(dists, axis=1)],
                }
            )

    vid_type = dict(pts.dtypes)["vid"]
    return pts.mapInPandas(
        run, schema=f"vid {vid_type}, v array<bigint>, cid bigint"
    )


def _update(
    assigned: DataFrame, centers: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """Exact integer centroid means via per-partition numpy partial sums:
    each Arrow batch contributes one (cid, sum-vector, count) row per
    cluster it contains, so the driver collects O(k * partitions) tiny
    rows instead of shuffling a posexploded corpus. Integer addition is
    associative — partial-sum order cannot change the result. The mean
    is ``(s - s % n) // n`` with C-style ``%`` (trunc-toward-zero
    division), matching Spark's ``div`` and DuckDB's ``//`` exactly.
    Clusters that lost all points keep their previous centroid."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        acc: dict[int, tuple] = {}
        for b in batches:
            if not len(b):
                continue
            vmat = np.array(list(b["v"]), dtype=np.int64)
            cvec = b["cid"].to_numpy()
            for cid in np.unique(cvec):
                block = vmat[cvec == cid]
                s, n = block.sum(axis=0, dtype=np.int64), len(block)
                if cid in acc:
                    s0, n0 = acc[cid]
                    acc[cid] = (s0 + s, n0 + n)
                else:
                    acc[cid] = (s, n)
        if acc:
            yield pd.DataFrame(
                {
                    "cid": list(acc),
                    "s": [list(map(int, v[0])) for v in acc.values()],
                    "n": [v[1] for v in acc.values()],
                }
            )

    rows = assigned.mapInPandas(
        partials, schema="cid bigint, s array<bigint>, n bigint"
    ).collect()
    totals: dict[int, tuple] = {}
    for r in rows:
        s = r["s"]
        if r["cid"] in totals:
            s0, n0 = totals[r["cid"]]
            totals[r["cid"]] = ([a + b for a, b in zip(s0, s)], n0 + r["n"])
        else:
            totals[r["cid"]] = (list(s), r["n"])

    def trunc_div(s: int, n: int) -> int:
        q = abs(s) // n
        return q if s >= 0 else -q

    out = []
    for cid, prev in centers:
        got = totals.get(cid)
        if got is None:
            out.append((cid, prev))  # empty cluster keeps its centroid
        else:
            s, n = got
            out.append((cid, [trunc_div(x, n) for x in s]))
    return out


def kmeans_int(
    vecs: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Fixed-iteration integer Lloyd's k-means. Returns the final
    assignment ``(vid, cid)`` (cid in 1..k) for every input vector,
    labeled against the post-update centroids — the same convention the
    unrolled DuckDB oracle uses.
    """
    pts = _int_vecs(vecs, id_col, vec_col, scale).localCheckpoint(eager=True)
    seed_rows = pts.orderBy("vid").limit(k).collect()
    centers = [(i + 1, list(r["v"])) for i, r in enumerate(seed_rows)]
    for _ in range(iterations):
        centers = _update(_assign(pts, centers), centers)
    return _assign(pts, centers).select("vid", "cid")


def cluster_profile(assignment: DataFrame, pts_src: DataFrame) -> DataFrame:
    """Per-cluster summary (size, id range) — the grouped view a data-
    mixing stage consumes."""
    return assignment.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("vid").alias("min_vid"),
        F.max("vid").alias("max_vid"),
    )
