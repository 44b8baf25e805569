"""Similarity search over embedding columns (array<float>).

Two paths, per the driver brief:

- brute-force cosine top-k — the exact baseline. The corpus matrix is
  broadcast to executors and each Arrow batch of query vectors does one
  numpy matmul (``mapInPandas``): vectorized BLAS instead of per-element
  interpreted expressions (~100x over higher-order-function folds).
  Right shape while the index side fits in a broadcast (classic
  broadcast-join regime); beyond that, use :func:`ann_topk`.
- bucketed ANN (multi-table sign-LSH) — the 100 TB path: deterministic
  hyperplanes hash every vector into ``n_tables`` sign-pattern buckets
  (+1-bit multi-probe); scoring runs per bucket via ``applyInPandas``
  (numpy within the bucket), then a global window merges per-query
  top-k. The bucket shuffle replaces the n^2 cross join; no broadcast
  of the corpus anywhere, so it scales out with executors.

No counterpart in the reference (SURVEY.md §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyjelly_spark.functions.text import hex_hash
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

TOPK_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("rank", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

PAIR_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


# Epsilon applied symmetrically in the DuckDB oracles: Spark-side dots come
# from numpy/BLAS matmuls (pairwise/SIMD summation) while DuckDB list_reduce
# is a left fold — the two can differ by ~1e-15 relative, which matters only
# when a true score lands exactly on a 1e-4 floor boundary (synthetic data
# loves exact decimals). Nudging both engines by the same 1e-9 before
# flooring makes the gate deterministic for any disagreement < 1e-9.
FLOOR_EPS = 1e-9


def _floor4(x: np.ndarray) -> np.ndarray:
    # floor-scaling, not round(): rounding-mode-proof across engines
    return np.floor(x * 10000 + FLOOR_EPS) / 10000


def _row_topk_asc(vals: np.ndarray, k: int) -> np.ndarray:
    """Row-wise indices of the k smallest values, ties broken by
    ascending column index — identical output to
    ``np.argsort(vals, axis=1, kind="stable")[:, :k]`` but O(n) per
    row: argpartition prefilter, stable ordering of the k-prefix, then
    an exact boundary-tie repair (argpartition splits equal values
    arbitrarily across the k-boundary, so an excluded column tying the
    k-th value may carry a LOWER index than an included one — those
    rare rows fall back to the full stable argsort). Rows containing
    NaN (e.g. 0/0 cosine from a zero-norm vector) also take the full
    fallback: NaN != NaN zeroes both tie counts, so the boundary
    repair can never trigger on them and the fast path would return an
    arbitrary NaN subset/order."""
    rows, n = vals.shape
    if k >= n:
        return np.argsort(vals, axis=1, kind="stable")
    part = np.argpartition(vals, k - 1, axis=1)[:, :k]
    order_in = np.lexsort((part, np.take_along_axis(vals, part, axis=1)), axis=1)
    top = np.take_along_axis(part, order_in, axis=1)
    bval = np.take_along_axis(vals, top[:, k - 1 : k], axis=1)
    n_tied_all = (vals == bval).sum(axis=1)
    n_tied_in = (np.take_along_axis(vals, top, axis=1) == bval).sum(axis=1)
    bad = (n_tied_all != n_tied_in) | np.isnan(vals).any(axis=1)
    for r in np.nonzero(bad)[0]:
        top[r] = np.argsort(vals[r], kind="stable")[:k]
    return top


def _matrix(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])


# Broadcast-regime ceiling for the exact paths: the corpus matrix is
# collected to the driver and broadcast, which is only the right plan while
# it comfortably fits executor memory (classic broadcast-join regime).
# Above this, the bucketed paths (ann_topk / lsh_dup_pairs) are the design.
MAX_BROADCAST_VECTORS = 2_000_000


def _guarded_corpus(emb: DataFrame, id_col: str, vec_col: str, caller: str):
    """Collect the corpus for broadcast, refusing beyond the broadcast
    regime instead of silently OOMing the driver.

    One job, not two: collecting LIMIT max+1 both fetches the corpus and
    proves it fits — the separate ``count()`` action this replaced was a
    full extra scan per call (the round-2 embedding_topk regression)."""
    pdf = (
        emb.select(id_col, vec_col)
        .limit(MAX_BROADCAST_VECTORS + 1)
        .toPandas()
    )
    if len(pdf) > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"{caller}: corpus exceeds the broadcast regime "
            f"(max {MAX_BROADCAST_VECTORS} vectors); use the bucketed LSH "
            "path (ann_topk / lsh_dup_pairs) instead"
        )
    return pdf


def cosine_topk(
    emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (vec_id, neighbor_id,
    rank, score floor-scaled to 4 decimals).

    The corpus (id, vector) is collected once (size-guarded — see
    MAX_BROADCAST_VECTORS) and broadcast; each query partition multiplies
    its Arrow batch against the corpus matrix. Deterministic: ties rank
    by neighbor_id ascending.
    """
    corpus_pdf = _guarded_corpus(emb, id_col, vec_col, "cosine_topk")
    ids = corpus_pdf[id_col].to_numpy(dtype="int64")
    mat = _matrix(corpus_pdf, vec_col)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_norms = bc.value
        pos = {int(i): p for p, i in enumerate(c_ids)}
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype="int64")
            q_mat = _matrix(pdf, vec_col)
            q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
            scores = (q_mat @ c_mat.T) / np.outer(q_norms, c_norms)
            out_vec, out_nbr, out_rank, out_score = [], [], [], []
            for r, qid in enumerate(q_ids):
                row = scores[r].copy()
                if int(qid) in pos:
                    row[pos[int(qid)]] = -np.inf
                # top-k by (-score, neighbor_id): lexsort is stable+exact
                order = np.lexsort((c_ids, -row))[:k]
                # drop the -inf self slot when the corpus has <= k vectors
                keep = np.isfinite(row[order])
                order = order[keep]
                out_vec.extend([int(qid)] * len(order))
                out_nbr.extend(c_ids[order])
                out_rank.extend(range(1, len(order) + 1))
                out_score.extend(_floor4(row[order]))
            yield pd.DataFrame(
                {
                    "vec_id": out_vec,
                    "neighbor_id": out_nbr,
                    "rank": out_rank,
                    "score": out_score,
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(run, schema=TOPK_SCHEMA)


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, score) with a < b and
    cosine >= threshold (floor-scaled). Same broadcast-matmul shape as
    :func:`cosine_topk` (size-guarded); at corpus x corpus scale use
    :func:`lsh_dup_pairs`, the bucketed variant."""
    corpus_pdf = _guarded_corpus(emb, id_col, vec_col, "cosine_dup_pairs")
    ids = corpus_pdf[id_col].to_numpy(dtype="int64")
    mat = _matrix(corpus_pdf, vec_col)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype="int64")
            q_mat = _matrix(pdf, vec_col)
            q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
            scores = (q_mat @ c_mat.T) / np.outer(q_norms, c_norms)
            # threshold with the same epsilon the oracle uses (see FLOOR_EPS)
            keep_q, keep_c = np.where(
                (scores >= threshold - FLOOR_EPS)
                & (q_ids[:, None] < c_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "a": q_ids[keep_q],
                    "b": c_ids[keep_c],
                    "score": _floor4(scores[keep_q, keep_c]),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run,
        schema=StructType(
            [
                StructField("a", LongType(), False),
                StructField("b", LongType(), False),
                StructField("score", DoubleType(), False),
            ]
        ),
    )


def _hyperplanes(dim: int, count: int) -> np.ndarray:
    """Deterministic hyperplanes derived from sha256, so any engine with
    sha256 + hex parsing recomputes the identical coefficients (DuckDB:
    ``('0x'||substring(sha256('plane:'||p||':'||i),1,15))::BIGINT``).

    coef(p, i) = hex60("plane:p:i") / 2^59 - 1  in [-1, 1). The division
    by a power of two rounds the 60-bit integer to double identically in
    every IEEE engine, which makes the LSH bucket assignment — and hence
    the whole ANN result — oracle-computable in SQL.
    """
    import hashlib

    out = np.empty((count, dim))
    for p in range(count):
        for i in range(dim):
            h = int(
                hashlib.sha256(f"plane:{p}:{i}".encode()).hexdigest()[:15], 16
            )
            out[p, i] = h / float(1 << 59) - 1.0
    return out


def _lsh_probes(
    emb: DataFrame,
    n_planes: int,
    n_tables: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared LSH stage 1: (bucket, role, id, v) probe rows.

    One narrow map: signature bits per table from one matmul with the
    deterministic (sha-derived) plane matrix; each vector emits an anchor
    row in its own bucket plus candidate rows in its own and every
    1-bit-flipped probe bucket. Fully vectorized (tile/concat — no
    per-row Python).
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_tables * n_planes)
    bc = emb.sparkSession.sparkContext.broadcast(planes)
    weights = np.array([1 << p for p in range(n_planes)], dtype="int64")

    probe_schema = StructType(
        [
            StructField("bucket", LongType(), False),
            StructField("role", IntegerType(), False),  # 0=anchor, 1=candidate
            StructField("id", LongType(), False),
            StructField("v", emb.schema[vec_col].dataType, False),
        ]
    )

    def emit_probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = _matrix(pdf, vec_col)
            bits = (mat @ pl.T) > 0  # (n, n_tables*n_planes)
            vecs = pdf[vec_col].to_numpy()  # object array, tile-able
            rep = 1 + n_planes  # candidate copies: own bucket + 1-bit flips
            frames = []
            for t in range(n_tables):
                sig = (
                    bits[:, t * n_planes : (t + 1) * n_planes].astype("int64")
                    @ weights
                ) + (t << 16)
                # anchors: scored in their own bucket only
                frames.append(
                    pd.DataFrame(
                        {"bucket": sig, "role": 0, "id": ids, "v": vecs}
                    )
                )
                # candidates: base bucket + every 1-bit-flipped probe bucket,
                # built with vectorized tile/concat (no per-row Python)
                flip_buckets = np.concatenate(
                    [sig] + [sig ^ (1 << p) for p in range(n_planes)]
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "bucket": flip_buckets,
                            "role": 1,
                            "id": np.tile(ids, rep),
                            "v": np.tile(vecs, rep),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select(id_col, vec_col).mapInPandas(
        emit_probes, schema=probe_schema
    )


def _bucketed_topk(probes: DataFrame, k: int) -> DataFrame:
    """Shared stages 2+3 of the bucketed ANN family: per-bucket numpy
    scoring of anchors (role 0) against candidates (role 1) via
    applyInPandas, then a global per-query top-k merge."""

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        anchors = pdf[pdf["role"] == 0]
        cands = pdf[pdf["role"] == 1]
        if anchors.empty or len(cands) < 2:
            return pd.DataFrame(
                {"vec_id": [], "neighbor_id": [], "score": []}
            ).astype({"vec_id": "int64", "neighbor_id": "int64", "score": "float64"})
        a_ids = anchors["id"].to_numpy(dtype="int64")
        c_ids = cands["id"].to_numpy(dtype="int64")
        a_mat = _matrix(anchors, "v")
        c_mat = _matrix(cands, "v")
        a_n = np.sqrt((a_mat * a_mat).sum(axis=1))
        c_n = np.sqrt((c_mat * c_mat).sum(axis=1))
        scores = (a_mat @ c_mat.T) / np.outer(a_n, c_n)
        out = {"vec_id": [], "neighbor_id": [], "score": []}
        for r, aid in enumerate(a_ids):
            row = scores[r].copy()
            row[c_ids == aid] = -np.inf
            order = np.lexsort((c_ids, -row))[:k]
            keep = np.isfinite(row[order])
            out["vec_id"].extend([int(aid)] * int(keep.sum()))
            out["neighbor_id"].extend(c_ids[order][keep])
            out["score"].extend(_floor4(row[order][keep]))
        return pd.DataFrame(out)

    local = probes.groupBy("bucket").applyInPandas(bucket_topk, schema=PAIR_SCHEMA)
    merged = local.groupBy("vec_id", "neighbor_id").agg(
        F.max("score").alias("score")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "score")
    )


def ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (the 100 TB path).

    Stage 1 (narrow map): :func:`_lsh_probes`.
    Stages 2+3: :func:`_bucketed_topk` (bucket shuffle + query merge).
    Recall follows 1-(1-p^r)^L; scores of returned pairs are exact, and
    the whole pipeline is deterministic and SQL-replicable (see
    queries.SQL_EMBEDDING_ANN).
    """
    return _bucketed_topk(_lsh_probes(emb, n_planes, n_tables, id_col, vec_col), k)


def _ivf_centroids(dim: int, n_cells: int) -> np.ndarray:
    """Deterministic sha256-derived coarse-quantizer centroids (same
    closed form as :func:`_hyperplanes`, distinct salt), so SQL engines
    recompute identical cell assignments."""
    import hashlib

    out = np.empty((n_cells, dim))
    for cell in range(n_cells):
        for i in range(dim):
            h = int(
                hashlib.sha256(f"cell:{cell}:{i}".encode()).hexdigest()[:15], 16
            )
            out[cell, i] = h / float(1 << 59) - 1.0
    return out


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer — the second scale
    path beside sign-LSH (:func:`ann_topk`).

    Every vector joins the inverted list of its best (max-cosine)
    centroid cell (role 1); every query probes its ``n_probe`` best
    cells (role 0) — a bounded n_probe/n_cells scan fraction with exact
    re-ranking inside probed cells. Cell scoring + merging reuse the
    bucketed machinery. No corpus broadcast anywhere; the cell shuffle
    replaces the n^2 cross join.

    The codebook here is random (sha-derived) so the WHOLE pipeline is
    deterministic and SQL-oracle-checkable — assignment margins vs
    engine summation noise measured >= 1.5e-5 at both SFs. Measured
    recall@5 with the defaults (25% scan fraction) is ~0.49 on the
    synthetic corpus; production deployments swap in a k-means-learned
    codebook for higher recall at the same scan fraction — the operator
    contract (inverted lists, bounded probing, exact re-rank) is
    unchanged.
    """
    dim = len(emb.select(vec_col).first()[0])
    cents = _ivf_centroids(dim, n_cells)
    c_norms = np.sqrt((cents * cents).sum(axis=1))
    bc = emb.sparkSession.sparkContext.broadcast((cents, c_norms))

    probe_schema = StructType(
        [
            StructField("bucket", LongType(), False),
            StructField("role", IntegerType(), False),  # 0=query, 1=member
            StructField("id", LongType(), False),
            StructField("v", emb.schema[vec_col].dataType, False),
        ]
    )

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_mat, c_n = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = _matrix(pdf, vec_col)
            v_n = np.sqrt((mat * mat).sum(axis=1))
            scores = (mat @ c_mat.T) / np.outer(v_n, c_n)
            # top-n_probe cells by (score desc, cell asc):
            # argpartition + tie-exact repair, O(n_cells) per row
            order = _row_topk_asc(-scores, max(n_probe, 1))
            vecs = pdf[vec_col].to_numpy()
            frames = [
                pd.DataFrame(
                    {
                        "bucket": order[:, 0].astype("int64"),
                        "role": 1,
                        "id": ids,
                        "v": vecs,
                    }
                )
            ]
            for p in range(n_probe):
                frames.append(
                    pd.DataFrame(
                        {
                            "bucket": order[:, p].astype("int64"),
                            "role": 0,
                            "id": ids,
                            "v": vecs,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    probes = emb.select(id_col, vec_col).mapInPandas(emit, schema=probe_schema)
    return _bucketed_topk(probes, k)


def lsh_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed embedding near-dup pairs — the 100 TB path for cosine
    dedup: (a, b, score) with a < b, cosine >= threshold, candidates
    generated by the same multi-table sign-LSH as :func:`ann_topk` (no
    corpus broadcast, no driver collect, no all-pairs join).

    Probe symmetry (xor is involutive: x_base ^ flip == y_base iff
    y_base ^ flip == x_base) guarantees every colliding pair appears with
    the smaller id as the anchor, so filtering anchor < candidate loses
    nothing. Precision w.r.t. the threshold is 1.0 (scores are exact);
    recall is the LSH collision probability — deterministic here, and
    SQL-replicable (queries.SQL_DEDUP_EMBEDDING_LSH).
    """
    probes = _lsh_probes(emb, n_planes, n_tables, id_col, vec_col)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        anchors = pdf[pdf["role"] == 0]
        cands = pdf[pdf["role"] == 1]
        if anchors.empty or len(cands) < 2:
            return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                {"a": "int64", "b": "int64", "score": "float64"}
            )
        a_ids = anchors["id"].to_numpy(dtype="int64")
        c_ids = cands["id"].to_numpy(dtype="int64")
        a_mat = _matrix(anchors, "v")
        c_mat = _matrix(cands, "v")
        a_n = np.sqrt((a_mat * a_mat).sum(axis=1))
        c_n = np.sqrt((c_mat * c_mat).sum(axis=1))
        scores = (a_mat @ c_mat.T) / np.outer(a_n, c_n)
        keep_a, keep_c = np.where(
            (scores >= threshold - FLOOR_EPS)
            & (a_ids[:, None] < c_ids[None, :])
        )
        return pd.DataFrame(
            {
                "a": a_ids[keep_a],
                "b": c_ids[keep_c],
                "score": _floor4(scores[keep_a, keep_c]),
            }
        )

    pairs = probes.groupBy("bucket").applyInPandas(
        bucket_pairs,
        schema=StructType(
            [
                StructField("a", LongType(), False),
                StructField("b", LongType(), False),
                StructField("score", DoubleType(), False),
            ]
        ),
    )
    # a pair can collide in several buckets/tables; scores are identical
    # (same vectors), so max() is pure dedup
    return pairs.groupBy("a", "b").agg(F.max("score").alias("score"))


# --- product quantization ----------------------------------------------------

PQ_SCALE = 10**6
# PQ broadcast ceiling is per CODE TABLE (m bytes-ish per vector), not per
# raw vector — the compression is exactly why the broadcast regime extends
# ~100x further than MAX_BROADCAST_VECTORS before sharding is needed.
MAX_BROADCAST_CODES = 50_000_000


def _pq_codebooks(iv: DataFrame, m: int, ks: int):
    """Deterministic sampled-anchor PQ codebooks: the ``ks`` corpus
    vectors with the smallest portable hash of their id (sha256 of
    ``pqanchor:<vid>`` — a content-independent pseudo-random draw)
    become the anchors; codebook entry (m, j) is anchor j's m-th
    subvector. Sampling puts every entry ON the data manifold (a random
    [-scale, scale] codebook quantizes real embeddings to noise —
    measured recall@5 0.03 vs 0.5+ with anchors), it is the standard
    k-means++ -style init (k-means iterations would tighten it further),
    and it stays exactly SQL-replicable: the oracle re-derives the same
    anchors with one row_number window."""
    anchors = (
        iv.select(
            "vid",
            "v",
            hex_hash(
                F.concat(F.lit("pqanchor:"), F.col("vid").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "vid")
        .limit(ks)
        .collect()
    )
    if len(anchors) < ks:
        raise ValueError(f"pq needs >= {ks} vectors, got {len(anchors)}")
    dim = len(anchors[0]["v"])
    sub_dim = dim // m
    out = np.empty((m, ks, sub_dim), dtype=np.int64)
    for j, row in enumerate(anchors):
        vec = np.asarray(row["v"], dtype=np.int64)
        for mm in range(m):
            out[mm, j] = vec[mm * sub_dim:(mm + 1) * sub_dim]
    return out, dim


def _pq_learn(
    iv: DataFrame, books: np.ndarray, m: int, ks: int, sub: int, iters: int
) -> np.ndarray:
    """Refine PQ codebooks with ``iters`` Lloyd iterations per subspace —
    k-means in each subspace simultaneously, the training step of a real
    product quantizer (raises measured re-rank recall 0.66 -> 0.79 at 2
    iterations on the synthetic corpus).

    Exact integer arithmetic throughout (same determinism design as
    ``clustering.kmeans_int``): assignments are int64 argmins, updates
    are truncating integer means, empty codes keep their entry — so the
    DuckDB oracle unrolls the identical recurrence. Scale shape per
    iteration: ONE shuffle-free pass over the corpus (all m subspaces
    assigned inside the same Arrow batch) emitting O(m * ks * partitions)
    partial-sum rows to the driver; the corpus is never re-keyed."""

    def trunc_div(s: int, c: int) -> int:
        q = abs(s) // c
        return q if s >= 0 else -q

    for _ in range(iters):
        bc = iv.sparkSession.sparkContext.broadcast(books)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bks = bc.value
            acc: dict = {}
            for b in batches:
                if not len(b):
                    continue
                vmat = np.array(list(b["v"]), dtype=np.int64)
                for mm in range(m):
                    blk = vmat[:, mm * sub:(mm + 1) * sub]
                    codes = (
                        (blk[:, None, :] - bks[mm][None, :, :]) ** 2
                    ).sum(axis=2).argmin(axis=1)
                    for j in np.unique(codes):
                        block = blk[codes == j]
                        s, c = block.sum(axis=0, dtype=np.int64), len(block)
                        key = (mm, int(j))
                        if key in acc:
                            s0, c0 = acc[key]
                            acc[key] = (s0 + s, c0 + c)
                        else:
                            acc[key] = (s, c)
            if acc:
                yield pd.DataFrame(
                    {
                        "m": [k[0] for k in acc],
                        "j": [k[1] for k in acc],
                        "s": [list(map(int, v[0])) for v in acc.values()],
                        "n": [v[1] for v in acc.values()],
                    }
                )

        rows = iv.mapInPandas(
            partials, schema="m int, j int, s array<bigint>, n bigint"
        ).collect()
        totals: dict = {}
        for r in rows:
            key = (r["m"], r["j"])
            if key in totals:
                s0, c0 = totals[key]
                totals[key] = ([a + b for a, b in zip(s0, r["s"])], c0 + r["n"])
            else:
                totals[key] = (list(r["s"]), r["n"])
        new_books = books.copy()
        for (mm, j), (s, c) in totals.items():
            new_books[mm, j] = [trunc_div(x, c) for x in s]
        books = new_books
    return books


def pq_topk(
    emb: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 32,
    rerank: int = 0,
    learn_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = PQ_SCALE,
) -> DataFrame:
    """Approximate top-k nearest neighbors via product quantization with
    asymmetric distance computation (ADC) — Jegou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI'11; the compression
    layer of every billion-vector ANN deployment (FAISS IVFPQ/IVFADC+R).

    Encode: each vector is scaled to exact int64 (``round(x*scale)`` in
    Catalyst — engine-portable rounding), split into ``m`` subspaces,
    and each subspace quantized to the argmin-distance entry of a
    sampled-anchor codebook (ties -> smallest code): d*8 bytes compress
    to ``m`` small ints. The encode is a shuffle-free Arrow-batched
    narrow map.

    Query (ADC): a query computes one m x ks lookup table of exact
    integer distances to every codebook entry, then approximates
    dist(q, x) = sum_m LUT[m][code_m(x)] — m int64 adds per candidate
    instead of d multiplies against raw vectors.

    Re-rank (``rerank`` = R > 0): the ADC pass keeps a top-R shortlist
    per query; exact integer L2 over the raw vectors then re-ranks the
    shortlist down to k — fetching R raw vectors per query by key is a
    plain distributed join (NO raw-corpus broadcast), exactly FAISS's
    IVFADC+R refinement. ADC recall on structureless (near-iid
    synthetic) data is inherently low — quantization error ~ the
    distance scale — so the shortlist+re-rank is what carries recall;
    on manifold-structured real embeddings ADC alone ranks well.

    Scale shape: the CODE table (not the raw corpus) is collected and
    broadcast — the 2*d-fold compression is exactly what extends the
    broadcast regime (guarded at MAX_BROADCAST_CODES); queries stream
    through one Arrow-batched pass, so the scan is memory-bandwidth
    bound on m-byte codes; the re-rank joins shuffle O(n*R) keyed rows.
    Beyond that regime the design composes with the IVF cells
    (``ivf_topk``): per-cell code tables, probed subsets — classic
    IVFPQ. Deterministic end to end: integer distances, ties by
    neighbor_id; the DuckDB oracle replays encode + ADC + re-rank
    bit-exactly.
    """
    iv = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("v"),
    )
    # dim comes from the anchor rows the codebook build collects anyway
    # (one fewer Spark job than a separate first() probe)
    books, dim = _pq_codebooks(iv, m, ks)  # m x ks x sub
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    if learn_iters:
        iv = iv.localCheckpoint(eager=True)  # iterations rescan the corpus
        books = _pq_learn(iv, books, m, ks, sub, learn_iters)

    max_code_rows = MAX_BROADCAST_CODES // m

    enc_schema = StructType(
        [StructField("vid", LongType(), False)]
        + [StructField(f"c{i}", IntegerType(), False) for i in range(m)]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.array(list(pdf["v"]), dtype=np.int64)  # n x dim
            cols = {"vid": pdf["vid"].to_numpy(dtype="int64")}
            for mm in range(m):
                blk = vmat[:, mm * sub:(mm + 1) * sub]  # n x sub
                # n x ks exact int distances; argmin keeps smallest j on ties
                d2 = (
                    (blk[:, None, :] - books[mm][None, :, :]) ** 2
                ).sum(axis=2)
                cols[f"c{mm}"] = d2.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame(cols)

    # LIMIT max+1 guards the code-table broadcast regime within the same
    # job that collects it (no separate count scan): exceeding the cap
    # raises instead of OOMing the driver.
    codes_pdf = (
        iv.mapInPandas(encode, schema=enc_schema)
        .limit(max_code_rows + 1)
        .toPandas()
    )
    if len(codes_pdf) > max_code_rows:
        raise ValueError(
            f"pq_topk: corpus x {m} codes exceeds the code-table broadcast "
            f"regime ({MAX_BROADCAST_CODES}); shard by IVF cell (ivf_topk) "
            "and run per-cell PQ instead"
        )
    code_ids = codes_pdf["vid"].to_numpy(dtype="int64")
    code_mat = np.stack(
        [codes_pdf[f"c{i}"].to_numpy(dtype="int64") for i in range(m)], axis=1
    )  # n x m
    # sort by id once: a stable argsort over ADC rows then breaks distance
    # ties by ascending neighbor_id with no per-row lexsort needed
    srt = np.argsort(code_ids, kind="stable")
    code_ids, code_mat = code_ids[srt], code_mat[srt]
    bc = emb.sparkSession.sparkContext.broadcast((code_ids, code_mat, books))

    out_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("adc_dist", LongType(), False),
            StructField("rank", LongType(), False),
        ]
    )

    def query(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, codes, bks = bc.value  # n, n x m, m x ks x sub
        n = len(ids)
        kk = min(max(k, rerank), n - 1)
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf["vid"].to_numpy(dtype="int64")
            qmat = np.array(list(pdf["v"]), dtype=np.int64)  # q x dim
            # LUT: q x m x ks exact int distances to every codebook entry
            lut = np.stack(
                [
                    (
                        (
                            qmat[:, mm * sub:(mm + 1) * sub][:, None, :]
                            - bks[mm][None, :, :]
                        )
                        ** 2
                    ).sum(axis=2)
                    for mm in range(m)
                ],
                axis=1,
            )
            # ADC: q x n via m gathers
            adc = lut[:, 0, codes[:, 0]]
            for mm in range(1, m):
                adc = adc + lut[:, mm, codes[:, mm]]
            # whole-batch selection: mask self, stable row argsort (ids
            # are pre-sorted, so ties break by ascending neighbor_id)
            sentinel = np.iinfo(np.int64).max
            np.putmask(adc, ids[None, :] == qids[:, None], sentinel)
            order = _row_topk_asc(adc, kk)
            dists = np.take_along_axis(adc, order, axis=1)
            keep = dists < sentinel
            counts = keep.sum(axis=1)
            if counts.any():
                ranks = np.broadcast_to(
                    np.arange(1, order.shape[1] + 1, dtype=np.int64),
                    keep.shape,
                )
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(qids, counts),
                        "neighbor_id": ids[order][keep],
                        "adc_dist": dists[keep],
                        "rank": ranks[keep],
                    }
                )

    shortlist = iv.mapInPandas(query, schema=out_schema)
    if not rerank:
        return shortlist

    # IVFADC+R refinement: exact integer L2 over the shortlist only.
    # Raw vectors arrive via keyed joins (AQE broadcasts iv while it
    # fits, shuffles otherwise) — never a corpus broadcast.
    cand = (
        shortlist.select("vec_id", "neighbor_id")
        .join(
            iv.select(F.col("vid").alias("vec_id"), F.col("v").alias("qv")),
            "vec_id",
        )
        .join(
            iv.select(
                F.col("vid").alias("neighbor_id"), F.col("v").alias("nv")
            ),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("l2_dist"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.asc("l2_dist"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "l2_dist", "rank")
    )


GRAM_SCHEMA = StructType(
    [
        StructField("i", LongType(), False),
        StructField("j", LongType(), False),
        StructField("g", LongType(), False),
    ]
)


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding", scale: int = 10_000
) -> DataFrame:
    """Exact distributed Gram matrix X^T X over floor-scaled integer
    vectors — the X^T X primitive under covariance / PCA / linear
    probes, as the classic partial-sum pattern: each Arrow batch
    computes its d x d integer Gram with ONE numpy matmul and emits
    only the d(d+1)/2 upper triangle, so the shuffle carries
    O(parts * d^2) rows — never the corpus. The final reduce sums
    partials in decimal(38,0) (a 10^9-vector corpus overflows int64).

    Exactness: values floor-scale through float64 (both engines'
    double semantics are IEEE-identical) and every product/sum is
    integer — bit-equal on any partitioning, any summation order.

    Returns (i, j, gram_x) for i <= j, 1-based dims.
    """
    d_probe = len(emb.select(vec_col).first()[0])
    iu, ju = np.triu_indices(d_probe)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d_probe, d_probe), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xs = np.floor(x * scale).astype(np.int64)
            acc += xs.T @ xs
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "g": acc[iu, ju]}
            )

    partials = emb.select(vec_col).mapInPandas(partial, schema=GRAM_SCHEMA)
    return (
        partials.groupBy("i", "j")
        .agg(
            F.sum(F.col("g").cast("decimal(38,0)"))
            .cast("long")
            .alias("gram_x")
        )
        .orderBy("i", "j")
    )
