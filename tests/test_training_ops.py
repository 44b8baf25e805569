"""Tests for the training-data pipeline operators: text analysis, dedup,
similarity, multimodal plumbing, streaming jobs.

Correctness oracles here are local pandas/python recomputations; the
driver-facing DuckDB oracles live in pyjelly_spark/queries.py.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100).cache()
    df.count()
    return df


# --- text functions ---------------------------------------------------------


def test_token_counts_match_python(docs):
    from pyjelly_spark.functions.text import token_counts

    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    for row in docs.limit(20).collect():
        ws = len(re.sub(r"\s+", " ", row["text"]).strip().split(" "))
        bpe = len(re.findall(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]", row["text"]))
        assert got[row["doc_id"]]["n_ws_tokens"] == ws
        assert got[row["doc_id"]]["n_bpe_tokens"] == bpe


def test_quality_scores_bounded(docs):
    from pyjelly_spark.functions.text import quality_scores

    pdf = quality_scores(docs).toPandas()
    assert (pdf["punct_ratio"].between(0, 1)).all()
    assert (pdf["quality_score"].between(0, 1.01)).all()
    assert len(pdf) == docs.count()


def test_language_id_deterministic(docs):
    from pyjelly_spark.functions.text import language_id

    a = language_id(docs).orderBy("doc_id").collect()
    b = language_id(docs).orderBy("doc_id").collect()
    assert a == b
    assert all(r["predicted_lang"] in {"en", "de", "fr", "es", "zh"} for r in a)


def test_fingerprints_match_hashlib(docs):
    from pyjelly_spark.functions.text import fingerprints

    got = {r["doc_id"]: r for r in fingerprints(docs).collect()}
    for row in docs.limit(10).collect():
        norm = re.sub(r"\s+", " ", row["text"]).strip().lower()
        h = hashlib.sha256(norm.encode()).hexdigest()
        assert got[row["doc_id"]]["fingerprint"] == h
        assert got[row["doc_id"]]["fp_hash"] == int(h[:15], 16)


# --- dedup ------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Original docs + near-dup copies (one word changed) + exact copies."""
    base = docs.limit(30).select("doc_id", "text")
    near = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.substring("text", 5, 100000)).alias("text"),
    )
    exact = base.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    out = base.unionByName(near).unionByName(exact).cache()
    out.count()
    return out


def test_exact_duplicates(docs_with_dups):
    from pyjelly_spark.operators.dedup import exact_duplicates

    groups = exact_duplicates(docs_with_dups).collect()
    two = [g for g in groups if g["n_copies"] == 2]
    assert len(two) == 30  # each base doc + its exact copy
    assert all(g["canonical_doc_id"] < 100000 for g in two)


def test_jaccard_pairs_find_near_dups(docs_with_dups):
    from pyjelly_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_with_dups, threshold=0.5).collect()
    exact_pairs = {(p["a"], p["b"]) for p in pairs if p["jaccard"] == 1.0}
    # every (base, +200000) exact pair must appear with jaccard 1.0
    base_ids = {p[0] for p in exact_pairs if p[1] == p[0] + 200000}
    assert len(base_ids) == 30


def test_minhash_equals_exact_on_high_threshold(docs_with_dups):
    from pyjelly_spark.operators.dedup import minhash_pairs, ngram_jaccard_pairs

    exact = {
        (r["a"], r["b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs_with_dups, threshold=0.7).collect()
    }
    lsh = {
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_pairs(docs_with_dups, threshold=0.7).collect()
    }
    # precision 1.0 by construction; recall should be 1.0 at j>=0.7 with
    # 16 bands x 2 rows
    assert lsh == exact


def test_simhash_banding_equals_cross_join(spark, docs_with_dups):
    from pyjelly_spark.operators.dedup import simhash_pairs, simhash_signatures

    sig = simhash_signatures(docs_with_dups).cache()
    banded = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_pairs(docs_with_dups, max_distance=3).collect()
    }
    left = sig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    right = sig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    brute = {
        (r["a"], r["b"], r["hamming"])
        for r in left.crossJoin(right)
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert all(s["simhash"] >= 0 for s in sig.collect())


# --- similarity -------------------------------------------------------------


def test_cosine_topk_matches_numpy(emb):
    import numpy as np

    from pyjelly_spark.operators.similarity import cosine_topk

    got = cosine_topk(emb, k=3).collect()
    pdf = emb.toPandas()
    mat = np.array([np.array(v, dtype="float64") for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    by_vec = {}
    for r in got:
        by_vec.setdefault(r["vec_id"], []).append(r)
    for i, vid in enumerate(ids):
        order = sorted(
            [(float(sims[i, j]), int(ids[j])) for j in range(len(ids)) if j != i],
            key=lambda t: (-t[0], t[1]),
        )[:3]
        rows = sorted(by_vec[int(vid)], key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in rows] == [t[1] for t in order]
        for r, (score, _) in zip(rows, order):
            assert abs(r["score"] - math.floor(score * 10000) / 10000) < 1e-9


def test_ann_topk_recall(emb):
    from pyjelly_spark.operators.similarity import ann_topk, cosine_topk

    exact = {
        (r["vec_id"], r["neighbor_id"]) for r in cosine_topk(emb, k=3).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"]) for r in ann_topk(emb, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.6, f"ANN recall too low: {recall}"


# --- multimodal -------------------------------------------------------------


def test_multimodal_roundtrip(docs):
    from pyjelly_spark.operators.multimodal import (
        attach_media,
        decode_media,
        frame_sample,
        resize_plan,
    )

    media = attach_media(docs.limit(60)).cache()
    feats = decode_media(media, dim=8).collect()
    assert len(feats) == 60
    for r in feats[:5]:
        assert len(r["features"]) == 8
        assert all(-1.0 <= x <= 1.0 for x in r["features"])
    one = media.where(F.col("media_id") == feats[0]["media_id"]).first()
    assert (
        hashlib.sha256(bytes(one["payload"])).hexdigest() == feats[0]["payload_sha"]
    )
    plans = resize_plan(media).collect()
    for p in plans:
        assert max(p["target_width"], p["target_height"]) <= 256
    frames = frame_sample(media, every_ms=10_000).collect()
    assert all(f["ts_ms"] % 10_000 == 0 for f in frames)


def test_decode_media_real_codec_stubbed(docs):
    from pyjelly_spark.operators.multimodal import attach_media, decode_media

    with pytest.raises(NotImplementedError):
        decode_media(attach_media(docs.limit(1)), codec="real")


# --- streaming --------------------------------------------------------------


def test_streaming_windowed_counts_equals_batch(spark):
    from pyjelly_spark.streaming.jobs import run_windowed_counts_batchmode

    stream = run_windowed_counts_batchmode(spark, f"{SF_DIR}/events.parquet")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Late rows beyond the watermark are dropped in append mode.

    Two parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1): file 1 advances event time to 12:00 with a
    2h watermark -> the 06:00 window finalizes; file 2 replays an 06:30
    event, which must NOT resurrect or update that window.
    """
    import pandas as pd

    from pyjelly_spark.streaming.jobs import EVENTS_SCHEMA, windowed_counts

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()

    def write_batch(name, rows, mtime):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf, schema=EVENTS_SCHEMA)
        sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import glob
        import os
        import shutil

        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        dst = str(events_dir / f"{name}.parquet")
        shutil.copy(part, dst)
        # the file source admits files in mtime order — make it explicit
        os.utime(dst, (mtime, mtime))

    write_batch(
        "batch1",
        [
            (1, "2024-01-01 06:10:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 12:00:00", 1, "click", 1.0, "{}"),
        ],
        mtime=1_000_000,
    )
    # intermediate batch: watermark-passed windows evict at the END of the
    # first batch that runs with the advanced watermark (Spark's delayed
    # eviction), so the late arrival must come one batch later to hit the
    # finalized-window drop path
    write_batch(
        "batch2",
        [(4, "2024-01-01 12:10:00", 1, "view", 1.0, "{}")],
        mtime=2_000_000,
    )
    write_batch(
        "batch3",
        [(3, "2024-01-01 06:30:00", 2, "click", 1.0, "{}")],
        mtime=3_000_000,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(events_dir))
    )
    result = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        result.writeStream.format("memory")
        .queryName("late_data_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["window_start"]: r["n_events"]
        for r in spark.table("late_data_sink").collect()
    }
    # the 06:00 window finalized with exactly 1 event; the late 06:30
    # arrival (event time < 12:00 - 2h watermark) was dropped
    assert rows.get("2024-01-01 06:00:00") == 1
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1


def test_streaming_sessionize_stateful(spark, tmp_path):
    from pyjelly_spark.streaming.jobs import run_sessionized_batchmode

    out = run_sessionized_batchmode(
        spark, f"{SF_DIR}/events.parquet", checkpoint_dir=str(tmp_path / "ckpt")
    )
    rows = out.collect()
    assert rows, "expected closed sessions"
    assert all(r["n_events"] > 0 for r in rows)


def test_ivf_recall_vs_exact(spark):
    """IVF ANN recall@5 against the exact broadcast top-k."""
    from pyjelly_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r["vec_id"], r["neighbor_id"]) for r in cosine_topk(emb, k=5).collect()
    }
    approx = {
        (r["vec_id"], r["neighbor_id"]) for r in ivf_topk(emb, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random (sha-derived, oracle-checkable) codebook at 25% scan
    # fraction: measured 0.482 here / 0.492 at sf0.1
    assert recall >= 0.4, recall


# --- curation: PII scrub / repetition / decontamination ---------------------


def test_pii_scrub_counts_and_redaction(spark):
    from pyjelly_spark.functions.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "ping admin@corp.io or bob.smith+x@a-b.co from 10.1.2.3"),
            (2, "key deadbeefdeadbeefdeadbeefdeadbeef1234 rest"),
            (3, "no pii here, just 1.2 and short cafe1234 hex"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 1
    assert got[1]["redacted"] == "ping <EMAIL> or <EMAIL> from <IP>"
    assert got[2]["n_secret"] == 1
    assert got[2]["redacted"] == "key <SECRET> rest"
    # 1.2 is not an IPv4; 8-hex is below the 32-char secret floor
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_secret"] == 0
    assert got[3]["redacted"] == "no pii here, just 1.2 and short cafe1234 hex"


def test_repetition_scores_closed_form(spark):
    from pyjelly_spark.functions.text import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # one word repeated: top ratio 1, all bigrams dup
            (2, "w x y z"),  # all distinct: no repetition anywhere
            (3, "a b a b a"),  # bigrams: ab ba ab ba -> 2 distinct of 4
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert got[1]["distinct_word_ratio"] == 0.25
    assert got[1]["dup_bigram_ratio"] == pytest.approx(2 / 3, abs=1e-4)
    assert got[1]["top_term_ratio"] == 1.0
    assert got[2]["distinct_word_ratio"] == 1.0
    assert got[2]["dup_bigram_ratio"] == 0.0
    assert got[2]["top_term_ratio"] == 0.25
    assert got[3]["dup_bigram_ratio"] == 0.5
    # 3/5 in binary sits just under 0.6, so floor-scaling gives 0.5999
    assert got[3]["top_term_ratio"] == pytest.approx(0.6, abs=2e-4)


def _split_bucket(text: str) -> int:
    """Pure-python twin of hex_hash(normalized(text), mod=100)."""
    norm = re.sub(r"\s+", " ", text).strip().lower()
    return int(hashlib.sha256(norm.encode()).hexdigest()[:15], 16) % 100


def test_decontaminate_flags_planted_overlap(spark):
    from pyjelly_spark.functions.text import decontaminate

    # craft texts whose content-hash provably lands them train vs val,
    # sharing one exact 5-gram ("alpha beta gamma delta epsilon")
    gram = "alpha beta gamma delta epsilon"
    train_text = next(
        f"{gram} filler{i}" for i in range(1000)
        if _split_bucket(f"{gram} filler{i}") < 90
    )
    val_text = next(
        f"lead{i} {gram}" for i in range(1000)
        if _split_bucket(f"lead{i} {gram}") >= 90
    )
    clean_text = next(
        f"nothing shared here at all pad{i}" for i in range(1000)
        if _split_bucket(f"nothing shared here at all pad{i}") < 90
    )
    df = spark.createDataFrame(
        [(1, train_text), (2, val_text), (3, clean_text)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in decontaminate(df, val_pct=10, n=5).collect()}
    assert 1 in out and out[1]["n_shared_grams"] == 1 and out[1]["n_val_docs"] == 1
    assert 3 not in out  # clean train doc untouched
    assert 2 not in out  # val docs are never flagged


def test_decontaminate_hot_gram_cap(spark):
    from pyjelly_spark.functions.text import decontaminate

    # the same 5-gram in every doc; with the cap below the doc count the
    # gram is dropped and nothing is flagged
    rows = [(i, f"u{i} common five gram here shared") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flagged = decontaminate(df, val_pct=50, n=5, max_gram_doc_freq=5)
    assert flagged.count() == 0


def test_dedup_clusters_transitive(spark):
    """A~B and B~C above threshold but A!~C directly: one cluster of 3."""
    from pyjelly_spark.queries import q_dedup_clusters

    # 3-gram shingle Jaccards: J(A,B)=4/6, J(B,C)=3/7, J(A,C)=1/7
    rows = [
        (1, "p q r s t u", "en", "s", 11),
        (2, "p q r s t u v w", "en", "s", 15),
        (3, "s t u v w x", "en", "s", 11),
        (4, "aa bb cc dd ee", "en", "s", 14),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in q_dedup_clusters(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r["rep"] == 1 and r["cluster_size"] == 3 for r in out.values())


def test_decontaminate_differential_random_corpus(spark):
    """Seeded random corpus vs a pure-python recomputation of the whole
    decontamination contract (split, n-grams, df cap, counts)."""
    import random

    from pyjelly_spark.functions.text import decontaminate

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20))))
        for i in range(40)
    ]
    n, cap, val_pct = 3, 5, 10

    grams = {}  # doc_id -> set of grams
    is_train = {}
    for doc_id, text in rows:
        ws = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        grams[doc_id] = {
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        }
        is_train[doc_id] = _split_bucket(text) < 100 - val_pct
    df_count = {}
    for g in (g for gs in grams.values() for g in gs):
        df_count[g] = df_count.get(g, 0) + 1
    hot = {g for g, c in df_count.items() if c > cap}
    expected = {}
    for d, gs in grams.items():
        if not is_train[d]:
            continue
        shared = set()
        val_docs = set()
        for v, vgs in grams.items():
            if is_train[v]:
                continue
            common = (gs & vgs) - hot
            if common:
                shared |= common
                val_docs.add(v)
        if shared:
            expected[d] = (len(shared), len(val_docs))

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shared_grams"], r["n_val_docs"])
        for r in decontaminate(
            df, val_pct=val_pct, n=n, max_gram_doc_freq=cap
        ).collect()
    }
    assert got == expected and expected  # non-vacuous


def test_repetition_scores_differential(spark):
    """Random docs vs pure-python ratio recomputation (floor-scaled)."""
    import math
    import random

    from pyjelly_spark.functions.text import repetition_scores

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        for i in range(25)
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_scores(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    r4 = lambda x: math.floor(x * 10000) / 10000  # noqa: E731
    for doc_id, text in rows:
        ws = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        bigrams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        top = max(ws.count(t) for t in set(ws))
        row = got[doc_id]
        assert row["n_words"] == len(ws)
        assert row["distinct_word_ratio"] == r4(len(set(ws)) / len(ws))
        assert row["dup_bigram_ratio"] == r4(
            (len(bigrams) - len(set(bigrams))) / max(len(bigrams), 1)
        )
        assert row["top_term_ratio"] == r4(top / len(ws))


def test_gopher_filter_verdicts(spark):
    from pyjelly_spark.functions.text import gopher_filter

    good = " ".join(f"word{i}" for i in range(50)) + " the a is in"
    short = "the a short one"                      # fails word count
    repetitive = "the a " + "spam " * 60           # top-term dominance fails
    no_stop = " ".join(f"w{i}" for i in range(40)) # no stopwords
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, repetitive), (3, no_stop)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict() for r in gopher_filter(df).collect()}
    assert rows[0]["keep"] == 1
    assert rows[1]["pass_word_count"] == 0 and rows[1]["keep"] == 0
    assert rows[2]["pass_top_term"] == 0 and rows[2]["keep"] == 0
    assert rows[3]["pass_stopwords"] == 0 and rows[3]["keep"] == 0
    assert rows[0]["n_words"] == 54 and rows[0]["distinct_ratio_x10k"] == 10000
    # every flag is 0/1 and keep is their product
    for r in rows.values():
        flags = [r["pass_word_count"], r["pass_mean_word_len"],
                 r["pass_distinct_ratio"], r["pass_top_term"],
                 r["pass_stopwords"]]
        assert set(flags) <= {0, 1}
        prod = 1
        for x in flags:
            prod *= x
        assert r["keep"] == prod


def test_dup_span_fraction_matches_python(spark):
    from pyjelly_spark.functions.text import dup_span_fraction

    rows = [
        ("d1", "a b c d e f g"),          # shares the 'a b c d e' gram
        ("d2", "a b c d e x y"),          # with d1
        ("d3", "p q r s t u"),            # unique grams only
        ("d4", "a b c"),                  # < 5 words: no grams, absent
    ]
    df = spark.createDataFrame(rows, "doc_id: string, text: string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_pct_x10000"])
        for r in dup_span_fraction(df, n=5).collect()
    }
    # brute force: distinct 5-grams per doc, df >= 2 counts as dup
    grams = {}
    for d, t in rows:
        ws = t.split()
        if len(ws) >= 5:
            grams[d] = {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}
    from collections import Counter

    dfreq = Counter(g for gs in grams.values() for g in gs)
    want = {}
    for d, gs in grams.items():
        dup = sum(1 for g in gs if dfreq[g] >= 2)
        want[d] = (len(gs), dup, dup * 10000 // len(gs))
    assert got == want
    assert "d4" not in got


def test_stratified_sample_deterministic_and_stratified(spark):
    from pyjelly_spark.functions.text import stratified_sample

    rows = [
        (f"doc{i}", f"word{i} alpha beta gamma {i}", ["en", "de", "fr"][i % 3])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id: string, text: string, lang: string")
    out = stratified_sample(df, {"en": 100, "de": 0}, default_pct=50)
    rates = {
        r["lang"]: r
        for r in out.groupBy("lang")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert rates["en"]["kept"] == rates["en"]["n"]       # 100% stratum
    assert rates["de"]["kept"] == 0                      # 0% stratum
    assert 0 < rates["fr"]["kept"] < rates["fr"]["n"]    # default ~50%
    # membership is a pure function of content: re-partitioning cannot
    # change which docs are kept
    kept1 = {r["doc_id"] for r in out.where("keep").collect()}
    kept2 = {
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(16), {"en": 100, "de": 0}, default_pct=50
        )
        .where("keep")
        .collect()
    }
    assert kept1 == kept2


def test_stream_dedup_repairs_redelivery(spark):
    """The injected redelivery doubles event_id % 3 == 0 events; the
    watermarked dropDuplicates must collapse them back to the batch
    distinct counts (and without dedup the counts must NOT match —
    proving the operator is load-bearing)."""
    from pyjelly_spark.streaming.jobs import (
        read_event_stream,
        run_stream_dedup_batchmode,
    )

    path = f"{SF_DIR}/events.parquet"
    got = {
        r["event_type"]: r["n_events"]
        for r in run_stream_dedup_batchmode(spark, path).collect()
    }
    batch = spark.read.parquet(path)
    want = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    assert got == want
    # without dedup, redelivered events inflate the counts
    ev = read_event_stream(spark, path)
    redelivered = ev.where(F.col("event_id") % 3 == 0)
    q = (
        ev.unionByName(redelivered)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .writeStream.format("memory")
        .queryName("stream_dedup_raw_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    raw = {
        r["event_type"]: r["n_events"]
        for r in spark.table("stream_dedup_raw_sink").collect()
    }
    assert sum(raw.values()) > sum(want.values())


def test_incremental_dedup_verdicts(spark):
    from pyjelly_spark.operators.dedup import incremental_dedup

    existing = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id: long, text: string",
    )
    incoming = spark.createDataFrame(
        [
            (10, "  ALPHA   beta "),  # normalizes to an existing fp
            (11, "epsilon zeta"),     # brand new
            (12, "epsilon zeta"),     # dup of 11 within the batch
            (13, "eta theta"),        # brand new
        ],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: (r["verdict"], r["canonical_doc_id"])
        for r in incremental_dedup(existing, incoming).collect()
    }
    assert got == {
        10: ("dup_existing", 1),  # canonical = min existing doc_id
        11: ("new", 11),
        12: ("dup_batch", 11),
        13: ("new", 13),
    }


# --- sequence packing / chunking / bm25 -------------------------------------


def test_pack_sequences_closed_form(spark):
    """Pack a tiny hand-built corpus and verify against a sequential
    reference implementation of concat-and-chunk packing."""
    from pyjelly_spark.functions import text as T

    rows = [(i, f"tok " * (20 + 7 * i)) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in T.pack_sequences(df, seq_len=64, n_shards=2).collect()
    }
    assert len(out) == 12

    # sequential reference: shard by the same hash, order by (h, doc_id)
    import hashlib

    def hval(text):
        norm = re.sub(r"\s+", " ", text).strip().lower() + ":pack"
        return int(hashlib.sha256(norm.encode()).hexdigest()[:15], 16)

    per_shard: dict[int, list] = {0: [], 1: []}
    for i, text in rows:
        h = hval(text)
        per_shard[h % 2].append((h, i, 20 + 7 * i))
    for shard, members in per_shard.items():
        cum = 0
        for pos, (h, i, n_tok) in enumerate(sorted(members), start=1):
            r = out[i]
            assert r["shard"] == shard and r["pos"] == pos
            assert r["n_tokens"] == n_tok
            assert r["seq_first"] == cum // 64
            assert r["seq_last"] == (cum + n_tok - 1) // 64
            assert r["seq_offset"] == cum % 64
            cum += n_tok


def test_pack_sequences_spans_and_offsets_are_consistent(docs):
    """Invariants on real data: positions are dense per shard, offsets
    stay below seq_len, and a document spans exactly the sequences its
    token count dictates."""
    from pyjelly_spark.functions import text as T

    out = T.pack_sequences(docs, seq_len=512, n_shards=8).toPandas()
    assert (out.seq_offset < 512).all() and (out.seq_offset >= 0).all()
    assert (out.seq_last >= out.seq_first).all()
    # a doc occupying [offset, offset + n) spans ceil((offset+n)/512)-first
    expect_last = out.seq_first + (out.seq_offset + out.n_tokens - 1) // 512
    assert (out.seq_last == expect_last).all()
    for _, grp in out.groupby("shard"):
        pos = sorted(grp.pos)
        assert pos == list(range(1, len(pos) + 1))


def test_chunk_documents_boundaries(spark):
    from pyjelly_spark.functions import text as T

    rows = [
        (0, "a" * 50),    # shorter than size -> 1 chunk
        (1, "b" * 200),   # exactly size -> 1 chunk
        (2, "c" * 201),   # one char past -> 2 chunks
        (3, "d" * 520),   # 1 + ceil(320/160) = 3 chunks
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = T.chunk_documents(df, size=200, overlap=40).toPandas()
    n_chunks = out.groupby("doc_id").chunk_id.count().to_dict()
    assert n_chunks == {0: 1, 1: 1, 2: 2, 3: 3}
    d3 = out[out.doc_id == 3].sort_values("chunk_id")
    assert list(d3.chunk_start) == [0, 160, 320]
    assert list(d3.chunk_len) == [200, 200, 200]
    d2 = out[out.doc_id == 2].sort_values("chunk_id")
    assert list(d2.chunk_len) == [200, 41]  # tail chunk keeps the overlap
    import hashlib

    assert (
        d2.chunk_sha.iloc[1]
        == hashlib.sha256(b"c" * 41).hexdigest()
    )
    with pytest.raises(ValueError):
        T.chunk_documents(df, size=100, overlap=100)


def test_bm25_scores_integer_exact(spark):
    from pyjelly_spark.functions import text as T

    rows = [
        (0, "spark spark join"),
        (1, "join window"),
        (2, "nothing relevant here"),
        (3, "spark"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r for r in T.bm25_scores(df, ["spark", "join"]).collect()
    }
    assert set(out) == {0, 1, 3}  # doc 2 has no hits
    n = 4
    idf_spark = (n * 1000) // (2 + 1)  # df(spark)=2
    idf_join = (n * 1000) // (2 + 1)   # df(join)=2
    assert out[0]["score"] == 2 * idf_spark + 1 * idf_join
    assert out[0]["n_hits"] == 2
    assert out[1]["score"] == idf_join  # window not in query set
    assert out[3]["score"] == idf_spark
    # rarer terms never score below an equally-frequent common term
    assert out[0]["score"] > out[3]["score"]


def test_stream_stream_join_horizon_and_pairs(spark, tmp_path):
    """Stream-stream attribution join on a hand-built corpus: pairs
    inside the 60-min horizon appear exactly once, a purchase 61 min
    after the view is excluded, a purchase before the view is excluded,
    and cross-user pairs never match."""
    import pandas as pd

    from pyjelly_spark.streaming.jobs import EVENTS_SCHEMA, run_stream_join_batchmode

    events_dir = tmp_path / "ev"
    events_dir.mkdir()
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 10:30:00", 1, "purchase", 9.0, "{}"),   # in horizon
        (3, "2024-01-01 11:00:00", 1, "purchase", 9.0, "{}"),   # exactly 60m: in
        (4, "2024-01-01 11:01:00", 1, "purchase", 9.0, "{}"),   # 61m: out
        (5, "2024-01-01 09:59:00", 1, "purchase", 9.0, "{}"),   # before view: out
        (6, "2024-01-01 10:10:00", 2, "purchase", 9.0, "{}"),   # other user: out
        (7, "2024-01-01 23:00:00", 3, "view", 0.0, "{}"),       # no purchase
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf, schema=EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(events_dir))

    out = run_stream_join_batchmode(spark, str(events_dir)).collect()
    pairs = {(r["view_id"], r["purchase_id"]): r["secs_to_purchase"] for r in out}
    assert pairs == {(1, 2): 1800, (1, 3): 3600}


def test_pq_topk_recall_and_exactness(spark):
    """PQ/ADC with re-rank: ranks dense, exact int64 distances sorted,
    recall@5 vs exact integer L2 clears the IVFADC+R floor, and planted
    near-duplicate pairs surface in the top-5."""
    import numpy as np

    from pyjelly_spark.operators.similarity import (
        _pq_codebooks,
        cosine_dup_pairs,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = pq_topk(emb, k=5, m=8, ks=32, rerank=50, learn_iters=2).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["vec_id"], []).append(r)
    for q, nbrs in by_q.items():
        nbrs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in nbrs] == [1, 2, 3, 4, 5]
        dists = [r["l2_dist"] for r in nbrs]
        assert dists == sorted(dists)
        assert all(r["neighbor_id"] != q for r in nbrs)

    # exact int64 L2 top-5 (no quantization) as the recall reference
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy(dtype="int64")
    mat = np.array(
        [np.asarray(v, dtype="float64") for v in pdf["embedding"]]
    )
    # same Catalyst-style rounding as the operator (half away from zero)
    imat = np.sign(mat * 1e6) * np.floor(np.abs(mat * 1e6) + 0.5)
    imat = imat.astype(np.int64)
    exact = set()
    for r in range(len(ids)):
        d = ((imat - imat[r]) ** 2).sum(axis=1)
        d[r] = np.iinfo(np.int64).max
        order = np.lexsort((ids, d))[:5]
        exact |= {(ids[r], ids[j]) for j in order}
    approx = {(r["vec_id"], r["neighbor_id"]) for r in rows}
    recall = len(exact & approx) / len(exact)
    # near-iid synthetic corpus at a 10% ADC scan fraction: measured
    # 0.79 with 2 Lloyd iterations (0.66 untrained; ADC alone ranks
    # noise poorly — the re-rank carries recall)
    assert recall >= 0.7, recall

    # the planted near-duplicate pairs are what dedup actually needs
    dups = cosine_dup_pairs(emb).collect()
    pairs = {(r[0], r[1]) for r in dups} | {(r[1], r[0]) for r in dups}
    found = len(pairs & approx) / len(pairs)
    assert found >= 0.7, found  # measured 105/118 = 0.89

    # codebooks are corpus subvectors (anchors), not noise
    from pyspark.sql import functions as F

    iv = emb.select(
        F.col("vec_id").alias("vid"),
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * F.lit(10**6)).cast("long"),
        ).alias("v"),
    )
    books, dim = _pq_codebooks(iv, 8, 32)
    assert dim == 64
    assert books.shape == (8, 32, 8)
    flat = books.transpose(1, 0, 2).reshape(32, 64)
    assert all((imat == row).all(axis=1).any() for row in flat)


def test_remove_dup_spans_closed_form(spark):
    """Span removal on a hand-built corpus: the shared 5-word span
    survives only in the canonical (min doc_id) document; unique text
    is untouched; short docs pass through."""
    import hashlib

    from pyjelly_spark.functions.text import remove_dup_spans

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"{shared} unique one tail words here"),
        (2, f"prefix bits {shared} other trailing text"),
        (3, "totally original content with no overlap at all"),
        (4, "tiny doc"),  # < 5 words: no grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_dup_spans(df, n=5).collect()}

    def sha(s):
        return hashlib.sha256(s.encode()).hexdigest()

    # doc 1 is canonical for the shared grams -> keeps everything
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_sha"] == sha(rows[0][1])
    # doc 2 loses exactly the 5 shared words
    assert out[2]["n_removed"] == 5
    assert out[2]["cleaned_sha"] == sha("prefix bits other trailing text")
    # untouched docs
    assert out[3]["n_removed"] == 0 and out[4]["n_removed"] == 0
    assert out[4]["cleaned_sha"] == sha("tiny doc")
    assert out[2]["n_words"] == 10  # original count, before removal


# --- length histogram / quantiles / inverted index --------------------------


def test_length_histogram_counts_match_python(docs):
    from pyjelly_spark.functions.text import length_histogram

    got = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in length_histogram(docs, bucket_width=16).collect()
    }
    want: dict = {}
    for row in docs.collect():
        n = len(re.sub(r"\s+", " ", row["text"]).strip().split(" "))
        key = (row["lang"], n // 16)
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_length_quantiles_from_histogram(docs):
    from pyjelly_spark.functions.text import length_quantiles

    rows = {r["lang"]: r for r in length_quantiles(docs).collect()}
    lengths: dict = {}
    for row in docs.collect():
        n = len(re.sub(r"\s+", " ", row["text"]).strip().split(" "))
        lengths.setdefault(row["lang"], []).append(n)
    for lang, ns in lengths.items():
        ns.sort()
        got = rows[lang]
        assert got["n_docs"] == len(ns)
        for q in (50, 90, 99):
            # smallest bucket lower-bound whose cumulative count reaches q%
            import math as _m

            k = _m.ceil(q * len(ns) / 100)
            exact = ns[k - 1]
            lo = got[f"p{q}_lo"]
            assert lo <= exact < lo + 16  # same bucket as the exact quantile


def test_inverted_index_caps_and_df(docs):
    from pyjelly_spark.functions.text import inverted_index

    out = inverted_index(docs, max_postings=4, min_df=2).collect()
    assert out, "expected some repeated terms"
    # python recomputation of df + first-4 postings
    post: dict = {}
    for row in docs.collect():
        terms = set(
            t
            for t in re.sub(r"\s+", " ", row["text"]).strip().lower().split(" ")
            if t
        )
        for t in terms:
            post.setdefault(t, []).append(row["doc_id"])
    for r in out:
        ids = sorted(post[r["term"]])
        assert r["doc_freq"] == len(ids)
        assert r["postings"] == ",".join(str(i) for i in ids[:4])
        assert len(r["postings"].split(",")) <= 4


def test_stream_anomaly_matches_batch_rule(spark):
    """Drained stateful anomaly stream == the batch window query (the
    driver gate runs the same comparison against SQL_EVENTS_ANOMALY)."""
    import duckdb

    from pyjelly_spark.queries import SQL_EVENTS_ANOMALY
    from pyjelly_spark.streaming.jobs import run_stream_anomaly_batchmode

    got = {
        (r["user_id"], r["event_id"], r["cents"], r["s8"], r["q8"])
        for r in run_stream_anomaly_batchmode(
            spark, f"{SF_DIR}/events.parquet"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = {
        tuple(int(v) for v in row)
        for row in con.execute(SQL_EVENTS_ANOMALY).fetchall()
    }
    assert got == want
    assert want, "expected at least one anomaly in the test data"


def test_rolling_anomaly_state_carries_across_batches():
    """Splitting a user's (time-ordered) events across micro-batches
    must give the same flags as one batch: the last-8 ring carries."""
    import numpy as np
    import pandas as pd

    from pyjelly_spark.streaming.jobs import _rolling_anomaly

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    rng = np.random.RandomState(7)
    n = 60
    vals = rng.uniform(0, 10, n)
    vals[25] = 500.0  # an obvious spike
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.full(n, 1, dtype="int64"),
            "value": vals,
        }
    )

    def run(batches):
        st = FakeState()
        out = []
        for b in batches:
            out.extend(_rolling_anomaly((1,), iter([b]), st))
        return pd.concat(out) if out else pd.DataFrame()

    whole = run([pdf])
    split = run([pdf.iloc[:20], pdf.iloc[20:41], pdf.iloc[41:]])
    assert len(whole)
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), split.reset_index(drop=True)
    )


def test_cdc_state_carries_across_batches():
    """The streaming MERGE's final state per key must not depend on the
    file->micro-batch split: the carried (ts, event_id) winner makes
    out-of-order batch delivery converge to the batch answer."""
    import numpy as np
    import pandas as pd

    from pyjelly_spark.streaming.jobs import _cdc_state

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    n = 30
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.full(n, 1, dtype="int64"),
            "event_type": ["click"] * (n - 1) + ["view"],
            "value": np.linspace(1.0, 4.0, n),
        }
    )

    def final(batches):
        st = FakeState()
        out = []
        for b in batches:
            out.extend(_cdc_state((1,), iter([b]), st))
        allout = pd.concat(out)
        return tuple(allout.sort_values("ver").iloc[-1][["op", "state", "val_cents"]])

    whole = final([pdf])
    split = final([pdf.iloc[:10], pdf.iloc[10:25], pdf.iloc[25:]])
    # out-of-order delivery: the later batch arrives first
    ooo = final([pdf.iloc[15:], pdf.iloc[:15]])
    assert whole == split == ooo == ("U", "view", 400)


def test_match_sequence_greedy_and_window(spark):
    import datetime as dt

    from pyjelly_spark.operators.cep import match_sequence

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, sec):
        return (uid, typ, t0 + dt.timedelta(seconds=sec))

    rows = [
        # u1: full chain inside the window
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 15),
        # u2: click arrives too late after the first view -> no match,
        # even though a later view (at 100) would have qualified:
        # greedy anchors at the EARLIEST view (documented semantics)
        ev(2, "view", 0), ev(2, "view", 100), ev(2, "click", 105),
        ev(2, "purchase", 110),
        # u3: step order violated (purchase before click)
        ev(3, "view", 0), ev(3, "purchase", 5), ev(3, "click", 10),
        # u4: boundary - click exactly at the window edge qualifies (<=)
        ev(4, "view", 0), ev(4, "click", 30), ev(4, "purchase", 60),
    ]
    df = spark.createDataFrame(rows, "user_id: long, event_type: string, ts: timestamp_ntz")
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in match_sequence(df, ["view", "click", "purchase"], within_s=30).collect()
    }
    assert set(got) == {1, 4}
    assert got[1] == (t0, t0 + dt.timedelta(seconds=10), t0 + dt.timedelta(seconds=15))
    assert got[4][1] == t0 + dt.timedelta(seconds=30)  # inclusive edge


def test_ewma_int_closed_form(spark):
    import datetime as dt

    from pyjelly_spark.operators.timeseries import ewma_int

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: m1=400, m2=(800+3*400)//4=500, m3=(4+3*500)//4=376
        (1, 1, t0, 4.00),
        (1, 2, t0 + dt.timedelta(seconds=1), 8.00),
        (1, 3, t0 + dt.timedelta(seconds=2), 0.04),
        # u2: same ts -> event_id tiebreak decides the order
        (2, 5, t0, 1.00),
        (2, 4, t0, 3.00),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: timestamp_ntz, value: double"
    )
    got = {r["event_id"]: r["ewma"] for r in ewma_int(df).collect()}
    assert got == {1: 400, 2: 500, 3: 376, 4: 300, 5: (100 + 3 * 300) // 4}


def test_ewma_int_rejects_bad_alpha(spark):
    import pytest as _pytest

    from pyjelly_spark.operators.timeseries import ewma_int

    df = spark.createDataFrame(
        [], "user_id: long, event_id: long, ts: timestamp_ntz, value: double"
    )
    with _pytest.raises(ValueError):
        ewma_int(df, alpha_num=4, alpha_den=4)


def _sha60(x) -> int:
    import hashlib

    return int(hashlib.sha256(str(x).encode()).hexdigest()[:15], 16)


def test_kmv_matches_python_kth(spark):
    from pyjelly_spark.operators.sketches import kmv_distinct

    rows = [("a", i) for i in range(200)] + [("b", i) for i in range(40)]
    rows += [("a", 7)] * 5  # duplicates must not shift the kth hash
    df = spark.createDataFrame(rows, "grp: string, key: long")
    got = {r["grp"]: r for r in kmv_distinct(df, "grp", "key", k=16).collect()}
    for grp, n in [("a", 200), ("b", 40)]:
        kth = sorted(_sha60(i) for i in range(n))[15]
        assert got[grp]["kth_hash"] == kth
        assert got[grp]["est_distinct"] == (15 * (1 << 60)) // kth
        assert got[grp]["exact_n"] == n


def test_kmv_small_group_omitted_and_starved_fallback(spark):
    from pyjelly_spark.operators.sketches import kmv_distinct

    rows = [("big", i) for i in range(100)] + [("tiny", i) for i in range(5)]
    df = spark.createDataFrame(rows, "grp: string, key: long")
    # prune_margin=0 with prune_min=0 -> threshold 0 starves every
    # group; the fallback must still produce the exact kth for "big",
    # and "tiny" (< k distinct) is omitted by definition.
    out = {
        r["grp"]: r["kth_hash"]
        for r in kmv_distinct(
            df, "grp", "key", k=16, prune_margin=0, prune_min=0
        ).collect()
    }
    assert set(out) == {"big"}
    assert out["big"] == sorted(_sha60(i) for i in range(100))[15]


def test_cms_matches_python_sketch(spark):
    from pyjelly_spark.operators.sketches import cms_estimates

    rows = [(k,) for k in range(30) for _ in range(k % 5 + 1)]
    df = spark.createDataFrame(rows, "key_in: long")
    got = {r["key"]: r for r in cms_estimates(df, "key_in").collect()}

    # python replica of the sketch
    from collections import Counter
    exact = Counter(str(k) for k, in rows)
    cms = Counter()
    for k, n in exact.items():
        for j in range(4):
            cms[(j, _sha60(f"{j}:{k}") % 64)] += n
    for k, n in exact.items():
        est = min(cms[(j, _sha60(f"{j}:{k}") % 64)] for j in range(4))
        assert got[k]["est_n"] == est
        assert got[k]["exact_n"] == n
        assert got[k]["est_n"] >= n  # CMS never undercounts


def test_bloom_semi_join_passes_members_and_flags_fps(spark):
    from pyjelly_spark.operators.sketches import bloom_semi_join

    build = spark.createDataFrame([(k,) for k in range(50)], "uid: long")
    probe = spark.createDataFrame([(k,) for k in range(40, 400)], "uid: long")
    got = {r["key"]: r["is_member"] for r in bloom_semi_join(build, probe, "uid").collect()}

    occ = {_sha60(f"{j}|{k}") % 1024 for k in range(50) for j in range(3)}
    expect = {
        str(k): k < 50
        for k in range(40, 400)
        if all(_sha60(f"{j}|{k}") % 1024 in occ for j in range(3))
    }
    assert got == expect
    # every true member in the probe range passes (no false negatives)
    assert all(str(k) in got for k in range(40, 50))


def test_ppjoin_matches_bruteforce(spark):
    from itertools import combinations

    from pyjelly_spark.operators.dedup import ppjoin_pairs

    docs = [
        ("d1", "alpha beta gamma delta epsilon"),
        ("d2", "alpha beta gamma delta zeta"),       # J(d1,d2)=4/6=2/3
        ("d3", "alpha beta gamma delta epsilon"),    # J(d1,d3)=1
        ("d4", "omega psi chi phi upsilon"),
        ("d5", "omega psi chi phi upsilon tau"),     # J(d4,d5)=5/6
        ("d6", "unrelated words entirely here now"),
        ("d7", "alpha beta"),                        # small set, J low vs d1
    ]
    df = spark.createDataFrame(docs, "doc_id: string, text: string")
    got = {
        (r["a"], r["b"]): (r["inter"], r["sa"], r["sb"])
        for r in ppjoin_pairs(df, 4, 5).collect()
    }
    # brute-force expectation at tau = 4/5
    sets = {d: set(t.split()) for d, t in docs}
    expect = {}
    for x, y in combinations(sorted(sets), 2):
        i = len(sets[x] & sets[y])
        if 9 * i >= 4 * (len(sets[x]) + len(sets[y])):
            expect[(x, y)] = (i, len(sets[x]), len(sets[y]))
    assert got == expect
    assert ("d4", "d5") in got and ("d1", "d3") in got  # non-trivial
    assert ("d1", "d2") not in got  # 2/3 < 4/5


def test_kmv_stream_state_merge_invariance():
    """KMV's mergeable-synopsis property: the final streamed sketch must
    be identical for any micro-batch split (including out-of-order)."""
    import numpy as np
    import pandas as pd

    from pyjelly_spark.streaming.jobs import KMV_K, _kmv_update

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    pdf = pd.DataFrame({"user_id": np.arange(40, dtype="int64")})

    def final(batches):
        st = FakeState()
        out = []
        for b in batches:
            out.extend(_kmv_update(("click",), iter([b]), st))
        allout = pd.concat(out)
        last = allout.sort_values("ver").iloc[-1]
        return (last["n_min"], last["kth_hash"])

    whole = final([pdf])
    split = final([pdf.iloc[:7], pdf.iloc[7:30], pdf.iloc[30:]])
    ooo = final([pdf.iloc[20:], pdf.iloc[:20]])
    dup = final([pdf, pdf.iloc[:15]])  # re-delivery must be a no-op
    expect_kth = sorted(_sha60(i) for i in range(40))[KMV_K - 1]
    assert whole == split == ooo == dup == (KMV_K, expect_kth)


def test_concurrency_sweep_line_closed_form(spark):
    """Tiny closed-form check of the two-level prefix-sum sweep: three
    users, known overlaps, boundary semantics [first, last+1)."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_concurrency

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, sec):
        return (eid, t0 + dt.timedelta(seconds=sec), uid, "click", 1.0, "{}")

    rows = [
        # u1: one session covering [0us, 60s+1us)
        ev(1, 1, 0), ev(2, 1, 60),
        # u2: overlaps u1: [30s, 30s+1us)
        ev(3, 2, 30),
        # u3: far later (new sweep region), own session [7200s, 7200s+1us)
        ev(4, 3, 7200),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["t_us"]: (r["net"], r["concurrent"])
        for r in q_events_concurrency(spark, d).collect()
    }
    us = 1_000_000
    assert got[0] == (1, 1)                      # u1 opens
    assert got[30 * us] == (1, 2)                # u2 opens -> 2 concurrent
    assert got[30 * us + 1] == (-1, 1)           # u2's point session closes
    assert got[60 * us + 1] == (-1, 0)           # u1 closes
    assert got[7200 * us] == (1, 1)              # u3 in a later bucket
    assert got[7200 * us + 1] == (-1, 0)


def test_kmv_set_algebra_matches_python(spark):
    from pyjelly_spark.operators.sketches import kmv_set_estimates

    k = 12
    A = list(range(0, 60))
    B = list(range(40, 120))
    da = spark.createDataFrame([(x,) for x in A], "uid: long")
    db = spark.createDataFrame([(x,) for x in B], "uid: long")
    row = kmv_set_estimates(da, db, "uid", k=k).collect()[0]

    ha = sorted(_sha60(x) for x in A)
    hb = sorted(_sha60(x) for x in B)
    merged = sorted(set(ha[:k]) | set(hb[:k]))[:k]
    union_kth = merged[-1]
    est_union = ((k - 1) * (1 << 60)) // union_kth
    both = {_sha60(x) for x in set(A) & set(B)}
    matches = sum(1 for h in merged if h in both)
    assert row["union_kth"] == union_kth
    assert row["est_union"] == est_union
    assert row["matches"] == matches
    assert row["est_inter"] == (matches * est_union) // k
    assert row["exact_union"] == len(set(A) | set(B))
    assert row["exact_inter"] == len(set(A) & set(B))
    # merged sketch of the union == sketch built on the union directly
    hu = sorted(_sha60(x) for x in set(A) | set(B))
    assert merged == hu[:k]


def test_zorder_interleave_locality(spark):
    """Morton codes: bit-interleave correctness + the locality property
    that motivates the layout (a small (x, y) box maps to a bounded
    zcode range)."""
    from pyjelly_spark.queries import _morton16

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x: long, y: long"
    )
    from pyspark.sql import functions as F
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", F.expr(_morton16("x", "y")).alias("z")).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x in range(16) for y in range(16)}
    # locality: any aligned 4x4 box occupies exactly one contiguous
    # 16-code range (the defining Z-curve property)
    for bx in range(0, 16, 4):
        for by in range(0, 16, 4):
            codes = sorted(got[(x, y)] for x in range(bx, bx + 4) for y in range(by, by + 4))
            assert codes == list(range(codes[0], codes[0] + 16))


def test_kth_smallest_selection(spark):
    import random

    from pyspark.sql import functions as F

    from pyjelly_spark.operators.selection import kth_smallest

    rng = random.Random(9)
    vals = [rng.randrange(-500, 10**7) for _ in range(3000)] + [42] * 50
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    s = sorted(vals)
    for k in (1, 2, 1000, len(vals) // 2, len(vals) - 1, len(vals)):
        assert kth_smallest(df, F.col("v"), k) == s[k - 1]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        kth_smallest(df, F.col("v"), 0)
    with _pytest.raises(ValueError):
        kth_smallest(df, F.col("v"), len(vals) + 1)


def _write_events(spark, rows):
    """Write a tiny synthetic events.parquet and return its dir."""
    import os
    import tempfile

    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_events_mad_closed_form(spark):
    """Lower-median / MAD / 3-MAD outlier count on a hand-computed set:
    cents [100,200,300,400,10000] -> med 300 (rank 3 of 5), deviations
    [200,100,0,100,9700] -> mad 100, outliers |v-med| > 300 -> only
    the 10000-cent row."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_mad

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i + 1, t0, 1, "click", v, "{}")
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])
    ]
    got = q_events_mad(spark, _write_events(spark, rows)).collect()
    assert [tuple(r) for r in got] == [("click", 300, 100, 1, 5)]


def test_events_expectations_closed_form(spark):
    """Each declared check trips exactly once on a crafted row set, and
    the clean checks report zero violations with passed=True."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_expectations

    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (1, t0, 10, "click", 5.0, "{}"),          # clean
        (2, t0, None, "view", 5.0, "{}"),         # null user_id
        (3, t0, 10, "click", -5.0, "{}"),         # value out of range
        (3, t0, 10, "view", 5.0, "{}"),           # duplicate event_id
        (4, t0, 10, "refund", 5.0, "{}"),         # bad event_type
        (5, dt.datetime(2023, 12, 31, 23, 59, 59), 10, "click", 5.0, "{}"),
    ]
    got = {
        r["check"]: (r["violations"], r["passed"])
        for r in q_events_expectations(spark, _write_events(spark, rows)).collect()
    }
    assert got == {
        "not_null_user_id": (1, False),
        "value_in_0_1000": (1, False),
        "unique_event_id": (1, False),
        "accepted_event_types": (1, False),
        "ts_in_2024": (1, False),
    }


def test_vocab_kn_closed_form(spark):
    """Continuation counts on a 3-bigram corpus: pairs {(a,b),(c,b),
    (b,d)} -> T=3; b has 2 left types (2/3 -> 666666 ppm), d has 1."""
    import os
    import tempfile

    from pyjelly_spark.queries import q_vocab_kn

    df = spark.createDataFrame(
        [(1, "a b"), (2, "c b"), (3, "b d"), (4, "a b")],
        "doc_id: long, text: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {r["word"]: tuple(r)[1:] for r in q_vocab_kn(spark, d).collect()}
    assert got == {
        "a": (0, 1, 0),
        "b": (2, 1, 666666),
        "c": (0, 1, 0),
        "d": (1, 0, 333333),
    }


def test_events_attribution_closed_form(spark):
    """One purchase (101 cents) with two in-window touches: linear
    gives 50 to the older view and 50+1 (remainder) to the latest
    click, last-touch gives all 101 to the click; an 8-day-old touch
    is excluded."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_attribution

    p_ts = dt.datetime(2024, 5, 10, 12, 0, 0)
    rows = [
        (1, p_ts, 7, "purchase", 1.01, "{}"),
        (2, p_ts - dt.timedelta(hours=1), 7, "click", 0.0, "{}"),
        (3, p_ts - dt.timedelta(days=3), 7, "view", 0.0, "{}"),
        (4, p_ts - dt.timedelta(days=8), 7, "view", 0.0, "{}"),  # stale
        (5, p_ts + dt.timedelta(hours=1), 7, "view", 0.0, "{}"),  # after
    ]
    got = {
        r["touch_type"]: tuple(r)[1:]
        for r in q_events_attribution(spark, _write_events(spark, rows)).collect()
    }
    assert got == {
        "click": (1, 1, 101, 51),
        "view": (1, 1, 0, 50),
    }


def test_events_quantiles_matches_python_sample(spark):
    """The deterministic hash sample and lower-rank selection replicated
    in pure python over sf0.001 must equal the Spark synopsis output."""
    import hashlib

    from pyjelly_spark.queries import q_events_quantiles

    sf = "/root/testdata/sf0.001"
    rows = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("event_id", "event_type", "value")
        .collect()
    )
    samp = {}
    for r in rows:
        h = int(hashlib.sha256(str(r["event_id"]).encode()).hexdigest()[:15], 16)
        if h % 64 == 0:
            samp.setdefault(r["event_type"], []).append(
                int(math.floor(r["value"] * 100))
            )
    expect = []
    for et, vs in samp.items():
        vs.sort()
        for q in (25, 50, 75, 90):
            rnk = max(1, (q * len(vs)) // 100)
            expect.append((et, q, vs[rnk - 1], len(vs)))
    expect.sort()
    got = [tuple(r) for r in q_events_quantiles(spark, sf).collect()]
    assert got == expect


def test_kg_butterflies_matches_python(spark):
    """Recompute b_f = sum_g C(c_fg, 2) from the collected bipartite
    call edges at sf0.001 and compare to the query's top-50."""
    from collections import Counter
    from itertools import combinations

    from pyjelly_spark.operators import extract as X
    from pyjelly_spark.queries import derived_source_files, q_kg_butterflies

    sf = "/root/testdata/sf0.001"
    files = derived_source_files(spark, sf)
    scalls = (
        files.select(
            X.file_iri(F.col("repo"), F.col("path")).alias("file"),
            F.explode(
                F.regexp_extract_all("content", F.lit(X.CALL_RE), F.lit(1))
            ).alias("symbol"),
        )
        .distinct()
        .collect()
    )
    by_sym = {}
    for r in scalls:
        by_sym.setdefault(r["symbol"], []).append(r["file"])
    cc = Counter()
    for fs in by_sym.values():
        for a, b in combinations(sorted(fs), 2):
            cc[(a, b)] += 1
    per = Counter()
    partners = Counter()
    for (a, b), c in cc.items():
        if c >= 2:
            bf = c * (c - 1) // 2
            per[a] += bf
            per[b] += bf
            partners[a] += 1
            partners[b] += 1
    expect = sorted(
        ((f, partners[f], per[f]) for f in per),
        key=lambda t: (-t[2], t[0]),
    )[:50]
    got = [tuple(r) for r in q_kg_butterflies(spark, sf).collect()]
    assert got == expect


def test_events_seasonal_closed_form(spark):
    """Two hours, one type: hour 0 mean 100 cents vs overall mean 200
    -> 500000 ppm; hour 1 mean 300 -> 1500000 ppm."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_seasonal

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 0, 20), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 1, 10), 1, "click", 3.0, "{}"),
        (4, dt.datetime(2024, 1, 2, 1, 20), 1, "click", 3.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_seasonal(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("click", 0, 2, 200, 500000),
        ("click", 1, 2, 600, 1500000),
    ]


def test_events_cusum_closed_form(spark):
    """cents 100,100,400 (n=3, sum=600): d = cents*3-600 = -300,-300,600;
    prefix -300,-600,0; runmin -300,-600,-600; C = 0,0,600 -> max 600 at
    the third event, one positive row."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pyjelly_spark.queries import q_events_cusum

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 0), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 2, 0), 1, "click", 4.0, "{}"),
    ]
    d = _write_events(spark, rows)
    got = q_events_cusum(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.event_type, r.max_cusum, r.pos_rows) == ("click", 600, 1)
    expected_es = (
        spark.read.parquet(f"{d}/events.parquet")
        .where(F.col("event_id") == 3)
        .select(F.unix_timestamp("ts").cast("long").alias("es"))
        .collect()[0]
        .es
    )
    assert r.changepoint_es == expected_es


def test_events_rfm_closed_form(spark):
    """Five single-event users with distinct recency/monetary orders:
    each lands in its own ntile bucket; f_score falls back to the
    user_id tiebreak because every frequency is 1."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_rfm

    rows = [
        (i, dt.datetime(2024, 1, i, 0, 0), i, "click", float(i), "{}")
        for i in range(1, 6)
    ]
    got = [
        tuple(r) for r in q_events_rfm(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        (1, 5, 1, 1, 500),
        (2, 4, 2, 1, 400),
        (3, 3, 3, 1, 300),
        (4, 2, 4, 1, 200),
        (5, 1, 5, 1, 100),
    ]


def test_events_benford_closed_form(spark):
    """cents 100, 200, 19, 3 -> digits {1: 2, 2: 1, 3: 1} of 4; obs ppm
    500000/250000/250000 vs Benford 301030/176091/124939."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_benford

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 1, "click", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1), 1, "click", 0.19, "{}"),
        (4, dt.datetime(2024, 1, 1), 1, "click", 0.03, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_benford(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        (1, 2, 500000, 301030, 198970),
        (2, 1, 250000, 176091, 73909),
        (3, 1, 250000, 124939, 125061),
    ]


def test_events_autocov_closed_form(spark):
    """Units 1,2,4 in ts order -> pairs (1,2),(2,4): sx=3 sy=6 sxy=10
    sxx=5 syy=20."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_autocov

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "click", 1.9, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 0), 1, "click", 2.9, "{}"),
        (3, dt.datetime(2024, 1, 1, 2, 0), 1, "click", 4.9, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_autocov(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", 2, 3, 6, 10, 5, 20)]


def test_tpch_q18_matches_pandas(spark):
    """Independent pandas recomputation of the large-volume-customer
    query on the sf0.001 tables."""
    import pandas as pd

    from pyjelly_spark.queries import q_tpch_q18

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    agg = (
        li.assign(qty=li.l_quantity.astype("int64"))
        .groupby("l_orderkey", as_index=False)["qty"]
        .sum()
    )
    agg = agg[agg.qty > 180]
    j = agg.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    j = j.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(100)
    want = set(zip(j.o_orderkey, j.qty))
    got = {
        (r.o_orderkey, r.sum_qty) for r in q_tpch_q18(spark, SF_DIR).collect()
    }
    assert got == want


def test_events_target_encoding_closed_form(spark):
    """Four same-day events, two purchases: enc = 500000 ppm; prior =
    500000 so smoothing is a fixed point; LOO bounds (pos-1)/(n-1) and
    pos/(n-1) = 333333 / 666666."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_target_encoding

    rows = [
        (1, dt.datetime(2024, 1, 1, 12, 0), 1, "purchase", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 13, 0), 1, "purchase", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 14, 0), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 15, 0), 1, "view", 1.0, "{}"),
    ]
    got = q_events_target_encoding(spark, _write_events(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n, r.pos, r.enc_ppm, r.smoothed_ppm) == (4, 2, 500000, 500000)
    assert (r.loo_min_ppm, r.loo_max_ppm) == (333333, 666666)


def test_events_class_weights_closed_form(spark):
    """click x2, view x1, purchase x1: weights 4e6/(3*n), sampling
    n_min/n."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_class_weights

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_class_weights(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [
        ("click", 2, 666666, 500000),
        ("purchase", 1, 1333333, 1000000),
        ("view", 1, 1333333, 1000000),
    ]


def _write_docs(spark, rows):
    """Write a tiny synthetic documents.parquet and return its dir."""
    import os
    import tempfile

    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_vocab_bigram_lm_closed_form(spark):
    """'a b a b' -> bigrams (a,b)x2 and (b,a)x1: p(b|a) = 1.0 and
    p(a|b) = 1.0 since each left context has one continuation."""
    from pyjelly_spark.queries import q_vocab_bigram_lm

    d = _write_docs(spark, [(1, "a b a b", "en", "s1", 7)])
    got = [tuple(r) for r in q_vocab_bigram_lm(spark, d).collect()]
    assert got == [
        ("a", "b", 2, 2, 1000000),
        ("b", "a", 1, 1, 1000000),
    ]


def test_doc_lexical_richness_closed_form(spark):
    """'x x y' -> 3 tokens, 2 types, 1 hapax; TTR 666666 ppm, hapax
    share 500000 ppm."""
    from pyjelly_spark.queries import q_doc_lexical_richness

    d = _write_docs(spark, [(1, "x x y", "en", "s1", 5)])
    got = [tuple(r) for r in q_doc_lexical_richness(spark, d).collect()]
    assert got == [("s1", 3, 2, 1, 666666, 500000)]


def test_events_histogram_closed_form(spark):
    """$1 -> bin 0, $25 -> bin 1, $600 -> clamped to bin 24; cumulative
    counts accumulate in bin order."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_histogram

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 1, "click", 25.0, "{}"),
        (3, dt.datetime(2024, 1, 1), 1, "click", 600.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_histogram(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("click", 0, 0, 1, 1),
        ("click", 1, 2000, 1, 2),
        ("click", 24, 48000, 1, 3),
    ]


def test_kg_assortativity_matches_python(spark):
    """Recompute the degree sums from the collected bipartite edges at
    sf0.001."""
    from collections import Counter

    from pyjelly_spark.operators import extract as X
    from pyjelly_spark.queries import derived_source_files, q_kg_assortativity

    sf = "/root/testdata/sf0.001"
    files = derived_source_files(spark, sf)
    edges = (
        files.select(
            X.file_iri(F.col("repo"), F.col("path")).alias("file"),
            F.explode(
                F.regexp_extract_all("content", F.lit(X.CALL_RE), F.lit(1))
            ).alias("symbol"),
        )
        .distinct()
        .collect()
    )
    df = Counter(r["file"] for r in edges)
    ds = Counter(r["symbol"] for r in edges)
    want = (
        len(edges),
        sum(df[r["file"]] for r in edges),
        sum(ds[r["symbol"]] for r in edges),
        sum(df[r["file"]] * ds[r["symbol"]] for r in edges),
        sum(df[r["file"]] ** 2 for r in edges),
        sum(ds[r["symbol"]] ** 2 for r in edges),
    )
    got = q_kg_assortativity(spark, sf).collect()[0]
    assert tuple(got) == want


def test_kg_richclub_matches_python(spark):
    """Recompute phi(k) from the collected resolved-import edges at
    sf0.001."""
    from collections import Counter

    from pyjelly_spark.queries import q_kg_imports_resolved, q_kg_richclub

    sf = "/root/testdata/sf0.001"
    rows = q_kg_imports_resolved(spark, sf).collect()
    edges = {
        (min(r["s"], r["o"]), max(r["s"], r["o"]))
        for r in rows
        if r["s"] != r["o"]
    }
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    want = []
    for k in (1, 2, 4, 8):
        club = {n for n, d in deg.items() if d > k}
        if not club:
            continue
        e_k = sum(1 for a, b in edges if a in club and b in club)
        n_k = len(club)
        want.append(
            (k, n_k, e_k, (e_k * 2000000) // max(n_k * (n_k - 1), 1))
        )
    got = [tuple(r) for r in q_kg_richclub(spark, sf).collect()]
    assert got == want


def test_doc_oov_rate_closed_form(spark):
    """20 words twice + 1 word once: the hapax falls outside the top-20
    core vocab -> 1 OOV occurrence of 41 tokens."""
    from pyjelly_spark.queries import q_doc_oov_rate

    text = " ".join(f"w{i:02d} w{i:02d}" for i in range(20)) + " zz"
    d = _write_docs(spark, [(1, text, "en", "s1", len(text))])
    got = [tuple(r) for r in q_doc_oov_rate(spark, d).collect()]
    assert got == [("s1", 41, 1, 1000000 // 41)]


def test_events_drift_closed_form(spark):
    """First half all in bin 0; second half split bins 0/1 -> per-bin
    share deltas 500000 + 500000 = 1000000 ppm L1."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_drift

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 1, "click", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 20), 1, "click", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 21), 1, "click", 25.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_drift(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", 2, 2, 1000000)]


def test_doc_zipf_closed_form(spark):
    """'a a a b b c': rank x count products 3, 4, 3; shares of the top
    word 10^6, 666666, 333333 ppm."""
    from pyjelly_spark.queries import q_doc_zipf

    d = _write_docs(spark, [(1, "a a a b b c", "en", "s1", 11)])
    got = [tuple(r) for r in q_doc_zipf(spark, d).collect()]
    assert got == [
        (1, "a", 3, 3, 1000000),
        (2, "b", 2, 4, 666666),
        (3, "c", 1, 3, 333333),
    ]


def test_events_interarrival_closed_form(spark):
    """Gaps of 60s and 120s: mean 90s, lower median 60s, exact
    microseconds."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_interarrival

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 3, 0), 1, "click", 1.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_interarrival(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [("click", 2, 60_000_000, 120_000_000, 90_000_000, 60_000_000)]


def test_cusum_closed_form_property(spark):
    """Property (pure python, no Spark): the windowed closed form
    C_i = P_i - min(0, min_{j<=i} P_j) equals the direct recurrence
    C_i = max(0, C_{i-1} + d_i) for arbitrary integer deviations —
    the identity q_events_cusum rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=50))
    def check(ds):
        c, direct = 0, []
        for d in ds:
            c = max(0, c + d)
            direct.append(c)
        p, runmin, closed = 0, 0, []
        for d in ds:
            p += d
            runmin = min(runmin, p)
            closed.append(p - min(runmin, 0))
        assert closed == direct

    check()


def test_target_encoding_loo_property(spark):
    """Property (pure python): the closed-form LOO bounds used by
    q_events_target_encoding equal brute-force row-level leave-one-out
    min/max for any binary label multiset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 1), min_size=2, max_size=60))
    def check(ys):
        n, pos = len(ys), sum(ys)
        brute = [((pos - y) * 1_000_000) // (n - 1) for y in ys]
        lo = (
            ((pos - 1) * 1_000_000) // max(n - 1, 1)
            if pos > 0
            else (pos * 1_000_000) // max(n - 1, 1)
        )
        hi = (
            (pos * 1_000_000) // max(n - 1, 1)
            if pos < n
            else ((pos - 1) * 1_000_000) // max(n - 1, 1)
        )
        assert lo == min(brute) and hi == max(brute)

    check()


def test_tpch_q15_matches_pandas(spark):
    """Independent pandas recomputation of the top-supplier query at
    sf0.001."""
    import pandas as pd

    from pyjelly_spark.queries import q_tpch_q15

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li = li[
        (li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")
    ]
    rev = (
        li.assign(r=li.l_extendedprice * (1 - li.l_discount))
        .groupby("l_suppkey")["r"]
        .sum()
    )
    want_keys = set(rev[rev == rev.max()].index)
    got = q_tpch_q15(spark, SF_DIR).collect()
    assert {r.s_suppkey for r in got} == want_keys
    assert all(abs(r.total_rev - rev.max()) < 1e-4 for r in got)


def test_tpch_q22_matches_pandas(spark):
    """Independent pandas recomputation of the rich-idle-customer
    rollup at sf0.001."""
    import pandas as pd

    from pyjelly_spark.queries import q_tpch_q22

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust["bal_cents"] = (cust.c_acctbal * 100).apply(
        lambda v: int(v // 1)
    )
    pos = cust[cust.bal_cents > 0]
    avg_cents = pos.bal_cents.sum() // len(pos)
    rich = pos[pos.bal_cents > avg_cents]
    recent = orders[orders.o_orderdate >= "1999-01-01"]
    rich = rich[~rich.c_custkey.isin(set(recent.o_custkey))]
    j = rich.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    want = {
        (name, len(g), int(g.bal_cents.sum()))
        for name, g in j.groupby("n_name")
    }
    got = {
        (r.n_name, r.numcust, r.totacctbal_cents)
        for r in q_tpch_q22(spark, SF_DIR).collect()
    }
    assert got == want


def test_events_gini_closed_form(spark):
    """Two users, cents 100 and 300: rank formula gives
    (2*700 - 3*400)/(2*400) = 0.25 -> 250000 ppm; the top decile is
    empty at n=2 (n div 10 = 0)."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_gini

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 2, "click", 3.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_gini(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", 2, 400, 250000, 0)]


def test_doc_novelty_closed_form(spark):
    """doc 1 owns both its bigrams; doc 2 shares 'a b' with doc 1 ->
    novelty 0.5; least-novel-first ordering."""
    from pyjelly_spark.queries import q_doc_novelty

    d = _write_docs(
        spark,
        [(1, "a b c", "en", "s1", 5), (2, "a b d", "en", "s1", 5)],
    )
    got = [tuple(r) for r in q_doc_novelty(spark, d).collect()]
    assert got == [(2, 2, 1, 500000), (1, 2, 2, 1000000)]


def test_holt_int_closed_form(spark):
    """Hand-unrolled Holt recurrence (alpha=beta=1/4), including a
    negative-trend step whose floor division differs from truncation:
    cents [400, 800, 4] ->
      t1: l=400, b=0
      t2: f=400, l=(800+3*400)//4=500, b=(100+0)//4=25
      t3: f=525, l=(4+3*525)//4=394, b=((394-500)+3*25)//4=(-31)//4=-8
    (truncation toward zero would give -7 — the cross-engine hazard the
    oracle emulates)."""
    import datetime as dt

    from pyjelly_spark.operators.timeseries import holt_int

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, 4.00),
        (1, 2, t0 + dt.timedelta(seconds=1), 8.00),
        (1, 3, t0 + dt.timedelta(seconds=2), 0.04),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: timestamp_ntz, value: double"
    )
    got = {
        r["event_id"]: (r["level"], r["trend"]) for r in holt_int(df).collect()
    }
    assert got == {1: (400, 0), 2: (500, 25), 3: (394, -8)}


def test_holt_int_rejects_bad_params(spark):
    import pytest as _pytest

    from pyjelly_spark.operators.timeseries import holt_int

    df = spark.createDataFrame(
        [], "user_id: long, event_id: long, ts: timestamp_ntz, value: double"
    )
    with _pytest.raises(ValueError):
        holt_int(df, beta_num=4, beta_den=4)


def test_events_abtest_closed_form(spark):
    """Three users, variants derived with the same portable sha256 hash
    the query uses; expected 2x2 cells + exact chi-square recomputed in
    Python with integer arithmetic."""
    import datetime as dt
    import hashlib

    from pyjelly_spark.queries import q_events_abtest

    t0 = dt.datetime(2024, 1, 1)
    # u1 converts, u2 and u3 don't
    rows = [
        (1, t0, 1, "purchase", 1.0, "{}"),
        (2, t0, 2, "view", 1.0, "{}"),
        (3, t0, 3, "click", 1.0, "{}"),
    ]

    def variant(uid: int) -> int:
        return int(hashlib.sha256(str(uid).encode()).hexdigest()[:15], 16) % 2

    cells = {"a": 0, "b": 0, "c": 0, "d": 0}
    for uid, conv in [(1, 1), (2, 0), (3, 0)]:
        key = {(0, 1): "a", (0, 0): "b", (1, 1): "c", (1, 0): "d"}[
            (variant(uid), conv)
        ]
        cells[key] += 1
    a, b, c, d = cells["a"], cells["b"], cells["c"], cells["d"]
    n = a + b + c + d
    det = a * d - b * c
    denom = max((a + b) * (c + d) * (a + c) * (b + d), 1)
    want = (
        a, b, c, d,
        a * 1000000 // max(a + b, 1),
        c * 1000000 // max(c + d, 1),
        1000 * n * det * det // denom,
    )
    got = [tuple(r) for r in q_events_abtest(spark, _write_events(spark, rows)).collect()]
    assert got == [want]


def test_events_winsorize_closed_form(spark):
    """cents [100,200,300,400,10000]: p05 rank = greatest(1, 25//100)=1
    -> lo=100; p95 rank = 475//100=4 -> hi=400; winsorized sum clips
    only the 10000 outlier to 400."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_winsorize

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i + 1, t0, 1, "click", v, "{}")
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])
    ]
    got = [
        tuple(r)
        for r in q_events_winsorize(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", 5, 100, 400, 11000, 1400)]


def test_kg_reciprocity_matches_python(spark):
    """Recompute reciprocity from the collected resolved-import edge
    list at sf0.001."""
    from pyjelly_spark.queries import q_kg_imports_resolved, q_kg_reciprocity

    sf = "/root/testdata/sf0.001"
    edges = {
        (r["s"], r["o"])
        for r in q_kg_imports_resolved(spark, sf).select("s", "o").collect()
        if r["s"] != r["o"]
    }
    n_recip = sum(1 for s, o in edges if (o, s) in edges)
    want = (
        len(edges),
        n_recip,
        n_recip // 2,
        n_recip * 1000000 // max(len(edges), 1),
    )
    got = [tuple(r) for r in q_kg_reciprocity(spark, sf).collect()]
    assert got == [want]


def _write_tpch(spark, tables):
    """Write tiny synthetic TPC-H-shaped tables and return the dir."""
    import os
    import tempfile

    d = tempfile.mkdtemp()
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_tpch_q13_closed_form(spark):
    """3 customers: c1 has 2 non-urgent orders, c2 has 1 urgent (filtered
    -> count 0), c3 has none -> distribution {2:1, 0:2}."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q13

    t0 = dt.datetime(1996, 6, 1)
    d = _write_tpch(
        spark,
        {
            "customer": (
                [(1, "a", 0, 1.0, "S"), (2, "b", 0, 1.0, "S"), (3, "c", 0, 1.0, "S")],
                "c_custkey: long, c_name: string, c_nationkey: int, "
                "c_acctbal: double, c_mktsegment: string",
            ),
            "orders": (
                [
                    (10, 1, "O", 1.0, t0, "2-HIGH"),
                    (11, 1, "O", 1.0, t0, "5-LOW"),
                    (12, 2, "O", 1.0, t0, "1-URGENT"),
                ],
                "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
                "o_totalprice: double, o_orderdate: timestamp_ntz, "
                "o_orderpriority: string",
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q13(spark, d).collect()]
    assert got == [(0, 2), (2, 1)]


def test_tpch_q17_closed_form(spark):
    """One qualifying part with quantities [1, 10, 10]: sum=21, cnt=3,
    threshold 5*q*3 < 21 -> only q=1 (15 < 21). price 7.00 -> 700
    cents, avg_yearly_cents = 700 // 7 = 100."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q17

    t0 = dt.datetime(1996, 6, 1)
    li_schema = (
        "l_orderkey: long, l_partkey: long, l_suppkey: long, "
        "l_linenumber: int, l_quantity: double, l_extendedprice: double, "
        "l_discount: double, l_tax: double, l_returnflag: string, "
        "l_linestatus: string, l_shipdate: timestamp_ntz"
    )
    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "p", "Brand#11", "STANDARD", 7, 1.0),
                 (2, "q", "Brand#11", "STANDARD", 8, 1.0)],
                "p_partkey: long, p_name: string, p_brand: string, "
                "p_type: string, p_size: int, p_retailprice: double",
            ),
            "lineitem": (
                [
                    (1, 1, 1, 1, 1.0, 7.00, 0.0, 0.0, "N", "O", t0),
                    (2, 1, 1, 1, 10.0, 9.00, 0.0, 0.0, "N", "O", t0),
                    (3, 1, 1, 1, 10.0, 9.00, 0.0, 0.0, "N", "O", t0),
                    (4, 2, 1, 1, 1.0, 5.00, 0.0, 0.0, "N", "O", t0),
                ],
                li_schema,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q17(spark, d).collect()]
    assert got == [(1, 700.0, 100)]


def test_events_bitmap_closed_form(spark):
    """Users 0,1,62 click; users 1,62 view -> overlap 2, jaccard
    2/3 -> 666666 ppm. User 62 exercises the second 62-bit word."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_bitmap

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 0, "click", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        (3, t0, 62, "click", 1.0, "{}"),
        (4, t0, 1, "view", 1.0, "{}"),
        (5, t0, 62, "view", 1.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_bitmap(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", "view", 3, 2, 2, 666666)]


def test_events_survival_closed_form(spark):
    """u1 spans 2 days, u2 spans 0 days -> survival: d=0: 2/2, d=1: 1/2,
    d=2: 1/2, d>=3: 0."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_survival

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=2), 1, "click", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    got = {
        r["d"]: (r["survivors"], r["survival_ppm"])
        for r in q_events_survival(spark, _write_events(spark, rows)).collect()
    }
    assert got[0] == (2, 1000000)
    assert got[1] == (1, 500000)
    assert got[2] == (1, 500000)
    assert got[3] == (0, 0)
    assert len(got) == 14


def test_events_diversity_closed_form(spark):
    """u1: 2 clicks + 2 views -> impurity 1 - 2*(1/2)^2 = 0.5; u2: one
    type -> 0."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_diversity

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0, 1, "click", 1.0, "{}"),
        (3, t0, 1, "view", 1.0, "{}"),
        (4, t0, 1, "view", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_diversity(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(1, 4, 2, 500000), (2, 1, 1, 0)]


def test_tpch_q8_matches_pandas(spark):
    """Independent pandas recomputation of the market-share query at
    sf0.001."""
    import pandas as pd

    from pyjelly_spark.queries import q_tpch_q8

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    supp = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    region = pd.read_parquet(f"{SF_DIR}/region.parquet")

    orders = orders[
        (orders.o_orderdate >= "1996-01-01")
        & (orders.o_orderdate < "1998-01-01")
    ]
    df = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(part[part.p_type == "STANDARD"], left_on="l_partkey",
               right_on="p_partkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation.rename(columns={"n_nationkey": "c_nk"}),
               left_on="c_nationkey", right_on="c_nk")
        .merge(region[region.r_name == "ASIA"], left_on="n_regionkey",
               right_on="r_regionkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation.rename(columns={"n_nationkey": "s_nk",
                                      "n_name": "supp_nation"})[
                   ["s_nk", "supp_nation"]],
               left_on="s_nationkey", right_on="s_nk")
    )
    df["v4"] = (
        (df.l_extendedprice * (1 - df.l_discount) * 10000).round().astype(int)
    )
    df["o_year"] = pd.to_datetime(df.o_orderdate).dt.year
    got = {r.o_year: (r.nation_vol4, r.total_vol4, r.mkt_share_ppm)
           for r in q_tpch_q8(spark, SF_DIR).collect()}
    for y, g in df.groupby("o_year"):
        nat = int(g.loc[g.supp_nation == "NATION_1", "v4"].sum())
        tot = int(g.v4.sum())
        assert got[int(y)] == (float(nat), float(tot),
                               nat * 1000000 // max(tot, 1))


def test_tpch_q19_matches_pandas(spark):
    """Independent pandas recomputation of the disjunctive-predicate
    revenue at sf0.001."""
    import pandas as pd

    from pyjelly_spark.queries import q_tpch_q19

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    q = df.l_quantity
    m = (
        ((df.p_brand == "Brand#12") & df.p_size.between(1, 5)
         & q.between(1, 11))
        | ((df.p_brand == "Brand#23") & df.p_size.between(1, 10)
           & q.between(10, 20))
        | ((df.p_brand == "Brand#34") & df.p_size.between(1, 15)
           & q.between(20, 30))
    )
    sel = df[m]
    rev4 = int(
        (sel.l_extendedprice * (1 - sel.l_discount) * 10000).round().sum()
    )
    got = [tuple(r) for r in q_tpch_q19(spark, SF_DIR).collect()]
    assert got == [(len(sel), float(rev4), rev4 // 100)]


def test_kg_modularity_matches_python(spark):
    """Recompute Q from the collected symmetrized edges + LPA labels at
    sf0.001."""
    from pyjelly_spark.queries import (
        q_kg_communities,
        q_kg_imports_resolved,
        q_kg_modularity,
    )

    sf = "/root/testdata/sf0.001"
    directed = {
        (r["s"], r["o"])
        for r in q_kg_imports_resolved(spark, sf).select("s", "o").collect()
    }
    und = {(a, b) for a, b in directed if a != b} | {
        (b, a) for a, b in directed if a != b
    }
    label = {
        r["node"]: r["label"] for r in q_kg_communities(spark, sf).collect()
    }
    from collections import defaultdict

    deg = defaultdict(int)
    internal = defaultdict(int)
    for a, b in und:
        deg[label[a]] += 1
        if label[a] == label[b]:
            internal[label[a]] += 1
    d_tot = sum(deg.values())
    num = sum(
        internal[c] * d_tot - deg[c] * deg[c] for c in deg
    )
    # Spark div / DuckDB // truncate toward zero (num is negative on a
    # poorly-clustered graph); Python // floors — emulate truncation
    dd = max(d_tot * d_tot, 1)
    sign = -1 if num < 0 else 1
    want = (
        len(deg),
        d_tot // 2,
        sum(internal.values()),
        sign * (abs(num) * 1000000 // dd),
    )
    got = [tuple(r) for r in q_kg_modularity(spark, sf).collect()]
    assert got == [want]


def test_events_backtest_closed_form(spark):
    """One user, cents [400, 800, 4] (Holt levels/trends hand-unrolled
    in test_holt_int_closed_form): forecasts 400 then 525, naive 400
    then 800 -> holt_abs=400+521=921, naive_abs=400+796=1196."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_backtest

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 4.00, "{}"),
        (2, t0 + dt.timedelta(seconds=1), 1, "click", 8.00, "{}"),
        (3, t0 + dt.timedelta(seconds=2), 1, "click", 0.04, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_backtest(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        (2, 921, 1196, 921 // 2, 1196 // 2, (1196 - 921) * 1000000 // 1196)
    ]


def test_dedup_editdist_closed_form(spark):
    """Docs 1 and 2 share a 60-char prefix and differ by one char
    (dist 1); doc 3 has a different prefix -> excluded by blocking."""
    from pyjelly_spark.queries import q_dedup_editdist

    prefix = "x" * 60
    d = _write_docs(
        spark,
        [
            (1, prefix + " alpha beta", "en", "s1", 71),
            (2, prefix + " alpha beta!", "en", "s1", 72),
            (3, "y" * 60 + " alpha beta", "en", "s1", 71),
        ],
    )
    got = [tuple(r) for r in q_dedup_editdist(spark, d).collect()]
    assert got == [(1, 2, 1)]


def test_events_auc_closed_form(spark):
    """4 users: converters score 300, 100; non-converters 200, 100
    (one tie across classes). Ranks asc: 100->rank1 (2 ties, 2R=2*1+2-1=3),
    200->2R=2*3+1-1=6, 300->2R=2*4+1-1=8. sum_pos(2R)=3+8=11;
    AUC = (11 - 2*3) / (2*2*2) = 5/8 -> 625000 ppm."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_auc

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "purchase", 3.00, "{}"),
        (2, t0, 2, "purchase", 1.00, "{}"),
        (3, t0, 3, "view", 2.00, "{}"),
        (4, t0, 4, "view", 1.00, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_auc(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(2, 2, 11, 625000)]


def test_dedup_containment_closed_form(spark):
    """doc 2's shingles are a subset of doc 1's -> containment(2 in 1)
    = 1.0; the reverse direction is 2/4 = 0.5 < 0.8 threshold."""
    from pyjelly_spark.queries import q_dedup_containment

    d = _write_docs(
        spark,
        [
            (1, "a b c d e f", "en", "s1", 11),  # shingles: abc bcd cde def
            (2, "a b c d", "en", "s1", 7),       # shingles: abc bcd
        ],
    )
    got = [tuple(r) for r in q_dedup_containment(spark, d).collect()]
    assert got == [(2, 1, 1000000)]


def test_holt_winters_int_closed_form(spark):
    """m=2 hand-unrolled case: cents [10, 20, 6].
    init: l_2 = (10+20)//2 = 15, b_2 = 0, s = [10-15, 20-15] = [-5, 5].
    t=3 (c=6, s_lag=-5): forecast = 15+0+(-5) = 10;
      l = (1*(6-(-5)) + 3*15)//4 = 56//4 = 14
      b = (1*(14-15) + 3*0)//4 = (-1)//4 = -1   (floor, not trunc-0)
      s = (1*(6-14) + 3*(-5))//4 = (-23)//4 = -6."""
    import datetime as dt

    from pyjelly_spark.operators.timeseries import holt_winters_int

    d0 = dt.date(2024, 1, 1)
    rows = [
        ("click", d0, 10),
        ("click", d0 + dt.timedelta(days=1), 20),
        ("click", d0 + dt.timedelta(days=2), 6),
        ("view", d0, 99),  # <= m rows -> no output
    ]
    df = spark.createDataFrame(rows, "key: string, d: date, cents: long")
    got = [tuple(r) for r in holt_winters_int(df, season=2).collect()]
    assert got == [("click", 3, 6, 14, -1, -6, 10)]


def test_holt_winters_rejects_bad_params(spark):
    import pytest as _pytest

    from pyjelly_spark.operators.timeseries import holt_winters_int

    df = spark.createDataFrame([], "key: string, d: date, cents: long")
    with _pytest.raises(ValueError):
        holt_winters_int(df, season=1)


def test_events_gains_closed_form(spark):
    """10 users, scores = user_id cents (total order); converters are
    the top-3 spenders (8,9,10). One user per decile -> deciles 0,1,2
    (highest scores) each capture one converter."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_gains

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(1, 11):
        eid += 1
        etype = "purchase" if uid >= 8 else "view"
        rows.append((eid, t0, uid, etype, uid / 100.0, "{}"))
    got = [
        tuple(r)
        for r in q_events_gains(spark, _write_events(spark, rows)).collect()
    ]
    # decile 0 = highest spender (uid 10, converter): conv 1e6, capture 1/3
    assert got[0] == (0, 1, 1, 1000000, 333333)
    assert got[1] == (1, 1, 1, 1000000, 666666)
    assert got[2] == (2, 1, 1, 1000000, 1000000)
    assert got[3] == (3, 1, 0, 0, 1000000)
    assert len(got) == 10


def test_events_drawdown_closed_form(spark):
    """u1 cumsum walks 100 -> 300 -> 150 (drawdown 150) -> 400; u2 is
    monotone (drawdown 0)."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_drawdown

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "click", 1.00, "{}"),
        (2, t0 + s, 1, "click", 2.00, "{}"),
        (3, t0 + 2 * s, 1, "click", -1.50, "{}"),
        (4, t0 + 3 * s, 1, "click", 2.50, "{}"),
        (5, t0, 2, "click", 1.00, "{}"),
        (6, t0 + s, 2, "click", 1.00, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_drawdown(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(1, 150, 400, 4), (2, 0, 200, 2)]


def test_basket_rules_closed_form(spark):
    """3 orders: o1 {B1,B2}, o2 {B1,B2}, o3 {B1} (via two lineitems of
    the same brand -> distinct collapses them). pair (B1,B2): cnt 2,
    support 2/3, conf B1->B2 = 2/3, conf B2->B1 = 1, lift = 2*3/(3*2)
    = 1.0."""
    import datetime as dt

    from pyjelly_spark.queries import q_basket_rules

    t0 = dt.datetime(1996, 6, 1)
    li_schema = (
        "l_orderkey: long, l_partkey: long, l_suppkey: long, "
        "l_linenumber: int, l_quantity: double, l_extendedprice: double, "
        "l_discount: double, l_tax: double, l_returnflag: string, "
        "l_linestatus: string, l_shipdate: timestamp_ntz"
    )
    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "p", "B1", "STANDARD", 1, 1.0),
                 (2, "q", "B2", "STANDARD", 1, 1.0),
                 (3, "r", "B1", "STANDARD", 1, 1.0)],
                "p_partkey: long, p_name: string, p_brand: string, "
                "p_type: string, p_size: int, p_retailprice: double",
            ),
            "lineitem": (
                [
                    (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                    (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                    (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                    (2, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                    (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                    (3, 3, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", t0),
                ],
                li_schema,
            ),
        },
    )
    got = [tuple(r) for r in q_basket_rules(spark, d).collect()]
    assert got == [("B1", "B2", 2, 666666, 666666, 1000000, 1000000)]


def test_events_conformal_closed_form(spark):
    """User 1 flat (cents 100 x5, Holt residuals all 0: cal ids 3,5 ->
    {0,0}, test ids 2,4 -> {0,0}); user 2 ramps 100/200/300 (id 7 odd
    -> cal residual 200-100=100; id 8 even -> test residual
    300-(125+6)=169). Calibration {0,0,100}: n=3, q10 rank
    greatest(1,30//100)=1 -> 0, q90 rank greatest(1,270//100)=2 -> 0.
    Test {0,0,169}: 2 of 3 inside [0,0] -> 666666 ppm."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_conformal

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, v):
        return (i, t0 + dt.timedelta(minutes=i), u, "view", v, "{}")

    rows = [ev(i, 1, 1.0) for i in range(1, 6)] + [
        ev(6, 2, 1.0),
        ev(7, 2, 2.0),
        ev(8, 2, 3.0),
    ]
    got = [
        tuple(r)
        for r in q_events_conformal(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(3, 3, 0, 0, 2, 666666)]


def test_doc_nb_closed_form(spark):
    """en: {a:3, b:1, c:1} (total 5), fr: {b:2} (total 2), vocab 3.
    cond_ppm(en) = (cnt+1)*1e6 // 8 -> a 500000, b/c 250000;
    cond_ppm(fr, b) = 3e6 // 5 = 600000. priors 2/3 and 1/3 in ppm."""
    from pyjelly_spark.queries import q_doc_nb

    d = _write_docs(
        spark,
        [
            (1, "a a b", "en", "s", 5),
            (2, "a c", "en", "s", 3),
            (3, "b b", "fr", "s", 3),
        ],
    )
    got = [tuple(r) for r in q_doc_nb(spark, d).collect()]
    assert got == [
        ("en", "a", 3, 1, 500000, 666666),
        ("en", "b", 1, 2, 250000, 666666),
        ("en", "c", 1, 3, 250000, 666666),
        ("fr", "b", 2, 1, 600000, 333333),
    ]


def test_events_seqpat_closed_form(spark):
    """User 1: view, click, view (ranks 1,2,3) -> view precedes click
    (1 < 2) and click precedes view (2 < 3); user 2: click only (no
    pairs). 1 of 2 users supports each pattern -> 500000 ppm."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_seqpat

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, t0 + dt.timedelta(minutes=i), u, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "view"),
        ev(2, 1, "click"),
        ev(3, 1, "view"),
        ev(4, 2, "click"),
    ]
    got = [
        tuple(r)
        for r in q_events_seqpat(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("click", "view", 1, 500000),
        ("view", "click", 1, 500000),
    ]


def test_events_kanon_closed_form(spark):
    """QI groups: (view, hour 1) holds 3 rows from 2 users; (click,
    hour 2) holds 1 row from 1 user; both below k=20 -> risky."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_kanon

    def ev(i, u, typ, hh):
        return (i, dt.datetime(2024, 1, 1, hh, 30), u, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "view", 1),
        ev(2, 1, "view", 1),
        ev(3, 2, "view", 1),
        ev(4, 3, "click", 2),
    ]
    got = [
        tuple(r)
        for r in q_events_kanon(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("click", 2, 1, 1, 1), ("view", 1, 3, 2, 1)]


def test_events_ate_closed_form(spark):
    """Stratum 0 (all users have < 20 events): treated u1 bought 10.00
    (mean 1000 cents -> 1e9 ppm-cents), controls u2/u3 bought 5.00
    total (mean 250 cents -> 2.5e8); ATE = 7.5e8."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_ate

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, v):
        return (i, t0 + dt.timedelta(minutes=i), u, typ, v, "{}")

    rows = [
        ev(1, 1, "click", 1.0),
        ev(2, 1, "purchase", 10.0),
        ev(3, 2, "view", 1.0),
        ev(4, 2, "purchase", 5.0),
        ev(5, 3, "view", 1.0),
    ]
    got = [
        tuple(r)
        for r in q_events_ate(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(0, 1, 2, 1000000000, 250000000, 750000000)]


def test_orders_mrr_closed_form(spark):
    """Cust 1: 100.00 in m0, 150.00 in m1 (expansion 50.00), gap in m2
    (churn 150.00), 80.00 in m3 (reactivation). Cust 2: 200.00 in m1
    only (new in m1, churn in m2). The waterfall identity ending =
    starting + new + react + expand - contract - churn holds on every
    row."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_mrr

    def o(k, c, price, y, mo):
        return (k, c, "O", price, dt.datetime(y, mo, 15), "2-HIGH")

    d = _write_tpch(
        spark,
        {
            "orders": (
                [
                    o(1, 1, 100.0, 1995, 1),
                    o(2, 1, 150.0, 1995, 2),
                    o(3, 1, 80.0, 1995, 4),
                    o(4, 2, 200.0, 1995, 2),
                ],
                "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
                "o_totalprice: double, o_orderdate: timestamp_ntz, "
                "o_orderpriority: string",
            ),
        },
    )
    m0 = 1995 * 12 + 0
    got = [tuple(r) for r in q_orders_mrr(spark, d).collect()]
    assert got == [
        (m0, 0, 10000, 0, 0, 0, 0, 10000),
        (m0 + 1, 10000, 20000, 0, 5000, 0, 0, 35000),
        (m0 + 2, 35000, 0, 0, 0, 0, 35000, 0),
        (m0 + 3, 0, 0, 8000, 0, 0, 0, 8000),
        (m0 + 4, 8000, 0, 0, 0, 0, 8000, 0),
    ]
    for (_, st, nw, re, ex, co, ch, en) in got:
        assert en == st + nw + re + ex - co - ch


def test_kg_comention_invariants(spark):
    """Pair generation / lift arithmetic invariants on the derived
    corpus: canonical pair order, co-mention floor of 2, and lift_ppm
    exactly reconstructible from the emitted counts."""
    from pyjelly_spark.queries import q_kg_comention

    rows = q_kg_comention(spark, SF_DIR).collect()
    assert rows, "no co-mention pairs found"
    n_files = None
    for r in rows:
        assert r.sym_a < r.sym_b
        assert r.co_cnt >= 2
        nf = (r.lift_ppm * r.cnt_a * r.cnt_b) // (r.co_cnt * 1000000)
        if n_files is None:
            n_files = nf
        assert r.lift_ppm == (r.co_cnt * n_files * 1000000) // (
            r.cnt_a * r.cnt_b
        ) or abs(nf - n_files) <= 1


def test_dedup_eval_closed_form(spark):
    """Gold groups by exact text: {d1,d2}, {d3}, {d4} -> 1 pair.
    SimHash groups by distinct-word signature: {d1,d2,d3} ("a a b" has
    the same word SET as "a b"), {d4} -> 3 pairs, 1 of them true.
    precision 1/3, recall 1/1."""
    from pyjelly_spark.queries import q_dedup_eval

    d = _write_docs(
        spark,
        [
            (1, "a b", "en", "s", 3),
            (2, "a b", "en", "s", 3),
            (3, "a a b", "en", "s", 5),
            (4, "c", "en", "s", 1),
        ],
    )
    got = [tuple(r) for r in q_dedup_eval(spark, d).collect()]
    assert got == [(4, 1, 3, 1, 333333, 1000000)]


def test_kg_blocking_stats_invariants(spark):
    """SymSpell distance-1 blocking is lossless: completeness is
    exactly 1e6 and found == true; the candidate set must be a strict
    reduction of the quadratic pair space."""
    from pyjelly_spark.queries import q_kg_blocking_stats

    row = q_kg_blocking_stats(spark, SF_DIR).collect()[0]
    assert row.completeness_ppm == 1000000
    assert row.found_pairs == row.true_pairs
    assert 0 < row.cand_pairs < row.all_pairs
    assert row.reduction_ppm > 900000


def test_events_skew_closed_form(spark):
    """User 1 has 3 rows, user 2 has 1: p50/p99 ranks over n=2 key
    counts both resolve to rank 1 (count 1); the heaviest key holds
    3/4 of all rows."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_skew

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), u, "view", 1.0, "{}")
        for i, u in [(1, 1), (2, 1), (3, 1), (4, 2)]
    ]
    got = [
        tuple(r)
        for r in q_events_skew(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(2, 4, 3, 1, 1, 750000, 1000000)]


def test_orders_churn_labels_closed_form(spark):
    """Cust 1 orders in m0 (100.00), m1 (100.00 + 50.00) and m4
    (80.00): the m1 row sees trailing freq3=3 / 250.00 and churns (gap
    of 2+ months follows); the m4 row's trailing window spans the gap
    (only its own order) and churns at the horizon."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_churn_labels

    def o(k, price, y, mo):
        return (k, 1, "O", price, dt.datetime(y, mo, 10), "2-HIGH")

    d = _write_tpch(
        spark,
        {
            "orders": (
                [
                    o(1, 100.0, 1995, 1),
                    o(2, 100.0, 1995, 2),
                    o(3, 50.0, 1995, 2),
                    o(4, 80.0, 1995, 5),
                ],
                "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
                "o_totalprice: double, o_orderdate: timestamp_ntz, "
                "o_orderpriority: string",
            ),
        },
    )
    m0 = 1995 * 12
    got = [tuple(r) for r in q_orders_churn_labels(spark, d).collect()]
    assert got == [
        (1, m0, 0, 1, 10000, 0),
        (1, m0 + 1, 1, 3, 25000, 1),
        (1, m0 + 4, 3, 1, 8000, 1),
    ]


def test_orders_cohort_ltv_closed_form(spark):
    """Cust 1 joins in m0 (100.00 then 50.00 in m1), cust 2 joins in m1
    (200.00): two one-customer cohorts; cumulative LTV per member is
    the running revenue in ppm-cents."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_cohort_ltv

    def o(k, c, price, mo):
        return (k, c, "O", price, dt.datetime(1995, mo, 10), "2-HIGH")

    d = _write_tpch(
        spark,
        {
            "orders": (
                [o(1, 1, 100.0, 1), o(2, 1, 50.0, 2), o(3, 2, 200.0, 2)],
                "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
                "o_totalprice: double, o_orderdate: timestamp_ntz, "
                "o_orderpriority: string",
            ),
        },
    )
    m0 = 1995 * 12
    got = [tuple(r) for r in q_orders_cohort_ltv(spark, d).collect()]
    assert got == [
        (m0, 0, 1, 1, 10000, 10000, 10000000000),
        (m0, 1, 1, 1, 5000, 15000, 15000000000),
        (m0 + 1, 0, 1, 1, 20000, 20000, 20000000000),
    ]


def test_events_group_quantiles_closed_form(spark):
    """4 'view' events at 1.00..4.00: rank contract picks rank 2 for
    p50 (200 cents) and rank 3 for both p95 and p99."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_group_quantiles

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "view", float(i), "{}")
        for i in (1, 2, 3, 4)
    ]
    got = [
        tuple(r)
        for r in q_events_group_quantiles(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [("view", 4, 100, 200, 300, 300, 400)]


def test_doc_compaction_closed_form(spark):
    """Sizes 40000/30000/10000 against 32 KiB bins: the 40000-char file
    runs past the first boundary (prefix-sum next-fit), leaving bin 0
    empty; the remaining two share bin 2 at the same fill."""
    from pyjelly_spark.queries import q_doc_compaction

    d = _write_docs(
        spark,
        [
            (1, "x", "en", "s", 40000),
            (2, "y", "en", "s", 30000),
            (3, "z", "en", "s", 10000),
        ],
    )
    got = [tuple(r) for r in q_doc_compaction(spark, d).collect()]
    assert got == [(1, 1, 40000, 1220703), (2, 2, 40000, 1220703)]


def test_stream_topk_matches_batch(spark):
    """Drained complete-mode leaderboard equals the batch rank: view
    u1x3 > u2x1; click u2x2."""
    import datetime as dt

    from pyjelly_spark.queries import q_stream_topk

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), u, typ, 1.0, "{}")
        for i, (u, typ) in enumerate(
            [
                (1, "view"),
                (1, "view"),
                (1, "view"),
                (2, "view"),
                (2, "click"),
                (2, "click"),
            ],
            start=1,
        )
    ]
    got = [
        tuple(r)
        for r in q_stream_topk(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("click", 2, 2, 1),
        ("view", 1, 3, 1),
        ("view", 2, 1, 2),
    ]


def test_events_convert_time_closed_form(spark):
    """u1 converts 100 s after first view; u2 never purchases; u3
    purchased before viewing (not a conversion). 1/3 users convert;
    all quantiles collapse to the single delta."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_convert_time

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, typ, sec):
        return (i, t0 + dt.timedelta(seconds=sec), u, typ, 1.0, "{}")

    rows = [
        ev(1, 1, "view", 0),
        ev(2, 1, "purchase", 100),
        ev(3, 2, "view", 0),
        ev(4, 3, "purchase", 10),
        ev(5, 3, "view", 50),
    ]
    got = [
        tuple(r)
        for r in q_events_convert_time(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [(3, 1, 333333, 100, 100, 100)]


def test_events_bursts_closed_form(spark):
    """Minute counts [1,1,5,5,1]: median 1, threshold 2 -> minutes 2-3
    burst as one 2-minute run peaking at 5."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_bursts

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for minute, n in [(0, 1), (1, 1), (2, 5), (3, 5), (4, 1)]:
        for j in range(n):
            i += 1
            rows.append(
                (
                    i,
                    t0 + dt.timedelta(minutes=minute, seconds=j),
                    1,
                    "view",
                    1.0,
                    "{}",
                )
            )
    got = [
        tuple(r)
        for r in q_events_bursts(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [("view", 2, 1, 2, 5)]


def test_events_profile_closed_form(spark):
    """Two rows, one with NULL value and props: completeness drops to
    500000 ppm exactly for those columns; distincts are exact."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_profile

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.5, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 2, "view", None, None),
    ]
    got = [
        tuple(r)
        for r in q_events_profile(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("event_id", 2, 0, 2, 1000000),
        ("event_type", 2, 0, 1, 1000000),
        ("props", 2, 1, 1, 500000),
        ("ts", 2, 0, 2, 1000000),
        ("user_id", 2, 0, 2, 1000000),
        ("value", 2, 1, 1, 500000),
    ]


def test_kg_dangling_invariants(spark):
    """Per-repo audit arithmetic is self-consistent and the derived
    corpus does contain dangling call mentions (files with
    doc_id % 17 == 3 are dropped, so calls into them dangle)."""
    from pyjelly_spark.queries import q_kg_dangling

    rows = q_kg_dangling(spark, SF_DIR).collect()
    assert len(rows) == 7
    assert any(r.n_dangling > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_dangling <= r.n_mentions
        assert r.dangling_ppm == (r.n_dangling * 1000000) // r.n_mentions


def test_kg_cycles_closed_form(spark):
    """7-document corpus, edges hand-derived from the synthesis
    formulas (doc 3 is dropped by the %17 rule; doc 0 gets the %10
    extra import 0->5): 11 distinct non-self edges, 2 self-loops
    (2->2, 5->5), one 2-cycle (4<->5) and one 3-cycle (0->5->1->0)."""
    from pyjelly_spark.queries import q_kg_cycles

    d = _write_docs(
        spark, [(i, "t", "en", "s", 1) for i in range(7)]
    )
    got = [tuple(r) for r in q_kg_cycles(spark, d).collect()]
    assert got == [(11, 2, 1, 1)]


def test_events_segment_shift_closed_form(spark):
    """u1 spends 1000.00 in the first half only (band 1 -> band 0);
    u2 spends 2500.00 in the second half only (band 0 -> band 3)."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_segment_shift

    rows = [
        (1, dt.datetime(2024, 1, 5), 1, "purchase", 1000.0, "{}"),
        (2, dt.datetime(2024, 1, 20), 2, "purchase", 2500.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_segment_shift(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [(0, 3, 1, 1000000), (1, 0, 1, 1000000)]


def test_events_prcurve_closed_form(spark):
    """Same 4 users as the AUC test (converters 300, 100; views 200,
    100). Descending thresholds: s=300 (cum 1/1): term=(1*1e6)//2=
    500000, f1=(2e6)//3=666666; s=200 (cum 1/2): term 0, f1=(2e6)//4=
    500000; s=100 (cum 2/4): term=(2e6)//8=250000, f1=(4e6)//6=666666.
    AP=750000; best F1 666666 ties at 300 and 100 -> highest threshold
    wins (300), where precision=1e6 and recall=500000."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_prcurve

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "purchase", 3.00, "{}"),
        (2, t0, 2, "purchase", 1.00, "{}"),
        (3, t0, 3, "view", 2.00, "{}"),
        (4, t0, 4, "view", 1.00, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_prcurve(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [(2, 2, 3, 750000, 666666, 300, 1000000, 500000)]


def test_events_threshold_closed_form(spark):
    """Scores: +6000, +2000, -12000, -500 cents (sign = label). Grid
    1000/2500/5000/10000/25000 confusion cells hand-derived."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_threshold

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "purchase", 60.00, "{}"),
        (2, t0, 2, "purchase", 20.00, "{}"),
        (3, t0, 3, "view", 120.00, "{}"),
        (4, t0, 4, "view", 5.00, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_threshold(
            spark, _write_events(spark, rows)
        ).collect()
    ]
    assert got == [
        (1000, 2, 1, 0, 1, 750000, 666666, 1000000, 800000),
        (2500, 1, 1, 1, 1, 500000, 500000, 500000, 500000),
        (5000, 1, 1, 1, 1, 500000, 500000, 500000, 500000),
        (10000, 0, 1, 2, 1, 250000, 0, 0, 0),
        (25000, 0, 0, 2, 2, 500000, 0, 0, 0),
    ]


def test_dedup_mutual_best_closed_form(spark):
    """Jaccards: (1,2)=3/4, (1,3)=2/5, (2,3)=2/6. Best partners:
    1->2, 2->1, 3->1 — only (1,2) is reciprocal; doc 3's best is
    taken, so it stays unmatched."""
    from pyjelly_spark.queries import q_dedup_mutual_best

    d = _write_docs(
        spark,
        [
            (1, "a b c d e", "en", "s1", 9),
            (2, "a b c d e f", "en", "s1", 11),
            (3, "a b c d x y", "en", "s1", 11),
        ],
    )
    got = [tuple(r) for r in q_dedup_mutual_best(spark, d).collect()]
    assert got == [(1, 2, 750000)]


def test_events_wau_closed_form(spark):
    """u1 active Jan 1 and Jan 3; u2 active Jan 3 only. Grid = {1st,
    3rd}. DAU: 1, 2. WAU(1st)=1 (only day in window), WAU(3rd)=2 (u1
    counted once despite two active days). MAU same as WAU here."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_wau

    rows = [
        (1, dt.datetime(2024, 1, 1, 8), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 3, 8), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 3, 9), 2, "view", 1.0, "{}"),
    ]
    got = [
        tuple(r)
        for r in q_events_wau(spark, _write_events(spark, rows)).collect()
    ]
    assert got == [
        ("2024-01-01", 1, 1, 1, 1000000, 1000000),
        ("2024-01-03", 2, 2, 2, 1000000, 1000000),
    ]


def test_orders_abc_closed_form(spark):
    """Part revenues 70/15/10/5 cents (parts 1-4, total 100).
    prev_cum: 0, 70, 85, 95. A: prev*5 < 400 -> parts 1,2 (0, 350).
    B: prev*20 < 1900 -> part 3 (1700). C: part 4 (1900 = 1900)."""
    import os
    import tempfile

    from pyjelly_spark.queries import q_orders_abc

    rows = [
        (1, p, 1, 1, 1.0, cents / 100.0, 0.0, 0.0, "N", "O",
         __import__("datetime").datetime(2024, 1, 1))
        for p, cents in [(1, 70), (2, 15), (3, 10), (4, 5)]
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey: long, l_partkey: long, l_suppkey: long, "
        "l_linenumber: int, l_quantity: double, l_extendedprice: double, "
        "l_discount: double, l_tax: double, l_returnflag: string, "
        "l_linestatus: string, l_shipdate: timestamp_ntz",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "lineitem.parquet")
    )
    got = [tuple(r) for r in q_orders_abc(spark, d).collect()]
    assert got == [
        ("A", 2, 85, 850000),
        ("B", 1, 10, 100000),
        ("C", 1, 5, 50000),
    ]


# ---------------------------------------------------------------------------
# TPC-H completion batch (q2 q9 q11 q12 q16 q20 q21)
# ---------------------------------------------------------------------------

_LI_SCHEMA = (
    "l_orderkey: long, l_partkey: long, l_suppkey: long, "
    "l_linenumber: int, l_quantity: double, l_extendedprice: double, "
    "l_discount: double, l_tax: double, l_returnflag: string, "
    "l_linestatus: string, l_shipdate: timestamp_ntz"
)
_PART_SCHEMA = (
    "p_partkey: long, p_name: string, p_brand: string, "
    "p_type: string, p_size: int, p_retailprice: double"
)
_SUPP_SCHEMA = (
    "s_suppkey: long, s_name: string, s_nationkey: int, s_acctbal: double"
)
_NATION_SCHEMA = "n_nationkey: int, n_name: string, n_regionkey: int"
_REGION_SCHEMA = "r_regionkey: int, r_name: string"
_ORD_SCHEMA = (
    "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
    "o_totalprice: double, o_orderdate: timestamp_ntz, "
    "o_orderpriority: string"
)


def _li(ok, pk, sk, qty, price, disc=0.0, flag="N", ship=None):
    import datetime as dt

    return (
        ok, pk, sk, 1, float(qty), float(price), disc, 0.0, flag, "O",
        ship or dt.datetime(1996, 6, 1),
    )


def test_tpch_q2_closed_form(spark):
    """p1 (size 15): EU suppliers s1 at derived cost 250 (min of 250,
    300) and s2 at 300; s3 is cheaper but non-EU -> ignored; p2 has the
    wrong size. Expect exactly s1's row with cost 250."""
    from pyjelly_spark.queries import q_tpch_q2

    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "a", "Brand#11", "SMALL", 15, 1.0),
                 (2, "b", "Brand#11", "SMALL", 10, 1.0)],
                _PART_SCHEMA,
            ),
            "supplier": (
                [(1, "S1", 0, 7.5), (2, "S2", 0, 9.0), (3, "S3", 1, 1.0)],
                _SUPP_SCHEMA,
            ),
            "nation": (
                [(0, "NATION_0", 0), (1, "NATION_1", 1)], _NATION_SCHEMA
            ),
            "region": ([(0, "EUROPE"), (1, "ASIA")], _REGION_SCHEMA),
            "lineitem": (
                [
                    _li(1, 1, 1, 2, 5.00),   # s1-p1 unit 500//2 = 250
                    _li(2, 1, 1, 1, 3.00),   # s1-p1 unit 300 (not the min)
                    _li(3, 1, 2, 1, 3.00),   # s2-p1 unit 300
                    _li(4, 1, 3, 1, 1.00),   # s3 non-EU unit 100
                    _li(5, 2, 1, 1, 1.00),   # wrong part size
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q2(spark, d).collect()]
    assert got == [(7.5, "S1", "NATION_0", 1, "SMALL", 250)]


def test_tpch_q9_closed_form(spark):
    """Red part p1 via s1 (nation 0): lines (qty 1, 10.00, no disc) and
    (qty 2, 30.01, 50% disc) -> cost_c = min(1000, 1500) = 1000;
    profit4 = (100000 - 100000) + (150050 - 200000) = -49950 ->
    trunc(-499.50) = -499 cents (truncate-toward-zero parity on a
    NEGATIVE non-divisible profit; duckdb // truncates like Spark
    div). Non-red p2 is excluded."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q9

    t = dt.datetime(1997, 3, 1)
    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "red widget", "Brand#11", "SMALL", 1, 1.0),
                 (2, "blue bolt", "Brand#11", "SMALL", 1, 1.0)],
                _PART_SCHEMA,
            ),
            "supplier": ([(1, "S1", 0, 1.0)], _SUPP_SCHEMA),
            "nation": ([(0, "NATION_0", 0)], _NATION_SCHEMA),
            "orders": (
                [(1, 1, "O", 1.0, t, "5-LOW")], _ORD_SCHEMA
            ),
            "lineitem": (
                [
                    _li(1, 1, 1, 1, 10.00, ship=t),
                    _li(1, 1, 1, 2, 30.01, disc=0.5, ship=t),
                    _li(1, 2, 1, 1, 99.00, ship=t),
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q9(spark, d).collect()]
    assert got == [("NATION_0", 1997, -49950.0, -499)]


def test_tpch_q11_closed_form(spark):
    """ASIA pairs: s1-p1 value 10*10=100, s1-p2 value 10, s2-p3 value
    10; s3-p1 (non-ASIA) huge but excluded. total=120, n_parts=3:
    only p1 passes 100*3 > 2*120."""
    from pyjelly_spark.queries import q_tpch_q11

    d = _write_tpch(
        spark,
        {
            "supplier": (
                [(1, "S1", 0, 1.0), (2, "S2", 0, 1.0), (3, "S3", 1, 1.0)],
                _SUPP_SCHEMA,
            ),
            "nation": (
                [(0, "NATION_0", 0), (1, "NATION_1", 1)], _NATION_SCHEMA
            ),
            "region": ([(0, "ASIA"), (1, "EUROPE")], _REGION_SCHEMA),
            "lineitem": (
                [
                    _li(1, 1, 1, 10, 1.00),    # cost 100//10=10, qty 10
                    _li(2, 2, 1, 10, 0.10),    # cost 1, qty 10
                    _li(3, 3, 2, 5, 0.10),     # cost 2, qty 5
                    _li(4, 1, 3, 100, 100.0),  # non-ASIA, excluded
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q11(spark, d).collect()]
    assert got == [(1, 100)]


def test_tpch_q12_closed_form(spark):
    """1997 shipments >90 days after order date: one on an URGENT order
    (high), one on a LOW order (low); an on-time line and a 1996 line
    are excluded."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q12

    od = dt.datetime(1997, 1, 1)
    late = dt.datetime(1997, 6, 1)
    ontime = dt.datetime(1997, 2, 1)
    d = _write_tpch(
        spark,
        {
            "orders": (
                [(1, 1, "O", 1.0, od, "1-URGENT"),
                 (2, 1, "O", 1.0, od, "5-LOW"),
                 (3, 1, "O", 1.0, dt.datetime(1996, 1, 1), "5-LOW")],
                _ORD_SCHEMA,
            ),
            "lineitem": (
                [
                    _li(1, 1, 1, 1, 1.0, flag="A", ship=late),
                    _li(2, 1, 1, 1, 1.0, flag="A", ship=late),
                    _li(1, 1, 1, 1, 1.0, flag="A", ship=ontime),
                    _li(3, 1, 1, 1, 1.0, flag="A",
                        ship=dt.datetime(1996, 6, 1)),
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q12(spark, d).collect()]
    assert got == [("A", 1, 1)]


def test_tpch_q16_closed_form(spark):
    """Qualifying part p1 supplied by ok-supplier s1 (twice -> distinct
    1) and negative-balance s2 (excluded); p2/p3/p4 fail the
    brand/type/size predicates."""
    from pyjelly_spark.queries import q_tpch_q16

    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "a", "Brand#11", "STANDARD", 4, 1.0),
                 (2, "b", "Brand#21", "STANDARD", 4, 1.0),
                 (3, "c", "Brand#11", "PROMO", 4, 1.0),
                 (4, "d", "Brand#11", "STANDARD", 5, 1.0)],
                _PART_SCHEMA,
            ),
            "supplier": (
                [(1, "S1", 0, 5.0), (2, "S2", 0, -1.0)], _SUPP_SCHEMA
            ),
            "lineitem": (
                [
                    _li(1, 1, 1, 1, 1.0),
                    _li(2, 1, 1, 1, 1.0),
                    _li(3, 1, 2, 1, 1.0),
                    _li(4, 2, 1, 1, 1.0),
                    _li(5, 3, 1, 1, 1.0),
                    _li(6, 4, 1, 1, 1.0),
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q16(spark, d).collect()]
    assert got == [("Brand#11", "STANDARD", 4, 1)]


def test_tpch_q20_closed_form(spark):
    """s1 shipped red-part qty 6 in 1997 vs 10 total (12 > 10 passes);
    s2 shipped 4 of 10 (fails); s3 is in the wrong nation; s1's non-red
    volume is ignored."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q20

    y97 = dt.datetime(1997, 6, 1)
    y96 = dt.datetime(1996, 6, 1)
    d = _write_tpch(
        spark,
        {
            "part": (
                [(1, "red widget", "Brand#11", "SMALL", 1, 1.0),
                 (2, "blue bolt", "Brand#11", "SMALL", 1, 1.0)],
                _PART_SCHEMA,
            ),
            "supplier": (
                [(1, "S1", 3, 1.0), (2, "S2", 3, 1.0), (3, "S3", 0, 1.0)],
                _SUPP_SCHEMA,
            ),
            "nation": (
                [(3, "NATION_3", 0), (0, "NATION_0", 0)], _NATION_SCHEMA
            ),
            "lineitem": (
                [
                    _li(1, 1, 1, 6, 1.0, ship=y97),
                    _li(2, 1, 1, 4, 1.0, ship=y96),
                    _li(3, 1, 2, 4, 1.0, ship=y97),
                    _li(4, 1, 2, 6, 1.0, ship=y96),
                    _li(5, 1, 3, 10, 1.0, ship=y97),
                    _li(6, 2, 1, 100, 1.0, ship=y96),
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q20(spark, d).collect()]
    assert got == [("S1", "NATION_3")]


def test_tpch_q21_closed_form(spark):
    """o1: s1 late, s2 on time -> s1 waits. o2: both late -> nobody.
    o3: s1 alone -> no second supplier. o4: status O -> excluded.
    All suppliers in AMERICA."""
    import datetime as dt

    from pyjelly_spark.queries import q_tpch_q21

    od = dt.datetime(1996, 1, 1)
    late = dt.datetime(1996, 6, 1)
    ontime = dt.datetime(1996, 2, 1)
    d = _write_tpch(
        spark,
        {
            "supplier": (
                [(1, "S1", 0, 1.0), (2, "S2", 0, 1.0)], _SUPP_SCHEMA
            ),
            "nation": ([(0, "NATION_0", 0)], _NATION_SCHEMA),
            "region": ([(0, "AMERICA")], _REGION_SCHEMA),
            "orders": (
                [(1, 1, "F", 1.0, od, "5-LOW"),
                 (2, 1, "F", 1.0, od, "5-LOW"),
                 (3, 1, "F", 1.0, od, "5-LOW"),
                 (4, 1, "O", 1.0, od, "5-LOW")],
                _ORD_SCHEMA,
            ),
            "lineitem": (
                [
                    _li(1, 1, 1, 1, 1.0, ship=late),
                    _li(1, 1, 2, 1, 1.0, ship=ontime),
                    _li(2, 1, 1, 1, 1.0, ship=late),
                    _li(2, 1, 2, 1, 1.0, ship=late),
                    _li(3, 1, 1, 1, 1.0, ship=late),
                    _li(4, 1, 1, 1, 1.0, ship=late),
                    _li(4, 1, 2, 1, 1.0, ship=ontime),
                ],
                _LI_SCHEMA,
            ),
        },
    )
    got = [tuple(r) for r in q_tpch_q21(spark, d).collect()]
    assert got == [("S1", 1)]


def test_doc_top_terms_closed_form(spark):
    """doc1 'apple apple banana common': apple 2/1 -> 2000000, banana
    1/1 -> 1000000, common 1/2 -> 500000; doc2 has only 2 terms."""
    import os
    import tempfile

    from pyjelly_spark.queries import q_doc_top_terms

    df = spark.createDataFrame(
        [(1, "Apple apple  banana common", "en", "s", 26),
         (2, "common cherry", "en", "s", 13)],
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in
           q_doc_top_terms(spark, d).orderBy("doc_id", "rank").collect()]
    assert got == [
        (1, "apple", 2, 1, 2000000, 1),
        (1, "banana", 1, 1, 1000000, 2),
        (1, "common", 1, 2, 500000, 3),
        (2, "cherry", 1, 1, 1000000, 1),
        (2, "common", 1, 2, 500000, 2),
    ]


def test_events_calibration_closed_form(spark):
    """5 (user, day) units with distinct scores 10..50 and labels
    1,0,1,0,1 -> percentiles 0/200k/400k/600k/800k ppm, bins
    0/2/4/6/8, exact Brier per bin."""
    import datetime as dt
    import os
    import tempfile

    from pyjelly_spark.queries import q_events_calibration

    rows, eid = [], 0
    for u, (score, label) in enumerate(
        [(10, 1), (20, 0), (30, 1), (40, 0), (50, 1)]
    ):
        ts = dt.datetime(2024, 1, 1 + u, 12, 0, 0)
        rows.append((eid, ts, u, "click", score / 100.0, "{}")); eid += 1
        if label:
            rows.append((eid, ts, u, "purchase", 99.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = [tuple(r) for r in q_events_calibration(spark, d).collect()]
    assert got == [
        (0, 1, 1, 0, 1000000, 1000000),
        (2, 1, 0, 200000, 0, 40000),
        (4, 1, 1, 400000, 1000000, 360000),
        (6, 1, 0, 600000, 0, 360000),
        (8, 1, 1, 800000, 1000000, 40000),
    ]


def test_events_itemcf_closed_form(spark):
    """u1,u2 share {1,2}; u3 has {1,3}: co(1,2)=2, co(1,3)=1;
    n1=3, n2=2, n3=1 -> cos2(1,2)=666666 ppm, cos2(1,3)=333333."""
    import datetime as dt
    import os
    import tempfile

    from pyjelly_spark.queries import q_events_itemcf

    t = dt.datetime(2024, 1, 1)
    rows = []
    for eid, (u, k) in enumerate(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (3, 3)]
    ):
        rows.append((eid, t, u, "click", 1.0, '{"k": %d}' % k))
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = [tuple(r) for r in
           q_events_itemcf(spark, d).orderBy("item", "rank").collect()]
    assert got == [
        (1, 2, 2, 3, 2, 666666, 1),
        (1, 3, 1, 3, 1, 333333, 2),
        (2, 1, 2, 2, 3, 666666, 1),
        (3, 1, 1, 1, 3, 333333, 1),
    ]


def _write_emb(spark, rows):
    import os
    import tempfile

    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def test_embedding_gram_closed_form(spark):
    """[0.5,-0.25],[0.1,0.2] scale to [5000,-2500],[1000,2000]:
    G = [[26e6, -10.5e6], [., 10.25e6]] upper triangle."""
    from pyjelly_spark.queries import q_embedding_gram

    d = _write_emb(spark, [(1, [0.5, -0.25], 0), (2, [0.1, 0.2], 0)])
    got = [tuple(r) for r in q_embedding_gram(spark, d).collect()]
    assert got == [
        (1, 1, 26_000_000),
        (1, 2, -10_500_000),
        (2, 2, 10_250_000),
    ]


def test_embedding_gram_partition_invariant(spark):
    """The partial-Gram reduce is partitioning-independent: 1 vs 8
    partitions give identical triangles."""
    from pyjelly_spark.operators.similarity import gram_matrix

    rows = [
        (i, [((i * 7 + j * 3) % 11 - 5) / 10.0 for j in range(4)], 0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )
    one = [tuple(r) for r in gram_matrix(df.coalesce(1)).collect()]
    many = [tuple(r) for r in gram_matrix(df.repartition(8)).collect()]
    assert one == many and len(one) == 10


def test_embedding_centroids_closed_form(spark):
    from pyjelly_spark.queries import q_embedding_centroids

    d = _write_emb(
        spark,
        [(1, [0.5, -0.25], 0), (2, [0.1, 0.2], 0), (3, [1.0, 0.0], 1)],
    )
    got = {
        (r.label, r.dim): (r.n, r.sum_x, r.mean_x4)
        for r in q_embedding_centroids(spark, d).collect()
    }
    assert got == {
        (0, 1): (2, 6000, 30_000_000),
        (0, 2): (2, -500, -2_500_000),
        (1, 1): (1, 10000, 100_000_000),
        (1, 2): (1, 0, 0),
    }


def test_embedding_anova_closed_form(spark):
    """Dyadic (float32-exact) classes at x=[2500,2500] and
    [7500,7500] scaled units: per-class dnum = |s*nt - st*n| = 20000,
    ssb_term = 20000^2 div (2*16) = 12.5e6 each -> SSB 25e6, SSW 0,
    F ratio = 25e6 * 1e6 div max(0,1) = 2.5e13 ppm."""
    from pyjelly_spark.queries import q_embedding_anova

    d = _write_emb(
        spark,
        [(1, [0.25], 0), (2, [0.25], 0),
         (3, [0.75], 1), (4, [0.75], 1)],
    )
    got = [tuple(r) for r in q_embedding_anova(spark, d).collect()]
    assert got == [(1, 4, 25_000_000, 0, 25_000_000_000_000)]


def test_events_streak_closed_form(spark):
    """User 1: Jan 1-3 then Jan 5 -> best streak 3; user 2: one day."""
    import datetime as dt
    import os
    import tempfile

    from pyjelly_spark.queries import q_events_streak

    rows = []
    for eid, (u, day) in enumerate([(1, 1), (1, 2), (1, 3), (1, 5), (2, 1)]):
        rows.append(
            (eid, dt.datetime(2024, 1, day, 9, 0), u, "click", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = [tuple(r) for r in q_events_streak(spark, d).collect()]
    assert got == [(1, 1), (3, 1)]


def test_embedding_ncc_closed_form(spark):
    """Class 0 at x=0, class 1 at x=10 (scaled units): every vector
    predicts its own class exactly."""
    from pyjelly_spark.queries import q_embedding_ncc

    d = _write_emb(
        spark,
        [(1, [0.0], 0), (2, [0.0], 0), (3, [0.001], 1), (4, [0.001], 1)],
    )
    got = [tuple(r) for r in q_embedding_ncc(spark, d).collect()]
    assert got == [(0, 0, 2), (1, 1, 2)]


def test_embedding_ncc_tie_breaks_low_label(spark):
    """Probe at x=5000 (v=0.5, exact dyadic) is equidistant from the
    class-0 centroid (x=0) and class-1 centroid (x=10000), and far from
    its own class-2 centroid ({0.5, 9.5} -> 50000): exact tie between
    0 and 1 must take the LOWER label 0."""
    from pyjelly_spark.queries import q_embedding_ncc

    d = _write_emb(
        spark,
        [(1, [0.0], 0), (2, [1.0], 1), (3, [0.5], 2), (4, [9.5], 2)],
    )
    got = {
        (r.true_label, r.predicted_label): r.n
        for r in q_embedding_ncc(spark, d).collect()
    }
    # probe v=0.5: D0 = 5000^2, D1 = 5000^2 (tie -> 0), D2/n^2 = 2.025e9
    # v=9.5: D2/4 = 2.025e9 beats D0 = 9.025e9 and D1 = 7.225e9 -> 2
    assert got == {(0, 0): 1, (1, 1): 1, (2, 0): 1, (2, 2): 1}


def test_embedding_ncc_matches_bruteforce(spark):
    """40 deterministic 4-dim vectors, 3 classes: the distributed
    argmin equals a python brute-force over exact rationals."""
    from fractions import Fraction

    from pyjelly_spark.queries import q_embedding_ncc

    rows = [
        (i, [((i * 13 + j * 5) % 17 - 8) / 1000.0 for j in range(4)], i % 3)
        for i in range(40)
    ]
    d = _write_emb(spark, rows)
    got = {
        (r.true_label, r.predicted_label): r.n
        for r in q_embedding_ncc(spark, d).collect()
    }
    import numpy as np

    x = np.floor(
        np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
        * 10000
    ).astype(int)
    labels = np.array([r[2] for r in rows])
    want: dict = {}
    classes = sorted(set(labels))
    stats = {
        c: (int((labels == c).sum()), x[labels == c].sum(axis=0))
        for c in classes
    }
    for vi in range(len(rows)):
        best, best_d = None, None
        for c in classes:
            n_c, s_c = stats[c]
            d2 = Fraction(
                int(((x[vi] * n_c - s_c) ** 2).sum()), n_c * n_c
            )
            if best is None or d2 < best_d:
                best, best_d = c, d2
        key = (labels[vi], best)
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_events_new_returning_closed_form(spark):
    import datetime as dt
    import os
    import tempfile

    from pyjelly_spark.queries import q_events_new_returning

    rows = []
    for eid, (u, day) in enumerate([(1, 1), (1, 2), (2, 2)]):
        rows.append(
            (eid, dt.datetime(2024, 1, day, 9, 0), u, "click", 1.0, "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = [tuple(r) for r in q_events_new_returning(spark, d).collect()]
    assert got == [
        ("2024-01-01", 1, 1, 0, 1),
        ("2024-01-02", 2, 1, 1, 2),
    ]


def test_hll_matches_python_reference(spark):
    """hll_distinct register matrix + integer estimate == a pure-Python
    HLL over the same sha-60 hashes (dups must not move anything)."""
    from pyjelly_spark.operators.sketches import hll_distinct

    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(60)]
    rows += [("a", 3)] * 7 + [("b", 59)] * 3
    df = spark.createDataFrame(rows, "grp: string, key: long")
    got = {r["grp"]: r for r in hll_distinct(df, "grp", "key", m=256).collect()}
    for grp, n in [("a", 500), ("b", 60)]:
        regs: dict[int, int] = {}
        for i in range(n):
            h = _sha60(i)
            w = h >> 8
            rho = 53 - w.bit_length() if w else 53
            regs[h % 256] = max(regs.get(h % 256, 0), rho)
        s = sum(1 << (53 - mr) for mr in regs.values())
        s += (256 - len(regs)) * (1 << 53)
        est = (718272 * 256 * 256 * (1 << 53)) // (s * 1_000_000)
        r = got[grp]
        assert r["registers_used"] == len(regs)
        assert r["zero_regs"] == 256 - len(regs)
        assert r["est_distinct"] == est
        assert r["exact_n"] == n
        assert r["err_ppm"] == abs(est - n) * 1_000_000 // n


def test_hll_merge_invariance(spark):
    """Partitioning must not change the sketch: 1-partition and
    32-partition runs produce identical rows (register max is a
    commutative monoid — the 100 TB mergeability property)."""
    from pyjelly_spark.operators.sketches import hll_distinct

    rows = [("g", i * 31) for i in range(1000)]
    df1 = spark.createDataFrame(rows, "grp: string, key: long").coalesce(1)
    df32 = spark.createDataFrame(rows, "grp: string, key: long").repartition(32)
    a = hll_distinct(df1, "grp", "key").collect()[0].asDict()
    b = hll_distinct(df32, "grp", "key").collect()[0].asDict()
    assert a == b


@pytest.mark.parametrize("w", [4, 5, 7])
def test_winnow_matches_python_reference(spark, w):
    """winnow_fingerprints == a direct pure-Python winnowing (explicit
    rightmost-min scan) incl. a doc with repeated shingles (hash ties
    inside one window) and a short doc narrower than the window.
    w > 4 locks the struct-min tie-break (the retired h*4+(w-1-o)
    arithmetic encoding silently corrupted selections for w >= 5)."""
    from pyjelly_spark.functions.text import winnow_fingerprints

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        # repeated 5-gram "a b c d e" -> identical hashes in-window
        2: "a b c d e a b c d e a b c d e",
        3: "tiny doc here",          # < 5 words -> no grams
        4: "one two three four five six",  # 2 grams, window narrows
        5: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: r for r in winnow_fingerprints(df, k=5, w=w).collect()}

    for doc_id, text in texts.items():
        words = [x for x in text.lower().split() if x]
        grams = [
            _sha60(" ".join(words[i : i + 5]))
            for i in range(max(len(words) - 4, 0))
        ]
        ww = min(w, len(grams))
        sel = set()
        for p in range(len(grams) - ww + 1 if grams else 0):
            window = grams[p : p + ww]
            m = min(window)
            j = max(i for i, h in enumerate(window) if h == m)
            sel.add(p + j)
        r = got[doc_id]
        assert r["n_grams"] == len(grams)
        assert r["n_fp"] == len(sel)
        assert r["fp_chk"] == sum(grams[j] % 1000000007 for j in sel)


def test_winnow_coverage_guarantee(spark):
    """Any shared run of >= w + k - 1 = 8 words must share >= 1
    fingerprint (the winnowing theorem) — two docs embedding the same
    8-word phrase at different offsets."""
    from pyjelly_spark.functions.text import winnow_fingerprints

    phrase = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [
            (1, "x y z " + phrase + " p q"),
            (2, phrase + " completely different tail words here"),
        ],
        "doc_id: long, text: string",
    )
    out = winnow_fingerprints(df, k=5, w=4).collect()
    assert all(r["n_fp"] >= 1 for r in out)
    # recompute the actual selected hash sets in python to check overlap
    sets = {}
    for doc_id, text in [(r, t) for r, t in
                         [(1, "x y z " + phrase + " p q"),
                          (2, phrase + " completely different tail words here")]]:
        words = text.lower().split()
        grams = [_sha60(" ".join(words[i:i + 5])) for i in range(len(words) - 4)]
        sel = set()
        for p in range(len(grams) - 3):
            window = grams[p:p + 4]
            m = min(window)
            j = max(i for i, h in enumerate(window) if h == m)
            sel.add(grams[p + j])
        sets[doc_id] = sel
    assert sets[1] & sets[2], "shared 8-word run must share a fingerprint"


def test_ols_exact_cramer(spark):
    """ols_fit_2feature == exact integer Cramer in Python, and within
    1e-3 of numpy lstsq on the same data (sanity that the closed form
    is actually OLS)."""
    import numpy as np

    from pyjelly_spark.operators.regression import ols_fit_2feature

    rng = [(i, (i * 7) % 13, (i * 3) % 5) for i in range(1, 200)]
    rows = [(x1, x2, 10 + 3 * x1 - 2 * x2 + ((x1 * x2) % 7)) for _, x1, x2 in
            [(i, a, b) for i, a, b in rng]]
    df = spark.createDataFrame(rows, "x1: long, x2: long, y: long")
    got = ols_fit_2feature(df, "x1", "x2", "y").collect()[0]

    n = len(rows)
    s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows); s12 = sum(r[0] * r[1] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows); s2y = sum(r[1] * r[2] for r in rows)
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) \
        + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) \
        + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) \
        + sy * (s1 * s12 - s11 * s2)

    def tdiv(a, b):  # truncation like Spark div
        q = abs(a) * 1_000_000 // abs(b)
        return q if (a < 0) == (b < 0) else -q

    assert got["n"] == n
    assert got["beta0_x1e6"] == tdiv(det0, det)
    assert got["beta1_x1e6"] == tdiv(det1, det)
    assert got["beta2_x1e6"] == tdiv(det2, det)

    assert got["singular"] is False

    X = np.array([[1, r[0], r[1]] for r in rows], dtype=float)
    Y = np.array([r[2] for r in rows], dtype=float)
    beta = np.linalg.lstsq(X, Y, rcond=None)[0]
    for b_np, b_got in zip(beta, [got["beta0_x1e6"], got["beta1_x1e6"],
                                  got["beta2_x1e6"]]):
        assert abs(b_np - b_got / 1e6) < 1e-3


def test_ols_singular_flagged(spark):
    """Collinear features (x2 = 2*x1) zero the normal-equation
    determinant: the betas come back NULL (Spark's non-ANSI decimal
    division) and the singular flag says so explicitly."""
    from pyjelly_spark.operators.regression import ols_fit_2feature

    rows = [(i, 2 * i, 3 * i + 1) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "x1: long, x2: long, y: long")
    got = ols_fit_2feature(df, "x1", "x2", "y").collect()[0]
    assert got["singular"] is True
    assert got["beta0_x1e6"] is None
    assert got["beta1_x1e6"] is None
    assert got["beta2_x1e6"] is None


def test_jl_distortion_concentrates(spark):
    """JL audit sanity: on the real embeddings the median pair
    distortion ratio must sit near 1e6 (E[d_proj^2] = k*d_orig^2 for
    +-1 projections) and every ratio must be positive."""
    from pyjelly_spark.queries import QUERIES

    rows = QUERIES["embedding_jl"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 499
    ratios = sorted(r["ratio_ppm"] for r in rows)
    med = ratios[len(ratios) // 2]
    assert 400_000 < med < 2_500_000, med
    assert all(r > 0 for r in ratios)


def test_rake_textbook_example(spark):
    """RAKE on a tiny doc with known word stats: phrases
    'quick brown fox jumps', 'lazy dog' from
    'the quick brown fox jumps of the lazy dog'; every word has
    freq 1 so scores are phrase-length sums * 1e6."""
    from pyjelly_spark.queries import QUERIES

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps of the lazy dog", "en", "s", 41),
         (2, "alpha beta to alpha beta to alpha", "en", "s", 33)],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r for r in QUERIES["doc_rake"](spark, d).collect()}
    # doc 1: phrase1 len 4, each word deg 4 freq 1 -> 16e6; phrase2 len 2 -> 4e6
    assert got[1]["top_phrase"] == "quick brown fox jumps"
    assert got[1]["score_ppm"] == 16_000_000
    assert got[1]["n_phrases"] == 2
    # doc 2: phrases 'alpha beta','alpha beta','alpha';
    # alpha: freq 3, degree 2+2+1=5 -> 1666666; beta: freq 2, degree 4 -> 2000000
    # 'alpha beta' = 3666666 (x2, tie -> same phrase), 'alpha' = 1666666
    assert got[2]["top_phrase"] == "alpha beta"
    assert got[2]["score_ppm"] == 1_666_666 + 2_000_000
    assert got[2]["n_phrases"] == 3


def test_codeswitch_detects_switches(spark):
    """Hand-built multilingual docs: per-sentence votes, switch count,
    dominant language, distinct languages."""
    import os
    import tempfile

    from pyjelly_spark.queries import QUERIES

    docs = [
        (1, "the cat is in the hat. der hund ist nicht das. "
            "the dog is back again. le chat est la.", "en", "s", 90),
        (2, "el que es y los. las que es y el. el los las que.", "es", "s", 49),
        (3, "no stopwords here whatsoever", "en", "s", 28),
    ]
    df = spark.createDataFrame(
        docs, "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r for r in
           QUERIES["doc_codeswitch"](spark, d).collect()}
    # doc 1: en, de, en, fr -> 3 switches, dominant en, 3 langs
    assert got[1]["n_sentences"] == 4
    assert got[1]["n_switches"] == 3
    assert got[1]["dominant_lang"] == "en"
    assert got[1]["n_langs"] == 3
    # doc 2: all es
    assert got[2]["n_switches"] == 0
    assert got[2]["dominant_lang"] == "es"
    assert got[2]["n_langs"] == 1
    # doc 3: zero votes everywhere -> priority tie-break to en
    assert got[3]["dominant_lang"] == "en"


def test_minhash_generator_borderline_window(spark):
    """Executes the band-math justification behind the dedup_minhash
    equality gate (VERDICT/ADVICE standing item): on the generator's
    documents table the borderline-recall window must be EMPTY — every
    true pair's jaccard sits >= 0.8, where the 16-band x 2-row miss
    bound is (1-0.8^2)^16 ~ 8.5e-8 — and the deterministic LSH output
    must equal the exact-Jaccard oracle exactly (precision AND recall
    1.0). If the generator ever grows borderline pairs, this fails
    before the driver gate does."""
    import os

    from pyjelly_spark.operators.dedup import minhash_pairs, ngram_jaccard_pairs

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf):
        pytest.skip("testdata missing")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert exact, "generator produced no true near-dup pairs"
    min_j = min(exact.values())
    assert min_j >= 0.8, (
        f"borderline window NOT empty: min true-pair jaccard {min_j}"
    )
    lsh = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_pairs(docs, threshold=0.3).collect()
    }
    assert lsh == exact  # precision == recall == 1.0


def test_row_topk_asc_matches_stable_argsort():
    """_row_topk_asc (argpartition + boundary-tie repair) is exactly
    the stable-argsort prefix — including heavy integer ties, where
    argpartition alone would split equal values arbitrarily across the
    k boundary."""
    import numpy as np

    from pyjelly_spark.operators.similarity import _row_topk_asc

    rng = np.random.RandomState(7)
    for rows, n in [(1, 1), (3, 5), (8, 64), (5, 200)]:
        for k in {1, 2, n // 2, n - 1, n, n + 3}:
            if k < 1:
                continue
            # small value range -> many exact ties
            vals = rng.randint(0, 4, size=(rows, n)).astype(np.int64)
            want = np.argsort(vals, axis=1, kind="stable")[:, :k]
            got = _row_topk_asc(vals, k)
            assert np.array_equal(got, want), (rows, n, k)
            # float path (negated scores) with planted exact ties
            fv = rng.randint(0, 3, size=(rows, n)) / 2.0
            want_f = np.argsort(fv, axis=1, kind="stable")[:, :k]
            assert np.array_equal(_row_topk_asc(fv, k), want_f)


def test_row_topk_asc_nan_rows_match_stable_argsort():
    """Rows containing NaN (0/0 cosine from zero-norm vectors) take the
    full stable-argsort fallback: NaN != NaN zeroes both boundary-tie
    counts, so without the explicit isnan trigger the fast path could
    return an arbitrary subset/order of the NaN columns."""
    import numpy as np

    from pyjelly_spark.operators.similarity import _row_topk_asc

    rng = np.random.RandomState(11)
    for rows, n in [(4, 8), (6, 40)]:
        for k in (1, 3, n - 1):
            vals = rng.randint(0, 4, size=(rows, n)) / 2.0
            # plant NaN in half the rows, several per row (incl. a row
            # where the k-boundary itself is NaN: all-NaN row)
            for r in range(0, rows, 2):
                vals[r, rng.choice(n, size=max(2, n - k), replace=False)] = np.nan
            vals[0, :] = np.nan
            want = np.argsort(vals, axis=1, kind="stable")[:, :k]
            got = _row_topk_asc(vals, k)
            assert np.array_equal(got, want), (rows, n, k)
