"""Text-analysis functions for the training-data pipeline.

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting over the ``documents`` table — all pure
Catalyst column expressions (``pyspark.sql.functions``): whole-stage
codegen, no Python in the hot path, filters/projections push down to the
parquet scan. At 100 TB these are embarrassingly parallel narrow maps.

No counterpart in the reference (pyjelly is a serialization engine,
SURVEY.md §2.7) — these are the training-data operators mandated by the
driver brief.

Every regex here is valid in both Java regex (Spark) and RE2 (DuckDB), so
the DuckDB oracles in ``pyjelly_spark.queries`` can interpolate the same
pattern strings verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared regexes (Java + RE2 compatible) --------------------------------
WS_RE = r"\s+"
PUNCT_RE = r"[.,;:!?]"
# BPE-ish pre-tokenizer: letter runs, single digits, single other glyphs
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# language -> stopword alternation (word-bounded). Deterministic tie-break:
# first language in this list wins (argmax via structured max).
LANG_STOPWORDS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to|a|in|is)\b"),
    ("de", r"\b(der|die|und|das|ist|nicht)\b"),
    ("fr", r"\b(le|la|et|les|des|est)\b"),
    ("es", r"\b(el|los|las|que|es|y)\b"),
    ("zh", r"[\x{4e00}-\x{9fff}]"),
]
# RE2 (DuckDB) spells the CJK class differently than Java:
LANG_STOPWORDS_RE2: list[tuple[str, str]] = [
    (lang, pat if lang != "zh" else r"[\p{Han}]") for lang, pat in LANG_STOPWORDS
]

ALL_STOPWORDS_RE = r"\b(the|and|of|to|a|in|is|der|die|und|le|la|et|el|los|que)\b"


def words(text: Column) -> Column:
    """Whitespace tokenization: collapse runs, trim, split."""
    return F.split(F.trim(F.regexp_replace(text, WS_RE, " ")), " ")


def predict_language(text: Column) -> Column:
    """Stopword-count argmax over the per-language alternations.

    Implemented as ``greatest`` over (count, -priority, lang) structs so the
    tie-break is deterministic and identical to the SQL oracle's.
    """
    candidates = [
        F.struct(
            F.regexp_count(text, F.lit(pat)).alias("n"),
            F.lit(-rank).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for rank, (lang, pat) in enumerate(LANG_STOPWORDS)
    ]
    return F.greatest(*candidates).getField("lang")


def language_id(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, lang, predicted_lang, is_correct)."""
    return docs.select(
        "doc_id",
        "lang",
        predict_language(F.col("text")).alias("predicted_lang"),
    ).withColumn(
        "is_correct", (F.col("lang") == F.col("predicted_lang")).cast("int")
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics -> one quality score.

    All-double arithmetic with an identical operation order to the oracle
    SQL, so results are bit-identical (IEEE determinism), then rounded for
    display stability.
    """
    text = F.col("text")
    n_chars = F.length(text).cast("double")
    n_words = F.size(words(text)).cast("double")
    n_punct = F.regexp_count(text, F.lit(PUNCT_RE)).cast("double")
    n_stop = F.regexp_count(text, F.lit(ALL_STOPWORDS_RE)).cast("double")
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_words
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.3)
        + stop_ratio * F.lit(0.3)
    )
    # floor-scaling, not round(): rounding-mode-proof across engines
    def r4(c):
        return F.floor(c * 10000) / 10000

    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        r4(punct_ratio).alias("punct_ratio"),
        r4(stop_ratio).alias("stop_ratio"),
        r4(score).alias("quality_score"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish pre-tokenizer count per document."""
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.size(words(text)).cast("long").alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe_tokens"),
    )


def normalized(text: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(text, WS_RE, " ")))


def hex_hash(col: Column, mod: int | None = None) -> Column:
    """Portable 60-bit content hash: first 15 hex chars of sha256 as bigint.

    Same value is computable in any engine with sha256 + hex parsing
    (DuckDB: ``('0x' || substring(sha256(x),1,15))::BIGINT``), unlike
    xxhash64/murmur which are engine-specific. Used everywhere a hash must
    agree with the oracle.
    """
    h = F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")
    if mod is not None:
        return F.pmod(h, F.lit(mod))
    return h


def fingerprints(docs: DataFrame) -> DataFrame:
    """Normalized-content fingerprint + a 60-bit hash and shard bucket.

    The sha256 of whitespace-normalized lowercase text is the exact-dup
    fingerprint; the bucket supports sharded dedup joins at scale.
    """
    norm = normalized(F.col("text"))
    return docs.select(
        "doc_id",
        F.sha2(norm, 256).alias("fingerprint"),
        hex_hash(norm).alias("fp_hash"),
        hex_hash(norm, mod=1024).alias("fp_bucket"),
    )


def train_val_split(docs: DataFrame, val_pct: int = 10) -> Column | DataFrame:
    """Deterministic content-hash train/val assignment.

    The training-data op that makes split membership reproducible across
    runs, engines, and cluster sizes: membership is a pure function of
    normalized content (no RNG, no per-partition state), so re-sharding
    or re-running never moves a document across the split — and the
    assignment is exactly computable by any engine with sha256
    (oracle-gated via hex_hash).
    """
    h = hex_hash(normalized(F.col("text")), mod=100)
    return docs.select(
        "doc_id",
        "lang",
        F.when(h < F.lit(100 - val_pct), F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
        F.length("text").cast("long").alias("n_chars"),
    )


def term_stats(docs: DataFrame) -> DataFrame:
    """Corpus vocabulary statistics: per (lang, term) document frequency
    and total occurrence count — the integer core of TF-IDF/vocab-pruning
    style LM-data analyses (integer-only on purpose: exactly portable
    across engines, unlike log-weighted scores).

    One explode + one groupBy: at corpus scale the shuffle carries one
    row per (doc, term) occurrence, aggregated map-side first.
    """
    w = docs.select(
        "doc_id",
        "lang",
        F.explode(words(normalized(F.col("text")))).alias("term"),
    ).where(F.col("term") != "")
    return w.groupBy("lang", "term").agg(
        F.count_distinct(F.col("doc_id")).alias("doc_freq"),
        F.count(F.lit(1)).alias("total_count"),
    )
