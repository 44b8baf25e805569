"""Tokenizer-vocabulary training operators (BPE) for the training-data
pipeline.

Byte-pair-encoding training is the canonical "build a tokenizer from the
corpus" job a 100 TB text pipeline runs before anything else. The
distributed shape exploits BPE's key property: merge statistics depend
only on the *distinct-word frequency table*, not on the corpus itself —
so one corpus-sized aggregation compresses 100 TB of text into a
words×freq table (bounded by vocabulary growth, ~10^7-10^8 rows at web
scale), and every subsequent merge iteration runs on that compressed
table.

- :func:`word_frequencies` — the one corpus-sized pass: pre-tokenize with
  the shared ``BPE_TOKEN_RE`` (identical in Java regex and RE2, so DuckDB
  oracles reuse it) and count words. One shuffle; hot words ("the") are
  absorbed by map-side partial aggregation.
- :func:`bpe_pair_counts` — adjacent-symbol pair statistics weighted by
  word frequency, computed per *distinct word*. One shuffle on the pair
  key (2-symbol strings; again partial-agg absorbs skew).
- :func:`bpe_merge_candidates` — ranked merge table (count desc, pair asc
  — deterministic, oracle-computable).
- :func:`bpe_train` — n merge iterations. Per iteration: aggregate pair
  counts (one job over the compressed word table), pick the argmax on the
  driver (a 1-row collect), and apply the merge to every word's symbol
  array with a pure-Catalyst left fold (``F.aggregate``) — leftmost,
  non-overlapping, exactly the classic greedy BPE merge order. No Python
  in any per-row path.

Scale notes (100 TB): the corpus is touched exactly once; iterations run
over the distinct-word table whose size is corpus-independent past a
point. ``localCheckpoint`` truncates the growing fold lineage every few
merges, keeping job planning O(1) per iteration (the kg connected-
components rounds use the same pattern, operators/components.py).

No counterpart in the reference (pyjelly is a serialization engine) —
part of the training-data operator mandate (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyjelly_spark.functions.text import BPE_TOKEN_RE

#: pair-count rows kept per iteration / in the candidate table
DEFAULT_TOP_PAIRS = 50


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the BPE pre-tokenization of the corpus.

    The single corpus-sized pass of BPE training: everything downstream
    operates on this (much smaller) table.
    """
    return (
        docs.select(
            F.explode(
                # lit() keeps the regex out of SQL string-literal escaping
                # (an expr('...\\s...') literal would eat the backslash)
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pairs_from_symbols(words: DataFrame) -> DataFrame:
    """(pair, cnt) from a (symbols: array<string>, freq) table.

    ``pair`` is the two symbols joined with a space (symbols grow past
    one character as merges apply, so a separator is required to keep the
    pair key unambiguous).
    """
    adjacent = F.expr(
        "transform(sequence(1, size(symbols) - 1), "
        "i -> concat(symbols[i - 1], ' ', symbols[i]))"
    )
    return (
        words.where(F.size("symbols") >= 2)
        .select(F.explode(adjacent).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-iteration BPE pair statistics straight from the corpus.

    (pair, cnt) where pair is two adjacent characters of a word joined by
    a space and cnt is the frequency-weighted number of adjacencies.
    Exactly the statistic the first BPE merge maximizes.
    """
    chars = F.expr("split(word, '')").alias("symbols")
    words = word_frequencies(docs, text_col).select(chars, "freq")
    return _pairs_from_symbols(words)


def bpe_merge_candidates(
    docs: DataFrame, top: int = DEFAULT_TOP_PAIRS, text_col: str = "text"
) -> DataFrame:
    """Ranked first-iteration merge table: (pair, cnt, rank).

    rank orders by (cnt desc, pair asc) — the deterministic tie-break the
    driver oracle reproduces. ``top`` bounds the result (the argmax and
    its runners-up are what an iterative trainer consumes).
    """
    from pyspark.sql.window import Window

    counts = bpe_pair_counts(docs, text_col)
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    # The global rank window funnels through one task, but its input is
    # pre-aggregated pair counts (alphabet^2-bounded, thousands of rows),
    # never corpus-sized - cap it anyway so the sort input is explicit.
    return (
        counts.orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(top)
        .withColumn("rank", F.row_number().over(w))
    )


def _apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every leftmost non-overlapping (left, right) adjacency.

    Pure-Catalyst left fold over the symbol array: append each symbol,
    but when the accumulator ends with ``left`` and the incoming symbol
    is ``right``, replace that tail element with the merged symbol. The
    fold is sequential within a word (correct greedy semantics — a just-
    merged token never re-merges with the following symbol in the same
    pass) and embarrassingly parallel across words.
    """
    merged = left + right
    fold = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return words.select(fold.alias("symbols"), "freq")


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Run ``n_merges`` BPE merge iterations; return the merge table.

    Returns [(left, right, count), ...] in merge order. Ties break on
    pair string ascending (deterministic across partitionings because the
    argmax is computed from exact integer counts).

    The corpus is scanned once; each iteration is one aggregation job
    over the compressed distinct-word table plus a 1-row collect.
    """
    chars = F.expr("split(word, '')").alias("symbols")
    words = word_frequencies(docs, text_col).select(chars, "freq")
    # cache the compressed table: every iteration re-reads it
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        best = (
            _pairs_from_symbols(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ", 1)
        merges.append((left, right, cnt))
        words = _apply_merge(words, left, right)
        if (i + 1) % checkpoint_every == 0:
            # truncate the fold-on-fold lineage so planning stays O(1)
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge table.

    (doc_id, tokens: array<string>, n_tokens). Applies the merge list in
    training order to each word's character sequence — same fold as
    training, corpus-parallel. The merge table is a plan literal
    (broadcast with the serialized plan; merge tables are KBs).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    out = docs.select(
        F.col(id_col), F.explode_outer(toks).alias("word"),
        F.monotonically_increasing_id().alias("ord"),
    ).withColumn(
        # token-less documents surface as a null word from explode_outer;
        # they must encode to [] rather than poison the fold with nulls
        "symbols",
        F.coalesce(F.expr("split(word, '')"), F.array().cast("array<string>")),
    )
    folded = out
    for left, right, _ in merges:
        merged = left + right
        folded = folded.withColumn(
            "symbols",
            F.aggregate(
                F.col("symbols"),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(left))
                    & (x == F.lit(right)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(merged)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ),
        )
    return (
        folded.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ord", "symbols"))
                    ),
                    lambda s: s["symbols"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
