"""Deduplication operators for the training-data pipeline.

Four families, each Spark-first and shuffle-conscious:

- exact:       one hash-groupBy on sha256(normalized text). One shuffle,
               map-side partial agg, no skew (sha keys are uniform).
- n-gram Jaccard: shingle explode + equi-join on shingle + group count.
               Exact but quadratic in duplicate-cluster size — the
               *oracle* path; MinHash is the scale path.
- MinHash+LSH: signature via portable 60-bit shingle hashes + affine
               permutations; banding turns all-pairs into an equi-join on
               (band, band_key); candidates are exact-verified so output
               = true Jaccard pairs (recall governed by band shape).
- SimHash:     62-bit signature; candidate generation by pigeonhole
               banding (4 chunks — any pair within Hamming distance 3
               MUST share a chunk), so banded output is provably equal to
               the all-pairs result at 1/1000th the join cost.

All hashes derive from sha256 prefixes (``text.hex_hash``) so DuckDB
oracles compute identical values. No counterpart in the reference
(SURVEY.md §2.9) — mandated by the driver brief.

Scale notes (100 TB):
- shingle join keys are near-uniform (hashes), so no salting needed;
- LSH band join output is bounded by band-bucket sizes; a hot bucket
  (boilerplate shingle sets) is handled by AQE skew-join splitting;
- exact-verify joins candidates back to shingles — candidates are a tiny
  fraction of the corpus, so this join broadcasts the candidate list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyjelly_spark.functions.text import hex_hash, normalized

MERSENNE31 = (1 << 31) - 1  # modulus for affine MinHash permutations


def doc_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of normalized text."""
    w = F.split(normalized(F.col("text")), " ")
    grams = F.expr(
        f"transform(sequence(0, size(w) - {n}), "
        f"i -> concat_ws(' ', {', '.join(f'w[i+{j}]' for j in range(n))}))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), w.alias("w"))
        .where(F.size("w") >= n)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Group by normalized-content fingerprint; keep min doc_id as canon.

    Returns (fingerprint, canonical_doc_id, n_copies).
    """
    return (
        docs.select(
            F.sha2(normalized(F.col("text")), 256).alias("fingerprint"),
            F.col("doc_id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _pair_jaccard(shingles: DataFrame) -> DataFrame:
    """All (a, b, jaccard) pairs sharing >= 1 shingle, a < b."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    left = shingles.select(F.col("doc_id").alias("a"), "shingle")
    right = shingles.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    *,
    hub_cap: int = 10_000,
    on_hot_shingle: str = "error",
) -> DataFrame:
    """Exact near-duplicate pairs by word-n-gram Jaccard >= threshold.

    (a, b, jaccard) with a < b, jaccard rounded to 4 decimals. This is the
    exact/oracle path; use :func:`minhash_pairs` at scale.

    Hot-shingle guard: the shingle equi-join emits C(fanout, 2) pairs
    per shingle, so one boilerplate 3-gram occurring in 10^5 docs would
    emit ~5*10^9 pairs from a single key. ``on_hot_shingle="error"``
    (default) refuses the job loudly if any shingle's fan-out exceeds
    ``hub_cap`` — exactness is this operator's contract, so it never
    silently diverges; route hot corpora through :func:`minhash_pairs`.
    ``"drop"`` excludes hot shingles instead (the recall trade of the
    graph hub-cut: a shingle shared by >hub_cap docs carries no
    near-dup signal). Under ``"drop"`` the reported Jaccard is computed
    on the REDUCED shingle universe — dropping a hot shingle present in
    only one doc of a pair shrinks the union without touching the
    intersection — so it can be HIGHER or lower than the uncapped
    value; near the threshold that is a precision (false-positive-pair)
    risk as well as a recall one.

    The shingle frame is locally checkpointed ONCE here: the guard
    aggregation, the per-doc size aggregation and both sides of the
    pair equi-join otherwise each re-run the corpus tokenize+explode
    (4 traversals measured as ~+0.9 s on dedup_containment at sf0.1).
    """
    from pyjelly_spark.operators.components import cap_key_fanout

    sh = cap_key_fanout(
        doc_shingles(docs, n=n).localCheckpoint(eager=False),
        "shingle",
        hub_cap,
        on_exceed=on_hot_shingle,
    )
    pairs = _pair_jaccard(sh)
    # floor-scaling, not round(): rounding-mode-proof across engines
    # (DuckDB HALF_EVEN vs Spark HALF_UP differ at x.xxxx5 boundaries)
    return pairs.where(F.col("jaccard") >= threshold).select(
        "a", "b", (F.floor(F.col("jaccard") * 10000) / 10000).alias("jaccard")
    )


def _minhash_params(num_hashes: int) -> list:
    """Deterministic (a_j, b_j) affine-permutation coefficients.

    The multipliers come from a splitmix-style 64-bit mix, NOT a small
    linear sequence: with a_j = 2j+1-style multipliers the permutations'
    argmins are correlated across j (a near-identical doc pair was missed
    in ALL 16 bands at j=0.9892), whereas large well-mixed multipliers
    make per-band collisions behave like independent Bernoulli(j^r).
    """
    mask = (1 << 64) - 1
    params = []
    for j in range(num_hashes):
        z = (j * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 31)) * 0x94D049BB133111EB) & mask
        a = (z % (MERSENNE31 - 1)) + 1
        z2 = ((z ^ (z >> 29)) * 0xC2B2AE3D27D4EB4F) & mask
        b = z2 % MERSENNE31
        params.append((a, b))
    return params


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, j, minhash) — affine-permutation MinHash over shingles.

    h_j(s) = (a_j * H(s) + b_j) mod M with H the portable 60-bit sha hash
    reduced mod M = 2^31-1; (a_j, b_j) from :func:`_minhash_params`.
    Fully deterministic; a*h stays < 2^62 so the arithmetic is exact in
    64-bit longs. Pass a precomputed/materialized ``shingles`` frame to
    share the corpus tokenize+explode pass with other consumers.
    """
    if shingles is None:
        shingles = doc_shingles(docs, n=n)
    sh = shingles.withColumn(
        "h", hex_hash(F.col("shingle"), mod=MERSENNE31)
    )
    # all num_hashes minima in ONE groupBy(doc_id) pass (same shape as
    # the SimHash rewrite): shuffle volume is one (doc, shingle-hash) row
    # per shingle, not num_hashes x that; the (j, minhash) long format
    # comes from exploding a tiny post-aggregation array (num_hashes rows
    # per doc).
    mins = [
        F.min(
            F.pmod(F.lit(pa) * F.col("h") + F.lit(pb), F.lit(MERSENNE31))
        ).alias(f"m{j}")
        for j, (pa, pb) in enumerate(_minhash_params(num_hashes))
    ]
    per_doc = sh.groupBy("doc_id").agg(*mins)
    sig = F.explode(
        F.array(*[
            F.struct(F.lit(j).alias("j"), F.col(f"m{j}").alias("minhash"))
            for j in range(num_hashes)
        ])
    ).alias("sig")
    return per_doc.select("doc_id", sig).select(
        "doc_id", F.col("sig.j").alias("j"), F.col("sig.minhash").alias("minhash")
    )


def minhash_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate pairs, exact-verified: (a, b, jaccard).

    Banding: ``bands`` bands of ``num_hashes/bands`` rows; docs colliding
    in any band become candidates (one equi-join on the band key — never
    all-pairs). Candidates are then verified with the exact shingle
    Jaccard, so precision is 1.0 and output is comparable to
    :func:`ngram_jaccard_pairs` (recall ~= 1 - (1-t^r)^b).
    """
    rows_per_band = num_hashes // bands
    # The shingle table feeds THREE consumers (the signature aggregation
    # and both sides of the candidate verify); materialize it once so the
    # tokenize+explode pass over the corpus — the dominant scan at scale —
    # runs once instead of three times. Same for band_keys, which would
    # otherwise recompute the whole signature pipeline on each side of
    # its self-join (Catalyst does not reuse the exchange across the
    # aliased branches here).
    shingles = doc_shingles(docs, n=n).localCheckpoint(eager=False)
    sig = minhash_signatures(docs, n=n, num_hashes=num_hashes, shingles=shingles)
    band_keys = (
        sig.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("j", "minhash"))).alias("sig"))
        .withColumn(
            "band_key",
            F.sha2(F.to_json(F.struct("band", "sig")), 256),
        )
        .select("doc_id", "band_key")
        .localCheckpoint(eager=False)
    )
    cand = (
        band_keys.alias("x")
        .join(band_keys.alias("y"), "band_key")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    # exact-verify ONLY the candidates: intersections are counted by
    # walking candidate pairs through the shingle table twice — never the
    # full all-shared-shingle pair join (that would defeat LSH at scale)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(shingles.select(F.col("doc_id").alias("a"), "shingle"), "a")
        .join(shingles.select(F.col("doc_id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", (F.floor(F.col("jaccard") * 10000) / 10000).alias("jaccard"))
    )


SIMHASH_BITS = 62  # keep the signature positive in a signed 64-bit long


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 62-bit SimHash over distinct normalized words.

    bit_i(doc) = 1 iff sum over words w of (2*((H(w)>>i)&1) - 1) > 0.

    Single-pass plan: per-doc word dedup happens inside the row
    (``array_distinct`` before the explode — no distinct shuffle), and all
    62 per-bit sign sums are computed as one wide aggregate in ONE
    ``groupBy(doc_id)``. Shuffle volume is one row of 62 longs per doc —
    vs the naive explode(62 bit-rows per word) plan whose shuffle is 62x
    the word count. Deterministic, oracle-computable.
    """
    wordsdf = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(normalized(F.col("text")), " "))
        ).alias("word"),
    ).where(F.col("word") != "").withColumn("h", hex_hash(F.col("word")))
    # one conditional-sum aggregate per bit; Catalyst fuses them into a
    # single hash-aggregate with map-side partials
    sign_sums = [
        F.sum(
            F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    per_doc = wordsdf.groupBy("doc_id").agg(*sign_sums)
    bit_terms = [
        F.when(
            F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    simhash = bit_terms[0]
    for term in bit_terms[1:]:
        simhash = simhash + term
    return per_doc.select("doc_id", simhash.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_distance: int = 3) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) <= max_distance.

    Candidate generation by pigeonhole banding: split the 62 bits into
    ``max_distance + 1`` chunks — any pair differing in <= max_distance
    bits must agree on at least one full chunk, so an equi-join on
    (chunk_idx, chunk_value) has PERFECT recall. Output therefore equals
    the all-pairs cross join exactly, without ever materializing it.
    """
    n_chunks = max_distance + 1
    chunk_bits = -(-SIMHASH_BITS // n_chunks)
    mask = (1 << chunk_bits) - 1
    sig = simhash_signatures(docs)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("c"),
                    F.shiftright(F.col("simhash"), c * chunk_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("v"),
                )
                for c in range(n_chunks)
            ])
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.c").alias("c"), F.col("ck.v").alias("v"))
    left = chunks.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a"), "c", "v"
    )
    right = chunks.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b"), "c", "v"
    )
    return (
        left.join(right, ["c", "v"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
        .distinct()
    )


def incremental_dedup(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Continuous-ingestion exact dedup: classify an incoming batch
    against an already-ingested corpus by normalized-content
    fingerprint. Returns one row per incoming doc:
    ``(doc_id, verdict, canonical_doc_id)`` with verdict precedence

    - ``dup_existing``: the fingerprint is already in the corpus —
      canonical is the smallest existing doc_id carrying it;
    - ``dup_batch``: first seen in THIS batch, but another incoming doc
      (the smallest doc_id, which stays ``new``) carries it;
    - ``new``: first occurrence anywhere.

    Scale shape: the existing corpus reduces to one row per distinct
    fingerprint (min doc_id) — at 10^12-doc scale that aggregate is the
    persisted fingerprint index a real ingest pipeline maintains
    incrementally, not a rescan. The batch side takes one window
    exchange (within-batch canonical) and one fp-keyed equi-join; the
    batch is the small side, so AQE broadcasts it against the index.
    """
    from pyspark.sql.window import Window

    exf = (
        existing.select(
            F.sha2(normalized(F.col("text")), 256).alias("fp"),
            F.col("doc_id"),
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("ex_canon"))
    )
    inc = incoming.select(
        F.sha2(normalized(F.col("text")), 256).alias("fp"),
        F.col("doc_id"),
    ).withColumn(
        "batch_canon", F.min("doc_id").over(Window.partitionBy("fp"))
    )
    joined = inc.join(exf, "fp", "left")
    verdict = (
        F.when(F.col("ex_canon").isNotNull(), F.lit("dup_existing"))
        .when(F.col("doc_id") != F.col("batch_canon"), F.lit("dup_batch"))
        .otherwise(F.lit("new"))
    )
    return joined.select(
        "doc_id",
        verdict.alias("verdict"),
        F.coalesce("ex_canon", "batch_canon").alias("canonical_doc_id"),
    )


def ppjoin_pairs(
    docs: DataFrame,
    tau_num: int = 4,
    tau_den: int = 5,
) -> DataFrame:
    """EXACT set-similarity join (word-set Jaccard >= tau_num/tau_den)
    via PPJoin-style prefix + length filtering — no LSH probabilism,
    no all-pairs join.

    Tokens are ordered by a global total order (ascending corpus
    frequency, token as tie-break). For a doc with L distinct tokens,
    only its first ``L - ceil(tau*L) + 1`` tokens (its *prefix* — the
    rarest ones) are emitted to the candidate join: two sets with
    Jaccard >= tau MUST share a prefix token under any shared total
    order (Xiao et al., PPJoin), so the join loses nothing. The scale
    properties that matter at 100 TB:

    - candidate join keys are each doc's RAREST tokens, so the
      token-key shuffle is inherently skew-free (stop-words never
      become join keys — the opposite of the naive token join);
    - the length filter (tau*La <= Lb <= La/tau, integer cross-mult)
      prunes inside the join condition, before the pair ever
      materializes;
    - verification is exact integer arithmetic on candidate pairs only:
      i*(den+num) >= num*(La+Lb)  <=>  Jaccard >= tau.

    Returns (a, b, inter, sa, sb) for every qualifying pair, a < b.

    Corpus caveat: prefix filtering prunes pairs that do NOT qualify;
    it cannot shrink the true result. On the synthetic documents corpus
    (one dense template cluster — millions of genuinely-qualifying
    pairs at sf0.1) the cost is therefore output-bound; on a realistic
    heavy-tailed corpus the candidate set collapses to near the output
    size.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalized(F.col("text")), " "))).alias(
            "token"
        ),
    ).where(F.col("token") != "")
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    ranked = (
        toks.join(freq, "token")
        .select(
            "doc_id",
            "token",
            F.row_number()
            .over(
                Window.partitionBy("doc_id").orderBy("freq", "token")
            )
            .alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("sz"),
        )
    )
    # prefix_len = sz - ceil(tau*sz) + 1, all-integer
    ceil_tau_sz = (tau_num * F.col("sz") + tau_den - 1).cast("long") / tau_den
    prefix = ranked.where(
        F.col("rn") <= F.col("sz") - F.floor(ceil_tau_sz) + 1
    ).select("token", "doc_id", "sz")
    x, y = prefix.alias("x"), prefix.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.token") == F.col("y.token"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            # length filter: tau*sa <= sb and tau*sb <= sa
            & (tau_num * F.col("x.sz") <= tau_den * F.col("y.sz"))
            & (tau_num * F.col("y.sz") <= tau_den * F.col("x.sz")),
        )
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sz").alias("sa"),
            F.col("y.sz").alias("sb"),
        )
        .distinct()
    )
    # same token universe as `toks` (empty tokens excluded), so `inter`
    # is consistent with sa/sb
    sets = docs.select(
        "doc_id",
        F.array_sort(
            F.filter(
                F.array_distinct(F.split(normalized(F.col("text")), " ")),
                lambda t: t != "",
            )
        ).alias("ws"),
    )
    return (
        cand.join(sets.select(F.col("doc_id").alias("a"), F.col("ws").alias("wa")), "a")
        .join(sets.select(F.col("doc_id").alias("b"), F.col("ws").alias("wb")), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("wa", "wb")).cast("long").alias("inter"),
            F.col("sa").cast("long"),
            F.col("sb").cast("long"),
        )
        .where(
            F.col("inter") * (tau_den + tau_num)
            >= tau_num * (F.col("sa") + F.col("sb"))
        )
    )
