"""Distinct-count sketches with engine-portable hashes.

KMV (k-minimum-values): over a set S of keys hashed uniformly into
[0, 2^60), the k-th smallest hash R_k estimates |S| as
(k-1) * 2^60 / R_k. Unlike Spark's built-in HLL
(``approx_count_distinct``), the KMV synopsis here is built on the
repo's portable 60-bit sha256 hash (functions/text.py::hex_hash), so a
DuckDB oracle computes the *identical* integer estimate — the sketch
itself is gate-able, not just its error bound.

Scale shape (the part that matters at 100 TB): the naive plan sorts
every distinct hash per group to find the k-th — a per-group sort of
potentially billions of rows. This operator prunes first: a cheap
HLL pass estimates each group's cardinality n, and only hashes below
~margin*k/n * 2^60 survive into the sort (expected survivors ~margin*k
per group, i.e. hundreds, regardless of n). The threshold only ever
*removes* rows above the k-th value, so the answer is unchanged; a
driver-side safety check recomputes any group the prune left with < k
survivors (can only happen under adversarial hash skew, and group
counts are tiny), so correctness never depends on the HLL estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyjelly_spark.functions.text import hex_hash

_HASH_SPACE = 1 << 60
# (k-1) * 2^60 exceeds int64 for k=16 -> route through decimal(38,0)
# in Spark / HUGEINT in DuckDB; `div` keeps the result integral.


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 16,
    prune_margin: int = 8,
    prune_min: int = 4096,
) -> DataFrame:
    """K-minimum-values distinct-count sketch of ``key_col`` per
    ``group_col``.

    Returns (group, kth_hash, est_distinct, exact_n): the k-th smallest
    distinct 60-bit hash, the integer KMV estimate
    (k-1)*2^60 // kth_hash, and the exact distinct count (carried for
    the correctness gate / error inspection; a production rollup would
    drop it).

    Groups with fewer than k distinct keys are omitted (the sketch is
    undefined there — standard KMV falls back to exact counting below
    k, which ``exact_n`` already covers).
    """
    hashes = (
        df.select(F.col(group_col).alias("g"), hex_hash(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )

    # Prune pass: per-group HLL estimate -> broadcast threshold map.
    # Skip groups the HLL thinks are small (threshold would not pay for
    # itself) by setting their threshold to the full hash space.
    apx = df.groupBy(F.col(group_col).alias("g")).agg(
        F.approx_count_distinct(key_col).alias("apx")
    )
    thr = apx.select(
        "g",
        F.when(
            F.col("apx") >= prune_min,
            F.expr(f"cast({_HASH_SPACE * prune_margin * k} as decimal(38,0))")
            / F.col("apx"),
        )
        .otherwise(F.expr(f"cast({_HASH_SPACE} as decimal(38,0))"))
        .cast("long")
        .alias("thr"),
    )
    pruned = hashes.join(F.broadcast(thr), "g").where(F.col("h") <= F.col("thr"))

    # Safety net: any group the prune starved below k survivors (or
    # dropped entirely) falls back to its unpruned hashes. The check is
    # one tiny aggregate (one row per group).
    starved = [
        r["g"]
        for r in apx.join(
            pruned.groupBy("g").agg(F.count(F.lit(1)).alias("surv")), "g", "left"
        )
        .where((F.col("surv").isNull()) | (F.col("surv") < k))
        .select("g")
        .collect()
    ]
    cand = pruned.select("g", "h")
    if starved:
        cand = cand.where(~F.col("g").isin(starved)).unionByName(
            hashes.where(F.col("g").isin(starved))
        )

    w = Window.partitionBy("g").orderBy("h")
    kth = (
        cand.select("g", "h", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == k)
        .select("g", F.col("h").alias("kth_hash"))
    )
    exact = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("k_"))
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    est_num = (k - 1) * _HASH_SPACE
    return (
        kth.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "kth_hash",
            F.expr(
                f"cast(cast({est_num} as decimal(38,0)) div kth_hash as bigint)"
            ).alias("est_distinct"),
            "exact_n",
        )
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch frequency estimates of ``key_col``.

    Build: each row hashes into one bucket per sketch row j (portable
    sha-60 of ``j:key`` mod width); the sketch is the (j, bucket) count
    matrix — at most depth*width cells, so the groupBy collapses
    map-side to O(depth*width) rows PER TASK regardless of input size
    (that bounded partial-agg state is the whole point of CMS at
    100 TB: the shuffle moves a few hundred rows per task, never the
    keys). Probe: estimate(key) = min over j of its bucket's count —
    >= true count always, with the classic (e/width, 1-1/e^depth)
    overcount guarantee.

    Returns (key, est_n, exact_n); exact_n is carried for the
    correctness gate / error inspection. Both sides are integer counts
    on a portable hash, so the DuckDB oracle reproduces the sketch
    matrix — and therefore every estimate — bit-exactly.
    """
    key = F.col(key_col).cast("string")
    rows = df.select(key.alias("k_"))
    hashed = rows.select(
        "k_", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    ).select(
        "k_",
        "j",
        F.pmod(
            hex_hash(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("k_"))),
            F.lit(width),
        ).alias("b"),
    )
    cms = hashed.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))
    probe = hashed.distinct()
    est = (
        probe.join(F.broadcast(cms), ["j", "b"])
        .groupBy("k_")
        .agg(F.min("c").cast("long").alias("est_n"))
    )
    exact = rows.groupBy("k_").agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    return est.join(exact, "k_").select(
        F.col("k_").alias("key"), "est_n", "exact_n"
    )


def bloom_semi_join(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    bits: int = 1024,
    hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join: keep probe keys whose ``hashes`` buckets
    are ALL occupied by the build side's key set.

    The filter is represented as the distinct occupied-bucket set
    (<= ``bits`` rows — broadcastable at any build cardinality), so the
    probe side is pruned with a broadcast join instead of shuffling
    against the build table: the standard runtime-filter pattern for
    star joins at scale, here as an explicit, *oracle-reproducible*
    operator (the sha-60 bucket function is engine-portable, so even
    the false-positive set is deterministic and gateable).

    Returns (key, is_member): every probe key passing the filter, with
    the exact-membership flag so false positives are observable.
    """
    def bucketed(df: DataFrame) -> DataFrame:
        key = F.col(key_col).cast("string").alias("k_")
        return df.select(key).distinct().select(
            "k_", F.explode(F.sequence(F.lit(0), F.lit(hashes - 1))).alias("j")
        ).select(
            "k_",
            "j",
            F.pmod(
                F.expr(f"conv(substring(sha2(concat(j, '|', k_), 256), 1, 15), 16, 10)").cast("long"),
                F.lit(bits),
            ).alias("b"),
        )

    occupied = bucketed(build).select("b").distinct()
    members = build.select(
        F.col(key_col).cast("string").alias("k_")
    ).distinct().withColumn("__m", F.lit(1))
    passing = (
        bucketed(probe)
        .join(F.broadcast(occupied), "b")
        .groupBy("k_")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .where(F.col("nhit") == hashes)
    )
    return passing.join(members, "k_", "left").select(
        F.col("k_").alias("key"),
        F.col("__m").isNotNull().alias("is_member"),
    )


def kmv_set_estimates(
    set_a: DataFrame,
    set_b: DataFrame,
    key_col: str,
    k: int = 12,
) -> DataFrame:
    """Sketch ALGEBRA on KMV synopses: estimate |A ∪ B| and |A ∩ B|
    from the two sets' k-minimum-values sketches alone.

    Union: the merged sketch M = k smallest of K_A ∪ K_B is exactly the
    KMV sketch of A ∪ B (mergeability), so est_union =
    (k-1)*2^60 // M_k. Intersection (theta-sketch style): every hash
    below M's threshold is a uniform sample of A ∪ B, so the count of
    M's hashes belonging to BOTH sets estimates the Jaccard fraction:
    est_inter = matches * est_union // k. All-integer on the portable
    hash — the oracle reproduces every intermediate.

    At scale each side's sketch build is the kmv_distinct shape (one
    distinct + bounded k-th selection; see that operator for the
    HLL-threshold prune); everything after the sketches is O(k).

    Returns one row: (union_kth, est_union, matches, est_inter,
    exact_union, exact_inter) — the exact counts are carried for the
    gate / error inspection.
    """
    a = set_a.select(
        hex_hash(F.col(key_col).cast("string")).alias("h"),
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    b = set_b.select(
        hex_hash(F.col(key_col).cast("string")).alias("h"),
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    flagged = (
        a.unionByName(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wa = Window.orderBy("h")
    ka = (
        flagged.where(F.col("in_a") == 1)
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= k)
        .select("h")
    )
    kb = (
        flagged.where(F.col("in_b") == 1)
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= k)
        .select("h")
    )
    merged = (
        ka.unionByName(kb)
        .distinct()
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= k)
        .join(flagged, "h")
    )
    est_num = (k - 1) * _HASH_SPACE
    stats = merged.agg(
        F.max("h").alias("union_kth"),
        F.sum((F.col("in_a") == 1).cast("long") * (F.col("in_b") == 1).cast("long"))
        .alias("matches"),
    ).select(
        "union_kth",
        F.expr(
            f"cast(cast({est_num} as decimal(38,0)) div union_kth as bigint)"
        ).alias("est_union"),
        F.col("matches").cast("long"),
    )
    exact = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.sum(
            (F.col("in_a") == 1).cast("long") * (F.col("in_b") == 1).cast("long")
        ).cast("long").alias("exact_inter"),
    )
    return (
        stats.crossJoin(F.broadcast(exact))
        .select(
            "union_kth",
            "est_union",
            "matches",
            F.expr("cast((matches * est_union) div " + str(k) + " as bigint)").alias(
                "est_inter"
            ),
            "exact_union",
            "exact_inter",
        )
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    m: int = 256,
    alpha_x1e6: int = 718272,
) -> DataFrame:
    """HyperLogLog distinct-count sketch of ``key_col`` per ``group_col``
    with ``m`` registers, built entirely on the portable 60-bit sha hash
    so the DuckDB oracle reproduces the register matrix — and therefore
    the integer estimate — bit-exactly (unlike Spark's built-in
    ``approx_count_distinct``, whose xxhash64-based HLL++ is
    engine-private).

    Register assignment: the low ``log2(m)`` hash bits pick the
    register, the remaining 52 bits w contribute
    rho = (61-b) - bit_length(w) ((61-b) when w = 0, b = log2(m)) — bit_length computed
    portably as ``length(bin(w))``, identical in Spark and DuckDB.

    Scale shape: NO distinct pre-pass — max() absorbs duplicates, so
    the plan is one partial-aggregated shuffle on (group, register)
    whose map-side state is bounded by m rows per group per task; the
    reduce side holds exactly m rows per group. That mergeability (the
    register matrix is a commutative monoid under element-wise max) is
    why HLL is the canonical distributed distinct count at 100 TB:
    re-aggregation across days/partitions never touches raw keys.

    The harmonic-mean estimate stays in integer arithmetic: with
    S = sum_j 2^(K - M_j), K = 61 - b (absent registers contribute 2^K),
    the raw estimate is alpha_m * m^2 * 2^K / S — one decimal(38,0) floor
    division. No float ever enters, so partitioning / summation order
    cannot perturb the gate. Low-range linear-counting correction is
    deliberately NOT applied (it needs ln(); both engines would have to
    agree on float rounding) — zero_regs is emitted so a consumer can
    apply it; the gate pins the raw sketch.

    Returns (group, registers_used, zero_regs, est_distinct, exact_n,
    err_ppm); exact_n/err_ppm are carried for the correctness gate and
    error inspection — a production rollup would drop them.
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two, got {m}")
    b = m.bit_length() - 1  # register index bits
    k_max = 61 - b  # rho ranges 1..k_max over the (60-b)-bit payload
    num = alpha_x1e6 * m * m * (1 << k_max)
    h = hex_hash(F.col(key_col).cast("string"))
    regs = (
        df.select(
            F.col(group_col).alias("g"),
            F.pmod(h, F.lit(m)).alias("reg"),
            F.shiftright(h, b).alias("w"),
        )
        .select(
            "g",
            "reg",
            F.when(F.col("w") == 0, F.lit(k_max))
            .otherwise(F.lit(k_max) - F.length(F.bin("w")))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("mreg"))
    )
    stats = regs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("registers_used"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {k_max} - mreg)"))
        .cast("long")
        .alias("s_obs"),
    )
    est = stats.select(
        "g",
        "registers_used",
        (F.lit(m) - F.col("registers_used")).cast("long").alias("zero_regs"),
        F.expr(
            f"cast(cast({num} as decimal(38,0)) div "
            f"(cast(s_obs + ({m} - registers_used) * {1 << k_max} as decimal(38,0))"
            f" * 1000000) as bigint)"
        ).alias("est_distinct"),
    )
    exact = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("k_"))
        .distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
    )
    return est.join(exact, "g").select(
        F.col("g").alias(group_col),
        "registers_used",
        "zero_regs",
        "est_distinct",
        "exact_n",
        F.expr(
            "cast(abs(est_distinct - exact_n) * 1000000 div exact_n as bigint)"
        ).alias("err_ppm"),
    )
