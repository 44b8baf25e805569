"""Lakehouse / optimizer audit queries: zone-map scan pruning
(orders_skipping), snapshot reconciliation diff (orders_diff), graph
partition edge-cut (kg_edgecut), and join-cardinality estimation
(events_joinest) — closed-form fixtures hand-checked against the
docstring arithmetic; the driver gate covers both scale factors.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.test_scc import _write_doc_ids


def test_orders_skipping_closed_form(spark):
    """Four single-row insertion files vs two month files; predicates
    hand-checked — date predicates prune the month layout, the uniform
    price column prunes nothing (each month file spans low+high)."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_skipping

    rows = [
        (0, 1, "O", 5000.0, dt.datetime(1996, 6, 5), "1-URGENT"),
        (1, 1, "O", 455000.0, dt.datetime(1996, 6, 20), "1-URGENT"),
        (2, 1, "O", 10000.0, dt.datetime(2000, 2, 3), "1-URGENT"),
        (3, 1, "O", 460000.0, dt.datetime(2000, 2, 9), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
        "o_totalprice: double, o_orderdate: timestamp_ntz, "
        "o_orderpriority: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    got = {
        (r.layout, r.pred): (
            r.n_files, r.files_scanned, r.rows_scanned, r.rows_matched
        )
        for r in q_orders_skipping(spark, d).collect()
    }
    assert got == {
        ("insertion", "p1_date_ge_2000"): (4, 2, 2, 2),
        ("insertion", "p2_date_1996h2"): (4, 2, 2, 2),
        ("insertion", "p3_price_gt_450k"): (4, 2, 2, 2),
        ("insertion", "p4_price_lt_20k"): (4, 2, 2, 2),
        ("insertion", "p5_date98_price300k"): (4, 1, 1, 1),
        ("datepart", "p1_date_ge_2000"): (2, 1, 2, 2),
        ("datepart", "p2_date_1996h2"): (2, 1, 2, 2),
        ("datepart", "p3_price_gt_450k"): (2, 2, 4, 2),
        ("datepart", "p4_price_lt_20k"): (2, 2, 4, 2),
        ("datepart", "p5_date98_price300k"): (2, 1, 2, 1),
    }


def test_orders_diff_closed_form(spark):
    """Keys 0..9: k=3 deleted (k%19==3), k=2,9 price-updated (k%7==2),
    k=5 status-updated (k%11==5), k=1 re-inserted as key 101
    (k%29==1, n=10)."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_diff

    rows = [
        (k, 1, "O", 1000.0 + k, dt.datetime(1996, 1, 1), "1-URGENT")
        for k in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
        "o_totalprice: double, o_orderdate: timestamp_ntz, "
        "o_orderpriority: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    got = [tuple(r) for r in q_orders_diff(spark, d).collect()]
    assert got == [
        ("delete", 1, 0, 0),
        ("insert", 1, 0, 0),
        ("unchanged", 6, 0, 0),
        ("update", 3, 2, 1),
    ]


def test_kg_edgecut_closed_form(spark):
    """n=85 graph (86 edges): group partitioning cuts only the two
    tree chords; hash (v%16) cuts every edge here; range cuts the 69
    edges whose 5.3-id-wide blocks split the 40-id groups."""
    from pyjelly_spark.queries import q_kg_edgecut

    d = _write_doc_ids(spark, 85)
    got = [tuple(r) for r in q_kg_edgecut(spark, d).collect()]
    assert got == [
        ("group", 86, 2, 23255),
        ("hash", 86, 86, 1000000),
        ("range", 86, 69, 802325),
    ]


def test_events_joinest_closed_form(spark):
    """Users 0 (2 clicks, 1 purchase), 1 (1 click, 0), 17 (0, 2
    purchases): actual = 2. perkey exact; uniform: na=3, nb=3,
    da=2, db=2 -> 3*3 div 2 = 4 (err 1e6); bucket16: bucket 0
    (na=3,nb=1,da=2,db=1 -> 3 div 2 = 1) + bucket 1 (0*2 div 1=0)
    -> 1 (err 500000); bucket4 same as bucket16 here."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_joinest

    rows = []
    spec = [(0, "click"), (0, "click"), (0, "purchase"),
            (1, "click"), (17, "purchase"), (17, "purchase"),
            (2, "view")]
    for eid, (u, et) in enumerate(spec):
        rows.append((eid, dt.datetime(2024, 1, 1, 9), u, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp_ntz, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    got = [tuple(r) for r in q_events_joinest(spark, d).collect()]
    assert got == [
        ("bucket16", 1, 2, 500000),
        ("bucket4", 1, 2, 500000),
        ("perkey", 2, 2, 0),
        ("uniform", 4, 2, 1000000),
    ]


def test_postings_codec_closed_form(spark):
    """'alpha' in docs 0..25 (all gaps 1 -> 26 one-byte varints, 875000
    ppm saved vs 8-byte ids); 'beta' in docs 0..24 plus 20000 (the
    19976 gap costs 3 bytes -> 28 total, 865384 ppm)."""
    from tests.test_scc import _write_doc_ids  # noqa: F401  (module import)
    from pyjelly_spark.queries import q_postings_codec

    rows = []
    for i in range(26):
        text = "alpha beta" if i <= 24 else "alpha"
        rows.append((i, text, "en", "s", len(text)))
    rows.append((20000, "beta", "en", "s", 4))
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in q_postings_codec(spark, d).collect()]
    assert got == [
        ("alpha", 26, 208, 26, 875000),
        ("beta", 26, 208, 28, 865384),
    ]


def _write_events(spark, spec):
    """spec: list of (user_id, event_type, item_or_None, ts)."""
    import datetime as dt

    rows = []
    for eid, (u, et, item, ts) in enumerate(spec):
        props = "{}" if item is None else '{"k": %d}' % item
        rows.append((eid, ts or dt.datetime(2024, 1, 1, 9), u, et, 1.0, props))
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


def test_events_rankeval_closed_form(spark):
    """Clicks rank items 1 (2 users) then 2,3 (1 user, id tiebreak);
    top-10 = [1,2,3]. User 1 purchased {1, 99}: hits 1 of 2, first
    rank 1. User 2 purchased {3}: hit at rank 3. p@10 = (100000+
    100000)/2; recall = (500000+1000000)/2; MRR = (1000000+333333)/2."""
    from pyjelly_spark.queries import q_events_rankeval

    spec = [
        (1, "click", 1, None), (2, "click", 1, None),
        (1, "click", 2, None), (2, "click", 3, None),
        (1, "purchase", 1, None), (1, "purchase", 99, None),
        (2, "purchase", 3, None),
    ]
    d = _write_events(spark, spec)
    got = [tuple(r) for r in q_events_rankeval(spark, d).collect()]
    assert got == [(10, 2, 100000, 750000, 666666, 1000000)]


def test_events_dp_bound_closed_form(spark):
    """Hour A: user 1 five events, user 2 one -> sensitivity 5, cap-3
    drops 2 of 6 rows. Hour B: two users x 1 -> sensitivity 1."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_dp_bound

    ha = dt.datetime(2024, 1, 1, 9, 5)
    hb = dt.datetime(2024, 1, 1, 10, 5)
    spec = (
        [(1, "click", None, ha)] * 5
        + [(2, "click", None, ha)]
        + [(1, "click", None, hb), (2, "click", None, hb)]
    )
    d = _write_events(spark, spec)
    got = [tuple(r) for r in q_events_dp_bound(spark, d).collect()]
    assert got == [(1, 1, 2, 2, 0), (5, 1, 6, 4, 2)]


def test_orders_skyline_closed_form(spark):
    """Points (price, day): (100, d3), (200, d5), (150, d3), (100, d3)
    dup, (300, d1): skyline = cheapest-freshest frontier {(100, d3) x2,
    (200, d5)}; (150, d3) loses to (100, d3) on price, (300, d1) loses
    to everything fresher and cheaper."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_skyline

    def ts(day):
        return dt.datetime(2024, 1, day)

    rows = [
        (0, 1, "O", 1.00, ts(3), "x"),
        (1, 1, "O", 2.00, ts(5), "x"),
        (2, 1, "O", 1.50, ts(3), "x"),
        (3, 1, "O", 1.00, ts(3), "x"),
        (4, 1, "O", 3.00, ts(1), "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
        "o_totalprice: double, o_orderdate: timestamp_ntz, "
        "o_orderpriority: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    got = [tuple(r) for r in q_orders_skyline(spark, d).collect()]
    e3 = int(ts(3).replace(tzinfo=dt.timezone.utc).timestamp())
    e5 = int(ts(5).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == [(100, e3, 2), (200, e5, 1)]


def test_doc_cdc_chunks_short_docs_exact(spark):
    """Docs shorter than the 8-gram window can't cut: one whole-doc
    chunk each; two identical docs dedup to one distinct chunk."""
    from pyjelly_spark.queries import q_doc_cdc_chunks

    rows = [(1, "abc", "en", "s", 3), (2, "abc", "en", "s", 3)]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = [tuple(r) for r in q_doc_cdc_chunks(spark, d).collect()]
    assert got == [(2, 2, 1, 6, 3, 500000)]


def test_doc_cdc_chunks_insertion_preserves_tail_chunks(spark):
    """The CDC promise: doc B = doc A with a prefix insertion shares
    A's post-first-boundary chunks (fixed-width blocks would share
    none). Invariants: chunk bytes reassemble both texts exactly and
    dedup saves > 0 bytes."""
    from pyjelly_spark.queries import q_doc_cdc_chunks

    base = " ".join(f"w{i % 23} tok{i % 7}" for i in range(120))
    rows = [(1, base, "en", "s", len(base)),
            (2, "INSERTED PREFIX " + base, "en", "s", len(base) + 16)]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string, "
        "n_chars: long",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    row = q_doc_cdc_chunks(spark, d).collect()[0]
    assert row.n_docs == 2
    assert row.chunk_bytes == len(base) * 2 + 16
    assert row.distinct_chunk_bytes < row.chunk_bytes  # shared tail chunks
    assert row.savings_ppm > 0


def test_events_interval_diff_closed_form(spark):
    """User 1: one session 10:00:00-10:10:00 (600 s) with an error at
    10:05:00 blacking out ±60 s inside it -> blocked 120, retained
    480. A second user's single-event session is zero-length: its
    lo==hi boundary deltas cancel at the same instant, so it
    contributes no seconds and the user doesn't count."""
    import datetime as dt

    from pyjelly_spark.queries import q_events_interval_diff

    t = lambda h, m, s=0: dt.datetime(2024, 1, 1, h, m, s)
    spec = [
        (1, "click", None, t(10, 0)),
        (1, "error", None, t(10, 5)),
        (1, "click", None, t(10, 10)),
        (2, "view", None, t(12, 0)),
    ]
    d = _write_events(spark, spec)
    got = [tuple(r) for r in q_events_interval_diff(spark, d).collect()]
    assert got == [(1, 600, 120, 480)]


def test_orders_dictenc_closed_form(spark):
    """Two rows, statuses 'OO'/'OO' (2-char, ndv 1): plain 4 bytes,
    dict = 2 + 2x1 = 4 -> tie, dict does NOT win (strict <).
    Priorities 'LONGPRIORITY' twice: plain 24, dict 12 + 2 = 14 ->
    wins, savings 416666 ppm. Keys '7','8': plain 2, dict 2 + 2 = 4
    -> loses (-1000000 ppm)."""
    import datetime as dt

    from pyjelly_spark.queries import q_orders_dictenc

    rows = [
        (7, 1, "OO", 1.0, dt.datetime(2024, 1, 1), "LONGPRIORITY"),
        (8, 1, "OO", 2.0, dt.datetime(2024, 1, 2), "LONGPRIORITY"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey: long, o_custkey: long, o_orderstatus: string, "
        "o_totalprice: double, o_orderdate: timestamp_ntz, "
        "o_orderpriority: string",
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    got = [tuple(r) for r in q_orders_dictenc(spark, d).collect()]
    assert got == [
        ("o_orderkey_str", 2, 2, 2, 4, False, -1000000),
        ("o_orderpriority", 2, 1, 24, 14, True, 416666),
        ("o_orderstatus", 2, 1, 4, 4, False, 0),
    ]


def test_events_slo_burn_closed_form(spark):
    """Hour 1: 1 error of 4 events (250000 ppm, burning); hour 2: 0 of
    2. Both hours share one 6h window: 1/6 -> 166666 ppm, burning."""
    import datetime as dt

    spec = (
        [(1, "error", None, dt.datetime(2024, 1, 1, 0, 5))]
        + [(1, "click", None, dt.datetime(2024, 1, 1, 0, 10))] * 3
        + [(2, "view", None, dt.datetime(2024, 1, 1, 1, 30))] * 2
    )
    from pyjelly_spark.queries import q_events_slo_burn

    d = _write_events(spark, spec)
    got = [tuple(r) for r in q_events_slo_burn(spark, d).collect()]
    assert got == [
        ("1h", 2, 1, 250000, 166666),
        ("6h", 1, 1, 166666, 166666),
    ]


def test_gorilla_bytes_by_hand(spark, tmp_path):
    """Delta-of-delta pricing on a hand-computed series: head=8B,
    first delta zigzag-varint, later points dod zigzag-varint incl. a
    negative dod and a 2-byte dod."""
    import pandas as pd

    from pyjelly_spark.queries import QUERIES

    # one user, one type: ts at +0s, +10s, +20s, +19s, +119s
    base = pd.Timestamp("2024-01-01 00:00:00")
    offs = [0, 10, 20, 19, 119]
    pdf = pd.DataFrame(
        {
            "event_id": range(5),
            "ts": [base + pd.Timedelta(seconds=o) for o in offs],
            "user_id": [1] * 5,
            "event_type": ["view"] * 5,
            "value": [0.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", coerce_timestamps="us")
    row = QUERIES["events_gorilla"](spark, str(d)).collect()[0]
    # time-sorted offsets 0,10,19,20,119 -> deltas us 10e6, 9e6, 1e6,
    # 99e6 -> dods None(first delta), -1e6, -8e6, 98e6; zigzag 2e7
    # (4B), 1_999_999 (3B), 15_999_999 (4B), 196_000_000 (4B)
    assert row["n_points"] == 5
    assert row["plain_bytes"] == 40
    assert row["gorilla_bytes"] == 8 + 4 + 3 + 4 + 4
    assert row["savings_ppm"] == (40 - 23) * 1_000_000 // 40


def test_fifo_allocation_by_hand(spark, tmp_path):
    """Boundary-sweep FIFO == the textbook lot-by-lot walk on a
    hand-built ledger: lots 300,200 cents; demands 100,250,400 ->
    allocations (l1,d1)=100, (l1,d2)=200, (l2,d2)=50, (l2,d3)=150,
    T=500, unfilled=250."""
    import pandas as pd

    from pyjelly_spark.operators.timeseries import fifo_allocate

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i, (et, v) in enumerate(
        [("purchase", 3.0), ("purchase", 2.0),
         ("click", 1.0), ("click", 2.5), ("click", 4.0)]
    ):
        rows.append((i, base + pd.Timedelta(minutes=i), 7, et, v, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df = spark.createDataFrame(pdf)
    r = fifo_allocate(df).collect()[0]
    assert r["n_lots"] == 2 and r["n_demands"] == 3
    assert r["allocated_c"] == 500
    assert r["surplus_c"] == 0
    assert r["unfilled_c"] == 250
    assert r["n_allocs"] == 4
    # segments: (100,l1,d1) (200,l1,d2) (50,l2,d2) (150,l2,d3)
    expected = (
        100 * ((1 * 31 + 1) % 1000003)
        + 200 * ((1 * 31 + 2) % 1000003)
        + 50 * ((2 * 31 + 2) % 1000003)
        + 150 * ((2 * 31 + 3) % 1000003)
    )
    assert r["alloc_chk"] == expected


def test_mannwhitney_matches_scipy_formula(spark, tmp_path):
    """Doubled-rank U on a hand-built sample with ties == the textbook
    tie-corrected computation (checked against manually averaged
    ranks)."""
    import pandas as pd

    from pyjelly_spark.queries import QUERIES

    # variant = sha60(user_id) % 2; pick user ids with known parity
    import hashlib

    def par(u):
        return int(hashlib.sha256(str(u).encode()).hexdigest()[:15], 16) % 2

    g0 = [u for u in range(40) if par(u) == 0][:4]
    g1 = [u for u in range(40) if par(u) == 1][:3]
    # cents: g0 -> 100, 200, 200, 300 ; g1 -> 200, 300, 400
    vals = list(zip(g0, [1.0, 2.0, 2.0, 3.0])) + list(zip(g1, [2.0, 3.0, 4.0]))
    base = pd.Timestamp("2024-01-01")
    rows = [
        (i, base + pd.Timedelta(minutes=i), u, "purchase", v, "{}")
        for i, (u, v) in enumerate(vals)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", coerce_timestamps="us")
    r = QUERIES["events_mannwhitney"](spark, str(d)).collect()[0]
    # pooled sorted cents: 100,200,200,200,300,300,400
    # avg ranks: 100->1; 200->(2+3+4)/3=3; 300->(5+6)/2=5.5; 400->7
    # R1 = 1 + 3 + 3 + 5.5 = 12.5 -> R1_x2 = 25; U1 = R1 - n1(n1+1)/2 = 2.5
    assert r["n1"] == 4 and r["n2"] == 3
    assert r["u1_x2"] == 5  # 2*U1
    assert r["u2_x2"] == 2 * 4 * 3 - 5
    assert r["tie_groups"] == 2
    assert r["cles_ppm"] == 5 * 1_000_000 // 24


def test_ks_statistic_matches_scipy(spark, tmp_path):
    """Exact integer KS == scipy.stats.ks_2samp on a small sample
    (scipy's D times n1*n2 must equal d_num exactly)."""
    import hashlib

    import pandas as pd

    from pyjelly_spark.queries import QUERIES

    def par(u):
        return int(hashlib.sha256(str(u).encode()).hexdigest()[:15], 16) % 2

    g0 = [u for u in range(100) if par(u) == 0][:6]
    g1 = [u for u in range(100) if par(u) == 1][:5]
    vals = list(zip(g0, [1.0, 2.0, 2.0, 3.0, 5.0, 8.0])) + list(
        zip(g1, [2.0, 4.0, 4.0, 6.0, 9.0])
    )
    base = pd.Timestamp("2024-01-01")
    rows = [
        (i, base + pd.Timedelta(minutes=i), u, "purchase", v, "{}")
        for i, (u, v) in enumerate(vals)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", coerce_timestamps="us")
    r = QUERIES["events_ks"](spark, str(d)).collect()[0]
    assert r["n1"] == 6 and r["n2"] == 5
    try:
        from scipy.stats import ks_2samp

        d_ref = ks_2samp([1, 2, 2, 3, 5, 8], [2, 4, 4, 6, 9]).statistic
        assert r["d_num"] == round(d_ref * 30)
    except ImportError:
        # manual: ECDF gaps at c=100..900 -> max |c1*5 - c2*6|
        import itertools
        xs = sorted({100, 200, 300, 500, 800, 400, 600, 900})
        a = [100, 200, 200, 300, 500, 800]
        b = [200, 400, 400, 600, 900]
        gaps = [abs(sum(x <= c for x in a) * 5 - sum(x <= c for x in b) * 6)
                for c in xs]
        assert r["d_num"] == max(gaps)


def test_viterbi_matches_bruteforce(spark, tmp_path):
    """applyInPandas Viterbi == exhaustive path enumeration on short
    hand-built sequences (all 2^n state paths scored)."""
    import itertools

    import pandas as pd

    from pyjelly_spark.operators.cep import (
        VITERBI_EMIT,
        VITERBI_INIT,
        VITERBI_OBS,
        VITERBI_TRANS,
        viterbi_decode,
    )

    seqs = {
        1: ["click", "error", "error", "view"],
        2: ["purchase"],
        3: ["view", "view", "click", "error", "purchase", "signup"],
    }
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for k, et in enumerate(seq):
            rows.append((eid, base + pd.Timedelta(minutes=k), u, et, 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df = spark.createDataFrame(pdf)
    got = {r["user_id"]: r for r in viterbi_decode(df).collect()}

    oi = {t: i for i, t in enumerate(VITERBI_OBS)}
    for u, seq in seqs.items():
        obs = [oi[t] for t in seq]
        best = None
        for path in itertools.product([0, 1], repeat=len(obs)):
            c = VITERBI_INIT[path[0]] + VITERBI_EMIT[path[0]][obs[0]]
            for (s1, s2), o in zip(zip(path, path[1:]), obs[1:]):
                c += VITERBI_TRANS[s1][s2] + VITERBI_EMIT[s2][o]
            if best is None or c < best:
                best = c
        assert got[u]["best_cost"] == best, (u, seq)
        assert got[u]["n_obs"] == len(seq)
