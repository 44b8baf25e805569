"""CDC log compaction and snapshot MERGE semantics."""


def test_compact_log_last_writer_and_deletes(spark):
    from pyjelly_spark.operators.cdc import compact_log

    changes = spark.createDataFrame(
        [
            # k1: upsert then delete -> absent
            ("k1", "U", 1, "a"),
            ("k1", "D", 2, None),
            # k2: delete then upsert -> present with latest payload
            ("k2", "D", 1, None),
            ("k2", "U", 2, "b"),
            ("k2", "U", 3, "c"),
            # k3: single upsert
            ("k3", "U", 1, "d"),
        ],
        "k: string, op: string, seq: long, payload: string",
    )
    got = {
        r["k"]: r["payload"]
        for r in compact_log(changes, keys=["k"], order_cols=["seq"]).collect()
    }
    assert got == {"k2": "c", "k3": "d"}


def test_merge_snapshot_base_loses_to_any_change(spark):
    from pyjelly_spark.operators.cdc import merge_snapshot

    base = spark.createDataFrame(
        [("k1", "base"), ("k2", "base"), ("k3", "base")],
        "k: string, payload: string",
    )
    changes = spark.createDataFrame(
        [
            ("k1", "U", 5, "new"),   # overrides base
            ("k2", "D", 5, None),    # deletes base row
            ("k9", "U", 1, "ins"),   # insert (not in base)
        ],
        "k: string, op: string, seq: long, payload: string",
    )
    got = {
        r["k"]: r["payload"]
        for r in merge_snapshot(
            base, changes, keys=["k"], order_cols=["seq"]
        ).collect()
    }
    # k3 untouched survives from base
    assert got == {"k1": "new", "k3": "base", "k9": "ins"}


def test_scd2_history_intervals(spark):
    from pyjelly_spark.operators.cdc import scd2_history

    changes = spark.createDataFrame(
        [
            ("k1", "U", 1, "a"),
            ("k1", "U", 3, "b"),
            ("k1", "D", 5, None),   # closes b's interval, opens none
            ("k2", "U", 2, "x"),    # never superseded -> current
        ],
        "k: string, op: string, seq: long, payload: string",
    )
    rows = {
        (r["k"], r["payload"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(changes, keys=["k"], order_cols=["seq"]).collect()
    }
    assert rows == {
        ("k1", "a"): (1, 3, False),
        ("k1", "b"): (3, 5, False),
        ("k2", "x"): (2, None, True),
    }


def test_scd2_current_slice_equals_compacted_state(spark):
    import random

    from pyjelly_spark.operators.cdc import compact_log, scd2_history

    rng = random.Random(3)
    changes = [
        (f"k{rng.randint(0, 9)}", rng.choice("UUUD"), seq, f"p{seq}")
        for seq in range(60)
    ]
    df = spark.createDataFrame(changes, "k: string, op: string, seq: long, payload: string")
    current = {
        (r["k"], r["payload"])
        for r in scd2_history(df, ["k"], ["seq"]).where("is_current").collect()
    }
    compacted = {
        (r["k"], r["payload"]) for r in compact_log(df, ["k"], ["seq"]).collect()
    }
    assert current == compacted


def test_maintain_counts_matches_recompute_randomized(spark):
    import random

    from pyjelly_spark.operators.cdc import maintain_counts

    rng = random.Random(5)
    base = [(f"k{rng.randint(0, 6)}",) for _ in range(50)]
    view_rows = {}
    for (k,) in base:
        view_rows[k] = view_rows.get(k, 0) + 1
    # delta: removals only of existing rows, plus arbitrary adds
    removable = list(base)
    rng.shuffle(removable)
    dels = removable[:15]
    adds = [(f"k{rng.randint(0, 9)}",) for _ in range(20)]
    delta = [("del", k) for (k,) in dels] + [("add", k) for (k,) in adds]
    final = dict(view_rows)
    for op, k in delta:
        final[k] = final.get(k, 0) + (1 if op == "add" else -1)
    expected = {k: n for k, n in final.items() if n > 0}

    view_df = spark.createDataFrame(
        [(k, n) for k, n in view_rows.items()], "k: string, n: long"
    )
    delta_df = spark.createDataFrame(delta, "op: string, k: string")
    got = {
        r["k"]: r["n"]
        for r in maintain_counts(view_df, delta_df, ["k"]).collect()
    }
    assert got == expected
