"""Local replica of the driver's correctness gate.

For every query in __spark_entry__.queries(): run the Spark query and the
DuckDB oracle at sf=0.01, compare row count, schema (column names), and
order-insensitive values (columns sorted by name, rows sorted, exact
equality). Prints one line per query + a summary; exit 1 on any mismatch.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def widen(s: pd.Series) -> pd.Series:
    """Width-only normalization: the driver hashes the STRING RENDER of
    each value, so int32(5) and int64(5) both hash "5" — integer width
    (and datetime unit) never affects the gate. Anything else (int vs
    float, float32 vs float64, decimal vs int) renders differently
    ("5" vs "5.0") and MUST be flagged: the round-2 lenient float64
    coercion here is exactly how six HUGEINT-typed oracles reached the
    driver red."""
    kind = getattr(s.dtype, "kind", None)
    if kind in "iu":
        return s.astype("int64")
    if kind == "M":
        return s.astype("datetime64[ns]")
    return s


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from pyjelly_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP  {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            if len(got) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            failures.append(name)
            continue
        ok = True
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            g, w = canon(got), canon(want)
            for c in g.columns:
                g[c], w[c] = widen(g[c]), widen(w[c])
            dtype_bad = [
                c for c in g.columns if g[c].dtype != w[c].dtype
            ]
            if dtype_bad:
                print(
                    f"FAIL  {name}: dtype mismatch (driver hash would "
                    f"differ): "
                    + ", ".join(
                        f"{c}: spark {g[c].dtype} vs oracle {w[c].dtype}"
                        for c in dtype_bad
                    )
                )
                failures.append(name)
                continue
            eq = g.equals(w)
            if not eq:
                diff = (g != w)
                ncell = int(diff.to_numpy().sum())
                print(f"FAIL  {name}: {ncell} differing cells of {g.size}")
                mask = diff.any(axis=1)
                print(pd.concat([g[mask].head(3), w[mask].head(3)]))
                ok = False
        if ok:
            print(f"OK    {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
