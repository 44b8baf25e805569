"""Isolated steady-state timings for individual queries (BENCH.md §2.v).

Motivation (r4 verdict, "What's wrong" #3): the 199-query driver bench
runs every query in one long-lived JVM, so late queries inherit heap
pressure / GC / page-cache state from 190+ predecessors — family
readings there can drift 1.5-2x above a query's intrinsic wall with no
code change. This script pins the intrinsic number: ONE fresh session,
ONE query, N reps back-to-back; rep 1 is the cold scan+codegen touch,
the minimum of the remaining reps is the steady state.

Usage: python scripts/isolated_bench.py <query> [reps] [sf_dir] [cpus]
Prints one JSON line: {"query": ..., "walls": [...], "steady": min}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

QUERY = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[4]) if len(sys.argv) > 4 else 32


def main() -> None:
    from pyjelly_spark.queries import QUERIES
    from pyjelly_spark.session import build_session

    spark = build_session(
        master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    n = 0
    for _ in range(REPS):
        t0 = time.time()
        # .count() matches bench.py's materialization exactly, so these
        # walls are directly comparable to driver-bench readings
        n = QUERIES[QUERY](spark, SF_DIR).count()
        walls.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "query": QUERY,
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "rows": n,
                "walls": walls,
                "steady": min(walls[1:]) if len(walls) > 1 else walls[0],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
