"""Straggler bench for read_jelly(split_foreign_files=True).

Builds a single N-triple stream (decodes as ONE task — the straggler)
and a concatenation of K equal member streams totalling N triples
(decodes as K tasks under split_foreign_files). Same statement count,
same per-statement decode work; with K segments on >=K cores the wall
should approach 1/K of the single-task wall — the "straggler halved"
evidence the r4 verdict asked for at K=2.

(The sequential reader is NOT a valid baseline on the concatenated
object itself: stream B's auto-increment lookup indices overrun
stream A's leftover tables and the decode hard-errors — or, when
table sizes happen to align, silently returns wrong terms; both modes
pinned in tests/test_split_decode.py. Split mode is the only correct
reader for that shape.)

Usage: python scripts/split_decode_bench.py [n_triples_total] [k] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())

N_TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 8


def _stream_bytes(n: int, base: str) -> bytes:
    from pyjelly_spark.jelly import constants as jc
    from pyjelly_spark.jelly.encoder import StreamEncoder, delimit

    enc = StreamEncoder(jc.StreamOptions())
    chunks = []
    for i in range(n):
        frame = enc.add_triple(
            ("iri", f"http://ex.org/{base}/s{i % 50000}"),
            ("iri", f"http://ex.org/{base}/p{i % 17}"),
            ("lit", f"value {i}", "", ""),
        )
        if frame is not None:
            chunks.append(delimit(frame))
    tail = enc.take_frame()
    if tail is not None:
        chunks.append(delimit(tail))
    return b"".join(chunks)


def main() -> None:
    from pyjelly_spark.session import build_session
    from pyjelly_spark.sources.jelly_io import read_jelly

    d = tempfile.mkdtemp(prefix="split_bench_")
    per = N_TOTAL // K
    single_dir = os.path.join(d, "single")
    concat_dir = os.path.join(d, "concat")
    os.makedirs(single_dir)
    os.makedirs(concat_dir)
    single_path = os.path.join(single_dir, "one.jelly")
    with open(single_path, "wb") as out:
        out.write(_stream_bytes(per * K, "solo"))
    path = os.path.join(concat_dir, "concat.jelly")
    with open(path, "wb") as out:
        for seg in range(K):
            out.write(_stream_bytes(per, f"seg{seg}"))

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    result = {"n_triples": per * K, "k_segments": K, "cpus": CPUS,
              "file_mb": round(os.path.getsize(path) / 1e6, 1)}
    try:
        for label, target, split in (
            ("single_task", single_path, False),
            ("split", path, True),
        ):
            walls = []
            for _ in range(3):
                t0 = time.time()
                n = read_jelly(spark, target, split_foreign_files=split).count()
                walls.append(round(time.time() - t0, 2))
            assert n == per * K, (label, n)
            result[label] = {"walls": walls, "best": min(walls)}
        result["speedup"] = round(
            result["single_task"]["best"] / result["split"]["best"], 2
        )
        print(json.dumps(result))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
