"""Hardware scaling ceilings of this host: compute vs memory bandwidth.

The north-rule proxy (local 8 -> 32 parallelism on ONE host) can only
show the scaling the HOST allows. Two independent ceilings bound it:

- compute: out-of-order integer work on cache-resident data — scales
  with SMT/turbo limits only (measured ~0.81 on this VM, round 1);
- memory bandwidth: string/columnar pipelines stream far more bytes than
  they compute on; once the host's memory controllers saturate, extra
  cores add nothing. A REAL cluster at 4N executors has 4N memory
  controllers — this is precisely the resource a single-host proxy
  cannot multiply.

This probe measures both with plain multiprocessing (no JVM, no Python
GIL interference — separate processes), at 1, 8, and 32 workers, and
prints per-level aggregate rates + the 8->32 efficiency for each.

Usage: python scripts/hw_ceiling.py [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

SECONDS = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
BUF_MB = 256  # far beyond L3: forces DRAM traffic


def _compute_worker(seconds: float, out: mp.Queue) -> None:
    # cache-resident integer mixing: bounded data, heavy ALU
    x = np.arange(1 << 14, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    add = np.uint64(12345)
    shift = np.uint64(31)
    end = time.time() + seconds
    iters = 0
    while time.time() < end:
        x = x * mult + add  # uint64 wraps, no promotion
        x ^= x >> shift
        iters += 1
    out.put(iters)


def _bandwidth_worker(seconds: float, out: mp.Queue) -> None:
    src = np.empty(BUF_MB * (1 << 20) // 8, dtype=np.int64)
    dst = np.empty_like(src)
    # pre-touch BOTH buffers and do one untimed warmup copy: np.empty
    # pages are allocated lazily, and the page faults otherwise dominate
    # a short probe (they produced the bogus 86->42 GB/s round-1 numbers;
    # the true controller profile is ~141 GB/s at 8 workers saturating
    # ~270 GB/s at 16+)
    src[:] = 1
    dst[:] = 2
    np.copyto(dst, src)
    end = time.time() + seconds
    bytes_moved = 0
    while time.time() < end:
        np.copyto(dst, src)  # read + write one buffer each
        bytes_moved += src.nbytes * 2
    out.put(bytes_moved)


def run_level(target, n: int, seconds: float) -> float:
    queue: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=target, args=(seconds, queue)) for _ in range(n)
    ]
    for p in procs:
        p.start()
    total = sum(queue.get() for _ in procs)
    for p in procs:
        p.join()
    return total / seconds


def main() -> None:
    result = {}
    for name, worker, unit in (
        ("compute", _compute_worker, "iters/s"),
        ("bandwidth", _bandwidth_worker, "bytes/s"),
    ):
        rates = {n: run_level(worker, n, SECONDS) for n in (1, 4, 8, 16, 32)}
        result[name] = {
            "unit": unit,
            **{f"rate_{n}": round(r) for n, r in rates.items()},
            "efficiency_4_to_16": round((rates[16] / rates[4]) / 4.0, 3),
            "efficiency_8_to_32": round((rates[32] / rates[8]) / 4.0, 3),
        }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
