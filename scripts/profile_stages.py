"""Per-stage wall profile of the KG pipeline at one parallelism level.

Splits run_pipeline's phases and times each. Two modes matching
run_pipeline's two execution shapes:

  fused (default, = resume=False since r5): lazy plan build, partition
      histogram (materializes the pinned compact/link/canonical
      frames), then the encode job (triple-string build + salt +
      shuffle + sort + Jelly encode fused in one pass — no staged
      parquet at all).
  staged (= resume=True): input digest, extract/link/canonicalize +
      zstd parquet stage write, partition planning (driver histogram
      over the stage), then the Jelly encode over the stage.

Used to attribute N-vs-4N scaling efficiency losses to a stage
(BENCH.md §2.3 / §2.u).

Usage: python scripts/profile_stages.py <cpus> <n_files> [cluster] [mode]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000
CLUSTER = sys.argv[3] if len(sys.argv) > 3 else "executors"
MODE = sys.argv[4] if len(sys.argv) > 4 else "fused"

BENCH_TMP = os.environ.get("SPARK_GRAFT_TMP") or (
    "/dev/shm/spark_graft_bench" if os.path.isdir("/dev/shm") else None
)
if BENCH_TMP:
    os.makedirs(BENCH_TMP, exist_ok=True)

from pyjelly_spark.jelly import constants as jc
from pyjelly_spark.pipeline import PipelineConfig, build_triples, plan_partitions
from pyjelly_spark.session import build_session
from pyjelly_spark.sources.jelly_io import flatten_terms, write_jelly
from pyjelly_spark.sources.source_repos import generate_source_files


def main() -> None:
    if CLUSTER == "executors":
        n_exec = max(CPUS // 4, 1)
        spark = build_session(
            master=f"local-cluster[{n_exec},4,13312]",
            shuffle_partitions=max(CPUS * 2, 16),
            executor_memory="12g",
        )
    else:
        spark = build_session(
            master=f"local[{CPUS}]", shuffle_partitions=max(CPUS * 2, 16)
        )
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_AQE", "").lower() in ("off", "false", "0"):
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    def _noop(batches):
        for b in batches:
            yield pd.DataFrame({"n": [len(b)]})

    spark.range(0, CPUS * 4, numPartitions=CPUS * 4).mapInPandas(
        _noop, schema=StructType([StructField("n", LongType())])
    ).count()

    out_dir = tempfile.mkdtemp(prefix=f"profile_{CPUS}_", dir=BENCH_TMP)
    config = PipelineConfig(
        out_dir=out_dir, rows_per_stream=100_000, resume=False
    )

    # warm run (JIT/codegen), small
    warm = generate_source_files(spark, max(2000, N_FILES // 50)).cache()
    warm.count()
    warm_dir = tempfile.mkdtemp(prefix="profile_warm_", dir=BENCH_TMP)
    from pyjelly_spark.pipeline import run_pipeline

    run_pipeline(
        spark, warm,
        PipelineConfig(out_dir=warm_dir, rows_per_stream=100_000, resume=False),
    )
    warm.unpersist()
    shutil.rmtree(warm_dir, ignore_errors=True)

    files = generate_source_files(spark, N_FILES).cache()
    files.count()

    n_reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    for rep in range(n_reps):  # rep 0 pays first-full-size ramp; rest steady
        _run_once(spark, files, out_dir, rep)
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


def _run_once(spark, files, out_dir, rep: int) -> None:
    config = PipelineConfig(
        out_dir=out_dir, rows_per_stream=100_000, resume=False
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    stamps: dict[str, float] = {}
    options = jc.StreamOptions(
        frame_rows=config.frame_rows, preset=config.preset
    )

    if MODE == "fused":
        pins: list = []
        t0 = time.time()
        triples = build_triples(spark, files, config, pin_joins=True, pins=pins)
        stamps["plan_build"] = time.time() - t0  # lazy: Catalyst work only

        t0 = time.time()
        planned = plan_partitions(triples, config)
        # the histogram action materializes the pinned compact frame and
        # the two join branches — i.e. the whole extract/link/CC compute
        stamps["histogram_extract_link_cc"] = time.time() - t0

        t0 = time.time()
        manifest = write_jelly(planned, out_dir, options, resume=False)
        stamps["triplebuild_encode_write"] = time.time() - t0
        from pyjelly_spark.pipeline import _release_pin
        for pinned in pins:
            _release_pin(pinned)
    else:
        t0 = time.time()
        files.select(
            F.xxhash64("repo", "path", "commit", "lang").alias("h")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.min("h"), F.max("h"),
            F.expr("bit_xor(h)"),
        ).collect()
        stamps["digest"] = time.time() - t0

        t0 = time.time()
        triples = build_triples(spark, files, config)
        stamps["plan_build"] = time.time() - t0  # lazy: Catalyst work only

        stage_dir = os.path.join(out_dir, "_stage_triples")
        t0 = time.time()
        flatten_terms(triples).write.mode("overwrite").option(
            "compression", "zstd"
        ).parquet(stage_dir)
        stamps["extract_link_cc_stage"] = time.time() - t0

        t0 = time.time()
        flat = spark.read.parquet(stage_dir)
        planned = plan_partitions(flat, config, pre_flattened=True)
        stamps["plan_partitions"] = time.time() - t0

        t0 = time.time()
        manifest = write_jelly(planned, out_dir, options, resume=False)
        stamps["encode_write"] = time.time() - t0

    n = int(manifest["n_statements"].sum())
    total = sum(stamps.values())
    print(
        f"\nrep={rep} cpus={CPUS} cluster={CLUSTER} mode={MODE} "
        f"n_files={N_FILES} triples={n}"
    )
    for k, v in stamps.items():
        print(f"  {k:24s} {v:8.2f} s  ({100 * v / total:4.1f}%)")
    print(f"  {'TOTAL':24s} {total:8.2f} s  ({n / total:,.0f} triples/s)")


if __name__ == "__main__":
    main()
