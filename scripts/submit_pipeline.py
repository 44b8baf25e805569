"""spark-submit entry point for the KG-construction pipeline.

The north rule (BASELINE.json) requires the job to run via
``spark-submit --py-files`` on a multi-executor cluster. This script is
that entry point: it assumes ``pyjelly_spark`` arrives on the Python
path via ``--py-files`` (a zip built by :func:`build_pyfiles_zip`, or a
wheel/egg on a real deployment) and takes every cluster-shaped knob from
spark-submit conf instead of hard-coding a master.

Usage (local proxy for a 2-executor cluster):

    python scripts/submit_pipeline.py --build-zip dist/pyjelly_spark.zip
    spark-submit --master 'local-cluster[2,4,4096]' \
        --py-files dist/pyjelly_spark.zip \
        --conf spark.sql.shuffle.partitions=16 \
        scripts/submit_pipeline.py --n-files 20000 --output /tmp/kg_out

On a real cluster the master/deploy-mode/conf lines change; this file
does not. Prints one JSON summary line (files, triples, streams, wall)
on success — the per-partition manifest and lineage land next to the
output, written by the pipeline itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_pyfiles_zip(dest: str) -> str:
    """Package pyjelly_spark into a --py-files zip (driver-side helper;
    runs before spark-submit, so it imports from the repo checkout)."""
    import zipfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pyjelly_spark

    pkg_dir = os.path.dirname(os.path.abspath(pyjelly_spark.__file__))
    os.makedirs(os.path.dirname(os.path.abspath(dest)) or ".", exist_ok=True)
    with zipfile.ZipFile(dest, "w") as bundle:
        for root, _dirs, names in os.walk(pkg_dir):
            for name in names:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    rel = os.path.join(
                        "pyjelly_spark", os.path.relpath(full, pkg_dir)
                    )
                    bundle.write(full, rel)
    return dest


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-files", type=int, default=20_000,
                    help="synthetic source-file count (deterministic corpus)")
    ap.add_argument("--output", default=None,
                    help="output directory for Jelly streams + manifest")
    ap.add_argument("--rows-per-stream", type=int, default=25_000)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed repetitions inside ONE session (best-of-N "
                    "reported; executors on a real cluster are long-lived, "
                    "so steady state is the cluster-relevant number)")
    ap.add_argument("--build-zip", metavar="DEST",
                    help="just build the --py-files zip and exit")
    args = ap.parse_args()

    if args.build_zip:
        print(build_pyfiles_zip(args.build_zip))
        return 0

    # Under spark-submit the session already exists (conf comes from the
    # submit line); getOrCreate attaches to it. pyjelly_spark must be
    # importable here — that is exactly what --py-files provides.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pyjelly_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pyjelly_spark.pipeline import PipelineConfig, run_pipeline
    from pyjelly_spark.sources.source_repos import generate_source_files

    import shutil

    out = args.output or os.path.join("/tmp", f"kg_submit_{os.getpid()}")
    files = generate_source_files(spark, args.n_files)
    walls = []
    for rep in range(max(args.reps, 1)):
        if rep:
            shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        manifest = run_pipeline(
            spark,
            files,
            PipelineConfig(
                out_dir=out,
                rows_per_stream=args.rows_per_stream,
                resume=not args.no_resume,
            ),
        )
        walls.append(round(time.time() - t0, 2))
    print(json.dumps({
        "n_files": args.n_files,
        "triples": int(manifest["n_statements"].sum()),
        "streams": len(manifest),
        "output": out,
        "wall_sec": min(walls),
        "walls": walls,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
