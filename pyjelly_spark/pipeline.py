"""End-to-end KG construction: source table -> triples -> Jelly streams.

Stages (BASELINE.json north_rule):
  1. extract     — mention detection + structural triples (extract.py)
  2. link        — call mentions resolved to def sites (linking.py)
  3. canonicalize— symbol collision graph -> connected components ->
                   canonical-entity triples (components.py)
  4. materialize — skew-aware partitioning, deterministic in-partition
                   order, one Jelly stream per partition with manifest
                   lineage (jelly_io.py); checkpoint-resumable.

Scale design:
- extraction/linking/CC are declarative -> Catalyst handles pushdown,
  broadcast choice, AQE skew splitting;
- materialization partitions by (repo, salt): salt splits mega-repos
  into bounded streams (each salted slice is an independent, valid Jelly
  stream — allowed because streams are self-contained);
- partition assignment is an explicit hash of (repo, salt), so a resumed
  run reproduces identical partition contents (no sampling-based range
  partitioner in the resume path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyjelly_spark.jelly import constants as jc
from pyjelly_spark.operators import extract as X
from pyjelly_spark.operators.components import (
    connected_components,
    star_components,
)
from pyjelly_spark.operators.extract import SYMBOL_BASE
from pyjelly_spark.operators.linking import (
    def_site_iri,
    link_mentions,
    resolved_call_triples,
)
from pyjelly_spark.sources.jelly_io import flatten_terms, write_jelly


@dataclass
class PipelineConfig:
    out_dir: str
    rows_per_stream: int = 200_000  # triples per output Jelly stream
    frame_rows: int = jc.DEFAULT_FRAME_ROWS
    preset: jc.TablePreset = field(default_factory=jc.TablePreset)
    link_calls: bool = True
    canonicalize: bool = True
    # False = let AQE pick the join strategy: the def dictionaries grow
    # with the corpus (one row per (symbol, repo, pkg)), so a forced
    # broadcast turns into a driver collect of millions of rows per pass.
    # AQE still auto-broadcasts them while they fit the threshold.
    broadcast_dictionary: bool = False
    resume: bool = True
    min_parts: int = 1
    # True = canonicalization uses the closed-form star CC: the
    # def-collision graph is a disjoint union of stars BY CONSTRUCTION
    # (def_site_iri embeds its symbol, so no def-site node can bridge
    # two symbol hubs), for which connected components is one hub-keyed
    # aggregation instead of O(log n) latency-bound rounds — the rounds
    # were ~8 s of core-count-invariant wall per job at every level
    # (BENCH.md §2.3). False falls back to the general iterative
    # operator (identical assignment, verified under test).
    structural_cc: bool = True


def build_triples(
    spark: SparkSession, files: DataFrame, config: PipelineConfig
) -> DataFrame:
    """All pipeline triples in the uniform (repo, path, kind_rank, s, p, o)
    frame."""
    compact = X.extract_compact(files)
    if config.link_calls or config.canonicalize:
        # The compact frame feeds the triples build, the link dictionary,
        # the CC edge build, AND the canonical join — without a checkpoint
        # each consumer re-runs the content sweep over the whole corpus.
        # It is narrow (sha + mention arrays, no content), so pinning it
        # is cheap — unlike the wide struct triples frame, which is
        # deliberately staged to parquet instead (see run_pipeline).
        compact = compact.localCheckpoint(eager=False)
    triples = X.triples_from_compact(compact)

    defs = compact.select(
        F.col("repo").alias("def_repo"),
        F.col("path").alias("def_path"),
        F.explode("defs").alias("symbol"),
    )

    if config.link_calls:
        calls = compact.select(
            "repo", "path", F.explode("calls").alias("symbol")
        )
        linked = link_mentions(
            calls, defs, broadcast_dictionary=config.broadcast_dictionary
        )
        triples = triples.unionByName(resolved_call_triples(linked))

    if config.canonicalize:
        # Symbols defined at multiple sites form equivalence classes: every
        # def site of symbol S links to the symbol node, and connected
        # components elect one canonical def site per class.
        multi = defs.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_sites"))
        colliding = defs.join(
            F.broadcast(multi.where(F.col("n_sites") > 1).select("symbol")),
            "symbol",
        )
        # STAR-FOREST INVARIANT (star_components depends on this
        # construction): src = def_site_iri(...) EMBEDS its symbol, so a
        # def-site node can never attach to two symbol hubs, and src/dst
        # live in disjoint IRI namespaces (def-site vs SYMBOL_BASE), so
        # no node appears on both sides. If you change either line,
        # star_components silently returns wrong components — which is
        # why the call below runs with check_invariant=True (a 1-row
        # scalar guard that fails the job loudly instead).
        edges = colliding.select(
            def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")).alias(
                "src"
            ),
            F.concat(F.lit(SYMBOL_BASE), F.col("symbol")).alias("dst"),
        )
        if config.structural_cc:
            # Star-forest closed form (see PipelineConfig.structural_cc).
            assignment = star_components(edges, check_invariant=True)
        else:
            assignment = connected_components(edges)
        canonical = (
            colliding.withColumn(
                "node",
                def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")),
            )
            .join(assignment, "node")
            .select(
                F.col("def_repo").alias("repo"),
                F.col("def_path").alias("path"),
                F.lit(7).cast("int").alias("kind_rank"),
                X.iri(F.col("node")).alias("s"),
                X.iri(F.lit(X.P_CANONICAL)).alias("p"),
                X.iri(F.col("component")).alias("o"),
            )
        )
        triples = triples.unionByName(canonical)

    return triples


def plan_partitions(
    triples: DataFrame, config: PipelineConfig, pre_flattened: bool = False
) -> DataFrame:
    """Skew-aware partition plan: flat term columns, deterministic order.

    Salt count per repo = ceil(repo_triples / rows_per_stream), so the
    mega-repo fans out over several streams while small repos coalesce.

    One histogram action, driver-bounded: the aggregate returns the
    global total plus ONLY the mega-repos (repo_rows > rows_per_stream)
    — ``collect_list`` drops the nulls the ``when`` leaves for small
    repos — so the driver holds at most total/rows_per_stream entries no
    matter how many repos exist (a 10^6-repo corpus collects only its
    oversized tail). Small repos default to salt count 1 via a broadcast
    left join + coalesce, which is exactly their ceil() anyway.
    """
    spark = triples.sparkSession
    agg = (
        triples.groupBy("repo")
        .agg(F.count(F.lit(1)).alias("repo_rows"))
        .agg(
            F.sum("repo_rows").alias("total"),
            F.collect_list(
                F.when(
                    F.col("repo_rows") > config.rows_per_stream,
                    F.struct("repo", "repo_rows"),
                )
            ).alias("big"),
        )
        .collect()[0]
    )
    total = int(agg["total"] or 0)
    n_parts = max(config.min_parts, -(-total // config.rows_per_stream))
    big = agg["big"] or []
    if big:
        salt_map = spark.createDataFrame(
            [
                (r["repo"], -(-int(r["repo_rows"]) // config.rows_per_stream))
                for r in big
            ],
            "repo: string, n_salts: long",
        )
        salted = triples.join(F.broadcast(salt_map), "repo", "left").withColumn(
            "n_salts", F.coalesce(F.col("n_salts"), F.lit(1).cast("long"))
        )
    else:
        salted = triples.withColumn("n_salts", F.lit(1).cast("long"))
    salted = salted.withColumn(
        "salt", F.pmod(F.xxhash64("path"), F.col("n_salts")).cast("int")
    ).drop("n_salts")
    flat = salted if pre_flattened else flatten_terms(salted)
    return (
        flat.repartition(n_parts, "repo", "salt")
        .sortWithinPartitions("repo", "path", "kind_rank", "o_value")
    )


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    config: PipelineConfig,
) -> pd.DataFrame:
    """Execute all stages; returns the partition manifest (pandas).

    The extract/link/canonicalize DAG executes exactly ONCE: the flat
    triples are materialized to a parquet stage directory (an explicit
    stage boundary under out_dir), and the histogram + encode passes run
    as cheap scans over that leaf. This beats both recomputation (double
    planning + compute) and .persist() (columnar cache build for millions
    of term structs costs more than the parquet round-trip), and doubles
    as a resumable checkpoint of the relational half of the job.
    """
    import json
    import os
    import shutil

    triples = build_triples(spark, files, config)
    stage_dir = os.path.join(config.out_dir, "_stage_triples")
    marker = os.path.join(stage_dir, "_SUCCESS")
    stage_meta_path = os.path.join(config.out_dir, "_stage_meta.json")
    out_meta_path = os.path.join(config.out_dir, "_out_meta.json")
    # Two-level resume guard:
    # - stage_meta fingerprints what the STAGED TRIPLES depend on: an
    #   input content digest (count + min/max/xor of xxhash64 over
    #   repo/path/commit/lang — one aggregate job, catches content
    #   changes that keep the row count) plus the stage-shaping knobs;
    # - out_meta fingerprints what the JELLY BYTES additionally depend on
    #   (partitioning + framing + lookup presets), so changing e.g.
    #   frame_rows invalidates the streams without rebuilding extraction.
    digest = (
        files.select(
            F.xxhash64("repo", "path", "commit", "lang").alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("h").alias("mn"),
            F.max("h").alias("mx"),
            F.expr("bit_xor(h)").alias("xo"),
        )
        .collect()[0]
    )
    stage_meta = {
        "input_digest": f"{digest['n']}:{digest['mn']}:{digest['mx']}:{digest['xo']}",
        "link_calls": config.link_calls,
        "canonicalize": config.canonicalize,
    }
    out_meta = {
        "rows_per_stream": config.rows_per_stream,
        "frame_rows": config.frame_rows,
        "preset": [
            config.preset.names,
            config.preset.prefixes,
            config.preset.datatypes,
        ],
        "min_parts": config.min_parts,
    }

    def _meta_matches(path: str, expected: dict) -> bool:
        if not os.path.exists(path):
            return False
        with open(path) as handle:
            return json.load(handle) == expected

    def _wipe_outputs() -> None:
        # stale streams' manifest shas still match their stale bytes, so
        # they must go whenever their inputs or knobs changed
        from pyjelly_spark.sources.jelly_io import manifest_path

        if os.path.isdir(config.out_dir):
            shutil.rmtree(manifest_path(config.out_dir), ignore_errors=True)
            for name in os.listdir(config.out_dir):
                if name.endswith(".jelly"):
                    os.remove(os.path.join(config.out_dir, name))

    stage_ok = (
        config.resume
        and os.path.exists(marker)
        and _meta_matches(stage_meta_path, stage_meta)
    )
    if not stage_ok:
        _wipe_outputs()
        flatten_terms(triples).write.mode("overwrite").parquet(stage_dir)
        os.makedirs(config.out_dir, exist_ok=True)
        with open(stage_meta_path, "w") as handle:
            json.dump(stage_meta, handle)
        with open(out_meta_path, "w") as handle:
            json.dump(out_meta, handle)
    elif not _meta_matches(out_meta_path, out_meta):
        _wipe_outputs()
        with open(out_meta_path, "w") as handle:
            json.dump(out_meta, handle)
    flat = spark.read.parquet(stage_dir)
    planned = plan_partitions(flat, config, pre_flattened=True)
    options = jc.StreamOptions(frame_rows=config.frame_rows, preset=config.preset)
    manifest = write_jelly(planned, config.out_dir, options, resume=config.resume)
    if not config.resume:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return manifest


def verify_lineage(
    spark: SparkSession, files: DataFrame, out_dir: str
) -> tuple:
    """Per-row invariant: sha256(content) of every source row must appear
    as that file's kg:sha256 triple in the materialized streams.

    Returns (n_source_rows, n_matched).
    """
    from pyjelly_spark.sources.jelly_io import read_jelly

    expected = files.select(
        X.file_iri(F.col("repo"), F.col("path")).alias("file_node"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )
    decoded = read_jelly(spark, out_dir)
    actual = decoded.where(F.col("p_value") == X.P_SHA256).select(
        F.col("s_value").alias("file_node"), F.col("o_value").alias("stream_sha")
    )
    joined = expected.join(actual, "file_node", "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("content_sha") == F.col("stream_sha")).cast("long")).alias(
            "matched"
        ),
    ).collect()[0]
    return agg["total"], agg["matched"]
