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
from pyjelly_spark.operators.components import connected_components
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
    broadcast_dictionary: bool = True
    resume: bool = True
    min_parts: int = 1


def _mentions(files: DataFrame, pattern: str) -> DataFrame:
    return files.select(
        "repo",
        "path",
        F.explode(F.regexp_extract_all("content", F.lit(pattern), F.lit(1))).alias(
            "symbol"
        ),
    )


def build_triples(
    spark: SparkSession, files: DataFrame, config: PipelineConfig
) -> DataFrame:
    """All pipeline triples in the uniform (repo, path, kind_rank, s, p, o)
    frame."""
    triples = X.extract_all(files)

    defs = _mentions(files, X.DEF_RE).select(
        F.col("repo").alias("def_repo"),
        F.col("path").alias("def_path"),
        "symbol",
    )

    if config.link_calls:
        calls = _mentions(files, X.CALL_RE)
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
        edges = colliding.select(
            def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")).alias(
                "src"
            ),
            F.concat(F.lit(SYMBOL_BASE), F.col("symbol")).alias("dst"),
        )
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


def plan_partitions(triples: DataFrame, config: PipelineConfig) -> DataFrame:
    """Skew-aware partition plan: flat term columns, deterministic order.

    Salt count per repo = ceil(repo_triples / rows_per_stream), so the
    mega-repo fans out over several streams while small repos coalesce.
    The per-repo histogram is tiny (one row per repo) -> broadcast join.
    """
    counts = triples.groupBy("repo").agg(F.count(F.lit(1)).alias("repo_rows"))
    salted = triples.join(F.broadcast(counts), "repo").withColumn(
        "salt",
        F.pmod(
            F.xxhash64("path"),
            F.greatest(
                F.ceil(F.col("repo_rows") / config.rows_per_stream), F.lit(1)
            ),
        ).cast("int"),
    )
    total = triples.count()
    n_parts = max(config.min_parts, -(-total // config.rows_per_stream))
    flat = flatten_terms(salted.drop("repo_rows"))
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

    The triples frame is persisted across the two actions (partition-plan
    count + materialize) — without it the whole extract/link/CC DAG would
    execute twice.
    """
    triples = build_triples(spark, files, config).persist()
    try:
        planned = plan_partitions(triples, config)
        options = jc.StreamOptions(
            frame_rows=config.frame_rows, preset=config.preset
        )
        return write_jelly(planned, config.out_dir, options, resume=config.resume)
    finally:
        triples.unpersist()


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
