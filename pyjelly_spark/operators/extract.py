"""Triple extraction from source-code tables — all JVM-side Catalyst exprs.

Turns the ``source_files`` table into RDF term-struct triples describing
code entities: repo→file containment, file→lang, per-row content sha256
lineage (the invariant from BASELINE.json.input_hint), and import / def /
call mention edges.

Everything here is ``pyspark.sql.functions`` (regexp_extract_all, explode,
sha2, concat): whole-stage codegen end to end, no Python in the hot path.
Filters and the 2-column projections push down to the parquet scan.

IRI scheme (prefix-factoring friendly — shared prefixes split at the last
'/' land in the Jelly prefix table):
  http://kg.example/repo/{repo}
  http://kg.example/file/{repo}/{path}
  http://kg.example/module/{module}
  http://kg.example/symbol/{symbol}
  predicates in http://kg.example/ns#
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

NS = "http://kg.example/ns#"
REPO_BASE = "http://kg.example/repo/"
FILE_BASE = "http://kg.example/file/"
MODULE_BASE = "http://kg.example/module/"
SYMBOL_BASE = "http://kg.example/symbol/"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

P_CONTAINS = NS + "contains"
P_LANG = NS + "lang"
P_SHA256 = NS + "sha256"
P_IMPORTS = NS + "imports"
P_DEFINES = NS + "defines"
P_CALLS = NS + "calls"
P_CALLS_RESOLVED = NS + "callsResolved"
P_IMPORTS_RESOLVED = NS + "importsResolved"
P_CANONICAL = NS + "canonical"

# Mention regexes — shared by all four generated languages. (?m) anchors
# per line; both Java regex (Spark) and RE2 (DuckDB oracle) accept them.
IMPORT_RE = r"(?m)^import\s+[\"']?([A-Za-z0-9_./]+)[\"']?;?\s*$"
DEF_RE = r"(?m)^(?:def|function|void|func)\s+(\w+)\s*\("
CALL_RE = r"(?m)^\s{2}(\w+)\(\)"

TERM_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("value", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("datatype", StringType(), True),
    ]
)


def iri(value: Column) -> Column:
    return F.struct(
        F.lit("iri").alias("kind"),
        value.alias("value"),
        F.lit("").alias("lang"),
        F.lit("").alias("datatype"),
    )


def lit_term(value: Column, lang: str = "", datatype: str = "") -> Column:
    return F.struct(
        F.lit("lit").alias("kind"),
        value.alias("value"),
        F.lit(lang).alias("lang"),
        F.lit(datatype).alias("datatype"),
    )


def file_iri(repo: Column, path: Column) -> Column:
    return F.concat(F.lit(FILE_BASE), repo, F.lit("/"), path)


def repo_iri(repo: Column) -> Column:
    return F.concat(F.lit(REPO_BASE), repo)


def _triple(
    df: DataFrame, s: Column, p: str, o: Column, kind_rank: int
) -> DataFrame:
    """Project a mention frame into the uniform triples schema.

    ``kind_rank`` gives the deterministic intra-file statement order used
    by the encode stage (sortWithinPartitions key, SURVEY.md §4 note 2).
    """
    return df.select(
        F.col("repo"),
        F.col("path"),
        F.lit(kind_rank).cast("int").alias("kind_rank"),
        s.alias("s"),
        iri(F.lit(p)).alias("p"),
        o.alias("o"),
    )


def extract_imports(files: DataFrame) -> DataFrame:
    """file --imports--> module  (slash paths normalized to dotted)."""
    mentions = files.select(
        "repo",
        "path",
        F.explode(F.regexp_extract_all("content", F.lit(IMPORT_RE), F.lit(1))).alias(
            "raw_module"
        ),
    ).withColumn("module", F.replace(F.col("raw_module"), F.lit("/"), F.lit(".")))
    return _triple(
        mentions,
        iri(file_iri(F.col("repo"), F.col("path"))),
        P_IMPORTS,
        iri(F.concat(F.lit(MODULE_BASE), F.col("module"))),
        kind_rank=3,
    )


def extract_defs(files: DataFrame) -> DataFrame:
    """file --defines--> symbol."""
    mentions = files.select(
        "repo",
        "path",
        F.explode(F.regexp_extract_all("content", F.lit(DEF_RE), F.lit(1))).alias(
            "symbol"
        ),
    )
    return _triple(
        mentions,
        iri(file_iri(F.col("repo"), F.col("path"))),
        P_DEFINES,
        iri(F.concat(F.lit(SYMBOL_BASE), F.col("symbol"))),
        kind_rank=4,
    )


def extract_calls(files: DataFrame) -> DataFrame:
    """file --calls--> symbol (unresolved mention; linking resolves it)."""
    mentions = files.select(
        "repo",
        "path",
        F.explode(F.regexp_extract_all("content", F.lit(CALL_RE), F.lit(1))).alias(
            "symbol"
        ),
    )
    return _triple(
        mentions,
        iri(file_iri(F.col("repo"), F.col("path"))),
        P_CALLS,
        iri(F.concat(F.lit(SYMBOL_BASE), F.col("symbol"))),
        kind_rank=5,
    )


def structural_triples(files: DataFrame) -> DataFrame:
    """repo→contains→file, file→lang, file→sha256 (lineage invariant)."""
    contains = _triple(
        files,
        iri(repo_iri(F.col("repo"))),
        P_CONTAINS,
        iri(file_iri(F.col("repo"), F.col("path"))),
        kind_rank=0,
    )
    lang = _triple(
        files,
        iri(file_iri(F.col("repo"), F.col("path"))),
        P_LANG,
        lit_term(F.col("lang")),
        kind_rank=1,
    )
    sha = _triple(
        files,
        iri(file_iri(F.col("repo"), F.col("path"))),
        P_SHA256,
        lit_term(F.sha2(F.col("content"), 256)),
        kind_rank=2,
    )
    return contains.unionByName(lang).unionByName(sha)


def extract_mentions_arrow(files: DataFrame) -> DataFrame:
    """Batched mention detection as a vectorized pandas/Arrow pass.

    Alternative to the per-family Catalyst extractors: one ``mapInPandas``
    sweep emits every (kind, symbol) mention via ``Series.str.findall``
    (vectorized C regex over Arrow batches — no per-row Python). Output
    (repo, path, kind, symbol) matches the union of the regexp_extract_all
    paths exactly (tested); the default pipeline keeps the Catalyst path
    (JVM codegen, no Python transfer), this one exists for UDF-based
    feature extraction that SQL regex can't express.
    """
    import re
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    patterns = [
        ("import", re.compile(IMPORT_RE[4:], re.M)),  # strip inline (?m)
        ("def", re.compile(DEF_RE[4:], re.M)),
        ("call", re.compile(CALL_RE[4:], re.M)),
    ]
    schema = StructType(
        [
            StructField("repo", StringType(), False),
            StructField("path", StringType(), False),
            StructField("kind", StringType(), False),
            StructField("symbol", StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for kind, rx in patterns:
                hits = pdf["content"].str.findall(rx)
                counts = hits.map(len)
                if counts.sum() == 0:
                    continue
                frames.append(
                    pd.DataFrame(
                        {
                            "repo": pdf["repo"].repeat(counts).to_numpy(),
                            "path": pdf["path"].repeat(counts).to_numpy(),
                            "kind": kind,
                            "symbol": [m for row in hits for m in row],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.select("repo", "path", "content").mapInPandas(run, schema=schema)


def extract_compact(files: DataFrame) -> DataFrame:
    """ONE narrow pass over ``content``: per-file sha256 + all mention
    arrays.

    ``(repo, path, lang, sha, imports, defs, calls)`` — everything any
    downstream consumer needs, with ``content`` dropped. The per-family
    extractors above each scan the (cached) corpus separately; unioning
    them costs 6+ bandwidth-bound sweeps of the content column, which is
    exactly the resource that stops scaling first when cores quadruple
    (DRAM locally, the storage fabric on a cluster). Pipelines checkpoint
    this frame (small: no content) and derive triples, the def dictionary,
    and the call mentions from it without ever touching content again.
    """
    return files.select(
        "repo",
        "path",
        "lang",
        F.sha2(F.col("content"), 256).alias("sha"),
        F.regexp_extract_all("content", F.lit(IMPORT_RE), F.lit(1)).alias("imports"),
        F.regexp_extract_all("content", F.lit(DEF_RE), F.lit(1)).alias("defs"),
        F.regexp_extract_all("content", F.lit(CALL_RE), F.lit(1)).alias("calls"),
    )


def triples_from_compact(per_file: DataFrame) -> DataFrame:
    """Compact per-file frame -> the uniform triples frame, zero content
    scans: builds an ``array<struct<kind_rank,s,p,o>>`` per file with
    ``transform`` over the mention arrays and explodes ONCE (one narrow
    stage, no 6-way union of separate corpus scans).
    """

    def _t(kind_rank: int, s: Column, p: str, o: Column) -> Column:
        return F.struct(
            F.lit(kind_rank).cast("int").alias("kind_rank"),
            s.alias("s"),
            iri(F.lit(p)).alias("p"),
            o.alias("o"),
        )

    file_node = iri(file_iri(F.col("repo"), F.col("path")))
    base = F.array(
        _t(0, iri(repo_iri(F.col("repo"))), P_CONTAINS, file_node),
        _t(1, file_node, P_LANG, lit_term(F.col("lang"))),
        _t(2, file_node, P_SHA256, lit_term(F.col("sha"))),
    )
    imports = F.transform(
        F.col("imports"),
        lambda m: _t(
            3,
            file_node,
            P_IMPORTS,
            iri(
                F.concat(
                    F.lit(MODULE_BASE), F.replace(m, F.lit("/"), F.lit("."))
                )
            ),
        ),
    )
    defs = F.transform(
        F.col("defs"),
        lambda sym: _t(
            4, file_node, P_DEFINES, iri(F.concat(F.lit(SYMBOL_BASE), sym))
        ),
    )
    calls = F.transform(
        F.col("calls"),
        lambda sym: _t(
            5, file_node, P_CALLS, iri(F.concat(F.lit(SYMBOL_BASE), sym))
        ),
    )
    return per_file.select(
        "repo",
        "path",
        F.explode(F.concat(base, imports, defs, calls)).alias("t"),
    ).select(
        "repo",
        "path",
        F.col("t.kind_rank").alias("kind_rank"),
        F.col("t.s").alias("s"),
        F.col("t.p").alias("p"),
        F.col("t.o").alias("o"),
    )


def extract_all(files: DataFrame) -> DataFrame:
    """Full mention extraction, single content scan.

    Returns the uniform triples frame
    ``(repo, path, kind_rank, s, p, o)``; deterministic statement order is
    (repo, path, kind_rank, o.value). Row set is identical to unioning
    ``structural_triples`` + the three per-family extractors (tested);
    the plan reads content once instead of six times.
    """
    return triples_from_compact(extract_compact(files))
