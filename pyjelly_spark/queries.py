"""Driver-facing query registry: Spark queries + DuckDB oracle SQL.

Every implemented operator family (SURVEY.md §2 + the training-data ops)
is exposed as a named query ``(spark, sf_dir) -> DataFrame`` together
with an ANSI-SQL oracle that DuckDB runs on the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Column names/aliases match exactly on both sides;
value-bearing doubles use floor-scaling (``floor(x*10000)/10000``) so no
rounding-mode divergence exists between engines.

KG queries run over a *derived* source-code table built in closed form
from ``documents.doc_id`` (same derivation in Spark and SQL), so the
extraction/linking/canonicalization semantics are checked against
independently-computed ground truth, not a re-run of the same regexes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyjelly_spark.functions import text as T
from pyjelly_spark.operators import dedup as D
from pyjelly_spark.operators import extract as X
from pyjelly_spark.operators import multimodal as MM
from pyjelly_spark.operators import similarity as SIM
from pyjelly_spark.operators.components import connected_components
from pyjelly_spark.operators.linking import def_site_iri, link_mentions


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _f4(c: Column) -> Column:
    return F.floor(c * 10000) / 10000


# ---------------------------------------------------------------------------
# Derived source-code table (closed form from documents.doc_id)
# ---------------------------------------------------------------------------


def derived_source_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg-shaped (repo, path, commit, lang, content) table derived
    deterministically from doc_id — same closed form as SRC_SQL below."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    i = F.col("doc_id")
    repo = F.concat(F.lit("repo-0"), (i % 7).cast("string"))
    path = F.concat(
        F.lit("src/pkg"), (i % 13).cast("string"), F.lit("/mod_"),
        i.cast("string"), F.lit(".py"),
    )
    lines = []
    for k in (1, 2, 3):  # k-th import present when doc_id % 3 >= k-1
        t = (i * 31 + k * 17 + 1) % n
        line = F.concat(
            F.lit("import pkg"), (t % 13).cast("string"),
            F.lit(".mod_"), t.cast("string"),
        )
        lines.append(F.when(i % 3 >= k - 1, line))
    lines.append(F.concat(F.lit("def f_"), i.cast("string"), F.lit("_0():")))
    lines.append(
        F.when(
            i % 2 == 0,
            F.concat(F.lit("def shared_"), (i % 50).cast("string"), F.lit("():")),
        )
    )
    for k in (1, 2, 3, 4):  # k-th call present when doc_id % 4 >= k-1
        t = (i * 13 + k * 7 + 3) % n
        lines.append(
            F.when(
                i % 4 >= k - 1,
                F.concat(F.lit("  f_"), t.cast("string"), F.lit("_0()")),
            )
        )
    lines.append(
        F.concat(F.lit("  shared_"), ((i + 1) % 50).cast("string"), F.lit("()"))
    )
    content = F.concat_ws("\n", *lines)
    return docs.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(repo, F.lit(":"), path), 256), 1, 40).alias(
            "commit"
        ),
        F.lit("python").alias("lang"),
        content.alias("content"),
    )


def derived_source_files_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot 2 of the derived source table, for incremental-KG tests:
    files with ``doc_id % 17 == 3`` are deleted, files with
    ``doc_id % 10 == 0`` gain one import line (``t = (7*doc_id + 5) % n``)
    — so content sha256 changes exactly for the modified files. Every
    other file is byte-identical to snapshot 1."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    i = F.col("doc_id")
    base = derived_source_files(spark, sf_dir).withColumn(
        "doc_id", F.regexp_extract("path", r"/mod_(\d+)\.py$", 1).cast("long")
    )
    t = (i * 7 + 5) % n
    extra = F.concat(
        F.lit("import pkg"), (t % 13).cast("string"),
        F.lit(".mod_"), t.cast("string"),
    )
    return (
        base.where(i % 17 != 3)
        .withColumn(
            "content",
            F.when(
                i % 10 == 0, F.concat(F.col("content"), F.lit("\n"), extra)
            ).otherwise(F.col("content")),
        )
        .drop("doc_id")
    )


# The same derivation as a DuckDB CTE. Keeps doc_id + n so downstream
# closed-form CTEs (imports/defs/calls ground truth) can reuse them.
SRC_SQL = """
src AS (
  SELECT d.doc_id AS doc_id, nn.n AS n,
    'repo-0' || (d.doc_id % 7) AS repo,
    'src/pkg' || (d.doc_id % 13) || '/mod_' || d.doc_id || '.py' AS path,
    concat_ws(chr(10),
      'import pkg' || (((d.doc_id*31 + 18) % nn.n) % 13) || '.mod_' || ((d.doc_id*31 + 18) % nn.n),
      CASE WHEN d.doc_id % 3 >= 1 THEN 'import pkg' || (((d.doc_id*31 + 35) % nn.n) % 13) || '.mod_' || ((d.doc_id*31 + 35) % nn.n) END,
      CASE WHEN d.doc_id % 3 >= 2 THEN 'import pkg' || (((d.doc_id*31 + 52) % nn.n) % 13) || '.mod_' || ((d.doc_id*31 + 52) % nn.n) END,
      'def f_' || d.doc_id || '_0():',
      CASE WHEN d.doc_id % 2 = 0 THEN 'def shared_' || (d.doc_id % 50) || '():' END,
      '  f_' || ((d.doc_id*13 + 10) % nn.n) || '_0()',
      CASE WHEN d.doc_id % 4 >= 1 THEN '  f_' || ((d.doc_id*13 + 17) % nn.n) || '_0()' END,
      CASE WHEN d.doc_id % 4 >= 2 THEN '  f_' || ((d.doc_id*13 + 24) % nn.n) || '_0()' END,
      CASE WHEN d.doc_id % 4 >= 3 THEN '  f_' || ((d.doc_id*13 + 31) % nn.n) || '_0()' END,
      '  shared_' || ((d.doc_id + 1) % 50) || '()'
    ) AS content
  FROM documents d, (SELECT count(*)::BIGINT AS n FROM documents) nn
),
files AS (
  SELECT doc_id, n, repo, path,
    'http://kg.example/file/' || repo || '/' || path AS file_iri,
    content
  FROM src
)
"""

# closed-form ground-truth mention CTEs (independent of the regex path)
MENTIONS_SQL = """
imports_gt AS (
  SELECT file_iri, t FROM (
    SELECT file_iri, unnest([
      (doc_id*31 + 18) % n,
      CASE WHEN doc_id % 3 >= 1 THEN (doc_id*31 + 35) % n END,
      CASE WHEN doc_id % 3 >= 2 THEN (doc_id*31 + 52) % n END
    ]) AS t FROM files
  ) WHERE t IS NOT NULL
),
defs_gt AS (
  SELECT doc_id, repo, path, file_iri, 'f_' || doc_id || '_0' AS symbol FROM files
  UNION ALL
  SELECT doc_id, repo, path, file_iri, 'shared_' || (doc_id % 50) AS symbol
  FROM files WHERE doc_id % 2 = 0
),
calls_gt AS (
  SELECT doc_id, repo, path, file_iri, symbol FROM (
    SELECT doc_id, repo, path, file_iri, unnest([
      'f_' || ((doc_id*13 + 10) % n) || '_0',
      CASE WHEN doc_id % 4 >= 1 THEN 'f_' || ((doc_id*13 + 17) % n) || '_0' END,
      CASE WHEN doc_id % 4 >= 2 THEN 'f_' || ((doc_id*13 + 24) % n) || '_0' END,
      CASE WHEN doc_id % 4 >= 3 THEN 'f_' || ((doc_id*13 + 31) % n) || '_0' END,
      'shared_' || ((doc_id + 1) % 50)
    ]) AS symbol FROM files
  ) WHERE symbol IS NOT NULL
)
"""

NS = X.NS


def _spo(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("s.value").alias("s"),
        F.col("p.value").alias("p"),
        F.col("o.value").alias("o"),
    )


def q_kg_structural(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spo(X.structural_triples(derived_source_files(spark, sf_dir)))


SQL_KG_STRUCTURAL = f"""
WITH {SRC_SQL}
SELECT 'http://kg.example/repo/' || repo AS s, '{NS}contains' AS p, file_iri AS o FROM files
UNION ALL
SELECT file_iri AS s, '{NS}lang' AS p, 'python' AS o FROM files
UNION ALL
SELECT file_iri AS s, '{NS}sha256' AS p, sha256(content) AS o FROM files
"""


def q_kg_imports(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spo(X.extract_imports(derived_source_files(spark, sf_dir)))


SQL_KG_IMPORTS = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()}
SELECT file_iri AS s, '{NS}imports' AS p,
       'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t AS o
FROM imports_gt
"""


def q_kg_defs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spo(X.extract_defs(derived_source_files(spark, sf_dir)))


SQL_KG_DEFS = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()}
SELECT file_iri AS s, '{NS}defines' AS p,
       'http://kg.example/symbol/' || symbol AS o
FROM defs_gt
"""


def q_kg_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spo(X.extract_calls(derived_source_files(spark, sf_dir)))


SQL_KG_CALLS = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()}
SELECT file_iri AS s, '{NS}calls' AS p,
       'http://kg.example/symbol/' || symbol AS o
FROM calls_gt
"""


# The full extract_all triple union (structural + imports + defs + calls)
# as a reusable oracle CTE — the declarative dual of
# `_spo(X.extract_all(...))`.
ALL_TRIPLES_CTE = f"""
triples AS (
  SELECT 'http://kg.example/repo/' || repo AS s, '{NS}contains' AS p, file_iri AS o FROM files
  UNION ALL SELECT file_iri, '{NS}lang', 'python' FROM files
  UNION ALL SELECT file_iri, '{NS}sha256', sha256(content) FROM files
  UNION ALL SELECT file_iri, '{NS}imports',
    'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t FROM imports_gt
  UNION ALL SELECT file_iri, '{NS}defines',
    'http://kg.example/symbol/' || symbol FROM defs_gt
  UNION ALL SELECT file_iri, '{NS}calls',
    'http://kg.example/symbol/' || symbol FROM calls_gt
)
""".strip()


def q_kg_charsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic-set statistics over the constructed KG — the
    per-subject predicate-signature histogram BGP optimizers use for
    multi-join cardinality estimation (operators/bgp.py::
    characteristic_sets, after Neumann & Moerkotte ICDE 2011)."""
    from pyjelly_spark.operators.bgp import characteristic_sets

    return characteristic_sets(
        _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    )


SQL_KG_CHARSETS = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
{ALL_TRIPLES_CTE},
ps AS (SELECT DISTINCT s, p FROM triples),
cs AS (SELECT s, string_agg(p, ',' ORDER BY p) AS charset FROM ps GROUP BY s),
nt AS (SELECT s, count(*)::BIGINT AS nt FROM triples GROUP BY s)
SELECT charset, count(*)::BIGINT AS n_subjects, sum(nt)::BIGINT AS n_triples
FROM cs JOIN nt USING (s)
GROUP BY charset ORDER BY charset
"""


def q_kg_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SchemEX-style quotient graph of the constructed KG: summary
    edges between characteristic-set classes, with objects that are not
    subjects collapsing to the ``<lit>`` leaf class
    (operators/bgp.py::summarize_graph)."""
    from pyjelly_spark.operators.bgp import summarize_graph

    return summarize_graph(_spo(X.extract_all(derived_source_files(spark, sf_dir))))


SQL_KG_SUMMARY = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
{ALL_TRIPLES_CTE},
ps AS (SELECT DISTINCT s, p FROM triples),
cls AS (SELECT s, string_agg(p, ',' ORDER BY p) AS charset FROM ps GROUP BY s)
SELECT c1.charset AS src_class, t.p,
       coalesce(c2.charset, '<lit>') AS dst_class,
       count(*)::BIGINT AS n_edges
FROM triples t
JOIN cls c1 ON t.s = c1.s
LEFT JOIN cls c2 ON t.o = c2.s
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_kg_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned KG store with time travel
    (sources/kg_store.py): commit the v1 and v2 triple sets as
    immutable snapshots (manifest-log commit point), then diff them at
    the triple level — the adds are v2's new sha256/import rows, the
    dels everything belonging to deleted files plus superseded shas.
    The oracle reconstructs both snapshots in closed form and closes
    the delta with EXCEPTs."""
    import shutil
    import tempfile

    from pyjelly_spark.sources.kg_store import diff_snapshots, write_kg_snapshot

    v1 = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    v2 = _spo(X.extract_all(derived_source_files_v2(spark, sf_dir)))
    path = tempfile.mkdtemp(prefix="kg_snap_")
    try:
        assert write_kg_snapshot(v1, path) == 1
        assert write_kg_snapshot(v2, path) == 2
        result = (
            diff_snapshots(spark, path, 1, 2)
            .orderBy("op", "s", "p", "o")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return result


SQL_KG_TIMETRAVEL = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
{ALL_TRIPLES_CTE},
files2 AS (
  SELECT doc_id, n, repo, path, file_iri,
    CASE WHEN doc_id % 10 = 0
      THEN content || chr(10) || 'import pkg' || (((doc_id*7 + 5) % n) % 13)
           || '.mod_' || ((doc_id*7 + 5) % n)
      ELSE content END AS content
  FROM files WHERE doc_id % 17 <> 3
),
surv AS (SELECT file_iri FROM files WHERE doc_id % 17 <> 3),
imports2 AS (
  SELECT i.file_iri, i.t
  FROM imports_gt i JOIN surv s ON i.file_iri = s.file_iri
  UNION
  SELECT file_iri, (doc_id*7 + 5) % n AS t FROM files2 WHERE doc_id % 10 = 0
),
triples2 AS (
  SELECT 'http://kg.example/repo/' || repo AS s, '{NS}contains' AS p, file_iri AS o FROM files2
  UNION ALL SELECT file_iri, '{NS}lang', 'python' FROM files2
  UNION ALL SELECT file_iri, '{NS}sha256', sha256(content) FROM files2
  UNION ALL SELECT file_iri, '{NS}imports',
    'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t FROM imports2
  UNION ALL SELECT d.file_iri, '{NS}defines',
    'http://kg.example/symbol/' || d.symbol
    FROM defs_gt d JOIN surv s ON d.file_iri = s.file_iri
  UNION ALL SELECT c.file_iri, '{NS}calls',
    'http://kg.example/symbol/' || c.symbol
    FROM calls_gt c JOIN surv s ON c.file_iri = s.file_iri
),
added AS (SELECT s, p, o FROM triples2 EXCEPT SELECT s, p, o FROM triples),
removed AS (SELECT s, p, o FROM triples EXCEPT SELECT s, p, o FROM triples2)
SELECT 'add' AS op, s, p, o FROM added
UNION ALL
SELECT 'del' AS op, s, p, o FROM removed
ORDER BY op, s, p, o
"""


def q_kg_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-predicate triple-count
    view of KG v1, maintained to v2 by applying ONLY the snapshot
    delta (operators/cdc.py::maintain_counts over the diff_snapshots-
    shaped add/del stream) — never rescanning the base. The oracle
    recomputes v2's counts from scratch in closed form; the gate
    proves maintained == recomputed."""
    from pyjelly_spark.operators.cdc import maintain_counts

    v1 = _spo(X.extract_all(derived_source_files(spark, sf_dir))).distinct()
    v2 = _spo(X.extract_all(derived_source_files_v2(spark, sf_dir))).distinct()
    view = v1.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
    delta = (
        v2.join(v1, ["s", "p", "o"], "left_anti")
        .select(F.lit("add").alias("op"), "p")
        .unionByName(
            v1.join(v2, ["s", "p", "o"], "left_anti")
            .select(F.lit("del").alias("op"), "p")
        )
    )
    return maintain_counts(view, delta, ["p"]).orderBy("p")


SQL_KG_IVM = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
files2 AS (
  SELECT doc_id, n, repo, path, file_iri, content
  FROM files WHERE doc_id % 17 <> 3
),
imports2 AS (
  SELECT i.file_iri, i.t
  FROM imports_gt i JOIN files2 f ON i.file_iri = f.file_iri
  UNION
  SELECT file_iri, (doc_id*7 + 5) % n AS t FROM files2 WHERE doc_id % 10 = 0
),
counts2 AS (
  SELECT '{NS}contains' AS p, count(*) AS n FROM files2
  UNION ALL SELECT '{NS}lang', count(*) FROM files2
  UNION ALL SELECT '{NS}sha256', count(*) FROM files2
  UNION ALL SELECT '{NS}imports', count(*) FROM imports2
  UNION ALL SELECT '{NS}defines', count(*)
    FROM defs_gt d JOIN files2 f ON d.file_iri = f.file_iri
  UNION ALL SELECT '{NS}calls', count(*)
    FROM calls_gt c JOIN files2 f ON c.file_iri = f.file_iri
)
SELECT p, n::BIGINT AS n FROM counts2 WHERE n > 0 ORDER BY p
"""


def q_kg_void(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3C VoID property-partition descriptors for the constructed KG:
    per predicate, void:triples / void:distinctSubjects /
    void:distinctObjects (operators/bgp.py::void_stats)."""
    from pyjelly_spark.operators.bgp import void_stats

    return void_stats(_spo(X.extract_all(derived_source_files(spark, sf_dir))))


SQL_KG_VOID = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
{ALL_TRIPLES_CTE}
SELECT p, count(*)::BIGINT AS n_triples,
       count(DISTINCT s)::BIGINT AS n_subjects,
       count(DISTINCT o)::BIGINT AS n_objects
FROM triples GROUP BY p ORDER BY p
"""


def _mention_frames(spark: SparkSession, sf_dir: str):
    files = derived_source_files(spark, sf_dir)
    calls = files.select(
        "repo",
        "path",
        F.explode(
            F.regexp_extract_all("content", F.lit(X.CALL_RE), F.lit(1))
        ).alias("symbol"),
    )
    defs = files.select(
        F.col("repo").alias("def_repo"),
        F.col("path").alias("def_path"),
        F.explode(
            F.regexp_extract_all("content", F.lit(X.DEF_RE), F.lit(1))
        ).alias("symbol"),
    )
    return calls, defs


def q_kg_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    calls, defs = _mention_frames(spark, sf_dir)
    linked = link_mentions(calls, defs, broadcast_dictionary=True)
    return linked.select(
        "repo", "path", "symbol", "def_repo", "def_path",
        F.col("link_score").cast("long").alias("link_score"),
    )


SQL_KG_LINKED = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
cand AS (
  SELECT c.repo, c.path, c.symbol,
         d.repo AS def_repo, d.path AS def_path,
         (CASE WHEN c.repo = d.repo THEN 100 ELSE 0 END
          + CASE WHEN (c.doc_id % 13) = (d.doc_id % 13) THEN 10 ELSE 0 END)::BIGINT AS link_score
  FROM calls_gt c JOIN defs_gt d ON c.symbol = d.symbol
),
win AS (
  SELECT *, row_number() OVER (
    PARTITION BY repo, path, symbol
    ORDER BY link_score DESC, def_repo ASC, def_path ASC
  ) AS rn FROM cand
)
SELECT repo, path, symbol, def_repo, def_path, link_score FROM win WHERE rn = 1
"""


def _closed_form_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic ground-truth winner links — the Spark twin of
    SQL_KG_LINKED's CTEs, derived purely from doc_id arithmetic with no
    regex extraction anywhere, so comparing it against the pipeline
    measures the pipeline (extract + dictionary linking) and not
    itself."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    i = F.col("doc_id")
    base = docs.select(
        "doc_id",
        F.concat(F.lit("repo-0"), (i % 7).cast("string")).alias("repo"),
        F.concat(
            F.lit("src/pkg"), (i % 13).cast("string"),
            F.lit("/mod_"), i.cast("string"), F.lit(".py"),
        ).alias("path"),
    )
    # explode of conditional branches instead of per-branch unions: the
    # base derivation plans once (same trick as negative_samples)
    f_sym = F.concat(F.lit("f_"), i.cast("string"), F.lit("_0"))
    shared_def = F.when(
        i % 2 == 0, F.concat(F.lit("shared_"), (i % 50).cast("string"))
    )
    defs = (
        base.select(
            "doc_id", "repo", "path",
            F.explode(F.array(f_sym, shared_def)).alias("symbol"),
        )
        .where(F.col("symbol").isNotNull())
    )
    call_branches = []
    for off, gate in ((10, None), (17, 1), (24, 2), (31, 3)):
        t = (i * 13 + off) % n
        sym = F.concat(F.lit("f_"), t.cast("string"), F.lit("_0"))
        call_branches.append(sym if gate is None else F.when(i % 4 >= gate, sym))
    call_branches.append(F.concat(F.lit("shared_"), ((i + 1) % 50).cast("string")))
    calls = (
        base.select(
            "doc_id", "repo", "path",
            F.explode(F.array(*call_branches)).alias("symbol"),
        )
        .where(F.col("symbol").isNotNull())
    )
    cand = calls.alias("c").join(defs.alias("d"), "symbol").select(
        F.col("c.repo").alias("repo"),
        F.col("c.path").alias("path"),
        F.col("symbol"),
        F.col("d.repo").alias("def_repo"),
        F.col("d.path").alias("def_path"),
        (
            F.when(F.col("c.repo") == F.col("d.repo"), 100).otherwise(0)
            + F.when(F.col("c.doc_id") % 13 == F.col("d.doc_id") % 13, 10).otherwise(0)
        ).cast("long").alias("link_score"),
    )
    w = Window.partitionBy("repo", "path", "symbol").orderBy(
        F.col("link_score").desc(), F.col("def_repo").asc(), F.col("def_path").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("repo", "path", "symbol", "def_repo", "def_path")
    )


def q_kg_linking_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's P/R criterion as a first-class gated artifact:
    precision/recall of the full extract+link pipeline's winner set
    against arithmetic ground truth computed with NO shared code path
    (operators/linking.py::precision_recall). The oracle knows the
    winner count in closed form and pins P = R = 1.0 (10000
    per-myriad) — any extraction or linking regression flips this gate
    before it shows anywhere else."""
    from pyjelly_spark.operators.linking import link_mentions, precision_recall

    calls, defs = _mention_frames(spark, sf_dir)
    predicted = link_mentions(calls, defs, broadcast_dictionary=True)
    actual = _closed_form_links(spark, sf_dir)
    return precision_recall(
        predicted, actual, ["repo", "path", "symbol", "def_repo", "def_path"]
    )


SQL_KG_LINKING_PR = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
cand AS (
  SELECT c.repo, c.path, c.symbol,
         d.repo AS def_repo, d.path AS def_path,
         (CASE WHEN c.repo = d.repo THEN 100 ELSE 0 END
          + CASE WHEN (c.doc_id % 13) = (d.doc_id % 13) THEN 10 ELSE 0 END)::BIGINT AS link_score
  FROM calls_gt c JOIN defs_gt d ON c.symbol = d.symbol
),
win AS (
  SELECT *, row_number() OVER (
    PARTITION BY repo, path, symbol
    ORDER BY link_score DESC, def_repo ASC, def_path ASC
  ) AS rn FROM cand
),
sys AS (SELECT DISTINCT repo, path, symbol, def_repo, def_path FROM win WHERE rn = 1)
SELECT count(*)::BIGINT AS tp, 0::BIGINT AS fp, 0::BIGINT AS fn,
       10000::BIGINT AS precision_x10000, 10000::BIGINT AS recall_x10000
FROM sys
"""


def q_kg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization stage: colliding def sites -> connected components
    -> (def_site, canonical, component) triples."""
    _, defs = _mention_frames(spark, sf_dir)
    multi = defs.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_sites"))
    colliding = defs.join(
        F.broadcast(multi.where(F.col("n_sites") > 1).select("symbol")), "symbol"
    )
    edges = colliding.select(
        def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")).alias(
            "src"
        ),
        F.concat(F.lit(X.SYMBOL_BASE), F.col("symbol")).alias("dst"),
    )
    assignment = connected_components(edges)
    return (
        colliding.withColumn(
            "node",
            def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")),
        )
        .join(assignment, "node")
        .select(
            F.col("node").alias("s"),
            F.lit(X.P_CANONICAL).alias("p"),
            F.col("component").alias("o"),
        )
    )


def q_kg_canonical_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental canonicalization: the def-site link edges arrive in
    THREE deterministic waves (hash-split), and the component
    assignment is maintained across waves instead of recomputed — each
    wave runs CC over (new edges ∪ prior assignment-as-star-edges), the
    foreachBatch maintenance pattern of a streaming canonicalizer. The
    prior state is already a star forest, so its part of the rounds
    converges immediately; per-wave cost tracks the NEW edges plus one
    star edge per seen node, not the full history. The final triples
    must equal the one-shot batch result (same oracle as kg_canonical)
    for ANY split — exactly the merge-only-CC invariant that makes
    incremental maintenance sound (components only ever merge)."""
    _, defs = _mention_frames(spark, sf_dir)
    multi = defs.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_sites"))
    colliding = defs.join(
        F.broadcast(
            multi.where(F.col("n_sites") > 1).select("symbol")
        ),
        "symbol",
    )
    edges = colliding.select(
        def_site_iri(
            F.col("def_repo"), F.col("def_path"), F.col("symbol")
        ).alias("src"),
        F.concat(F.lit(X.SYMBOL_BASE), F.col("symbol")).alias("dst"),
    )
    assignment = None
    for wave in range(3):
        batch = edges.where(T.hex_hash(F.col("src"), mod=3) == wave)
        if assignment is not None:
            batch = batch.unionByName(
                assignment.select(
                    F.col("node").alias("src"),
                    F.col("component").alias("dst"),
                )
            )
        assignment = connected_components(batch).localCheckpoint(
            eager=True
        )
    return (
        colliding.withColumn(
            "node",
            def_site_iri(
                F.col("def_repo"), F.col("def_path"), F.col("symbol")
            ),
        )
        .join(assignment, "node")
        .select(
            F.col("node").alias("s"),
            F.lit(X.P_CANONICAL).alias("p"),
            F.col("component").alias("o"),
        )
    )


SQL_KG_CANONICAL = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
multi AS (
  SELECT symbol FROM defs_gt GROUP BY symbol HAVING count(*) > 1
),
nodes AS (
  SELECT 'http://kg.example/def/' || d.repo || '/' || d.path || '#' || d.symbol AS node,
         d.symbol AS symbol
  FROM defs_gt d JOIN multi m ON d.symbol = m.symbol
),
comp AS (
  SELECT symbol, min(node) AS component FROM nodes GROUP BY symbol
)
SELECT n.node AS s, '{NS}canonical' AS p, c.component AS o
FROM nodes n JOIN comp c ON n.symbol = c.symbol
"""

SQL_KG_CANONICAL_INCREMENTAL = SQL_KG_CANONICAL


def q_kg_imports_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import-edge resolution: each imported module joined to the file
    that defines it (module name derived from the defining file's path).
    Equi-join on the module IRI; the dictionary side is one row per file,
    so AQE broadcasts it while it fits."""
    files = derived_source_files(spark, sf_dir)
    imports = _spo(X.extract_imports(files))
    module_iri = F.concat(
        F.lit(X.MODULE_BASE),
        F.regexp_extract("path", r"^src/(pkg\d+)/", 1),
        F.lit("."),
        F.regexp_extract("path", r"/(mod_\d+)\.py$", 1),
    )
    dictionary = files.select(
        module_iri.alias("module"),
        X.file_iri(F.col("repo"), F.col("path")).alias("def_file"),
    )
    return (
        imports.join(dictionary, imports.o == dictionary.module)
        .select(
            "s",
            F.lit(X.P_IMPORTS_RESOLVED).alias("p"),
            F.col("def_file").alias("o"),
        )
    )


SQL_KG_IMPORTS_RESOLVED = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()}
SELECT file_iri AS s, '{NS}importsResolved' AS p,
       'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
         || '/mod_' || t || '.py' AS o
FROM imports_gt
"""


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the resolved import graph (file -> defining file):
    the 'important files' ranking a code-intelligence consumer runs on
    the constructed KG. Fixed 8 iterations of GraphFrames-style
    iterative joins in pure integer arithmetic
    (operators/components.py::pagerank_int), so the distributed
    iterative algorithm is bit-identical to the oracle's unrolled
    recurrence. Returns the top-20 (node, pr, rank)."""
    from pyspark.sql.window import Window

    from pyjelly_spark.operators.components import pagerank_int

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    pr = pagerank_int(edges, iterations=8)
    w = Window.orderBy(F.desc("pr"), F.asc("node"))
    return (
        pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )


def q_kg_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the (symmetrized) resolved
    import graph — 3 synchronous iterations with deterministic
    smallest-label tie-breaks, so the distributed heuristic is
    bit-identical to the oracle's unrolled recurrence
    (operators/components.py::label_propagation). Returns every node's
    final community label."""
    from pyjelly_spark.operators.components import label_propagation

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return label_propagation(edges, iterations=3)


def _lpa_sql(iterations: int = 3) -> str:
    """Unrolled synchronous LPA oracle: per iteration, each node takes
    the most frequent neighbor label (ties -> smallest label), keeping
    its own when it has no neighbors — identical recurrence to
    label_propagation."""
    its = []
    for k in range(1, iterations + 1):
        its.append(f"""
l{k} AS (
  SELECT p.node, coalesce(b.new_label, p.label) AS label
  FROM l{k - 1} p
  LEFT JOIN (
    SELECT node, label AS new_label FROM (
      SELECT e.dst AS node, p2.label,
        row_number() OVER (
          PARTITION BY e.dst
          ORDER BY count(*) DESC, p2.label ASC
        ) AS rn
      FROM und e JOIN l{k - 1} p2 ON e.src = p2.node
      GROUP BY e.dst, p2.label
    ) WHERE rn = 1
  ) b ON p.node = b.node
)""".strip())
    joined = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
edges0 AS (
  SELECT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges0
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges0
  ) WHERE src <> dst
),
l0 AS (
  SELECT node, node AS label FROM (SELECT DISTINCT src AS node FROM und)
),
{joined}
SELECT node, label FROM l{iterations}
"""


SQL_KG_COMMUNITIES = _lpa_sql(3).format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


def q_kg_node_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-neighborhood Jaccard similarity between files of the resolved
    import graph ("these two files import the same modules") — the
    graph-side entity-resolution / link-prediction primitive
    (operators/components.py::node_similarity). Candidates via ONE
    self-join on the shared neighbor (never all-pairs); integer-exact
    floor-scaled Jaccard. Run uncapped here so the oracle is exact; at
    web scale ``hub_cap`` cuts the indeg^2 hub blow-up."""
    from pyjelly_spark.operators.components import node_similarity

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return node_similarity(edges, min_shared=1)


SQL_KG_NODE_SIM = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
e AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
shared AS (
  SELECT x.src AS a, y.src AS b, count(*)::BIGINT AS shared
  FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
  GROUP BY 1, 2
)
SELECT a, b, shared, da.deg AS deg_a, db.deg AS deg_b,
       shared * 10000 // (da.deg + db.deg - shared) AS jaccard_x10000
FROM shared
JOIN deg da ON shared.a = da.src
JOIN deg db ON shared.b = db.src
"""


def q_kg_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-seeded random walks over the resolved import
    graph — DeepWalk/node2vec corpus prep with the RNG replaced by the
    portable content hash, so the distributed k-join recurrence is
    bit-identical to the oracle's unrolled joins
    (operators/components.py::graph_walks)."""
    from pyjelly_spark.operators.components import graph_walks

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return graph_walks(edges, walk_len=4)


def _walks_sql(walk_len: int = 4, body: str | None = None) -> str:
    h = (
        "('0x' || substring(sha256('walk:' || w{prev}.seed || ':{k}:' "
        "|| w{prev}.node), 1, 15))::BIGINT"
    )
    steps = []
    for k in range(1, walk_len + 1):
        pick = h.format(prev=k - 1, k=k)
        steps.append(f"""
w{k} AS (
  SELECT w{k - 1}.seed AS seed, {k}::BIGINT AS step, a.dst AS node
  FROM w{k - 1} JOIN adj a ON w{k - 1}.node = a.src
  WHERE a.r = 1 + {pick} % a.outdeg
)""".strip())
    unions = "\nUNION ALL\n".join(
        f"SELECT seed, step, node FROM w{k}" for k in range(walk_len + 1)
    )
    joined = ",\n".join(steps)
    if body is not None:
        tail = f"walks AS (\n{unions}\n)\n{body.strip()}"
    else:
        tail = unions
    return f"""
WITH {{src}}, {{mentions}},
e AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) AS r,
         count(*) OVER (PARTITION BY src) AS outdeg
  FROM e
),
w0 AS (
  SELECT DISTINCT src AS seed, 0::BIGINT AS step, src AS node FROM adj
),
{joined}{"," if body is not None else ""}
{tail}
"""


SQL_KG_WALKS = _walks_sql(4).format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


SQL_KG_SKIPGRAMS = _walks_sql(
    4,
    body="""
SELECT a.node AS center, b.node AS context, count(*)::BIGINT AS cnt
FROM walks a JOIN walks b
  ON a.seed = b.seed AND a.step <> b.step AND abs(a.step - b.step) <= 2
GROUP BY 1, 2
""",
).format(src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip())


def q_kg_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair histogram over the deterministic
    walk corpus — the node2vec training-pair generation step
    (operators/components.py::skipgram_pairs). The Spark path emits
    pairs in-row via lead() over one walk sort (no self-join); the
    oracle closes the same window-2 pair set with a declarative
    walks-to-walks join."""
    from pyjelly_spark.operators.components import skipgram_pairs

    return skipgram_pairs(q_kg_walks(spark, sf_dir), window=2)


def q_kg_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over the resolved import graph —
    the link-prediction training pairs that complete the embedding-prep
    chain (walks -> skipgrams -> negatives). The RNG is the portable
    content hash over a global node dictionary, so the sample is a pure
    function of the graph (operators/components.py::negative_samples);
    the oracle rebuilds dictionary and draws declaratively."""
    from pyjelly_spark.operators.components import negative_samples

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return negative_samples(edges, k=2).orderBy("src", "dst", "j")


SQL_KG_NEGATIVES = f"""
WITH {{src}}, {{mentions}},
e AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
dict AS (
  SELECT node, row_number() OVER (ORDER BY node) - 1 AS idx FROM nodes
),
one AS (SELECT DISTINCT src, dst FROM e),
samples AS (
  SELECT src, dst, j,
    ('0x' || substring(sha256('neg:' || j || ':' || src || ':' || dst), 1, 15))::BIGINT
      % (SELECT count(*) FROM dict) AS idx
  FROM one CROSS JOIN (SELECT 1::BIGINT AS j UNION ALL SELECT 2::BIGINT) js
)
SELECT s.src, s.dst, s.j, d.node AS neg_node
FROM samples s JOIN dict d USING (idx)
ORDER BY src, dst, j
""".format(src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip())


def q_kg_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss (k=3) over the f_-symbol co-call graph — cohesive-
    subgraph mining one refinement past triangle counting: iterative
    support peeling keeps only edges closing >= 1 triangle in the
    surviving subgraph, cascades included
    (operators/components.py::truss_edges, degree-oriented wedges per
    round). The oracle unrolls the same peeling recurrence; fixpoints
    agree because extra unrolled rounds are no-ops once stable."""
    from pyjelly_spark.operators.components import truss_edges

    from pyjelly_spark.operators.components import cap_key_fanout

    calls = _spo(X.extract_calls(derived_source_files(spark, sf_dir)))
    sym = calls.select(
        F.col("s").alias("file"),
        F.regexp_extract("o", r"symbol/(.*)$", 1).alias("symbol"),
    ).where(F.col("symbol").startswith("f_"))
    sym = cap_key_fanout(
        sym, "symbol", node_col="file", on_exceed="error"
    )  # exact-tier hub guard: refuse (not silently drop) hot symbols
    pairs = (
        sym.alias("x")
        .join(
            sym.alias("y"),
            (F.col("x.symbol") == F.col("y.symbol"))
            & (F.col("x.file") < F.col("y.file")),
        )
        .select(F.col("x.file").alias("src"), F.col("y.file").alias("dst"))
    )
    return truss_edges(pairs, k=3, max_rounds=10).orderBy("u", "v")


def _truss_sql(k: int, rounds: int) -> str:
    parts = []
    for r in range(rounds):
        parts.append(f"""
t{r} AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e{r} x JOIN e{r} y ON x.v = y.u
  JOIN e{r} z ON z.u = x.u AND z.v = y.v
),
s{r} AS MATERIALIZED (
  SELECT u, v, count(*)::BIGINT AS support FROM (
    SELECT a AS u, b AS v FROM t{r}
    UNION ALL SELECT b AS u, c AS v FROM t{r}
    UNION ALL SELECT a AS u, c AS v FROM t{r}
  ) GROUP BY u, v
),
e{r + 1} AS MATERIALIZED (
  SELECT e.u, e.v, coalesce(s.support, 0)::BIGINT AS support
  FROM e{r} e LEFT JOIN s{r} s ON e.u = s.u AND e.v = s.v
  WHERE coalesce(s.support, 0) >= {k - 2}
)""".strip())
    chain = ",\n".join(parts)
    return f"""
WITH {{src}}, {{mentions}},
e0 AS MATERIALIZED (
  SELECT DISTINCT c1.file_iri AS u, c2.file_iri AS v
  FROM calls_gt c1 JOIN calls_gt c2
    ON c1.symbol = c2.symbol AND c1.file_iri < c2.file_iri
  WHERE starts_with(c1.symbol, 'f_')
),
{chain}
SELECT u, v, support FROM e{rounds} ORDER BY u, v
"""


SQL_KG_TRUSS = _truss_sql(3, 6).format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


def q_kg_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file triangle participation in the shared-symbol
    co-definition graph: files defining the same ``shared_*`` symbol are
    pairwise connected, and the triangle count measures how densely each
    file's co-definition neighborhood closes (the KG-side input to
    clustering-coefficient/community features). Counting runs through
    the degree-oriented wedge join
    (operators/components.py::triangle_count) — the O(E^{3/2}) MapReduce
    algorithm that survives hub nodes at web scale; the oracle closes
    triangles declaratively with a 3-way self-join over the closed-form
    co-definition pairs."""
    from pyjelly_spark.operators.components import (
        cap_key_fanout,
        triangle_count,
    )

    files = derived_source_files(spark, sf_dir)
    sdefs = files.select(
        X.file_iri(F.col("repo"), F.col("path")).alias("file"),
        F.explode(
            F.regexp_extract_all("content", F.lit(X.DEF_RE), F.lit(1))
        ).alias("symbol"),
    ).where(F.col("symbol").startswith("shared_"))
    sdefs = cap_key_fanout(
        sdefs, "symbol", node_col="file", on_exceed="error"
    )  # exact-tier hub guard: refuse (not silently drop) hot symbols
    pairs = (
        sdefs.alias("x")
        .join(
            sdefs.alias("y"),
            (F.col("x.symbol") == F.col("y.symbol"))
            & (F.col("x.file") < F.col("y.file")),
        )
        .select(F.col("x.file").alias("src"), F.col("y.file").alias("dst"))
    )
    return triangle_count(pairs)


def q_kg_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file local clustering coefficient in the shared-symbol
    co-definition graph (operators/components.py::
    clustering_coefficient): triangles via the degree-oriented wedge
    join, degrees via one aggregation, coeff floor-scaled x10000 —
    integer-exact vs the declarative 3-way self-join oracle."""
    from pyjelly_spark.operators.components import (
        cap_key_fanout,
        clustering_coefficient,
    )

    files = derived_source_files(spark, sf_dir)
    sdefs = files.select(
        X.file_iri(F.col("repo"), F.col("path")).alias("file"),
        F.explode(
            F.regexp_extract_all("content", F.lit(X.DEF_RE), F.lit(1))
        ).alias("symbol"),
    ).where(F.col("symbol").startswith("shared_"))
    sdefs = cap_key_fanout(
        sdefs, "symbol", node_col="file", on_exceed="error"
    )  # exact-tier hub guard: refuse (not silently drop) hot symbols
    pairs = (
        sdefs.alias("x")
        .join(
            sdefs.alias("y"),
            (F.col("x.symbol") == F.col("y.symbol"))
            & (F.col("x.file") < F.col("y.file")),
        )
        .select(F.col("x.file").alias("src"), F.col("y.file").alias("dst"))
    )
    return clustering_coefficient(pairs)


SQL_KG_CLUSTERING = f"""
WITH {SRC_SQL},
sdefs AS (
  SELECT file_iri, 'shared_' || (doc_id % 50) AS symbol
  FROM files WHERE doc_id % 2 = 0
),
pairs AS (
  SELECT DISTINCT x.file_iri AS u, y.file_iri AS v
  FROM sdefs x JOIN sdefs y
    ON x.symbol = y.symbol AND x.file_iri < y.file_iri
),
deg AS (
  SELECT node, count(*)::BIGINT AS degree FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) GROUP BY node
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
),
tpn AS (
  SELECT node, count(*)::BIGINT AS triangles
  FROM (SELECT unnest([a, b, c]) AS node FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree,
  coalesce(t.triangles, 0)::BIGINT AS triangles,
  (2 * coalesce(t.triangles, 0) * 10000)
    // (d.degree * (d.degree - 1)) AS coeff_x10000
FROM deg d LEFT JOIN tpn t USING (node)
WHERE d.degree >= 2
"""


SQL_KG_TRIANGLES = f"""
WITH {SRC_SQL},
sdefs AS (
  SELECT file_iri, 'shared_' || (doc_id % 50) AS symbol
  FROM files WHERE doc_id % 2 = 0
),
pairs AS (
  SELECT DISTINCT x.file_iri AS u, y.file_iri AS v
  FROM sdefs x JOIN sdefs y
    ON x.symbol = y.symbol AND x.file_iri < y.file_iri
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, count(*)::BIGINT AS triangles
FROM (SELECT unnest([a, b, c]) AS node FROM tri)
GROUP BY node
"""


def _pagerank_sql(iterations: int = 8, scale: int = 10**12) -> str:
    """Unrolled fixed-iteration PageRank oracle: it0..itN CTEs applying
    the identical integer recurrence as pagerank_int."""
    its = []
    for k in range(1, iterations + 1):
        its.append(f"""
it{k} AS (
  SELECT n0.node,
    (({scale} * 15 // 100) // nn.n) + (85 * COALESCE(s.c, 0)) // 100 AS pr
  FROM pr_nodes n0 CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr // o.outdeg)::BIGINT AS c
    FROM pr_edges e JOIN it{k - 1} p ON e.src = p.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n0.node = s.node
)""".strip())
    joined_its = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
pr_edges AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
pr_nodes AS (
  SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges
),
nn AS (SELECT count(*)::BIGINT AS n FROM pr_nodes),
outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM pr_edges GROUP BY src),
it0 AS (SELECT node, {scale} // nn.n AS pr FROM pr_nodes CROSS JOIN nn),
{joined_its}
SELECT node, pr::BIGINT AS pr, rank FROM (
  SELECT node, pr,
         row_number() OVER (ORDER BY pr DESC, node ASC) AS rank
  FROM it{iterations}
) WHERE rank <= 20
"""


SQL_KG_PAGERANK = _pagerank_sql().format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


PPR_SEED_RE = r"/mod_\d*0\.py$"


def q_kg_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the resolved import graph: teleport
    mass restricted to the seed set (files whose module id ends in 0) —
    the relatedness/recommendation variant of kg_pagerank, same integer
    recurrence with a seed-gated base term
    (operators/components.py::pagerank_int(seeds=...)). Top-20 by
    (pr, node)."""
    from pyjelly_spark.operators.components import pagerank_int
    from pyspark.sql.window import Window as W

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.where(F.col("node").rlike(PPR_SEED_RE))
    pr = pagerank_int(edges, iterations=8, seeds=seeds)
    w = W.orderBy(F.desc("pr"), F.asc("node"))
    return (
        pr.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
        .select("node", "pr", "rank")
    )


def _ppr_sql(iterations: int = 8, scale: int = 10**12) -> str:
    """Unrolled personalized-PageRank oracle: the kg_pagerank recurrence
    with initial mass and teleport base restricted to the seed set."""
    its = []
    for k in range(1, iterations + 1):
        its.append(f"""
it{k} AS (
  SELECT n0.node,
    (CASE WHEN n0.seed THEN ({scale} * 15 // 100) // ns.n ELSE 0 END)
      + (85 * COALESCE(s.c, 0)) // 100 AS pr
  FROM seeded n0 CROSS JOIN ns
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr // o.outdeg)::BIGINT AS c
    FROM pr_edges e JOIN it{k - 1} p ON e.src = p.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n0.node = s.node
)""".strip())
    joined_its = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
pr_edges AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
pr_nodes AS (
  SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges
),
seeded AS (
  SELECT node, regexp_matches(node, '/mod_[0-9]*0\\.py$') AS seed
  FROM pr_nodes
),
ns AS (SELECT count(*)::BIGINT AS n FROM seeded WHERE seed),
outdeg AS (SELECT src, count(*)::BIGINT AS outdeg FROM pr_edges GROUP BY src),
it0 AS (
  SELECT node, CASE WHEN seed THEN {scale} // ns.n ELSE 0 END AS pr
  FROM seeded CROSS JOIN ns
),
{joined_its}
SELECT node, pr::BIGINT AS pr, rank FROM (
  SELECT node, pr,
         row_number() OVER (ORDER BY pr DESC, node ASC) AS rank
  FROM it{iterations}
) WHERE rank <= 20
"""


SQL_KG_PPR = _ppr_sql().format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


def q_kg_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the resolved import graph
    (operators/components.py::hits_int): integer renormalization by
    per-round max instead of float L2 — deterministic, so the oracle
    unrolls the identical recurrence. Top-20 by (auth, node)."""
    from pyjelly_spark.operators.components import hits_int
    from pyspark.sql.window import Window as W

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    res = hits_int(edges, iterations=4)
    w = W.orderBy(F.desc("auth"), F.asc("node"))
    return (
        res.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
        .select("node", "hub", "auth", "rank")
    )


def _hits_sql(iterations: int = 4, scale: int = 10**6) -> str:
    """Unrolled HITS oracle: per round, authority = in-sum of hubs
    rescaled by (x * scale // max), then hub = out-sum of authorities
    rescaled the same way; sparse CTEs, absent node = 0."""
    its = []
    for k in range(1, iterations + 1):
        # max via a whole-frame window, NOT a scalar subquery: a
        # subquery would reference each CTE level twice and DuckDB
        # inlines CTEs, doubling the expression tree per level
        # (exponential re-evaluation); the window keeps the chain
        # strictly linear.
        its.append(f"""
a{k} AS (
  SELECT node, ((raw * {scale}) // max(raw) OVER ())::BIGINT AS a FROM (
    SELECT e.dst AS node, sum(h.h)::BIGINT AS raw
    FROM he e JOIN h{k - 1} h ON e.src = h.node GROUP BY 1
  )
),
h{k} AS (
  SELECT node, ((raw * {scale}) // max(raw) OVER ())::BIGINT AS h FROM (
    SELECT e.src AS node, sum(a.a)::BIGINT AS raw
    FROM he e JOIN a{k} a ON e.dst = a.node GROUP BY 1
  )
)""".strip())
    joined_its = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
he AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
hits_nodes AS (
  SELECT src AS node FROM he UNION SELECT dst FROM he
),
h0 AS (SELECT DISTINCT src AS node, {scale}::BIGINT AS h FROM he),
{joined_its}
SELECT node, hub, auth, rank FROM (
  SELECT n.node,
         COALESCE(h.h, 0)::BIGINT AS hub,
         COALESCE(a.a, 0)::BIGINT AS auth,
         row_number() OVER (
           ORDER BY COALESCE(a.a, 0) DESC, n.node ASC) AS rank
  FROM hits_nodes n
  LEFT JOIN h{iterations} h ON n.node = h.node
  LEFT JOIN a{iterations} a ON n.node = a.node
) WHERE rank <= 20
"""


SQL_KG_HITS = _hits_sql().format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


def q_kg_bgp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style BGP over the constructed KG: `?repo contains
    ?def_file . ?def_file defines ?sym . ?caller calls ?sym` compiled to
    Catalyst self-joins (operators/bgp.py), then aggregated per repo.
    The graph is the full 4-family triple union, so the predicate
    constants in each pattern must prune the other families. Oracle
    recomputes the solution bag from the closed-form ground-truth CTEs —
    no BGP machinery on the oracle side."""
    from pyjelly_spark.operators.bgp import bgp_match

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    sols = bgp_match(
        graph,
        [
            ("?repo_iri", NS + "contains", "?def_file"),
            ("?def_file", NS + "defines", "?sym"),
            ("?caller", NS + "calls", "?sym"),
        ],
    )
    return (
        sols.groupBy("repo_iri")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("def_file").alias("n_def_files"),
            F.countDistinct("caller").alias("n_callers"),
            F.countDistinct("sym").alias("n_syms"),
        )
        .orderBy("repo_iri")
    )


SQL_KG_BGP = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
sol AS (
  SELECT 'http://kg.example/repo/' || f.repo AS repo_iri,
         d.file_iri AS def_file, c.file_iri AS caller,
         'http://kg.example/symbol/' || d.symbol AS sym
  FROM defs_gt d
  JOIN calls_gt c ON c.symbol = d.symbol
  JOIN files f ON f.file_iri = d.file_iri
)
SELECT repo_iri,
       count(*)::BIGINT AS n_links,
       count(DISTINCT def_file)::BIGINT AS n_def_files,
       count(DISTINCT caller)::BIGINT AS n_callers,
       count(DISTINCT sym)::BIGINT AS n_syms
FROM sol GROUP BY repo_iri ORDER BY repo_iri
"""


def q_kg_bgp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kg_bgp solution computed under statistics-driven join
    ordering: per-predicate VoID statistics are collected driver-side
    (one row per predicate) and handed to bgp_match, which anchors on
    the estimated-cheapest pattern instead of the constant-count
    heuristic (operators/bgp.py::_join_order). Result bags are
    order-independent, so the oracle is SQL_KG_BGP verbatim — the gate
    proves the selectivity-first plan computes the identical bag."""
    from pyjelly_spark.operators.bgp import bgp_match, void_stats

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    sols = bgp_match(
        graph,
        [
            ("?repo_iri", NS + "contains", "?def_file"),
            ("?def_file", NS + "defines", "?sym"),
            ("?caller", NS + "calls", "?sym"),
        ],
        stats=void_stats(graph),
    )
    return (
        sols.groupBy("repo_iri")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("def_file").alias("n_def_files"),
            F.countDistinct("caller").alias("n_callers"),
            F.countDistinct("sym").alias("n_syms"),
        )
        .orderBy("repo_iri")
    )


SQL_KG_BGP_STATS = SQL_KG_BGP


def q_kg_bgp_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup BGP: `?def_file defines <symbol/shared_8> . ?repo_iri
    contains ?def_file`. The 2-constant pattern anchors the plan and is
    broadcast (a handful of rows out of the whole graph), so the join
    adds no shuffle on the graph side."""
    from pyjelly_spark.operators.bgp import bgp_match

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    return bgp_match(
        graph,
        [
            ("?def_file", NS + "defines", "http://kg.example/symbol/shared_8"),
            ("?repo_iri", NS + "contains", "?def_file"),
        ],
    ).select("repo_iri", "def_file").orderBy("repo_iri", "def_file")


SQL_KG_BGP_SELECTIVE = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()}
SELECT 'http://kg.example/repo/' || f.repo AS repo_iri, d.file_iri AS def_file
FROM defs_gt d JOIN files f ON f.file_iri = d.file_iri
WHERE d.symbol = 'shared_8'
ORDER BY repo_iri, def_file
"""


def q_kg_store_bgp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP over the predicate-partitioned KG store
    (sources/kg_store.py): the full triple union is laid out as parquet
    partitioned by predicate token, then the selective 2-constant
    pattern runs through partition-pruned scans — each constant-
    predicate pattern reads ONLY its predicate's files (PartitionFilters
    at planning time; the collision-guard residual filter keeps pruning
    an optimization, never the correctness boundary). Same solution set
    as kg_bgp_selective, so the oracle is shared."""
    import shutil
    import tempfile

    from pyjelly_spark.sources.kg_store import bgp_match_store, write_kg_store

    triples = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    out_dir = tempfile.mkdtemp(prefix="kg_store_")
    try:
        write_kg_store(triples, out_dir)
        sols = bgp_match_store(
            spark,
            out_dir,
            [
                ("?def_file", NS + "defines", "http://kg.example/symbol/shared_8"),
                ("?repo_iri", NS + "contains", "?def_file"),
            ],
        )
        result = (
            sols.select("repo_iri", "def_file")
            .orderBy("repo_iri", "def_file")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


SQL_KG_STORE_BGP = SQL_KG_BGP_SELECTIVE


def q_kg_bgp_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL + FILTER through the BGP compiler: every defined symbol
    with its caller count, callers outside the defining file only —
    `?def_file defines ?sym . OPTIONAL { ?caller calls ?sym } FILTER
    (?caller IS NULL OR ?caller != ?def_file)`. The left join preserves
    never-called symbols (caller count 0), the SPARQL-FILTER equivalent
    runs inside the same Catalyst plan. Aggregated per definition site."""
    from pyjelly_spark.operators.bgp import bgp_match

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    sols = bgp_match(
        graph,
        [("?def_file", NS + "defines", "?sym")],
        optional=[("?caller", NS + "calls", "?sym")],
        filters=["caller IS NULL OR caller != def_file"],
    )
    return (
        sols.groupBy("def_file", "sym")
        .agg(F.count("caller").alias("n_ext_callers"))
        .orderBy("def_file", "sym")
    )


SQL_KG_BGP_OPTIONAL = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
defs_iri AS (
  SELECT file_iri AS def_file,
         'http://kg.example/symbol/' || symbol AS sym, symbol
  FROM defs_gt
),
calls_iri AS (SELECT file_iri AS caller, symbol FROM calls_gt)
SELECT d.def_file, d.sym, count(c.caller)::BIGINT AS n_ext_callers
FROM defs_iri d LEFT JOIN calls_iri c ON c.symbol = d.symbol
WHERE c.caller IS NULL OR c.caller != d.def_file
GROUP BY d.def_file, d.sym ORDER BY d.def_file, d.sym
"""


REACH_SOURCE = "http://kg.example/file/repo-00/src/pkg0/mod_0.py"
REACH_DEPTH = 6


def q_kg_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-path query (`<file> importsResolved{0,6} ?f`): min-hop
    distance from one file over the resolved import graph, via the
    distributed bounded-depth BFS (operators/components.py::
    bfs_reachable — frontier semi-joins, one action per round). Oracle
    is a DuckDB recursive CTE over the closed-form import edges, so the
    iterative distributed algorithm is checked against a declarative
    transitive closure."""
    from pyjelly_spark.operators.components import bfs_reachable

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    sources = spark.createDataFrame([(REACH_SOURCE,)], ["node"])
    return bfs_reachable(edges, sources, max_depth=REACH_DEPTH).orderBy(
        "depth", "node"
    )


SQL_KG_REACHABLE = f"""
WITH RECURSIVE {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
reach_edges AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
reach(node, depth) AS (
  SELECT '{REACH_SOURCE}', 0
  UNION
  SELECT e.dst, r.depth + 1
  FROM reach r JOIN reach_edges e ON e.src = r.node
  WHERE r.depth < {REACH_DEPTH}
)
SELECT node, min(depth)::BIGINT AS depth FROM reach
GROUP BY node ORDER BY depth, node
"""


CLOSENESS_SEEDS = 8
CLOSENESS_DEPTH = 4


def q_kg_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth closeness centrality for the top-8 out-degree files
    of the resolved import graph: one labeled multi-source BFS carries
    all seeds through the same per-round edge join
    (operators/components.py::multi_source_bfs), then one aggregation
    over the (seed, node, depth) reach pairs. Integer-scaled closeness
    so the distributed result is bit-identical to the oracle's bounded
    recursive-CTE closure."""
    from pyjelly_spark.operators.components import closeness_centrality

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    w = Window.orderBy(F.desc("outdeg"), F.asc("src"))
    seeds = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= CLOSENESS_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    return closeness_centrality(
        edges, seeds, max_depth=CLOSENESS_DEPTH
    ).orderBy("node")


SQL_KG_CLOSENESS = f"""
WITH RECURSIVE {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
reach_edges AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
seeds AS (
  SELECT src AS seed FROM (
    SELECT src, row_number() OVER (ORDER BY count(*) DESC, src ASC) AS rank
    FROM reach_edges GROUP BY src
  ) WHERE rank <= {CLOSENESS_SEEDS}
),
reach(seed, node, depth) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT r.seed, e.dst, r.depth + 1
  FROM reach r JOIN reach_edges e ON e.src = r.node
  WHERE r.depth < {CLOSENESS_DEPTH}
),
mind AS (
  SELECT seed, node, min(depth) AS depth FROM reach GROUP BY seed, node
)
SELECT seed AS node, count(*)::BIGINT AS n_reached,
       sum(depth)::BIGINT AS sum_dist,
       (count(*) * 1000000 // sum(depth))::BIGINT AS closeness_x1e6
FROM mind WHERE depth > 0
GROUP BY seed ORDER BY seed
"""


def q_kg_sparql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kg_bgp solution set expressed as SPARQL TEXT and run through
    the front-end parser (operators/sparql.py) instead of the
    programmatic pattern API — same oracle as kg_bgp, so the gate proves
    text parsing + compilation end-to-end. Aggregation happens on the
    returned solution frame (the supported subset has no GROUP BY —
    DataFrame ops compose on top)."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    sols = sparql_query(
        graph,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?repo_iri ?def_file ?caller ?sym WHERE {
          ?repo_iri kg:contains ?def_file .
          ?def_file kg:defines ?sym .
          ?caller kg:calls ?sym
        }
        """,
    )
    return (
        sols.groupBy("repo_iri")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("def_file").alias("n_def_files"),
            F.countDistinct("caller").alias("n_callers"),
            F.countDistinct("sym").alias("n_syms"),
        )
        .orderBy("repo_iri")
    )


def q_kg_sparql_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL value-space filtering over a graph carrying numeric
    literals: events lifted to (event IRI, kg:amount, integer-lexical
    literal | kg:type, word literal); isNumeric() selects the numeric
    family and xsd:integer() casts move the FILTER and the BIND into
    value space (string comparison would order '12' < '5'). Gates the
    try_cast translation of the xsd constructor builtins."""
    from pyjelly_spark.operators.sparql import sparql_query

    ev = _t(spark, sf_dir, "events")
    amounts = ev.select(
        F.concat(F.lit("http://kg.example/event/"), F.col("event_id")).alias("s"),
        F.lit("http://kg.example/ns#amount").alias("p"),
        F.floor(F.col("value") * 100).cast("long").cast("string").alias("o"),
    )
    types = ev.select(
        F.concat(F.lit("http://kg.example/event/"), F.col("event_id")).alias("s"),
        F.lit("http://kg.example/ns#type").alias("p"),
        F.col("event_type").alias("o"),
    )
    return sparql_query(
        amounts.unionByName(types),
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?s ?cents WHERE {
          ?s kg:amount ?v .
          FILTER(isNumeric(?v) && xsd:integer(?v) >= 9900)
          BIND(xsd:integer(?v) AS ?cents)
        }
        """,
    )


SQL_KG_SPARQL_TYPED = """
SELECT 'http://kg.example/event/' || event_id AS s,
       floor(value * 100)::BIGINT AS cents
FROM events
WHERE floor(value * 100) >= 9900
"""


def q_kg_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UNION + GROUP BY/aggregate through the front-end: per-
    symbol mention count across the defines and calls families, plus
    the distinct-mentioner count. Gates branch alignment (NULL-filled
    union), aggregate parsing, and grouped evaluation against a
    closed-form oracle."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    return sparql_query(
        graph,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?sym (COUNT(?x) AS ?n_mentions)
               (COUNT(DISTINCT ?x) AS ?n_files) WHERE {
          { ?x kg:defines ?sym } UNION { ?x kg:calls ?sym }
        }
        GROUP BY ?sym
        ORDER BY ?sym
        """,
    )


SQL_KG_SPARQL_AGG = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
mentions AS (
  SELECT file_iri AS x, 'http://kg.example/symbol/' || symbol AS sym
  FROM defs_gt
  UNION ALL
  SELECT file_iri AS x, 'http://kg.example/symbol/' || symbol AS sym
  FROM calls_gt
)
SELECT sym, count(*)::BIGINT AS n_mentions,
       count(DISTINCT x)::BIGINT AS n_files
FROM mentions GROUP BY sym ORDER BY sym
"""


def q_kg_sparql_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property-path (`<seed> kg:importsResolved+ ?node`) through
    the front-end: the textual `+` closure compiles onto the seeded
    frontier-BFS fixpoint (operators/sparql.py::_closure_from — the
    constant endpoint means no all-pairs closure is ever built). Oracle
    is an unbounded recursive CTE, so the distributed fixpoint is
    checked against a declarative transitive closure with cycles."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = q_kg_imports_resolved(spark, sf_dir)
    return sparql_query(
        graph,
        f"""
        PREFIX kg: <{NS}>
        SELECT ?node WHERE {{ <{REACH_SOURCE}> kg:importsResolved+ ?node }}
        ORDER BY ?node
        """,
        max_closure_rounds=64,
    )


SQL_KG_SPARQL_PATH = f"""
WITH RECURSIVE {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
reach_edges AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
),
reach(node) AS (
  SELECT dst FROM reach_edges WHERE src = '{REACH_SOURCE}'
  UNION
  SELECT e.dst FROM reach r JOIN reach_edges e ON e.src = r.node
)
SELECT node FROM reach ORDER BY node
"""


def q_kg_sparql_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL CONSTRUCT through the front-end: rewrite the resolved
    import graph into a derived two-predicate dependency graph (forward
    + inverse edges) — the graph-to-graph transformation a KG
    constructor ships. CONSTRUCT output is a set (distinct (s, p, o))
    built per-template-pattern from the solution frame; the oracle is
    the same derivation as closed-form SQL."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = q_kg_imports_resolved(spark, sf_dir)
    return sparql_query(
        graph,
        f"""
        PREFIX kg: <{NS}>
        CONSTRUCT {{ ?f kg:dependsOn ?g . ?g kg:dependedBy ?f }}
        WHERE {{ ?f kg:importsResolved ?g . FILTER (?f != ?g) }}
        """,
    ).orderBy("s", "p", "o")


SQL_KG_SPARQL_CONSTRUCT = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
resolved AS (
  SELECT DISTINCT file_iri AS f,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS g
  FROM imports_gt
)
SELECT DISTINCT s, p, o FROM (
  SELECT f AS s, '{NS}dependsOn' AS p, g AS o FROM resolved WHERE f <> g
  UNION ALL
  SELECT g AS s, '{NS}dependedBy' AS p, f AS o FROM resolved WHERE f <> g
) ORDER BY s, p, o
"""


def q_kg_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GRAPH clause through the front-end over a quads dataset:
    defines-triples live in one named graph per repo, containment in the
    default graph. The GRAPH ?g join runs as 4-slot BGP patterns in one
    Catalyst plan (operators/bgp.py — the graph variable ranges over
    named graphs only); the per-graph aggregate is gated against the
    closed-form per-repo symbol counts."""
    from pyjelly_spark.operators.sparql import sparql_query

    files = derived_source_files(spark, sf_dir)
    defs = _spo(X.extract_defs(files)).withColumn(
        "g",
        F.concat(
            F.lit("http://kg.example/repo/"),
            F.regexp_extract("s", r"file/([^/]+)/", 1),
        ),
    )
    contains = _spo(X.structural_triples(files)).withColumn(
        "g", F.lit(None).cast("string")
    )
    quads = contains.unionByName(defs)
    return sparql_query(
        quads,
        f"""
        PREFIX kg: <{NS}>
        SELECT ?g (COUNT(?sym) AS ?n_defs)
               (COUNT(DISTINCT ?sym) AS ?n_symbols) WHERE {{
          GRAPH ?g {{ ?f kg:defines ?sym }}
        }}
        GROUP BY ?g
        ORDER BY ?g
        """,
    )


SQL_KG_SPARQL_GRAPH = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()}
SELECT 'http://kg.example/repo/' || repo AS g,
       count(*)::BIGINT AS n_defs,
       count(DISTINCT symbol)::BIGINT AS n_symbols
FROM defs_gt
GROUP BY repo ORDER BY g
"""


def q_kg_sparql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL VALUES + FILTER NOT EXISTS gate: inline-data restriction
    of the repo variable plus an anti-join on a two-triple sub-pattern
    with a constant subject — "definitions of three chosen repos never
    called from repo-00". VALUES compiles to a broadcast inner join on
    the inline frame; NOT EXISTS to a left-anti join on the evaluated
    sub-pattern (operators/sparql.py)."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    return sparql_query(
        graph,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?repo_iri ?def_file ?sym WHERE {
          VALUES ?repo_iri {
            <http://kg.example/repo/repo-00>
            <http://kg.example/repo/repo-02>
            <http://kg.example/repo/repo-04>
          }
          ?repo_iri kg:contains ?def_file .
          ?def_file kg:defines ?sym .
          FILTER NOT EXISTS {
            <http://kg.example/repo/repo-00> kg:contains ?caller .
            ?caller kg:calls ?sym
          }
        }
        """,
    )


SQL_KG_SPARQL_EXISTS = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()}
SELECT 'http://kg.example/repo/' || d.repo AS repo_iri,
       d.file_iri AS def_file,
       'http://kg.example/symbol/' || d.symbol AS sym
FROM defs_gt d
WHERE d.repo IN ('repo-00', 'repo-02', 'repo-04')
  AND d.symbol NOT IN (SELECT symbol FROM calls_gt WHERE repo = 'repo-00')
"""


def q_kg_sparql_subselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subquery gate: a nested ``{ SELECT ?def_file (COUNT(?caller)
    AS ?n) ... GROUP BY ?def_file }`` evaluated bottom-up, its projected
    solution frame joined into the outer pattern on the shared variable
    — per-definition-file inbound-call fan-in annotated with the owning
    repo (operators/sparql.py subquery folding)."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    return sparql_query(
        graph,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?repo_iri ?def_file ?n WHERE {
          ?repo_iri kg:contains ?def_file .
          { SELECT ?def_file (COUNT(?caller) AS ?n) WHERE {
              ?def_file kg:defines ?sym .
              ?caller kg:calls ?sym
            } GROUP BY ?def_file }
        }
        """,
    )


SQL_KG_SPARQL_SUBSELECT = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
fanin AS (
  SELECT d.file_iri AS def_file, count(*)::BIGINT AS n
  FROM defs_gt d JOIN calls_gt c ON c.symbol = d.symbol
  GROUP BY 1
)
SELECT 'http://kg.example/repo/' || f.repo AS repo_iri,
       fanin.def_file AS def_file, fanin.n AS n
FROM fanin JOIN files f ON f.file_iri = fanin.def_file
"""


def q_kg_sparql_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL path-alternation gate: ``?f (kg:defines|kg:calls) ?sym``
    compiles to ONE scan with an IN-set predicate filter (never a
    union of two scans — operators/sparql.py folds the alternation
    into a single pattern unit); aggregated per file with distinct
    symbol counts."""
    from pyjelly_spark.operators.sparql import sparql_query

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    sols = sparql_query(
        graph,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?f ?sym WHERE { ?f (kg:defines|kg:calls) ?sym }
        """,
    )
    return sols.groupBy("f").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("sym").alias("n_syms"),
    )


SQL_KG_SPARQL_ALT = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
m AS (
  SELECT file_iri AS f, 'http://kg.example/symbol/' || symbol AS sym
  FROM defs_gt
  UNION ALL
  SELECT file_iri AS f, 'http://kg.example/symbol/' || symbol AS sym
  FROM calls_gt
)
SELECT f, count(*)::BIGINT AS n_mentions,
       count(DISTINCT sym)::BIGINT AS n_syms
FROM m GROUP BY f
"""


def q_kg_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UPDATE through the front-end: a DELETE/INSERT WHERE that
    renames the calls predicate to invokes and an INSERT WHERE that
    materializes a derived co-definition edge, applied to the KG graph
    as one Catalyst plan per statement (anti-join delete + union-
    distinct insert — operators/sparql.py::sparql_update). Gated on the
    per-predicate statement counts of the updated graph."""
    from pyjelly_spark.operators.sparql import sparql_update

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    g2 = sparql_update(
        graph,
        f"""
        PREFIX kg: <{NS}>
        DELETE {{ ?f kg:calls ?sym }}
        INSERT {{ ?f kg:invokes ?sym }}
        WHERE {{ ?f kg:calls ?sym }}
        """,
    )
    return (
        g2.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("s").cast("long").alias("n_subjects"),
        )
        .orderBy("p")
    )


SQL_KG_SPARQL_UPDATE = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
graph AS (
  SELECT 'http://kg.example/repo/' || repo AS s, '{NS}contains' AS p,
         file_iri AS o FROM files
  UNION ALL
  SELECT file_iri, '{NS}lang', 'python' FROM files
  UNION ALL
  SELECT file_iri, '{NS}sha256', sha256(content) FROM files
  UNION ALL
  SELECT file_iri, '{NS}imports',
         'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t
  FROM imports_gt
  UNION ALL
  SELECT file_iri, '{NS}defines', 'http://kg.example/symbol/' || symbol
  FROM defs_gt
  UNION ALL
  SELECT file_iri, '{NS}invokes', 'http://kg.example/symbol/' || symbol
  FROM calls_gt
)
SELECT p, count(*)::BIGINT AS n, count(DISTINCT s)::BIGINT AS n_subjects
FROM (SELECT DISTINCT s, p, o FROM graph)
GROUP BY p ORDER BY p
"""


def q_kg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KG maintenance between two snapshots of the source
    table: sha256-keyed anti-joins prune unchanged files BEFORE
    extraction (operators/incremental.py), so the expensive stage runs
    on the changed sliver only. Output: triple-delta counts per
    (op, predicate). Oracle recomputes the delta in closed form from the
    ground-truth CTEs — the modified/deleted doc_id classes and their
    per-family mention counts — with no extraction on the oracle side."""
    from pyjelly_spark.operators.incremental import incremental_delta

    v1 = derived_source_files(spark, sf_dir)
    v2 = derived_source_files_v2(spark, sf_dir)
    return (
        incremental_delta(v1, v2)
        .groupBy("op", "p")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("op", "p")
    )


SQL_KG_INCREMENTAL = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
del_f AS (
  SELECT file_iri FROM files WHERE doc_id % 17 = 3 OR doc_id % 10 = 0
),
add_f AS (
  SELECT file_iri FROM files WHERE doc_id % 10 = 0 AND doc_id % 17 <> 3
),
counts AS (
  SELECT 'del' AS op, '{NS}contains' AS p, count(*) AS n FROM del_f
  UNION ALL SELECT 'del', '{NS}lang', count(*) FROM del_f
  UNION ALL SELECT 'del', '{NS}sha256', count(*) FROM del_f
  UNION ALL SELECT 'del', '{NS}imports', count(*)
    FROM imports_gt i JOIN del_f d ON i.file_iri = d.file_iri
  UNION ALL SELECT 'del', '{NS}defines', count(*)
    FROM defs_gt g JOIN del_f d ON g.file_iri = d.file_iri
  UNION ALL SELECT 'del', '{NS}calls', count(*)
    FROM calls_gt c JOIN del_f d ON c.file_iri = d.file_iri
  UNION ALL SELECT 'add', '{NS}contains', count(*) FROM add_f
  UNION ALL SELECT 'add', '{NS}lang', count(*) FROM add_f
  UNION ALL SELECT 'add', '{NS}sha256', count(*) FROM add_f
  UNION ALL SELECT 'add', '{NS}imports',
    count(*) + (SELECT count(*) FROM add_f)
    FROM imports_gt i JOIN add_f a ON i.file_iri = a.file_iri
  UNION ALL SELECT 'add', '{NS}defines', count(*)
    FROM defs_gt g JOIN add_f a ON g.file_iri = a.file_iri
  UNION ALL SELECT 'add', '{NS}calls', count(*)
    FROM calls_gt c JOIN add_f a ON c.file_iri = a.file_iri
)
SELECT op, p, n::BIGINT AS n_triples FROM counts ORDER BY op, p
"""


def q_kg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full materialization round-trip: derived source table -> pipeline
    (extract + link + canonicalize) -> partitioned Jelly streams on disk
    -> distributed decode -> per-predicate triple counts.

    The oracle recomputes the same histogram in closed form, so this
    checks the WHOLE write/read path (lookup tables, delta encoding,
    repeated-term suppression, framing, manifests) end to end.
    """
    import shutil
    import tempfile

    from pyjelly_spark.pipeline import PipelineConfig, run_pipeline
    from pyjelly_spark.sources.jelly_io import read_jelly

    files = derived_source_files(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="kg_roundtrip_")
    try:
        run_pipeline(
            spark,
            files,
            PipelineConfig(out_dir=out_dir, rows_per_stream=2000, resume=False),
        )
        decoded = read_jelly(spark, out_dir)
        return (
            decoded.groupBy(F.col("p_value").alias("p"))
            .agg(F.count(F.lit(1)).alias("n_triples"))
            # materialized on purpose: the finally below deletes the
            # .jelly files this plan reads, so a lazy DataFrame would
            # fail when the driver later collects it
            .toPandas()
            .pipe(spark.createDataFrame)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_KG_ROUNDTRIP = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
multi AS (SELECT symbol FROM defs_gt GROUP BY symbol HAVING count(*) > 1),
linked AS (
  SELECT DISTINCT c.repo, c.path, c.symbol
  FROM calls_gt c JOIN (SELECT DISTINCT symbol FROM defs_gt) d ON c.symbol = d.symbol
),
counts AS (
  SELECT '{NS}contains' AS p, count(*) AS n_triples FROM files
  UNION ALL SELECT '{NS}lang', count(*) FROM files
  UNION ALL SELECT '{NS}sha256', count(*) FROM files
  UNION ALL SELECT '{NS}imports', count(*) FROM imports_gt
  UNION ALL SELECT '{NS}defines', count(*) FROM defs_gt
  UNION ALL SELECT '{NS}calls', count(*) FROM calls_gt
  UNION ALL SELECT '{NS}callsResolved', count(*) FROM linked
  UNION ALL SELECT '{NS}canonical',
    (SELECT count(*) FROM defs_gt d JOIN multi m ON d.symbol = m.symbol)
)
SELECT p, n_triples FROM counts WHERE n_triples > 0
"""


def q_kg_split_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenated-object decode gate: pipeline -> N bounded Jelly
    streams -> byte-concatenate ALL of them into ONE .jelly object
    (the object-store append shape) -> segment-parallel decode
    (``read_jelly(split_foreign_files=True)``,
    jelly/ioutils.py::scan_stream_segments) -> per-predicate counts.

    Same closed-form oracle as kg_roundtrip: splitting the single
    object at its options-headed frames and decoding each segment with
    FRESH lookup state must recover exactly the union of the member
    streams' triples. (A sequential decode of the concatenation would
    NOT — stream A's lookup tables would leak into stream B; that
    mis-decode is pinned by tests/test_split_decode.py.)
    """
    import os
    import shutil
    import tempfile

    from pyjelly_spark.pipeline import PipelineConfig, run_pipeline
    from pyjelly_spark.sources.jelly_io import read_jelly

    files = derived_source_files(spark, sf_dir)
    out_dir = tempfile.mkdtemp(prefix="kg_split_parts_")
    cat_dir = tempfile.mkdtemp(prefix="kg_split_cat_")
    try:
        run_pipeline(
            spark,
            files,
            PipelineConfig(out_dir=out_dir, rows_per_stream=2000, resume=False),
        )
        cat_path = os.path.join(cat_dir, "concat.jelly")
        with open(cat_path, "wb") as out:
            for name in sorted(os.listdir(out_dir)):
                if name.endswith(".jelly"):
                    with open(os.path.join(out_dir, name), "rb") as part:
                        shutil.copyfileobj(part, out)
        decoded = read_jelly(spark, cat_path, split_foreign_files=True)
        return (
            decoded.groupBy(F.col("p_value").alias("p"))
            .agg(F.count(F.lit(1)).alias("n_triples"))
            # materialized on purpose: the finally below deletes the
            # .jelly file this plan reads
            .toPandas()
            .pipe(spark.createDataFrame)
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(cat_dir, ignore_errors=True)


def q_kg_grouped_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped (frame-per-graph) materialization round-trip: structural
    triples get graph = repo IRI, are written as a GRAPHS physical stream
    with one frame per consecutive graph run (distributed
    ``split_to_graphs``), then decoded back with ``frame_id``.

    The gate checks BOTH the statement content (per-graph triple counts)
    and the FRAMING (each graph lands in exactly one frame — possible
    because the partition plan keys on the graph, so no graph spans
    partitions). The oracle knows both in closed form.
    """
    import shutil
    import tempfile

    from pyjelly_spark.sources.jelly_io import (
        flatten_terms,
        read_jelly,
        write_jelly,
    )

    files = derived_source_files(spark, sf_dir)
    triples = X.structural_triples(files).withColumn(
        "g", X.iri(X.repo_iri(F.col("repo")))
    )
    flat = flatten_terms(triples, slots=("s", "p", "o", "g"))
    planned = flat.repartition(8, "repo").sortWithinPartitions(
        "repo", "kind_rank", "path", "o_value"
    )
    out_dir = tempfile.mkdtemp(prefix="kg_grouped_")
    try:
        write_jelly(planned, out_dir, grouped_by_graph=True, resume=False)
        decoded = read_jelly(spark, out_dir)
        agg = (
            decoded.groupBy(F.col("g_value").alias("graph"))
            .agg(
                F.count(F.lit(1)).alias("n_triples"),
                F.countDistinct("source_file", "frame_id").alias("n_frames"),
            )
        ).toPandas()  # materialize before the tempdir vanishes
        return spark.createDataFrame(agg)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_KG_GROUPED_ROUNDTRIP = f"""
WITH {SRC_SQL}
SELECT 'http://kg.example/repo/' || repo AS graph,
       3 * count(*) AS n_triples,
       1::BIGINT AS n_frames
FROM files GROUP BY repo
"""


def q_kg_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the registered Spark format (DSv2 Python data
    source, ``sources/jelly_datasource.py``): structural triples ->
    ``df.write.format("jelly")`` -> ``spark.read.format("jelly")`` ->
    per-predicate histogram. Exercises the Arrow-batch writer (one part
    file per partition + commit manifest) and the file-per-partition
    Arrow reader; the oracle knows the histogram in closed form."""
    import shutil
    import tempfile

    from pyjelly_spark.sources.jelly_datasource import register_jelly
    from pyjelly_spark.sources.jelly_io import flatten_terms

    register_jelly(spark)
    files = derived_source_files(spark, sf_dir)
    flat = flatten_terms(X.structural_triples(files))
    out_dir = tempfile.mkdtemp(prefix="kg_ds_")
    try:
        (
            flat.repartition(4)
            .write.format("jelly")
            .option("frame_rows", 500)
            .mode("overwrite")
            .save(out_dir)
        )
        decoded = spark.read.format("jelly").load(out_dir)
        agg = (
            decoded.groupBy(F.col("p_value").alias("p"))
            .agg(F.count(F.lit(1)).alias("n_triples"))
        ).toPandas()  # materialize before the tempdir vanishes
        return spark.createDataFrame(agg)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_KG_DATASOURCE_ROUNDTRIP = f"""
WITH {SRC_SQL}
SELECT p, n_triples FROM (
  SELECT '{NS}contains' AS p, count(*) AS n_triples FROM files
  UNION ALL SELECT '{NS}lang', count(*) FROM files
  UNION ALL SELECT '{NS}sha256', count(*) FROM files
) t
"""


def q_kg_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KG ingest through the STREAMING jelly source
    (``readStream.format("jelly")``, sources/jelly_datasource.py): two
    deterministic halves of the structural triples land as .jelly files
    in a landing directory; a checkpointed stream (availableNow) drains
    after each landing into a parquet sink; the result is the
    per-predicate histogram over both drains. Matching the closed-form
    oracle proves exactly-once incremental decode: a re-read of the
    first file would double its counts, a missed second file would
    short them."""
    import os
    import shutil
    import tempfile

    from pyjelly_spark.sources.jelly_datasource import register_jelly
    from pyjelly_spark.sources.jelly_io import flatten_terms

    register_jelly(spark)
    files = derived_source_files(spark, sf_dir)
    flat = flatten_terms(X.structural_triples(files))
    half = F.pmod(F.xxhash64("s_value", "p_value", "o_value"), F.lit(2))
    root = tempfile.mkdtemp(prefix="kg_stream_")
    src = os.path.join(root, "landing")
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")

    def drain() -> None:
        query = (
            spark.readStream.format("jelly")
            .load(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(300)

    try:
        for part in (0, 1):
            (
                flat.where(half == part)
                .coalesce(1)
                .write.format("jelly")
                .option("frame_rows", 500)
                .mode("append")
                .save(src)
            )
            drain()
        agg = (
            spark.read.parquet(sink)
            .groupBy(F.col("p_value").alias("p"))
            .agg(F.count(F.lit(1)).alias("n_triples"))
        ).toPandas()  # materialize before the tempdir vanishes
        return spark.createDataFrame(agg)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# Same closed form: the two streamed halves partition the triples.
SQL_KG_STREAM_INGEST = SQL_KG_DATASOURCE_ROUNDTRIP


def q_kg_stream_egress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG egress through the STREAMING jelly SINK
    (sources/jelly_io.py::write_jelly_stream): structural triples land
    as .jelly in a source dir, a checkpointed stream re-encodes them
    through the foreachBatch sink into batch=<id>/ Jelly stream dirs,
    and the batch reader over the sink root produces the per-predicate
    histogram. Matching the closed-form oracle proves the sink loses
    and duplicates nothing through the encode→frame→manifest→_SUCCESS
    path; the second (no-op) drain against the same checkpoint proves
    replay idempotence — double-landed batches would double counts."""
    import os
    import shutil
    import tempfile

    from pyjelly_spark.sources.jelly_io import (
        flatten_terms,
        read_jelly,
        read_jelly_stream,
        write_jelly,
        write_jelly_stream,
    )

    files = derived_source_files(spark, sf_dir)
    flat = flatten_terms(X.structural_triples(files))
    root = tempfile.mkdtemp(prefix="kg_egress_")
    src = os.path.join(root, "src")
    sunk = os.path.join(root, "sunk")
    ckpt = os.path.join(root, "ckpt")
    try:
        write_jelly(flat, src, resume=False)
        for qn in ("kg_egress_sink", "kg_egress_replay"):
            q = write_jelly_stream(
                read_jelly_stream(spark, src), sunk, ckpt, query_name=qn
            )
            q.awaitTermination(300)
        agg = (
            read_jelly(spark, sunk)
            .groupBy(F.col("p_value").alias("p"))
            .agg(F.count(F.lit(1)).alias("n_triples"))
        ).toPandas()  # materialize before the tempdir vanishes
        return spark.createDataFrame(agg)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_KG_STREAM_EGRESS = SQL_KG_DATASOURCE_ROUNDTRIP


# ---------------------------------------------------------------------------
# Relational analytics (TPC-H-style) — engine breadth on the star schema
# ---------------------------------------------------------------------------


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty", _f4(F.col("sum_qty") / F.col("count_order"))
        )
    )
    return out


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
  sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS sum_disc_price,
  sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)) * (1::DECIMAL(18,2) + l_tax::DECIMAL(18,2)))::DOUBLE AS sum_charge,
  count(*) AS count_order,
  floor(sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*) * 10000) / 10000 AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc).cast("double").alias("revenue"))
    )


SQL_TPCH_Q5 = """
SELECT n_name,
       sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Events: windowed aggregation, sessionization, top-N
# ---------------------------------------------------------------------------


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       sum(value::DECIMAL(18,2))::DOUBLE AS total_value
FROM events
GROUP BY 1, 2
"""


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on 30-min inactivity gaps."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


SQL_EVENTS_SESSIONS = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING
    ) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sessions
GROUP BY user_id, session_idx
"""


def q_events_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(_dec("value")).cast("double").alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("event_type", "user_id", "rank", "total_value")
    )


SQL_EVENTS_TOPN = """
WITH per_user AS (
  SELECT event_type, user_id, sum(value::DECIMAL(18,2))::DOUBLE AS total_value
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY total_value DESC, user_id ASC
  ) AS rank FROM per_user
)
SELECT event_type, user_id, rank, total_value FROM ranked WHERE rank <= 3
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup over (event_type, hour-of-day): multi-dimensional agg."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "hour", F.hour("ts").cast("long")
    )
    return (
        ev.cube("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("hour", F.lit(-1)).alias("hour"),
            "n_events",
            "total_value",
        )
    )


SQL_EVENTS_CUBE = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(hour, -1) AS hour,
       count(*) AS n_events,
       sum(value::DECIMAL(18,2))::DOUBLE AS total_value
FROM (SELECT event_type, extract(hour FROM ts)::BIGINT AS hour, value FROM events)
GROUP BY CUBE(event_type, hour)
"""


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window, 10 min slide) per type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "10 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )


SQL_EVENTS_SLIDING = """
SELECT strftime(to_timestamp((floor(epoch(ts) / 600) - j) * 600),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events
FROM events, range(0, 6) t(j)
GROUP BY 1, 2
"""


def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average over the last 5 events (window frame)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        _f4(
            F.sum(_dec("value")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


SQL_EVENTS_MOVING_AVG = """
SELECT user_id, event_id,
  floor(sum(value::DECIMAL(18,2)) OVER w::DOUBLE
        / count(*) OVER w * 10000) / 10000 AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: per user, flag events whose
    value deviates by more than 2 sigma from the trailing-8 window.
    Entirely in integer arithmetic — with cents c, trailing sum S and
    sum-of-squares Q over n=8 rows, |z| > 2 iff (8c - S)^2 > 4(8Q - S^2)
    — so the flag is bit-exact across engines (no float variance). The
    window is a per-user in-partition scan: one hash exchange on
    user_id, no driver state, skew-free (users are uniform)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, -1)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        cents.alias("cents"),
    ).select(
        "user_id",
        "event_id",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum("cents").over(w).alias("s8"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("q8"),
    )
    dev = 8 * F.col("cents") - F.col("s8")
    var8 = 8 * F.col("q8") - F.col("s8") * F.col("s8")
    return (
        base.where(F.col("n_prev") == 8)
        .where(dev * dev > 4 * var8)
        .select("user_id", "event_id", "cents", "s8", "q8")
    )


SQL_EVENTS_ANOMALY = """
WITH base AS (
  SELECT user_id, event_id,
    floor(value * 100)::BIGINT AS cents,
    count(*) OVER w AS n_prev,
    sum(floor(value * 100)::BIGINT) OVER w AS s8,
    sum(floor(value * 100)::BIGINT * floor(value * 100)::BIGINT) OVER w AS q8
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, cents, s8::BIGINT AS s8, q8::BIGINT AS q8
FROM base
WHERE n_prev = 8
  AND (8 * cents - s8) * (8 * cents - s8) > 4 * (8 * q8 - s8 * s8)
"""


def q_events_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per event_type (percentile, not approx)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        _f4(F.percentile("value", F.lit(0.5))).alias("median_value"),
        _f4(F.percentile("value", F.lit(0.9))).alias("p90_value"),
    )


SQL_EVENTS_MEDIAN = """
SELECT event_type,
       floor(quantile_cont(value, 0.5) * 10000) / 10000 AS median_value,
       floor(quantile_cont(value, 0.9) * 10000) / 10000 AS p90_value
FROM events GROUP BY 1
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column + histogram."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EVENTS_JSON = """
SELECT json_extract(props, '$.k')::BIGINT AS k, count(*) AS n
FROM events GROUP BY 1
"""


def q_cust_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never placed an order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


SQL_CUST_NO_ORDERS = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_part_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: brands in both / only one of two part populations."""
    part = _t(spark, sf_dir, "part")
    big = part.where(F.col("p_size") > 25).select("p_brand")
    pricey = part.where(F.col("p_retailprice") > 1400).select("p_brand")
    both = big.intersect(pricey).withColumn("tag", F.lit("both"))
    # subtract == EXCEPT DISTINCT (exceptAll would leak brands whose
    # multiset count differs between the two populations)
    only_big = big.subtract(pricey).withColumn("tag", F.lit("only_big"))
    return both.unionByName(only_big).select("tag", "p_brand")


SQL_PART_SETOPS = """
SELECT 'both' AS tag, p_brand FROM (
  SELECT p_brand FROM part WHERE p_size > 25
  INTERSECT
  SELECT p_brand FROM part WHERE p_retailprice > 1400
)
UNION ALL
SELECT 'only_big' AS tag, p_brand FROM (
  SELECT DISTINCT p_brand FROM part WHERE p_size > 25
    AND p_brand NOT IN (SELECT p_brand FROM part WHERE p_retailprice > 1400)
)
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

NORM_SQL = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(_t(spark, sf_dir, "documents"))


def _lang_count_sql(lang: str) -> str:
    pat = dict(T.LANG_STOPWORDS_RE2)[lang]
    return f"len(regexp_extract_all(text, '{pat}'))"


SQL_LANG_ID = f"""
WITH counts AS (
  SELECT doc_id, lang,
    {_lang_count_sql('en')} AS c_en,
    {_lang_count_sql('de')} AS c_de,
    {_lang_count_sql('fr')} AS c_fr,
    {_lang_count_sql('es')} AS c_es,
    {_lang_count_sql('zh')} AS c_zh
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
    CASE
      WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
      WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
      WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
      WHEN c_es >= c_zh THEN 'es'
      ELSE 'zh'
    END AS predicted_lang
  FROM counts
)
SELECT doc_id, lang, predicted_lang,
       CASE WHEN lang = predicted_lang THEN 1 ELSE 0 END AS is_correct
FROM pred
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_scores(_t(spark, sf_dir, "documents"))


SQL_TEXT_QUALITY = rf"""
WITH base AS (
  SELECT doc_id,
    length(text)::DOUBLE AS n_chars,
    len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))::DOUBLE AS n_words,
    len(regexp_extract_all(text, '{T.PUNCT_RE}'))::DOUBLE AS n_punct,
    len(regexp_extract_all(text, '{T.ALL_STOPWORDS_RE}'))::DOUBLE AS n_stop
  FROM documents
)
SELECT doc_id,
  n_chars::BIGINT AS n_chars,
  n_words::BIGINT AS n_words,
  floor(n_punct / n_chars * 10000) / 10000 AS punct_ratio,
  floor(n_stop / n_words * 10000) / 10000 AS stop_ratio,
  floor((least(n_words / 100.0, 1.0) * 0.4
         + (1.0 - n_punct / n_chars) * 0.3
         + n_stop / n_words * 0.3) * 10000) / 10000 AS quality_score
FROM base
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/val split, aggregated per
    (lang, split) — reproducible dataset splitting (see
    functions/text.py::train_val_split)."""
    assigned = T.train_val_split(_t(spark, sf_dir, "documents"), val_pct=10)
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_TRAIN_VAL_SPLIT = rf"""
WITH f AS (
  SELECT doc_id, lang, length(text)::BIGINT AS n_chars,
    ('0x' || substring(sha256({NORM_SQL}), 1, 15))::BIGINT % 100 AS h
  FROM documents
)
SELECT lang, CASE WHEN h < 90 THEN 'train' ELSE 'val' END AS split,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM f GROUP BY 1, 2
"""


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language by corpus frequency (vocab statistics;
    integer-only so the ranking is exactly engine-portable)."""
    from pyspark.sql.window import Window

    stats = T.term_stats(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("lang").orderBy(
        F.desc("total_count"), F.asc("term")
    )
    return (
        stats.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("lang", "term", "doc_freq", "total_count", "rank")
    )


SQL_TERM_STATS = rf"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split({NORM_SQL}, ' ')) AS term
  FROM documents
),
s AS (
  SELECT lang, term, count(DISTINCT doc_id) AS doc_freq,
         count(*) AS total_count
  FROM w WHERE term <> '' GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY total_count DESC, term ASC) AS rank
  FROM s
)
SELECT lang, term, doc_freq, total_count, rank FROM r WHERE rank <= 5
"""


def q_doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length quantiles (p50/p90/p99 lower bucket
    bounds) computed FROM a fixed-width integer histogram — never a
    global sort of per-document lengths (functions/text.py::
    length_quantiles). Integer cumulative comparison makes the result
    bit-identical to the oracle's identical histogram recurrence."""
    return T.length_quantiles(_t(spark, sf_dir, "documents")).orderBy("lang")


SQL_DOC_LENGTH_STATS = rf"""
WITH t AS (
  SELECT lang,
    len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))::BIGINT AS n
  FROM documents
),
h AS (
  SELECT lang, n // 16 AS bucket, count(*)::BIGINT AS n_docs
  FROM t GROUP BY 1, 2
),
c AS (
  SELECT lang, bucket, n_docs,
    sum(n_docs) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
    sum(n_docs) OVER (PARTITION BY lang) AS total
  FROM h
)
SELECT lang, max(total)::BIGINT AS n_docs,
  min(CASE WHEN cum * 100 >= 50 * total THEN bucket * 16 END)::BIGINT AS p50_lo,
  min(CASE WHEN cum * 100 >= 90 * total THEN bucket * 16 END)::BIGINT AS p90_lo,
  min(CASE WHEN cum * 100 >= 99 * total THEN bucket * 16 END)::BIGINT AS p99_lo
FROM c GROUP BY lang ORDER BY lang
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted index over the documents table: per term the
    uncapped document frequency + the first 8 doc_ids as a posting
    string (functions/text.py::inverted_index — the posting cap is a
    pre-collect row_number window, the hot-term skew guard). Restricted
    to terms appearing in >= 25 docs to keep the gated surface the
    high-df head."""
    return (
        T.inverted_index(_t(spark, sf_dir, "documents"), max_postings=8, min_df=25)
        .orderBy("term")
    )


SQL_INVERTED_INDEX = rf"""
WITH p AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS term
  FROM documents
),
p2 AS (SELECT doc_id, term FROM p WHERE term <> ''),
d AS (SELECT term, count(*)::BIGINT AS doc_freq FROM p2 GROUP BY 1),
r AS (
  SELECT term, doc_id,
    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM p2
),
pl AS (
  SELECT term, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
  FROM r WHERE rn <= 8 GROUP BY term
)
SELECT d.term, d.doc_freq, pl.postings
FROM d JOIN pl USING (term)
WHERE d.doc_freq >= 25
ORDER BY d.term
"""


def q_data_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality quota: keep the top-5 docs per lang by quality
    score (doc_id tiebreak) — the 'data mixing' selection step of a
    training pipeline. Ordering uses the floor-scaled score that the
    text_quality gate already proves engine-identical, so the cut is
    deterministic."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    scored = T.quality_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("doc_id", "lang", "quality_score", "rank")
    )


SQL_DATA_MIXING = rf"""
WITH base AS (
  SELECT doc_id,
    length(text)::DOUBLE AS n_chars,
    len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))::DOUBLE AS n_words,
    len(regexp_extract_all(text, '{T.PUNCT_RE}'))::DOUBLE AS n_punct,
    len(regexp_extract_all(text, '{T.ALL_STOPWORDS_RE}'))::DOUBLE AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id,
    floor((least(n_words / 100.0, 1.0) * 0.4
           + (1.0 - n_punct / n_chars) * 0.3
           + n_stop / n_words * 0.3) * 10000) / 10000 AS quality_score
  FROM base
),
r AS (
  SELECT q.doc_id, d.lang, q.quality_score,
    row_number() OVER (
      PARTITION BY d.lang ORDER BY q.quality_score DESC, q.doc_id ASC
    ) AS rank
  FROM q JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, quality_score, rank FROM r WHERE rank <= 5
"""


def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing index: every document mapped to
    its (shard, position, training-sequence range, offset) under a
    content-hash shard order — the data-loader artifact of an LLM
    pretraining run (see functions/text.py::pack_sequences). One hash
    exchange, per-shard windows, integer-exact."""
    return T.pack_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, n_shards=8
    )


SQL_SEQ_PACKING = rf"""
WITH base AS (
  SELECT doc_id,
    ('0x' || substring(sha256({NORM_SQL} || ':pack'), 1, 15))::BIGINT AS h,
    len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))::BIGINT AS n_tokens
  FROM documents
),
sh AS (
  SELECT doc_id, h, h % 8 AS shard, n_tokens FROM base WHERE n_tokens > 0
),
cum AS (
  SELECT doc_id, shard,
    row_number() OVER w AS pos, n_tokens,
    sum(n_tokens) OVER w - n_tokens AS cum_before
  FROM sh WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id)
)
SELECT doc_id, shard, pos::BIGINT AS pos, n_tokens,
  (cum_before // 512)::BIGINT AS seq_first,
  ((cum_before + n_tokens - 1) // 512)::BIGINT AS seq_last,
  (cum_before % 512)::BIGINT AS seq_offset
FROM cum
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping chunk index (RAG / context-window prep):
    size 200 chars, overlap 40 (see functions/text.py::chunk_documents).
    Pure narrow map — zero shuffles."""
    return T.chunk_documents(
        _t(spark, sf_dir, "documents"), size=200, overlap=40
    )


SQL_DOC_CHUNKS = r"""
WITH n AS (
  SELECT doc_id, text,
    CASE WHEN length(text) <= 200 THEN 1
         ELSE (length(text) - 200 + 160 - 1) // 160 + 1 END AS n_chunks
  FROM documents
),
e AS (
  SELECT doc_id, text,
    unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM n
)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
  (chunk_id * 160)::BIGINT AS chunk_start,
  length(substring(text, chunk_id * 160 + 1, 200))::BIGINT AS chunk_len,
  sha256(substring(text, chunk_id * 160 + 1, 200)) AS chunk_sha
FROM e
"""

BM25_TERMS = ("spark", "join", "window")


def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact tf-idf (BM25-family) relevance of every document
    against a fixed query-term set (see functions/text.py::bm25_scores).
    The explode is filtered to query terms before the shuffle; idf uses
    integer division so the ranking is engine-portable."""
    return T.bm25_scores(
        _t(spark, sf_dir, "documents"), list(BM25_TERMS)
    )


SQL_DOC_BM25 = rf"""
WITH w AS (
  SELECT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM w WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2
),
dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
idf AS (
  SELECT term, (n_docs * 1000) // (df + 1) AS idf_x1000 FROM dfq, n
)
SELECT tf.doc_id, count(*)::BIGINT AS n_hits,
  sum(tf.tf * idf.idf_x1000)::BIGINT AS score
FROM tf JOIN idf USING (term) GROUP BY 1
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/secret scrub gate. The synthetic corpus contains no PII, so the
    query deterministically injects it first — emails / IPv4s / 40-hex
    secrets derived from doc_id, the identical expression in the oracle —
    then the scrub must count and redact exactly those. ``redacted_sha``
    pins the full redacted text, so a wrong replacement anywhere flips
    the hash."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" mail u"), did.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" host 10."),
                    (did % 256).cast("string"),
                    F.lit(".0."),
                    (did % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" token "),
                    F.substring(F.sha2(did.cast("string"), 256), 1, 40),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return T.pii_scrub(aug).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_secret",
        F.sha2(F.col("redacted"), 256).alias("redacted_sha"),
    )


_PII_EMAIL, _PII_IPV4, _PII_SECRET = (p for _, p, _ in T.PII_PATTERNS)

SQL_PII_SCRUB = rf"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
         THEN ' mail u' || doc_id::VARCHAR || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 5 = 0
         THEN ' host 10.' || (doc_id % 256)::VARCHAR || '.0.'
              || (doc_id % 250)::VARCHAR ELSE '' END
    || CASE WHEN doc_id % 7 = 0
         THEN ' token ' || substring(sha256(doc_id::VARCHAR), 1, 40)
         ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_email,
  len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ipv4,
  len(regexp_extract_all(text, '{_PII_SECRET}'))::BIGINT AS n_secret,
  sha256(
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
        '{_PII_IPV4}', '<IP>', 'g'),
      '{_PII_SECRET}', '<SECRET>', 'g')
  ) AS redacted_sha
FROM aug
"""


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (pure array
    expressions, no shuffle — see functions/text.py::repetition_scores)."""
    return T.repetition_scores(_t(spark, sf_dir, "documents"))


SQL_DOC_REPETITION = rf"""
WITH f AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS ws FROM documents
),
b AS (
  SELECT doc_id, ws, len(ws) AS n_words,
    CASE WHEN len(ws) >= 2
      THEN [array_to_string(ws[i:i+1], ' ') FOR i IN range(1, len(ws))]
      ELSE [] END AS bg
  FROM f
)
SELECT doc_id, n_words::BIGINT AS n_words,
  floor(len(list_distinct(ws)) / n_words::DOUBLE * 10000) / 10000
    AS distinct_word_ratio,
  floor((len(bg) - len(list_distinct(bg)))
        / greatest(len(bg), 1)::DOUBLE * 10000) / 10000
    AS dup_bigram_ratio,
  floor(list_max([len(list_filter(ws, x -> x = t))
                  FOR t IN list_distinct(ws)])
        / n_words::DOUBLE * 10000) / 10000
    AS top_term_ratio
FROM b
"""


def q_doc_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-filter verdicts (word-count bounds, mean
    word length, distinct-word ratio, top-term dominance, stop-word
    floor) with the final keep flag — integer arithmetic throughout so
    the distributed verdict is bit-identical to the oracle's
    (functions/text.py::gopher_filter)."""
    return T.gopher_filter(_t(spark, sf_dir, "documents"))


SQL_DOC_FILTER = rf"""
WITH f AS (
  SELECT doc_id, {NORM_SQL} AS t, string_split({NORM_SQL}, ' ') AS ws
  FROM documents
),
s AS (
  SELECT doc_id,
    len(ws)::BIGINT AS n_words,
    list_sum(list_transform(ws, w -> len(w)))::BIGINT AS chars,
    len(list_distinct(ws))::BIGINT AS n_distinct,
    list_max([len(list_filter(ws, x -> x = u))
              FOR u IN list_distinct(ws)])::BIGINT AS top_cnt,
    len(regexp_extract_all(t,
      '\b(the|and|of|to|a|in|is|der|die|und|le|la|et|el|los|que)\b'
    ))::BIGINT AS n_stop
  FROM f
),
v AS (
  SELECT doc_id, n_words,
    floor(chars * 10000 / greatest(n_words, 1)::DOUBLE)::BIGINT
      AS mean_word_len_x10k,
    floor(n_distinct * 10000 / greatest(n_words, 1)::DOUBLE)::BIGINT
      AS distinct_ratio_x10k,
    floor(top_cnt * 10000 / greatest(n_words, 1)::DOUBLE)::BIGINT
      AS top_term_ratio_x10k,
    n_stop
  FROM s
)
SELECT doc_id, n_words, mean_word_len_x10k, distinct_ratio_x10k,
  top_term_ratio_x10k,
  (CASE WHEN n_words BETWEEN 30 AND 100000 THEN 1 ELSE 0 END)::BIGINT
    AS pass_word_count,
  (CASE WHEN mean_word_len_x10k BETWEEN 30000 AND 100000 THEN 1 ELSE 0 END)::BIGINT
    AS pass_mean_word_len,
  (CASE WHEN distinct_ratio_x10k >= 3500 THEN 1 ELSE 0 END)::BIGINT
    AS pass_distinct_ratio,
  (CASE WHEN top_term_ratio_x10k <= 1500 THEN 1 ELSE 0 END)::BIGINT
    AS pass_top_term,
  (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)::BIGINT AS pass_stopwords,
  ((CASE WHEN n_words BETWEEN 30 AND 100000 THEN 1 ELSE 0 END)
   * (CASE WHEN mean_word_len_x10k BETWEEN 30000 AND 100000 THEN 1 ELSE 0 END)
   * (CASE WHEN distinct_ratio_x10k >= 3500 THEN 1 ELSE 0 END)
   * (CASE WHEN top_term_ratio_x10k <= 1500 THEN 1 ELSE 0 END)
   * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END))::BIGINT AS keep
FROM v
"""


def q_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE gated artifact — exact
    dedup (keep lowest doc_id per content fingerprint) -> Gopher
    quality filter -> PII redaction counting -> content-hash train/val
    split, aggregated per (lang, split). Every stage is an
    already-gated operator; this gate proves they COMPOSE (the 100 TB
    product is the chain, not the pieces). Plan shape: one fingerprint
    exchange for dedup, then three narrow maps joined on doc_id."""
    docs = _t(spark, sf_dir, "documents")
    canon = (
        T.fingerprints(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(canon, "doc_id")
    gf = T.gopher_filter(kept).where(F.col("keep") == 1).select("doc_id", "n_words")
    pii = T.pii_scrub(kept).select(
        "doc_id",
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_secret")).alias("n_red"),
    )
    sp = T.train_val_split(kept).select("doc_id", "lang", "split")
    return (
        gf.join(pii, "doc_id")
        .join(sp, "doc_id")
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
            F.sum("n_red").cast("long").alias("sum_redactions"),
        )
        .orderBy("lang", "split")
    )


_FSV_KEPT = (
    SQL_DOC_FILTER.split("\nSELECT doc_id,", 1)[0]
    .strip()[len("WITH "):]
    .replace("FROM documents", "FROM kept", 1)
)

SQL_DOC_CURATION = rf"""
WITH canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256({NORM_SQL})
),
kept AS (SELECT d.* FROM documents d JOIN canon USING (doc_id)),
{_FSV_KEPT},
verdict AS (
  SELECT doc_id, n_words,
    ((CASE WHEN n_words BETWEEN 30 AND 100000 THEN 1 ELSE 0 END)
     * (CASE WHEN mean_word_len_x10k BETWEEN 30000 AND 100000 THEN 1 ELSE 0 END)
     * (CASE WHEN distinct_ratio_x10k >= 3500 THEN 1 ELSE 0 END)
     * (CASE WHEN top_term_ratio_x10k <= 1500 THEN 1 ELSE 0 END)
     * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)) AS keep
  FROM v
),
pii AS (
  SELECT doc_id,
    (len(regexp_extract_all(text, '{_PII_EMAIL}'))
     + len(regexp_extract_all(text, '{_PII_IPV4}'))
     + len(regexp_extract_all(text, '{_PII_SECRET}')))::BIGINT AS n_red
  FROM kept
),
sp AS (
  SELECT doc_id, lang,
    CASE WHEN ('0x' || substring(sha256({NORM_SQL}), 1, 15))::BIGINT % 100 < 90
      THEN 'train' ELSE 'val' END AS split
  FROM kept
)
SELECT sp.lang, sp.split,
       count(*)::BIGINT AS n_docs,
       sum(verdict.n_words)::BIGINT AS sum_words,
       sum(pii.n_red)::BIGINT AS sum_redactions
FROM verdict JOIN pii USING (doc_id) JOIN sp USING (doc_id)
WHERE verdict.keep = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing any word 5-gram with
    the val split (functions/text.py::decontaminate)."""
    return T.decontaminate(_t(spark, sf_dir, "documents"))


SQL_DECONTAM = rf"""
WITH f AS (
  SELECT doc_id,
    ('0x' || substring(sha256({NORM_SQL}), 1, 15))::BIGINT % 100 < 90
      AS is_train,
    string_split({NORM_SQL}, ' ') AS ws
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, is_train,
         array_to_string(ws[i:i+4], ' ') AS gram
  FROM f, LATERAL (SELECT unnest(range(1, greatest(len(ws)-3, 1))) AS i) t
),
keep AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) <= 50
),
b AS (SELECT g.* FROM g JOIN keep USING (gram))
SELECT t.doc_id,
       count(DISTINCT t.gram) AS n_shared_grams,
       count(DISTINCT v.doc_id) AS n_val_docs
FROM b t JOIN b v ON t.gram = v.gram AND t.is_train AND NOT v.is_train
GROUP BY t.doc_id
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_counts(_t(spark, sf_dir, "documents"))


SQL_TOKEN_COUNT = rf"""
SELECT doc_id,
  len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))::BIGINT AS n_ws_tokens,
  len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))::BIGINT AS n_bpe_tokens
FROM documents
"""


def q_doc_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram familiarity scoring — the integer-exact analogue of
    LM-perplexity quality filtering (functions/text.py::
    familiarity_scores): one corpus explode, Zipf-head-safe count
    aggregation, equi-join back, floor-scaled integer score."""
    return T.familiarity_scores(_t(spark, sf_dir, "documents"), min_count=3)


SQL_DOC_FAMILIARITY = f"""
WITH ws AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM ws WHERE len(w) >= 2
),
counts AS (SELECT bigram, count(*)::BIGINT AS cnt FROM grams GROUP BY 1)
SELECT g.doc_id AS doc_id,
       count(*)::BIGINT AS n_bigrams,
       sum(CASE WHEN c.cnt >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_familiar,
       sum(CASE WHEN c.cnt >= 3 THEN 1 ELSE 0 END)::BIGINT * 10000
         // count(*)::BIGINT AS familiarity_x10000
FROM grams g JOIN counts c ON g.bigram = c.bigram
GROUP BY 1
"""


def q_vocab_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 BPE merge candidates (first training iteration): adjacent
    character pairs of BPE-pretokenized words, weighted by word
    frequency. The one corpus-sized pass of tokenizer training —
    everything downstream of it in operators/vocab.py runs on the
    compressed distinct-word table. Integer counts, deterministic
    (cnt desc, pair asc) ranking."""
    from pyjelly_spark.operators import vocab as V

    return V.bpe_merge_candidates(_t(spark, sf_dir, "documents"), top=50)


SQL_VOCAB_BPE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS word
  FROM documents
),
wf AS (SELECT word, count(*) AS freq FROM toks GROUP BY 1),
pairs AS (
  -- scalar range() (a list) instead of the lateral table function:
  -- DuckDB's table-valued range() cannot take per-row bounds
  SELECT unnest(list_transform(range(1, len(word)),
           i -> substring(word, i, 1) || ' ' || substring(word, i + 1, 1)
         )) AS pair,
         freq
  FROM wf
  WHERE len(word) >= 2
),
counts AS (SELECT pair, sum(freq)::BIGINT AS cnt FROM pairs GROUP BY 1)
SELECT pair, cnt,
       row_number() OVER (ORDER BY cnt DESC, pair) AS rank
FROM counts
ORDER BY cnt DESC, pair
LIMIT 50
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprints(_t(spark, sf_dir, "documents"))


SQL_DOC_FINGERPRINT = f"""
WITH norm AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
SELECT doc_id,
  sha256(norm) AS fingerprint,
  ('0x' || substring(sha256(norm), 1, 15))::BIGINT AS fp_hash,
  ('0x' || substring(sha256(norm), 1, 15))::BIGINT % 1024 AS fp_bucket
FROM norm
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT = f"""
SELECT sha256({NORM_SQL}) AS fingerprint,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""

SHINGLES_SQL = f"""
w AS (SELECT doc_id, string_split({NORM_SQL}, ' ') AS w FROM documents),
shingles AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         )) AS shingle
  FROM w WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM shingles x JOIN shingles y USING (shingle)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT a, b, i::DOUBLE / (sa.sz + sb.sz - i) AS jaccard
  FROM inter
  JOIN sizes sa ON inter.a = sa.doc_id
  JOIN sizes sb ON inter.b = sb.doc_id
)
"""

JACCARD_THRESHOLD = 0.3


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


SQL_DEDUP_JACCARD = f"""
WITH {SHINGLES_SQL.strip()}
SELECT a, b, floor(jaccard * 10000) / 10000 AS jaccard
FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH path, exact-verified; gated on equality with the exact-Jaccard
    oracle. That equality is safe because the generator's borderline
    window is empty: the minimum true-pair jaccard is 0.9 at sf0.01 and
    0.8 at sf0.1 (measured), so with 16 bands x 2 well-mixed rows the
    per-pair miss bound is (1-0.8^2)^16 ~ 8.5e-8 — and being fully
    deterministic, recall was verified to be exactly 1.0 at BOTH scale
    factors (dedup._minhash_params notes the permutation-mixing fix that
    this required). The window-emptiness claim is executable:
    tests/test_training_ops.py::test_minhash_generator_borderline_window
    re-measures min true-pair jaccard and LSH==exact on the generator
    and fails before the driver gate would."""
    return D.minhash_pairs(
        _t(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dump near-dup detection: the pass a real corpus build runs
    BETWEEN ingests ("which of the new crawl's documents already exist
    in the other dumps?") — the exact-verified MinHash-LSH pair stream
    restricted to pairs whose documents come from DIFFERENT ``source``
    values, with both sources attached. The source attach is two
    equi-joins of the (tiny) pair stream against the (doc_id, source)
    projection — broadcast-sized at any corpus scale because pairs, not
    documents, are the left side."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_pairs(docs, threshold=JACCARD_THRESHOLD)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(
            src.select(
                F.col("doc_id").alias("a"), F.col("source").alias("source_a")
            ),
            "a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("b"), F.col("source").alias("source_b")
            ),
            "b",
        )
        .where(F.col("source_a") != F.col("source_b"))
        .select("a", "b", "source_a", "source_b", "jaccard")
    )


SQL_DEDUP_CROSS_SOURCE = f"""
WITH {SHINGLES_SQL.strip()},
pairs AS (
  SELECT a, b, floor(jaccard * 10000) / 10000 AS jaccard
  FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
)
SELECT p.a AS a, p.b AS b,
       da.source AS source_a, db.source AS source_b, p.jaccard AS jaccard
FROM pairs p
JOIN documents da ON p.a = da.doc_id
JOIN documents db ON p.b = db.doc_id
WHERE da.source <> db.source
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(_t(spark, sf_dir, "documents"), max_distance=3)


SQL_DEDUP_SIMHASH = f"""
WITH wd AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS word
  FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substring(sha256(word), 1, 15))::BIGINT AS h
  FROM wd WHERE word <> ''
),
bits AS (
  SELECT doc_id, t.i AS i, sum(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, range(0, 62) t(i)
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END) AS simhash
  FROM bits GROUP BY 1
)
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
FROM sig x JOIN sig y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk(_t(spark, sf_dir, "embeddings"), k=5)


SQL_EMBEDDING_TOPK = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
n AS (
  -- list_reduce is a left fold while the Spark path is a numpy/BLAS
  -- matmul (pairwise/SIMD summation): results can differ by ~1e-15
  -- relative. Both engines therefore floor with the same +1e-9 nudge
  -- (similarity.FLOOR_EPS) so a dot landing exactly on a 1e-4 boundary
  -- cannot split the gate. Ranking compares raw doubles; a 1e-15 gap
  -- only reorders genuinely-tied neighbors, broken by neighbor_id.
  SELECT vec_id, v,
    sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
  FROM v
),
scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
    list_reduce(
      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
      (acc, x) -> acc + x
    ) / (a.nrm * b.nrm) AS score
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT vec_id, neighbor_id, rank, floor(score * 10000 + 1e-9) / 10000 AS score
FROM ranked WHERE rank <= 5
"""


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the 5th dedup family)."""
    return SIM.cosine_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


SQL_DEDUP_EMBEDDING = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
n AS (
  SELECT vec_id, v,
    sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
  FROM v
)
SELECT a.vec_id AS a, b.vec_id AS b,
  floor(
    list_reduce(
      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
      (acc, x) -> acc + x
    ) / (a.nrm * b.nrm) * 10000 + 1e-9
  ) / 10000 AS score
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_reduce(
    list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
    (acc, x) -> acc + x
  ) / (a.nrm * b.nrm) >= 0.4 - 1e-9
"""


def q_embedding_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate path (sign-LSH, multi-table, 1-bit multiprobe) — now
    FULLY oracle-gated: the hyperplanes are sha256-derived (see
    similarity._hyperplanes), so the SQL below recomputes the identical
    bucket assignment, per-bucket top-k, and merged global ranking.
    Bit-stability: min |projection| over both SFs is 5.4e-6 (measured),
    7+ orders above any summation-order noise, so the sign of each
    plane-dot — and hence every bucket — is engine-independent. Recall vs
    q_embedding_topk is additionally asserted in tests."""
    return SIM.ann_topk(_t(spark, sf_dir, "embeddings"), k=5)


# Oracle constants must match the ann_topk defaults.
ANN_K, ANN_PLANES, ANN_TABLES, ANN_DIM = 5, 4, 4, 64

SQL_EMBEDDING_ANN = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
planes AS (
  -- identical closed form to similarity._hyperplanes: hex60/2^59 - 1
  SELECT p.p AS p, i.i AS i,
    ('0x' || substring(sha256('plane:' || p.p || ':' || i.i), 1, 15))::BIGINT
      / 576460752303423488.0 - 1.0 AS coef
  FROM range(0, {ANN_TABLES * ANN_PLANES}) p(p), range(0, {ANN_DIM}) i(i)
),
proj AS (
  SELECT v.vec_id, pl.p // {ANN_PLANES} AS t, pl.p % {ANN_PLANES} AS j,
         sum(v.v[pl.i + 1] * pl.coef) AS dot
  FROM v, planes pl
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vec_id, t,
    sum(CASE WHEN dot > 0 THEN 1::BIGINT << j ELSE 0::BIGINT END)
      + (t::BIGINT << 16) AS bucket
  FROM proj GROUP BY vec_id, t
),
cands AS (
  SELECT vec_id, bucket FROM sigs
  UNION ALL
  SELECT vec_id, xor(bucket, 1::BIGINT << f.j) AS bucket
  FROM sigs, range(0, {ANN_PLANES}) f(j)
),
n AS (
  SELECT vec_id, v,
    sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
  FROM v
),
bucket_scored AS (
  SELECT a.vec_id AS vec_id, a.bucket AS bucket, c.vec_id AS neighbor_id,
    list_reduce(
      list_transform(range(1, {ANN_DIM} + 1), i -> x.v[i] * y.v[i]),
      (acc, e) -> acc + e
    ) / (x.nrm * y.nrm) AS raw_score
  FROM sigs a
  JOIN cands c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
  JOIN n x ON a.vec_id = x.vec_id
  JOIN n y ON c.vec_id = y.vec_id
),
bucket_topk AS (
  SELECT vec_id, neighbor_id,
    floor(raw_score * 10000 + 1e-9) / 10000 AS score
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, bucket ORDER BY raw_score DESC, neighbor_id ASC
    ) AS rb FROM bucket_scored
  ) WHERE rb <= {ANN_K}
),
merged AS (
  SELECT vec_id, neighbor_id, max(score) AS score FROM bucket_topk GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, neighbor_id ASC
  ) AS rank FROM merged
)
SELECT vec_id, neighbor_id, rank, score FROM ranked WHERE rank <= {ANN_K}
"""


def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with re-rank (FAISS IVFADC+R shape):
    int64 vectors split into 8 subspaces, each quantized against a
    32-anchor sampled codebook; ADC keeps a top-50 shortlist per query
    (integer LUT sums over broadcast CODES, never raw vectors), exact
    integer L2 re-ranks to top-5 via keyed joins. Codebooks are refined
    with 2 distributed Lloyd iterations per subspace (re-rank recall
    0.66 -> 0.79). Bit-exact vs the oracle's replay of the whole
    train+encode+ADC+re-rank recurrence
    (operators/similarity.py::pq_topk)."""
    return SIM.pq_topk(
        _t(spark, sf_dir, "embeddings"),
        k=5, m=8, ks=32, rerank=50, learn_iters=PQ_ITERS,
    )


PQ_M, PQ_KS, PQ_SUB, PQ_RERANK, PQ_ITERS, PQ_SCALE_SQL = 8, 32, 8, 50, 2, 10**6


def _pq_sql(
    m: int, ks: int, sub: int, rerank: int, scale: int, iters: int
) -> str:
    """Unrolled PQ recurrence: anchor codebooks, ``iters`` Lloyd
    refinements per subspace (argmin assignment, truncating integer
    means, empty codes keep their entry), final encode, ADC shortlist,
    exact integer L2 re-rank — the identical integer math the operator
    runs (operators/similarity.py::pq_topk)."""

    def dist(tag: str, b: str) -> str:
        return f"""
d{tag} AS (
  SELECT iv.vec_id, b.m, b.j,
    sum((iv.v[b.m * {sub} + b.i + 1] - b.c)
        * (iv.v[b.m * {sub} + b.i + 1] - b.c)) AS d2
  FROM iv, {b} b GROUP BY 1, 2, 3
)""".strip()

    def assign(tag: str) -> str:
        return f"""
a{tag} AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, m ORDER BY d2 ASC, j ASC) AS r
    FROM d{tag}
  ) WHERE r = 1
)""".strip()

    def update(tag: str, b_prev: str, b_new: str) -> str:
        return f"""
{b_new} AS (
  SELECT b0.m, b0.j, b0.i,
    coalesce((u.s - (u.s % u.n)) // u.n, b0.c) AS c
  FROM {b_prev} b0 LEFT JOIN (
    SELECT a.m, a.code AS j, t.i,
      sum(iv.v[a.m * {sub} + t.i + 1])::BIGINT AS s, count(*)::BIGINT AS n
    FROM a{tag} a JOIN iv USING (vec_id), range(0, {sub}) t(i)
    GROUP BY 1, 2, 3
  ) u ON u.m = b0.m AND u.j = b0.j AND u.i = b0.i
)""".strip()

    steps = []
    prev = "b0"
    for it in range(1, iters + 1):
        steps.append(dist(str(it), prev))
        steps.append(assign(str(it)))
        steps.append(update(str(it), prev, f"b{it}"))
        prev = f"b{it}"
    steps.append(dist("f", prev))
    steps.append(assign("f"))
    unrolled = ",\n".join(steps)
    return f"""
WITH iv AS (
  SELECT vec_id,
    list_transform(embedding,
                   x -> round(x::DOUBLE * {scale})::BIGINT) AS v
  FROM embeddings
),
anchors AS (
  -- identical anchor draw to similarity._pq_codebooks: ks smallest
  -- portable hashes of 'pqanchor:<vec_id>', subvectors become codes
  SELECT v, row_number() OVER (
    ORDER BY ('0x' || substring(sha256('pqanchor:' || vec_id),
                                1, 15))::BIGINT, vec_id) - 1 AS j
  FROM iv
),
b0 AS (
  SELECT m.m, a.j, i.i, a.v[m.m * {sub} + i.i + 1] AS c
  FROM (SELECT * FROM anchors WHERE j < {ks}) a,
       range(0, {m}) m(m), range(0, {sub}) i(i)
),
{unrolled},
-- ADC: dist(q, x) = sum over subspaces of q's distance to x's code entry
adc AS (
  SELECT q.vec_id AS vec_id, x.vec_id AS neighbor_id,
    sum(q.d2) AS adc_dist
  FROM af x
  JOIN df q ON q.m = x.m AND q.j = x.code
  WHERE x.vec_id <> q.vec_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT vec_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY adc_dist ASC, neighbor_id ASC) AS r
    FROM adc
  ) WHERE r <= {rerank}
),
-- exact integer L2 re-rank of the ADC shortlist (IVFADC+R)
re AS (
  SELECT s.vec_id, s.neighbor_id,
    list_reduce(
      list_transform(range(1, len(q.v) + 1),
                     i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i])),
      (acc, y) -> acc + y
    ) AS l2_dist
  FROM shortlist s
  JOIN iv q ON q.vec_id = s.vec_id
  JOIN iv x ON x.vec_id = s.neighbor_id
),
final AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rank
  FROM re
)
SELECT vec_id, neighbor_id, l2_dist, rank::BIGINT AS rank
FROM final WHERE rank <= 5
"""


SQL_EMBEDDING_PQ = _pq_sql(
    PQ_M, PQ_KS, PQ_SUB, PQ_RERANK, PQ_SCALE_SQL, PQ_ITERS
)


def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (second scale path beside sign-LSH),
    fully oracle-gated: sha-derived centroids + measured >=1.5e-5
    assignment margins make cells engine-independent."""
    return SIM.ivf_topk(_t(spark, sf_dir, "embeddings"), k=5)


IVF_CELLS, IVF_PROBE = 16, 4

SQL_EMBEDDING_IVF = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
cents AS (
  -- identical closed form to similarity._ivf_centroids
  SELECT c.c AS cell, i.i AS i,
    ('0x' || substring(sha256('cell:' || c.c || ':' || i.i), 1, 15))::BIGINT
      / 576460752303423488.0 - 1.0 AS coef
  FROM range(0, {IVF_CELLS}) c(c), range(0, {ANN_DIM}) i(i)
),
cnorm AS (
  SELECT cell, sqrt(sum(coef * coef)) AS cn FROM cents GROUP BY cell
),
n AS (
  SELECT vec_id, v,
    sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
  FROM v
),
cellproj AS (
  SELECT n.vec_id, ct.cell, sum(n.v[ct.i + 1] * ct.coef) AS dot
  FROM n, cents ct
  GROUP BY 1, 2
),
ranked_cells AS (
  SELECT p.vec_id, p.cell,
    row_number() OVER (
      PARTITION BY p.vec_id
      ORDER BY p.dot / (n.nrm * cn.cn) DESC, p.cell ASC
    ) AS rc
  FROM cellproj p
  JOIN n ON p.vec_id = n.vec_id
  JOIN cnorm cn ON p.cell = cn.cell
),
members AS (SELECT vec_id, cell FROM ranked_cells WHERE rc = 1),
probes AS (SELECT vec_id, cell FROM ranked_cells WHERE rc <= {IVF_PROBE}),
bucket_scored AS (
  SELECT q.vec_id AS vec_id, q.cell AS bucket, m.vec_id AS neighbor_id,
    list_reduce(
      list_transform(range(1, {ANN_DIM} + 1), i -> x.v[i] * y.v[i]),
      (acc, e) -> acc + e
    ) / (x.nrm * y.nrm) AS raw_score
  FROM probes q
  JOIN members m ON q.cell = m.cell AND q.vec_id <> m.vec_id
  JOIN n x ON q.vec_id = x.vec_id
  JOIN n y ON m.vec_id = y.vec_id
),
bucket_topk AS (
  SELECT vec_id, neighbor_id,
    floor(raw_score * 10000 + 1e-9) / 10000 AS score
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, bucket ORDER BY raw_score DESC, neighbor_id ASC
    ) AS rb FROM bucket_scored
  ) WHERE rb <= 5
),
merged AS (
  SELECT vec_id, neighbor_id, max(score) AS score FROM bucket_topk GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY score DESC, neighbor_id ASC
  ) AS rank FROM merged
)
SELECT vec_id, neighbor_id, rank, score FROM ranked WHERE rank <= 5
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed (LSH) variant of embedding dedup — the scale path, with
    its own exact oracle replicating the bucket collisions in SQL."""
    return SIM.lsh_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


SQL_DEDUP_EMBEDDING_LSH = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
planes AS (
  SELECT p.p AS p, i.i AS i,
    ('0x' || substring(sha256('plane:' || p.p || ':' || i.i), 1, 15))::BIGINT
      / 576460752303423488.0 - 1.0 AS coef
  FROM range(0, {ANN_TABLES * ANN_PLANES}) p(p), range(0, {ANN_DIM}) i(i)
),
proj AS (
  SELECT v.vec_id, pl.p // {ANN_PLANES} AS t, pl.p % {ANN_PLANES} AS j,
         sum(v.v[pl.i + 1] * pl.coef) AS dot
  FROM v, planes pl
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vec_id, t,
    sum(CASE WHEN dot > 0 THEN 1::BIGINT << j ELSE 0::BIGINT END)
      + (t::BIGINT << 16) AS bucket
  FROM proj GROUP BY vec_id, t
),
cands AS (
  SELECT vec_id, bucket FROM sigs
  UNION ALL
  SELECT vec_id, xor(bucket, 1::BIGINT << f.j) AS bucket
  FROM sigs, range(0, {ANN_PLANES}) f(j)
),
pairs AS (
  SELECT DISTINCT a.vec_id AS a, c.vec_id AS b
  FROM sigs a JOIN cands c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
),
n AS (
  SELECT vec_id, v,
    sqrt(list_reduce(list_transform(v, x -> x * x), (acc, x) -> acc + x)) AS nrm
  FROM v
),
scored AS (
  SELECT p.a, p.b,
    list_reduce(
      list_transform(range(1, {ANN_DIM} + 1), i -> x.v[i] * y.v[i]),
      (acc, e) -> acc + e
    ) / (x.nrm * y.nrm) AS raw_score
  FROM pairs p JOIN n x ON p.a = x.vec_id JOIN n y ON p.b = y.vec_id
)
SELECT a, b, floor(raw_score * 10000 + 1e-9) / 10000 AS score
FROM scored WHERE raw_score >= 0.4 - 1e-9
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: exact Jaccard pairs -> distributed
    connected components -> (doc_id, rep, cluster_size) for every doc in
    a multi-doc cluster. The step after pair detection in a real dedup
    pipeline: transitive closure picks one representative per group
    (A~B, B~C groups A,B,C even when A!~C directly).

    Runs the SAME large-star/small-star CC operator as the KG
    canonicalization stage (operators/components.py) on a general pair
    graph — oracle-gated by a recursive-CTE transitive closure in
    DuckDB, so the iterative distributed algorithm is checked against a
    declarative exact one. Doc ids travel as native bigints — CC is
    type-agnostic (representative = min under the column type's
    ordering), so no pad/cast round-trip (the oracle's zero-padded
    string min equals numeric min for these ids).
    """
    from pyjelly_spark.operators.components import connected_components

    pairs = D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    assign = connected_components(edges)
    sizes = assign.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assign.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("rep"),
        "cluster_size",
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {SHINGLES_SQL.strip()},
p AS (
  SELECT lpad(a::VARCHAR, 12, '0') AS a, lpad(b::VARCHAR, 12, '0') AS b
  FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
n AS (SELECT DISTINCT src AS node FROM e),
r(node, m) AS (
  SELECT node, node FROM n
  UNION
  SELECT r.node, e.dst FROM r JOIN e ON r.m = e.src
),
comp AS (SELECT node, min(m) AS component FROM r GROUP BY node),
s AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT comp.node::BIGINT AS doc_id, comp.component::BIGINT AS rep,
       s.cluster_size
FROM comp JOIN s USING (component)
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed Spark-first: for every event, the value of
    the same user's most recent 'purchase' at or before it. One window
    pass (running last-non-null over (user, time) order) — no join at
    all, so it scales as a single hash-partition + sort, the plan an
    as-of join should compile to when both sides share a key."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(
            F.when(F.col("event_type") == "purchase", _f4(F.col("value"))),
            ignorenulls=True,
        )
        .over(w)
        .alias("last_purchase_value"),
    )


SQL_EVENTS_ASOF = """
SELECT event_id, user_id,
  last_value(CASE WHEN event_type = 'purchase'
                  THEN floor(value * 10000) / 10000 END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS last_purchase_value
FROM events
"""


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: every user's activity resampled onto a
    dense 1-hour grid from their first to their last event hour, hours
    with no events filled with n_events = 0 and the running total
    forward-filled.

    Spark-first shape: the grid is ``sequence()`` + ``explode`` built
    FROM the per-user bounds aggregate (no driver loop, no cross join —
    grid size is data-dependent per user), one equi-join back to the
    hourly aggregate, one window cumsum. Exact integer cents so the
    forward-fill is engine-portable."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.sum(F.coalesce("cents", F.lit(0))).over(w).cast("long").alias(
            "running_cents"
        ),
    )


SQL_EVENTS_GAPFILL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         count(*)::BIGINT AS n_events,
         sum(floor(value * 100)::BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, min(hour) AS mn, max(hour) AS mx FROM hourly GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT g.user_id,
  strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
  coalesce(h.n_events, 0)::BIGINT AS n_events,
  sum(coalesce(h.cents, 0)) OVER (
    PARTITION BY g.user_id ORDER BY g.hour
    ROWS UNBOUNDED PRECEDING
  )::BIGINT AS running_cents
FROM grid g LEFT JOIN hourly h USING (user_id, hour)
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketed: events tagged with the closed-form
    maintenance window containing them (windows = 1h slices every 7h).

    The naive plan is a non-equi join (every event x every window —
    O(n*m) nested loop). The scale pattern used here: both sides key on
    the hour bucket, the interval side exploding one row per covered
    bucket, so the join is a plain EQUI join + residual filter. Window
    length <= bucket size means exactly one bucket row per window here.
    """
    ev = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    # closed-form windows over the data's 30-day span: start = k*7h
    windows = (
        spark.range(0, 30 * 24 // 7 + 1)
        .select(
            F.col("id").alias("window_id"),
            (F.col("id") * 7 * 3600).alias("w_start"),
            (F.col("id") * 7 * 3600 + 3600).alias("w_end"),
        )
        .withColumn("bucket", (F.col("w_start") / 3600).cast("long"))
    )
    base = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ev_b = ev.select(
        "event_id", (epoch - base).alias("off")
    ).withColumn("bucket", (F.col("off") / 3600).cast("long"))
    joined = ev_b.join(windows, "bucket").where(
        (F.col("off") >= F.col("w_start")) & (F.col("off") < F.col("w_end"))
    )
    return joined.select("event_id", "window_id")


SQL_EVENTS_RANGE_JOIN = """
WITH w AS (
  SELECT i AS window_id, i * 7 * 3600 AS w_start, i * 7 * 3600 + 3600 AS w_end
  FROM range(0, 30 * 24 // 7 + 1) t(i)
),
ev AS (
  SELECT event_id,
    epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00') AS off
  FROM events
)
SELECT ev.event_id, w.window_id
FROM ev JOIN w ON ev.off >= w.w_start AND ev.off < w.w_end
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-format daily matrix via Spark's pivot relational operator:
    one row per day, one count column per event type. The explicit value
    list keeps the plan single-pass (no distinct-values pre-query) and
    the output schema static — the shape that matters at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


SQL_EVENTS_PIVOT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
  count(*) FILTER (event_type = 'click') AS click,
  count(*) FILTER (event_type = 'error') AS error,
  count(*) FILTER (event_type = 'purchase') AS purchase,
  count(*) FILTER (event_type = 'signup') AS signup,
  count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1
"""


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup decision pipeline — the composition a real
    training-data job runs: exact fingerprint dedup, then MinHash-LSH
    text near-dup, then bucketed embedding near-dup, cascaded into one
    keep/drop + reason per document. Canonical = the smallest doc_id of
    each duplicate class; the b-side (larger id) of every near-dup pair
    drops. All three stages are the oracle-gated operators above, so the
    composition is closed-form checkable too."""
    from pyjelly_spark.functions.text import normalized

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    canon = docs.select(
        "doc_id", F.sha2(normalized(F.col("text")), 256).alias("fp")
    ).withColumn("canon", F.min("doc_id").over(Window.partitionBy("fp")))
    mh_b = (
        D.minhash_pairs(docs, threshold=JACCARD_THRESHOLD)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("is_mh", F.lit(1))
    )
    em_b = (
        SIM.lsh_dup_pairs(emb, threshold=0.4)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("is_em", F.lit(1))
    )
    flags = canon.join(mh_b, "doc_id", "left").join(em_b, "doc_id", "left")
    reason = (
        F.when(F.col("canon") != F.col("doc_id"), F.lit("exact"))
        .when(F.col("is_mh").isNotNull(), F.lit("near_text"))
        .when(F.col("is_em").isNotNull(), F.lit("near_embedding"))
        .otherwise(F.lit("unique"))
    )
    return flags.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "unique").cast("int").alias("keep"),
    )


SQL_DEDUP_PIPELINE = f"""
WITH canon AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY sha256({NORM_SQL})) AS canon
  FROM documents
),
mh AS (
  SELECT DISTINCT b FROM (
    WITH {SHINGLES_SQL.strip()}
    SELECT b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
  )
),
em AS (
  SELECT DISTINCT b FROM ({SQL_DEDUP_EMBEDDING_LSH})
)
SELECT c.doc_id,
  CASE WHEN c.canon <> c.doc_id THEN 'exact'
       WHEN mh.b IS NOT NULL THEN 'near_text'
       WHEN em.b IS NOT NULL THEN 'near_embedding'
       ELSE 'unique' END AS reason,
  (CASE WHEN c.canon <> c.doc_id THEN 'exact'
        WHEN mh.b IS NOT NULL THEN 'near_text'
        WHEN em.b IS NOT NULL THEN 'near_embedding'
        ELSE 'unique' END = 'unique')::INT AS keep
FROM canon c
LEFT JOIN mh ON c.doc_id = mh.b
LEFT JOIN em ON c.doc_id = em.b
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.attach_media(_t(spark, sf_dir, "documents"))
    return media.select(
        "media_id", "kind", "n_bytes", "meta_width", "meta_height",
        "meta_duration_ms",
    )


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  octet_length(encode(text))::BIGINT AS n_bytes,
  CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 8 + 1) * 64)::INT END AS meta_width,
  CASE WHEN doc_id % 3 = 0 THEN ((doc_id % 6 + 1) * 64)::INT END AS meta_height,
  CASE WHEN doc_id % 3 <> 0 THEN ((doc_id % 120 + 1) * 1000)::BIGINT END AS meta_duration_ms
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (deterministic fake codec) — rows-only
    check (features are arrays; sha lineage asserted in tests)."""
    media = MM.attach_media(_t(spark, sf_dir, "documents"))
    feats = MM.decode_media(media, dim=8)
    return feats.select("media_id", "kind", "n_bytes", "payload_sha")


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  octet_length(encode(text))::BIGINT AS n_bytes,
  sha256(text) AS payload_sha
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sample plan (pure Catalyst sequence+posexplode)."""
    media = MM.attach_media(_t(spark, sf_dir, "documents"))
    return MM.frame_sample(media, every_ms=10_000).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("ts_ms").cast("long").alias("ts_ms"),
    )


SQL_MULTIMODAL_FRAMES = """
SELECT media_id, frame_idx::BIGINT AS frame_idx,
       (frame_idx * 10000)::BIGINT AS ts_ms
FROM (
  -- list-valued range() correlates fine (unlike the table function)
  SELECT doc_id AS media_id,
         unnest(range(0, (doc_id % 120 + 1) // 10 + 1)) AS frame_idx
  FROM documents WHERE doc_id % 3 = 2
)
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan for images (pure Catalyst)."""
    media = MM.attach_media(_t(spark, sf_dir, "documents"))
    return MM.resize_plan(media, max_side=256)


SQL_MULTIMODAL_RESIZE = """
SELECT doc_id AS media_id,
  ((doc_id % 8 + 1) * 64)::INT AS meta_width,
  ((doc_id % 6 + 1) * 64)::INT AS meta_height,
  ceil(((doc_id % 8 + 1) * 64)
    * least(1.0, 256 / greatest((doc_id % 8 + 1) * 64,
                                (doc_id % 6 + 1) * 64)::DOUBLE))::INT
    AS target_width,
  ceil(((doc_id % 6 + 1) * 64)
    * least(1.0, 256 / greatest((doc_id % 8 + 1) * 64,
                                (doc_id % 6 + 1) * 64)::DOUBLE))::INT
    AS target_height
FROM documents WHERE doc_id % 3 = 0
"""


# ---------------------------------------------------------------------------
# Streaming (batch-equivalent semantics -> same oracle as events_hourly)
# ---------------------------------------------------------------------------


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyjelly_spark.streaming.jobs import run_windowed_counts_batchmode

    return run_windowed_counts_batchmode(spark, f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# Graph analytics II + clustering + corpus statistics (round-2 additions)
# ---------------------------------------------------------------------------


def q_kg_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the resolved import graph: 4 fixed peeling rounds at
    k=2 (operators/components.py::kcore) — the "structurally load-
    bearing files" view a code-intelligence consumer derives from the
    constructed KG. Fixed rounds make the iterative peel bit-identical
    to the oracle's unrolled recurrence."""
    from pyjelly_spark.operators.components import kcore

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return kcore(edges, k=2, rounds=4)


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Unrolled fixed-round peeling: per round keep nodes with surviving
    degree >= k, then edges with both endpoints kept — identical
    recurrence to operators/components.py::kcore."""
    its = []
    for r in range(1, rounds + 1):
        its.append(f"""
n{r} AS (
  SELECT src AS node FROM e{r - 1} GROUP BY src HAVING count(*) >= {k}
),
e{r} AS (
  SELECT e.src, e.dst FROM e{r - 1} e
  JOIN n{r} a ON e.src = a.node
  JOIN n{r} b ON e.dst = b.node
)""".strip())
    joined = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
edges0 AS (
  SELECT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges0
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges0
  ) WHERE src <> dst
),
{joined}
SELECT src AS node, count(*)::BIGINT AS deg
FROM e{rounds} GROUP BY src
"""


SQL_KG_KCORE = _kcore_sql(2, 4).format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


KMEANS_K, KMEANS_ITERS, KMEANS_SCALE = 8, 2, 10**6


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration integer Lloyd's k-means over the embeddings table
    (operators/clustering.py::kmeans_int): exact integer distances and
    exact integer centroid means make the distributed iterative
    algorithm bit-identical to the oracle's unrolled recurrence —
    the embedding-clustering primitive behind IVF coarse quantizers and
    topic-balanced data mixing."""
    from pyjelly_spark.operators.clustering import kmeans_int

    asg = kmeans_int(
        _t(spark, sf_dir, "embeddings"),
        k=KMEANS_K,
        iterations=KMEANS_ITERS,
        scale=KMEANS_SCALE,
    )
    return asg.select(F.col("vid").alias("vec_id"), "cid")


def _kmeans_sql(k: int, iterations: int, scale: int, dim: int = 64) -> str:
    """Unrolled Lloyd's recurrence: assignment = argmin of exact integer
    squared distance (ties to the smallest cid), update = exact integer
    mean, empty clusters keep their centroid."""

    def assign(a: str, c: str) -> str:
        return f"""
{a} AS (
  SELECT vid, cid FROM (
    SELECT p.vid, c.cid,
      row_number() OVER (
        PARTITION BY p.vid
        ORDER BY list_reduce(
          list_transform(range(1, {dim + 1}),
                         i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i])),
          (acc, e) -> acc + e
        ) ASC, c.cid ASC
      ) AS rn
    FROM pts p, {c} c
  ) WHERE rn = 1
)""".strip()

    def update(a: str, c_prev: str, c_new: str) -> str:
        return f"""
{c_new} AS (
  SELECT p0.cid, coalesce(u.v, p0.v) AS v
  FROM {c_prev} p0 LEFT JOIN (
    SELECT cid, list((s - (s % n)) // n ORDER BY i) AS v FROM (
      SELECT a.cid, t.i, sum(p.v[t.i])::BIGINT AS s, count(*)::BIGINT AS n
      FROM {a} a JOIN pts p USING (vid), range(1, {dim + 1}) t(i)
      GROUP BY a.cid, t.i
    ) GROUP BY cid
  ) u USING (cid)
)""".strip()

    steps = []
    prev = "c0"
    for it in range(1, iterations + 1):
        steps.append(assign(f"a{it}", prev))
        steps.append(update(f"a{it}", prev, f"c{it}"))
        prev = f"c{it}"
    steps.append(assign("afinal", prev))
    joined = ",\n".join(steps)
    return f"""
WITH pts AS (
  SELECT vec_id AS vid,
    list_transform(embedding, x -> round(x::DOUBLE * {scale})::BIGINT) AS v
  FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vid)::BIGINT AS cid, v
  FROM (SELECT vid, v FROM pts ORDER BY vid LIMIT {k})
),
{joined}
SELECT vid AS vec_id, cid FROM afinal
"""


SQL_EMBEDDING_KMEANS = _kmeans_sql(KMEANS_K, KMEANS_ITERS, KMEANS_SCALE)


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal duplicated 5-gram fraction per document
    (functions/text.py::dup_span_fraction) — the span-level redundancy
    report behind RefinedWeb/Dolma-style dedup decisions."""
    return T.dup_span_fraction(_t(spark, sf_dir, "documents"), n=5)


SQL_DOC_DUP_SPANS = rf"""
WITH f AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS ws FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
  FROM f, LATERAL (SELECT unnest(range(1, greatest(len(ws)-3, 1))) AS i) t
),
d AS (
  SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df FROM g
)
SELECT doc_id,
  count(*)::BIGINT AS n_grams,
  sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_grams,
  ((sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 10000) // count(*))::BIGINT
    AS dup_pct_x10000
FROM d GROUP BY doc_id
"""


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span removal (Lee et al. 2022): every word inside
    a corpus-duplicated 5-gram is cut except in the gram's canonical
    (min-doc_id) document — one surviving occurrence per span. Returns
    per-doc word counts, removal counts, and the cleaned text's sha256
    (functions/text.py::remove_dup_spans)."""
    return T.remove_dup_spans(_t(spark, sf_dir, "documents"), n=5)


SQL_DEDUP_SPAN_REMOVAL = rf"""
WITH f AS (
  SELECT doc_id, string_split({NORM_SQL}, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS gram
  FROM f, LATERAL (SELECT unnest(range(1, greatest(len(ws)-3, 1))) AS i) t
),
dict AS (
  SELECT gram, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS canon
  FROM g GROUP BY gram
),
flagged AS (
  SELECT g.doc_id, g.i FROM g JOIN dict USING (gram)
  WHERE dict.n_docs >= 2 AND g.doc_id <> dict.canon
),
w AS (
  SELECT doc_id, j, ws[j] AS word, len(ws) AS n_words
  FROM f, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) t
),
cov AS (
  SELECT w.doc_id, w.j, any_value(w.word) AS word,
    any_value(w.n_words) AS n_words,
    bool_or(fl.i IS NOT NULL) AS c
  FROM w LEFT JOIN flagged fl
    ON fl.doc_id = w.doc_id AND fl.i BETWEEN w.j - 4 AND w.j
  GROUP BY w.doc_id, w.j
)
SELECT doc_id,
  any_value(n_words)::BIGINT AS n_words,
  sum(CASE WHEN c THEN 1 ELSE 0 END)::BIGINT AS n_removed,
  sha256(coalesce(
    string_agg(word, ' ' ORDER BY j) FILTER (WHERE NOT c), ''
  )) AS cleaned_sha
FROM cov GROUP BY doc_id
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue-change: the canonical predicate-
    pushdown showcase — every filter reaches the parquet scan
    (PushedFilters), one map-side-combined global aggregate, zero
    joins. Decimal-exact like q1/q3/q5."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * _dec("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


SQL_TPCH_Q6 = """
SELECT sum(l_extendedprice::DECIMAL(18,2) * l_discount::DECIMAL(18,2))::DOUBLE
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, retained-
    user counts at day offsets 0..7 — the standard product-analytics
    rollup. One aggregation derives cohorts, one distinct builds active
    (user, day) pairs, and the cohort join is user-keyed (the cohort
    table is one row per user — AQE broadcasts it while it fits)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    active = ev.distinct()
    cohort = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_EVENTS_RETENTION = """
WITH active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM active GROUP BY user_id
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', c.cohort_day, a.day) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohort c USING (user_id)
WHERE date_diff('day', c.cohort_day, a.day) <= 7
GROUP BY 1, 2
"""


def q_kg_sparql_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-star over RDF-star annotation triples: resolved import
    edges are annotated with a confidence score carried on the QUOTED
    TRIPLE itself (``<< <f> <importsResolved> <t> >> :confidence "d"``,
    the flat-column qt convention), and a quoted-triple pattern binds
    the inner subject/object while filtering on the annotation — the
    rdflib-SPARQL-star query shape running distributed
    (operators/sparql.py::term_or_quoted -> bgp.py::QuotedPattern)."""
    from pyjelly_spark.operators.sparql import sparql_query

    edges = q_kg_imports_resolved(spark, sf_dir)
    annotated = edges.select(
        F.concat(
            F.lit("<< <"), F.col("s"),
            F.lit("> <"), F.col("p"),
            F.lit("> <"), F.col("o"), F.lit("> >>"),
        ).alias("s"),
        F.lit("http://kg.example/pred/confidence").alias("p"),
        ((F.length(edges["s"]) + F.length(edges["o"])) % 10)
        .cast("string")
        .alias("o"),
    )
    q = """
    SELECT ?f ?t ?conf WHERE {
      << ?f <http://kg.example/ns#importsResolved> ?t >>
        <http://kg.example/pred/confidence> ?conf .
      FILTER (?conf >= "5")
    }
    """
    return sparql_query(annotated, q)


SQL_KG_SPARQL_STAR = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
resolved AS (
  SELECT file_iri AS f,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS t
  FROM imports_gt
)
SELECT f, t,
  ((length(f) + length(t)) % 10)::VARCHAR AS conf
FROM resolved
WHERE ((length(f) + length(t)) % 10)::VARCHAR >= '5'
"""


SSSP_ROUNDS = 8


def q_kg_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from one file over the resolved import
    graph — fixed-round integer Bellman-Ford
    (operators/components.py::sssp_int). Edge weights are a
    deterministic function of the edge itself
    (1 + (len(src)+len(dst)) % 5), so both engines derive identical
    weights; min path cost within 8 relaxation rounds."""
    from pyjelly_spark.operators.components import sssp_int

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"),
        F.col("o").alias("dst"),
        (
            1 + (F.length("s") + F.length("o")) % 5
        ).cast("long").alias("w"),
    )
    sources = spark.createDataFrame([(REACH_SOURCE,)], ["node"])
    return sssp_int(edges, sources, rounds=SSSP_ROUNDS)


def _sssp_sql(rounds: int) -> str:
    """Unrolled fixed-round Bellman-Ford min-union recurrence, identical
    to operators/components.py::sssp_int."""
    its = []
    for r in range(1, rounds + 1):
        its.append(f"""
d{r} AS (
  SELECT node, min(dist)::BIGINT AS dist FROM (
    SELECT node, dist FROM d{r - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{r - 1} d JOIN we e ON e.src = d.node
  ) GROUP BY node
)""".strip())
    joined = ",\n".join(its)
    return f"""
WITH {{src}}, {{mentions}},
edges0 AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
),
we AS (
  SELECT src, dst, 1 + (length(src) + length(dst)) % 5 AS w
  FROM edges0 WHERE src <> dst
),
d0 AS (SELECT '{{source}}' AS node, 0::BIGINT AS dist),
{joined}
SELECT node, dist FROM d{rounds}
"""


SQL_KG_SSSP = _sssp_sql(SSSP_ROUNDS).format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip(), source=REACH_SOURCE
)


SAMPLE_RATES = {"en": 80, "de": 40, "fr": 20}


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling
    (functions/text.py::stratified_sample), aggregated per (lang, keep):
    the data-mixing recipe applied as a pure function of content."""
    s = T.stratified_sample(
        _t(spark, sf_dir, "documents"), SAMPLE_RATES, default_pct=10
    )
    return s.groupBy("lang", "keep").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_SAMPLE_STRATIFIED = rf"""
WITH f AS (
  SELECT doc_id, lang, n_chars,
    ('0x' || substring(sha256({NORM_SQL} || ':sample'), 1, 15))::BIGINT % 100
      AS bucket,
    CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 40 WHEN 'fr' THEN 20
      ELSE 10 END AS rate_pct
  FROM documents
)
SELECT lang, bucket < rate_pct AS keep,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM f GROUP BY 1, 2
"""


EXACT_SAMPLE_SIZES = {"en": 120, "de": 60, "fr": 30}


def q_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic stratified sampling
    (functions/text.py::stratified_sample_exact): keep exactly k docs
    per language, chosen as the lowest content hashes — eval-set
    construction where approximate rates are not acceptable. One hash
    exchange on the stratum key."""
    return T.stratified_sample_exact(
        _t(spark, sf_dir, "documents"), EXACT_SAMPLE_SIZES, default_size=10
    ).orderBy("lang", "rank")


SQL_SAMPLE_EXACT = rf"""
WITH f AS (
  SELECT doc_id, lang,
    ('0x' || substring(sha256({{norm}} || ':exact_sample'), 1, 15))::BIGINT AS h
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
  FROM f
)
SELECT doc_id, lang, rank::BIGINT AS rank FROM r
WHERE rank <= CASE lang WHEN 'en' THEN 120 WHEN 'de' THEN 60
                        WHEN 'fr' THEN 30 ELSE 10 END
ORDER BY lang, rank
""".format(norm=NORM_SQL)


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: priority =
    hash div weight (the integer analogue of A-ES exponential-clock
    sampling — doubling an item's weight halves its expected priority),
    keep the k=100 lowest priorities. Because the priority is a pure
    column expression, Spark executes the top-k as TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows) — NO global sort at
    any input size. The oracle is the same ORDER BY/LIMIT."""
    ev = _t(spark, sf_dir, "events")
    # zero-value events get the floor weight 1 (still sampleable, just
    # minimum-probability) — also keeps the integer division total
    base = ev.select(
        "event_id",
        F.greatest(F.floor(F.col("value") * 100).cast("long"), F.lit(1)).alias(
            "cents"
        ),
        T.hex_hash(
            F.concat(F.col("event_id").cast("string"), F.lit(":wsample"))
        ).alias("h"),
    )
    return (
        base.select(
            "event_id", "cents", F.expr("h div cents").cast("long").alias("priority")
        )
        .orderBy("priority", "event_id")
        .limit(100)
    )


SQL_SAMPLE_WEIGHTED = """
WITH f AS (
  SELECT event_id, greatest(floor(value * 100)::BIGINT, 1) AS cents,
    ('0x' || substring(sha256(event_id::VARCHAR || ':wsample'), 1, 15))::BIGINT
      AS h
  FROM events
)
SELECT event_id, cents, (h // cents)::BIGINT AS priority
FROM f ORDER BY priority, event_id LIMIT 100
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup (operators/dedup.py::incremental_dedup):
    a deterministic incoming batch — every doc_id % 5 == 0 doc
    redelivered verbatim under doc_id + 100000 (dup_existing), every
    doc_id % 7 == 0 doc re-sent with edited text under doc_id + 200000
    (new), and one doc_id % 35 == 0 slice duplicated AGAIN under
    doc_id + 300000 (dup_batch vs the +200000 copy) — classified
    against the corpus."""
    from pyjelly_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    redelivered = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    edited = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("edited v2 "), F.col("text")).alias("text"),
    )
    edited_again = docs.where(F.col("doc_id") % 35 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.lit("edited v2 "), F.col("text")).alias("text"),
    )
    incoming = redelivered.unionByName(edited).unionByName(edited_again)
    return incremental_dedup(docs.select("doc_id", "text"), incoming)


SQL_DEDUP_INCREMENTAL = rf"""
WITH inc AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000, 'edited v2 ' || text FROM documents
  WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 300000, 'edited v2 ' || text FROM documents
  WHERE doc_id % 35 = 0
),
exf AS (
  SELECT sha256({NORM_SQL}) AS fp, min(doc_id) AS ex_canon
  FROM documents GROUP BY 1
),
incf AS (
  SELECT doc_id, sha256({NORM_SQL}) AS fp,
         min(doc_id) OVER (PARTITION BY sha256({NORM_SQL})) AS batch_canon
  FROM inc
)
SELECT i.doc_id,
  CASE WHEN e.ex_canon IS NOT NULL THEN 'dup_existing'
       WHEN i.doc_id <> i.batch_canon THEN 'dup_batch'
       ELSE 'new' END AS verdict,
  coalesce(e.ex_canon, i.batch_canon) AS canonical_doc_id
FROM incf i LEFT JOIN exf e USING (fp)
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click —
    the standard product-analytics conversion funnel, as strictly-
    ordered min-timestamp chaining. One scan per step, user-keyed joins
    (each step's frame is one row per surviving user, so AQE broadcasts
    the shrinking side); no window over the whole event stream."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(step: str, prev: DataFrame | None) -> DataFrame:
        e = ev.where(F.col("event_type") == step)
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col("t_prev"))
        return e.groupBy("user_id").agg(F.min("ts").alias("t_prev"))

    out = None
    prev = None
    for i, step in enumerate(FUNNEL_STEPS, start=1):
        prev = first_after(step, prev)
        row = prev.agg(
            F.lit(i).cast("long").alias("step"),
            F.lit(step).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1::BIGINT AS step, 'view' AS event_type, count(*) AS n_users FROM s1
UNION ALL
SELECT 2::BIGINT, 'click', count(*) FROM s2
UNION ALL
SELECT 3::BIGINT, 'purchase', count(*) FROM s3
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once ingest dedup: the event backlog drained
    with availableNow, every event_id % 3 == 0 event redelivered twice,
    watermarked dropDuplicates repairing the stream to exactly-once —
    result must equal the batch per-type distinct counts
    (streaming/jobs.py::deduped_type_counts)."""
    from pyjelly_spark.streaming.jobs import run_stream_dedup_batchmode

    return run_stream_dedup_batchmode(spark, f"{sf_dir}/events.parquet")


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the static
    customer dimension (user -> nation, broadcast per micro-batch) and
    aggregated per (nation, event type) with exact integer cent sums
    (streaming/jobs.py::enriched_nation_counts). Drained with
    availableNow; must equal the batch join+aggregate."""
    from pyjelly_spark.streaming.jobs import run_stream_enrich_batchmode

    return run_stream_enrich_batchmode(
        spark, f"{sf_dir}/events.parquet", f"{sf_dir}/customer.parquet"
    )


SQL_STREAM_ENRICH = """
SELECT c.c_nationkey AS nationkey, e.event_type,
       count(*)::BIGINT AS n_events,
       sum(floor(e.value * 100)::BIGINT)::BIGINT AS sum_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator gate #2: the rolling z-score anomaly
    detector (applyInPandasWithState, last-8 ring carried across
    micro-batches) drained with availableNow must equal the BATCH
    window query bit-for-bit — the rule is the same integer
    rearrangement (8c - S)^2 > 4(8Q - S^2), so the oracle is
    SQL_EVENTS_ANOMALY verbatim (streaming/jobs.py::_rolling_anomaly)."""
    from pyjelly_spark.streaming.jobs import run_stream_anomaly_batchmode

    return run_stream_anomaly_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).select("user_id", "event_id", "cents", "s8", "q8")


def q_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator gate #3: the streaming MERGE
    (applyInPandasWithState last-writer-wins per user, state carried
    across micro-batches) drained with availableNow must equal batch
    change-log compaction over the same derived log — same (ts,
    event_id) total order, same delete semantics
    (streaming/jobs.py::cdc_view)."""
    from pyjelly_spark.streaming.jobs import run_stream_cdc_batchmode

    return run_stream_cdc_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).orderBy("user_id")


SQL_STREAM_CDC = """
WITH changes AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ts, event_id, event_type AS state,
         floor(value * 100)::BIGINT AS val_cents
  FROM events WHERE event_id % 5 <> 0
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM changes
)
SELECT user_id, state, val_cents
FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY user_id
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator gate: applyInPandasWithState
    sessionization (30-min gap, state carried across micro-batches)
    drained with availableNow must reproduce the batch sessionization —
    minus each user's final session, which stays OPEN in the state store
    and is never emitted in append mode (part of the operator contract:
    a real stream would close it by timeout). Single-file drain keeps
    the event order deterministic (streaming/jobs.py::_sessionize)."""
    from pyjelly_spark.streaming.jobs import run_sessionized_batchmode

    return run_sessionized_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).select("user_id", "session_id", "n_events")


# Batch recurrence minus each user's last (still-open) session; the
# streaming operator numbers closed sessions from 0 = batch idx - 1.
SQL_STREAM_SESSIONS = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING
    ) AS session_idx
  FROM flagged
),
agg AS (
  SELECT user_id, session_idx, count(*)::BIGINT AS n_events
  FROM sessions GROUP BY user_id, session_idx
),
last AS (SELECT user_id, max(session_idx) AS mx FROM agg GROUP BY user_id)
SELECT a.user_id, (a.session_idx - 1)::BIGINT AS session_id, a.n_events
FROM agg a JOIN last l USING (user_id)
WHERE a.session_idx < l.mx
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join: views and purchases read as two
    independent file streams, inner-joined on user with an event-time
    range (purchase within 60 min after the view), both sides
    watermarked so buffered state stays bounded
    (streaming/jobs.py::view_purchase_pairs). Drained with availableNow;
    must equal the batch range join."""
    from pyjelly_spark.streaming.jobs import run_stream_join_batchmode

    return run_stream_join_batchmode(spark, f"{sf_dir}/events.parquet")


SQL_STREAM_JOIN = """
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
  (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS secs_to_purchase
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 60 MINUTE
"""


SQL_STREAM_DEDUP = """
SELECT event_type, count(DISTINCT event_id) AS n_events
FROM events GROUP BY event_type
"""


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"

#: Deterministic code ontology for the RDFS materialization gate: the
#: instance vocabulary the extractor emits, arranged into two-level
#: property and three-level class hierarchies with domain/range axioms
#: (including one declared on a SUPERproperty, so the oracle checks the
#: spp-composition of domains, not just direct declarations).
CODE_ONTOLOGY: list[tuple[str, str, str]] = [
    (NS + "imports", _RDFS + "subPropertyOf", NS + "references"),
    (NS + "calls", _RDFS + "subPropertyOf", NS + "references"),
    (NS + "references", _RDFS + "subPropertyOf", NS + "relatesTo"),
    (NS + "contains", _RDFS + "subPropertyOf", NS + "relatesTo"),
    (NS + "File", _RDFS + "subClassOf", NS + "CodeUnit"),
    (NS + "Module", _RDFS + "subClassOf", NS + "CodeUnit"),
    (NS + "Symbol", _RDFS + "subClassOf", NS + "CodeEntity"),
    (NS + "CodeUnit", _RDFS + "subClassOf", NS + "CodeEntity"),
    (NS + "CodeEntity", _RDFS + "subClassOf", NS + "Resource"),
    (NS + "Repository", _RDFS + "subClassOf", NS + "Resource"),
    (NS + "contains", _RDFS + "domain", NS + "Repository"),
    (NS + "contains", _RDFS + "range", NS + "File"),
    (NS + "imports", _RDFS + "domain", NS + "File"),
    (NS + "imports", _RDFS + "range", NS + "Module"),
    (NS + "defines", _RDFS + "domain", NS + "File"),
    (NS + "defines", _RDFS + "range", NS + "Symbol"),
    (NS + "calls", _RDFS + "domain", NS + "File"),
    (NS + "calls", _RDFS + "range", NS + "Symbol"),
]


def q_kg_rdfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS materialization over the extracted code KG
    (operators/inference.py::rdfs_materialize): subClass/subProperty
    transitivity, property inheritance (rdfs7), domain/range typing
    (rdfs2/3) and type inheritance (rdfs9) under CODE_ONTOLOGY, all as
    broadcast joins against the (tiny) closed schema plus ONE dedup
    shuffle. The gate pins the full closed graph per predicate: triple
    count, distinct subjects, and a bit_xor of the portable (s, o)
    content hash, split by asserted-vs-inferred — any missing, extra or
    mistyped conclusion flips a row. Oracle is the same stratified rule
    program written declaratively (recursive CTEs over a VALUES
    ontology), so the distributed plan is checked against an
    independent evaluation strategy."""
    from pyjelly_spark.operators.inference import rdfs_materialize

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    schema = spark.createDataFrame(CODE_ONTOLOGY, ["s", "p", "o"])
    closed = rdfs_materialize(graph, schema)
    h = F.conv(
        F.substring(F.sha2(F.concat_ws(" ", "s", "o"), 256), 1, 15), 16, 10
    ).cast("long")
    return (
        closed.groupBy("p", "asserted")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("s").alias("n_s"),
            F.bit_xor(h).alias("xh"),
        )
        .orderBy("p", "asserted")
    )


SQL_KG_RDFS = f"""
WITH RECURSIVE {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
spo AS (
  SELECT 'http://kg.example/repo/' || repo AS s, '{NS}contains' AS p, file_iri AS o FROM files
  UNION ALL SELECT file_iri, '{NS}lang', 'python' FROM files
  UNION ALL SELECT file_iri, '{NS}sha256', sha256(content) FROM files
  UNION ALL SELECT file_iri, '{NS}imports',
    'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t FROM imports_gt
  UNION ALL SELECT file_iri, '{NS}defines',
    'http://kg.example/symbol/' || symbol FROM defs_gt
  UNION ALL SELECT file_iri, '{NS}calls',
    'http://kg.example/symbol/' || symbol FROM calls_gt
),
ont(s, p, o) AS (VALUES {", ".join(
    f"('{s}', '{p}', '{o}')" for s, p, o in CODE_ONTOLOGY
)}),
sco(sub, sup) AS (
  SELECT s, o FROM ont WHERE p = '{_RDFS}subClassOf'
  UNION
  SELECT c.sub, o2.o FROM sco c
  JOIN ont o2 ON o2.s = c.sup AND o2.p = '{_RDFS}subClassOf'
),
spp(sub, sup) AS (
  SELECT s, o FROM ont WHERE p = '{_RDFS}subPropertyOf'
  UNION
  SELECT c.sub, o2.o FROM spp c
  JOIN ont o2 ON o2.s = c.sup AND o2.p = '{_RDFS}subPropertyOf'
),
dom_eff AS (
  SELECT s AS prop, o AS cls FROM ont WHERE p = '{_RDFS}domain'
  UNION
  SELECT h.sub, d.o FROM spp h
  JOIN ont d ON d.s = h.sup AND d.p = '{_RDFS}domain'
),
rng_eff AS (
  SELECT s AS prop, o AS cls FROM ont WHERE p = '{_RDFS}range'
  UNION
  SELECT h.sub, r.o FROM spp h
  JOIN ont r ON r.s = h.sup AND r.p = '{_RDFS}range'
),
edges AS (SELECT s, p, o FROM spo WHERE p <> '{_RDF_TYPE}'),
inherited AS (
  SELECT e.s, h.sup AS p, e.o FROM edges e JOIN spp h ON e.p = h.sub
),
all_edges AS (SELECT * FROM edges UNION ALL SELECT * FROM inherited),
dom_types AS (
  SELECT e.s, '{_RDF_TYPE}' AS p, d.cls AS o
  FROM all_edges e JOIN dom_eff d ON e.p = d.prop
),
rng_types AS (
  SELECT e.o AS s, '{_RDF_TYPE}' AS p, r.cls AS o
  FROM all_edges e JOIN rng_eff r ON e.p = r.prop
),
types0 AS (
  SELECT s, p, o FROM spo WHERE p = '{_RDF_TYPE}'
  UNION ALL SELECT * FROM dom_types
  UNION ALL SELECT * FROM rng_types
),
sup_types AS (
  SELECT t.s, t.p, c.sup AS o FROM types0 t JOIN sco c ON t.o = c.sub
),
tagged AS (
  SELECT s, p, o, TRUE AS asserted FROM spo
  UNION ALL SELECT s, p, o, FALSE FROM inherited
  UNION ALL SELECT s, p, o, FALSE FROM dom_types
  UNION ALL SELECT s, p, o, FALSE FROM rng_types
  UNION ALL SELECT s, p, o, FALSE FROM sup_types
),
closure AS (
  SELECT s, p, o, max(asserted) AS asserted FROM tagged GROUP BY s, p, o
)
SELECT p, asserted, count(*)::BIGINT AS n, count(DISTINCT s)::BIGINT AS n_s,
  bit_xor(('0x' || substring(sha256(s || ' ' || o), 1, 15))::BIGINT) AS xh
FROM closure GROUP BY p, asserted ORDER BY p, asserted
"""


def q_kg_shacl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHACL-lite validation (operators/shacl.py::validate) of the
    RDFS-CLOSED code graph: cardinality shapes target inferred classes
    (kg:Module instances exist only via rdfs:range inference, so the
    gate checks shape/rule interaction), value shapes check pattern /
    node-kind / enumeration on the hot predicates. The shape mix is
    chosen so every constraint kind both fires (min_count, max_count,
    pattern, node_kind) and passes (ShaHex, LangIn contribute zero
    rows — absence is pinned by the exact row set). Oracle evaluates
    each shape independently from the ground-truth CTEs, no SHACL
    machinery on the DuckDB side."""
    from pyjelly_spark.operators.inference import rdfs_materialize
    from pyjelly_spark.operators.shacl import Shape, validate

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    schema = spark.createDataFrame(CODE_ONTOLOGY, ["s", "p", "o"])
    # Validation scans its input more than once (value pass + count
    # pass); checkpoint the closure so it materializes a single time —
    # the same "stage the published closure, then validate it" shape a
    # production pipeline would use.
    closed = (
        rdfs_materialize(graph, schema)
        .select("s", "p", "o")
        .localCheckpoint(eager=False)
    )
    shapes = [
        Shape("FileMinDefines", NS + "defines",
              target_class=NS + "File", min_count=2),
        Shape("FileMaxImports", NS + "imports",
              target_class=NS + "File", max_count=2),
        Shape("ModuleNoDefines", NS + "defines",
              target_class=NS + "Module", min_count=1),
        Shape("FileMaxCalls", NS + "calls",
              target_class=NS + "File", max_count=4),
        Shape("ShaHex", NS + "sha256", pattern="^[0-9a-f]{64}$"),
        Shape("EvenModuleImports", NS + "imports",
              pattern="mod_[0-9]*[02468]$"),
        Shape("ShaIsIri", NS + "sha256", node_kind="IRI"),
        Shape("LangIn", NS + "lang", in_values=("python", "go")),
    ]
    return validate(closed, shapes).orderBy(
        "shape_id", "constraint", "focus", "value"
    )


SQL_KG_SHACL = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
def_counts AS (
  SELECT file_iri, count(DISTINCT symbol) AS c FROM defs_gt GROUP BY file_iri
),
imp_counts AS (
  SELECT file_iri, count(DISTINCT t) AS c FROM imports_gt GROUP BY file_iri
),
call_counts AS (
  SELECT file_iri, count(DISTINCT symbol) AS c FROM calls_gt GROUP BY file_iri
),
modules AS (
  SELECT DISTINCT 'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t
    AS module_iri FROM imports_gt
),
violations AS (
  SELECT 'FileMinDefines' AS shape_id, 'min_count' AS "constraint",
         file_iri AS focus, c::VARCHAR AS value
  FROM def_counts WHERE c < 2
  UNION ALL
  SELECT 'FileMaxImports', 'max_count', file_iri, c::VARCHAR
  FROM imp_counts WHERE c > 2
  UNION ALL
  SELECT 'ModuleNoDefines', 'min_count', module_iri, '0' FROM modules
  UNION ALL
  SELECT 'FileMaxCalls', 'max_count', file_iri, c::VARCHAR
  FROM call_counts WHERE c > 4
  UNION ALL
  SELECT DISTINCT 'EvenModuleImports', 'pattern', file_iri,
    'http://kg.example/module/pkg' || (t % 13) || '.mod_' || t
  FROM imports_gt WHERE t % 2 = 1
  UNION ALL
  SELECT 'ShaIsIri', 'node_kind', file_iri, sha256(content) FROM files
)
SELECT * FROM violations ORDER BY shape_id, "constraint", focus, value
"""


_PROV_ACTIVITY = "http://kg.example/activity/extract-v1"


def q_kg_prov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROV-O lineage export (operators/provenance.py::prov_graph): one
    stream entity per repo with wasDerivedFrom/wasGeneratedBy/used edges
    and exact per-repo file + triple counts as literals — the pipeline's
    per-partition lineage materialized as queryable triples. Oracle
    recomputes the per-repo statistics from the ground-truth CTEs and
    builds the same five PROV rows per repo declaratively."""
    from pyjelly_spark.operators.provenance import prov_graph

    graph = _spo(X.extract_all(derived_source_files(spark, sf_dir)))
    return prov_graph(
        graph,
        contains_pred=NS + "contains",
        ns=NS,
        stream_prefix="http://kg.example/stream/",
        activity_iri=_PROV_ACTIVITY,
    ).orderBy("s", "p", "o")


SQL_KG_PROV = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
imp_n AS (SELECT file_iri, count(*) AS c FROM imports_gt GROUP BY file_iri),
def_n AS (SELECT file_iri, count(*) AS c FROM defs_gt GROUP BY file_iri),
call_n AS (SELECT file_iri, count(*) AS c FROM calls_gt GROUP BY file_iri),
per_file AS (
  SELECT f.repo, 2 + i.c + d.c + cl.c AS n
  FROM files f
  JOIN imp_n i ON i.file_iri = f.file_iri
  JOIN def_n d ON d.file_iri = f.file_iri
  JOIN call_n cl ON cl.file_iri = f.file_iri
),
repo_stats AS (
  SELECT repo,
         'http://kg.example/repo/' || repo AS repo_iri,
         'http://kg.example/stream/' || repo AS stream_iri,
         count(*)::BIGINT AS n_files,
         (sum(n) + count(*))::BIGINT AS n_triples
  FROM per_file GROUP BY repo
),
prov AS (
  SELECT stream_iri AS s, 'http://www.w3.org/ns/prov#wasDerivedFrom' AS p,
         repo_iri AS o FROM repo_stats
  UNION ALL
  SELECT stream_iri, 'http://www.w3.org/ns/prov#wasGeneratedBy',
         '{_PROV_ACTIVITY}' FROM repo_stats
  UNION ALL
  SELECT '{_PROV_ACTIVITY}', 'http://www.w3.org/ns/prov#used', repo_iri
  FROM repo_stats
  UNION ALL
  SELECT stream_iri, '{NS}nFiles', n_files::VARCHAR FROM repo_stats
  UNION ALL
  SELECT stream_iri, '{NS}nTriples', n_triples::VARCHAR FROM repo_stats
)
SELECT s, p, o FROM prov ORDER BY s, p, o
"""


def q_kg_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:sameAs smushing (operators/inference.py::sameas_smush):
    every file defining two symbols asserts them owl:sameAs (its own
    f_* symbol aliases the shared_* symbol), the alias classes close
    over distributed connected components, and the defines+calls graph
    is rewritten onto the lexicographically-smallest representative.
    The gate pins the full smushed graph per predicate (count, distinct
    subjects/objects, bit_xor content hash). Oracle rebuilds the alias
    classes in closed form (star clusters around each shared symbol, so
    no recursion is needed) and rewrites declaratively."""
    from pyjelly_spark.operators.inference import OWL_SAMEAS, sameas_smush

    files = derived_source_files(spark, sf_dir)
    defs = _spo(X.extract_defs(files))
    calls = _spo(X.extract_calls(files))
    sameas = (
        defs.groupBy("s")
        .agg(F.collect_list("o").alias("syms"))
        .filter(F.size("syms") == 2)
        .select(
            F.array_min("syms").alias("s"),
            F.lit(OWL_SAMEAS).alias("p"),
            F.array_max("syms").alias("o"),
        )
    )
    smushed = sameas_smush(defs.unionByName(calls).unionByName(sameas))
    h = F.conv(
        F.substring(F.sha2(F.concat_ws(" ", "s", "o"), 256), 1, 15), 16, 10
    ).cast("long")
    return (
        smushed.groupBy("p")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("s").alias("n_s"),
            F.countDistinct("o").alias("n_o"),
            F.bit_xor(h).alias("xh"),
        )
        .orderBy("p")
    )


SQL_KG_SAMEAS = f"""
WITH {SRC_SQL.strip()}, {MENTIONS_SQL.strip()},
members AS (
  SELECT doc_id % 50 AS k,
         'http://kg.example/symbol/f_' || doc_id || '_0' AS member
  FROM files WHERE doc_id % 2 = 0
),
reps AS (
  SELECT k,
         least(min(member), 'http://kg.example/symbol/shared_' || k) AS rep
  FROM members GROUP BY k
),
mapping AS (
  SELECT m.member AS node, r.rep FROM members m JOIN reps r USING (k)
  UNION ALL
  SELECT 'http://kg.example/symbol/shared_' || k, rep FROM reps
),
spo AS (
  SELECT file_iri AS s, '{NS}defines' AS p,
         'http://kg.example/symbol/' || symbol AS o FROM defs_gt
  UNION ALL
  SELECT file_iri, '{NS}calls', 'http://kg.example/symbol/' || symbol
  FROM calls_gt
),
smushed AS (
  SELECT DISTINCT t.s, t.p, coalesce(m.rep, t.o) AS o
  FROM spo t LEFT JOIN mapping m ON t.o = m.node
)
SELECT p, count(*)::BIGINT AS n,
       count(DISTINCT s)::BIGINT AS n_s,
       count(DISTINCT o)::BIGINT AS n_o,
       bit_xor(('0x' || substring(sha256(s || ' ' || o), 1, 15))::BIGINT) AS xh
FROM smushed GROUP BY p ORDER BY p
"""


_OWL_NS = "http://www.w3.org/2002/07/owl#"
_FI_SQL = (
    "'http://kg.example/file/repo-0' || ({i} % 7) || '/src/pkg' || "
    "({i} % 13) || '/mod_' || {i} || '.py'"
)


def _owl_file_iri(i):
    return F.concat(
        F.lit("http://kg.example/file/repo-0"), (i % 7).cast("string"),
        F.lit("/src/pkg"), (i % 13).cast("string"),
        F.lit("/mod_"), i.cast("string"), F.lit(".py"),
    )


def q_kg_owl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OWL-Horst materialization (operators/inference.py::
    owl_horst_materialize): a transitive kg:follows chain (doc i ->
    i+7, which stays inside one repo since repo = id % 7), its inverse
    kg:precedes, super-property kg:related, a symmetric kg:pairedWith,
    and domain typing lifted through the class hierarchy. The
    distributed path-doubling closure + compiled template passes must
    reproduce the closed-form oracle: chain reachability is exactly the
    same-residue ordered pairs, so the oracle needs NO recursion — an
    independent evaluation of a genuinely iterative distributed
    computation. Gate pins the closure per (predicate, asserted)."""
    from pyjelly_spark.operators.inference import (
        OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE,
        owl_horst_materialize,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    i = F.col("doc_id")
    follows = docs.filter(i + 7 < n).select(
        _owl_file_iri(i).alias("s"),
        F.lit(NS + "follows").alias("p"),
        _owl_file_iri(i + 7).alias("o"),
    )
    paired = docs.filter(i % 2 == 0).select(
        _owl_file_iri(i).alias("s"),
        F.lit(NS + "pairedWith").alias("p"),
        _owl_file_iri((i + 50) % n).alias("o"),
    )
    _RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
    schema = spark.createDataFrame(
        [
            (NS + "follows", RDF_TYPE, OWL_TRANSITIVE),
            (NS + "follows", _RDFS_NS + "subPropertyOf", NS + "related"),
            (NS + "precedes", OWL_INVERSE, NS + "follows"),
            (NS + "pairedWith", RDF_TYPE, OWL_SYMMETRIC),
            (NS + "follows", _RDFS_NS + "domain", NS + "File"),
            (NS + "File", _RDFS_NS + "subClassOf", NS + "CodeUnit"),
        ],
        ["s", "p", "o"],
    )
    closed = owl_horst_materialize(follows.unionByName(paired), schema)
    h = F.conv(
        F.substring(F.sha2(F.concat_ws(" ", "s", "o"), 256), 1, 15), 16, 10
    ).cast("long")
    return (
        closed.groupBy("p", "asserted")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("s").alias("n_s"),
            F.countDistinct("o").alias("n_o"),
            F.bit_xor(h).alias("xh"),
        )
        .orderBy("p", "asserted")
    )


SQL_KG_OWL = f"""
WITH docs AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
fp AS (  -- transitive closure of the +7 chain, closed form
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM docs a JOIN docs b
    ON b.doc_id > a.doc_id AND (b.doc_id - a.doc_id) % 7 = 0
),
pw AS (
  SELECT doc_id AS i, (doc_id + 50) % n AS j FROM docs, nn WHERE doc_id % 2 = 0
),
tagged AS (
  SELECT {_FI_SQL.format(i="i")} AS s, '{NS}follows' AS p,
         {_FI_SQL.format(i="j")} AS o, (j - i = 7) AS asserted FROM fp
  UNION ALL
  SELECT {_FI_SQL.format(i="j")}, '{NS}precedes',
         {_FI_SQL.format(i="i")}, FALSE FROM fp
  UNION ALL
  SELECT {_FI_SQL.format(i="i")}, '{NS}related',
         {_FI_SQL.format(i="j")}, FALSE FROM fp
  UNION ALL
  SELECT {_FI_SQL.format(i="i")}, '{NS}pairedWith',
         {_FI_SQL.format(i="j")}, TRUE FROM pw
  UNION ALL
  SELECT {_FI_SQL.format(i="j")}, '{NS}pairedWith',
         {_FI_SQL.format(i="i")}, FALSE FROM pw
  UNION ALL  -- domain typing of every follows subject, + subclass lift
  SELECT {_FI_SQL.format(i="i")},
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', c, FALSE
  FROM (SELECT DISTINCT i FROM fp),
       (VALUES ('{NS}File'), ('{NS}CodeUnit')) t(c)
),
closure AS (
  SELECT s, p, o, max(asserted) AS asserted FROM tagged GROUP BY s, p, o
)
SELECT p, asserted, count(*)::BIGINT AS n,
       count(DISTINCT s)::BIGINT AS n_s,
       count(DISTINCT o)::BIGINT AS n_o,
       bit_xor(('0x' || substring(sha256(s || ' ' || o), 1, 15))::BIGINT) AS xh
FROM closure GROUP BY p, asserted ORDER BY p, asserted
"""


def q_events_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE semantics over a derived change log
    (operators/cdc.py): events become per-user upserts ('error' rows
    are deletes) applied onto a base snapshot (users with event_id %
    5 == 0). merge_snapshot injects the base as the oldest log segment
    and compacts in ONE key-window exchange — no join. Last writer per
    user wins under the (ts, event_id) total order; deleted users
    vanish. Oracle replays the same MERGE declaratively with a
    row_number window."""
    from pyjelly_spark.operators.cdc import merge_snapshot

    ev = _t(spark, sf_dir, "events")
    changes = ev.where(F.col("event_id") % 5 != 0).select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.floor(F.col("value") * 100).cast("long").alias("val_cents"),
    )
    base = (
        ev.where(F.col("event_id") % 5 == 0)
        .select("user_id")
        .distinct()
        .withColumn("state", F.lit("base"))
        .withColumn("val_cents", F.lit(0).cast("long"))
    )
    merged = merge_snapshot(
        base, changes, keys=["user_id"], order_cols=["ts", "event_id"]
    )
    return merged.select("user_id", "state", "val_cents").orderBy("user_id")


SQL_EVENTS_CDC = """
WITH changes AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ts, event_id, event_type AS state,
         floor(value * 100)::BIGINT AS val_cents
  FROM events WHERE event_id % 5 <> 0
),
base AS (
  SELECT DISTINCT user_id, 'U' AS op, NULL::TIMESTAMP AS ts,
         NULL::BIGINT AS event_id, 'base' AS state, 0::BIGINT AS val_cents
  FROM events WHERE event_id % 5 = 0
),
log AS (SELECT * FROM changes UNION ALL SELECT * FROM base),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
  FROM log
)
SELECT user_id, state, val_cents
FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY user_id
"""


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history over the same derived change log as
    events_cdc (operators/cdc.py::scd2_history): every upsert opens an
    interval until the key's next change (deletes close intervals
    without opening one); is_current marks open intervals. Bounds are
    exported as epoch microseconds so the comparison is integer-exact.
    One key-window exchange; the oracle replays it with a lead()
    window."""
    from pyjelly_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events")
    changes = ev.where(F.col("event_id") % 5 != 0).select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.floor(F.col("value") * 100).cast("long").alias("val_cents"),
    )
    hist = scd2_history(changes, keys=["user_id"], order_cols=["ts", "event_id"])
    # microseconds since the corpus epoch, computed NTZ-to-NTZ so the
    # result is identical under any driver session timezone
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    return hist.select(
        "user_id",
        "state",
        "val_cents",
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, valid_from)").alias("from_us"),
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, valid_to)").alias("to_us"),
        "is_current",
    ).orderBy("user_id", "from_us")


SQL_EVENTS_SCD2 = """
WITH changes AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         ts, event_id, event_type AS state,
         floor(value * 100)::BIGINT AS val_cents
  FROM events WHERE event_id % 5 <> 0
),
hist AS (
  SELECT *, lead(ts) OVER (
    PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
)
SELECT user_id, state, val_cents,
       (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT
         AS from_us,
       (epoch_us(valid_to) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT
         AS to_us,
       (valid_to IS NULL) AS is_current
FROM hist WHERE op <> 'D' ORDER BY user_id, from_us
"""


def q_kg_fuzzy_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant entity matching over the defined-symbol vocabulary
    (operators/linking.py::fuzzy_pairs): all unordered symbol pairs at
    Levenshtein distance <= 1, found via symmetric-delete (SymSpell)
    blocking — one equi-join on deletion variants plus the exact
    distance filter, never a quadratic stage. The oracle affords the
    cross join at gate scale."""
    from pyjelly_spark.operators.linking import fuzzy_pairs

    defs = _spo(X.extract_defs(derived_source_files(spark, sf_dir)))
    vocab = defs.select(
        F.regexp_extract("o", r"symbol/(.*)$", 1).alias("term")
    )
    return fuzzy_pairs(vocab).orderBy("term_a", "term_b")


SQL_KG_FUZZY_LINK = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
vocab AS (SELECT DISTINCT symbol FROM defs_gt)
SELECT a.symbol AS term_a, b.symbol AS term_b
FROM vocab a JOIN vocab b
  ON a.symbol < b.symbol AND levenshtein(a.symbol, b.symbol) <= 1
ORDER BY term_a, term_b
"""


def q_events_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained sequence matching (operators/cep.py::
    match_sequence): users whose view -> click -> purchase chain
    completes with each step within 48 hours of the previous, under
    greedy earliest extension — the MATCH_RECOGNIZE / Flink-CEP
    analogue beside the unbounded-time funnel. Timestamps exported as
    NTZ-computed epoch microseconds; the oracle unrolls the same
    greedy recurrence."""
    from pyjelly_spark.operators.cep import match_sequence

    m = match_sequence(
        _t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        within_s=172800,
    )
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    return m.select(
        "user_id",
        *[
            F.expr(f"timestampdiff(MICROSECOND, {epoch0}, t_{i})").alias(f"t{i}_us")
            for i in (1, 2, 3)
        ],
    ).orderBy("user_id")


SQL_EVENTS_CEP = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click'
    AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 172800 SECOND
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 172800 SECOND
  GROUP BY e.user_id
)
SELECT s1.user_id,
  (epoch_us(t1) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT AS t1_us,
  (epoch_us(t2) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT AS t2_us,
  (epoch_us(t3) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT AS t3_us
FROM s1 JOIN s2 ON s1.user_id = s2.user_id
JOIN s3 ON s1.user_id = s3.user_id
ORDER BY s1.user_id
"""


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    weighted by its holding interval (microseconds until the user's
    next event; the open last interval is excluded). Integer-exact —
    numerator/denominator sums and the floor-divided x100 average are
    all int64, so the gate is bit-exact. One user-keyed window."""
    ev = _t(spark, sf_dir, "events")
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    base = ev.select(
        "user_id",
        "event_id",
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, ts)").alias("off_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("off_us", "event_id")
    with_dt = base.withColumn("dt_us", F.lead("off_us").over(w) - F.col("off_us"))
    return (
        with_dt.where(F.col("dt_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dt_us")).cast("long").alias("num"),
            F.sum("dt_us").cast("long").alias("den"),
        )
        .select(
            "user_id",
            "num",
            "den",
            F.floor(F.col("num") / F.col("den")).cast("long").alias("twap_cents"),
        )
        .orderBy("user_id")
    )


SQL_EVENTS_TWAP = """
WITH base AS (
  SELECT user_id, event_id,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT
           AS off_us,
         floor(value * 100)::BIGINT AS cents
  FROM events
),
d AS (
  SELECT *, lead(off_us) OVER (
    PARTITION BY user_id ORDER BY off_us, event_id) - off_us AS dt_us
  FROM base
)
SELECT user_id, sum(cents * dt_us)::BIGINT AS num, sum(dt_us)::BIGINT AS den,
       (sum(cents * dt_us) // sum(dt_us))::BIGINT AS twap_cents
FROM d WHERE dt_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: per (event_type, hour) the open/high/low/
    close of the integer cents series, with open/close selected by
    max_by/min_by over a collision-free composite (time, event_id) key
    (decimal in Spark, HUGEINT in DuckDB — same total order). One
    aggregation, no window over the stream."""
    ev = _t(spark, sf_dir, "events")
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    base = ev.select(
        "event_type",
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, ts)").alias("off_us"),
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn(
        "okey",
        F.expr("cast(off_us as decimal(38,0)) * 1000000 + event_id"),
    )
    return (
        base.withColumn("hr_off", (F.col("off_us") / 3_600_000_000).cast("long"))
        .groupBy("event_type", "hr_off")
        .agg(
            F.expr("min_by(cents, okey)").alias("open"),
            F.max("cents").alias("high"),
            F.min("cents").alias("low"),
            F.expr("max_by(cents, okey)").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type", "hr_off")
    )


SQL_EVENTS_OHLC = """
WITH base AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT
           AS off_us,
         event_id, floor(value * 100)::BIGINT AS cents
  FROM events
),
k AS (
  SELECT *, off_us::HUGEINT * 1000000 + event_id AS okey,
         off_us // 3600000000 AS hr_off
  FROM base
)
SELECT event_type, hr_off,
       arg_min(cents, okey)::BIGINT AS open,
       max(cents)::BIGINT AS high,
       min(cents)::BIGINT AS low,
       arg_max(cents, okey)::BIGINT AS close,
       count(*)::BIGINT AS n
FROM k GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact EWMA (alpha=1/4) of value cents per user — a
    per-step-floored recurrence no window frame can express, run as a
    per-key sequential scan inside Arrow-batched applyInPandas
    (operators/timeseries.py). One hash exchange on user_id; the oracle
    unrolls the identical integer recurrence as a recursive CTE, so the
    gate is bit-exact."""
    from pyjelly_spark.operators.timeseries import ewma_int

    return ewma_int(_t(spark, sf_dir, "events"))


SQL_EVENTS_EWMA = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         floor(value * 100)::BIGINT AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), ew AS (
  SELECT user_id, event_id, rn, cents, cents AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, s.cents,
         ((s.cents + 3 * e.ewma) // 4)::BIGINT AS ewma
  FROM seq s JOIN ew e ON s.user_id = e.user_id AND s.rn = e.rn + 1
)
SELECT user_id, event_id, cents, ewma FROM ew
"""


def q_events_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user sketch per event_type —
    k=12 smallest portable 60-bit hashes; integer estimate
    (k-1)*2^60 // kth_hash (operators/sketches.py). Because the hash is
    sha256-derived (not engine-specific HLL), the DuckDB oracle
    reproduces the *sketch itself* bit-exactly, not just its error
    band. The operator's HLL-threshold prune bounds the per-group sort
    to ~8k rows regardless of group cardinality. k=12 so even sf0.001
    (15 distinct users/type) yields a sketch per group."""
    from pyjelly_spark.operators.sketches import kmv_distinct

    return kmv_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id", k=12
    ).orderBy("event_type")


SQL_EVENTS_KMV = """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), e AS (
  SELECT event_type, count(*)::BIGINT AS exact_n
  FROM (SELECT DISTINCT event_type, user_id FROM events) GROUP BY 1
)
SELECT r.event_type, r.h AS kth_hash,
       (12682136550675316736::HUGEINT // r.h)::BIGINT AS est_distinct,
       e.exact_n
FROM r JOIN e USING (event_type) WHERE rn = 12
ORDER BY r.event_type
"""


def _morton16(xcol: str, ycol: str) -> str:
    """SQL expression interleaving two 8-bit coordinates into a 16-bit
    Morton (Z-order) code — identical operator set (& >> << |) in Spark
    and DuckDB, so the layout key is engine-portable."""
    terms = []
    for i in range(8):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN session_window streaming
    operator (engine-managed merging window state) — the native
    complement to the custom stateful sessionizer gate
    (stream_sessions); both must reproduce the identical batch gap-rule
    sessions (streaming/jobs.py::session_window_counts)."""
    from pyjelly_spark.streaming.jobs import run_session_window_batchmode

    return run_session_window_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).orderBy("user_id", "session_start")


SQL_STREAM_SESSION_WINDOW = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, sidx
ORDER BY user_id, session_start
"""


def q_events_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint for cross-system data
    validation (the anti-entropy check a replicated lakehouse runs
    after a migration/backfill): per-shard sum of portable row hashes
    mod 2^61, plus row count — commutative, so ANY partitioning /
    scan order / engine produces the same checksums, and two tables
    can be compared shard-by-shard to localize divergence without
    moving data. One map-side-combinable aggregation; 64 shards by
    row-hash, so a single corrupted row flips exactly one shard."""
    ev = _t(spark, sf_dir, "events")
    row_repr = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.floor(F.col("value") * 100).cast("long").cast("string"),
    )
    h = T.hex_hash(row_repr)
    base = ev.select(
        h.alias("h"), F.pmod(h, F.lit(64)).alias("shard")
    )
    return (
        base.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # sum in decimal(38,0): 2^61-sized terms overflow int64 at
            # ~4 rows; the HUGEINT cast on the oracle side mirrors this
            F.expr(
                "cast(sum(cast(h % 2305843009213693952 as decimal(38,0)))"
                " % 2305843009213693952 as bigint)"
            ).alias("checksum"),
        )
        .orderBy("shard")
    )


SQL_EVENTS_CHECKSUM = """
WITH base AS (
  SELECT ('0x' || substring(sha256(
           event_id::VARCHAR || '|' || user_id::VARCHAR || '|' ||
           event_type || '|' || (floor(value * 100)::BIGINT)::VARCHAR
         ), 1, 15))::BIGINT AS h
  FROM events
)
SELECT h % 64 AS shard, count(*)::BIGINT AS n_rows,
       (sum((h % 2305843009213693952)::HUGEINT)
          % 2305843009213693952)::BIGINT AS checksum
FROM base GROUP BY 1 ORDER BY 1
"""


def q_events_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over (user bucket, hour bucket):
    the multi-dimensional clustering key used for data-skipping file
    layout — sorting by zcode makes BOTH a user-range and a time-range
    predicate prune to O(sqrt) of the files, where sorting by either
    column alone prunes only its own dimension. Pure bit arithmetic
    (the interleave expression is generated once and stays inside
    whole-stage codegen); gated bit-exactly."""
    ev = _t(spark, sf_dir, "events")
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    base = ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).alias("x"),
        F.pmod(
            F.expr(f"timestampdiff(HOUR, {epoch0}, ts)"), F.lit(256)
        ).alias("y"),
    )
    return base.select(
        "event_id", "x", "y", F.expr(_morton16("x", "y")).cast("long").alias("zcode")
    )


SQL_EVENTS_ZORDER = f"""
WITH base AS (
  SELECT event_id,
         user_id % 256 AS x,
         ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
            // 3600000000) % 256 AS y
  FROM events
)
SELECT event_id, x, y, ({_morton16("x", "y")})::BIGINT AS zcode FROM base
"""


def q_events_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch ALGEBRA (operators/sketches.py::kmv_set_estimates):
    estimate |viewers ∪ purchasers| and |viewers ∩ purchasers| from the
    two k=12 sketches alone — merged-sketch union (mergeability) +
    theta-style intersection (fraction of below-threshold hashes in
    both sets). Every intermediate is integer on the portable hash, so
    the oracle reproduces the estimates bit-exactly; exact counts are
    carried alongside for error inspection."""
    from pyjelly_spark.operators.sketches import kmv_set_estimates

    ev = _t(spark, sf_dir, "events")
    return kmv_set_estimates(
        ev.where(F.col("event_type") == "view").select("user_id"),
        ev.where(F.col("event_type") == "purchase").select("user_id"),
        "user_id",
        k=12,
    )


SQL_EVENTS_KMV_SETOPS = """
WITH f AS (
  SELECT ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT AS h,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
),
ka AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM f WHERE in_a = 1
  ) WHERE rn <= 12
),
kb AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM f WHERE in_b = 1
  ) WHERE rn <= 12
),
m AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ) WHERE rn <= 12
),
s AS (
  SELECT max(m.h) AS union_kth, sum(f.in_a * f.in_b)::BIGINT AS matches
  FROM m JOIN f USING (h)
),
e AS (
  SELECT count(*)::BIGINT AS exact_union,
         sum(in_a * in_b)::BIGINT AS exact_inter
  FROM f
)
SELECT union_kth,
       (12682136550675316736::HUGEINT // union_kth)::BIGINT AS est_union,
       matches,
       ((matches * (12682136550675316736::HUGEINT // union_kth)) // 12)::BIGINT
         AS est_inter,
       exact_union, exact_inter
FROM s, e
"""


def q_kg_link_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link-prediction scores over the resolved
    import graph (operators/components.py::ra_scores): integer-exact
    sum of scale div indeg(z) over shared neighbors — the
    hub-down-weighting similarity that Adamic-Adar approximates with
    floats; one wedge join, never all-pairs."""
    from pyjelly_spark.operators.components import ra_scores

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return ra_scores(edges, min_shared=2).orderBy("a", "b")


SQL_KG_LINK_RA = """
WITH {src}, {mentions},
he AS (
  SELECT DISTINCT file_iri AS src,
    'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
      || '/mod_' || t || '.py' AS dst
  FROM imports_gt
  WHERE file_iri <> 'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg'
      || (t % 13) || '/mod_' || t || '.py'
),
indeg AS (SELECT dst, count(*)::BIGINT AS indeg FROM he GROUP BY 1)
SELECT x.src AS a, y.src AS b, count(*)::BIGINT AS shared,
       sum(1000000 // i.indeg)::BIGINT AS ra_score
FROM he x
JOIN he y ON x.dst = y.dst AND x.src < y.src
JOIN indeg i ON x.dst = i.dst
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY 1, 2
"""


def q_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract validation (dbt/Great-Expectations style): a
    declared expectation suite evaluated in ONE conditional-aggregation
    pass over the table — no per-check scans — then unpivoted to one
    row per check with the violation metric and pass flag. The shape a
    10^12-row ingest gate needs: a single map-combinable aggregate,
    cost independent of how many checks are declared."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.agg(
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user"),
        F.sum(
            ((F.col("value") < 0) | (F.col("value") > 1000)).cast("long")
        ).alias("value_range"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("event_id"))).alias(
            "dup_event_id"
        ),
        F.sum(
            (
                ~F.col("event_type").isin(
                    "view", "click", "purchase", "signup", "error"
                )
            ).cast("long")
        ).alias("bad_type"),
        F.sum(
            (
                (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'"))
                | (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2025-01-01 00:00:00'"))
            ).cast("long")
        ).alias("ts_window"),
    )
    return agg.selectExpr(
        "stack(5, "
        "'not_null_user_id', null_user, "
        "'value_in_0_1000', value_range, "
        "'unique_event_id', dup_event_id, "
        "'accepted_event_types', bad_type, "
        "'ts_in_2024', ts_window) AS (check, violations)"
    ).select(
        "check",
        F.col("violations").cast("long"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check")


SQL_EVENTS_EXPECTATIONS = """
WITH a AS (
  SELECT
    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_user,
    sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END)::BIGINT
      AS value_range,
    (count(*) - count(DISTINCT event_id))::BIGINT AS dup_event_id,
    sum(CASE WHEN event_type NOT IN
        ('view', 'click', 'purchase', 'signup', 'error')
        THEN 1 ELSE 0 END)::BIGINT AS bad_type,
    sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
              OR ts >= TIMESTAMP '2025-01-01 00:00:00'
        THEN 1 ELSE 0 END)::BIGINT AS ts_window
  FROM events
)
SELECT "check", violations, violations = 0 AS passed FROM (
  SELECT 'not_null_user_id' AS "check", null_user AS violations FROM a
  UNION ALL SELECT 'value_in_0_1000', value_range FROM a
  UNION ALL SELECT 'unique_event_id', dup_event_id FROM a
  UNION ALL SELECT 'accepted_event_types', bad_type FROM a
  UNION ALL SELECT 'ts_in_2024', ts_window FROM a
) ORDER BY "check"
"""


def q_events_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier statistics per event_type: lower-median of cents,
    MAD (lower-median of absolute deviations), and the count of
    |x - med| > 3*MAD outliers — the heavy-tail-safe alternative to
    the z-score (events_anomaly). Lower medians (rank (n+1)//2) keep
    everything integer, so the gate is bit-exact where interpolated
    medians would float-diverge. Two window passes, both on the same
    event_type partitioning."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    base = ev.select("event_type", cents.alias("v"))
    w = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    med = (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("v").alias("med"))
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("v") - F.col("med")).alias("d"), "v"
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                (F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_MAD = """
WITH base AS (
  SELECT event_type, floor(value * 100)::BIGINT AS v FROM events
),
med AS (
  SELECT event_type, v AS med FROM (
    SELECT event_type, v,
           row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
  ) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT b.event_type, m.med, abs(b.v - m.med) AS d, b.v
  FROM base b JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, d AS mad FROM (
    SELECT event_type, d,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  ) WHERE rn = (n + 1) // 2
)
SELECT dev.event_type,
       max(dev.med)::BIGINT AS med,
       max(mad.mad)::BIGINT AS mad,
       sum(CASE WHEN abs(dev.v - dev.med) > 3 * mad.mad THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       count(*)::BIGINT AS n
FROM dev JOIN mad USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def q_events_kth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed order statistic WITHOUT a global sort
    (operators/selection.py::kth_smallest): the median-rank cents value
    via iterative histogram bisection — each round one bounded
    aggregation (<= 256 histogram rows shuffled per task at ANY input
    size), 2 rounds for this value range, vs the full sort ORDER
    BY/OFFSET pays. Returns (k, n, kth_value, n_le) with the rank
    bracket count so the oracle checks the selection property too."""
    from pyjelly_spark.operators.selection import kth_smallest

    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    vals = ev.select(cents.alias("v"))
    n = vals.count()
    k = (n + 1) // 2
    kth = kth_smallest(vals, F.col("v"), k)
    n_le = vals.where(F.col("v") <= kth).count()
    return spark.createDataFrame(
        [(k, n, kth, n_le)], "k: long, n: long, kth_value: long, n_le: long"
    )


SQL_EVENTS_KTH = """
WITH v AS (SELECT floor(value * 100)::BIGINT AS v FROM events),
p AS (SELECT count(*)::BIGINT AS n, ((count(*) + 1) // 2)::BIGINT AS k FROM v),
kv AS (
  SELECT v AS kth_value FROM v, p
  ORDER BY v LIMIT 1 OFFSET (SELECT k - 1 FROM p)
)
SELECT p.k, p.n, kv.kth_value,
       (SELECT count(*) FROM v WHERE v.v <= kv.kth_value)::BIGINT AS n_le
FROM p, kv
"""


def q_vocab_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation (phrase) mining for tokenizer/vocab prep: corpus
    bigram LIFT scores — lift = P(ab) / (P(a)P(b)) as the integer
    (n_ab * N * 10^6) div (n_a * n_b) with N the corpus token count —
    the PMI-family association measure without floats/logs, so the
    gate is bit-exact. Bigrams with lift >> 10^6 are phrases ("new
    york"); ~10^6 are chance co-occurrences. One tokenize pass feeds
    both the unigram and bigram aggregations; min count 5 prunes the
    tail before the join."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, word_ngrams, words

    ws = docs.select(
        "doc_id", words(normalized(F.col("text"))).alias("ws")
    )
    uni = (
        ws.select(F.explode("ws").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_total = uni.agg(F.sum("n").alias("nt"))
    bi = (
        ws.select(F.explode(word_ngrams(F.col("ws"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 5)
        .withColumn("wa", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("wb", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("w").alias("wb"), F.col("n").alias("n_b"))
    return (
        bi.join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(n_total))
        .select(
            "bg",
            F.col("n_ab").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.expr("cast((n_ab * nt * 1000000) div (n_a * n_b) as bigint)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("bg"))
        .limit(50)
    )


SQL_VOCAB_COLLOCATIONS = """
WITH ws AS (
  SELECT doc_id, string_split({norm}, ' ') AS ws FROM documents
),
uni AS (
  SELECT w, count(*)::BIGINT AS n FROM (
    SELECT unnest(ws) AS w FROM ws
  ) WHERE w <> '' GROUP BY 1
),
nt AS (SELECT sum(n)::BIGINT AS nt FROM uni),
bi AS (
  SELECT bg, count(*)::BIGINT AS n_ab FROM (
    SELECT unnest(list_transform(
      range(1, len(ws) - 0),
      i -> ws[i] || ' ' || ws[i + 1]
    )) AS bg
    FROM ws WHERE len(ws) >= 2
  ) GROUP BY 1 HAVING count(*) >= 5
)
SELECT bg, n_ab, ua.n AS n_a, ub.n AS n_b,
       ((n_ab * nt.nt * 1000000) // (ua.n * ub.n))::BIGINT AS lift_ppm
FROM bi
JOIN uni ua ON string_split(bg, ' ')[1] = ua.w
JOIN uni ub ON string_split(bg, ' ')[2] = ub.w
CROSS JOIN nt
ORDER BY lift_ppm DESC, bg ASC LIMIT 50
"""


def q_doc_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing ("hashing trick", functions/text.py::
    hash_features): bag-of-words term frequencies folded into 64
    buckets via the portable hash — dictionary-free featurization (no
    vocabulary pass, no driver state), emitted sparse. One tokenize +
    one map-side-combinable aggregation."""
    from pyjelly_spark.functions.text import hash_features

    return hash_features(_t(spark, sf_dir, "documents"), buckets=64)


SQL_DOC_HASH_FEATURES = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({{norm}}, ' ')) AS token
  FROM documents
)
SELECT doc_id,
       ('0x' || substring(sha256(token), 1, 15))::BIGINT % 64 AS bucket,
       count(*)::BIGINT AS tf
FROM toks WHERE token <> ''
GROUP BY 1, 2
""".format(norm="{norm}")


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream (sequence-modeling prep): counts of consecutive
    (from_type, to_type) pairs in (ts, event_id) order, with the
    transition probability floor-scaled to integer millionths
    (10^6 * c div row_total) so the gate is bit-exact. One user-keyed
    window + one tiny aggregation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("total"))
    return (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("cast((1000000 * n) div total as bigint)").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


SQL_EVENTS_MARKOV = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_type, sum(n) AS total FROM c GROUP BY 1)
SELECT c.from_type, c.to_type, c.n,
       ((1000000 * c.n) // t.total)::BIGINT AS p_ppm
FROM c JOIN t USING (from_type)
ORDER BY 1, 2
"""


def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: how many user sessions (30-min
    gap rule, half-open [first, last+1)) are simultaneously open at
    every change point. The running sum over change points is computed
    as a DISTRIBUTED two-level prefix sum — per-hour-bucket local
    cumsum plus a tiny bucket-level carry joined back by broadcast —
    never a single global-order window partition (the classic
    scalability trap for cumulative metrics; the bucket carry frame has
    one row per hour, bounded at any input size). Ties are merged into
    net deltas per timestamp first, so row values are deterministic."""
    ev = _t(spark, sf_dir, "events")
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    base = ev.select(
        "user_id",
        "event_id",
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, ts)").alias("off_us"),
    )
    w = Window.partitionBy("user_id").orderBy("off_us", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        base.withColumn(
            "new_session",
            F.when(
                F.lag("off_us").over(w).isNull()
                | (F.col("off_us") - F.lag("off_us").over(w) > 1_800_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("sidx", F.sum("new_session").over(cum))
        .groupBy("user_id", "sidx")
        .agg(
            F.min("off_us").alias("s_us"),
            (F.max("off_us") + 1).alias("e_us"),
        )
    )
    deltas = sess.select(F.col("s_us").alias("t_us"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("e_us").alias("t_us"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t_us").agg(F.sum("d").cast("long").alias("net"))
    bucketed = net.withColumn("bkt", F.expr("t_us div 3600000000"))
    carry = (
        bucketed.groupBy("bkt")
        .agg(F.sum("net").alias("btot"))
        .withColumn(
            "carry",
            F.coalesce(
                F.sum("btot").over(
                    Window.orderBy("bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bkt", "carry")
    )
    wb = Window.partitionBy("bkt").orderBy("t_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bucketed.join(F.broadcast(carry), "bkt")
        .select(
            "t_us",
            "net",
            (F.col("carry") + F.sum("net").over(wb)).cast("long").alias(
                "concurrent"
            ),
        )
    )


SQL_EVENTS_CONCURRENCY = """
WITH base AS (
  SELECT user_id, event_id,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))::BIGINT
           AS off_us
  FROM events
),
flagged AS (
  SELECT user_id, off_us,
    CASE WHEN lag(off_us) OVER w IS NULL
           OR off_us - lag(off_us) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY off_us, event_id)
),
s AS (
  SELECT user_id,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY off_us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx,
         off_us
  FROM flagged
),
spans AS (
  SELECT user_id, sidx, min(off_us) AS s_us, max(off_us) + 1 AS e_us
  FROM s GROUP BY 1, 2
),
d AS (
  SELECT s_us AS t_us, 1 AS d FROM spans
  UNION ALL SELECT e_us, -1 FROM spans
),
net AS (SELECT t_us, sum(d)::BIGINT AS net FROM d GROUP BY 1)
SELECT t_us, net,
       (sum(net) OVER (ORDER BY t_us ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW))::BIGINT AS concurrent
FROM net
"""


def q_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator gate: streaming KMV distinct-count
    sketch (applyInPandasWithState; k smallest portable hashes carried
    as state across micro-batches). KMV is a *mergeable* synopsis —
    sketch(A ∪ B) = k-min-merge(sketch(A), sketch(B)) — so the drained
    final state provably equals the batch sketch regardless of
    micro-batch boundaries; the oracle is the batch SQL
    (streaming/jobs.py::kmv_sketches)."""
    from pyjelly_spark.streaming.jobs import run_stream_kmv_batchmode

    return run_stream_kmv_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).orderBy("event_type")


SQL_STREAM_KMV = """
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
)
SELECT event_type, h AS kth_hash FROM r WHERE rn = 12 ORDER BY event_type
"""


def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user journey strings: the first 8 events' types in
    (ts, event_id) order joined with '>' — funnel/path mining prep.
    Order inside the aggregate is pinned by sorting an array of
    (time, id, type) structs, NOT by relying on collect_list order
    (which is partitioning-dependent): one hash exchange, deterministic
    at any parallelism. Oracle: string_agg ORDER BY over the same
    rank-limited rows."""
    ev = _t(spark, sf_dir, "events")
    epoch0 = "TIMESTAMP_NTZ '2024-01-01 00:00:00'"
    w = Window.partitionBy("user_id").orderBy("off_us", "event_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(f"timestampdiff(MICROSECOND, {epoch0}, ts)").alias("off_us"),
    ).withColumn("rn", F.row_number().over(w))
    return (
        ranked.where(F.col("rn") <= 8)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("off_us", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


SQL_EVENTS_PATHS = """
WITH r AS (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rn) AS path,
       count(*)::BIGINT AS n
FROM r WHERE rn <= 8 GROUP BY 1
"""


def q_events_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch user-frequency estimates (depth 4 x width 64,
    portable sha-60 bucketing; operators/sketches.py::cms_estimates).
    The sketch matrix is at most 256 cells, so the build collapses
    map-side to O(1) rows per task at any input size; the oracle
    reproduces the matrix — and every min-estimate — bit-exactly."""
    from pyjelly_spark.operators.sketches import cms_estimates

    return cms_estimates(_t(spark, sf_dir, "events"), "user_id").orderBy("key")


SQL_EVENTS_CMS = """
WITH ks AS (SELECT user_id::VARCHAR AS k_ FROM events),
b AS (
  SELECT j, k_,
         ('0x' || substring(sha256(j::VARCHAR || ':' || k_), 1, 15))::BIGINT
           % 64 AS b
  FROM ks CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j)
),
cms AS (SELECT j, b, count(*)::BIGINT AS c FROM b GROUP BY 1, 2),
probe AS (SELECT DISTINCT j, k_, b FROM b),
est AS (
  SELECT p.k_, min(c.c)::BIGINT AS est_n
  FROM probe p JOIN cms c USING (j, b) GROUP BY 1
),
exact AS (SELECT k_, count(*)::BIGINT AS exact_n FROM ks GROUP BY 1)
SELECT est.k_ AS key, est.est_n, exact.exact_n
FROM est JOIN exact USING (k_) ORDER BY est.k_
"""


def q_events_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join (1024 bits, 3 hashes): prune viewer keys
    against the purchaser set via a broadcast occupied-bucket join —
    the runtime-filter pattern — with the exact-membership flag so the
    (deterministic, sha-bucketed) false-positive set is itself gated
    (operators/sketches.py::bloom_semi_join)."""
    from pyjelly_spark.operators.sketches import bloom_semi_join

    ev = _t(spark, sf_dir, "events")
    build = ev.where(F.col("event_type") == "purchase").select("user_id")
    probe = ev.where(F.col("event_type") == "view").select("user_id")
    return bloom_semi_join(build, probe, "user_id").orderBy("key")


SQL_EVENTS_BLOOM = """
WITH build AS (
  SELECT DISTINCT user_id::VARCHAR AS k_ FROM events
  WHERE event_type = 'purchase'
),
probe AS (
  SELECT DISTINCT user_id::VARCHAR AS k_ FROM events WHERE event_type = 'view'
),
occ AS (
  SELECT DISTINCT
    ('0x' || substring(sha256(j::VARCHAR || '|' || k_), 1, 15))::BIGINT
      % 1024 AS b
  FROM build CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j)
),
pb AS (
  SELECT k_, j,
    ('0x' || substring(sha256(j::VARCHAR || '|' || k_), 1, 15))::BIGINT
      % 1024 AS b
  FROM probe CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j)
),
passing AS (
  SELECT pb.k_ FROM pb JOIN occ USING (b) GROUP BY 1 HAVING count(*) = 3
)
SELECT p.k_ AS key, (b.k_ IS NOT NULL) AS is_member
FROM passing p LEFT JOIN build b ON p.k_ = b.k_ ORDER BY p.k_
"""


def q_dedup_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (word Jaccard >= 4/5) via
    PPJoin prefix + length filtering (operators/dedup.py::ppjoin_pairs)
    — the deterministic complement to the probabilistic MinHash path:
    candidates only ever join on each doc's rarest tokens (skew-free by
    construction), verified with integer cross-multiplication. Gated as
    a per-doc rollup (partner count + best partner by exact score) so
    the result stays compact while pinning the full pair set; the
    oracle brute-forces all pairs."""
    from pyjelly_spark.operators.dedup import ppjoin_pairs

    pairs = ppjoin_pairs(_t(spark, sf_dir, "documents"), 4, 5)
    scored = pairs.select(
        "a",
        "b",
        F.expr("(inter * 1000000000) div (sa + sb - inter)").alias("score"),
    )
    sym = scored.unionByName(
        scored.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "score"
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("score"), F.asc("b"))
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .groupBy("a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sim"),
            F.max(F.when(F.col("rk") == 1, F.col("b"))).alias("best_b"),
            F.max(F.when(F.col("rk") == 1, F.col("score"))).cast("long").alias(
                "best_score"
            ),
        )
        .select(F.col("a").alias("doc_id"), "n_sim", "best_b", "best_score")
    )


SQL_DEDUP_PPJOIN = f"""
WITH w AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split({NORM_SQL}, ' '),
                                   t -> t <> '')) AS w
  FROM documents
),
t AS (SELECT doc_id, unnest(w) AS token FROM w),
sz AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i
  FROM t x JOIN t y USING (token)
  WHERE x.doc_id < y.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT a, b, ((i * 1000000000) // (sa.sz + sb.sz - i))::BIGINT AS score
  FROM inter
  JOIN sz sa ON inter.a = sa.doc_id
  JOIN sz sb ON inter.b = sb.doc_id
  WHERE 9 * i >= 4 * (sa.sz + sb.sz)
),
sym AS (
  SELECT a, b, score FROM pairs
  UNION ALL SELECT b AS a, a AS b, score FROM pairs
),
rk AS (
  SELECT a, b, score,
         row_number() OVER (PARTITION BY a ORDER BY score DESC, b ASC) AS rk
  FROM sym
)
SELECT a AS doc_id, count(*)::BIGINT AS n_sim,
       max(CASE WHEN rk = 1 THEN b END) AS best_b,
       max(CASE WHEN rk = 1 THEN score END)::BIGINT AS best_score
FROM rk GROUP BY 1
"""


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond cube/rollup: the exact aggregation lattice
    ((type, hour), (type), ()) with per-column GROUPING() indicators —
    one pass, Spark's expand-based plan. Hours are integer offsets from
    the corpus epoch computed NTZ-to-NTZ (timezone-independent); the
    oracle runs the identical lattice in DuckDB."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_gs_v")
    return spark.sql("""
        SELECT event_type, hr_off,
               grouping(event_type) AS g_type, grouping(hr_off) AS g_hr,
               count(*) AS n, sum(cents) AS sum_cents
        FROM (
          SELECT event_type,
                 timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)
                   AS hr_off,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events_gs_v
        )
        GROUP BY GROUPING SETS ((event_type, hr_off), (event_type), ())
        ORDER BY g_type, g_hr, event_type, hr_off
    """)


SQL_EVENTS_GROUPING_SETS = """
WITH f AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
           // 3600000000 AS hr_off,
         floor(value * 100)::BIGINT AS cents
  FROM events
)
SELECT event_type, hr_off,
       grouping(event_type)::INT AS g_type, grouping(hr_off)::INT AS g_hr,
       count(*)::BIGINT AS n, sum(cents)::BIGINT AS sum_cents
FROM f
GROUP BY GROUPING SETS ((event_type, hr_off), (event_type), ())
ORDER BY g_type, g_hr, event_type, hr_off
"""


def q_vocab_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation counts — the language-model smoothing
    statistic: for each word, the number of DISTINCT left-context types
    N1+(. w) (how many different words precede it), distinct right
    types N1+(w .), and the continuation probability N1+(. w) / |bigram
    types| in integer ppm. "francisco" is frequent but has ~one left
    context; KN down-weights it — exactly what unigram counts miss.
    One tokenize pass -> distinct bigram pairs (the only big shuffle,
    partial-deduped map-side) -> two tiny per-word aggs; never
    materializes per-occurrence rows past the distinct."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, word_ngrams, words

    ws = docs.select(words(normalized(F.col("text"))).alias("ws"))
    pairs = (
        ws.select(F.explode(word_ngrams(F.col("ws"), 2)).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("wa"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("wb"),
        )
        .where((F.col("wa") != "") & (F.col("wb") != ""))
        .distinct()
    )
    total = pairs.agg(F.count(F.lit(1)).alias("t"))
    left = pairs.groupBy(F.col("wb").alias("word")).agg(
        F.count(F.lit(1)).alias("cont_types")
    )
    right = pairs.groupBy(F.col("wa").alias("word")).agg(
        F.count(F.lit(1)).alias("right_types")
    )
    return (
        left.join(right, "word", "full_outer")
        .select(
            "word",
            F.coalesce("cont_types", F.lit(0)).cast("long").alias("cont_types"),
            F.coalesce("right_types", F.lit(0)).cast("long").alias("right_types"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "word",
            "cont_types",
            "right_types",
            F.expr("cast((cont_types * 1000000) div t as bigint)").alias(
                "cont_ppm"
            ),
        )
        .orderBy(F.desc("cont_types"), F.asc("word"))
        .limit(50)
    )


SQL_VOCAB_KN = """
WITH ws AS (
  SELECT string_split({norm}, ' ') AS ws FROM documents
),
pairs AS (
  SELECT DISTINCT
    string_split(bg, ' ')[1] AS wa,
    string_split(bg, ' ')[2] AS wb
  FROM (
    SELECT unnest(list_transform(
      range(1, len(ws) - 0),
      i -> ws[i] || ' ' || ws[i + 1]
    )) AS bg
    FROM ws WHERE len(ws) >= 2
  )
  WHERE string_split(bg, ' ')[1] <> '' AND string_split(bg, ' ')[2] <> ''
),
t AS (SELECT count(*)::BIGINT AS t FROM pairs),
lft AS (SELECT wb AS word, count(*)::BIGINT AS cont_types FROM pairs GROUP BY 1),
rgt AS (SELECT wa AS word, count(*)::BIGINT AS right_types FROM pairs GROUP BY 1)
SELECT coalesce(lft.word, rgt.word) AS word,
       coalesce(cont_types, 0)::BIGINT AS cont_types,
       coalesce(right_types, 0)::BIGINT AS right_types,
       ((coalesce(cont_types, 0) * 1000000) // t.t)::BIGINT AS cont_ppm
FROM lft FULL JOIN rgt ON lft.word = rgt.word
CROSS JOIN t
ORDER BY cont_types DESC, word ASC LIMIT 50
"""


def q_events_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event_type: the ratio of the
    hour's mean value to the type's overall mean, as the integer
    (sum_h * n_total * 10^6) div (n_h * sum_total) — the
    seasonal-decomposition building block (detrend/deseasonalize)
    without floats. One scan -> one (type, hour) agg (120 groups);
    type-level totals come from a window over the TINY agg, not a
    second scan."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    hourly = (
        ev.select(
            "event_type",
            F.hour("ts").cast("int").alias("hr"),
            cents.alias("v"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_cents"),
        )
    )
    w = Window.partitionBy("event_type")
    return (
        hourly.withColumn("n_tot", F.sum("n").over(w))
        .withColumn("sum_tot", F.sum("sum_cents").over(w))
        .select(
            "event_type",
            "hr",
            F.col("n").cast("long"),
            F.col("sum_cents").cast("long"),
            F.expr(
                "cast((sum_cents * n_tot * 1000000)"
                " div (n * greatest(sum_tot, 1)) as bigint)"
            ).alias("idx_ppm"),
        )
        .orderBy("event_type", "hr")
    )


SQL_EVENTS_SEASONAL = """
WITH hourly AS (
  SELECT event_type, hour(ts)::INT AS hr,
         count(*)::BIGINT AS n,
         sum(floor(value * 100)::BIGINT)::BIGINT AS sum_cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, hr, n, sum_cents,
       ((sum_cents * sum(n) OVER (PARTITION BY event_type) * 1000000)
        // (n * greatest(sum(sum_cents) OVER (PARTITION BY event_type), 1))
       )::BIGINT AS idx_ppm
FROM hourly ORDER BY 1, 2
"""


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase's value is
    attributed to the user's view/click touches in the 7 days before
    it — LAST-TOUCH (all cents to the latest touch) and LINEAR (cents
    div k to each of k touches, remainder to the latest so per-purchase
    sums stay exact) — then rolled up per touch type. The join is
    user-keyed EQUI (the natural co-location key; per-user event counts
    are bounded — hot users would take the same salting as
    plan_partitions) with the 7-day window as a residual filter, never
    a nested-loop time join."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        cents.alias("cents"),
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    j = purchases.join(touches, "user_id").where(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.expr("p_ts - INTERVAL 7 DAYS"))
    )
    wp = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy(
        F.desc("t_ts"), F.desc("t_id")
    )
    attributed = (
        j.withColumn("k", F.count(F.lit(1)).over(wp))
        .withColumn("rnk", F.row_number().over(wr))
        .select(
            "touch_type",
            "p_id",
            F.when(F.col("rnk") == 1, F.col("cents"))
            .otherwise(F.lit(0))
            .alias("last_cents"),
            (
                F.expr("cents div k")
                + F.when(F.col("rnk") == 1, F.expr("cents % k")).otherwise(
                    F.lit(0)
                )
            ).alias("linear_cents"),
        )
    )
    return (
        attributed.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.count_distinct("p_id").cast("long").alias("n_purchases"),
            F.sum("last_cents").cast("long").alias("last_touch_cents"),
            F.sum("linear_cents").cast("long").alias("linear_cents"),
        )
        .orderBy("touch_type")
    )


SQL_EVENTS_ATTRIBUTION = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         floor(value * 100)::BIGINT AS cents
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.p_id, p.cents, t.t_id, t.t_ts, t.touch_type,
         count(*) OVER (PARTITION BY p.p_id) AS k,
         row_number() OVER (
           PARTITION BY p.p_id ORDER BY t.t_ts DESC, t.t_id DESC
         ) AS rnk
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
)
SELECT touch_type,
       count(*)::BIGINT AS n_touches,
       count(DISTINCT p_id)::BIGINT AS n_purchases,
       sum(CASE WHEN rnk = 1 THEN cents ELSE 0 END)::BIGINT
         AS last_touch_cents,
       sum(cents // k + CASE WHEN rnk = 1 THEN cents % k ELSE 0 END)::BIGINT
         AS linear_cents
FROM j GROUP BY 1 ORDER BY 1
"""


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE synopsis: the deterministic
    1-in-64 hash sample (portable hex_hash(event_id) % 64 = 0) is a
    synopsis that commutes with ANY partitioning — the union of
    per-partition samples IS the global sample (same invariance the KMV
    sketch family relies on) — so quantiles of a 10^12-row table come
    from sorting ~n/64 rows, no global sort of the data. Lower-rank
    selection (rank = max(1, (q*n) div 100)) keeps the gate bit-exact.
    """
    from pyjelly_spark.functions.text import hex_hash

    ev = _t(spark, sf_dir, "events")
    sample = ev.where(
        hex_hash(F.col("event_id").cast("string"), 64) == 0
    ).select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("v")
    )
    counts = sample.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in (25, 50, 75, 90)])).alias("q")
    )
    targets = counts.crossJoin(qs).select(
        "event_type",
        F.col("q").cast("int").alias("q"),
        F.col("n").cast("long").alias("sample_n"),
        F.greatest(F.lit(1), F.expr("(q * n) div 100")).alias("rnk"),
    )
    ranked = sample.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("v")
        ),
    )
    return (
        ranked.join(F.broadcast(targets), ["event_type", "rnk"])
        .select(
            "event_type",
            "q",
            F.col("v").alias("est_cents"),
            "sample_n",
        )
        .orderBy("event_type", "q")
    )


SQL_EVENTS_QUANTILES = """
WITH sample AS (
  SELECT event_type, floor(value * 100)::BIGINT AS v
  FROM events
  WHERE ('0x' || substring(sha256(event_id::VARCHAR), 1, 15))::BIGINT % 64 = 0
),
counts AS (
  SELECT event_type, count(*)::BIGINT AS n FROM sample GROUP BY 1
),
targets AS (
  SELECT event_type, q::INT AS q, n AS sample_n,
         greatest(1, (q * n) // 100)::BIGINT AS rnk
  FROM counts CROSS JOIN (SELECT unnest([25, 50, 75, 90]) AS q)
),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rnk
  FROM sample
)
SELECT r.event_type, t.q, r.v AS est_cents, t.sample_n
FROM ranked r JOIN targets t USING (event_type, rnk)
ORDER BY 1, 2
"""


def q_kg_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) counting on the file x called-
    symbol graph — the bipartite motif that underlies fraud/recsys
    cohesion metrics, where triangles don't exist by construction. A
    butterfly containing file f is a partner g plus 2 of their c_fg
    common called symbols, so b_f = sum_g C(c_fg, 2). One symbol-keyed
    wedge join builds the common counts (identical join shape and
    exactness contract as kg_triangles — orientation f < g halves the
    pair space, then each pair credits both endpoints); no all-pairs
    join anywhere."""
    files = derived_source_files(spark, sf_dir)
    scalls = (
        files.select(
            X.file_iri(F.col("repo"), F.col("path")).alias("file"),
            F.explode(
                F.regexp_extract_all("content", F.lit(X.CALL_RE), F.lit(1))
            ).alias("symbol"),
        )
        .distinct()
    )
    from pyjelly_spark.operators.components import cap_key_fanout

    scalls = cap_key_fanout(
        scalls, "symbol", node_col="file", on_exceed="error"
    )  # exact-tier hub guard: refuse (not silently drop) hot symbols
    pc = (
        scalls.alias("x")
        .join(
            scalls.alias("y"),
            (F.col("x.symbol") == F.col("y.symbol"))
            & (F.col("x.file") < F.col("y.file")),
        )
        .groupBy(
            F.col("x.file").alias("f"), F.col("y.file").alias("g")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select(
            "f", "g", F.expr("(c * (c - 1)) div 2").alias("bf")
        )
    )
    per_file = pc.select(F.col("f").alias("file"), "bf").unionAll(
        pc.select(F.col("g").alias("file"), "bf")
    )
    return (
        per_file.groupBy("file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("partners"),
            F.sum("bf").cast("long").alias("butterflies"),
        )
        .orderBy(F.desc("butterflies"), F.asc("file"))
        .limit(50)
    )


SQL_KG_BUTTERFLIES = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
scalls AS (
  SELECT DISTINCT file_iri AS file, symbol FROM calls_gt
),
pc AS (
  SELECT x.file AS f, y.file AS g, count(*)::BIGINT AS c
  FROM scalls x JOIN scalls y
    ON x.symbol = y.symbol AND x.file < y.file
  GROUP BY 1, 2 HAVING count(*) >= 2
),
per_file AS (
  SELECT f AS file, (c * (c - 1)) // 2 AS bf FROM pc
  UNION ALL
  SELECT g AS file, (c * (c - 1)) // 2 AS bf FROM pc
)
SELECT file, count(*)::BIGINT AS partners, sum(bf)::BIGINT AS butterflies
FROM per_file GROUP BY 1
ORDER BY butterflies DESC, file ASC LIMIT 50
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted to this corpus: the
    generator has no commit/receipt dates, so the "late lineitem"
    predicate becomes l_shipdate > o_orderdate + 60 days. The point of
    Q4 — a decorrelated EXISTS becoming one LEFT SEMI join with the
    date filter pushed to the orders scan — is preserved verbatim."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations
    by ship year. Both nation dims broadcast (25 rows); the disjunctive
    nation-pair predicate is applied AFTER the cheap broadcast joins so
    the big lineitem->orders->customer path stays one hash-partitioned
    equi-join chain. Decimal-exact revenue like q1/q3/q5."""
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    disc = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returns per
    customer for one quarter, top 20. The quarter filter reaches the
    orders scan; the returnflag filter reaches the lineitem scan; the
    nation dim broadcasts. Deterministic top-20 via (revenue DESC,
    c_custkey) — revenue is a decimal-exact sum cast to double, so the
    order ties out bit-for-bit across engines."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    disc = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DOUBLE
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), adapted: this generator's p_type
    is a flat category so the predicate is p_type = 'PROMO'. The promo
    share is returned as an INTEGER ppm of exact ten-thousandths —
    l_extendedprice*(1-l_discount) at decimal scale 4 is integral in
    units of 10^-4, so (promo * 10^6) div total is a pure integer
    computation at any scale (decimal(38,0) / HUGEINT intermediates:
    no int64 overflow at 10^12 rows). One month of lineitem joins the
    part dim on partkey — dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc4 = (
        (
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        )
        * F.lit(10000).cast("decimal(18,0)")
    ).cast("decimal(38,0)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", disc4).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("promo4"),
            F.sum(disc4).alias("total4"),
        )
        .select(
            F.col("promo4").cast("double").alias("promo_rev4"),
            F.col("total4").cast("double").alias("total_rev4"),
            F.expr(
                "cast((promo4 * 1000000) div greatest(total4, 1) as bigint)"
            ).alias("promo_ppm"),
        )
    )


SQL_TPCH_Q14 = """
WITH x AS (
  SELECT (l_extendedprice::DECIMAL(18,2)
          * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
          * 10000)::HUGEINT AS disc4,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
),
s AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN disc4 ELSE 0 END) AS promo4,
         sum(disc4) AS total4
  FROM x
)
SELECT promo4::DOUBLE AS promo_rev4, total4::DOUBLE AS total_rev4,
       ((promo4 * 1000000) // greatest(total4, 1))::BIGINT AS promo_ppm
FROM s
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 180, with their customers, top 100 by order value. The
    HAVING aggregation runs FIRST on lineitem alone (map-side partials
    on l_orderkey, the table's natural clustering), and only the
    surviving keys join orders/customer — at 10^12 rows the filter
    drops ~99% of groups before any wide-row shuffle. Quantities are
    integral doubles -> exact bigint."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.floor("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .where(F.col("sum_qty") > 180)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_es"),
            "o_totalprice",
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(floor(l_quantity)::BIGINT)::BIGINT AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(floor(l_quantity)::BIGINT) > 180
)
SELECT c_custkey, c_name, o_orderkey, epoch(o_orderdate)::BIGINT AS o_orderdate_es,
       o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-value lattice: per-user stats in one groupBy, then three
    ntile(5) scores over the TINY user-level table (never the event
    table), rolled up to segment cells (<=125 rows). Recency in whole
    days via integer epoch arithmetic; every ntile ordering carries
    user_id as the total-order tiebreak so bucket assignment is
    deterministic and engine-portable."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    per_user = ev.select(
        "user_id", F.unix_timestamp("ts").alias("es"), cents.alias("cents")
    ).groupBy("user_id").agg(
        F.max("es").alias("last_es"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("cents").alias("monetary"),
    )
    w_all = Window.partitionBy()
    scored = (
        per_user.withColumn("max_es", F.max("last_es").over(w_all))
        .withColumn(
            "rec_days", F.expr("(max_es - last_es) div 86400").cast("long")
        )
        .withColumn(
            "r_score",
            F.ntile(5).over(
                Window.orderBy(F.asc("rec_days"), F.asc("user_id"))
            ),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(
                Window.orderBy(F.desc("freq"), F.asc("user_id"))
            ),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(
                Window.orderBy(F.desc("monetary"), F.asc("user_id"))
            ),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.sum("monetary").cast("long").alias("segment_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


SQL_EVENTS_RFM = """
WITH per_user AS (
  SELECT user_id, max(floor(epoch(ts)))::BIGINT AS last_es,
         count(*)::BIGINT AS freq,
         sum(floor(value * 100)::BIGINT)::BIGINT AS monetary
  FROM events GROUP BY 1
),
rec AS (
  SELECT *, ((max(last_es) OVER () - last_es) // 86400)::BIGINT AS rec_days
  FROM per_user
),
scored AS (
  SELECT *,
    ntile(5) OVER (ORDER BY rec_days ASC, user_id ASC) AS r_score,
    ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS f_score,
    ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS m_score
  FROM rec
)
SELECT r_score, f_score, m_score, count(*)::BIGINT AS users,
       sum(monetary)::BIGINT AS segment_cents
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event_type, fully integer. The
    one-sided CUSUM recurrence C_i = max(0, C_{i-1} + d_i) is NOT a
    window function — but its closed form C_i = P_i - min(0, min_{j<=i}
    P_j) over the prefix sums P IS (prefix sum + running min, one sort
    each, sharing one event_type partitioning). Deviations are kept
    integral by scaling: d_i = cents_i * n_type - sum_type (i.e.
    (x - mean) * n), with the per-type totals joined in from a tiny
    broadcast agg rather than a full-partition window over the raw
    table. Output: the max CUSUM, when it peaked (the changepoint),
    and how many rows ran above target."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    base = ev.select(
        "event_type",
        "event_id",
        "ts",
        cents.alias("cents"),
    )
    totals = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type"),
        F.sum("cents").alias("sum_type"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        base.join(F.broadcast(totals), "event_type")
        .withColumn(
            "d", F.col("cents") * F.col("n_type") - F.col("sum_type")
        )
        .withColumn("p", F.sum("d").over(w))
        .withColumn("runmin", F.min("p").over(w))
        .withColumn("c", F.col("p") - F.least(F.col("runmin"), F.lit(0)))
    )
    wt = Window.partitionBy("event_type")
    return (
        cusum.withColumn("mc", F.max("c").over(wt))
        .groupBy("event_type")
        .agg(
            F.max("c").cast("long").alias("max_cusum"),
            F.min(
                F.when(F.col("c") == F.col("mc"), F.unix_timestamp("ts"))
            )
            .cast("long")
            .alias("changepoint_es"),
            F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
            .cast("long")
            .alias("pos_rows"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_CUSUM = """
WITH base AS (
  SELECT event_type, event_id, ts, floor(value * 100)::BIGINT AS cents
  FROM events
),
totals AS (
  SELECT event_type, count(*)::BIGINT AS n_type,
         sum(cents)::BIGINT AS sum_type
  FROM base GROUP BY 1
),
pfx AS (
  SELECT b.event_type, b.event_id, b.ts,
         sum(b.cents * t.n_type - t.sum_type) OVER (
           PARTITION BY b.event_type ORDER BY b.ts, b.event_id
           ROWS UNBOUNDED PRECEDING
         ) AS p
  FROM base b JOIN totals t USING (event_type)
),
cusum AS (
  SELECT event_type, ts, p,
         min(p) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS runmin
  FROM pfx
),
c AS (
  SELECT event_type, ts, p - least(runmin, 0) AS c FROM cusum
),
m AS (
  SELECT *, max(c) OVER (PARTITION BY event_type) AS mc FROM c
)
SELECT event_type, max(c)::BIGINT AS max_cusum,
       min(CASE WHEN c = mc THEN floor(epoch(ts))::BIGINT END)::BIGINT
         AS changepoint_es,
       sum(CASE WHEN c > 0 THEN 1 ELSE 0 END)::BIGINT AS pos_rows
FROM m GROUP BY 1 ORDER BY 1
"""


# Benford first-digit expectation, log10(1 + 1/d) in ppm, d = 1..9.
_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def q_events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column: first-significant-digit
    distribution vs the log expectation — the standard fraud /
    data-quality screen for transaction amounts. One scan, one 9-group
    aggregate; observed shares and absolute deviations in integer ppm
    (the Benford expectation itself is a hardcoded ppm table, so no
    engine computes a log)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    digits = (
        ev.select(cents.alias("cents"))
        .where(F.col("cents") >= 1)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    benford = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_PPM]), F.col("digit")
    )
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
        .select(
            "digit",
            F.col("n").cast("long"),
            F.expr("cast((n * 1000000) div total as bigint)").alias("obs_ppm"),
            benford.cast("long").alias("benford_ppm"),
            F.abs(
                F.expr("cast((n * 1000000) div total as bigint)")
                - benford.cast("long")
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


_BENFORD_SQL_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_PPM, start=1)
)

SQL_EVENTS_BENFORD = f"""
WITH digits AS (
  SELECT substring((floor(value * 100)::BIGINT)::VARCHAR, 1, 1)::INT AS digit
  FROM events WHERE floor(value * 100)::BIGINT >= 1
),
g AS (
  SELECT digit, count(*)::BIGINT AS n FROM digits GROUP BY 1
),
t AS (
  SELECT *, sum(n) OVER () AS total FROM g
)
SELECT digit, n,
       ((n * 1000000) // total)::BIGINT AS obs_ppm,
       (CASE digit {_BENFORD_SQL_CASE} END)::BIGINT AS benford_ppm,
       abs((n * 1000000) // total
           - CASE digit {_BENFORD_SQL_CASE} END)::BIGINT AS dev_ppm
FROM t ORDER BY digit
"""


def q_events_autocov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocovariance components per event_type — the
    serial-dependence statistic behind changepoint and seasonality
    tests. Values are floored to whole units so every component
    (sum x, sum y, sum xy, sum x^2, sum y^2 over consecutive pairs)
    stays an exact int64 even at 10^12 rows (x <= ~10^4 units =>
    sum xy <= 10^12 * 10^8 = 10^20 would overflow in cents, but
    <= 2.4*10^17 in whole units); the final correlation r =
    (n*sxy - sx*sy) / sqrt(...) is left to the consumer because sqrt
    is not integer-exact. One lead() pass over (ts, event_id) order —
    a single sort shuffle per type — then one tiny agg."""
    ev = _t(spark, sf_dir, "events")
    units = F.floor(F.col("value")).cast("long")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", "ts", "event_id", units.alias("x"))
        .withColumn("y", F.lead("x").over(w))
        .where(F.col("y").isNotNull())
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_AUTOCOV = """
WITH pairs AS (
  SELECT event_type, floor(value)::BIGINT AS x,
         lead(floor(value)::BIGINT) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS y
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_pairs,
       sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
       sum(x * y)::BIGINT AS sxy,
       sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
FROM pairs WHERE y IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_events_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding of a categorical feature (day-of-week) by the
    purchase label — the standard high-cardinality featurizer, with the
    two leakage-control variants a training pipeline needs: additive
    smoothing toward the global prior (m=100 pseudo-rows) and
    leave-one-out bounds. Because the label is binary, the LOO value
    takes at most two values per category — (pos-1)/(n-1) for positive
    rows, pos/(n-1) for negatives — so both bounds come from the SAME
    tiny per-category aggregate in closed form: no second pass over the
    event table, no row-level fan-out. Day-of-week is derived as
    (epoch_days + 4) % 7 (Sunday=0) so both engines share one integer
    formula instead of their differing dayofweek() conventions."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.expr(
            "(unix_timestamp(ts) div 86400 + 4) % 7"
        ).cast("int").alias("dow"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    per = base.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    # global totals as windows over the 7-row aggregate: one event scan
    w_all = Window.partitionBy()
    return (
        per.withColumn("n_tot", F.sum("n").over(w_all))
        .withColumn("pos_tot", F.sum("pos").over(w_all))
        .select(
            "dow",
            F.col("n").cast("long"),
            F.col("pos").cast("long"),
            F.expr("cast((pos * 1000000) div n as bigint)").alias("enc_ppm"),
            F.expr(
                "cast((pos * 1000000 + 100 * ((pos_tot * 1000000) div n_tot))"
                " div (n + 100) as bigint)"
            ).alias("smoothed_ppm"),
            F.expr(
                "cast(case when pos > 0"
                " then ((pos - 1) * 1000000) div greatest(n - 1, 1)"
                " else (pos * 1000000) div greatest(n - 1, 1) end as bigint)"
            ).alias("loo_min_ppm"),
            F.expr(
                "cast(case when pos < n"
                " then (pos * 1000000) div greatest(n - 1, 1)"
                " else ((pos - 1) * 1000000) div greatest(n - 1, 1) end"
                " as bigint)"
            ).alias("loo_max_ppm"),
        )
        .orderBy("dow")
    )


SQL_EVENTS_TARGET_ENCODING = """
WITH base AS (
  SELECT ((floor(epoch(ts))::BIGINT // 86400 + 4) % 7)::INT AS dow,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
per AS (
  SELECT dow, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
  FROM base GROUP BY 1
),
tot AS (
  SELECT sum(n)::BIGINT AS n_tot, sum(pos)::BIGINT AS pos_tot FROM per
)
SELECT dow, n, pos,
       ((pos * 1000000) // n)::BIGINT AS enc_ppm,
       ((pos * 1000000 + 100 * ((pos_tot * 1000000) // n_tot))
        // (n + 100))::BIGINT AS smoothed_ppm,
       (CASE WHEN pos > 0
             THEN ((pos - 1) * 1000000) // greatest(n - 1, 1)
             ELSE (pos * 1000000) // greatest(n - 1, 1) END)::BIGINT
         AS loo_min_ppm,
       (CASE WHEN pos < n
             THEN (pos * 1000000) // greatest(n - 1, 1)
             ELSE ((pos - 1) * 1000000) // greatest(n - 1, 1) END)::BIGINT
         AS loo_max_ppm
FROM per CROSS JOIN tot ORDER BY dow
"""


def q_events_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights and undersampling probabilities
    per event_type — what a training loop feeds its loss / sampler to
    correct class imbalance. weight_ppm = n_total*10^6 / (k*n_c)
    (weights average to 1 across classes), sample_ppm = n_min*10^6/n_c
    (the acceptance rate that balances classes by downsampling). One
    scan into a k-row aggregate; every derived number is a window over
    that tiny agg."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    return (
        per.withColumn("n_tot", F.sum("n").over(w))
        .withColumn("k", F.count(F.lit(1)).over(w))
        .withColumn("n_min", F.min("n").over(w))
        .select(
            "event_type",
            F.col("n").cast("long"),
            F.expr("cast((n_tot * 1000000) div (k * n) as bigint)").alias(
                "weight_ppm"
            ),
            F.expr("cast((n_min * 1000000) div n as bigint)").alias(
                "sample_ppm"
            ),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_CLASS_WEIGHTS = """
WITH per AS (
  SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1
),
x AS (
  SELECT *, sum(n) OVER () AS n_tot, count(*) OVER () AS k,
         min(n) OVER () AS n_min
  FROM per
)
SELECT event_type, n,
       ((n_tot * 1000000) // (k * n))::BIGINT AS weight_ppm,
       ((n_min * 1000000) // n)::BIGINT AS sample_ppm
FROM x ORDER BY event_type
"""


def q_vocab_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model MLE table: p(w2|w1) in integer ppm =
    count(w1 w2) * 10^6 div count(w1 ·) — the conditional-probability
    complement to vocab_kn's continuation counts (together they are
    interpolated Kneser-Ney's inputs). One tokenize pass; bigram counts
    aggregate map-side before the shuffle, and the left-context totals
    are a second tiny agg over the counts themselves (never the raw
    occurrences). Top 50 by count with full lexicographic tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, word_ngrams, words

    ws = docs.select(words(normalized(F.col("text"))).alias("ws"))
    bg = (
        ws.select(F.explode(word_ngrams(F.col("ws"), 2)).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("wa"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("wb"),
        )
        .where((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # left-context totals as a window over the bigram AGGREGATE (tiny
    # vs the corpus): one tokenize pass total — no join, no re-scan
    return (
        bg.withColumn(
            "cnt_left", F.sum("cnt").over(Window.partitionBy("wa"))
        )
        .select(
            "wa",
            "wb",
            F.col("cnt").cast("long"),
            F.col("cnt_left").cast("long"),
            F.expr("cast((cnt * 1000000) div cnt_left as bigint)").alias(
                "p_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("wa"), F.asc("wb"))
        .limit(50)
    )


SQL_VOCAB_BIGRAM_LM = """
WITH ws AS (
  SELECT string_split({norm}, ' ') AS ws FROM documents
),
bg AS (
  SELECT string_split(bg, ' ')[1] AS wa, string_split(bg, ' ')[2] AS wb,
         count(*)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_transform(
      range(1, len(ws) - 0),
      i -> ws[i] || ' ' || ws[i + 1]
    )) AS bg
    FROM ws WHERE len(ws) >= 2
  )
  WHERE string_split(bg, ' ')[1] <> '' AND string_split(bg, ' ')[2] <> ''
  GROUP BY 1, 2
),
lft AS (
  SELECT wa, sum(cnt)::BIGINT AS cnt_left FROM bg GROUP BY 1
)
SELECT bg.wa AS wa, bg.wb AS wb, cnt, cnt_left,
       ((cnt * 1000000) // cnt_left)::BIGINT AS p_ppm
FROM bg JOIN lft ON bg.wa = lft.wa
ORDER BY cnt DESC, bg.wa ASC, bg.wb ASC LIMIT 50
"""


def q_doc_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lexical-richness profile per source: token count, type
    (distinct-word) count, hapax legomena (words seen once), type-token
    ratio and hapax share in integer ppm — the curation signals that
    flag template-generated or boilerplate-heavy slices (low TTR, low
    hapax share). One tokenize pass into per-(source, word) counts —
    the only big shuffle, map-side combined — then a tiny per-source
    agg over those counts."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, words

    wc = (
        docs.select(
            "source", F.explode(words(normalized(F.col("text")))).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        wc.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("tokens"),
            F.count(F.lit(1)).cast("long").alias("types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
        )
        .select(
            "source",
            "tokens",
            "types",
            "hapax",
            F.expr("cast((types * 1000000) div tokens as bigint)").alias(
                "ttr_ppm"
            ),
            F.expr("cast((hapax * 1000000) div types as bigint)").alias(
                "hapax_ppm"
            ),
        )
        .orderBy("source")
    )


SQL_DOC_LEXICAL_RICHNESS = """
WITH wc AS (
  SELECT source, w, count(*)::BIGINT AS cnt
  FROM (
    SELECT source, unnest(string_split({norm}, ' ')) AS w FROM documents
  )
  WHERE w <> ''
  GROUP BY 1, 2
),
per AS (
  SELECT source, sum(cnt)::BIGINT AS tokens, count(*)::BIGINT AS types,
         sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
  FROM wc GROUP BY 1
)
SELECT source, tokens, types, hapax,
       ((types * 1000000) // tokens)::BIGINT AS ttr_ppm,
       ((hapax * 1000000) // types)::BIGINT AS hapax_ppm
FROM per ORDER BY source
"""


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of amounts per event_type (25 bins of
    $20, last bin open-ended) with cumulative counts — the profiling
    primitive behind distribution drift checks. One scan into a
    ≤125-group aggregate; the CDF is a window over that tiny agg, so
    a 10^12-row table costs one map-side-combined shuffle."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    binned = ev.select(
        "event_type",
        F.least(F.expr("cast(floor(value * 100) as bigint) div 2000"), F.lit(24))
        .cast("int")
        .alias("bin"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cum_n", F.sum("n").over(w))
        .select(
            "event_type",
            "bin",
            (F.col("bin") * 2000).cast("long").alias("bin_lo_cents"),
            F.col("n").cast("long"),
            F.col("cum_n").cast("long"),
        )
        .orderBy("event_type", "bin")
    )


SQL_EVENTS_HISTOGRAM = """
WITH binned AS (
  SELECT event_type,
         least(floor(value * 100)::BIGINT // 2000, 24)::INT AS bin
  FROM events
),
g AS (
  SELECT event_type, bin, count(*)::BIGINT AS n FROM binned GROUP BY 1, 2
)
SELECT event_type, bin, (bin * 2000)::BIGINT AS bin_lo_cents, n,
       sum(n) OVER (PARTITION BY event_type ORDER BY bin
                    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_n
FROM g ORDER BY 1, 2
"""


def q_kg_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-assortativity components of the file x called-symbol
    bipartite graph: over every incidence edge, the exact integer sums
    (n, Σd_f, Σd_s, Σd_f·d_s, Σd_f², Σd_s²) of the two endpoint
    degrees — the inputs to Pearson's r between file fan-out and symbol
    popularity (do hub files call hub symbols?). Degrees come from two
    tiny aggregates joined back onto the edge list (symbol side
    broadcastable); like events_autocov the sqrt-bearing final r is
    left to the consumer so the gate stays integer-exact."""
    files = derived_source_files(spark, sf_dir)
    edges = (
        files.select(
            X.file_iri(F.col("repo"), F.col("path")).alias("file"),
            F.explode(
                F.regexp_extract_all("content", F.lit(X.CALL_RE), F.lit(1))
            ).alias("symbol"),
        )
        .distinct()
    )
    # degrees as count-windows over the edge list itself: one extraction
    # scan; the two window shuffles replace two join-back shuffles AND
    # the two re-extractions the join formulation would recompute
    return (
        edges.withColumn(
            "d_f", F.count(F.lit(1)).over(Window.partitionBy("file"))
        )
        .withColumn(
            "d_s", F.count(F.lit(1)).over(Window.partitionBy("symbol"))
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum("d_f").cast("long").alias("s_df"),
            F.sum("d_s").cast("long").alias("s_ds"),
            F.sum(F.col("d_f") * F.col("d_s")).cast("long").alias("s_dfds"),
            F.sum(F.col("d_f") * F.col("d_f")).cast("long").alias("s_df2"),
            F.sum(F.col("d_s") * F.col("d_s")).cast("long").alias("s_ds2"),
        )
    )


SQL_KG_ASSORTATIVITY = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
edges AS (
  SELECT DISTINCT file_iri AS file, symbol FROM calls_gt
),
dfile AS (
  SELECT file, count(*)::BIGINT AS d_f FROM edges GROUP BY 1
),
dsym AS (
  SELECT symbol, count(*)::BIGINT AS d_s FROM edges GROUP BY 1
)
SELECT count(*)::BIGINT AS n_edges,
       sum(d_f)::BIGINT AS s_df, sum(d_s)::BIGINT AS s_ds,
       sum(d_f * d_s)::BIGINT AS s_dfds,
       sum(d_f * d_f)::BIGINT AS s_df2, sum(d_s * d_s)::BIGINT AS s_ds2
FROM edges JOIN dfile USING (file) JOIN dsym USING (symbol)
"""


def q_kg_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the resolved import graph at degree
    thresholds k ∈ {1,2,4,8}: do high-degree files preferentially
    import each other? φ(k) = E_k / C(n_k, 2) in integer ppm, where
    n_k = nodes of undirected degree > k and E_k = distinct undirected
    edges inside that club. One distinct-edge build, one degree agg
    (broadcastable: one row per node), two degree joins on the edge
    list, then a 4-row threshold explode — no per-threshold rescan."""
    edges_st = q_kg_imports_resolved(spark, sf_dir).select(
        F.least("s", "o").alias("a"), F.greatest("s", "o").alias("b")
    )
    # checkpoint the deduped edge list: degrees + both club joins reuse
    # it, instead of re-running extraction 3x (28 scans -> 2 in the plan)
    edges = (
        edges_st.where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (1, 2, 4, 8)])).alias("k")
    )
    club_nodes = deg.crossJoin(F.broadcast(ks)).where(F.col("deg") > F.col("k"))
    n_k = club_nodes.groupBy("k").agg(F.count(F.lit(1)).alias("n_nodes"))
    e_k = (
        edges.join(
            club_nodes.select(F.col("node").alias("a"), "k"), "a"
        )
        .join(club_nodes.select(F.col("node").alias("b"), "k"), ["b", "k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        n_k.join(e_k, "k", "left")
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_nodes").cast("long"),
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.expr(
                "cast((coalesce(n_edges, 0) * 2000000)"
                " div greatest(n_nodes * (n_nodes - 1), 1) as bigint)"
            ).alias("phi_ppm"),
        )
        .orderBy("k")
    )


SQL_KG_RICHCLUB = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
resolved AS (
  SELECT file_iri AS s,
         'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
           || '/mod_' || t || '.py' AS o
  FROM imports_gt
),
edges AS (
  SELECT DISTINCT least(s, o) AS a, greatest(s, o) AS b
  FROM resolved WHERE s <> o
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges
  ) GROUP BY 1
),
ks AS (SELECT unnest([1, 2, 4, 8]) AS k),
club AS (
  SELECT node, k FROM deg CROSS JOIN ks WHERE deg > k
),
nk AS (SELECT k, count(*)::BIGINT AS n_nodes FROM club GROUP BY 1),
ek AS (
  SELECT ca.k, count(*)::BIGINT AS n_edges
  FROM edges e
  JOIN club ca ON e.a = ca.node
  JOIN club cb ON e.b = cb.node AND ca.k = cb.k
  GROUP BY 1
)
SELECT nk.k::INT AS k, n_nodes, coalesce(n_edges, 0)::BIGINT AS n_edges,
       ((coalesce(n_edges, 0) * 2000000)
        // greatest(n_nodes * (n_nodes - 1), 1))::BIGINT AS phi_ppm
FROM nk LEFT JOIN ek ON nk.k = ek.k
ORDER BY k
"""


def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core-vocabulary coverage per source: the share of token
    occurrences falling OUTSIDE the corpus's top-20 words (by count,
    word tiebreak) in integer ppm — the OOV/coverage screen a tokenizer
    or curation pipeline runs before training. Word counts aggregate
    map-side; the core vocab is a 20-row broadcast; per-source rollup
    touches the (source, word) counts, never the raw tokens twice."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, words

    toks = docs.select(
        "source", F.explode(words(normalized(F.col("text")))).alias("w")
    ).where(F.col("w") != "")
    wc = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        wc.groupBy("w")
        .agg(F.sum("cnt").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("w"))
        .limit(20)
        .select("w", F.lit(1).alias("in_core"))
    )
    return (
        wc.join(F.broadcast(vocab), "w", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("tokens"),
            F.sum(F.when(F.col("in_core").isNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
        .select(
            "source",
            "tokens",
            "oov_tokens",
            F.expr("cast((oov_tokens * 1000000) div tokens as bigint)").alias(
                "oov_ppm"
            ),
        )
        .orderBy("source")
    )


SQL_DOC_OOV_RATE = """
WITH toks AS (
  SELECT source, unnest(string_split({norm}, ' ')) AS w FROM documents
),
wc AS (
  SELECT source, w, count(*)::BIGINT AS cnt
  FROM toks WHERE w <> '' GROUP BY 1, 2
),
vocab AS (
  SELECT w FROM (
    SELECT w, sum(cnt) AS tot FROM wc GROUP BY 1
    ORDER BY tot DESC, w ASC LIMIT 20
  )
),
per AS (
  SELECT source, sum(cnt)::BIGINT AS tokens,
         sum(CASE WHEN vocab.w IS NULL THEN cnt ELSE 0 END)::BIGINT
           AS oov_tokens
  FROM wc LEFT JOIN vocab ON wc.w = vocab.w
  GROUP BY 1
)
SELECT source, tokens, oov_tokens,
       ((oov_tokens * 1000000) // tokens)::BIGINT AS oov_ppm
FROM per ORDER BY source
"""


def q_events_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift per event_type between two calendar halves
    (before/after 2024-01-16): L1 distance between the halves'
    25-bin amount distributions in integer ppm (= 2 × total-variation
    distance) — the drift monitor a serving pipeline alarms on. One
    scan into a ≤250-group (type, bin, half) agg; shares and the L1
    rollup are windows/aggs over that tiny table. Bins missing from
    one half align automatically because both halves aggregate in the
    same pass (conditional sums, zero default)."""
    ev = _t(spark, sf_dir, "events")
    split = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    binned = ev.select(
        "event_type",
        F.least(
            F.expr("cast(floor(value * 100) as bigint) div 2000"), F.lit(24)
        ).alias("bin"),
        F.when(split, 1).otherwise(0).alias("in_a"),
    )
    g = binned.groupBy("event_type", "bin").agg(
        F.sum("in_a").alias("o_a"),
        F.sum(F.lit(1) - F.col("in_a")).alias("o_b"),
    )
    w = Window.partitionBy("event_type")
    return (
        g.withColumn("n_a", F.sum("o_a").over(w))
        .withColumn("n_b", F.sum("o_b").over(w))
        .withColumn(
            "delta",
            F.abs(
                F.expr("(o_a * 1000000) div greatest(n_a, 1)")
                - F.expr("(o_b * 1000000) div greatest(n_b, 1)")
            ),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_a").cast("long").alias("n_first_half"),
            F.max("n_b").cast("long").alias("n_second_half"),
            F.sum("delta").cast("long").alias("l1_ppm"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_DRIFT = """
WITH binned AS (
  SELECT event_type,
         least(floor(value * 100)::BIGINT // 2000, 24) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS in_a
  FROM events
),
g AS (
  SELECT event_type, bin, sum(in_a)::BIGINT AS o_a,
         sum(1 - in_a)::BIGINT AS o_b
  FROM binned GROUP BY 1, 2
),
x AS (
  SELECT *, sum(o_a) OVER (PARTITION BY event_type) AS n_a,
         sum(o_b) OVER (PARTITION BY event_type) AS n_b
  FROM g
)
SELECT event_type, max(n_a)::BIGINT AS n_first_half,
       max(n_b)::BIGINT AS n_second_half,
       sum(abs((o_a * 1000000) // greatest(n_a, 1)
               - (o_b * 1000000) // greatest(n_b, 1)))::BIGINT AS l1_ppm
FROM x GROUP BY 1 ORDER BY 1
"""


def q_doc_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: the top-30 corpus words with rank,
    count, the rank×count product (constant under an ideal Zipf law)
    and the count as ppm of the top word — the corpus-health fingerprint
    that flags template-dominated crawls (flat head) or tokenizer bugs
    (broken tail). Map-side-combined word counts; ranking happens on the
    tiny aggregate."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, words

    wc = (
        docs.select(F.explode(words(normalized(F.col("text")))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = wc.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("w")))
    ).where(F.col("rank") <= 30)
    w1 = Window.partitionBy()
    return (
        ranked.withColumn("top_cnt", F.max("cnt").over(w1))
        .select(
            F.col("rank").cast("int"),
            "w",
            F.col("cnt").cast("long"),
            (F.col("rank") * F.col("cnt")).cast("long").alias("zipf_product"),
            F.expr("cast((cnt * 1000000) div top_cnt as bigint)").alias(
                "rel_ppm"
            ),
        )
        .orderBy("rank")
    )


SQL_DOC_ZIPF = """
WITH wc AS (
  SELECT w, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split({norm}, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY cnt DESC, w ASC) AS rank FROM wc
)
SELECT rank::INT AS rank, w, cnt,
       (rank * cnt)::BIGINT AS zipf_product,
       ((cnt * 1000000) // max(cnt) OVER ())::BIGINT AS rel_ppm
FROM ranked WHERE rank <= 30 ORDER BY rank
"""


def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event_type in exact epoch
    microseconds: count, min, max, mean (floor) and the lower median —
    the arrival-process profile behind rate alarms and capacity
    planning. One lag() sort per type builds the gaps; the median is a
    rank join against per-type counts (events_quantiles contract), so
    nothing sorts twice."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            "ts",
            "event_id",
            # NTZ-to-NTZ so gaps are timezone-independent; the epoch base
            # cancels in the lag difference (oracle uses epoch_us directly)
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
            ).alias("es"),
        )
        .withColumn("gap_us", F.col("es") - F.lag("es").over(w))
        .where(F.col("gap_us").isNotNull())
        .select("event_type", "gap_us")
    )
    # single pass: the rank sort and the per-type stat windows share one
    # event_type partitioning; the lower-median row then carries every
    # statistic out — no join back, no second traversal of the gaps
    wt = Window.partitionBy("event_type")
    ranked = (
        gaps.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("gap_us")
            ),
        )
        .withColumn("n_gaps", F.count(F.lit(1)).over(wt))
        .withColumn("min_us", F.min("gap_us").over(wt))
        .withColumn("max_us", F.max("gap_us").over(wt))
        .withColumn("sum_us", F.sum("gap_us").over(wt))
    )
    return (
        ranked.where(
            F.col("rnk") == F.greatest(F.lit(1), F.expr("(n_gaps + 1) div 2"))
        )
        .select(
            "event_type",
            F.col("n_gaps").cast("long"),
            F.col("min_us").cast("long"),
            F.col("max_us").cast("long"),
            F.expr("cast(sum_us div n_gaps as bigint)").alias("mean_us"),
            F.col("gap_us").cast("long").alias("median_us"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_INTERARRIVAL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
),
g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL),
stats AS (
  SELECT event_type, count(*)::BIGINT AS n_gaps,
         min(gap_us)::BIGINT AS min_us, max(gap_us)::BIGINT AS max_us,
         (sum(gap_us) // count(*))::BIGINT AS mean_us
  FROM g GROUP BY 1
),
ranked AS (
  SELECT event_type, gap_us,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rnk
  FROM g
),
med AS (
  SELECT r.event_type, r.gap_us::BIGINT AS median_us
  FROM ranked r JOIN stats s
    ON r.event_type = s.event_type
   AND r.rnk = greatest(1, (s.n_gaps + 1) // 2)
)
SELECT event_type, n_gaps, min_us, max_us, mean_us, median_us
FROM stats JOIN med USING (event_type)
ORDER BY event_type
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose quarterly
    revenue equals the maximum — the classic view + scalar-max shape.
    Revenue aggregates lineitem alone (map-side partials on suppkey),
    the max comes from a window over that TINY per-supplier aggregate
    (no self-join, no second scan), and only the winning row(s) join
    the supplier dim. Decimal-exact, so the equality-with-max predicate
    is engine-portable."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    disc = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc).alias("total_rev")
    )
    top = rev.withColumn(
        "max_rev", F.max("total_rev").over(Window.partitionBy())
    ).where(F.col("total_rev") == F.col("max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        top.join(supp, top.supplier_no == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
),
top AS (
  SELECT * FROM (SELECT *, max(total_rev) OVER () AS max_rev FROM rev)
  WHERE total_rev = max_rev
)
SELECT s_suppkey, s_name, total_rev::DOUBLE AS total_rev
FROM top JOIN supplier ON supplier_no = s_suppkey
ORDER BY s_suppkey
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to this generator:
    customers with above-average positive balance and no RECENT orders
    (none since 1999 — Q22's "no orders for 7 years" clause), rolled
    up per nation. The average is exact integer cents (sum div n over
    positive balances), the lapsed test is one LEFT ANTI join on the
    date-filtered orders custkey projection (filter pushed to the
    scan), and the nation dim broadcasts — the decorrelated
    two-subquery shape Q22 exists to exercise."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    pos = cust.where(F.col("bal_cents") > 0)
    avg_row = pos.agg(
        F.expr("cast(sum(bal_cents) div count(1) as bigint)").alias("avg_cents")
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    nation = _t(spark, sf_dir, "nation")
    rich = pos.crossJoin(F.broadcast(avg_row)).where(
        F.col("bal_cents") > F.col("avg_cents")
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )


SQL_TPCH_Q22 = """
WITH pos AS (
  SELECT c_custkey, c_nationkey, floor(c_acctbal * 100)::BIGINT AS bal_cents
  FROM customer WHERE floor(c_acctbal * 100)::BIGINT > 0
),
a AS (SELECT (sum(bal_cents) // count(*))::BIGINT AS avg_cents FROM pos),
rich AS (
  SELECT * FROM pos CROSS JOIN a WHERE bal_cents > avg_cents
)
SELECT n_name, count(*)::BIGINT AS numcust,
       sum(bal_cents)::BIGINT AS totacctbal_cents
FROM rich
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1999-01-01'
)
GROUP BY 1 ORDER BY 1
"""


def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration metrics per event_type over user-level
    value: the exact Gini coefficient in ppm via the rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) — every term an integer once
    users are totally ordered by (value, user_id) — plus the top-decile
    share (what % of value the top 10% of users hold). The rank sort
    runs over the per-user AGGREGATE (one row per user), never the
    event table; all stats come from windows sharing that one sort."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(cents).alias("v")
    )
    wt = Window.partitionBy("event_type")
    ranked = (
        per_user.withColumn(
            "i",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("v", "user_id")
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("sum_v", F.sum("v").over(wt))
        .withColumn("sum_iv", F.sum(F.col("i") * F.col("v")).over(wt))
        .withColumn(
            "top_v",
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - F.expr("n div 10"), F.col("v")
                ).otherwise(0)
            ).over(wt),
        )
    )
    return (
        ranked.where(F.col("i") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_users"),
            F.col("sum_v").cast("long").alias("total_cents"),
            F.expr(
                "cast(((2 * sum_iv - (n + 1) * sum_v) * 1000000)"
                " div greatest(n * sum_v, 1) as bigint)"
            ).alias("gini_ppm"),
            F.expr(
                "cast((top_v * 1000000) div greatest(sum_v, 1) as bigint)"
            ).alias("top_decile_ppm"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_GINI = """
WITH per_user AS (
  SELECT event_type, user_id, sum(floor(value * 100)::BIGINT)::BIGINT AS v
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type ORDER BY v, user_id) AS i,
    count(*) OVER (PARTITION BY event_type) AS n,
    sum(v) OVER (PARTITION BY event_type) AS sum_v
  FROM per_user
),
x AS (
  SELECT event_type, n, sum_v,
         sum(i * v) AS sum_iv,
         sum(CASE WHEN i > n - n // 10 THEN v ELSE 0 END) AS top_v
  FROM ranked GROUP BY 1, 2, 3
)
SELECT event_type, n::BIGINT AS n_users, sum_v::BIGINT AS total_cents,
       (((2 * sum_iv - (n + 1) * sum_v) * 1000000)
        // greatest(n * sum_v, 1))::BIGINT AS gini_ppm,
       ((top_v * 1000000) // greatest(sum_v, 1))::BIGINT AS top_decile_ppm
FROM x ORDER BY event_type
"""


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram novelty: the share of a document's distinct
    bigrams whose FIRST corpus occurrence (by doc_id order) is this
    document — the incremental-information signal crawl curation uses
    to drop late near-duplicates. One tokenize pass into distinct
    (doc, bigram) pairs; first-ownership is min(doc_id) over the bigram
    groups (one shuffle), then a per-doc rollup. Returns the 20 least
    novel documents (novelty ascending) with doc_id tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    from pyjelly_spark.functions.text import normalized, word_ngrams, words

    pairs = (
        docs.select(
            "doc_id", words(normalized(F.col("text"))).alias("ws")
        )
        .select(
            "doc_id", F.explode(word_ngrams(F.col("ws"), 2)).alias("bg")
        )
        .where(
            (F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) != "")
            & (F.split_part(F.col("bg"), F.lit(" "), F.lit(2)) != "")
        )
        .distinct()
    )
    owned = pairs.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("bg"))
    )
    return (
        owned.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bigrams"),
            F.sum(
                F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
            )
            .cast("long")
            .alias("novel"),
        )
        .select(
            "doc_id",
            "bigrams",
            "novel",
            F.expr("cast((novel * 1000000) div bigrams as bigint)").alias(
                "novelty_ppm"
            ),
        )
        .orderBy(F.asc("novelty_ppm"), F.asc("doc_id"))
        .limit(20)
    )


SQL_DOC_NOVELTY = """
WITH ws AS (
  SELECT doc_id, string_split({norm}, ' ') AS ws FROM documents
),
pairs AS (
  SELECT DISTINCT doc_id, bg FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, len(ws) - 0),
      i -> ws[i] || ' ' || ws[i + 1]
    )) AS bg
    FROM ws WHERE len(ws) >= 2
  )
  WHERE string_split(bg, ' ')[1] <> '' AND string_split(bg, ' ')[2] <> ''
),
owned AS (
  SELECT doc_id, bg, min(doc_id) OVER (PARTITION BY bg) AS first_doc
  FROM pairs
)
SELECT doc_id, count(*)::BIGINT AS bigrams,
       sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)::BIGINT AS novel,
       ((sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) * 1000000)
        // count(*))::BIGINT AS novelty_ppm
FROM owned GROUP BY doc_id
ORDER BY novelty_ppm ASC, doc_id ASC LIMIT 20
"""


def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Holt double exponential smoothing (level + trend,
    alpha=beta=1/4) per user — the trend-aware forecasting recurrence
    EWMA can't express. Per-key Arrow scan like events_ewma (one hash
    exchange, the minimum co-location the recurrence admits); the
    oracle unrolls the identical recurrence as a recursive CTE, with
    floor division EMULATED for negative trends (DuckDB's // truncates
    toward zero; Python's floors — the classic cross-engine integer
    hazard, pinned here)."""
    from pyjelly_spark.operators.timeseries import holt_int

    return holt_int(_t(spark, sf_dir, "events"))


# portable floor division: DuckDB's // truncates toward zero for
# negative operands, Python's // floors — emulate flooring with a
# nonnegative-mod correction (y > 0 constant here)
SQL_EVENTS_HOLT = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         floor(value * 100)::BIGINT AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), h AS (
  SELECT user_id, event_id, rn, cents,
         cents AS level, 0::BIGINT AS trend
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, s.cents,
         nl.v AS level,
         ((1 * (nl.v - h.level) + 3 * h.trend)
          - ((((1 * (nl.v - h.level) + 3 * h.trend) % 4) + 4) % 4)) // 4
           AS trend
  FROM seq s
  JOIN h ON s.user_id = h.user_id AND s.rn = h.rn + 1
  CROSS JOIN LATERAL (
    SELECT ((1 * s.cents + 3 * (h.level + h.trend))
            - ((((1 * s.cents + 3 * (h.level + h.trend)) % 4) + 4) % 4)) // 4
             AS v
  ) nl
)
SELECT user_id, event_id, cents, level, trend FROM h
"""


def q_events_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two deterministic
    variants (portable hash of user_id, mod 2), outcome = did the user
    purchase. Emits the 2x2 contingency table plus conversion rates in
    ppm and the chi-square statistic in milli-units — computed EXACTLY
    as 1000·n·(ad−bc)² / (row·col margin product) in decimal(38,0) /
    HUGEINT (the (ad−bc)² cross term overflows int64 at realistic
    counts). One scan -> per-user agg -> 4-cell aggregate; every
    derived number is arithmetic on the single result row."""
    from pyjelly_spark.functions.text import hex_hash

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    cells = per_user.select(
        hex_hash(F.col("user_id").cast("string"), 2).alias("variant"),
        "converted",
    ).groupBy().agg(
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1)
            .otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1)
            .otherwise(0)
        ).alias("d"),
    )
    return cells.select(
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.col("c").cast("long"),
        F.col("d").cast("long"),
        F.expr("cast((a * 1000000) div greatest(a + b, 1) as bigint)").alias(
            "rate0_ppm"
        ),
        F.expr("cast((c * 1000000) div greatest(c + d, 1) as bigint)").alias(
            "rate1_ppm"
        ),
        F.expr(
            "cast((1000 * (a + b + c + d)"
            " * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)"
            " * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c))"
            " div greatest(cast(a + b as decimal(38,0)) * (c + d)"
            "              * (a + c) * (b + d), 1) as bigint)"
        ).alias("chi2_milli"),
    )


SQL_EVENTS_ABTEST = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
cells AS (
  SELECT
    sum(CASE WHEN v = 0 AND converted = 1 THEN 1 ELSE 0 END)::BIGINT AS a,
    sum(CASE WHEN v = 0 AND converted = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
    sum(CASE WHEN v = 1 AND converted = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
    sum(CASE WHEN v = 1 AND converted = 0 THEN 1 ELSE 0 END)::BIGINT AS d
  FROM (
    SELECT ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT % 2
             AS v,
           converted
    FROM per_user
  )
)
SELECT a, b, c, d,
       ((a * 1000000) // greatest(a + b, 1))::BIGINT AS rate0_ppm,
       ((c * 1000000) // greatest(c + d, 1))::BIGINT AS rate1_ppm,
       ((1000 * (a + b + c + d)
         * ((a::HUGEINT * d - b::HUGEINT * c)
            * (a::HUGEINT * d - b::HUGEINT * c)))
        // greatest((a + b)::HUGEINT * (c + d) * (a + c) * (b + d), 1)
       )::BIGINT AS chi2_milli
FROM cells
"""


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized statistics per event_type: amounts clipped to the
    exact lower p05/p95 (rank selection, events_quantiles contract)
    before summing — the outlier-robust mean a billing pipeline reports
    next to the raw one. One rank sort per type; the clip bounds ride
    the same ranked rows via windows (no join back); raw vs winsorized
    sums come from one final agg."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    wt = Window.partitionBy("event_type")
    ranked = (
        ev.select("event_type", cents.alias("v"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("v")
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn(
            "lo",
            F.max(
                F.when(
                    F.col("rnk")
                    == F.greatest(F.lit(1), F.expr("(5 * n) div 100")),
                    F.col("v"),
                )
            ).over(wt),
        )
        .withColumn(
            "hi",
            F.max(
                F.when(
                    F.col("rnk")
                    == F.greatest(F.lit(1), F.expr("(95 * n) div 100")),
                    F.col("v"),
                )
            ).over(wt),
        )
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("lo").cast("long").alias("p05_cents"),
            F.max("hi").cast("long").alias("p95_cents"),
            F.sum("v").cast("long").alias("raw_sum"),
            F.sum(F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo")))
            .cast("long")
            .alias("winsorized_sum"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_WINSORIZE = """
WITH ranked AS (
  SELECT event_type, floor(value * 100)::BIGINT AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY
                            floor(value * 100)::BIGINT) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
b AS (
  SELECT *,
    max(CASE WHEN rnk = greatest(1, (5 * n) // 100) THEN v END)
      OVER (PARTITION BY event_type) AS lo,
    max(CASE WHEN rnk = greatest(1, (95 * n) // 100) THEN v END)
      OVER (PARTITION BY event_type) AS hi
  FROM ranked
)
SELECT event_type, count(*)::BIGINT AS n,
       max(lo)::BIGINT AS p05_cents, max(hi)::BIGINT AS p95_cents,
       sum(v)::BIGINT AS raw_sum,
       sum(greatest(least(v, hi), lo))::BIGINT AS winsorized_sum
FROM b GROUP BY 1 ORDER BY 1
"""


def q_kg_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the resolved import graph: the share of directed
    edges whose reverse edge also exists (mutual dyads) in integer ppm
    — the dependency-cycle smell metric for a codebase KG. One distinct
    edge build, one self-equi-join on the swapped key (hash join, no
    explosion: at most one match per edge), one global agg."""
    edges = (
        q_kg_imports_resolved(spark, sf_dir)
        .select("s", "o")
        .where(F.col("s") != F.col("o"))
        .distinct()
        # both join sides derive from this extraction; a lazy checkpoint
        # makes it run once (kg_richclub precedent) instead of twice
        .localCheckpoint(eager=False)
    )
    rev = edges.select(
        F.col("o").alias("s"), F.col("s").alias("o"), F.lit(1).alias("has_rev")
    )
    return (
        edges.join(rev, ["s", "o"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce("has_rev", F.lit(0)))
            .cast("long")
            .alias("n_reciprocal"),
        )
        .select(
            "n_edges",
            "n_reciprocal",
            F.expr("cast(n_reciprocal div 2 as bigint)").alias("mutual_dyads"),
            F.expr(
                "cast((n_reciprocal * 1000000) div greatest(n_edges, 1)"
                " as bigint)"
            ).alias("reciprocity_ppm"),
        )
    )


SQL_KG_RECIPROCITY = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
resolved AS (
  SELECT DISTINCT file_iri AS s,
         'http://kg.example/file/repo-0' || (t % 7) || '/src/pkg' || (t % 13)
           || '/mod_' || t || '.py' AS o
  FROM imports_gt
),
edges AS (SELECT s, o FROM resolved WHERE s <> o),
j AS (
  SELECT e.s, e.o,
         CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END AS has_rev
  FROM edges e
  LEFT JOIN edges r ON e.s = r.o AND e.o = r.s
)
SELECT count(*)::BIGINT AS n_edges,
       sum(has_rev)::BIGINT AS n_reciprocal,
       (sum(has_rev) // 2)::BIGINT AS mutual_dyads,
       ((sum(has_rev) * 1000000) // greatest(count(*), 1))::BIGINT
         AS reciprocity_ppm
FROM j
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------



def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), adapted to this generator
    (flat p_type category, no container/comment columns): share of
    ASIA-region customers' 1996-1997 order volume on STANDARD parts
    supplied by NATION_1, per order year, in integer ppm (decimal
    scale-4 units exactly like q14 — no float division anywhere).
    Plan: the lineitem->orders chain is the only big hash join; part
    (type-filtered), supplier, customer, nation and region all
    broadcast. Reference semantics: TPC-H spec Q8."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol4 = (
        (
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        )
        * F.lit(10000).cast("decimal(18,0)")
    ).cast("decimal(38,0)")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", vol4).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("nat4"),
            F.sum(vol4).alias("tot4"),
        )
        .select(
            "o_year",
            F.col("nat4").cast("double").alias("nation_vol4"),
            F.col("tot4").cast("double").alias("total_vol4"),
            F.expr(
                "cast((nat4 * 1000000) div greatest(tot4, 1) as bigint)"
            ).alias("mkt_share_ppm"),
        )
        .orderBy("o_year")
    )


SQL_TPCH_Q8 = """
SELECT year(o_orderdate)::BIGINT AS o_year,
       sum(CASE WHEN n1.n_name = 'NATION_1' THEN v4 ELSE 0 END)::DOUBLE
         AS nation_vol4,
       sum(v4)::DOUBLE AS total_vol4,
       ((sum(CASE WHEN n1.n_name = 'NATION_1' THEN v4 ELSE 0 END) * 1000000)
        // greatest(sum(v4), 1))::BIGINT AS mkt_share_ppm
FROM (
  SELECT l_orderkey, l_partkey, l_suppkey,
         (l_extendedprice::DECIMAL(18,2)
          * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
          * 10000)::HUGEINT AS v4
  FROM lineitem
) li
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: the
    spec's o_comment NOT LIKE filter has no column in this generator,
    so the analogous exclusion is o_orderpriority <> '1-URGENT'.
    Pure-integer count-of-counts: customer LEFT JOIN filtered orders,
    count per customer, histogram of those counts. Plan: one hash
    join + two small aggs; orders' filter is pushed to the scan and
    only o_custkey survives pruning."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: the spec's
    p_container predicate becomes p_size = 7 (no container column).
    The correlated subquery l_quantity < 0.2 * avg(l_quantity) is made
    EXACT by integer cross-multiplication: qty < sum/(5*cnt)  <=>
    5*qty*cnt < sum (quantities are integral) — no float avg anywhere.
    Plan: the tiny filtered part dim broadcasts; the per-part avg rides
    a window over the SAME part-restricted lineitem scan (no self-join,
    one exchange on l_partkey); avg_yearly is returned in exact cents
    (div 7) plus the raw sum."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") == 7)
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (_dec("l_extendedprice") * F.lit(100).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("price_cents"),
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .where(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            F.coalesce(
                F.sum("price_cents"), F.lit(0).cast("decimal(38,0)")
            ).alias("c"),
        )
        .select(
            "n_small",
            F.col("c").cast("double").alias("sum_cents"),
            F.expr("cast(c div 7 as bigint)").alias("avg_yearly_cents"),
        )
    )


SQL_TPCH_Q17 = """
WITH li AS (
  SELECT l_partkey, l_quantity::BIGINT AS qty,
         (l_extendedprice::DECIMAL(18,2) * 100)::HUGEINT AS price_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11' AND p_size = 7
),
stats AS (
  SELECT *, sum(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
         count(*) OVER (PARTITION BY l_partkey) AS cnt
  FROM li
)
SELECT count(*)::BIGINT AS n_small,
       coalesce(sum(price_cents), 0)::DOUBLE AS sum_cents,
       (coalesce(sum(price_cents), 0) // 7)::BIGINT AS avg_yearly_cents
FROM stats WHERE 5 * qty * cnt < sum_qty
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates), adapted:
    the spec's p_container/shipmode/shipinstruct legs become p_size
    bands (no such columns here). Three OR'd (brand, size-band,
    qty-band) legs; revenue decimal-exact (double + exact cents).
    Plan: part broadcasts with the union of the three part-side
    predicates pushed into the build side; the residual disjunction
    evaluates post-join in one codegen stage — lineitem is scanned
    once, no union-of-three-joins."""
    part = _t(spark, sf_dir, "part").where(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
        )
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (
            (
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            )
            * F.lit(10000).cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("rev4"),
    )
    matched = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).where(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("qty").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("qty").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("qty").between(20, 30)
        )
    )
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.coalesce(F.sum("rev4"), F.lit(0).cast("decimal(38,0)")).alias("r4"),
    ).select(
        "n_items",
        F.col("r4").cast("double").alias("revenue4"),
        F.expr("cast(r4 div 100 as bigint)").alias("revenue_cents"),
    )


SQL_TPCH_Q19 = """
SELECT count(*)::BIGINT AS n_items,
       coalesce(sum(rev4), 0)::DOUBLE AS revenue4,
       (coalesce(sum(rev4), 0) // 100)::BIGINT AS revenue_cents
FROM (
  SELECT l_quantity::BIGINT AS qty,
         (l_extendedprice::DECIMAL(18,2)
          * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
          * 10000)::HUGEINT AS rev4,
         p_brand, p_size
  FROM lineitem JOIN part ON l_partkey = p_partkey
) t
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND qty BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         AND qty BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         AND qty BETWEEN 20 AND 30)
"""


def q_events_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index audience overlap: EXACT distinct-user intersection
    between every event_type pair computed with roaring-style bitmap
    algebra — users are packed into 62-bit words (word = uid div 62,
    mask = bit_or(1 << uid mod 62); 62 keeps the sign bit and bit 62
    clear so Spark and DuckDB agree without unsigned types), pairs
    intersect via mask AND + bit_count, never via a user-level join.
    This is the audience-segmentation / OLAP bitmap-index pattern: the
    shuffled state is |types| x |users|/62 words instead of the raw
    (type, user) pairs, and set algebra (AND/OR/NOT) happens word-wise.
    One scan, one word-level agg, a tiny self-join on word index, one
    global agg per pair + broadcast of the 5-row per-type cardinality."""
    ev = _t(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            (F.col("user_id") / 62).cast("long").alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(user_id % 62 as int))"
            ).alias("m"),
        )
        .groupBy("event_type", "w")
        .agg(F.bit_or("m").alias("mask"))
        # three consumers (totals + both join sides) derive from this
        # aggregate; a lazy checkpoint makes the events scan run once —
        # the word table itself is tiny (|types| x |users|/62 rows)
        .localCheckpoint(eager=False)
    )
    totals = words.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_users")
    )
    a = words.select(
        F.col("event_type").alias("type_a"),
        "w",
        F.col("mask").alias("mask_a"),
    )
    b = words.select(
        F.col("event_type").alias("type_b"),
        "w",
        F.col("mask").alias("mask_b"),
    )
    pairs = (
        a.join(b, "w")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("mask_a").bitwiseAND(F.col("mask_b"))))
            .cast("long")
            .alias("overlap")
        )
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "overlap",
            F.expr(
                "cast((overlap * 1000000)"
                " div greatest(users_a + users_b - overlap, 1) as bigint)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_EVENTS_BITMAP = """
WITH words AS (
  SELECT event_type, user_id // 62 AS w,
         bit_or(1::BIGINT << (user_id % 62)::INTEGER) AS mask
  FROM events GROUP BY 1, 2
),
totals AS (
  SELECT event_type, sum(bit_count(mask))::BIGINT AS n_users
  FROM words GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         sum(bit_count(a.mask & b.mask))::BIGINT AS overlap
  FROM words a JOIN words b ON a.w = b.w AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       ta.n_users AS users_a, tb.n_users AS users_b, overlap,
       ((overlap * 1000000)
        // greatest(ta.n_users + tb.n_users - overlap, 1))::BIGINT
         AS jaccard_ppm
FROM pairs
JOIN totals ta ON ta.event_type = type_a
JOIN totals tb ON tb.event_type = type_b
ORDER BY 1, 2
"""


def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User survival curve (Kaplan-Meier with no censoring): for each
    day offset d in 0..13, the ppm share of users whose observed
    lifespan (days between first and last event) is >= d. One per-user
    agg, then a 14-row day grid cross-joined against the per-user
    lifespans in a single conditional aggregate — the survivors count
    is exact, no float hazard products. Plan: per-user agg is the only
    real exchange; the grid side is a broadcast of a 14-row range."""
    ev = _t(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.datediff(
            F.max("ts").cast("date"), F.min("ts").cast("date")
        ).alias("lifespan")
    )
    grid = spark.range(14).select(F.col("id").cast("long").alias("d"))
    return (
        spans.crossJoin(F.broadcast(grid))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.when(F.col("lifespan") >= F.col("d"), 1).otherwise(0))
            .cast("long")
            .alias("survivors"),
        )
        .select(
            "d",
            "n_users",
            "survivors",
            F.expr(
                "cast((survivors * 1000000) div greatest(n_users, 1)"
                " as bigint)"
            ).alias("survival_ppm"),
        )
        .orderBy("d")
    )


SQL_EVENTS_SURVIVAL = """
WITH spans AS (
  SELECT user_id,
         date_diff('day', min(ts)::DATE, max(ts)::DATE) AS lifespan
  FROM events GROUP BY 1
),
grid AS (SELECT unnest(range(14))::BIGINT AS d)
SELECT d, count(*)::BIGINT AS n_users,
       sum(CASE WHEN lifespan >= d THEN 1 ELSE 0 END)::BIGINT AS survivors,
       ((sum(CASE WHEN lifespan >= d THEN 1 ELSE 0 END) * 1000000)
        // greatest(count(*), 1))::BIGINT AS survival_ppm
FROM spans CROSS JOIN grid
GROUP BY d ORDER BY d
"""


def q_events_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: exact Gini impurity of the
    user's event_type distribution, 1 - sum(p_t^2), in integer ppm via
    cross-multiplication ((n^2 - sum(c^2)) * 10^6 div n^2) — the
    log-free diversity score (entropy needs ln; impurity is
    rational-exact and ranks users the same way for curation). One
    (user, type) agg -> one per-user agg; ordered most-diverse-first
    for the monitor view."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr(
                "cast(((n_events * n_events - sq) * 1000000)"
                " div (n_events * n_events) as bigint)"
            ).alias("impurity_ppm"),
        )
        .orderBy(F.desc("impurity_ppm"), "user_id")
    )


SQL_EVENTS_DIVERSITY = """
WITH per_type AS (
  SELECT user_id, event_type, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id, sum(c)::BIGINT AS n_events, count(*)::BIGINT AS n_types,
       (((sum(c) * sum(c) - sum(c * c)) * 1000000)
        // (sum(c) * sum(c)))::BIGINT AS impurity_ppm
FROM per_type GROUP BY user_id
ORDER BY impurity_ppm DESC, user_id
"""




def q_kg_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities over the symmetrized
    resolved-import graph, EXACT in integer ppm: with D = |directed
    symmetrized pairs| = 2m, E_c = directed pairs internal to community
    c, d_c = degree sum of c,  Q = sum_c(E_c*D - d_c^2) / D^2 — one
    integer division at the end (truncating toward zero in BOTH
    engines when Q is negative — Spark div and DuckDB // agree),
    decimal(38,0) intermediates (D^2 overflows int64 beyond ~3B
    edges). The community-quality metric
    that tells you whether the LPA labels actually cut the graph well.
    Plan: labels from the same 3-round deterministic LPA as
    kg_communities; the (checkpointed) und edge table joins the label
    map twice (src, dst) in one pass; degrees ride the same und table;
    two small aggs end it."""
    from pyjelly_spark.operators.components import (
        _symmetrize,
        label_propagation,
    )

    edges = q_kg_imports_resolved(spark, sf_dir).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    und = _symmetrize(edges, dedup=True).localCheckpoint(eager=False)
    labels = label_propagation(edges, iterations=3).localCheckpoint(
        eager=False
    )
    lab_s = labels.select(
        F.col("node").alias("src"), F.col("label").alias("c_src")
    )
    lab_d = labels.select(
        F.col("node").alias("dst"), F.col("label").alias("c_dst")
    )
    per_comm = (
        und.join(lab_s, "src")
        .join(lab_d, "dst")
        .groupBy("c_src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("deg_sum"),
            F.sum(F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0))
            .cast("long")
            .alias("internal"),
        )
    )
    # the per-community table is tiny (|communities| rows), so the
    # unpartitioned total-degree window is a no-cost broadcast frame
    with_tot = per_comm.withColumn(
        "d_total", F.sum("deg_sum").over(Window.partitionBy())
    )
    return (
        with_tot.agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.max("d_total").cast("long").alias("d_tot"),
            F.sum("internal").cast("long").alias("internal_total"),
            F.sum(
                F.col("internal").cast("decimal(38,0)") * F.col("d_total")
                - F.col("deg_sum").cast("decimal(38,0)") * F.col("deg_sum")
            ).alias("num"),
        )
        .select(
            "n_communities",
            F.expr("cast(d_tot div 2 as bigint)").alias("m_edges"),
            "internal_total",
            F.expr(
                "cast((num * 1000000)"
                " div greatest(cast(d_tot as decimal(38,0)) * d_tot, 1)"
                " as bigint)"
            ).alias("modularity_ppm"),
        )
    )


def _modularity_sql() -> str:
    base = _lpa_sql(3)
    final = base.rsplit("SELECT node, label FROM l3", 1)[0]
    return (
        final.rstrip().rstrip(",")
        + """,
labs AS (SELECT node, label FROM l3),
joined AS (
  SELECT ls.label AS c_src, ld.label AS c_dst
  FROM und e
  JOIN labs ls ON e.src = ls.node
  JOIN labs ld ON e.dst = ld.node
),
per_comm AS (
  SELECT c_src, count(*)::BIGINT AS deg_sum,
         sum(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END)::BIGINT AS internal
  FROM joined GROUP BY 1
)
SELECT count(*)::BIGINT AS n_communities,
       (sum(deg_sum) // 2)::BIGINT AS m_edges,
       sum(internal)::BIGINT AS internal_total,
       ((sum(internal::HUGEINT * (SELECT sum(deg_sum) FROM per_comm)
             - deg_sum::HUGEINT * deg_sum) * 1000000)
        // greatest((SELECT sum(deg_sum)::HUGEINT FROM per_comm)
                    * (SELECT sum(deg_sum) FROM per_comm), 1))::BIGINT
         AS modularity_ppm
FROM per_comm
"""
    )


SQL_KG_MODULARITY = _modularity_sql().format(
    src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
)


def q_events_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: one-step-ahead Holt forecast
    (level+trend at t-1) vs the naive last-value baseline, exact
    integer MAE in cents plus the improvement share in ppm — the
    model-eval readout for the forecasting family. Plan: the Holt
    recurrence's per-key Arrow pass, a 1:1 join back to events for the
    (ts, event_id) order key, one lag window sharing the user_id
    partitioning, one global agg."""
    from pyjelly_spark.operators.timeseries import holt_int

    ev = _t(spark, sf_dir, "events")
    h = holt_int(ev).join(ev.select("event_id", "ts"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scored = (
        h.select(
            "cents",
            F.lag(F.col("level") + F.col("trend")).over(w).alias("forecast"),
            F.lag("cents").over(w).alias("naive"),
        )
        .where(F.col("forecast").isNotNull())
    )
    return (
        scored.agg(
            F.count(F.lit(1)).cast("long").alias("n_forecasts"),
            F.sum(F.abs(F.col("cents") - F.col("forecast")))
            .cast("long")
            .alias("holt_abs_err"),
            F.sum(F.abs(F.col("cents") - F.col("naive")))
            .cast("long")
            .alias("naive_abs_err"),
        )
        .select(
            "n_forecasts",
            "holt_abs_err",
            "naive_abs_err",
            F.expr(
                "cast(holt_abs_err div greatest(n_forecasts, 1) as bigint)"
            ).alias("holt_mae_cents"),
            F.expr(
                "cast(naive_abs_err div greatest(n_forecasts, 1) as bigint)"
            ).alias("naive_mae_cents"),
            F.expr(
                "cast(((naive_abs_err - holt_abs_err) * 1000000)"
                " div greatest(naive_abs_err, 1) as bigint)"
            ).alias("improvement_ppm"),
        )
    )


SQL_EVENTS_BACKTEST = SQL_EVENTS_HOLT.replace(
    "SELECT user_id, event_id, cents, level, trend FROM h",
    """, scored AS (
  SELECT cents,
         lag(level + trend) OVER (PARTITION BY user_id ORDER BY rn)
           AS forecast,
         lag(cents) OVER (PARTITION BY user_id ORDER BY rn) AS naive
  FROM h
)
SELECT count(*)::BIGINT AS n_forecasts,
       sum(abs(cents - forecast))::BIGINT AS holt_abs_err,
       sum(abs(cents - naive))::BIGINT AS naive_abs_err,
       (sum(abs(cents - forecast)) // greatest(count(*), 1))::BIGINT
         AS holt_mae_cents,
       (sum(abs(cents - naive)) // greatest(count(*), 1))::BIGINT
         AS naive_mae_cents,
       (((sum(abs(cents - naive)) - sum(abs(cents - forecast))) * 1000000)
        // greatest(sum(abs(cents - naive)), 1))::BIGINT AS improvement_ppm
FROM scored WHERE forecast IS NOT NULL""",
).replace(
    "WITH RECURSIVE seq AS (",
    "WITH RECURSIVE seq AS (",
)


def q_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup verify: candidate pairs blocked on the
    first 60 chars (template near-dups share their prefix), verified
    with EXACT Levenshtein distance <= 50 — the character-level verify
    the token-based (Jaccard/MinHash) family can't express (it catches
    single-char template edits that shift every shingle). Blocking
    keeps it scale-safe: the self-join is an equi-join on the prefix
    (never all-pairs) and Levenshtein runs only inside blocks; both
    engines' levenshtein is the standard unit-cost Wagner-Fischer, so
    the gate is exact."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, 60).alias("blk")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        "blk",
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        "blk",
    )
    return (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= 50)
        .orderBy("doc_a", "doc_b")
    )


SQL_DEDUP_EDITDIST = """
WITH d AS (
  SELECT doc_id, text, substring(text, 1, 60) AS blk FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text)::BIGINT AS dist
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.text, b.text) <= 50
ORDER BY doc_a, doc_b
"""




def q_events_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC via the Mann-Whitney rank statistic: does total
    spend (cents) rank converters above non-converters? Midranks handle
    score ties exactly by carrying 2*rank integers (2*midrank =
    2*min_rank + ties - 1), so AUC = (sum_pos(2R) - n1(n1+1)) /
    (2*n1*n0) is one integer division in ppm — the distributed exact
    AUC that sklearn computes single-node. Plan: one per-user agg, one
    per-SCORE agg (rank sums reconstructed from cumulative tie counts:
    sum_pos(2R) at score s = n_pos(s)*(2*cum_below(s)+n(s)+1)), so the
    only single-partition window runs over distinct scores, never
    users — exact AUC without a global per-row sort. decimal(38,0)
    guards the rank-sum products past ~3B users."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    # rank sums from per-score tallies: min rank at score s is
    # cum_below(s)+1, so sum_pos(2*midrank) = n_pos(s) *
    # (2*cum_below(s) + n(s) + 1). The per-user table never crosses a
    # single-partition window — only the (distinct-score)-sized
    # aggregate does, which is what makes exact AUC scale.
    per_score = per_user.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").alias("np"),
    )
    ws = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = per_score.withColumn(
        "cum_below", F.sum("n").over(ws) - F.col("n")
    ).select(
        F.col("np").alias("label_pos"),
        (F.col("n") - F.col("np")).alias("label_neg"),
        (
            F.col("np").cast("decimal(38,0)")
            * (F.lit(2) * F.col("cum_below") + F.col("n") + F.lit(1))
        ).alias("two_r_sum"),
    )
    return (
        scored.agg(
            F.sum("two_r_sum")
            .cast("decimal(38,0)")
            .alias("two_rank_sum_pos"),
            F.sum("label_pos").cast("long").alias("n_pos"),
            F.sum("label_neg").cast("long").alias("n_neg"),
        )
        .select(
            "n_pos",
            "n_neg",
            F.col("two_rank_sum_pos").cast("long"),
            F.expr(
                "cast(((two_rank_sum_pos - cast(n_pos as decimal(38,0))"
                " * (n_pos + 1)) * 1000000)"
                " div greatest(2 * cast(n_pos as decimal(38,0)) * n_neg, 1)"
                " as bigint)"
            ).alias("auc_ppm"),
        )
    )


SQL_EVENTS_AUC = """
WITH per_user AS (
  SELECT user_id, sum(floor(value * 100)::BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1
),
ranked AS (
  SELECT label,
         2 * rank() OVER (ORDER BY score)
           + count(*) OVER (PARTITION BY score) - 1 AS two_r
  FROM per_user
)
SELECT sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
       sum(CASE WHEN label = 1 THEN two_r END)::BIGINT AS two_rank_sum_pos,
       (((sum(CASE WHEN label = 1 THEN two_r END)::HUGEINT
          - sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::HUGEINT
            * (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1)) * 1000000)
        // greatest(2 * sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::HUGEINT
                    * sum(CASE WHEN label = 0 THEN 1 ELSE 0 END), 1))::BIGINT
         AS auc_ppm
FROM ranked
"""


CONTAINMENT_THRESHOLD_PPM = 800000


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs: |S_a ∩ S_b| / |S_a| in
    EXACT integer ppm over word-3-gram shingle sets, DIRECTED (a
    contained in b is not b contained in a) — catches a document
    embedded inside a longer one, which symmetric Jaccard dilutes below
    any usable threshold. Same equi-join-on-shingle plan as the exact
    Jaccard path (never all-pairs; candidate pairs share >=1 shingle),
    one extra size join; output restricted to containment >= 0.8.
    Scale note: like dedup_jaccard this is the exact/oracle path — on
    corpora where the candidate set itself explodes, run it behind the
    MinHash prefilter."""
    from pyjelly_spark.operators.components import cap_key_fanout
    from pyjelly_spark.operators.dedup import doc_shingles

    # Exact-tier hub guard: refuse (not silently drop) hot shingles —
    # one 10^5-doc boilerplate 3-gram would emit ~10^10 pairs alone.
    # One checkpointed materialization feeds guard + sizes + both join
    # sides (otherwise 4 tokenize+explode traversals of the corpus).
    sh = cap_key_fanout(
        doc_shingles(_t(spark, sf_dir, "documents"), n=3).localCheckpoint(
            eager=False
        ),
        "shingle",
        on_exceed="error",
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    left = sh.select(F.col("doc_id").alias("a"), "shingle")
    right = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")),
            "a",
        )
        .select(
            "a",
            "b",
            F.expr("cast((inter * 1000000) div sa as bigint)").alias(
                "containment_ppm"
            ),
        )
        .where(F.col("containment_ppm") >= CONTAINMENT_THRESHOLD_PPM)
        .orderBy("a", "b")
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH {{shingles}}
SELECT a, b, containment_ppm FROM (
  SELECT inter.a, inter.b,
         (i * 1000000) // sa.sz AS containment_ppm
  FROM (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
    FROM shingles x JOIN shingles y USING (shingle)
    WHERE x.doc_id <> y.doc_id GROUP BY 1, 2
  ) inter
  JOIN sizes sa ON inter.a = sa.doc_id
)
WHERE containment_ppm >= {CONTAINMENT_THRESHOLD_PPM}
ORDER BY a, b
"""




def q_events_holtwinters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact additive Holt-Winters (level + trend + weekly
    seasonal, alpha=beta=gamma=1/4, m=7) over per-type daily revenue —
    the seasonality-aware forecaster that completes the EWMA -> Holt ->
    Holt-Winters family. Deterministic integer init (l_7 = floor-mean
    of week 1, b_7 = 0, s_i = c_i - l_7); only t >= 8 rows emit. The
    oracle unrolls the recurrence as a recursive CTE carrying the
    7-slot seasonal vector as a LIST column (rotate = seas[2:] ||
    [s_t]) with floor division EMULATED at all three update steps
    (trend and seasonal go negative; DuckDB // truncates). Plan: one
    daily pre-agg (map-side partials), one hash exchange on
    event_type, per-key O(n) integer loop in an Arrow batch."""
    from pyjelly_spark.operators.timeseries import holt_winters_int

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("key"),
            F.col("ts").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    return holt_winters_int(daily).withColumnRenamed("key", "event_type")


# fdiv(x, k) for constant k > 0, flooring like Python // (DuckDB //
# truncates toward zero for negative x)
def _fdiv(x: str, k: int) -> str:
    return f"(({x}) - (((({x}) % {k}) + {k}) % {k})) // {k}"


SQL_EVENTS_HOLTWINTERS = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS key, ts::DATE AS d,
         sum(floor(value * 100)::BIGINT)::BIGINT AS cents
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT key, row_number() OVER (PARTITION BY key ORDER BY d) AS rn, cents
  FROM daily
),
lvl AS (
  SELECT key, {_fdiv("sum(cents)", 7)}::BIGINT AS level
  FROM seq WHERE rn <= 7 GROUP BY key
),
base AS (
  SELECT s.key, 7::BIGINT AS rn, NULL::BIGINT AS cents, l.level,
         0::BIGINT AS trend, NULL::BIGINT AS seasonal,
         NULL::BIGINT AS forecast,
         list(s.cents - l.level ORDER BY s.rn) AS seas
  FROM seq s JOIN lvl l USING (key)
  WHERE s.rn <= 7 GROUP BY s.key, l.level
  HAVING count(*) = 7
),
h AS (
  SELECT * FROM base
  UNION ALL
  SELECT s.key, s.rn, s.cents, nl.v AS level, nt.v AS trend,
         ns.v AS seasonal,
         (h.level + h.trend + h.seas[1])::BIGINT AS forecast,
         list_append(h.seas[2:], ns.v) AS seas
  FROM h
  JOIN seq s ON s.key = h.key AND s.rn = h.rn + 1
  CROSS JOIN LATERAL (
    SELECT ({_fdiv("1 * (s.cents - h.seas[1]) + 3 * (h.level + h.trend)", 4)})::BIGINT AS v
  ) nl
  CROSS JOIN LATERAL (
    SELECT ({_fdiv("1 * (nl.v - h.level) + 3 * h.trend", 4)})::BIGINT AS v
  ) nt
  CROSS JOIN LATERAL (
    SELECT ({_fdiv("1 * (s.cents - nl.v) + 3 * h.seas[1]", 4)})::BIGINT AS v
  ) ns
)
SELECT key AS event_type, rn::BIGINT AS rn, cents::BIGINT AS cents,
       level::BIGINT AS level, trend::BIGINT AS trend,
       seasonal::BIGINT AS seasonal, forecast::BIGINT AS forecast
FROM h WHERE rn >= 8
"""




def q_events_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains / lift / calibration table: users ranked by total
    spend (score desc, user_id asc — a TOTAL order, so the decile
    assignment d = (10*(rn-1)) div n is pure arithmetic and portable,
    no engine-specific ntile tie rules), then per decile the conversion
    rate, the cumulative share of all converters captured (gains), and
    lift vs the global rate — all exact integer ppm. The
    campaign-targeting readout that pairs with events_auc: AUC says the
    ranking works, this says WHERE it works. Plan: one per-user agg,
    one total-order sort, windows share it, one 10-row agg."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    w = Window.orderBy(F.desc("score"), "user_id")
    ranked = per_user.select(
        "label",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("label").over(Window.partitionBy()).alias("pos_total"),
    ).select(
        "label",
        "pos_total",
        F.expr("cast((10 * (rn - 1)) div n as bigint)").alias("decile"),
    )
    per_dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("label").cast("long").alias("n_pos"),
        F.max("pos_total").cast("long").alias("pos_total"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_dec.withColumn("cum_pos", F.sum("n_pos").over(wc))
        .select(
            "decile",
            "n_users",
            "n_pos",
            F.expr(
                "cast((n_pos * 1000000) div greatest(n_users, 1) as bigint)"
            ).alias("conv_ppm"),
            F.expr(
                "cast((cum_pos * 1000000) div greatest(pos_total, 1)"
                " as bigint)"
            ).alias("cum_capture_ppm"),
        )
        .orderBy("decile")
    )


SQL_EVENTS_GAINS = """
WITH per_user AS (
  SELECT user_id, sum(floor(value * 100)::BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1
),
ranked AS (
  SELECT label,
         sum(label) OVER () AS pos_total,
         (10 * (row_number() OVER (ORDER BY score DESC, user_id) - 1))
           // count(*) OVER () AS decile
  FROM per_user
),
per_dec AS (
  SELECT decile, count(*)::BIGINT AS n_users, sum(label)::BIGINT AS n_pos,
         max(pos_total)::BIGINT AS pos_total
  FROM ranked GROUP BY 1
)
SELECT decile, n_users, n_pos,
       ((n_pos * 1000000) // greatest(n_users, 1))::BIGINT AS conv_ppm,
       ((sum(n_pos) OVER (ORDER BY decile) * 1000000)
        // greatest(pos_total, 1))::BIGINT AS cum_capture_ppm
FROM per_dec ORDER BY decile
"""


def q_events_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative net value (cents),
    ordered by (ts, event_id): max over t of (running_peak_t -
    cumsum_t) — the worst peak-to-trough dip, exact in integer cents.
    The finance/risk window pattern: cumulative sum, running max over
    it, max of the gap, all sharing ONE (user_id, ts, event_id) sort;
    reports the top 20 worst-drawdown users for the monitor view."""
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .over(wo)
        .alias("cum"),
    ).withColumn(
        "peak",
        F.max("cum").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        cum.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("cum"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.max("peak").cast("long").alias("peak_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(F.desc("max_drawdown_cents"), "user_id")
        .limit(20)
    )


SQL_EVENTS_DRAWDOWN = """
WITH cum AS (
  SELECT user_id, ts, event_id,
         sum(floor(value * 100)::BIGINT)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum
  FROM events
),
p AS (
  SELECT user_id, cum,
         max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS peak
  FROM cum
)
SELECT user_id, max(peak - cum)::BIGINT AS max_drawdown_cents,
       max(peak)::BIGINT AS peak_cents, count(*)::BIGINT AS n_events
FROM p GROUP BY 1
ORDER BY max_drawdown_cents DESC, user_id LIMIT 20
"""




def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: for every
    brand pair co-occurring in an order, exact integer-ppm support,
    both directional confidences, and lift — the classic
    frequent-itemset readout, done set-exactly (distinct brand per
    order first, so multi-line orders don't inflate counts). Plan: one
    lineitem scan with the 25-brand part dim broadcast, distinct
    (order, brand), a self equi-join on orderkey (bounded: <=C(25,2)
    output groups), per-brand counts broadcast back onto the 300-row
    pair table. decimal(38,0) on the lift cross product."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        # three consumers (both join sides + per-brand counts) — scan once
        .localCheckpoint(eager=False)
    )
    n1 = ob.agg(F.countDistinct("o").alias("n_orders"))
    counts = ob.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    a = ob.select(F.col("o"), F.col("b").alias("brand_a"))
    b = ob.select(F.col("o"), F.col("b").alias("brand_b"))
    pairs = (
        a.join(b, "o")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
    )
    ca = counts.select(
        F.col("b").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    cb = counts.select(
        F.col("b").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n1))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.expr(
                "cast((pair_cnt * 1000000) div n_orders as bigint)"
            ).alias("support_ppm"),
            F.expr("cast((pair_cnt * 1000000) div cnt_a as bigint)").alias(
                "conf_a_to_b_ppm"
            ),
            F.expr("cast((pair_cnt * 1000000) div cnt_b as bigint)").alias(
                "conf_b_to_a_ppm"
            ),
            F.expr(
                "cast((cast(pair_cnt as decimal(38,0)) * n_orders * 1000000)"
                " div (cast(cnt_a as decimal(38,0)) * cnt_b) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy("brand_a", "brand_b")
    )


SQL_BASKET_RULES = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT count(DISTINCT o) AS n_orders FROM ob),
counts AS (SELECT b, count(*) AS cnt FROM ob GROUP BY 1),
pairs AS (
  SELECT x.b AS brand_a, y.b AS brand_b, count(*)::BIGINT AS pair_cnt
  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, pair_cnt,
       ((pair_cnt * 1000000) // n_orders)::BIGINT AS support_ppm,
       ((pair_cnt * 1000000) // ca.cnt)::BIGINT AS conf_a_to_b_ppm,
       ((pair_cnt * 1000000) // cb.cnt)::BIGINT AS conf_b_to_a_ppm,
       ((pair_cnt::HUGEINT * n_orders * 1000000)
        // (ca.cnt::HUGEINT * cb.cnt))::BIGINT AS lift_ppm
FROM pairs
JOIN counts ca ON ca.b = brand_a
JOIN counts cb ON cb.b = brand_b
CROSS JOIN n
ORDER BY brand_a, brand_b
"""




def q_events_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals for the Holt forecaster:
    one-step-ahead residuals are split deterministically (odd event_id
    -> calibration, even -> test), the calibration set yields exact
    rank-selected p10/p90 residual bounds (events_quantiles contract:
    rank = greatest(1, (q*n) div 100)), and empirical coverage of the
    TEST residuals inside [q10, q90] is reported in exact ppm — the
    distribution-free interval-calibration readout (split conformal:
    held-out quantiles, honest coverage). Plan: the Holt Arrow pass +
    ts join (events_backtest shape), one lag window, one rank sort
    over the calibration half, a final conditional agg; the quantile
    bounds ride a window over the sorted calibration rows (no
    join-back)."""
    from pyjelly_spark.operators.timeseries import holt_int

    ev = _t(spark, sf_dir, "events")
    h = holt_int(ev).join(ev.select("event_id", "ts"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    resid = (
        h.select(
            "event_id",
            (
                F.col("cents")
                - F.lag(F.col("level") + F.col("trend")).over(w)
            ).alias("r"),
        )
        .where(F.col("r").isNotNull())
        .withColumn("is_cal", (F.col("event_id") % 2 == 1).cast("int"))
        # both halves (calibration bounds + test coverage) consume this
        # table; checkpoint so the Holt Arrow pass runs once, not twice
        .localCheckpoint(eager=False)
    )
    wc = Window.orderBy("r")
    cal = (
        resid.where(F.col("is_cal") == 1)
        .withColumn("rnk", F.row_number().over(wc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    bounds = cal.select(
        F.max(
            F.when(
                F.col("rnk")
                == F.greatest(F.lit(1), F.expr("(10 * n) div 100")),
                F.col("r"),
            )
        ).alias("q10"),
        F.max(
            F.when(
                F.col("rnk")
                == F.greatest(F.lit(1), F.expr("(90 * n) div 100")),
                F.col("r"),
            )
        ).alias("q90"),
        F.max("n").alias("n_cal"),
    ).agg(
        F.max("q10").cast("long").alias("q10_cents"),
        F.max("q90").cast("long").alias("q90_cents"),
        F.max("n_cal").cast("long").alias("n_cal"),
    )
    test = resid.where(F.col("is_cal") == 0)
    return (
        test.crossJoin(F.broadcast(bounds))
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("q10_cents").alias("q10_cents"),
            F.max("q90_cents").alias("q90_cents"),
            F.sum(
                F.when(
                    (F.col("r") >= F.col("q10_cents"))
                    & (F.col("r") <= F.col("q90_cents")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
        .select(
            "n_cal",
            "n_test",
            "q10_cents",
            "q90_cents",
            "n_covered",
            F.expr(
                "cast((n_covered * 1000000) div greatest(n_test, 1)"
                " as bigint)"
            ).alias("coverage_ppm"),
        )
    )


SQL_EVENTS_CONFORMAL = SQL_EVENTS_HOLT.replace(
    "SELECT user_id, event_id, cents, level, trend FROM h",
    """, resid AS (
  SELECT event_id,
         cents - lag(level + trend) OVER (PARTITION BY user_id ORDER BY rn)
           AS r
  FROM h
),
r2 AS (SELECT event_id, r, (event_id % 2 = 1) AS is_cal
       FROM resid WHERE r IS NOT NULL),
cal AS (
  SELECT r, row_number() OVER (ORDER BY r) AS rnk, count(*) OVER () AS n
  FROM r2 WHERE is_cal
),
bounds AS (
  SELECT max(CASE WHEN rnk = greatest(1, (10 * n) // 100) THEN r END)::BIGINT
           AS q10_cents,
         max(CASE WHEN rnk = greatest(1, (90 * n) // 100) THEN r END)::BIGINT
           AS q90_cents,
         max(n)::BIGINT AS n_cal
  FROM cal
)
SELECT max(n_cal) AS n_cal, count(*)::BIGINT AS n_test,
       max(q10_cents) AS q10_cents, max(q90_cents) AS q90_cents,
       sum(CASE WHEN r >= q10_cents AND r <= q90_cents THEN 1 ELSE 0
           END)::BIGINT AS n_covered,
       ((sum(CASE WHEN r >= q10_cents AND r <= q90_cents THEN 1 ELSE 0 END)
         * 1000000) // greatest(count(*), 1))::BIGINT AS coverage_ppm
FROM r2 CROSS JOIN bounds WHERE NOT is_cal""",
)


def q_doc_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training table over the documents corpus:
    per-language class priors and Laplace-smoothed class-conditional
    term probabilities, both in exact integer ppm (no logs, so every
    value is engine-portable bit-for-bit); top-10 terms per language by
    (count desc, term asc). Plan: one explode + one (lang, term) hash
    aggregate carries the corpus; language totals / vocabulary size /
    priors are tiny aggregates broadcast back onto it — no per-language
    window over the full token stream (a 3-language partitionBy would
    serialize the corpus through 3 reducers at scale)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(T.words(T.normalized(F.col("text")))).alias("term")
    ).where(F.col("term") != "")
    # counts feeds lang totals, the vocab scalar AND the ranked join —
    # checkpoint so the corpus explode+aggregate runs once, not three times
    counts = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=False)
    lang_tot = counts.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("lang_total")
    )
    vocab = counts.agg(
        F.count_distinct("term").cast("long").alias("vocab")
    )
    priors = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(
            F.broadcast(
                docs.agg(F.count(F.lit(1)).cast("long").alias("total_docs"))
            )
        )
        .select(
            "lang",
            F.expr("(n_docs * 1000000) div total_docs").alias("prior_ppm"),
        )
    )
    wl = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(priors), "lang")
        .withColumn("rank", F.row_number().over(wl).cast("long"))
        .where(F.col("rank") <= 10)
        .select(
            "lang",
            "term",
            "cnt",
            "rank",
            F.expr("((cnt + 1) * 1000000) div (lang_total + vocab)").alias(
                "cond_ppm"
            ),
            "prior_ppm",
        )
        .orderBy("lang", "rank")
    )


SQL_DOC_NB = f"""
WITH toks AS (
  SELECT lang, unnest(string_split({NORM_SQL}, ' ')) AS term FROM documents
),
counts AS (
  SELECT lang, term, count(*)::BIGINT AS cnt
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
lt AS (SELECT lang, sum(cnt)::BIGINT AS lang_total FROM counts GROUP BY 1),
v AS (SELECT count(DISTINCT term)::BIGINT AS vocab FROM counts),
pri AS (
  SELECT lang,
         (count(*) * 1000000 //
          (SELECT count(*) FROM documents))::BIGINT AS prior_ppm
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT c.lang, c.term, c.cnt,
         row_number() OVER (
           PARTITION BY c.lang ORDER BY c.cnt DESC, c.term ASC
         )::BIGINT AS rank,
         (((c.cnt + 1) * 1000000) // (lt.lang_total + v.vocab))::BIGINT
           AS cond_ppm,
         pri.prior_ppm
  FROM counts c
  JOIN lt USING (lang) CROSS JOIN v JOIN pri USING (lang)
)
SELECT lang, term, cnt, rank, cond_ppm, prior_ppm
FROM ranked WHERE rank <= 10 ORDER BY lang, rank
"""


def q_events_seqpat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (PrefixSpan-style 2-sequences): for
    every ordered pair of event types (a, b), the number of users with
    some a-event strictly preceding some b-event in their stream, plus
    user-base support in exact ppm. Precedence is decided on the total
    order (ts, event_id) via per-user row numbers — "exists a before b"
    iff min_rank(a) < max_rank(b), so one window sort plus one
    (user, type) aggregate replace any pairwise event join; the
    per-user type-summary self-join is bounded by 5x5 type pairs."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    # the per-user type summary is both join sides and the user-count
    # source — checkpoint so the window pass runs once
    s = r.groupBy("user_id", "event_type").agg(
        F.min("rn").alias("mn"), F.max("rn").alias("mx")
    ).localCheckpoint(eager=False)
    total = s.agg(
        F.count_distinct("user_id").cast("long").alias("total_users")
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, "user_id")
        .where(
            (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.mn") < F.col("b.mx"))
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_users",
            F.expr("(n_users * 1000000) div total_users").alias(
                "support_ppm"
            ),
        )
        .orderBy("type_a", "type_b")
    )


SQL_EVENTS_SEQPAT = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn
  FROM events
),
s AS (
  SELECT user_id, event_type, min(rn) AS mn, max(rn) AS mx
  FROM r GROUP BY 1, 2
),
tot AS (SELECT count(DISTINCT user_id)::BIGINT AS total_users FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_users,
       (count(*) * 1000000 // max(tot.total_users))::BIGINT AS support_ppm
FROM s a JOIN s b ON a.user_id = b.user_id
 AND a.event_type <> b.event_type AND a.mn < b.mx
CROSS JOIN tot
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity privacy audit over the release
    quasi-identifier (event_type, hour-of-day): per QI group the row
    count (k), the number of distinct users (l — the sensitive
    attribute's diversity), and a risk flag for groups below k=20.
    Complements pii_scrub: scrubbing removes direct identifiers, this
    measures re-identification risk of what remains. One hash aggregate
    over a bounded 5x24 group space — partial aggregation collapses the
    corpus map-side, so the shuffle carries ~120 rows per mapper
    regardless of input scale."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.hour("ts").cast("long").alias("hh")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct("user_id").cast("long").alias("l_div"),
        )
        .select(
            "event_type",
            "hh",
            "n_rows",
            "l_div",
            (F.col("n_rows") < 20).cast("long").alias("risky"),
        )
        .orderBy("event_type", "hh")
    )


SQL_EVENTS_KANON = """
SELECT event_type, hour(ts)::BIGINT AS hh, count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS l_div,
       (count(*) < 20)::BIGINT AS risky
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""



def q_orders_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly recurring-revenue waterfall over orders: per calendar
    month, starting MRR, new / reactivation / expansion / contraction /
    churn components and ending MRR, all in exact integer cents (the
    identity ending = starting + new + react + expand - contract -
    churn holds exactly). Month-over-month movement is a full outer
    join of (customer, month) revenue with itself shifted one month —
    no per-customer dense calendar is materialized, so the shuffle
    carries only active (customer, month) rows; the final rollup is a
    bounded ~80-month aggregate."""
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_custkey", "m")
        .agg(F.sum("c").alias("rev"))
        # rev is consumed three times (current, shifted, first-month);
        # checkpoint so the orders aggregate runs once
        .localCheckpoint(eager=False)
    )
    fm = rev.groupBy("o_custkey").agg(F.min("m").alias("fm"))
    cur = rev.select("o_custkey", "m", "rev")
    prv = rev.select(
        "o_custkey", (F.col("m") + 1).alias("m"), F.col("rev").alias("prev")
    )
    moved = (
        cur.join(prv, ["o_custkey", "m"], "full_outer")
        .na.fill({"rev": 0, "prev": 0})
        .join(fm, "o_custkey")
    )
    z = F.lit(0)
    return (
        moved.groupBy("m")
        .agg(
            F.sum("prev").cast("long").alias("starting_cents"),
            F.sum(
                F.when(
                    (F.col("rev") > 0)
                    & (F.col("prev") == 0)
                    & (F.col("m") == F.col("fm")),
                    F.col("rev"),
                ).otherwise(z)
            ).cast("long").alias("new_cents"),
            F.sum(
                F.when(
                    (F.col("rev") > 0)
                    & (F.col("prev") == 0)
                    & (F.col("m") > F.col("fm")),
                    F.col("rev"),
                ).otherwise(z)
            ).cast("long").alias("react_cents"),
            F.sum(
                F.when(
                    (F.col("rev") > F.col("prev")) & (F.col("prev") > 0),
                    F.col("rev") - F.col("prev"),
                ).otherwise(z)
            ).cast("long").alias("expand_cents"),
            F.sum(
                F.when(
                    (F.col("rev") < F.col("prev")) & (F.col("rev") > 0),
                    F.col("prev") - F.col("rev"),
                ).otherwise(z)
            ).cast("long").alias("contract_cents"),
            F.sum(
                F.when(
                    (F.col("prev") > 0) & (F.col("rev") == 0), F.col("prev")
                ).otherwise(z)
            ).cast("long").alias("churn_cents"),
            F.sum("rev").cast("long").alias("ending_cents"),
        )
        .orderBy("m")
    )


SQL_ORDERS_MRR = """
WITH rev AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS m,
         sum(floor(o_totalprice * 100)::BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
fm AS (SELECT o_custkey, min(m) AS fm FROM rev GROUP BY 1),
moved AS (
  SELECT coalesce(c.o_custkey, p.o_custkey) AS o_custkey,
         coalesce(c.m, p.m + 1) AS m,
         coalesce(c.rev, 0) AS rev, coalesce(p.rev, 0) AS prev
  FROM rev c FULL OUTER JOIN rev p
    ON c.o_custkey = p.o_custkey AND c.m = p.m + 1
)
SELECT mv.m,
       sum(prev)::BIGINT AS starting_cents,
       sum(CASE WHEN rev > 0 AND prev = 0 AND mv.m = fm.fm
                THEN rev ELSE 0 END)::BIGINT AS new_cents,
       sum(CASE WHEN rev > 0 AND prev = 0 AND mv.m > fm.fm
                THEN rev ELSE 0 END)::BIGINT AS react_cents,
       sum(CASE WHEN rev > prev AND prev > 0
                THEN rev - prev ELSE 0 END)::BIGINT AS expand_cents,
       sum(CASE WHEN rev < prev AND rev > 0
                THEN prev - rev ELSE 0 END)::BIGINT AS contract_cents,
       sum(CASE WHEN prev > 0 AND rev = 0
                THEN prev ELSE 0 END)::BIGINT AS churn_cents,
       sum(rev)::BIGINT AS ending_cents
FROM moved mv JOIN fm USING (o_custkey)
GROUP BY 1 ORDER BY 1
"""


def q_events_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect readout (causal-inference
    featurizer): treatment = user ever clicked, outcome = total
    purchase cents, strata = activity buckets (n_events div 20, capped
    at 4). Per stratum: treated/control counts, floor-exact mean
    outcomes in ppm-cents, and their difference — the covariate-
    adjusted uplift table an experimentation pipeline feeds from. One
    per-user aggregate then a 5-row stratum rollup; the zero-arm guard
    (greatest(n,1)) keeps sparse strata well-defined."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max((F.col("event_type") == "click").cast("int")).alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("y"),
    )
    return (
        users.withColumn(
            "stratum",
            F.least(F.expr("n_events div 20"), F.lit(4)).cast("long"),
        )
        .groupBy("stratum")
        .agg(
            F.sum(F.expr("treated")).cast("long").alias("n_t"),
            F.sum(F.expr("1 - treated")).cast("long").alias("n_c"),
            F.sum(F.expr("CASE WHEN treated = 1 THEN y ELSE 0 END"))
            .cast("long")
            .alias("sum_t"),
            F.sum(F.expr("CASE WHEN treated = 0 THEN y ELSE 0 END"))
            .cast("long")
            .alias("sum_c"),
        )
        .select(
            "stratum",
            "n_t",
            "n_c",
            F.expr("(sum_t * 1000000) div greatest(n_t, 1)").alias(
                "mean_t_ppm"
            ),
            F.expr("(sum_c * 1000000) div greatest(n_c, 1)").alias(
                "mean_c_ppm"
            ),
            F.expr(
                "(sum_t * 1000000) div greatest(n_t, 1)"
                " - (sum_c * 1000000) div greatest(n_c, 1)"
            ).alias("ate_ppm"),
        )
        .orderBy("stratum")
    )


SQL_EVENTS_ATE = """
WITH users AS (
  SELECT user_id, count(*) AS n_events,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS treated,
         sum(CASE WHEN event_type = 'purchase'
                  THEN floor(value * 100)::BIGINT ELSE 0 END) AS y
  FROM events GROUP BY 1
),
s AS (
  SELECT least(n_events // 20, 4)::BIGINT AS stratum, treated, y FROM users
)
SELECT stratum,
       sum(treated)::BIGINT AS n_t,
       sum(1 - treated)::BIGINT AS n_c,
       ((sum(CASE WHEN treated = 1 THEN y ELSE 0 END) * 1000000)
        // greatest(sum(treated), 1))::BIGINT AS mean_t_ppm,
       ((sum(CASE WHEN treated = 0 THEN y ELSE 0 END) * 1000000)
        // greatest(sum(1 - treated), 1))::BIGINT AS mean_c_ppm,
       ((sum(CASE WHEN treated = 1 THEN y ELSE 0 END) * 1000000)
        // greatest(sum(treated), 1)
        - (sum(CASE WHEN treated = 0 THEN y ELSE 0 END) * 1000000)
        // greatest(sum(1 - treated), 1))::BIGINT AS ate_ppm
FROM s GROUP BY 1 ORDER BY 1
"""


def q_kg_comention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-mention association graph (KG enrichment): for every
    unordered pair of called symbols that appear together in >= 2
    files, the co-mention count, each symbol's file frequency, and
    integer lift in ppm ((co * n_files * 1e6) div (cnt_a * cnt_b)) —
    the statistical-association edge layer a KG builder adds on top of
    syntactic call edges. The pair generation is an equi-join on the
    file key, bounded by <= 5 call mentions per file (<= 10 pairs), so
    candidate volume is linear in files — never all-pairs across the
    corpus; frequency tables join back by symbol hash. Numerator fits
    a long up to ~10^10 files at ppm scale (cast wider beyond)."""
    calls, _ = _mention_frames(spark, sf_dir)
    # the distinct mention table is n_files, freq and both pair-join
    # sides — checkpoint so the extraction regex runs once
    m = calls.select("path", "symbol").distinct().localCheckpoint(
        eager=False
    )
    n_files = m.agg(
        F.count_distinct("path").cast("long").alias("n_files")
    )
    freq = m.groupBy("symbol").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = (
        a.join(b, "path")
        .where(F.col("a.symbol") < F.col("b.symbol"))
        .groupBy(
            F.col("a.symbol").alias("sym_a"),
            F.col("b.symbol").alias("sym_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("co_cnt"))
        .where(F.col("co_cnt") >= 2)
    )
    return (
        pairs.join(freq.withColumnRenamed("symbol", "sym_a"), "sym_a")
        .withColumnRenamed("cnt", "cnt_a")
        .join(freq.withColumnRenamed("symbol", "sym_b"), "sym_b")
        .withColumnRenamed("cnt", "cnt_b")
        .crossJoin(F.broadcast(n_files))
        .select(
            "sym_a",
            "sym_b",
            "co_cnt",
            "cnt_a",
            "cnt_b",
            F.expr(
                "(co_cnt * n_files * 1000000) div (cnt_a * cnt_b)"
            ).alias("lift_ppm"),
        )
        .orderBy("sym_a", "sym_b")
    )


SQL_KG_COMENTION = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
m AS (SELECT DISTINCT path, symbol FROM calls_gt),
nf AS (SELECT count(DISTINCT path)::BIGINT AS n_files FROM m),
freq AS (SELECT symbol, count(*)::BIGINT AS cnt FROM m GROUP BY 1),
pairs AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, count(*)::BIGINT AS co_cnt
  FROM m a JOIN m b ON a.path = b.path AND a.symbol < b.symbol
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT p.sym_a, p.sym_b, p.co_cnt, fa.cnt AS cnt_a, fb.cnt AS cnt_b,
       ((p.co_cnt * nf.n_files * 1000000) // (fa.cnt * fb.cnt))::BIGINT
         AS lift_ppm
FROM pairs p
JOIN freq fa ON fa.symbol = p.sym_a
JOIN freq fb ON fb.symbol = p.sym_b
CROSS JOIN nf
ORDER BY p.sym_a, p.sym_b
"""


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-evaluation harness for the dedup family: pairwise
    precision/recall of SimHash-identical signature clusters against
    the exact gold standard (identical normalized text), in exact ppm.
    TP/system/gold pair counts are sums of C(c,2) over cluster (and
    cluster-intersection) cells — three bounded aggregates over the
    per-doc (signature, gold) table, no pair materialization anywhere.
    The signature pass is the proven single-pass 62-bit SimHash
    (operators/dedup.py:simhash_signatures)."""
    docs = _t(spark, sf_dir, "documents")
    sig = D.simhash_signatures(docs)
    gold = docs.select(
        "doc_id", T.hex_hash(T.normalized(F.col("text"))).alias("g")
    )
    cell = (
        sig.join(gold, "doc_id")
        .groupBy("simhash", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        # feeds the TP sum AND both marginal rollups — one pass
        .localCheckpoint(eager=False)
    )
    tp = cell.agg(
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("tp_pairs"),
        F.sum("c").cast("long").alias("n_docs"),
    )
    sys_p = (
        cell.groupBy("simhash")
        .agg(F.sum("c").alias("sc"))
        .agg(
            F.sum(F.expr("sc * (sc - 1) div 2"))
            .cast("long")
            .alias("sys_pairs")
        )
    )
    gold_p = (
        cell.groupBy("g")
        .agg(F.sum("c").alias("gc"))
        .agg(
            F.sum(F.expr("gc * (gc - 1) div 2"))
            .cast("long")
            .alias("gold_pairs")
        )
    )
    return (
        tp.crossJoin(F.broadcast(sys_p))
        .crossJoin(F.broadcast(gold_p))
        .select(
            "n_docs",
            "gold_pairs",
            "sys_pairs",
            "tp_pairs",
            F.expr(
                "(tp_pairs * 1000000) div greatest(sys_pairs, 1)"
            ).alias("precision_ppm"),
            F.expr(
                "(tp_pairs * 1000000) div greatest(gold_pairs, 1)"
            ).alias("recall_ppm"),
        )
    )


SQL_DEDUP_EVAL = f"""
WITH wd AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS word
  FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substring(sha256(word), 1, 15))::BIGINT AS h
  FROM wd WHERE word <> ''
),
bits AS (
  SELECT doc_id, t.i AS i,
         sum(CASE WHEN (h >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, range(0, 62) t(i)
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)
           AS simhash
  FROM bits GROUP BY 1
),
gold AS (
  SELECT doc_id,
         ('0x' || substring(sha256({NORM_SQL}), 1, 15))::BIGINT AS g
  FROM documents
),
cell AS (
  SELECT sig.simhash, gold.g, count(*)::BIGINT AS c
  FROM sig JOIN gold USING (doc_id) GROUP BY 1, 2
),
tp AS (
  SELECT sum(c * (c - 1) // 2)::BIGINT AS tp_pairs,
         sum(c)::BIGINT AS n_docs FROM cell
),
sysp AS (
  SELECT sum(sc * (sc - 1) // 2)::BIGINT AS sys_pairs
  FROM (SELECT sum(c) AS sc FROM cell GROUP BY simhash)
),
goldp AS (
  SELECT sum(gc * (gc - 1) // 2)::BIGINT AS gold_pairs
  FROM (SELECT sum(c) AS gc FROM cell GROUP BY g)
)
SELECT n_docs, gold_pairs, sys_pairs, tp_pairs,
       ((tp_pairs * 1000000) // greatest(sys_pairs, 1))::BIGINT
         AS precision_ppm,
       ((tp_pairs * 1000000) // greatest(gold_pairs, 1))::BIGINT
         AS recall_ppm
FROM tp CROSS JOIN sysp CROSS JOIN goldp
"""


def q_kg_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking quality for the SymSpell fuzzy
    linker: candidate-pair count out of the deletion-variant equi-join,
    true pair count (Levenshtein <= 1), pairs-found, reduction ratio
    (1 - candidates / all-pairs) and pair completeness, both in exact
    ppm — the standard ER blocking scorecard (reduction ratio should
    approach 1e6 while completeness stays at 1e6: SymSpell's blocking
    is provably lossless at distance 1). The all-pairs denominator is
    closed-form n*(n-1)/2; nothing quadratic is ever materialized —
    candidates come from the same bounded variant join the linker
    uses."""
    from pyjelly_spark.operators.linking import _deletion_variants

    defs = _spo(X.extract_defs(derived_source_files(spark, sf_dir)))
    t = (
        defs.select(
            F.regexp_extract("o", r"symbol/(.*)$", 1).alias("term")
        )
        .where(F.col("term").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    variants = t.select(
        "term", F.explode(_deletion_variants(F.col("term"))).alias("v")
    )
    a = variants.select(F.col("term").alias("term_a"), "v")
    b = variants.select(F.col("term").alias("term_b"), "v")
    cand = (
        a.join(b, "v")
        .where(F.col("term_a") < F.col("term_b"))
        .select("term_a", "term_b")
        .distinct()
        # consumed by the candidate count and the found-true count
        .localCheckpoint(eager=False)
    )
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
    counts = cand.agg(
        F.count(F.lit(1)).cast("long").alias("cand_pairs"),
        F.sum(
            (F.levenshtein("term_a", "term_b") <= 1).cast("long")
        ).alias("found_pairs"),
    )
    return (
        n.crossJoin(F.broadcast(counts))
        .select(
            "n_terms",
            F.expr("(n_terms * (n_terms - 1)) div 2").alias("all_pairs"),
            "cand_pairs",
            # distance-1 blocking is lossless, so every true pair is a
            # candidate: true == found (asserted, not assumed, by the
            # oracle's cross-join recount)
            F.col("found_pairs").alias("true_pairs"),
            "found_pairs",
            F.expr(
                "1000000 - (cand_pairs * 1000000)"
                " div greatest((n_terms * (n_terms - 1)) div 2, 1)"
            ).alias("reduction_ppm"),
            F.expr(
                "(found_pairs * 1000000) div greatest(found_pairs, 1)"
            ).alias("completeness_ppm"),
        )
    )


SQL_KG_BLOCKING_STATS = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
vocab AS (SELECT DISTINCT symbol AS term FROM defs_gt),
variants AS (
  -- range() in expression position returns a LIST, so the variable-
  -- length neighborhood works without a lateral table function
  SELECT DISTINCT term,
         unnest(list_transform(range(0, length(term) + 1),
           i -> CASE WHEN i = 0 THEN term
                ELSE substr(term, 1, i - 1) || substr(term, i + 1)
                END)) AS v
  FROM vocab
),
cand AS (
  SELECT DISTINCT a.term AS term_a, b.term AS term_b
  FROM variants a JOIN variants b ON a.v = b.v AND a.term < b.term
),
n AS (SELECT count(*)::BIGINT AS n_terms FROM vocab),
truth AS (
  SELECT count(*)::BIGINT AS true_pairs
  FROM vocab a JOIN vocab b
    ON a.term < b.term AND levenshtein(a.term, b.term) <= 1
),
cc AS (
  SELECT count(*)::BIGINT AS cand_pairs,
         sum(CASE WHEN levenshtein(term_a, term_b) <= 1
                  THEN 1 ELSE 0 END)::BIGINT AS found_pairs
  FROM cand
)
SELECT n_terms, ((n_terms * (n_terms - 1)) // 2)::BIGINT AS all_pairs,
       cand_pairs, true_pairs, found_pairs,
       (1000000 - (cand_pairs * 1000000)
        // greatest((n_terms * (n_terms - 1)) // 2, 1))::BIGINT
         AS reduction_ppm,
       ((found_pairs * 1000000) // greatest(true_pairs, 1))::BIGINT
         AS completeness_ppm
FROM n CROSS JOIN truth CROSS JOIN cc
"""


def q_events_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for user_id — the report that decides
    salting/AQE-skew-join settings before a big shuffle: key count,
    max/p50/p99 per-key row counts (rank-exact, events_quantiles rank
    contract) and the row share of the heaviest 1 and 10 keys in ppm.
    One per-key aggregate then order statistics over the (small)
    key-count distribution; the corpus never leaves the first
    map-side-combined groupBy."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_desc = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    w_asc = Window.orderBy(F.asc("cnt"), F.asc("user_id"))
    ranked = counts.select(
        "cnt",
        F.row_number().over(w_desc).alias("rd"),
        F.row_number().over(w_asc).alias("ra"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.max(
            F.when(
                F.col("ra")
                == F.greatest(F.lit(1), F.expr("(50 * n) div 100")),
                F.col("cnt"),
            )
        ).cast("long").alias("p50_cnt"),
        F.max(
            F.when(
                F.col("ra")
                == F.greatest(F.lit(1), F.expr("(99 * n) div 100")),
                F.col("cnt"),
            )
        ).cast("long").alias("p99_cnt"),
        F.expr(
            "cast(max(CASE WHEN rd = 1 THEN cnt * 1000000 div total"
            " END) as bigint)"
        ).alias("top1_share_ppm"),
        F.expr(
            "cast(sum(CASE WHEN rd <= 10 THEN cnt ELSE 0 END)"
            " * 1000000 div max(total) as bigint)"
        ).alias("top10_share_ppm"),
    )


SQL_EVENTS_SKEW = """
WITH counts AS (
  SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY 1
),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rd,
         row_number() OVER (ORDER BY cnt ASC, user_id ASC) AS ra,
         count(*) OVER () AS n,
         sum(cnt) OVER () AS total
  FROM counts
)
SELECT max(n)::BIGINT AS n_keys,
       max(total)::BIGINT AS total_rows,
       max(cnt)::BIGINT AS max_cnt,
       max(CASE WHEN ra = greatest(1, (50 * n) // 100)
                THEN cnt END)::BIGINT AS p50_cnt,
       max(CASE WHEN ra = greatest(1, (99 * n) // 100)
                THEN cnt END)::BIGINT AS p99_cnt,
       max(CASE WHEN rd = 1
                THEN cnt * 1000000 // total END)::BIGINT AS top1_share_ppm,
       (sum(CASE WHEN rd <= 10 THEN cnt ELSE 0 END) * 1000000
        // max(total))::BIGINT AS top10_share_ppm
FROM ranked
"""


def q_orders_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label generation for churn modeling: one training row
    per active (customer, month) with point-in-time-correct features —
    months since previous order (recency), trailing-3-month order count
    and revenue cents (RANGE frames over the month index, so calendar
    gaps are honored without a dense calendar) — and the binary label
    "no order in the next 2 months". The row count is active
    customer-months only; everything rides one (customer, month)
    aggregate plus per-customer windows — the label never looks past
    its window (no leakage)."""
    o = _t(spark, sf_dir, "orders")
    cm = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_custkey", "m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("c").alias("rev"),
        )
    )
    wo = Window.partitionBy("o_custkey").orderBy("m")
    back = wo.rangeBetween(-2, 0)
    fwd = wo.rangeBetween(1, 2)
    return (
        cm.select(
            "o_custkey",
            "m",
            (F.col("m") - F.coalesce(F.lag("m").over(wo), F.col("m")))
            .cast("long")
            .alias("recency"),
            F.sum("n_orders").over(back).cast("long").alias("freq3"),
            F.sum("rev").over(back).cast("long").alias("monetary3_cents"),
            F.when(F.count(F.lit(1)).over(fwd) == 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("churned"),
        )
        .orderBy("o_custkey", "m")
    )


SQL_ORDERS_CHURN_LABELS = """
WITH cm AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS m,
         count(*)::BIGINT AS n_orders,
         sum(floor(o_totalprice * 100)::BIGINT) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, m,
       (m - coalesce(lag(m) OVER w, m))::BIGINT AS recency,
       sum(n_orders) OVER (
         w RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
       )::BIGINT AS freq3,
       sum(rev) OVER (
         w RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
       )::BIGINT AS monetary3_cents,
       (CASE WHEN count(*) OVER (
          w RANGE BETWEEN 1 FOLLOWING AND 2 FOLLOWING
        ) = 0 THEN 1 ELSE 0 END)::BIGINT AS churned
FROM cm
WINDOW w AS (PARTITION BY o_custkey ORDER BY m)
ORDER BY o_custkey, m
"""


def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, tracked by age (months since cohort start) — per cell the
    active-customer count, period revenue, cumulative cohort revenue
    and average LTV per cohort member in exact ppm-cents. The cumsum
    runs inside each cohort (a per-cohort window over the sparse age
    axis — no global order anywhere); cohort sizes ride a broadcast
    join."""
    o = _t(spark, sf_dir, "orders")
    cm = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"),
        )
        .groupBy("o_custkey", "m")
        .agg(F.sum("c").alias("rev"))
        # consumed by the cohort assignment AND the cell rollup
        .localCheckpoint(eager=False)
    )
    cohorts = cm.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = cohorts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        cm.join(cohorts, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_custs"),
            F.sum("rev").cast("long").alias("rev_cents"),
        )
    )
    wc = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_m")
        .withColumn(
            "cum_rev_cents", F.sum("rev_cents").over(wc).cast("long")
        )
        .select(
            "cohort_m",
            "age",
            "active_custs",
            "cohort_size",
            "rev_cents",
            "cum_rev_cents",
            F.expr("(cum_rev_cents * 1000000) div cohort_size").alias(
                "ltv_ppm"
            ),
        )
        .orderBy("cohort_m", "age")
    )


SQL_ORDERS_COHORT_LTV = """
WITH cm AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT AS m,
         sum(floor(o_totalprice * 100)::BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
cohorts AS (SELECT o_custkey, min(m) AS cohort_m FROM cm GROUP BY 1),
sizes AS (
  SELECT cohort_m, count(*)::BIGINT AS cohort_size FROM cohorts GROUP BY 1
),
cells AS (
  SELECT c.cohort_m, (cm.m - c.cohort_m)::BIGINT AS age,
         count(*)::BIGINT AS active_custs,
         sum(cm.rev)::BIGINT AS rev_cents
  FROM cm JOIN cohorts c USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_m, age, active_custs, cohort_size, rev_cents,
       sum(rev_cents) OVER (
         PARTITION BY cohort_m ORDER BY age
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS cum_rev_cents,
       ((sum(rev_cents) OVER (
           PARTITION BY cohort_m ORDER BY age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) * 1000000) // cohort_size)::BIGINT AS ltv_ppm
FROM cells JOIN sizes USING (cohort_m)
ORDER BY cohort_m, age
"""


def q_events_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group order statistics: rank-exact p50/p95/p99 of event
    value cents per event type (rank = greatest(1, (q*n) div 100) over
    the (cents, event_id) total order — the events_quantiles contract,
    here per group), plus n/min/max. The sort is partitioned by the
    5-value group key, so each reducer orders only its type's rows;
    nothing global."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )

    def pick(q: int) -> Column:
        return F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr(f"({q} * n) div 100")),
                F.col("cents"),
            )
        ).cast("long")

    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.min("cents").cast("long").alias("min_cents"),
            pick(50).alias("p50_cents"),
            pick(95).alias("p95_cents"),
            pick(99).alias("p99_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_GROUP_QUANTILES = """
WITH base AS (
  SELECT event_type, event_id, floor(value * 100)::BIGINT AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id
         ) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base
)
SELECT event_type, max(n)::BIGINT AS n, min(cents)::BIGINT AS min_cents,
       max(CASE WHEN rn = greatest(1, (50 * n) // 100)
                THEN cents END)::BIGINT AS p50_cents,
       max(CASE WHEN rn = greatest(1, (95 * n) // 100)
                THEN cents END)::BIGINT AS p95_cents,
       max(CASE WHEN rn = greatest(1, (99 * n) // 100)
                THEN cents END)::BIGINT AS p99_cents,
       max(cents)::BIGINT AS max_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""


def q_doc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction / small-file bin-packing planner (lakehouse table
    maintenance): documents ordered by (n_chars desc, doc_id) are
    packed into ~32 KiB bins by prefix-sum partitioning; per bin the
    file count, payload bytes and fill ratio in ppm. The running sum is
    the DISTRIBUTED two-level prefix sum (per-size-band local cumsum +
    tiny band-carry broadcast, same shape as events_concurrency) — no
    single global-order window even though the packing order is
    global. A bin can overfill by at most one file (prefix-sum next-fit
    semantics), so fill_ppm may exceed 1e6 on boundary files."""
    cap = 32768
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    banded = docs.withColumn("band", F.expr("n_chars div 64"))
    wl = (
        Window.partitionBy("band")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = banded.withColumn("lcum", F.sum("n_chars").over(wl))
    btot = banded.groupBy("band").agg(F.sum("n_chars").alias("btot"))
    wb = (
        Window.orderBy(F.desc("band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = btot.select(
        "band",
        (F.sum("btot").over(wb) - F.col("btot")).alias("carry"),
    )
    return (
        local.join(F.broadcast(carry), "band")
        .withColumn(
            "bin",
            F.greatest(
                F.lit(0), F.expr(f"(carry + lcum - 1) div {cap}")
            ).cast("long"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("bytes"),
        )
        .withColumn(
            "fill_ppm", F.expr(f"(bytes * 1000000) div {cap}")
        )
        .orderBy("bin")
    )


SQL_DOC_COMPACTION = """
WITH ordered AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (
           ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents
),
binned AS (
  SELECT greatest(0, (cum - 1) // 32768)::BIGINT AS bin, n_chars
  FROM ordered
)
SELECT bin, count(*)::BIGINT AS n_files, sum(n_chars)::BIGINT AS bytes,
       ((sum(n_chars) * 1000000) // 32768)::BIGINT AS fill_ppm
FROM binned GROUP BY 1 ORDER BY 1
"""


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard gate: complete-mode unwindowed aggregation
    (running per-(type, user) counts as engine-managed state) drained
    with availableNow, then rank-exact top-3 users per type from the
    final emission — which must equal the batch groupBy + rank
    bit-for-bit (streaming/jobs.py::run_stream_topk_batchmode)."""
    from pyjelly_spark.streaming.jobs import run_stream_topk_batchmode

    return run_stream_topk_batchmode(
        spark, f"{sf_dir}/events.parquet"
    ).orderBy("event_type", "rnk")


SQL_STREAM_TOPK = """
WITH counts AS (
  SELECT event_type, user_id, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, user_id, cnt,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cnt DESC, user_id ASC
         )::BIGINT AS rnk
  FROM counts
)
SELECT event_type, user_id, cnt, rnk FROM ranked
WHERE rnk <= 3 ORDER BY event_type, rnk
"""


def q_events_convert_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel timing: seconds from a user's first view to their first
    strictly-later purchase — conversion rate plus rank-exact
    p50/p90/max of the conversion delay (events_quantiles rank
    contract over (delta, user_id)). One per-user conditional
    aggregate; the order statistics run over the (much smaller)
    converted-user table. Complements events_funnel (step counts) with
    the latency dimension."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    deltas = per_user.select(
        "user_id",
        F.expr(
            "CASE WHEN first_view IS NOT NULL AND first_purchase > "
            "first_view THEN timestampdiff(MICROSECOND, first_view, "
            "first_purchase) div 1000000 END"
        ).cast("long").alias("delta_s"),
    )
    # rank only the converted subset (avoids engine-specific NULL
    # ordering inside the rank window); totals ride a broadcast scalar
    deltas = deltas.localCheckpoint(eager=False)
    totals = deltas.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.count("delta_s").cast("long").alias("n_conv"),
    )
    w = Window.orderBy("delta_s", "user_id")
    ranked = (
        deltas.where(F.col("delta_s").isNotNull())
        .select("delta_s", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(totals))
    )

    def pick(q: int) -> Column:
        return F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr(f"({q} * n_conv) div 100")),
                F.col("delta_s"),
            )
        ).cast("long")

    return ranked.agg(
        F.max("n_users").cast("long").alias("n_users"),
        F.max("n_conv").cast("long").alias("n_converted"),
        F.expr(
            "cast(max(n_conv) * 1000000 div greatest(max(n_users), 1)"
            " as bigint)"
        ).alias("conversion_ppm"),
        pick(50).alias("p50_delta_s"),
        pick(90).alias("p90_delta_s"),
        F.max("delta_s").cast("long").alias("max_delta_s"),
    )


SQL_EVENTS_CONVERT_TIME = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           AS first_purchase
  FROM events GROUP BY 1
),
deltas AS (
  SELECT user_id,
         CASE WHEN first_view IS NOT NULL
                   AND first_purchase > first_view
              -- microsecond diff // 1e6: datediff('second') counts
              -- boundary crossings, not whole seconds elapsed
              THEN datediff('microsecond', first_view, first_purchase)
                   // 1000000
         END::BIGINT AS delta_s
  FROM per_user
),
tot AS (
  SELECT count(*)::BIGINT AS n_users, count(delta_s)::BIGINT AS n_conv
  FROM deltas
),
ranked AS (
  SELECT delta_s,
         row_number() OVER (ORDER BY delta_s, user_id) AS rn,
         tot.n_users, tot.n_conv
  FROM deltas CROSS JOIN tot WHERE delta_s IS NOT NULL
)
SELECT max(n_users)::BIGINT AS n_users,
       max(n_conv)::BIGINT AS n_converted,
       (max(n_conv) * 1000000 // greatest(max(n_users), 1))::BIGINT
         AS conversion_ppm,
       max(CASE WHEN rn = greatest(1, (50 * n_conv) // 100)
                THEN delta_s END)::BIGINT AS p50_delta_s,
       max(CASE WHEN rn = greatest(1, (90 * n_conv) // 100)
                THEN delta_s END)::BIGINT AS p90_delta_s,
       max(delta_s)::BIGINT AS max_delta_s
FROM ranked
"""


def q_events_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection per event type: minutes whose event count
    strictly exceeds twice the type's rank-exact median minute-count
    are burst minutes; consecutive burst minutes merge into runs via
    gaps-and-islands (minute_index - row_number, pure Catalyst — no
    sequential scan). Reports per type the burst-minute count, number
    of runs, longest run and the peak minute's count. The per-minute
    aggregate collapses the corpus map-side; the island window sorts
    only each type's burst minutes."""
    ev = _t(spark, sf_dir, "events")
    mc = (
        ev.select(
            "event_type",
            # minute index from a fixed NTZ epoch literal (portable:
            # no session-timezone dependence, same as events_concurrency)
            F.expr(
                "timestampdiff(MINUTE,"
                " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
            ).cast("long").alias("mi"),
        )
        .groupBy("event_type", "mi")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # consumed by the median rank pass and the burst filter
        .localCheckpoint(eager=False)
    )
    wr = Window.partitionBy("event_type").orderBy("cnt", "mi")
    med = (
        mc.select(
            "event_type",
            "cnt",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("n"),
        )
        .where(
            F.col("rn")
            == F.greatest(F.lit(1), F.expr("(50 * n) div 100"))
        )
        .select("event_type", F.col("cnt").alias("med_cnt"))
    )
    burst = mc.join(F.broadcast(med), "event_type").where(
        F.col("cnt") > 2 * F.col("med_cnt")
    )
    wi = Window.partitionBy("event_type").orderBy("mi")
    islands = burst.withColumn(
        "grp", F.col("mi") - F.row_number().over(wi)
    )
    runs = islands.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.max("cnt").alias("peak"),
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.sum("run_len").cast("long").alias("burst_minutes"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
            F.max("peak").cast("long").alias("peak_cnt"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_BURSTS = """
WITH mc AS (
  SELECT event_type,
         datediff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)::BIGINT
           AS mi,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, cnt AS med_cnt FROM (
    SELECT event_type, cnt,
           row_number() OVER (
             PARTITION BY event_type ORDER BY cnt, mi
           ) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM mc
  ) WHERE rn = greatest(1, (50 * n) // 100)
),
burst AS (
  SELECT mc.event_type, mc.mi, mc.cnt
  FROM mc JOIN med USING (event_type)
  WHERE mc.cnt > 2 * med.med_cnt
),
islands AS (
  SELECT event_type, cnt,
         mi - row_number() OVER (
           PARTITION BY event_type ORDER BY mi
         ) AS grp
  FROM burst
),
runs AS (
  SELECT event_type, grp, count(*)::BIGINT AS run_len,
         max(cnt) AS peak
  FROM islands GROUP BY 1, 2
)
SELECT event_type, sum(run_len)::BIGINT AS burst_minutes,
       count(*)::BIGINT AS n_runs, max(run_len)::BIGINT AS longest_run,
       max(peak)::BIGINT AS peak_cnt
FROM runs GROUP BY 1 ORDER BY 1
"""


def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profile of the events table: per column the
    row count, null count, exact distinct count and completeness in
    ppm — the data-quality summary a pipeline records next to every
    snapshot. One wide aggregate computes all 18 statistics in a
    single pass (map-side partial agg), then a 6-row stack unpivots
    them; no per-column scans."""
    ev = _t(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = ev.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in cols
    )
    return (
        wide.select(
            "n_rows",
            F.expr(
                f"stack({len(cols)}, {stack}) AS (col_name, n_nulls,"
                " n_distinct)"
            ),
        )
        .select(
            "col_name",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.expr(
                "(n_rows - n_nulls) * 1000000 div greatest(n_rows, 1)"
            ).alias("completeness_ppm"),
        )
        .orderBy("col_name")
    )


SQL_EVENTS_PROFILE = """
WITH wide AS (
  SELECT count(*)::BIGINT AS n_rows,
         sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_event_id,
         count(DISTINCT event_id)::BIGINT AS dist_event_id,
         sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_ts,
         count(DISTINCT ts)::BIGINT AS dist_ts,
         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_user_id,
         count(DISTINCT user_id)::BIGINT AS dist_user_id,
         sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_event_type,
         count(DISTINCT event_type)::BIGINT AS dist_event_type,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_value,
         count(DISTINCT value)::BIGINT AS dist_value,
         sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS null_props,
         count(DISTINCT props)::BIGINT AS dist_props
  FROM events
),
rows_out AS (
  SELECT 'event_id' AS col_name, n_rows, null_event_id AS n_nulls,
         dist_event_id AS n_distinct FROM wide
  UNION ALL SELECT 'ts', n_rows, null_ts, dist_ts FROM wide
  UNION ALL SELECT 'user_id', n_rows, null_user_id, dist_user_id FROM wide
  UNION ALL SELECT 'event_type', n_rows, null_event_type,
                   dist_event_type FROM wide
  UNION ALL SELECT 'value', n_rows, null_value, dist_value FROM wide
  UNION ALL SELECT 'props', n_rows, null_props, dist_props FROM wide
)
SELECT col_name, n_rows, n_nulls, n_distinct,
       ((n_rows - n_nulls) * 1000000 // greatest(n_rows, 1))::BIGINT
         AS completeness_ppm
FROM rows_out ORDER BY col_name
"""


def q_kg_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of the code KG: call mentions whose
    symbol has NO definition anywhere in the corpus (dangling edges a
    linker must quarantine), reported per repo with the dangling rate
    in exact ppm. One left-anti join of call mentions against the
    distinct defined-symbol dictionary (symbol-hash partitioned — at
    corpus scale AQE chooses broadcast only if the dictionary fits),
    then a 7-row repo rollup."""
    calls, defs = _mention_frames(spark, sf_dir)
    defined = defs.select("symbol").distinct()
    calls = calls.localCheckpoint(eager=False)
    dangling = (
        calls.join(defined, "symbol", "left_anti")
        .groupBy("repo")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dangling"))
    )
    totals = calls.groupBy("repo").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions")
    )
    return (
        totals.join(dangling, "repo", "left")
        .na.fill({"n_dangling": 0})
        .select(
            "repo",
            "n_mentions",
            F.col("n_dangling").cast("long").alias("n_dangling"),
            F.expr(
                "(n_dangling * 1000000) div greatest(n_mentions, 1)"
            ).alias("dangling_ppm"),
        )
        .orderBy("repo")
    )


SQL_KG_DANGLING = f"""
WITH {SRC_SQL}, {MENTIONS_SQL.strip()},
defined AS (SELECT DISTINCT symbol FROM defs_gt)
SELECT c.repo, count(*)::BIGINT AS n_mentions,
       sum(CASE WHEN d.symbol IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_dangling,
       ((sum(CASE WHEN d.symbol IS NULL THEN 1 ELSE 0 END) * 1000000)
        // greatest(count(*), 1))::BIGINT AS dangling_ppm
FROM calls_gt c LEFT JOIN defined d ON c.symbol = d.symbol
GROUP BY 1 ORDER BY 1
"""


def q_kg_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed cycle census of the import graph: self-loops, 2-cycles
    (mutual imports) and 3-cycles (a→b→c→a, canonicalized so the
    smallest module id leads — each cycle counted once) — the
    dependency-hygiene report a build system runs before topologically
    ordering a 10^12-file corpus. Cycle joins are edge-table self
    equi-joins bounded by out-degree ≤ 3 per module; nothing
    quadratic."""
    files = derived_source_files(spark, sf_dir).withColumn(
        "s", F.regexp_extract("path", r"/mod_(\d+)\.py$", 1).cast("long")
    )
    edges = (
        files.select(
            "s",
            F.explode(
                F.regexp_extract_all(
                    "content", F.lit(X.IMPORT_RE), F.lit(1)
                )
            ).alias("module"),
        )
        .withColumn(
            "t",
            F.regexp_extract("module", r"\.mod_(\d+)$", 1).cast("long"),
        )
        .select("s", "t")
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = edges.where(F.col("s") != F.col("t"))
    m = edges.agg(
        F.sum((F.col("s") != F.col("t")).cast("long"))
        .cast("long")
        .alias("n_edges"),
        F.sum((F.col("s") == F.col("t")).cast("long"))
        .cast("long")
        .alias("n_self"),
    )
    ab = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    ba = e.select(F.col("t").alias("a"), F.col("s").alias("b"))
    two = (
        ab.join(ba, ["a", "b"])
        .where(F.col("a") < F.col("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_2cycles"))
    )
    e1 = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = e.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = e.select(F.col("t").alias("a"), F.col("s").alias("c"))
    three = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_3cycles"))
    )
    return (
        m.crossJoin(F.broadcast(two))
        .crossJoin(F.broadcast(three))
        .select("n_edges", "n_self", "n_2cycles", "n_3cycles")
    )


SQL_KG_CYCLES = f"""
WITH {SRC_SQL},
edges AS (
  SELECT DISTINCT f.doc_id AS s, i.t AS t
  FROM files f JOIN (
    SELECT file_iri, unnest([
      ((doc_id*31 + 18) % n),
      CASE WHEN doc_id % 3 >= 1 THEN (doc_id*31 + 35) % n END,
      CASE WHEN doc_id % 3 >= 2 THEN (doc_id*31 + 52) % n END
    ]) AS t FROM files
  ) i ON i.file_iri = f.file_iri
  WHERE i.t IS NOT NULL
),
e AS (SELECT s, t FROM edges WHERE s <> t),
m AS (
  SELECT count(*)::BIGINT AS n_edges,
         (SELECT count(*) FROM edges WHERE s = t)::BIGINT AS n_self
  FROM e
),
two AS (
  SELECT count(*)::BIGINT AS n_2cycles
  FROM e x JOIN e y ON x.s = y.t AND x.t = y.s AND x.s < x.t
),
three AS (
  SELECT count(*)::BIGINT AS n_3cycles
  FROM e x JOIN e y ON y.s = x.t JOIN e z
    ON z.s = y.t AND z.t = x.s
  WHERE x.s < x.t AND x.s < y.t
)
SELECT n_edges, n_self, n_2cycles, n_3cycles
FROM m CROSS JOIN two CROSS JOIN three
"""


def q_events_segment_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-segment migration matrix: users banded by first-half
    spend (cents div 80000, capped at band 3) vs second-half spend
    (split at 2024-01-16), with row-share in exact ppm — the
    cohort-movement table behind churn/upsell dashboards. One per-user
    conditional aggregate, one ≤16-row matrix rollup; band thresholds
    are integer-exact."""
    ev = _t(spark, sf_dir, "events")
    split = "TIMESTAMP_NTZ '2024-01-16 00:00:00'"
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.expr(f"ts < {split}"),
                F.floor(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("m1"),
        F.sum(
            F.when(
                F.expr(f"ts >= {split}"),
                F.floor(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("m2"),
    )
    mat = (
        users.select(
            F.expr("least(m1 div 80000, 3)").alias("band_from"),
            F.expr("least(m2 div 80000, 3)").alias("band_to"),
        )
        .groupBy("band_from", "band_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    wrow = Window.partitionBy("band_from")
    return (
        mat.withColumn("row_total", F.sum("n_users").over(wrow))
        .select(
            F.col("band_from").cast("long").alias("band_from"),
            F.col("band_to").cast("long").alias("band_to"),
            "n_users",
            F.expr("(n_users * 1000000) div row_total").alias(
                "row_share_ppm"
            ),
        )
        .orderBy("band_from", "band_to")
    )


SQL_EVENTS_SEGMENT_SHIFT = """
WITH users AS (
  SELECT user_id,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN floor(value * 100)::BIGINT ELSE 0 END) AS m1,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                  THEN floor(value * 100)::BIGINT ELSE 0 END) AS m2
  FROM events GROUP BY 1
),
mat AS (
  SELECT least(m1 // 80000, 3)::BIGINT AS band_from,
         least(m2 // 80000, 3)::BIGINT AS band_to,
         count(*)::BIGINT AS n_users
  FROM users GROUP BY 1, 2
)
SELECT band_from, band_to, n_users,
       ((n_users * 1000000) //
        sum(n_users) OVER (PARTITION BY band_from))::BIGINT
         AS row_share_ppm
FROM mat ORDER BY band_from, band_to
"""


# ---------------------------------------------------------------------------
# Model-evaluation completions: exact PR curve + fixed-threshold sweep,
# and reciprocal-best near-dup partner assignment (ER one-to-one matching)
# ---------------------------------------------------------------------------


def q_events_prcurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT precision-recall readout for the spend-ranks-converters
    model (the PR complement of ``events_auc``: ROC-AUC is blind to
    class imbalance; average precision is what you tune on rare-positive
    corpora). Average precision uses the step definition
    AP = sum_s (np(s)/n_pos) * (cum_pos(s)/cum_n(s)) over DESCENDING
    score thresholds; each term is floored independently in ppm
    (deterministic in both engines; the sum under-counts by < #distinct
    scores ppm, stated rather than hidden). Also emits the best-F1
    operating point — F1(s) = 2*cum_pos/(cum_n + n_pos) in floor-ppm,
    ties broken toward the HIGHEST threshold (fewest predicted
    positives). Plan shape: same as events_auc — one per-user agg, one
    per-SCORE agg; the only single-partition windows run over distinct
    scores, never users, so exact AP needs no global per-row sort.
    decimal(38,0) keeps np*cum_pos*1e6 exact past 10^12 users."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    per_score = per_user.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("np")
    )
    wd = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_score.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_all"),
        F.count(F.lit(1)).alias("n_thresholds"),
    )
    curve = (
        per_score.withColumn("cum_n", F.sum("n").over(wd))
        .withColumn("cum_pos", F.sum("np").over(wd))
        .crossJoin(F.broadcast(tot))
        .select(
            "score",
            "n_pos",
            "n_all",
            "n_thresholds",
            "cum_pos",
            "cum_n",
            F.expr(
                "cast(cast(np as decimal(38,0)) * cum_pos * 1000000"
                " div greatest(cast(n_pos as decimal(38,0)) * cum_n, 1)"
                " as bigint)"
            ).alias("term_ppm"),
            F.expr(
                "cast(2 * cast(cum_pos as decimal(38,0)) * 1000000"
                " div (cum_n + n_pos) as bigint)"
            ).alias("f1_ppm"),
        )
    )
    wall = Window.partitionBy(F.lit(1))
    return (
        curve.withColumn("ap_ppm", F.sum("term_ppm").over(wall))
        .withColumn("best_f1_ppm", F.max("f1_ppm").over(wall))
        .where(F.col("f1_ppm") == F.col("best_f1_ppm"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(F.col("score").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "n_pos",
            (F.col("n_all") - F.col("n_pos")).cast("long").alias("n_neg"),
            F.col("n_thresholds").cast("long"),
            F.col("ap_ppm").cast("long"),
            F.col("best_f1_ppm").cast("long"),
            F.col("score").cast("long").alias("best_thr_cents"),
            F.expr(
                "cast(cast(cum_pos as decimal(38,0)) * 1000000 div cum_n"
                " as bigint)"
            ).alias("prec_at_best_ppm"),
            F.expr(
                "cast(cast(cum_pos as decimal(38,0)) * 1000000"
                " div greatest(n_pos, 1) as bigint)"
            ).alias("rec_at_best_ppm"),
        )
    )


SQL_EVENTS_PRCURVE = """
WITH per_user AS (
  SELECT user_id, sum(floor(value * 100)::BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1
),
per_score AS (
  SELECT score, count(*) AS n, sum(label) AS np FROM per_user GROUP BY 1
),
tot AS (
  SELECT sum(np)::BIGINT AS n_pos, sum(n)::BIGINT AS n_all,
         count(*)::BIGINT AS n_thresholds
  FROM per_score
),
curve AS (
  SELECT score, n, np,
         sum(n) OVER (ORDER BY score DESC) AS cum_n,
         sum(np) OVER (ORDER BY score DESC) AS cum_pos
  FROM per_score
),
scored AS (
  SELECT c.score, c.cum_n, c.cum_pos, t.n_pos, t.n_all, t.n_thresholds,
         (c.np::HUGEINT * c.cum_pos * 1000000)
           // greatest(t.n_pos::HUGEINT * c.cum_n, 1) AS term_ppm,
         (2 * c.cum_pos::HUGEINT * 1000000) // (c.cum_n + t.n_pos) AS f1_ppm
  FROM curve c, tot t
),
summary AS (
  SELECT sum(term_ppm)::BIGINT AS ap_ppm, max(f1_ppm)::BIGINT AS best_f1
  FROM scored
)
SELECT s.n_pos AS n_pos, (s.n_all - s.n_pos)::BIGINT AS n_neg,
       s.n_thresholds AS n_thresholds, su.ap_ppm AS ap_ppm,
       su.best_f1 AS best_f1_ppm, s.score::BIGINT AS best_thr_cents,
       ((s.cum_pos::HUGEINT * 1000000) // s.cum_n)::BIGINT
         AS prec_at_best_ppm,
       ((s.cum_pos::HUGEINT * 1000000) // greatest(s.n_pos, 1))::BIGINT
         AS rec_at_best_ppm
FROM scored s, summary su
WHERE s.f1_ppm = su.best_f1
QUALIFY row_number() OVER (ORDER BY s.score DESC) = 1
"""


THRESHOLD_GRID_CENTS = (1000, 2500, 5000, 10000, 25000)


def q_events_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix sweep at fixed spend thresholds — the ops table
    behind every alerting/targeting cutoff decision (events_auc says the
    ranking works, events_prcurve finds the F1-optimal point; this is
    the fixed-grid readout a dashboard pins). One per-user agg, one
    per-SCORE tally; the 5-row threshold grid joins the tally (not the
    users), so each threshold's TP/FP/FN/TN is a conditional sum over
    distinct scores. All ratios are floor-ppm over int64 (tp*1e6 is safe
    to ~9e12 users; past that, lift to decimal)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    per_score = per_user.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("np")
    )
    grid = spark.createDataFrame(
        [(int(t),) for t in THRESHOLD_GRID_CENTS], "thr_cents: long"
    )
    pos = F.col("score") >= F.col("thr_cents")
    agg = (
        per_score.crossJoin(F.broadcast(grid))
        .groupBy("thr_cents")
        .agg(
            F.sum(F.when(pos, F.col("np")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(pos, F.col("n") - F.col("np")).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when(~pos, F.col("np")).otherwise(0))
            .cast("long")
            .alias("fn"),
            F.sum(F.when(~pos, F.col("n") - F.col("np")).otherwise(0))
            .cast("long")
            .alias("tn"),
        )
    )
    return agg.select(
        "thr_cents",
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "((tp + tn) * 1000000) div greatest(tp + fp + fn + tn, 1)"
        ).alias("acc_ppm"),
        F.expr("(tp * 1000000) div greatest(tp + fp, 1)").alias("prec_ppm"),
        F.expr("(tp * 1000000) div greatest(tp + fn, 1)").alias("rec_ppm"),
        F.expr(
            "(2 * tp * 1000000) div greatest(2 * tp + fp + fn, 1)"
        ).alias("f1_ppm"),
    ).orderBy("thr_cents")


SQL_EVENTS_THRESHOLD = f"""
WITH per_user AS (
  SELECT user_id, sum(floor(value * 100)::BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1
),
per_score AS (
  SELECT score, count(*) AS n, sum(label) AS np FROM per_user GROUP BY 1
),
grid(thr_cents) AS (
  VALUES {", ".join(f"({t}::BIGINT)" for t in THRESHOLD_GRID_CENTS)}
),
cm AS (
  SELECT g.thr_cents,
         sum(CASE WHEN s.score >= g.thr_cents THEN s.np ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN s.score >= g.thr_cents THEN s.n - s.np ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN s.score < g.thr_cents THEN s.np ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN s.score < g.thr_cents THEN s.n - s.np ELSE 0 END)::BIGINT AS tn
  FROM per_score s, grid g GROUP BY 1
)
SELECT thr_cents, tp, fp, fn, tn,
       ((tp + tn) * 1000000) // greatest(tp + fp + fn + tn, 1) AS acc_ppm,
       (tp * 1000000) // greatest(tp + fp, 1) AS prec_ppm,
       (tp * 1000000) // greatest(tp + fn, 1) AS rec_ppm,
       (2 * tp * 1000000) // greatest(2 * tp + fp + fn, 1) AS f1_ppm
FROM cm ORDER BY thr_cents
"""


def q_dedup_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-best near-dup partner assignment: among candidate
    pairs with exact Jaccard >= 0.3, keep (a, b) only when b is a's
    highest-Jaccard partner AND a is b's — the one-to-one matching pass
    (ER's reciprocal-best-hit) that turns a pair soup into canonical
    merge decisions without transitive-chain surprises. Ordering is
    EXACT: partners compare on (i * 10^12) div union (decimal-floored
    — two genuinely different small-int fractions with set sizes up to
    ~3*10^4 shingles always differ at this scale; equal fractions tie-
    break on the smaller partner id, so both engines pick one winner).
    Plan shape: the shingle equi-join bounds candidates (never
    all-pairs, same as dedup_jaccard); the argmax is a row_number
    window PARTITIONED BY doc over the pair stream — no global sort,
    no driver state."""
    from pyjelly_spark.operators.components import cap_key_fanout
    from pyjelly_spark.operators.dedup import doc_shingles

    # Exact-tier hub guard: refuse (not silently drop) hot shingles.
    sh = cap_key_fanout(
        doc_shingles(_t(spark, sf_dir, "documents"), n=3),
        "shingle",
        on_exceed="error",
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    left = sh.select(F.col("doc_id").alias("a"), "shingle")
    right = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    pairs = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")),
            "b",
        )
        .select(
            "a",
            "b",
            "i",
            (F.col("sa") + F.col("sb") - F.col("i")).alias("un"),
        )
        .where(F.lit(10) * F.col("i") >= F.lit(3) * F.col("un"))
    )
    directed = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "i", "un"
    ).unionByName(
        pairs.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "i", "un"
        )
    )
    keyed = directed.withColumn(
        "jkey",
        F.expr(
            "cast(cast(i as decimal(38,0)) * 1000000000000 div un as bigint)"
        ),
    )
    w = Window.partitionBy("src").orderBy(
        F.col("jkey").desc(), F.col("dst").asc()
    )
    best = (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("src", "dst", "i", "un")
    )
    other = best.select(
        F.col("src").alias("o_src"), F.col("dst").alias("o_dst")
    )
    return (
        best.join(
            other,
            (F.col("src") == F.col("o_dst")) & (F.col("dst") == F.col("o_src")),
        )
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.expr(
                "cast(cast(i as decimal(38,0)) * 1000000 div un as bigint)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("a", "b")
    )


SQL_DEDUP_MUTUAL_BEST = f"""
WITH {SHINGLES_SQL.strip()},
pairs AS (
  SELECT inter.a, inter.b, i, sa.sz + sb.sz - i AS un
  FROM inter
  JOIN sizes sa ON inter.a = sa.doc_id
  JOIN sizes sb ON inter.b = sb.doc_id
  WHERE 10 * i >= 3 * (sa.sz + sb.sz - i)
),
directed AS (
  SELECT a AS src, b AS dst, i, un FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, i, un FROM pairs
),
best AS (
  SELECT src, dst, i, un,
         row_number() OVER (
           PARTITION BY src
           ORDER BY (i::HUGEINT * 1000000000000) // un DESC, dst
         ) AS rn
  FROM directed
)
SELECT x.src AS a, x.dst AS b,
       ((x.i::HUGEINT * 1000000) // x.un)::BIGINT AS jaccard_ppm
FROM best x
JOIN best y ON x.src = y.dst AND x.dst = y.src AND y.rn = 1
WHERE x.rn = 1 AND x.src < x.dst
ORDER BY a, b
"""


def q_events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement actives: DAU / rolling-7-day WAU / rolling-30-day MAU
    per observed day plus the stickiness ratios (DAU/WAU, DAU/MAU in
    floor-ppm) — the product-health counters every event pipeline pins
    on a dashboard; distinct from events_retention (cohort return
    rates): this is the calendar view. Exact-distinct at scale: the
    raw stream first collapses to the DISTINCT (user, day) table —
    orders smaller than events — and each row then fans out to the ≤7
    (resp. ≤30) window days it contributes to via an explode over a
    date sequence, semi-joined to the observed-day grid, so the rolling
    distincts are plain hash aggregates (no per-day re-scan, no
    nested-loop range join; the fan-out is bounded by the window length
    on the deduped table, the classic time-bucketed exact-actives
    shape). The day grid is whatever days occur — no dense calendar."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def rolling(n_days: int, out: str) -> DataFrame:
        contrib = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), n_days - 1))
            ).alias("wday"),
        )
        return (
            contrib.join(
                F.broadcast(days.select(F.col("day").alias("wday"))), "wday"
            )
            .groupBy("wday")
            .agg(F.count_distinct("user_id").alias(out))
            .withColumnRenamed("wday", "day")
        )

    return (
        dau.join(rolling(7, "wau"), "day")
        .join(rolling(30, "mau"), "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
            F.expr("(dau * 1000000) div wau").alias("dau_wau_ppm"),
            F.expr("(dau * 1000000) div mau").alias("dau_mau_ppm"),
        )
        .orderBy("day")
    )


SQL_EVENTS_WAU = """
WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day GROUP BY 1
),
mau AS (
  SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS mau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 29 AND d.day GROUP BY 1
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       dau.dau AS dau, wau.wau AS wau, mau.mau AS mau,
       (dau.dau * 1000000) // wau.wau AS dau_wau_ppm,
       (dau.dau * 1000000) // mau.mau AS dau_mau_ppm
FROM dau JOIN wau ON dau.day = wau.day JOIN mau ON dau.day = mau.day
ORDER BY day
"""


def q_orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts (the inventory-management
    Pareto cut): parts are ranked by gross lineitem revenue and
    classified A/B/C by whether they START before the cumulative 80% /
    95% boundaries — the boundary test is pure integer cross-
    multiplication (prev_cum*5 < total*4, prev_cum*20 < total*19), so
    no division ever enters the class decision and a part holding >80%
    alone is still (correctly) class A. Reports per-class part counts,
    revenue and floor-ppm share. The only ordered window runs over the
    per-PART aggregate (dictionary-sized, same contract as events_gini);
    ties rank deterministically by part key. Revenue is exact summed
    cents (floor per line item)."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev"
        )
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("l_partkey").asc())
    wall = Window.partitionBy(F.lit(1))
    classed = (
        per_part.withColumn("cum", F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", F.sum("rev").over(wall))
        .withColumn("prev_cum", F.col("cum") - F.col("rev"))
        .withColumn(
            "abc_class",
            F.when(
                F.col("prev_cum") * 5 < F.col("total") * 4, F.lit("A")
            )
            .when(F.col("prev_cum") * 20 < F.col("total") * 19, F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
            F.max("total").alias("_total"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            F.expr("(revenue_cents * 1000000) div _total").alias(
                "revenue_share_ppm"
            ),
        )
        .orderBy("abc_class")
    )


SQL_ORDERS_ABC = """
WITH per_part AS (
  SELECT l_partkey, sum(floor(l_extendedprice * 100)::BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) - rev AS prev_cum,
         sum(rev) OVER () AS total
  FROM per_part
),
classed AS (
  SELECT rev, total,
         CASE WHEN prev_cum * 5 < total * 4 THEN 'A'
              WHEN prev_cum * 20 < total * 19 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT abc_class, count(*)::BIGINT AS n_parts,
       sum(rev)::BIGINT AS revenue_cents,
       ((sum(rev) * 1000000) // max(total))::BIGINT AS revenue_share_ppm
FROM classed GROUP BY 1 ORDER BY abc_class
"""


# ---------------------------------------------------------------------------
# TPC-H completion: the seven remaining spec queries (q2 q9 q11 q12 q16 q20
# q21), adapted to this generator. The generator ships no partsupp table, so
# the supply relation is DERIVED from lineitem: ps := GROUP BY (l_partkey,
# l_suppkey) with ps_supplycost := min(price_cents // qty) — exact integer
# floor division (quantities are integral), identical arithmetic on both
# engines. No commit/receipt dates either, so "late" keeps the q4 convention
# (l_shipdate > o_orderdate + 60 days). With these, all 22 TPC-H queries run.
# ---------------------------------------------------------------------------


def _derived_ps(spark: SparkSession, sf_dir: str, extra=None) -> DataFrame:
    """The derived part-supplier supply relation: one shuffle on
    (l_partkey, l_suppkey); ``extra`` adds more aggregate columns."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (_dec("l_extendedprice") * F.lit(100).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("price_cents"),
        "l_shipdate",
    )
    aggs = [
        F.min(F.expr("cast(price_cents div qty as bigint)")).alias("cost_c")
    ] + (extra or [])
    return li.groupBy("l_partkey", "l_suppkey").agg(*aggs)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the supply relation and
    its cost derive from lineitem (see _derived_ps); scope is p_size = 15
    parts supplied from EUROPE. The spec's correlated min-cost subquery
    becomes a window min over p_partkey — no self-join. Plan: one shuffle
    builds ps; part (size-filtered) and the 5-row-per-nation supplier x
    nation x region dim both broadcast; the window adds the only other
    exchange. Reference semantics: TPC-H spec Q2."""
    ps = _derived_ps(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(F.col("p_size") == 15).select(
        "p_partkey", "p_type"
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost_c", F.min("cost_c").over(w))
        .where(F.col("cost_c") == F.col("min_cost_c"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "cost_c")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min((l_extendedprice::DECIMAL(18,2) * 100)::HUGEINT
             // l_quantity::BIGINT)::BIGINT AS cost_c
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_type, s_name, s_acctbal, n_name, cost_c,
         min(cost_c) OVER (PARTITION BY p_partkey) AS min_cost_c
  FROM part JOIN ps ON p_partkey = l_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_size = 15
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_c
FROM cand WHERE cost_c = min_cost_c
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: supply cost from
    _derived_ps, part scope p_name LIKE '%red%'. profit is exact in
    decimal-scale-4 units: rev4 - 100 * cost_c * qty. Plan: the red-part
    dim broadcasts BEFORE the ps aggregation (both the supply agg and the
    main stream shrink to ~13% of lineitem); li joins ps co-partitioned on
    (l_partkey, l_suppkey) — one exchange each side — then orders on
    l_orderkey (the only other big shuffle); supplier/nation broadcast.
    Reference semantics: TPC-H spec Q9."""
    part_red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part_red),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("long").alias("qty"),
            (_dec("l_extendedprice") * F.lit(100).cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .alias("price_cents"),
            (
                (
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
                )
                * F.lit(10000).cast("decimal(18,0)")
            )
            .cast("decimal(38,0)")
            .alias("rev4"),
        )
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.expr("cast(price_cents div qty as bigint)")).alias("cost_c"))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    amount4 = (
        F.col("rev4").cast("decimal(38,0)")
        - (F.lit(100) * F.col("cost_c") * F.col("qty")).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    return (
        li.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", "o_year")
        .agg(F.sum(amount4).alias("p4"))
        .select(
            "nation",
            "o_year",
            F.col("p4").cast("double").alias("profit4"),
            # profit can be NEGATIVE: both Spark decimal `div` and the
            # oracle's integer `//` truncate toward zero (verified:
            # duckdb -7 // 2 = -3), so `div` is the exact match.
            F.expr("cast(p4 div 100 as bigint)").alias("profit_cents"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


SQL_TPCH_Q9 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min((l_extendedprice::DECIMAL(18,2) * 100)::HUGEINT
             // l_quantity::BIGINT) AS cost_c
  FROM lineitem GROUP BY 1, 2
)
SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       sum((l.l_extendedprice::DECIMAL(18,2)
            * (1::DECIMAL(18,2) - l.l_discount::DECIMAL(18,2))
            * 10000)::HUGEINT
           - cost_c * 100 * l.l_quantity::BIGINT)::DOUBLE AS profit4,
       (sum((l.l_extendedprice::DECIMAL(18,2)
            * (1::DECIMAL(18,2) - l.l_discount::DECIMAL(18,2))
            * 10000)::HUGEINT
           - cost_c * 100 * l.l_quantity::BIGINT) // 100)::BIGINT
         AS profit_cents
FROM lineitem l
JOIN orders ON l.l_orderkey = o_orderkey
JOIN part ON l.l_partkey = p_partkey
JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
JOIN supplier ON l.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted: inventory value per part :=
    sum over ASIA-supplied (part, supplier) pairs of cost_c * total
    shipped qty; a part is "important" when its value exceeds 2x the
    average part share — the spec's fixed 0.0001 fraction is calibrated
    to SF1's part count, so the threshold here self-scales as
    value * n_parts > 2 * total (exact integer cross-multiply; no
    floats). Plan: ASIA suppliers broadcast-semi-join prunes lineitem
    BEFORE the ps agg; the global (total, n_parts) scalar is a 1-row
    cross join, never a driver collect. Reference: TPC-H spec Q11."""
    asia_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(asia_supp),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    ps = li.select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (_dec("l_extendedprice") * F.lit(100).cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("price_cents"),
    ).groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr("cast(price_cents div qty as bigint)")).alias("cost_c"),
        F.sum("qty").alias("sqty"),
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.sum(F.col("cost_c") * F.col("sqty")).alias("value_c")
    )
    totals = per_part.agg(
        F.sum("value_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .where(F.col("value_c") * F.col("n_parts") > F.lit(2) * F.col("total_c"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_c").cast("long").alias("value_c"),
        )
        .orderBy(F.desc("value_c"), "p_partkey")
    )


SQL_TPCH_Q11 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min((l_extendedprice::DECIMAL(18,2) * 100)::HUGEINT
             // l_quantity::BIGINT) AS cost_c,
         sum(l_quantity::BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
scoped AS (
  SELECT l_partkey, cost_c * qty AS val_c
  FROM ps JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
per_part AS (
  SELECT l_partkey, sum(val_c) AS value_c FROM scoped GROUP BY 1
),
tot AS (SELECT sum(value_c) AS total_c, count(*) AS n_parts FROM per_part)
SELECT l_partkey AS p_partkey, value_c::BIGINT AS value_c
FROM per_part, tot
WHERE value_c * n_parts > 2 * total_c
ORDER BY value_c DESC, p_partkey
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority), adapted: no shipmode /
    commit / receipt columns, so the mode dimension is l_returnflag and
    "late" is l_shipdate > o_orderdate + 90 days, scoped to 1997
    shipments. Pure-integer conditional counts. Plan: the shipdate range
    filter pushes to the lineitem scan; one hash join on the order key;
    the 90-day predicate evaluates post-join in the same codegen stage.
    Reference semantics: TPC-H spec Q12."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1 ORDER BY 1
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship count), adapted: the
    supply pairs derive from lineitem; the spec's supplier-complaint
    NOT IN becomes s_acctbal < 0; brand/type/size exclusions keep the
    spec shape on this generator's columns. Plan: distinct pairs is the
    one shuffle; the excluded-supplier set (tiny) broadcasts as a LEFT
    ANTI join; the filtered part dim broadcasts; countDistinct rides a
    second small agg. Reference semantics: TPC-H spec Q16."""
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#21")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (part-promotion suppliers), adapted: NATION_3 suppliers
    who shipped more 'red'-part quantity in 1997 than in all other years
    combined (2 * qty_1997 > qty_total — the spec's availqty > 0.5 *
    shipped-qty test re-expressed on the derived supply relation). Plan:
    the spec's two nested IN subqueries collapse into ONE conditional
    aggregation over lineitem (no self-join): red parts broadcast-semi
    prune the scan, one groupBy(part, supp) computes both sums, the
    nation-filtered supplier dim broadcasts. Reference: TPC-H spec Q20."""
    part_red = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    in_1997 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part_red),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select(
            "l_suppkey",
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            in_1997.alias("in97"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(F.col("in97"), F.col("qty")).otherwise(0)).alias(
                "qty_1997"
            ),
            F.sum("qty").alias("qty_total"),
        )
        .where(F.col("qty_1997") * 2 > F.col("qty_total"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        shipped.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


SQL_TPCH_Q20 = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l_quantity::BIGINT ELSE 0 END) AS qty_1997,
         sum(l_quantity::BIGINT) AS qty_total
  FROM lineitem GROUP BY 1, 2
)
SELECT DISTINCT s_name, n_name
FROM shipped
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%' AND n_name = 'NATION_3'
  AND qty_1997 * 2 > qty_total
ORDER BY s_name
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late"
    keeps the q4 convention (shipdate > orderdate + 60 days); the spec's
    single-nation scope widens to region AMERICA (sandbox-scale nations
    have too few suppliers); numwait counts distinct waiting orders. The
    spec's EXISTS / NOT EXISTS double self-join is re-expressed as two
    per-order aggregates — an order "waits on" supplier s iff it has >= 2
    distinct suppliers and s is its ONLY late one. The oracle keeps the
    spec's correlated EXISTS form, so the gate also proves the rewrite's
    equivalence. Plan: one groupBy(l_orderkey) over lineitem computes
    n_supp; late pairs join orders on the order key (co-partitioned with
    the agg); the late-per-order count is a second small agg; AMERICA
    suppliers broadcast. Reference semantics: TPC-H spec Q21."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    late_stats = late.groupBy(F.col("l_orderkey").alias("lo")).agg(
        F.count(F.lit(1)).alias("n_late")
    )
    am_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        late.join(order_stats, "l_orderkey")
        .where(F.col("n_supp") >= 2)
        .join(late_stats, F.col("l_orderkey") == F.col("lo"))
        .where(F.col("n_late") == 1)
        .join(F.broadcast(am_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_TPCH_Q21 = """
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders ON l.l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l.l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(DISTINCT l1.l_orderkey)::BIGINT AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Batch: per-doc TF-IDF top terms, model calibration readout, item-item CF
# ---------------------------------------------------------------------------


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinguishing terms by EXACT integer TF-IDF
    ranking: score = tf * 1e6 // df is monotone in tf/df, so the ranking
    equals the classic tf-idf ordering without a single float log —
    bit-identical across engines (ties break by term). The keyword /
    topic-label extraction step of an LLM-corpus pipeline.

    Scale shape: one explode to (doc, term) tf pairs, then df as a
    window count over ``term`` (ONE hash exchange — groupBy+join-back
    would pay two; same pattern as dup_span_fraction), then the per-doc
    top-3 window. Everything after the explode is linear in distinct
    (doc, term) pairs."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(T.words(T.normalized(F.col("text")))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn(
        "tfidf_score",
        F.expr("cast((tf * 1000000) div df as bigint)"),
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf_score", "rank")
    )


SQL_DOC_TOP_TERMS = rf"""
WITH w AS (
  SELECT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w WHERE term <> '' GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
),
r AS (
  SELECT doc_id, term, tf, df, (tf * 1000000) // df AS tfidf_score,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY (tf * 1000000) // df DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf::BIGINT AS tf, df::BIGINT AS df,
       tfidf_score::BIGINT AS tfidf_score, rank::BIGINT AS rank
FROM r WHERE rank <= 3
"""


def q_events_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration (reliability) readout with an exact per-bin
    Brier score: prediction units are (user, day); the "model" scores a
    day by its non-purchase engagement value and predicts conversion as
    the score's corpus percentile (ppm); bins are prediction deciles.
    Per bin: unit/positive counts, exact mean prediction, observed rate,
    and the Brier contribution — all integer ppm, no floats.

    Scale shape: the percentile needs NO global per-unit sort — the bin
    statistics only depend on per-SCORE tallies (same tally
    reconstruction as events_auc), so the single-partition window runs
    over distinct scores; unit-level rows never leave their hash
    partitions after the two aggs."""
    ev = _t(spark, sf_dir, "events")
    per_unit = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") != "purchase",
                    F.floor(F.col("value") * 100).cast("long"),
                )
            ),
            F.lit(0),
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("label"),
    )
    per_score = per_unit.groupBy("score").agg(
        F.count(F.lit(1)).alias("ns"), F.sum("label").alias("np")
    )
    ws = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = per_score.agg(F.sum("ns").alias("nu"))
    binned = (
        per_score.withColumn("below", F.sum("ns").over(ws) - F.col("ns"))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pred_ppm", F.expr("cast((below * 1000000) div nu as bigint)")
        )
        .withColumn(
            "bin",
            F.least(F.expr("cast(pred_ppm * 10 div 1000000 as bigint)"), F.lit(9)),
        )
    )
    dec = "cast({} as decimal(38,0))"
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("ns").cast("long").alias("n_units"),
            F.sum("np").cast("long").alias("n_pos"),
            F.sum(F.expr(dec.format("pred_ppm * ns"))).alias("sp"),
            F.sum(
                F.expr(
                    dec.format(
                        "np * (1000000 - pred_ppm) * (1000000 - pred_ppm)"
                        " + (ns - np) * pred_ppm * pred_ppm"
                    )
                )
            ).alias("sq"),
        )
        .select(
            "bin",
            "n_units",
            "n_pos",
            F.expr("cast(sp div n_units as bigint)").alias("mean_pred_ppm"),
            F.expr(
                "cast(cast(n_pos as decimal(38,0)) * 1000000 div n_units"
                " as bigint)"
            ).alias("obs_rate_ppm"),
            F.expr("cast(sq div n_units div 1000000 as bigint)").alias(
                "brier_x1e6"
            ),
        )
        .orderBy("bin")
    )


SQL_EVENTS_CALIBRATION = """
WITH per_unit AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         coalesce(sum(CASE WHEN event_type <> 'purchase'
                           THEN floor(value*100)::BIGINT END), 0) AS score,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1, 2
),
n AS (SELECT count(*) AS nu FROM per_unit),
per_score AS (
  SELECT score, count(*) AS ns, sum(label) AS np FROM per_unit GROUP BY 1
),
cum AS (
  SELECT score, ns, np,
         sum(ns) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - ns AS below
  FROM per_score
),
binned AS (
  SELECT least(((below * 1000000) // nu) * 10 // 1000000, 9) AS bin,
         ns, np, (below * 1000000) // nu AS pred_ppm
  FROM cum, n
)
SELECT bin::BIGINT AS bin, sum(ns)::BIGINT AS n_units,
       sum(np)::BIGINT AS n_pos,
       (sum(pred_ppm * ns) // sum(ns))::BIGINT AS mean_pred_ppm,
       (sum(np) * 1000000 // sum(ns))::BIGINT AS obs_rate_ppm,
       ((sum(np * (1000000 - pred_ppm) * (1000000 - pred_ppm)
            + (ns - np) * pred_ppm * pred_ppm) // sum(ns)) // 1000000)::BIGINT
         AS brier_x1e6
FROM binned GROUP BY 1 ORDER BY 1
"""


def q_events_itemcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-3 most-similar items per
    item by co-occurrence cosine over the (user, item) interaction set
    (item := the props.k facet). Ranking by co^2 * 1e6 // (n_a * n_b) is
    monotone in cosine^2, so the neighbor ordering is the cosine
    ordering with zero floats (ties break by neighbor id).

    Scale shape: interactions dedup to distinct (user, item) [one
    shuffle]; the pair generation is a self-equi-join on user_id — its
    fan-out is quadratic in a user's distinct-item count, which is the
    standard CF regime (at corpus scale, cap per-user items or sample
    heavy users; the oracle path keeps the exact join). Item counts
    broadcast back onto the pair aggregate."""
    ui = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .distinct()
    )
    cnt = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    a = ui.select("user_id", F.col("item").alias("ia"))
    b = ui.select("user_id", F.col("item").alias("ib"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "co"
    ).unionAll(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("neighbor"), "co"
        )
    )
    ca = cnt.select(F.col("item").alias("item"), F.col("n").alias("n_item"))
    cb = cnt.select(
        F.col("item").alias("neighbor"), F.col("n").alias("n_neighbor")
    )
    wr = Window.partitionBy("item").orderBy(
        F.desc("cos2_ppm"), F.asc("neighbor")
    )
    return (
        sym.join(F.broadcast(ca), "item")
        .join(F.broadcast(cb), "neighbor")
        .withColumn(
            "cos2_ppm",
            F.expr("cast(co * co * 1000000 div (n_item * n_neighbor) as bigint)"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 3)
        .select("item", "neighbor", "co", "n_item", "n_neighbor",
                "cos2_ppm", "rank")
    )


SQL_EVENTS_ITEMCF = """
WITH ui AS (
  SELECT DISTINCT user_id, json_extract(props, '$.k')::BIGINT AS item
  FROM events
),
cnt AS (SELECT item, count(*) AS n FROM ui GROUP BY 1),
pairs AS (
  SELECT a.item AS ia, b.item AS ib, count(*) AS co
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
),
sym AS (
  SELECT ia AS item, ib AS neighbor, co FROM pairs
  UNION ALL SELECT ib, ia, co FROM pairs
),
scored AS (
  SELECT s.item, s.neighbor, s.co, ca.n AS n_item, cb.n AS n_neighbor,
         (s.co * s.co * 1000000) // (ca.n * cb.n) AS cos2_ppm
  FROM sym s JOIN cnt ca ON s.item = ca.item
  JOIN cnt cb ON s.neighbor = cb.item
),
r AS (SELECT *, row_number() OVER (PARTITION BY item
        ORDER BY cos2_ppm DESC, neighbor) AS rank FROM scored)
SELECT item, neighbor, co::BIGINT AS co, n_item::BIGINT AS n_item,
       n_neighbor::BIGINT AS n_neighbor, cos2_ppm::BIGINT AS cos2_ppm,
       rank::BIGINT AS rank
FROM r WHERE rank <= 3
"""



# ---------------------------------------------------------------------------
# Batch: embedding linear algebra (Gram, class centroids, ANOVA F-scores)
# and per-user activity streaks
# ---------------------------------------------------------------------------


def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix X^T X of the embedding corpus over floor-scaled
    integers (operators/similarity.py::gram_matrix): per-partition numpy
    partial Grams, one d x d triangle per Arrow batch on the shuffle —
    the covariance/PCA/linear-probe primitive at corpus scale."""
    from pyjelly_spark.operators.similarity import gram_matrix

    return gram_matrix(_t(spark, sf_dir, "embeddings"))


SQL_EMBEDDING_GRAM = """
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
)
SELECT a.i::BIGINT AS i, b.i::BIGINT AS j,
       sum(a.x * b.x)::BIGINT AS gram_x
FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids in exact scaled integers: one
    posexplode + one groupBy((label, dim)) — class prototypes for
    nearest-centroid classification / LDA prep. mean_x4 is the
    truncating integer mean at 1e-4 scale (engine-portable; both
    engines truncate toward zero)."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "v"),
    ).select(
        F.col("label").cast("long").alias("label"),
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("v").cast("double") * 10000).cast("long").alias("x"),
    )
    return (
        flat.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sum_x"),
        )
        .withColumn(
            "mean_x4", F.expr("cast((sum_x * 10000) div n as bigint)")
        )
    )


SQL_EMBEDDING_CENTROIDS = """
WITH flat AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
)
SELECT label::BIGINT AS label, dim::BIGINT AS dim,
       count(*)::BIGINT AS n, sum(x)::BIGINT AS sum_x,
       ((sum(x) * 10000) // count(*))::BIGINT AS mean_x4
FROM flat GROUP BY 1, 2
"""


def q_embedding_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension ANOVA F-score of the embedding space against the
    label column — the classic univariate feature-selection statistic,
    entirely in exact integer arithmetic: between-class scatter uses the
    cross-multiplied form sum_c (s_c*N - S*n_c)^2 / (n_c*N^2) and
    within-class scatter sum_c (ss_c - s_c^2/n_c), both truncating at
    the division (identical on both engines; numerators are squares, so
    truncate == floor). Scale shape: one explode + one groupBy((dim,
    label)); the window totals run over the tiny (dim x class) frame."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "v"),
    ).select(
        F.col("label").cast("long").alias("label"),
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.floor(F.col("v").cast("double") * 10000).cast("long").alias("x"),
    )
    per_class = flat.groupBy("dim", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    wd = Window.partitionBy("dim")
    tot = per_class.withColumn("nt", F.sum("n").over(wd)).withColumn(
        "st", F.sum("s").over(wd)
    )
    dec = "cast({} as decimal(38,0))"
    return (
        tot.select(
            "dim",
            F.col("n").cast("long").alias("n"),
            F.col("nt").cast("long").alias("nt"),
            F.expr(
                dec.format("(s * nt - st * n)")
            ).alias("dnum"),
            F.expr(dec.format("n * nt * nt")).alias("dden"),
            F.expr(dec.format("ss - (s * s) div n")).alias("ssw_term"),
        )
        .select(
            "dim",
            "nt",
            F.expr("cast((dnum * dnum) div dden as decimal(38,0))").alias(
                "ssb_term"
            ),
            "ssw_term",
        )
        .groupBy("dim")
        .agg(
            F.max("nt").cast("long").alias("n_total"),
            F.sum("ssb_term").cast("long").alias("ssb_x"),
            F.sum("ssw_term").cast("long").alias("ssw_x"),
        )
        .withColumn(
            "f_ratio_ppm",
            F.expr(
                "cast(cast(ssb_x as decimal(38,0)) * 1000000"
                " div greatest(ssw_x, 1) as bigint)"
            ),
        )
        .orderBy("dim")
    )


SQL_EMBEDDING_ANOVA = """
WITH flat AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
),
per_class AS (
  SELECT dim, label, count(*) AS n, sum(x) AS s, sum(x*x) AS ss
  FROM flat GROUP BY 1, 2
),
tot AS (
  SELECT dim, label, n, s, ss,
         sum(n) OVER (PARTITION BY dim) AS nt,
         sum(s) OVER (PARTITION BY dim) AS st
  FROM per_class
)
SELECT dim::BIGINT AS dim, max(nt)::BIGINT AS n_total,
       sum(((s * nt - st * n)::HUGEINT * (s * nt - st * n))
           // (n * nt::HUGEINT * nt))::BIGINT AS ssb_x,
       sum(ss - (s * s) // n)::BIGINT AS ssw_x,
       (sum(((s * nt - st * n)::HUGEINT * (s * nt - st * n))
            // (n * nt::HUGEINT * nt)) * 1000000
        // greatest(sum(ss - (s * s) // n), 1))::BIGINT AS f_ratio_ppm
FROM tot GROUP BY 1 ORDER BY 1
"""


def q_events_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as a
    histogram — classic gaps-and-islands: distinct (user, day), an
    island key day - row_number() per user, then two small aggs. The
    per-user window shuffles once on user_id; no self-joins."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    wu = Window.partitionBy("user_id").orderBy("d")
    streaks = (
        days.withColumn("rn", F.row_number().over(wu))
        .withColumn("grp", F.date_sub(F.col("d"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    best = streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("streak_days")
    )
    return (
        best.groupBy("streak_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )


SQL_EVENTS_STREAK = """
WITH days AS (
  SELECT DISTINCT user_id, ts::DATE AS d FROM events
),
isl AS (
  SELECT user_id,
         d - (row_number() OVER (PARTITION BY user_id ORDER BY d))::INT AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2
),
best AS (SELECT user_id, max(len) AS streak_days FROM streaks GROUP BY 1)
SELECT streak_days::BIGINT AS streak_days, count(*)::BIGINT AS n_users
FROM best GROUP BY 1 ORDER BY 1
"""



def q_embedding_ncc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification readout (confusion counts) over
    the embedding corpus — exact integer argmin: dist^2 to class c is
    sum_i (x_i*n_c - S_ci)^2 / n_c^2, and candidates compare by the
    cross-multiplied rationals D_a*n_b^2 <=> D_b*n_a^2 (ties keep the
    lower label), so the prediction is bit-identical to the oracle's
    NOT-EXISTS argmin on any partitioning.

    Scale shape: the centroid stats are a (classes x dims) aggregate —
    bounded driver state, the MLlib centroid regime (same as
    kmeans_int) — embedded into ONE narrow numpy scoring pass
    (mapInPandas, no join, no shuffle on the corpus side), then a tiny
    confusion groupBy. int64 bound: |x|*n_c and the squared sums stay
    well under 2^63 while per-class counts are < ~10^5; beyond that the
    same pass runs with Python-int (object) arrays."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    emb = _t(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.select(
            "label", F.posexplode(F.col("embedding")).alias("pos", "v")
        )
        .select(
            "label",
            "pos",
            F.floor(F.col("v").cast("double") * 10000)
            .cast("long")
            .alias("x"),
        )
        .groupBy("label", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .collect()
    )
    labels = sorted({r["label"] for r in cent_rows})
    dims = 1 + max(r["pos"] for r in cent_rows)
    n_c = np.zeros(len(labels), dtype=np.int64)
    s_c = np.zeros((len(labels), dims), dtype=np.int64)
    lab_pos = {lab: k for k, lab in enumerate(labels)}
    for r in cent_rows:
        k = lab_pos[r["label"]]
        n_c[k] = r["n"]
        s_c[k, r["pos"]] = r["s"]
    lab_arr = np.array(labels, dtype=np.int64)
    bc = spark.sparkContext.broadcast((lab_arr, n_c, s_c))
    schema = StructType(
        [
            StructField("true_label", LongType(), False),
            StructField("predicted_label", LongType(), False),
        ]
    )

    def score(batches):
        labs, ns, ss = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * 10000
            ).astype(np.int64)
            best_k = np.zeros(len(x), dtype=np.int64)
            best_d = (
                (x * ns[0] - ss[0][None, :]) ** 2
            ).sum(axis=1)
            for k in range(1, len(labs)):
                d_k = ((x * ns[k] - ss[k][None, :]) ** 2).sum(axis=1)
                # exact rational compare d_k/n_k^2 < best/n_best^2;
                # strict < + ascending k keeps the lower label on ties
                better = d_k * ns[best_k] ** 2 < best_d * ns[k] ** 2
                best_d = np.where(better, d_k, best_d)
                best_k = np.where(better, k, best_k)
            yield pd.DataFrame(
                {
                    "true_label": pdf["label"].to_numpy().astype("int64"),
                    "predicted_label": labs[best_k],
                }
            )

    return (
        emb.select("label", "embedding")
        .mapInPandas(score, schema=schema)
        .groupBy("true_label", "predicted_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("true_label", "predicted_label")
    )


SQL_EMBEDDING_NCC = """
WITH flat AS (
  SELECT vec_id, label AS true_label,
         generate_subscripts(embedding, 1) AS dim,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
),
cent AS (
  SELECT true_label AS c_label, dim, count(*) AS n_c, sum(x) AS s
  FROM flat GROUP BY 1, 2
),
dists AS (
  SELECT f.vec_id, f.true_label, c.c_label,
         max(c.n_c) AS n_c,
         sum((f.x * c.n_c - c.s)::HUGEINT * (f.x * c.n_c - c.s)) AS d2
  FROM flat f JOIN cent c ON f.dim = c.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT d.vec_id, d.true_label, d.c_label AS predicted_label
  FROM dists d
  WHERE NOT EXISTS (
    SELECT 1 FROM dists o
    WHERE o.vec_id = d.vec_id AND o.c_label <> d.c_label
      AND (o.d2 * d.n_c::HUGEINT * d.n_c < d.d2 * o.n_c::HUGEINT * o.n_c
           OR (o.d2 * d.n_c::HUGEINT * d.n_c = d.d2 * o.n_c::HUGEINT * o.n_c
               AND o.c_label < d.c_label))
  )
)
SELECT true_label::BIGINT AS true_label,
       predicted_label::BIGINT AS predicted_label,
       count(*)::BIGINT AS n
FROM best GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-day (new) vs returning,
    plus the cumulative user count — the standard growth-accounting
    readout. One distinct (user, day) pass; each user's first day is a
    groupBy-min; new/returning follow from one equi-join on (user, day)
    semantics folded into a conditional count; the cumulative sum runs
    over the tiny per-day frame."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("fd"))
    per_day = (
        days.join(first, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("d") == F.col("fd"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .withColumn(
            "n_returning", (F.col("n_active") - F.col("n_new")).cast("long")
        )
    )
    wc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_day.withColumn(
            "cum_users", F.sum("n_new").over(wc).cast("long")
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "n_active",
            "n_new",
            "n_returning",
            "cum_users",
        )
        .orderBy("day")
    )


SQL_EVENTS_NEW_RETURNING = """
WITH days AS (
  SELECT DISTINCT user_id, ts::DATE AS d FROM events
),
first AS (SELECT user_id, min(d) AS fd FROM days GROUP BY 1),
per_day AS (
  SELECT d, count(*) AS n_active,
         sum(CASE WHEN d = fd THEN 1 ELSE 0 END) AS n_new
  FROM days JOIN first USING (user_id) GROUP BY 1
)
SELECT d::VARCHAR AS day, n_active::BIGINT AS n_active,
       n_new::BIGINT AS n_new,
       (n_active - n_new)::BIGINT AS n_returning,
       (sum(n_new) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))::BIGINT
         AS cum_users
FROM per_day ORDER BY day
"""


#: build-graph shape constants shared by the Spark path and the SQL
#: oracles: group size, and the cycle-length formula 3 + (7g % 20).
_SCC_G = 40


def _dep_graph(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(edges(src,dst), nodes(node)) of a closed-form build-task
    dependency graph over ``documents.doc_id`` (the generator's import
    graph is a single affine-permutation orbit — one giant SCC, see
    test_scc_import_graph_is_one_orbit — so the census needs a graph
    with actual structure).

    Node v (g = v // 40, r = v % 40, L_g = 3 + 7g % 20):
    - r <  L_g: cycle edge v -> g*40 + (r+1) % L_g  (an SCC of size L_g)
    - r >= L_g: tail edge  v -> g*40 + (r % L_g)    (in-degree-0 singleton)
    - r == 1, g >= 1: chord (g//2)*40 + 1 -> v      (parent-group cycle
      to child-group cycle: a binary condensation tree, depth log2(n/40))

    Edges to node ids beyond the table are dropped (a partial last
    group degrades to a chain — identically on both sides)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("v")
    )
    n = docs.count()
    g = F.col("v") / _SCC_G
    gg = F.floor(g).cast("long")
    r = F.col("v") % _SCC_G
    ell = (F.lit(3) + (gg * 7) % 20).cast("long")
    base = docs.select(
        "v",
        gg.alias("g"),
        r.alias("r"),
        ell.alias("ell"),
    )
    cycle = base.where(F.col("r") < F.col("ell")).select(
        F.col("v").alias("src"),
        (
            F.col("g") * _SCC_G + (F.col("r") + 1) % F.col("ell")
        ).alias("dst"),
    )
    tail = base.where(F.col("r") >= F.col("ell")).select(
        F.col("v").alias("src"),
        (F.col("g") * _SCC_G + F.col("r") % F.col("ell")).alias("dst"),
    )
    chord = base.where((F.col("r") == 1) & (F.col("g") >= 1)).select(
        (F.floor(F.col("g") / 2).cast("long") * _SCC_G + 1).alias("src"),
        F.col("v").alias("dst"),
    )
    edges = (
        cycle.unionByName(tail)
        .unionByName(chord)
        .where((F.col("dst") < n) & (F.col("src") < n))
        .distinct()
    )
    return edges, docs.select(F.col("v").alias("node"))


def q_kg_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly-connected-component census of the dependency graph —
    (scc_size, n_sccs) histogram over ALL nodes (singletons included).

    The distributed FW-BW-Trim coloring algorithm
    (operators/scc.py): trim retires the acyclic fringe in a few
    in/out-degree semi-join rounds, forward min-label coloring
    partitions the cyclic core into forward-closed classes in
    O(diameter) one-shuffle rounds, and a multi-source backward sweep
    inside each class extracts the SCCs — never a transitive closure,
    never anything quadratic, so the plan survives a 10^12-file import
    graph where the oracle's closure (n^2 pairs) obviously cannot. The
    oracle IS the quadratic closure (DuckDB recursive CTE + mutual-
    reachability min), which is exactly why the distributed algorithm
    has to exist. Unlike undirected CC (which would merge every cycle,
    tail and chord into one blob per tree), the census keeps each cycle
    separate — the discriminating case."""
    from pyjelly_spark.operators.scc import strongly_connected_components

    edges, nodes = _dep_graph(spark, sf_dir)
    assign = strongly_connected_components(edges, nodes)
    sizes = assign.groupBy("scc").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").cast("long").alias("scc_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sccs"))
        .orderBy("scc_size")
    )


_DEP_EDGES_SQL = """
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 40 AS g, doc_id % 40 AS r,
         3 + (doc_id // 40 * 7) % 20 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*40 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*40 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT (g//2)*40 + 1 AS s, v AS t FROM vx WHERE r = 1 AND g >= 1
),
e AS (
  SELECT DISTINCT s, t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
)
"""

_SCC_SQL_CORE = _DEP_EDGES_SQL + """,
reach AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e2.t FROM reach r JOIN e e2 ON e2.s = r.t
),
mutual AS (
  SELECT r1.s AS a, r1.t AS b
  FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s
),
sccid AS (
  SELECT x.v AS node, least(x.v, coalesce(min(m.b), x.v)) AS scc
  FROM vx x LEFT JOIN mutual m ON m.a = x.v
  GROUP BY x.v
)
"""

SQL_KG_SCC = f"""
WITH RECURSIVE {_SCC_SQL_CORE},
sizes AS (SELECT scc, count(*) AS sz FROM sccid GROUP BY 1)
SELECT sz::BIGINT AS scc_size, count(*)::BIGINT AS n_sccs
FROM sizes GROUP BY 1 ORDER BY 1
"""


def q_kg_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological layering of the import graph's condensation DAG:
    per layer (longest condensation-edge path ending there), how many
    SCCs and how many underlying modules sit in it — the wave schedule
    a build system would run (layer k can only start after k-1).

    Spark path: SCC assignment (q_kg_scc's operator) + iterative
    longest-path max-propagation over the CONTRACTED edge set
    (operators/scc.py condensation_levels) — the contracted graph is
    orders of magnitude smaller than the input, rounds = condensation
    depth, one shuffle each. The oracle enumerates all (scc, path
    length) pairs recursively — again only viable because it is an
    oracle."""
    from pyjelly_spark.operators.scc import (
        condensation_levels,
        strongly_connected_components,
    )

    edges, nodes = _dep_graph(spark, sf_dir)
    assign = strongly_connected_components(edges, nodes)
    levels = condensation_levels(edges, assign)
    return (
        assign.join(levels, "scc")
        .groupBy(F.col("level").cast("long").alias("level"))
        .agg(
            F.countDistinct("scc").cast("long").alias("n_sccs"),
            F.count(F.lit(1)).cast("long").alias("n_modules"),
        )
        .orderBy("level")
    )


SQL_KG_CONDENSATION = f"""
WITH RECURSIVE {_SCC_SQL_CORE},
ce AS (
  SELECT DISTINCT s1.scc AS src, s2.scc AS dst
  FROM e JOIN sccid s1 ON s1.node = e.s JOIN sccid s2 ON s2.node = e.t
  WHERE s1.scc <> s2.scc
),
lp AS (
  SELECT scc AS v, 0 AS lvl FROM (SELECT DISTINCT scc FROM sccid)
  UNION
  SELECT ce.dst AS v, lp.lvl + 1 AS lvl FROM lp JOIN ce ON ce.src = lp.v
),
lev AS (SELECT v AS scc, max(lvl) AS level FROM lp GROUP BY 1)
SELECT lev.level::BIGINT AS level,
       count(DISTINCT sccid.scc)::BIGINT AS n_sccs,
       count(*)::BIGINT AS n_modules
FROM sccid JOIN lev ON lev.scc = sccid.scc
GROUP BY 1 ORDER BY 1
"""


#: (pred name, date_lo, date_hi, price_lo, price_hi) — None = unbounded.
#: Shared shape between the Spark path and the SQL oracle below.
_SKIP_PREDS = [
    ("p1_date_ge_2000", "2000-01-01", None, None, None),
    ("p2_date_1996h2", "1996-06-01", "1996-12-31", None, None),
    ("p3_price_gt_450k", None, None, 450000.0, None),
    ("p4_price_lt_20k", None, None, None, 20000.0),
    ("p5_date98_price300k", "1998-01-01", None, 300000.0, None),
]


def q_orders_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max file statistics) scan-pruning audit — the
    planner readout an Iceberg/Delta lakehouse produces from manifest
    stats before touching any data file.

    Orders are assigned to files under two layouts: ``insertion``
    (64 fixed-width o_orderkey ranges — the order rows arrived) and
    ``datepart`` (one file per o_orderdate calendar month — a
    date-partitioned table). Per file the audit keeps min/max of
    o_orderdate and o_totalprice plus the row count (ONE metadata-sized
    aggregate per layout — at 10^12 rows this is the manifest, not the
    data), then evaluates five predicate templates against the stats:
    a file is scanned iff its [min,max] box overlaps the predicate
    box. Output per (layout, pred): total files, files scanned, rows
    in scanned files (the I/O bound) and exact matching rows (the
    useful fraction) — quantifying that date predicates prune ~11/12
    of the datepart layout but nothing of the insertion layout, and
    that uniform columns (price) never prune regardless of layout.
    The rows_matched pass is one conditional aggregation over the
    table (shared across predicates), not a scan per predicate."""
    orders = _t(spark, sf_dir, "orders")
    n = orders.count()
    width = (n + 63) // 64
    layouts = {
        "insertion": (F.col("o_orderkey") / width).cast("long"),
        "datepart": F.date_trunc("month", "o_orderdate").cast("long"),
    }
    date_c = F.col("o_orderdate")
    price_c = F.col("o_totalprice")

    def overlap(dlo, dhi, plo, phi):
        cond = F.lit(True)
        if dlo is not None:
            cond = cond & (F.col("max_d") >= F.lit(dlo).cast("timestamp"))
        if dhi is not None:
            cond = cond & (F.col("min_d") <= F.lit(dhi).cast("timestamp"))
        if plo is not None:
            cond = cond & (F.col("max_p") > F.lit(plo))
        if phi is not None:
            cond = cond & (F.col("min_p") < F.lit(phi))
        return cond

    def row_pred(dlo, dhi, plo, phi):
        cond = F.lit(True)
        if dlo is not None:
            cond = cond & (date_c >= F.lit(dlo).cast("timestamp"))
        if dhi is not None:
            cond = cond & (date_c <= F.lit(dhi).cast("timestamp"))
        if plo is not None:
            cond = cond & (price_c > F.lit(plo))
        if phi is not None:
            cond = cond & (price_c < F.lit(phi))
        return cond

    matched = orders.agg(
        *[
            F.sum(row_pred(dlo, dhi, plo, phi).cast("long")).alias(name)
            for name, dlo, dhi, plo, phi in _SKIP_PREDS
        ]
    )

    parts = []
    for layout, file_key in layouts.items():
        stats = orders.groupBy(file_key.alias("f")).agg(
            F.min("o_orderdate").alias("min_d"),
            F.max("o_orderdate").alias("max_d"),
            F.min("o_totalprice").alias("min_p"),
            F.max("o_totalprice").alias("max_p"),
            F.count(F.lit(1)).alias("cnt"),
        )
        per_pred = stats.agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            *[
                x
                for name, dlo, dhi, plo, phi in _SKIP_PREDS
                for x in (
                    F.sum(overlap(dlo, dhi, plo, phi).cast("long"))
                    .cast("long")
                    .alias(f"fs_{name}"),
                    F.sum(
                        F.when(overlap(dlo, dhi, plo, phi), F.col("cnt"))
                        .otherwise(F.lit(0))
                    )
                    .cast("long")
                    .alias(f"rs_{name}"),
                )
            ],
        )
        # unpivot the single stats row with stack(): ONE pass over the
        # file stats per layout instead of a crossJoin per predicate
        stack_args = ", ".join(
            f"'{name}', fs_{name}, rs_{name}, CAST({name} AS BIGINT)"
            for name, *_ in _SKIP_PREDS
        )
        parts.append(
            per_pred.crossJoin(F.broadcast(matched)).select(
                F.lit(layout).alias("layout"),
                "n_files",
                F.expr(
                    f"stack({len(_SKIP_PREDS)}, {stack_args}) AS "
                    "(pred, files_scanned, rows_scanned, rows_matched)"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "layout", "pred", "n_files", "files_scanned", "rows_scanned",
        "rows_matched",
    ).orderBy("layout", "pred")


def _skip_row_sums_sql() -> list[str]:
    """Row-level CASE sums for the oracle, generated from the same
    _SKIP_PREDS table the Spark path uses."""
    rows = []
    for name, dlo, dhi, plo, phi in _SKIP_PREDS:
        rc = []
        if dlo is not None:
            rc.append(f"o_orderdate >= TIMESTAMP '{dlo}'")
        if dhi is not None:
            rc.append(f"o_orderdate <= TIMESTAMP '{dhi}'")
        if plo is not None:
            rc.append(f"o_totalprice > {plo}")
        if phi is not None:
            rc.append(f"o_totalprice < {phi}")
        rows.append(
            f"sum(CASE WHEN {' AND '.join(rc)} THEN 1 ELSE 0 END)::BIGINT"
            f" AS {name}"
        )
    return rows


def _sql_orders_skipping() -> str:
    rows = _skip_row_sums_sql()
    pred_unions = []
    for (name, dlo, dhi, plo, phi) in _SKIP_PREDS:
        oc = []
        if dlo is not None:
            oc.append(f"s.max_d >= TIMESTAMP '{dlo}'")
        if dhi is not None:
            oc.append(f"s.min_d <= TIMESTAMP '{dhi}'")
        if plo is not None:
            oc.append(f"s.max_p > {plo}")
        if phi is not None:
            oc.append(f"s.min_p < {phi}")
        pred_unions.append(
            f"""
  SELECT s.layout, '{name}' AS pred,
         count(*)::BIGINT AS n_files,
         sum(CASE WHEN {' AND '.join(oc)} THEN 1 ELSE 0 END)::BIGINT
           AS files_scanned,
         sum(CASE WHEN {' AND '.join(oc)} THEN s.cnt ELSE 0 END)::BIGINT
           AS rows_scanned,
         max(m.{name}) AS rows_matched
  FROM stats s, m GROUP BY 1"""
        )
    return f"""
WITH nn AS (SELECT count(*)::BIGINT AS n FROM orders),
keyed AS (
  SELECT o.*,
    o.o_orderkey // ((nn.n + 63) // 64) AS f_ins,
    date_trunc('month', o.o_orderdate) AS f_month
  FROM orders o, nn
),
stats AS (
  SELECT 'insertion' AS layout, f_ins::VARCHAR AS f,
         min(o_orderdate) AS min_d, max(o_orderdate) AS max_d,
         min(o_totalprice) AS min_p, max(o_totalprice) AS max_p,
         count(*) AS cnt
  FROM keyed GROUP BY 1, 2
  UNION ALL
  SELECT 'datepart', f_month::VARCHAR,
         min(o_orderdate), max(o_orderdate),
         min(o_totalprice), max(o_totalprice), count(*)
  FROM keyed GROUP BY 1, 2
),
m AS (
  SELECT {', '.join(rows)} FROM orders
)
{' UNION ALL '.join(pred_unions)}
ORDER BY layout, pred
"""


SQL_ORDERS_SKIPPING = _sql_orders_skipping()


def q_kg_edgecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-cut audit of three node-partitioning schemes over the
    dependency graph (queries._dep_graph) — the planning question every
    distributed graph job answers before shuffling 10^12 edges: which
    layout co-locates neighbors?

    Schemes (16 partitions each): ``hash`` (v % 16 — what a default
    hash shuffle does), ``range`` (v*16 // n — contiguous id blocks),
    ``group`` (v//40 % 16 — the graph's natural build-group locality).
    Per scheme: total edges, edges crossing partitions, and the cut
    fraction in ppm. The audit itself is metadata-cheap: one pass over
    the edge list with three integer projections and one aggregation —
    no join, no per-scheme scan. On this graph hash cuts ~97% of the
    edges, range cuts roughly half (contiguous id blocks still straddle
    group boundaries when 16 partitions are narrower than a group),
    and the group scheme cuts only the tree chords (~2%) — the
    measured argument for locality-aware partitioning before an
    iterative algorithm like scc/pagerank."""
    edges, nodes = _dep_graph(spark, sf_dir)
    n = nodes.count()
    s, d = F.col("src"), F.col("dst")

    def cut(expr_s: Column, expr_d: Column) -> Column:
        return (expr_s != expr_d).cast("long")

    # integer `div` (not float /): keys are nonnegative, so div == the
    # floor division the oracle's // computes — no float rounding
    flags = edges.select(
        cut(s % 16, d % 16).alias("hash"),
        cut(
            F.expr(f"src * 16L div {n}L"), F.expr(f"dst * 16L div {n}L")
        ).alias("range"),
        cut(
            F.expr(f"(src div {_SCC_G}L) % 16"),
            F.expr(f"(dst div {_SCC_G}L) % 16"),
        ).alias("group"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        *[
            F.sum(c).cast("long").alias(f"cut_{c}")
            for c in ("hash", "range", "group")
        ],
    )
    stack_args = ", ".join(
        f"'{c}', cut_{c}" for c in ("group", "hash", "range")
    )
    return (
        agg.select(
            F.expr(f"stack(3, {stack_args}) AS (scheme, n_cut)"),
            "n_edges",
        )
        .select(
            "scheme",
            "n_edges",
            "n_cut",
            F.expr("n_cut * 1000000L div n_edges").alias("cut_ppm"),
        )
        .orderBy("scheme")
    )


SQL_KG_EDGECUT = f"""
WITH {_DEP_EDGES_SQL},
flags AS (
  SELECT
    CASE WHEN s % 16 <> t % 16 THEN 1 ELSE 0 END AS f_hash,
    CASE WHEN (s*16)//nn.n <> (t*16)//nn.n THEN 1 ELSE 0 END AS f_range,
    CASE WHEN (s//40) % 16 <> (t//40) % 16 THEN 1 ELSE 0 END AS f_group
  FROM e, nn
),
agg AS (
  SELECT count(*)::BIGINT AS n_edges,
         sum(f_hash)::BIGINT AS c_hash,
         sum(f_range)::BIGINT AS c_range,
         sum(f_group)::BIGINT AS c_group
  FROM flags
)
SELECT 'group' AS scheme, n_edges, c_group AS n_cut,
       (c_group * 1000000 // n_edges)::BIGINT AS cut_ppm FROM agg
UNION ALL
SELECT 'hash', n_edges, c_hash, (c_hash * 1000000 // n_edges)::BIGINT FROM agg
UNION ALL
SELECT 'range', n_edges, c_range, (c_range * 1000000 // n_edges)::BIGINT FROM agg
ORDER BY scheme
"""


def q_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff) between two versions of the
    orders table — the nightly job a lakehouse runs to audit what a
    MERGE/backfill actually changed: per change class (insert / delete
    / update / unchanged) the row count plus a column-level change
    mask (how many updates touched price, how many touched status).

    Snapshot B is derived from A in closed form (deterministic, no
    external data): keys with k%19==3 deleted, k%7==2 get price+1000,
    k%11==5 get status 'F', and keys with k%29==1 are re-inserted as
    new rows with key k+10n. The diff itself is ONE full-outer
    equi-join on the key (sort-merge, AQE-coalesced) followed by a
    narrow classification projection and a single aggregation — the
    shape that survives 10^12 rows, where per-column comparisons stay
    in whole-stage codegen and nothing is collected."""
    a = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    n = a.count()
    k = F.col("o_orderkey")
    base_b = a.where(k % 19 != 3).select(
        "o_orderkey",
        F.when(k % 7 == 2, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 11 == 5, F.lit("F"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    inserts = a.where(k % 29 == 1).select(
        (k + 10 * n).alias("o_orderkey"), "o_totalprice", "o_orderstatus"
    )
    b = base_b.unionByName(inserts)

    joined = a.alias("a").join(
        b.alias("b"), on="o_orderkey", how="full_outer"
    )
    a_price = F.col("a.o_totalprice")
    b_price = F.col("b.o_totalprice")
    a_stat = F.col("a.o_orderstatus")
    b_stat = F.col("b.o_orderstatus")
    classified = joined.select(
        F.when(a_price.isNull(), F.lit("insert"))
        .when(b_price.isNull(), F.lit("delete"))
        .when(
            (a_price != b_price) | (a_stat != b_stat), F.lit("update")
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.coalesce(
            (a_price != b_price), F.lit(False)
        ).cast("long").alias("price_chg"),
        F.coalesce(
            (a_stat != b_stat), F.lit(False)
        ).cast("long").alias("status_chg"),
    )
    return (
        classified.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_chg").cast("long").alias("n_price_changed"),
            F.sum("status_chg").cast("long").alias("n_status_changed"),
        )
        .orderBy("change_type")
    )


SQL_ORDERS_DIFF = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM orders),
a AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 11 = 5 THEN 'F'
              ELSE o_orderstatus END AS o_orderstatus
  FROM a WHERE o_orderkey % 19 <> 3
  UNION ALL
  SELECT o_orderkey + 10*nn.n, o_totalprice, o_orderstatus
  FROM a, nn WHERE o_orderkey % 29 = 1
),
j AS (
  SELECT a.o_totalprice AS ap, b.o_totalprice AS bp,
         a.o_orderstatus AS ast, b.o_orderstatus AS bst
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
),
c AS (
  SELECT CASE WHEN ap IS NULL THEN 'insert'
              WHEN bp IS NULL THEN 'delete'
              WHEN ap <> bp OR ast <> bst THEN 'update'
              ELSE 'unchanged' END AS change_type,
         CASE WHEN ap <> bp THEN 1 ELSE 0 END AS price_chg,
         CASE WHEN ast <> bst THEN 1 ELSE 0 END AS status_chg
  FROM j
)
SELECT change_type, count(*)::BIGINT AS n_rows,
       sum(price_chg)::BIGINT AS n_price_changed,
       sum(status_chg)::BIGINT AS n_status_changed
FROM c GROUP BY 1 ORDER BY 1
"""


def q_events_joinest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit — the query-optimizer step
    that decides join order and broadcast eligibility before a single
    row moves: predict |clicks ⋈ purchases on user_id| from per-bucket
    key histograms, and compare with the exact join size.

    Estimator ladder (textbook selectivity estimation): ``uniform``
    (one global bucket, na*nb / max(da,db) — the independence+
    uniformity assumption), ``bucket16`` / ``bucket4`` (equi-width
    key-range histograms, the same formula per bucket), ``perkey``
    (the degenerate width-1 histogram — exact by construction, the
    ladder's fixpoint). All arithmetic is integer (div), so the audit
    is bit-deterministic on any partitioning. One shuffle on user_id
    builds the per-key counts; every coarser histogram is a metadata-
    sized re-aggregation of that — the exact plan a cost-based
    optimizer can afford at 10^12 rows because its input is the
    histogram, never the data."""
    ev = _t(spark, sf_dir, "events")
    per_key = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "click").cast("long")).alias("ca"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    actual = per_key.agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("actual")
    )

    def hist_est(width: int | None, name: str) -> DataFrame:
        bucket = (
            F.expr(f"user_id div {width}L") if width else F.lit(0)
        ).alias("b")
        per_bucket = per_key.groupBy(bucket).agg(
            F.sum("ca").alias("na"),
            F.sum("cb").alias("nb"),
            F.sum((F.col("ca") > 0).cast("long")).alias("da"),
            F.sum((F.col("cb") > 0).cast("long")).alias("db"),
        )
        est = per_bucket.where(
            F.greatest("da", "db") > 0
        ).agg(
            F.sum(
                F.expr("na * nb div greatest(da, db)")
            ).cast("long").alias("est")
        )
        return est.select(F.lit(name).alias("method"), "est")

    perkey_est = per_key.agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("est")
    ).select(F.lit("perkey").alias("method"), "est")

    ests = (
        hist_est(None, "uniform")
        .unionByName(hist_est(16, "bucket16"))
        .unionByName(hist_est(4, "bucket4"))
        .unionByName(perkey_est)
    )
    return (
        ests.crossJoin(F.broadcast(actual))
        .select(
            "method",
            "est",
            "actual",
            F.expr(
                "abs(est - actual) * 1000000L div actual"
            ).alias("err_ppm"),
        )
        .orderBy("method")
    )


SQL_EVENTS_JOINEST = """
WITH per_key AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
actual AS (SELECT sum(ca*cb)::BIGINT AS actual FROM per_key),
hist AS (
  SELECT 'uniform' AS method, 0 AS b, sum(ca) AS na, sum(cb) AS nb,
         sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS da,
         sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS db
  FROM per_key GROUP BY 1, 2
  UNION ALL
  SELECT 'bucket16', user_id // 16, sum(ca), sum(cb),
         sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END),
         sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)
  FROM per_key GROUP BY 1, 2
  UNION ALL
  SELECT 'bucket4', user_id // 4, sum(ca), sum(cb),
         sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END),
         sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)
  FROM per_key GROUP BY 1, 2
),
ests AS (
  SELECT method, sum(na * nb // greatest(da, db))::BIGINT AS est
  FROM hist WHERE greatest(da, db) > 0 GROUP BY 1
  UNION ALL
  SELECT 'perkey', sum(ca*cb)::BIGINT FROM per_key
)
SELECT e.method, e.est, a.actual,
       (abs(e.est - a.actual) * 1000000 // a.actual)::BIGINT AS err_ppm
FROM ests e, actual a
ORDER BY e.method
"""


def q_postings_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list compression audit for the high-df head of the
    inverted index (same >= 25-doc cut and tokenization as
    `inverted_index`): per term, the exact byte cost of the sorted
    doc-id list under delta + LEB128-varint coding (first id absolute
    +1, then gaps — the classic search-engine postings format, and the
    same uvarint the Jelly wire codec emits, jelly/wire.py) vs fixed
    8-byte ids, with savings in ppm.

    Plan shape: ONE shuffle (the term window that sorts each posting
    list) and pure-Catalyst varint length arithmetic — a CASE ladder
    on gap magnitude, no UDF, no bytes actually materialized; the
    audit prices the storage layout at 10^12 postings from metadata
    math alone. Dense doc-id universes make gaps small (head terms:
    1-2 bytes/posting vs 8), exactly the argument for sorting posting
    lists before encoding."""
    docs = _t(spark, sf_dir, "documents")
    terms = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(T.normalized(F.col("text")), " ")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    enc = terms.withColumn(
        "v", F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
    ).withColumn(
        "vbytes",
        F.when(F.col("v") < 128, 1)
        .when(F.col("v") < 16384, 2)
        .when(F.col("v") < 1 << 21, 3)
        .when(F.col("v") < 1 << 28, 4)
        .otherwise(5)
        .cast("long"),
    )
    per_term = enc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings"),
        F.sum("vbytes").cast("long").alias("varint_bytes"),
    )
    return (
        per_term.where(F.col("n_postings") >= 25)
        .select(
            "term",
            "n_postings",
            (F.col("n_postings") * 8).cast("long").alias("raw_bytes"),
            "varint_bytes",
            F.expr(
                "(n_postings * 8 - varint_bytes) * 1000000L "
                "div (n_postings * 8)"
            ).alias("savings_ppm"),
        )
        .orderBy("term")
    )


SQL_POSTINGS_CODEC = rf"""
WITH p AS (
  SELECT DISTINCT doc_id, unnest(string_split({NORM_SQL}, ' ')) AS term
  FROM documents
),
p2 AS (SELECT doc_id, term FROM p WHERE term <> ''),
enc AS (
  SELECT term,
         doc_id - coalesce(
           lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), -1
         ) AS v
  FROM p2
),
vb AS (
  SELECT term,
         CASE WHEN v < 128 THEN 1
              WHEN v < 16384 THEN 2
              WHEN v < 2097152 THEN 3
              WHEN v < 268435456 THEN 4
              ELSE 5 END AS vbytes
  FROM enc
),
per_term AS (
  SELECT term, count(*)::BIGINT AS n_postings,
         sum(vbytes)::BIGINT AS varint_bytes
  FROM vb GROUP BY 1
)
SELECT term, n_postings,
       (n_postings * 8)::BIGINT AS raw_bytes,
       varint_bytes,
       ((n_postings * 8 - varint_bytes) * 1000000 // (n_postings * 8))::BIGINT
         AS savings_ppm
FROM per_term WHERE n_postings >= 25
ORDER BY term
"""


def q_events_rankeval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval evaluation of the popularity recommender:
    rank items by distinct click users (ties to the smaller item id),
    recommend the global top-10 to every user, and score against each
    user's purchased items — precision@10, recall@10, MRR and hit rate
    as exact ppm integers (per-user ratios use integer div, then an
    integer mean, so the numbers are bit-identical on any partitioning
    and any engine).

    Scale shape: the ranking is an item-level aggregate (+ a 10-row
    limit — driver-bounded metadata); scoring is ONE broadcast semi-
    join of the 10-row list against the purchases table and a user-
    level aggregate. Nothing quadratic, no per-user ranking shuffle —
    the evaluation a 10^12-interaction log can actually afford."""
    ev = _t(spark, sf_dir, "events")
    inter = ev.select(
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    pop = (
        inter.where(F.col("event_type") == "click")
        .groupBy("item")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("item"))
        .limit(10)
        .select(
            "item",
            F.row_number()
            .over(
                Window.orderBy(F.col("n_users").desc(), F.col("item"))
            )
            .alias("rank"),
        )
    )
    rel = inter.where(F.col("event_type") == "purchase").select(
        "user_id", "item"
    ).distinct()
    per_user = (
        rel.join(F.broadcast(pop), "item", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(F.col("rank").isNotNull().cast("long")).alias("hits"),
            F.min("rank").alias("first_rank"),
        )
        .select(
            "user_id",
            F.expr("hits * 1000000L div 10").alias("p_ppm"),
            F.expr("hits * 1000000L div n_rel").alias("r_ppm"),
            F.coalesce(
                F.expr("1000000L div first_rank"), F.lit(0)
            ).alias("rr_ppm"),
            (F.col("hits") > 0).cast("long").alias("hit"),
        )
    )
    return per_user.agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr("sum(p_ppm) div count(1)").alias("p_at_k_ppm"),
        F.expr("sum(r_ppm) div count(1)").alias("r_at_k_ppm"),
        F.expr("sum(rr_ppm) div count(1)").alias("mrr_ppm"),
        F.expr("sum(hit) * 1000000L div count(1)").alias("hit_rate_ppm"),
    )


SQL_EVENTS_RANKEVAL = """
WITH inter AS (
  SELECT user_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
),
pop AS (
  SELECT item, count(DISTINCT user_id) AS n_users
  FROM inter WHERE event_type = 'click' GROUP BY 1
),
top10 AS (
  SELECT item,
         row_number() OVER (ORDER BY n_users DESC, item) AS rank
  FROM pop ORDER BY n_users DESC, item LIMIT 10
),
rel AS (
  SELECT DISTINCT user_id, item FROM inter WHERE event_type = 'purchase'
),
per_user AS (
  SELECT r.user_id,
         count(*) AS n_rel,
         sum(CASE WHEN t.rank IS NOT NULL THEN 1 ELSE 0 END) AS hits,
         min(t.rank) AS first_rank
  FROM rel r LEFT JOIN top10 t ON t.item = r.item
  GROUP BY 1
),
scored AS (
  SELECT hits * 1000000 // 10 AS p_ppm,
         hits * 1000000 // n_rel AS r_ppm,
         coalesce(1000000 // first_rank, 0) AS rr_ppm,
         CASE WHEN hits > 0 THEN 1 ELSE 0 END AS hit
  FROM per_user
)
SELECT 10::BIGINT AS k, count(*)::BIGINT AS n_users,
       (sum(p_ppm) // count(*))::BIGINT AS p_at_k_ppm,
       (sum(r_ppm) // count(*))::BIGINT AS r_at_k_ppm,
       (sum(rr_ppm) // count(*))::BIGINT AS mrr_ppm,
       (sum(hit) * 1000000 // count(*))::BIGINT AS hit_rate_ppm
FROM scored
"""


def q_events_dp_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution-bounding audit for a differentially-private hourly
    release: per hour bucket, the max per-user contribution is that
    bucket's user-level L-inf sensitivity; buckets are grouped by it,
    reporting how many rows a per-user-per-bucket cap of 3 would drop.
    This is the pre-noise accounting every DP aggregation pipeline
    runs — the noise scale is calibrated to exactly this sensitivity,
    and the cap trades bias (dropped rows) for a smaller one.

    Two hash aggregations ((user, hour) then hour, then the tiny
    sensitivity histogram) — map-side partials all the way, no joins,
    no windows; the same plan prices a 10^12-row log."""
    ev = _t(spark, sf_dir, "events")
    per_uh = (
        ev.select(
            "user_id", F.date_trunc("hour", "ts").alias("h")
        )
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_h = per_uh.groupBy("h").agg(
        F.max("c").alias("sensitivity"),
        F.sum("c").alias("raw_rows"),
        F.sum(F.least(F.col("c"), F.lit(3))).alias("capped_rows"),
    )
    return (
        per_h.groupBy(F.col("sensitivity").cast("long").alias("sensitivity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("raw_rows").cast("long").alias("raw_rows"),
            F.sum("capped_rows").cast("long").alias("capped_rows"),
            F.sum(
                F.col("raw_rows") - F.col("capped_rows")
            ).cast("long").alias("rows_dropped_by_cap"),
        )
        .orderBy("sensitivity")
    )


SQL_EVENTS_DP_BOUND = """
WITH per_uh AS (
  SELECT user_id, date_trunc('hour', ts) AS h, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
per_h AS (
  SELECT h, max(c) AS sensitivity, sum(c) AS raw_rows,
         sum(least(c, 3)) AS capped_rows
  FROM per_uh GROUP BY 1
)
SELECT sensitivity::BIGINT AS sensitivity,
       count(*)::BIGINT AS n_buckets,
       sum(raw_rows)::BIGINT AS raw_rows,
       sum(capped_rows)::BIGINT AS capped_rows,
       sum(raw_rows - capped_rows)::BIGINT AS rows_dropped_by_cap
FROM per_h GROUP BY 1 ORDER BY 1
"""


def q_orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of orders under minimize-price /
    maximize-date: the orders no other order beats on both axes — the
    multi-objective shortlist query (cheapest-and-freshest) that naive
    engines answer with an O(n^2) dominance self-join.

    Sort-scan formulation instead: per distinct price keep the max
    date (+ tie count) — one hash aggregate over the table — then a
    single ordered window over the PER-PRICE aggregate computes the
    strict prefix-max of dates over cheaper prices; a point is on the
    skyline iff its date strictly beats that prefix max. Prices are
    integer cents so the grouping is exact. The window runs over the
    aggregate (bounded by distinct prices, not rows); at 10^12 rows
    with dense price domains the same scan splits into the two-level
    bucket prefix used by doc_compaction — the skyline is
    distributive, skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)).
    The oracle IS the quadratic NOT-EXISTS dominance join."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_price = (
        o.select(cents.alias("price_cents"), F.col("o_orderdate").alias("d"))
        .groupBy("price_cents")
        .agg(F.max("d").alias("best_date"))
    )
    # ties at (price, best_date) all survive; count them exactly
    ties = (
        o.select(cents.alias("price_cents"), F.col("o_orderdate").alias("d"))
        .groupBy("price_cents", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ties"))
    )
    w = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = (
        per_price.withColumn("prefix_best", F.max("best_date").over(w))
        .where(
            F.col("prefix_best").isNull()
            | (F.col("best_date") > F.col("prefix_best"))
        )
        .select("price_cents", F.col("best_date").alias("d"))
    )
    return (
        sky.join(ties, ["price_cents", "d"])
        .select(
            "price_cents",
            F.unix_timestamp(F.col("d")).alias("order_epoch"),
            "n_ties",
        )
        .orderBy("price_cents")
    )


SQL_ORDERS_SKYLINE = """
WITH pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         o_orderdate AS d
  FROM orders
),
sky AS (
  SELECT DISTINCT price_cents, d
  FROM pts p
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.price_cents <= p.price_cents AND q.d >= p.d
      AND (q.price_cents < p.price_cents OR q.d > p.d)
  )
),
ties AS (
  SELECT price_cents, d, count(*)::BIGINT AS n_ties
  FROM pts GROUP BY 1, 2
)
SELECT s.price_cents, epoch(s.d)::BIGINT AS order_epoch, t.n_ties
FROM sky s JOIN ties t ON t.price_cents = s.price_cents AND t.d = s.d
ORDER BY s.price_cents
"""


def q_doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup audit — the storage-side near-dup
    attack (restic/borg/LBFS style): cut every document at positions
    where the hash of the trailing 8-gram ≡ 0 (mod 32), so chunk
    boundaries survive insertions/deletions (unlike fixed-width
    blocks), then price chunk-level dedup across the corpus: total vs
    distinct chunk bytes and the savings in ppm.

    Plan shape: boundary detection runs INSIDE each row with
    higher-order functions (sequence → transform → filter — no
    per-position explode, so the shuffle never sees position rows,
    only the ~len/32 chunks per doc); chunk identity is the portable
    sha-60 hash, so the oracle (which CAN afford the row-per-position
    window form) reproduces every byte count exactly. One explode of
    chunk arrays + two hash aggregates; nothing touches the driver."""
    docs = _t(spark, sf_dir, "documents")
    n = F.length("text")
    gram_hash = (
        "pmod(conv(substring(sha2(substring(text, i - 7, 8), 256), 1, 15),"
        " 16, 10), 32)"
    )
    bounds = F.when(
        n >= 8,
        F.expr(
            f"filter(transform(sequence(8, greatest(length(text), 8)),"
            f" i -> CASE WHEN {gram_hash} = 0 THEN i END),"
            " x -> x IS NOT NULL)"
        ),
    ).otherwise(F.expr("array()"))
    chunked = (
        docs.withColumn(
            "bnds",
            F.array_union(bounds, F.array(n.cast("int"))),
        )
        .withColumn(
            "starts",
            F.expr(
                "concat(array(0), slice(bnds, 1, size(bnds) - 1))"
            ),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(bnds, starts, (e, s) ->"
                    " struct(e - s AS clen,"
                    " substring(text, s + 1, e - s) AS ctext))"
                )
            ).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.clen").cast("long").alias("clen"),
            T.hex_hash(F.col("c.ctext")).alias("chash"),
        )
    )
    per_chunk = chunked.groupBy("chash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("clen").alias("clen"),
    )
    return chunked.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("clen").cast("long").alias("chunk_bytes"),
    ).crossJoin(
        F.broadcast(
            per_chunk.agg(
                F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
                F.sum("clen").cast("long").alias("distinct_chunk_bytes"),
            )
        )
    ).select(
        "n_docs",
        "n_chunks",
        "n_distinct_chunks",
        "chunk_bytes",
        "distinct_chunk_bytes",
        F.expr(
            "(chunk_bytes - distinct_chunk_bytes) * 1000000L"
            " div chunk_bytes"
        ).alias("savings_ppm"),
    )


SQL_DOC_CDC_CHUNKS = """
WITH pos AS (
  SELECT d.doc_id, d.text, gs.i
  FROM documents d
  JOIN LATERAL (
    SELECT unnest(generate_series(8, length(d.text))) AS i
  ) gs ON length(d.text) >= 8
  WHERE ('0x' || substring(sha256(substring(d.text, gs.i - 7, 8)), 1, 15))::BIGINT % 32 = 0
),
bounds AS (
  SELECT doc_id, text, i FROM pos
  UNION
  SELECT doc_id, text, length(text) AS i FROM documents
),
chunks AS (
  SELECT doc_id,
         i - (coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)) AS clen,
         substring(
           text,
           coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1,
           i - coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
         ) AS ctext
  FROM bounds
),
hashed AS (
  SELECT doc_id, clen::BIGINT AS clen,
         ('0x' || substring(sha256(ctext), 1, 15))::BIGINT AS chash
  FROM chunks
),
tot AS (
  SELECT count(DISTINCT doc_id)::BIGINT AS n_docs,
         count(*)::BIGINT AS n_chunks,
         sum(clen)::BIGINT AS chunk_bytes
  FROM hashed
),
dist AS (
  SELECT count(*)::BIGINT AS n_distinct_chunks,
         sum(clen)::BIGINT AS distinct_chunk_bytes
  FROM (SELECT chash, min(clen) AS clen FROM hashed GROUP BY 1)
)
SELECT n_docs, n_chunks, n_distinct_chunks, chunk_bytes,
       distinct_chunk_bytes,
       ((chunk_bytes - distinct_chunk_bytes) * 1000000 // chunk_bytes)::BIGINT
         AS savings_ppm
FROM tot, dist
"""


def q_events_interval_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-set subtraction by boundary sweep: per-user active
    session intervals (the 30-min-gap sessions of events_sessions)
    minus ±60 s blackout windows around error events — the SLA
    accounting question "how much active time was actually unimpaired"
    that naive engines answer with an interval×interval overlap join.

    Sweep instead: every interval contributes +1/-1 boundary deltas
    (session depth S, blackout depth B); deltas are pre-aggregated per
    (user, instant), one ordered window per user computes running
    depths, and each inter-boundary segment adds its length to exactly
    one bucket (active∧clear vs active∧blocked) — O(n log n) in
    boundaries, one shuffle on user_id, no join at all. Overlapping
    blackouts and back-to-back sessions are handled by depth counting
    with no special cases. Integer epoch-second arithmetic end-to-end."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.withColumn(
            "new_session",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.col("ts")
                    > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_idx",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("lo"),
            F.unix_timestamp(F.max("ts")).alias("hi"),
        )
    )
    blk = ev.where(F.col("event_type") == "error").select(
        "user_id",
        (F.unix_timestamp("ts") - 60).alias("lo"),
        (F.unix_timestamp("ts") + 60).alias("hi"),
    )

    def deltas(df: DataFrame, col: str) -> DataFrame:
        return df.select(
            "user_id", F.col("lo").alias("t"), F.lit(1).alias(col)
        ).unionByName(
            df.select(
                "user_id", F.col("hi").alias("t"), F.lit(-1).alias(col)
            )
        )

    bounds = (
        deltas(sess, "ds")
        .withColumn("db", F.lit(0))
        .unionByName(
            deltas(blk, "db").withColumn("ds", F.lit(0))
        )
        .groupBy("user_id", "t")
        .agg(F.sum("ds").alias("ds"), F.sum("db").alias("db"))
    )
    ws = Window.partitionBy("user_id").orderBy("t")
    swept = (
        bounds.withColumn(
            "s_depth",
            F.sum("ds").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "b_depth",
            F.sum("db").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("seg", F.lead("t").over(ws) - F.col("t"))
        .where(F.col("seg").isNotNull() & (F.col("s_depth") > 0))
    )
    return swept.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("seg").cast("long").alias("session_seconds"),
        F.sum(F.when(F.col("b_depth") > 0, F.col("seg")).otherwise(0))
        .cast("long")
        .alias("blocked_seconds"),
        F.sum(F.when(F.col("b_depth") == 0, F.col("seg")).otherwise(0))
        .cast("long")
        .alias("retained_seconds"),
    )


SQL_EVENTS_INTERVAL_DIFF = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess_tagged AS (
  SELECT user_id, ts,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS session_idx
  FROM flagged
),
sess AS (
  SELECT user_id, floor(epoch(min(ts)))::BIGINT AS lo, floor(epoch(max(ts)))::BIGINT AS hi
  FROM sess_tagged GROUP BY user_id, session_idx
),
blk AS (
  SELECT user_id, floor(epoch(ts))::BIGINT - 60 AS lo, floor(epoch(ts))::BIGINT + 60 AS hi
  FROM events WHERE event_type = 'error'
),
raw AS (
  SELECT user_id, lo AS t, 1 AS ds, 0 AS db FROM sess
  UNION ALL SELECT user_id, hi, -1, 0 FROM sess
  UNION ALL SELECT user_id, lo, 0, 1 FROM blk
  UNION ALL SELECT user_id, hi, 0, -1 FROM blk
),
bounds AS (
  SELECT user_id, t, sum(ds) AS ds, sum(db) AS db
  FROM raw GROUP BY 1, 2
),
swept AS (
  SELECT user_id,
         sum(ds) OVER w2 AS s_depth,
         sum(db) OVER w2 AS b_depth,
         lead(t) OVER (PARTITION BY user_id ORDER BY t) - t AS seg
  FROM bounds
  WINDOW w2 AS (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING)
)
SELECT count(DISTINCT user_id)::BIGINT AS n_users,
       sum(seg)::BIGINT AS session_seconds,
       sum(CASE WHEN b_depth > 0 THEN seg ELSE 0 END)::BIGINT
         AS blocked_seconds,
       sum(CASE WHEN b_depth = 0 THEN seg ELSE 0 END)::BIGINT
         AS retained_seconds
FROM swept
WHERE seg IS NOT NULL AND s_depth > 0
"""


def q_orders_dictenc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding audit for columnar storage — the per-column
    decision a parquet writer makes: plain encoding costs the raw
    value bytes; dictionary encoding costs the distinct values once
    plus one fixed-width index per row (width = the bytes needed for
    the dictionary size). Priced exactly for three order columns that
    span the interesting regimes: o_orderstatus (3 values — dictionary
    wins hugely), o_orderpriority (5 values — wins), and o_orderkey
    rendered as a string (all-distinct — dictionary LOSES, the
    pathological case every format guards against with a fallback).

    One aggregation per column over (value-length sums, NDV) — pure
    metadata math, one scan, no joins; this is how a 10^12-row writer
    picks encodings from column statistics without a second pass."""
    o = _t(spark, sf_dir, "orders")
    cols = [
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_orderkey_str", F.col("o_orderkey").cast("string")),
    ]
    parts = []
    for name, c in cols:
        stats = o.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.length(c)).cast("long").alias("plain_bytes"),
            F.countDistinct(c).cast("long").alias("ndv"),
        )
        dict_values = (
            o.select(c.alias("v"))
            .distinct()
            .agg(F.sum(F.length("v")).cast("long").alias("dict_value_bytes"))
        )
        parts.append(
            stats.crossJoin(F.broadcast(dict_values)).select(
                F.lit(name).alias("column"),
                "n_rows",
                "ndv",
                "plain_bytes",
                # index width in bytes: 1 while ndv <= 256, else 2/3/4
                F.expr(
                    "dict_value_bytes + n_rows * (CASE"
                    " WHEN ndv <= 256 THEN 1"
                    " WHEN ndv <= 65536 THEN 2"
                    " WHEN ndv <= 16777216 THEN 3"
                    " ELSE 4 END)"
                ).cast("long").alias("dict_bytes"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "column",
        "n_rows",
        "ndv",
        "plain_bytes",
        "dict_bytes",
        (F.col("dict_bytes") < F.col("plain_bytes")).alias("dict_wins"),
        F.expr(
            "(plain_bytes - dict_bytes) * 1000000L div plain_bytes"
        ).alias("savings_ppm"),
    ).orderBy("column")


SQL_ORDERS_DICTENC = """
WITH cols AS (
  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'o_orderkey_str', o_orderkey::VARCHAR FROM orders
),
stats AS (
  SELECT col_name, count(*)::BIGINT AS n_rows,
         sum(length(v))::BIGINT AS plain_bytes,
         count(DISTINCT v)::BIGINT AS ndv
  FROM cols GROUP BY 1
),
dv AS (
  SELECT col_name, sum(length(v))::BIGINT AS dict_value_bytes
  FROM (SELECT DISTINCT col_name, v FROM cols) GROUP BY 1
)
SELECT s.col_name AS "column", s.n_rows, s.ndv, s.plain_bytes,
       (d.dict_value_bytes + s.n_rows * (CASE
          WHEN s.ndv <= 256 THEN 1
          WHEN s.ndv <= 65536 THEN 2
          WHEN s.ndv <= 16777216 THEN 3
          ELSE 4 END))::BIGINT AS dict_bytes,
       (d.dict_value_bytes + s.n_rows * (CASE
          WHEN s.ndv <= 256 THEN 1
          WHEN s.ndv <= 65536 THEN 2
          WHEN s.ndv <= 16777216 THEN 3
          ELSE 4 END)) < s.plain_bytes AS dict_wins,
       ((s.plain_bytes - (d.dict_value_bytes + s.n_rows * (CASE
          WHEN s.ndv <= 256 THEN 1
          WHEN s.ndv <= 65536 THEN 2
          WHEN s.ndv <= 16777216 THEN 3
          ELSE 4 END))) * 1000000 // s.plain_bytes)::BIGINT AS savings_ppm
FROM stats s JOIN dv d USING (col_name)
ORDER BY s.col_name
"""


def q_events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate accounting (the SRE alerting
    arithmetic): against a 1% error budget (10000 ppm), compute the
    error rate of every 1-hour and every 6-hour tumbling window and
    report, per window size, how many windows exist, how many burn at
    >= 2x budget (the fast-burn page condition), the worst window's
    rate, and the overall rate — all in exact ppm integers.

    Two hash aggregations per window size over (epoch div width)
    bucket keys — map-side partials, no windows-over-rows, no joins;
    multi-window burn alerting at 10^12 events is exactly this plan."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.unix_timestamp("ts").alias("es"),
        (F.col("event_type") == "error").cast("long").alias("is_err"),
    )
    parts = []
    for label, width in (("1h", 3600), ("6h", 21600)):
        per_w = base.groupBy(
            F.expr(f"es div {width}L").alias("w")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_err").alias("e"),
        ).select(
            "w",
            "n",
            "e",
            F.expr("e * 1000000L div n").alias("err_ppm"),
        )
        parts.append(
            per_w.agg(
                F.lit(label).alias("window"),
                F.count(F.lit(1)).cast("long").alias("n_windows"),
                F.sum(
                    (F.col("err_ppm") >= 20000).cast("long")
                ).cast("long").alias("n_burning"),
                F.max("err_ppm").cast("long").alias("worst_err_ppm"),
                F.expr("sum(e) * 1000000L div sum(n)")
                .cast("long")
                .alias("overall_err_ppm"),
            )
        )
    return parts[0].unionByName(parts[1]).orderBy("window")


SQL_EVENTS_SLO_BURN = """
WITH base AS (
  SELECT floor(epoch(ts))::BIGINT AS es,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
),
w1 AS (
  SELECT es // 3600 AS w, count(*) AS n, sum(is_err) AS e,
         sum(is_err) * 1000000 // count(*) AS err_ppm
  FROM base GROUP BY 1
),
w6 AS (
  SELECT es // 21600 AS w, count(*) AS n, sum(is_err) AS e,
         sum(is_err) * 1000000 // count(*) AS err_ppm
  FROM base GROUP BY 1
)
SELECT '1h' AS "window", count(*)::BIGINT AS n_windows,
       sum(CASE WHEN err_ppm >= 20000 THEN 1 ELSE 0 END)::BIGINT AS n_burning,
       max(err_ppm)::BIGINT AS worst_err_ppm,
       (sum(e) * 1000000 // sum(n))::BIGINT AS overall_err_ppm
FROM w1
UNION ALL
SELECT '6h', count(*)::BIGINT,
       sum(CASE WHEN err_ppm >= 20000 THEN 1 ELSE 0 END)::BIGINT,
       max(err_ppm)::BIGINT,
       (sum(e) * 1000000 // sum(n))::BIGINT
FROM w6
ORDER BY "window"
"""


def q_kg_pathcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-path census of the condensation DAG: for every SCC,
    the number of directed paths reaching it from source SCCs (build
    "how many independent upstream chains feed this target" — the
    fan-in diagnostic behind rebuild-impact analysis), reported as a
    (n_paths, n_sccs) histogram.

    Spark path: SCC assignment + iterative SUM-relaxation over the
    contracted edge set (operators/scc.py condensation_path_counts) —
    the additive sibling of condensation_levels' max-propagation,
    exact after depth-of-DAG one-shuffle rounds. The oracle ENUMERATES
    every path with a recursive UNION ALL walk and counts endpoint
    occurrences — exponential in general, affordable only because it
    is an oracle on the bounded census graph."""
    from pyjelly_spark.operators.scc import (
        condensation_path_counts,
        strongly_connected_components,
    )

    edges, nodes = _dep_graph(spark, sf_dir)
    assign = strongly_connected_components(edges, nodes)
    pc = condensation_path_counts(edges, assign)
    return (
        pc.groupBy(F.col("n_paths").cast("long").alias("n_paths"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sccs"))
        .orderBy("n_paths")
    )


SQL_KG_PATHCOUNT = f"""
WITH RECURSIVE {_SCC_SQL_CORE},
ce AS (
  SELECT DISTINCT s1.scc AS src, s2.scc AS dst
  FROM e JOIN sccid s1 ON s1.node = e.s JOIN sccid s2 ON s2.node = e.t
  WHERE s1.scc <> s2.scc
),
allscc AS (SELECT DISTINCT scc FROM sccid),
sources AS (
  SELECT scc FROM allscc
  WHERE scc NOT IN (SELECT dst FROM ce)
),
walk AS (
  SELECT scc AS v FROM sources
  UNION ALL
  SELECT ce.dst AS v FROM walk w JOIN ce ON ce.src = w.v
),
pc AS (SELECT v AS scc, count(*)::BIGINT AS n_paths FROM walk GROUP BY 1)
SELECT n_paths, count(*)::BIGINT AS n_sccs
FROM pc GROUP BY 1 ORDER BY 1
"""




def q_events_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch per event_type, m=256 registers
    on the portable sha-60 hash (operators/sketches.py::hll_distinct).
    The gate pins the register matrix bit-exactly through the integer
    harmonic-mean estimate — est, zero-register count, and err_ppm vs
    the exact distinct all reproduce in DuckDB because no float and no
    engine-private hash ever enters. Scale shape: one partial-aggregated
    shuffle on (event_type, register) with map-side state bounded by
    256 rows per group per task; no distinct pre-pass (max() absorbs
    duplicates). At sf0.01 group cardinalities sit in HLL's
    low-range regime so err_ppm is large — the raw sketch (without
    linear-counting correction, which would need ln()) is what is
    pinned; zero_regs is emitted for consumers that apply it."""
    from pyjelly_spark.operators.sketches import hll_distinct

    return hll_distinct(
        _t(spark, sf_dir, "events"), "event_type", "user_id", m=256
    ).orderBy("event_type")


SQL_EVENTS_HLL = """
WITH h AS (
  SELECT event_type,
         ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
), rho AS (
  SELECT event_type, h % 256 AS reg,
         CASE WHEN h // 256 = 0 THEN 53
              ELSE 53 - length(bin(h // 256)) END AS rho
  FROM h
), regs AS (
  SELECT event_type, reg, max(rho) AS mreg
  FROM rho GROUP BY 1, 2
), s AS (
  SELECT event_type,
         count(*)::BIGINT AS registers_used,
         sum((1::BIGINT << (53 - mreg))::BIGINT)::BIGINT AS s_obs
  FROM regs GROUP BY 1
), e AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_n
  FROM events GROUP BY 1
), est AS (
  SELECT s.event_type, s.registers_used,
         (256 - s.registers_used)::BIGINT AS zero_regs,
         (423992952297968225866481664::HUGEINT
          // ((s.s_obs + (256 - s.registers_used) * 9007199254740992)::HUGEINT
              * 1000000))::BIGINT AS est_distinct,
         e.exact_n
  FROM s JOIN e USING (event_type)
)
SELECT event_type, registers_used, zero_regs, est_distinct, exact_n,
       (abs(est_distinct - exact_n) * 1000000 // exact_n)::BIGINT AS err_ppm
FROM est
ORDER BY event_type
"""




def q_events_gorilla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series timestamp compression audit, Gorilla-style (Facebook
    Gorilla / TSDB heads): per series (user_id, event_type) the exact
    byte cost of delta-of-delta coding the microsecond timestamps —
    first point 8 bytes absolute, second point the zigzag-varint first
    delta, every later point zigzag-varint(d_i - d_{i-1}) — vs plain
    8-byte timestamps, rolled up per event_type with savings in ppm.

    Plan shape: ONE shuffle (the per-series sort window; delta and
    lagged-delta share the same window spec so Catalyst computes both
    in one Window operator) then a partial-aggregated rollup —
    pure-Catalyst zigzag + LEB128 length ladder, no UDF, no bytes
    materialized: the audit prices a 10^12-point TSDB layout from
    metadata math alone. Regular arrival spacing makes dod ~ 0 (1
    byte/point vs 8) — the whole Gorilla argument, measured exactly.
    Ordering ties broken by event_id so the coding is deterministic on
    any partitioning; timestamps priced at microsecond precision
    (NTZ timestampdiff micros / epoch_us agree exactly: both are
    integer microsecond counts and only deltas are priced)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    deltas = (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            # NTZ-safe epoch micros; only deltas are priced, so the
            # origin cancels and epoch_us() on the oracle side matches.
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
            ).alias("t"),
        )
        .withColumn("d", F.col("t") - F.lag("t").over(w))
        .withColumn("dod", F.col("d") - F.lag("d").over(w))
        .withColumn(
            "z",
            F.expr(
                "CASE WHEN d IS NULL THEN NULL "
                "WHEN dod IS NULL THEN IF(d >= 0, 2*d, -2*d - 1) "
                "ELSE IF(dod >= 0, 2*dod, -2*dod - 1) END"
            ),
        )
        .withColumn(
            "vbytes",
            F.when(F.col("z").isNull(), 8)  # series head: absolute ts
            .when(F.col("z") < 1 << 7, 1)
            .when(F.col("z") < 1 << 14, 2)
            .when(F.col("z") < 1 << 21, 3)
            .when(F.col("z") < 1 << 28, 4)
            .when(F.col("z") < 1 << 35, 5)
            .when(F.col("z") < 1 << 42, 6)
            .when(F.col("z") < 1 << 49, 7)
            .when(F.col("z") < 1 << 56, 8)
            .when(F.col("z") < (1 << 63) - 1, 9)
            .otherwise(10)
            .cast("long"),
        )
    )
    return (
        deltas.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_series"),
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (F.count(F.lit(1)) * 8).cast("long").alias("plain_bytes"),
            F.sum("vbytes").cast("long").alias("gorilla_bytes"),
        )
        .select(
            "event_type",
            "n_series",
            "n_points",
            "plain_bytes",
            "gorilla_bytes",
            F.expr(
                "(plain_bytes - gorilla_bytes) * 1000000L div plain_bytes"
            ).alias("savings_ppm"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_GORILLA = """
WITH t AS (
  SELECT user_id, event_type, event_id, ts, epoch_us(ts) AS t
  FROM events
), d AS (
  SELECT user_id, event_type, event_id, ts, t,
         t - lag(t) OVER w AS d
  FROM t
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), dd AS (
  SELECT user_id, event_type, d,
         d - lag(d) OVER w AS dod
  FROM d
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), z AS (
  SELECT user_id, event_type,
         CASE WHEN d IS NULL THEN NULL
              WHEN dod IS NULL THEN
                CASE WHEN d >= 0 THEN 2*d ELSE -2*d - 1 END
              ELSE CASE WHEN dod >= 0 THEN 2*dod ELSE -2*dod - 1 END
         END AS z
  FROM dd
), vb AS (
  SELECT user_id, event_type,
         CASE WHEN z IS NULL THEN 8
              WHEN z < 128 THEN 1
              WHEN z < 16384 THEN 2
              WHEN z < 2097152 THEN 3
              WHEN z < 268435456 THEN 4
              WHEN z < 34359738368 THEN 5
              WHEN z < 4398046511104 THEN 6
              WHEN z < 562949953421312 THEN 7
              WHEN z < 72057594037927936 THEN 8
              WHEN z < 9223372036854775807 THEN 9
              ELSE 10 END AS vbytes
  FROM z
)
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS n_series,
       count(*)::BIGINT AS n_points,
       (count(*) * 8)::BIGINT AS plain_bytes,
       sum(vbytes)::BIGINT AS gorilla_bytes,
       ((count(*) * 8 - sum(vbytes)) * 1000000 // (count(*) * 8))::BIGINT
         AS savings_ppm
FROM vb GROUP BY 1
ORDER BY event_type
"""




def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection over the documents table
    (functions/text.py::winnow_fingerprints, k=5-word shingles, w=4
    windows, rightmost-min tie-break): per doc the exact selected
    fingerprint set, pinned by count, density, and a modular checksum
    of the selected gram hashes. Entirely in-row higher-order-function
    arithmetic on the portable sha-60 hash — zero shuffle before the
    readout, no explode — so the DuckDB oracle (the same arithmetic as
    list comprehensions) reproduces the set bit-exactly."""
    from pyjelly_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=5, w=4
    ).orderBy("doc_id")


SQL_DOC_WINNOW = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
           x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id,
         [ ('0x' || substring(sha256(array_to_string(words[i:i+4], ' ')), 1, 15))::BIGINT
           for i in generate_series(1, greatest(len(words) - 4, 0)) ] AS grams
  FROM t
), s AS (
  SELECT doc_id, grams, len(grams) AS n_grams,
         least(4, len(grams)) AS ww
  FROM g
), sel AS (
  SELECT doc_id, grams, n_grams,
         CASE WHEN n_grams = 0 THEN 0 ELSE n_grams - ww + 1 END AS n_windows,
         list_distinct(
           [ p + ww - 1 - (list_min(
               [ grams[p+o] * 4 + (ww - 1 - o)
                 for o in generate_series(0, ww - 1) ]) % 4)
             for p in generate_series(1, CASE WHEN n_grams = 0 THEN 0
                                            ELSE n_grams - ww + 1 END) ]
         ) AS sel
  FROM s
)
SELECT doc_id,
       n_grams::BIGINT AS n_grams,
       n_windows::BIGINT AS n_windows,
       len(sel)::BIGINT AS n_fp,
       (CASE WHEN n_windows = 0 THEN 0
             ELSE len(sel) * 1000000 // n_windows END)::BIGINT AS density_ppm,
       coalesce(list_sum([ grams[j] % 1000000007 for j in sel ]), 0)::BIGINT
         AS fp_chk
FROM sel
ORDER BY doc_id
"""




def q_doc_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact closed-form OLS of word count ~ 1 + n_chars/100 + distinct
    word count over documents (operators/regression.py::ols_fit_2feature).
    All three columns are integers, so the normal-equation sufficient
    statistics are exact and the Cramer-determinant coefficient ratios
    truncate identically in Spark decimal(38,0) and DuckDB HUGEINT —
    a regression fit gated bit-for-bit, immune to float summation
    order. Plan: ONE map-side-partial aggregation pass (9 sums) over
    the corpus; the solve is arithmetic on a 1-row frame. That single
    bounded-state pass is the whole argument for sufficient-statistics
    ML at 100 TB."""
    from pyjelly_spark.operators.regression import ols_fit_2feature

    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        F.expr("n_chars div 100").alias("x1"),
        F.expr(
            "size(array_distinct(filter(split("
            "lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '),"
            " x -> x <> '')))"
        ).cast("long").alias("x2"),
        F.expr(
            "size(filter(split("
            "lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '),"
            " x -> x <> ''))"
        ).cast("long").alias("y"),
    )
    return ols_fit_2feature(feats, "x1", "x2", "y")


SQL_DOC_OLS = r"""
WITH f AS (
  SELECT n_chars // 100 AS x1,
         len(list_distinct(list_filter(
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
           t -> t <> '')))::BIGINT AS x2,
         len(list_filter(
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
           t -> t <> ''))::BIGINT AS y
  FROM documents
), s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2,
         sum(y)::HUGEINT AS sy,
         sum(x1*x1)::HUGEINT AS s11, sum(x1*x2)::HUGEINT AS s12,
         sum(x2*x2)::HUGEINT AS s22,
         sum(x1*y)::HUGEINT AS s1y, sum(x2*y)::HUGEINT AS s2y
  FROM f
)
SELECT n::BIGINT AS n,
       ((sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
         + s2*(s1y*s12 - s11*s2y)) * 1000000
        // (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
            + s2*(s1*s12 - s11*s2)))::BIGINT AS beta0_x1e6,
       ((n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
         + s2*(s1*s2y - s1y*s2)) * 1000000
        // (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
            + s2*(s1*s12 - s11*s2)))::BIGINT AS beta1_x1e6,
       ((n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
         + sy*(s1*s12 - s11*s2)) * 1000000
        // (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
            + s2*(s1*s12 - s11*s2)))::BIGINT AS beta2_x1e6,
       ((n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
         + s2*(s1*s12 - s11*s2)) = 0) AS singular
FROM s
"""




def _synth_cycle_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic undirected test graph over doc_ids (one direction
    per edge, s != t, distinct): per 24-id group a cycle of length
    ell = 3 + (g*5) % 10, pendant trees on the remaining ids, and a
    chord (0,2) on every third group. Mirrored in closed form by the
    kg_bipartite / kg_msf oracles."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    vx = docs.select(
        F.col("doc_id").alias("v"),
        F.expr("doc_id div 24").alias("g"),
        F.expr("doc_id % 24").alias("r"),
        F.expr("3 + (doc_id div 24 * 5) % 10").alias("ell"),
    )
    cyc = vx.where(F.col("r") < F.col("ell")).select(
        F.col("v").alias("s"), F.expr("g * 24 + (r + 1) % ell").alias("t")
    )
    pend = vx.where(F.col("r") >= F.col("ell")).select(
        F.col("v").alias("s"), F.expr("g * 24 + r % ell").alias("t")
    )
    chord = (
        vx.where((F.col("r") == 0) & (F.col("g") % 3 == 0) & (F.col("ell") >= 4))
        .select(F.col("v").alias("s"), F.expr("g * 24 + 2").alias("t"))
    )
    return (
        cyc.unionByName(pend)
        .unionByName(chord)
        .where((F.col("s") < n) & (F.col("t") < n) & (F.col("s") != F.col("t")))
        .distinct()
    )


def q_kg_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartiteness census via the doubled-cover reduction: every
    undirected edge (u,v) becomes (u#0,v#1) and (u#1,v#0), ONE run of
    the distributed large-star/small-star CC operator
    (operators/components.py) labels the cover, and a component is
    bipartite iff its two parity copies stay in separate cover
    components — comp(v#0) != comp(v#1). No BFS, no per-component
    driver work: bipartiteness of every component of a 10^9-edge graph
    falls out of the same O(log n)-round CC machinery the KG
    canonicalizer already uses, and the original component id is
    recovered as least(strip(comp(v#0)), strip(comp(v#1))) without a
    second CC run.

    Graph: deterministic closed-form mix over doc_ids (the kg_scc
    pattern) — per 24-id group a cycle of length ell = 3 + (g*5) % 10
    (odd ell => odd cycle), pendant trees on the remaining ids
    (parity-neutral), and a chord (0,2) on every third group (turns
    even cycles odd via the induced triangle). Node ids are zero-
    padded so the CC representative's lexicographic min equals the
    numeric min the oracle computes. Oracle: parity-annotated
    recursive-CTE closure — a node sits on an odd closed walk iff it
    reaches itself with parity 1."""
    from pyjelly_spark.operators.components import connected_components

    e = _synth_cycle_graph(spark, sf_dir)
    # doubled cover; CC symmetrizes internally, so one direction is enough
    cover = e.select(
        F.format_string("n%08d#0", "s").alias("src"),
        F.format_string("n%08d#1", "t").alias("dst"),
    ).unionByName(
        e.select(
            F.format_string("n%08d#1", "s").alias("src"),
            F.format_string("n%08d#0", "t").alias("dst"),
        )
    )
    cc = connected_components(cover)
    per_node = (
        cc.select(
            F.expr("cast(substring(substring_index(node, '#', 1), 2) as bigint)").alias("v"),
            F.expr("substring_index(node, '#', -1)").alias("par"),
            F.expr("cast(substring(substring_index(component, '#', 1), 2) as bigint)").alias("comp_stripped"),
            F.col("component").alias("comp_full"),
        )
        .groupBy("v")
        .agg(
            F.min("comp_stripped").alias("component"),
            # two distinct cover components per node <=> bipartite side holds
            F.countDistinct("comp_full").alias("n_cover"),
        )
    )
    return (
        per_node.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min(F.col("n_cover") == 2).cast("boolean").alias("is_bipartite"),
        )
        .orderBy("component")
    )


SQL_KG_BIPARTITE = """
WITH RECURSIVE
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
),
e0 AS (
  SELECT DISTINCT s, t FROM rawe, nn WHERE s < nn.n AND t < nn.n AND s <> t
),
und AS (
  SELECT s, t FROM e0 UNION SELECT t, s FROM e0
),
preach AS (
  SELECT s, t, 1 AS par FROM und
  UNION
  SELECT r.s, u.t, 1 - r.par FROM preach r JOIN und u ON u.s = r.t
),
comp AS (
  SELECT x.v AS v, least(x.v, min(r.t)) AS component
  FROM vx x LEFT JOIN preach r ON r.s = x.v
  GROUP BY x.v
),
odd AS (
  SELECT DISTINCT s AS v FROM preach WHERE s = t AND par = 1
),
flag AS (
  SELECT c.v, c.component, (o.v IS NULL) AS bip
  FROM comp c LEFT JOIN odd o ON o.v = c.v
)
SELECT component, count(*)::BIGINT AS n_nodes,
       bool_and(bip) AS is_bipartite
FROM flag
WHERE v IN (SELECT s FROM und)
GROUP BY component
ORDER BY component
"""




def q_events_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation of click demand against purchase supply lots
    per user (operators/timeseries.py::fifo_allocate) — lot/demand
    matching by cumulative-space boundary sweep: allocation rows are
    the gaps between merged breakpoints, so the pairing costs
    n_lots + n_demands - 1 rows per user instead of the quadratic
    interval join, all on ONE user_id shuffle. Amounts are exact
    integer cents (floor(value*100)); the checksum folds each
    segment's (length, lot ordinal, demand ordinal), pinning the
    exact FIFO pairing — both ordinals advance through zero-amount
    lots exactly as the textbook semantics require."""
    from pyjelly_spark.operators.timeseries import fifo_allocate

    return fifo_allocate(_t(spark, sf_dir, "events")).orderBy("user_id")


SQL_EVENTS_FIFO = """
WITH sup AS (
  SELECT user_id,
         sum(floor(value*100)::BIGINT)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
  FROM events WHERE event_type = 'purchase'
), dem AS (
  SELECT user_id,
         sum(floor(value*100)::BIGINT)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
  FROM events WHERE event_type = 'click'
), tot AS (
  SELECT s.user_id, s.n_lots, d.n_demands, s.s_tot, d.d_tot,
         least(s.s_tot, d.d_tot) AS t_alloc
  FROM (SELECT user_id, max(pos) AS s_tot, count(*)::BIGINT AS n_lots
        FROM sup GROUP BY 1) s
  JOIN (SELECT user_id, max(pos) AS d_tot, count(*)::BIGINT AS n_demands
        FROM dem GROUP BY 1) d USING (user_id)
), pts AS (
  SELECT user_id, pos, sum(sc)::BIGINT AS sc, sum(dc)::BIGINT AS dc FROM (
    SELECT user_id, pos, 1 AS sc, 0 AS dc FROM sup
    UNION ALL
    SELECT user_id, pos, 0 AS sc, 1 AS dc FROM dem
  ) GROUP BY 1, 2
), segs AS (
  SELECT p.user_id, p.pos,
         coalesce(lag(p.pos) OVER
           (PARTITION BY p.user_id ORDER BY p.pos), 0) AS prev_pos,
         coalesce(sum(p.sc) OVER
           (PARTITION BY p.user_id ORDER BY p.pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
           AS lot_ord,
         coalesce(sum(p.dc) OVER
           (PARTITION BY p.user_id ORDER BY p.pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
           AS dem_ord
  FROM pts p
), alloc AS (
  SELECT s.user_id, t.n_lots, t.n_demands, t.s_tot, t.d_tot, t.t_alloc,
         s.pos - s.prev_pos AS seg_len, s.lot_ord, s.dem_ord
  FROM segs s JOIN tot t USING (user_id)
  WHERE s.pos <= t.t_alloc AND s.pos > s.prev_pos
)
SELECT user_id,
       max(n_lots)::BIGINT AS n_lots,
       max(n_demands)::BIGINT AS n_demands,
       count(*)::BIGINT AS n_allocs,
       max(t_alloc)::BIGINT AS allocated_c,
       (max(s_tot) - max(t_alloc))::BIGINT AS surplus_c,
       (max(d_tot) - max(t_alloc))::BIGINT AS unfilled_c,
       sum(seg_len * ((lot_ord * 31 + dem_ord) % 1000003))::BIGINT
         AS alloc_chk
FROM alloc GROUP BY user_id
ORDER BY user_id
"""




def q_events_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-style symbolic motif census of per-user activity series
    (Lin/Keogh SAX: piecewise aggregation + alphabet quantization).
    Each user's 30-day spend series is PAA-reduced to 6 five-day
    segments; each segment quantizes to a 4-letter alphabet by its
    share of the user's total (a: <1/12, b: <1/6, c: <1/4, d: rest) —
    all comparisons integer cross-multiplications on exact cents, so
    the 6-char SAX word is deterministic on any engine/partitioning.
    The census counts users per word: the standard motif/anomaly
    readout at 10^9-series scale.

    Plan shape: one groupBy(user) with 7 conditional sums (map-side
    partial, no window, no pivot machinery), one tiny word census
    (<= 4^6 rows) — TWO shuffles total, the second trivially small."""
    ev = _t(spark, sf_dir, "events")
    segs = (
        ev.select(
            "user_id",
            F.expr("datediff(ts, timestamp_ntz'2024-01-01 00:00:00') div 5").alias("seg"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("user_id")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("seg") == k, F.col("c"))), F.lit(0)
                ).alias(f"s{k}")
                for k in range(6)
            ],
            F.sum("c").alias("t"),
        )
    )
    sym = "||".join(
        f"(CASE WHEN s{k} * 12 < t THEN 'a' WHEN s{k} * 6 < t THEN 'b'"
        f" WHEN s{k} * 4 < t THEN 'c' ELSE 'd' END)"
        for k in range(6)
    )
    return (
        segs.select(F.expr(sym).alias("sax_word"))
        .groupBy("sax_word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("sax_word")
    )


SQL_EVENTS_SAX = """
WITH segs AS (
  SELECT user_id,
         {sums},
         sum(floor(value*100)::BIGINT) AS t
  FROM (
    SELECT user_id,
           date_diff('day', DATE '2024-01-01', ts) // 5 AS seg,
           value
    FROM events
  ) GROUP BY user_id
), words AS (
  SELECT {word} AS sax_word FROM segs
)
SELECT sax_word, count(*)::BIGINT AS n_users
FROM words GROUP BY 1 ORDER BY 1
""".format(
    sums=",\n         ".join(
        f"coalesce(sum(CASE WHEN seg = {k} THEN floor(value*100)::BIGINT END), 0) AS s{k}"
        for k in range(6)
    ),
    word=" || ".join(
        f"(CASE WHEN s{k} * 12 < t THEN 'a' WHEN s{k} * 6 < t THEN 'b'"
        f" WHEN s{k} * 4 < t THEN 'c' ELSE 'd' END)"
        for k in range(6)
    ),
)




def q_embedding_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign-matrix projection audit: project the
    64-d embeddings to k=16 dims with a +-1 matrix derived from the
    portable sha-60 hash of "j:i" (engine-independent randomness, the
    embedding_ann hyperplane trick), on exact floor(e*10000) integer
    coordinates — then measure, for the deterministic pair set
    (vec_id, vec_id+1), the squared-distance distortion ratio
    d_proj^2 * 1e6 div (k * d_orig^2) in exact ppm, plus a projection
    checksum sum_j y_j*(j+1) pinning every projected coordinate.

    Plan shape: posexplode (linear), ONE broadcast join against the
    k*d=1024-row sign matrix (generated, never shuffled), partial-agg
    groupBy — the projection of 10^9 vectors is embarrassingly
    parallel with zero wide dependency; distances are neighbor-pair
    equi-joins on vec_id. E[d_proj^2] = k*d_orig^2 for +-1 JL, so
    ratio_ppm concentrates around 1e6 — the audit that tells you
    whether 16 dims suffice BEFORE re-embedding a corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "e")
    ).select(
        "vec_id", "i", F.floor(F.col("e").cast("double") * 10000).cast("long").alias("x")
    )
    signs = spark.range(16).select(F.col("id").alias("j")).crossJoin(
        spark.range(64).select(F.col("id").alias("i"))
    ).select(
        "j",
        "i",
        F.expr(
            "IF(pmod(cast(conv(substring(sha2(concat(j, ':', i), 256), 1, 15),"
            " 16, 10) as bigint), 2) = 0, 1, -1)"
        ).alias("s"),
    )
    proj = (
        flat.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("x")).alias("y"))
    )
    chk = proj.groupBy("vec_id").agg(
        F.sum(F.col("y") * (F.col("j") + 1)).cast("long").alias("proj_chk")
    )
    d2o = (
        flat.alias("a")
        .join(
            flat.selectExpr("vec_id - 1 as vec_id", "i", "x as x2").alias("b"),
            ["vec_id", "i"],
        )
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("x") - F.col("x2")) * (F.col("x") - F.col("x2")))
            .cast("long")
            .alias("dist2")
        )
    )
    d2p = (
        proj.alias("a")
        .join(
            proj.selectExpr("vec_id - 1 as vec_id", "j", "y as y2").alias("b"),
            ["vec_id", "j"],
        )
        .groupBy("vec_id")
        .agg(
            F.sum((F.col("y") - F.col("y2")) * (F.col("y") - F.col("y2")))
            .cast("long")
            .alias("proj2")
        )
    )
    return (
        d2o.join(d2p, "vec_id")
        .join(chk, "vec_id")
        .select(
            "vec_id",
            "dist2",
            "proj2",
            F.expr("proj2 * 1000000L div (16 * dist2)").alias("ratio_ppm"),
            "proj_chk",
        )
        .orderBy("vec_id")
    )


SQL_EMBEDDING_JL = """
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
), signs AS (
  SELECT j.range AS j, i.range AS i,
         CASE WHEN ('0x' || substring(sha256(j.range || ':' || i.range), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM range(16) j, range(64) i
), proj AS (
  SELECT f.vec_id, s.j, sum(s.s * f.x)::BIGINT AS y
  FROM flat f JOIN signs s ON s.i = f.i
  GROUP BY 1, 2
), chk AS (
  SELECT vec_id, sum(y * (j + 1))::BIGINT AS proj_chk FROM proj GROUP BY 1
), d2o AS (
  SELECT b.vec_id - 1 AS vec_id,
         sum((a.x - b.x) * (a.x - b.x))::BIGINT AS dist2
  FROM flat a JOIN flat b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
  GROUP BY 1
), d2p AS (
  SELECT b.vec_id - 1 AS vec_id,
         sum((a.y - b.y) * (a.y - b.y))::BIGINT AS proj2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
  GROUP BY 1
)
SELECT d2o.vec_id, d2o.dist2, d2p.proj2,
       (d2p.proj2 * 1000000 // (16 * d2o.dist2))::BIGINT AS ratio_ppm,
       chk.proj_chk
FROM d2o JOIN d2p USING (vec_id) JOIN chk USING (vec_id)
ORDER BY vec_id
"""




def q_events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U rank-sum test between the two deterministic
    experiment variants (portable hash of user_id mod 2, the
    events_abtest split) on purchase amounts in integer cents.
    Tied-value average ranks are half-integers, so everything is
    carried DOUBLED (rank2 = 2*avg_rank = 2*preceding + cnt + 1) and
    stays in exact integer arithmetic: U1, U2 (x2), the U1+U2 =
    n1*n2 identity, and the common-language effect size in exact ppm
    — the nonparametric complement to the chi-square gate, bit-equal
    on any engine/partitioning.

    Plan shape: rows collapse FIRST to the distinct value domain
    (groupBy cents: map-side partial, one shuffle); the rank scan is
    a window over that compressed domain (bounded by the cents
    codomain, ~5e4 keys — never the 10^12 raw rows), then one global
    aggregate. The rank-compress trick is what makes exact rank
    statistics feasible at corpus scale."""
    from pyjelly_spark.functions.text import hex_hash

    ev = _t(spark, sf_dir, "events")
    vals = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 100).cast("long").alias("c"),
            hex_hash(F.col("user_id").cast("string"), 2).alias("variant"),
        )
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n1v"),
        )
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "c",
        "cnt",
        "n1v",
        (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1).alias(
            "rank2"
        ),
    )
    return ranked.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1v")).cast("long").alias("n2"),
        F.sum(F.col("n1v") * F.col("rank2")).cast("long").alias("r1_x2"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).cast("long").alias(
            "tie_groups"
        ),
    ).select(
        "n1",
        "n2",
        F.expr("r1_x2 - n1 * (n1 + 1)").cast("long").alias("u1_x2"),
        F.expr("2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1))").cast("long").alias(
            "u2_x2"
        ),
        F.expr(
            "(r1_x2 - n1 * (n1 + 1)) * 1000000L div (2 * n1 * n2)"
        ).alias("cles_ppm"),
        "tie_groups",
    )


SQL_EVENTS_MANNWHITNEY = """
WITH vals AS (
  SELECT floor(value*100)::BIGINT AS c,
         count(*)::BIGINT AS cnt,
         sum(CASE WHEN ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE 0 END)::BIGINT AS n1v
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), ranked AS (
  SELECT c, cnt, n1v,
         2 * coalesce(sum(cnt) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS rank2
  FROM vals
), agg AS (
  SELECT sum(n1v)::BIGINT AS n1,
         sum(cnt - n1v)::BIGINT AS n2,
         sum(n1v * rank2)::BIGINT AS r1_x2,
         sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS tie_groups
  FROM ranked
)
SELECT n1, n2,
       (r1_x2 - n1 * (n1 + 1))::BIGINT AS u1_x2,
       (2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)))::BIGINT AS u2_x2,
       ((r1_x2 - n1 * (n1 + 1)) * 1000000 // (2 * n1 * n2))::BIGINT AS cles_ppm,
       tie_groups
FROM agg
"""




def q_doc_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free word runs (split on the repo's English
    stopword set); each word scores degree/frequency where degree
    sums the lengths of phrases containing it; a phrase scores the sum
    of its word scores. Scores are computed as per-word integer
    divisions (degree * 1e6 div freq) BEFORE summing, so the total is
    order-independent and bit-equal across engines — no float ever.
    Emits each doc's top phrase (ties: lexicographically smallest).

    Plan shape: every stage is keyed by doc_id (phrase explode ->
    word-stat partial agg -> phrase-score agg -> per-doc top-1
    window); nothing global, nothing quadratic — RAKE at 10^12 docs
    is three doc-local shuffles."""
    docs = _t(spark, sf_dir, "documents")
    stop = r"\\b(the|and|of|to|a|in|is)\\b"
    phrases = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"filter(transform(split(lower(trim(regexp_replace("
                    f"text, '\\\\s+', ' '))), '{stop}'), p -> trim(p)),"
                    f" p -> p <> '')"
                )
            ).alias("pidx", "phrase"),
        )
        .select(
            "doc_id", "pidx", "phrase", F.split("phrase", " ").alias("pwords")
        )
        .select(
            "doc_id", "pidx", "phrase", "pwords", F.size("pwords").alias("plen")
        )
    )
    wstats = (
        phrases.select("doc_id", F.explode("pwords").alias("word"), "plen")
        .groupBy("doc_id", "word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
        .select(
            "doc_id",
            "word",
            F.expr("degree * 1000000L div freq").alias("wscore_ppm"),
        )
    )
    pscores = (
        phrases.select("doc_id", "pidx", "phrase", F.explode("pwords").alias("word"))
        .join(wstats, ["doc_id", "word"])
        .groupBy("doc_id", "pidx", "phrase")
        .agg(F.sum("wscore_ppm").cast("long").alias("score_ppm"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("phrase"), F.col("pidx")
    )
    nphr = phrases.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_phrases")
    )
    return (
        pscores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(nphr, "doc_id")
        .select("doc_id", F.col("phrase").alias("top_phrase"), "score_ppm", "n_phrases")
        .orderBy("doc_id")
    )


SQL_DOC_RAKE = r"""
WITH frag AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split_regex(
               lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
               '\b(the|and|of|to|a|in|is)\b'),
             p -> trim(p)),
           p -> p <> '') AS phs
  FROM documents
), phrases AS (
  SELECT doc_id,
         generate_subscripts(phs, 1) - 1 AS pidx,
         unnest(phs) AS phrase
  FROM frag
), pw AS (
  SELECT doc_id, pidx, phrase, string_split(phrase, ' ') AS pwords,
         len(string_split(phrase, ' '))::BIGINT AS plen
  FROM phrases
), wstats AS (
  SELECT doc_id, word,
         (sum(plen) * 1000000 // count(*))::BIGINT AS wscore_ppm
  FROM (SELECT doc_id, unnest(pwords) AS word, plen FROM pw)
  GROUP BY 1, 2
), pscores AS (
  SELECT x.doc_id, x.pidx, x.phrase,
         sum(w.wscore_ppm)::BIGINT AS score_ppm
  FROM (SELECT doc_id, pidx, phrase, unnest(pwords) AS word FROM pw) x
  JOIN wstats w ON w.doc_id = x.doc_id AND w.word = x.word
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT doc_id, phrase, score_ppm,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY score_ppm DESC, phrase, pidx) AS rn
  FROM pscores
), nphr AS (
  SELECT doc_id, count(*)::BIGINT AS n_phrases FROM pw GROUP BY 1
)
SELECT r.doc_id, r.phrase AS top_phrase, r.score_ppm, n.n_phrases
FROM ranked r JOIN nphr n USING (doc_id)
WHERE r.rn = 1
ORDER BY r.doc_id
"""




def q_orders_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE (run-length) encoding audit for the two low-cardinality
    order columns under three physical layouts — insertion order
    (64 fixed o_orderkey ranges), clustered by o_orderstatus, and
    clustered by o_orderpriority (one file per cluster value, rows
    ordered by o_orderkey inside every file; runs never span files,
    as Parquet pages don't). Cost model: one dictionary byte + a
    LEB128 varint of the run length per run vs one plain dictionary
    byte per row; savings in exact ppm.

    The audit quantifies the lakehouse layout rule of thumb exactly:
    clustering a column by ITSELF collapses it to one run per file
    (~100% savings) while leaving the OTHER column's run structure
    essentially random. All windows are partitioned by file id —
    metadata math, fully parallel, no global sort: pricing 10^12
    rows is a per-file lag + two partial aggregations per layout."""
    orders = _t(spark, sf_dir, "orders")
    n = orders.count()
    width = (n + 63) // 64
    layouts = {
        "insertion": F.expr(f"cast(o_orderkey div {width} as string)"),
        "by_status": F.col("o_orderstatus"),
        "by_priority": F.col("o_orderpriority"),
    }
    cols = {"status": "o_orderstatus", "priority": "o_orderpriority"}
    outs = []
    for lname, fexpr in layouts.items():
        base = orders.select(
            fexpr.alias("f"), "o_orderkey", "o_orderstatus", "o_orderpriority"
        )
        w = Window.partitionBy("f").orderBy("o_orderkey")
        wrun = (
            Window.partitionBy("f")
            .orderBy("o_orderkey")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for cname, c in cols.items():
            runs = (
                base.select(
                    "f",
                    "o_orderkey",
                    F.when(
                        F.lag(c).over(w).isNull() | (F.lag(c).over(w) != F.col(c)),
                        1,
                    )
                    .otherwise(0)
                    .alias("nr"),
                )
                .select("f", F.sum("nr").over(wrun).alias("run_id"))
                .groupBy("f", "run_id")
                .agg(F.count(F.lit(1)).alias("rl"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_runs"),
                    F.sum(
                        F.when(F.col("rl") < 128, 2)
                        .when(F.col("rl") < 16384, 3)
                        .otherwise(4)
                    )
                    .cast("long")
                    .alias("rle_bytes"),
                )
                .select(
                    F.lit(cname).alias("column"),
                    F.lit(lname).alias("layout"),
                    "n_runs",
                    "rle_bytes",
                    F.lit(int(n)).cast("long").alias("plain_bytes"),
                    F.expr(
                        f"(cast({n} as bigint) - rle_bytes) * 1000000L"
                        f" div cast({n} as bigint)"
                    ).alias("savings_ppm"),
                )
            )
            outs.append(runs)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("column", "layout")


SQL_ORDERS_RLE = """
WITH params AS (
  SELECT ((count(*) + 63) // 64)::BIGINT AS width, count(*)::BIGINT AS n
  FROM orders
), combos AS (
  SELECT * FROM (VALUES
    ('status', 'insertion'), ('status', 'by_status'),
    ('status', 'by_priority'),
    ('priority', 'insertion'), ('priority', 'by_status'),
    ('priority', 'by_priority')) t(col_name, layout)
), assigned AS (
  SELECT c.col_name, c.layout,
         CASE c.layout
           WHEN 'insertion' THEN (o.o_orderkey // p.width)::VARCHAR
           WHEN 'by_status' THEN o.o_orderstatus
           ELSE o.o_orderpriority END AS f,
         o.o_orderkey,
         CASE c.col_name WHEN 'status' THEN o.o_orderstatus
              ELSE o.o_orderpriority END AS v
  FROM orders o CROSS JOIN params p CROSS JOIN combos c
), flagged AS (
  SELECT col_name, layout, f, o_orderkey,
         CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
              THEN 1 ELSE 0 END AS nr
  FROM assigned
  WINDOW w AS (PARTITION BY col_name, layout, f ORDER BY o_orderkey)
), runs AS (
  SELECT col_name, layout, f,
         sum(nr) OVER (PARTITION BY col_name, layout, f
           ORDER BY o_orderkey) AS run_id
  FROM flagged
), rl AS (
  SELECT col_name, layout, f, run_id, count(*)::BIGINT AS rl
  FROM runs GROUP BY 1, 2, 3, 4
)
SELECT col_name AS "column", layout,
       count(*)::BIGINT AS n_runs,
       sum(CASE WHEN rl < 128 THEN 2 WHEN rl < 16384 THEN 3 ELSE 4 END)::BIGINT
         AS rle_bytes,
       (SELECT n FROM params) AS plain_bytes,
       (((SELECT n FROM params)
         - sum(CASE WHEN rl < 128 THEN 2 WHEN rl < 16384 THEN 3 ELSE 4 END))
        * 1000000 // (SELECT n FROM params))::BIGINT AS savings_ppm
FROM rl GROUP BY 1, 2 ORDER BY 1, 2
"""




def q_kg_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest by distributed Boruvka
    (operators/components.py::boruvka_msf) over the synthetic
    cycle/pendant/chord graph with sha-60 edge weights (distinct whp,
    so the MSF is unique and engine-checkable). Each Boruvka round is
    one partial-aggregated min-edge groupBy over the edge set plus a
    component-graph contraction that reuses the large-star/small-star
    CC operator on an input bounded by the current component count —
    the textbook O(log V)-round distributed MSF. The oracle is a
    23-round unrolled parallel Prim (every component grows its tree by
    its minimum crossing edge per round, deterministic (w, s, t)
    order) — a SEQUENTIAL formulation; agreement proves the
    distributed algorithm picked the identical unique tree. Output
    pins per component: true node count (from the oracle's own
    component map vs the forest's node set — a dropped node cannot
    hide), tree edge count (= n_nodes - 1 iff spanning and acyclic),
    and a modular weight checksum over the selected edges."""
    from pyjelly_spark.operators.components import boruvka_msf

    e = _synth_cycle_graph(spark, sf_dir)
    ew = e.select(
        "s",
        "t",
        F.expr(
            "cast(conv(substring(sha2(concat(cast(least(s, t) as string), ':',"
            " cast(greatest(s, t) as string)), 256), 1, 15), 16, 10) as bigint)"
        ).alias("w"),
    )
    msf = boruvka_msf(ew)
    return (
        msf.select(
            "comp",
            "w",
            F.explode(F.array("s", "t")).alias("node"),
        )
        .groupBy("comp")
        .agg(
            F.countDistinct("node").cast("long").alias("n_nodes"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_tree_edges"),
            (F.sum(F.col("w") % 1000000007) / 2).cast("long").alias("weight_chk"),
        )
        .select(
            F.col("comp").alias("component"),
            "n_nodes",
            "n_tree_edges",
            "weight_chk",
        )
        .orderBy("component")
    )


SQL_KG_MSF = """
WITH RECURSIVE
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
),
ew AS MATERIALIZED (
  SELECT s, t,
         ('0x' || substring(sha256(s || ':' || t), 1, 15))::BIGINT AS w
  FROM e0
),
ed AS MATERIALIZED (
  SELECT s, t, w FROM ew UNION ALL SELECT t AS s, s AS t, w FROM ew
),
reach AS (
  SELECT s, t FROM ed
  UNION
  SELECT r.s, e2.t FROM reach r JOIN ed e2 ON e2.s = r.t
),
cmap AS MATERIALIZED (
  SELECT x.node, least(x.node, min(r.t)) AS comp
  FROM (SELECT DISTINCT s AS node FROM ed) x
  LEFT JOIN reach r ON r.s = x.node
  GROUP BY x.node
),
t0 AS MATERIALIZED (
  SELECT comp, comp AS node FROM (SELECT DISTINCT comp FROM cmap)
),
ROUNDS_PLACEHOLDER,
forest AS (
FOREST_PLACEHOLDER
),
sizes AS (SELECT comp, count(*)::BIGINT AS n_nodes FROM cmap GROUP BY 1)
SELECT f.c AS component,
       max(z.n_nodes) AS n_nodes,
       count(*)::BIGINT AS n_tree_edges,
       sum(f.w % 1000000007)::BIGINT AS weight_chk
FROM forest f JOIN sizes z ON z.comp = f.c
GROUP BY 1 ORDER BY 1
"""
SQL_KG_MSF = SQL_KG_MSF.replace("ROUNDS_PLACEHOLDER", r"""sel1 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t0 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t0 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t1 AS MATERIALIZED (
  SELECT comp, node FROM t0
  UNION
  SELECT c AS comp, t AS node FROM sel1
),
sel2 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t1 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t1 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t2 AS MATERIALIZED (
  SELECT comp, node FROM t1
  UNION
  SELECT c AS comp, t AS node FROM sel2
),
sel3 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t2 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t2 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t3 AS MATERIALIZED (
  SELECT comp, node FROM t2
  UNION
  SELECT c AS comp, t AS node FROM sel3
),
sel4 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t3 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t3 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t4 AS MATERIALIZED (
  SELECT comp, node FROM t3
  UNION
  SELECT c AS comp, t AS node FROM sel4
),
sel5 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t4 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t4 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t5 AS MATERIALIZED (
  SELECT comp, node FROM t4
  UNION
  SELECT c AS comp, t AS node FROM sel5
),
sel6 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t5 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t5 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t6 AS MATERIALIZED (
  SELECT comp, node FROM t5
  UNION
  SELECT c AS comp, t AS node FROM sel6
),
sel7 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t6 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t6 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t7 AS MATERIALIZED (
  SELECT comp, node FROM t6
  UNION
  SELECT c AS comp, t AS node FROM sel7
),
sel8 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t7 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t7 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t8 AS MATERIALIZED (
  SELECT comp, node FROM t7
  UNION
  SELECT c AS comp, t AS node FROM sel8
),
sel9 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t8 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t8 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t9 AS MATERIALIZED (
  SELECT comp, node FROM t8
  UNION
  SELECT c AS comp, t AS node FROM sel9
),
sel10 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t9 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t9 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t10 AS MATERIALIZED (
  SELECT comp, node FROM t9
  UNION
  SELECT c AS comp, t AS node FROM sel10
),
sel11 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t10 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t10 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t11 AS MATERIALIZED (
  SELECT comp, node FROM t10
  UNION
  SELECT c AS comp, t AS node FROM sel11
),
sel12 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t11 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t11 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t12 AS MATERIALIZED (
  SELECT comp, node FROM t11
  UNION
  SELECT c AS comp, t AS node FROM sel12
),
sel13 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t12 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t12 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t13 AS MATERIALIZED (
  SELECT comp, node FROM t12
  UNION
  SELECT c AS comp, t AS node FROM sel13
),
sel14 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t13 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t13 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t14 AS MATERIALIZED (
  SELECT comp, node FROM t13
  UNION
  SELECT c AS comp, t AS node FROM sel14
),
sel15 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t14 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t14 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t15 AS MATERIALIZED (
  SELECT comp, node FROM t14
  UNION
  SELECT c AS comp, t AS node FROM sel15
),
sel16 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t15 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t15 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t16 AS MATERIALIZED (
  SELECT comp, node FROM t15
  UNION
  SELECT c AS comp, t AS node FROM sel16
),
sel17 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t16 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t16 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t17 AS MATERIALIZED (
  SELECT comp, node FROM t16
  UNION
  SELECT c AS comp, t AS node FROM sel17
),
sel18 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t17 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t17 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t18 AS MATERIALIZED (
  SELECT comp, node FROM t17
  UNION
  SELECT c AS comp, t AS node FROM sel18
),
sel19 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t18 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t18 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t19 AS MATERIALIZED (
  SELECT comp, node FROM t18
  UNION
  SELECT c AS comp, t AS node FROM sel19
),
sel20 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t19 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t19 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t20 AS MATERIALIZED (
  SELECT comp, node FROM t19
  UNION
  SELECT c AS comp, t AS node FROM sel20
),
sel21 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t20 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t20 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t21 AS MATERIALIZED (
  SELECT comp, node FROM t20
  UNION
  SELECT c AS comp, t AS node FROM sel21
),
sel22 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t21 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t21 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t22 AS MATERIALIZED (
  SELECT comp, node FROM t21
  UNION
  SELECT c AS comp, t AS node FROM sel22
),
sel23 AS MATERIALIZED (
  SELECT c, s, t, w FROM (
    SELECT tr.comp AS c, e.s, e.t, e.w,
           row_number() OVER (PARTITION BY tr.comp ORDER BY e.w, e.s, e.t) AS rn
    FROM t22 tr
    JOIN ed e ON e.s = tr.node
    LEFT JOIN t22 tx ON tx.comp = tr.comp AND tx.node = e.t
    WHERE tx.node IS NULL
  ) WHERE rn = 1
),
t23 AS MATERIALIZED (
  SELECT comp, node FROM t22
  UNION
  SELECT c AS comp, t AS node FROM sel23
)""").replace(
    "FOREST_PLACEHOLDER", r"""  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel1
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel2
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel3
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel4
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel5
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel6
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel7
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel8
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel9
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel10
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel11
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel12
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel13
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel14
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel15
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel16
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel17
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel18
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel19
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel20
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel21
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel22
UNION ALL
  SELECT c, least(s, t) AS s, greatest(s, t) AS t, w FROM sel23""")




def q_kg_densest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-subgraph extraction by parallel peeling (Bahmani et al.,
    the MapReduce 2(1+eps)-approximation; eps = 1/2) over the synthetic
    cycle/pendant graph with a PLANTED K12 clique on nodes {0, 24, ...,
    264}: round r records (V, E, node checksum) then removes every node
    with deg * V <= 3E — an exact integer comparison, no float density.
    The background (density ~1) peels away in one round; the planted
    clique (density 5.5) survives and is exactly what the best round
    isolates — the algorithm provably recovers it. The best round is
    chosen by exact rational density compare (e * 1e12 // v is
    collision-free for v <= 5000 denominators), earliest round wins
    ties; the oracle unrolls the identical 21 peeling rounds as
    materialized CTEs. Per-round driver state is three scalars —
    metadata-sized at any graph scale (operators/components.py::
    densest_subgraph_peel)."""
    from pyjelly_spark.operators.components import densest_subgraph_peel

    base = _synth_cycle_graph(spark, sf_dir)
    n = _t(spark, sf_dir, "documents").count()
    clique_nodes = [24 * a for a in range(12) if 24 * a < n]
    clique = spark.createDataFrame(
        [
            (a, b)
            for i, a in enumerate(clique_nodes)
            for b in clique_nodes[i + 1 :]
        ],
        "s: long, t: long",
    )
    stats = densest_subgraph_peel(base.unionByName(clique))
    best = max(stats, key=lambda x: (x[2] * 10**12 // x[1], -x[0]))
    return spark.createDataFrame(
        [
            (
                best[0],
                best[1],
                best[2],
                best[2] * 1_000_000 // best[1],
                best[3],
            )
        ],
        "best_round: long, n_nodes: long, n_edges: long,"
        " density_ppm: long, node_chk: long",
    )


SQL_KG_DENSEST = """
WITH
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
  UNION ALL
  SELECT a.range * 24 AS s, b.range * 24 AS t
  FROM range(12) a, range(12) b, nn
  WHERE a.range < b.range AND b.range * 24 < nn.n
),
g0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
),
ROUNDS_PLACEHOLDER,
stats AS (
STATS_PLACEHOLDER
)
SELECT r AS best_round, nv AS n_nodes, e AS n_edges,
       (e * 1000000 // nv)::BIGINT AS density_ppm, chk AS node_chk
FROM stats
ORDER BY (e * 1000000000000 // nv) DESC, r ASC
LIMIT 1
"""
SQL_KG_DENSEST = SQL_KG_DENSEST.replace("ROUNDS_PLACEHOLDER", r"""n1 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g0 UNION ALL SELECT t AS v FROM g0
  ) GROUP BY 1
),
a1 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n1
),
g1 AS MATERIALIZED (
  SELECT g.s, g.t FROM g0 g
  JOIN n1 ns ON ns.v = g.s
  JOIN n1 nt ON nt.v = g.t
  CROSS JOIN a1 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n2 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g1 UNION ALL SELECT t AS v FROM g1
  ) GROUP BY 1
),
a2 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n2
),
g2 AS MATERIALIZED (
  SELECT g.s, g.t FROM g1 g
  JOIN n2 ns ON ns.v = g.s
  JOIN n2 nt ON nt.v = g.t
  CROSS JOIN a2 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n3 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g2 UNION ALL SELECT t AS v FROM g2
  ) GROUP BY 1
),
a3 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n3
),
g3 AS MATERIALIZED (
  SELECT g.s, g.t FROM g2 g
  JOIN n3 ns ON ns.v = g.s
  JOIN n3 nt ON nt.v = g.t
  CROSS JOIN a3 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n4 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g3 UNION ALL SELECT t AS v FROM g3
  ) GROUP BY 1
),
a4 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n4
),
g4 AS MATERIALIZED (
  SELECT g.s, g.t FROM g3 g
  JOIN n4 ns ON ns.v = g.s
  JOIN n4 nt ON nt.v = g.t
  CROSS JOIN a4 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n5 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g4 UNION ALL SELECT t AS v FROM g4
  ) GROUP BY 1
),
a5 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n5
),
g5 AS MATERIALIZED (
  SELECT g.s, g.t FROM g4 g
  JOIN n5 ns ON ns.v = g.s
  JOIN n5 nt ON nt.v = g.t
  CROSS JOIN a5 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n6 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g5 UNION ALL SELECT t AS v FROM g5
  ) GROUP BY 1
),
a6 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n6
),
g6 AS MATERIALIZED (
  SELECT g.s, g.t FROM g5 g
  JOIN n6 ns ON ns.v = g.s
  JOIN n6 nt ON nt.v = g.t
  CROSS JOIN a6 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n7 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g6 UNION ALL SELECT t AS v FROM g6
  ) GROUP BY 1
),
a7 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n7
),
g7 AS MATERIALIZED (
  SELECT g.s, g.t FROM g6 g
  JOIN n7 ns ON ns.v = g.s
  JOIN n7 nt ON nt.v = g.t
  CROSS JOIN a7 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n8 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g7 UNION ALL SELECT t AS v FROM g7
  ) GROUP BY 1
),
a8 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n8
),
g8 AS MATERIALIZED (
  SELECT g.s, g.t FROM g7 g
  JOIN n8 ns ON ns.v = g.s
  JOIN n8 nt ON nt.v = g.t
  CROSS JOIN a8 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n9 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g8 UNION ALL SELECT t AS v FROM g8
  ) GROUP BY 1
),
a9 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n9
),
g9 AS MATERIALIZED (
  SELECT g.s, g.t FROM g8 g
  JOIN n9 ns ON ns.v = g.s
  JOIN n9 nt ON nt.v = g.t
  CROSS JOIN a9 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n10 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g9 UNION ALL SELECT t AS v FROM g9
  ) GROUP BY 1
),
a10 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n10
),
g10 AS MATERIALIZED (
  SELECT g.s, g.t FROM g9 g
  JOIN n10 ns ON ns.v = g.s
  JOIN n10 nt ON nt.v = g.t
  CROSS JOIN a10 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n11 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g10 UNION ALL SELECT t AS v FROM g10
  ) GROUP BY 1
),
a11 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n11
),
g11 AS MATERIALIZED (
  SELECT g.s, g.t FROM g10 g
  JOIN n11 ns ON ns.v = g.s
  JOIN n11 nt ON nt.v = g.t
  CROSS JOIN a11 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n12 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g11 UNION ALL SELECT t AS v FROM g11
  ) GROUP BY 1
),
a12 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n12
),
g12 AS MATERIALIZED (
  SELECT g.s, g.t FROM g11 g
  JOIN n12 ns ON ns.v = g.s
  JOIN n12 nt ON nt.v = g.t
  CROSS JOIN a12 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n13 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g12 UNION ALL SELECT t AS v FROM g12
  ) GROUP BY 1
),
a13 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n13
),
g13 AS MATERIALIZED (
  SELECT g.s, g.t FROM g12 g
  JOIN n13 ns ON ns.v = g.s
  JOIN n13 nt ON nt.v = g.t
  CROSS JOIN a13 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n14 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g13 UNION ALL SELECT t AS v FROM g13
  ) GROUP BY 1
),
a14 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n14
),
g14 AS MATERIALIZED (
  SELECT g.s, g.t FROM g13 g
  JOIN n14 ns ON ns.v = g.s
  JOIN n14 nt ON nt.v = g.t
  CROSS JOIN a14 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n15 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g14 UNION ALL SELECT t AS v FROM g14
  ) GROUP BY 1
),
a15 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n15
),
g15 AS MATERIALIZED (
  SELECT g.s, g.t FROM g14 g
  JOIN n15 ns ON ns.v = g.s
  JOIN n15 nt ON nt.v = g.t
  CROSS JOIN a15 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n16 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g15 UNION ALL SELECT t AS v FROM g15
  ) GROUP BY 1
),
a16 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n16
),
g16 AS MATERIALIZED (
  SELECT g.s, g.t FROM g15 g
  JOIN n16 ns ON ns.v = g.s
  JOIN n16 nt ON nt.v = g.t
  CROSS JOIN a16 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n17 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g16 UNION ALL SELECT t AS v FROM g16
  ) GROUP BY 1
),
a17 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n17
),
g17 AS MATERIALIZED (
  SELECT g.s, g.t FROM g16 g
  JOIN n17 ns ON ns.v = g.s
  JOIN n17 nt ON nt.v = g.t
  CROSS JOIN a17 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n18 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g17 UNION ALL SELECT t AS v FROM g17
  ) GROUP BY 1
),
a18 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n18
),
g18 AS MATERIALIZED (
  SELECT g.s, g.t FROM g17 g
  JOIN n18 ns ON ns.v = g.s
  JOIN n18 nt ON nt.v = g.t
  CROSS JOIN a18 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n19 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g18 UNION ALL SELECT t AS v FROM g18
  ) GROUP BY 1
),
a19 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n19
),
g19 AS MATERIALIZED (
  SELECT g.s, g.t FROM g18 g
  JOIN n19 ns ON ns.v = g.s
  JOIN n19 nt ON nt.v = g.t
  CROSS JOIN a19 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n20 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g19 UNION ALL SELECT t AS v FROM g19
  ) GROUP BY 1
),
a20 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n20
),
g20 AS MATERIALIZED (
  SELECT g.s, g.t FROM g19 g
  JOIN n20 ns ON ns.v = g.s
  JOIN n20 nt ON nt.v = g.t
  CROSS JOIN a20 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
),
n21 AS MATERIALIZED (
  SELECT v, count(*)::BIGINT AS deg FROM (
    SELECT s AS v FROM g20 UNION ALL SELECT t AS v FROM g20
  ) GROUP BY 1
),
a21 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS nv, coalesce(sum(deg), 0)::BIGINT AS ds,
         coalesce(sum(v), 0)::BIGINT AS chk
  FROM n21
),
g21 AS MATERIALIZED (
  SELECT g.s, g.t FROM g20 g
  JOIN n21 ns ON ns.v = g.s
  JOIN n21 nt ON nt.v = g.t
  CROSS JOIN a21 a
  WHERE ns.deg * a.nv > 3 * (a.ds // 2)
    AND nt.deg * a.nv > 3 * (a.ds // 2)
)""").replace(
    "STATS_PLACEHOLDER", r"""  SELECT 1 AS r, nv, ds // 2 AS e, chk FROM a1 WHERE nv > 0
  UNION ALL
  SELECT 2 AS r, nv, ds // 2 AS e, chk FROM a2 WHERE nv > 0
  UNION ALL
  SELECT 3 AS r, nv, ds // 2 AS e, chk FROM a3 WHERE nv > 0
  UNION ALL
  SELECT 4 AS r, nv, ds // 2 AS e, chk FROM a4 WHERE nv > 0
  UNION ALL
  SELECT 5 AS r, nv, ds // 2 AS e, chk FROM a5 WHERE nv > 0
  UNION ALL
  SELECT 6 AS r, nv, ds // 2 AS e, chk FROM a6 WHERE nv > 0
  UNION ALL
  SELECT 7 AS r, nv, ds // 2 AS e, chk FROM a7 WHERE nv > 0
  UNION ALL
  SELECT 8 AS r, nv, ds // 2 AS e, chk FROM a8 WHERE nv > 0
  UNION ALL
  SELECT 9 AS r, nv, ds // 2 AS e, chk FROM a9 WHERE nv > 0
  UNION ALL
  SELECT 10 AS r, nv, ds // 2 AS e, chk FROM a10 WHERE nv > 0
  UNION ALL
  SELECT 11 AS r, nv, ds // 2 AS e, chk FROM a11 WHERE nv > 0
  UNION ALL
  SELECT 12 AS r, nv, ds // 2 AS e, chk FROM a12 WHERE nv > 0
  UNION ALL
  SELECT 13 AS r, nv, ds // 2 AS e, chk FROM a13 WHERE nv > 0
  UNION ALL
  SELECT 14 AS r, nv, ds // 2 AS e, chk FROM a14 WHERE nv > 0
  UNION ALL
  SELECT 15 AS r, nv, ds // 2 AS e, chk FROM a15 WHERE nv > 0
  UNION ALL
  SELECT 16 AS r, nv, ds // 2 AS e, chk FROM a16 WHERE nv > 0
  UNION ALL
  SELECT 17 AS r, nv, ds // 2 AS e, chk FROM a17 WHERE nv > 0
  UNION ALL
  SELECT 18 AS r, nv, ds // 2 AS e, chk FROM a18 WHERE nv > 0
  UNION ALL
  SELECT 19 AS r, nv, ds // 2 AS e, chk FROM a19 WHERE nv > 0
  UNION ALL
  SELECT 20 AS r, nv, ds // 2 AS e, chk FROM a20 WHERE nv > 0
  UNION ALL
  SELECT 21 AS r, nv, ds // 2 AS e, chk FROM a21 WHERE nv > 0""")




def q_events_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust STL-lite decomposition of the hourly event-count series
    per event_type: trend = centered 25-hour moving MEDIAN, seasonal =
    per-hour-of-day median of the detrended series, remainder = what's
    left. Medians of integers are half-integer-exact, so the whole
    decomposition is carried at fixed x2/x4 integer scale — bit-equal
    on any engine/partitioning, unlike loess-based STL. The series is
    densified onto the full 720-hour grid (absent hours count 0) so
    window frames line up deterministically on both engines.

    Plan shape: one count aggregation, one dense-grid broadcast join,
    one windowed median per series (frame bounded at 25 rows), one
    seasonal median groupBy — everything keyed by event_type; the
    10^12-row log collapses to type x 720 grid rows before any window
    runs (the same domain-compression trick as the rank statistics).

    Output per (event_type, hour_of_day): the seasonal component x4
    and the type's remainder sum of squares x16 — pinning trend,
    seasonal AND remainder exactly."""
    ev = _t(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.expr(
                "timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
            ).alias("h"),
        )
        .where((F.col("h") >= 0) & (F.col("h") < 720))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        # one raw scan: everything downstream re-reads this <= types x 720
        # row frame, not the event log (6 scans -> 1 in the audit)
        .localCheckpoint(eager=True)
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(spark.range(720).select(F.col("id").alias("h")))
    )
    dense = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    wt = Window.partitionBy("event_type").orderBy("h").rowsBetween(-12, 12)
    detr = dense.select(
        "event_type",
        "h",
        "c",
        (2 * F.col("c") - (2 * F.expr("percentile(c, 0.5)").over(wt)).cast("long")).alias(
            "d_x2"
        ),
    )
    seas = (
        detr.groupBy("event_type", F.expr("h % 24").alias("hod"))
        .agg((2 * F.expr("percentile(d_x2, 0.5)")).cast("long").alias("seasonal_x4"))
    )
    detr2 = detr.select("event_type", F.expr("h % 24").alias("hod"), "d_x2")
    rem = (
        detr2.join(seas, ["event_type", "hod"])
        .select(
            "event_type",
            (2 * F.col("d_x2") - F.col("seasonal_x4")).alias("r_x4"),
        )
        .groupBy("event_type")
        .agg(F.sum(F.col("r_x4") * F.col("r_x4")).cast("long").alias("rem_ss_x16"))
    )
    return (
        seas.join(rem, "event_type")
        .select("event_type", "hod", "seasonal_x4", "rem_ss_x16")
        .orderBy("event_type", "hod")
    )


SQL_EVENTS_STL = """
WITH counts AS (
  SELECT event_type,
         date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS h,
         count(*)::BIGINT AS c
  FROM events
  WHERE date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) >= 0
    AND date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) < 720
  GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, g.range AS h
  FROM (SELECT DISTINCT event_type FROM counts) t, range(720) g
), dense AS (
  SELECT g.event_type, g.h, coalesce(c.c, 0)::BIGINT AS c
  FROM grid g LEFT JOIN counts c ON c.event_type = g.event_type AND c.h = g.h
), detr AS (
  SELECT event_type, h, c,
         (2 * c - (2 * median(c) OVER (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING))::BIGINT) AS d_x2
  FROM dense
), seas AS (
  SELECT event_type, h % 24 AS hod,
         (2 * median(d_x2))::BIGINT AS seasonal_x4
  FROM detr GROUP BY 1, 2
), rem AS (
  SELECT d.event_type,
         sum((2 * d.d_x2 - s.seasonal_x4) * (2 * d.d_x2 - s.seasonal_x4))::BIGINT
           AS rem_ss_x16
  FROM detr d JOIN seas s ON s.event_type = d.event_type AND s.hod = d.h % 24
  GROUP BY 1
)
SELECT s.event_type, s.hod, s.seasonal_x4, r.rem_ss_x16
FROM seas s JOIN rem r ON r.event_type = s.event_type
ORDER BY s.event_type, s.hod
"""




def q_events_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel LTTB downsampling (largest-triangle-three-buckets,
    Steinarsson) of each event_type's (minute, cents) point stream to
    one representative point per hour bucket: a point's score is the
    triangle area it forms with the NEIGHBOR BUCKETS' mean points —
    the bucket-anchor variant that removes sequential dependency, so
    every bucket selects independently. Means are rationals; the
    cross product is cleared of denominators (x Cp^2*Cn, sign-safe
    positive factors) into decimal(38,0)/HUGEINT so the argmax is
    exact integer arithmetic — the selected point set is engine-
    deterministic, ties to (earliest minute, smallest event_id).
    First/last/neighborless buckets keep their earliest point (the
    LTTB endpoint rule).

    Plan shape: bucket stats are one partial agg; neighbor anchors a
    lag/lead window over the BUCKET table (<= 720 rows per series,
    never raw points); per-point scoring is a broadcast-sized join
    back; selection one row_number per (series, bucket). 10^12 points
    downsample with no global sort and no sequential pass."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "event_id",
        F.expr(
            "timestampdiff(MINUTE, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("t"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    ).where((F.col("t") >= 0) & (F.col("t") < 43200))
    pts = pts.withColumn("b", F.expr("t div 60"))
    bstats = pts.groupBy("event_type", "b").agg(
        F.sum("t").alias("st"),
        F.sum("v").alias("sv"),
        F.count(F.lit(1)).alias("cn"),
    )
    wb = Window.partitionBy("event_type").orderBy("b")
    anchors = bstats.select(
        "event_type",
        "b",
        F.lag("st").over(wb).alias("tp"),
        F.lag("sv").over(wb).alias("vp"),
        F.lag("cn").over(wb).alias("cp"),
        F.lead("st").over(wb).alias("tn"),
        F.lead("sv").over(wb).alias("vn"),
        F.lead("cn").over(wb).alias("cnx"),
    )
    scored = pts.join(anchors, ["event_type", "b"]).select(
        "event_type",
        "b",
        "t",
        "v",
        "event_id",
        F.when(
            F.col("cp").isNull() | F.col("cnx").isNull(), F.lit(None)
        )
        .otherwise(
            F.abs(
                (
                    F.col("t") * F.col("cp") - F.col("tp")
                ).cast("decimal(38,0)")
                * (
                    F.col("vn") * F.col("cp") - F.col("vp") * F.col("cnx")
                ).cast("decimal(38,0)")
                - (
                    F.col("tn") * F.col("cp") - F.col("tp") * F.col("cnx")
                ).cast("decimal(38,0)")
                * (
                    F.col("v") * F.col("cp") - F.col("vp")
                ).cast("decimal(38,0)")
            )
        )
        .alias("score"),
    )
    wsel = Window.partitionBy("event_type", "b").orderBy(
        F.col("score").desc_nulls_last(), F.col("t"), F.col("event_id")
    )
    wedge = Window.partitionBy("event_type", "b").orderBy("t", "event_id")
    return (
        scored.withColumn(
            "rn",
            F.when(F.col("score").isNull(), F.row_number().over(wedge))
            .otherwise(F.row_number().over(wsel)),
        )
        .where(F.col("rn") == 1)
        .select("event_type", "b", "t", "v", "event_id")
        .orderBy("event_type", "b")
    )


SQL_EVENTS_LTTB = """
WITH pts AS (
  SELECT event_type, event_id,
         date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS t,
         floor(value*100)::BIGINT AS v
  FROM events
  WHERE date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) >= 0
    AND date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) < 43200
), pb AS (
  SELECT *, t // 60 AS b FROM pts
), bstats AS (
  SELECT event_type, b, sum(t)::BIGINT AS st, sum(v)::BIGINT AS sv,
         count(*)::BIGINT AS cn
  FROM pb GROUP BY 1, 2
), anchors AS (
  SELECT event_type, b,
         lag(st) OVER w AS tp, lag(sv) OVER w AS vp, lag(cn) OVER w AS cp,
         lead(st) OVER w AS tn, lead(sv) OVER w AS vn, lead(cn) OVER w AS cnx
  FROM bstats
  WINDOW w AS (PARTITION BY event_type ORDER BY b)
), scored AS (
  SELECT p.event_type, p.b, p.t, p.v, p.event_id,
         CASE WHEN a.cp IS NULL OR a.cnx IS NULL THEN NULL
              ELSE abs(
                (p.t * a.cp - a.tp)::HUGEINT
                  * (a.vn * a.cp - a.vp * a.cnx)::HUGEINT
                - (a.tn * a.cp - a.tp * a.cnx)::HUGEINT
                  * (p.v * a.cp - a.vp)::HUGEINT)
         END AS score
  FROM pb p JOIN anchors a ON a.event_type = p.event_type AND a.b = p.b
), ranked AS (
  SELECT event_type, b, t, v, event_id,
         CASE WHEN score IS NULL THEN
           row_number() OVER (PARTITION BY event_type, b
                              ORDER BY t, event_id)
         ELSE
           row_number() OVER (PARTITION BY event_type, b
                              ORDER BY score DESC NULLS LAST, t, event_id)
         END AS rn
  FROM scored
)
SELECT event_type, b, t, v, event_id
FROM ranked WHERE rn = 1
ORDER BY event_type, b
"""




def q_kg_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal matching by local dominance (operators/components.py::
    local_dominant_matching) over the synthetic cycle/pendant graph
    with sha-60 edge weights: every node nominates its minimum
    incident edge; mutual nominations are conflict-free and match
    simultaneously; matched nodes leave and the rounds repeat — the
    standard distributed coarsening/matching primitive, O(log n)
    rounds, two partial-agg groupBys per round. The oracle unrolls
    the identical rounds as materialized CTEs, so the gate pins the
    EXACT matched edge set — maximality and determinism, not just a
    cardinality."""
    from pyjelly_spark.operators.components import local_dominant_matching

    e = _synth_cycle_graph(spark, sf_dir)
    ew = e.select(
        "s",
        "t",
        F.expr(
            "cast(conv(substring(sha2(concat(cast(least(s, t) as string), ':',"
            " cast(greatest(s, t) as string)), 256), 1, 15), 16, 10) as bigint)"
        ).alias("w"),
    )
    return local_dominant_matching(ew).orderBy("s", "t")


SQL_KG_MATCHING = """
WITH
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
),
g0 AS MATERIALIZED (
  SELECT s, t, ('0x' || substring(sha256(s || ':' || t), 1, 15))::BIGINT AS w
  FROM (
    SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
    WHERE s < nn.n AND t < nn.n AND s <> t
  )
),
ROUNDS_PLACEHOLDER
SELECT s, t, w FROM (
MATCHED_PLACEHOLDER
) ORDER BY s, t
"""
SQL_KG_MATCHING = SQL_KG_MATCHING.replace("ROUNDS_PLACEHOLDER", r"""nom1 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g0
      UNION ALL
      SELECT t AS v, s, t, w FROM g0
    )
  ) WHERE rn = 1
),
dom1 AS MATERIALIZED (
  SELECT s, t, w FROM nom1 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone1 AS MATERIALIZED (
  SELECT s AS v FROM dom1 UNION SELECT t AS v FROM dom1
),
g1 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g0 g
  WHERE g.s NOT IN (SELECT v FROM gone1)
    AND g.t NOT IN (SELECT v FROM gone1)
),
nom2 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g1
      UNION ALL
      SELECT t AS v, s, t, w FROM g1
    )
  ) WHERE rn = 1
),
dom2 AS MATERIALIZED (
  SELECT s, t, w FROM nom2 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone2 AS MATERIALIZED (
  SELECT s AS v FROM dom2 UNION SELECT t AS v FROM dom2
),
g2 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g1 g
  WHERE g.s NOT IN (SELECT v FROM gone2)
    AND g.t NOT IN (SELECT v FROM gone2)
),
nom3 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g2
      UNION ALL
      SELECT t AS v, s, t, w FROM g2
    )
  ) WHERE rn = 1
),
dom3 AS MATERIALIZED (
  SELECT s, t, w FROM nom3 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone3 AS MATERIALIZED (
  SELECT s AS v FROM dom3 UNION SELECT t AS v FROM dom3
),
g3 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g2 g
  WHERE g.s NOT IN (SELECT v FROM gone3)
    AND g.t NOT IN (SELECT v FROM gone3)
),
nom4 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g3
      UNION ALL
      SELECT t AS v, s, t, w FROM g3
    )
  ) WHERE rn = 1
),
dom4 AS MATERIALIZED (
  SELECT s, t, w FROM nom4 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone4 AS MATERIALIZED (
  SELECT s AS v FROM dom4 UNION SELECT t AS v FROM dom4
),
g4 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g3 g
  WHERE g.s NOT IN (SELECT v FROM gone4)
    AND g.t NOT IN (SELECT v FROM gone4)
),
nom5 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g4
      UNION ALL
      SELECT t AS v, s, t, w FROM g4
    )
  ) WHERE rn = 1
),
dom5 AS MATERIALIZED (
  SELECT s, t, w FROM nom5 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone5 AS MATERIALIZED (
  SELECT s AS v FROM dom5 UNION SELECT t AS v FROM dom5
),
g5 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g4 g
  WHERE g.s NOT IN (SELECT v FROM gone5)
    AND g.t NOT IN (SELECT v FROM gone5)
),
nom6 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g5
      UNION ALL
      SELECT t AS v, s, t, w FROM g5
    )
  ) WHERE rn = 1
),
dom6 AS MATERIALIZED (
  SELECT s, t, w FROM nom6 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone6 AS MATERIALIZED (
  SELECT s AS v FROM dom6 UNION SELECT t AS v FROM dom6
),
g6 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g5 g
  WHERE g.s NOT IN (SELECT v FROM gone6)
    AND g.t NOT IN (SELECT v FROM gone6)
),
nom7 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g6
      UNION ALL
      SELECT t AS v, s, t, w FROM g6
    )
  ) WHERE rn = 1
),
dom7 AS MATERIALIZED (
  SELECT s, t, w FROM nom7 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone7 AS MATERIALIZED (
  SELECT s AS v FROM dom7 UNION SELECT t AS v FROM dom7
),
g7 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g6 g
  WHERE g.s NOT IN (SELECT v FROM gone7)
    AND g.t NOT IN (SELECT v FROM gone7)
),
nom8 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g7
      UNION ALL
      SELECT t AS v, s, t, w FROM g7
    )
  ) WHERE rn = 1
),
dom8 AS MATERIALIZED (
  SELECT s, t, w FROM nom8 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone8 AS MATERIALIZED (
  SELECT s AS v FROM dom8 UNION SELECT t AS v FROM dom8
),
g8 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g7 g
  WHERE g.s NOT IN (SELECT v FROM gone8)
    AND g.t NOT IN (SELECT v FROM gone8)
),
nom9 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g8
      UNION ALL
      SELECT t AS v, s, t, w FROM g8
    )
  ) WHERE rn = 1
),
dom9 AS MATERIALIZED (
  SELECT s, t, w FROM nom9 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone9 AS MATERIALIZED (
  SELECT s AS v FROM dom9 UNION SELECT t AS v FROM dom9
),
g9 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g8 g
  WHERE g.s NOT IN (SELECT v FROM gone9)
    AND g.t NOT IN (SELECT v FROM gone9)
),
nom10 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g9
      UNION ALL
      SELECT t AS v, s, t, w FROM g9
    )
  ) WHERE rn = 1
),
dom10 AS MATERIALIZED (
  SELECT s, t, w FROM nom10 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone10 AS MATERIALIZED (
  SELECT s AS v FROM dom10 UNION SELECT t AS v FROM dom10
),
g10 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g9 g
  WHERE g.s NOT IN (SELECT v FROM gone10)
    AND g.t NOT IN (SELECT v FROM gone10)
),
nom11 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g10
      UNION ALL
      SELECT t AS v, s, t, w FROM g10
    )
  ) WHERE rn = 1
),
dom11 AS MATERIALIZED (
  SELECT s, t, w FROM nom11 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone11 AS MATERIALIZED (
  SELECT s AS v FROM dom11 UNION SELECT t AS v FROM dom11
),
g11 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g10 g
  WHERE g.s NOT IN (SELECT v FROM gone11)
    AND g.t NOT IN (SELECT v FROM gone11)
),
nom12 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g11
      UNION ALL
      SELECT t AS v, s, t, w FROM g11
    )
  ) WHERE rn = 1
),
dom12 AS MATERIALIZED (
  SELECT s, t, w FROM nom12 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone12 AS MATERIALIZED (
  SELECT s AS v FROM dom12 UNION SELECT t AS v FROM dom12
),
g12 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g11 g
  WHERE g.s NOT IN (SELECT v FROM gone12)
    AND g.t NOT IN (SELECT v FROM gone12)
),
nom13 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g12
      UNION ALL
      SELECT t AS v, s, t, w FROM g12
    )
  ) WHERE rn = 1
),
dom13 AS MATERIALIZED (
  SELECT s, t, w FROM nom13 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone13 AS MATERIALIZED (
  SELECT s AS v FROM dom13 UNION SELECT t AS v FROM dom13
),
g13 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g12 g
  WHERE g.s NOT IN (SELECT v FROM gone13)
    AND g.t NOT IN (SELECT v FROM gone13)
),
nom14 AS MATERIALIZED (
  SELECT s, t, w FROM (
    SELECT v, s, t, w,
           row_number() OVER (PARTITION BY v ORDER BY w, s, t) AS rn
    FROM (
      SELECT s AS v, s, t, w FROM g13
      UNION ALL
      SELECT t AS v, s, t, w FROM g13
    )
  ) WHERE rn = 1
),
dom14 AS MATERIALIZED (
  SELECT s, t, w FROM nom14 GROUP BY 1, 2, 3 HAVING count(*) = 2
),
gone14 AS MATERIALIZED (
  SELECT s AS v FROM dom14 UNION SELECT t AS v FROM dom14
),
g14 AS MATERIALIZED (
  SELECT g.s, g.t, g.w FROM g13 g
  WHERE g.s NOT IN (SELECT v FROM gone14)
    AND g.t NOT IN (SELECT v FROM gone14)
)""").replace(
    "MATCHED_PLACEHOLDER", r"""  SELECT s, t, w FROM dom1
  UNION ALL
  SELECT s, t, w FROM dom2
  UNION ALL
  SELECT s, t, w FROM dom3
  UNION ALL
  SELECT s, t, w FROM dom4
  UNION ALL
  SELECT s, t, w FROM dom5
  UNION ALL
  SELECT s, t, w FROM dom6
  UNION ALL
  SELECT s, t, w FROM dom7
  UNION ALL
  SELECT s, t, w FROM dom8
  UNION ALL
  SELECT s, t, w FROM dom9
  UNION ALL
  SELECT s, t, w FROM dom10
  UNION ALL
  SELECT s, t, w FROM dom11
  UNION ALL
  SELECT s, t, w FROM dom12
  UNION ALL
  SELECT s, t, w FROM dom13
  UNION ALL
  SELECT s, t, w FROM dom14""")




def q_events_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the two
    deterministic experiment variants' purchase-amount distributions:
    D = max |F1 - F2| evaluated over the merged support equals
    max |c1*n2 - c2*n1| / (n1*n2) with integer cumulative counts —
    so the statistic is an exact integer ratio, not a float sup over
    interpolated ECDFs. Companion to events_mannwhitney: KS detects
    any shape difference, U detects stochastic ordering; both run on
    the COMPRESSED value domain (one groupBy to <= ~5e4 distinct
    cents, then one bounded window), never the raw 10^12 rows.

    Single row: n1, n2, d_num = max|c1*n2 - c2*n1|, d_ppm, and the
    cents value where the sup is attained (smallest such value —
    a deterministic, decision-relevant readout: where the
    distributions diverge most)."""
    from pyjelly_spark.functions.text import hex_hash

    ev = _t(spark, sf_dir, "events")
    vals = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 100).cast("long").alias("c"),
            hex_hash(F.col("user_id").cast("string"), 2).alias("variant"),
        )
        .groupBy("c")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("a1"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("a2"),
        )
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "c",
        F.sum("a1").over(w).alias("c1"),
        F.sum("a2").over(w).alias("c2"),
    )
    tot = vals.agg(
        F.sum("a1").cast("long").alias("n1"), F.sum("a2").cast("long").alias("n2")
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "c",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("gap"),
    )
    return (
        scored.groupBy("n1", "n2")
        .agg(
            F.max("gap").cast("long").alias("d_num"),
            # min_by over (-gap, c): max gap first, smallest c on ties
            F.expr("min_by(c, struct(-gap, c))").alias("argmax_c"),
        )
        .select(
            "n1",
            "n2",
            "d_num",
            F.expr("d_num * 1000000L div (n1 * n2)").alias("d_ppm"),
            F.col("argmax_c").cast("long").alias("argmax_c"),
        )
    )


SQL_EVENTS_KS = """
WITH vals AS (
  SELECT floor(value*100)::BIGINT AS c,
         sum(CASE WHEN ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT % 2 = 0
                  THEN 1 ELSE 0 END)::BIGINT AS a1,
         sum(CASE WHEN ('0x' || substring(sha256(user_id::VARCHAR), 1, 15))::BIGINT % 2 = 1
                  THEN 1 ELSE 0 END)::BIGINT AS a2
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), cum AS (
  SELECT c,
         sum(a1) OVER (ORDER BY c) AS c1,
         sum(a2) OVER (ORDER BY c) AS c2
  FROM vals
), tot AS (
  SELECT sum(a1)::BIGINT AS n1, sum(a2)::BIGINT AS n2 FROM vals
), scored AS (
  SELECT c, n1, n2, abs(c1 * n2 - c2 * n1)::BIGINT AS gap
  FROM cum CROSS JOIN tot
)
SELECT n1, n2,
       max(gap)::BIGINT AS d_num,
       (max(gap) * 1000000 // (n1 * n2))::BIGINT AS d_ppm,
       min(c) FILTER (WHERE gap = (SELECT max(gap) FROM scored))::BIGINT
         AS argmax_c
FROM scored GROUP BY n1, n2
"""




def q_doc_codeswitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level language segmentation (code-switch detection):
    split each document into sentences, vote each sentence's language
    with the repo's per-language stopword alternations (deterministic
    argmax: count, then fixed language priority), and report the
    dominant language, the number of adjacent-sentence language
    SWITCHES, and the distinct language count per doc — the readout a
    multilingual curation pipeline uses to route mixed documents to
    splitting instead of trusting whole-doc labels.

    Entirely in-row (split + transform + filter higher-order
    functions, regexp votes per sentence) — zero shuffle before the
    readout; the struct-compare tie-break is the same (n, -priority,
    lang) trick as predict_language, identical in DuckDB struct
    ordering."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(
            "filter(transform(split(text, '\\\\.\\\\s+'), x -> trim(x)),"
            " x -> x <> '')"
        ).alias("sents"),
    )
    d = d.select(
        "doc_id",
        F.expr(
            "transform(sents, s -> greatest(struct(regexp_count(s, '\\\\b(the|and|of|to|a|in|is)\\\\b') AS n, 0 AS p, 'en' AS l), struct(regexp_count(s, '\\\\b(der|die|und|das|ist|nicht)\\\\b') AS n, -1 AS p, 'de' AS l), struct(regexp_count(s, '\\\\b(le|la|et|les|des|est)\\\\b') AS n, -2 AS p, 'fr' AS l), struct(regexp_count(s, '\\\\b(el|los|las|que|es|y)\\\\b') AS n, -3 AS p, 'es' AS l), struct(regexp_count(s, '[\\\\x{4e00}-\\\\x{9fff}]') AS n, -4 AS p, 'zh' AS l)).l)"
        ).alias("slangs"),
    )
    return d.select(
        "doc_id",
        F.expr("size(slangs)").cast("long").alias("n_sentences"),
        F.expr(
            "greatest(struct(size(filter(slangs, x -> x = 'en')) AS n, 0 AS p, 'en' AS l), struct(size(filter(slangs, x -> x = 'de')) AS n, -1 AS p, 'de' AS l), struct(size(filter(slangs, x -> x = 'fr')) AS n, -2 AS p, 'fr' AS l), struct(size(filter(slangs, x -> x = 'es')) AS n, -3 AS p, 'es' AS l), struct(size(filter(slangs, x -> x = 'zh')) AS n, -4 AS p, 'zh' AS l)).l"
        ).alias("dominant_lang"),
        F.expr(
            "IF(size(slangs) < 2, 0, size(filter(sequence(1, size(slangs) - 1),"
            " i -> element_at(slangs, i + 1) <> element_at(slangs, i))))"
        ).cast("long").alias("n_switches"),
        F.expr("size(array_distinct(slangs))").cast("long").alias("n_langs"),
    ).orderBy("doc_id")


SQL_DOC_CODESWITCH = r"""
WITH s AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split_regex(text, '\.\s+'), x -> trim(x)),
           x -> x <> '') AS sents
  FROM documents
), sl AS (
  SELECT doc_id,
         [list_max([{'n': len(regexp_extract_all(s, '\b(the|and|of|to|a|in|is)\b')), 'p': 0, 'l': 'en'}, {'n': len(regexp_extract_all(s, '\b(der|die|und|das|ist|nicht)\b')), 'p': -1, 'l': 'de'}, {'n': len(regexp_extract_all(s, '\b(le|la|et|les|des|est)\b')), 'p': -2, 'l': 'fr'}, {'n': len(regexp_extract_all(s, '\b(el|los|las|que|es|y)\b')), 'p': -3, 'l': 'es'}, {'n': len(regexp_extract_all(s, '[\p{Han}]')), 'p': -4, 'l': 'zh'}]).l for s in sents] AS slangs
  FROM s
)
SELECT doc_id,
       len(slangs)::BIGINT AS n_sentences,
       list_max([{'n': len(list_filter(slangs, x -> x = 'en')), 'p': 0, 'l': 'en'}, {'n': len(list_filter(slangs, x -> x = 'de')), 'p': -1, 'l': 'de'}, {'n': len(list_filter(slangs, x -> x = 'fr')), 'p': -2, 'l': 'fr'}, {'n': len(list_filter(slangs, x -> x = 'es')), 'p': -3, 'l': 'es'}, {'n': len(list_filter(slangs, x -> x = 'zh')), 'p': -4, 'l': 'zh'}]).l AS dominant_lang,
       (CASE WHEN len(slangs) < 2 THEN 0
             ELSE len(list_filter(generate_series(1, len(slangs) - 1),
                      i -> slangs[i + 1] <> slangs[i])) END)::BIGINT
         AS n_switches,
       len(list_distinct(slangs))::BIGINT AS n_langs
FROM sl
ORDER BY doc_id
"""




def q_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS from winnowing fingerprints: docs
    sharing >= 2 selected fingerprints (functions/text.py::
    winnow_fingerprint_hashes) become candidate pairs via a
    fingerprint equi-join — the MOSS pipeline's grouping step.
    Fingerprints appearing in > 50 docs are dropped first (the same
    hot-key cap as decontam: boilerplate shingles would otherwise
    quadratically explode the join at corpus scale). Pairs feed the
    same distributed large-star/small-star CC the canonicalizer uses;
    output is one row per cluster (representative = min doc_id) with
    the member count and a member checksum. Oracle: identical
    winnowing + join in SQL, clusters by recursive-CTE transitive
    closure — the iterative distributed algorithm checked against a
    declarative exact one (the dedup_clusters pattern)."""
    from pyjelly_spark.functions.text import winnow_fingerprint_hashes
    from pyjelly_spark.operators.components import connected_components

    # the table arrives as one file -> one partition; spread the
    # hash-dominated fingerprint scan across cores before it runs
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    fps = winnow_fingerprint_hashes(docs)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= 50)
        .select("fp")
    )
    kept = fps.join(rare, "fp")
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), "fp")
        .where(F.expr("a.doc_id < b.doc_id"))
        .groupBy(F.expr("a.doc_id").alias("da"), F.expr("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= 2)
    )
    cc = connected_components(
        pairs.select(
            F.format_string("%012d", "da").alias("src"),
            F.format_string("%012d", "db").alias("dst"),
        )
    )
    return (
        cc.select(
            F.expr("cast(node as bigint)").alias("doc_id"),
            F.expr("cast(component as bigint)").alias("rep"),
        )
        .groupBy("rep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("member_chk"),
        )
        .orderBy("rep")
    )


SQL_DEDUP_WINNOW = r"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_filter(
           string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
           x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id,
         [ ('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15))::BIGINT
           for i in generate_series(1, greatest(len(words) - 4, 0)) ] AS grams
  FROM t
), s AS (
  SELECT doc_id, grams, len(grams) AS n_grams,
         least(4, len(grams)) AS ww
  FROM g
), sel AS (
  SELECT doc_id, grams,
         list_distinct(
           [ p + ww - 1 - (list_min(
               [ grams[p+o] * 4 + (ww - 1 - o)
                 for o in generate_series(0, ww - 1) ]) % 4)
             for p in generate_series(1, CASE WHEN n_grams = 0 THEN 0
                                            ELSE n_grams - ww + 1 END) ]
         ) AS sel
  FROM s
), fps AS (
  SELECT DISTINCT doc_id, unnest([ grams[j] for j in sel ]) AS fp
  FROM sel
), rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50
), kept AS (
  SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON r.fp = f.fp
), pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
), und AS (
  SELECT da AS s, db AS t FROM pairs
  UNION
  SELECT db AS s, da AS t FROM pairs
), reach AS (
  SELECT s, t FROM und
  UNION
  SELECT r.s, u.t FROM reach r JOIN und u ON u.s = r.t
), cmap AS (
  SELECT x.s AS doc_id, least(x.s, min(r.t)) AS rep
  FROM (SELECT DISTINCT s FROM und) x
  LEFT JOIN reach r ON r.s = x.s
  GROUP BY x.s
)
SELECT rep, count(*)::BIGINT AS n_docs, sum(doc_id)::BIGINT AS member_chk
FROM cmap GROUP BY 1 ORDER BY 1
"""




def q_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (Delta/Iceberg upsert) as one full-outer
    join: a deterministic CDC batch derived from the orders table —
    UPDATE rows (key % 10 = 3: price + 1 cent-equivalent bump),
    DELETE rows (key % 10 = 7), INSERT rows (fresh keys above
    max+1) — applied in a single pass with WHEN MATCHED / NOT
    MATCHED branches expressed as CASE over the join. Output is the
    audit row a MERGE commits to the transaction log: per-action
    counts plus exact integer checksums (sum of keys and of
    floor(price*100)) of the resulting snapshot — so the gate pins
    the merged TABLE STATE, not just the action counts.

    Plan shape: ONE shuffle (the full-outer key join; both sides
    partial-agg afterwards). At 10^12 rows this is exactly how MERGE
    executes on a sorted/bucketed lakehouse table — no per-row
    mutation, a new snapshot from one join."""
    orders = _t(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )
    mx = t.agg(F.max("o_orderkey").alias("m")).collect()[0]["m"]
    cdc = (
        t.where(F.col("o_orderkey") % 10 == 3)
        .select(
            "o_orderkey",
            F.lit("U").alias("op"),
            (F.col("price_c") + 100).alias("new_price_c"),
        )
        .unionByName(
            t.where(F.col("o_orderkey") % 10 == 7).select(
                "o_orderkey", F.lit("D").alias("op"),
                F.lit(None).cast("long").alias("new_price_c"),
            )
        )
        .unionByName(
            t.where(F.col("o_orderkey") % 100 == 1).select(
                (F.col("o_orderkey") + F.lit(int(mx)) + 1).alias("o_orderkey"),
                F.lit("I").alias("op"),
                (F.col("price_c") * 2).alias("new_price_c"),
            )
        )
    )
    merged = t.alias("t").join(cdc.alias("c"), "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.col("t.price_c").alias("old_p"),
        F.col("c.op").alias("op"),
        F.col("c.new_price_c").alias("new_p"),
    )
    result = merged.where(
        (F.col("op").isNull()) | (F.col("op") != "D")
    ).select(
        "o_orderkey",
        F.when(F.col("op").isNull(), F.col("old_p"))
        .otherwise(F.col("new_p"))
        .alias("price_c"),
    )
    actions = merged.agg(
        F.sum((F.col("op") == "U").cast("long")).alias("n_updated"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_deleted"),
        F.sum(
            ((F.col("op") == "I") & F.col("old_p").isNull()).cast("long")
        ).alias("n_inserted"),
        F.sum(F.col("op").isNull().cast("long")).alias("n_untouched"),
    )
    snap = result.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_chk"),
        F.sum("price_c").cast("long").alias("price_chk"),
    )
    return actions.crossJoin(snap)


SQL_ORDERS_MERGE = """
WITH t AS (
  SELECT o_orderkey, floor(o_totalprice*100)::BIGINT AS price_c FROM orders
), mx AS (SELECT max(o_orderkey)::BIGINT AS m FROM t),
cdc AS (
  SELECT o_orderkey, 'U' AS op, price_c + 100 AS new_price_c
  FROM t WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT o_orderkey, 'D' AS op, NULL::BIGINT AS new_price_c
  FROM t WHERE o_orderkey % 10 = 7
  UNION ALL
  SELECT t.o_orderkey + mx.m + 1 AS o_orderkey, 'I' AS op,
         price_c * 2 AS new_price_c
  FROM t, mx WHERE t.o_orderkey % 100 = 1
), merged AS (
  SELECT coalesce(t.o_orderkey, c.o_orderkey) AS o_orderkey,
         t.price_c AS old_p, c.op, c.new_price_c AS new_p
  FROM t FULL OUTER JOIN cdc c ON c.o_orderkey = t.o_orderkey
), result AS (
  SELECT o_orderkey,
         CASE WHEN op IS NULL THEN old_p ELSE new_p END AS price_c
  FROM merged WHERE op IS NULL OR op <> 'D'
), actions AS (
  SELECT sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END)::BIGINT AS n_updated,
         sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)::BIGINT AS n_deleted,
         sum(CASE WHEN op = 'I' AND old_p IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_inserted,
         sum(CASE WHEN op IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_untouched
  FROM merged
), snap AS (
  SELECT count(*)::BIGINT AS n_rows, sum(o_orderkey)::BIGINT AS key_chk,
         sum(price_c)::BIGINT AS price_chk
  FROM result
)
SELECT * FROM actions CROSS JOIN snap
"""




def q_orders_bloomskip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file Bloom-filter scan-pruning audit — the point-lookup
    complement to the zone-map audit (orders_skipping): each of 64
    fixed o_orderkey-range files keeps a 1024-bit / 3-hash Bloom
    filter over o_custkey (portable sha-60 bucket hash, so even the
    false-positive set is engine-reproducible); a point lookup scans a
    file iff all three probe bits are set. For five deterministic
    probe customers the audit reports files scanned under Bloom vs
    under min/max zone maps (which never prune a uniformly scattered
    key — the exact reason lakehouses add Bloom indexes), plus the
    I/O-bound rows in scanned files and the true matching rows.

    Plan shape: the filter build is one distinct (file, bit) aggregate
    bounded by 64*1024 rows TOTAL regardless of table size — manifest
    metadata, not data; probes are broadcast joins against it."""
    orders = _t(spark, sf_dir, "orders")
    n = orders.count()
    width = (n + 63) // 64
    probes = [3, 17, 41, 77, 113]
    base = orders.select(
        F.expr(f"o_orderkey div {width}").alias("f"), "o_custkey"
    )
    bits = (
        base.select(
            "f",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
            "o_custkey",
        )
        .select(
            "f",
            "j",
            F.expr(
                "pmod(cast(conv(substring(sha2(concat(cast(j as string), ':',"
                " cast(o_custkey as string)), 256), 1, 15), 16, 10) as bigint),"
                " 1024)"
            ).alias("b"),
        )
        .distinct()
    )
    frows = base.groupBy("f").agg(F.count(F.lit(1)).alias("rows_in_file"))
    zm = base.groupBy("f").agg(
        F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi")
    )
    probe_bits = spark.createDataFrame(
        [(c, j) for c in probes for j in range(3)], "probe: long, j: long"
    ).select(
        "probe",
        "j",
        F.expr(
            "pmod(cast(conv(substring(sha2(concat(cast(j as string), ':',"
            " cast(probe as string)), 256), 1, 15), 16, 10) as bigint), 1024)"
        ).alias("b"),
    )
    scanned = (
        probe_bits.join(bits, ["j", "b"])
        .groupBy("probe", "f")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == 3)
        .select("probe", "f")
    )
    per_probe = (
        scanned.join(frows, "f")
        .groupBy("probe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bloom_files"),
            F.sum("rows_in_file").cast("long").alias("bloom_rows"),
        )
    )
    zm_probe = (
        spark.createDataFrame([(c,) for c in probes], "probe: long")
        .crossJoin(zm)
        .where((F.col("probe") >= F.col("lo")) & (F.col("probe") <= F.col("hi")))
        .groupBy("probe")
        .agg(F.count(F.lit(1)).cast("long").alias("zm_files"))
    )
    matched = (
        base.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("m"))
        .where(F.col("o_custkey").isin(probes))
        .select(F.col("o_custkey").alias("probe"), F.col("m").cast("long").alias("rows_matched"))
    )
    pr = spark.createDataFrame([(c,) for c in probes], "probe: long")
    return (
        pr.join(per_probe, "probe", "left")
        .join(zm_probe, "probe", "left")
        .join(matched, "probe", "left")
        .select(
            "probe",
            F.coalesce("bloom_files", F.lit(0)).alias("bloom_files"),
            F.coalesce("bloom_rows", F.lit(0)).alias("bloom_rows"),
            F.coalesce("zm_files", F.lit(0)).alias("zm_files"),
            F.coalesce("rows_matched", F.lit(0)).alias("rows_matched"),
        )
        .orderBy("probe")
    )


SQL_ORDERS_BLOOMSKIP = """
WITH params AS (
  SELECT ((count(*) + 63) // 64)::BIGINT AS width FROM orders
), base AS (
  SELECT (o_orderkey // p.width)::BIGINT AS f, o_custkey
  FROM orders o CROSS JOIN params p
), bits AS (
  SELECT DISTINCT f, j.range AS j,
         ('0x' || substring(sha256(j.range || ':' || o_custkey), 1, 15))::BIGINT % 1024 AS b
  FROM base, range(3) j
), frows AS (
  SELECT f, count(*)::BIGINT AS rows_in_file FROM base GROUP BY 1
), zm AS (
  SELECT f, min(o_custkey) AS lo, max(o_custkey) AS hi FROM base GROUP BY 1
), probes AS (
  SELECT unnest([3, 17, 41, 77, 113])::BIGINT AS probe
), pbits AS (
  SELECT probe, j.range AS j,
         ('0x' || substring(sha256(j.range || ':' || probe), 1, 15))::BIGINT % 1024 AS b
  FROM probes, range(3) j
), scanned AS (
  SELECT p.probe, bt.f
  FROM pbits p JOIN bits bt ON bt.j = p.j AND bt.b = p.b
  GROUP BY 1, 2 HAVING count(*) = 3
), per_probe AS (
  SELECT s.probe, count(*)::BIGINT AS bloom_files,
         sum(fr.rows_in_file)::BIGINT AS bloom_rows
  FROM scanned s JOIN frows fr ON fr.f = s.f GROUP BY 1
), zm_probe AS (
  SELECT p.probe, count(*)::BIGINT AS zm_files
  FROM probes p JOIN zm ON p.probe >= zm.lo AND p.probe <= zm.hi
  GROUP BY 1
), matched AS (
  SELECT o_custkey AS probe, count(*)::BIGINT AS rows_matched
  FROM base WHERE o_custkey IN (3, 17, 41, 77, 113) GROUP BY 1
)
SELECT p.probe,
       coalesce(pp.bloom_files, 0)::BIGINT AS bloom_files,
       coalesce(pp.bloom_rows, 0)::BIGINT AS bloom_rows,
       coalesce(z.zm_files, 0)::BIGINT AS zm_files,
       coalesce(m.rows_matched, 0)::BIGINT AS rows_matched
FROM probes p
LEFT JOIN per_probe pp ON pp.probe = p.probe
LEFT JOIN zm_probe z ON z.probe = p.probe
LEFT JOIN matched m ON m.probe = p.probe
ORDER BY p.probe
"""




def q_events_critpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed-trace critical-path analysis: events become spans
    in a synthetic quaternary forest (span v's parent is v div 4,
    roots v < 4; durations = exact cents), and each span's end-to-end
    root distance is computed by ADDITIVE pointer doubling
    (operators/components.py::root_distance_doubling) — O(log depth)
    self-joins instead of an O(depth) sequential walk, the (+, 0)-
    semiring sibling of the CC machinery. Per trace root: span count,
    the critical-path latency (max root distance) and its argmax span
    (smallest id on ties), and the total busy time. Oracle: a
    recursive CTE accumulating parent-chain durations — the
    sequential formulation the doubling must reproduce exactly."""
    from pyjelly_spark.operators.components import root_distance_doubling

    ev = _t(spark, sf_dir, "events")
    nodes = ev.select(
        F.col("event_id").alias("node"),
        F.when(F.col("event_id") < 4, None)
        .otherwise(F.expr("event_id div 4"))
        .alias("parent"),
        F.floor(F.col("value") * 100).cast("long").alias("dur"),
    )
    rd = root_distance_doubling(nodes)
    return (
        rd.groupBy("root")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.max("root_dist").cast("long").alias("critpath_c"),
            F.expr("min_by(node, struct(-root_dist, node))").cast("long").alias(
                "critpath_span"
            ),
            F.sum("root_dist").cast("long").alias("total_pathsum_c"),
        )
        .orderBy("root")
    )


SQL_EVENTS_CRITPATH = """
WITH RECURSIVE spans AS (
  SELECT event_id AS node,
         CASE WHEN event_id < 4 THEN NULL ELSE event_id // 4 END AS parent,
         floor(value*100)::BIGINT AS dur
  FROM events
), walk AS (
  SELECT node, node AS root, dur AS root_dist FROM spans WHERE parent IS NULL
  UNION ALL
  SELECT s.node, w.root, w.root_dist + s.dur
  FROM spans s JOIN walk w ON w.node = s.parent
)
SELECT root,
       count(*)::BIGINT AS n_spans,
       max(root_dist)::BIGINT AS critpath_c,
       min(node) FILTER (WHERE root_dist =
         (SELECT max(w2.root_dist) FROM walk w2 WHERE w2.root = walk.root)
       )::BIGINT AS critpath_span,
       sum(root_dist)::BIGINT AS total_pathsum_c
FROM walk GROUP BY root ORDER BY root
"""




def q_events_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two item rankers (Cormack et al.):
    ranker A orders items by distinct click users, ranker B by total
    purchase cents; fused score = sum over rankers of
    1e6 div (60 + rank) — the classic RRF k=60 formula as exact
    integer division, so the fused ordering is engine-deterministic
    (ties to the smaller item id). Emits the fused top-20 with both
    source ranks.

    Plan shape: two item-level aggregates (partial-agg, one shuffle
    each over items, not raw events), two item-domain windows (the
    item catalogue, thousands of keys), one join — fusion never sees
    the raw 10^12-event log."""
    ev = _t(spark, sf_dir, "events")
    items = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).where(F.col("item").isNotNull())
    ra = (
        items.where(F.col("event_type") == "click")
        .groupBy("item")
        .agg(F.countDistinct("user_id").alias("users"))
        .select(
            "item",
            F.row_number()
            .over(Window.orderBy(F.col("users").desc(), F.col("item")))
            .alias("rank_a"),
        )
    )
    rb = (
        items.where(F.col("event_type") == "purchase")
        .groupBy("item")
        .agg(F.sum("cents").alias("rev"))
        .select(
            "item",
            F.row_number()
            .over(Window.orderBy(F.col("rev").desc(), F.col("item")))
            .alias("rank_b"),
        )
    )
    fused = (
        ra.join(rb, "item", "full_outer")
        .select(
            "item",
            "rank_a",
            "rank_b",
            (
                F.coalesce(F.expr("1000000L div (60 + rank_a)"), F.lit(0))
                + F.coalesce(F.expr("1000000L div (60 + rank_b)"), F.lit(0))
            ).cast("long").alias("rrf_x1e6"),
        )
    )
    w = Window.orderBy(F.col("rrf_x1e6").desc(), F.col("item"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= 20)
        .select("fused_rank", "item", "rank_a", "rank_b", "rrf_x1e6")
        .orderBy("fused_rank")
    )


SQL_EVENTS_RRF = """
WITH items AS (
  SELECT json_extract(props, '$.k')::BIGINT AS item, event_type, user_id,
         floor(value*100)::BIGINT AS cents
  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
), ra AS (
  SELECT item, row_number() OVER (ORDER BY count(DISTINCT user_id) DESC, item)
           AS rank_a
  FROM items WHERE event_type = 'click' GROUP BY item
), rb AS (
  SELECT item, row_number() OVER (ORDER BY sum(cents) DESC, item) AS rank_b
  FROM items WHERE event_type = 'purchase' GROUP BY item
), fused AS (
  SELECT coalesce(ra.item, rb.item) AS item, ra.rank_a, rb.rank_b,
         (coalesce(1000000 // (60 + ra.rank_a), 0)
          + coalesce(1000000 // (60 + rb.rank_b), 0))::BIGINT AS rrf_x1e6
  FROM ra FULL OUTER JOIN rb ON rb.item = ra.item
)
SELECT row_number() OVER (ORDER BY rrf_x1e6 DESC, item) AS fused_rank,
       item, rank_a, rank_b, rrf_x1e6
FROM fused
QUALIFY fused_rank <= 20
ORDER BY fused_rank
"""


def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level in exact milli-units: syllables
    approximated as vowel-group runs (the standard regex heuristic),
    sentences as period-delimited segments (min 1), and the FK
    formula 0.39*W/S + 11.8*Syl/W - 15.59 evaluated as ONE integer
    expression scaled x1000 with div — no float, so per-doc grades
    (and the corpus histogram a curation pipeline thresholds on)
    reproduce bit-exactly. Pure Catalyst regexp_count: zero shuffle,
    whole-stage codegen."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "size(filter(split(lower(text), ' '), x -> x <> ''))"
        ).cast("long").alias("n_words"),
        F.greatest(
            F.expr("size(split(text, '\\\\.')) - 1"), F.lit(1)
        ).cast("long").alias("n_sentences"),
        F.expr(
            "regexp_count(lower(text), '[aeiouy]+')"
        ).cast("long").alias("n_syllables"),
    ).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "cast((390 * n_words * n_words + 11800 * n_syllables * n_sentences"
            " - 15590 * n_words * n_sentences)"
            " div (n_words * n_sentences) as bigint)"
        ).alias("fk_grade_x1e3"),
    ).orderBy("doc_id")


SQL_DOC_READABILITY = r"""
WITH f AS (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), x -> x <> ''))::BIGINT
           AS n_words,
         greatest(len(string_split(text, '.')) - 1, 1)::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       ((390 * n_words * n_words + 11800 * n_syllables * n_sentences
         - 15590 * n_words * n_sentences)
        // (n_words * n_sentences))::BIGINT AS fk_grade_x1e3
FROM f ORDER BY doc_id
"""




def q_kg_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set by Luby's algorithm with deterministic
    sha-60 priorities (operators/components.py::luby_mis) over the
    synthetic cycle/pendant graph: a node joins the MIS when its
    (priority, id) is a strict local minimum among surviving
    neighbors; winners and their neighborhoods leave; repeat. The
    distributed rounds (one neighbor-min groupBy + anti-join removal
    each) are pinned exactly by a 16-round unrolled oracle — the gate
    checks the full (node, round) selection, i.e. WHICH round each
    member won, not just the final set. MIS is the classic symmetry-
    breaking primitive (scheduling, coloring, matching) and with hash
    priorities it is fully reproducible at any parallelism."""
    from pyjelly_spark.operators.components import luby_mis

    e = _synth_cycle_graph(spark, sf_dir)
    return luby_mis(e).orderBy("node")


SQL_KG_MIS = """
WITH
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
),
le0 AS MATERIALIZED (
  SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0
),
live0 AS MATERIALIZED (
  SELECT DISTINCT s AS node,
         ('0x' || substring(sha256(s::VARCHAR), 1, 15))::BIGINT AS p
  FROM le0
),
ROUNDS_PLACEHOLDER
SELECT node, round FROM (
MIS_PLACEHOLDER
) ORDER BY node
"""
SQL_KG_MIS = SQL_KG_MIS.replace("ROUNDS_PLACEHOLDER", r"""nm1 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le0 e JOIN live0 ln ON ln.node = e.t
  GROUP BY 1
),
win1 AS MATERIALIZED (
  SELECT n.node FROM live0 n LEFT JOIN nm1 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem1 AS MATERIALIZED (
  SELECT node FROM win1
  UNION
  SELECT e.t AS node FROM le0 e JOIN win1 w ON w.node = e.s
),
live1 AS MATERIALIZED (
  SELECT n.node, n.p FROM live0 n
  WHERE n.node NOT IN (SELECT node FROM rem1)
),
le1 AS MATERIALIZED (
  SELECT e.s, e.t FROM le0 e
  WHERE e.s NOT IN (SELECT node FROM rem1)
    AND e.t NOT IN (SELECT node FROM rem1)
),
nm2 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le1 e JOIN live1 ln ON ln.node = e.t
  GROUP BY 1
),
win2 AS MATERIALIZED (
  SELECT n.node FROM live1 n LEFT JOIN nm2 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem2 AS MATERIALIZED (
  SELECT node FROM win2
  UNION
  SELECT e.t AS node FROM le1 e JOIN win2 w ON w.node = e.s
),
live2 AS MATERIALIZED (
  SELECT n.node, n.p FROM live1 n
  WHERE n.node NOT IN (SELECT node FROM rem2)
),
le2 AS MATERIALIZED (
  SELECT e.s, e.t FROM le1 e
  WHERE e.s NOT IN (SELECT node FROM rem2)
    AND e.t NOT IN (SELECT node FROM rem2)
),
nm3 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le2 e JOIN live2 ln ON ln.node = e.t
  GROUP BY 1
),
win3 AS MATERIALIZED (
  SELECT n.node FROM live2 n LEFT JOIN nm3 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem3 AS MATERIALIZED (
  SELECT node FROM win3
  UNION
  SELECT e.t AS node FROM le2 e JOIN win3 w ON w.node = e.s
),
live3 AS MATERIALIZED (
  SELECT n.node, n.p FROM live2 n
  WHERE n.node NOT IN (SELECT node FROM rem3)
),
le3 AS MATERIALIZED (
  SELECT e.s, e.t FROM le2 e
  WHERE e.s NOT IN (SELECT node FROM rem3)
    AND e.t NOT IN (SELECT node FROM rem3)
),
nm4 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le3 e JOIN live3 ln ON ln.node = e.t
  GROUP BY 1
),
win4 AS MATERIALIZED (
  SELECT n.node FROM live3 n LEFT JOIN nm4 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem4 AS MATERIALIZED (
  SELECT node FROM win4
  UNION
  SELECT e.t AS node FROM le3 e JOIN win4 w ON w.node = e.s
),
live4 AS MATERIALIZED (
  SELECT n.node, n.p FROM live3 n
  WHERE n.node NOT IN (SELECT node FROM rem4)
),
le4 AS MATERIALIZED (
  SELECT e.s, e.t FROM le3 e
  WHERE e.s NOT IN (SELECT node FROM rem4)
    AND e.t NOT IN (SELECT node FROM rem4)
),
nm5 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le4 e JOIN live4 ln ON ln.node = e.t
  GROUP BY 1
),
win5 AS MATERIALIZED (
  SELECT n.node FROM live4 n LEFT JOIN nm5 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem5 AS MATERIALIZED (
  SELECT node FROM win5
  UNION
  SELECT e.t AS node FROM le4 e JOIN win5 w ON w.node = e.s
),
live5 AS MATERIALIZED (
  SELECT n.node, n.p FROM live4 n
  WHERE n.node NOT IN (SELECT node FROM rem5)
),
le5 AS MATERIALIZED (
  SELECT e.s, e.t FROM le4 e
  WHERE e.s NOT IN (SELECT node FROM rem5)
    AND e.t NOT IN (SELECT node FROM rem5)
),
nm6 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le5 e JOIN live5 ln ON ln.node = e.t
  GROUP BY 1
),
win6 AS MATERIALIZED (
  SELECT n.node FROM live5 n LEFT JOIN nm6 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem6 AS MATERIALIZED (
  SELECT node FROM win6
  UNION
  SELECT e.t AS node FROM le5 e JOIN win6 w ON w.node = e.s
),
live6 AS MATERIALIZED (
  SELECT n.node, n.p FROM live5 n
  WHERE n.node NOT IN (SELECT node FROM rem6)
),
le6 AS MATERIALIZED (
  SELECT e.s, e.t FROM le5 e
  WHERE e.s NOT IN (SELECT node FROM rem6)
    AND e.t NOT IN (SELECT node FROM rem6)
),
nm7 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le6 e JOIN live6 ln ON ln.node = e.t
  GROUP BY 1
),
win7 AS MATERIALIZED (
  SELECT n.node FROM live6 n LEFT JOIN nm7 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem7 AS MATERIALIZED (
  SELECT node FROM win7
  UNION
  SELECT e.t AS node FROM le6 e JOIN win7 w ON w.node = e.s
),
live7 AS MATERIALIZED (
  SELECT n.node, n.p FROM live6 n
  WHERE n.node NOT IN (SELECT node FROM rem7)
),
le7 AS MATERIALIZED (
  SELECT e.s, e.t FROM le6 e
  WHERE e.s NOT IN (SELECT node FROM rem7)
    AND e.t NOT IN (SELECT node FROM rem7)
),
nm8 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le7 e JOIN live7 ln ON ln.node = e.t
  GROUP BY 1
),
win8 AS MATERIALIZED (
  SELECT n.node FROM live7 n LEFT JOIN nm8 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem8 AS MATERIALIZED (
  SELECT node FROM win8
  UNION
  SELECT e.t AS node FROM le7 e JOIN win8 w ON w.node = e.s
),
live8 AS MATERIALIZED (
  SELECT n.node, n.p FROM live7 n
  WHERE n.node NOT IN (SELECT node FROM rem8)
),
le8 AS MATERIALIZED (
  SELECT e.s, e.t FROM le7 e
  WHERE e.s NOT IN (SELECT node FROM rem8)
    AND e.t NOT IN (SELECT node FROM rem8)
),
nm9 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le8 e JOIN live8 ln ON ln.node = e.t
  GROUP BY 1
),
win9 AS MATERIALIZED (
  SELECT n.node FROM live8 n LEFT JOIN nm9 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem9 AS MATERIALIZED (
  SELECT node FROM win9
  UNION
  SELECT e.t AS node FROM le8 e JOIN win9 w ON w.node = e.s
),
live9 AS MATERIALIZED (
  SELECT n.node, n.p FROM live8 n
  WHERE n.node NOT IN (SELECT node FROM rem9)
),
le9 AS MATERIALIZED (
  SELECT e.s, e.t FROM le8 e
  WHERE e.s NOT IN (SELECT node FROM rem9)
    AND e.t NOT IN (SELECT node FROM rem9)
),
nm10 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le9 e JOIN live9 ln ON ln.node = e.t
  GROUP BY 1
),
win10 AS MATERIALIZED (
  SELECT n.node FROM live9 n LEFT JOIN nm10 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem10 AS MATERIALIZED (
  SELECT node FROM win10
  UNION
  SELECT e.t AS node FROM le9 e JOIN win10 w ON w.node = e.s
),
live10 AS MATERIALIZED (
  SELECT n.node, n.p FROM live9 n
  WHERE n.node NOT IN (SELECT node FROM rem10)
),
le10 AS MATERIALIZED (
  SELECT e.s, e.t FROM le9 e
  WHERE e.s NOT IN (SELECT node FROM rem10)
    AND e.t NOT IN (SELECT node FROM rem10)
),
nm11 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le10 e JOIN live10 ln ON ln.node = e.t
  GROUP BY 1
),
win11 AS MATERIALIZED (
  SELECT n.node FROM live10 n LEFT JOIN nm11 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem11 AS MATERIALIZED (
  SELECT node FROM win11
  UNION
  SELECT e.t AS node FROM le10 e JOIN win11 w ON w.node = e.s
),
live11 AS MATERIALIZED (
  SELECT n.node, n.p FROM live10 n
  WHERE n.node NOT IN (SELECT node FROM rem11)
),
le11 AS MATERIALIZED (
  SELECT e.s, e.t FROM le10 e
  WHERE e.s NOT IN (SELECT node FROM rem11)
    AND e.t NOT IN (SELECT node FROM rem11)
),
nm12 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le11 e JOIN live11 ln ON ln.node = e.t
  GROUP BY 1
),
win12 AS MATERIALIZED (
  SELECT n.node FROM live11 n LEFT JOIN nm12 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem12 AS MATERIALIZED (
  SELECT node FROM win12
  UNION
  SELECT e.t AS node FROM le11 e JOIN win12 w ON w.node = e.s
),
live12 AS MATERIALIZED (
  SELECT n.node, n.p FROM live11 n
  WHERE n.node NOT IN (SELECT node FROM rem12)
),
le12 AS MATERIALIZED (
  SELECT e.s, e.t FROM le11 e
  WHERE e.s NOT IN (SELECT node FROM rem12)
    AND e.t NOT IN (SELECT node FROM rem12)
),
nm13 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le12 e JOIN live12 ln ON ln.node = e.t
  GROUP BY 1
),
win13 AS MATERIALIZED (
  SELECT n.node FROM live12 n LEFT JOIN nm13 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem13 AS MATERIALIZED (
  SELECT node FROM win13
  UNION
  SELECT e.t AS node FROM le12 e JOIN win13 w ON w.node = e.s
),
live13 AS MATERIALIZED (
  SELECT n.node, n.p FROM live12 n
  WHERE n.node NOT IN (SELECT node FROM rem13)
),
le13 AS MATERIALIZED (
  SELECT e.s, e.t FROM le12 e
  WHERE e.s NOT IN (SELECT node FROM rem13)
    AND e.t NOT IN (SELECT node FROM rem13)
),
nm14 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le13 e JOIN live13 ln ON ln.node = e.t
  GROUP BY 1
),
win14 AS MATERIALIZED (
  SELECT n.node FROM live13 n LEFT JOIN nm14 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem14 AS MATERIALIZED (
  SELECT node FROM win14
  UNION
  SELECT e.t AS node FROM le13 e JOIN win14 w ON w.node = e.s
),
live14 AS MATERIALIZED (
  SELECT n.node, n.p FROM live13 n
  WHERE n.node NOT IN (SELECT node FROM rem14)
),
le14 AS MATERIALIZED (
  SELECT e.s, e.t FROM le13 e
  WHERE e.s NOT IN (SELECT node FROM rem14)
    AND e.t NOT IN (SELECT node FROM rem14)
),
nm15 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le14 e JOIN live14 ln ON ln.node = e.t
  GROUP BY 1
),
win15 AS MATERIALIZED (
  SELECT n.node FROM live14 n LEFT JOIN nm15 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem15 AS MATERIALIZED (
  SELECT node FROM win15
  UNION
  SELECT e.t AS node FROM le14 e JOIN win15 w ON w.node = e.s
),
live15 AS MATERIALIZED (
  SELECT n.node, n.p FROM live14 n
  WHERE n.node NOT IN (SELECT node FROM rem15)
),
le15 AS MATERIALIZED (
  SELECT e.s, e.t FROM le14 e
  WHERE e.s NOT IN (SELECT node FROM rem15)
    AND e.t NOT IN (SELECT node FROM rem15)
),
nm16 AS MATERIALIZED (
  SELECT e.s AS node,
         min({'p': ln.p, 'n': ln.node}).p AS np,
         min({'p': ln.p, 'n': ln.node}).n AS nt
  FROM le15 e JOIN live15 ln ON ln.node = e.t
  GROUP BY 1
),
win16 AS MATERIALIZED (
  SELECT n.node FROM live15 n LEFT JOIN nm16 m ON m.node = n.node
  WHERE m.node IS NULL OR n.p < m.np OR (n.p = m.np AND n.node < m.nt)
),
rem16 AS MATERIALIZED (
  SELECT node FROM win16
  UNION
  SELECT e.t AS node FROM le15 e JOIN win16 w ON w.node = e.s
),
live16 AS MATERIALIZED (
  SELECT n.node, n.p FROM live15 n
  WHERE n.node NOT IN (SELECT node FROM rem16)
),
le16 AS MATERIALIZED (
  SELECT e.s, e.t FROM le15 e
  WHERE e.s NOT IN (SELECT node FROM rem16)
    AND e.t NOT IN (SELECT node FROM rem16)
)""").replace(
    "MIS_PLACEHOLDER", r"""  SELECT node, 1 AS round FROM win1
  UNION ALL
  SELECT node, 2 AS round FROM win2
  UNION ALL
  SELECT node, 3 AS round FROM win3
  UNION ALL
  SELECT node, 4 AS round FROM win4
  UNION ALL
  SELECT node, 5 AS round FROM win5
  UNION ALL
  SELECT node, 6 AS round FROM win6
  UNION ALL
  SELECT node, 7 AS round FROM win7
  UNION ALL
  SELECT node, 8 AS round FROM win8
  UNION ALL
  SELECT node, 9 AS round FROM win9
  UNION ALL
  SELECT node, 10 AS round FROM win10
  UNION ALL
  SELECT node, 11 AS round FROM win11
  UNION ALL
  SELECT node, 12 AS round FROM win12
  UNION ALL
  SELECT node, 13 AS round FROM win13
  UNION ALL
  SELECT node, 14 AS round FROM win14
  UNION ALL
  SELECT node, 15 AS round FROM win15
  UNION ALL
  SELECT node, 16 AS round FROM win16""")




def q_embedding_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit: for 50 query vectors,
    compare exact top-10 neighbors under the FULL 64-dim integer dot
    product vs the first-16-dims truncation (the MRL deployment
    question: how much recall does a 4x cheaper prefix embedding
    keep?). Both dots come from ONE pass over the exploded
    coordinates (the 16-dim dot is a conditional sum in the same
    aggregate), rankings tie-break to the smaller candidate id, and
    recall@10 is an exact integer ppm per query.

    Plan shape: query set broadcast against the corpus coordinates,
    one partial-agg groupBy per (query, candidate), two bounded
    windows over the candidate ranking — the same audit at 10^9
    vectors just shards the candidate axis."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "e")
    ).select(
        "vec_id", "i",
        F.floor(F.col("e").cast("double") * 10000).cast("long").alias("x"),
    )
    qf = flat.where(F.col("vec_id") < 50).selectExpr(
        "vec_id as q", "i", "x as xq"
    ).localCheckpoint(eager=True)
    dots = (
        flat.join(F.broadcast(qf), "i")
        .where(F.col("vec_id") != F.col("q"))
        .groupBy("q", "vec_id")
        .agg(
            F.sum(F.col("x") * F.col("xq")).alias("dot64"),
            F.sum(
                F.when(F.col("i") < 16, F.col("x") * F.col("xq")).otherwise(0)
            ).alias("dot16"),
        )
    )
    w64 = Window.partitionBy("q").orderBy(
        F.col("dot64").desc(), F.col("vec_id")
    )
    w16 = Window.partitionBy("q").orderBy(
        F.col("dot16").desc(), F.col("vec_id")
    )
    ranked = dots.select(
        "q",
        "vec_id",
        F.row_number().over(w64).alias("r64"),
        F.row_number().over(w16).alias("r16"),
    )
    hits = (
        ranked.where((F.col("r64") <= 10) & (F.col("r16") <= 10))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        ranked.where(F.col("r64") <= 10)
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_full"))
        .join(hits, "q", "left")
        .select(
            "q",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "cast(coalesce(n_hits, 0) * 1000000L div 10 as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("q")
    )


SQL_EMBEDDING_MRL = """
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
), qf AS (
  SELECT vec_id AS q, i, x AS xq FROM flat WHERE vec_id < 50
), dots AS (
  SELECT f.vec_id, qf.q,
         sum(f.x * qf.xq)::BIGINT AS dot64,
         sum(CASE WHEN f.i < 16 THEN f.x * qf.xq ELSE 0 END)::BIGINT AS dot16
  FROM flat f JOIN qf ON qf.i = f.i
  WHERE f.vec_id <> qf.q
  GROUP BY 1, 2
), ranked AS (
  SELECT q, vec_id,
         row_number() OVER (PARTITION BY q ORDER BY dot64 DESC, vec_id) AS r64,
         row_number() OVER (PARTITION BY q ORDER BY dot16 DESC, vec_id) AS r16
  FROM dots
), hits AS (
  SELECT q, count(*)::BIGINT AS n_hits
  FROM ranked WHERE r64 <= 10 AND r16 <= 10 GROUP BY 1
)
SELECT r.q,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) * 1000000 // 10)::BIGINT AS recall_ppm
FROM (SELECT DISTINCT q FROM ranked) r
LEFT JOIN hits h ON h.q = r.q
ORDER BY r.q
"""




def q_embedding_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization retrieval audit: per-dimension affine
    codes code = (x - min_d) * 255 div (max_d - min_d) over the exact
    scaled-integer coordinates, then recall@10 of the int8 dot-product
    ranking vs the full-precision ranking for 50 query vectors — the
    deployment question (4x memory cut, SIMD int8 kernels) measured
    exactly. The dim stats are a 64-row metadata aggregate (broadcast
    back); everything else is the one-pass dot/rank shape shared with
    embedding_mrl, so the audit runs at any corpus scale with one
    partial-agg shuffle plus bounded windows. All arithmetic integer:
    codes, dots, ranks and recalls reproduce bit-for-bit in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "e")
    ).select(
        "vec_id", "i",
        F.floor(F.col("e").cast("double") * 10000).cast("long").alias("x"),
    )
    stats = flat.groupBy("i").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    ).localCheckpoint(eager=True)
    coded = flat.join(F.broadcast(stats), "i").select(
        "vec_id",
        "i",
        "x",
        F.expr(
            "IF(hi = lo, 0L, cast((x - lo) * 255 div (hi - lo) as bigint))"
        ).alias("c8"),
    )
    qf = coded.where(F.col("vec_id") < 50).selectExpr(
        "vec_id as q", "i", "x as xq", "c8 as cq"
    ).localCheckpoint(eager=True)
    dots = (
        coded.join(F.broadcast(qf), "i")
        .where(F.col("vec_id") != F.col("q"))
        .groupBy("q", "vec_id")
        .agg(
            F.sum(F.col("x") * F.col("xq")).alias("dfull"),
            F.sum(F.col("c8") * F.col("cq")).alias("d8"),
        )
    )
    wf = Window.partitionBy("q").orderBy(F.col("dfull").desc(), F.col("vec_id"))
    w8 = Window.partitionBy("q").orderBy(F.col("d8").desc(), F.col("vec_id"))
    ranked = dots.select(
        "q",
        "vec_id",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(w8).alias("r8"),
    )
    hits = (
        ranked.where((F.col("rf") <= 10) & (F.col("r8") <= 10))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        ranked.select("q").distinct()
        .join(hits, "q", "left")
        .select(
            "q",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(
                "cast(coalesce(n_hits, 0) * 1000000L div 10 as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("q")
    )


SQL_EMBEDDING_INT8 = """
WITH flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         floor(unnest(embedding)::DOUBLE * 10000)::BIGINT AS x
  FROM embeddings
), stats AS (
  SELECT i, min(x) AS lo, max(x) AS hi FROM flat GROUP BY 1
), coded AS (
  SELECT f.vec_id, f.i, f.x,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE (f.x - s.lo) * 255 // (s.hi - s.lo) END AS c8
  FROM flat f JOIN stats s ON s.i = f.i
), qf AS (
  SELECT vec_id AS q, i, x AS xq, c8 AS cq FROM coded WHERE vec_id < 50
), dots AS (
  SELECT c.vec_id, qf.q,
         sum(c.x * qf.xq)::BIGINT AS dfull,
         sum(c.c8 * qf.cq)::BIGINT AS d8
  FROM coded c JOIN qf ON qf.i = c.i
  WHERE c.vec_id <> qf.q
  GROUP BY 1, 2
), ranked AS (
  SELECT q, vec_id,
         row_number() OVER (PARTITION BY q ORDER BY dfull DESC, vec_id) AS rf,
         row_number() OVER (PARTITION BY q ORDER BY d8 DESC, vec_id) AS r8
  FROM dots
), hits AS (
  SELECT q, count(*)::BIGINT AS n_hits
  FROM ranked WHERE rf <= 10 AND r8 <= 10 GROUP BY 1
)
SELECT r.q,
       coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       (coalesce(h.n_hits, 0) * 1000000 // 10)::BIGINT AS recall_ppm
FROM (SELECT DISTINCT q FROM ranked) r
LEFT JOIN hits h ON h.q = r.q
ORDER BY r.q
"""




def q_orders_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split a fixed
    1000-basis-point budget across nations proportionally to order
    revenue, exactly — floor quotas first, then the leftover points go
    to the largest remainders (ties: higher revenue, then smaller
    nation key). The shares sum to exactly 1000 by construction; every
    step (quota, remainder, ranking) is integer arithmetic on exact
    cents, so the allocation — including who wins the tie-broken last
    seat — is engine-deterministic. The classic budget/seat/quota
    primitive (ad budgets, shard quotas, parliamentary seats) that
    naive rounding gets wrong.

    Plan shape: one customer->nation broadcast join chain, one
    25-row aggregate, windows over the 25-row nation domain."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_c"
            )
        )
        # 25-row domain reused by quota/leftover/ranking: one source scan
        .localCheckpoint(eager=True)
    )
    tot = rev.agg(F.sum("rev_c").alias("t"))
    quotas = rev.crossJoin(F.broadcast(tot)).select(
        "n_nationkey",
        "n_name",
        "rev_c",
        F.expr("rev_c * 1000 div t").alias("base_bp"),
        F.expr("(rev_c * 1000) % t").alias("rem"),
    )
    leftover = quotas.agg(
        (F.lit(1000) - F.sum("base_bp")).cast("long").alias("k")
    )
    w = Window.orderBy(
        F.col("rem").desc(), F.col("rev_c").desc(), F.col("n_nationkey")
    )
    return (
        quotas.crossJoin(F.broadcast(leftover))
        .withColumn("rr", F.row_number().over(w))
        .select(
            "n_nationkey",
            "n_name",
            "rev_c",
            (
                F.col("base_bp")
                + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
            ).cast("long").alias("share_bp"),
        )
        .orderBy("n_nationkey")
    )


SQL_ORDERS_APPORTION = """
WITH rev AS (
  SELECT c.c_nationkey AS n_nationkey, n.n_name,
         sum(floor(o.o_totalprice*100)::BIGINT)::BIGINT AS rev_c
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), tot AS (SELECT sum(rev_c)::BIGINT AS t FROM rev),
quotas AS (
  SELECT r.n_nationkey, r.n_name, r.rev_c,
         r.rev_c * 1000 // t.t AS base_bp,
         (r.rev_c * 1000) % t.t AS rem
  FROM rev r CROSS JOIN tot t
), leftover AS (
  SELECT (1000 - sum(base_bp))::BIGINT AS k FROM quotas
), ranked AS (
  SELECT q.*, l.k,
         row_number() OVER (ORDER BY q.rem DESC, q.rev_c DESC,
                            q.n_nationkey) AS rr
  FROM quotas q CROSS JOIN leftover l
)
SELECT n_nationkey, n_name, rev_c,
       (base_bp + CASE WHEN rr <= k THEN 1 ELSE 0 END)::BIGINT AS share_bp
FROM ranked
ORDER BY n_nationkey
"""




def q_events_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of daily revenue per event_type:
    the median of all pairwise day-slopes — the estimator that
    tolerates ~29% outliers where least squares breaks. The pair set
    lives on the COMPRESSED daily domain (<= 30 points per series →
    <= 435 pairs), never the raw events, so the quadratic step is
    metadata-sized at any log scale. Slopes are ordered by the exact
    integer key (c2-c1) * 1e6 div (d2-d1) with (num, den, d1, d2)
    tie-breaks — a deterministic total order both engines share, so
    the selected median PAIR (not just its value) is pinned by the
    gate; the lower median is taken for even counts."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr(
                "datediff(ts, timestamp_ntz'2024-01-01 00:00:00')"
            ).alias("d"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        daily.alias("a")
        .join(daily.alias("b"), "event_type")
        .where(F.expr("a.d < b.d"))
        .select(
            "event_type",
            F.expr("a.d").alias("d1"),
            F.expr("b.d").alias("d2"),
            F.expr("b.c - a.c").alias("num"),
            F.expr("b.d - a.d").alias("den"),
        )
        .select(
            "event_type",
            "d1",
            "d2",
            "num",
            "den",
            F.expr("num * 1000000L div den").alias("slope_key"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        "slope_key", "num", "den", "d1", "d2"
    )
    n = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .join(n, "event_type")
        .where(F.expr("rn = (n_pairs + 1) div 2"))
        .select(
            "event_type",
            "n_pairs",
            F.col("slope_key").alias("sen_slope_x1e6"),
            "d1",
            "d2",
        )
        .orderBy("event_type")
    )


SQL_EVENTS_THEILSEN = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', ts) AS d,
         sum(floor(value*100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, a.d AS d1, b.d AS d2,
         (b.c - a.c)::BIGINT AS num, (b.d - a.d)::BIGINT AS den,
         ((b.c - a.c) * 1000000 // (b.d - a.d))::BIGINT AS slope_key
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND a.d < b.d
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
           ORDER BY slope_key, num, den, d1, d2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
)
SELECT event_type, n_pairs::BIGINT AS n_pairs,
       slope_key AS sen_slope_x1e6, d1, d2
FROM ranked WHERE rn = (n_pairs + 1) // 2
ORDER BY event_type
"""




def q_kg_wiener(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiener index and eccentricity profile per component of the
    synthetic cycle/pendant graph, from multi-source BFS all-pairs
    distances (operators/components.py::apsp_bfs — every node expands
    its own frontier simultaneously; one join + one anti-join per
    level regardless of source count). Per component: node count,
    Wiener index (sum of unordered pair distances — the classic
    topological compactness metric), diameter, and radius. Oracle: a
    recursive-CTE BFS computing the identical (src, node, dist)
    relation. The per-component metrics a canonicalized entity graph
    reports over its clusters."""
    from pyjelly_spark.operators.components import apsp_bfs

    e = _synth_cycle_graph(spark, sf_dir)
    d = apsp_bfs(e)
    comp = d.groupBy("src").agg(F.min("node").alias("component"))
    ecc = d.groupBy("src").agg(F.max("dist").alias("ecc"))
    per_src = comp.join(ecc, "src")
    pairs = (
        d.join(comp, "src")
        .groupBy("component")
        .agg(
            (F.sum("dist") / 2).cast("long").alias("wiener"),
            F.countDistinct("src").cast("long").alias("n_nodes"),
        )
    )
    return (
        per_src.groupBy("component")
        .agg(
            F.max("ecc").cast("long").alias("diameter"),
            F.min("ecc").cast("long").alias("radius"),
        )
        .join(pairs, "component")
        .select("component", "n_nodes", "wiener", "diameter", "radius")
        .orderBy("component")
    )


SQL_KG_WIENER = """
WITH RECURSIVE
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
),
ed AS MATERIALIZED (
  SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0
),
bfs AS (
  SELECT s AS src, s AS node, 0 AS dist FROM (SELECT DISTINCT s FROM ed)
  UNION
  SELECT b.src, e.t AS node, b.dist + 1
  FROM bfs b JOIN ed e ON e.s = b.node
  WHERE b.dist < 30  -- cyclic graph: bound the walk length or the
                     -- (src, node, dist) state space never closes;
                     -- 30 > any component diameter here, min() below
                     -- recovers true distances
),
d AS MATERIALIZED (
  SELECT src, node, min(dist) AS dist FROM bfs GROUP BY 1, 2
),
comp AS MATERIALIZED (
  SELECT src, min(node) AS component FROM d GROUP BY 1
),
ecc AS (
  SELECT src, max(dist) AS ecc FROM d GROUP BY 1
)
SELECT c.component,
       count(DISTINCT c.src)::BIGINT AS n_nodes,
       (SELECT sum(d2.dist) / 2 FROM d d2 JOIN comp c2 ON c2.src = d2.src
        WHERE c2.component = c.component)::BIGINT AS wiener,
       max(e.ecc)::BIGINT AS diameter,
       min(e.ecc)::BIGINT AS radius
FROM comp c JOIN ecc e ON e.src = c.src
GROUP BY c.component
ORDER BY c.component
"""




def q_events_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of each user's event sequence under a fixed
    2-state integer cost model (operators/cep.py::viterbi_decode) —
    the per-key SEQUENTIAL dynamic program run the Spark-idiomatic
    way: applyInPandas over user groups (Arrow batches, numpy min-plus
    inner loop, O(len * states^2) per key, keys embarrassingly
    parallel). Integer costs make the decoded costs bit-exact, and
    the oracle replays the identical recurrence as a 40-round
    unrolled min-plus CTE chain — a sequential formulation gating the
    distributed one. Emits final per-state costs, the optimum, and
    the argmin state (ties to state 0)."""
    from pyjelly_spark.operators.cep import viterbi_decode

    return viterbi_decode(_t(spark, sf_dir, "events")).orderBy("user_id")


SQL_EVENTS_VITERBI = """
WITH
obs AS MATERIALIZED (
  SELECT user_id, rn, oi FROM (
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
                WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                ELSE 4 END AS oi
    FROM events
  ) WHERE rn <= 40
),
em AS MATERIALIZED (
  SELECT * FROM (VALUES
    (0, 0, 1), (0, 1, 5), (0, 2, 1), (0, 3, 2), (0, 4, 3),
    (1, 0, 4), (1, 1, 1), (1, 2, 3), (1, 3, 3), (1, 4, 1)
  ) t(s, oi, c)
),
nobs AS MATERIALIZED (
  SELECT user_id, count(*)::BIGINT AS n_obs FROM obs GROUP BY 1
),
d1 AS MATERIALIZED (
  SELECT o.user_id, 0 + e0.c AS c0, 2 + e1.c AS c1
  FROM obs o
  JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
  WHERE o.rn = 1
),
ROUNDS_PLACEHOLDER
SELECT d.user_id, n.n_obs,
       d.c0::BIGINT AS cost0, d.c1::BIGINT AS cost1,
       least(d.c0, d.c1)::BIGINT AS best_cost,
       (CASE WHEN d.c0 <= d.c1 THEN 0 ELSE 1 END)::BIGINT AS best_state
FROM d40 d JOIN nobs n ON n.user_id = d.user_id
ORDER BY d.user_id
"""
SQL_EVENTS_VITERBI = SQL_EVENTS_VITERBI.replace(
    "ROUNDS_PLACEHOLDER", r"""d2 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d1 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 2
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d3 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d2 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 3
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d4 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d3 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 4
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d5 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d4 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 5
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d6 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d5 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 6
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d7 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d6 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 7
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d8 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d7 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 8
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d9 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d8 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 9
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d10 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d9 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 10
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d11 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d10 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 11
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d12 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d11 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 12
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d13 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d12 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 13
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d14 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d13 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 14
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d15 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d14 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 15
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d16 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d15 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 16
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d17 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d16 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 17
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d18 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d17 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 18
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d19 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d18 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 19
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d20 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d19 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 20
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d21 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d20 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 21
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d22 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d21 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 22
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d23 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d22 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 23
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d24 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d23 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 24
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d25 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d24 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 25
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d26 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d25 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 26
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d27 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d26 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 27
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d28 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d27 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 28
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d29 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d28 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 29
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d30 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d29 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 30
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d31 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d30 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 31
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d32 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d31 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 32
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d33 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d32 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 33
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d34 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d33 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 34
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d35 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d34 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 35
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d36 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d35 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 36
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d37 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d36 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 37
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d38 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d37 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 38
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d39 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d38 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 39
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
),
d40 AS MATERIALIZED (
  SELECT p.user_id,
         CASE WHEN o.user_id IS NULL THEN p.c0
              ELSE least(p.c0 + 1, p.c1 + 3) + e0.c END AS c0,
         CASE WHEN o.user_id IS NULL THEN p.c1
              ELSE least(p.c0 + 4, p.c1 + 1) + e1.c END AS c1
  FROM d39 p
  LEFT JOIN obs o ON o.user_id = p.user_id AND o.rn = 40
  LEFT JOIN em e0 ON e0.s = 0 AND e0.oi = o.oi
  LEFT JOIN em e1 ON e1.s = 1 AND e1.oi = o.oi
)""")




def q_kg_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full coreness (degeneracy) decomposition by h-index iteration
    (operators/components.py::coreness_hindex) over the synthetic
    cycle/pendant graph with the planted K12 (so core numbers span
    1..11): values start at degrees and each round becomes the h-index
    of the neighbors' values — provably convergent to the exact core
    number, no sequential k-by-k peel. 12 fixed rounds (tests assert
    the fixpoint arrives earlier); the oracle unrolls the identical
    recurrence. Output: the coreness histogram plus a node-weighted
    checksum pinning every node's core number."""
    from pyjelly_spark.operators.components import coreness_hindex

    base = _synth_cycle_graph(spark, sf_dir)
    n = _t(spark, sf_dir, "documents").count()
    clique_nodes = [24 * a for a in range(12) if 24 * a < n]
    clique = spark.createDataFrame(
        [
            (a, b)
            for i, a in enumerate(clique_nodes)
            for b in clique_nodes[i + 1 :]
        ],
        "s: long, t: long",
    )
    cor = coreness_hindex(base.unionByName(clique))
    return (
        cor.groupBy("coreness")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(F.col("node") % 1000003).cast("long").alias("node_chk"),
        )
        .orderBy("coreness")
    )


SQL_KG_CORENESS = """
WITH
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
vx AS (
  SELECT doc_id::BIGINT AS v, doc_id // 24 AS g, doc_id % 24 AS r,
         3 + (doc_id // 24 * 5) % 10 AS ell
  FROM documents
),
rawe AS (
  SELECT v AS s, g*24 + (r+1) % ell AS t FROM vx WHERE r < ell
  UNION ALL
  SELECT v AS s, g*24 + r % ell AS t FROM vx WHERE r >= ell
  UNION ALL
  SELECT v AS s, g*24 + 2 AS t FROM vx WHERE r = 0 AND g % 3 = 0 AND ell >= 4
  UNION ALL
  SELECT a.range * 24 AS s, b.range * 24 AS t
  FROM range(12) a, range(12) b, nn
  WHERE a.range < b.range AND b.range * 24 < nn.n
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM rawe, nn
  WHERE s < nn.n AND t < nn.n AND s <> t
),
ed AS MATERIALIZED (
  SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0
),
c0 AS MATERIALIZED (
  SELECT s AS node, count(*)::BIGINT AS c FROM ed GROUP BY 1
),
ROUNDS_PLACEHOLDER
SELECT c AS coreness, count(*)::BIGINT AS n_nodes,
       sum(node % 1000003)::BIGINT AS node_chk
FROM c12 GROUP BY 1 ORDER BY 1
"""
SQL_KG_CORENESS = SQL_KG_CORENESS.replace(
    "ROUNDS_PLACEHOLDER", r"""c1 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c0 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c2 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c1 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c3 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c2 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c4 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c3 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c5 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c4 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c6 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c5 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c7 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c6 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c8 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c7 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c9 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c8 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c10 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c9 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c11 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c10 p ON p.node = e.t
    GROUP BY e.s
  ) e
),
c12 AS MATERIALIZED (
  SELECT e.s AS node,
         len(list_filter(generate_series(1, len(vals)), i -> vals[i] >= i))
           AS c
  FROM (
    SELECT e.s, list(p.c ORDER BY p.c DESC, p.node) AS vals
    FROM ed e JOIN c11 p ON p.node = e.t
    GROUP BY e.s
  ) e
)""")




def q_events_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test readout per event_type: the daily
    revenue sequence is dichotomized against its exact lower median
    (days equal to the median are dropped, the standard treatment),
    and the number of same-sign RUNS is counted with one lag window —
    too few runs means trending/clustering, too many means
    oscillation. Everything stays integer: the observed run count,
    the above/below counts, and the expected run count under
    randomness 1 + 2*n1*n2/N emitted as an exact x1e6 ratio — the
    nonparametric randomness screen next to KS/Mann-Whitney, over the
    compressed daily domain (30 rows per series, never raw events)."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr(
                "datediff(ts, timestamp_ntz'2024-01-01 00:00:00')"
            ).alias("d"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    wmed = Window.partitionBy("event_type").orderBy("c", "d")
    ncnt = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    med = (
        daily.withColumn("rn", F.row_number().over(wmed))
        .join(ncnt, "event_type")
        .where(F.expr("rn = (nd + 1) div 2"))
        .select("event_type", F.col("c").alias("med"))
    )
    signed = (
        daily.join(med, "event_type")
        .where(F.col("c") != F.col("med"))
        .select(
            "event_type", "d", (F.col("c") > F.col("med")).cast("int").alias("sg")
        )
    )
    wseq = Window.partitionBy("event_type").orderBy("d")
    runs = signed.select(
        "event_type",
        "sg",
        F.when(
            F.lag("sg").over(wseq).isNull()
            | (F.lag("sg").over(wseq) != F.col("sg")),
            1,
        )
        .otherwise(0)
        .alias("nr"),
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("sg").cast("long").alias("n_above"),
        F.sum(1 - F.col("sg")).cast("long").alias("n_below"),
        F.sum("nr").cast("long").alias("n_runs"),
    )
    return runs.select(
        "event_type",
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        F.expr(
            "cast(1000000 + 2000000 * n_above * n_below div n_days as bigint)"
        ).alias("exp_runs_x1e6"),
    ).orderBy("event_type")


SQL_EVENTS_RUNS = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', ts) AS d,
         sum(floor(value*100)::BIGINT)::BIGINT AS c
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, c AS med FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c, d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS nd
    FROM daily
  ) WHERE rn = (nd + 1) // 2
), signed AS (
  SELECT daily.event_type, d,
         (CASE WHEN c > med THEN 1 ELSE 0 END) AS sg
  FROM daily JOIN med ON med.event_type = daily.event_type
  WHERE c <> med
), flagged AS (
  SELECT event_type, sg,
         CASE WHEN lag(sg) OVER w IS NULL OR lag(sg) OVER w <> sg
              THEN 1 ELSE 0 END AS nr
  FROM signed
  WINDOW w AS (PARTITION BY event_type ORDER BY d)
), agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_days,
         sum(sg)::BIGINT AS n_above,
         sum(1 - sg)::BIGINT AS n_below,
         sum(nr)::BIGINT AS n_runs
  FROM flagged GROUP BY 1
)
SELECT event_type, n_days, n_above, n_below, n_runs,
       (1000000 + 2000000 * n_above * n_below // n_days)::BIGINT
         AS exp_runs_x1e6
FROM agg ORDER BY event_type
"""




def q_orders_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of order revenue across
    nations, exactly: HHI = sum(share_i^2) computed as
    sum(rev_i^2) * 1e6 div (sum(rev))^2 in decimal(38,0)/HUGEINT —
    one integer ratio, no per-share float rounding to accumulate.
    Also emits the equivalent-competitor count floor(1e12/HHI_ppm/1e3
    ... as 1e6 div HHI in milli-units) and the top share in ppm —
    the standard market/skew concentration readout, here doubling as
    a partition-skew metric for the shuffle planner. One broadcast
    join chain + one 25-row aggregate."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_c"
            )
        )
    )
    return rev.agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.expr(
            "cast(sum(cast(rev_c as decimal(38,0)) * rev_c) * 1000000"
            " div (cast(sum(rev_c) as decimal(38,0)) * sum(rev_c))"
            " as bigint)"
        ).alias("hhi_ppm"),
        F.expr(
            "cast(max(rev_c) * 1000000L div sum(rev_c) as bigint)"
        ).alias("top_share_ppm"),
    ).select(
        "n_nations",
        "hhi_ppm",
        F.expr("cast(1000000000L div hhi_ppm as bigint)").alias(
            "eff_competitors_x1e3"
        ),
        "top_share_ppm",
    )


SQL_ORDERS_HHI = """
WITH rev AS (
  SELECT c.c_nationkey, sum(floor(o.o_totalprice*100)::BIGINT)::BIGINT AS rev_c
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT count(*)::BIGINT AS n_nations,
       (sum(rev_c::HUGEINT * rev_c) * 1000000
        // (sum(rev_c)::HUGEINT * sum(rev_c)))::BIGINT AS hhi_ppm,
       (1000000000 // ((sum(rev_c::HUGEINT * rev_c) * 1000000)
        // (sum(rev_c)::HUGEINT * sum(rev_c))))::BIGINT
         AS eff_competitors_x1e3,
       (max(rev_c) * 1000000 // sum(rev_c))::BIGINT AS top_share_ppm
FROM rev
"""




def q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters (words with frequency >= 2% of all
    tokens) by the two-pass distributed scheme: pass 1 streams each
    Arrow batch once and emits only words whose LOCAL count clears the
    threshold within that batch — by pigeonhole, any word with global
    count >= theta*N must clear theta*N_b in at least one batch, so the
    candidate union provably contains every true heavy hitter while
    staying bounded by batches/theta rows; pass 2 exact-counts ONLY the
    candidates (broadcast semi-join BEFORE the shuffle). The point at
    100 TB: the full-vocabulary shuffle never happens — the shuffle
    carries candidate tokens only, and the result is still EXACT (the
    pass-2 filter re-applies the global threshold), unlike a lossy
    sketch. Returns (word, cnt, freq_ppm)."""
    docs = _t(spark, sf_dir, "documents")
    # Spread the explode across cores ONLY when the scan itself is
    # narrow (single-file sandbox table). A 100-TB multi-file input
    # already scans wide — an unconditional repartition there is a
    # gratuitous full shuffle of the raw corpus (r3 verdict note).
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    words = docs.select(
        F.explode(
            F.expr(
                "filter(split(lower(trim(regexp_replace(text,"
                " '\\\\s+', ' '))), ' '), x -> x <> '')"
            )
        ).alias("word")
    )

    import pandas as pd

    def candidates(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vc = pdf["word"].value_counts()
            n = int(vc.sum())
            hot = vc[vc * 50 >= n]
            if len(hot):
                yield pd.DataFrame({"word": hot.index})

    cand = words.mapInPandas(candidates, "word string").distinct()
    exact = (
        words.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # total tokens from a narrow per-doc size() agg — no third pass
    # over the exploded word stream
    total = docs.agg(
        F.sum(
            F.expr(
                "size(filter(split(lower(trim(regexp_replace(text,"
                " '\\\\s+', ' '))), ' '), x -> x <> ''))"
            )
        )
        .cast("long")
        .alias("total")
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * 50 >= F.col("total"))
        .select(
            "word",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("freq_ppm"),
        )
    )


SQL_VOCAB_HEAVY_HITTERS = rf"""
WITH w AS (
  SELECT unnest(string_split({NORM_SQL}, ' ')) AS word FROM documents
),
nz AS (SELECT word FROM w WHERE word <> ''),
f AS (SELECT word, count(*) AS cnt FROM nz GROUP BY 1),
t AS (SELECT count(*) AS total FROM nz)
SELECT word, cnt::BIGINT AS cnt,
       (cnt * 1000000 // total)::BIGINT AS freq_ppm
FROM f, t WHERE cnt * 50 >= total
"""


def q_doc_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level exact dedup census: the corpus is cut into
    NON-OVERLAPPING 20-word blocks (C4/CCNet-style unit hashing — at
    100 TB you hash n/20 blocks per document, ~100x cheaper than the
    overlapping-shingle pass, and only block-hash collisions graduate
    to the expensive near-dup machinery). Per document with >= 1 full
    block: block count, blocks whose hash occurs more than once
    corpus-wide, the duplicated fraction in ppm, and how many of its
    duplicated blocks this doc CANONICALLY owns (it is the minimum
    (doc_id, block_idx) occurrence) — the keep-side of a drop-duplicate
    pass. One explode + one hash-keyed aggregation; md5 via the JVM
    intrinsic."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(
            "filter(split(lower(trim(regexp_replace(text,"
            " '\\\\s+', ' '))), ' '), x -> x <> '')"
        ).alias("words"),
    ).select(
        "doc_id",
        F.expr(
            """IF(size(words) < 20, array(),
               transform(sequence(0, size(words) div 20 - 1),
                 b -> md5(concat_ws(' ', slice(words, b * 20 + 1, 20)))))"""
        ).alias("bh"),
    ).where(F.size("bh") >= 1)
    ex = d.select(
        "doc_id", F.posexplode("bh").alias("block_idx", "h")
    )
    # Canonical owner = lexicographic min (doc_id, block_idx) STRUCT —
    # not doc_id * 1e6 + block_idx, which would alias across documents
    # once a single doc reaches 10^6 blocks (20M+ words).
    stats = ex.groupBy("h").agg(
        F.count(F.lit(1)).alias("occ"),
        F.min(F.struct("doc_id", "block_idx")).alias("first_key"),
    )
    j = ex.join(stats, "h")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_blocks"),
            F.sum(
                F.when(
                    (F.col("occ") >= 2)
                    & (
                        F.col("first_key")
                        == F.struct("doc_id", "block_idx")
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_canonical_dups"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_dup_blocks",
            F.expr("n_dup_blocks * 1000000 div n_blocks").alias("dup_ppm"),
            "n_canonical_dups",
        )
    )


SQL_DOC_BLOCK_DEDUP = rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split({NORM_SQL}, ' '), x -> x <> '') AS words
  FROM documents
),
b AS (
  SELECT doc_id, b AS block_idx,
         md5(array_to_string(words[b*20+1:b*20+20], ' ')) AS h
  FROM t, LATERAL (
    SELECT unnest(range(0, greatest(len(words) // 20, 0))) AS b
  ) g
),
s AS (
  SELECT h, count(*) AS occ,
         min({{'doc_id': doc_id, 'block_idx': block_idx}}) AS first_key
  FROM b GROUP BY 1
)
SELECT b.doc_id,
       count(*)::BIGINT AS n_blocks,
       sum(CASE WHEN s.occ >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_blocks,
       ((sum(CASE WHEN s.occ >= 2 THEN 1 ELSE 0 END) * 1000000)
         // count(*))::BIGINT AS dup_ppm,
       sum(CASE WHEN s.occ >= 2
                AND s.first_key = {{'doc_id': b.doc_id, 'block_idx': b.block_idx}}
                THEN 1 ELSE 0 END)::BIGINT AS n_canonical_dups
FROM b JOIN s USING (h)
GROUP BY 1
"""




def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (exact
    Jaccard pairs -> distributed CC, identical to dedup_clusters) where
    the kept representative is the LONGEST member (ties -> smallest
    doc_id), not the smallest id — the policy real corpus builds use
    (keep the most complete copy, drop truncated mirrors). One row per
    multi-doc cluster: the kept doc, its length, the cluster size, and
    the total characters dropped. The argmax travels as ONE
    max(struct(n_chars, -doc_id)) aggregate — no per-cluster sort, no
    window over the full corpus."""
    from pyjelly_spark.operators.components import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD)
    # native bigint nodes: CC is type-agnostic (min under the column
    # type's ordering), so the lpad/cast round-trip the string-keyed
    # call needed is gone — two casts and a projection less in the plan
    assign = connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("rep"),
    )
    m = assign.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        m.groupBy("rep")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.max(
                F.struct(
                    F.col("n_chars").alias("nc"),
                    F.expr("-doc_id").alias("nid"),
                )
            ).alias("best"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            "rep",
            F.expr("-best.nid").cast("long").alias("keep_doc_id"),
            F.col("best.nc").cast("long").alias("keep_n_chars"),
            "cluster_size",
            F.expr("total_chars - best.nc").cast("long").alias("dropped_chars"),
        )
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE {{shingles}},
p AS (
  SELECT lpad(a::VARCHAR, 12, '0') AS a, lpad(b::VARCHAR, 12, '0') AS b
  FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
n AS (SELECT DISTINCT src AS node FROM e),
r(node, m) AS (
  SELECT node, node FROM n
  UNION
  SELECT r.node, e.dst FROM r JOIN e ON r.m = e.src
),
comp AS (SELECT node::BIGINT AS doc_id, min(m)::BIGINT AS rep
         FROM r GROUP BY node),
mem AS (
  SELECT comp.rep, comp.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY comp.rep
                            ORDER BY d.n_chars DESC, comp.doc_id ASC) AS rn
  FROM comp JOIN documents d USING (doc_id)
)
SELECT rep,
       max(CASE WHEN rn = 1 THEN doc_id END)::BIGINT AS keep_doc_id,
       max(CASE WHEN rn = 1 THEN n_chars END)::BIGINT AS keep_n_chars,
       count(*)::BIGINT AS cluster_size,
       (sum(n_chars) - max(CASE WHEN rn = 1 THEN n_chars END))::BIGINT
         AS dropped_chars
FROM mem GROUP BY rep
"""


def q_kg_canonical_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization through the closed-form star CC (r4,
    operators/components.py::star_components) — the pipeline's default
    path: the def-collision graph is a disjoint union of stars by
    construction (def-site IRIs embed their symbol), so components fall
    out of ONE hub-keyed aggregation instead of iterative rounds. Same
    output contract — and the same oracle — as kg_canonical, which
    gates the general iterative operator on the identical graph; this
    query gates the shortcut."""
    from pyjelly_spark.operators.components import star_components

    _, defs = _mention_frames(spark, sf_dir)
    multi = defs.groupBy("symbol").agg(F.count(F.lit(1)).alias("n_sites"))
    colliding = defs.join(
        F.broadcast(multi.where(F.col("n_sites") > 1).select("symbol")), "symbol"
    )
    edges = colliding.select(
        def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")).alias(
            "src"
        ),
        F.concat(F.lit(X.SYMBOL_BASE), F.col("symbol")).alias("dst"),
    )
    assignment = star_components(edges)
    return (
        colliding.withColumn(
            "node",
            def_site_iri(F.col("def_repo"), F.col("def_path"), F.col("symbol")),
        )
        .join(assignment, "node")
        .select(
            F.col("node").alias("s"),
            F.lit(X.P_CANONICAL).alias("p"),
            F.col("component").alias("o"),
        )
    )


def q_doc_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens emitted per
    whitespace word (floor ppm) — the standard tokenizer-quality
    diagnostic for multilingual corpus prep (a lang whose fertility is
    2-3x the corpus median is being shredded by the vocabulary and
    will eat a matching multiple of the training budget). Pure
    Catalyst: two regexp counts per doc, one lang-keyed aggregation;
    zero joins, one shuffle of |langs| groups."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(
            F.split(
                F.trim(F.regexp_replace("text", r"\s+", " ")), " "
            )
        ).cast("long").alias("ws"),
        F.regexp_count("text", F.lit(T.BPE_TOKEN_RE)).cast("long").alias("bpe"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_ws_tokens"),
            F.sum("bpe").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000000 div n_ws_tokens").alias(
                "fertility_ppm"
            ),
        )
        .orderBy("lang")
    )


SQL_DOC_FERTILITY = rf"""
WITH t AS (
  SELECT lang,
    len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))::BIGINT AS ws,
    len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}'))::BIGINT AS bpe
  FROM documents
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(ws)::BIGINT AS n_ws_tokens,
       sum(bpe)::BIGINT AS n_bpe_tokens,
       ((sum(bpe) * 1000000) // sum(ws))::BIGINT AS fertility_ppm
FROM t GROUP BY lang ORDER BY lang
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_structural": q_kg_structural,
    "kg_imports": q_kg_imports,
    "kg_defs": q_kg_defs,
    "kg_calls": q_kg_calls,
    "kg_linked": q_kg_linked,
    "kg_canonical": q_kg_canonical,
    "kg_imports_resolved": q_kg_imports_resolved,
    "kg_roundtrip": q_kg_roundtrip,
    "kg_grouped_roundtrip": q_kg_grouped_roundtrip,
    "kg_datasource_roundtrip": q_kg_datasource_roundtrip,
    "kg_stream_ingest": q_kg_stream_ingest,
    "kg_pagerank": q_kg_pagerank,
    "kg_triangles": q_kg_triangles,
    "kg_communities": q_kg_communities,
    "kg_sparql": q_kg_sparql,
    "kg_sparql_agg": q_kg_sparql_agg,
    "kg_linking_pr": q_kg_linking_pr,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_pipeline": q_dedup_pipeline,
    "dedup_clusters": q_dedup_clusters,
    "dedup_incremental": q_dedup_incremental,
    "embedding_topk": q_embedding_topk,
    "embedding_ann": q_embedding_ann,
    "embedding_ivf": q_embedding_ivf,
    "embedding_pq": q_embedding_pq,
    "embedding_kmeans": q_embedding_kmeans,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "stream_hourly": q_stream_hourly,
    "stream_sessions": q_stream_sessions,
    "stream_dedup": q_stream_dedup,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_filter": q_doc_filter,
    "decontam": q_decontam,
    "vocab_bpe": q_vocab_bpe,
    "seq_packing": q_seq_packing,
    "doc_dup_spans": q_doc_dup_spans,
    "events_hourly": q_events_hourly,
    "events_anomaly": q_events_anomaly,
    "events_sessions": q_events_sessions,
    "events_topn": q_events_topn,
    "events_cube": q_events_cube,
    "events_sliding": q_events_sliding,
    "events_moving_avg": q_events_moving_avg,
    "events_median": q_events_median,
    "events_json": q_events_json,
    "events_pivot": q_events_pivot,
    "events_asof": q_events_asof,
    "events_gapfill": q_events_gapfill,
    "events_range_join": q_events_range_join,
    "cust_no_orders": q_cust_no_orders,
    "part_setops": q_part_setops,
    "doc_familiarity": q_doc_familiarity,
    "train_val_split": q_train_val_split,
    "term_stats": q_term_stats,
    "doc_length_stats": q_doc_length_stats,
    "inverted_index": q_inverted_index,
    "data_mixing": q_data_mixing,
    "pii_scrub": q_pii_scrub,
    "doc_repetition": q_doc_repetition,
    "kg_bgp": q_kg_bgp,
    "kg_bgp_selective": q_kg_bgp_selective,
    "kg_bgp_optional": q_kg_bgp_optional,
    "kg_reachable": q_kg_reachable,
    "kg_closeness": q_kg_closeness,
    "kg_incremental": q_kg_incremental,
    "kg_sparql_path": q_kg_sparql_path,
    "kg_sparql_construct": q_kg_sparql_construct,
    "kg_sparql_graph": q_kg_sparql_graph,
    "kg_sparql_update": q_kg_sparql_update,
    "dedup_cross_source": q_dedup_cross_source,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_resize": q_multimodal_resize,
    "kg_kcore": q_kg_kcore,
    "sample_stratified": q_sample_stratified,
    "kg_sssp": q_kg_sssp,
    "kg_sparql_star": q_kg_sparql_star,
    "tpch_q6": q_tpch_q6,
    "events_retention": q_events_retention,
    "stream_anomaly": q_stream_anomaly,
    "events_funnel": q_events_funnel,
    "doc_chunks": q_doc_chunks,
    "doc_bm25": q_doc_bm25,
    "stream_join": q_stream_join,
    "kg_sparql_typed": q_kg_sparql_typed,
    "kg_sparql_exists": q_kg_sparql_exists,
    "kg_sparql_alt": q_kg_sparql_alt,
    "kg_sparql_subselect": q_kg_sparql_subselect,
    "stream_enrich": q_stream_enrich,
    "dedup_span_removal": q_dedup_span_removal,
    "kg_clustering": q_kg_clustering,
    "kg_node_sim": q_kg_node_sim,
    "kg_walks": q_kg_walks,
    "kg_skipgrams": q_kg_skipgrams,
    "kg_charsets": q_kg_charsets,
    "kg_void": q_kg_void,
    "kg_store_bgp": q_kg_store_bgp,
    "kg_bgp_stats": q_kg_bgp_stats,
    "events_cdc": q_events_cdc,
    "events_scd2": q_events_scd2,
    "kg_fuzzy_link": q_kg_fuzzy_link,
    "kg_summary": q_kg_summary,
    "kg_negatives": q_kg_negatives,
    "kg_timetravel": q_kg_timetravel,
    "kg_ivm": q_kg_ivm,
    "sample_exact": q_sample_exact,
    "stream_cdc": q_stream_cdc,
    "events_grouping_sets": q_events_grouping_sets,
    "events_cep": q_events_cep,
    "doc_curation": q_doc_curation,
    "events_twap": q_events_twap,
    "events_ohlc": q_events_ohlc,
    "events_ewma": q_events_ewma,
    "events_kmv": q_events_kmv,
    "events_cms": q_events_cms,
    "events_bloom": q_events_bloom,
    "dedup_ppjoin": q_dedup_ppjoin,
    "sample_weighted": q_sample_weighted,
    "events_paths": q_events_paths,
    "events_concurrency": q_events_concurrency,
    "events_kmv_setops": q_events_kmv_setops,
    "events_zorder": q_events_zorder,
    "events_checksum": q_events_checksum,
    "stream_session_window": q_stream_session_window,
    "stream_kmv": q_stream_kmv,
    "kg_truss": q_kg_truss,
    "kg_ppr": q_kg_ppr,
    "kg_hits": q_kg_hits,
    "kg_link_ra": q_kg_link_ra,
    "events_markov": q_events_markov,
    "doc_hash_features": q_doc_hash_features,
    "vocab_collocations": q_vocab_collocations,
    "events_kth": q_events_kth,
    "events_mad": q_events_mad,
    "events_expectations": q_events_expectations,
    "vocab_kn": q_vocab_kn,
    "events_seasonal": q_events_seasonal,
    "events_attribution": q_events_attribution,
    "events_quantiles": q_events_quantiles,
    "kg_butterflies": q_kg_butterflies,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q10": q_tpch_q10,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "events_rfm": q_events_rfm,
    "events_cusum": q_events_cusum,
    "events_benford": q_events_benford,
    "events_autocov": q_events_autocov,
    "events_target_encoding": q_events_target_encoding,
    "events_class_weights": q_events_class_weights,
    "vocab_bigram_lm": q_vocab_bigram_lm,
    "doc_lexical_richness": q_doc_lexical_richness,
    "events_histogram": q_events_histogram,
    "kg_assortativity": q_kg_assortativity,
    "kg_richclub": q_kg_richclub,
    "doc_oov_rate": q_doc_oov_rate,
    "events_drift": q_events_drift,
    "doc_zipf": q_doc_zipf,
    "events_interarrival": q_events_interarrival,
    "tpch_q15": q_tpch_q15,
    "tpch_q22": q_tpch_q22,
    "events_gini": q_events_gini,
    "doc_novelty": q_doc_novelty,
    "events_holt": q_events_holt,
    "events_abtest": q_events_abtest,
    "events_winsorize": q_events_winsorize,
    "kg_reciprocity": q_kg_reciprocity,
    "tpch_q8": q_tpch_q8,
    "tpch_q13": q_tpch_q13,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "events_bitmap": q_events_bitmap,
    "events_survival": q_events_survival,
    "events_diversity": q_events_diversity,
    "kg_modularity": q_kg_modularity,
    "events_backtest": q_events_backtest,
    "dedup_editdist": q_dedup_editdist,
    "events_auc": q_events_auc,
    "dedup_containment": q_dedup_containment,
    "events_holtwinters": q_events_holtwinters,
    "events_gains": q_events_gains,
    "events_drawdown": q_events_drawdown,
    "basket_rules": q_basket_rules,
    "events_conformal": q_events_conformal,
    "doc_nb": q_doc_nb,
    "events_seqpat": q_events_seqpat,
    "events_kanon": q_events_kanon,
    "orders_mrr": q_orders_mrr,
    "events_ate": q_events_ate,
    "kg_comention": q_kg_comention,
    "dedup_eval": q_dedup_eval,
    "kg_blocking_stats": q_kg_blocking_stats,
    "events_skew": q_events_skew,
    "orders_churn_labels": q_orders_churn_labels,
    "orders_cohort_ltv": q_orders_cohort_ltv,
    "events_group_quantiles": q_events_group_quantiles,
    "doc_compaction": q_doc_compaction,
    "stream_topk": q_stream_topk,
    "events_convert_time": q_events_convert_time,
    "events_bursts": q_events_bursts,
    "events_profile": q_events_profile,
    "kg_dangling": q_kg_dangling,
    "kg_cycles": q_kg_cycles,
    "events_segment_shift": q_events_segment_shift,
    "kg_rdfs": q_kg_rdfs,
    "kg_shacl": q_kg_shacl,
    "kg_prov": q_kg_prov,
    "kg_sameas": q_kg_sameas,
    "kg_owl": q_kg_owl,
    "events_prcurve": q_events_prcurve,
    "events_threshold": q_events_threshold,
    "dedup_mutual_best": q_dedup_mutual_best,
    "events_wau": q_events_wau,
    "orders_abc": q_orders_abc,
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "doc_top_terms": q_doc_top_terms,
    "events_calibration": q_events_calibration,
    "events_itemcf": q_events_itemcf,
    "embedding_gram": q_embedding_gram,
    "embedding_centroids": q_embedding_centroids,
    "embedding_anova": q_embedding_anova,
    "events_streak": q_events_streak,
    "embedding_ncc": q_embedding_ncc,
    "events_new_returning": q_events_new_returning,
    "kg_scc": q_kg_scc,
    "kg_condensation": q_kg_condensation,
    "orders_skipping": q_orders_skipping,
    "orders_diff": q_orders_diff,
    "kg_edgecut": q_kg_edgecut,
    "events_joinest": q_events_joinest,
    "postings_codec": q_postings_codec,
    "kg_stream_egress": q_kg_stream_egress,
    "events_rankeval": q_events_rankeval,
    "events_dp_bound": q_events_dp_bound,
    "orders_skyline": q_orders_skyline,
    "doc_cdc_chunks": q_doc_cdc_chunks,
    "kg_canonical_incremental": q_kg_canonical_incremental,
    "events_interval_diff": q_events_interval_diff,
    "orders_dictenc": q_orders_dictenc,
    "events_slo_burn": q_events_slo_burn,
    "kg_pathcount": q_kg_pathcount,
    "events_hll": q_events_hll,
    "events_gorilla": q_events_gorilla,
    "doc_winnow": q_doc_winnow,
    "doc_ols": q_doc_ols,
    "kg_bipartite": q_kg_bipartite,
    "events_fifo": q_events_fifo,
    "events_sax": q_events_sax,
    "embedding_jl": q_embedding_jl,
    "events_mannwhitney": q_events_mannwhitney,
    "doc_rake": q_doc_rake,
    "orders_rle": q_orders_rle,
    "kg_msf": q_kg_msf,
    "kg_densest": q_kg_densest,
    "events_stl": q_events_stl,
    "events_lttb": q_events_lttb,
    "kg_matching": q_kg_matching,
    "events_ks": q_events_ks,
    "doc_codeswitch": q_doc_codeswitch,
    "dedup_winnow": q_dedup_winnow,
    "orders_merge": q_orders_merge,
    "orders_bloomskip": q_orders_bloomskip,
    "events_critpath": q_events_critpath,
    "events_rrf": q_events_rrf,
    "doc_readability": q_doc_readability,
    "kg_mis": q_kg_mis,
    "embedding_mrl": q_embedding_mrl,
    "embedding_int8": q_embedding_int8,
    "orders_apportion": q_orders_apportion,
    "events_theilsen": q_events_theilsen,
    "kg_wiener": q_kg_wiener,
    "events_viterbi": q_events_viterbi,
    "kg_coreness": q_kg_coreness,
    "events_runs": q_events_runs,
    "orders_hhi": q_orders_hhi,
    "vocab_heavy_hitters": q_vocab_heavy_hitters,
    "doc_block_dedup": q_doc_block_dedup,
    "dedup_keep_best": q_dedup_keep_best,
    "kg_canonical_star": q_kg_canonical_star,
    "kg_split_decode": q_kg_split_decode,
    "doc_fertility": q_doc_fertility,
}

ORACLES: dict[str, str] = {
    "kg_structural": SQL_KG_STRUCTURAL,
    "kg_imports": SQL_KG_IMPORTS,
    "kg_defs": SQL_KG_DEFS,
    "kg_calls": SQL_KG_CALLS,
    "kg_linked": SQL_KG_LINKED,
    "kg_canonical": SQL_KG_CANONICAL,
    "kg_imports_resolved": SQL_KG_IMPORTS_RESOLVED,
    "kg_triangles": SQL_KG_TRIANGLES,
    "kg_communities": SQL_KG_COMMUNITIES,
    "kg_roundtrip": SQL_KG_ROUNDTRIP,
    "kg_split_decode": SQL_KG_ROUNDTRIP,
    "kg_grouped_roundtrip": SQL_KG_GROUPED_ROUNDTRIP,
    "kg_datasource_roundtrip": SQL_KG_DATASOURCE_ROUNDTRIP,
    "kg_stream_ingest": SQL_KG_STREAM_INGEST,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5": SQL_TPCH_Q5,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_sessions": SQL_EVENTS_SESSIONS,
    "events_topn": SQL_EVENTS_TOPN,
    "events_cube": SQL_EVENTS_CUBE,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_moving_avg": SQL_EVENTS_MOVING_AVG,
    "events_anomaly": SQL_EVENTS_ANOMALY,
    "events_median": SQL_EVENTS_MEDIAN,
    "events_json": SQL_EVENTS_JSON,
    "events_pivot": SQL_EVENTS_PIVOT,
    "events_asof": SQL_EVENTS_ASOF,
    "events_gapfill": SQL_EVENTS_GAPFILL,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "cust_no_orders": SQL_CUST_NO_ORDERS,
    "part_setops": SQL_PART_SETOPS,
    "lang_id": SQL_LANG_ID,
    "text_quality": SQL_TEXT_QUALITY,
    "token_count": SQL_TOKEN_COUNT,
    "vocab_bpe": SQL_VOCAB_BPE,
    "doc_familiarity": SQL_DOC_FAMILIARITY,
    "train_val_split": SQL_TRAIN_VAL_SPLIT,
    "term_stats": SQL_TERM_STATS,
    "doc_length_stats": SQL_DOC_LENGTH_STATS,
    "inverted_index": SQL_INVERTED_INDEX,
    "data_mixing": SQL_DATA_MIXING,
    "pii_scrub": SQL_PII_SCRUB,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_filter": SQL_DOC_FILTER,
    "decontam": SQL_DECONTAM,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "kg_pagerank": SQL_KG_PAGERANK,
    "kg_bgp": SQL_KG_BGP,
    "kg_bgp_selective": SQL_KG_BGP_SELECTIVE,
    "kg_bgp_optional": SQL_KG_BGP_OPTIONAL,
    "kg_reachable": SQL_KG_REACHABLE,
    "kg_closeness": SQL_KG_CLOSENESS,
    "kg_incremental": SQL_KG_INCREMENTAL,
    "kg_sparql": SQL_KG_BGP,
    "kg_sparql_agg": SQL_KG_SPARQL_AGG,
    "kg_sparql_path": SQL_KG_SPARQL_PATH,
    "kg_sparql_construct": SQL_KG_SPARQL_CONSTRUCT,
    "kg_sparql_graph": SQL_KG_SPARQL_GRAPH,
    "kg_sparql_update": SQL_KG_SPARQL_UPDATE,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    "dedup_minhash": SQL_DEDUP_JACCARD,  # LSH verified == exact pairs
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_cross_source": SQL_DEDUP_CROSS_SOURCE,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "dedup_embedding_lsh": SQL_DEDUP_EMBEDDING_LSH,
    "dedup_pipeline": SQL_DEDUP_PIPELINE,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "multimodal_resize": SQL_MULTIMODAL_RESIZE,
    "stream_hourly": SQL_EVENTS_HOURLY,
    # approximate-but-deterministic: the sha-derived hyperplanes make the
    # whole LSH pipeline (buckets, per-bucket topk, merge) SQL-replicable
    "embedding_ann": SQL_EMBEDDING_ANN,
    "embedding_ivf": SQL_EMBEDDING_IVF,
    "kg_kcore": SQL_KG_KCORE,
    "embedding_kmeans": SQL_EMBEDDING_KMEANS,
    "doc_dup_spans": SQL_DOC_DUP_SPANS,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "kg_sssp": SQL_KG_SSSP,
    "kg_sparql_star": SQL_KG_SPARQL_STAR,
    "tpch_q6": SQL_TPCH_Q6,
    "events_retention": SQL_EVENTS_RETENTION,
    "stream_dedup": SQL_STREAM_DEDUP,
    "stream_sessions": SQL_STREAM_SESSIONS,
    "stream_anomaly": SQL_EVENTS_ANOMALY,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "seq_packing": SQL_SEQ_PACKING,
    "doc_chunks": SQL_DOC_CHUNKS,
    "doc_bm25": SQL_DOC_BM25,
    "stream_join": SQL_STREAM_JOIN,
    "embedding_pq": SQL_EMBEDDING_PQ,
    "kg_sparql_typed": SQL_KG_SPARQL_TYPED,
    "kg_sparql_exists": SQL_KG_SPARQL_EXISTS,
    "kg_sparql_alt": SQL_KG_SPARQL_ALT,
    "kg_sparql_subselect": SQL_KG_SPARQL_SUBSELECT,
    "stream_enrich": SQL_STREAM_ENRICH,
    "dedup_span_removal": SQL_DEDUP_SPAN_REMOVAL,
    "kg_clustering": SQL_KG_CLUSTERING,
    "kg_node_sim": SQL_KG_NODE_SIM,
    "kg_walks": SQL_KG_WALKS,
    "kg_skipgrams": SQL_KG_SKIPGRAMS,
    "kg_charsets": SQL_KG_CHARSETS,
    "kg_void": SQL_KG_VOID,
    "kg_store_bgp": SQL_KG_STORE_BGP,
    "kg_bgp_stats": SQL_KG_BGP_STATS,
    "events_cdc": SQL_EVENTS_CDC,
    "events_scd2": SQL_EVENTS_SCD2,
    "kg_fuzzy_link": SQL_KG_FUZZY_LINK,
    "kg_summary": SQL_KG_SUMMARY,
    "kg_negatives": SQL_KG_NEGATIVES,
    "kg_linking_pr": SQL_KG_LINKING_PR,
    "kg_timetravel": SQL_KG_TIMETRAVEL,
    "kg_ivm": SQL_KG_IVM,
    "sample_exact": SQL_SAMPLE_EXACT,
    "stream_cdc": SQL_STREAM_CDC,
    "events_grouping_sets": SQL_EVENTS_GROUPING_SETS,
    "events_cep": SQL_EVENTS_CEP,
    "doc_curation": SQL_DOC_CURATION,
    "events_twap": SQL_EVENTS_TWAP,
    "events_ohlc": SQL_EVENTS_OHLC,
    "events_ewma": SQL_EVENTS_EWMA,
    "events_kmv": SQL_EVENTS_KMV,
    "events_cms": SQL_EVENTS_CMS,
    "events_bloom": SQL_EVENTS_BLOOM,
    "dedup_ppjoin": SQL_DEDUP_PPJOIN,
    "sample_weighted": SQL_SAMPLE_WEIGHTED,
    "events_paths": SQL_EVENTS_PATHS,
    "events_concurrency": SQL_EVENTS_CONCURRENCY,
    "events_kmv_setops": SQL_EVENTS_KMV_SETOPS,
    "events_zorder": SQL_EVENTS_ZORDER,
    "events_checksum": SQL_EVENTS_CHECKSUM,
    "stream_session_window": SQL_STREAM_SESSION_WINDOW,
    "stream_kmv": SQL_STREAM_KMV,
    "kg_truss": SQL_KG_TRUSS,
    "kg_ppr": SQL_KG_PPR,
    "kg_hits": SQL_KG_HITS,
    "kg_link_ra": SQL_KG_LINK_RA.format(
        src=SRC_SQL.strip(), mentions=MENTIONS_SQL.strip()
    ),
    "events_markov": SQL_EVENTS_MARKOV,
    "doc_hash_features": SQL_DOC_HASH_FEATURES.format(norm=NORM_SQL),
    "vocab_collocations": SQL_VOCAB_COLLOCATIONS.format(norm=NORM_SQL),
    "events_kth": SQL_EVENTS_KTH,
    "events_mad": SQL_EVENTS_MAD,
    "events_expectations": SQL_EVENTS_EXPECTATIONS,
    "vocab_kn": SQL_VOCAB_KN.format(norm=NORM_SQL),
    "events_seasonal": SQL_EVENTS_SEASONAL,
    "events_attribution": SQL_EVENTS_ATTRIBUTION,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "kg_butterflies": SQL_KG_BUTTERFLIES,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q18": SQL_TPCH_Q18,
    "events_rfm": SQL_EVENTS_RFM,
    "events_cusum": SQL_EVENTS_CUSUM,
    "events_benford": SQL_EVENTS_BENFORD,
    "events_autocov": SQL_EVENTS_AUTOCOV,
    "events_target_encoding": SQL_EVENTS_TARGET_ENCODING,
    "events_class_weights": SQL_EVENTS_CLASS_WEIGHTS,
    "vocab_bigram_lm": SQL_VOCAB_BIGRAM_LM.format(norm=NORM_SQL),
    "doc_lexical_richness": SQL_DOC_LEXICAL_RICHNESS.format(norm=NORM_SQL),
    "events_histogram": SQL_EVENTS_HISTOGRAM,
    "kg_assortativity": SQL_KG_ASSORTATIVITY,
    "kg_richclub": SQL_KG_RICHCLUB,
    "doc_oov_rate": SQL_DOC_OOV_RATE.format(norm=NORM_SQL),
    "events_drift": SQL_EVENTS_DRIFT,
    "doc_zipf": SQL_DOC_ZIPF.format(norm=NORM_SQL),
    "events_interarrival": SQL_EVENTS_INTERARRIVAL,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q22": SQL_TPCH_Q22,
    "events_gini": SQL_EVENTS_GINI,
    "doc_novelty": SQL_DOC_NOVELTY.format(norm=NORM_SQL),
    "events_holt": SQL_EVENTS_HOLT,
    "events_abtest": SQL_EVENTS_ABTEST,
    "events_winsorize": SQL_EVENTS_WINSORIZE,
    "kg_reciprocity": SQL_KG_RECIPROCITY,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q19": SQL_TPCH_Q19,
    "events_bitmap": SQL_EVENTS_BITMAP,
    "events_survival": SQL_EVENTS_SURVIVAL,
    "events_diversity": SQL_EVENTS_DIVERSITY,
    "kg_modularity": SQL_KG_MODULARITY,
    "events_backtest": SQL_EVENTS_BACKTEST,
    "dedup_editdist": SQL_DEDUP_EDITDIST,
    "events_auc": SQL_EVENTS_AUC,
    "dedup_containment": SQL_DEDUP_CONTAINMENT.format(shingles=SHINGLES_SQL.strip()),
    "events_holtwinters": SQL_EVENTS_HOLTWINTERS,
    "events_gains": SQL_EVENTS_GAINS,
    "events_drawdown": SQL_EVENTS_DRAWDOWN,
    "basket_rules": SQL_BASKET_RULES,
    "events_conformal": SQL_EVENTS_CONFORMAL,
    "doc_nb": SQL_DOC_NB,
    "events_seqpat": SQL_EVENTS_SEQPAT,
    "events_kanon": SQL_EVENTS_KANON,
    "orders_mrr": SQL_ORDERS_MRR,
    "events_ate": SQL_EVENTS_ATE,
    "kg_comention": SQL_KG_COMENTION,
    "dedup_eval": SQL_DEDUP_EVAL,
    "kg_blocking_stats": SQL_KG_BLOCKING_STATS,
    "events_skew": SQL_EVENTS_SKEW,
    "orders_churn_labels": SQL_ORDERS_CHURN_LABELS,
    "orders_cohort_ltv": SQL_ORDERS_COHORT_LTV,
    "events_group_quantiles": SQL_EVENTS_GROUP_QUANTILES,
    "doc_compaction": SQL_DOC_COMPACTION,
    "stream_topk": SQL_STREAM_TOPK,
    "events_convert_time": SQL_EVENTS_CONVERT_TIME,
    "events_bursts": SQL_EVENTS_BURSTS,
    "events_profile": SQL_EVENTS_PROFILE,
    "kg_dangling": SQL_KG_DANGLING,
    "kg_cycles": SQL_KG_CYCLES,
    "events_segment_shift": SQL_EVENTS_SEGMENT_SHIFT,
    "kg_rdfs": SQL_KG_RDFS,
    "kg_shacl": SQL_KG_SHACL,
    "kg_prov": SQL_KG_PROV,
    "kg_sameas": SQL_KG_SAMEAS,
    "kg_owl": SQL_KG_OWL,
    "events_prcurve": SQL_EVENTS_PRCURVE,
    "events_threshold": SQL_EVENTS_THRESHOLD,
    "dedup_mutual_best": SQL_DEDUP_MUTUAL_BEST,
    "events_wau": SQL_EVENTS_WAU,
    "orders_abc": SQL_ORDERS_ABC,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q21": SQL_TPCH_Q21,
    "doc_top_terms": SQL_DOC_TOP_TERMS,
    "events_calibration": SQL_EVENTS_CALIBRATION,
    "events_itemcf": SQL_EVENTS_ITEMCF,
    "embedding_gram": SQL_EMBEDDING_GRAM,
    "embedding_centroids": SQL_EMBEDDING_CENTROIDS,
    "embedding_anova": SQL_EMBEDDING_ANOVA,
    "events_streak": SQL_EVENTS_STREAK,
    "embedding_ncc": SQL_EMBEDDING_NCC,
    "events_new_returning": SQL_EVENTS_NEW_RETURNING,
    "kg_scc": SQL_KG_SCC,
    "kg_condensation": SQL_KG_CONDENSATION,
    "orders_skipping": SQL_ORDERS_SKIPPING,
    "orders_diff": SQL_ORDERS_DIFF,
    "kg_edgecut": SQL_KG_EDGECUT,
    "events_joinest": SQL_EVENTS_JOINEST,
    "postings_codec": SQL_POSTINGS_CODEC,
    "kg_stream_egress": SQL_KG_STREAM_EGRESS,
    "events_rankeval": SQL_EVENTS_RANKEVAL,
    "events_dp_bound": SQL_EVENTS_DP_BOUND,
    "orders_skyline": SQL_ORDERS_SKYLINE,
    "doc_cdc_chunks": SQL_DOC_CDC_CHUNKS,
    "kg_canonical_incremental": SQL_KG_CANONICAL_INCREMENTAL,
    "events_interval_diff": SQL_EVENTS_INTERVAL_DIFF,
    "orders_dictenc": SQL_ORDERS_DICTENC,
    "events_slo_burn": SQL_EVENTS_SLO_BURN,
    "kg_pathcount": SQL_KG_PATHCOUNT,
    "events_hll": SQL_EVENTS_HLL,
    "events_gorilla": SQL_EVENTS_GORILLA,
    "doc_winnow": SQL_DOC_WINNOW,
    "doc_ols": SQL_DOC_OLS,
    "kg_bipartite": SQL_KG_BIPARTITE,
    "events_fifo": SQL_EVENTS_FIFO,
    "events_sax": SQL_EVENTS_SAX,
    "embedding_jl": SQL_EMBEDDING_JL,
    "events_mannwhitney": SQL_EVENTS_MANNWHITNEY,
    "doc_rake": SQL_DOC_RAKE,
    "orders_rle": SQL_ORDERS_RLE,
    "kg_msf": SQL_KG_MSF,
    "kg_densest": SQL_KG_DENSEST,
    "events_stl": SQL_EVENTS_STL,
    "events_lttb": SQL_EVENTS_LTTB,
    "kg_matching": SQL_KG_MATCHING,
    "events_ks": SQL_EVENTS_KS,
    "doc_codeswitch": SQL_DOC_CODESWITCH,
    "dedup_winnow": SQL_DEDUP_WINNOW,
    "orders_merge": SQL_ORDERS_MERGE,
    "orders_bloomskip": SQL_ORDERS_BLOOMSKIP,
    "events_critpath": SQL_EVENTS_CRITPATH,
    "events_rrf": SQL_EVENTS_RRF,
    "doc_readability": SQL_DOC_READABILITY,
    "kg_mis": SQL_KG_MIS,
    "embedding_mrl": SQL_EMBEDDING_MRL,
    "embedding_int8": SQL_EMBEDDING_INT8,
    "orders_apportion": SQL_ORDERS_APPORTION,
    "events_theilsen": SQL_EVENTS_THEILSEN,
    "kg_wiener": SQL_KG_WIENER,
    "events_viterbi": SQL_EVENTS_VITERBI,
    "kg_coreness": SQL_KG_CORENESS,
    "events_runs": SQL_EVENTS_RUNS,
    "orders_hhi": SQL_ORDERS_HHI,
    "vocab_heavy_hitters": SQL_VOCAB_HEAVY_HITTERS,
    "doc_block_dedup": SQL_DOC_BLOCK_DEDUP,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST.format(
        shingles=SHINGLES_SQL.strip()
    ),
    "kg_canonical_star": SQL_KG_CANONICAL,
    "doc_fertility": SQL_DOC_FERTILITY,
}


# --- Driver-gate window rotation (r5) ---------------------------------
# The driver's correctness gate runs the FIRST 50 entries of QUERIES in
# dict order; the remaining queries rely on the local strict sweep
# (scripts/check_oracles.py, all 298). Per the r3 verdict, ~30 flagship
# queries stay pinned every round (one per first-class family: KG
# pipeline + roundtrips, graph, SPARQL, TPC-H, dedup, embedding/ANN,
# multimodal, streaming, text, vocab) and the remaining ~20 slots
# ROTATE through the long tail so every family re-earns driver-green
# rows over time. The r5 rotation (per the r4 verdict) pulls in 19
# NEVER-driver-gated queries: the whole kg_sparql_* long tail, graph
# walks/skipgrams, streaming anomaly/enrichment, multimodal
# frame-sampling/resize, events retention, plus reachability,
# cross-source dedup and stratified sampling.
_GATE_FLAGSHIPS = [
    "kg_structural", "kg_linked", "kg_canonical", "kg_roundtrip",
    "kg_grouped_roundtrip", "kg_datasource_roundtrip", "kg_stream_ingest",
    "kg_linking_pr", "kg_pagerank", "kg_triangles", "kg_sparql",
    "kg_sparql_agg", "tpch_q1", "tpch_q3", "dedup_exact", "dedup_jaccard",
    "dedup_minhash", "dedup_simhash", "dedup_pipeline", "embedding_topk",
    "embedding_ann", "embedding_pq", "embedding_kmeans", "multimodal_meta",
    "multimodal_features", "stream_hourly", "stream_sessions",
    "stream_dedup", "lang_id", "text_quality", "vocab_bpe",
]
_GATE_ROTATION_R5 = [
    "kg_sparql_path", "kg_sparql_construct", "kg_sparql_graph",
    "kg_sparql_update", "kg_sparql_star", "kg_sparql_typed",
    "kg_sparql_exists", "kg_sparql_alt", "kg_sparql_subselect",
    "kg_walks", "kg_skipgrams", "kg_reachable", "stream_anomaly",
    "stream_enrich", "multimodal_frames", "multimodal_resize",
    "events_retention", "dedup_cross_source", "sample_stratified",
]
_window = _GATE_FLAGSHIPS + _GATE_ROTATION_R5
assert len(_window) == 50 and len(set(_window)) == 50
assert all(name in QUERIES for name in _window), [
    n for n in _window if n not in QUERIES
]
# Reorder: window first (gated), everything else keeps its relative
# order. Values are identical; only dict insertion order changes.
QUERIES = {
    **{name: QUERIES[name] for name in _window},
    **QUERIES,
}
