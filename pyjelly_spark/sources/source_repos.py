"""Deterministic synthetic source-code repository table.

Produces the Iceberg-shaped input mandated by BASELINE.json.input_hint:
``(repo: string, path: string, commit: string, lang: string,
content: string)`` — synthesized as a pure function of the row index
(seedless, closed-form; no wall clock, no RNG state), so ground-truth
triples are exactly computable and every run at every scale reproduces
byte-identical rows.

Everything is built from Spark SQL expressions (JVM-side, whole-stage
codegen): at bench scale the generator must not be the bottleneck, and
at cluster scale ``spark.range`` parallelizes perfectly with zero input
I/O. No UDFs, no driver-side loops.

Shape (FIXTURES.md §1):
- repo-0000 is the "mega-repo" holding ~30 % of all files (row index
  i % 10 < 3) — exercises the skew/salting path; remaining files spread
  over ``n_repos - 1`` repos by a Knuth multiplicative hash.
- path is ``src/pkg{i % 13}/mod_{i}.{ext}`` — globally unique.
- content holds language-appropriate import / def / call lines whose
  targets are closed-form functions of i, giving exact expected edges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761  # multiplicative hash constant; i*KNUTH stays < 2^63 for i < 3.4e9
N_PKGS = 13
N_SHARED_SYMBOLS = 50

LANGS = ["python", "javascript", "java", "go"]
EXTS = ["py", "js", "java", "go"]

# per-language line templates; {mod} is dotted, {mod_slash} slash-separated
_IMPORT_FMT = {
    "python": ("import ", "", ""),          # import pkg1.mod_7
    "javascript": ("import '", "'", ";"),   # import 'pkg1/mod_7';
    "java": ("import ", "", ";"),           # import pkg1.mod_7;
    "go": ('import "', '"', ""),            # import "pkg1/mod_7"
}
_DEF_KEYWORD = {
    "python": ("def ", "():"),
    "javascript": ("function ", "() {}"),
    "java": ("void ", "() {}"),
    "go": ("func ", "() {}"),
}
_CALL_SUFFIX = {"python": "()", "javascript": "();", "java": "();", "go": "()"}


def n_repos_for(n_files: int) -> int:
    """Repo count grows with corpus size but stays well below file count."""
    return max(4, min(2000, n_files // 50))


def _module_of(i: Column) -> Column:
    """Dotted module name of file i: pkg{i % 13}.mod_{i}."""
    return F.concat(
        F.lit("pkg"), (i % N_PKGS).cast("string"), F.lit(".mod_"), i.cast("string")
    )


def _lang_case(mapping: dict, lang: Column, part: int) -> Column:
    expr = F.lit(mapping["python"][part])
    for name in ("javascript", "java", "go"):
        expr = F.when(lang == name, F.lit(mapping[name][part])).otherwise(expr)
    return expr


def generate_source_files(
    spark: SparkSession, n_files: int, parallelism: int | None = None
) -> DataFrame:
    """The synthetic ``source_files`` table, fully JVM-side."""
    n_repos = n_repos_for(n_files)
    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_files, numPartitions=parallelism)
    i = F.col("id")

    repo_idx = F.when(i % 10 < 3, F.lit(0)).otherwise(
        1 + (i * KNUTH) % (n_repos - 1)
    )
    repo = F.format_string("repo-%04d", repo_idx)
    lang_idx = (i % 4).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx + 1)
    ext = F.element_at(F.array(*[F.lit(x) for x in EXTS]), lang_idx + 1)
    path = F.concat(
        F.lit("src/pkg"),
        (i % N_PKGS).cast("string"),
        F.lit("/mod_"),
        i.cast("string"),
        F.lit("."),
        ext,
    )

    # ---- content ------------------------------------------------------------
    # imports: 1 + i%3 targets, target j_k = (i*31 + k*17 + 1) % n_files
    lines = [
        F.concat(
            F.when(lang == "python", F.lit("# ")).otherwise(F.lit("// ")),
            F.lit("repo: "),
            repo,
            F.lit(" path: "),
            path,
        )
    ]
    imp_open = _lang_case(_IMPORT_FMT, lang, 0)
    imp_close = _lang_case(_IMPORT_FMT, lang, 1)
    imp_end = _lang_case(_IMPORT_FMT, lang, 2)
    slashy = F.when(lang.isin("javascript", "go"), F.lit(True)).otherwise(F.lit(False))
    for k in range(1, 4):  # up to 3 imports, k-th present when k <= 1 + i%3
        target = (i * 31 + k * 17 + 1) % n_files
        module = _module_of(target)
        module_text = F.when(slashy, F.replace(module, F.lit("."), F.lit("/"))).otherwise(
            module
        )
        line = F.concat(imp_open, module_text, imp_close, imp_end)
        lines.append(F.when(F.lit(k) <= 1 + i % 3, line).otherwise(F.lit(None)))

    # defs: one globally-unique symbol f_{i}_0, plus (when i%2==0) a colliding
    # shared_{i%50} definition that entity canonicalization must reconcile
    def_open = _lang_case({k: (v[0], "") for k, v in _DEF_KEYWORD.items()}, lang, 0)
    def_close = _lang_case({k: ("", v[1]) for k, v in _DEF_KEYWORD.items()}, lang, 1)
    unique_sym = F.concat(F.lit("f_"), i.cast("string"), F.lit("_0"))
    shared_sym = F.concat(F.lit("shared_"), (i % N_SHARED_SYMBOLS).cast("string"))
    lines.append(F.concat(def_open, unique_sym, def_close))
    lines.append(
        F.when(i % 2 == 0, F.concat(def_open, shared_sym, def_close)).otherwise(
            F.lit(None)
        )
    )

    # calls: 1 + i%4 call sites, target j_k = (i*13 + k*7 + 3) % n_files,
    # plus one shared-symbol call
    call_end = _lang_case({k: ("", v) for k, v in _CALL_SUFFIX.items()}, lang, 1)
    for k in range(1, 5):
        target = (i * 13 + k * 7 + 3) % n_files
        callee = F.concat(F.lit("f_"), target.cast("string"), F.lit("_0"))
        line = F.concat(F.lit("  "), callee, call_end)
        lines.append(F.when(F.lit(k) <= 1 + i % 4, line).otherwise(F.lit(None)))
    lines.append(
        F.concat(
            F.lit("  shared_"), ((i + 1) % N_SHARED_SYMBOLS).cast("string"), call_end
        )
    )

    content = F.concat_ws("\n", *lines)
    commit = F.substring(F.sha2(F.concat(repo, F.lit(":"), path), 256), 1, 40)

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


SOURCE_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_source_table(
    spark: SparkSession, location: str, table_format: str = "auto"
) -> DataFrame:
    """Load the (repo, path, commit, lang, content) source table.

    ``table_format='auto'`` tries Iceberg first (the production shape per
    BASELINE.json north_star — partition/column pruning come from the
    Iceberg DataSourceV2) and falls back to plain parquet, which is all
    this sandbox has. Schema is validated either way so the pipeline
    fails fast on a mis-shaped input.
    """
    df = None
    if table_format in ("auto", "iceberg"):
        try:
            df = spark.read.format("iceberg").load(location)
        except Exception:  # noqa: BLE001  (no Iceberg runtime in sandbox)
            if table_format == "iceberg":
                raise
    if df is None:
        df = spark.read.parquet(location)
    missing = [c for c in SOURCE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"source table at {location} is missing columns {missing}; "
            f"expected {SOURCE_COLUMNS}"
        )
    return df.select(*SOURCE_COLUMNS)


def ensure_source_table(spark: SparkSession, path: str, n_files: int) -> str:
    """Write the table as parquet once; reuse on later calls."""
    import os

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_source_files(spark, n_files).write.mode("overwrite").parquet(path)
    return path
