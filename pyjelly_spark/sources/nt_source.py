"""Distributed N-Triples / N-Quads ingestion (SURVEY.md §2.1 last row).

The reference ships a driver-local NT/NQ tokenizer for its fixtures
(/root/reference/tests/utils/generic_sink_test_parser.py:21-311); here the
same grammar (pyjelly_spark.jelly.nt) runs distributed: ``spark.read.text``
splits the file(s) into line partitions, and an Arrow-batched
``mapInPandas`` tokenizes each batch — line-oriented formats parallelize
trivially because every statement is one line.

Output is the flat statements frame used across the engine
(s_/p_/o_/g_ kind-value-lang-datatype columns), directly feedable to
``jelly_io.write_jelly`` after partition planning — i.e. a distributed
NT -> Jelly transcoder is ``write_jelly(plan(read_nt(...)))``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

NT_SCHEMA = StructType(
    [StructField(f"{slot}_{part}", StringType(), True)
     for slot in ("s", "p", "o", "g")
     for part in ("kind", "value", "lang", "datatype")]
)


def _term_cols(term) -> tuple:
    if term is None:
        return (None, None, None, None)
    kind = term[0]
    if kind == "lit":
        return ("lit", term[1], term[2], term[3])
    if kind == "dg":
        return ("dg", None, None, None)
    if kind == "qt":
        from pyjelly_spark.jelly.nt import term_to_nt

        return ("qt", term_to_nt(term), None, None)
    return (kind, term[1], None, None)


def read_nt(spark: SparkSession, path: str) -> DataFrame:
    """Read .nt/.nq file(s) into the flat statements DataFrame.

    ``path`` may be a file, directory, or glob; triples get a null graph
    slot, quads carry their graph term.
    """
    lines = spark.read.text(path)

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyjelly_spark.jelly.nt import parse_line

        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                stmt = parse_line(line)
                if stmt is None:
                    continue
                s, p, o = stmt[0], stmt[1], stmt[2]
                g = stmt[3] if len(stmt) > 3 else None
                rows.append(_term_cols(s) + _term_cols(p) + _term_cols(o) + _term_cols(g))
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in NT_SCHEMA])

    return lines.mapInPandas(tokenize, schema=NT_SCHEMA)


def _nt_escape(col: Column) -> Column:
    """N-Triples literal escaping (the dual of jelly.nt._unescape's core
    set), as pure Catalyst string replaces — no Python in the sink path."""
    col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    col = F.replace(col, F.lit('"'), F.lit('\\"'))
    col = F.replace(col, F.lit("\n"), F.lit("\\n"))
    return F.replace(col, F.lit("\r"), F.lit("\\r"))


def _nt_term(slot: str) -> Column:
    kind = F.col(f"{slot}_kind")
    value = F.col(f"{slot}_value")
    lit_body = F.concat(F.lit('"'), _nt_escape(value), F.lit('"'))
    lit_tail = F.when(
        F.col(f"{slot}_lang").isNotNull() & (F.col(f"{slot}_lang") != ""),
        F.concat(F.lit("@"), F.col(f"{slot}_lang")),
    ).when(
        F.col(f"{slot}_datatype").isNotNull()
        & (F.col(f"{slot}_datatype") != ""),
        F.concat(F.lit("^^<"), F.col(f"{slot}_datatype"), F.lit(">")),
    ).otherwise(F.lit(""))
    return (
        F.when(kind == "iri", F.concat(F.lit("<"), value, F.lit(">")))
        .when(kind == "bnode", F.concat(F.lit("_:"), value))
        .when(kind == "lit", F.concat(lit_body, lit_tail))
        .when(kind == "qt", value)  # already the << ... >> serialization
        .otherwise(F.lit(None))  # dg / absent graph -> omitted
    )


def write_nt(flat_statements: DataFrame, out_path: str) -> None:
    """Distributed N-Triples / N-Quads sink: the dual of :func:`read_nt`.

    Statements with a graph slot (non-null, non-default) emit N-Quads
    lines; triples and default-graph quads emit N-Triples lines. Line
    formatting is pure Catalyst (concat/replace — whole-stage codegen),
    written via ``spark.write.text``, so the sink parallelizes like any
    file write. Line order across part files is the partition order —
    N-Triples documents are order-insensitive statement multisets.
    """
    cols = [_nt_term("s"), _nt_term("p"), _nt_term("o")]
    if "g_kind" in flat_statements.columns:
        cols.append(_nt_term("g"))
    line = F.concat(F.concat_ws(" ", *cols), F.lit(" ."))
    flat_statements.select(line.alias("value")).write.mode("overwrite").text(
        out_path
    )
