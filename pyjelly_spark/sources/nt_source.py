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
from pyspark.sql import DataFrame, SparkSession
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
