"""RDF-star through the full distributed path.

The codec already encodes/decodes quoted triples
(/root/reference/pyjelly/serialize/encode.py:170-197,
 parse/decode.py:431-443); these tests cover the flat-column convention
that carries them across the Spark boundary: kind ``qt`` + the RDF-star
N-Triples serialization in the value column.
"""

from __future__ import annotations

from pyjelly_spark.jelly.nt import parse_line, parse_term, term_to_nt


QT = (
    "qt",
    ("iri", "http://ex.org/s"),
    ("iri", "http://ex.org/p"),
    ("lit", 'he said "hi"', "", ""),
)
NESTED = ("qt", QT, ("iri", "http://ex.org/source"), ("bnode", "b0"))


class TestQtTextCodec:
    def test_roundtrip_simple(self):
        assert parse_term(term_to_nt(QT)) == QT

    def test_roundtrip_nested(self):
        assert parse_term(term_to_nt(NESTED)) == NESTED

    def test_parse_line_with_qt_subject(self):
        line = (
            "<< <http://ex.org/s> <http://ex.org/p> <http://ex.org/o> >> "
            "<http://ex.org/certainty> \"0.9\"^^<http://www.w3.org/2001/XMLSchema#double> ."
        )
        s, p, o = parse_line(line)
        assert s[0] == "qt" and s[1] == ("iri", "http://ex.org/s")
        assert o == ("lit", "0.9", "", "http://www.w3.org/2001/XMLSchema#double")

    def test_malformed_qt_raises(self):
        import pytest

        with pytest.raises(ValueError, match="quoted triple"):
            parse_term("<< <http://a> <http://b> >>")
        with pytest.raises(ValueError, match="unterminated"):
            parse_term("<< <http://a> <http://b> <http://c>")


def test_rdf_star_distributed_roundtrip(spark, tmp_path):
    """qt statements: flat DF -> write_jelly (rdf_star options) ->
    read_jelly -> identical flat rows; write_nt emits valid RDF-star NT
    that read_nt parses back to the same statements."""
    from collections import Counter

    from pyjelly_spark.jelly import constants as jc
    from pyjelly_spark.sources.jelly_io import read_jelly, write_jelly
    from pyjelly_spark.sources.nt_source import read_nt, write_nt

    rows = []
    for i in range(6):
        qt = (
            "qt",
            ("iri", f"http://ex.org/s{i}"),
            ("iri", "http://ex.org/p"),
            ("iri", f"http://ex.org/o{i}"),
        )
        rows.append(
            (
                "qt", term_to_nt(qt), None, None,
                "iri", "http://ex.org/certainty", None, None,
                "lit", f"0.{i}", "", "http://www.w3.org/2001/XMLSchema#double",
            )
        )
    cols = [
        f"{slot}_{part}"
        for slot in ("s", "p", "o")
        for part in ("kind", "value", "lang", "datatype")
    ]
    df = spark.createDataFrame(rows, ", ".join(f"{c}: string" for c in cols))

    out = str(tmp_path / "star_out")
    options = jc.StreamOptions(rdf_star=True)
    write_jelly(df.repartition(2), out, options=options, resume=False)
    back = read_jelly(spark, out)

    def key(frame):
        return Counter(
            tuple(r[c] for c in cols) for r in frame.select(*cols).collect()
        )

    assert key(back) == key(df)

    nt_out = str(tmp_path / "star_nt")
    write_nt(df, nt_out)
    reparsed = read_nt(spark, nt_out).select(*cols)
    assert key(reparsed) == key(df)
