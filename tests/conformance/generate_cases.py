"""Deterministic generator for the in-repo conformance case files.

The reference drives its conformance suite from a W3C-style RDF test
manifest submodule (/root/reference/tests/conformance_tests/ — absent
here: no network). This recreates the STRUCTURE — a manifest enumerating
positive (parse + compare) and negative (must-raise) cases over physical
files — with cases authored from the protocol-violation taxonomy the
reference's manifest covers: options validation, lookup-index rules,
term rules, framing, logical-type strictness.

Run ``python tests/conformance/generate_cases.py`` from the repo root to
(re)materialize ``cases/`` and ``manifest.json``; the walker
(tests/test_conformance_manifest.py) only reads them. Output bytes are
deterministic, so regeneration is diff-stable.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyjelly_spark.jelly import constants as jc
from pyjelly_spark.jelly.constants import StreamOptions, TablePreset
from pyjelly_spark.jelly.encoder import StreamEncoder, delimit, encode_flat
from pyjelly_spark.jelly.grouped import encode_grouped, grouped_options
from pyjelly_spark.jelly.wire import len_field, str_field, varint_field

HERE = Path(__file__).resolve().parent
CASES = HERE / "cases"


def iri(v):
    return ("iri", v)


def lit(v, lang="", dt=""):
    return ("lit", v, lang, dt)


def nt_of(statements):
    from pyjelly_spark.jelly.nt import statement_to_nt

    return "".join(statement_to_nt(s) + "\n" for s in statements)


def write_flat(name, statements, options, delimited=True):
    frames = list(encode_flat(iter(statements), options))
    path = CASES / f"{name}.jelly"
    if delimited:
        path.write_bytes(b"".join(delimit(f) for f in frames))
    else:
        assert len(frames) == 1
        path.write_bytes(frames[0])
    (CASES / f"{name}.nt").write_text(nt_of(statements), encoding="utf-8")


def options_row_frame(options: StreamOptions, extra_rows=()):
    """One delimited frame holding a raw options row (+ extra rows)."""
    rows = [StreamEncoder(options)._options_row()] + list(extra_rows)
    frame = b"".join(len_field(jc.FRAME_ROWS, r) for r in rows)
    return delimit(frame)


def raw_options_body(fields):
    """Hand-rolled RdfStreamOptions body, bypassing StreamOptions
    validation — for encoding option combinations a conforming writer
    cannot produce. ``fields`` maps option field number -> varint value."""
    out = b""
    for num, val in sorted(fields.items()):
        out += varint_field(num, val)
    return out


def raw_options_frame(fields):
    row = len_field(jc.ROW_OPTIONS, raw_options_body(fields))
    return delimit(len_field(jc.FRAME_ROWS, row))


TRIPLE_S = str_field(jc.SLOT_SUBJECT_BASE + 1, "b0")
TRIPLE_P = str_field(jc.SLOT_PREDICATE_BASE + 1, "b1")
TRIPLE_O = str_field(jc.SLOT_OBJECT_BASE + 1, "b2")


def bnode_triple_row():
    return len_field(jc.ROW_TRIPLE, TRIPLE_S + TRIPLE_P + TRIPLE_O)


def main() -> None:
    CASES.mkdir(exist_ok=True)
    manifest = []

    def pos(case_id, name, action, result=None, parser="flat", category="rdf11"):
        manifest.append(
            {
                "id": case_id,
                "type": "positive",
                "category": category,
                "name": name,
                "action": action,
                "result": result,
                "parser": parser,
            }
        )

    def neg(case_id, name, action, error_match, parser="flat", category="rdf11"):
        manifest.append(
            {
                "id": case_id,
                "type": "negative",
                "category": category,
                "name": name,
                "action": action,
                "error_match": error_match,
                "parser": parser,
            }
        )

    S, P, O, O2 = (
        iri("http://example.org/s"),
        iri("http://example.org/p"),
        iri("http://example.org/o"),
        iri("http://example.org/o2"),
    )
    G1, G2 = iri("http://example.org/g1"), iri("http://example.org/g2")

    # ---------------------------------------------------------- positives
    write_flat(
        "pos_triples_flat",
        [(S, P, O), (S, P, O2), (iri("http://example.org/s2"), P, O)],
        StreamOptions(),
    )
    pos("pos/triples/flat", "flat triples, default options",
        "cases/pos_triples_flat.jelly", "cases/pos_triples_flat.nt")

    write_flat(
        "pos_triples_nondelimited",
        [(S, P, O)],
        StreamOptions(delimited=False),
        delimited=False,
    )
    pos("pos/triples/non-delimited", "single non-delimited frame",
        "cases/pos_triples_nondelimited.jelly",
        "cases/pos_triples_nondelimited.nt")

    write_flat(
        "pos_triples_literals",
        [
            (S, P, lit("plain")),
            (S, P, lit("hallo", lang="de")),
            (S, P, lit("42", dt="http://www.w3.org/2001/XMLSchema#int")),
        ],
        StreamOptions(),
    )
    pos("pos/triples/literal-kinds", "plain / lang / typed literals",
        "cases/pos_triples_literals.jelly", "cases/pos_triples_literals.nt")

    write_flat(
        "pos_triples_small_lookups",
        [
            (iri(f"http://example.org/ns{i}/x{i}"), P, O)
            for i in range(24)
        ],
        StreamOptions(preset=TablePreset(names=8, prefixes=8, datatypes=8)),
    )
    pos("pos/triples/lookup-eviction", "8-entry tables force eviction",
        "cases/pos_triples_small_lookups.jelly",
        "cases/pos_triples_small_lookups.nt")

    write_flat(
        "pos_triples_no_prefix_table",
        [(S, P, O)],
        StreamOptions(preset=TablePreset(names=16, prefixes=0, datatypes=8)),
    )
    pos("pos/triples/prefix-table-disabled", "whole-IRI encoding path",
        "cases/pos_triples_no_prefix_table.jelly",
        "cases/pos_triples_no_prefix_table.nt")

    write_flat(
        "pos_quads_flat",
        [(S, P, O, G1), (S, P, O2, ("dg",)), (S, P, O, G2)],
        StreamOptions(
            physical_type=jc.PHYSICAL_QUADS,
            logical_type=jc.LOGICAL_FLAT_QUADS,
        ),
    )
    pos("pos/quads/flat", "flat quads incl. default graph",
        "cases/pos_quads_flat.jelly", "cases/pos_quads_flat.nt")

    write_flat(
        "pos_triples_rdfstar",
        [(("qt", S, P, O), iri("http://example.org/says"), O2)],
        StreamOptions(rdf_star=True),
    )
    pos("pos/triples/rdf-star", "quoted triple subject",
        "cases/pos_triples_rdfstar.jelly", "cases/pos_triples_rdfstar.nt",
        category="rdf_star")

    grouped = list(
        encode_grouped(
            [(G1, [(S, P, O)]), (G2, [(S, P, O2), (S, P, O)])],
            grouped_options(jc.PHYSICAL_GRAPHS),
        )
    )
    (CASES / "pos_graphs_grouped.jelly").write_bytes(
        b"".join(delimit(f) for f in grouped)
    )
    (CASES / "pos_graphs_grouped.nt").write_text(
        nt_of([(S, P, O, G1), (S, P, O2, G2), (S, P, O, G2)]),
        encoding="utf-8",
    )
    pos("pos/graphs/grouped", "physical GRAPHS, one graph per frame",
        "cases/pos_graphs_grouped.jelly", "cases/pos_graphs_grouped.nt",
        parser="grouped")

    # options-only stream: zero statements is a valid stream
    (CASES / "pos_empty_stream.jelly").write_bytes(
        options_row_frame(StreamOptions())
    )
    (CASES / "pos_empty_stream.nt").write_text("", encoding="utf-8")
    pos("pos/framing/options-only", "stream with options row only",
        "cases/pos_empty_stream.jelly", "cases/pos_empty_stream.nt")

    # version-2 stream (namespace declarations allowed)
    write_flat(
        "pos_triples_v2",
        [(S, P, O)],
        StreamOptions(namespace_declarations=True),
    )
    pos("pos/options/version-2", "protocol version 2 stream",
        "cases/pos_triples_v2.jelly", "cases/pos_triples_v2.nt")

    # cross-implementation golden: produced by the reference pyjelly
    pos("pos/golden/reference-sample", "reference-encoded sample.jelly",
        "/root/reference/tests/integration_tests/test_examples/"
        "example_data/sample.jelly", None)

    # ---------------------------------------------------------- negatives
    # options family
    (CASES / "neg_options_name_table_small.jelly").write_bytes(
        raw_options_frame({
            jc.OPT_PHYSICAL_TYPE: jc.PHYSICAL_TRIPLES,
            jc.OPT_LOGICAL_TYPE: jc.LOGICAL_FLAT_TRIPLES,
            jc.OPT_MAX_NAMES: 4, jc.OPT_MAX_PREFIXES: 8,
            jc.OPT_MAX_DATATYPES: 8, jc.OPT_VERSION: 1,
        })
    )
    neg("neg/options/name-table-too-small",
        "name lookup below protocol minimum 8",
        "cases/neg_options_name_table_small.jelly", "at least 8")

    (CASES / "neg_options_table_too_large.jelly").write_bytes(
        raw_options_frame({
            jc.OPT_PHYSICAL_TYPE: jc.PHYSICAL_TRIPLES,
            jc.OPT_LOGICAL_TYPE: jc.LOGICAL_FLAT_TRIPLES,
            jc.OPT_MAX_NAMES: 5000, jc.OPT_MAX_PREFIXES: 8,
            jc.OPT_MAX_DATATYPES: 8, jc.OPT_VERSION: 1,
        })
    )
    neg("neg/options/table-above-max", "lookup above protocol max 4096",
        "cases/neg_options_table_too_large.jelly", "4096")

    for pname, phys, logi in (
        ("triples-flat-quads", jc.PHYSICAL_TRIPLES, jc.LOGICAL_FLAT_QUADS),
        ("triples-datasets", jc.PHYSICAL_TRIPLES, jc.LOGICAL_DATASETS),
        ("quads-flat-triples", jc.PHYSICAL_QUADS, jc.LOGICAL_FLAT_TRIPLES),
        ("quads-graphs", jc.PHYSICAL_QUADS, jc.LOGICAL_GRAPHS),
        ("graphs-flat-triples", jc.PHYSICAL_GRAPHS, jc.LOGICAL_FLAT_TRIPLES),
        ("graphs-subject-graphs", jc.PHYSICAL_GRAPHS,
         jc.LOGICAL_SUBJECT_GRAPHS),
    ):
        fname = f"neg_options_combo_{pname}.jelly"
        (CASES / fname).write_bytes(
            raw_options_frame({
                jc.OPT_PHYSICAL_TYPE: phys,
                jc.OPT_LOGICAL_TYPE: logi,
                jc.OPT_MAX_NAMES: 16, jc.OPT_MAX_PREFIXES: 8,
                jc.OPT_MAX_DATATYPES: 8, jc.OPT_VERSION: 1,
            })
        )
        neg(f"neg/options/incompatible-{pname}",
            f"physical/logical mismatch: {pname}",
            f"cases/{fname}", "incompatible")

    (CASES / "neg_options_future_version.jelly").write_bytes(
        raw_options_frame({
            jc.OPT_PHYSICAL_TYPE: jc.PHYSICAL_TRIPLES,
            jc.OPT_LOGICAL_TYPE: jc.LOGICAL_FLAT_TRIPLES,
            jc.OPT_MAX_NAMES: 16, jc.OPT_MAX_PREFIXES: 8,
            jc.OPT_MAX_DATATYPES: 8, jc.OPT_VERSION: 3,
        })
    )
    neg("neg/options/future-version", "protocol version above supported",
        "cases/neg_options_future_version.jelly", "unsupported protocol")

    # a second options row contradicting the first
    enc = StreamEncoder(StreamOptions())
    first = options_row_frame(StreamOptions())
    second = options_row_frame(
        StreamOptions(preset=TablePreset(names=32, prefixes=8, datatypes=8))
    )
    (CASES / "neg_options_contradiction.jelly").write_bytes(first + second)
    neg("neg/options/mid-stream-contradiction",
        "second options row disagrees with stream state",
        "cases/neg_options_contradiction.jelly", "contradicts")

    # rows before any options row
    (CASES / "neg_framing_rows_before_options.jelly").write_bytes(
        delimit(len_field(jc.FRAME_ROWS, bnode_triple_row()))
    )
    neg("neg/framing/rows-before-options",
        "statement row precedes the options row",
        "cases/neg_framing_rows_before_options.jelly",
        "before options row")

    # truncated delimited frame
    good = options_row_frame(StreamOptions())
    (CASES / "neg_framing_truncated.jelly").write_bytes(good[:-2])
    neg("neg/framing/truncated-frame", "delimited frame cut short",
        "cases/neg_framing_truncated.jelly", "truncated")

    # empty file
    (CASES / "neg_framing_empty.jelly").write_bytes(b"")
    neg("neg/framing/empty-file", "no frames at all",
        "cases/neg_framing_empty.jelly", "no non-empty frames",
        parser="options")

    # lookup family: statement referencing a never-assigned index
    body_bad_name = (
        len_field(jc.SLOT_SUBJECT_BASE, varint_field(2, 5))
        + TRIPLE_P + TRIPLE_O
    )
    (CASES / "neg_lookup_never_assigned.jelly").write_bytes(
        options_row_frame(
            StreamOptions(),
            extra_rows=[len_field(jc.ROW_TRIPLE, body_bad_name)],
        )
    )
    neg("neg/lookup/never-assigned-name",
        "IRI references name index with empty table",
        "cases/neg_lookup_never_assigned.jelly", "never assigned")

    # typed literal whose datatype id was never assigned (lex=field 1,
    # datatype id=field 3 in RdfLiteral)
    body_bad_dt = (
        TRIPLE_S + TRIPLE_P
        + len_field(
            jc.SLOT_OBJECT_BASE + 2, len_field(1, b"42") + varint_field(3, 7)
        )
    )
    (CASES / "neg_lookup_bad_datatype.jelly").write_bytes(
        options_row_frame(
            StreamOptions(),
            extra_rows=[len_field(jc.ROW_TRIPLE, body_bad_dt)],
        )
    )
    neg("neg/lookup/never-assigned-datatype",
        "typed literal references unassigned datatype index",
        "cases/neg_lookup_bad_datatype.jelly", "never assigned")

    # term family: repeated term as first statement
    body_repeat_first = TRIPLE_P + TRIPLE_O  # subject slot absent
    (CASES / "neg_term_repeat_first.jelly").write_bytes(
        options_row_frame(
            StreamOptions(),
            extra_rows=[len_field(jc.ROW_TRIPLE, body_repeat_first)],
        )
    )
    neg("neg/term/repeated-term-first",
        "first statement relies on repeated term",
        "cases/neg_term_repeat_first.jelly", "missing repeated term")

    # quoted triple with a repeated (absent) slot
    quoted = len_field(jc.SLOT_SUBJECT_BASE + 1, b"b0") + len_field(
        jc.SLOT_OBJECT_BASE + 1, b"b2"
    )
    body_qt = (
        len_field(jc.SLOT_SUBJECT_BASE + 3, quoted) + TRIPLE_P + TRIPLE_O
    )
    (CASES / "neg_term_quoted_repeat.jelly").write_bytes(
        options_row_frame(
            StreamOptions(rdf_star=True),
            extra_rows=[len_field(jc.ROW_TRIPLE, body_qt)],
        )
    )
    neg("neg/term/quoted-triple-repeat",
        "repeated term inside a quoted triple",
        "cases/neg_term_quoted_repeat.jelly", "quoted triples",
        category="rdf_star")

    # unknown row field
    (CASES / "neg_term_unknown_row.jelly").write_bytes(
        options_row_frame(
            StreamOptions(), extra_rows=[len_field(13, b"")]
        )
    )
    neg("neg/term/unknown-row-field", "row with unassigned field number",
        "cases/neg_term_unknown_row.jelly", "unknown stream row")

    # logical-type strict family (strict parse of mismatched streams)
    write_flat("neg_strict_flat_as_grouped", [(S, P, O)], StreamOptions())
    neg("neg/logical/flat-parsed-grouped-strict",
        "FLAT stream under strict grouped parse",
        "cases/neg_strict_flat_as_grouped.jelly", "expected GROUPED",
        parser="grouped-strict")

    (CASES / "neg_strict_grouped_as_flat.jelly").write_bytes(
        b"".join(
            delimit(f)
            for f in encode_grouped(
                [(G1, [(S, P, O)])], grouped_options(jc.PHYSICAL_GRAPHS)
            )
        )
    )
    neg("neg/logical/grouped-parsed-flat-strict",
        "GROUPED stream under strict flat parse",
        "cases/neg_strict_grouped_as_flat.jelly", "expected FLAT",
        parser="flat-strict")

    write_flat(
        "neg_strict_unspecified",
        [(S, P, O)],
        StreamOptions(logical_type=jc.LOGICAL_UNSPECIFIED),
    )
    neg("neg/logical/unspecified-strict",
        "UNSPECIFIED logical type under strict flat parse",
        "cases/neg_strict_unspecified.jelly", "expected FLAT",
        parser="flat-strict")

    (HERE / "manifest.json").write_text(
        json.dumps(manifest, indent=1) + "\n", encoding="utf-8"
    )
    npos = sum(1 for e in manifest if e["type"] == "positive")
    print(f"wrote {len(manifest)} cases ({npos} positive, "
          f"{len(manifest) - npos} negative) to {HERE}")


if __name__ == "__main__":
    main()
