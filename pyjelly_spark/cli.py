"""jelly-cli-style command line tool over the pure-Python codec.

The reference ecosystem ships `jelly-cli` for transcoding/inspection
(pyjelly defers to it in its conformance suite); this is the Spark-repo
analogue, driver-side only (no SparkSession) so it works on any machine
the package is installed on:

    python -m pyjelly_spark.cli info   FILE.jelly
    python -m pyjelly_spark.cli cat    FILE.jelly            # N-Triples/Quads
    python -m pyjelly_spark.cli validate FILE.jelly
    python -m pyjelly_spark.cli transcode IN OUT [--frame-rows N]
        [--physical triples|quads] [--names N --prefixes N --datatypes N]
        [--non-delimited] [--rdf-star]

`transcode` infers formats from extensions (.nt/.nq/.jelly): text->jelly
encodes, jelly->text decodes, jelly->jelly re-frames (e.g. change frame
size or lookup capacities — the codec's decode->re-encode is byte-stable,
tests/test_codec_golden.py).
"""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from typing import Iterator, Tuple

from pyjelly_spark.jelly import StreamOptions, constants as c
from pyjelly_spark.jelly.decoder import decode_flat
from pyjelly_spark.jelly.encoder import encode_flat
from pyjelly_spark.jelly.ioutils import (
    frames_from_bytes,
    read_file_bytes,
    read_stream_options,
    sniff_file,
    split_frame,
    write_frames,
)
from pyjelly_spark.jelly.nt import read_ntriples, statement_to_nt

_PHYS_NAMES = {c.PHYSICAL_TRIPLES: "TRIPLES", c.PHYSICAL_QUADS: "QUADS"}


def _events_to_statements(path: str) -> Iterator[Tuple]:
    for event in decode_flat(frames_from_bytes(read_file_bytes(path))):
        yield tuple(event[1:])


def cmd_info(args: argparse.Namespace) -> int:
    data = read_file_bytes(args.file)
    opts = read_stream_options(data)
    n_frames = 0
    n_rows = 0
    kinds: Counter = Counter()
    for frame in frames_from_bytes(data):
        n_frames += 1
        rows, meta = split_frame(frame)
        n_rows += len(rows)
        if meta:
            kinds["frames_with_metadata"] += 1
    stmts = Counter(e[0] for e in decode_flat(frames_from_bytes(data)))
    print(f"delimited:     {sniff_file(args.file, head_bytes=data[:3])}")
    print(f"physical_type: {_PHYS_NAMES.get(opts.physical_type, opts.physical_type)}")
    print(f"logical_type:  {opts.logical_type}")
    print(f"version:       {opts.version}")
    print(
        "lookups:       names=%d prefixes=%d datatypes=%d"
        % (opts.preset.names, opts.preset.prefixes, opts.preset.datatypes)
    )
    print(f"rdf_star:      {opts.rdf_star}")
    print(f"generalized:   {opts.generalized}")
    if opts.stream_name:
        print(f"stream_name:   {opts.stream_name}")
    print(f"frames:        {n_frames}")
    print(f"rows:          {n_rows}")
    for kind, count in sorted(stmts.items()):
        print(f"  {kind}: {count}")
    for kind, count in sorted(kinds.items()):
        print(f"  {kind}: {count}")
    return 0


def cmd_cat(args: argparse.Namespace) -> int:
    try:
        for stmt in _events_to_statements(args.file):
            print(statement_to_nt(stmt))
    except BrokenPipeError:  # `cat FILE | head` is fine
        sys.stderr.close()
    return 0


def cmd_validate(args: argparse.Namespace) -> int:
    try:
        n = sum(1 for _ in _events_to_statements(args.file))
    except (c.JellyError, ValueError) as exc:
        print(f"INVALID: {exc}", file=sys.stderr)
        return 1
    print(f"OK: {n} statements")
    return 0


def _build_options(args: argparse.Namespace, quads: bool) -> StreamOptions:
    return StreamOptions(
        physical_type=c.PHYSICAL_QUADS if quads else c.PHYSICAL_TRIPLES,
        logical_type=c.LOGICAL_FLAT_QUADS if quads else c.LOGICAL_FLAT_TRIPLES,
        preset=c.TablePreset(
            names=args.names, prefixes=args.prefixes, datatypes=args.datatypes
        ),
        rdf_star=args.rdf_star,
        delimited=not args.non_delimited,
        frame_rows=args.frame_rows,
    )


def cmd_transcode(args: argparse.Namespace) -> int:
    src_jelly = args.input.endswith((".jelly", ".jelly.gz"))
    dst_jelly = args.output.endswith((".jelly", ".jelly.gz"))
    if src_jelly:
        statements = list(_events_to_statements(args.input))
    else:
        statements = list(read_ntriples(args.input))
    if not dst_jelly:
        # honor .gz on the text branch too — out.nt.gz must actually be
        # gzip, not an uncompressed file with a misleading suffix
        if args.output.endswith(".gz"):
            import gzip

            opener = gzip.open(args.output, "wt", encoding="utf-8")
        else:
            opener = open(args.output, "w", encoding="utf-8")
        with opener as out:
            for stmt in statements:
                out.write(statement_to_nt(stmt) + "\n")
        print(f"wrote {len(statements)} statements to {args.output}")
        return 0
    quads = (
        args.physical == "quads"
        if args.physical
        else any(len(s) == 4 for s in statements)
    )
    if quads:
        # N-Quads lines with 3 terms live in the default graph
        statements = [
            s if len(s) == 4 else (*s, ("dg",)) for s in statements
        ]
    opts = _build_options(args, quads)
    if args.output.endswith(".gz"):
        import gzip

        with gzip.open(args.output, "wb") as out:
            written = write_frames(
                encode_flat(iter(statements), opts), out,
                delimited=opts.delimited,
            )
    else:
        with open(args.output, "wb") as out:
            written = write_frames(
                encode_flat(iter(statements), opts), out,
                delimited=opts.delimited,
            )
    print(
        f"wrote {len(statements)} statements / {written} bytes to {args.output}"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pyjelly-spark", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="stream options + frame statistics")
    p.add_argument("file")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("cat", help="decode to N-Triples/N-Quads on stdout")
    p.add_argument("file")
    p.set_defaults(fn=cmd_cat)

    p = sub.add_parser("validate", help="full decode; exit 1 on protocol error")
    p.add_argument("file")
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("transcode", help="convert between .nt/.nq and .jelly")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--frame-rows", type=int, default=c.DEFAULT_FRAME_ROWS)
    p.add_argument("--physical", choices=["triples", "quads"])
    p.add_argument("--names", type=int, default=c.DEFAULT_NAMES)
    p.add_argument("--prefixes", type=int, default=c.DEFAULT_PREFIXES)
    p.add_argument("--datatypes", type=int, default=c.DEFAULT_DATATYPES)
    p.add_argument("--non-delimited", action="store_true")
    p.add_argument("--rdf-star", action="store_true")
    p.set_defaults(fn=cmd_transcode)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
