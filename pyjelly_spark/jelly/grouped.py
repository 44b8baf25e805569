"""Grouped / GRAPHS framing: one graph (or dataset slice) per frame.

Reference parity (semantics, not structure):

- ``split_to_graphs`` — order-sensitive consecutive-run grouping of quads
  into graphs (/root/reference/pyjelly/integrations/generic/serialize.py:234-265):
  a new group starts exactly when the graph term changes, so the same
  graph term appearing in two non-adjacent runs yields two groups.
- grouped encode — one frame per group
  (/root/reference/pyjelly/integrations/generic/serialize.py:303-330 via
  flows.GraphsFrameFlow / DatasetsFrameFlow).
- grouped decode — one group per frame
  (/root/reference/pyjelly/integrations/generic/parse.py:230-317).

These are the sequential primitives; the distributed writer/reader in
``pyjelly_spark.sources.jelly_io`` runs them per Spark partition / file.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Tuple

from pyjelly_spark.jelly import constants as c
from pyjelly_spark.jelly.decoder import StreamDecoder, split_frame
from pyjelly_spark.jelly.encoder import StreamEncoder

Term = tuple
_NO_GRAPH = object()  # sentinel: distinct from any term incl. ("dg",)


def split_to_graphs(
    statements: Iterable[Tuple[Term, Term, Term, Term]],
) -> Iterator[Tuple[Term, List[Tuple[Term, Term, Term]]]]:
    """Group (s, p, o, g) quads into consecutive same-graph runs.

    Yields (graph_term, [(s, p, o), ...]) per run. Order-sensitive by
    design: interleaved graphs produce one group per run, mirroring the
    reference's ``split_to_graphs``.
    """
    current_g: object = _NO_GRAPH
    triples: List[Tuple[Term, Term, Term]] = []
    for s, p, o, g in statements:
        if g != current_g:
            if current_g is not _NO_GRAPH:
                yield current_g, triples  # type: ignore[misc]
            current_g, triples = g, []
        triples.append((s, p, o))
    if current_g is not _NO_GRAPH:
        yield current_g, triples  # type: ignore[misc]


def grouped_options(physical_type: int = c.PHYSICAL_GRAPHS, **kwargs) -> c.StreamOptions:
    """StreamOptions for a grouped stream of the given physical type.

    Logical type defaults per physical type: TRIPLES -> GRAPHS (one graph
    per frame), QUADS/GRAPHS -> NAMED_GRAPHS (one named graph per frame).
    """
    if "logical_type" not in kwargs:
        kwargs["logical_type"] = (
            c.LOGICAL_GRAPHS
            if physical_type == c.PHYSICAL_TRIPLES
            else c.LOGICAL_NAMED_GRAPHS
        )
    return c.StreamOptions(physical_type=physical_type, **kwargs)


def encode_grouped(
    groups: Iterable[Tuple[Term, List[Tuple[Term, Term, Term]]]],
    options: c.StreamOptions,
    frame_metadata: Optional[Dict[str, bytes]] = None,
) -> Iterator[bytes]:
    """Encode (graph, triples) groups as one frame per group.

    Physical GRAPHS brackets each group with graph_start/graph_end rows;
    physical QUADS re-attaches the graph term per statement; physical
    TRIPLES drops the graph term (logical grouping only). Grouped logical
    types disable bounded framing in the encoder, so a frame holds exactly
    its group regardless of size.
    """
    encoder = StreamEncoder(options)
    phys = options.physical_type
    for graph, triples in groups:
        if phys == c.PHYSICAL_GRAPHS:
            encoder.begin_graph(graph)
            for s, p, o in triples:
                encoder.add_triple(s, p, o)
            encoder.end_graph()
        elif phys == c.PHYSICAL_QUADS:
            for s, p, o in triples:
                encoder.add_quad(s, p, o, graph)
        else:
            for s, p, o in triples:
                encoder.add_triple(s, p, o)
        frame = encoder.take_frame(metadata=frame_metadata)
        if frame is not None:
            yield frame
    encoder._begin()  # an empty grouped stream still carries options
    tail = encoder.take_frame()
    if tail is not None:
        yield tail


def decode_grouped(
    frames: Iterable[bytes],
    *,
    logical_type_strict: bool = False,
) -> Iterator[Tuple[List[tuple], Dict[str, bytes]]]:
    """Decode a grouped stream: one (events, metadata) pair per frame.

    Events are flat statement tuples; GRAPHS brackets are resolved into
    quads with the bracketing graph term. Graph state carries across
    frames (the protocol allows a graph to span frames even though our
    writer never produces that).

    ``logical_type_strict`` ports the reference gate
    (/root/reference/pyjelly/integrations/generic/parse.py:234-263):
    the declared logical type must be GROUPED — a FLAT or UNSPECIFIED
    stream parsed as groups raises JellyError even though its physical
    type would route fine.
    """
    decoder = StreamDecoder()
    current_graph: Optional[Term] = None
    checked = not logical_type_strict
    for frame in frames:
        rows, metadata = split_frame(frame)
        events: List[tuple] = []
        for row in rows:
            event = decoder.decode_row(row)
            if not checked and decoder.options is not None:
                c.check_logical_type_strict(decoder.options, "grouped")
                checked = True
            if event is None:
                continue
            kind = event[0]
            if kind == "graph_start":
                current_graph = event[1]
            elif kind == "graph_end":
                current_graph = None
            elif kind == "triple" and current_graph is not None:
                events.append(
                    ("quad", event[1], event[2], event[3], current_graph)
                )
            else:
                events.append(event)
        yield events, metadata
    if not checked:
        # Stream ended without an options row (e.g. empty stream):
        # strict mode rejects it, same as decode_flat and the
        # reference parse_jelly_grouped (parse.py:263).
        c.check_logical_type_strict(decoder.options, "grouped")
