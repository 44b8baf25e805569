"""Jelly protocol constants: enums, field numbers, presets, term model.

Field numbers come from the public Jelly protobuf schema
(``eu.ostrzyciel.jelly.core.proto.v1``; reference descriptor
/root/reference/pyjelly/jelly/rdf_pb2.py:27). Defaults mirror
/root/reference/pyjelly/options.py:17-27 and serialize/flows.py:11.

Terms are plain tuples throughout this engine (cheap to hash/compare,
Arrow-friendly at the Spark boundary):

- ``("iri", value)``
- ``("bnode", label)``
- ``("lit", lex, lang, datatype)``   lang/datatype are "" when absent
- ``("dg",)``                        the default graph
- ``("qt", s, p, o)``                RDF-star quoted triple (nested terms)
"""

from __future__ import annotations

from dataclasses import dataclass

# --- physical / logical stream types ---------------------------------------
PHYSICAL_UNSPECIFIED = 0
PHYSICAL_TRIPLES = 1
PHYSICAL_QUADS = 2
PHYSICAL_GRAPHS = 3

LOGICAL_UNSPECIFIED = 0
LOGICAL_FLAT_TRIPLES = 1
LOGICAL_FLAT_QUADS = 2
LOGICAL_GRAPHS = 3
LOGICAL_DATASETS = 4
LOGICAL_SUBJECT_GRAPHS = 13
LOGICAL_NAMED_GRAPHS = 14
LOGICAL_TIMESTAMPED_NAMED_GRAPHS = 114

#: logical types whose base (``value % 10``) pairs with physical TRIPLES
#: (/root/reference/pyjelly/options.py:119-123)
TRIPLES_COMPATIBLE_LOGICAL = {
    LOGICAL_FLAT_TRIPLES,
    LOGICAL_GRAPHS,
    LOGICAL_SUBJECT_GRAPHS,
}

# --- protocol limits / defaults ---------------------------------------------
MIN_NAME_TABLE = 8          # options.py:17
MAX_TABLE = 4096            # options.py:19
DEFAULT_NAMES = 4000        # options.py:23
DEFAULT_PREFIXES = 150      # options.py:24
DEFAULT_DATATYPES = 32      # options.py:25
DEFAULT_FRAME_ROWS = 250    # serialize/flows.py:11
PROTO_VERSION = 1
PROTO_VERSION_WITH_NAMESPACES = 2  # options.py:21, 110-116

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"  # options.py:27

# --- RdfStreamRow oneof field numbers ----------------------------------------
ROW_OPTIONS = 1
ROW_TRIPLE = 2
ROW_QUAD = 3
ROW_GRAPH_START = 4
ROW_GRAPH_END = 5
ROW_NAMESPACE = 6
ROW_NAME_ENTRY = 9
ROW_PREFIX_ENTRY = 10
ROW_DATATYPE_ENTRY = 11

# --- statement slot base field numbers ---------------------------------------
# Within RdfTriple/RdfQuad each slot is a 4-field oneof laid out as
# base+0 = *_iri, +1 = *_bnode, +2 = *_literal, +3 = *_triple_term.
SLOT_SUBJECT_BASE = 1
SLOT_PREDICATE_BASE = 5
SLOT_OBJECT_BASE = 9
# RdfQuad graph oneof: 13=g_iri 14=g_bnode 15=g_default_graph 16=g_literal
QUAD_G_IRI = 13
QUAD_G_BNODE = 14
QUAD_G_DEFAULT = 15
QUAD_G_LITERAL = 16
# RdfGraphStart graph oneof: 1=g_iri 2=g_bnode 3=g_default_graph 4=g_literal
START_G_IRI = 1
START_G_BNODE = 2
START_G_DEFAULT = 3
START_G_LITERAL = 4

# --- RdfStreamOptions fields --------------------------------------------------
OPT_STREAM_NAME = 1
OPT_PHYSICAL_TYPE = 2
OPT_GENERALIZED = 3
OPT_RDF_STAR = 4
OPT_MAX_NAMES = 9
OPT_MAX_PREFIXES = 10
OPT_MAX_DATATYPES = 11
OPT_LOGICAL_TYPE = 14
OPT_VERSION = 15

# --- RdfStreamFrame fields ----------------------------------------------------
FRAME_ROWS = 1
FRAME_METADATA = 15


class JellyError(Exception):
    """Any Jelly protocol violation detected by this engine."""


#: logical types that are FLAT (one statement stream, bounded framing)
LOGICAL_FLAT = frozenset({LOGICAL_FLAT_TRIPLES, LOGICAL_FLAT_QUADS})

_LOGICAL_NAMES = {
    LOGICAL_UNSPECIFIED: "UNSPECIFIED",
    LOGICAL_FLAT_TRIPLES: "FLAT_TRIPLES",
    LOGICAL_FLAT_QUADS: "FLAT_QUADS",
    LOGICAL_GRAPHS: "GRAPHS",
    LOGICAL_DATASETS: "DATASETS",
    LOGICAL_SUBJECT_GRAPHS: "SUBJECT_GRAPHS",
    LOGICAL_NAMED_GRAPHS: "NAMED_GRAPHS",
    LOGICAL_TIMESTAMPED_NAMED_GRAPHS: "TIMESTAMPED_NAMED_GRAPHS",
}


def logical_type_name(logical_type: int) -> str:
    return _LOGICAL_NAMES.get(logical_type, str(logical_type))


def check_logical_type_strict(options, expect: str) -> None:
    """The reference's ``logical_type_strict`` gate
    (/root/reference/pyjelly/integrations/generic/parse.py:234-263,
    357-395): a grouped parse must see a GROUPED logical type and a
    flat parse a FLAT one — base-physical compatibility alone is not
    enough when the caller asks for strictness.

    ``expect`` is "flat" or "grouped"; ``options`` may be None (stream
    carried no options row), which strict mode rejects outright.
    """
    if options is None:
        raise JellyError(
            "strict logical type check requires stream options"
        )
    lt = options.logical_type
    if expect == "flat":
        if lt not in LOGICAL_FLAT:
            raise JellyError(
                "expected FLAT logical type (TRIPLES/QUADS), got "
                + logical_type_name(lt)
            )
    elif expect == "grouped":
        if lt == LOGICAL_UNSPECIFIED or lt in LOGICAL_FLAT:
            raise JellyError(
                "expected GROUPED logical type, got " + logical_type_name(lt)
            )
    else:  # pragma: no cover - caller bug
        raise ValueError(f"expect must be 'flat' or 'grouped', not {expect!r}")


@dataclass(frozen=True)
class TablePreset:
    """Lookup table capacities (reference LookupPreset, options.py:52-66)."""

    names: int = DEFAULT_NAMES
    prefixes: int = DEFAULT_PREFIXES
    datatypes: int = DEFAULT_DATATYPES

    def __post_init__(self) -> None:
        if self.names < MIN_NAME_TABLE:
            raise JellyError("name lookup size must be at least 8")
        for size in (self.names, self.prefixes, self.datatypes):
            if size > MAX_TABLE:
                raise JellyError(f"lookup size cannot exceed {MAX_TABLE}")

    @classmethod
    def small(cls) -> "TablePreset":
        return cls(names=128, prefixes=32, datatypes=32)


@dataclass(frozen=True)
class StreamOptions:
    """Everything that lands in the RdfStreamOptions row."""

    physical_type: int = PHYSICAL_TRIPLES
    logical_type: int = LOGICAL_FLAT_TRIPLES
    preset: TablePreset = TablePreset()
    stream_name: str = ""
    generalized: bool = False
    rdf_star: bool = False
    namespace_declarations: bool = False
    delimited: bool = True
    frame_rows: int = DEFAULT_FRAME_ROWS

    @property
    def version(self) -> int:
        return (
            PROTO_VERSION_WITH_NAMESPACES
            if self.namespace_declarations
            else PROTO_VERSION
        )

    def __post_init__(self) -> None:
        phys, logi = self.physical_type, self.logical_type
        if phys and logi:
            phys_is_triples = phys == PHYSICAL_TRIPLES
            logi_is_triples = logi in TRIPLES_COMPATIBLE_LOGICAL
            if phys_is_triples != logi_is_triples:
                raise JellyError(
                    f"physical type {phys} incompatible with logical {logi}"
                )
