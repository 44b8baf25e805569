"""Basic-graph-pattern (BGP) matching over a flat (s, p, o) triples frame.

SPARQL-style conjunctive queries compiled straight to Catalyst plans:
each triple pattern becomes a filtered scan of the shared triples
relation (constant slots push down as equality predicates — on a
parquet/Iceberg-backed graph they reach the scan as ``PushedFilters``),
patterns equi-join on their shared variables, and the join order is
chosen greedily by bound-constant selectivity so the most selective
pattern anchors the plan.

Reference parity: pyjelly itself stops at (de)serialization — querying
the parsed graph is delegated to rdflib's SPARQL evaluation over the
materialized ``Graph`` (``/root/reference/pyjelly/integrations/rdflib/
parse.py:61`` hands triples to ``rdflib.Graph``).  Here the same
capability is a distributed DataFrame program over the triples table the
pipeline emits, so graph queries run where the graph lives instead of on
a single driver-materialized rdflib store.

Scale notes (100 TB graph):

- A pattern with >= ``broadcast_constants`` constant slots matches a
  sliver of the graph (e.g. one predicate + one object out of 10^12
  triples); its scan result is broadcast so joining it adds **no
  shuffle** to the big side.
- Patterns joining on shared variables hash-partition both sides on the
  variable columns — plain Spark equi-joins, so AQE is free to re-plan
  skewed hubs (hot symbols/predicates) at runtime.
- Matching is *bag* semantics, like SPARQL BGP evaluation; callers
  layer ``distinct=True`` (solution-set semantics) or aggregates on top.
"""

from __future__ import annotations

from collections.abc import Sequence
from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

# Ambient statistics scope: lets front-ends (the SPARQL evaluator) turn
# on selectivity-first ordering for every bgp_match in their dynamic
# extent without threading a parameter through the recursive evaluator —
# the same ContextVar side-channel shape the reference uses for frame
# metadata (/root/reference/pyjelly/integrations/generic/parse.py:186).
_STATS_CTX: ContextVar[dict | None] = ContextVar("bgp_stats", default=None)


@contextmanager
def bgp_stats(stats: DataFrame | dict | None):
    """Scope per-predicate statistics over every ``bgp_match`` call in
    the block. Accepts the ``void_stats`` DataFrame (collected once,
    driver-side — one row per predicate) or a ``{p: (n_triples,
    n_subjects, n_objects)}`` mapping; ``None`` is a no-op."""
    if isinstance(stats, DataFrame):
        stats = {
            r["p"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
            for r in stats.collect()
        }
    token = _STATS_CTX.set(stats)
    try:
        yield
    finally:
        _STATS_CTX.reset(token)

_SLOTS = ("s", "p", "o", "g")


def is_var(term) -> bool:
    """A pattern term is a variable iff it starts with ``?``. A tuple
    term (predicate alternation, matched with IN) is never a variable."""
    return isinstance(term, str) and term.startswith("?")


class QuotedPattern:
    """RDF-star quoted-triple pattern ``<< s p o >>`` in a subject or
    object slot. Matches term values stored in the flat-column
    convention (sources/jelly_io.py: kind ``qt`` carries the quoted
    triple as its N-Triples serialization ``<< <s> <p> <o> >>``),
    binding inner variables to DECODED term values (IRI brackets /
    bnode prefix / literal quotes stripped), so inner bindings join
    ordinary patterns on equal footing.

    Supported inner shape (the practical RDF-star annotation form):
    inner subject and predicate are space-free terms (IRI/bnode —
    nesting in those slots is not supported), inner object is the
    serialized remainder (literal, IRI, or a nested quoted triple
    matched opaquely). Literal escapes are not unescaped.
    """

    __slots__ = ("s", "p", "o")

    def __init__(self, s: str, p: str, o: str) -> None:
        self.s, self.p, self.o = s, p, o

    @property
    def variables(self) -> set[str]:
        return {t[1:] for t in (self.s, self.p, self.o) if is_var(t)}


#: inner-term split of a non-nested-subject quoted triple: two
#: space-free terms, then the remainder
_QT_RE = r"^<< (\S+) (\S+) (.+) >>$"


def _decode_nt_piece(c):
    """Serialized N-Triples term -> the engine's flat value string."""
    return (
        F.when(c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1))
        .when(c.startswith("_:"), F.substring(c, 3, 1 << 30))
        .when(
            c.startswith('"'),
            F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1),
        )
        .otherwise(c)
    )


class _Scan:
    """One compiled triple pattern: projected scan + its variable set."""

    __slots__ = ("df", "variables", "n_constants", "index")

    def __init__(
        self, df: DataFrame, variables: set[str], n_constants: int, index: int
    ) -> None:
        self.df = df
        self.variables = variables
        self.n_constants = n_constants
        self.index = index


def _compile_pattern(triples: DataFrame, pattern: Pattern, index: int) -> _Scan:
    if len(pattern) not in (3, 4):
        raise ValueError(
            f"pattern {index} must be a (s, p, o) or (s, p, o, g) tuple"
        )
    var_slots: dict[str, str] = {}
    df = triples
    n_constants = 0
    # RDF-star: expand a QuotedPattern slot into the structural filter
    # plus three derived pseudo-slot columns (decoded inner terms), then
    # let the ordinary slot loop below handle constants/variables/
    # repeated-variable equality uniformly.
    slot_terms: list[tuple[str, object]] = []
    for slot, term in zip(_SLOTS[: len(pattern)], pattern):
        if isinstance(term, QuotedPattern):
            if slot not in ("s", "o"):
                raise ValueError(
                    f"pattern {index}: quoted-triple pattern only in the "
                    "subject or object slot"
                )
            # rlike doubles as the structural filter AND the
            # extractability guard (a nested quoted triple in the inner
            # SUBJECT slot fails \S+ and is correctly not matched,
            # instead of binding empty strings)
            df = df.filter(F.col(slot).rlike(_QT_RE))
            n_constants += 1  # the structural filter is selective
            for grp, inner in enumerate((term.s, term.p, term.o), start=1):
                pseudo = f"__qt{index}_{slot}{grp}"
                df = df.withColumn(
                    pseudo,
                    _decode_nt_piece(
                        F.regexp_extract(F.col(slot), _QT_RE, grp)
                    ),
                )
                slot_terms.append((pseudo, inner))
        else:
            slot_terms.append((slot, term))
    for slot, term in slot_terms:
        if is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"pattern {index}: bare '?' is not a variable")
            if slot == "g":
                # SPARQL: a graph variable ranges over NAMED graphs only;
                # the default graph (NULL) never binds a variable.
                df = df.filter(F.col(slot).isNotNull())
            if name in var_slots:
                # Same variable twice in one pattern => intra-pattern
                # equality (e.g. (?x, p, ?x) matches self-loops).
                df = df.filter(F.col(slot) == F.col(var_slots[name]))
            else:
                var_slots[name] = slot
        elif term is None:
            # default-graph marker (quads): the slot must be NULL
            df = df.filter(F.col(slot).isNull())
            n_constants += 1
        elif isinstance(term, frozenset):
            # negated property set (SPARQL !:p / !(:p|:q)): everything
            # except the set. Weakly selective, so it does NOT count as
            # a constant for join ordering / broadcast choice.
            df = df.filter(~F.col(slot).isin(*sorted(term)))
        elif isinstance(term, tuple):
            # alternation (SPARQL path p1|p2): membership pushes down to
            # the scan exactly like an equality constant
            df = df.filter(F.col(slot).isin(*term))
            n_constants += 1
        else:
            df = df.filter(F.col(slot) == F.lit(term))
            n_constants += 1
    if not var_slots:
        # Fully-ground pattern: an existence test. Keep a marker column so
        # the join below degenerates to a semi-join-style cross with 0/1
        # rows (LIMIT 1 — one matching triple proves existence).
        df = df.limit(1).select(F.lit(1).alias(f"__ground_{index}"))
        return _Scan(df, set(), n_constants, index)
    projected = df.select(
        *[F.col(slot).alias(name) for name, slot in var_slots.items()]
    )
    return _Scan(projected, set(var_slots), n_constants, index)


def estimate_cardinality(pattern: Pattern, stats: dict) -> int:
    """Estimated result rows for one triple pattern from VoID-style
    per-predicate statistics (``{p: (n_triples, n_subjects,
    n_objects)}`` — exactly the ``void_stats`` output). The classic
    RDF-engine model: a constant predicate selects its partition's
    triple count; a constant subject/object divides by the partition's
    distinct-subject/object count (uniformity assumption). Non-string
    slot terms (quoted patterns, alternations, negated sets) and
    unknown predicates estimate conservatively (no division).
    """
    s, p, o = pattern[0], pattern[1], pattern[2]
    ns = no = None
    if isinstance(p, str) and not is_var(p):
        if p in stats:
            nt, ns, no = stats[p]
        else:
            nt = 0  # predicate absent from the graph: empty scan
    else:
        nt = sum(v[0] for v in stats.values())
    est = int(nt)
    if isinstance(s, str) and not is_var(s) and ns:
        est //= max(1, int(ns))
    if isinstance(o, str) and not is_var(o) and no:
        est //= max(1, int(no))
    return max(est, 0)


def _join_order(scans: list, ests: dict[int, int] | None) -> list:
    """Join order over compiled pattern scans.

    Without estimates (``ests is None``): the constant-count greedy —
    anchor on the most-constant pattern, then repeatedly take the
    pattern sharing the most bound variables. With per-scan cardinality
    estimates (keyed by scan index): anchor on the cheapest scan, then
    repeatedly take the cheapest *connected* pattern — the textbook
    selectivity-first order that characteristic-set/VoID statistics
    exist to drive. Disconnected patterns are deferred (cross joins
    last) in both modes.
    """
    remaining = list(scans)
    if ests is None:
        remaining.sort(key=lambda sc: (-sc.n_constants, sc.index))
        order = [remaining.pop(0)]
        bound = set(order[0].variables)
        while remaining:
            best = max(
                range(len(remaining)),
                key=lambda k: (
                    len(remaining[k].variables & bound),
                    remaining[k].n_constants,
                    -remaining[k].index,
                ),
            )
            nxt = remaining.pop(best)
            order.append(nxt)
            bound |= nxt.variables
        return order
    remaining.sort(key=lambda sc: (ests[sc.index], -sc.n_constants, sc.index))
    order = [remaining.pop(0)]
    bound = set(order[0].variables)
    while remaining:
        best = min(
            range(len(remaining)),
            key=lambda k: (
                0 if remaining[k].variables & bound else 1,
                ests[remaining[k].index],
                -remaining[k].n_constants,
                remaining[k].index,
            ),
        )
        nxt = remaining.pop(best)
        order.append(nxt)
        bound |= nxt.variables
    return order


def bgp_match(
    triples: DataFrame | Sequence[DataFrame],
    patterns: Sequence[Pattern],
    *,
    optional: Sequence[Pattern] = (),
    filters: Sequence[str] = (),
    distinct: bool = False,
    broadcast_constants: int = 2,
    stats: DataFrame | dict | None = None,
) -> DataFrame:
    """Match a conjunction of triple patterns against ``triples``.

    ``triples`` is one (s, p, o) DataFrame shared by every pattern, or a
    sequence of ``len(patterns) + len(optional)`` DataFrames giving each
    pattern its own scan — how the predicate-partitioned store
    (sources/kg_store.py) feeds partition-pruned scans into the same
    join planner.  Each graph must expose string columns ``s``, ``p``,
    ``o``.  Each
    pattern term is either a constant or a ``?name`` variable; the result
    has one column per distinct variable and one row per solution
    mapping (bag semantics; ``distinct=True`` for set semantics).

    ``optional`` patterns extend solutions where they match and leave
    their exclusive variables NULL where they don't — SPARQL OPTIONAL as
    a left outer join, applied after the required patterns.  ``filters``
    are SQL boolean expressions over the variable columns (SPARQL
    FILTER); they participate in the single Catalyst plan, so filters on
    required variables push down into the joins for free.

    Patterns with at least ``broadcast_constants`` constant slots are
    broadcast into their join (selective scans — shuffle-free on the big
    side); pass ``broadcast_constants=4`` to disable broadcasting.

    ``stats`` switches join ordering from the constant-count heuristic
    to selectivity-first: pass the ``void_stats`` DataFrame (collected
    driver-side — one row per predicate, bounded by the schema) or a
    ``{p: (n_triples, n_subjects, n_objects)}`` mapping. Result bags are
    identical either way; only the join tree changes.
    """
    if not patterns:
        raise ValueError("bgp_match requires at least one pattern")
    if isinstance(triples, DataFrame):
        graphs = [triples] * (len(patterns) + len(optional))
    else:
        graphs = list(triples)
        if len(graphs) != len(patterns) + len(optional):
            raise ValueError(
                f"per-pattern graphs: got {len(graphs)} DataFrames for "
                f"{len(patterns)} + {len(optional)} patterns"
            )
    scans = [
        _compile_pattern(g, p, i)
        for i, (g, p) in enumerate(zip(graphs, patterns))
    ]

    ests: dict[int, int] | None = None
    if stats is None:
        stats = _STATS_CTX.get()
    if stats is not None:
        if isinstance(stats, DataFrame):
            stats = {
                r["p"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
                for r in stats.collect()
            }
        ests = {
            i: estimate_cardinality(p, stats) for i, p in enumerate(patterns)
        }

    ordered = _join_order(scans, ests)

    def _maybe_broadcast(sc: _Scan) -> DataFrame:
        if sc.n_constants >= broadcast_constants:
            return F.broadcast(sc.df)
        return sc.df

    first = ordered[0]
    acc, bound = _maybe_broadcast(first), set(first.variables)
    for nxt in ordered[1:]:
        shared = sorted(nxt.variables & bound)
        right = _maybe_broadcast(nxt)
        if shared:
            acc = acc.join(right, on=shared, how="inner")
        else:
            acc = acc.crossJoin(right)
        bound |= nxt.variables
    # OPTIONAL patterns: left outer joins on the variables they share
    # with the required part. A well-designed optional (SPARQL's common
    # case) shares >= 1 variable; one sharing none would cross every
    # solution with the pattern's matches, so reject it loudly.
    for i, pat in enumerate(optional):
        sc = _compile_pattern(graphs[len(patterns) + i], pat, len(patterns) + i)
        shared = sorted(sc.variables & bound)
        if not shared:
            raise ValueError(
                f"optional pattern {i} shares no variable with the "
                "required patterns"
            )
        acc = acc.join(_maybe_broadcast(sc), on=shared, how="left")
        bound |= sc.variables
    for expr in filters:
        acc = acc.filter(F.expr(expr))
    # Drop ground-pattern marker columns from the solution.
    markers = [c for c in acc.columns if c.startswith("__ground_")]
    if markers:
        acc = acc.drop(*markers)
    return acc.distinct() if distinct else acc


def subject_charsets(triples: DataFrame) -> DataFrame:
    """Per-subject characteristic-set signature: (s, charset, nt) where
    charset is the sorted distinct predicate list and nt the subject's
    triple count — one subject-keyed exchange, shared by the histogram
    (``characteristic_sets``) and the quotient graph
    (``summarize_graph``)."""
    return triples.groupBy("s").agg(
        F.array_join(F.array_sort(F.collect_set("p")), ",").alias("charset"),
        F.count(F.lit(1)).alias("nt"),
    )


def summarize_graph(triples: DataFrame) -> DataFrame:
    """SchemEX-style graph summary: the quotient graph over
    characteristic-set classes. Every subject maps to its charset
    class; each triple becomes an edge (src_class, p, dst_class) where
    dst_class is the object's class, or the leaf marker ``<lit>`` for
    objects that are not subjects. Output: one row per summary edge
    with its multiplicity — the compile-time schema graph engines use
    for source selection and query pruning.

    Scale shape: the class map keys on subject, so the src join
    co-partitions with the map's own exchange; the dst side is a left
    join on the same map (object-keyed exchange). Two joins + one
    count aggregation, all equi-keyed — no driver state; the summary
    itself is schema-bounded (|classes|^2 * |preds| worst case).
    """
    classes = subject_charsets(triples).select("s", "charset")
    src = triples.join(
        classes.withColumnRenamed("charset", "src_class"), "s"
    )
    dst_map = classes.select(
        F.col("s").alias("o"), F.col("charset").alias("dst_class")
    )
    edges = src.join(dst_map, "o", "left").select(
        "src_class",
        "p",
        F.coalesce("dst_class", F.lit("<lit>")).alias("dst_class"),
    )
    return (
        edges.groupBy("src_class", "p", "dst_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy("src_class", "p", "dst_class")
    )


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Characteristic sets over an (s, p, o) relation — the per-subject
    predicate-set statistics RDF engines keep for BGP cardinality
    estimation (Neumann & Moerkotte, "Characteristic Sets: Accurate
    Cardinality Estimation for RDF Queries with Multiple Joins",
    ICDE 2011). Each subject's signature is its sorted distinct
    predicate list; the output is one row per signature with the
    subject count and total triple count.

    Scale shape: ONE exchange on subject produces both the signature
    (sort_array over collect_set) and the per-subject triple count;
    the follow-up groupBy keys on signatures, whose cardinality is
    bounded by the schema (2^|predicates| worst case, tiny in
    practice), so the second shuffle is negligible at any data size.
    """
    per_subj = subject_charsets(triples)
    return (
        per_subj.groupBy("charset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subjects"),
            F.sum("nt").cast("long").alias("n_triples"),
        )
        .orderBy("charset")
    )


def void_stats(triples: DataFrame) -> DataFrame:
    """W3C VoID property-partition statistics over an (s, p, o)
    relation: per predicate, the triple count and distinct subject /
    object counts (void:triples, void:distinctSubjects,
    void:distinctObjects). One aggregation keyed by predicate; the
    two count-distincts share the expand-based plan Catalyst builds
    for multi-distinct aggregates — no joins, no driver collection.
    """
    return (
        triples.groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_triples"),
            F.countDistinct("s").cast("long").alias("n_subjects"),
            F.countDistinct("o").cast("long").alias("n_objects"),
        )
        .orderBy("p")
    )
