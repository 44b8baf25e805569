"""A SPARQL front-end for the distributed BGP matcher.

Parses a practical SPARQL subset and compiles it onto
``operators/bgp.py::bgp_match`` (which in turn compiles to Catalyst
joins over the flat (s, p, o) triples relation):

- ``PREFIX ns: <iri>`` declarations, expanded in patterns
- ``SELECT [DISTINCT] ?a ?b | * | (COUNT|SUM|MIN|MAX|AVG([DISTINCT]
  ?v|*) AS ?alias)`` aggregate projections
- ``WHERE { ... }`` with triple patterns (``.``-separated; ``;``
  predicate lists supported), ``OPTIONAL { ... }`` groups (one level),
  ``{ A } UNION { B }`` alternation (top level of WHERE), and
  ``FILTER (expr)`` — comparisons, ``&&``/``||``/``!``, ``BOUND(?v)``,
  ``REGEX(?v, "pat")``
- trailing ``GROUP BY ?v ...``, ``ORDER BY [ASC|DESC](?v) ...`` and
  ``LIMIT n``

Terms: ``<iri>``, ``ns:local``, ``"literal"``, ``?var``. The engine's
term model is flat value strings (pyjelly_spark stores decoded term
values), so literals match by their lexical value.

Reference parity: pyjelly users query parsed graphs with rdflib's
SPARQL engine on the driver (``/root/reference/pyjelly/integrations/
rdflib/parse.py:61`` materializes into ``rdflib.Graph``); this runs the
same query shape distributed, where the graph lives.  Unsupported
SPARQL (subqueries, BIND/VALUES, property paths — use
``components.bfs_reachable`` for those) raises ``SparqlUnsupported``
loudly rather than mis-executing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pyjelly_spark.operators.bgp import bgp_match


class SparqlError(ValueError):
    """Malformed query text."""


class SparqlUnsupported(SparqlError):
    """Recognized SPARQL feature outside the supported subset."""


_UNSUPPORTED = re.compile(
    r"\b(GRAPH|SERVICE|MINUS|EXISTS|CONSTRUCT|ASK|DESCRIBE|BIND"
    r"|VALUES|HAVING)\b",
    re.IGNORECASE,
)

_AGG_FUNCS = {"COUNT", "SUM", "MIN", "MAX", "AVG"}

_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<iri><[^<>\s]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<var>\?\w+)
    | (?P<pname>\w*:[\w.\-]*)
    | (?P<word>[A-Za-z_]\w*)
    | (?P<num>\d+)
    | (?P<punct>[{}().;,])
    )
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    # strip comments (# to end of line, outside quotes — queries in this
    # subset don't put # in literals' tails often; keep it simple and
    # only strip lines starting with #)
    lines = [ln for ln in text.split("\n") if not ln.lstrip().startswith("#")]
    text = "\n".join(lines)
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            # FILTTER expressions contain operators; capture them raw
            op = re.match(r"(&&|\|\||!=|<=|>=|[=<>!*/+\-])", text[pos:])
            if op:
                tokens.append(("op", op.group(1)))
                pos += op.end()
                continue
            raise SparqlError(f"cannot tokenize at: {text[pos:pos + 20]!r}")
        kind = m.lastgroup or "?"
        tokens.append((kind, m.group(kind)))
        pos = m.end()
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]) -> None:
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        self.i += 1
        return tok

    def expect_word(self, word: str) -> None:
        kind, val = self.next()
        if val.upper() != word.upper():
            raise SparqlError(f"expected {word!r}, got {val!r}")

    def expect_punct(self, ch: str) -> None:
        kind, val = self.next()
        if val != ch:
            raise SparqlError(f"expected {ch!r}, got {val!r}")

    # -- terms ---------------------------------------------------------

    def term(self) -> str:
        kind, val = self.next()
        if kind == "iri":
            return val[1:-1]
        if kind == "literal":
            return re.sub(r"\\(.)", r"\1", val[1:-1])
        if kind == "var":
            return val
        if kind == "pname":
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise SparqlError(f"unknown prefix {ns!r}")
            return self.prefixes[ns] + local
        if kind == "word" and val == "a":  # rdf:type shorthand
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        raise SparqlError(f"expected term, got {val!r}")

    # -- FILTER expression -> Spark SQL --------------------------------

    def filter_expr(self) -> str:
        self.expect_punct("(")
        depth, parts = 1, []
        while depth:
            kind, val = self.next()
            if kind == "eof":
                raise SparqlError("unterminated FILTER")
            if val == "(":
                depth += 1
            elif val == ")":
                depth -= 1
                if not depth:
                    break
            if kind == "var":
                parts.append(val[1:])
            elif kind == "op":
                parts.append(
                    {"&&": "AND", "||": "OR", "!": "NOT", "=": "="}.get(
                        val, val
                    )
                )
            elif kind == "literal":
                parts.append("'" + val[1:-1].replace("'", "''") + "'")
            elif kind == "iri":
                parts.append("'" + val[1:-1] + "'")
            elif kind == "word" and val.upper() == "BOUND":
                # BOUND(?v) -> v IS NOT NULL ; consume ( ?v )
                self.expect_punct("(")
                _, v = self.next()
                self.expect_punct(")")
                parts.append(f"{v[1:]} IS NOT NULL")
            elif kind == "word" and val.upper() == "REGEX":
                self.expect_punct("(")
                _, v = self.next()
                self.expect_punct(",")
                _, pat = self.next()
                self.expect_punct(")")
                parts.append(
                    f"{v[1:]} RLIKE '"
                    + pat[1:-1].replace("'", "''")
                    + "'"
                )
            else:
                parts.append(val)
        return " ".join(parts)

    # -- pattern groups ------------------------------------------------

    def group(self) -> list[tuple[list, list, list]]:
        """Parse { ... }: returns a list of UNION branches, each
        (patterns, optionals, filters). A group without UNION is a
        single branch; ``{ {A} UNION {B} }`` returns both. Mixing
        top-level patterns with UNION branches in one group is outside
        the subset."""
        self.expect_punct("{")
        if self.peek()[1] == "{":  # alternation: { {A} UNION {B} ... }
            branches = list(self._single_group_inner())
            while self.peek()[1].upper() == "UNION":
                self.next()
                branches.extend(self._single_group_inner())
            kind, val = self.next()
            if val != "}":
                raise SparqlUnsupported(
                    "UNION branches cannot mix with top-level patterns"
                )
            return branches
        return [self._group_body()]

    def _single_group_inner(self) -> list[tuple[list, list, list]]:
        sub = self.group()
        if len(sub) != 1:
            raise SparqlUnsupported("nested UNION")
        return sub

    def _group_body(self) -> tuple[list, list, list]:
        """Body of a brace group (opening '{' already consumed by
        group()); consumes through the closing '}'."""
        patterns: list = []
        optionals: list = []
        filters: list = []
        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                break
            if kind == "word" and val.upper() == "OPTIONAL":
                self.next()
                sub = self.group()
                if len(sub) != 1:
                    raise SparqlUnsupported("UNION inside OPTIONAL")
                sub_p, sub_o, sub_f = sub[0]
                if sub_o or sub_f:
                    raise SparqlUnsupported(
                        "nested OPTIONAL/FILTER inside OPTIONAL"
                    )
                optionals.extend(sub_p)
                continue
            if kind == "word" and val.upper() == "FILTER":
                self.next()
                filters.append(self.filter_expr())
                continue
            s = self.term()
            while True:
                p = self.term()
                o = self.term()
                patterns.append((s, p, o))
                kind, val = self.peek()
                if val == ";":  # predicate list: same subject
                    self.next()
                    continue
                break
            if self.peek()[1] == ".":
                self.next()
        return patterns, optionals, filters


def parse_sparql(query: str) -> dict:
    """Parse to a plan dict (patterns/optionals/filters/projection/
    distinct/order/limit). Split out for testability."""
    bad = _UNSUPPORTED.search(query)
    if bad:
        raise SparqlUnsupported(f"{bad.group(0)} is not supported")
    p = _Parser(_tokenize(query))
    while p.peek()[1].upper() == "PREFIX":
        p.next()
        _, pname = p.next()
        ns = pname[:-1] if pname.endswith(":") else pname.partition(":")[0]
        kind, iri = p.next()
        if kind != "iri":
            raise SparqlError("PREFIX needs an <iri>")
        p.prefixes[ns] = iri[1:-1]
    p.expect_word("SELECT")
    distinct = False
    if p.peek()[1].upper() == "DISTINCT":
        p.next()
        distinct = True
    projection: list[str] | None = []
    aggregates: list[dict] = []
    while True:
        kind, val = p.peek()
        if kind == "var":
            projection.append(val[1:])
            p.next()
        elif val == "*":
            projection = None
            p.next()
            break
        elif val == "(":
            # ( AGG([DISTINCT] ?v | *) AS ?alias )
            p.next()
            _, fn = p.next()
            if fn.upper() not in _AGG_FUNCS:
                raise SparqlUnsupported(f"projection function {fn!r}")
            p.expect_punct("(")
            agg_distinct = False
            if p.peek()[1].upper() == "DISTINCT":
                p.next()
                agg_distinct = True
            kind, arg = p.next()
            if kind == "var":
                arg = arg[1:]
            elif arg == "*" and fn.upper() == "COUNT":
                arg = None
            else:
                raise SparqlError(f"bad aggregate argument {arg!r}")
            p.expect_punct(")")
            p.expect_word("AS")
            kind, alias = p.next()
            if kind != "var":
                raise SparqlError("aggregate alias must be a ?var")
            p.expect_punct(")")
            aggregates.append(
                {
                    "fn": fn.upper(),
                    "var": arg,
                    "distinct": agg_distinct,
                    "alias": alias[1:],
                }
            )
        else:
            break
    if projection == [] and not aggregates:
        raise SparqlError("SELECT needs variables, aggregates, or *")
    p.expect_word("WHERE")
    branches = p.group()
    order: list[tuple[str, bool]] = []
    group_by: list[str] = []
    limit: int | None = None
    while p.peek()[0] != "eof":
        kind, val = p.next()
        up = val.upper()
        if up == "GROUP":
            p.expect_word("BY")
            while p.peek()[0] == "var":
                group_by.append(p.next()[1][1:])
            if not group_by:
                raise SparqlError("GROUP BY needs variables")
        elif up == "ORDER":
            p.expect_word("BY")
            while True:
                kind, val = p.peek()
                asc = True
                if val.upper() in ("ASC", "DESC"):
                    asc = val.upper() == "ASC"
                    p.next()
                    p.expect_punct("(")
                    _, v = p.next()
                    p.expect_punct(")")
                    order.append((v[1:], asc))
                elif kind == "var":
                    p.next()
                    order.append((val[1:], True))
                else:
                    break
        elif up == "LIMIT":
            _, n = p.next()
            limit = int(n)
        else:
            raise SparqlError(f"unexpected trailing token {val!r}")
    if aggregates:
        bad = [
            v for v in (projection or []) if v not in group_by
        ]
        if bad:
            raise SparqlError(
                f"non-aggregate projection {bad} not in GROUP BY"
            )
    elif group_by:
        raise SparqlError("GROUP BY without aggregates in SELECT")
    return {
        "branches": branches,
        "projection": projection,
        "aggregates": aggregates,
        "group_by": group_by,
        "distinct": distinct,
        "order": order,
        "limit": limit,
    }


def sparql_query(triples: DataFrame, query: str) -> DataFrame:
    """Run a SPARQL query (supported subset above) against a triples
    DataFrame with string columns ``s``, ``p``, ``o``. Returns one
    column per projected variable."""
    from pyspark.sql import functions as F

    plan = parse_sparql(query)
    frames = [
        bgp_match(triples, pats, optional=opts, filters=filts)
        for pats, opts, filts in plan["branches"]
    ]
    # UNION semantics: solutions from any branch; variables a branch
    # does not bind are NULL in its rows.
    all_vars: list[str] = []
    for f in frames:
        for c in f.columns:
            if c not in all_vars:
                all_vars.append(c)
    sols = None
    for f in frames:
        aligned = f.select(
            *[
                F.col(c) if c in f.columns else F.lit(None).cast("string").alias(c)
                for c in all_vars
            ]
        )
        sols = aligned if sols is None else sols.unionByName(aligned)
    if plan["aggregates"]:
        aggs = []
        for a in plan["aggregates"]:
            v, fn = a["var"], a["fn"]
            if fn == "COUNT" and v is None:
                col = F.count(F.lit(1))
            elif fn == "COUNT" and a["distinct"]:
                col = F.countDistinct(v)
            elif fn == "COUNT":
                col = F.count(v)
            else:
                src = F.col(v).cast("double") if fn in ("SUM", "AVG") else F.col(v)
                src = (
                    F.expr(f"{fn}(DISTINCT {v})") if a["distinct"]
                    else getattr(F, fn.lower())(src)
                )
                col = src
            aggs.append(col.alias(a["alias"]))
        keys = plan["group_by"] or []
        sols = sols.groupBy(*keys).agg(*aggs) if keys else sols.agg(*aggs)
        if plan["projection"]:
            sols = sols.select(
                *plan["projection"], *[a["alias"] for a in plan["aggregates"]]
            )
    elif plan["projection"] is not None:
        missing = [v for v in plan["projection"] if v not in sols.columns]
        if missing:
            raise SparqlError(f"projected variables not bound: {missing}")
        sols = sols.select(*plan["projection"])
    if plan["distinct"]:
        sols = sols.distinct()
    if plan["order"]:
        sols = sols.orderBy(
            *[
                F.col(v).asc() if asc else F.col(v).desc()
                for v, asc in plan["order"]
            ]
        )
    if plan["limit"] is not None:
        sols = sols.limit(plan["limit"])
    return sols
