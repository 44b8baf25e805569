"""A SPARQL front-end for the distributed BGP matcher.

Parses a practical SPARQL subset and compiles it onto
``operators/bgp.py::bgp_match`` (which in turn compiles to Catalyst
joins over the flat (s, p, o) triples relation):

- ``PREFIX ns: <iri>`` declarations, expanded in patterns
- ``SELECT [DISTINCT] ?a ?b | * | (COUNT|SUM|MIN|MAX|AVG([DISTINCT]
  ?v|*) AS ?alias)`` aggregate projections; ``ASK`` (one boolean row);
  ``CONSTRUCT { template } WHERE { ... }`` (returns a deduplicated
  (s, p, o) triples DataFrame — the KG-construction form);
  ``DESCRIBE ?v <iri> [WHERE { ... }]`` (subject-CBD over the default
  graph)
- ``GRAPH ?g { ... }`` / ``GRAPH <iri> { ... }`` over a quads frame
  (string columns s, p, o + nullable g; NULL g = default graph) —
  patterns outside GRAPH match the default graph only, and a graph
  variable ranges over named graphs, per the SPARQL dataset model
- ``WHERE { ... }`` with triple patterns (``.``-separated; ``;``
  predicate lists supported), property paths in the predicate position
  (``^p`` inverse, ``p1/p2`` sequence, ``p1|p2`` alternation, ``!p`` /
  ``!(p1|p2)`` negated property sets (NOT-IN pushed to the scan),
  ``p+`` / ``p*`` transitive closure — closures run as distributed
  semi-naive reachability, see :func:`_closure_pairs`), ``OPTIONAL { ... }``
  groups (one level), ``{ A } UNION { B }`` alternation (top level of
  WHERE), ``MINUS { ... }``, ``BIND(expr AS ?v)``,
  ``VALUES ?v { ... }`` / ``VALUES (?a ?b) { (..) .. }`` (UNDEF
  supported), ``FILTER [NOT] EXISTS { ... }`` (semi/anti join on the
  shared variables), and ``FILTER (expr)`` — comparisons,
  ``&&``/``||``/``!``, ``BOUND(?v)``, ``REGEX(?v, "pat")``, and the
  string/numeric builtins (STRSTARTS/STRENDS/CONTAINS/STRLEN/UCASE/
  LCASE/SUBSTR/REPLACE/ABS/CEIL/FLOOR/ROUND/CONCAT/COALESCE/IF/STR,
  plus STRBEFORE/STRAFTER expanded to CASE-over-instr with SPARQL's
  not-found => '' semantics, and ``IN (...)``) mapped onto Spark SQL;
  the same builtins work inside BIND expressions. Value-space numerics:
  ``xsd:integer/long/int/double/float/decimal/boolean/string(?v)``
  constructor casts translate to ``try_cast`` (a failed cast eliminates
  the row — SPARQL expression-error semantics — instead of aborting
  under ANSI mode), and ``isNumeric(?v)`` tests lexical parseability.
  Term-KIND tests (isIRI/isBlank/isLiteral/LANG/DATATYPE) raise
  ``SparqlUnsupported``: the flat-string model erases the markers they
  need, and guessing would mis-execute silently
- trailing ``GROUP BY ?v ...``, ``HAVING (expr)``,
  ``ORDER BY [ASC|DESC](expr) ...`` (sort keys are variables or any
  BIND-translatable expression, e.g. ``DESC(STRLEN(?x))``), ``LIMIT n``
  and ``OFFSET n``
- SPARQL-star: quoted-triple patterns ``<< s p o >>`` in the subject or
  object slot of a triple pattern match RDF-star annotation terms (the
  flat-column qt convention stores them as their N-Triples
  serialization) and bind inner variables to decoded term values —
  see :class:`pyjelly_spark.operators.bgp.QuotedPattern` for the
  supported inner shape; nested quoted PATTERNS are rejected (nested
  quoted DATA in the inner object matches opaquely). CONSTRUCT-star:
  quoted-triple TEMPLATE terms serialize their bindings back into the
  qt convention (term kind recovered heuristically — IRI-scheme values
  as IRIs, else literals; predicates always IRIs), so constructed
  annotations round-trip through the matcher and the Jelly/NT writers

Terms: ``<iri>``, ``ns:local``, ``"literal"``, ``?var``. The engine's
term model is flat value strings (pyjelly_spark stores decoded term
values), so literals match by their lexical value.

Reference parity: pyjelly users query parsed graphs with rdflib's
SPARQL engine on the driver (``/root/reference/pyjelly/integrations/
rdflib/parse.py:61`` materializes into ``rdflib.Graph``); this runs the
same query shape distributed, where the graph lives.  Unsupported
SPARQL (SERVICE, federation) raises ``SparqlUnsupported`` loudly
rather than mis-executing. Subqueries (``{ SELECT ... }``) evaluate
bottom-up and join the outer group on their projected variables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from pyjelly_spark.operators.bgp import QuotedPattern, bgp_match, is_var


class SparqlError(ValueError):
    """Malformed query text."""


class SparqlUnsupported(SparqlError):
    """Recognized SPARQL feature outside the supported subset."""


_UNSUPPORTED = re.compile(
    r"\b(SERVICE)\b",
    re.IGNORECASE,
)

# SPARQL builtin -> Spark SQL function, applied verbatim to the
# translated argument list (terms are flat strings in this engine, so
# STR is the identity)
_FILTER_FUNCS = {
    "STRSTARTS": "startswith",
    "STRENDS": "endswith",
    "CONTAINS": "contains",
    "STRLEN": "length",
    "UCASE": "upper",
    "LCASE": "lower",
    "SUBSTR": "substring",
    "REPLACE": "replace",
    "ABS": "abs",
    "CEIL": "ceil",
    "FLOOR": "floor",
    "ROUND": "round",
    "CONCAT": "concat",
    "COALESCE": "coalesce",
    "IF": "if",
    "STR": "",
}

_AGG_FUNCS = {
    "COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT",
}

# Builtins over the engine's FLAT term model (variables bind the lexical
# value string — IRIs, bnode labels, and literal lexical forms are all
# plain strings with no serialization markers). Each takes ONE
# var/literal argument and expands to a Spark SQL expression.
_TERM_FUNC_TEMPLATES = {
    # numeric = the lexical form parses as a number. try_cast: Spark 4
    # runs ANSI mode, where a plain cast of 'abc' THROWS instead of
    # yielding NULL.
    "ISNUMERIC": "try_cast({a} as double) IS NOT NULL",
}

# Term-KIND tests need markers the flat model intentionally erases (an
# IRI and a same-spelled literal are indistinguishable once both are
# plain strings) — refuse loudly instead of guessing (same policy as
# SERVICE/federation).
_TERM_KIND_FUNCS = {"ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "LANG", "DATATYPE"}

# xsd constructor casts (FILTER(xsd:integer(?v) > 10)): value-space
# comparison over the flat lexical model — the variable already binds the
# lexical form, so the cast applies directly. try_cast, not cast: SPARQL
# semantics make a failed cast an expression error that eliminates the
# row, which is exactly NULL-propagation; ANSI cast would abort the job.
_XSD_CASTS = {
    "xsd:integer": "try_cast({a} as bigint)",
    "xsd:long": "try_cast({a} as bigint)",
    "xsd:int": "try_cast({a} as bigint)",
    "xsd:double": "try_cast({a} as double)",
    "xsd:float": "try_cast({a} as double)",
    "xsd:decimal": "try_cast({a} as decimal(38, 10))",
    "xsd:boolean": "try_cast({a} as boolean)",
    "xsd:string": "cast({a} as string)",
}

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
            op = re.match(r"(&&|\|\||!=|<=|>=|[=<>!*/+\-^|?])", text[pos:])
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

    def term_or_quoted(self):
        """A term, or an RDF-star quoted-triple pattern ``<< s p o >>``
        (subject/object position in a triple pattern). The tokenizer
        emits ``<<`` / ``>>`` as two ``<`` / ``>`` operator tokens."""
        if (
            self.peek() == ("op", "<")
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == ("op", "<")
        ):
            self.next()
            self.next()
            if (
                self.peek() == ("op", "<")
                and self.toks[self.i + 1] == ("op", "<")
            ):
                raise SparqlUnsupported(
                    "nested quoted-triple patterns"
                )
            s = self.term()
            p = self.term()
            o = self.term()
            for _ in range(2):
                kind, val = self.next()
                if (kind, val) != ("op", ">"):
                    raise SparqlError(
                        f"expected '>>' closing a quoted triple, got {val!r}"
                    )
            return QuotedPattern(s, p, o)
        return self.term()

    def sql_until_close(self) -> str:
        """Translate tokens to Spark SQL through the matching ``)`` (the
        opening ``(`` already consumed) — the BIND-style expression
        translator, shared by ORDER BY expressions."""
        depth, parts = 1, []
        while True:
            k2, v2 = self.next()
            if k2 == "eof":
                raise SparqlError("unterminated expression")
            if v2 == "(":
                depth += 1
                parts.append("(")
            elif v2 == ")":
                depth -= 1
                if depth == 0:
                    break
                parts.append(")")
            elif k2 == "var":
                parts.append(v2[1:])
            elif k2 == "literal":
                parts.append("'" + v2[1:-1].replace("'", "''") + "'")
            elif k2 == "iri":
                parts.append("'" + v2[1:-1] + "'")
            elif k2 == "op":
                parts.append(
                    {"&&": "AND", "||": "OR", "!": "NOT"}.get(v2, v2)
                )
            elif k2 == "word" and v2.upper() in ("STRBEFORE", "STRAFTER"):
                parts.append(self._str_before_after(v2.upper()))
            elif k2 == "word" and v2.upper() in _TERM_FUNC_TEMPLATES:
                parts.append(
                    self._unary_term_fn(_TERM_FUNC_TEMPLATES[v2.upper()])
                )
            elif k2 == "word" and v2.upper() in _TERM_KIND_FUNCS:
                raise SparqlUnsupported(
                    f"{v2.upper()} needs term-kind markers the flat-string "
                    "term model erases"
                )
            elif k2 == "pname" and v2 in _XSD_CASTS:
                parts.append(self._unary_term_fn(_XSD_CASTS[v2]))
            elif k2 == "word" and v2.upper() in _FILTER_FUNCS:
                parts.append(_FILTER_FUNCS[v2.upper()])
            else:
                parts.append(v2)
        return " ".join(parts)

    # -- FILTER expression -> Spark SQL --------------------------------

    def _str_before_after(self, fn: str) -> str:
        """Expand STRBEFORE/STRAFTER(simple, simple) to a CASE over
        instr/substring — Spark has no equivalent with SPARQL's
        not-found => '' semantics (17.4.3.3-4); the empty-separator
        cases fall out of instr(a, '') = 1."""
        self.expect_punct("(")
        a = self._filter_simple_arg()
        self.expect_punct(",")
        b = self._filter_simple_arg()
        self.expect_punct(")")
        if fn == "STRBEFORE":
            return (
                f"CASE WHEN instr({a}, {b}) > 0 THEN "
                f"substring({a}, 1, instr({a}, {b}) - 1) ELSE '' END"
            )
        return (
            f"CASE WHEN instr({a}, {b}) > 0 THEN "
            f"substring({a}, instr({a}, {b}) + length({b})) ELSE '' END"
        )

    def _filter_simple_arg(self) -> str:
        """One var-or-literal argument inside a builtin expansion."""
        kind, v = self.next()
        if kind == "var":
            return v[1:]
        if kind == "literal":
            return "'" + v[1:-1].replace("'", "''") + "'"
        if kind == "iri":
            return "'" + v[1:-1] + "'"
        raise SparqlUnsupported(
            "STRBEFORE/STRAFTER support variable or literal arguments"
        )

    def _unary_term_fn(self, template: str) -> str:
        """Expand a one-argument term builtin / xsd cast: consume
        ``( arg )`` and substitute the translated argument into the
        structural SQL template."""
        self.expect_punct("(")
        a = self._filter_simple_arg()
        self.expect_punct(")")
        return "(" + template.format(a=a) + ")"

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
            elif kind == "word" and val.upper() in ("STRBEFORE", "STRAFTER"):
                # no Spark SQL equivalent with SPARQL's not-found => ''
                # semantics; expand the simple (var/literal, var/literal)
                # form to a CASE over instr/substring. SPARQL 17.4.3.3-4
                # empty-separator cases fall out: instr(a, '') = 1.
                parts.append(self._str_before_after(val.upper()))
            elif kind == "word" and val.upper() in _TERM_FUNC_TEMPLATES:
                parts.append(
                    self._unary_term_fn(_TERM_FUNC_TEMPLATES[val.upper()])
                )
            elif kind == "word" and val.upper() in _TERM_KIND_FUNCS:
                raise SparqlUnsupported(
                    f"{val.upper()} needs term-kind markers the flat-string "
                    "term model erases"
                )
            elif kind == "pname" and val in _XSD_CASTS:
                parts.append(self._unary_term_fn(_XSD_CASTS[val]))
            elif kind == "word" and val.upper() in _FILTER_FUNCS:
                # STR(?x) is the identity in a flat-string term model:
                # emit just the parenthesized argument
                parts.append(_FILTER_FUNCS[val.upper()])
            else:
                parts.append(val)
        return " ".join(parts)

    # -- property paths ------------------------------------------------

    def _path_atom(self) -> str | tuple | frozenset:
        """One path atom: iri/pname/'a'/?var, a parenthesized pure
        alternation of simple predicates (-> tuple of IRIs), or a
        negated property set ``!p`` / ``!(p1|p2|...)`` (-> frozenset —
        matches every predicate NOT in the set)."""
        if self.peek() == ("op", "!"):
            self.next()
            atom = self._path_atom()
            if isinstance(atom, tuple):
                return frozenset(atom)
            if isinstance(atom, str) and not atom.startswith("?"):
                return frozenset((atom,))
            raise SparqlUnsupported(
                "negated property set over variables or nested negation"
            )
        if self.peek()[1] == "(":
            self.next()
            alts = [self._path_atom()]
            while self.peek()[1] == "|":
                self.next()
                alts.append(self._path_atom())
            self.expect_punct(")")
            flat: list[str] = []
            for a in alts:
                if isinstance(a, tuple):
                    flat.extend(a)
                elif isinstance(a, str) and not a.startswith("?"):
                    flat.append(a)
                else:
                    raise SparqlUnsupported(
                        "parenthesized paths support only predicate "
                        "alternation (p1|p2|...)"
                    )
            return tuple(flat) if len(flat) > 1 else flat[0]
        return self.term()

    def _path_unit(self) -> dict:
        """One path element: ('^')? atom ('+'|'*'|'?')?"""
        inverse = False
        if self.peek()[1] == "^":
            self.next()
            inverse = True
        atom = self._path_atom()
        mod = None
        if self.peek() == ("op", "+") or self.peek() == ("op", "*") or (
            self.peek() == ("op", "?")
        ):
            mod = self.next()[1]
        if isinstance(atom, str) and atom.startswith("?") and (inverse or mod):
            raise SparqlUnsupported("path modifiers on a ?var predicate")
        if isinstance(atom, frozenset) and mod:
            raise SparqlUnsupported(
                "closure modifiers on a negated property set"
            )
        return {"pred": atom, "inverse": inverse, "mod": mod}

    def path(self) -> list[dict]:
        """Predicate-position property path: sequence of units
        (p1/p2/...), each optionally inverse (^) and/or closed (+ * ?).
        Top-level alternation of simple predicates (p1|p2) folds into
        one IN-set unit."""
        steps = [self._path_unit()]
        while True:
            kind, val = self.peek()
            if val == "/":
                self.next()
                steps.append(self._path_unit())
            elif val == "|":
                # only simple-unit | simple-unit folds to an IN set
                self.next()
                nxt = self._path_unit()
                last = steps[-1]
                if (
                    len(steps) >= 1
                    and not last["inverse"] and not last["mod"]
                    and not nxt["inverse"] and not nxt["mod"]
                    and not (isinstance(last["pred"], str)
                             and last["pred"].startswith("?"))
                    and not isinstance(last["pred"], frozenset)
                    and not isinstance(nxt["pred"], frozenset)
                ):
                    a = last["pred"] if isinstance(last["pred"], tuple) else (last["pred"],)
                    b = nxt["pred"] if isinstance(nxt["pred"], tuple) else (nxt["pred"],)
                    steps[-1] = {"pred": a + b, "inverse": False, "mod": None}
                else:
                    raise SparqlUnsupported(
                        "alternation only over simple predicates"
                    )
            else:
                break
        return steps

    # -- pattern groups ------------------------------------------------

    def group(self) -> list[dict]:
        """Parse { ... }: returns a list of UNION branches, each a dict
        with keys ``p`` (required patterns), ``o`` (optional patterns),
        ``f`` (filter SQL), ``closures``, ``binds``, ``values``,
        ``minus``. A group without UNION is a single branch;
        ``{ {A} UNION {B} }`` returns both. Mixing top-level patterns
        with UNION branches in one group is outside the subset."""
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

    def _single_group_inner(self) -> list[dict]:
        sub = self.group()
        if len(sub) != 1:
            raise SparqlUnsupported("nested UNION")
        return sub

    def values_block(self) -> tuple[list[str], list[tuple]]:
        """VALUES ?v { t ... } or VALUES (?a ?b) { (t t) ... };
        UNDEF -> None."""
        kind, val = self.peek()
        if val == "(":
            self.next()
            vars_: list[str] = []
            while self.peek()[0] == "var":
                vars_.append(self.next()[1][1:])
            self.expect_punct(")")
        elif kind == "var":
            vars_ = [self.next()[1][1:]]
        else:
            raise SparqlError("VALUES needs ?var or (?var ...)")
        if not vars_:
            raise SparqlError("VALUES needs at least one variable")
        self.expect_punct("{")
        rows: list[tuple] = []

        def one_term():
            if self.peek()[1].upper() == "UNDEF":
                self.next()
                return None
            return self.term()

        while self.peek()[1] != "}":
            if len(vars_) == 1 and self.peek()[1] != "(":
                rows.append((one_term(),))
                continue
            self.expect_punct("(")
            row = []
            while self.peek()[1] != ")":
                row.append(one_term())
            self.expect_punct(")")
            if len(row) != len(vars_):
                raise SparqlError("VALUES row arity mismatch")
            rows.append(tuple(row))
        self.expect_punct("}")
        return vars_, rows

    def _group_body(self) -> dict:
        """Body of a brace group (opening '{' already consumed by
        group()); consumes through the closing '}'."""
        br: dict = {
            "p": [], "o": [], "f": [],
            "closures": [], "binds": [], "values": [], "minus": [],
            "exists": [],  # (polarity, sub-branch): FILTER [NOT] EXISTS
            "subqueries": [],  # nested { SELECT ... } plan dicts
        }
        fresh = [0]

        def fresh_var() -> str:
            fresh[0] += 1
            return f"?__pv{len(br['p'])}_{fresh[0]}"

        def emit_path(s: str, steps: list[dict], o: str, sink: list) -> None:
            """Rewrite a path into patterns/closures with fresh
            intermediate variables for sequences."""
            cur = s
            for idx, st in enumerate(steps):
                nxt = o if idx == len(steps) - 1 else fresh_var()
                a, b = (nxt, cur) if st["inverse"] else (cur, nxt)
                if st["mod"] is None:
                    sink.append((a, st["pred"], b))
                else:
                    if sink is br["o"]:
                        raise SparqlUnsupported(
                            "path closures inside OPTIONAL"
                        )
                    br["closures"].append(
                        {"s": a, "pred": st["pred"], "o": b,
                         "mod": st["mod"]}
                    )
                cur = nxt

        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                break
            if val == ".":
                # SPARQL grammar: GraphPatternNotTriples (FILTER/BIND/
                # OPTIONAL/...) may be followed by an optional '.'
                self.next()
                continue
            up = val.upper() if kind == "word" else ""
            if up == "OPTIONAL":
                self.next()
                sub = self.group()
                if len(sub) != 1:
                    raise SparqlUnsupported("UNION inside OPTIONAL")
                sb = sub[0]
                if any(sb[k] for k in
                       ("o", "f", "closures", "binds", "values", "minus",
                        "exists", "subqueries")):
                    raise SparqlUnsupported(
                        "only plain patterns inside OPTIONAL"
                    )
                br["o"].extend(sb["p"])
                continue
            if up == "FILTER":
                self.next()
                nxt = self.peek()[1].upper()
                if nxt in ("EXISTS", "NOT"):
                    positive = nxt == "EXISTS"
                    self.next()
                    if not positive:
                        self.expect_word("EXISTS")
                    sub = self.group()
                    if len(sub) != 1:
                        raise SparqlUnsupported("UNION inside EXISTS")
                    br["exists"].append((positive, sub[0]))
                    continue
                br["f"].append(self.filter_expr())
                continue
            if up == "BIND":
                self.next()
                self.expect_punct("(")
                # reuse the FILTER translator up to the AS keyword
                depth, parts = 1, []
                while True:
                    k2, v2 = self.peek()
                    if k2 == "eof":
                        raise SparqlError("unterminated BIND")
                    if k2 == "word" and v2.upper() == "AS" and depth == 1:
                        self.next()
                        break
                    k2, v2 = self.next()
                    if v2 == "(":
                        depth += 1
                        parts.append("(")
                    elif v2 == ")":
                        depth -= 1
                        parts.append(")")
                    elif k2 == "var":
                        parts.append(v2[1:])
                    elif k2 == "literal":
                        parts.append("'" + v2[1:-1].replace("'", "''") + "'")
                    elif k2 == "iri":
                        parts.append("'" + v2[1:-1] + "'")
                    elif k2 == "op":
                        parts.append(
                            {"&&": "AND", "||": "OR", "!": "NOT"}.get(v2, v2)
                        )
                    elif k2 == "word" and v2.upper() in (
                        "STRBEFORE", "STRAFTER",
                    ):
                        parts.append(self._str_before_after(v2.upper()))
                    elif k2 == "word" and v2.upper() in _TERM_FUNC_TEMPLATES:
                        parts.append(
                            self._unary_term_fn(
                                _TERM_FUNC_TEMPLATES[v2.upper()]
                            )
                        )
                    elif k2 == "word" and v2.upper() in _TERM_KIND_FUNCS:
                        raise SparqlUnsupported(
                            f"{v2.upper()} needs term-kind markers the "
                            "flat-string term model erases"
                        )
                    elif k2 == "pname" and v2 in _XSD_CASTS:
                        parts.append(self._unary_term_fn(_XSD_CASTS[v2]))
                    elif k2 == "word" and v2.upper() in _FILTER_FUNCS:
                        parts.append(_FILTER_FUNCS[v2.upper()])
                    else:
                        parts.append(v2)
                k2, v2 = self.next()
                if k2 != "var":
                    raise SparqlError("BIND needs AS ?var")
                self.expect_punct(")")
                br["binds"].append((" ".join(parts), v2[1:]))
                continue
            if up == "VALUES":
                self.next()
                br["values"].append(self.values_block())
                continue
            if up == "MINUS":
                self.next()
                sub = self.group()
                if len(sub) != 1:
                    raise SparqlUnsupported("UNION inside MINUS")
                br["minus"].append(sub[0])
                continue
            if up == "SELECT":
                # subquery as the entire remaining group: evaluated
                # bottom-up, projected vars join the outer group
                self.next()
                br["subqueries"].append(
                    _parse_select_tail(self, "SELECT", [], stop="}")
                )
                return br
            if val == "{":
                # braced subgroup mid-body: only { SELECT ... } folds in
                sub = self.group()
                if len(sub) != 1:
                    raise SparqlUnsupported("UNION in a nested group")
                sb = sub[0]
                if any(sb[k] for k in
                       ("p", "o", "f", "closures", "binds", "values",
                        "minus", "exists")) or not sb["subqueries"]:
                    raise SparqlUnsupported(
                        "nested groups support only { SELECT ... } "
                        "subqueries"
                    )
                br["subqueries"].extend(sb["subqueries"])
                continue
            if up == "GRAPH":
                # GRAPH ?g { ... } / GRAPH <iri> { ... } over a quads
                # frame: every inner pattern gains a 4th (graph) slot.
                self.next()
                g_term = self.term()
                sub = self.group()
                if len(sub) != 1:
                    raise SparqlUnsupported("UNION inside GRAPH")
                sb = sub[0]
                if any(sb[k] for k in
                       ("o", "f", "closures", "binds", "values", "minus",
                        "exists", "subqueries")):
                    raise SparqlUnsupported(
                        "only plain patterns inside GRAPH"
                    )
                for pat in sb["p"]:
                    if len(pat) == 4:
                        raise SparqlUnsupported("nested GRAPH")
                    br["p"].append((*pat, g_term))
                continue
            s = self.term_or_quoted()
            while True:
                steps = self.path()
                o = self.term_or_quoted()
                if len(steps) == 1 and steps[0]["mod"] is None and not steps[0]["inverse"]:
                    br["p"].append((s, steps[0]["pred"], o))
                else:
                    emit_path(s, steps, o, br["p"])
                kind, val = self.peek()
                if val == ";":  # predicate list: same subject
                    self.next()
                    continue
                break
            if self.peek()[1] == ".":
                self.next()
        return br


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
    form = p.peek()[1].upper()
    if form not in ("SELECT", "ASK", "CONSTRUCT", "DESCRIBE"):
        raise SparqlError(
            f"expected SELECT/ASK/CONSTRUCT/DESCRIBE, got {form!r}"
        )
    p.next()
    template: list[tuple] = []
    if form == "ASK":
        # ASK { ... } — WHERE keyword optional
        if p.peek()[1].upper() == "WHERE":
            p.next()
        branches = p.group()
        if p.peek()[0] != "eof":
            raise SparqlError("ASK takes no solution modifiers")
        return {
            "form": "ASK",
            "describe": [],
            "branches": branches,
            "projection": None,
            "aggregates": [],
            "group_by": [],
            "having": [],
            "distinct": False,
            "order": [],
            "limit": None,
            "offset": None,
            "template": [],
        }
    if form == "DESCRIBE":
        # DESCRIBE ?v ... <iri> ... [WHERE { ... }] — resources to
        # describe: explicit IRIs plus solution bindings of the vars
        targets: list[str] = []
        while True:
            kind, val = p.peek()
            if kind == "var":
                targets.append(p.next()[1])
            elif kind in ("iri", "pname"):
                targets.append(p.term())
            else:
                break
        if not targets:
            raise SparqlError("DESCRIBE needs at least one ?var or <iri>")
        branches = []
        if p.peek()[1].upper() == "WHERE" or p.peek()[1] == "{":
            if p.peek()[1].upper() == "WHERE":
                p.next()
            branches = p.group()
        if p.peek()[0] != "eof":
            raise SparqlError("DESCRIBE takes no solution modifiers")
        if any(is_var(t) for t in targets) and not branches:
            raise SparqlError("DESCRIBE with ?vars needs a WHERE group")
        return {
            "form": "DESCRIBE",
            "describe": targets,
            "branches": branches,
            "projection": None,
            "aggregates": [],
            "group_by": [],
            "having": [],
            "distinct": False,
            "order": [],
            "limit": None,
            "offset": None,
            "template": [],
        }
    if form == "CONSTRUCT":
        tb = p.group()
        if len(tb) != 1:
            raise SparqlUnsupported("UNION in CONSTRUCT template")
        t = tb[0]
        if any(t[k] for k in
               ("o", "f", "closures", "binds", "values", "minus",
                        "exists", "subqueries")):
            raise SparqlUnsupported(
                "CONSTRUCT template takes plain triple patterns only"
            )
        if not t["p"]:
            raise SparqlError("empty CONSTRUCT template")
        for s, pr, o in t["p"]:
            if isinstance(pr, (tuple, frozenset)):
                raise SparqlUnsupported("alternation in CONSTRUCT template")
            template.append((s, pr, o))
    return _parse_select_tail(p, form, template, stop="eof")


def _parse_select_tail(
    p: _Parser, form: str, template: list[tuple], stop: str
) -> dict:
    """Projection + WHERE + solution modifiers — shared by the top
    level (``stop="eof"``) and subqueries (``stop="}"``, consuming the
    closing brace). The form word (SELECT/CONSTRUCT) is already
    consumed."""
    distinct = False
    projection: list[str] | None = [] if form == "SELECT" else None
    aggregates: list[dict] = []
    if form == "SELECT" and p.peek()[1].upper() == "DISTINCT":
        p.next()
        distinct = True
    while form == "SELECT":
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
            separator = " "
            if p.peek()[1] == ";":  # GROUP_CONCAT(?v; SEPARATOR="x")
                p.next()
                p.expect_word("SEPARATOR")
                if p.peek()[1] == "=":
                    p.next()
                kind2, sep = p.next()
                if kind2 != "literal":
                    raise SparqlError("SEPARATOR needs a string literal")
                separator = re.sub(r"\\(.)", r"\1", sep[1:-1])
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
                    "separator": separator,
                }
            )
        else:
            break
    if form == "SELECT" and projection == [] and not aggregates:
        raise SparqlError("SELECT needs variables, aggregates, or *")
    p.expect_word("WHERE")
    branches = p.group()
    order: list[tuple[str, bool]] = []
    group_by: list[str] = []
    having: list[str] = []
    limit: int | None = None
    offset: int | None = None
    while True:
        kind, val = p.peek()
        if kind == "eof":
            if stop == "}":
                raise SparqlError("unterminated subquery group")
            break
        if stop == "}" and val == "}":
            p.next()
            break
        kind, val = p.next()
        up = val.upper()
        if up == "GROUP":
            p.expect_word("BY")
            while p.peek()[0] == "var":
                group_by.append(p.next()[1][1:])
            if not group_by:
                raise SparqlError("GROUP BY needs variables")
        elif up == "HAVING":
            having.append(p.filter_expr())
        elif up == "VALUES":
            # trailing VALUES applies to the whole solution sequence;
            # fold it into every branch
            vb = p.values_block()
            for br in branches:
                br["values"].append(vb)
        elif up == "ORDER":
            p.expect_word("BY")
            while True:
                kind, val = p.peek()
                asc = True
                if val.upper() in ("ASC", "DESC"):
                    # ASC(?v) / DESC(expr): any BIND-translatable
                    # expression is a valid sort key (SPARQL 15.1)
                    asc = val.upper() == "ASC"
                    p.next()
                    p.expect_punct("(")
                    order.append((p.sql_until_close(), asc))
                elif kind == "var":
                    p.next()
                    order.append((val[1:], True))
                elif kind == "word" and val.upper() in _FILTER_FUNCS:
                    # bare builtin sort key: ORDER BY STRLEN(?x)
                    p.next()
                    p.expect_punct("(")
                    fn = _FILTER_FUNCS[val.upper()]
                    order.append(
                        (f"{fn}({p.sql_until_close()})", True)
                    )
                else:
                    break
        elif up == "LIMIT":
            _, n = p.next()
            limit = int(n)
        elif up == "OFFSET":
            _, n = p.next()
            offset = int(n)
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
    if having and not aggregates:
        raise SparqlError("HAVING without aggregates")
    return {
        "form": form,
        "describe": [],
        "branches": branches,
        "projection": projection,
        "aggregates": aggregates,
        "group_by": group_by,
        "having": having,
        "distinct": distinct,
        "order": order,
        "limit": limit,
        "offset": offset,
        "template": template,
    }


def _closure_pairs(
    triples: DataFrame, preds: tuple[str, ...], mod: str, max_rounds: int
) -> DataFrame:
    """Reachability pairs (src, dst) for a property-path closure over
    the union of ``preds`` edges.

    ``+``: one-or-more steps — distributed semi-naive transitive
    closure: per round, extend only the *new* pairs of the previous
    round by one edge (delta join), anti-join against everything seen,
    stop at an empty delta. Lineage is truncated per round with
    ``localCheckpoint`` (same discipline as the CC/BFS loops in
    operators/components.py), so the plan does not grow with rounds and
    each round is one edge-sized shuffle — the frontier side stays
    small and AQE broadcasts it while it fits.

    ``*`` / ``?``: zero-length pairs (t, t) are added for every term of
    the graph (subject or object position — the practical reading of
    SPARQL's zero-length-path semantics for this engine's flat term
    model); ``?`` is zero-or-one (no iteration at all).
    """
    from pyspark.sql import functions as F

    e = (
        triples.filter(F.col("p").isin(*preds))
        .select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if mod == "?":
        pairs = e
    else:
        pairs = e
        delta = e
        for _ in range(max_rounds):
            step = (
                delta.withColumnRenamed("dst", "mid")
                .join(e.withColumnRenamed("src", "mid"), "mid")
                .select("src", "dst")
                .distinct()
            )
            new = step.join(pairs, ["src", "dst"], "left_anti").localCheckpoint(
                eager=True
            )
            if not new.take(1):
                break
            # pairs is a union of per-round checkpointed deltas: shallow
            # lineage without paying an extra checkpoint job per round
            pairs = pairs.unionByName(new)
            delta = new
        else:
            raise SparqlError(
                f"path closure did not converge in {max_rounds} rounds"
            )
    if mod in ("*", "?"):
        nodes = (
            triples.select(F.col("s").alias("n"))
            .unionByName(triples.select(F.col("o").alias("n")))
            .distinct()
        )
        pairs = pairs.unionByName(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        ).distinct()
    return pairs


def _closure_from(
    triples: DataFrame,
    preds: tuple[str, ...],
    seed: str,
    mod: str,
    max_rounds: int,
    forward: bool,
) -> DataFrame:
    """Nodes reachable from one constant endpoint of a path closure —
    the seeded form of :func:`_closure_pairs`. A constant endpoint means
    all-pairs transitive closure is never needed: frontier BFS to
    fixpoint touches only the reachable sliver (per round: one edge
    equi-join with the frontier — AQE broadcasts the frontier — one
    distinct, one anti-join against visited). This is the plan that
    holds at 10^12 triples; the all-pairs path is reserved for
    var-to-var closures. Returns one column ``node``."""
    from pyspark.sql import functions as F

    src, dst = ("s", "o") if forward else ("o", "s")
    e = (
        triples.filter(F.col("p").isin(*preds))
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = triples.sparkSession
    seed_df = spark.createDataFrame([(seed,)], "node string")
    if mod == "?":
        one = e.filter(F.col("src") == seed).select(
            F.col("dst").alias("node")
        )
        return one.unionByName(seed_df).distinct()
    reached = seed_df.localCheckpoint(eager=True)
    frontier = reached
    for _ in range(max_rounds):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if not nxt.take(1):
            break
        # reached is a union of per-round checkpointed frontiers:
        # shallow lineage, no extra checkpoint job per round
        reached = reached.unionByName(nxt)
        frontier = nxt
    else:
        raise SparqlError(
            f"path closure did not converge in {max_rounds} rounds"
        )
    if mod == "*":
        return reached
    # "+": drop the zero-length seed unless it is reachable in >=1 step
    plus = reached.join(seed_df, "node", "left_anti")
    seed_cycle = (
        e.join(reached.withColumnRenamed("node", "src"), "src")
        .filter(F.col("dst") == seed)
        .select(F.col("dst").alias("node"))
        .distinct()
    )
    return plus.unionByName(seed_cycle).distinct()


def _apply_closure(
    sols: DataFrame | None,
    cl: dict,
    triples: DataFrame,
    max_rounds: int,
) -> DataFrame:
    """Join one closure pattern's reachability pairs onto the branch
    solutions (constants filter; shared variables equi-join; disjoint
    variables cross-join, as SPARQL BGP semantics require). Closures
    with one constant endpoint run as seeded BFS
    (:func:`_closure_from`); only var-to-var closures pay for all-pairs
    reachability."""
    from pyspark.sql import functions as F

    preds = cl["pred"] if isinstance(cl["pred"], tuple) else (cl["pred"],)
    s_t, o_t = cl["s"], cl["o"]
    if is_var(s_t) != is_var(o_t):
        forward = not is_var(s_t)
        seed = s_t if forward else o_t
        var = (o_t if forward else s_t)[1:]
        df = _closure_from(
            triples, preds, seed, cl["mod"], max_rounds, forward
        ).withColumnRenamed("node", var)
        if sols is None:
            return df
        if var in sols.columns:
            return sols.join(df, var)
        return sols.crossJoin(df)
    df = _closure_pairs(triples, preds, cl["mod"], max_rounds)
    if is_var(s_t) and is_var(o_t) and s_t == o_t:
        df = df.filter(F.col("src") == F.col("dst")).select(
            F.col("src").alias(s_t[1:])
        )
    else:
        if is_var(s_t):
            df = df.withColumnRenamed("src", s_t[1:])
        else:
            df = df.filter(F.col("src") == F.lit(s_t)).drop("src")
        if is_var(o_t):
            df = df.withColumnRenamed("dst", o_t[1:])
        else:
            df = df.filter(F.col("dst") == F.lit(o_t)).drop("dst")
    if sols is None:
        return df
    keys = [c for c in df.columns if c in sols.columns]
    return sols.join(df, keys) if keys else sols.crossJoin(df)


def _apply_values(
    sols: DataFrame | None,
    spark,
    vars_: list[str],
    rows: list[tuple],
) -> DataFrame:
    """Join a VALUES block: an inline broadcast relation. UNDEF cells
    constrain nothing (NULL-or-equal join predicate)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    vdf = spark.createDataFrame(
        rows,
        StructType([StructField(v, StringType(), True) for v in vars_]),
    )
    if sols is None:
        return vdf
    shared = [v for v in vars_ if v in sols.columns]
    new = [v for v in vars_ if v not in sols.columns]
    S, V = sols.alias("S"), F.broadcast(vdf.alias("V"))
    if shared:
        cond = None
        for v in shared:
            c = F.col(f"V.{v}").isNull() | (F.col(f"V.{v}") == F.col(f"S.{v}"))
            cond = c if cond is None else cond & c
        joined = S.join(V, cond, "inner")
    else:
        joined = S.crossJoin(V)
    return joined.select(
        *[F.col(f"S.{c}") for c in sols.columns],
        *[F.col(f"V.{v}").alias(v) for v in new],
    )


def _eval_branch(
    triples: DataFrame, br: dict, max_rounds: int
) -> DataFrame:
    """Evaluate one UNION branch: BGP join -> path closures -> VALUES ->
    BIND -> group-level FILTER -> MINUS. Helper variables introduced by
    path sequence rewriting (``__pv*``) are dropped at the end."""
    from pyspark.sql import functions as F

    # Quads (a nullable ``g`` column, NULL = default graph): patterns
    # outside GRAPH match the default graph only; GRAPH patterns carry
    # their 4th slot. On a plain triples frame, 3-tuples pass through
    # and GRAPH is an error.
    has_g = "g" in triples.columns

    def norm(pat: tuple) -> tuple:
        if len(pat) == 4:
            if not has_g:
                raise SparqlError(
                    "GRAPH requires a quads frame with a 'g' column"
                )
            return pat
        return (*pat, None) if has_g else pat

    dflt = (
        triples.filter(F.col("g").isNull()).select("s", "p", "o")
        if has_g
        else triples
    )
    # FILTERs participate in the single bgp_match Catalyst plan (free
    # pushdown) unless later stages introduce variables they may
    # reference — then they apply at group level, after assembly.
    defer_filters = bool(
        br["closures"] or br["binds"] or br["values"] or br["subqueries"]
    )
    sols: DataFrame | None = None
    if br["p"] or br["o"]:
        sols = bgp_match(
            triples,
            [norm(p) for p in br["p"]],
            optional=[norm(p) for p in br["o"]],
            filters=() if defer_filters else br["f"],
        )
    for cl in br["closures"]:
        # path closures walk the default graph
        sols = _apply_closure(sols, cl, dflt, max_rounds)
    for sq in br["subqueries"]:
        sub = _eval_select_plan(triples, sq, max_rounds)
        if sols is None:
            sols = sub
        else:
            keys = [c for c in sub.columns if c in sols.columns]
            sols = sols.join(sub, keys) if keys else sols.crossJoin(sub)
    for vars_, rows in br["values"]:
        sols = _apply_values(sols, triples.sparkSession, vars_, rows)
    if sols is None:
        if not br["binds"]:
            raise SparqlError("empty group pattern")
        # BIND-only group: the unit solution (one empty mapping)
        sols = triples.sparkSession.range(1).select()
    for sql, var in br["binds"]:
        sols = sols.withColumn(var, F.expr(sql))
    if defer_filters:
        for f in br["f"]:
            sols = sols.filter(F.expr(f))
    for mb in br["minus"]:
        sub = _eval_branch(triples, mb, max_rounds)
        shared = [c for c in sub.columns if c in sols.columns]
        if shared:  # disjoint domains: MINUS removes nothing (SPARQL)
            sols = sols.join(
                sub.select(*shared).distinct(), shared, "left_anti"
            )
    for positive, eb in br["exists"]:
        sub = _eval_branch(triples, eb, max_rounds)
        shared = [c for c in sub.columns if c in sols.columns]
        if not shared:
            raise SparqlUnsupported(
                "EXISTS pattern must share a variable with the group"
            )
        sols = sols.join(
            sub.select(*shared).distinct(),
            shared,
            "left_semi" if positive else "left_anti",
        )
    helper = [c for c in sols.columns if c.startswith("__pv")]
    return sols.drop(*helper) if helper else sols


def _parse_template_group(p: _Parser) -> list[tuple]:
    """A braced group restricted to plain triple patterns (update/
    construct templates)."""
    tb = p.group()
    if len(tb) != 1:
        raise SparqlUnsupported("UNION in a template group")
    t = tb[0]
    if any(t[k] for k in
           ("o", "f", "closures", "binds", "values", "minus",
            "exists", "subqueries")):
        raise SparqlUnsupported("templates take plain triple patterns only")
    if not t["p"]:
        raise SparqlError("empty template group")
    out = []
    for s, pr, o in t["p"]:
        if isinstance(pr, (tuple, frozenset)):
            raise SparqlUnsupported("alternation in a template")
        out.append((s, pr, o))
    return out


#: values with an IRI scheme serialize as IRIs in constructed quoted
#: triples; everything else as a plain literal. The flat value model
#: drops term kinds, so CONSTRUCT-star recovers them heuristically —
#: documented operator contract (predicates always serialize as IRIs,
#: as RDF requires).
_IRI_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def _serialize_term(t, as_iri: bool = False):
    """Template term -> serialized N-Triples piece (Column) for
    CONSTRUCT-star quoted-triple building."""
    from pyspark.sql import functions as F

    val = F.col(t[1:]) if is_var(t) else F.lit(t)
    if as_iri:
        return F.concat(F.lit("<"), val, F.lit(">"))
    looks_iri = val.rlike(_IRI_SCHEME_RE)
    return F.when(looks_iri, F.concat(F.lit("<"), val, F.lit(">"))).otherwise(
        F.concat(F.lit('"'), val, F.lit('"'))
    )


def _template_col(t, slot: str):
    """One template slot -> output Column (QuotedPattern serializes to
    the flat-column qt convention; plain terms pass through)."""
    from pyspark.sql import functions as F

    if isinstance(t, QuotedPattern):
        return F.concat(
            F.lit("<< "),
            _serialize_term(t.s),
            F.lit(" "),
            _serialize_term(t.p, as_iri=True),
            F.lit(" "),
            _serialize_term(t.o),
            F.lit(" >>"),
        ).alias(slot)
    return (F.col(t[1:]) if is_var(t) else F.lit(t)).alias(slot)


def _instantiate(sols: DataFrame, template: list[tuple]) -> DataFrame:
    """CONSTRUCT-style template instantiation: one (s, p, o) row per
    solution per template pattern; unbound slots drop the row; result
    is a graph (set). A quoted-triple template term (CONSTRUCT-star,
    ``<< ?s ?p ?o >> :pred ?v``) serializes its bindings into the
    flat-column qt convention, so constructed annotations round-trip
    through the quoted-pattern MATCHER and the Jelly/NT writers."""

    out = None
    for s, p, o in template:
        row = sols.select(
            *[
                _template_col(t, slot)
                for slot, t in (("s", s), ("p", p), ("o", o))
            ]
        )
        out = row if out is None else out.unionByName(row)
    return out.na.drop().distinct()


def sparql_update(
    triples: DataFrame, update: str, *, max_closure_rounds: int = 25
) -> DataFrame:
    """Apply a SPARQL UPDATE to a triples DataFrame and return the NEW
    graph (functional — the input frame is untouched; write the result
    wherever the old graph lived).

    Supported forms (triples frames, default graph only):

    - ``INSERT DATA { ground triples }``
    - ``DELETE DATA { ground triples }``
    - ``DELETE WHERE { patterns }`` — the pattern group is both the
      match and the delete template
    - ``[DELETE { template }] [INSERT { template }] WHERE { group }`` —
      the general form; WHERE supports the full query subset (paths,
      FILTER, UNION, ...)

    Deletions are an (s, p, o) anti-join; insertions union-distinct.
    The reference applies updates through rdflib's in-memory store
    (``Graph.update``); here the same statement rewrites the
    distributed graph as one Catalyst plan.
    """
    from pyspark.sql import functions as F

    bad = _UNSUPPORTED.search(update)
    if bad:
        raise SparqlUnsupported(f"{bad.group(0)} is not supported")
    p = _Parser(_tokenize(update))
    while p.peek()[1].upper() == "PREFIX":
        p.next()
        _, pname = p.next()
        ns = pname[:-1] if pname.endswith(":") else pname.partition(":")[0]
        kind, iri = p.next()
        if kind != "iri":
            raise SparqlError("PREFIX needs an <iri>")
        p.prefixes[ns] = iri[1:-1]

    delete_tpl: list[tuple] | None = None
    insert_tpl: list[tuple] | None = None
    where = None
    kind, val = p.next()
    up = val.upper()
    if up == "INSERT" and p.peek()[1].upper() == "DATA":
        p.next()
        insert_tpl = _parse_template_group(p)
    elif up == "DELETE" and p.peek()[1].upper() == "DATA":
        p.next()
        delete_tpl = _parse_template_group(p)
    elif up == "DELETE" and p.peek()[1].upper() == "WHERE":
        p.next()
        where = p.group()
        delete_tpl = []
        for br in where:
            delete_tpl.extend(
                pat for pat in br["p"] if len(pat) == 3
            )
        if not delete_tpl:
            raise SparqlError("DELETE WHERE needs triple patterns")
    else:
        if up == "DELETE":
            delete_tpl = _parse_template_group(p)
            kind, val = p.next()
            up = val.upper()
        if up == "INSERT":
            insert_tpl = _parse_template_group(p)
            kind, val = p.next()
            up = val.upper()
        if up != "WHERE":
            raise SparqlError(f"expected WHERE, got {val!r}")
        where = p.group()
    if p.peek()[0] != "eof":
        raise SparqlError(
            f"unexpected trailing token {p.peek()[1]!r} (one update "
            "statement per call)"
        )
    if delete_tpl is None and insert_tpl is None:
        raise SparqlError("update changes nothing")

    if where is None:
        # DATA forms: templates must be ground
        for tpl in (delete_tpl or []) + (insert_tpl or []):
            if any(is_var(t) for t in tpl):
                raise SparqlError("INSERT/DELETE DATA takes ground triples")
        spark = triples.sparkSession
        sols = spark.range(1).select()  # unit solution
    else:
        frames = [
            _eval_branch(triples, br, max_closure_rounds) for br in where
        ]
        all_vars: list[str] = []
        for f in frames:
            for c in f.columns:
                if c not in all_vars:
                    all_vars.append(c)
        sols = None
        for f in frames:
            aligned = f.select(
                *[
                    F.col(c) if c in f.columns
                    else F.lit(None).cast("string").alias(c)
                    for c in all_vars
                ]
            )
            sols = aligned if sols is None else sols.unionByName(aligned)

    out = triples
    if delete_tpl:
        out = out.join(_instantiate(sols, delete_tpl), ["s", "p", "o"],
                       "left_anti")
    if insert_tpl:
        out = out.unionByName(_instantiate(sols, insert_tpl)).distinct()
    return out


def _eval_describe(
    triples: DataFrame, plan: dict, max_rounds: int
) -> DataFrame:
    """DESCRIBE: all default-graph triples whose subject is a described
    resource (subject-CBD) — resources are the explicit IRIs plus the
    WHERE solutions' bindings of the named variables. The resource set
    is small relative to the graph, so the semi-join broadcasts it."""
    from pyspark.sql import functions as F

    base = (
        triples.filter(F.col("g").isNull()).select("s", "p", "o")
        if "g" in triples.columns
        else triples.select("s", "p", "o")
    )
    spark = triples.sparkSession
    res: DataFrame | None = None
    sols: DataFrame | None = None
    if plan["branches"]:
        for br in plan["branches"]:
            f = _eval_branch(triples, br, max_rounds)
            sols = f if sols is None else sols.unionByName(
                f, allowMissingColumns=True
            )
    for t in plan["describe"]:
        if is_var(t):
            name = t[1:]
            if sols is None or name not in sols.columns:
                raise SparqlError(f"DESCRIBE variable ?{name} not bound")
            part = sols.select(F.col(name).alias("s")).na.drop()
        else:
            part = spark.createDataFrame([(t,)], "s string")
        res = part if res is None else res.unionByName(part)
    return base.join(
        F.broadcast(res.distinct()), "s", "leftsemi"
    ).distinct()


def sparql_query(
    triples: DataFrame,
    query: str,
    *,
    max_closure_rounds: int = 25,
    stats: DataFrame | dict | None = None,
) -> DataFrame:
    """Run a SPARQL query (supported subset above) against a triples
    DataFrame with string columns ``s``, ``p``, ``o``. SELECT returns
    one column per projected variable; ASK returns a single boolean row
    (column ``ask``); CONSTRUCT returns a deduplicated ``(s, p, o)``
    triples DataFrame built from the template.

    ``stats`` (the ``void_stats`` frame or a per-predicate mapping)
    scopes selectivity-first BGP join ordering over the whole
    evaluation, including subqueries and EXISTS/MINUS sub-patterns —
    solution bags are unchanged, only join trees."""
    from pyspark.sql import functions as F

    from pyjelly_spark.operators.bgp import bgp_stats

    plan = parse_sparql(query)
    with bgp_stats(stats):
        if plan["form"] == "DESCRIBE":
            return _eval_describe(triples, plan, max_closure_rounds)
        return _eval_select_plan(triples, plan, max_closure_rounds)


def _eval_select_plan(
    triples: DataFrame, plan: dict, max_closure_rounds: int
) -> DataFrame:
    """Evaluate a SELECT/ASK/CONSTRUCT plan dict — also the entry point
    for nested ``{ SELECT ... }`` subqueries (SPARQL 18.2: subqueries
    evaluate bottom-up, exporting only their projected variables)."""
    from pyspark.sql import functions as F

    frames = [
        _eval_branch(triples, br, max_closure_rounds)
        for br in plan["branches"]
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
    if plan["form"] == "ASK":
        return (
            sols.limit(1)
            .select(F.lit(1).alias("__x"))
            .agg((F.count("__x") > 0).alias("ask"))
        )
    if plan["form"] == "CONSTRUCT":
        # solution modifiers apply to the solution sequence BEFORE the
        # template instantiates triples (SPARQL 16.2)
        if plan["order"]:
            sols = sols.orderBy(
                *[
                    F.expr(v).asc() if asc else F.expr(v).desc()
                    for v, asc in plan["order"]
                ]
            )
        if plan["offset"]:
            sols = sols.offset(plan["offset"])
        if plan["limit"] is not None:
            sols = sols.limit(plan["limit"])
        # a template pattern with an unbound (OPTIONAL) variable emits
        # no triple for that solution; CONSTRUCT output is a graph (set)
        return _instantiate(sols, plan["template"])
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
            elif fn == "SAMPLE":
                # any value is allowed; min() is the deterministic pick
                col = F.min(v)
            elif fn == "GROUP_CONCAT":
                # sorted for partition-order independence (SPARQL leaves
                # concatenation order unspecified)
                vals = (
                    F.collect_set(v) if a["distinct"] else F.collect_list(v)
                )
                col = F.array_join(F.sort_array(vals), a["separator"])
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
        for h in plan["having"]:
            sols = sols.filter(F.expr(h))
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
                F.expr(v).asc() if asc else F.expr(v).desc()
                for v, asc in plan["order"]
            ]
        )
    if plan["offset"]:
        sols = sols.offset(plan["offset"])
    if plan["limit"] is not None:
        sols = sols.limit(plan["limit"])
    return sols
