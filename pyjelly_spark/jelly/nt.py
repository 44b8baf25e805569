"""Compact N-Triples / N-Quads reader and writer for test fixtures.

Covers the subset of RDF 1.1 N-Triples/N-Quads the reference's e2e corpora
use (/root/reference/tests/e2e_test_cases/): IRIs, blank nodes, plain /
language-tagged / datatyped literals with standard string escapes. Used to
load ``.nt``/``.nq`` fixtures into term tuples — not a production parser.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

Term = tuple

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<qtopen><<)
      | (?P<qtclose>>>)
      | <(?P<iri>[^>]*)>
      | (?P<bnode>_:[^\s]+)
      | "(?P<lex>(?:[^"\\]|\\.)*)"
         (?:@(?P<lang>[A-Za-z0-9\-]+)|\^\^<(?P<dt>[^>]*)>)?
      | (?P<dot>\.)
    )""",
    re.VERBOSE,
)

_UNESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def _unescape(text: str) -> str:
    if "\\" not in text:
        return text
    out: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        nxt = text[i + 1]
        if nxt == "u":
            out.append(chr(int(text[i + 2 : i + 6], 16)))
            i += 6
        elif nxt == "U":
            out.append(chr(int(text[i + 2 : i + 10], 16)))
            i += 10
        else:
            out.append(_UNESCAPES.get(nxt, nxt))
            i += 2
    return "".join(out)


def _escape(text: str) -> str:
    return (
        text.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _parse_terms(text: str) -> List[Term]:
    """Tokenize a term sequence (RDF-star ``<< s p o >>`` included) up to
    an optional trailing dot."""
    stack: List[List[Term]] = [[]]
    pos = 0
    while pos < len(text):
        match = _TOKEN.match(text, pos)
        if match is None:
            raise ValueError(f"cannot tokenize N-Triples text at {pos}: {text!r}")
        pos = match.end()
        if match.group("dot") is not None:
            break
        if match.group("qtopen") is not None:
            stack.append([])
        elif match.group("qtclose") is not None:
            inner = stack.pop()
            if len(inner) != 3 or not stack:
                raise ValueError(f"malformed quoted triple in {text!r}")
            stack[-1].append(("qt", inner[0], inner[1], inner[2]))
        elif match.group("iri") is not None:
            stack[-1].append(("iri", _unescape(match.group("iri"))))
        elif match.group("bnode") is not None:
            stack[-1].append(("bnode", match.group("bnode")[2:]))
        else:
            stack[-1].append(
                (
                    "lit",
                    _unescape(match.group("lex")),
                    match.group("lang") or "",
                    _unescape(match.group("dt")) if match.group("dt") else "",
                )
            )
    if len(stack) != 1:
        raise ValueError(f"unterminated quoted triple in {text!r}")
    return stack[0]


def parse_term(text: str) -> Term:
    """One serialized term (the dual of :func:`term_to_nt`) — used by the
    flat-column convention where an RDF-star quoted triple travels as its
    N-Triples serialization in the value column."""
    terms = _parse_terms(text)
    if len(terms) != 1:
        raise ValueError(f"expected one term, got {len(terms)}: {text!r}")
    return terms[0]


def parse_line(line: str) -> Optional[Tuple[Term, ...]]:
    """One N-Triples/N-Quads line -> tuple of 3 or 4 term tuples."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    terms = _parse_terms(stripped)
    if len(terms) not in (3, 4):
        raise ValueError(f"expected 3 or 4 terms, got {len(terms)}: {line!r}")
    return tuple(terms)


def read_ntriples(path: str) -> Iterator[Tuple[Term, ...]]:
    """Statements from a .nt/.nq file, in file order, duplicates kept."""
    with open(path, encoding="utf-8") as handle:
        for line in handle:
            parsed = parse_line(line)
            if parsed is not None:
                yield parsed


def term_to_nt(term: Term) -> str:
    kind = term[0]
    if kind == "iri":
        return f"<{term[1]}>"
    if kind == "bnode":
        return f"_:{term[1]}"
    if kind == "lit":
        _, lex, lang, datatype = term
        body = f'"{_escape(lex)}"'
        if lang:
            return f"{body}@{lang}"
        if datatype:
            return f"{body}^^<{datatype}>"
        return body
    if kind == "dg":
        return ""
    if kind == "qt":
        inner = " ".join(term_to_nt(sub) for sub in term[1:4])
        return f"<< {inner} >>"
    raise ValueError(f"unknown term kind {kind!r}")


def statement_to_nt(statement: Tuple[Term, ...]) -> str:
    parts = [term_to_nt(t) for t in statement]
    parts = [p for p in parts if p]
    return " ".join(parts) + " ."
