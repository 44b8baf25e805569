"""SPARQL front-end: parsing, compilation onto bgp_match, errors."""

from __future__ import annotations

import pytest

from pyjelly_spark.operators.sparql import (
    SparqlError,
    SparqlUnsupported,
    parse_sparql,
    sparql_query,
)

NS = "http://kg.example/ns#"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("f1", NS + "defines", "sym_a"),
        ("f1", NS + "defines", "sym_b"),
        ("f2", NS + "defines", "sym_a"),
        ("f1", NS + "calls", "sym_a"),
        ("f2", NS + "calls", "sym_b"),
        ("f3", NS + "calls", "sym_a"),
        ("r1", NS + "contains", "f1"),
        ("r1", NS + "contains", "f2"),
        ("r2", NS + "contains", "f3"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"])


def test_parse_plan_shape():
    plan = parse_sparql(
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT DISTINCT ?f ?sym WHERE {
          ?f kg:defines ?sym .
          OPTIONAL { ?c kg:calls ?sym }
          FILTER (?f != "f9")
        }
        ORDER BY ?f DESC(?sym) LIMIT 5
        """
    )
    br = plan["branches"]
    assert len(br) == 1
    assert br[0]["p"] == [("?f", NS + "defines", "?sym")]
    assert br[0]["o"] == [("?c", NS + "calls", "?sym")]
    assert br[0]["f"] == ["f != 'f9'"]
    assert not (br[0]["closures"] or br[0]["binds"] or br[0]["values"]
                or br[0]["minus"])
    assert plan["projection"] == ["f", "sym"]
    assert plan["distinct"] is True
    assert plan["order"] == [("f", True), ("sym", False)]
    assert plan["limit"] == 5


def test_basic_select(triples):
    out = sparql_query(
        triples,
        f'SELECT ?f WHERE {{ ?f <{NS}defines> "sym_a" }} ORDER BY ?f',
    )
    assert [r["f"] for r in out.collect()] == ["f1", "f2"]


def test_join_prefix_and_predicate_list(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?d ?c WHERE {
          ?d kg:defines ?sym ; kg:calls ?sym .
          ?r kg:contains ?c .
          FILTER (?c = ?d)
        }
        """,
    )
    # files that define AND call the same symbol: f1 (sym_a)
    assert {(r["d"], r["c"]) for r in out.collect()} == {("f1", "f1")}


def test_optional_and_bound_filter(triples):
    out = sparql_query(
        triples,
        f"""
        SELECT ?sym ?c WHERE {{
          ?d <{NS}defines> ?sym .
          OPTIONAL {{ ?c <{NS}calls> ?sym }}
          FILTER (BOUND(?c))
        }}
        """,
    )
    assert all(r["c"] is not None for r in out.collect())


def test_regex_filter_and_limit(triples):
    out = sparql_query(
        triples,
        f"""
        SELECT DISTINCT ?f WHERE {{
          ?f <{NS}defines> ?s FILTER (REGEX(?f, "^f[12]$"))
        }} ORDER BY ?f LIMIT 1
        """,
    )
    assert [r["f"] for r in out.collect()] == ["f1"]


def test_star_projection(triples):
    out = sparql_query(
        triples, f'SELECT * WHERE {{ ?r <{NS}contains> ?f }}'
    )
    assert sorted(out.columns) == ["f", "r"]
    assert out.count() == 3


def test_errors(triples):
    with pytest.raises(SparqlUnsupported):
        parse_sparql(
            "SELECT ?x WHERE { SERVICE <http://remote/sparql> { ?x ?p ?o } }"
        )
    with pytest.raises(SparqlUnsupported):
        parse_sparql(
            "SELECT ?x WHERE { GRAPH ?g { GRAPH ?h { ?x ?p ?o } } }"
        )
    with pytest.raises(SparqlError):
        parse_sparql("SELECT WHERE { ?x ?p ?o }")
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?x WHERE { ?x kg:defines ?o }")  # no prefix
    with pytest.raises(SparqlError):
        sparql_query(triples, "SELECT ?nope WHERE { ?x ?p ?o }")


def test_matches_programmatic_bgp(triples):
    """The front-end and the programmatic API agree on a 3-pattern query."""
    from pyjelly_spark.operators.bgp import bgp_match

    text = sparql_query(
        triples,
        f"""
        SELECT ?r ?d ?sym ?c WHERE {{
          ?r <{NS}contains> ?d .
          ?d <{NS}defines> ?sym .
          ?c <{NS}calls> ?sym
        }}
        """,
    )
    api = bgp_match(
        triples,
        [
            ("?r", NS + "contains", "?d"),
            ("?d", NS + "defines", "?sym"),
            ("?c", NS + "calls", "?sym"),
        ],
    ).select("r", "d", "sym", "c")
    assert sorted(map(tuple, text.collect())) == sorted(
        map(tuple, api.collect())
    )


def test_union_branches(triples):
    out = sparql_query(
        triples,
        f"""
        SELECT ?f WHERE {{
          {{ ?f <{NS}defines> "sym_b" }} UNION {{ ?f <{NS}calls> "sym_b" }}
        }} ORDER BY ?f
        """,
    )
    assert [r["f"] for r in out.collect()] == ["f1", "f2"]


def test_union_disjoint_vars_null_fill(triples):
    out = sparql_query(
        triples,
        f"""
        SELECT ?d ?c WHERE {{
          {{ ?d <{NS}defines> "sym_b" }} UNION {{ ?c <{NS}calls> "sym_b" }}
        }}
        """,
    )
    assert {(r["d"], r["c"]) for r in out.collect()} == {
        ("f1", None), (None, "f2")
    }


def test_group_by_aggregates(triples):
    out = sparql_query(
        triples,
        f"""
        SELECT ?sym (COUNT(?c) AS ?n_callers)
               (COUNT(DISTINCT ?c) AS ?n_distinct) WHERE {{
          ?c <{NS}calls> ?sym
        }} GROUP BY ?sym ORDER BY ?sym
        """,
    )
    rows = {r["sym"]: (r["n_callers"], r["n_distinct"]) for r in out.collect()}
    assert rows == {"sym_a": (2, 2), "sym_b": (1, 1)}


def test_count_star_no_group(triples):
    out = sparql_query(
        triples,
        f'SELECT (COUNT(*) AS ?n) WHERE {{ ?r <{NS}contains> ?f }}',
    )
    assert out.collect()[0]["n"] == 3


def test_aggregate_validation():
    with pytest.raises(SparqlError):
        parse_sparql(
            "SELECT ?x (COUNT(?y) AS ?n) WHERE { ?x ?p ?y }"
        )  # ?x not grouped
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?x WHERE { ?x ?p ?y } GROUP BY ?x")


# -- round-2 extensions: paths, VALUES/BIND/MINUS, ASK/CONSTRUCT -------


@pytest.fixture(scope="module")
def chain(spark):
    """a -knows-> b -knows-> c -knows-> d -knows-> b (cycle), plus a
    likes edge and a name leaf."""
    K = "http://x/knows"
    rows = [
        ("a", K, "b"),
        ("b", K, "c"),
        ("c", K, "d"),
        ("d", K, "b"),
        ("a", "http://x/likes", "z"),
        ("d", "http://x/name", "Dee"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"])


K = "http://x/knows"


def test_path_plus_seeded(chain):
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <a> <{K}>+ ?y }} ORDER BY ?y")
    assert [r.y for r in out.collect()] == ["b", "c", "d"]


def test_path_plus_seed_in_cycle(chain):
    # b->c->d->b: the seed itself is reachable in >= 1 step
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <b> <{K}>+ ?y }} ORDER BY ?y")
    assert [r.y for r in out.collect()] == ["b", "c", "d"]


def test_path_star_and_optional_mod(chain):
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <a> <{K}>* ?y }} ORDER BY ?y")
    assert [r.y for r in out.collect()] == ["a", "b", "c", "d"]
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <a> <{K}>? ?y }} ORDER BY ?y")
    assert [r.y for r in out.collect()] == ["a", "b"]


def test_path_backward_seed(chain):
    out = sparql_query(chain, f"SELECT ?x WHERE {{ ?x <{K}>+ <c> }} ORDER BY ?x")
    assert [r.x for r in out.collect()] == ["a", "b", "c", "d"]


def test_path_var_var_and_self_cycle(chain):
    out = sparql_query(
        chain,
        f"SELECT ?x ?y WHERE {{ ?x <{K}>+ ?y . ?y <http://x/name> ?n }}",
    )
    assert sorted((r.x, r.y) for r in out.collect()) == [
        ("a", "d"), ("b", "d"), ("c", "d"), ("d", "d"),
    ]
    out = sparql_query(chain, f"SELECT ?x WHERE {{ ?x <{K}>+ ?x }} ORDER BY ?x")
    assert [r.x for r in out.collect()] == ["b", "c", "d"]


def test_path_sequence_inverse_alternation(chain):
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <a> <{K}>/<{K}> ?y }}")
    assert [r.y for r in out.collect()] == ["c"]
    out = sparql_query(chain, f"SELECT ?y WHERE {{ <b> ^<{K}> ?y }} ORDER BY ?y")
    assert [r.y for r in out.collect()] == ["a", "d"]
    out = sparql_query(
        chain,
        f"SELECT ?y WHERE {{ <a> (<{K}>|<http://x/likes>) ?y }} ORDER BY ?y",
    )
    assert [r.y for r in out.collect()] == ["b", "z"]
    out = sparql_query(
        chain, f"SELECT ?n WHERE {{ <a> <{K}>+/<http://x/name> ?n }}"
    )
    assert [r.n for r in out.collect()] == ["Dee"]


def test_values_single_and_undef(chain):
    out = sparql_query(
        chain,
        f'SELECT ?s ?o WHERE {{ ?s <{K}> ?o . VALUES ?s {{ "a" "b" }} }} ORDER BY ?s',
    )
    assert [(r.s, r.o) for r in out.collect()] == [("a", "b"), ("b", "c")]
    out = sparql_query(
        chain,
        f'SELECT ?s ?o WHERE {{ ?s <{K}> ?o . '
        f'VALUES (?s ?o) {{ ("a" UNDEF) (UNDEF "d") }} }} ORDER BY ?s',
    )
    assert [(r.s, r.o) for r in out.collect()] == [("a", "b"), ("c", "d")]


def test_values_trailing(chain):
    out = sparql_query(
        chain,
        f'SELECT ?s ?o WHERE {{ ?s <{K}> ?o }} VALUES ?s {{ "a" }}',
    )
    assert [(r.s, r.o) for r in out.collect()] == [("a", "b")]


def test_bind(chain):
    out = sparql_query(
        chain,
        f'SELECT ?s ?tag WHERE {{ ?s <http://x/name> ?n . '
        f'BIND(CONCAT(?n, "!") AS ?tag) }}',
    )
    assert [(r.s, r.tag) for r in out.collect()] == [("d", "Dee!")]


def test_minus(chain):
    out = sparql_query(
        chain,
        f"SELECT ?s WHERE {{ ?s <{K}> ?o . "
        f"MINUS {{ ?s <http://x/likes> ?z }} }} ORDER BY ?s",
    )
    assert [r.s for r in out.collect()] == ["b", "c", "d"]


def test_ask(chain):
    assert sparql_query(chain, f"ASK {{ <a> <{K}> ?x }}").collect()[0].ask
    assert not sparql_query(chain, f"ASK WHERE {{ <zz> <{K}> ?x }}").collect()[0].ask


def test_construct(chain):
    out = sparql_query(
        chain,
        f"PREFIX x: <http://x/> "
        f"CONSTRUCT {{ ?a x:reaches ?b }} WHERE {{ ?a x:knows+ ?b }}",
    )
    got = sorted((r.s, r.p, r.o) for r in out.collect())
    assert all(p == "http://x/reaches" for _, p, _ in got)
    assert [(s, o) for s, _, o in got] == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "b"), ("b", "c"), ("b", "d"),
        ("c", "b"), ("c", "c"), ("c", "d"),
        ("d", "b"), ("d", "c"), ("d", "d"),
    ]


def test_having_offset(chain):
    out = sparql_query(
        chain,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } "
        "GROUP BY ?s HAVING (?n >= 2) ORDER BY ?s",
    )
    assert [(r.s, r.n) for r in out.collect()] == [("a", 2), ("d", 2)]
    out = sparql_query(
        chain,
        f"SELECT ?s WHERE {{ ?s <{K}> ?o }} ORDER BY ?s OFFSET 1 LIMIT 2",
    )
    assert [r.s for r in out.collect()] == ["b", "c"]


# -- quads: GRAPH clause + DESCRIBE ------------------------------------


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        ("a", "p:knows", "b", None),
        ("b", "p:knows", "c", None),
        ("a", "p:knows", "x", "g:one"),
        ("x", "p:knows", "y", "g:one"),
        ("a", "p:knows", "z", "g:two"),
        ("a", "p:name", "Ann", None),
        ("b", "p:name", "Bob", None),
    ]
    return spark.createDataFrame(
        rows, "s string, p string, o string, g string"
    )


def test_graph_default_only(quads):
    out = sparql_query(quads, "SELECT ?o WHERE { <a> <p:knows> ?o }")
    assert [r.o for r in out.collect()] == ["b"]


def test_graph_constant_and_var(quads):
    out = sparql_query(
        quads, "SELECT ?o WHERE { GRAPH <g:one> { <a> <p:knows> ?o } }"
    )
    assert [r.o for r in out.collect()] == ["x"]
    out = sparql_query(
        quads,
        "SELECT ?g ?o WHERE { GRAPH ?g { <a> <p:knows> ?o } } ORDER BY ?g",
    )
    assert [(r.g, r.o) for r in out.collect()] == [
        ("g:one", "x"), ("g:two", "z"),
    ]


def test_graph_joins_with_default(quads):
    out = sparql_query(
        quads,
        'SELECT ?o2 WHERE { <a> <p:knows> ?m . '
        'GRAPH <g:one> { ?m2 <p:knows> ?o2 } FILTER (?m2 = "x") }',
    )
    assert [r.o2 for r in out.collect()] == ["y"]


def test_graph_requires_quads(quads):
    with pytest.raises(SparqlError):
        sparql_query(
            quads.select("s", "p", "o"),
            "SELECT ?o WHERE { GRAPH <g:one> { <a> <p:knows> ?o } }",
        ).collect()


def test_path_on_quads_walks_default_graph(quads):
    out = sparql_query(
        quads, "SELECT ?y WHERE { <a> <p:knows>+ ?y } ORDER BY ?y"
    )
    assert [r.y for r in out.collect()] == ["b", "c"]


def test_describe(quads):
    out = sparql_query(quads, 'DESCRIBE ?x WHERE { ?x <p:knows> "b" }')
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "p:knows", "b"), ("a", "p:name", "Ann"),
    ]
    out = sparql_query(quads, "DESCRIBE <b>")
    assert sorted(tuple(r) for r in out.collect()) == [
        ("b", "p:knows", "c"), ("b", "p:name", "Bob"),
    ]


def test_filter_exists(chain):
    out = sparql_query(
        chain,
        f"SELECT ?s WHERE {{ ?s <{K}> ?o . "
        f"FILTER EXISTS {{ ?s <http://x/likes> ?z }} }}",
    )
    assert [r.s for r in out.collect()] == ["a"]
    out = sparql_query(
        chain,
        f"SELECT ?s WHERE {{ ?s <http://x/likes> ?o . "
        f"FILTER NOT EXISTS {{ ?s <http://x/name> ?z }} }}",
    )
    assert [r.s for r in out.collect()] == ["a"]


def test_filter_builtins(chain):
    out = sparql_query(
        chain,
        'SELECT ?s WHERE { ?s <http://x/name> ?n . '
        'FILTER (STRSTARTS(?n, "De") && STRLEN(?n) = 3) }',
    )
    assert [r.s for r in out.collect()] == ["d"]
    out = sparql_query(
        chain,
        'SELECT ?s WHERE { ?s <http://x/name> ?n . '
        'FILTER (CONTAINS(UCASE(?n), "EE")) }',
    )
    assert [r.s for r in out.collect()] == ["d"]


def test_construct_solution_modifiers(chain):
    out = sparql_query(
        chain,
        f"CONSTRUCT {{ ?s <http://x/e> ?o }} "
        f"WHERE {{ ?s <{K}> ?o }} ORDER BY ?s LIMIT 2",
    )
    assert sorted((r.s, r.o) for r in out.collect()) == [
        ("a", "b"), ("b", "c"),
    ]


def test_path_closure_differential_random(spark):
    """Seeded random graphs vs a pure-Python transitive closure: the
    var-var semi-naive path and the seeded-BFS path must both agree with
    brute force, including cyclic graphs and the zero-length (*) rule."""
    import random

    rng = random.Random(7)
    nodes = ["n0", "n1", "n2", "n3", "n4"]

    def py_closure(edges):
        pairs = set(edges)
        while True:
            new = {(a, d) for a, b in pairs for c, d in edges if b == c}
            if new <= pairs:
                return pairs
            pairs |= new

    for case in range(8):
        edges = sorted({
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(rng.randint(2, 9))
        })
        rows = [(a, "p:e", b) for a, b in edges]
        # a second predicate as noise
        rows += [(rng.choice(nodes), "p:x", rng.choice(nodes))]
        g = spark.createDataFrame(rows, ["s", "p", "o"])
        expected = sorted(py_closure(edges))

        out = sparql_query(g, "SELECT ?x ?y WHERE { ?x <p:e>+ ?y }")
        got = sorted((r.x, r.y) for r in out.collect())
        assert got == expected, (case, edges)

        # seeded: forward from a random constant
        seed = rng.choice(nodes)
        exp_fwd = sorted({b for a, b in expected if a == seed})
        out = sparql_query(g, f"SELECT ?y WHERE {{ <{seed}> <p:e>+ ?y }}")
        assert sorted(r.y for r in out.collect()) == exp_fwd, (case, seed, edges)

        # star adds zero-length pairs over every graph term
        terms = sorted({t for r in rows for t in (r[0], r[2])})
        exp_star = sorted(set(expected) | {(t, t) for t in terms})
        out = sparql_query(g, "SELECT ?x ?y WHERE { ?x <p:e>* ?y }")
        assert sorted((r.x, r.y) for r in out.collect()) == exp_star, (case, edges)


def test_subquery_whole_where(chain):
    out = sparql_query(
        chain,
        f"SELECT ?s ?n WHERE {{ "
        f"{{ SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{K}> ?o }} GROUP BY ?s }} "
        f"}} ORDER BY ?s",
    )
    assert [(r.s, r.n) for r in out.collect()] == [
        ("a", 1), ("b", 1), ("c", 1), ("d", 1),
    ]


def test_subquery_joined_with_outer(chain):
    out = sparql_query(
        chain,
        f"""
        SELECT ?s ?name ?n WHERE {{
          ?s <http://x/name> ?name .
          {{ SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }} GROUP BY ?s }}
        }}
        """,
    )
    assert [(r.s, r.name, r.n) for r in out.collect()] == [("d", "Dee", 2)]


def test_subquery_with_limit(chain):
    # top-1 subject by out-degree, then decorate with its name
    out = sparql_query(
        chain,
        f"""
        SELECT ?name WHERE {{
          ?s <http://x/name> ?name .
          {{ SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }}
             GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 2 }}
        }}
        """,
    )
    assert [r.name for r in out.collect()] == ["Dee"]


def test_subquery_rejected_in_optional(chain):
    with pytest.raises(SparqlUnsupported):
        parse_sparql(
            f"SELECT ?s WHERE {{ ?s ?p ?o . "
            f"OPTIONAL {{ {{ SELECT ?s WHERE {{ ?s ?p ?o }} }} }} }}"
        )


# -- SPARQL UPDATE -----------------------------------------------------


@pytest.fixture()
def upd_graph(spark):
    rows = [
        ("a", "p:knows", "b"),
        ("b", "p:knows", "c"),
        ("a", "p:type", "person"),
        ("b", "p:type", "person"),
    ]
    return spark.createDataFrame(rows, ["s", "p", "o"]), rows


def _s(df):
    return sorted(tuple(r) for r in df.collect())


def test_update_insert_delete_data(upd_graph):
    from pyjelly_spark.operators.sparql import sparql_update

    g, rows = upd_graph
    out = sparql_update(g, 'INSERT DATA { <z> <p:type> "robot" }')
    assert _s(out) == sorted(set(rows) | {("z", "p:type", "robot")})
    out = sparql_update(g, "DELETE DATA { <a> <p:knows> <b> }")
    assert _s(out) == sorted(set(rows) - {("a", "p:knows", "b")})


def test_update_delete_where(upd_graph):
    from pyjelly_spark.operators.sparql import sparql_update

    g, rows = upd_graph
    out = sparql_update(g, "DELETE WHERE { ?s <p:type> ?t }")
    assert _s(out) == [("a", "p:knows", "b"), ("b", "p:knows", "c")]


def test_update_delete_insert_where(upd_graph):
    from pyjelly_spark.operators.sparql import sparql_update

    g, rows = upd_graph
    out = sparql_update(
        g,
        "DELETE { ?s <p:type> ?t } INSERT { ?s <p:category> ?t } "
        "WHERE { ?s <p:type> ?t }",
    )
    assert _s(out) == sorted(
        [("a", "p:knows", "b"), ("b", "p:knows", "c"),
         ("a", "p:category", "person"), ("b", "p:category", "person")]
    )


def test_update_insert_with_path(upd_graph):
    from pyjelly_spark.operators.sparql import sparql_update

    g, rows = upd_graph
    out = sparql_update(
        g, "INSERT { ?x <p:reaches> ?y } WHERE { ?x <p:knows>+ ?y }"
    )
    got = set(_s(out))
    assert {("a", "p:reaches", "b"), ("a", "p:reaches", "c"),
            ("b", "p:reaches", "c")} <= got


def test_update_errors(upd_graph):
    from pyjelly_spark.operators.sparql import sparql_update

    g, rows = upd_graph
    with pytest.raises(SparqlError):
        sparql_update(g, "INSERT DATA { ?v <p:x> <p:y> }")  # not ground
    with pytest.raises(SparqlError):
        sparql_update(g, "WHERE { ?s ?p ?o }")  # changes nothing


def test_sample_and_group_concat(chain):
    out = sparql_query(
        chain,
        f"""
        SELECT ?s (GROUP_CONCAT(?o; SEPARATOR="|") AS ?objs)
               (SAMPLE(?o) AS ?one) WHERE {{ ?s <{K}> ?o }}
        GROUP BY ?s ORDER BY ?s
        """,
    )
    rows = [(r.s, r.objs, r.one) for r in out.collect()]
    assert rows == [("a", "b", "b"), ("b", "c", "c"),
                    ("c", "d", "d"), ("d", "b", "b")]
    out = sparql_query(
        chain,
        "SELECT (GROUP_CONCAT(DISTINCT ?o) AS ?objs) WHERE { ?s ?p ?o }",
    )
    assert out.collect()[0].objs == "Dee b c d z"


def test_parser_totality_fuzz():
    """The parser is a total function: any input either parses or
    raises SparqlError — never IndexError/KeyError/RecursionError.
    Seeded: prefix truncations of a kitchen-sink query, random
    character soup, and token-level shuffles."""
    import random

    valid = """PREFIX kg: <http://kg.example/ns#>
SELECT ?sym (COUNT(DISTINCT ?x) AS ?n) WHERE {
  { ?x kg:defines ?sym } UNION { ?x kg:calls+ ?sym }
  FILTER (STRSTARTS(?sym, "f") && BOUND(?x))
  OPTIONAL { ?x kg:lang ?l }
  VALUES ?l { "python" UNDEF }
  MINUS { ?x kg:sha256 ?h }
} GROUP BY ?sym HAVING (?n > 1) ORDER BY DESC(?n) LIMIT 5 OFFSET 1"""

    def check(q):
        try:
            parse_sparql(q)
        except SparqlError:
            pass  # the contract: SparqlError or success, nothing else

    rng = random.Random(1)
    for i in range(len(valid)):
        check(valid[:i])
    alphabet = list('?{}()<>."; selectwhreabc|^+*/!&=,') + list("ABC?")
    for _ in range(1500):
        check("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
    toks = valid.split()
    for _ in range(500):
        t = toks[:]
        rng.shuffle(t)
        check(" ".join(t[: rng.randint(1, len(t))]))


def test_negated_property_set_single(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?s ?o WHERE { ?s !kg:defines ?o . FILTER (?s = "f1") }
        """,
    ).collect()
    got = {(r["s"], r["o"]) for r in out}
    assert got == {("f1", "sym_a")}  # only the calls edge survives


def test_negated_property_set_group(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?s ?o WHERE { ?s !(kg:defines|kg:calls) ?o }
        """,
    ).collect()
    got = {(r["s"], r["o"]) for r in out}
    assert got == {("r1", "f1"), ("r1", "f2"), ("r2", "f3")}  # contains only


def test_negated_property_set_inverse(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?o WHERE { ?o ^!(kg:defines|kg:calls) "r2" }
        """,
    ).collect()
    assert {r["o"] for r in out} == {"f3"}


def test_negated_set_closure_rejected(triples):
    with pytest.raises(SparqlUnsupported):
        sparql_query(
            triples,
            "SELECT ?s WHERE { ?s !(<p>|<q>)+ ?o }",
        )


def test_strbefore_strafter_if_in(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?sym ?head WHERE {
          ?f kg:defines ?sym .
          BIND (STRBEFORE(?sym, "_") AS ?head)
          FILTER (STRAFTER(?sym, "_") IN ("a", "b"))
          FILTER (IF(?f = "f1", "yes", "no") = "yes")
        }
        """,
    ).collect()
    got = {(r["sym"], r["head"]) for r in out}
    assert got == {("sym_a", "sym"), ("sym_b", "sym")}


def test_strbefore_not_found_is_empty(triples):
    out = sparql_query(
        triples,
        """
        PREFIX kg: <http://kg.example/ns#>
        SELECT ?sym WHERE {
          ?f kg:defines ?sym .
          FILTER (STRBEFORE(?sym, "zzz") = "" && STRAFTER(?sym, "") = ?sym)
        }
        """,
    ).collect()
    assert len(out) == 3  # all defines rows: both identities hold


# --- RDF-star (SPARQL-star quoted-triple patterns) --------------------------


@pytest.fixture(scope="module")
def star_triples(spark):
    rows = [
        ("<< <http://x/f1> <http://x/imports> <http://x/m1> >>",
         "http://x/certainty", "0.9"),
        ("<< <http://x/f2> <http://x/imports> <http://x/m2> >>",
         "http://x/certainty", "0.4"),
        ('<< <http://x/f1> <http://x/defines> "fn main" >>',
         "http://x/certainty", "0.7"),
        ("<< _:b1 <http://x/imports> <http://x/m3> >>",
         "http://x/certainty", "0.5"),
        ("http://x/f1", "http://x/type", "file"),
    ]
    return spark.createDataFrame(rows, "s: string, p: string, o: string")


def test_quoted_pattern_binds_inner_vars(star_triples):
    out = sparql_query(
        star_triples,
        "SELECT ?f ?m ?c WHERE { << ?f <http://x/imports> ?m >> "
        '<http://x/certainty> ?c . FILTER (?c >= "0.5") }',
    ).collect()
    got = {(r["f"], r["m"], r["c"]) for r in out}
    assert got == {
        ("http://x/f1", "http://x/m1", "0.9"),
        ("b1", "http://x/m3", "0.5"),  # bnode label decoded
    }


def test_quoted_pattern_literal_object_and_join(star_triples):
    out = sparql_query(
        star_triples,
        "SELECT ?what ?c WHERE { "
        "<< ?f <http://x/defines> ?what >> <http://x/certainty> ?c . "
        '?f <http://x/type> "file" . }',
    ).collect()
    assert {(r["what"], r["c"]) for r in out} == {("fn main", "0.7")}


def test_quoted_pattern_inner_constants(star_triples):
    # all three inner slots constant: pure existence filter on the qt
    out = sparql_query(
        star_triples,
        "SELECT ?c WHERE { "
        "<< <http://x/f2> <http://x/imports> <http://x/m2> >> "
        "<http://x/certainty> ?c . }",
    ).collect()
    assert [r["c"] for r in out] == ["0.4"]


def test_whole_qt_term_still_binds_serialization(star_triples):
    out = sparql_query(
        star_triples,
        'SELECT ?qt WHERE { ?qt <http://x/certainty> "0.9" . }',
    ).collect()
    assert out[0]["qt"].startswith("<< <http://x/f1>")


def test_nested_quoted_pattern_unsupported(star_triples):
    with pytest.raises(SparqlUnsupported):
        sparql_query(
            star_triples,
            "SELECT ?c WHERE { << << ?a ?b ?x >> ?p ?o >> "
            "<http://x/certainty> ?c . }",
        )


def test_quoted_pattern_repeated_inner_var(spark):
    # self-referential annotation: << ?x ?p ?x >> matches only the
    # self-loop quoted triple
    rows = [
        ("<< <http://x/n1> <http://x/link> <http://x/n1> >>",
         "http://x/w", "1"),
        ("<< <http://x/n1> <http://x/link> <http://x/n2> >>",
         "http://x/w", "2"),
    ]
    t = spark.createDataFrame(rows, "s: string, p: string, o: string")
    out = sparql_query(
        t, "SELECT ?x ?w WHERE { << ?x <http://x/link> ?x >> "
           "<http://x/w> ?w . }"
    ).collect()
    assert {(r["x"], r["w"]) for r in out} == {("http://x/n1", "1")}


def test_order_by_expression(spark):
    rows = [("s1", "p", "alpha"), ("s2", "p", "bee"), ("s3", "p", "cc")]
    t = spark.createDataFrame(rows, "s: string, p: string, o: string")
    out = sparql_query(
        t, "SELECT ?s ?o WHERE { ?s <p> ?o . } "
           "ORDER BY DESC(STRLEN(?o)) ?s LIMIT 2"
    ).collect()
    assert [(r["s"], r["o"]) for r in out] == [("s1", "alpha"), ("s2", "bee")]
    out2 = sparql_query(
        t, "SELECT ?s WHERE { ?s <p> ?o . } ORDER BY STRLEN(?o)"
    ).collect()
    assert [r["s"] for r in out2] == ["s3", "s2", "s1"]


def test_construct_star_roundtrips_through_matcher(spark):
    rows = [
        ("http://x/f1", "http://x/imports", "http://x/m1"),
        ("http://x/f2", "http://x/imports", "http://x/m2"),
        ("http://x/f1", "http://x/defines", "fn main"),
    ]
    t = spark.createDataFrame(rows, "s: string, p: string, o: string")
    ann = sparql_query(
        t,
        'CONSTRUCT { << ?f <http://x/imports> ?m >> '
        '<http://x/source> "scan" . } '
        "WHERE { ?f <http://x/imports> ?m . }",
    )
    got = {r["s"] for r in ann.collect()}
    assert got == {
        "<< <http://x/f1> <http://x/imports> <http://x/m1> >>",
        "<< <http://x/f2> <http://x/imports> <http://x/m2> >>",
    }
    back = sparql_query(
        ann,
        "SELECT ?f ?m WHERE { << ?f <http://x/imports> ?m >> "
        '<http://x/source> "scan" . }',
    ).collect()
    assert {(r["f"], r["m"]) for r in back} == {
        ("http://x/f1", "http://x/m1"),
        ("http://x/f2", "http://x/m2"),
    }


def test_construct_star_literal_object_serializes_quoted(spark):
    t = spark.createDataFrame(
        [("http://x/f1", "http://x/defines", "fn main")],
        "s: string, p: string, o: string",
    )
    out = sparql_query(
        t,
        'CONSTRUCT { << ?f <http://x/defines> ?d >> <http://x/w> "1" . } '
        "WHERE { ?f <http://x/defines> ?d . }",
    ).collect()
    assert out[0]["s"] == '<< <http://x/f1> <http://x/defines> "fn main" >>'


# --- xsd casts / isNumeric / term-kind refusals ------------------------------


@pytest.fixture(scope="module")
def typed_triples(spark):
    rows = [
        ("f1", "http://x/p", "5"),
        ("f2", "http://x/p", "12"),
        ("f3", "http://x/p", "oops"),
        ("f1", "http://x/q", "f2"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_xsd_cast_filter_value_space(typed_triples):
    """xsd:integer(?v) compares in value space (string compare would put
    '12' < '5'); non-numeric lexical forms are eliminated, not fatal."""
    out = sparql_query(
        typed_triples,
        'SELECT ?s WHERE { ?s <http://x/p> ?v . FILTER(xsd:integer(?v) > 10) }',
    ).collect()
    assert [r["s"] for r in out] == ["f2"]


def test_xsd_cast_in_bind_and_order(typed_triples):
    out = sparql_query(
        typed_triples,
        'SELECT ?s ?n WHERE { ?s <http://x/p> ?v . FILTER(isNumeric(?v)) '
        'BIND(xsd:integer(?v) * 2 AS ?n) } ORDER BY DESC(xsd:integer(?v))',
    ).collect()
    assert [(r["s"], r["n"]) for r in out] == [("f2", 24), ("f1", 10)]


def test_is_numeric_try_cast_never_aborts(typed_triples):
    # ANSI mode: a plain CAST('oops' AS DOUBLE) would throw mid-job
    out = sparql_query(
        typed_triples,
        'SELECT ?s WHERE { ?s <http://x/p> ?v . FILTER(isNumeric(?v)) }',
    ).collect()
    assert sorted(r["s"] for r in out) == ["f1", "f2"]


def test_term_kind_builtins_refuse_loudly(typed_triples):
    for fn in ("isIRI", "isBlank", "isLiteral", "LANG", "DATATYPE"):
        with pytest.raises(SparqlUnsupported):
            sparql_query(
                typed_triples,
                f'SELECT ?o WHERE {{ ?s ?p ?o . FILTER({fn}(?o)) }}',
            )


def test_optional_dot_after_filter_and_bind(typed_triples):
    out = sparql_query(
        typed_triples,
        'SELECT ?s ?n WHERE { ?s <http://x/p> ?v . '
        'FILTER(isNumeric(?v)) . BIND(xsd:integer(?v) AS ?n) . }',
    ).collect()
    assert sorted(r["s"] for r in out) == ["f1", "f2"]


def test_sparql_query_with_stats_same_bag(spark):
    from pyjelly_spark.operators.bgp import void_stats
    from pyjelly_spark.operators.sparql import sparql_query

    triples = spark.createDataFrame(
        [
            ("r1", "http://ex/contains", "f1"),
            ("f1", "http://ex/defines", "x"),
            ("f2", "http://ex/calls", "x"),
        ],
        "s: string, p: string, o: string",
    )
    q = """
    SELECT ?repo ?caller WHERE {
      ?repo <http://ex/contains> ?file .
      ?file <http://ex/defines> ?sym .
      ?caller <http://ex/calls> ?sym .
    }
    """
    want = sorted(map(tuple, sparql_query(triples, q).collect()))
    got = sorted(
        map(tuple, sparql_query(triples, q, stats=void_stats(triples)).collect())
    )
    assert got == want == [("r1", "f2")]


def test_bgp_stats_context_scopes_and_resets(spark):
    from pyjelly_spark.operators.bgp import _STATS_CTX, bgp_match, bgp_stats

    triples = spark.createDataFrame(
        [("s", "p", "o")], "s: string, p: string, o: string"
    )
    assert _STATS_CTX.get() is None
    with bgp_stats({"p": (1, 1, 1)}):
        assert _STATS_CTX.get() == {"p": (1, 1, 1)}
        rows = bgp_match(triples, [("?x", "p", "?y")]).collect()
        assert [(r["x"], r["y"]) for r in rows] == [("s", "o")]
    assert _STATS_CTX.get() is None
