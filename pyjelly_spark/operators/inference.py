"""RDFS-style ontology inference (materialization) over a triples frame.

Distributed forward-chaining for the core RDFS entailment rules, the
materialization pass a KG-construction pipeline runs between extraction
and serialization so downstream consumers query the *closed* graph:

- rdfs5  subPropertyOf transitivity
- rdfs7  property inheritance: ``(s p o), (p sub q) -> (s q o)``
- rdfs11 subClassOf transitivity
- rdfs9  type inheritance:     ``(x type c1), (c1 sub c2) -> (x type c2)``
- rdfs2  domain:               ``(s p o), (p domain c) -> (s type c)``
- rdfs3  range:                ``(s p o), (p range c)  -> (o type c)``

Reference parity: pyjelly serializes/parses RDF but performs no
entailment — inference over a parsed graph is delegated to rdflib/OWL-RL
on the driver (the reference materializes a ``Graph`` and leaves
reasoning to the host application).  Here the same capability runs as a
distributed DataFrame program over the triples the pipeline emits.

Execution shape (100 TB graph, small ontology — the realistic regime):

- The schema hierarchies (``subClassOf``/``subPropertyOf``) are closed
  first over the *schema only* — a few hundred rows, compiled
  driver-side (running them as Spark jobs would cost ~10 tiny shuffles
  of pure scheduling latency for zero benefit).
- The ontology is then **compiled into a dispatch table** (the
  WebPIE/Inferray trick): for every instance predicate the table lists
  every conclusion an instance triple with that predicate yields —
  identity, each super-property (rdfs7), each domain/range class
  *pre-composed with its subclass supers* (rdfs2/3 ∘ rdfs9) — collected
  into one array per predicate.  A second table maps each class to
  itself plus its supers (rdfs9 for asserted types).
- The instance data is scanned exactly TWICE (non-type triples ⋈
  dispatch, type triples ⋈ class table), each a map-side broadcast
  left-join + ``explode`` — fan-out happens inside one whole-stage
  codegen pass, never as plan-level union branches that would rescan a
  10^12-row input once per rule.
- The only full shuffle is ONE ``groupBy(s, p, o)`` at the end that
  simultaneously dedups rule outputs (rdfs2/3 conclusions can coincide
  with asserted types) and computes the ``asserted`` flag as ``max``
  over the tagged emissions.

The rule set is stratified (hierarchy closure -> rdfs7 -> rdfs2/3 ->
rdfs9), which for RDFS is the full fixpoint: property inheritance is
applied before domain/range (so inherited predicates contribute types),
domain/range classes carry their subclass supers, and asserted types
get theirs from the class table — after which no rule can fire again.
This makes the operator one deterministic DataFrame program — no
instance-level iteration — checkable against a declarative
recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"


def transitive_closure_small(
    edges: DataFrame, max_rounds: int = 8
) -> DataFrame:
    """Non-reflexive transitive closure of a SMALL edge frame (sub, sup).

    Iterated squaring: after k rounds paths up to length 2^k are
    present, so ``max_rounds=8`` covers hierarchies 256 deep — far past
    any real ontology.  Meant for schema-sized inputs (the frame is
    joined with itself, so this is quadratic in the worst case); the
    instance-scale closure lives in ``components.bfs_reachable``.
    """
    closed = edges.select("sub", "sup").distinct()
    for _ in range(max_rounds):
        step = (
            closed.alias("a")
            .join(F.broadcast(closed.alias("b")), F.col("a.sup") == F.col("b.sub"))
            .select(F.col("a.sub").alias("sub"), F.col("b.sup").alias("sup"))
        )
        grown = closed.unionByName(step).distinct()
        # Schema-sized: a count per round is cheap and gives a real
        # fixpoint test instead of always running all rounds.
        if grown.count() == closed.count():
            break
        closed = grown
    return closed


def rdfs_materialize(
    instance: DataFrame,
    schema: DataFrame,
) -> DataFrame:
    """Return the RDFS closure of ``instance`` under ``schema``.

    Both inputs are flat ``(s, p, o)`` string frames.  ``schema`` holds
    the ontology triples (subClassOf / subPropertyOf / domain / range);
    ``instance`` holds the data.  Output is the closed graph with an
    ``asserted`` boolean column (false = derived by some rule and not
    asserted in the input).

    RDFS is exactly OWL-Horst with no OWL constructs, so this delegates
    to :func:`owl_horst_materialize` — the ontology compiles driver-side
    (it is tiny by contract; doing the hierarchy closure as Spark jobs
    costs ~10 tiny shuffles of pure scheduling latency for zero
    benefit), and the instance-side plan is the same two-scan broadcast
    dispatch + one groupBy.
    """
    return owl_horst_materialize(instance, schema)


OWL_INVERSE = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"


def _horst_templates(schema_rows):
    """Compile the property schema into per-predicate conclusion
    templates with orientation (the pD*/OWL-Horst property rules).

    Returns ``(templates, trans, sco, dom, rng)`` where ``templates``
    maps each predicate p to the set of ``(q, flipped)`` conclusions an
    edge (s, p, o) yields: (s, q, o) when not flipped, (o, q, s) when
    flipped.  Reachability over the tiny (pred, orientation) graph with
    transitions: subPropertyOf keeps orientation, inverseOf toggles it,
    SymmetricProperty toggles it in place.  Pure driver-side Python —
    the schema is tiny by contract.
    """
    spp, inv, sym, trans = set(), set(), set(), set()
    sco, dom, rng = set(), set(), set()
    for s, p, o in schema_rows:
        if p == RDFS_SUBPROP:
            spp.add((s, o))
        elif p == OWL_INVERSE:
            inv.add((s, o))
        elif p == RDF_TYPE and o == OWL_SYMMETRIC:
            sym.add(s)
        elif p == RDF_TYPE and o == OWL_TRANSITIVE:
            trans.add(s)
        elif p == RDFS_SUBCLASS:
            sco.add((s, o))
        elif p == RDFS_DOMAIN:
            dom.add((s, o))
        elif p == RDFS_RANGE:
            rng.add((s, o))
    preds = (
        {x for e in spp for x in e}
        | {x for e in inv for x in e}
        | sym
        | trans
        | {p for p, _ in dom}
        | {p for p, _ in rng}
    )
    if RDF_TYPE in preds:
        raise ValueError(
            "owl_horst_materialize: rdf:type may not appear in the "
            "property schema (meta-ontology is unsupported)"
        )

    def reach(p):
        seen = {(p, False)}
        todo = [(p, False)]
        while todo:
            q, f = todo.pop()
            nxt = set()
            nxt.update((q2, f) for q1, q2 in spp if q1 == q)
            nxt.update((q2, not f) for q1, q2 in inv if q1 == q)
            nxt.update((q1, not f) for q1, q2 in inv if q2 == q)
            if q in sym:
                nxt.add((q, not f))
            for t in nxt - seen:
                seen.add(t)
                todo.append(t)
        return seen

    templates = {p: reach(p) for p in preds}
    for t in trans:
        others = {q for q, _ in templates.get(t, set())} & trans - {t}
        if others:
            raise ValueError(
                f"owl_horst_materialize: transitive property {t} derives "
                f"into other transitive properties {sorted(others)} — "
                "interleaved closures are unsupported (stratify the "
                "ontology or materialize in two calls)"
            )
    # Close the class hierarchy (plain reachability, tiny).
    sco_closed = set(sco)
    changed = True
    while changed:
        step = {
            (a, d) for a, b in sco_closed for c, d in sco_closed if b == c
        }
        changed = not step <= sco_closed
        sco_closed |= step
    return templates, trans, sco_closed, dom, rng


def owl_horst_materialize(
    instance: DataFrame,
    schema: DataFrame,
    *,
    closure_rounds: int = 30,
) -> DataFrame:
    """OWL-Horst (pD*) property reasoning: RDFS plus ``owl:inverseOf``,
    ``owl:SymmetricProperty`` and ``owl:TransitiveProperty``.

    Same compiled-dispatch shape as :func:`rdfs_materialize` — the
    property rules collapse into per-predicate templates applied in ONE
    scan — plus, for each declared transitive property, a distributed
    semi-naive closure (delta join + anti-join per round, lineage
    truncated with ``localCheckpoint``, the same discipline as the
    CC/BFS loops) over that predicate's complete pre-closure edge set,
    whose new pairs then take a second template pass.  Stratification
    is sound because a transitive predicate's incoming derivations all
    exist before its closure runs; ontologies where one transitive
    property derives into another are REFUSED loudly (see
    ``_horst_templates``).

    Output: ``(s, p, o, asserted)`` like ``rdfs_materialize``.
    """
    schema_rows = [(r[0], r[1], r[2]) for r in schema.collect()]
    templates, trans, sco, dom, rng = _horst_templates(schema_rows)
    spark = instance.sparkSession

    # Pre-compose domain/range with the closed class hierarchy.
    def classes_up(c):
        return {c} | {d for a, d in sco if a == c}

    dom_all = {}
    rng_all = {}
    for p, c in dom:
        dom_all.setdefault(p, set()).update(classes_up(c))
    for p, c in rng:
        rng_all.setdefault(p, set()).update(classes_up(c))

    # Emission rows: (key_pred, out_p, src_slot, const_o, asserted).
    # src_slot 's'/'o' picks the output subject; const_o not-null means
    # a type conclusion whose subject is the picked slot.
    def emissions_for(p, include_identity):
        rows = []
        if include_identity:
            rows.append((p, p, "s", None, True))
        for q, flipped in sorted(templates.get(p, set())):
            if (q, flipped) != (p, False):
                rows.append((p, q, "o" if flipped else "s", None, False))
            for c in sorted(dom_all.get(q, ())):
                rows.append((p, RDF_TYPE, "o" if flipped else "s", c, False))
            for c in sorted(rng_all.get(q, ())):
                rows.append((p, RDF_TYPE, "s" if flipped else "o", c, False))
        return rows

    emit_schema = (
        "p string, out_p string, src string, const_o string, asserted boolean"
    )

    def apply_templates(edges, rows, default_identity):
        """One scan: edges ⋈ broadcast(per-pred emission arrays), explode."""
        if not rows:
            if not default_identity:
                return spark.createDataFrame(
                    [], "s string, p string, o string, asserted boolean"
                )
            return edges.select(
                "s", "p", "o", F.lit(True).alias("asserted")
            )
        emit_df = (
            spark.createDataFrame(rows, emit_schema)
            .groupBy("p")
            .agg(F.collect_list(
                F.struct("out_p", "src", "const_o", "asserted")
            ).alias("emits"))
        )
        emit_t = (
            "array<struct<out_p:string,src:string,"
            "const_o:string,asserted:boolean>>"
        )
        base = F.coalesce("emits", F.array().cast(emit_t))
        if default_identity:
            identity = F.struct(
                F.col("p").alias("out_p"), F.lit("s").alias("src"),
                F.lit(None).cast("string").alias("const_o"),
                F.lit(True).alias("asserted"),
            )
            # Identity is synthesized only for predicates ABSENT from the
            # emission table (present ones carry their own identity row).
            base = F.when(F.col("emits").isNull(), F.array(identity)).otherwise(
                F.col("emits")
            )
        return (
            edges.join(F.broadcast(emit_df), "p", "left")
            .select("s", "o", F.explode(base).alias("e"))
            .select(
                F.when(F.col("e.src") == "s", F.col("s"))
                .otherwise(F.col("o")).alias("s"),
                F.col("e.out_p").alias("p"),
                F.coalesce("e.const_o", F.when(
                    F.col("e.src") == "s", F.col("o")
                ).otherwise(F.col("s"))).alias("o"),
                F.col("e.asserted").alias("asserted"),
            )
        )

    edges = instance.filter(F.col("p") != RDF_TYPE).select("s", "p", "o")
    pass1_rows = [
        r for p in sorted(templates) for r in emissions_for(p, True)
    ]
    out1 = apply_templates(edges, pass1_rows, default_identity=True)

    extra = []
    for t in sorted(trans):
        # Complete pre-closure edge set of t (asserted + every derived-in
        # edge), deduped and pinned so closure rounds re-scan a leaf.
        e_t = (
            out1.filter(F.col("p") == t)
            .select(F.col("s").alias("src"), F.col("o").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # Path-doubling fixpoint: after k rounds paths up to 2^k edges
        # are present, so a diameter-D component converges in ceil(log2
        # D) rounds — one edge-hop-per-round semi-naive would need D
        # rounds, unusable on long chains. Each round is one self-join
        # + anti-join, lineage truncated per round.
        pairs = e_t
        for _ in range(closure_rounds):
            step = (
                pairs.withColumnRenamed("dst", "mid")
                .join(pairs.withColumnRenamed("src", "mid"), "mid")
                .select("src", "dst")
                .distinct()
            )
            new = step.join(pairs, ["src", "dst"], "left_anti").localCheckpoint(
                eager=True
            )
            if not new.take(1):
                break
            pairs = pairs.unionByName(new).localCheckpoint(eager=True)
        else:
            raise ValueError(
                f"owl_horst_materialize: closure of {t} did not converge "
                f"in {closure_rounds} rounds"
            )
        new_edges = (
            pairs.join(e_t, ["src", "dst"], "left_anti")
            .select(
                F.col("src").alias("s"), F.lit(t).alias("p"),
                F.col("dst").alias("o"),
            )
        )
        # Second template pass over the closure's new pairs: identity
        # (the new t edge itself) plus everything T(t) derives from it.
        extra.append(
            apply_templates(
                new_edges,
                [(t, t, "s", None, False)] + [
                    r for r in emissions_for(t, False)
                ],
                default_identity=False,
            )
        )

    # Type pass: asserted types get their closed-class supers.
    types = instance.filter(F.col("p") == RDF_TYPE).select("s", "p", "o")
    if sco:
        sup_map = {}
        for a, b in sco:
            sup_map.setdefault(a, set()).add(b)
        cls_df = spark.createDataFrame(
            [(c, sorted(ss)) for c, ss in sup_map.items()],
            "cls string, supers array<string>",
        )
        type_out = (
            types.join(F.broadcast(cls_df), types["o"] == cls_df["cls"], "left")
            .select(
                "s",
                F.explode(
                    F.concat(
                        F.array(F.struct(
                            F.col("o").alias("c"), F.lit(True).alias("asserted")
                        )),
                        F.transform(
                            F.coalesce("supers", F.array().cast("array<string>")),
                            lambda c: F.struct(
                                c.alias("c"), F.lit(False).alias("asserted")
                            ),
                        ),
                    )
                ).alias("e"),
            )
            .select(
                "s", F.lit(RDF_TYPE).alias("p"),
                F.col("e.c").alias("o"), F.col("e.asserted").alias("asserted"),
            )
        )
    else:
        type_out = types.select(
            "s", "p", "o", F.lit(True).alias("asserted")
        )
    # Derived types also inherit supers — but dom/rng classes were
    # pre-composed and template outputs carry no other type sources, so
    # no extra pass is needed.

    out = out1.unionByName(type_out)
    for df in extra:
        out = out.unionByName(df)
    return out.groupBy("s", "p", "o").agg(F.max("asserted").alias("asserted"))


def sameas_smush(
    instance: DataFrame,
    *,
    sameas_pred: str = OWL_SAMEAS,
    max_rounds: int = 25,
) -> DataFrame:
    """owl:sameAs smushing: rewrite the graph onto canonical nodes.

    The sameAs edges form equivalence classes; connected components
    (the same large-star/small-star operator the KG canonicalization
    uses, ``operators/components.py``) elects the lexicographically
    smallest member as representative, and every subject/object in the
    rest of the graph is replaced by its class representative.  The
    sameAs triples themselves are consumed (post-smushing they would
    all be reflexive).  Output is a SET (duplicates merged by the
    final distinct — two aliases calling the same target collapse).

    Scale shape: the assignment table is one row per node occurring in
    a sameAs class — typically orders of magnitude smaller than the
    graph — so the two rewrite joins broadcast while it fits and fall
    back to hash joins keyed s / o otherwise; AQE decides per run.
    """
    edges = instance.filter(F.col("p") == sameas_pred).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    from pyjelly_spark.operators.components import connected_components

    assignment = connected_components(edges, max_rounds=max_rounds)
    rest = instance.filter(F.col("p") != sameas_pred).select("s", "p", "o")
    s_map = assignment.select(
        F.col("node").alias("s"), F.col("component").alias("s_rep")
    )
    o_map = assignment.select(
        F.col("node").alias("o"), F.col("component").alias("o_rep")
    )
    return (
        rest.join(s_map, "s", "left")
        .join(o_map, "o", "left")
        .select(
            F.coalesce("s_rep", "s").alias("s"),
            "p",
            F.coalesce("o_rep", "o").alias("o"),
        )
        .distinct()
    )
