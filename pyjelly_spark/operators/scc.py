"""Strongly connected components over a directed edge DataFrame —
FW-BW-Trim coloring (Fleischer/Hendrickson/Pinar's divide-and-conquer
recast as the data-parallel "coloring" algorithm of Slota/Rajamanickam/
Madduri and Hong/Rodia/Olukotun), expressed entirely as DataFrame
joins/aggregations with a driver-side round loop.

Directed-graph analogue of ``components.connected_components`` (which
only handles the undirected case): needed for dependency hygiene over
import/call graphs — the condensation DAG (SCCs contracted) is what a
build scheduler topologically orders, and every module inside a
non-trivial SCC is a circular-dependency participant.

Algorithm (each outer round peels at least one SCC per color class):

1. **Trim** — iteratively retire nodes with no in-edges or no out-edges
   in the residual graph: they are singleton SCCs (a node on a cycle
   needs both). Trimming first is the published FW-BW-Trim speedup —
   on mostly-acyclic graphs (real dependency graphs are) it retires the
   vast majority of nodes in a handful of rounds without any closure
   work.
2. **Color** — forward min-label fixpoint: ``color(v) = min(v, min of
   color over v's successors)`` iterated to convergence, i.e. the
   smallest node id forward-reachable from v. Every color class c is
   forward-closed from its root (``color(c) == c`` always holds: the
   root's closure is contained in any member's closure).
3. **Backward sweep within the class** — the SCC containing root c is
   exactly the set of color-c nodes reachable FROM c using only color-c
   nodes (any intermediate on a path c→…→v with v,c mutually reachable
   is itself in the SCC, hence color-c — so restricting the sweep to
   same-color edges loses nothing). One multi-source BFS fixpoint, all
   roots at once, keyed by color.
4. Retire the found SCCs, shrink the residual edge set, repeat.

Scale notes:
- every inner iteration is one shuffle (groupBy / join on node id) over
  the residual graph only — the residual shrinks geometrically on
  pseudo-random and dependency-shaped graphs (1-3 outer rounds typical:
  trim eats the DAG part, one coloring round finds the big SCCs);
- ``localCheckpoint`` per iteration truncates lineage (same iterative-
  join lineage-bomb reasoning as components.py);
- convergence checks are single tiny ``agg``/``count`` jobs on already-
  checkpointed frames;
- worst-case round count is the max SCC diameter (a pure k-cycle costs
  k backward-sweep hops) — the documented FW-BW bound; ``max_rounds``
  guards runaway inputs and raises rather than returning a wrong
  answer.

Reference parity: none (the reference is a serialization codec —
SURVEY.md §2.9 pipeline extensions); this is a training-data /
dependency-analysis operator in the same family as the CC
canonicalizer required by BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyjelly_spark.operators.components import _round_shuffles


class SCCNotConverged(RuntimeError):
    """Raised when an inner fixpoint exceeds ``max_rounds`` — never a
    silently-wrong assignment."""


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 60,
) -> DataFrame:
    """Directed edges ``(src: long, dst: long)`` -> ``(node: long,
    scc: long)`` where ``scc`` is the smallest node id in the node's
    strongly connected component. Every node appears exactly once.

    ``nodes`` (single column ``node``) optionally supplies the full
    vertex set; defaults to the edge endpoints. Self-loops are ignored
    (they never change SCC membership).
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col("node").cast("long")).distinct()

    spark = edges.sparkSession
    residual_n = _ckpt(nodes)
    residual_e = _ckpt(e)

    # the rounds below are latency-bound on small residuals — right-size
    # their shuffles once from the materialized edge count (same
    # treatment as the CC rounds; big graphs keep the session setting)
    with _round_shuffles(spark, residual_e.count()):
        done_parts = _peel(residual_n, residual_e, max_rounds)

    if not done_parts:
        return spark.createDataFrame([], "node: long, scc: long")
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    return out


def _peel(
    residual_n: DataFrame, residual_e: DataFrame, max_rounds: int
) -> list[DataFrame]:
    """The FW-BW-Trim outer loop; returns the per-phase (node, scc)
    assignment frames (already checkpointed)."""
    done_parts: list[DataFrame] = []

    for _outer in range(max_rounds):
        if residual_n.isEmpty():
            break

        # ---- 1. trim: no-in or no-out nodes are singleton SCCs ------
        # lazy checkpoints + one counting action per round (the count
        # materializes trivial AND core, CC-style one-job rounds)
        for _trim in range(max_rounds):
            srcs = residual_e.select(F.col("src").alias("node")).distinct()
            dsts = residual_e.select(F.col("dst").alias("node")).distinct()
            core = srcs.join(dsts, "node").localCheckpoint(eager=False)
            trivial = residual_n.join(core, "node", "left_anti").localCheckpoint(
                eager=False
            )
            if trivial.count() == 0:
                break
            done_parts.append(
                trivial.select("node", F.col("node").alias("scc"))
            )
            residual_n = core
            residual_e = residual_e.join(
                core.select(F.col("node").alias("src")), "src", "left_semi"
            ).join(
                core.select(F.col("node").alias("dst")), "dst", "left_semi"
            ).localCheckpoint(eager=False)
        else:  # pragma: no cover - max_rounds of trimming
            raise SCCNotConverged("trim phase exceeded max_rounds")

        if residual_n.isEmpty():
            break

        # ---- 2. color: forward min-label fixpoint --------------------
        # each round carries a per-node `chg` flag so ONE aggregation
        # both materializes the lazy checkpoint and decides convergence
        color = _ckpt(residual_n.select("node", F.col("node").alias("color")))
        for _it in range(max_rounds):
            succ_min = (
                residual_e.join(
                    color.select(
                        F.col("node").alias("dst"),
                        F.col("color").alias("c_dst"),
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(F.min("c_dst").alias("c_succ"))
            )
            stepped = (
                color.join(succ_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("color"), F.coalesce("c_succ", "color")
                    ).alias("color"),
                    (
                        F.coalesce("c_succ", "color") < F.col("color")
                    ).cast("long").alias("chg"),
                )
                .localCheckpoint(eager=False)
            )
            n_changed = stepped.agg(F.sum("chg")).collect()[0][0]
            color = stepped.select("node", "color")
            if not n_changed:
                break
        else:  # pragma: no cover
            raise SCCNotConverged("coloring fixpoint exceeded max_rounds")

        # ---- 3. backward sweep from roots within each color class ----
        class_edges = _ckpt(
            residual_e.join(
                color.select(
                    F.col("node").alias("src"), F.col("color").alias("c_src")
                ),
                "src",
            )
            .join(
                color.select(
                    F.col("node").alias("dst"), F.col("color").alias("c_dst")
                ),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
        )
        # roots (color(v) == v) are in their own SCC by definition
        reached = _ckpt(
            color.where(F.col("color") == F.col("node")).select(
                "node", F.col("node").alias("scc")
            )
        )
        frontier = reached
        for _hop in range(max_rounds):
            nxt = (
                class_edges.join(
                    frontier.select(
                        F.col("node").alias("src"), "scc"
                    ),
                    "src",
                )
                .select(F.col("dst").alias("node"), "scc")
                .distinct()
                .join(reached.select("node"), "node", "left_anti")
                .localCheckpoint(eager=False)
            )
            if nxt.count() == 0:
                break
            reached = reached.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
        else:  # pragma: no cover
            raise SCCNotConverged("backward sweep exceeded max_rounds")

        done_parts.append(reached)
        residual_n = _ckpt(
            residual_n.join(reached.select("node"), "node", "left_anti")
        )
        residual_e = _ckpt(
            residual_e.join(
                residual_n.select(F.col("node").alias("src")),
                "src",
                "left_semi",
            ).join(
                residual_n.select(F.col("node").alias("dst")),
                "dst",
                "left_semi",
            )
        )
    else:  # pragma: no cover
        raise SCCNotConverged("outer peeling exceeded max_rounds")

    return done_parts


def condensation_levels(
    edges: DataFrame, assignment: DataFrame, max_rounds: int = 60
) -> DataFrame:
    """Longest-path layering of the condensation DAG.

    ``assignment`` is the (node, scc) output of
    :func:`strongly_connected_components`; returns ``(scc: long,
    level: long)`` where level(s) = length (in condensation edges) of
    the longest path ENDING at s — i.e. the topological layer a build
    scheduler would place the SCC in. Iterative max-propagation, one
    shuffle per round, rounds = condensation depth (a DAG, so it always
    terminates before ``max_rounds`` unless the assignment is wrong —
    in which case this raises instead of looping forever).
    """
    a_src = assignment.select(
        F.col("node").alias("src"), F.col("scc").alias("s_src")
    )
    a_dst = assignment.select(
        F.col("node").alias("dst"), F.col("scc").alias("s_dst")
    )
    cond_e = _ckpt(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("s_src") != F.col("s_dst"))
        .select(F.col("s_src").alias("src"), F.col("s_dst").alias("dst"))
        .distinct()
    )
    with _round_shuffles(edges.sparkSession, cond_e.count()):
        return _layer(assignment, cond_e, max_rounds)


def _layer(
    assignment: DataFrame, cond_e: DataFrame, max_rounds: int
) -> DataFrame:
    level = _ckpt(
        assignment.select(F.col("scc")).distinct().select(
            "scc", F.lit(0).cast("long").alias("level")
        )
    )
    for _it in range(max_rounds):
        pred_max = (
            cond_e.join(
                level.select(
                    F.col("scc").alias("src"), F.col("level").alias("l_src")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("scc"))
            .agg((F.max("l_src") + F.lit(1)).alias("l_pred"))
        )
        stepped = (
            level.join(pred_max, "scc", "left")
            .select(
                "scc",
                F.greatest(
                    F.col("level"), F.coalesce("l_pred", "level")
                ).alias("level"),
                (F.coalesce("l_pred", "level") > F.col("level"))
                .cast("long")
                .alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        n_changed = stepped.agg(F.sum("chg")).collect()[0][0]
        level = stepped.select("scc", "level")
        if not n_changed:
            return level
    raise SCCNotConverged(
        "condensation layering exceeded max_rounds (cyclic condensation "
        "means the SCC assignment itself is wrong)"
    )


def condensation_path_counts(
    edges: DataFrame, assignment: DataFrame, max_rounds: int = 60
) -> DataFrame:
    """Source-to-node path counting over the condensation DAG.

    Returns ``(scc: long, n_paths: long)`` where n_paths = number of
    distinct directed paths from any SOURCE SCC (no incoming
    condensation edges; a source counts one trivial path to itself)
    to this SCC. Iterative sum-relaxation — pc_{k+1}(v) = is_source(v)
    + sum over predecessors of pc_k(p) — which reaches the exact fixed
    point after depth-of-DAG rounds (each round extends counted path
    lengths by one) and is detected by a no-change round, one shuffle
    per round over the CONTRACTED graph. Counts are exact int64; a DAG
    engineered for exponential path counts would overflow — callers at
    that scale switch the same recurrence to a modular count.
    Raises :class:`SCCNotConverged` if the condensation is cyclic
    (i.e. the assignment is wrong) instead of looping forever.
    """
    a_src = assignment.select(
        F.col("node").alias("src"), F.col("scc").alias("s_src")
    )
    a_dst = assignment.select(
        F.col("node").alias("dst"), F.col("scc").alias("s_dst")
    )
    cond_e = _ckpt(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("s_src") != F.col("s_dst"))
        .select(F.col("s_src").alias("src"), F.col("s_dst").alias("dst"))
        .distinct()
    )
    sccs = assignment.select("scc").distinct()
    sources = sccs.join(
        cond_e.select(F.col("dst").alias("scc")).distinct(),
        "scc",
        "left_anti",
    )
    with _round_shuffles(edges.sparkSession, cond_e.count()):
        base = _ckpt(
            sccs.join(
                sources.select("scc", F.lit(1).alias("one")), "scc", "left"
            ).select(
                "scc",
                F.coalesce("one", F.lit(0)).cast("long").alias("is_src"),
            )
        )
        pc = base.select("scc", F.col("is_src").cast("long").alias("n_paths"))
        for _it in range(max_rounds):
            pred_sum = (
                cond_e.join(
                    pc.select(
                        F.col("scc").alias("src"),
                        F.col("n_paths").alias("p_src"),
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("scc"))
                .agg(F.sum("p_src").alias("from_preds"))
            )
            stepped = (
                base.join(pc.select("scc", F.col("n_paths").alias("old")), "scc")
                .join(pred_sum, "scc", "left")
                .select(
                    "scc",
                    (
                        F.col("is_src") + F.coalesce("from_preds", F.lit(0))
                    ).cast("long").alias("n_paths"),
                    F.col("old"),
                )
                .localCheckpoint(eager=False)
            )
            n_changed = (
                stepped.where(F.col("n_paths") != F.col("old"))
                .count()
            )
            pc = stepped.select("scc", "n_paths")
            if not n_changed:
                return pc
        raise SCCNotConverged(
            "path counting exceeded max_rounds (cyclic condensation means "
            "the SCC assignment itself is wrong)"
        )
