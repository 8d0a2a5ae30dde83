"""Trajectory transition graph (origin-destination edges from stay sequences).

The reference DECLARES this output but never ships it: README.md:63 lists
"TrajectoryGraph ... to be implemented" and Parameters.json:73-77 reserves
the ``OutputType: graph`` selector with no backing code path. This module
implements the natural semantics those stubs describe — the directed
grid-to-grid transition graph of each entity's stay sequence — Spark-first:

* nodes are the stay states (grid cells from ``GPS_to_grid``/Cantor pairing,
  or any categorical state column),
* a directed edge (src -> dst) is emitted for every pair of CONSECUTIVE
  stays of one entity (ordered by stay start time), i.e. one edge per
  "move" the reference's stay/move machinery derives,
* edge weight = number of such transitions corpus-wide, plus the number of
  distinct entities that made the transition (so hub edges driven by one
  commuter are distinguishable from genuinely popular corridors).

Scale shape: one window over the entity-keyed shuffle the stay table
already has (lag of the node column), then one groupBy on (src, dst) —
both partial-aggregated map-side. No joins, no explode; edge cardinality
is bounded by the move count, never by |nodes|^2. At 100 TB the (src, dst)
shuffle is uniform unless one corridor dominates; AQE skew-split handles
that (counts are associative), so no salting is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def trajectory_graph(
    stays: DataFrame,
    entity_cols: list[str],
    order_col: str,
    node_col: str,
    keep_self_loops: bool = False,
) -> DataFrame:
    """Directed transition graph over per-entity ordered stay sequences.

    Parameters
    ----------
    stays : one row per stay/episode (the output of
        ``sessionize_state_change`` — or any (entity, time, state) table).
    entity_cols : trajectory key (e.g. ``["user_id"]``).
    order_col : stay ordering column (e.g. ``stime``).
    node_col : graph node id (grid cell, state, token bucket).
    keep_self_loops : state-change sessionization can never produce a
        self-transition, but duration-filtered stay tables can (the
        in-between stays were dropped); default drops them.

    Returns (src, dst, n_trips, n_entities): n_trips = total transitions,
    n_entities = distinct entities that made the transition. Both BIGINT —
    exact, engine-reproducible, no float aggregation.
    """
    w = W.partitionBy(*entity_cols).orderBy(order_col)
    edges = (
        stays.select(
            *entity_cols,
            F.lag(F.col(node_col)).over(w).alias("src"),
            F.col(node_col).alias("dst"),
        )
        .filter(F.col("src").isNotNull())
    )
    if not keep_self_loops:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return (
        edges.groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.count_distinct(*[F.col(c) for c in entity_cols]).alias(
                "n_entities"
            ),
        )
    )


def node_features(edges: DataFrame) -> DataFrame:
    """Per-node degree features from a ``trajectory_graph`` edge table:
    out/in transition totals and distinct-neighbor degrees — the node-level
    feature vector a downstream graph model would consume. One union + one
    groupBy; the edge table is already tiny relative to the corpus."""
    outs = edges.select(
        F.col("src").alias("node"),
        F.col("n_trips").alias("_out_trips"),
        F.lit(1).alias("_out_deg"),
        F.lit(0).cast("bigint").alias("_in_trips"),
        F.lit(0).alias("_in_deg"),
    )
    ins = edges.select(
        F.col("dst").alias("node"),
        F.lit(0).cast("bigint").alias("_out_trips"),
        F.lit(0).alias("_out_deg"),
        F.col("n_trips").alias("_in_trips"),
        F.lit(1).alias("_in_deg"),
    )
    return (
        outs.union(ins)
        .groupBy("node")
        .agg(
            F.sum("_out_trips").alias("out_trips"),
            F.sum("_out_deg").cast("bigint").alias("out_degree"),
            F.sum("_in_trips").alias("in_trips"),
            F.sum("_in_deg").cast("bigint").alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iter: int = 5,
    damping_ppm: int = 850_000,
    scale: int = 10**12,
    n_nodes: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge table in EXACT integer arithmetic —
    the classic link-graph importance signal (Brin & Page 1998), applied
    in training-data pipelines as a corpus quality prior (harmonic/rank
    centrality of a page's domain in the web graph) and, over a word
    adjacency graph, as TextRank keyword scoring (Mihalcea & Tarau 2004).
    Over the trajectory transition graph it ranks location importance —
    the PoI-significance feature the reference's declared-but-unshipped
    graph output would feed.

    Exactness contract: ranks are int64 in units of ``1/scale``. With
    ``d = damping_ppm``, ``N`` nodes, out-degree ``deg(u)``::

        rank_0(v)   = scale // N
        base        = ((1_000_000 - d) * scale) // 1_000_000 // N
        rank_t+1(v) = base + d * (sum_{u->v} rank_t(u) // deg(u)) // 1_000_000

    Every operation is integer (floor) division or int64 summation, so
    the result is bit-identical across engines, runs, and partitionings —
    the DuckDB oracle replays the same recurrence as an unrolled CTE
    chain. Max intermediate is d * scale < 2^63, no overflow at any N.
    Dangling mass (nodes with no out-edges) is dropped, not
    redistributed: ranks are a deterministic lower-bounded importance
    score, not a probability simplex (document the choice, don't hide a
    float renormalization).

    PRECONDITION: one row per directed edge (dedupe upstream — e.g.
    ``trajectory_graph`` output, or a DISTINCT bigram table).

    ``weight_col`` (int64 edge weights, e.g. trajectory_graph's
    ``n_trips``) switches to the weighted recurrence: with ``W(u)`` =
    u's total out-weight, the contribution over edge (u,v,w) is
    ``(rank_t(u) * w) // W(u)`` — still one exact floor division per
    edge. Overflow bound: ``rank * w < 2^63`` requires
    ``max_weight < 2^63 / scale`` (~9.2e6 at the default scale); shrink
    ``scale`` for heavier edges. PRECONDITION (enforced): weights must be
    POSITIVE int64 — a zero/negative weight would zero a source's total
    out-weight ``W(u)`` (ANSI divide-by-zero) or flip contribution signs,
    so the plan raises on the first non-positive weight it evaluates
    (per-row codegen ``when``-guard, no extra scan or collect; ADVICE.md
    r04 #2). Enforcement scope: the guard lives on the weight expression,
    so it fires on any ``n_iter >= 1`` run (the out-degree aggregate
    consumes every weight); a degenerate ``n_iter=0`` call returns the
    uniform initial ranks without reading weights at all (column pruning
    strips them) and therefore without validating them.

    Scale shape: per iteration ONE equi-join of the edge table with the
    rank table on src + ONE (dst) sum aggregate + ONE left join back to
    the node list — all partial-aggregated, shuffle keys reused round to
    round; a lazy ``localCheckpoint`` per round cuts the growing lineage
    exactly like ``connected_components``. ``n_iter`` is fixed (no
    convergence collect per round beyond the one O(1) count for
    ``n_nodes``); at web scale rank tables are |V|-sized rows of two
    int64s, never |V|^2.
    """
    if not 0 <= damping_ppm <= 1_000_000:
        raise ValueError("damping_ppm must be in [0, 1e6]")
    if weight_col:
        _w = F.col(weight_col).cast("long")
        # raise at execution time on the first zero/negative/null weight:
        # a when-guard inside codegen, so validation costs no extra scan
        w_expr = F.when(_w > 0, _w).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "pagerank: edge weights must be positive int64, got "
                    ),
                    F.coalesce(_w.cast("string"), F.lit("NULL")),
                )
            ).cast("long")
        )
    else:
        w_expr = F.lit(1).cast("long")
    # NOT checkpointed: fwd has exactly three one-time consumers (nodes,
    # out-degrees, esrc) before esrc's own checkpoint takes over as the
    # per-round input — for a scan-cheap upstream, three scans beat one
    # 100%-of-the-edges block-store write (measured: the write is part of
    # a parallelism-independent setup floor). Callers with an expensive
    # edge QUERY should materialize it themselves before calling.
    fwd = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w_expr.alias("_w"),
    )
    nodes = (
        fwd.select(F.col("src").alias("node"))
        .union(fwd.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if n_nodes is None:
        n_nodes = nodes.count()  # one scalar collect, O(1) driver state
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    outdeg = fwd.groupBy("src").agg(F.sum("_w").alias("_deg"))
    esrc = fwd.join(outdeg, "src").localCheckpoint(eager=False)
    base = ((1_000_000 - damping_ppm) * scale) // 1_000_000 // n_nodes
    r0 = scale // n_nodes
    # SPARSE rank state: a node with no in-edges has a CONSTANT rank
    # (scale//N before the first round, `base` after every round), so the
    # rank table only needs the in-edge nodes and each round is exactly
    # one equi-join + one partial-agg sum — no per-round join back to the
    # full node list. Absent sources read their constant via coalesce.
    ranks = None  # None => every source is at the round's constant
    import gc

    default = r0
    for _ in range(int(n_iter)):
        joined = (
            esrc.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src", "left"
            )
            if ranks is not None
            else esrc.withColumn("rank", F.lit(None).cast("long"))
        )
        contribs = joined.select(
            "dst",
            F.expr(
                f"(coalesce(rank, CAST({default} AS BIGINT)) * _w) div _deg"
            ).alias("_c"),
        )
        new_ranks = (
            contribs.groupBy("dst")
            .agg(F.sum("_c").alias("_s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({base} AS BIGINT) + ({damping_ppm} * _s)"
                    " div 1000000"
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        del ranks
        gc.collect()  # reclaim the superseded round's checkpoint blocks
        ranks = new_ranks
        default = base
    if ranks is None:  # n_iter == 0: uniform initial ranks
        return nodes.withColumn("rank", F.lit(r0).cast("long"))
    # no-in-edge nodes re-enter with their constant rank
    rest = nodes.join(
        ranks.select(F.col("node")), "node", "left_anti"
    ).withColumn("rank", F.lit(default).cast("long"))
    return ranks.unionByName(rest)
