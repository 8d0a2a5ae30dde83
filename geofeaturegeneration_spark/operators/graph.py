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
