"""Sessionization operators.

Spark-native restatement of ``tbd.traj_stay_move`` (vendored in the reference
at Test/GeoFeatureGenerationClass.py:367-466, invoked at AttachFeature.py:766,
DP_GenerateTrajectory.py:62). Two flavors:

* **state-change sessionization** (the reference's rule): a new episode starts
  whenever the *state* column (grid cell / token bucket) changes between
  consecutive rows of the same entity — steps 1-9 of SURVEY.md §2.5.
* **gap sessionization**: a new episode starts when the time gap from the
  previous row exceeds a threshold (the classic web-session rule; the
  Spark-batch analog of ``session_window``).

Both are pure window-function compositions — one shuffle on the entity key,
whole-stage codegen throughout, no Python. At cluster scale the shuffle is
the only data movement; AQE handles moderate skew, and callers with
pathological hot entities should pre-filter or use the salted as-of machinery
(operators/asof.py) for the join stages that follow.

Semantics matched exactly to the reference:
* episode boundary flag: ``state != lag(state) OR entity change``
  (Test/GeoFeatureGenerationClass.py:399-400) — first row of each entity
  counts as a boundary (lag is null).
* episode id: cumulative sum of boundary flags per entity
  (Test/GeoFeatureGenerationClass.py:403).
* one output row per episode = first row (keep='first' dedup,
  Test/GeoFeatureGenerationClass.py:404-405).
* ``etime = lead(stime)`` across episode firsts; the entity's **last episode
  is dropped** because its end is unobserved
  (Test/GeoFeatureGenerationClass.py:407-408).
* ``duration = etime - stime`` seconds; keep ``duration >= threshold``
  (``>=``, not ``>``: Test/GeoFeatureGenerationClass.py:410-412).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _boundary_flag(entity_cols: list[str], order_col: str, state_col: str | None):
    w = W.partitionBy(*entity_cols).orderBy(order_col)
    if state_col is None:
        return None, w
    prev = F.lag(F.col(state_col)).over(w)
    # null lag (first row of entity) → boundary; pandas `shift()` produces NaN
    # and `!=` NaN is True, matching coalesce-to-1 here.
    flag = F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0)
    return flag, w


def sessionize_state_change(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    min_duration_s: float | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """State-change episodes ("stays").

    Returns one row per episode with: entity cols, ``state_col`` (the constant
    state of the run), ``stime`` (first row's time), ``etime`` (next episode's
    start), ``duration_s``, ``n_rows`` (run length), ``stay_seq`` (1-based
    per-entity episode index), plus first-row values of ``keep_cols``.

    The entity's final episode is dropped (etime unobserved), and episodes
    shorter than ``min_duration_s`` are filtered with ``>=`` — both per the
    reference.
    """
    flag, w = _boundary_flag(entity_cols, time_col, state_col)
    cum = W.partitionBy(*entity_cols).orderBy(time_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    marked = df.withColumn("_new", flag).withColumn(
        "_sid", F.sum("_new").over(cum)
    )

    keep_cols = keep_cols or []
    # min_by(c, time) = value of c on the episode's first row — deterministic,
    # unlike first() inside a hash aggregate (state_col is constant within a
    # run, but keep_cols need the true first-row value, keep='first' semantics
    # of Test/GeoFeatureGenerationClass.py:404-405).
    grp = marked.groupBy(*entity_cols, "_sid").agg(
        F.min(time_col).alias("stime"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min_by(state_col, time_col).alias(state_col),
        *[F.min_by(c, time_col).alias(c) for c in keep_cols],
    )
    w2 = W.partitionBy(*entity_cols).orderBy("stime")
    out = (
        grp.withColumn("etime", F.lead("stime").over(w2))
        .withColumn("stay_seq", F.row_number().over(w2))
        .filter(F.col("etime").isNotNull())
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
        .drop("_sid")
    )
    if min_duration_s is not None:
        out = out.filter(F.col("duration_s") >= F.lit(min_duration_s))
    return out


def sessionize_state_change_salted(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    min_duration_s: float | None = None,
    keep_cols: list[str] | None = None,
    n_salts: int = 8,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Salted variant of ``sessionize_state_change`` for hot entities whose
    full row set exceeds one task (SURVEY.md §7.4 — the seam-stitching
    problem; skew precedent README.md:339-387).

    Two passes:

    1. **compress within (entity, salt)**: hot entities (row count >
       ``hot_threshold``; cheap count agg, sampled sketch at cluster scale)
       are split into ``n_salts`` CONTIGUOUS time ranges; each (entity,
       salt) sub-window compresses its rows into state-runs. This is the
       heavy stage and it parallelizes across salts.
    2. **merge runs per entity**: the same state-change recipe runs again
       over the run summaries (count -> sum of run lengths). A run that
       crosses a salt seam appears as two adjacent same-state runs and is
       merged exactly; a salt wholly inside one run chains through the same
       logic. Episode outputs (stime/etime/duration/n_rows/stay_seq/
       keep_cols first-values) are then identical to the unsalted op by
       construction (verified by the parity test).

    Pass 2's volume is the run count — rows compressed by the mean run
    length. For adversarial data with run length ~1 the salt level can be
    applied recursively; one level covers the realistic regime.

    Time-range salting (not hash): boundaries must be order-contiguous so
    each seam is a single run pair, which is what makes the merge exact.
    """
    keep_cols = keep_cols or []
    bounds = df.groupBy(*entity_cols).agg(
        F.min(time_col).alias("_tmin"),
        F.max(time_col).alias("_tmax"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    salted = df.join(bounds, entity_cols)
    span = (
        F.unix_timestamp("_tmax").cast("double")
        - F.unix_timestamp("_tmin").cast("double")
        + F.lit(1.0)
    )
    rel = F.unix_timestamp(F.col(time_col)).cast("double") - F.unix_timestamp(
        "_tmin"
    ).cast("double")
    salt = F.when(
        F.col("_cnt") > hot_threshold,
        F.least(F.lit(n_salts - 1), F.floor(rel / (span / n_salts)).cast("int")),
    ).otherwise(F.lit(0))
    salted = salted.withColumn("_salt", salt).drop("_tmin", "_tmax", "_cnt")

    # pass 1: state-runs within each (entity, salt) time slice
    sub_entity = entity_cols + ["_salt"]
    w1 = W.partitionBy(*sub_entity).orderBy(time_col)
    prev = F.lag(F.col(state_col)).over(w1)
    flag = F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0)
    cum1 = w1.rowsBetween(W.unboundedPreceding, W.currentRow)
    runs = (
        salted.withColumn("_new", flag)
        .withColumn("_rid", F.sum("_new").over(cum1))
        .groupBy(*sub_entity, "_rid")
        .agg(
            F.min(time_col).alias("stime"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min_by(state_col, time_col).alias(state_col),
            *[F.min_by(c, time_col).alias(c) for c in keep_cols],
        )
        .drop("_salt", "_rid")
    )

    # pass 2: merge seam-adjacent same-state runs, then episode outputs —
    # identical recipe over the compressed rows
    w2 = W.partitionBy(*entity_cols).orderBy("stime")
    prev2 = F.lag(F.col(state_col)).over(w2)
    flag2 = F.when(prev2.isNull() | (prev2 != F.col(state_col)), 1).otherwise(0)
    cum2 = w2.rowsBetween(W.unboundedPreceding, W.currentRow)
    merged = (
        runs.withColumn("_new", flag2)
        .withColumn("_sid", F.sum("_new").over(cum2))
        .groupBy(*entity_cols, "_sid")
        .agg(
            F.min("stime").alias("stime"),
            F.sum("n_rows").alias("n_rows"),
            F.min_by(state_col, F.col("stime")).alias(state_col),
            *[F.min_by(c, F.col("stime")).alias(c) for c in keep_cols],
        )
    )
    w3 = W.partitionBy(*entity_cols).orderBy("stime")
    out = (
        merged.withColumn("etime", F.lead("stime").over(w3))
        .withColumn("stay_seq", F.row_number().over(w3))
        .filter(F.col("etime").isNotNull())
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
        .drop("_sid")
    )
    if min_duration_s is not None:
        out = out.filter(F.col("duration_s") >= F.lit(min_duration_s))
    return out


def sessionize_gap(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    gap_s: float,
    agg_exprs: dict | None = None,
) -> DataFrame:
    """Gap-based sessions: boundary when time since previous row > gap_s.

    Returns entity cols + ``session_id`` (1-based per entity), ``stime``,
    ``etime`` (last row's time — observed, unlike state-change stays),
    ``duration_s``, ``n_events``, plus any extra aggregates given as
    ``{name: F.expr}``.
    """
    w = W.partitionBy(*entity_cols).orderBy(time_col)
    prev_ts = F.lag(F.col(time_col)).over(w)
    gap = F.unix_timestamp(F.col(time_col)) - F.unix_timestamp(prev_ts)
    flag = F.when(prev_ts.isNull() | (gap > gap_s), 1).otherwise(0)
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = df.withColumn("_new", flag).withColumn(
        "session_id", F.sum("_new").over(cum)
    )
    aggs = [
        F.min(time_col).alias("stime"),
        F.max(time_col).alias("etime"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(expr.alias(name))
    return (
        marked.groupBy(*entity_cols, "session_id")
        .agg(*aggs)
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
    )


def stay_move(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    state_col: str,
    min_duration_s: float,
    keep_cols: list[str] | None = None,
    splice_endpoints: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full stay+move derivation (Test/GeoFeatureGenerationClass.py:394-466).

    Stays = state-change episodes with duration >= threshold. Moves = the
    transitions between consecutive *kept* stays of an entity: one move row
    per adjacent stay pair, carrying start (s-prefixed) and end (e-prefixed)
    state/time.

    ``splice_endpoints=True`` reproduces the reference's boundary handling
    (Test/GeoFeatureGenerationClass.py:418-453): each entity's raw FIRST and
    LAST points are unioned into the stay stream as zero-duration degenerate
    stays (stime = etime = the point's time) before the lead() pass, so the
    movement into the first stay and out of the last stay is also emitted.
    The reference's pandas sort is non-stable on (uid, stime) ties; here
    ties order deterministically by a tag (first point < stays < last
    point), matching its concat order. Endpoint extraction is one extra
    window pass over the raw stream on the same entity-key partitioning.
    """
    stays = sessionize_state_change(
        df, entity_cols, time_col, state_col, min_duration_s, keep_cols
    )
    seq = stays.select(
        *entity_cols, "stime", "etime", F.col(state_col), F.lit(1).alias("_tag")
    )
    if splice_endpoints:
        wa = W.partitionBy(*entity_cols).orderBy(
            F.col(time_col).asc(), F.col(state_col).asc()
        )
        wd = W.partitionBy(*entity_cols).orderBy(
            F.col(time_col).desc(), F.col(state_col).desc()
        )
        pts = df.select(
            *entity_cols, time_col, state_col,
            F.row_number().over(wa).alias("_rna"),
            F.row_number().over(wd).alias("_rnd"),
        )
        def _endpoint(flag_col: str, tag: int) -> DataFrame:
            return pts.filter(F.col(flag_col) == 1).select(
                *entity_cols,
                F.col(time_col).alias("stime"),
                F.col(time_col).alias("etime"),
                F.col(state_col),
                F.lit(tag).alias("_tag"),
            )
        seq = (
            _endpoint("_rna", 0)
            .unionByName(seq)
            .unionByName(_endpoint("_rnd", 2))
        )
    w = W.partitionBy(*entity_cols).orderBy("stime", "_tag")
    moves = (
        seq.select(
            *entity_cols,
            F.col(state_col).alias(f"s_{state_col}"),
            F.col("etime").alias("move_stime"),
            F.lead(state_col).over(w).alias(f"e_{state_col}"),
            F.lead("stime").over(w).alias("move_etime"),
        )
        .filter(F.col("move_etime").isNotNull())
        .withColumn(
            "duration_s",
            (
                F.unix_timestamp("move_etime") - F.unix_timestamp("move_stime")
            ).cast("double"),
        )
        .withColumn(
            "move_seq",
            F.row_number().over(
                W.partitionBy(*entity_cols).orderBy("move_stime", "move_etime")
            ),
        )
    )
    return stays, moves
