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


def _boundary_flag(
    entity_cols: list[str],
    order_col: str,
    state_col: str | None,
    order_cols: list[str] | None = None,
):
    w = W.partitionBy(*entity_cols).orderBy(
        order_col, *[F.col(c) for c in (order_cols or [])]
    )
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
    order_cols: list[str] | None = None,
) -> DataFrame:
    """State-change episodes ("stays").

    Returns one row per episode with: entity cols, ``state_col`` (the constant
    state of the run), ``stime`` (first row's time), ``etime`` (next episode's
    start), ``duration_s``, ``n_rows`` (run length), ``stay_seq`` (1-based
    per-entity episode index), plus first-row values of ``keep_cols``.

    The entity's final episode is dropped (etime unobserved), and episodes
    shorter than ``min_duration_s`` are filtered with ``>=`` — both per the
    reference.

    ``order_cols``: extra tiebreak columns making the per-entity ordering
    TOTAL. Real event streams contain equal timestamps (GPS fixes at sensor
    resolution, batched ingestion), and with a tie the run segmentation
    itself — hence stay boundaries, states and counts — depends on which
    tied row the engine sorts first; the reference's pandas stable sort
    silently breaks ties by input row order, which a distributed shuffle
    does not preserve (and no two engines agree on). Pass a stable unique
    column (an event id) for reproducible output on tied data; found by
    tools/fuzz_oracle.py round 4. All internal orderings and first-row
    extractions key on the resulting total order.
    """
    flag, w = _boundary_flag(entity_cols, time_col, state_col, order_cols)
    marked = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_new", flag)
        .withColumn(
            "_sid",
            F.sum("_new").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )

    keep_cols = keep_cols or []
    # min_by(c, _rn) = value of c on the episode's first row in the TOTAL
    # order — deterministic, unlike first() inside a hash aggregate (and
    # unlike min_by on the raw time, which ties when timestamps tie;
    # keep='first' semantics of Test/GeoFeatureGenerationClass.py:404-405).
    grp = marked.groupBy(*entity_cols, "_sid").agg(
        F.min(time_col).alias("stime"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_rn").alias("_ord"),
        F.min_by(state_col, "_rn").alias(state_col),
        *[F.min_by(c, "_rn").alias(c) for c in keep_cols],
    )
    # episodes can SHARE stime when their first rows tie on time, so the
    # episode ordering also carries _ord (min _rn — strictly increasing
    # across a partition's episodes, so (stime, _ord) is total)
    w2 = W.partitionBy(*entity_cols).orderBy("stime", "_ord")
    out = (
        grp.withColumn("etime", F.lead("stime").over(w2))
        .withColumn("stay_seq", F.row_number().over(w2))
        .filter(F.col("etime").isNotNull())
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
        .drop("_sid", "_ord")
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
    order_cols: list[str] | None = None,
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

    ``order_cols`` — same tiebreak contract as the unsalted op. Tied
    timestamps always share a salt (the salt is a function of the time),
    so a LOCAL (entity, salt) row number is enough: run order across the
    whole entity is (stime, local _ord), total because equal stime implies
    equal salt.
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
    w1 = W.partitionBy(*sub_entity).orderBy(
        time_col, *[F.col(c) for c in (order_cols or [])]
    )
    prev = F.lag(F.col(state_col)).over(w1)
    flag = F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0)
    cum1 = w1.rowsBetween(W.unboundedPreceding, W.currentRow)
    runs = (
        salted.withColumn("_lrn", F.row_number().over(w1))
        .withColumn("_new", flag)
        .withColumn("_rid", F.sum("_new").over(cum1))
        .groupBy(*sub_entity, "_rid")
        .agg(
            F.min(time_col).alias("stime"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_lrn").alias("_ord"),
            F.min_by(state_col, "_lrn").alias(state_col),
            *[F.min_by(c, "_lrn").alias(c) for c in keep_cols],
        )
        .drop("_salt", "_rid")
    )

    # pass 2: merge seam-adjacent same-state runs, then episode outputs —
    # identical recipe over the compressed rows. Run order (stime, _ord)
    # is total: equal stime implies equal salt, where the local row
    # number disambiguates.
    w2 = W.partitionBy(*entity_cols).orderBy("stime", "_ord")
    prev2 = F.lag(F.col(state_col)).over(w2)
    flag2 = F.when(prev2.isNull() | (prev2 != F.col(state_col)), 1).otherwise(0)
    cum2 = w2.rowsBetween(W.unboundedPreceding, W.currentRow)
    _runkey = F.struct(F.col("stime"), F.col("_ord"))
    merged = (
        runs.withColumn("_new", flag2)
        .withColumn("_sid", F.sum("_new").over(cum2))
        .groupBy(*entity_cols, "_sid")
        .agg(
            F.min("stime").alias("stime"),
            F.sum("n_rows").alias("n_rows"),
            F.min("_ord").alias("_ord"),
            F.min_by(state_col, _runkey).alias(state_col),
            *[F.min_by(c, _runkey).alias(c) for c in keep_cols],
        )
    )
    w3 = W.partitionBy(*entity_cols).orderBy("stime", "_ord")
    out = (
        merged.withColumn("etime", F.lead("stime").over(w3))
        .withColumn("stay_seq", F.row_number().over(w3))
        .filter(F.col("etime").isNotNull())
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
        .drop("_sid", "_ord")
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
    order_cols: list[str] | None = None,
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
        df, entity_cols, time_col, state_col, min_duration_s, keep_cols,
        order_cols=order_cols,
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
