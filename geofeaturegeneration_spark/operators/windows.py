"""Per-entity lag/lead and rolling context windows.

Implements the feature family the reference *designed* but left unimplemented
(distance/time/speed vs previous stay — design note Record.md:40-50) plus the
lag/lead adjacency it does use everywhere (shift(-1) at
Test/GeoFeatureGenerationClass.py:407,443-453).

Pure window expressions: one shuffle on the entity key serves every feature
here (all windows share the same partitioning, so Catalyst reuses a single
Exchange + Sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def lag_lead_features(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    value_cols: list[str],
    lags: list[int] = (1,),
    leads: list[int] = (1,),
    with_deltas: bool = True,
) -> DataFrame:
    """Adds ``{col}_lag{k}`` / ``{col}_lead{k}`` and, when the source column
    is numeric and ``with_deltas``, ``{col}_delta{k}`` = value - lag k.
    Also adds ``gap_s_lag1``: seconds since the previous row."""
    w = W.partitionBy(*entity_cols).orderBy(time_col)
    new_cols: dict[str, Column] = {}
    for c in value_cols:
        for k in lags:
            new_cols[f"{c}_lag{k}"] = F.lag(c, k).over(w)
            if with_deltas:
                new_cols[f"{c}_delta{k}"] = F.col(c) - F.lag(c, k).over(w)
        for k in leads:
            new_cols[f"{c}_lead{k}"] = F.lead(c, k).over(w)
    new_cols["gap_s_lag1"] = (
        F.unix_timestamp(F.col(time_col))
        - F.unix_timestamp(F.lag(time_col).over(w))
    ).cast("double")
    return df.withColumns(new_cols)


def rolling_features(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    value_col: str,
    n_preceding: int = 3,
    range_seconds: int | None = None,
    out_prefix: str | None = None,
) -> DataFrame:
    """Rolling aggregates over the entity's time-ordered history.

    Row frame (default): avg / sum / min / max over the ``n_preceding``
    previous rows plus the current one, and a running cumulative sum —
    the stay-context feature of Record.md:40-50.

    Range frame (``range_seconds``): same aggregates over a trailing
    event-time window (rangeBetween on epoch seconds) — this is the frame
    that survives irregular sampling at scale.

    ``out_prefix`` renames every output column to ``{out_prefix}roll_avg``
    etc. (default keeps the historical ``{value_col}_roll_avg`` / ``row_idx``
    names) so the row-frame and range-frame variants can be stacked on one
    DataFrame without clobbering each other; both share the same
    partitionBy, so Catalyst serves them from a single exchange.
    """
    base = W.partitionBy(*entity_cols).orderBy(time_col)
    if range_seconds is None:
        frame = base.rowsBetween(-n_preceding, W.currentRow)
    else:
        base = W.partitionBy(*entity_cols).orderBy(
            F.unix_timestamp(F.col(time_col)).cast("long")
        )
        frame = base.rangeBetween(-range_seconds, W.currentRow)
    cum = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    v = F.col(value_col)
    p = out_prefix if out_prefix is not None else f"{value_col}_"
    idx_name = "row_idx" if out_prefix is None else f"{out_prefix}row_idx"
    return df.withColumns(
        {
            f"{p}roll_avg": F.avg(v).over(frame),
            f"{p}roll_sum": F.sum(v).over(frame),
            f"{p}roll_min": F.min(v).over(frame),
            f"{p}roll_max": F.max(v).over(frame),
            f"{p}cum_sum": F.sum(v).over(cum),
            idx_name: F.row_number().over(base),
        }
    )


def minmax_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Min-max normalization (the reference imports sklearn MinMaxScaler,
    AttachFeature.py:626, but never wires it into the main pipeline —
    SURVEY.md §2.4). Global or per-group; constant groups map to 0.0.

    Implemented as window min/max rather than an agg+join: one shuffle on
    the group key (none at all when Catalyst sees an existing partitioning).
    """
    out_col = out_col or f"{value_col}_norm"
    w = W.partitionBy(*(group_cols or []))
    lo, hi = F.min(value_col).over(w), F.max(value_col).over(w)
    return df.withColumn(
        out_col,
        F.when(hi == lo, F.lit(0.0)).otherwise(
            (F.col(value_col) - lo) / (hi - lo)
        ),
    )


def decimate(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    n: int,
) -> DataFrame:
    """Every-nth-row downsampling per entity in time order — the reference's
    ``iloc[::n]`` sampling (AttachFeature.py:239-245, gSamplingIntervalRow).
    Keeps rows 1, n+1, 2n+1, ... of each entity."""
    w = W.partitionBy(*entity_cols).orderBy(time_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % n == 0)
        .drop("_rn")
    )


def sliding_subsequences(
    df: DataFrame,
    entity_cols: list[str],
    time_col: str,
    value_col: str,
    seq_len: int = 3,
) -> DataFrame:
    """Contrastive-sample windows (Test.ipynb cell 85 ``generate_samples``):
    for each row i with at least seq_len-1 predecessors, emit
    ``query`` = values[i-seq_len+1 .. i] and ``pos`` = value at i+1.
    Rows whose lookahead or lookback is incomplete are dropped, matching the
    reference's range(len - seq_len - 1) loop bound."""
    w = W.partitionBy(*entity_cols).orderBy(time_col)
    frame = w.rowsBetween(-(seq_len - 1), W.currentRow)
    return (
        df.withColumn("query", F.collect_list(value_col).over(frame))
        .withColumn("pos", F.lead(value_col).over(w))
        .filter((F.size("query") == seq_len) & F.col("pos").isNotNull())
    )
