"""Structured Streaming analogs of the batch sessionization/window ops.

The reference is strictly batch (SURVEY.md §2.10) — its closest analog to
incremental processing is file-existence resume. The streaming engine
completes the picture for pipelines that ingest token/event streams
continuously:

* ``stream_gap_sessions`` — the gap rule of ``operators/sessionize.py``
  as a native ``session_window`` aggregation with a watermark: identical
  session membership to the batch op for any gap <= watermark lateness
  (late rows beyond the watermark are dropped, the usual streaming trade).
* ``stream_running_features`` — per-entity running aggregates via
  ``applyInPandasWithState`` (Arrow-batched custom state), the streaming
  counterpart of the batch running-window features.

Scale notes: state is keyed by entity and bounded by the watermark —
the state store evicts closed sessions; shuffle = one hash exchange on the
entity key per micro-batch, same key layout as the batch pipeline so a
lambda architecture shares partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_gap_sessions(
    events: DataFrame,
    entity_cols: list[str],
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    agg_exprs: dict | None = None,
) -> DataFrame:
    """Gap sessions over a stream: one output row per closed session with
    stime/etime/n_events/duration_s (same column contract as the batch
    ``sessionize_gap``)."""
    aggs = [
        F.min(time_col).alias("stime"),
        F.max(time_col).alias("etime"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for name, expr in (agg_exprs or {}).items():
        aggs.append(expr.alias(name))
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(*entity_cols, F.session_window(F.col(time_col), gap).alias("w"))
        .agg(*aggs)
        .withColumn(
            "duration_s",
            (F.unix_timestamp("etime") - F.unix_timestamp("stime")).cast("double"),
        )
        .drop("w")
    )


def stream_exact_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: ONE survivor per normalized-content
    fingerprint within the watermark window — the first row PROCESSED,
    which among same-micro-batch duplicates is scheduling-dependent (an
    inherent streaming-dedup property, not a bug). The fingerprint matches
    the batch ``exact_dedup`` (md5 of trimmed, lower-cased,
    whitespace-collapsed text -> 60-bit int), so the two legs of a lambda
    architecture agree on the surviving fingerprint SET; the batch leg's
    deterministic ``keep_id`` is the canonical survivor choice when row
    identity matters.

    ``dropDuplicatesWithinWatermark`` keyed on the fingerprint keeps one
    tiny (fp) state row per distinct document and EVICTS it once the
    watermark passes — plain ``dropDuplicates([fp])`` would never expire
    state (Spark only bounds dedup state when the event-time column is part
    of the key set or the within-watermark variant is used), growing one
    row per distinct document for the life of the query."""
    from geofeaturegeneration_spark.functions.text import fingerprint

    return (
        docs.withColumn("_fp", fingerprint(F.col(text_col)))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .withColumnRenamed("_fp", "fp")
    )


RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def stream_running_features(
    events: DataFrame,
    entity_cols: list[str],
    value_col: str,
    watermark_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-entity running count/sum/mean via applyInPandasWithState —
    the custom-stateful-operator pattern for features the built-in
    aggregations can't express (e.g. decayed counters, model state)."""
    out_schema = T.StructType(
        [T.StructField(c, events.schema[c].dataType) for c in entity_cols]
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("running_sum", T.DoubleType()),
            T.StructField("running_mean", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [list(key) + [n, total, (total / n) if n else 0.0]],
            columns=[f.name for f in out_schema.fields],
        )

    return (
        events.withWatermark(watermark_col, watermark)
        .groupBy(*entity_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
