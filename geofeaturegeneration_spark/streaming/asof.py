"""Streaming point-in-time (as-of) join.

The batch engine's central primitive (``operators/asof.py``: for every
probe at time t, the latest reference row with right_time <= t, zero
leakage) restated for Structured Streaming. Spark has no built-in
stream-stream as-of join, so this is the ``applyInPandasWithState``
custom-stateful-operator pattern over the SAME union-tag layout the batch
union strategy uses:

1. both streams are watermarked, projected to a common layout and tagged
   (right=0 / left=1), then unioned — the combined watermark is the min of
   the two sides;
2. one hash exchange on the key groups the union;
3. per key, the worker buffers probes and reference rows in state and
   FINALIZES a probe only once the watermark passes its event time — at
   that point no reference row at-or-before the probe can still arrive, so
   the emitted answer equals the batch answer (correctness over latency:
   results trail by the watermark delay, like any append-mode aggregate);
4. reference history is pruned to the latest row at-or-before the
   watermark plus everything after it — exactly what future probes can
   still need — so per-key state is bounded by the in-flight window, not
   the stream length;
5. an event-time timeout re-invokes keys with pending probes when the
   watermark advances past them even if the key receives no further rows.

Tie rule matches batch: a reference row at exactly t IS visible to a probe
at t. Finalization is therefore STRICT (watermark must pass the probe's
event time, not merely reach it): Spark only drops rows strictly older
than the watermark, so a reference row stamped exactly at the watermark
can still legally arrive — emitting at ``t == wm`` would miss it and
violate the tie rule at the boundary. Null keys/event-times are not
supported on streams (the watermark machinery drops/rejects them
upstream).

State hygiene: the per-key reference buffer is kept sorted by MERGING the
(sorted) new micro-batch into it — O(state + batch log batch), never a
re-sort of state that is already ordered. ``max_pending`` bounds the
pending-probe buffer against a stalled watermark (one slow side holds the
min-watermark back while probes accumulate): exceeding it fails the query
with a clear error — honest backpressure instead of unbounded state.
``ref_ttl`` evicts keys that hold ONLY reference history (no pending
probes) once their newest reference row is that far behind the watermark;
without it, total state grows with the distinct-key cardinality of the
stream's lifetime. An evicted key's very late probe sees nulls — the
documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_id: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    watermark: str = "1 hour",
    max_pending: int | None = None,
    ref_ttl_ms: int | None = None,
) -> DataFrame:
    """For each left (probe) row, attach the latest right ``value_cols``
    with ``right[right_time] <= left[left_time]`` per ``on`` key, emitted
    once the watermark STRICTLY passes the probe's event time (see module
    docstring: a reference row at exactly the watermark can still arrive).

    ``max_pending``: per-key cap on buffered unfinalized probes; exceeding
    it raises (stalled-watermark guard). ``ref_ttl_ms``: evict a key's
    reference-only state once its newest reference row is this many ms
    behind the watermark (None = keep forever, the pre-TTL behavior).

    Output: (*on, left_id, left_time, *value_cols), append mode.
    """
    lid_type = left.schema[left_id].dataType
    val_types = [right.schema[c].dataType for c in value_cols]

    l_proj = left.withWatermark(left_time, watermark).select(
        *on,
        F.col(left_id).alias("_lid"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[
            F.lit(None).cast(val_types[i]).alias(f"_rv_{i}")
            for i in range(len(value_cols))
        ],
    )
    r_proj = right.withWatermark(right_time, watermark).select(
        *on,
        F.lit(None).cast(lid_type).alias("_lid"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_rv_{i}") for i, c in enumerate(value_cols)],
    )
    unioned = l_proj.unionByName(r_proj)

    state_schema = T.StructType(
        [
            T.StructField("lids", T.ArrayType(lid_type)),
            T.StructField("lts", T.ArrayType(T.LongType())),  # micros
            T.StructField("rts", T.ArrayType(T.LongType())),  # micros, sorted
            *[
                T.StructField(f"rv{i}", T.ArrayType(val_types[i]))
                for i in range(len(value_cols))
            ],
        ]
    )
    out_schema = T.StructType(
        [T.StructField(c, unioned.schema[c].dataType) for c in on]
        + [
            T.StructField(left_id, lid_type),
            T.StructField(left_time, T.TimestampType()),
            *[
                T.StructField(c, val_types[i], True)
                for i, c in enumerate(value_cols)
            ],
        ]
    )
    n_vals = len(value_cols)
    out_names = [f.name for f in out_schema.fields]
    # the unioned _lid column holds nulls on right rows, so Arrow hands the
    # worker float64 — values must be coerced back to Python ints before
    # they hit integer-typed state/output fields (floats there become null)
    lid_integral = isinstance(
        lid_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )

    def update(key, pdfs, state: GroupState):
        import bisect

        import pandas as pd

        if state.exists:
            st = state.get
        else:
            st = tuple([[] for _ in range(3 + n_vals)])
        lids = list(st[0] or [])
        lts = list(st[1] or [])
        rts = list(st[2] or [])
        rvs = [list(st[3 + i] or []) for i in range(n_vals)]

        new_rows: list[tuple] = []
        for pdf in pdfs:  # empty when invoked by timeout
            is_left = pdf["_tag"] == 1
            lpart = pdf.loc[is_left]
            new_ids = lpart["_lid"].tolist()
            if lid_integral:
                new_ids = [int(v) for v in new_ids]
            lids.extend(new_ids)
            lts.extend(int(t.value) // 1000 for t in lpart["_t"])
            rpart = pdf.loc[~is_left]
            new_rows.extend(
                zip(
                    (int(t.value) // 1000 for t in rpart["_t"]),
                    *[rpart[f"_rv_{i}"].tolist() for i in range(n_vals)],
                )
            )
        if new_rows:
            # state is already time-sorted: sort only the new batch, then a
            # single two-pointer merge — O(state + batch log batch), not a
            # re-sort of the whole buffer every micro-batch
            new_rows.sort(key=lambda x: x[0])
            old_rows = list(zip(rts, *rvs)) if rts else []
            merged: list[tuple] = []
            i = j = 0
            while i < len(old_rows) and j < len(new_rows):
                if old_rows[i][0] <= new_rows[j][0]:  # stable: state first
                    merged.append(old_rows[i]); i += 1
                else:
                    merged.append(new_rows[j]); j += 1
            merged.extend(old_rows[i:])
            merged.extend(new_rows[j:])
            rts = [m[0] for m in merged]
            rvs = [[m[1 + i] for m in merged] for i in range(n_vals)]

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        rows = []
        pend_ids, pend_ts = [], []
        for lid, t_us in zip(lids, lts):
            # STRICT: a reference row stamped exactly at the watermark can
            # still arrive (Spark drops only rows strictly older), so a
            # probe is final only once the watermark has passed its time
            if t_us < wm_us:
                pos = bisect.bisect_right(rts, t_us) - 1  # <= rule: tie visible
                vals = [rvs[i][pos] if pos >= 0 else None for i in range(n_vals)]
                rows.append(
                    (*key, lid, pd.to_datetime(t_us, unit="us"), *vals)
                )
            else:
                pend_ids.append(lid)
                pend_ts.append(t_us)

        if max_pending is not None and len(pend_ids) > max_pending:
            raise RuntimeError(
                f"stream_asof_join: {len(pend_ids)} pending probes for key "
                f"{key} exceed max_pending={max_pending} — the watermark "
                "has stalled (one input side is idle or far behind). "
                "Raise max_pending, fix the lagging source, or shorten the "
                "watermark delay."
            )

        # prune refs: the latest at-or-before the watermark + all after it
        cut = bisect.bisect_right(rts, wm_us) - 1
        keep_from = max(cut, 0)
        rts = rts[keep_from:]
        rvs = [v[keep_from:] for v in rvs]

        if pend_ids:
            state.update((pend_ids, pend_ts, rts, *rvs))
            # re-invoke once the watermark can finalize the oldest probe
            state.setTimeoutTimestamp(max(min(pend_ts) // 1000, wm_ms + 1))
        elif rts and (
            ref_ttl_ms is None or wm_us < rts[-1] + ref_ttl_ms * 1000
        ):
            state.update((pend_ids, pend_ts, rts, *rvs))
            if ref_ttl_ms is not None:
                # arm eviction so a quiescent key is re-visited and dropped
                # even if it never receives another row
                state.setTimeoutTimestamp(
                    max(rts[-1] // 1000 + ref_ttl_ms, wm_ms + 1)
                )
        elif state.exists:
            # no pending probes and (no refs, or refs past their TTL)
            state.remove()

        yield pd.DataFrame(rows, columns=out_names)

    return (
        unioned.groupBy(*on)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
