"""Streaming corpus statistics: running distinct counting over an
unbounded ingest stream.

Batch analog: ``operators/sketch.hll_build`` / ``hll_estimate``. The
streaming form exploits that an HLL register update IS a streaming
max-aggregation: ``groupBy(r).agg(max(rank))`` with state bounded at
``2^p`` rows BY CONSTRUCTION — the only state a running distinct count
needs, independent of stream length or key cardinality. No watermark
and no state eviction are wanted: cardinality is monotone, registers
never expire, and the state bound comes from the sketch geometry, not
from time.

Contrast with the naive ``dropDuplicates().count()`` formulation, whose
state grows with the TRUE cardinality (unbounded for a url/token stream)
— the exact failure mode the sketch family exists to avoid.

Usage: write the returned register table with ``outputMode("complete")``
(it is a tiny bounded aggregate — complete mode re-emits <= 2^p rows per
trigger); run ``operators.hll_estimate`` over the sink for the running
estimate, and ``hll_merge`` to fold it with batch shards' register tables
(stream-so-far + historical corpora without rescanning either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geofeaturegeneration_spark.operators.sketch import hll_build


def stream_hll_registers(
    stream_df: DataFrame, value_col: str, p: int = 12, salt: str = "hll"
) -> DataFrame:
    """Running HLL register table of a streaming column — the batch
    operator applied verbatim to the stream (narrow md5/bit projection +
    one bounded groupBy/max, all stream-supported), so the micro-batch
    result after any prefix of the stream equals ``hll_build`` over that
    prefix EXACTLY (max is associative and commutative across
    micro-batches; parity pinned in test_streaming.py, including forced
    multi-batch ingestion). State: <= 2^p (r, rank) rows."""
    return hll_build(stream_df, value_col, p=p, salt=salt)


def stream_hist_buckets(
    stream_df: DataFrame,
    value_col: str,
    sub_bits: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """Running HDR-histogram bucket table of a streaming integer column —
    the distribution sibling of :func:`stream_hll_registers`, and the
    same construction: ``operators/sketch.hist_build`` IS a streaming
    sum-aggregation (``groupBy(b).sum(wt)`` — sum is associative and
    commutative across micro-batches), with state bounded at
    ``~63 * 2^sub_bits`` bucket rows BY CONSTRUCTION, independent of
    stream length or value range. No watermark and no eviction: the
    distribution-so-far is monotone in mass and the state bound comes
    from the bucket geometry, not from time.

    Write with ``outputMode("complete")`` (a tiny bounded aggregate); run
    ``operators.hist_quantiles`` over the sink for the running p50/p99
    cuts, and ``hist_merge`` to fold with batch shards (stream-so-far +
    historical corpora without rescanning either). Micro-batch parity
    with the batch operator is pinned in test_streaming.py."""
    from geofeaturegeneration_spark.operators.sketch import hist_build

    return hist_build(
        stream_df, value_col, sub_bits=sub_bits, weight_col=weight_col
    )
