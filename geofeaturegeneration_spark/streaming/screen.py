"""Streaming cross-corpus dedup screen: flag incoming documents that
near-duplicate an EXISTING corpus, as they arrive.

Batch analog: ``operators/dedup.minhash_lsh_pairs_cross`` (screen a new
batch against precomputed corpus band signatures). The streaming form is
the continuous-ingest shape of the same idea — docs stream in, each is
banded STATELESSLY (``with_band_sigs``: per-row array_min minhashes, no
groupBy), and a stream-static equi-join against the persisted corpus band
table yields candidate matches immediately.

Scale shape: the per-doc banding is embarrassingly parallel; the
stream-static join re-broadcasts/streams the static side per micro-batch
under Spark's stream-static join rules, with the corpus band table
typically a bucketed parquet table so the join is a local lookup. The
only stateful operator is the final within-watermark pair dedup (a doc
matching a corpus doc in several bands must emit once), whose state is
one tiny (doc_id, corpus_id) row per emitted pair, EVICTED at the
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from geofeaturegeneration_spark.operators.dedup import with_band_sigs
from geofeaturegeneration_spark.operators.sketch import bloom_screen


def _band_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    time_col: str,
    k: int,
    n_hashes: int,
    bands: int,
) -> DataFrame:
    """(id, time, band, sig_str) rows from the per-row signature path —
    stream- and batch-compatible, which is how the plan audit covers it.

    ``explode_outer`` + a post-explode null filter, NOT plain ``explode``:
    a plain explode lets InferFiltersFromGenerate + pushdown substitute the
    entire staged signature tree into an inferred ``size(_bands) > 0``
    filter, re-splitting the text per shingle for every arriving document
    (same fix as minhash_band_signatures_rowwise; plan pinned in
    test_plan_audit.py::test_shingle_and_ngram_split_staged_once)."""
    return (
        with_band_sigs(docs, text_col, k, n_hashes, bands)
        .select(
            F.col(id_col), F.col(time_col),
            F.explode_outer("_bands").alias("_bs"),
        )
        .filter(F.col("_bs").isNotNull())
        .select(
            F.col(id_col),
            F.col(time_col),
            F.col("_bs.band").alias("band"),
            F.col("_bs.sig_str").alias("sig_str"),
        )
    )


def stream_minhash_screen(
    stream_docs: DataFrame,
    id_col: str,
    text_col: str,
    time_col: str,
    corpus_bands: DataFrame,
    corpus_id_col: str = "doc_id",
    watermark: str = "1 hour",
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate matches (id_col, time_col, corpus_id) for a
    document stream against a static ``(corpus_id_col, band, sig_str)``
    band table (build it with ``minhash_band_signatures`` and persist it —
    signatures are identical between the batch and per-row paths, so the
    corpus table needs no special preparation).

    ``max_bucket_size`` caps the CORPUS side's (band, sig_str) bucket
    population exactly like the batch cross screen: a degenerate corpus
    bucket (boilerplate shingles) would otherwise match every arriving
    doc. The cap is computed once on the static side — no streaming state.

    Emits each (arriving doc, corpus doc) pair once per watermark window
    (multi-band hits are deduped by ``dropDuplicatesWithinWatermark``;
    its state is evicted as event time passes, unlike a plain
    dropDuplicates whose state would grow for the query's lifetime)."""
    cb = corpus_bands.select(
        "band", "sig_str", F.col(corpus_id_col).alias("corpus_id")
    )
    if max_bucket_size is not None:
        sizes = cb.groupBy("band", "sig_str").count()
        keep = sizes.filter(F.col("count") <= max_bucket_size).drop("count")
        cb = cb.join(keep, ["band", "sig_str"], "inner")
    sigs = _band_rows(
        stream_docs.withWatermark(time_col, watermark),
        id_col, text_col, time_col, k, n_hashes, bands,
    )
    return (
        sigs.join(cb, ["band", "sig_str"])
        .dropDuplicatesWithinWatermark([id_col, "corpus_id"])
        .select(id_col, time_col, "corpus_id")
    )


def stream_bloom_screen(
    stream_docs: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: str = "bloom",
    novel_only: bool = False,
) -> DataFrame:
    """Exact-membership ingest screen for a document stream: flag (or with
    ``novel_only`` drop) arriving rows whose key is already in an existing
    corpus, using the corpus's persisted Bloom position table
    (``operators/sketch.bloom_build`` — build once in batch, read the
    <= m_bits-row parquet here as the static side).

    Where ``stream_minhash_screen`` (above) finds NEAR-duplicates via a
    stream-static band join, this is its EXACT-membership sibling with a
    memory bound the minhash table cannot give: the static side is
    m_bits-bounded no matter how large the corpus, and the screen is
    COMPLETELY STATELESS — the batch operator's chained broadcast joins
    are all stream-static, so no watermark, no state store, and the
    micro-batch plan is the batch plan (parity pinned in
    test_streaming.py). One-sided error as in batch: corpus members ALWAYS
    flag (no duplicate passes the screen); novel rows flag spuriously at
    ~(1-e^(-k*n/m))^k, so ``novel_only`` under-keeps, never under-drops."""
    out = bloom_screen(stream_docs, value_col, bloom, m_bits, k, salt)
    if novel_only:
        out = out.filter(~F.col("might_contain")).drop("might_contain")
    return out


def stream_edit_screen(
    stream_docs: DataFrame,
    id_col: str,
    key_col: str,
    time_col: str,
    corpus_variants: DataFrame,
    watermark: str = "1 hour",
    max_dist: int = 1,
    min_len: int = 1,
    max_bucket_size: int | None = None,
    exclude_same_id: bool = True,
    cache_capped: bool = True,
) -> DataFrame:
    """Edit-distance ingest screen: matches (id_col, time_col, corpus_id,
    dist) for arriving keys within Levenshtein distance ``max_dist`` of an
    existing corpus — the character-level sibling of the two screens above
    (minhash = token near-dups, bloom = exact membership, edit = key
    typos/boilerplate variants). Batch analog:
    ``operators/dedup.edit_join_cross``; the static side is the SAME
    persisted ``edit_variant_table`` parquet, so one corpus artifact
    serves both the batch backfill and the continuous ingest path.

    Stateless except the final within-watermark pair dedup (multi-variant
    hits emit once, state evicted at the watermark — the
    stream_minhash_screen rule): per-row variant generation is pure
    expression work, the join is stream-static, and the verify is the JVM
    ``levenshtein``. Blocking is complete (symmetric-delete, see
    ``deletion_variants``), so within a watermark window the emitted
    matches equal the batch cross join exactly (parity pinned in
    test_streaming.py). ``exclude_same_id`` mirrors the batch analog's
    flag AND default — a re-ingested doc sharing the corpus id space does
    not self-match; pass ``False`` for independent id spaces where an
    equal-id pair is a legitimate match — so the batch-parity promise
    holds in BOTH id-space regimes, not just on disjoint ids.

    ``max_bucket_size`` caps CORPUS variant buckets — no streaming state,
    but a stream-static join RE-EVALUATES its static subtree every
    micro-batch, so the capped table is ``persist()``-ed inside this
    function by default (MEMORY_AND_DISK, materialized lazily by the
    first batch) rather than re-aggregating the full corpus per batch
    (ADVICE.md r04 #3). One cache per call, alive until the session ends
    or ``spark.catalog.clearCache()`` — a session constructing MANY
    capped screens should pass ``cache_capped=False`` and manage its own
    persisted pre-capped table (build the cap once, persist, pass it as
    ``corpus_variants`` with ``max_bucket_size=None``, unpersist on query
    stop). Without the cap the static side is the caller's own
    ``corpus_variants`` (persist the parquet-backed table yourself if its
    query is expensive)."""
    from geofeaturegeneration_spark.operators.dedup import deletion_variants
    from geofeaturegeneration_spark.functions.text import md5_long

    cv = corpus_variants.select(
        "_vh",
        F.col("id").alias("corpus_id"),
        F.col("key").alias("_corpus_key"),
    )
    if max_bucket_size is not None:
        sizes = cv.groupBy("_vh").count()
        keep = sizes.filter(F.col("count") <= max_bucket_size).drop("count")
        cv = cv.join(keep, "_vh", "inner")
        if cache_capped:
            # persist: stream-static joins re-run the static plan per
            # micro-batch — cache the capped table so the corpus groupBy
            # aggregate runs once, not once per batch (ADVICE.md r04 #3)
            cv = cv.persist(StorageLevel.MEMORY_AND_DISK)
    keyed = stream_docs.withWatermark(time_col, watermark).filter(
        F.length(F.col(key_col)) >= int(min_len)
    )
    vr = (
        keyed.select(
            F.col(id_col),
            F.col(time_col),
            F.col(key_col),
            F.explode_outer(
                deletion_variants(F.col(key_col), max_dist)
            ).alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .select(
            id_col, time_col, key_col, md5_long(F.col("_v")).alias("_vh")
        )
    )
    joined = vr.join(cv, "_vh")
    if exclude_same_id:
        joined = joined.filter(F.col(id_col) != F.col("corpus_id"))
    return (
        joined.withColumn(
            "dist", F.levenshtein(F.col(key_col), F.col("_corpus_key")).cast("int")
        )
        .filter(F.col("dist") <= int(max_dist))
        .dropDuplicatesWithinWatermark([id_col, "corpus_id"])
        .select(id_col, time_col, "corpus_id", "dist")
    )
