"""spark-submit entry point for resumable corpus-scale dedup.

    spark-submit --py-files gfg_spark.zip jobs/run_dedup.py \
        --input /path/to/documents --output /path/to/deduped \
        --checkpoint /path/to/ckpt [--buckets 8] [--max-bucket-size 1000] \
        [--force]

The flagship 100 TB story — (optional) text canonicalization (the only
text-REWRITING pre-filter: unicode/whitespace normalization, then C4
per-line rules + page verdict, so every later
stage hashes the CANONICAL bytes) -> (optional) prior-corpus Bloom ingest
screen (re-ingested duplicates dropped map-side before anything else; the
prior corpus is touched once to build its m_bits-bounded position table)
-> (optional) quality filter -> (optional)
perplexity filter (hashed-bigram LM trained once on a clean corpus) ->
MinHash LSH pairs -> connected components -> (optional) test-set
decontamination -> (optional) semantic embedding-space dedup -> keeper
filter (+ optional mixing recipe + PII scrub riding the output pass) —
(+ optional exact-substring span dedup over the surviving corpus) —
composed as ONE resumable pipeline behind the checkpoint store (reference
analog: the stage-separated pipeline of AttachFeature.py:1046-1112), not
just unit operators. Three to seventeen stages, each recorded per partition in
the CheckpointStore so a crash resumes without recomputing finished work:

-0.3. ``clean`` (optional, per doc-id hash bucket): text canonicalization
   — unicode/whitespace normalization (curation.normalize_text, --normalize)
   and/or C4 intra-document line cleaning (curation.clean_lines, --clean).
   Normalization runs first (fix the byte form, then judge lines), the
   line rules cut rule-failing lines and DROP page-verdict failures; every
   later stage reads this rewritten table instead of the raw corpus, so
   shingles, signatures, and the output all see the canonical bytes — the
   CCNet/C4 order (rewrites run before anything hashes text).
0. ``quality`` (optional, per doc-id hash bucket): C4/Gopher keep
   verdicts (curation.quality_filter) land as an ids-only table; every
   later stage semi-joins it, so rejected docs never reach the shingle
   pass — at 100 TB the filter pays for itself in stage-1 compute.
0.4/0.5. ``lm_model`` / ``ppl`` (optional): train the hashed-bigram LM on
   the clean target corpus ONCE (a <= 2*buckets-row table, one global
   unit), then score each corpus bucket against the persisted model
   (broadcast join, embarrassingly parallel) and keep docs at or above
   ``ppl_min_avg_logprob`` — the CCNet perplexity filter as two resumable
   stages. Later stages semi-join the keep table like quality's.
1. ``signatures`` (per doc-id hash bucket, embarrassingly parallel): band
   signatures via ``minhash_band_signatures`` written partitioned by
   bucket. At 10^12 docs this is the stage that dominates compute (shingle
   + minhash over every byte), and the stage where resume matters — each
   bucket re-runs in minutes.
2. ``clusters`` (global, one checkpoint unit): the LSH bucket self-join
   over the PERSISTED signature table (``lsh_pairs_from_band_sigs``, with
   the degenerate-bucket cap) -> ``dedup_clusters`` (connected components,
   O(diameter) rounds) -> (doc_id, cluster_id, is_keeper). Global because
   near-dup pairs cross doc buckets by construction; the inputs are the
   tiny signature rows, never the corpus text.
2.7 ``semantic`` (optional, global): SemDeDup drops over an embeddings
   table ``(doc_id, embedding)`` — sampled-kmeans quantizer (deterministic)
   + clustered GEMM screen (similarity.semantic_dedup); lands as an
   ids-only drop table the output stage anti-joins. The corpus text never
   moves through this stage.
2.8 ``mix_rates`` (optional, global): ``--mix-alpha`` computes the
   temperature-scaled mixing recipe (curation.temperature_rates) over the
   SURVIVING corpus — keepers minus contamination minus semantic drops —
   instead of taking explicit ``--mix`` rates; ``--mix-tokens`` weighs it
   by exact int64 token counts (the token-budget form). The persisted
   table is |sources|-sized; the output stage applies it as the same
   source_sample draw.
3. ``output`` (per doc-id hash bucket): keeper filter — each bucket of the
   corpus equi-joins its slice of the cluster table and keeps survivors.
   Text bytes are only touched here and in stage 1. ``--scrub`` folds PII
   redaction (curation.pii_clean_col) into this same pass, and ``--mix``
   folds the source_sample mixing recipe (a pure function of doc_id):
   at 100 TB both are free when they ride a stage that already rewrites
   text, and both participate in the lineage key.
4. ``span_intervals`` (optional, global): duplicated k-token spans of the
   SURVIVING corpus as a small (doc_id, ds, de) interval table
   (dedup.span_dup_intervals — winners decided post-keeper/post-mix, so a
   span is never cut everywhere because its winner was dropped upstream).
5. ``span_clean`` (per doc-id hash bucket): rewrite the final text with
   the duplicated ranges cut (dedup.span_reassemble) into
   ``span_deduped/``.
6/7. ``pack_vocab`` / ``packed`` (optional, global): tokenizer artifact
   over the final corpus — dense word->id vocab (build_vocab) or a BPE
   merge table (--pack-bpe, bpe.train_bpe) — then fixed-length
   boundary-crossing training rows (encode + optional --fim-ppm
   fill-in-middle rewrite + pack_sequences) — the curated corpus leaves the
   job as (grp, chunk_id, tokens:array<int>, n_real) rows ready to train
   on.
8. ``shards`` (optional, global): deterministic global shuffle + fixed-
   size shard assignment (shuffle_shards) over the training rows (packed
   chunks when --pack is on, else surviving docs) — the webdataset-style
   export order, identical at any parallelism. ``--epochs`` (per-source
   repetition ppm, curation.epoch_upsample) multiplies rows INTO this
   training export only: copies carry a composite ``<id>#<epoch>``
   identity through tokenize/pack/shard, the corpus tables stay
   one-copy-per-doc, the vocab artifact trains on unique docs, and the
   rate tag rides a STAGE-LOCAL lineage key (packed/shards only), so
   tuning epochs re-runs nothing upstream.
9. ``stats`` (optional, global): corpus report card over the FINAL
   corpus — HLL word registers (p=14), HDR doc-length buckets
   (sub_bits=5), exact doc/token totals, the distinct-word estimate and
   the p50/p99 length cuts — persisted as ONE long-form (metric, k, v)
   table whose register/bucket rows hll_merge/hist_merge with future
   runs' stats tables (cross-run distinct counts and length
   distributions without rescanning this corpus). Three narrow scan+agg
   passes over the final corpus (words for HLL, lengths for the
   histogram, totals) — no rewrite, no unbounded shuffle; deliberately
   OUTSIDE the global lineage key — stats change no bytes any other
   stage reads, so toggling them never invalidates the pipeline.

Determinism: signatures, pairs, components, and keeper choice are all pure
functions of the corpus (md5 hashing, min-label components, min-id
keeper), so kill/resume and full re-runs are byte-identical
(tests/test_checkpoint.py::test_dedup_pipeline_kill_resume_identical).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geofeaturegeneration_spark.checkpoint import CheckpointStore, run_partitioned
from geofeaturegeneration_spark.operators import (
    bloom_build,
    bloom_screen,
    bpe_encode,
    build_vocab,
    decontaminate,
    dedup_clusters,
    encode_with_vocab,
    hist_build,
    hist_quantiles,
    hll_build,
    hll_estimate,
    lm_bucket_logprobs,
    lm_score,
    lsh_pairs_from_band_sigs,
    minhash_band_signatures,
    pack_sequences,
    fim_transform,
    semantic_dedup,
    shuffle_shards,
    span_dup_intervals,
    span_reassemble,
    train_bpe,
    train_ivf_centroids,
)
from geofeaturegeneration_spark.functions.text import n_words, words
from geofeaturegeneration_spark.operators.curation import (
    clean_lines,
    epoch_upsample,
    normalize_text,
    pii_clean_col,
    quality_filter,
    source_sample,
    temperature_rates,
)
from geofeaturegeneration_spark.session import get_spark


def run_dedup_pipeline(
    spark,
    docs,
    out_root: str,
    ckpt_path: str,
    buckets: int = 4,
    k: int = 3,
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
    job_id: str = "corpus_dedup",
    lineage: str = "xform=v1",
    force: bool = False,
    bench=None,
    bench_fingerprint: str | None = None,
    decon_min_hits: int = 1,
    scrub: bool = False,
    clean: bool = False,
    clean_kwargs: dict | None = None,
    normalize: str | None = None,
    quality: bool = False,
    quality_kwargs: dict | None = None,
    prior=None,
    prior_fingerprint: str | None = None,
    prior_m_bits: int = 1 << 20,
    prior_k: int = 4,
    ppl_target=None,
    ppl_fingerprint: str | None = None,
    ppl_min_avg_logprob: float = -7.0,
    ppl_buckets: int = 8192,
    mix_rates_ppm: dict[str, int] | None = None,
    mix_by: str = "source",
    mix_default_ppm: int = 0,
    mix_alpha: float | None = None,
    mix_target_frac: float = 0.5,
    mix_by_tokens: bool = False,
    epoch_rates_ppm: dict[str, int] | None = None,
    epoch_default_ppm: int = 1_000_000,
    span_k: int | None = None,
    pack_len: int | None = None,
    pack_bpe_merges: int | None = None,
    pack_groups: int = 32,
    pack_pad: int | None = None,
    fim_rate_ppm: int | None = None,
    shard_size: int | None = None,
    stats: bool = False,
    embeddings=None,
    emb_fingerprint: str | None = None,
    semantic_threshold: float = 0.95,
    semantic_clusters: int = 8,
    semantic_max_cluster: int | None = None,
):
    """Run the dedup stages with per-stage checkpointed resume.

    ``docs`` must carry (doc_id, text); every column of ``docs`` is
    preserved on the surviving rows plus (cluster_id). ``bench`` (optional,
    (doc_id, text)) adds a checkpointed DECONTAMINATION stage: docs sharing
    >= ``decon_min_hits`` k-shingles with the benchmark set are dropped
    from the final output alongside dedup losers (resumable unit = corpus
    bucket, same as signatures — the bench shingle set is broadcast, so
    the stage is embarrassingly parallel too).

    ``clean=True`` prepends the C4 LINE-CLEANING stage (stage -0.3, per
    corpus bucket, before everything else — the C4 order: line rules run
    before anything hashes text): ``curation.clean_lines`` rewrites each
    doc's text with the rule-failing lines cut, DROPS page-verdict
    failures, and persists the cleaned table; every later stage — the
    prior screen, quality, perplexity, shingling, and the output — reads
    the CLEANED bytes instead of the raw corpus. The only stage that
    rewrites text besides the output pass, which is why it must come
    first: a signature computed over raw bytes would not match the text
    the job ships. ``clean_kwargs`` override the C4 rule thresholds.

    ``normalize`` ("NFC" or "NFKC") prepends unicode + whitespace
    normalization (``curation.normalize_text``) to the same rewrite
    stage, BEFORE the line rules: two scrapes of the same page that
    differ only in byte form (NFD vs NFC accents, CRLF vs LF, stray
    controls, tab runs) hash identically afterwards, so the dedup
    actually catches them. The form is part of the lineage key.

    ``quality=True`` prepends a checkpointed QUALITY stage (stage 0, per
    corpus bucket): ``curation.quality_filter`` verdicts land as a
    (doc_id)-only keep table, and every later stage sees only the kept
    docs — rejected docs never reach the shingling pass, so at 100 TB the
    filter pays for itself in stage-1 compute. ``quality_kwargs`` override
    the filter's thresholds.

    ``prior`` (optional, (doc_id, text)) prepends the INCREMENTAL-INGEST
    screen: one global stage persists the prior corpus's Bloom position
    table (``sketch.bloom_build``, <= ``prior_m_bits`` rows no matter how
    large the prior corpus), one per-bucket stage lands the guaranteed-
    novel doc ids (``sketch.bloom_screen`` — map-side, no join against the
    prior corpus), and every later stage sees only novel docs. A doc whose
    text is in the prior corpus NEVER survives; a novel doc is spuriously
    dropped at ~(1-e^(-k*n/m))^k (size ``prior_m_bits`` ~ 10x the prior's
    distinct docs for ~1%). Filter geometry and the prior's identity are
    in the lineage key.

    ``ppl_target`` (optional, (doc_id, text)) adds the PERPLEXITY filter:
    a global stage persists ``lm_bucket_logprobs(ppl_target)`` (train the
    LM once), a per-bucket stage scores the quality keepers against the
    broadcast model and keeps docs with ``avg_logprob >=
    ppl_min_avg_logprob`` (docs with < 2 words are unscoreable and KEPT —
    the other filters judge them). Threshold, bucket count, and the
    target corpus identity are all in the lineage key.

    ``mix_rates_ppm`` applies the ``curation.source_sample`` mixing recipe
    inside the output stage (docs must carry ``mix_by``): the draw is a
    pure function of doc_id, so like the PII scrub it rides the pass that
    already rewrites text — no extra stage, but it IS part of the lineage
    key (changing the recipe invalidates the output stage only).

    ``mix_alpha`` computes the recipe INSIDE the job instead (mutually
    exclusive with ``mix_rates_ppm``): a checkpointed MIX_RATES stage runs
    ``curation.temperature_rates`` over the surviving corpus (keepers
    minus contamination minus semantic drops — the same population the
    output stage emits), so the temperature recipe reflects what dedup
    actually kept, not the raw input. ``mix_by_tokens=True`` weighs the
    recipe by exact int64 word-count sums (the token-budget form mixes are
    actually specified in; one extra text-bytes pass, which is why the
    stage is checkpointed). The rate table is |sources|-sized; the output
    stage reads it back and applies the identical source_sample draw.
    alpha/target/weighting are all in the lineage key.

    ``span_k`` appends the EXACT-SUBSTRING dedup modality over the
    surviving corpus: a global checkpointed stage persists the (small)
    duplicated-span interval table (``span_dup_intervals``; winners are
    decided on the post-keeper post-mix corpus so a span is never cut
    everywhere because its winner was dropped upstream), then a per-bucket
    stage rewrites the final text (``span_reassemble``) into
    ``span_deduped/``.

    ``pack_len`` appends the TRAINING-EXPORT packing stages over the final
    corpus (span-cleaned when ``span_k`` is set, else the deduped output):
    a global vocab stage persists the tokenizer artifact (the dense
    word->id table, or with ``pack_bpe_merges`` a trained BPE merge table
    — subword ids of a bounded vocabulary), then a global pack stage
    encodes each doc through the broadcast artifact and cuts
    ``pack_len``-token boundary-crossing rows
    (pack_sequences; ``pack_groups`` sizes the parallelism, ``pack_pad``
    right-pads each group's final partial chunk). ``shard_size`` appends
    the shuffle_shards export: every training row gets its position in a
    deterministic global permutation plus a fixed-size shard id. All
    geometry knobs are in the lineage key.

    ``embeddings`` (optional, (doc_id, embedding)) adds the SEMANTIC dedup
    modality (similarity.semantic_dedup — SemDeDup): a global checkpointed
    stage trains the sampled-kmeans quantizer, screens each cluster with
    GEMM tiles, and lands the dropped doc ids; the output stage anti-joins
    them exactly like contamination. Quality-rejected docs never enter the
    screen; knobs + the embedding table's identity are in the lineage key.

    The full curation story — filter -> perplexity -> dedup ->
    decontaminate -> semantic -> mix -> scrub -> span-dedup — is
    therefore ONE resumable artifact; per-stage wall-clock is recorded in
    the CheckpointStore metrics table. Returns the per-stage
    PartitionResult lists (3 to 17 of them, in pipeline order)."""
    if mix_alpha is not None and mix_rates_ppm is not None:
        raise ValueError(
            "mix_alpha (computed temperature recipe) and mix_rates_ppm "
            "(explicit rates) are mutually exclusive"
        )
    if fim_rate_ppm is not None and pack_len is None:
        raise ValueError(
            "fim_rate_ppm requires pack_len (--pack SEQ_LEN): the FIM "
            "rewrite applies to the tokenized docs the pack stage cuts"
        )
    if pack_bpe_merges is not None and pack_len is None:
        raise ValueError(
            "pack_bpe_merges requires pack_len (--pack SEQ_LEN): without "
            "the packing stages no BPE artifact is trained"
        )
    if epoch_rates_ppm is not None and pack_len is None and shard_size is None:
        raise ValueError(
            "epoch_rates_ppm materializes repeats into the TRAINING export "
            "(packed rows / shards) — pass pack_len and/or shard_size; for "
            "keep-or-drop mixing of the corpus itself use mix_rates_ppm"
        )
    store = CheckpointStore(spark, ckpt_path)
    qua_path = os.path.join(out_root, "quality")
    spn_path = os.path.join(out_root, "span_intervals")
    fin_path = os.path.join(out_root, "span_deduped")
    sig_path = os.path.join(out_root, "signatures")
    clu_path = os.path.join(out_root, "clusters")
    con_path = os.path.join(out_root, "contaminated")
    out_path = os.path.join(out_root, "deduped")
    bucket_keys = [str(b) for b in range(buckets)]
    bucket_of = F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("string")
    # EVERY knob that changes any stage's bytes is part of the lineage key,
    # so resuming into the same checkpoint dir with a different flag value
    # invalidates the affected stages instead of serving stale results:
    # max_bucket_size changes pairs -> clusters -> keepers, and the bench
    # dataset's identity changes the contamination stage.
    lineage = (
        f"{lineage};buckets={buckets};k={k};h={n_hashes};b={bands}"
        f";mbs={max_bucket_size}"
    )
    if bench is not None:
        lineage += f";decon={decon_min_hits};bench={bench_fingerprint or 'anon'}"
    if scrub:
        # scrub changes output BYTES, so it must invalidate the output
        # stage's checkpoints when toggled — hence part of the lineage key
        lineage += ";scrub=1"
    if clean:
        # cleaning changes the BYTES every later stage hashes, so it is
        # part of every stage's lineage key — toggling it (or any rule
        # threshold) invalidates the whole chain
        lineage += f";clean={sorted((clean_kwargs or {}).items())}"
    if normalize is not None:
        # normalization rewrites the bytes every later stage hashes, same
        # lineage rule as clean (and the form matters: NFC vs NFKC)
        lineage += f";norm={normalize}"
    if quality:
        lineage += f";quality={sorted((quality_kwargs or {}).items())}"
    if prior is not None:
        # the Bloom position table's bytes depend on the filter geometry
        # and the prior corpus's identity; the novel verdicts inherit both
        lineage += (
            f";prior={prior_m_bits}:{prior_k}:{prior_fingerprint or 'anon'}"
        )
    if ppl_target is not None:
        # the LM model's bytes depend on the target corpus identity and the
        # bucket count; the keep verdicts also on the threshold
        lineage += (
            f";ppl={ppl_min_avg_logprob}:{ppl_buckets}"
            f":{ppl_fingerprint or 'anon'}"
        )
    if mix_rates_ppm is not None:
        lineage += (
            f";mix={mix_by}:{sorted(mix_rates_ppm.items())}:{mix_default_ppm}"
        )
    if mix_alpha is not None:
        # the computed recipe depends on alpha/target/weighting (the rate
        # TABLE depends on upstream stages too, but those share this
        # lineage key already)
        lineage += (
            f";tmix={mix_by}:{mix_alpha}:{mix_target_frac}"
            f":{int(mix_by_tokens)}"
        )
    if span_k is not None:
        lineage += f";span={span_k}"
    if pack_len is not None:
        # packing geometry changes the exported training rows AND the
        # vocab artifact they are encoded with
        lineage += (
            f";pack={pack_len}:{pack_groups}:{pack_pad}"
            f":bpe{pack_bpe_merges}"
        )
    if shard_size is not None:
        lineage += f";shards={shard_size}"
    if embeddings is not None:
        # the semantic stage's bytes depend on the threshold/cluster knobs
        # AND the embedding table's identity — all in the lineage key
        lineage += (
            f";sem={semantic_threshold}:{semantic_clusters}"
            f":{semantic_max_cluster}:{emb_fingerprint or 'anon'}"
        )

    from pyspark.sql import types as T

    # stage -0.3 (optional): text canonicalization — unicode/whitespace
    # normalization (--normalize) and/or C4 intra-document line cleaning
    # (--clean), ONE stage because both REWRITE text and must run FIRST:
    # every later stage (prior screen, quality, perplexity, shingles,
    # output) must hash/ship the canonical bytes, so `docs` is rebound to
    # the persisted rewritten table once the stage lands. Normalization
    # runs before the line rules (CCNet/C4 order: fix the byte form, then
    # judge lines — an NFD accent or a CRLF must not defeat a line-level
    # rule or a shingle hash). Per-bucket and embarrassingly parallel
    # (both operators are zero-shuffle projections; the only join is
    # clean_lines' bucket-local column re-attach — it drops rows, so the
    # re-attach is semantic; normalize_text is row-preserving and carries
    # the non-text columns through its Arrow batches instead).
    cln_path = os.path.join(out_root, "clean")
    r_cln = None
    if clean or normalize is not None:
        doc_cols = [f.name for f in docs.schema.fields]

        def cln_one(key: str):
            part = docs.filter(bucket_of == key)
            if normalize is not None:
                # row-preserving rewrite: non-text columns ride the Arrow
                # batches (passthrough) — no doc_id re-attach join, no
                # second scan of the bucket (clean_lines below genuinely
                # needs the join because it DROPS rows)
                part = normalize_text(
                    part,
                    "doc_id",
                    "text",
                    form=normalize,
                    passthrough=tuple(
                        c for c in doc_cols if c not in ("doc_id", "text")
                    ),
                ).select(
                    *[
                        F.col("norm").alias("text") if c == "text" else c
                        for c in doc_cols
                    ]
                )
            if not clean:
                return part
            rep = clean_lines(
                part, "doc_id", "text", **(clean_kwargs or {})
            )
            cleaned = (
                rep.filter(F.col("keep"))
                .select("doc_id", F.col("clean").alias("text"))
            )
            # re-attach the non-text columns; original column order so the
            # re-read table's schema equals the raw corpus's
            return (
                part.drop("text").join(cleaned, "doc_id").select(*doc_cols)
            )

        r_cln = run_partitioned(
            spark, store, f"{job_id}/clean", bucket_keys, cln_one,
            cln_path, "part_key", lineage, force=force,
        )
        # every later stage reads the CLEANED corpus; explicit schema —
        # a bucket whose docs all failed the page verdict writes no files
        cln_schema = T.StructType(
            list(docs.schema.fields)
            + [T.StructField("part_key", T.StringType())]
        )
        docs = (
            spark.read.schema(cln_schema).parquet(cln_path)
            .filter(F.col("part_key").cast("string").isin(bucket_keys))
            .drop("part_key")
        )

        def docs_bucket(key: str):
            # partition-pruned read of one cleaned bucket — the part_key
            # predicate hits the directory layout, so a bucket stage scans
            # 1/buckets of the cleaned corpus instead of re-hashing it all
            return (
                spark.read.schema(cln_schema).parquet(cln_path)
                .filter(F.col("part_key").cast("string") == key)
                .drop("part_key")
            )
    else:
        def docs_bucket(key: str):
            return docs.filter(bucket_of == key)

    # stage -0.1/-0.05 (optional): incremental-ingest screen against a
    # PREVIOUSLY INGESTED corpus. The prior corpus is touched exactly once
    # (one global unit builds its <= prior_m_bits-row Bloom position table,
    # sketch.bloom_build); each corpus bucket is then screened map-side
    # (sketch.bloom_screen — k chained broadcast joins, no join against the
    # prior corpus itself) and lands its GUARANTEED-NOVEL doc ids. Every
    # later stage sees only novel docs, so re-ingested duplicates never
    # reach quality scoring or the shingle pass. One-sided error: a doc
    # whose text is in the prior corpus is ALWAYS dropped; a novel doc is
    # spuriously dropped at ~(1-e^(-kn/m))^k, sized by prior_m_bits.
    blm_path = os.path.join(out_root, "prior_bloom")
    nvl_path = os.path.join(out_root, "novel")
    blm_schema = T.StructType(
        [
            T.StructField("pos", T.LongType()),
            T.StructField("part_key", T.StringType()),
        ]
    )
    r_blm = r_nvl = None
    if prior is not None:
        def blm_one(_key: str):
            return bloom_build(
                prior, "text", m_bits=prior_m_bits, k=prior_k
            )

        r_blm = run_partitioned(
            spark, store, f"{job_id}/prior_bloom", ["all"], blm_one,
            blm_path, "part_key", lineage, force=force,
        )

        def nvl_one(key: str):
            part = docs_bucket(key)
            bloom = spark.read.schema(blm_schema).parquet(blm_path).drop(
                "part_key"
            )
            screened = bloom_screen(
                part, "text", bloom, m_bits=prior_m_bits, k=prior_k
            )
            return screened.filter(~F.col("might_contain")).select("doc_id")

        r_nvl = run_partitioned(
            spark, store, f"{job_id}/novel", bucket_keys, nvl_one,
            nvl_path, "part_key", lineage, force=force,
        )

    # explicit read schemas for the id-only stage tables: buckets that kept
    # or flagged nothing write no parquet files, and schema inference over
    # a file-less directory throws — the schemas are known statically
    _nvl_id_field = docs.schema["doc_id"]
    nvl_schema = T.StructType(
        [_nvl_id_field, T.StructField("part_key", T.StringType())]
    )

    def _novel_only(part, key: str):
        """Restrict a bucket's docs to the prior-screen novel set (no-op
        when no prior corpus was given)."""
        if prior is None:
            return part
        kept = (
            spark.read.schema(nvl_schema).parquet(nvl_path)
            .filter(F.col("part_key").cast("string") == key)
            .select("doc_id")
        )
        return part.join(kept, "doc_id", "left_semi")

    # stage 0 (optional): quality keep-verdicts per corpus bucket — every
    # later stage semi-joins this id table, so rejected docs never reach
    # the shingle pass (and, with --prior, never get quality-scored if they
    # are re-ingested duplicates)
    r_qua = None
    if quality:
        def qua_one(key: str):
            part = _novel_only(docs_bucket(key), key)
            rep = quality_filter(part, "doc_id", "text", **(quality_kwargs or {}))
            return rep.filter(F.col("keep")).select("doc_id")

        r_qua = run_partitioned(
            spark, store, f"{job_id}/quality", bucket_keys, qua_one,
            qua_path, "part_key", lineage, force=force,
        )

    _id_field = docs.schema["doc_id"]
    qua_schema = T.StructType(
        [_id_field, T.StructField("part_key", T.StringType())]
    )
    con_schema = T.StructType(
        [
            _id_field,
            T.StructField("n_hits", T.IntegerType()),
            T.StructField("part_key", T.StringType()),
        ]
    )

    def _qua_only(part, key: str):
        """Restrict a bucket's docs to the prior-screen novel set and the
        quality keepers (each a no-op when its stage is off). When quality
        is ON its keep table was computed over the novel-restricted docs
        (qua_one), so quality-keeps ⊆ novel already and the separate novel
        semi-join would be pure redundant I/O — it is applied only when
        quality is off."""
        if not quality:
            return _novel_only(part, key)
        kept = (
            spark.read.schema(qua_schema).parquet(qua_path)
            .filter(F.col("part_key").cast("string") == key)
            .select("doc_id")
        )
        return part.join(kept, "doc_id", "left_semi")

    # stage 0.4/0.5 (optional): perplexity filter — train the hashed-bigram
    # LM on the clean target corpus ONCE (a <= 2*ppl_buckets-row table, one
    # global checkpoint unit), then score each corpus bucket against the
    # persisted model (embarrassingly parallel, broadcast model join) and
    # land keep verdicts as an ids-only table. Docs the model cannot score
    # (< 2 words) are KEPT — they are judged by the other filters. Scoring
    # runs on the quality keepers only, so rejected docs are never scored.
    lmm_path = os.path.join(out_root, "lm_model")
    ppl_path = os.path.join(out_root, "ppl")
    lmm_schema = T.StructType(
        [
            T.StructField("space", T.IntegerType()),
            T.StructField("b", T.LongType()),
            T.StructField("llp", T.LongType()),
            T.StructField("part_key", T.StringType()),
        ]
    )
    r_lmm = r_ppl = None
    if ppl_target is not None:
        def lmm_one(_key: str):
            return lm_bucket_logprobs(
                ppl_target, "doc_id", "text", buckets=ppl_buckets
            )

        r_lmm = run_partitioned(
            spark, store, f"{job_id}/lm_model", ["all"], lmm_one,
            lmm_path, "part_key", lineage, force=force,
        )

        def ppl_one(key: str):
            part = _qua_only(docs_bucket(key), key)
            model = spark.read.schema(lmm_schema).parquet(lmm_path).drop(
                "part_key"
            )
            scored = lm_score(
                part, "doc_id", "text", model, buckets=ppl_buckets
            )
            return scored.filter(
                (F.col("n_bigrams") == 0)
                | (F.col("avg_logprob") >= F.lit(float(ppl_min_avg_logprob)))
            ).select("doc_id")

        r_ppl = run_partitioned(
            spark, store, f"{job_id}/ppl", bucket_keys, ppl_one,
            ppl_path, "part_key", lineage, force=force,
        )

    def kept_only(part, key: str):
        """Quality + perplexity keepers of one bucket (each a no-op when
        its stage is off)."""
        part = _qua_only(part, key)
        if ppl_target is not None:
            kept = (
                spark.read.schema(qua_schema).parquet(ppl_path)
                .filter(F.col("part_key").cast("string") == key)
                .select("doc_id")
            )
            part = part.join(kept, "doc_id", "left_semi")
        return part

    def restrict_global(df):
        """Semi-join a global id-carrying table down to the prior-novel +
        quality + ppl keepers across all of this run's buckets (each a
        no-op when its stage is off; the novel join is skipped when
        quality is on — quality-keeps ⊆ novel by construction)."""
        if prior is not None and not quality:
            kept = (
                spark.read.schema(nvl_schema).parquet(nvl_path)
                .filter(F.col("part_key").cast("string").isin(bucket_keys))
                .select("doc_id")
            )
            df = df.join(kept, "doc_id", "left_semi")
        if quality:
            kept = (
                spark.read.schema(qua_schema).parquet(qua_path)
                .filter(F.col("part_key").cast("string").isin(bucket_keys))
                .select("doc_id")
            )
            df = df.join(kept, "doc_id", "left_semi")
        if ppl_target is not None:
            kept = (
                spark.read.schema(qua_schema).parquet(ppl_path)
                .filter(F.col("part_key").cast("string").isin(bucket_keys))
                .select("doc_id")
            )
            df = df.join(kept, "doc_id", "left_semi")
        return df

    # explicit read schemas for the signature/cluster tables too: a corpus
    # fully rejected by the pre-filters (legitimate under strict rules)
    # writes no parquet files, and schema inference over a file-less
    # directory throws — the job must degrade to empty outputs instead
    sig_schema = T.StructType(
        [
            _id_field,
            T.StructField("band", T.IntegerType()),
            T.StructField("sig_str", T.StringType()),
            T.StructField("part_key", T.StringType()),
        ]
    )
    clu_schema = T.StructType(
        [
            _id_field,
            T.StructField("cluster_id", _id_field.dataType),
            T.StructField("is_keeper", T.BooleanType()),
            T.StructField("part_key", T.StringType()),
        ]
    )

    # stage 1: band signatures per corpus bucket (resumable unit = bucket)
    def sig_one(key: str):
        part = kept_only(docs_bucket(key), key)
        return minhash_band_signatures(
            part, "doc_id", "text", k=k, n_hashes=n_hashes, bands=bands
        )

    r_sig = run_partitioned(
        spark, store, f"{job_id}/signatures", bucket_keys, sig_one,
        sig_path, "part_key", lineage, force=force,
    )

    # stage 2: global pairs -> components -> keepers over stored signatures
    def clusters_one(_key: str):
        # read ONLY this run's bucket partitions: dynamic partition
        # overwrite replaces just the part_keys that re-ran, so a previous
        # larger --buckets run can leave stale out-of-range part_key
        # directories on disk — the isin prunes them at the scan
        sigs = (
            spark.read.schema(sig_schema).parquet(sig_path)
            .filter(F.col("part_key").cast("string").isin(bucket_keys))
            .drop("part_key")
        )
        pairs = lsh_pairs_from_band_sigs(
            sigs, "doc_id", max_bucket_size=max_bucket_size
        )
        ids = restrict_global(docs.select("doc_id"))
        return dedup_clusters(ids, "doc_id", pairs)

    r_clu = run_partitioned(
        spark, store, f"{job_id}/clusters", ["all"], clusters_one,
        clu_path, "part_key", lineage, force=force,
    )

    # stage 2.5 (optional): contaminated doc ids per corpus bucket —
    # broadcast bench shingle set, embarrassingly parallel like stage 1
    r_con = None
    if bench is not None:
        def con_one(key: str):
            part = kept_only(docs_bucket(key), key)
            rep = decontaminate(
                part, "doc_id", "text", bench, "doc_id", "text",
                k=k, min_hits=decon_min_hits,
            )
            return rep.filter(F.col("contaminated")).select("doc_id", "n_hits")

        r_con = run_partitioned(
            spark, store, f"{job_id}/contamination", bucket_keys, con_one,
            con_path, "part_key", lineage, force=force,
        )

    # stage 2.7 (optional): semantic (embedding-space) drops — one global
    # checkpoint unit like clusters. The quantizer is trained with the
    # sampled-kmeans production trainer (deterministic: hash-deterministic
    # sample + seeded kmeans++/Lloyd), so kill/resume stays byte-identical;
    # the corpus text is never touched — only the embedding table moves.
    sem_path = os.path.join(out_root, "semantic")
    sem_schema = T.StructType(
        [_id_field, T.StructField("part_key", T.StringType())]
    )
    r_sem = None
    if embeddings is not None:
        def sem_one(_key: str):
            # embeddings are an EXTERNAL id-carrying table: align them
            # with the current doc universe first (docs is the cleaned
            # corpus when --clean is on — without this, vectors of docs
            # the page verdict already removed could elect themselves
            # min-id exemplars and drop SURVIVING near-dups of content
            # that no longer exists in the output), then through the
            # novel/quality/ppl keeper joins like every global stage
            emb = restrict_global(
                embeddings.join(docs.select("doc_id"), "doc_id", "left_semi")
            )
            if emb.limit(1).count() == 0:
                # nothing survived to here (or no embeddings align with
                # the survivors): emit an empty drop table rather than
                # asking the trainer to fit a quantizer on nothing
                return spark.createDataFrame([], T.StructType([_id_field]))
            cents = train_ivf_centroids(
                emb, "doc_id", "embedding", k=semantic_clusters
            )
            verdicts = semantic_dedup(
                emb, "doc_id", "embedding",
                threshold=semantic_threshold,
                n_clusters=semantic_clusters,
                centroids=cents,
                max_cluster_size=semantic_max_cluster,
            )
            return verdicts.filter(~F.col("keep")).select("doc_id")

        r_sem = run_partitioned(
            spark, store, f"{job_id}/semantic", ["all"], sem_one,
            sem_path, "part_key", lineage, force=force,
        )

    # stage 2.8 (optional): computed temperature-mix recipe — ONE global
    # checkpoint unit producing the |sources|-sized rate table from the
    # SURVIVING corpus (keepers minus contamination minus semantic drops,
    # the exact population the output stage emits). Token weighting costs
    # one text-bytes pass, which is why the result is checkpointed.
    mixr_path = os.path.join(out_root, "mix_rates")
    if mix_alpha is not None:
        mixr_schema = T.StructType(
            [
                docs.schema[mix_by],
                T.StructField("ppm", T.IntegerType()),
                T.StructField("part_key", T.StringType()),
            ]
        )

        def mixr_one(_key: str):
            clusters = (
                spark.read.schema(clu_schema).parquet(clu_path)
                .filter(F.col("is_keeper"))
                .select("doc_id")
            )
            kept = restrict_global(docs).join(clusters, "doc_id", "left_semi")
            if bench is not None:
                bad = (
                    spark.read.schema(con_schema).parquet(con_path)
                    .filter(F.col("part_key").cast("string").isin(bucket_keys))
                    .select("doc_id")
                )
                kept = kept.join(bad, "doc_id", "left_anti")
            if embeddings is not None:
                sem_bad = spark.read.schema(sem_schema).parquet(
                    sem_path
                ).select("doc_id")
                kept = kept.join(sem_bad, "doc_id", "left_anti")
            if mix_by_tokens:
                kept = kept.withColumn("_w", n_words(F.col("text")))
            rates = temperature_rates(
                kept, by=mix_by, alpha=mix_alpha,
                target_frac=mix_target_frac,
                weight_col="_w" if mix_by_tokens else None,
            )
            return spark.createDataFrame(
                sorted(rates.items()), T.StructType(mixr_schema.fields[:-1])
            )

        r_mixr = run_partitioned(
            spark, store, f"{job_id}/mix_rates", ["all"], mixr_one,
            mixr_path, "part_key", lineage, force=force,
        )
        mix_rates_ppm = {
            r[mix_by]: r["ppm"]
            for r in spark.read.schema(mixr_schema).parquet(mixr_path)
            .drop("part_key").collect()
        }
    else:
        r_mixr = None

    # final stage: keeper filter (minus contaminated docs and semantic
    # drops) per corpus bucket (only stage touching text bytes besides 1
    # and 2.5)
    def out_one(key: str):
        clusters = spark.read.schema(clu_schema).parquet(clu_path).drop(
            "part_key"
        )
        part = kept_only(docs_bucket(key), key)
        out = (
            part.join(clusters, "doc_id")
            .filter(F.col("is_keeper"))
            .drop("is_keeper")
        )
        if bench is not None:
            bad = (
                spark.read.schema(con_schema).parquet(con_path)
                .filter(F.col("part_key").cast("string").isin(bucket_keys))
                .select("doc_id")
            )
            out = out.join(bad, "doc_id", "left_anti")
        if embeddings is not None:
            sem_bad = spark.read.schema(sem_schema).parquet(sem_path).select(
                "doc_id"
            )
            out = out.join(sem_bad, "doc_id", "left_anti")
        if mix_rates_ppm is not None:
            # mixing recipe rides the output pass: the draw is a pure
            # function of doc_id (engine/cluster-size reproducible), so no
            # extra stage or shuffle — just a broadcast rate lookup
            out = source_sample(
                out, "doc_id", mix_rates_ppm, by=mix_by,
                salt="mixrate", default_ppm=mix_default_ppm,
            )
        if scrub:
            # PII redaction rides the same pass that already touches text
            # bytes — a pure column expression, no extra stage or join
            out = out.withColumn("text", pii_clean_col(F.col("text")))
        return out

    r_out = run_partitioned(
        spark, store, f"{job_id}/output", bucket_keys, out_one,
        out_path, "part_key", lineage, force=force,
    )
    # optional exact-substring stages over the SURVIVING corpus: one global
    # interval table (small: rows = maximal duplicated spans), then a
    # per-bucket text rewrite
    r_spn = r_fin = None
    if span_k is not None:
        ded_schema = T.StructType(
            list(docs.schema.fields)
            + [
                T.StructField("cluster_id", _id_field.dataType),
                T.StructField("part_key", T.StringType()),
            ]
        )
        spn_schema = T.StructType(
            [
                _id_field,
                T.StructField("ds", T.IntegerType()),
                T.StructField("de", T.IntegerType()),
                T.StructField("part_key", T.StringType()),
            ]
        )

        def read_deduped(keys):
            return (
                spark.read.schema(ded_schema).parquet(out_path)
                .filter(F.col("part_key").cast("string").isin(keys))
                .drop("part_key")
            )

        def spn_one(_key: str):
            return span_dup_intervals(
                read_deduped(bucket_keys), "doc_id", "text", k=span_k
            )

        r_spn = run_partitioned(
            spark, store, f"{job_id}/span_intervals", ["all"], spn_one,
            spn_path, "part_key", lineage, force=force,
        )

        def fin_one(key: str):
            part = read_deduped([key])
            ivals = (
                spark.read.schema(spn_schema).parquet(spn_path)
                .drop("part_key")
            )
            clean = span_reassemble(part, ivals, "doc_id", "text").select(
                "doc_id",
                F.col("clean").alias("text"),
                F.col("n_dup_tokens").alias("span_dup_tokens"),
            )
            return part.drop("text").join(clean, "doc_id")

        r_fin = run_partitioned(
            spark, store, f"{job_id}/span_clean", bucket_keys, fin_one,
            fin_path, "part_key", lineage, force=force,
        )

    # optional EXPORT stages — the step between curation and training,
    # over the FINAL corpus (span-cleaned when the span stages ran, else
    # the deduped output).
    #
    # ``pack_vocab``/``packed`` (--pack SEQ_LEN, two global units):
    # build_vocab persists the dense word->id table (the tokenizer
    # artifact training needs for decoding; corpus-scale distinct but
    # vocab-sized output), then encode each doc's whitespace tokens via
    # the broadcast vocab and cut fixed-length boundary-crossing training
    # rows with pack_sequences. The encode costs one explode + one
    # doc_id-keyed regroup — the honest price of tokenizing text in-engine;
    # a corpus already carrying token arrays (the pre-tokenized sequences
    # table) would feed pack_sequences directly and skip both.
    #
    # ``shards`` (--shard-size N, one global unit): shuffle_shards assigns
    # every training row (packed chunks when --pack is on, else surviving
    # docs) its position in a deterministic global permutation plus
    # fixed-size shard ids — webdataset-style export, no global
    # single-partition sort (distributed zipWithIndex).
    r_voc = r_pck = r_shd = None
    if pack_len is not None or shard_size is not None or stats:
        if span_k is not None:
            exp_path = fin_path
            exp_schema = T.StructType(
                [f for f in docs.schema.fields if f.name != "text"]
                + [
                    T.StructField("cluster_id", _id_field.dataType),
                    T.StructField("text", T.StringType()),
                    T.StructField("span_dup_tokens", T.IntegerType()),
                    T.StructField("part_key", T.StringType()),
                ]
            )
        else:
            exp_path = out_path
            exp_schema = T.StructType(
                list(docs.schema.fields)
                + [
                    T.StructField("cluster_id", _id_field.dataType),
                    T.StructField("part_key", T.StringType()),
                ]
            )

        def read_export():
            return (
                spark.read.schema(exp_schema).parquet(exp_path)
                .filter(F.col("part_key").cast("string").isin(bucket_keys))
                .drop("part_key")
            )

        # --epochs: multi-epoch repetition (curation.epoch_upsample)
        # materialized into the TRAINING export only — the corpus tables
        # (deduped / span_deduped) stay one-copy-per-doc; copies get a
        # composite '<id>#<epoch>' identity so downstream grouping
        # (tokenize, pack, shard permutation) treats each repeat as its
        # own row. The vocab/BPE artifact still trains on UNIQUE docs
        # (repeats add no information to a tokenizer — and keeping the
        # vocab stage epoch-free means tuning epochs never retrains it).
        def maybe_epochs(rows, id_col):
            if epoch_rates_ppm is None:
                return rows, id_col
            up = epoch_upsample(
                rows, id_col, epoch_rates_ppm, by=mix_by,
                default_ppm=epoch_default_ppm,
            )
            return (
                up.withColumn(
                    "_eid",
                    F.concat_ws(
                        "#", F.col(id_col).cast("string"), F.col("epoch")
                    ),
                ).drop("epoch"),
                "_eid",
            )

        # stage-local lineage: epoch rates change only the bytes the
        # packed/shards stages emit (vocab and every corpus stage are
        # epoch-free), so only those two invalidate on a rate change
        ep_tag = (
            ""
            if epoch_rates_ppm is None
            else (
                f";ep={mix_by}:{sorted(epoch_rates_ppm.items())}"
                f":{epoch_default_ppm}"
            )
        )
        # same stage-local rule for the FIM rewrite: it changes only the
        # packed token bytes (and the shards cut from them); the vocab
        # artifact and every corpus stage are FIM-free
        ep_tag += (
            "" if fim_rate_ppm is None else f";fim={fim_rate_ppm}"
        )

    voc_path = os.path.join(out_root, "pack_vocab")
    pck_path = os.path.join(out_root, "packed")
    if pack_len is not None:
        # two tokenizer forms behind the same two stages: word-level dense
        # vocab (default) or BPE subwords (--pack-bpe N_MERGES — the vocab
        # stage persists the trained merge artifact instead, and the pack
        # stage encodes through it)
        if pack_bpe_merges is not None:
            def voc_one(_key: str):
                return train_bpe(
                    read_export(), "text", n_merges=pack_bpe_merges
                )

            voc_schema = T.StructType(
                [
                    T.StructField("token_id", T.IntegerType()),
                    T.StructField("token", T.StringType()),
                    T.StructField("left", T.StringType()),
                    T.StructField("right", T.StringType()),
                    T.StructField("rank", T.IntegerType()),
                    T.StructField("part_key", T.StringType()),
                ]
            )
        else:
            def voc_one(_key: str):
                toks = read_export().select(
                    F.explode(words(F.col("text"))).alias("token")
                )
                return build_vocab(toks, "token")

            voc_schema = T.StructType(
                [
                    T.StructField("token", T.StringType()),
                    T.StructField("vocab_id", T.LongType()),
                    T.StructField("part_key", T.StringType()),
                ]
            )

        r_voc = run_partitioned(
            spark, store, f"{job_id}/pack_vocab", ["all"], voc_one,
            voc_path, "part_key", lineage, force=force,
        )

        def pck_one(_key: str):
            vocab = (
                spark.read.schema(voc_schema).parquet(voc_path)
                .drop("part_key")
            )
            rows, idc = maybe_epochs(read_export(), "doc_id")
            if pack_bpe_merges is not None:
                arr = bpe_encode(rows, idc, "text", vocab).select(
                    idc, "tokens"
                )
            else:
                toks = rows.select(
                    idc,
                    F.posexplode(words(F.col("text"))).alias("pos", "token"),
                )
                enc = encode_with_vocab(toks, vocab, "token")
                arr = enc.groupBy(idc).agg(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("pos"), F.col("vocab_id"))
                            )
                        ),
                        lambda s: s["vocab_id"].cast("int"),
                    ).alias("tokens")
                )
            if fim_rate_ppm is not None:
                # FIM rewrite (Bavarian et al. 2022 PSM order) on the
                # per-doc arrays BEFORE packing, so infilling spans never
                # cross document boundaries; sentinel ids are negative —
                # below any trained vocab id (word vocab starts at 1 with
                # 0 reserved, BPE at 0), so decode/audit tables never
                # collide with them
                arr = (
                    fim_transform(
                        arr, "tokens", rate_ppm=fim_rate_ppm,
                        prefix_tok=-1, suffix_tok=-2, middle_tok=-3,
                        id_col=idc,
                    )
                    .select(idc, F.col("tokens_fim").alias("tokens"))
                )
            return pack_sequences(
                arr, idc, "tokens", seq_len=pack_len,
                n_groups=pack_groups, pad_value=pack_pad,
            )

        r_pck = run_partitioned(
            spark, store, f"{job_id}/packed", ["all"], pck_one,
            pck_path, "part_key", lineage + ep_tag, force=force,
        )

    shd_path = os.path.join(out_root, "shards")
    if shard_size is not None:
        pck_schema = T.StructType(
            [
                T.StructField("grp", T.IntegerType()),
                T.StructField("chunk_id", T.IntegerType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_real", T.IntegerType()),
                T.StructField("part_key", T.StringType()),
            ]
        )

        def shd_one(_key: str):
            if pack_len is not None:
                # shard the packed training rows; (grp, chunk_id) is the
                # unique row identity shuffle_shards permutes on
                rows = (
                    spark.read.schema(pck_schema).parquet(pck_path)
                    .drop("part_key")
                    .withColumn(
                        "_sid",
                        F.concat_ws(":", F.col("grp"), F.col("chunk_id")),
                    )
                )
                return shuffle_shards(rows, "_sid", shard_size).drop("_sid")
            rows, idc = maybe_epochs(read_export(), "doc_id")
            return shuffle_shards(rows, idc, shard_size)

        r_shd = run_partitioned(
            spark, store, f"{job_id}/shards", ["all"], shd_one,
            shd_path, "part_key", lineage + ep_tag, force=force,
        )

    # optional CORPUS REPORT CARD (--stats, one global unit): the sketch
    # family run over the FINAL corpus (span-cleaned when those stages
    # ran, else the deduped output) and persisted as one long-form table
    # (metric, k, v):
    #   hll_word_register  — HLL register table (p=14) over the word
    #                        stream; hll_merge-able with future shards'
    #                        stats tables, so cross-run distinct counting
    #                        never rescans this corpus
    #   len_hist_bucket    — base-2 HDR bucket table (sub_bits=5) over doc
    #                        char lengths; hist_merge-able the same way
    #   summary:*          — exact n_docs / n_tokens, the HLL distinct-word
    #                        estimate (rounded), and the p50/p99 doc-length
    #                        cuts derived from the bucket table
    # Costs one text-bytes pass. Deliberately NOT part of the global
    # lineage: stats change no bytes any other stage reads, so toggling
    # them must not invalidate the pipeline — the stage gets its own
    # lineage suffix instead.
    sts_path = os.path.join(out_root, "stats")
    r_sts = None
    if stats:

        def sts_one(_key: str):
            corpus = read_export()
            wstream = corpus.select(F.explode(words(F.col("text"))).alias("w"))
            regs = hll_build(wstream, "w", p=14).localCheckpoint(eager=False)
            reg_rows = regs.select(
                F.lit("hll_word_register").alias("metric"),
                F.col("r").cast("long").alias("k"),
                F.col("rank").cast("long").alias("v"),
            )
            lens = corpus.select(F.length("text").cast("long").alias("v"))
            hb = hist_build(lens, "v", sub_bits=5).localCheckpoint(eager=False)
            hist_rows = hb.select(
                F.lit("len_hist_bucket").alias("metric"),
                F.col("b").alias("k"),
                F.col("cnt").alias("v"),
            )
            q_rows = hist_quantiles(hb, [500_000, 990_000], sub_bits=5).select(
                F.concat(F.lit("summary:doc_len_q"), F.col("q_ppm")).alias(
                    "metric"
                ),
                F.col("rank").alias("k"),
                F.col("value").alias("v"),
            )
            est_rows = hll_estimate(regs, p=14).select(
                F.lit("summary:distinct_words_est").alias("metric"),
                F.col("filled").alias("k"),
                F.round(F.col("est")).cast("long").alias("v"),
            )
            tot_rows = corpus.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(
                    F.sum(n_words(F.col("text"))), F.lit(0).cast("long")
                ).alias("n_tokens"),
            ).selectExpr(
                "stack(2, 'summary:n_docs', 0L, n_docs, "
                "'summary:n_tokens', 0L, n_tokens) AS (metric, k, v)"
            )
            out = reg_rows
            for part in (hist_rows, q_rows, est_rows, tot_rows):
                out = out.unionByName(part)
            return out

        r_sts = run_partitioned(
            spark, store, f"{job_id}/stats", ["all"], sts_one,
            sts_path, "part_key", lineage + ";stats=p14,s5", force=force,
        )

    stages = []
    if r_cln is not None:
        stages.append(r_cln)
    if r_blm is not None:
        stages.extend([r_blm, r_nvl])
    if r_qua is not None:
        stages.append(r_qua)
    if r_lmm is not None:
        stages.extend([r_lmm, r_ppl])
    stages.extend([r_sig, r_clu])
    if r_con is not None:
        stages.append(r_con)
    if r_sem is not None:
        stages.append(r_sem)
    if r_mixr is not None:
        stages.append(r_mixr)
    stages.append(r_out)
    if r_spn is not None:
        stages.extend([r_spn, r_fin])
    if r_voc is not None:
        stages.extend([r_voc, r_pck])
    if r_shd is not None:
        stages.append(r_shd)
    if r_sts is not None:
        stages.append(r_sts)
    return tuple(stages)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--output", required=True, help="output root dir")
    p.add_argument("--checkpoint", required=True, help="checkpoint store dir")
    p.add_argument("--buckets", type=int, default=4)
    p.add_argument("--shingle-k", type=int, default=3)
    p.add_argument("--n-hashes", type=int, default=16)
    p.add_argument("--bands", type=int, default=4)
    p.add_argument("--max-bucket-size", type=int, default=1000)
    p.add_argument("--force", action="store_true")
    p.add_argument("--job-id", default="corpus_dedup")
    p.add_argument("--bench", default=None,
                   help="optional eval-set parquet (doc_id, text); adds the "
                        "decontamination stage")
    p.add_argument("--decon-min-hits", type=int, default=1)
    p.add_argument("--scrub", action="store_true",
                   help="redact PII (curation.pii_clean_col) in the output "
                        "stage — same pass that already writes text bytes")
    p.add_argument("--clean", action="store_true",
                   help="prepend the C4 line-cleaning stage "
                        "(curation.clean_lines): rule-failing lines are "
                        "cut and page-verdict failures dropped BEFORE "
                        "anything hashes text; all later stages read the "
                        "cleaned bytes")
    p.add_argument("--clean-args", default=None,
                   help="JSON kwargs for curation.clean_lines, e.g. "
                        "'{\"terminal_chars\": \"\", \"min_kept_lines\": 1}'")
    p.add_argument("--normalize", nargs="?", const="NFC", default=None,
                   choices=["NFC", "NFKC"],
                   help="prepend unicode + whitespace normalization "
                        "(curation.normalize_text) to the rewrite stage, "
                        "BEFORE the line rules and anything that hashes "
                        "bytes — different scrapers emit the same visible "
                        "text in different byte forms, and un-normalized "
                        "corpora silently under-dedup (optional form "
                        "argument, default NFC)")
    p.add_argument("--quality", action="store_true",
                   help="prepend the checkpointed quality_filter stage; "
                        "rejected docs never reach the shingle pass")
    p.add_argument("--quality-args", default=None,
                   help="JSON kwargs for curation.quality_filter, e.g. "
                        "'{\"max_dup_word_fraction\": 0.9}' — thresholds "
                        "are corpus-dependent (part of the stage lineage, "
                        "so changing them re-runs the affected stages)")
    p.add_argument("--prior", default=None,
                   help="optional previously-ingested corpus parquet "
                        "(doc_id, text): builds its Bloom position table "
                        "once (global stage) and drops re-ingested "
                        "duplicates map-side before any other stage — the "
                        "incremental-ingest screen (sketch.bloom_*)")
    p.add_argument("--prior-m-bits", type=int, default=1 << 20,
                   help="Bloom filter size in bits (~10x the prior "
                        "corpus's distinct docs for ~1%% spurious drops)")
    p.add_argument("--prior-k", type=int, default=4)
    p.add_argument("--ppl-target", default=None,
                   help="optional clean-corpus parquet (doc_id, text): "
                        "trains the hashed-bigram LM once (global stage) "
                        "and drops docs below --ppl-min-avg-logprob "
                        "(CCNet-style perplexity filter) before shingling")
    p.add_argument("--ppl-min-avg-logprob", type=float, default=-7.0,
                   help="keep docs with avg_logprob >= this (perplexity "
                        "<= exp(7) ~ 1100 by default); unscoreable "
                        "(<2-word) docs are kept")
    p.add_argument("--ppl-buckets", type=int, default=8192)
    p.add_argument("--span-dedup", type=int, default=None, metavar="K",
                   help="append exact-substring dedup at K-token window "
                        "granularity over the surviving corpus (global "
                        "interval stage + per-bucket rewrite into "
                        "span_deduped/)")
    p.add_argument("--pack", type=int, default=None, metavar="SEQ_LEN",
                   help="append the training-export packing stages: build "
                        "the word vocab over the final corpus, encode, and "
                        "cut SEQ_LEN-token boundary-crossing training rows "
                        "(pack_sequences) into packed/")
    p.add_argument("--pack-bpe", type=int, default=None, metavar="N_MERGES",
                   help="tokenize the packed rows with a BPE artifact "
                        "trained on the final corpus (N_MERGES merges) "
                        "instead of the word-level dense vocab")
    p.add_argument("--pack-groups", type=int, default=32,
                   help="independent pack groups (parallelism knob; "
                        "packing quality is unaffected)")
    p.add_argument("--fim-ppm", type=int, default=None, metavar="PPM",
                   help="rewrite this ppm fraction of docs into "
                        "fill-in-middle (PSM) order before packing "
                        "(requires --pack; sentinels -1/-2/-3)")
    p.add_argument("--pack-pad", type=int, default=None,
                   help="right-pad each group's final partial chunk with "
                        "this token id")
    p.add_argument("--shard-size", type=int, default=None,
                   help="append the shuffle_shards export stage: "
                        "deterministic global permutation + fixed-size "
                        "shard ids over the training rows (packed chunks "
                        "when --pack is on, else surviving docs)")
    p.add_argument("--stats", action="store_true",
                   help="append the corpus report-card stage: HLL word "
                        "registers + HDR length-histogram buckets + exact "
                        "doc/token totals over the final corpus, persisted "
                        "as one mergeable long-form table (does not "
                        "invalidate other stages when toggled)")
    p.add_argument("--mix", default=None,
                   help="JSON object of per-source keep rates in ppm, e.g. "
                        "'{\"web\": 800000, \"books\": 1000000}' — applied "
                        "as source_sample inside the output stage")
    p.add_argument("--mix-alpha", type=float, default=None,
                   help="compute the mixing recipe INSIDE the job: "
                        "temperature-scaled rates (n^alpha) over the "
                        "surviving corpus (mutually exclusive with --mix)")
    p.add_argument("--mix-target", type=float, default=0.5,
                   help="target kept fraction for --mix-alpha")
    p.add_argument("--mix-tokens", action="store_true",
                   help="weigh the --mix-alpha recipe by token counts "
                        "(the token-budget form) instead of doc counts")
    p.add_argument("--epochs", default=None,
                   help="JSON object of per-source repetition rates in ppm "
                        "(2300000 = 2.3 epochs) — curation.epoch_upsample "
                        "materialized into the TRAINING export (packed "
                        "rows / shards); requires --pack and/or "
                        "--shard-size; corpus tables stay one-copy-per-doc")
    p.add_argument("--epochs-default", type=int, default=1_000_000,
                   help="repetition ppm for sources absent from --epochs "
                        "(default 1000000 = exactly one copy)")
    p.add_argument("--embeddings", default=None,
                   help="optional embeddings parquet (doc_id, embedding); "
                        "adds the SEMANTIC dedup stage (SemDeDup): docs "
                        "whose embedding has a lower-id same-cluster "
                        "neighbor above --semantic-threshold are dropped "
                        "in the output stage")
    p.add_argument("--semantic-threshold", type=float, default=0.95)
    p.add_argument("--semantic-clusters", type=int, default=8)
    p.add_argument("--semantic-max-cluster", type=int, default=None,
                   help="exempt clusters larger than this from the screen")
    args = p.parse_args(argv)

    spark = get_spark("run_dedup")
    docs = spark.read.parquet(args.input)
    prior = spark.read.parquet(args.prior) if args.prior else None
    bench = spark.read.parquet(args.bench) if args.bench else None
    ppl_target = (
        spark.read.parquet(args.ppl_target) if args.ppl_target else None
    )
    embeddings = (
        spark.read.parquet(args.embeddings) if args.embeddings else None
    )
    t0 = time.perf_counter()
    results = run_dedup_pipeline(
        spark, docs, args.output, args.checkpoint,
        buckets=args.buckets, k=args.shingle_k, n_hashes=args.n_hashes,
        bands=args.bands, max_bucket_size=args.max_bucket_size,
        job_id=args.job_id, force=args.force,
        bench=bench, bench_fingerprint=args.bench,
        decon_min_hits=args.decon_min_hits, scrub=args.scrub,
        clean=args.clean,
        clean_kwargs=(
            json.loads(args.clean_args) if args.clean_args else None
        ),
        normalize=args.normalize,
        quality=args.quality,
        quality_kwargs=(
            json.loads(args.quality_args) if args.quality_args else None
        ),
        prior=prior, prior_fingerprint=args.prior,
        prior_m_bits=args.prior_m_bits, prior_k=args.prior_k,
        ppl_target=ppl_target, ppl_fingerprint=args.ppl_target,
        ppl_min_avg_logprob=args.ppl_min_avg_logprob,
        ppl_buckets=args.ppl_buckets,
        mix_rates_ppm=json.loads(args.mix) if args.mix else None,
        mix_alpha=args.mix_alpha, mix_target_frac=args.mix_target,
        mix_by_tokens=args.mix_tokens,
        epoch_rates_ppm=json.loads(args.epochs) if args.epochs else None,
        epoch_default_ppm=args.epochs_default,
        span_k=args.span_dedup,
        pack_len=args.pack, pack_bpe_merges=args.pack_bpe,
        fim_rate_ppm=args.fim_ppm,
        pack_groups=args.pack_groups,
        pack_pad=args.pack_pad, shard_size=args.shard_size,
        stats=args.stats,
        embeddings=embeddings, emb_fingerprint=args.embeddings,
        semantic_threshold=args.semantic_threshold,
        semantic_clusters=args.semantic_clusters,
        semantic_max_cluster=args.semantic_max_cluster,
    )
    names = []
    if args.clean or args.normalize:
        names.append("clean")
    if args.prior:
        names.extend(["prior_bloom", "novel"])
    if args.quality:
        names.append("quality")
    if args.ppl_target:
        names.extend(["lm_model", "ppl"])
    names.extend(["signatures", "clusters"])
    if bench is not None:
        names.append("contamination")
    if embeddings is not None:
        names.append("semantic")
    if args.mix_alpha is not None:
        names.append("mix_rates")
    names.append("output")
    if args.span_dedup is not None:
        names.extend(["span_intervals", "span_clean"])
    if args.pack is not None:
        names.extend(["pack_vocab", "packed"])
    if args.shard_size is not None:
        names.append("shards")
    if args.stats:
        names.append("stats")
    summary = {
        "job_id": args.job_id,
        "stages": {
            n: {
                "partitions": len(r),
                "skipped": sum(x.skipped for x in r),
                "rows": sum(x.rows for x in r),
                "wall_ms": sum(x.wall_ms for x in r),
            }
            for n, r in zip(names, results)
        },
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
