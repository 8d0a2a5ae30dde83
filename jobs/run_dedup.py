"""spark-submit entry point for resumable corpus-scale dedup.

    spark-submit --py-files gfg_spark.zip jobs/run_dedup.py \
        --input /path/to/documents --output /path/to/deduped \
        --checkpoint /path/to/ckpt [--buckets 8] [--max-bucket-size 1000] \
        [--force]

The flagship 100 TB story — MinHash LSH pairs -> connected components ->
(optional) test-set decontamination -> keeper filter — composed as ONE
resumable pipeline behind the checkpoint store (reference analog: the
stage-separated pipeline of AttachFeature.py:1046-1112), not just unit
operators. Three stages (four with ``--bench``), each recorded per
partition in the CheckpointStore so a crash resumes without recomputing
finished work:

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
3. ``output`` (per doc-id hash bucket): keeper filter — each bucket of the
   corpus equi-joins its slice of the cluster table and keeps survivors.
   Text bytes are only touched here and in stage 1. ``--scrub`` folds PII
   redaction (curation.pii_clean_col) into this same pass: at 100 TB the
   scrub is free when it rides a stage that already rewrites text.

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
    decontaminate,
    dedup_clusters,
    lsh_pairs_from_band_sigs,
    minhash_band_signatures,
)
from geofeaturegeneration_spark.operators.curation import pii_clean_col
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
    decon_min_hits: int = 1,
    scrub: bool = False,
):
    """Run the dedup stages with per-stage checkpointed resume.

    ``docs`` must carry (doc_id, text); every column of ``docs`` is
    preserved on the surviving rows plus (cluster_id). ``bench`` (optional,
    (doc_id, text)) adds a checkpointed DECONTAMINATION stage: docs sharing
    >= ``decon_min_hits`` k-shingles with the benchmark set are dropped
    from the final output alongside dedup losers (resumable unit = corpus
    bucket, same as signatures — the bench shingle set is broadcast, so
    the stage is embarrassingly parallel too). Returns the per-stage
    PartitionResult lists (3 or 4 of them)."""
    store = CheckpointStore(spark, ckpt_path)
    sig_path = os.path.join(out_root, "signatures")
    clu_path = os.path.join(out_root, "clusters")
    con_path = os.path.join(out_root, "contaminated")
    out_path = os.path.join(out_root, "deduped")
    bucket_keys = [str(b) for b in range(buckets)]
    bucket_of = F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("string")
    lineage = f"{lineage};buckets={buckets};k={k};h={n_hashes};b={bands}"
    if bench is not None:
        lineage += f";decon={decon_min_hits}"
    if scrub:
        # scrub changes output BYTES, so it must invalidate the output
        # stage's checkpoints when toggled — hence part of the lineage key
        lineage += ";scrub=1"

    # stage 1: band signatures per corpus bucket (resumable unit = bucket)
    def sig_one(key: str):
        part = docs.filter(bucket_of == key)
        return minhash_band_signatures(
            part, "doc_id", "text", k=k, n_hashes=n_hashes, bands=bands
        )

    r_sig = run_partitioned(
        spark, store, f"{job_id}/signatures", bucket_keys, sig_one,
        sig_path, "part_key", lineage, force=force,
    )

    # stage 2: global pairs -> components -> keepers over stored signatures
    def clusters_one(_key: str):
        sigs = spark.read.parquet(sig_path).drop("part_key")
        pairs = lsh_pairs_from_band_sigs(
            sigs, "doc_id", max_bucket_size=max_bucket_size
        )
        return dedup_clusters(docs.select("doc_id"), "doc_id", pairs)

    r_clu = run_partitioned(
        spark, store, f"{job_id}/clusters", ["all"], clusters_one,
        clu_path, "part_key", lineage, force=force,
    )

    # stage 2.5 (optional): contaminated doc ids per corpus bucket —
    # broadcast bench shingle set, embarrassingly parallel like stage 1
    r_con = None
    if bench is not None:
        def con_one(key: str):
            part = docs.filter(bucket_of == key)
            rep = decontaminate(
                part, "doc_id", "text", bench, "doc_id", "text",
                k=k, min_hits=decon_min_hits,
            )
            return rep.filter(F.col("contaminated")).select("doc_id", "n_hits")

        r_con = run_partitioned(
            spark, store, f"{job_id}/contamination", bucket_keys, con_one,
            con_path, "part_key", lineage, force=force,
        )

    # final stage: keeper filter (minus contaminated docs) per corpus
    # bucket (only stage touching text bytes besides 1 and 2.5)
    def out_one(key: str):
        clusters = spark.read.parquet(clu_path).drop("part_key")
        part = docs.filter(bucket_of == key)
        out = (
            part.join(clusters, "doc_id")
            .filter(F.col("is_keeper"))
            .drop("is_keeper")
        )
        if bench is not None:
            bad = spark.read.parquet(con_path).select("doc_id")
            out = out.join(bad, "doc_id", "left_anti")
        if scrub:
            # PII redaction rides the same pass that already touches text
            # bytes — a pure column expression, no extra stage or join
            out = out.withColumn("text", pii_clean_col(F.col("text")))
        return out

    r_out = run_partitioned(
        spark, store, f"{job_id}/output", bucket_keys, out_one,
        out_path, "part_key", lineage, force=force,
    )
    if r_con is not None:
        return r_sig, r_clu, r_con, r_out
    return r_sig, r_clu, r_out


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
    args = p.parse_args(argv)

    spark = get_spark("run_dedup")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.bench) if args.bench else None
    t0 = time.perf_counter()
    results = run_dedup_pipeline(
        spark, docs, args.output, args.checkpoint,
        buckets=args.buckets, k=args.shingle_k, n_hashes=args.n_hashes,
        bands=args.bands, max_bucket_size=args.max_bucket_size,
        job_id=args.job_id, force=args.force,
        bench=bench, decon_min_hits=args.decon_min_hits, scrub=args.scrub,
    )
    names = (
        ["signatures", "clusters", "contamination", "output"]
        if bench is not None
        else ["signatures", "clusters", "output"]
    )
    summary = {
        "job_id": args.job_id,
        "stages": {
            n: {
                "partitions": len(r),
                "skipped": sum(x.skipped for x in r),
                "rows": sum(x.rows for x in r),
            }
            for n, r in zip(names, results)
        },
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
