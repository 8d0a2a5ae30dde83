"""Two-parallelism scaling bench for the FLAGSHIP dedup composition
(north-rule evidence on the workload the 100 TB story is about).

`tools/scaling_bench.py` evidences the token feature pipeline; this tool
runs the composed corpus-dedup job — minhash band signatures -> LSH bucket
self-join -> connected components -> keeper filter, the same operator
chain as jobs/run_dedup.py without the checkpoint I/O — at two parallelism
levels on the same input and reports docs/sec at both plus the scaling
efficiency:

    python tools/dedup_scaling.py [--n-copies 20] [--levels 2,8] [--runs 3]
    python tools/dedup_scaling.py --job full   # the WHOLE curation story

``--job full`` runs the complete composition the checkpointed
jobs/run_dedup.py ships — quality filter -> signatures -> LSH pairs ->
components -> keeper filter -> decontamination -> mixing recipe -> PII
scrub -> exact-substring span dedup -> reassembly — as one in-memory DAG
(no checkpoint I/O), so the two-level comparison measures the full
pipeline's parallel shape end to end.

    scaling efficiency = (thr_high / thr_low) / (cpus_high / cpus_low)

Input: the sf0.1 documents corpus (5,000 docs, ~300 chars) replicated
--n-copies times with deterministic md5-driven perturbation — copy 0 is
the original; of each later copy ~1/3 stays byte-exact (exact dups),
~1/3 appends one distinct token (near dups the 3-shingle MinHash should
catch), ~1/3 prepends its copy number (distinct docs). The corpus is
written once to /tmp and reused, so both levels read identical bytes.

--text-repeat lengthens every document T-fold (text repeated T times)
WITHOUT changing the dup structure: exact copies stay byte-exact and the
near-dup tail still perturbs only the final shingles. This is the knob
for growing the CPU-dominant signature stage independently of the pair
count — raising --n-copies instead grows exact-dup cluster sizes, and the
per-bucket self-join is quadratic in cluster size (100 copies ~ 25x the
pairs of 20 copies), which measures the intentionally-capped candidate
join rather than the pipeline.

The stage mix is the scale-relevant one: signatures are embarrassingly
parallel CPU (md5 per shingle — the stage that dominates at 10^12 docs),
the bucket self-join is one shuffle over tiny signature rows, and the
connected-components rounds are O(diameter) small joins. A low efficiency
here would mean the composition serializes somewhere the unit benches
don't see.

Interpreting the number on THIS host: the string/hash-heavy NARROW stage
itself (scan -> shingle explode -> md5, no shuffle at all) tops out at
~2.5x from local[2] -> local[8], while a 64-byte md5 loop in plain
processes scales 3.97x on the same cores at the same moment. Direct
probes exonerated every engine-side suspect — identical result with 64
scan tasks (maxPartitionBytes=512k), with AQE partition coalescing
disabled, and with GC/JIT threads pinned to the core count — so the
ceiling is cache/allocation bandwidth shared across cores for
large-working-set string churn, a single-box microarchitecture limit the
token-pipeline bench (windows/aggs over longs, ~0.9 efficiency on the
same host) does not hit. On a real cluster each executor brings its own
LLC and memory channels; the per-stage decomposition (BASELINE.md) shows
no serial stage and no shuffle hotspot, which is what the two-level run
is here to prove.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DOCS = "/root/testdata/sf0.1/documents.parquet"


def ensure_corpus(n_copies: int, text_repeat: int) -> str:
    path = f"/tmp/gfg_dedup_scale_{n_copies}x_t{text_repeat}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from pyspark.sql import functions as F

    from geofeaturegeneration_spark.functions.text import md5_long
    from geofeaturegeneration_spark.session import get_spark

    spark = get_spark("dedup_scale_gen")
    base = spark.read.parquet(SF_DOCS).select(
        "doc_id",
        F.array_join(
            F.array_repeat(F.col("text"), text_repeat), " "
        ).alias("text"),
    )
    copies = base.crossJoin(
        spark.range(n_copies).withColumnRenamed("id", "copy")
    )
    # deterministic 3-way split per (doc, copy): exact dup / near dup /
    # distinct — derived from the repo's single canonical hash primitive
    kind = md5_long(F.concat_ws(":", "doc_id", "copy")) % 3
    out = copies.select(
        (F.col("doc_id") + F.col("copy") * F.lit(1_000_000)).alias("doc_id"),
        F.when(F.col("copy") == 0, F.col("text"))
        .when(kind == 0, F.col("text"))
        .when(kind == 1, F.concat_ws(" ", "text", F.concat(F.lit("tail"), "copy")))
        .otherwise(F.concat_ws(" ", F.concat(F.lit("head"), "copy"), "text"))
        .alias("text"),
    )
    out.repartition(32).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


_RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from geofeaturegeneration_spark.operators import (
    dedup_clusters, lsh_pairs_from_band_sigs, minhash_band_signatures,
)
from geofeaturegeneration_spark.session import get_spark

spark = get_spark("dedup_scale", master="local[{cpus}]")
docs = spark.read.parquet({path!r})
n_docs = docs.count()  # warm footer cache; not timed
t0 = time.perf_counter()
sigs = minhash_band_signatures(docs, "doc_id", "text")
pairs = lsh_pairs_from_band_sigs(sigs, "doc_id", max_bucket_size=2000)
clusters = dedup_clusters(docs, "doc_id", pairs)
kept = clusters.filter(F.col("is_keeper")).count()
wall = time.perf_counter() - t0
print("RESULT " + repr({{"cpus": {cpus}, "n_docs": n_docs, "kept": kept,
                         "wall": round(wall, 3)}}))
"""



_RUNNER_FULL = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from geofeaturegeneration_spark.operators import (
    decontaminate, dedup_clusters, lsh_pairs_from_band_sigs,
    minhash_band_signatures, quality_filter, source_sample,
    span_dup_intervals, span_reassemble,
)
from geofeaturegeneration_spark.operators.curation import pii_clean_col
from geofeaturegeneration_spark.session import get_spark

spark = get_spark("curation_scale", master="local[{cpus}]")
docs = spark.read.parquet({path!r}).withColumn(
    "source", F.concat(F.lit("src"), (F.col("doc_id") % 5).cast("string"))
)
bench = docs.filter(F.col("doc_id") % 97 == 0).select(
    F.col("doc_id").alias("bid"), F.col("text").alias("btext"))
n_docs = docs.count()  # warm footer cache; not timed
t0 = time.perf_counter()
kept = docs.join(
    quality_filter(docs, "doc_id", "text").filter("keep").select("doc_id"),
    "doc_id", "left_semi")
sigs = minhash_band_signatures(kept, "doc_id", "text")
pairs = lsh_pairs_from_band_sigs(sigs, "doc_id", max_bucket_size=2000)
clusters = dedup_clusters(kept.select("doc_id"), "doc_id", pairs)
keepers = kept.join(
    clusters.filter("is_keeper").select("doc_id"), "doc_id", "left_semi")
bad = decontaminate(kept, "doc_id", "text", bench, "bid", "btext",
                    k=3, min_hits=50).filter("contaminated").select("doc_id")
final = keepers.join(bad, "doc_id", "left_anti")
mixed = source_sample(final, "doc_id",
                      {{"src0": 900000, "src1": 900000, "src2": 900000,
                        "src3": 900000, "src4": 900000}})
scrubbed = mixed.select("doc_id", pii_clean_col(F.col("text")).alias("text"))
ivals = span_dup_intervals(scrubbed, "doc_id", "text", k=8)
out = span_reassemble(scrubbed, ivals, "doc_id", "text")
agg = out.agg(F.count(F.lit(1)).alias("n"),
              F.sum("n_dup_tokens").alias("cut")).collect()[0]
wall = time.perf_counter() - t0
cut = int(agg["cut"] or 0)  # SUM over zero rows is NULL, not 0
print("RESULT " + repr({{"cpus": {cpus}, "n_docs": n_docs,
                         "kept": int(agg["n"]) * 1000000 + cut,
                         "rows": int(agg["n"]), "cut_tokens": cut,
                         "wall": round(wall, 3)}}))
"""


def run_level(cpus: int, path: str, runs: int, runner=None) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runner = runner or _RUNNER
    best = None
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", runner.format(repo=repo, cpus=cpus, path=path)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        r = eval(line[len("RESULT "):])  # trusted: our own subprocess
        if best is None or r["wall"] < best["wall"]:
            best = r
    best["docs_per_sec"] = round(best["n_docs"] / best["wall"], 1)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-copies", type=int, default=20)
    ap.add_argument("--text-repeat", type=int, default=1)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--runs", type=int, default=int(os.environ.get("SCALE_RUNS", "3")))
    ap.add_argument("--job", default="dedup", choices=["dedup", "full"])
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    path = ensure_corpus(args.n_copies, args.text_repeat)
    runner = _RUNNER_FULL if args.job == "full" else _RUNNER
    r_lo = run_level(lo, path, args.runs, runner)
    r_hi = run_level(hi, path, args.runs, runner)
    if r_lo["kept"] != r_hi["kept"]:
        raise SystemExit(
            f"keeper count differs across levels: {r_lo['kept']} vs {r_hi['kept']}"
        )
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    job_name = (
        "full curation (quality -> dedup -> decontaminate -> mix -> scrub -> span)"
        if args.job == "full"
        else "composed dedup (signatures -> lsh pairs -> components -> keeper)"
    )
    print(json.dumps({
        "job": job_name,
        "input": path, "n_docs": r_lo["n_docs"], "kept": r_lo["kept"],
        "levels": {f"local[{lo}]": r_lo, f"local[{hi}]": r_hi},
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
