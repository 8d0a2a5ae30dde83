"""Recall-vs-cost curve for multi-table sign-LSH ANN (ann_lsh_multi_topk).

Evidence for the contract defaults (n_tables=3, n_bits=8): sweeps
T x bits over the sf embeddings table, scoring each cell against the
exact ``cosine_topk`` ground truth.

    python tools/ann_recall_curve.py [--sf-dir /root/testdata/sf0.1] \
        [--k 3] [--md-out BASELINE.md]

Per cell it reports:
  recall@k      |approx top-k  n  exact top-k| / |exact top-k|
  pairs scored  sum over (table, bucket) of c*(c-1) — the rows entering
                the exact-rescore join, i.e. the actual compute cost
                (the full corpus would be n*(n-1) = the brute-force join)
  wall s        end-to-end operator wall time (noop-count action)

Theory check: one table's collision prob for angle theta is
p = (1 - theta/pi)^bits; OR-ing T tables gives 1-(1-p)^T — recall should
rise with T and fall with bits, while pairs scored does the opposite.
"""

from __future__ import annotations

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--tables", default="1,2,3,4")
    p.add_argument("--bits", default="8,12,16")
    p.add_argument("--md-out", default=None)
    p.add_argument(
        "--clustered", type=int, default=0, metavar="N_CENTERS",
        help="instead of the sf table, synthesize n rows in N_CENTERS "
        "clusters (unit centers + gaussian noise, fixed seed). The sf "
        "embeddings are near-uniform on the sphere — the adversarial "
        "case where NO sublinear ANN can win (top-k neighbors sit at "
        "~60 degrees); clustered data is what LSH is built for.",
    )
    p.add_argument("--n-rows", type=int, default=2000)
    p.add_argument("--sigma", type=float, default=0.25)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from geofeaturegeneration_spark.operators.similarity import (
        _hp_exploded,
        ann_lsh_multi_topk,
        cosine_topk,
        hyperplane_tables,
    )
    from geofeaturegeneration_spark.session import get_spark

    spark = get_spark("ann_recall_curve")
    if args.clustered:
        import numpy as np

        rng = np.random.default_rng(42)
        dim0 = 64
        centers = rng.standard_normal((args.clustered, dim0))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        pts = (
            centers[np.arange(args.n_rows) % args.clustered]
            + args.sigma * rng.standard_normal((args.n_rows, dim0))
        ).astype("float32")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(args.n_rows)],
            "vec_id long, embedding array<float>",
        )
        src = f"clustered c={args.clustered} sigma={args.sigma}"
    else:
        emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        src = args.sf_dir.rstrip("/").rsplit("/", 1)[-1] + " (near-uniform)"
    emb = emb.filter(F.col("embedding").isNotNull()).cache()
    n = emb.count()
    dim = emb.select(F.size("embedding").alias("d")).agg(F.max("d")).first()[0]

    exact = {
        (r["vec_id"], r["nn_id"])
        for r in cosine_topk(emb, "vec_id", "embedding", k=args.k).collect()
    }

    rows = []
    for t in [int(x) for x in args.tables.split(",")]:
        for b in [int(x) for x in args.bits.split(",")]:
            planes = hyperplane_tables(dim, t, b)
            pairs_scored = (
                _hp_exploded(emb, "vec_id", "embedding", planes)
                .groupBy("_t", "_bucket")
                .count()
                .agg(F.sum(F.col("count") * (F.col("count") - 1)))
                .first()[0]
            )
            t0 = time.monotonic()
            approx = {
                (r["vec_id"], r["nn_id"])
                for r in ann_lsh_multi_topk(
                    emb, "vec_id", "embedding", dim=dim, k=args.k,
                    n_tables=t, n_bits=b,
                ).collect()
            }
            wall = time.monotonic() - t0
            recall = len(approx & exact) / len(exact)
            rows.append((t, b, recall, pairs_scored, wall))
            print(
                f"T={t} bits={b:2d}  recall@{args.k}={recall:.3f}  "
                f"pairs={pairs_scored:>9,}  wall={wall:.2f}s",
                flush=True,
            )

    brute = n * (n - 1)
    md = [
        "",
        f"### ann_lsh_multi recall-vs-cost ({src}, "
        f"n={n:,}, dim={dim}, k={args.k}; brute-force = {brute:,} pairs)",
        "",
        "| T | bits | recall@k | pairs scored | % of brute | wall s |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for t, b, recall, pairs, wall in rows:
        md.append(
            f"| {t} | {b} | {recall:.3f} | {pairs:,} "
            f"| {100 * pairs / brute:.1f}% | {wall:.2f} |"
        )
    text = "\n".join(md) + "\n"
    print(text)
    if args.md_out:
        with open(args.md_out, "a") as f:
            f.write(text)
    spark.stop()


if __name__ == "__main__":
    main()
