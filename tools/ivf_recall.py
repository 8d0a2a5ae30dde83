"""Recall evidence for the IVF quantizer trainers: first-N seeds vs
farthest-point (FPS) vs FPS + lloyd_refine vs sampled driver k-means.

The unit tests pin that training HELPS on clustered data; this tool
MEASURES it — recall@k of ``ann_ivf_topk_blocked`` (nprobe=1) against the
exact ``cosine_topk`` ground truth, plus the inverted-list balance
(max/mean list size — balance is what keeps per-list GEMM tiles even).

    python tools/ivf_recall.py [--n 5000] [--dim 64] [--clusters 10] \
        [--k-centroids 8] [--k 3] [--iters 2] [--md-out BASELINE.md]

Synthetic clustered corpus (unit-ish directions + noise), deterministic
seed — the regime IVF exists for; on direction-less uniform data every
quantizer degrades the same way and the comparison says nothing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--clusters", type=int, default=10)
    p.add_argument("--k-centroids", type=int, default=8)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--noise", type=float, default=0.25)
    p.add_argument("--md-out", default=None)
    args = p.parse_args()

    import numpy as np

    from geofeaturegeneration_spark.operators import (
        ann_ivf_topk_blocked,
        cosine_topk_blocked,
        farthest_point_centroids,
        lloyd_refine,
        train_ivf_centroids,
    )
    from geofeaturegeneration_spark.session import get_spark

    spark = get_spark("ivf_recall")
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(args.clusters, args.dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # skewed cluster sizes AND id order correlated with cluster (the
    # regime that makes first-N seeds degenerate)
    sizes = np.maximum(
        (rng.dirichlet(np.ones(args.clusters) * 0.6) * args.n).astype(int), 5
    )
    rows = []
    for cl in range(args.clusters):
        for _ in range(int(sizes[cl])):
            v = centers[cl] + args.noise * rng.normal(size=args.dim)
            rows.append((len(rows), [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id INT, embedding ARRAY<FLOAT>"
    ).repartition(8).cache()
    n = df.count()

    gt = {
        (r["vec_id"], r["nn_id"])
        for r in cosine_topk_blocked(
            df, "vec_id", "embedding", k=args.k
        ).collect()
    }

    def stats(cents, label):
        t0 = time.perf_counter()
        got = ann_ivf_topk_blocked(
            df, "vec_id", "embedding", k=args.k,
            n_centroids=args.k_centroids, nprobe=1, centroids=cents,
        ).collect()
        wall = time.perf_counter() - t0
        rec = len({(r["vec_id"], r["nn_id"]) for r in got} & gt) / len(gt)
        # inverted-list balance from the home assignment implied by top-1
        from collections import Counter

        lists = Counter(r["list_id"] for r in got)
        bal = (max(lists.values()) / (sum(lists.values()) / len(lists))
               if lists else float("nan"))
        return {"label": label, "recall": rec, "balance": bal, "wall": wall}

    results = []
    results.append(stats(None, "first-N seeds"))
    fps = farthest_point_centroids(
        df, "vec_id", "embedding", k=args.k_centroids
    )
    fps_rows = fps.collect()
    fps_df = spark.createDataFrame(fps_rows, fps.schema)
    results.append(stats(fps_df, "farthest-point"))
    t0 = time.perf_counter()
    ll = lloyd_refine(
        df, "vec_id", "embedding", fps_df, iters=args.iters
    )
    train_wall = time.perf_counter() - t0
    results.append(stats(ll, f"FPS + lloyd_refine({args.iters})"))
    km = train_ivf_centroids(
        df, "vec_id", "embedding", k=args.k_centroids, sample_n=2000
    )
    results.append(stats(km, "sampled driver k-means"))

    hdr = (f"IVF recall@{args.k} (nprobe=1), n={n}, dim={args.dim}, "
           f"{args.clusters} skewed clusters, {args.k_centroids} centroids; "
           f"lloyd_refine train wall {train_wall:.2f} s")
    print(hdr)
    lines = ["| quantizer | recall@%d | list max/mean | search wall s |"
             % args.k,
             "| --- | --- | --- | --- |"]
    for r in results:
        line = (f"| {r['label']} | {r['recall']:.3f} | {r['balance']:.2f} "
                f"| {r['wall']:.2f} |")
        print(line)
        lines.append(line)
    if args.md_out:
        with open(args.md_out, "a") as f:
            f.write(f"\n## {hdr}\n\n" + "\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
