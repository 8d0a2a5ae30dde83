"""Measured Bloom false-positive rate vs filter size (evidence for the
bloom_build defaults, BASELINE.md "Bloom screen sizing").

Builds the filter over n synthetic corpus keys, screens n DISJOINT novel
keys, and reports the measured spurious-flag rate next to the
(1 - e^(-k*n/m))^k theory at each m. The no-false-negative side is
asserted, not sampled: every corpus key must flag.

    python tools/bloom_fp_curve.py [--n 100000] [--k 4]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geofeaturegeneration_spark.operators import bloom_build, bloom_screen
from geofeaturegeneration_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--k", type=int, default=4)
    args = p.parse_args()

    spark = get_spark("bloom_fp", master="local[8]")
    corpus = spark.range(args.n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("key")
    )
    novel = spark.range(args.n).select(
        F.concat(F.lit("new-"), F.col("id")).alias("key")
    )
    print(f"n={args.n} corpus keys, {args.n} disjoint novel probes, k={args.k}")
    print(f"{'m_bits':>10} {'theory':>10} {'measured':>10} {'kept novel':>11}")
    for log_m in (17, 18, 19, 20, 21):
        m = 1 << log_m
        bloom = bloom_build(corpus, "key", m_bits=m, k=args.k)
        # no-false-negative side: every corpus key must flag
        self_hits = (
            bloom_screen(corpus, "key", bloom, m_bits=m, k=args.k)
            .filter(F.col("might_contain"))
            .count()
        )
        assert self_hits == args.n, (self_hits, args.n)
        fp = (
            bloom_screen(novel, "key", bloom, m_bits=m, k=args.k)
            .filter(F.col("might_contain"))
            .count()
        )
        theory = (1.0 - math.exp(-args.k * args.n / m)) ** args.k
        print(
            f"2^{log_m:<7} {theory:>10.2e} {fp / args.n:>10.2e} "
            f"{args.n - fp:>11,}"
        )


if __name__ == "__main__":
    main()
