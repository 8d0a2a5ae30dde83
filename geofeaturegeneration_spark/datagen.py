"""Deterministic synthetic data generator for the engine's primary input.

Produces the F1 `sequences` table from FIXTURES.md — the exact shape of
BASELINE.json.input_hint:

    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Properties (all seeded, reproducible):
* zero-padded doc ids
* 2-3 **hot** doc_ids owning ~30 % of total tokens (skew, for salting tests —
  skew precedent in the reference: per-user point counts span 28k..418k,
  README.md:339-387)
* token values in [0, vocab); runs of repeated tokens so state-change
  sessionization produces non-trivial episodes (grid-run analog,
  Test/GeoFeatureGenerationClass.py:399-405)
* token 0 occurs rarely as a *real* token (tests the reserved-0 vocab rule,
  CommonCode.py:330-333)
* lengths 1..max_len
* `n_tok == len(tokens)` invariant

Generation is pure numpy on the driver then parallelized via
``spark.createDataFrame`` (Arrow) — fine at test scale. ``write_sequences``
writes partitioned Parquet (Iceberg layout-compatible: partitioned by
``source``) so benchmarks read from disk like a real table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

SOURCES = ["web", "book", "code"]


def generate_sequences_pdf(
    n_docs: int = 200,
    vocab: int = 10_007,
    max_len: int = 512,
    seed: int = 42,
    hot_docs: int = 3,
    hot_share: float = 0.30,
) -> pd.DataFrame:
    """Deterministic pandas frame of sequences (driver-side)."""
    rng = np.random.default_rng(seed)
    width = max(6, len(str(n_docs)))
    doc_ids = [str(i).zfill(width) for i in range(n_docs)]
    sources = [SOURCES[int(rng.integers(0, len(SOURCES)))] for _ in range(n_docs)]

    # base lengths, then inflate the first `hot_docs` to own ~hot_share of tokens
    lens = rng.integers(1, max_len + 1, size=n_docs).astype(np.int64)
    base_total = int(lens.sum())
    if hot_docs > 0:
        hot_total = int(base_total * hot_share / (1 - hot_share))
        per_hot = max(max_len, hot_total // hot_docs)
        lens[:hot_docs] = per_hot

    rows = []
    for i, d in enumerate(doc_ids):
        n = int(lens[i])
        # runs of repeated tokens: draw run lengths geometric-ish, value uniform.
        # token 0 appears with tiny probability as a real token.
        vals = []
        while len(vals) < n:
            run = int(rng.integers(1, 8))
            v = int(rng.integers(1, vocab))
            if rng.random() < 0.002:
                v = 0
            vals.extend([v] * run)
        toks = np.asarray(vals[:n], dtype=np.int32)
        rows.append((d, toks.tolist(), n, sources[i]))
    return pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])


def generate_sequences(
    spark: SparkSession,
    n_docs: int = 200,
    vocab: int = 10_007,
    max_len: int = 512,
    seed: int = 42,
    hot_docs: int = 3,
    hot_share: float = 0.30,
) -> DataFrame:
    pdf = generate_sequences_pdf(n_docs, vocab, max_len, seed, hot_docs, hot_share)
    return spark.createDataFrame(pdf, schema=SEQUENCES_SCHEMA)


def generate_sequences_distributed(
    spark: SparkSession,
    n_docs: int = 200,
    vocab: int = 10_007,
    max_len: int = 512,
    seed: int = 42,
    hot_docs: int = 3,
    hot_share: float = 0.30,
) -> DataFrame:
    """Distributed generator: same table shape/invariants as
    ``generate_sequences`` but produced by executors via mapInPandas —
    per-doc RNG seeded by (seed, doc_index) so the output is deterministic
    regardless of partitioning/cluster size. This is the generator to use
    beyond ~10^4 docs: the driver-side python loop IS the bottleneck the
    engine exists to avoid.

    Hot-doc sizing uses the expected base total (n_docs * E[len]) instead
    of the sampled total, so hot lengths are computable per-row without a
    global pass."""
    import pandas as pd  # local import: kept off the hot import path

    exp_total = n_docs * (1 + max_len) / 2
    per_hot = (
        max(max_len, int(exp_total * hot_share / (1 - hot_share)) // hot_docs)
        if hot_docs > 0
        else 0
    )
    width = max(6, len(str(n_docs)))
    n_sources = len(SOURCES)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                src = SOURCES[int(rng.integers(0, n_sources))]
                n = per_hot if i < hot_docs else int(rng.integers(1, max_len + 1))
                # vectorized run-length construction (no per-token python):
                # draw enough runs to cover n, repeat, trim.
                est_runs = n // 4 + 8
                vals = np.empty(0, dtype=np.int64)
                while vals.size < n:
                    runs = rng.integers(1, 8, size=est_runs)
                    v = rng.integers(1, vocab, size=est_runs)
                    v[rng.random(est_runs) < 0.002] = 0
                    vals = np.concatenate([vals, np.repeat(v, runs)])
                    est_runs *= 2
                toks = vals[:n].astype(np.int32)
                rows.append((str(i).zfill(width), toks.tolist(), n, src))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source"]
            )

    parallelism = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, numPartitions=min(n_docs, parallelism * 2))
    return base.mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def write_sequences(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partition by source — the engine's entity key is (doc_id, source), and
    source-partitioned layout gives partition pruning on per-source jobs."""
    df.write.mode(mode).partitionBy("source").parquet(path)


def read_sequences(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SEQUENCES_SCHEMA).parquet(path)
