"""Data generator invariants: n_tok == len(tokens), determinism of the
distributed generator under different partition counts, skew knobs."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.datagen import (
    generate_sequences,
    generate_sequences_distributed,
)


def _as_rows(df):
    return sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    )


def test_driver_generator_invariants(spark):
    df = generate_sequences(spark, n_docs=40)
    rows = df.withColumn("ok", F.size("tokens") == F.col("n_tok")).collect()
    assert all(r["ok"] for r in rows)
    assert len(rows) == 40


def test_distributed_generator_deterministic_across_partitioning(spark):
    a = generate_sequences_distributed(spark, n_docs=60, seed=9)
    b = generate_sequences_distributed(spark, n_docs=60, seed=9).repartition(13)
    ra, rb = _as_rows(a), _as_rows(b)
    assert ra == rb
    assert all(len(t[1]) == t[2] for t in ra)
    # different seed -> different corpus
    rc = _as_rows(generate_sequences_distributed(spark, n_docs=60, seed=10))
    assert ra != rc


def test_distributed_generator_skew_knob(spark):
    df = generate_sequences_distributed(
        spark, n_docs=100, hot_docs=2, hot_share=0.3
    )
    sizes = {r["doc_id"]: r["n_tok"] for r in df.select("doc_id", "n_tok").collect()}
    hot = sorted(sizes.values(), reverse=True)[:2]
    rest = sum(sizes.values()) - sum(hot)
    # 2 docs hold ~30% of tokens -> hot/rest ~ 3/7; each hot doc is ~10x the
    # mean doc. Assert material skew, not the exact ratio (expected-value
    # sizing makes the realized share approximate).
    assert sum(hot) > 0.3 * rest
    assert min(hot) > 5 * (rest / 98)
