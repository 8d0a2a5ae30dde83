"""Checkpoint store + resumable partitioned run (SURVEY.md §5 item 4:
kill-and-rerun must be idempotent; replaces the reference's file-existence
resume, DP_GenerateTrajectory.py:50-52)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.checkpoint import CheckpointStore, run_partitioned
from geofeaturegeneration_spark.datagen import generate_sequences
from jobs.run_pipeline import build_features


@pytest.fixture(scope="module")
def seq(spark):
    return generate_sequences(spark, n_docs=30, seed=7).persist()


def _collect_features(spark, out_path):
    df = spark.read.parquet(out_path)
    return sorted(
        (r["doc_id"], r["source"], str(r["stime"]), r["duration_s"])
        for r in df.select("doc_id", "source", "stime", "duration_s").collect()
    )


def test_mark_and_completed(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    assert store.completed("job") == set()
    store.mark("job", "a", "done", rows=10, wall_ms=5, lineage="v1")
    store.mark("job", "b", "failed", lineage="v1")
    assert store.completed("job", "v1") == {"a"}
    # lineage mismatch invalidates
    assert store.completed("job", "v2") == set()
    # last writer wins: re-mark a as failed
    store.mark("job", "a", "failed", lineage="v1")
    assert store.completed("job", "v1") == set()


def test_resume_skips_done_and_output_identical(spark, seq, tmp_path):
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    ck1 = str(tmp_path / "ck1")
    ck2 = str(tmp_path / "ck2")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())

    def run_one(key):
        return build_features(seq.filter(F.col("source") == key))

    # full run in one go
    store1 = CheckpointStore(spark, ck1)
    r1 = run_partitioned(
        spark, store1, "j", sources, run_one, out1, "part_key", "v1"
    )
    assert all(not r.skipped for r in r1)

    # interrupted run: first partition only, then "crash", then resume
    store2 = CheckpointStore(spark, ck2)
    run_partitioned(
        spark, store2, "j", sources[:1], run_one, out2, "part_key", "v1"
    )
    r2 = run_partitioned(
        spark, store2, "j", sources, run_one, out2, "part_key", "v1"
    )
    assert [r.skipped for r in r2] == [True] + [False] * (len(sources) - 1)

    assert _collect_features(spark, out1) == _collect_features(spark, out2)

    # metrics recorded for every partition
    m = store2.metrics("j")
    rows = {r["partition_key"]: r for r in m.collect()}
    assert set(rows) == set(sources)
    assert all(rows[s]["status"] == "done" and rows[s]["rows"] > 0 for s in sources)


def test_rerun_partition_is_idempotent(spark, seq, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    sources = sorted(r["source"] for r in seq.select("source").distinct().collect())

    def run_one(key):
        return build_features(seq.filter(F.col("source") == key))

    store = CheckpointStore(spark, ck)
    run_partitioned(spark, store, "j", sources, run_one, out, "part_key", "v1")
    before = _collect_features(spark, out)
    # force re-run everything (dynamic overwrite replaces same partitions)
    run_partitioned(
        spark, store, "j", sources, run_one, out, "part_key", "v1", force=True
    )
    assert _collect_features(spark, out) == before
