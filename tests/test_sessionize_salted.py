"""Salted sessionization must equal the unsalted op exactly — including
runs that cross salt seams and salts wholly contained in one run
(SURVEY.md §7.4, the seam-stitching correctness point)."""

import os
import sys
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.datagen import generate_sequences
from geofeaturegeneration_spark.operators import (
    sessionize_state_change,
    sessionize_state_change_salted,
)

COLS = ["stime", "etime", "duration_s", "n_rows", "stay_seq"]


def _canon(df, entity_cols, state_col, keep_cols=()):
    cols = entity_cols + [state_col] + COLS + list(keep_cols)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


def test_salted_equals_unsalted_on_crafted_seams(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    # entity "hot": 200 rows, runs of varying length, including a run of 60
    # that will span multiple time-range salts at n_salts=8
    state_seq = (
        ["a"] * 10 + ["b"] * 3 + ["c"] * 60 + ["a"] * 1 + ["b"] * 40
        + ["c"] * 2 + ["a"] * 80 + ["d"] * 4
    )
    for i, s in enumerate(state_seq):
        rows.append(("hot", t0 + timedelta(minutes=i), s, float(i)))
    # entity "cold": under threshold -> salt 0 path
    for i, s in enumerate(["x", "x", "y", "y", "y", "x"]):
        rows.append(("cold", t0 + timedelta(minutes=i), s, float(100 + i)))
    df = spark.createDataFrame(rows, "uid STRING, ts TIMESTAMP, st STRING, v DOUBLE")

    plain = sessionize_state_change(df, ["uid"], "ts", "st", None, ["v"])
    for n_salts in (2, 3, 8):
        salted = sessionize_state_change_salted(
            df, ["uid"], "ts", "st", None, ["v"],
            n_salts=n_salts, hot_threshold=50,
        )
        assert _canon(salted, ["uid"], "st", ["v"]) == _canon(
            plain, ["uid"], "st", ["v"]
        ), f"n_salts={n_salts}"


def test_salted_equals_unsalted_with_duration_filter(spark):
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(120):
        # random-ish but deterministic states with varied gaps
        s = "abc"[(i * 7 + i // 11) % 3]
        rows.append(("u", t0 + timedelta(seconds=30 * i + (i % 5)), s))
    df = spark.createDataFrame(rows, "uid STRING, ts TIMESTAMP, st STRING")
    plain = sessionize_state_change(df, ["uid"], "ts", "st", 60.0)
    salted = sessionize_state_change_salted(
        df, ["uid"], "ts", "st", 60.0, n_salts=4, hot_threshold=10
    )
    assert _canon(salted, ["uid"], "st") == _canon(plain, ["uid"], "st")


def test_salted_on_generated_sequences(spark):
    seq = generate_sequences(spark, n_docs=20, seed=3)
    ev = seq.select(
        "doc_id", "source", F.posexplode("tokens").alias("pos", "token")
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("pos") * 60))
    plain = sessionize_state_change(ev, ["doc_id", "source"], "ts", "token")
    salted = sessionize_state_change_salted(
        ev, ["doc_id", "source"], "ts", "token", n_salts=8, hot_threshold=100
    )
    assert _canon(salted, ["doc_id", "source"], "token") == _canon(
        plain, ["doc_id", "source"], "token"
    )
