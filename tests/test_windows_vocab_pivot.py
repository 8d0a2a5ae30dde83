"""Lag/lead/rolling features, vocabulary encoding, pivot aggregates."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geofeaturegeneration_spark.operators.pivot import (
    interaction_matrix,
    interaction_matrix_wide,
    pivot_counts,
)
from geofeaturegeneration_spark.operators.vocab import build_vocab, encode_with_vocab
from geofeaturegeneration_spark.operators.windows import (
    lag_lead_features,
    rolling_features,
    sliding_subsequences,
)


@pytest.fixture(scope="module")
def ev(spark):
    pdf = pd.DataFrame(
        {
            "uid": ["a"] * 6 + ["b"] * 3,
            "ts": pd.to_datetime(
                [f"2024-01-01 00:0{i}:00" for i in range(6)]
                + [f"2024-01-01 01:0{i}:00" for i in range(3)]
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 10.0, 20.0, 30.0],
        }
    )
    return spark.createDataFrame(pdf).repartition(3), pdf


def test_lag_lead(ev):
    df, pdf = ev
    got = (
        lag_lead_features(df, ["uid"], "ts", ["v"])
        .toPandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    exp = pdf.sort_values(["uid", "ts"]).reset_index(drop=True)
    assert got.loc[1, "v_lag1"] == 1.0
    assert got.loc[0, "v_lead1"] == 2.0
    assert pd.isna(got.loc[0, "v_lag1"])
    assert got.loc[2, "v_delta1"] == 1.0
    assert got.loc[1, "gap_s_lag1"] == 60.0
    # group boundary respected
    b0 = got[got["uid"] == "b"].iloc[0]
    assert pd.isna(b0["v_lag1"])
    assert len(got) == len(exp)


def test_rolling_row_frame(ev):
    df, _ = ev
    got = (
        rolling_features(df, ["uid"], "ts", "v", n_preceding=2)
        .toPandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    # row 3 of uid=a: avg(2,3,4)=3
    assert got.loc[3, "v_roll_avg"] == 3.0
    assert got.loc[5, "v_cum_sum"] == 21.0
    assert got.loc[0, "v_roll_avg"] == 1.0
    assert list(got["row_idx"][:6]) == [1, 2, 3, 4, 5, 6]


def test_rolling_range_frame(ev):
    df, _ = ev
    got = (
        rolling_features(df, ["uid"], "ts", "v", range_seconds=120)
        .toPandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    # trailing 120s inclusive: at row 3 (min 3), rows at min 1,2,3 → 2+3+4
    assert got.loc[3, "v_roll_sum"] == 9.0


def test_sliding_subsequences(ev):
    df, _ = ev
    got = (
        sliding_subsequences(df, ["uid"], "ts", "v", seq_len=3)
        .toPandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    a = got[got["uid"] == "a"]
    assert len(a) == 3  # rows with 2 predecessors and a successor: idx 2,3,4
    assert list(a.iloc[0]["query"]) == [1.0, 2.0, 3.0]
    assert a.iloc[0]["pos"] == 4.0
    b = got[got["uid"] == "b"]
    assert len(b) == 0  # only 3 rows: window full at row 2 but no lookahead


def test_vocab_reserved_zero(spark):
    pdf = pd.DataFrame({"g": [30, 10, 20, 10, 30, 30]})
    df = spark.createDataFrame(pdf)
    vocab = build_vocab(df, "g", id_col="gid").toPandas().sort_values("g")
    assert list(vocab["gid"]) == [1, 2, 3]  # sorted asc, 1-based
    enc = encode_with_vocab(
        spark.createDataFrame(pd.DataFrame({"g": [10, 20, 30, 999]})),
        build_vocab(df, "g", id_col="gid"),
        "g",
        id_col="gid",
    ).toPandas().sort_values("g")
    assert list(enc["gid"]) == [1, 2, 3, 0]  # unseen → 0


def test_vocab_no_reserve(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": [5, 3]}))
    vocab = build_vocab(df, "g", reserve_zero=False).toPandas().sort_values("g")
    assert list(vocab["vocab_id"]) == [0, 1]


def test_pivot_counts(spark):
    pdf = pd.DataFrame(
        {"grid": [1, 1, 1, 2, 2], "cat": ["a", "a", "b", "b", "c"]}
    )
    got = (
        pivot_counts(spark.createDataFrame(pdf), "grid", "cat", values=["a", "b", "c"])
        .toPandas()
        .sort_values("grid")
        .reset_index(drop=True)
    )
    assert list(got.loc[0, ["a", "b", "c"]]) == [2, 1, 0]
    assert list(got.loc[1, ["a", "b", "c"]]) == [0, 1, 1]


def test_interaction_matrix(spark):
    pdf = pd.DataFrame({"u": ["x", "x", "y"], "g": [1, 1, 2]})
    df = spark.createDataFrame(pdf)
    long = interaction_matrix(df, "u", "g").toPandas()
    assert set(map(tuple, long.values)) == {("x", 1, 2), ("y", 2, 1)}
    wide = interaction_matrix_wide(df, "u", "g", items=[1, 2]).toPandas().sort_values("u")
    assert list(wide.columns) == ["u", "1", "2"]
    assert list(wide.iloc[0][["1", "2"]]) == [2, 0]
