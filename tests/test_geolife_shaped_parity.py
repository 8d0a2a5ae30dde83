"""FIXTURES.md F2/F3 golden parity: a Geolife-shaped trajectory table runs
the reference's full per-user transform — strict bounds filter, affine grid
assign + Cantor, stay sessionization (state-change over grid), left join of
grid bucket-features with fill-0, time features — and must match the pandas
oracle composition exactly (SURVEY.md §5 plan item 1).

Fixture deliberately includes the reference's edge cases: a user entirely
out of bounds (Record.md:6-10 class), a user with no stay >= threshold,
points exactly ON the strict bounds, and a gap of exactly 1800 s (kept,
rule is >=)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geofeaturegeneration_spark.config import GridConfig
from geofeaturegeneration_spark.functions import grid as G
from geofeaturegeneration_spark.functions.timefeat import with_time_features
from geofeaturegeneration_spark.operators import sessionize_state_change
from tests import oracle as O

BOUNDS = [115.4, 39.4, 117.55, 41.1]


def _traj() -> pd.DataFrame:
    rng = np.random.RandomState(42)
    rows = []
    base = pd.Timestamp("2009-03-01 08:00:00")
    # user 000: normal movement across a few cells with dwell runs
    t = base
    cells = [(116.30, 39.90), (116.30, 39.90), (116.31, 39.90),
             (116.31, 39.90), (116.31, 39.90), (116.35, 39.95), (116.35, 39.95)]
    dwell = [600, 1800, 900, 1800, 1200, 2400, 600]
    for (lon, lat), d in zip(cells, dwell):
        rows.append(("000", t, lat, lon))
        t += pd.Timedelta(seconds=d)
    # user 001: gap exactly 1800 s between grid changes (>= keeps it)
    t = base
    for i, (lon, lat) in enumerate([(116.5, 40.0), (116.6, 40.1), (116.7, 40.2)]):
        rows.append(("001", t, lat, lon))
        t += pd.Timedelta(seconds=1800)
    # user 118-analog: entirely OUT of bounds (dropped by the filter)
    t = base
    for i in range(4):
        rows.append(("118", t, 39.0, 114.0))
        t += pd.Timedelta(seconds=1200)
    # user 049-analog: in bounds but every stay < threshold
    t = base
    for i, (lon, lat) in enumerate([(116.0 + i * 0.02, 39.8) for i in range(5)]):
        rows.append(("049", t, lat, lon))
        t += pd.Timedelta(seconds=300)
    # boundary points: exactly ON the strict bounds -> excluded
    rows.append(("002", base, BOUNDS[1], BOUNDS[0]))
    rows.append(("002", base + pd.Timedelta(seconds=100), 40.0, 116.0))
    rows.append(("002", base + pd.Timedelta(seconds=4000), 40.0, 116.1))
    rows.append(("002", base + pd.Timedelta(seconds=8000), 40.1, 116.2))
    # noise users
    for u in ("003", "004"):
        t = base
        for i in range(12):
            lon = float(115.5 + rng.rand() * 2.0)
            lat = float(39.5 + rng.rand() * 1.5)
            rows.append((u, t, lat, lon))
            t += pd.Timedelta(seconds=int(rng.randint(200, 4000)))
    return pd.DataFrame(rows, columns=["userID", "entireTime", "latitude", "longitude"])


@pytest.fixture(scope="module")
def parity(spark):
    cfg = GridConfig(bounds=BOUNDS)
    params = cfg.params
    pdf = _traj()
    df = spark.createDataFrame(pdf)

    # engine side
    filtered = df.filter(
        G.in_bounds(F.col("longitude"), F.col("latitude"), BOUNDS)
    )
    gridded = (
        filtered.withColumn("loncol", G.gps_to_loncol(F.col("longitude"), params))
        .withColumn("latcol", G.gps_to_latcol(F.col("latitude"), params))
        .withColumn("grid", G.cantor_pair(F.col("loncol"), F.col("latcol")))
    )
    stays = sessionize_state_change(
        gridded, ["userID"], "entireTime", "grid", min_duration_s=1800.0
    )
    stays = with_time_features(stays, "stime")
    got = stays.toPandas()

    # oracle side (pure pandas, independent implementation)
    o_params = O.area_to_params(BOUNDS, cfg.accuracy_m)
    lo1, la1, lo2, la2 = BOUNDS
    opdf = pdf[
        (pdf["longitude"] > lo1) & (pdf["longitude"] < lo2)
        & (pdf["latitude"] > la1) & (pdf["latitude"] < la2)
    ].copy()
    cols = opdf.apply(
        lambda r: O.gps_to_cols(r["longitude"], r["latitude"], o_params), axis=1
    )
    opdf["grid"] = [O.cantor_pair(c[0], c[1]) for c in cols]
    exp = O.sessionize_state_change(
        opdf, ["userID"], "entireTime", "grid", min_duration_s=1800.0
    )
    return got, exp


def test_stay_sets_match(parity):
    got, exp = parity
    gk = sorted((r["userID"], str(r["stime"]), int(r["grid"])) for _, r in got.iterrows())
    ek = sorted((r["userID"], str(r["stime"]), int(r["grid"])) for _, r in exp.iterrows())
    assert gk == ek
    # out-of-bounds user produces nothing; short-stay user produces nothing
    users = {r[0] for r in gk}
    assert "118" not in users and "049" not in users


def test_durations_and_runs_match(parity):
    got, exp = parity
    g = got.set_index(["userID", "stime"]).sort_index()
    e = exp.set_index(["userID", "stime"]).sort_index()
    assert np.allclose(
        g["duration_s"].to_numpy(float), e["duration_s"].to_numpy(float)
    )
    assert (g["n_rows"].to_numpy(int) == e["n_rows"].to_numpy(int)).all()
    assert (g["stay_seq"].to_numpy(int) == e["stay_seq"].to_numpy(int)).all()


def test_time_features_match_pandas_convention(parity):
    got, _ = parity
    for _, r in got.iterrows():
        ts = pd.Timestamp(r["stime"])
        assert r["dayofweek"] == ts.dayofweek  # pandas Mon=0 convention
        assert r["weekofyear"] == ts.isocalendar().week
        assert r["hour"] == ts.hour
