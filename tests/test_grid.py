"""Unit tests for the grid/Cantor expression library vs the pandas oracle.

Edge cases from the reference's bug ledger: negative loncol/latcol
(Record.md:11-23) and strict bounds inequalities
(Test/GeoFeatureGenerationClass.py:339-340).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geofeaturegeneration_spark.config import GridConfig
from geofeaturegeneration_spark.functions import grid as G
from tests import oracle


@pytest.fixture(scope="module")
def pairs_df(spark):
    vals = [(x, y) for x in range(-25, 26, 7) for y in range(-25, 26, 7)]
    vals += [(0, 0), (1, 0), (0, 1), (-1, -1), (2150, 1178), (-2150, -1178)]
    return spark.createDataFrame(pd.DataFrame(vals, columns=["x", "y"]))


def test_cantor_matches_oracle(pairs_df):
    got = pairs_df.withColumn("z", G.cantor_pair(F.col("x"), F.col("y"))).toPandas()
    for _, r in got.iterrows():
        assert r["z"] == oracle.cantor_pair(int(r["x"]), int(r["y"])), r


def test_cantor_roundtrip(pairs_df):
    got = (
        pairs_df.withColumn("z", G.cantor_pair(F.col("x"), F.col("y")))
        .withColumn("x2", G.cantor_unpair_x(F.col("z")))
        .withColumn("y2", G.cantor_unpair_y(F.col("z")))
        .toPandas()
    )
    assert (got["x"] == got["x2"]).all()
    assert (got["y"] == got["y2"]).all()


def test_cantor_injective(pairs_df):
    got = pairs_df.withColumn("z", G.cantor_pair(F.col("x"), F.col("y"))).toPandas()
    assert got["z"].nunique() == len(got)


def test_grid_assign_matches_oracle(spark):
    cfg = GridConfig()
    params = cfg.params
    o_params = oracle.area_to_params(cfg.bounds, cfg.accuracy_m)
    pts = pd.DataFrame(
        {
            "lon": [115.4, 115.400001, 116.0, 117.549999, 116.8],
            "lat": [39.4, 39.400001, 40.0, 41.099999, 40.5],
        }
    )
    got = (
        spark.createDataFrame(pts)
        .withColumn("loncol", G.gps_to_loncol(F.col("lon"), params))
        .withColumn("latcol", G.gps_to_latcol(F.col("lat"), params))
        .toPandas()
    )
    for _, r in got.iterrows():
        lc, la = oracle.gps_to_cols(r["lon"], r["lat"], o_params)
        assert (r["loncol"], r["latcol"]) == (lc, la)


def test_bounds_strictness(spark):
    bounds = (115.4, 39.4, 117.55, 41.1)
    pts = pd.DataFrame(
        {
            "lon": [115.4, 115.41, 117.55, 117.54, 116.0],
            "lat": [39.41, 39.4, 41.09, 41.1, 40.0],
        }
    )
    got = (
        spark.createDataFrame(pts)
        .withColumn("ok", G.in_bounds(F.col("lon"), F.col("lat"), bounds))
        .toPandas()
    )
    # rows exactly ON a bound must be excluded (strict < / >)
    assert list(got["ok"]) == [False, False, False, False, True]


def test_centre_roundtrip(spark):
    cfg = GridConfig()
    params = cfg.params
    pts = pd.DataFrame({"loncol": [0, 5, 100, -3], "latcol": [0, 7, 50, -2]})
    got = (
        spark.createDataFrame(pts)
        .withColumn("clon", G.grid_to_centre_lon(F.col("loncol"), params))
        .withColumn("clat", G.grid_to_centre_lat(F.col("latcol"), params))
        .withColumn("loncol2", G.gps_to_loncol(F.col("clon"), params))
        .withColumn("latcol2", G.gps_to_latcol(F.col("clat"), params))
        .toPandas()
    )
    assert (got["loncol"] == got["loncol2"]).all()
    assert (got["latcol"] == got["latcol2"]).all()


def test_geohash_known_vectors(spark):
    """Canonical geohash test vectors (public): Wikipedia's ezs42 example
    plus two widely used reference points."""
    from geofeaturegeneration_spark.functions.grid import geohash_encode
    from pyspark.sql import functions as F

    rows = [
        (42.605, -5.603, "ezs42", 5),
        (39.92324, 116.3906, "wx4g0ec1", 8),
        (57.64911, 10.40744, "u4pruydqqvj", 11),
    ]
    for lat, lon, want, p in rows:
        df = spark.range(1).select(
            geohash_encode(F.lit(lat), F.lit(lon), precision=p).alias("gh")
        )
        assert df.first()["gh"] == want, (want, p)
    # prefix property: higher precision extends the lower-precision hash
    df = spark.range(1).select(
        geohash_encode(F.lit(42.605), F.lit(-5.603), 11).alias("long_gh")
    )
    assert df.first()["long_gh"].startswith("ezs42")


def test_with_geohash_matches_column_form(spark):
    """The staged magic-mask scale path (with_geohash) must be bit-exact
    with the linear per-bit Column form (geohash_encode) across odd and
    even precisions (odd/even n_bits flips which side owns the LSB of the
    interleave) and must propagate NULL coords identically."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geofeaturegeneration_spark.functions.grid import (
        geohash_encode,
        with_geohash,
    )

    pts = pd.DataFrame(
        {
            "lat": [42.605, 39.92324, 57.64911, -89.9, 89.9, 0.0, -0.0001]
            + [(-90.0 + 7.31 * i) % 180.0 - 90.0 for i in range(40)],
            "lon": [-5.603, 116.3906, 10.40744, -179.9, 179.9, 0.0, 0.0001]
            + [(-180.0 + 13.57 * i) % 360.0 - 180.0 for i in range(40)],
        }
    )
    df = spark.createDataFrame(pts)
    # precisions 5 (odd n_bits=25? no: 25 odd), 6 (30 even), 7 (35 odd)
    out = with_geohash(
        df, F.col("lat"), F.col("lon"), {"g5": 5, "g6": 6, "g7": 7}
    )
    for p, name in ((5, "g5"), (6, "g6"), (7, "g7")):
        out = out.withColumn(
            f"ref{p}", geohash_encode(F.col("lat"), F.col("lon"), p)
        )
        out = out.withColumn(f"ok{p}", F.col(name) == F.col(f"ref{p}"))
    got = out.toPandas()
    for p in (5, 6, 7):
        assert got[f"ok{p}"].all(), got.loc[
            ~got[f"ok{p}"], ["lat", "lon", f"g{p}" if p != 6 else "g6"]
        ]

    # NULL coords -> NULL hash, same as the column form
    ndf = spark.createDataFrame(
        [(1, 42.605, -5.603), (2, None, -5.603), (3, 42.605, None)],
        "id INT, lat DOUBLE, lon DOUBLE",
    )
    ngot = {
        r["id"]: r["gh"]
        for r in with_geohash(
            ndf, F.col("lat"), F.col("lon"), {"gh": 5}
        ).collect()
    }
    assert ngot == {1: "ezs42", 2: None, 3: None}


def test_geohash_null_coords_yield_null(spark):
    """Spark greatest/least skip nulls — without the guard a null coord
    would clamp to the all-ones cell and emit a legitimate-looking corner
    hash instead of NULL (diverging from NULL-propagating SQL engines)."""
    from geofeaturegeneration_spark.functions.grid import geohash_encode
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 42.605, -5.603), (2, None, -5.603), (3, 42.605, None)],
        "id INT, lat DOUBLE, lon DOUBLE",
    )
    got = {
        r["id"]: r["gh"]
        for r in df.select(
            "id", geohash_encode(F.col("lat"), F.col("lon"), 5).alias("gh")
        ).collect()
    }
    assert got == {1: "ezs42", 2: None, 3: None}
