"""TableStore: partition-grain idempotent overwrite on the parquet backend
(the Iceberg backend uses the same call sites; jar absent offline)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geofeaturegeneration_spark.storage import TableStore, iceberg_available


def test_backend_detection(spark):
    # no Iceberg runtime offline -> parquet fallback, never an error
    assert iceberg_available(spark) is False
    store = TableStore(spark, "/tmp/gfs_store_test")
    assert store.backend == "parquet"


def test_overwrite_partitions_is_partition_grain(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    full = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id INT, source STRING, v DOUBLE",
    )
    store.create_or_replace(full, "t", partition_by=["source"])
    assert store.read("t").count() == 3

    # rewrite ONLY partition a with new values; partition b must survive
    new_a = spark.createDataFrame([(9, "a", 99.0)], "id INT, source STRING, v DOUBLE")
    store.overwrite_partitions(new_a, "t", partition_by=["source"])
    rows = {(r["id"], r["source"]) for r in store.read("t").collect()}
    assert rows == {(9, "a"), (3, "b")}

    # idempotent: same write again -> same state
    store.overwrite_partitions(new_a, "t", partition_by=["source"])
    rows2 = {(r["id"], r["source"]) for r in store.read("t").collect()}
    assert rows2 == rows

    # the overwrite-mode conf is restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )


def test_read_csv_gb18030_roundtrip(spark, tmp_path):
    """GB18030 ingestion (reference GenerateGeographicFeature.py:191): the
    charset option must be load-bearing — decoding the same bytes as UTF-8
    mangles the text."""
    from geofeaturegeneration_spark.storage import read_csv

    rows = [("北京西城区", 39.9, 116.3), ("上海浦东新区", 31.2, 121.5)]
    csv = "name,lat,lon\n" + "\n".join(f"{n},{a},{b}" for n, a, b in rows)
    p = tmp_path / "gb18030.csv"
    p.write_bytes(csv.encode("gb18030"))

    df = read_csv(
        spark, str(p), schema="name STRING, lat DOUBLE, lon DOUBLE",
        encoding="GB18030",
    )
    got = {(r["name"], r["lat"], r["lon"]) for r in df.collect()}
    assert got == set(rows)

    bad = read_csv(spark, str(p), schema="name STRING, lat DOUBLE, lon DOUBLE")
    assert {r["name"] for r in bad.collect()} != {n for n, _, _ in rows}


def test_read_csv_pipe_delimited(spark, tmp_path):
    from geofeaturegeneration_spark.storage import read_csv

    p = tmp_path / "pipe.csv"
    p.write_text("a|b\n1|x\n2|y\n")
    df = read_csv(spark, str(p), schema="a INT, b STRING", sep="|")
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(1, "x"), (2, "y")]
