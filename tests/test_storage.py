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
