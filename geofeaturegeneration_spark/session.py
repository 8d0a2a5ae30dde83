"""SparkSession factory.

Local-mode defaults are tuned for the sandbox (single JVM, 32 threads,
128 GiB); on a real cluster the same config keys apply, only the master and
memory sizing change. AQE is always on: it gives runtime shuffle-partition
coalescing and skew-join splitting for free, which matters at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Iceberg runtime jar is not available offline in this sandbox; when it is
# present on the classpath these configs activate a local hadoop catalog so
# the storage layer (storage.py) can use real Iceberg tables.  Correctness
# never depends on the jar: storage.py falls back to plain Parquet.
_ICEBERG_CONFIGS = {
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
}


def get_spark(
    app_name: str = "geofeaturegeneration_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    shuffle_partitions defaults to the local parallelism — at cluster scale
    you would size this to ~2-3x total cores instead, or simply rely on AQE
    coalescing from a higher initial value.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 routes lower()/upper() through ICU by default
        # (spark.sql.icu.caseMappings.enabled=true); the first evaluation
        # triggers CollationAwareUTF8String.<clinit>, which cold-loads ICU
        # break-iterator dictionaries and was observed to stall a task for
        # 20-70 s mid-job. JVM case mapping is identical for the UTF8_BINARY
        # collation on this workload (and for all common Unicode), without
        # the init cliff.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # Shuffle/spill dirs on tmpfs when available: local-mode disk bandwidth
    # is shared across all threads and throttles scaling; on a real cluster
    # this corresponds to per-executor NVMe scratch (which scales with the
    # executor count). Override with SPARK_GRAFT_LOCAL_DIR.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session if any (used by the scaling bench to restart
    with a different parallelism level)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
