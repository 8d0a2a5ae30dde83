"""Per-partition checkpoint / lineage / metrics store with idempotent resume.

Replaces the reference's file-existence resume (DP_GenerateTrajectory.py:50-52,
``gRefreshDataFlag`` gate AttachFeature.py:1059-1066) with a real bookkeeping
table: one record per (job_id, partition_key) carrying status, row count,
wall-clock, and a lineage string (input fingerprint + code version), written
atomically AFTER the partition's output lands.

Storage: an append-only parquet directory ("Iceberg-layout": on a cluster
with the Iceberg runtime this becomes ``df.writeTo(table).append()`` against
a real catalog table — the record schema and the read-latest-state logic are
identical; the jar is not available offline, see session.py). Readers reduce
to the latest record per partition, so re-marks and concurrent retries are
safe: last writer wins, and output idempotency comes from dynamic partition
overwrite, not from the marker.

Scale notes: the checkpoint table is tiny (one row per partition per
attempt) and only ever read with a groupBy over partition keys — never
joined against the fact data. Resume cost is O(partitions), not O(data).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # done | failed
        T.StructField("rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("lineage", T.StringType(), True),
        T.StructField("attempt_id", T.StringType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)


class CheckpointStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame | None:
        try:
            return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)
        except Exception:
            return None

    def latest(self, job_id: str) -> DataFrame | None:
        """Latest record per partition_key for a job (last writer wins)."""
        df = self._read()
        if df is None:
            return None
        w = W.partitionBy("partition_key").orderBy(
            F.col("updated_at").desc(), F.col("attempt_id").desc()
        )
        return (
            df.filter(F.col("job_id") == job_id)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def completed(self, job_id: str, lineage: str | None = None) -> set[str]:
        """Partition keys whose latest record is done (and, when given,
        matches ``lineage`` — a lineage change invalidates old outputs)."""
        df = self.latest(job_id)
        if df is None:
            return set()
        df = df.filter(F.col("status") == "done")
        if lineage is not None:
            df = df.filter(F.col("lineage") == lineage)
        return {r["partition_key"] for r in df.select("partition_key").collect()}

    def mark(
        self,
        job_id: str,
        partition_key: str,
        status: str,
        rows: int | None = None,
        wall_ms: int | None = None,
        lineage: str | None = None,
    ) -> None:
        from datetime import datetime, timezone

        rec = [
            (
                job_id,
                partition_key,
                status,
                rows,
                wall_ms,
                lineage,
                uuid.uuid4().hex,
                datetime.now(timezone.utc).replace(tzinfo=None),
            )
        ]
        df = self.spark.createDataFrame(rec, CHECKPOINT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def metrics(self, job_id: str) -> DataFrame | None:
        """Latest per-partition metrics — the run log the reference keeps as
        printed shapes (README.md:277-573), as a queryable table."""
        return self.latest(job_id)


def prune_stale_partitions(
    spark: SparkSession, out_path: str, partition_col: str, keys: list[str]
) -> list[str]:
    """Delete ``partition_col=<key>`` directories under ``out_path`` whose
    key is not in ``keys``. Dynamic partition overwrite only replaces the
    partitions that re-run, so shrinking the key set between runs (e.g.
    fewer dedup buckets) would otherwise leave the previous run's
    higher-numbered partitions on disk — served as stale rows to any reader
    of the directory. Uses the Hadoop FileSystem API, so it works on any
    scheme the job can write to. Returns the deleted directory names."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    keep = {f"{partition_col}={k}" for k in keys}
    pruned: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith(f"{partition_col}=")
            and name not in keep
        ):
            fs.delete(st.getPath(), True)
            pruned.append(name)
    return pruned


def _delete_partition_dir(
    spark: SparkSession, out_path: str, partition_col: str, key: str
) -> None:
    """Delete one ``partition_col=<key>`` directory (no-op if absent).

    Dynamic partition overwrite only replaces partitions PRESENT in the
    written data — a re-run whose output is zero rows for a key writes no
    files and therefore deletes nothing, silently serving the previous
    run's rows for that key. Callers delete the directory explicitly
    before rewriting a partition so "this run produced nothing for key X"
    lands as an empty partition, not a stale one."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{out_path}/{partition_col}={key}")
    fs = p.getFileSystem(hconf)
    if fs.exists(p):
        fs.delete(p, True)


@dataclass
class PartitionResult:
    partition_key: str
    rows: int
    wall_ms: int
    skipped: bool


def run_partitioned(
    spark: SparkSession,
    store: CheckpointStore,
    job_id: str,
    partition_keys: list[str],
    run_one,  # (partition_key) -> DataFrame to write
    out_path: str,
    partition_col: str,
    lineage: str,
    force: bool = False,
) -> list[PartitionResult]:
    """Run a partitioned batch job with skip-if-done resume.

    Each partition's output is written with DYNAMIC partition overwrite —
    re-running a partition replaces exactly its own files, so a crash
    between output-write and checkpoint-mark re-runs that partition
    idempotently (write is the source of truth; the mark only skips work).
    Partition directories OUTSIDE ``partition_keys`` (leftovers of a
    previous run with a larger key set) are deleted up front AND their
    checkpoint marks invalidated (status "pruned" supersedes the old
    "done"), so the directory always equals exactly this run's key set and
    a LATER run that re-expands the key set re-runs the pruned keys
    instead of resuming "done" marks whose data was deleted.

    A re-run partition's directory is deleted explicitly before the write:
    dynamic overwrite only replaces partitions present in the written
    data, so a re-run producing ZERO rows for its key (legitimate — e.g. a
    stricter quality filter rejecting a whole bucket) would otherwise
    leave the previous lineage's files in place and count them as this
    run's rows.
    """
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        pruned = prune_stale_partitions(spark, out_path, partition_col, partition_keys)
        for name in pruned:
            store.mark(
                job_id,
                name.split("=", 1)[1],
                "pruned",
                lineage=lineage,
            )
        done = set() if force else store.completed(job_id, lineage)
        results: list[PartitionResult] = []
        for key in partition_keys:
            if key in done:
                results.append(PartitionResult(key, 0, 0, skipped=True))
                continue
            t0 = time.perf_counter()
            df = run_one(key)
            out = df.withColumn(partition_col, F.lit(key))
            # invalidate BEFORE deleting: a crash between the delete and the
            # write must leave the key marked not-done (so resume re-runs
            # it), never an empty partition under a surviving "done" mark
            store.mark(job_id, key, "rerun", lineage=lineage)
            _delete_partition_dir(spark, out_path, partition_col, key)
            out.write.mode("overwrite").partitionBy(partition_col).parquet(out_path)
            # read back with the EXPLICIT schema: a partition that produced
            # zero rows writes no parquet files, and schema inference over a
            # file-less directory throws UNABLE_TO_INFER_SCHEMA — empty
            # partitions are legitimate (e.g. a quality filter rejecting a
            # whole bucket), so the count must not depend on inference
            n = spark.read.schema(out.schema).parquet(out_path).filter(
                F.col(partition_col) == key
            ).count()
            wall_ms = int((time.perf_counter() - t0) * 1000)
            store.mark(job_id, key, "done", rows=n, wall_ms=wall_ms, lineage=lineage)
            results.append(PartitionResult(key, n, wall_ms, skipped=False))
        return results
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
