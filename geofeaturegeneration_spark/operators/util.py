"""Partitioning utilities shared by operators.

``ensure_min_partitions`` exists for one specific physical problem: a
*narrow* source (one small file, one Kafka partition, a single-row-group
parquet) feeding a *CPU-heavy* map stage (md5 shingling, simhash bit
arithmetic, Arrow-batched pandas work). Catalyst sizes scan splits by
bytes (``spark.sql.files.maxPartitionBytes``) and AQE coalesces shuffles
by bytes, so a byte-small but CPU-expensive stage can end up on one task.
A round-robin repartition restores the parallelism floor; it is applied
only when the input is narrower than requested, so at cluster scale —
where the scan already has thousands of splits — it is a no-op and costs
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently has fewer partitions
    than ``min_partitions`` (default: the session's shuffle parallelism).

    No-op for already-wide inputs, so it is safe to leave in scale paths.
    """
    if min_partitions is None:
        min_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)
