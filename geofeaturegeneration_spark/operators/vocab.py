"""Dictionary / vocabulary encoding with a reserved pad id 0.

Reference: ``GenerateAllGridMapping`` (CommonCode.py:295-336) builds the full
grid vocabulary — distinct grids, sorted ascending, index + 1 so that 0 is
reserved for unknown/pad — and unseen grids map to 0 after a left join + fill
(DP_GenerateTrajectory.py:73).

Scale notes: the id is a key's rank in the global sort order, but no global
single-partition window is used. The distinct key set is range-partitioned
and sorted, per-partition counts are collected (one tiny row per partition),
and ids are assigned as partition-offset + local position inside a
``mapInPandas`` pass — the distributed ``zipWithIndex`` pattern, expressed
Arrow-side. Ids depend only on the global sort order, not on where the range
boundaries fall, so the result is deterministic and identical to the
``row_number() over (ORDER BY key)`` definition at any parallelism.
The encode step is a broadcast left join, so the fact table is never
shuffled at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_vocab(
    df: DataFrame,
    key_col: str,
    id_col: str = "vocab_id",
    reserve_zero: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """distinct → sort asc → dense 1-based ids (0 reserved for unknown/pad
    when reserve_zero, matching CommonCode.py:330-333; the no-shift variant
    of Test.ipynb cell 56 is reserve_zero=False)."""
    import numpy as np

    spark = df.sparkSession
    offset = 1 if reserve_zero else 0
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )

    distinct = df.select(key_col).distinct()
    ranged = distinct.repartitionByRange(
        num_partitions, F.col(key_col)
    ).sortWithinPartitions(key_col)
    # CUT LINEAGE before the two dependent passes: the count pass and the
    # id-assignment pass must see the exact same partitioning, but
    # repartitionByRange samples boundaries from a nondeterministically
    # ordered distinct shuffle — a persist()ed partition that gets evicted
    # and recomputed could land rows in different partitions than the
    # collected counts assumed (the classic zipWithIndex hazard). With
    # localCheckpoint the partitions are stored and recomputation is
    # impossible (block loss fails the job instead of corrupting ids), and
    # nothing stays pinned in the cache registry across calls. Lazy
    # (eager=False): the counts collect below is the materializing action,
    # so no separate checkpoint job is paid (measured +0.25s per call).
    ranged = ranged.localCheckpoint(eager=False)
    counts = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    n_by_pid = {r["_pid"]: r["count"] for r in counts}
    starts: dict[int, int] = {}
    acc = 0
    for pid in range(num_partitions):
        starts[pid] = acc
        acc += n_by_pid.get(pid, 0)

    out_schema = T.StructType(
        [distinct.schema[key_col], T.StructField(id_col, T.LongType(), False)]
    )

    def assign(iterator):
        from pyspark import TaskContext

        next_id = starts[TaskContext.get().partitionId()] + offset
        for pdf in iterator:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[id_col] = np.arange(next_id, next_id + n, dtype="int64")
            next_id += n
            yield pdf

    return ranged.mapInPandas(assign, schema=out_schema)


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    key_col: str,
    id_col: str = "vocab_id",
    unknown_id: int = 0,
) -> DataFrame:
    """Left-join encode; unseen keys → ``unknown_id`` (DP_GenerateTrajectory.py:73).
    Vocab side is broadcast — the fact table never moves."""
    return df.join(F.broadcast(vocab), key_col, "left").na.fill(
        {id_col: unknown_id}
    )
