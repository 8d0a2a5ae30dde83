"""Deterministic splits and negative sampling.

Reference analogs:
* train/test split — pandas ``users.sample(frac=0.8, random_state=42)``
  (DP_GenerateTrajectory.py:113-114). Pandas RNG is not reproducible in a
  distributed engine (SURVEY.md §7.4), so the Spark-native replacement is a
  content-hash split: stable under re-runs, re-partitioning, and cluster
  size — the property that matters for training pipelines.
* negative sampling — unvisited-region pool via set difference
  (Test.ipynb cell 81 ``GetUnvisitedRegion``; strategy spec
  DP_GenerateTrajectory_ContainNegativeSample.py:1-8). Random choice is
  replaced by a deterministic hash ranking for the same reason.

Both use the md5-based 60-bit hash (functions.text.md5_long), so any engine
reproduces the exact membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from geofeaturegeneration_spark.functions.text import md5_long


def hash_split(
    df: DataFrame, id_col: str, test_pct: int = 20, salt: str = "split"
) -> DataFrame:
    """Adds ``split_bucket`` (0..99) and ``is_test`` — membership depends
    only on (id, salt). Change the salt to draw an independent split."""
    bucket = (
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt))) % 100
    ).cast("int")
    return df.withColumn("split_bucket", bucket).withColumn(
        "is_test", F.col("split_bucket") < test_pct
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    test_pct: int = 20,
    salt: str = "split",
) -> DataFrame:
    """``hash_split`` drawn on the DEDUP CLUSTER instead of the row id, so
    a document and all of its near-duplicates land in the SAME split —
    the leakage-safe form of the train/test draw (a doc whose near-copy
    sits in the training set is not a fair eval row; plain per-doc
    hashing splits ~test_pct of every multi-doc cluster across the
    boundary). ``clusters`` is the (id_col, cluster_col) assignment from
    ``dedup.dedup_clusters`` — cluster_id is the cluster's min doc id, so
    singletons behave exactly like a per-doc draw with the same salt.

    Rows without an assignment (not in ``clusters``) fall back to their
    own id — the split is total. One broadcast-or-hash join on id + the
    pure hash expression; no extra shuffle beyond the join."""
    asg = clusters.select(
        F.col(id_col), F.col(cluster_col).alias("_gfs_cluster")
    )
    key = F.coalesce(F.col("_gfs_cluster"), F.col(id_col))
    bucket = (
        md5_long(F.concat(key.cast("string"), F.lit(salt))) % 100
    ).cast("int")
    return (
        df.join(asg, id_col, "left")
        .withColumn("split_bucket", bucket)
        .withColumn("is_test", F.col("split_bucket") < test_pct)
        .drop("_gfs_cluster")
    )


def negative_samples(
    interactions: DataFrame,
    items: DataFrame,
    entity_col: str,
    item_col: str,
    k: int = 3,
    n_candidates: int | None = None,
    salt: str = "cand",
) -> DataFrame:
    """Per entity: k unvisited items chosen by deterministic hash —
    (entity, item, neg_rank).

    ``n_candidates=None`` enumerates the full entities x items grid before
    the anti-join. That is exact but a scale-killer: 1e8 entities x 2.5e6
    grid cells materializes 1e14 candidate rows. Use it only for small item
    vocabularies.

    ``n_candidates=k'`` (the scale path) draws k' candidate slots per
    entity instead: slot j maps to item index
    ``md5(entity || '#<salt>#' || j) % |items|`` against a dense 0-based
    item index (built with the distributed-zipWithIndex vocab builder, so
    the index is the item's global sort rank — engine-reproducible).
    Candidate rows are k' per entity regardless of vocabulary size; the
    anti-join and hash ranking then run on the sampled set only. Slots can
    collide or hit visited items, so an entity may yield fewer than k
    negatives — size k' >= ~4k + expected-visited for a comfortable margin.
    NULL entities are filtered out on BOTH paths (a null key's slot hash is
    null, so the sampled path could never draw for it — the enumeration
    path now matches, so switching n_candidates never changes null-key
    semantics).
    Membership is a pure function of (entity, item-vocab, salt): stable
    under re-runs, partitioning, and engines.

    Plan shape (sampled path): explode k' slots per entity -> modulo hash ->
    broadcast equi-join to the item index -> one (entity, item) distinct ->
    left_anti on the visited pairs -> per-entity top-k window. No
    unconditioned join anywhere."""
    if n_candidates is not None and n_candidates < 1:
        raise ValueError("n_candidates must be >= 1 (or None for full enumeration)")
    entities = (
        interactions.select(entity_col)
        .filter(F.col(entity_col).isNotNull())
        .distinct()
    )
    visited = interactions.select(entity_col, item_col).distinct()
    items_d = items.select(item_col).distinct()

    if n_candidates is None:
        cand = entities.join(F.broadcast(items_d))
    else:
        from geofeaturegeneration_spark.operators.vocab import build_vocab

        idx_items = build_vocab(
            items_d, item_col, id_col="_idx", reserve_zero=False
        )
        n_items = idx_items.count()
        if n_items == 0:
            return (
                entities.withColumn(
                    item_col, F.lit(None).cast(items.schema[item_col].dataType)
                )
                .withColumn("neg_rank", F.lit(0).cast("int"))
                .limit(0)
            )
        slots = entities.select(
            entity_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_candidates - 1))).alias("_j"),
        )
        slot_idx = md5_long(
            F.concat(
                F.col(entity_col).cast("string"),
                F.lit(f"#{salt}#"),
                F.col("_j").cast("string"),
            )
        ) % n_items
        cand = (
            slots.select(entity_col, slot_idx.alias("_idx"))
            .distinct()
            .join(F.broadcast(idx_items), "_idx")
            .select(entity_col, item_col)
        )

    unvisited = cand.join(visited, [entity_col, item_col], "left_anti")
    h = md5_long(
        F.concat(F.col(entity_col).cast("string"), F.lit("#"), F.col(item_col).cast("string"))
    )
    w = W.partitionBy(entity_col).orderBy(h.asc(), F.col(item_col).asc())
    return (
        unvisited.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(entity_col, item_col, "neg_rank")
    )


def contrastive_samples(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    item_col: str,
    neg_pool: DataFrame,
    neg_item_col: str,
    seq_len: int = 3,
    k_neg: int = 3,
    n_candidates: int | None = None,
) -> DataFrame:
    """Contrastive training records: per entity and time step, ``query`` =
    the last ``seq_len`` items, ``pos`` = the next item, ``neg`` = the
    entity's ``k_neg`` deterministic negative items (unvisited members of
    ``neg_pool``, ordered by hash rank).

    Spark restatement of the reference's sample generator — records
    ``{userID, query[], pos, neg[]}`` (README.md:74-182, generator
    Test.ipynb cells 84-85, strategy
    DP_GenerateTrajectory_ContainNegativeSample.py:1-8; the pandas RNG
    choice of negatives is replaced by the deterministic hash ranking of
    ``negative_samples``, SURVEY.md §7.4).

    Plan shape: one entity-key window pass for the sliding (query, pos)
    pairs + the negative-sampling anti-join, then an entity equi-join to
    attach each entity's fixed neg array — the per-row work never touches
    the negative pool.
    """
    from geofeaturegeneration_spark.operators.windows import sliding_subsequences

    sl = sliding_subsequences(df, [entity_col], time_col, item_col, seq_len)
    negs = (
        negative_samples(
            df.select(entity_col, F.col(neg_item_col)), neg_pool,
            entity_col, neg_item_col, k_neg, n_candidates=n_candidates,
        )
        .groupBy(entity_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("neg_rank").alias("r"), F.col(neg_item_col).alias("v"))
                    )
                ),
                lambda p: p["v"],
            ).alias("neg")
        )
    )
    return sl.join(negs, entity_col, "left")


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    shard_size: int,
    salt: str = "shuffle",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global corpus shuffle + fixed-size shard assignment —
    the export step between curation and training: training loops want the
    corpus in a random-but-reproducible order, cut into equal shards
    (webdataset/TFRecord-style), and the order must not depend on cluster
    size, partition count, or input file layout.

    Every row gets its global position ``pos`` (0-based) in the total
    order by ``(md5(id#salt), id)`` — a stable pseudo-random permutation,
    re-drawable with a different salt — plus ``shard = pos / shard_size``
    and ``shard_pos = pos % shard_size``. Output ``shard`` is ready for
    ``write.partitionBy('shard')``; only the LAST shard is ever short.

    Scale shape: NO global single-partition window (the naive
    ``row_number() OVER (ORDER BY h)`` formulation). The stream is
    range-partitioned on the hash, sorted within partitions, and positions
    are assigned as partition-offset + local index inside one
    ``mapInPandas`` pass — the distributed zipWithIndex pattern the vocab
    builder uses (vocab.build_vocab), including its lineage-cut guard:
    ``repartitionByRange`` samples boundaries nondeterministically, so the
    partitioning is pinned with a lazy ``localCheckpoint`` before the
    count pass and the assignment pass read it (a recomputed partition
    could otherwise disagree with the collected counts). Positions depend
    only on the global sort order, not on boundary placement, so the
    result is identical at any parallelism — the property the oracle
    checks. Cost: one range shuffle of the full rows + one tiny counts
    collect (one row per partition)."""
    import numpy as np

    from pyspark.sql import types as T

    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    for c in ("pos", "shard", "shard_pos"):
        if c in df.columns:
            raise ValueError(f"shuffle_shards output column '{c}' already exists")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    h = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}")))
    ranged = (
        df.withColumn("_shuf_h", h)
        .repartitionByRange(num_partitions, F.col("_shuf_h"), F.col(id_col))
        .sortWithinPartitions(F.col("_shuf_h").asc(), F.col(id_col).asc())
        .localCheckpoint(eager=False)
    )
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
        [f for f in df.schema.fields]
        + [
            T.StructField("pos", T.LongType(), False),
            T.StructField("shard", T.LongType(), False),
            T.StructField("shard_pos", T.LongType(), False),
        ]
    )

    def assign(iterator):
        from pyspark import TaskContext

        next_pos = starts[TaskContext.get().partitionId()]
        for pdf in iterator:
            n = len(pdf)
            pdf = pdf.drop(columns=["_shuf_h"])
            pos = np.arange(next_pos, next_pos + n, dtype="int64")
            pdf["pos"] = pos
            pdf["shard"] = pos // shard_size
            pdf["shard_pos"] = pos % shard_size
            next_pos += n
            yield pdf

    return ranged.mapInPandas(assign, schema=out_schema)
