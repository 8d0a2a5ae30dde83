"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; sign-LSH bucketing is
the scale path (candidates only meet within a bucket). Dot products run as
``F.aggregate`` folds over ``zip_with`` products — JVM-side, sequential
left-to-right, so results are bit-identical to a left-associated explicit
sum in any IEEE engine (this is what makes the DuckDB oracle exact, no
tolerance needed).

Scale notes:
* brute force is O(n^2) rows through the join — keep for small n / golden
  checks; at 10^9 vectors use `ann_lsh_topk` (or IVF via a learned
  partitioner) so each task only scores its bucket.
* norms are precomputed once per side; the cross join carries (id, vec,
  norm) only.
* per-query top-k is a window row_number; ties break on neighbor id so
  output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold: ((0 + t1) + t2) + ... — left-associated IEEE sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = _to_double(F.col(vec_col))
    return df.select(F.col(id_col), v.alias("_v"), _norm(v).alias("_n"))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (self-join, excludes self).

    Output: (id_col, nn_id, cos_sim rounded to 6, rank 1..k)."""
    base = with_norm(df, id_col, vec_col)
    a = base.select(
        F.col(id_col), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = base.select(
        F.col(id_col).alias("nn_id"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    w = W.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("nn_id").asc())
    return (
        a.join(b, F.col(id_col) != F.col("nn_id"))
        .withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("nn_id"),
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            F.col("rank"),
        )
    )


def lsh_bucket(vec_col: str, n_bits: int = 8) -> Column:
    """Sign-LSH bucket id from the signs of the first n_bits dimensions:
    bit k set iff vec[k] > 0. Cheap, deterministic, engine-portable; at
    scale replace the raw dims with fixed random hyperplanes (same shape:
    sign of a dot product)."""
    bucket = F.lit(0).cast("long")
    for k in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), k + 1) > 0, F.lit(1 << k)
        ).otherwise(F.lit(0))
    return bucket


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_bits: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Candidates come from the sign-LSH bucket equi-join (near-identical
    vectors share every leading sign, so true near-dups co-bucket; at scale
    use multiple hyperplane tables to push recall). Exact cosine is then
    verified on candidates only — the standard candidate/verify split of a
    production dedup pass. Output: (id_a, id_b, cos_sim)."""
    v = _to_double(F.col(vec_col))
    normed = df.select(
        F.col(id_col),
        v.alias("_v"),
        _norm(v).alias("_n"),
        lsh_bucket(vec_col, n_bits).alias("_bucket"),
    )
    a = normed.select(
        F.col(id_col).alias("id_a"), F.col("_bucket"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = normed.select(
        F.col(id_col).alias("id_b"), F.col("_bucket"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select(
            "id_a", "id_b", F.round(F.col("_cos"), 6).alias("cos_sim")
        )
    )


def ann_ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer assigns every vector
    to its nearest centroid ("inverted list"); each query scores only the
    vectors in its ``nprobe`` closest lists.

    ``centroids`` (schema ``_cid INT, _cv ARRAY<DOUBLE>, _cn DOUBLE``)
    injects a pre-trained quantizer — the production shape (train once,
    search many); when omitted, a deterministic seed quantizer is trained
    eagerly from the first ``n_centroids`` vectors.

    Centroids here are the first ``n_centroids`` vectors in id order — a
    deterministic seed set (at scale: k-means centroids from a sampled
    training pass; the query plan is IDENTICAL, only the centroid table
    changes). Assignment = broadcast join against the tiny centroid table +
    per-vector argmin; search = equi-join on the list id. Two broadcast
    joins + one equi-join — never a cross join over the corpus.

    Output: (id_col, nn_id, cos_sim, rank, list_id)."""
    v = _to_double(F.col(vec_col))
    normed = df.select(F.col(id_col), v.alias("_v"), _norm(v).alias("_n"))
    # the coarse quantizer is TRAINED eagerly (one tiny TakeOrdered job) and
    # becomes a literal broadcast table — exactly how a real IVF ships its
    # k-means centroids; keeping it lazy would replicate a global-window
    # subtree into every branch of the search plan.
    if centroids is not None:
        cents = centroids
    else:
        seed_rows = (
            normed.orderBy(id_col).limit(n_centroids).select("_v", "_n").collect()
        )
        cents = df.sparkSession.createDataFrame(
            [(i + 1, list(r["_v"]), float(r["_n"])) for i, r in enumerate(seed_rows)],
            "_cid INT, _cv ARRAY<DOUBLE>, _cn DOUBLE",
        )
    ccos = _dot(F.col("_v"), F.col("_cv")) / (F.col("_n") * F.col("_cn"))
    w_assign = W.partitionBy(id_col).orderBy(
        F.col("_ccos").desc(), F.col("_cid").asc()
    )
    assigned = (
        normed.crossJoin(F.broadcast(cents))
        .withColumn("_ccos", ccos)
        .withColumn("_crank", F.row_number().over(w_assign))
        .filter(F.col("_crank") <= nprobe)
        .select(
            F.col(id_col), F.col("_v"), F.col("_n"),
            F.col("_cid").alias("list_id"),
            (F.col("_crank") == 1).alias("_home"),
        )
    )
    # inverted lists contain each vector once (its home list); queries probe
    # their nprobe nearest lists. With nprobe=1 the probe set IS the home
    # set, so both join sides derive from the identical subplan (filter
    # included) and the assignment exchange is computed once (ReuseExchange);
    # with nprobe>1 the probe side is the superset.
    probe = assigned.filter(F.col("_home")) if nprobe == 1 else assigned
    a = probe.select(
        F.col(id_col), F.col("list_id"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = assigned.filter(F.col("_home")).select(
        F.col(id_col).alias("nn_id"), F.col("list_id"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    w = W.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("nn_id").asc())
    return (
        a.join(b, "list_id")
        .filter(F.col(id_col) != F.col("nn_id"))
        .withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("nn_id"),
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            F.col("rank"),
            F.col("list_id"),
        )
    )


def ann_lsh_topk(
    df: DataFrame, id_col: str, vec_col: str, k: int = 3, n_bits: int = 8
) -> DataFrame:
    """Approximate top-k: brute-force cosine but only within each sign-LSH
    bucket. One equi-join on bucket replaces the cross join — the scale
    path. Output: (id_col, nn_id, cos_sim, rank, bucket)."""
    v = _to_double(F.col(vec_col))
    normed = df.select(
        F.col(id_col),
        v.alias("_v"),
        _norm(v).alias("_n"),
        lsh_bucket(vec_col, n_bits).alias("bucket"),
    )
    a = normed.select(
        F.col(id_col), F.col("bucket"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = normed.select(
        F.col(id_col).alias("nn_id"), F.col("bucket"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    w = W.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("nn_id").asc())
    return (
        a.join(b, "bucket")
        .filter(F.col(id_col) != F.col("nn_id"))
        .withColumn("_cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("nn_id"),
            F.round(F.col("_cos"), 6).alias("cos_sim"),
            F.col("rank"),
            F.col("bucket"),
        )
    )
