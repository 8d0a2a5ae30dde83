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
