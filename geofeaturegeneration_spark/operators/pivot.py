"""Bucket-pivot aggregates and the interaction matrix.

Reference analogs:
* PoI pivot — per grid × category visit counts
  (``pivot_table(index='grid', columns='category', aggfunc='count')``,
  GenerateGeographicFeature.py:214-218), merged across worker processes under
  a lock then re-summed (GenerateGeographicFeature.py:221-284). In Spark the
  lock + two-phase merge vanish: one ``groupBy().pivot().count()`` runs a
  partial+final hash aggregate automatically.
* interaction matrix — user × grid visit counts
  (AttachFeature.py:588-593). Kept in LONG form by default: a wide pivot
  with millions of distinct grids is an anti-pattern at scale; downstream
  consumers that need the wide shape pivot the (already tiny) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: list | None = None,
    fill: int = 0,
) -> DataFrame:
    """grid × category count pivot. Passing ``values`` explicitly skips the
    extra distinct-values job (the reference hard-codes 14 categories,
    Parameters.json:43-58)."""
    g = df.groupBy(key_col)
    p = g.pivot(pivot_col, values) if values is not None else g.pivot(pivot_col)
    return p.count().na.fill(fill)


def interaction_matrix(
    df: DataFrame, entity_col: str, item_col: str
) -> DataFrame:
    """Long-form (entity, item, n_visits) — the scale-safe shape."""
    return df.groupBy(entity_col, item_col).agg(
        F.count(F.lit(1)).alias("n_visits")
    )


def interaction_matrix_wide(
    df: DataFrame, entity_col: str, item_col: str, items: list | None = None
) -> DataFrame:
    """Wide user × item pivot for small item vocabularies (the reference's
    shape, AttachFeature.py:588-593)."""
    g = df.groupBy(entity_col)
    p = g.pivot(item_col, items) if items is not None else g.pivot(item_col)
    return p.count().na.fill(0)
