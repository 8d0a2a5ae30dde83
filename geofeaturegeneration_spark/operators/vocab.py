"""Dictionary / vocabulary encoding with a reserved pad id 0.

Reference: ``GenerateAllGridMapping`` (CommonCode.py:295-336) builds the full
grid vocabulary — distinct grids, sorted ascending, index + 1 so that 0 is
reserved for unknown/pad — and unseen grids map to 0 after a left join + fill
(DP_GenerateTrajectory.py:73).

Scale notes: the global ``row_number() over (ORDER BY key)`` is a
single-partition window — fine for vocabularies (≤ tens of millions of
entries) because only the DISTINCT keys flow through it, never the fact
table. The encode step is a broadcast left join, so the fact table is never
shuffled at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def build_vocab(
    df: DataFrame, key_col: str, id_col: str = "vocab_id", reserve_zero: bool = True
) -> DataFrame:
    """distinct → sort asc → dense 1-based ids (0 reserved for unknown/pad
    when reserve_zero, matching CommonCode.py:330-333; the no-shift variant
    of Test.ipynb cell 56 is reserve_zero=False)."""
    offset = 1 if reserve_zero else 0
    w = W.orderBy(key_col)
    return (
        df.select(key_col)
        .distinct()
        .withColumn(id_col, (F.row_number().over(w) - 1 + offset).cast("long"))
    )


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
