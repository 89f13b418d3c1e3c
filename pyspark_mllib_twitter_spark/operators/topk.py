"""Generic distributed top-k per group.

Replaces the reference's driver-side ``sorted(sim_list, reverse=True)[:5]``
(``/root/reference/COMP5349_2.py:188``) and its RDD ``mapValues`` top-5
lambda. Window + ``row_number`` lets Spark run a per-partition partial top-k
before the shuffle (WindowGroupLimit in the physical plan), so the full sort
never materializes — this is the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-``k`` rows per group under a total order.

    ``order_cols`` must be a total order within each group for deterministic
    output (the reference pins score DESC, id DESC — nb:220-230).
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
