"""Interval (range) join: points ⋈ intervals on containment, sub-quadratic.

Spark plans ``points JOIN intervals ON p BETWEEN lo AND hi`` as a
(broadcast) nested-loop join — O(|P| x |I|), fine only while the interval
side broadcasts. The bin recipe turns containment into an equi-join:

1. pick a bin width; each point hashes to one bin (``floor(p / w)``);
2. each interval explodes to the bins it covers (``sequence(floor(lo/w),
   floor(hi/w))``) — short intervals hit 1-2 bins;
3. equi-join on the bin (hash join, shuffles scale with data + overlap
   density, never the cross product), then re-check exact containment.

Bin width tunes replication: ~median interval length keeps the explode
factor ~2 while making bins selective. This is the standard recipe behind
genomics overlap joins and Databricks' range-join optimization — expressed
here in plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= point <= hi`` via the bin equi-join. Output: all point columns
    + all interval columns. ``how`` supports 'inner' and 'left'
    (left keeps pointless points with null interval columns).
    """
    if bin_width <= 0:
        raise ValueError("interval_join: bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: unsupported how={how!r}")

    p = points.withColumn("_bin", F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    matched = (
        p.join(i, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # left: one bin per point means no duplicate-probe dedup is needed;
    # re-attach unmatched points with null interval columns.
    unmatched = p.join(
        i.select("_bin", lo_col, hi_col).distinct(),
        (p["_bin"] == i["_bin"])
        & (p[point_col] >= i[lo_col])
        & (p[point_col] <= i[hi_col]),
        "left_anti",
    ).drop("_bin")
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(unmatched)
