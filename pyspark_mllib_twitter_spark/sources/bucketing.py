"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides on
the key. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key and each
bucket is sorted, so a later join reads matching buckets pairwise —
SortMergeJoin with NO Exchange on either side (verified by plan assertion
in tests/test_bucketing.py). The same property removes the shuffle from
groupBy on the bucket key.

Bucketed data lives in the session catalog (``saveAsTable`` — plain
``.parquet(path)`` cannot carry bucket metadata). Bucket count is a layout
decision: aim for buckets of 100-500 MB at target scale, and keep it equal
across tables you intend to join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed parquet table."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
