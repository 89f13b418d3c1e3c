"""Schema'd sources and sinks.

The reference reads ONE multiline JSON file with inferred schema
(``/root/reference/COMP5349_2.py:138``) and writes stringified Python tuples
via ``rdd.saveAsTextFile`` (``COMP5349_2.py:188,211``). Both are non-starters
at 100 TB: multiline JSON is unsplittable (one task parses the whole file) and
schema inference costs an extra full scan. The new engine declares explicit
``StructType`` schemas, prefers splittable formats (JSONL, Parquet), and sinks
to Parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Tables materialized by the test-data generator (TESTDATA.md / FIXTURES.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Explicit schema for the tweets table — the fields the reference touches
#: (COMP5349_2.py:138,146,196) declared instead of inferred.
TWEETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("replyto_id", T.LongType(), True),
        T.StructField("retweet_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField(
            "user_mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType(), True),
                        T.StructField("indices", T.ArrayType(T.IntegerType()), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → columnar, vectorized, with
    predicate pushdown and column pruning for free.

    ``events.ts`` handling depends on the file's physical type:

    - parquet TIMESTAMP(MICROS, ntz) (current fixture generator): read
      natively as ``timestamp_ntz`` — no projection, full pushdown, and the
      semantics match DuckDB's TIMESTAMP (which is wall-clock, no zone)
      exactly, with no dependence on the session/container time zone.
    - parquet TIMESTAMP(NANOS) (older generators): Spark has no native type;
      with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a
      nanosecond-epoch long and is converted to a microsecond timestamp
      (``ts DIV 1000`` — exact integer division, truncation matches DuckDB's
      CAST(ns AS TIMESTAMP)).

    The nanos conf is set HERE, at runtime, not only in ``session.get_spark``:
    it is a runtime-settable SQL conf, and setting it on the read path makes
    ``read_table`` work on ANY session — including externally-built vanilla
    ``SparkSession``s (e.g. a test harness that calls
    ``SparkSession.builder.getOrCreate()`` without our builder confs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Legacy TIMESTAMP(NANOS) file surfaced as a long — convert once.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to session default parallelism — ONLY when
    the input plan yields fewer partitions than that.

    The local fixture tables arrive as ONE scan partition (single parquet
    file, single row group), which serializes every CPU-heavy downstream
    pipeline stage (tokenize/explode/ngram/codec) onto one core; the
    explicit exchange costs one small shuffle of the pruned input columns
    and unlocks full-core parallelism. At warehouse scale the same scan
    already splits across thousands of row groups, so the partition-count
    check makes this a NO-OP there — an unconditional repartition would
    force a pointless full shuffle of the corpus. Explicit numPartitions so
    AQE's partition coalescing (which targets ~64 MB partitions and would
    merge small-but-compute-heavy text right back onto one core) leaves the
    exchange alone. Catalyst still pushes filters and column pruning
    through the repartition to the scan.

    SCAN-ROOTED INPUTS ONLY: the ``df.rdd`` partition probe finalizes the
    physical plan, and that is side-effect-free only for exchange-free
    plans — under AQE, a plan with an upstream shuffle materializes query
    stages (i.e. RUNS JOBS) to resolve partitioning. Call this on a raw
    ``read_table``/scan DataFrame (optionally filtered/projected), never
    on the output of a join/groupBy/repartition."""
    n = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in FIXTURE_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_tweets_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Splittable JSON-lines tweets source with declared schema.

    This is the scale path: line-delimited JSON splits into one task per
    HDFS/S3 block, and the declared schema skips the inference scan.
    """
    return spark.read.schema(TWEETS_SCHEMA).json(path)


def read_tweets_json_array(spark: SparkSession, path: str) -> DataFrame:
    """Fidelity-mode reader matching the reference's multiline JSON array
    (COMP5349_2.py:138). Unsplittable — kept only for parity tests."""
    return spark.read.schema(TWEETS_SCHEMA).option("multiLine", "true").json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Default sink (replaces the reference's saveAsTextFile)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the cluster
    keys (sampled range boundaries → one key range per output file) +
    ``sortWithinPartitions`` so rows are ordered inside each file.

    Why it matters at 100 TB: parquet row-group min/max statistics only
    skip reads when each file covers a *narrow* key range. After this
    write, per-file key ranges are disjoint, so a point or range predicate
    on the cluster key touches one file (or a contiguous few) instead of
    every file — the poor man's Z-order, exact for a single-key prefix.
    Costs one range-shuffle at write time; every later scan pays less.
    """
    part = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    part.sortWithinPartitions(*cluster_by).write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink — the other splittable columnar format Spark ships natively;
    same predicate-pushdown/column-pruning story as parquet for warehouses
    standardized on ORC (Hive-lineage)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — vectorized read with pushdown, schema from file footer."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink for interop exports. Header on; timestamps as ISO-8601 so a
    schema'd read round-trips losslessly (micros precision)."""
    (
        df.write.mode(mode)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema'd CSV source — header skipped, declared types, NO inference
    (inference costs a full extra scan and guesses; same discipline as the
    JSON readers). CSV splits by line, so it parallelizes like JSONL."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
