"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()``    — every implemented operator from SURVEY.md §2 (registry in
                   ``pyspark_mllib_twitter_spark.plans``).
``oracle_sql()`` — equivalent DuckDB SQL per query (omitted for the
                   non-SQL-expressible ML/LSH/streaming entries → rows-only
                   check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark_mllib_twitter_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the W1 top-k-per-group shape
    (window top-5 with the reference's tie-break) over orders."""
    return REGISTRY["q_w1_topk"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
