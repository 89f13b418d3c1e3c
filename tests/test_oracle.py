"""t2 gate, locally: every oracle-declared query hash-matches DuckDB."""

from __future__ import annotations

import pytest

from pyspark_mllib_twitter_spark.plans import REGISTRY

from .oracle_harness import compare

ORACLE_SPECS = sorted(name for name, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(name for name, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_match(spark, sf_oracle, name):
    problems = compare(REGISTRY[name], spark, sf_oracle)
    assert not problems, f"{name} vs oracle:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, sf_smoke, name):
    df = REGISTRY[name].spark(spark, sf_smoke)
    rows = df.limit(2000).collect()
    assert df.columns, f"{name} returned no schema"
    assert rows is not None
