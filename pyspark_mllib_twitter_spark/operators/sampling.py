"""Sampling operators: deterministic hash sampling and stratified sampling.

A 100 TB pipeline samples constantly — eval splits, dedup audits, cheap
profiling — and the two properties that matter at scale are (a)
determinism across runs/engines (so a sample is reproducible and joinable
against itself later) and (b) no extra shuffle (sampling is a filter, not
a repartition).

``hash_sample`` keys the decision on md5 of the row key: a pure projection
+ filter that pushes down like any predicate, gives the same rows on every
engine that has md5 (so it is DuckDB-oracle-checkable), and never needs a
seed handshake between jobs. ``stratified_sample`` wraps Spark's
``sampleBy`` (per-stratum Bernoulli, seeded) for rate-correcting skewed
strata; its guarantees are statistical, so it is property-tested with
tolerances rather than oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The 16 hex characters; ``k`` of them ≈ k/16 sampling rate.
_HEX = "0123456789abcdef"


def hash_sample(df: DataFrame, key_col: str, rate_sixteenths: int) -> DataFrame:
    """Deterministic ~``rate_sixteenths``/16 sample: keep rows whose
    ``md5(key)`` ends in one of the first ``rate_sixteenths`` hex digits.

    Engine-portable (md5 of the decimal-string key), reproducible without
    any seed state, and planned as a plain filter — no shuffle, no RNG
    per partition. Granularity is 1/16; chain two digits for 1/256 steps.
    """
    if not 0 < rate_sixteenths <= 16:
        raise ValueError("hash_sample: rate_sixteenths must be in 1..16")
    allowed = list(_HEX[:rate_sixteenths])
    digit = F.substring(F.md5(F.col(key_col).cast("string")), 32, 1)
    return df.filter(digit.isin(allowed))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark ``sampleBy``): each stratum key
    is kept with its own probability — the rate-equalizer for skewed
    strata (e.g. downsample the dominant language, keep the rare ones).
    Seeded for within-engine reproducibility; statistical, not exact —
    verify with tolerance tests, not row oracles."""
    return df.sampleBy(strata_col, fractions, seed)
