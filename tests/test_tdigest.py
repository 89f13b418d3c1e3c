"""t-digest contracts: rank-accuracy, mergeability, determinism, size."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyspark_mllib_twitter_spark.operators.tdigest import (
    DEFAULT_DELTA,
    tdigest_build,
    tdigest_merge,
    tdigest_quantiles,
)

QS = [0.5, 0.95, 0.99]


def _rank_of(spark_df, col, x) -> float:
    n = spark_df.count()
    below = spark_df.filter(F.col(col) <= x).count()
    return below / n


def test_tdigest_rank_accuracy(spark, sf_smoke):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select("value")
    digest = tdigest_merge(tdigest_build(ev, "value")).toPandas()
    ests = tdigest_quantiles(digest, QS)
    for q, est in zip(QS, ests):
        r = _rank_of(ev, "value", est)
        # delta=100 -> rank error well under 2% at these quantiles.
        assert abs(r - q) < 0.02, f"q={q}: est rank {r}"


def test_tdigest_total_weight_and_size(spark, sf_smoke):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select("value")
    n = ev.filter(F.col("value").isNotNull()).count()
    digest = tdigest_merge(tdigest_build(ev, "value")).toPandas()
    assert abs(digest["weight"].sum() - n) < 1e-6
    assert len(digest) <= 2 * DEFAULT_DELTA
    # Centroids come out sorted by mean with positive weights.
    means = digest["mean"].to_numpy()
    assert (np.diff(means) >= 0).all()
    assert (digest["weight"].to_numpy() > 0).all()


def test_tdigest_merge_matches_single_shot(spark, sf_smoke):
    """Digest(A) + Digest(B) merged must answer quantiles ~ like the
    single-shot digest over A union B (mergeability, the reason this
    sketch exists)."""
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_id", "value"
    )
    a = ev.filter(F.col("event_id") % 2 == 0).select("value")
    b = ev.filter(F.col("event_id") % 2 == 1).select("value")
    cents = tdigest_build(a, "value").unionByName(tdigest_build(b, "value"))
    merged = tdigest_merge(cents).toPandas()
    single = tdigest_merge(tdigest_build(ev.select("value"), "value")).toPandas()
    em = tdigest_quantiles(merged, QS)
    es = tdigest_quantiles(single, QS)
    full = ev.select("value")
    for q, m_est, s_est in zip(QS, em, es):
        # Both digests must satisfy the same rank bound; they need not
        # be bit-identical (different clustering paths).
        assert abs(_rank_of(full, "value", m_est) - q) < 0.02
        assert abs(_rank_of(full, "value", s_est) - q) < 0.02


def test_tdigest_deterministic_given_partitioning(spark):
    vals = [(float(x % 997) * 0.25,) for x in range(20000)]
    df = spark.createDataFrame(vals, "value double").repartition(4, "value")
    d1 = tdigest_merge(tdigest_build(df, "value")).toPandas()
    d2 = tdigest_merge(tdigest_build(df, "value")).toPandas()
    pd.testing.assert_frame_equal(
        d1.reset_index(drop=True), d2.reset_index(drop=True)
    )


def test_streaming_tdigest_rank_bounds_and_monotone_state(spark, sf_smoke):
    """Streaming digest contract: final per-type p50/p95/p99 all land
    within the rank-error bound vs exact, versions grow monotonically,
    and state stays sketch-sized."""
    from pyspark_mllib_twitter_spark.plans import REGISTRY

    rows = REGISTRY["q_stream_tdigest"].spark(spark, sf_smoke).collect()
    assert rows, "no streamed digests"
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    for r in rows:
        sub = ev.filter(F.col("event_type") == r.event_type)
        n = sub.count()
        assert abs(r.n_values - n) <= 1
        assert r.n_centroids <= 2 * DEFAULT_DELTA
        assert r.version >= 1
        for q, est in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            rank = sub.filter(F.col("value") <= est).count() / n
            assert abs(rank - q) < 0.03, (r.event_type, q, rank)


def test_tdigest_quantiles_empty_digest_returns_nan():
    """ADVICE r8: an empty digest (streaming key whose values were all
    NaN) must yield NaN quantiles, not IndexError on cum[0]."""
    import math

    import pandas as pd

    from pyspark_mllib_twitter_spark.operators.tdigest import tdigest_quantiles

    out = tdigest_quantiles(
        pd.DataFrame({"mean": [], "weight": []}), [0.5, 0.95, 0.99]
    )
    assert len(out) == 3 and all(math.isnan(x) for x in out)
