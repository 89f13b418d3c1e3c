"""Round-11 experiment (verdict task 5): where is the blocklist broadcast
ceiling for q_dy_blocklist_suffix, and what does the fallback cost?

Round 10 spot-checked 100k rules (BroadcastHashJoin retained, 1.3s warm,
rule-count-flat). This measures the regime ABOVE that: at what rule count
does (a) the shipped session's planner stop choosing broadcast on its own,
and (b) the hinted broadcast stop being the right call vs the shuffle
fallback? The fallback claim under test: with a shuffle equi-join, only
the 4-per-doc ``(doc_id, suffix)`` fan-out rows shuffle — the corpus
text/payload never moves (it stays behind the fan-out projection and
re-joins via the blocked-id set), so even past the broadcast ceiling the
corpus side stays scan+map-shaped.

Variants per rule count N (3 real rules + N synthetic non-matching):
  bcast    — the shipped plan: explicit F.broadcast(rules) hint
  auto     — no hint, session confs untouched: what the shipped session
             (64MB autoBroadcastJoinThreshold + AQE) picks on its own
  shuffle  — broadcast disabled (threshold=-1): the forced fallback

Methodology: per (N, variant) one untimed warm-up execution (codegen +
broadcast build), then the reported seconds are the MEDIAN of 3 timed
runs; the join node is read from the EXECUTED adaptive plan (AQE may
re-plan at runtime — the static plan can misreport).

Run: python tools/exp_blocklist_scale.py [sf_dir]
"""

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.plans.pipeline_ops import (  # noqa: E402
    _HOST_SQL,
    _HOST_SUFFIXES_EXPR,
    BLOCK_RULES,
)
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402


def suffix_fanout(spark, sf_dir):
    docs = spread(read_table(spark, sf_dir, "documents"))
    u = docs.selectExpr("doc_id", f"{_HOST_SQL} AS host")
    return u.select(
        "doc_id", "host", F.explode(F.expr(_HOST_SUFFIXES_EXPR)).alias("sfx")
    )


def make_rules(spark, n_synth):
    """3 real rules + n_synth synthetic registered-domain rules that never
    match the fixture hosts (distinct TLD) — realistic short strings."""
    synth = spark.range(n_synth).selectExpr(
        "'blocked-' || id || '.example.net' AS rule"
    )
    real = spark.createDataFrame([(r,) for r in BLOCK_RULES], "rule string")
    return synth.unionByName(real)


def executed_join_node(df):
    """The join node of the EXECUTED plan (post-AQE), not the static one."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        if node in plan:
            return node
    return "?"


def blocked(sfx, rules, hint_broadcast):
    r = F.broadcast(rules) if hint_broadcast else rules
    return (
        sfx.join(r, F.col("sfx") == F.col("rule"))
        .groupBy("doc_id", "host")
        .agg(
            F.max(
                F.struct(F.length("rule").alias("l"), F.col("rule").alias("r"))
            )["r"].alias("rule")
        )
    )


def timed_warm(df, runs=3):
    """One untimed warm-up execution, then the median of ``runs`` runs."""
    df.write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-blocklist-scale")
    session_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sfx = suffix_fanout(spark, sf_dir)
    sfx.write.format("noop").mode("overwrite").save()  # warm scan/codegen

    for n in (100_000, 1_000_000, 4_000_000, 16_000_000):
        rules = make_rules(spark, n)
        for variant in ("bcast", "auto", "shuffle"):
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                "-1" if variant == "shuffle" else session_thresh,
            )
            q = blocked(sfx, rules, hint_broadcast=(variant == "bcast"))
            try:
                sec = timed_warm(q)
            except Exception as e:  # OOM / broadcast limit = the ceiling
                msg = re.sub(r"\s+", " ", str(e))[:120]
                print(f"n={n:>9} {variant:8} FAILED: {msg}", flush=True)
                continue
            node = executed_join_node(q)
            print(f"n={n:>9} {variant:8} {node:18} {sec:6.2f}s", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", session_thresh)


if __name__ == "__main__":
    main()
