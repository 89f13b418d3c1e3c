"""Round-11 experiment (verdict task 5): where is the blocklist broadcast
ceiling for q_dy_blocklist_suffix, and what does the fallback cost?

Round 10 spot-checked 100k rules (BroadcastHashJoin retained, 1.3s warm,
rule-count-flat). This measures the regime ABOVE that: at what rule count
does (a) Catalyst stop choosing broadcast on its own, and (b) the hinted
broadcast stop being the right call vs the shuffle fallback? The fallback
claim under test: with a shuffle equi-join, only the 4-per-doc
``(doc_id, suffix)`` fan-out rows shuffle — the corpus text/payload never
moves (it stays behind the fan-out projection and re-joins via the
blocked-id set), so even past the broadcast ceiling the corpus side stays
scan+map-shaped.

Variants per rule count N (3 real rules + N synthetic non-matching):
  bcast    — the shipped plan: explicit F.broadcast(rules) hint
  auto     — no hint: record which join Catalyst/AQE picks
  shuffle  — broadcast disabled (threshold=-1): the fallback equi-join

Run: python tools/exp_blocklist_scale.py [sf_dir]
Writes one result line per (N, variant): join node + median warm seconds.
"""

import re
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

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


def join_node(df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
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


def timed(df, runs=2):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-blocklist-scale")
    sfx = suffix_fanout(spark, sf_dir)
    sfx.write.format("noop").mode("overwrite").save()  # warm scan/codegen

    set_thresh = lambda v: spark.conf.set(  # noqa: E731
        "spark.sql.autoBroadcastJoinThreshold", v
    )
    for n in (100_000, 1_000_000, 4_000_000, 16_000_000):
        rules = make_rules(spark, n)
        for variant in ("bcast", "auto", "shuffle"):
            set_thresh("-1" if variant == "shuffle" else "10485760")
            q = blocked(sfx, rules, hint_broadcast=(variant == "bcast"))
            node = join_node(q)
            try:
                sec = timed(q)
            except Exception as e:  # OOM / broadcast limit = the ceiling
                msg = re.sub(r"\s+", " ", str(e))[:120]
                print(f"n={n:>9} {variant:8} {node:18} FAILED: {msg}", flush=True)
                continue
            print(f"n={n:>9} {variant:8} {node:18} {sec:6.2f}s", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    set_thresh("10485760")


if __name__ == "__main__":
    main()
