"""Round-12 experiment: lexicon-size ceiling for the flag-term gate
(q_ee_flag_term_gate).

The docstring claims the lexicon "compiles into the scan expression"
below ~100k terms and should switch to a broadcast token join beyond
that (the q_dy shape). This measures the claim: flagged-occurrence
counting over the sf corpus with the 6 real terms + N synthetic
never-matching terms, three mechanisms:

  expr   — the shipped shape: ``size(filter(tokens, t -> t IN set))``.
           Above spark.sql.optimizer.inSetConversionThreshold (10) the
           IN compiles to InSet (hash-set membership, no codegen blowup),
           so per-row cost should be ~flat in N; the N-dependent cost is
           driver-side literal construction + plan serialization.
  bcast  — explode(tokens) -> broadcast equi-join the lexicon -> count
           per doc (occurrence semantics preserved). Pays the explode
           (one row per token) but ships the lexicon once per executor.
  shuffle— same join with broadcast disabled (threshold=-1): the
           fallback once the lexicon outgrows broadcast memory.

Per (N, mechanism): one untimed warm-up, median of 3 timed runs
(construct + execute: for expr the construction cost IS the N-dependent
part under test).

Run: python tools/exp_flag_lexicon_scale.py [sf_dir]   (default sf0.1)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.functions import text as TXT  # noqa: E402
from pyspark_mllib_twitter_spark.plans.pipeline_ops import FLAG_TERMS  # noqa: E402
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402

SIZES = (100, 1_000, 10_000, 100_000)


def lexicon(n_total):
    terms = sorted(FLAG_TERMS)
    terms += [f"synthterm{i}" for i in range(n_total - len(terms))]
    return terms


def expr_df(docs, terms):
    toks = TXT.tokens("text")
    tset = set(terms)

    def in_terms(t):
        return t.isin(*tset)

    return docs.select(
        "doc_id", F.size(F.filter(toks, in_terms)).cast("bigint").alias("n_flagged")
    )


def join_df(spark, docs, terms, hint_broadcast):
    lex = spark.createDataFrame([(t,) for t in terms], "term string")
    lex = F.broadcast(lex) if hint_broadcast else lex
    tok = docs.select(
        "doc_id", F.explode(TXT.tokens("text")).alias("term")
    )
    return (
        tok.join(lex, "term")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_flagged"))
    )


def timed(make_df, spark, runs=3):
    make_df().write.format("noop").mode("overwrite").save()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("exp_flag_lexicon_scale")
    docs = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    docs.count()
    print(f"# sf_dir={sf_dir}")
    print("| N terms | expr | bcast join | shuffle join |")
    print("|---|---|---|---|")
    bcast_off = ("spark.sql.autoBroadcastJoinThreshold", "-1")
    for n in SIZES:
        terms = lexicon(n)
        t_expr = timed(lambda: expr_df(docs, terms), spark)
        t_bcast = timed(lambda: join_df(spark, docs, terms, True), spark)
        prev = spark.conf.get(bcast_off[0])
        spark.conf.set(*bcast_off)
        try:
            t_shuffle = timed(lambda: join_df(spark, docs, terms, False), spark)
        finally:
            spark.conf.set(bcast_off[0], prev)
        print(
            f"| {n} | {t_expr:.2f}s | {t_bcast:.2f}s | {t_shuffle:.2f}s |",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
