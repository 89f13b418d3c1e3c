"""Round-13 experiment: vocab-encode vs per-occurrence encode for BPE apply
(q_ek_bpe_apply).

The claim under test (the entry's docstring): running the 8-merge HOF
chain ONCE PER DISTINCT WORD (Heaps-law-bounded vocabulary) and joining
back to the token stream beats encoding every token occurrence, and the
gap WIDENS with corpus size (occurrences grow linearly, vocabulary
~sublinearly). Corpus grown 1x/3x/10x by replication WITHOUT new vocab
(replicas keep the same words under new doc ids — the repeated-content
regime a crawl actually has; vocabulary growth is what Heaps bounds).

Timed (median of 3 after warm-up + GC, noop sink): the full per-doc
(n_tok, n_char, n_sym) aggregation, once with the q_ek vocab-encode
plan and once encoding each exploded token directly.

Run: python tools/exp_bpe_apply_scale.py [sf_dir]   (default sf0.1)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.functions import text as TXT  # noqa: E402
from pyspark_mllib_twitter_spark.plans.corpus_ops import (  # noqa: E402
    bpe_apply_symbols,
)
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402

SCALES = (1, 3, 10)


def corpus_df(spark, sf_dir, k):
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    parts = [
        base.select((F.col("doc_id") + r * 10_000_000).alias("doc_id"), "text")
        for r in range(k)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def toks_df(docs):
    return docs.select(
        "doc_id",
        F.explode(
            F.filter(TXT.tokens("text"), lambda t: t.rlike("^[a-z]+$"))
        ).alias("w"),
    )


def vocab_encode_plan(docs):
    """The q_ek shape: encode distinct words, join back."""
    toks = toks_df(docs)
    enc = toks.select("w").distinct().select(
        "w",
        F.length("w").alias("n_char_w"),
        F.size(F.split(bpe_apply_symbols("w"), ";")).alias("n_sym_w"),
    )
    return (
        toks.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("n_char_w").alias("n_char"),
            F.sum("n_sym_w").alias("n_sym"),
        )
    )


def per_occurrence_plan(docs):
    """The naive shape: run the merge chain on every token occurrence."""
    toks = toks_df(docs)
    return (
        toks.select(
            "doc_id",
            F.length("w").alias("n_char_w"),
            F.size(F.split(bpe_apply_symbols("w"), ";")).alias("n_sym_w"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum("n_char_w").alias("n_char"),
            F.sum("n_sym_w").alias("n_sym"),
        )
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
    spark = get_spark("exp_bpe_apply_scale")
    print(f"# sf_dir={sf_dir}")
    print("| k | n_occurrences | n_vocab | vocab_encode | per_occurrence |")
    print("|---|---|---|---|---|")
    for k in SCALES:
        docs = corpus_df(spark, sf_dir, k)
        toks = toks_df(docs)
        n_occ = toks.count()
        n_vocab = toks.select("w").distinct().count()
        t_vocab = timed(lambda: vocab_encode_plan(docs), spark)
        t_occ = timed(lambda: per_occurrence_plan(docs), spark)
        print(
            f"| {k} | {n_occ} | {n_vocab} | {t_vocab:.2f}s | {t_occ:.2f}s |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
