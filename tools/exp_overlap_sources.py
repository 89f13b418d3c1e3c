"""Round-11 experiment: does q_ea_source_overlap's cost scale with S^2
(source pairs) as its docstring claims, independent of corpus size?

The scale shape under test: the (source, token) distinct is bounded by
vocab x S; the token-keyed self-join fans out <= S^2 rows per token; the
output is S(S-1)/2 pairs. If true, re-labeling the SAME corpus into more
sources should grow runtime roughly with the pair count (the matrix),
not explode — and the fan-out stays bounded by hot-token sharing.

Method: sf0.1 documents, source re-labeled to S synthetic buckets
(doc_id % S); per S one untimed warm-up then median of 3 timed runs of
the exact q_ea plan shape (pinned distinct, broadcast vocab frames).

Run: python tools/exp_overlap_sources.py [sf_dir]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.functions import text as TXT  # noqa: E402
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402


def overlap_matrix(docs):
    """The q_ea plan shape over an arbitrary (source, text) frame."""
    st = (
        docs.select("source", F.explode(TXT.tokens("text")).alias("token"))
        .distinct()
        .localCheckpoint()
    )
    vocab = st.groupBy("source").agg(F.count("*").cast("bigint").alias("v"))
    a = st.select(F.col("source").alias("source_a"), "token")
    b = st.select(F.col("source").alias("source_b"), "token")
    shared = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    va = vocab.select(F.col("source").alias("source_a"), F.col("v").alias("vocab_a"))
    vb = vocab.select(F.col("source").alias("source_b"), F.col("v").alias("vocab_b"))
    return (
        shared.join(F.broadcast(va), "source_a")
        .join(F.broadcast(vb), "source_b")
        .select(
            "source_a", "source_b", "vocab_a", "vocab_b", "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("exp-overlap-sources")
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    base.write.format("noop").mode("overwrite").save()  # warm scan

    for s in (20, 50, 100, 200):
        docs = base.selectExpr(f"'s' || lpad(doc_id % {s}, 3, '0') AS source", "text")
        q = overlap_matrix(docs)
        q.write.format("noop").mode("overwrite").save()  # warm-up
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        n_pairs = q.count()
        print(
            f"S={s:>4} pairs={n_pairs:>6} median={statistics.median(samples):6.2f}s",
            flush=True,
        )
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
