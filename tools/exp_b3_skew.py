"""Round-10 experiment (verdict task 7): does the B-side semi-prune of the
containment join (q_b3_containment_join) win on a SKEWED vocabulary?

Round 9 measured the prune LOSING on the natural fixture (rare-first
prefixes cover most of a mostly-rare vocabulary, so the prune removed
little). The open question was whether the argument flips when the corpus
has stopword-like hot grams: rare-first ordering keeps a hot gram OUT of
every prefix, so the B-side full index rows carrying it (30% of docs here)
are shuffled and probed for nothing — exactly what a semi-join against the
distinct prefix-gram set would delete before the shuffle.

Fixture variant: one hot 3-gram (` zq1 zq2 zq3` appended) in a
deterministic 30% of sf0.1 documents. Variants timed:
  plain       — the shipped q_b3 plan
  ckpt        — eager localCheckpoint of `ordered` (r9 loser, re-run)
  prune       — B-full semi-joined (broadcast) to distinct A-prefix grams
  ckpt+prune  — r9's exact (b) arm

Run: python tools/exp_b3_skew.py [sf_dir]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pyspark_mllib_twitter_spark.functions import text as TXT  # noqa: E402
from pyspark_mllib_twitter_spark.plans.corpus_ops import CONTAIN_TAU  # noqa: E402
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402


def containment(docs, mode):
    toks = docs.select("doc_id", TXT.tokens("text").alias("toks")).filter(
        F.size("toks") >= 3
    )
    grams = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.slice("toks", 1, F.size("toks") - 2),
                lambda t, i: F.concat_ws(
                    " ", t, F.element_at("toks", i + 2), F.element_at("toks", i + 3)
                ),
            )
        ).alias("gs"),
    )
    g_df = (
        grams.select(F.explode("gs").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("df"))
    )
    ordered = (
        grams.select("doc_id", F.explode("gs").alias("g"))
        .join(g_df, "g")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "g"))).alias("ord"))
        .select("doc_id", F.transform("ord", lambda s: s["g"]).alias("gs_ord"))
    )
    if "ckpt" in mode:
        ordered = ordered.localCheckpoint(eager=True)
    prefix_len = (
        F.size("gs_ord")
        - F.ceil(F.lit(CONTAIN_TAU) * F.size("gs_ord")).cast("int")
        + 1
    )
    pfx_a = ordered.select(
        F.col("doc_id").alias("id_a"),
        F.size("gs_ord").alias("sz_a"),
        F.explode(F.slice("gs_ord", 1, prefix_len)).alias("pg"),
    )
    full_b = ordered.select(
        F.col("doc_id").alias("id_b"),
        F.explode("gs_ord").alias("pg"),
    )
    if "prune" in mode:
        full_b = full_b.join(F.broadcast(pfx_a.select("pg").distinct()), "pg")
    cands = (
        pfx_a.join(full_b, "pg")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    with_arrays = cands.join(
        ordered.select(F.col("doc_id").alias("id_a"), F.col("gs_ord").alias("ta")),
        "id_a",
    ).join(
        ordered.select(F.col("doc_id").alias("id_b"), F.col("gs_ord").alias("tb")),
        "id_b",
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    cont = inter.cast("double") / F.size("ta")
    return with_arrays.filter(cont >= CONTAIN_TAU).select("id_a", "id_b")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    skewed = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3, F.concat(F.col("text"), F.lit(" zq1 zq2 zq3"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_docs = skewed.count()
    print(f"docs={n_docs} (30% carry the hot gram)")
    for mode in ["plain", "ckpt", "prune", "ckpt+prune"]:
        times, counts = [], []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            counts.append(containment(skewed, mode).count())
            times.append(round(time.time() - t0, 1))
        print(f"{mode:11s} pairs={counts[0]} runs={times}", flush=True)
        assert len(set(counts)) == 1


if __name__ == "__main__":
    main()
