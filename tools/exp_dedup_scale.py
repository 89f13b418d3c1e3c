"""Round-12 experiment (round-11 verdict task 4): corpus-growth scaling
curve for the dedup family.

The 100 TB claims for exact and fuzzy dedup are plan-asserted (digests-only
shuffles, banded candidate cut) and spot-measured at one scale — this
measures the CURVE: the same three operators on deterministic 1x/3x/10x
multiples of the sf corpus. Expectation under test: near-linear in corpus
size for the digest shuffles (content dedup, cluster profile), and the
banded MinHash join bounded by duplicate density, not |docs|^2.

Corpus construction: replica ``r`` re-ids every doc (+r*10M) and suffixes
EVERY token with ``~r`` (a single JVM regexp_replace). Within a replica the
duplicate/near-dup structure of the base corpus is preserved exactly (any
two texts that shared fingerprints or 3-gram shingles still do — the same
rewrite is applied to both); across replicas every token differs, so no
new cross-replica pairs appear. Duplicate DENSITY is therefore constant
across scales — pair counts grow linearly by construction, which is what
makes the runtime curve attributable to data volume rather than to a
changing answer. Exact-dup copies are injected per replica with the q_dz
1/5 + 1/25 recipe (the base corpus has no exact dups).

Timed operators per scale k (median of 2 after 1 untimed warm-up, forced
GC between scales; corpus pre-written to a temp parquet dir so scan cost
is identical in kind to the fixture's):
  profile   — q_dz's duplicate-cluster profile shape: fingerprint groupBy
              (16-byte digest shuffle) + cluster-size histogram
  exact     — content_dedup survivors (fingerprint keep-min-id + back-join)
  fuzzy_e2e — portable MinHash-LSH pairs (3-gram, 16 hashes, 4 bands,
              J>=0.5) -> connected components -> keep-one survivors
              (the q_ns_minhash_dedup_e2e composition)

Run: python tools/exp_dedup_scale.py [sf_dir]   (default sf0.1)
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.functions import text as TXT  # noqa: E402
from pyspark_mllib_twitter_spark.operators import dedup  # noqa: E402
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402

SCALES = (1, 3, 10, 30)


def build_corpus(spark, sf_dir: str, k: int, out: str) -> None:
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    parts = []
    for r in range(k):
        rep = base.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", rf"$1~{r}").alias("text"),
        )
        # q_dz injection recipe, per replica: every 5th doc one copy,
        # every 25th a second (cluster sizes 1/2/3 at every scale).
        parts.append(rep)
        parts.append(
            rep.filter(F.col("doc_id") % 5 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000
            )
        )
        parts.append(
            rep.filter(F.col("doc_id") % 25 == 0).withColumn(
                "doc_id", F.col("doc_id") + 2_000_000
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def profile_df(corpus):
    clusters = (
        corpus.select(
            TXT.fingerprint("text").alias("fp"),
            F.length("text").cast("bigint").alias("doc_bytes"),
        )
        .groupBy("fp")
        .agg(
            F.count("*").cast("bigint").alias("sz"),
            F.min("doc_bytes").alias("doc_bytes"),
        )
    )
    return clusters.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(F.col("sz") - 1).cast("bigint").alias("docs_removable"),
    )


def fuzzy_e2e_df(corpus):
    pairs = dedup.minhash_pairs_portable(
        corpus, shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.5
    )
    reps = dedup.keep_one_representatives(
        pairs.select("id_a", "id_b"), corpus.select("doc_id"), "doc_id"
    )
    return reps.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id")


def timed(make_df, runs=3, spark=None):
    """Median of ``runs`` timed (construct + execute) passes after one
    untimed warm-up and a forced GC. Construction is INSIDE the timer: the
    fuzzy-dedup composition does its label-propagation iterations with
    eager localCheckpoints at plan-construction time, so timing only the
    final action would miss nearly all of its work."""
    make_df().write.format("noop").mode("overwrite").save()
    if spark is not None:
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
    spark = get_spark("exp_dedup_scale")
    tmp = tempfile.mkdtemp(prefix="dedup_scale_")
    print(f"# sf_dir={sf_dir} tmp={tmp}")
    print("| k | n_docs | n_pairs | profile | exact | fuzzy_e2e |")
    print("|---|---|---|---|---|---|")
    try:
        for k in SCALES:
            out = os.path.join(tmp, f"x{k}")
            build_corpus(spark, sf_dir, k, out)
            corpus = spark.read.parquet(out)
            n_docs = corpus.count()
            n_pairs = dedup.minhash_pairs_portable(
                corpus, shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.5
            ).count()
            t_prof = timed(lambda: profile_df(corpus), spark=spark)
            t_exact = timed(lambda: dedup.content_dedup(corpus), spark=spark)
            t_fuzzy = timed(lambda: fuzzy_e2e_df(corpus), spark=spark)
            print(
                f"| {k} | {n_docs} | {n_pairs} | {t_prof:.2f}s "
                f"| {t_exact:.2f}s | {t_fuzzy:.2f}s |",
                flush=True,
            )
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
