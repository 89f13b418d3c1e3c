"""Round-13 experiment: IVF+PQ index probe cost vs CORPUS size
(q_ns_ann_ivfpq_idx), the exp_minhash_index_scale pattern applied to ANN
(r12 verdict task 5).

The claim under test: the persisted index (codes parquet PARTITIONED BY
centroid_id) turns a probe into a partition-pruned scan — unprobed cells
are never read. What that buys at scale depends on GEOMETRY, so two
regimes are measured as the corpus grows 1x/10x/30x/100x (replicas with
rotated embeddings, fixed 10-query batch, k=5, refine=8):

  fixed  — n_centroids=16, n_probe=8 (the registry entry's geometry):
           pruning reads a CONSTANT FRACTION (n_probe/n_centroids = 1/2)
           of the corpus, so probe cost should grow ~linearly with a
           halved slope. Honest expectation, not flat.
  scaled — n_centroids grows with the corpus (16k, IVF practice keeps
           CELL SIZE constant, n_centroids ~ N / target_cell), n_probe=8
           fixed: the probed byte count is constant, so probe cost should
           be ~FLAT; the build (fit + encode + partitioned write) pays
           ~linearly — the amortized once-per-corpus-version cost.

Timed: median of 3 probe executions after one untimed warm-up + forced
GC, noop sink. Build is single-shot (reported, expected ~linear).

Run: python tools/exp_ann_index_scale.py [sf_dir]   (default sf0.1)
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.operators import similarity  # noqa: E402
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402

SCALES = (1, 10, 30, 100)
N_QUERIES, K, N_PROBE, REFINE = 10, 5, 8, 8


def build_corpus(spark, sf_dir: str, k: int, out: str) -> None:
    """k replicas of the embeddings table; replica r rotates each vector
    by r % 64 positions AND sign-flips it on every second 64-cycle
    (both deterministic and norm-preserving), so ALL replicas are
    distinct points even past r=64 (round-13 review: a bare r % 64
    rotation made replicas 64-99 duplicate 0-35 at the 100x scale) and
    centroid cells stay balanced."""
    base = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    parts = []
    for r in range(k):
        rot = r % 64
        emb = (
            F.col("embedding")
            if rot == 0
            else F.concat(
                F.slice("embedding", rot + 1, 64 - rot),
                F.slice("embedding", 1, rot),
            )
        )
        if (r // 64) % 2 == 1:
            emb = F.transform(emb, lambda x: -x)
        parts.append(
            base.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                emb.alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def timed_probe(spark, path, queries, runs=3):
    def probe():
        similarity.probe_ivfpq_index(
            spark, path, queries, k=K, n_probe=N_PROBE, refine=REFINE
        ).write.format("noop").mode("overwrite").save()

    probe()  # untimed warm-up
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        probe()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("exp_ann_index_scale")
    tmp = tempfile.mkdtemp(prefix="ann_index_scale_")
    print(f"# sf_dir={sf_dir} tmp={tmp}")
    queries = (
        read_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .cache()
    )
    queries.count()  # materialize the fixed probe side outside all timers
    print("| regime | k | n_vec | n_centroids | build(1shot) | probe(med3) |")
    print("|---|---|---|---|---|---|")
    try:
        for k in SCALES:
            corpus_path = os.path.join(tmp, f"corpus_x{k}")
            build_corpus(spark, sf_dir, k, corpus_path)
            corpus = spark.read.parquet(corpus_path)
            n_vec = corpus.count()
            # "grouped" = the scaled geometry under the bounded-directory
            # layout (max_dirs=32) — the measured small-files remedy; its
            # probe column should stay near-flat where bare "scaled" grows.
            regimes = (
                ("fixed", 16, None),
                ("scaled", 16 * k, None),
                ("grouped", 16 * k, 32),
            )
            for regime, n_cent, max_dirs in regimes:
                idx_path = os.path.join(tmp, f"idx_{regime}_x{k}")
                t0 = time.perf_counter()
                similarity.build_ivfpq_index(
                    corpus, idx_path, n_centroids=n_cent,
                    n_subvectors=8, n_codes=64, max_dirs=max_dirs,
                )
                t_build = time.perf_counter() - t0
                t_probe = timed_probe(spark, idx_path, queries)
                print(
                    f"| {regime} | {k} | {n_vec} | {n_cent} "
                    f"| {t_build:.1f} | {t_probe:.2f} |",
                    flush=True,
                )
                shutil.rmtree(idx_path, ignore_errors=True)
            shutil.rmtree(corpus_path, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
