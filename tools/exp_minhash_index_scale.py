"""Round-12 experiment: delta-probe cost vs LAKE size for the incremental
MinHash index (q_ef_minhash_delta_index).

The 100 TB claim under test: once the lake's band index is PERSISTED
(bucketed on the folded band key), probing it with a fixed-size delta
batch costs ~the delta batch, not ~the lake — the index side re-shuffles
nothing. The lake grows 1x/3x/10x/30x (replica construction as in
exp_dedup_scale: per-replica token suffixes, so the FIXED delta batch —
derived from replica 0 — collides only with replica 0 and the true-hit
set is constant across scales; any probe-cost growth is index-size
effect, not answer growth).

Timed components per lake scale k (median of 3 after warm-up + GC;
index build is untimed — it is the once-per-corpus-version cost and
scales with the lake by design, reported separately single-shot):
  build  — lake shingles -> signatures -> band keys -> bucketed table
           write (single-shot seconds, expected ~linear in lake)
  cand   — delta bands equi-join the persisted index + distinct pairs
           (expected near-flat: only delta-side rows shuffle; the index
           scan is bucket-pruned columnar reading 2 short columns)
  verify — cand + exact-Jaccard verification, lake grams re-derived for
           CANDIDATE ids only via a broadcast semi-filter on the lake
           scan (the production probe shape: the index does not store
           shingles; text is fetched by id). Expected growth: the lake
           text scan for the id filter (columnar, two columns) — the
           honest scale cost to document.

Run: python tools/exp_minhash_index_scale.py [sf_dir]   (default sf0.1)
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_mllib_twitter_spark.operators import dedup  # noqa: E402
from pyspark_mllib_twitter_spark.plans.pipeline_ops import (  # noqa: E402
    DELTA_ID_OFFSET,
    DELTA_MOD,
    DELTA_PREFIX,
)
from pyspark_mllib_twitter_spark.session import get_spark  # noqa: E402
from pyspark_mllib_twitter_spark.sources import read_table  # noqa: E402
from pyspark_mllib_twitter_spark.sources.bucketing import write_bucketed  # noqa: E402
from pyspark_mllib_twitter_spark.sources.io import spread  # noqa: E402

SCALES = (1, 3, 10, 30)


def build_lake(spark, sf_dir: str, k: int, out: str) -> None:
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    parts = [
        base.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            (
                F.col("text")
                if r == 0
                else F.regexp_replace("text", r"(\S+)", rf"$1~{r}")
            ).alias("text"),
        )
        for r in range(k)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def delta_frames(spark, sf_dir: str):
    """Fixed delta batch: replica-0 docs % DELTA_MOD with the q_ef header."""
    base = spread(read_table(spark, sf_dir, "documents")).select("doc_id", "text")
    delta = base.filter(F.col("doc_id") % DELTA_MOD == 0).select(
        (F.col("doc_id") + DELTA_ID_OFFSET).alias("doc_id"),
        F.concat(F.lit(DELTA_PREFIX), F.col("text")).alias("text"),
    )
    grams = dedup.portable_shingles(delta, "doc_id", "text", 3).cache()
    bands = dedup.portable_band_keys(
        dedup.portable_minhash_signatures(grams, "doc_id", 16), "doc_id", 4, 4
    ).withColumnRenamed("doc_id", "delta_id")
    grams.count()  # materialize the fixed probe side outside all timers
    return grams, bands


def candidates_df(delta_bands, idx):
    return (
        delta_bands.join(idx, "band_key").select("lake_id", "delta_id").distinct()
    )


def verified_df(spark, lake_path, delta_grams, cand):
    lake = spark.read.parquet(lake_path)
    lake_cand_grams = dedup.portable_shingles(
        lake.join(
            F.broadcast(cand.select("lake_id").distinct()),
            lake.doc_id == F.col("lake_id"),
            "left_semi",
        ),
        "doc_id",
        "text",
        3,
    ).select(F.col("doc_id").alias("lake_id"), F.col("grams").alias("g_l"))
    gd = delta_grams.select(
        F.col("doc_id").alias("delta_id"), F.col("grams").alias("g_d")
    )
    jac = F.size(F.array_intersect("g_l", "g_d")) / F.size(
        F.array_union("g_l", "g_d")
    )
    return (
        cand.join(lake_cand_grams, "lake_id")
        .join(gd, "delta_id")
        .select("lake_id", "delta_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def verified_zonemap_df(spark, sorted_lake_path, delta_grams, cand_ids_list, cand):
    """Probe-only verify over a ZONE-SORTED lake (r12 verdict task 6): the
    bounded candidate id list becomes a literal pushed ``In`` filter, so
    the doc_id-sorted layout's footer stats skip every non-overlapping
    row group — vs the unsorted lake where the semi-filtered text fetch
    decodes every group."""
    from pyspark_mllib_twitter_spark.sources import layout

    fetched = layout.fetch_by_ids(spark, sorted_lake_path, "doc_id", cand_ids_list)
    lake_cand_grams = dedup.portable_shingles(fetched, "doc_id", "text", 3).select(
        F.col("doc_id").alias("lake_id"), F.col("grams").alias("g_l")
    )
    gd = delta_grams.select(
        F.col("doc_id").alias("delta_id"), F.col("grams").alias("g_d")
    )
    jac = F.size(F.array_intersect("g_l", "g_d")) / F.size(
        F.array_union("g_l", "g_d")
    )
    return (
        cand.join(lake_cand_grams, "lake_id")
        .join(gd, "delta_id")
        .select("lake_id", "delta_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
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
    spark = get_spark("exp_minhash_index_scale")
    tmp = tempfile.mkdtemp(prefix="mh_index_scale_")
    print(f"# sf_dir={sf_dir} tmp={tmp}")
    delta_grams, delta_bands = delta_frames(spark, sf_dir)
    print(
        "| k | lake_docs | n_cand | n_hits | build(1shot) | cand | verify "
        "| verify_zonemap |"
    )
    print("|---|---|---|---|---|---|---|---|")
    try:
        for k in SCALES:
            lake_path = os.path.join(tmp, f"lake_x{k}")
            build_lake(spark, sf_dir, k, lake_path)
            lake = spark.read.parquet(lake_path)
            n_lake = lake.count()
            table = f"mh_idx_scale_x{k}"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            t0 = time.perf_counter()
            lg = dedup.portable_shingles(lake, "doc_id", "text", 3)
            lb = dedup.portable_band_keys(
                dedup.portable_minhash_signatures(lg, "doc_id", 16), "doc_id", 4, 4
            ).withColumnRenamed("doc_id", "lake_id")
            write_bucketed(lb, table, ["band_key"], 8)
            t_build = time.perf_counter() - t0
            idx = spark.table(table)
            n_cand = candidates_df(delta_bands, idx).count()
            cand = candidates_df(delta_bands, idx)
            n_hits = verified_df(spark, lake_path, delta_grams, cand).count()
            t_cand = timed(lambda: candidates_df(delta_bands, idx), spark)
            t_verify = timed(
                lambda: verified_df(
                    spark, lake_path, delta_grams, candidates_df(delta_bands, idx)
                ),
                spark,
            )
            # Zone-mapped probe-only verify (r12 task 6): lake rewritten
            # doc_id-sorted (a layout decision made at ingest time in
            # production — untimed here, like the index build), candidate
            # ids collected (bounded: n_cand rows) into a pushed In
            # filter. The candidate generation is re-run inside the timer
            # so both verify columns time the same end-to-end probe.
            from pyspark_mllib_twitter_spark.sources import layout as _layout

            sorted_path = os.path.join(tmp, f"lake_sorted_x{k}")
            _layout.write_zone_sorted(
                spark.read.parquet(lake_path), sorted_path, "doc_id",
                n_files=max(8, 8 * k),
            )

            def zonemap_probe():
                c = candidates_df(delta_bands, idx)
                ids = [r["lake_id"] for r in c.select("lake_id").distinct().collect()]
                return verified_zonemap_df(spark, sorted_path, delta_grams, ids, c)

            t_verify_zm = timed(zonemap_probe, spark)
            print(
                f"| {k} | {n_lake} | {n_cand} | {n_hits} | {t_build:.2f}s "
                f"| {t_cand:.2f}s | {t_verify:.2f}s | {t_verify_zm:.2f}s |",
                flush=True,
            )
            shutil.rmtree(sorted_path, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.catalog.clearCache()
            delta_grams.cache().count()  # keep the fixed probe side pinned
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
