"""Workload 2 — collaborative-filtering mention recommendation (ALS).

Reference semantics (``/root/reference/COMP5349_2.py:191-211``): explode
``user_mentions``, drop null users, count (user, mention) pairs as implicit
ratings, fit ALS(rank=10, seed=0, maxIter=5, regParam=0.1,
implicitPrefs=True, alpha=1.0), emit top-5 recommended mention targets per
user, mapped back to original IDs.

Two deliberate fixes over the reference (SURVEY §7):

- **ID dictionary instead of f.hash**: the reference squeezes 64-bit IDs
  through 32-bit murmur (COMP5349_2.py:197) — birthday-bound collisions from
  ~77k users silently merge people. We build a dense-rank dictionary:
  collision-free, and the int IDs ALS needs stay int.
- **Join-based back-mapping instead of broadcast linear scans**: the
  reference's U4-U7 UDFs scan a collected Python list per lookup
  (COMP5349_2.py:79-116) and swallow all exceptions. We explode the
  recommendations and inner-join the (broadcastable) dictionary back,
  preserving rank order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def build_mention_pairs(tweets: DataFrame) -> DataFrame:
    """F5 + P2 + A2 (COMP5349_2.py:196-197): (user_id, mention_id, y) implicit
    ratings, y = mention count."""
    return (
        tweets.select("user_id", F.explode("user_mentions").alias("mention"))
        .filter("user_id IS NOT NULL")
        .select("user_id", F.col("mention")["id"].alias("mention_id"))
        .groupBy("user_id", "mention_id")
        .agg(F.count("*").alias("y"))
    )


def dense_id_dictionary(
    df: DataFrame, id_col: str, out_col: str = "dense_id"
) -> DataFrame:
    """Collision-free long→int dictionary: ids 1..N in ascending-id order
    (identical contract to ``DENSE_RANK() OVER (ORDER BY id)``), built
    WITHOUT a global window.

    Replaces F3 ``f.hash`` (COMP5349_2.py:197) — 32-bit murmur over 64-bit
    Twitter IDs silently merges users from ~77k ids (birthday bound). A
    naive dense_rank fix would funnel every distinct id through ONE
    partition (no-partition window = single-partition sort) — the W2
    scale-killer at ~10^8+ ids. Distributed recipe instead:

    1. distinct ids, range-repartitioned by id → globally ordered across
       partitions, sorted within each (one shuffle);
    2. per-partition counts → driver (numPartitions rows, bounded) →
       cumulative offsets, broadcast back;
    3. dense id = partition offset + row_number within the partition —
       the window is partitioned by ``spark_partition_id()``, so every
       partition ranks locally in parallel.
    """
    ids = df.select(id_col).where(F.col(id_col).isNotNull()).distinct()
    parts = ids.repartitionByRange(F.col(id_col)).sortWithinPartitions(id_col)
    with_pid = parts.withColumn("_pid", F.spark_partition_id())

    counts = sorted(
        (tuple(r) for r in with_pid.groupBy("_pid").count().collect())
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    offsets_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )

    local_rank = F.row_number().over(W.partitionBy("_pid").orderBy(id_col))
    return (
        with_pid.join(F.broadcast(offsets_df), "_pid")
        .select(
            id_col,
            (F.col("_offset") + local_rank).cast("int").alias(out_col),
        )
    )


def implicit_als_recommend(
    pairs: DataFrame,
    user_col: str = "user_id",
    item_col: str = "mention_id",
    rating_col: str = "y",
    k: int = 5,
    rank: int = 10,
    seed: int = 0,
    max_iter: int = 5,
    reg_param: float = 0.1,
    alpha: float = 1.0,
    user_subset: DataFrame | None = None,
    num_blocks: int | None = None,
) -> DataFrame:
    """Fit implicit-feedback ALS with the reference's hyperparameters
    (COMP5349_2.py:204) and return top-``k`` recommendations per user mapped
    back to original IDs.

    Output: ``(user_id, rec_rank int 1..k, rec_item_id, rating float)``,
    rank order preserved from ALS.

    ``num_blocks`` pins ALS's internal user/item block count; the default
    (None) lets ALS derive it from parallelism, but golden tests set it
    explicitly because factor initialization is seeded per block — a fixed
    seed is only reproducible across machines with a fixed block count.
    """
    from pyspark.ml.recommendation import ALS

    user_dict = dense_id_dictionary(pairs, user_col, "u").cache()
    item_dict = dense_id_dictionary(pairs, item_col, "i").cache()

    encoded = (
        pairs.join(F.broadcast(user_dict), user_col)
        .join(F.broadcast(item_dict), item_col)
        .select("u", "i", F.col(rating_col).cast("float").alias("y"))
        .cache()  # ALS reads its input many times (O4: load-bearing cache)
    )

    als = ALS(
        rank=rank,
        seed=seed,
        maxIter=max_iter,
        regParam=reg_param,
        implicitPrefs=True,
        alpha=alpha,
        userCol="u",
        itemCol="i",
        ratingCol="y",
        coldStartStrategy="drop",
    )
    if num_blocks is not None:
        als = als.setNumUserBlocks(num_blocks).setNumItemBlocks(num_blocks)
    model = als.fit(encoded)

    if user_subset is not None:
        subset_enc = user_subset.join(
            F.broadcast(user_dict), user_subset[user_col] == user_dict[user_col]
        ).select("u").distinct()
        recs = model.recommendForUserSubset(subset_enc, k)
    else:
        recs = model.recommendForAllUsers(k)

    # U4-U7 replaced: posexplode keeps ALS's rank order; dictionary joins
    # (broadcast) map dense ids back to originals — no silent empty tuples.
    exploded = recs.select(
        "u", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        "u",
        (F.col("pos") + 1).alias("rec_rank"),
        F.col("rec.i").alias("i"),
        F.col("rec.rating").alias("rating"),
    )
    return (
        exploded.join(F.broadcast(user_dict), "u")
        .join(F.broadcast(item_dict.withColumnRenamed(item_col, "rec_item_id")), "i")
        .select(user_col, "rec_rank", "rec_item_id", "rating")
    )
