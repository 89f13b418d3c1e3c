"""Golden tests for the reference's two workloads (SURVEY §5, FIXTURES.md §B).

The committed tweets fixture (tools/make_tweets_fixture.py, seeded) plus the
committed goldens (tools/make_goldens.py) pin the full M1-M7 surface:
document build fidelity (comma-carrying tokens), HashingTF/IDF/
CountVectorizer/Normalizer vectorization, cosine top-5 with the reference's
score-DESC/id-DESC tie-break (nb:220-230), and ALS(seed=0, reference
hyperparameters) recommendation with dictionary join-back.
"""

from __future__ import annotations

import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
QUERY_USER = 20000001


@pytest.fixture(scope="module")
def tweets(spark):
    from pyspark_mllib_twitter_spark.sources.io import read_tweets_jsonl

    return read_tweets_jsonl(spark, os.path.join(FIXTURES, "tweets.jsonl")).cache()


def _load(name):
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def test_w1_golden_top5(tweets):
    """W1 end-to-end: exact top-5 ids and 6dp scores under both vectorizers."""
    from pyspark_mllib_twitter_spark.workloads.w1_similarity import (
        build_user_documents,
        user_similarity_top_k,
    )

    golden = _load("w1_top5.json")
    docs = build_user_documents(tweets, fidelity=True)
    rows = user_similarity_top_k(docs, [QUERY_USER], k=5).collect()
    got = {"tfidf": [], "cv": []}
    for r in rows:  # already ordered by (query_id, vectorizer, rn)
        got[r.vectorizer].append([r.neighbor_id, round(r.sim, 6)])
    assert got["tfidf"] == golden["tfidf"]
    assert got["cv"] == golden["cv"]


def test_w1_tie_break_is_desc_id(tweets):
    """The golden CV list contains at least one exact score tie, and within
    every tied score run the neighbor ids are strictly descending — the
    tie-break the notebook's golden output pins (nb:220-230)."""
    golden = _load("w1_top5.json")
    scores = [s for _, s in golden["cv"]]
    assert len(scores) != len(set(scores)), "fixture lost its tie — regenerate"
    for (id1, s1), (id2, s2) in zip(golden["cv"], golden["cv"][1:]):
        assert s1 > s2 or (s1 == s2 and id1 > id2)


def test_w1_fidelity_tokens_carry_commas(tweets):
    """The reference joins with ', ' then re-tokenizes (COMP5349_2.py:146,
    151-152): all tokens but the last end with ','. Also: the null-author
    document exists in fidelity mode (no user_id filter in W1)."""
    from pyspark_mllib_twitter_spark.workloads.w1_similarity import build_user_documents

    docs = build_user_documents(tweets, fidelity=True)
    row = docs.filter(docs.user_id == QUERY_USER).first()
    assert row is not None and len(row.tokens) >= 10
    assert all(t.endswith(",") for t in row.tokens[:-1])
    assert not row.tokens[-1].endswith(",")
    assert docs.filter(docs.user_id.isNull()).count() == 1

    clean = build_user_documents(tweets, fidelity=False)
    crow = clean.filter(clean.user_id == QUERY_USER).first()
    assert all(not t.endswith(",") for t in crow.tokens)
    assert clean.filter(clean.user_id.isNull()).count() == 0


def test_w2_golden_recs(tweets):
    """W2 end-to-end: exact per-user top-5 item ids + 6dp ratings from
    ALS(seed=0, rank=10, maxIter=5, regParam=0.1, implicit, alpha=1.0,
    num_blocks pinned)."""
    from pyspark_mllib_twitter_spark.workloads.w2_recommend import (
        build_mention_pairs,
        implicit_als_recommend,
    )

    golden = _load("w2_recs.json")
    pairs = build_mention_pairs(tweets)
    recs = implicit_als_recommend(pairs, k=5, num_blocks=8).collect()
    got: dict[str, list] = {}
    for r in sorted(recs, key=lambda r: (r.user_id, r.rec_rank)):
        got.setdefault(str(r.user_id), []).append(
            [r.rec_item_id, round(float(r.rating), 6)]
        )
    assert set(got) == set(golden)
    mismatches = {u: (got[u], golden[u]) for u in golden if got[u] != golden[u]}
    assert not mismatches, f"{len(mismatches)} users differ, e.g. {next(iter(mismatches.items()))}"


def test_w2_no_null_users(tweets):
    """W2 keeps the reference's P2 filter: null authors contribute no pairs."""
    from pyspark_mllib_twitter_spark.workloads.w2_recommend import build_mention_pairs

    pairs = build_mention_pairs(tweets)
    assert pairs.filter(pairs.user_id.isNull()).count() == 0


def test_multiline_json_reader_matches_jsonl(spark, tweets):
    """Fidelity reader (multiline JSON array, the reference's input shape —
    COMP5349_2.py:138) parses to exactly the same rows as the JSONL reader."""
    from pyspark_mllib_twitter_spark.sources.io import read_tweets_json_array

    ml = read_tweets_json_array(spark, os.path.join(FIXTURES, "tweets.json"))
    a = sorted((tuple(str(x) for x in r) for r in tweets.collect()))
    b = sorted((tuple(str(x) for x in r) for r in ml.collect()))
    assert a == b


def test_quality_classifier_learns_gate(spark, sf_oracle):
    """The MLlib classification Pipeline must recover the heuristic quality
    gate from numeric features: accuracy >= 0.9 and AUC >= 0.95 on the
    deterministic fixture labels (measured 0.994 / 1.000 — margin for
    L-BFGS tolerance drift)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.sql import functions as F

    from pyspark_mllib_twitter_spark.sources import read_table
    from pyspark_mllib_twitter_spark.workloads.w3_quality_model import (
        fit_quality_classifier,
        quality_features,
    )

    docs = read_table(spark, sf_oracle, "documents")
    feats = quality_features(docs).cache()
    scored = fit_quality_classifier(feats).transform(feats)
    acc = scored.select(
        F.avg((F.col("label") == F.col("prediction")).cast("double")).alias("a")
    ).first().a
    auc = BinaryClassificationEvaluator(labelCol="label").evaluate(scored)
    assert acc >= 0.9, f"accuracy {acc:.3f} < 0.9"
    assert auc >= 0.95, f"AUC {auc:.3f} < 0.95"


def test_word2vec_neighbors_deterministic_and_geometric(spark, sf_oracle):
    """M8 Word2Vec surface: the seeded single-partition fit is bit-stable
    (two fits -> identical nearest-term tables), cosines lie in [-1, 1],
    neighbors never echo their query term, and every frequent query term
    gets exactly k neighbors."""
    from pyspark_mllib_twitter_spark.sources import read_table
    from pyspark_mllib_twitter_spark.workloads.w4_word2vec import (
        nearest_terms,
        top_frequent_terms,
        word_embeddings,
    )

    docs = read_table(spark, sf_oracle, "documents")
    terms = top_frequent_terms(docs)
    assert len(terms) == 5
    a = nearest_terms(word_embeddings(docs), terms, k=3).orderBy("term", "rank").collect()
    b = nearest_terms(word_embeddings(docs), terms, k=3).orderBy("term", "rank").collect()
    assert a == b, "seeded Word2Vec fit is not deterministic"
    by_term: dict[str, list] = {}
    for r in a:
        assert -1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9
        assert r["neighbor"] != r["term"]
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(terms)
    for rows in by_term.values():
        assert [r["rank"] for r in rows] == [1, 2, 3]
        # ranks ordered by descending cosine
        assert rows[0]["cos"] >= rows[1]["cos"] >= rows[2]["cos"]


def test_word2vec_distributed_fit_overlaps_pinned(spark, sf_oracle):
    """The documented 100 TB knob (num_partitions > 1) is exercised, not just
    documented: a 4-partition fit trains per-partition models and averages
    them (MLlib's distributed Word2Vec), so exact vectors differ from the
    pinned single-partition fit (per-partition models are averaged each
    iteration and executor scheduling wiggles the result — the standard
    distributed-Word2Vec tradeoff). Robust properties that must hold:

    - the VOCABULARY is identical (it derives from token counts, which are
      partitioning-independent), with the declared vector size;
    - the full nearest-terms pipeline runs on the distributed fit: k valid
      neighbors per query term, cosines in [-1, 1], no self-neighbors;
    - the two geometries agree above chance: pooled over terms, at least one
      shared top-k neighbor (chance for k=5 in a vocab of hundreds is <2%
      per term; measured pooled overlap is 3-9 of 25 across runs — a mean-
      overlap threshold would flake on this near-random fixture corpus)."""
    from pyspark_mllib_twitter_spark.sources import read_table
    from pyspark_mllib_twitter_spark.workloads.w4_word2vec import (
        nearest_terms,
        top_frequent_terms,
        word_embeddings,
    )

    docs = read_table(spark, sf_oracle, "documents")
    terms = top_frequent_terms(docs)
    k = 5
    # max_iter=2 exercises the multi-iteration fit path (per-partition
    # models re-averaged each round) alongside the partition knob.
    pinned = word_embeddings(docs, num_partitions=1, max_iter=2)
    dist = word_embeddings(docs, num_partitions=4, max_iter=2)

    vocab_a = {(r.word, len(r.vec)) for r in pinned.collect()}
    vocab_b = {(r.word, len(r.vec)) for r in dist.collect()}
    assert vocab_a == vocab_b and len(vocab_a) > 0
    assert all(n == 32 for _, n in vocab_b)

    n_b = nearest_terms(dist, terms, k=k).collect()
    by_term: dict[str, set] = {}
    for r in n_b:
        assert -1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9
        assert r["neighbor"] != r["term"]
        by_term.setdefault(r["term"], set()).add(r["neighbor"])
    assert set(by_term) == set(terms)
    assert all(len(v) == k for v in by_term.values())

    a = {}
    for r in nearest_terms(pinned, terms, k=k).collect():
        a.setdefault(r["term"], set()).add(r["neighbor"])
    pooled_overlap = sum(len(a[t] & by_term[t]) for t in terms)
    assert pooled_overlap >= 1, "distributed and pinned geometries are unrelated"


# ---------------------------------------------------------------------------
# W5 clustering + W3 model selection
# ---------------------------------------------------------------------------

def test_kmeans_covers_rows_and_beats_random_baseline(spark, sf_smoke):
    from pyspark.sql import functions as F

    from pyspark_mllib_twitter_spark.sources import read_table
    from pyspark_mllib_twitter_spark.workloads.w5_clustering import (
        cluster_embeddings,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    n = emb.count()
    assigned = cluster_embeddings(emb).cache()
    try:
        assert assigned.count() == n  # every row assigned exactly once
        assert assigned.select("cluster").distinct().count() <= 8
        mean_dist = assigned.agg(F.avg("dist")).first()[0]
        # Compactness: the fitted assignment must beat assigning every row
        # to the single GLOBAL centroid (the k=1 degenerate baseline any
        # clustering must improve on; MLlib refuses k=1, so compute it
        # directly with the same normalize+distance recipe).
        from pyspark_mllib_twitter_spark.functions import vectors

        arr = emb.select(vectors.l2_normalize("embedding").alias("a"))
        dim = len(arr.first()["a"])
        g = arr.select(
            *[F.avg(F.col("a")[i]).alias(f"c{i}") for i in range(dim)]
        ).first()
        centroid = F.array(*[F.lit(float(g[i])) for i in range(dim)])
        base = arr.select(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "a", centroid, lambda x, c: (x - c) * (x - c)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("d")
        ).agg(F.avg("d")).first()[0]
        assert mean_dist < base
    finally:
        assigned.unpersist()


def test_kmeans_profile_deterministic(spark, sf_smoke):
    from pyspark_mllib_twitter_spark.plans import REGISTRY

    a = [tuple(r) for r in REGISTRY["q_ml_kmeans"].spark(spark, sf_smoke).collect()]
    b = [tuple(r) for r in REGISTRY["q_ml_kmeans"].spark(spark, sf_smoke).collect()]
    assert a == b


def test_tuning_picks_weak_regularization(spark, sf_smoke):
    from pyspark_mllib_twitter_spark.plans import REGISTRY

    rows = {
        r["reg_param"]: r
        for r in REGISTRY["q_ml_tuning"].spark(spark, sf_smoke).collect()
    }
    assert set(rows) == {0.01, 5.0}
    # The weakly-regularized fit must win the validation AUC and clear the
    # W3 quality bar; the crushed model is the sanity control.
    assert rows[0.01]["chosen"] == 1 and rows[5.0]["chosen"] == 0
    assert rows[0.01]["auc"] >= 0.9
    assert rows[0.01]["auc"] >= rows[5.0]["auc"]


def test_fpgrowth_supports_exact_and_singles_complete(spark, sf_smoke):
    """Every itemset FPGrowth returns has its support verified by exact
    recomputation, and the single-item level is exhaustive."""
    import collections

    from pyspark.sql import functions as F

    from pyspark_mllib_twitter_spark.plans import REGISTRY
    from pyspark_mllib_twitter_spark.plans.workloads import MIN_SUPPORT

    got = REGISTRY["q_ml_fpgrowth"].spark(spark, sf_smoke).collect()
    assert got
    baskets = [
        frozenset(r.items)
        for r in spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        .selectExpr("l_orderkey", "CAST(l_suppkey AS STRING) AS item")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("item").alias("items"))
        .collect()
    ]
    n = len(baskets)
    floor = n * MIN_SUPPORT
    for r in got:
        items = frozenset(r.itemset.split(","))
        support = sum(1 for b in baskets if items <= b)
        assert support == r.freq, r.itemset
        assert r.freq >= floor
    # completeness at the single-item level
    single_counts = collections.Counter(it for b in baskets for it in b)
    expect_singles = {i for i, c in single_counts.items() if c >= floor}
    got_singles = {r.itemset for r in got if r.n_items == 1}
    assert got_singles == expect_singles
    # mining reached beyond singles
    assert any(r.n_items >= 2 for r in got)
