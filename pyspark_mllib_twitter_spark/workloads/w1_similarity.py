"""Workload 1 — content-based user similarity (reference parity, Spark-first).

Reference semantics (``/root/reference/COMP5349_2.py:140-188``):

1. Keep tweets that are a reply OR a retweet (P1, :146).
2. Per user, build a "document" of interacted tweet IDs — ``concat_ws('-',
   replyto_id, retweet_id)`` picks the non-null one (F1), then groupBy +
   collect_list (A1).
3. Vectorize two ways: TF-IDF (HashingTF(200) + IDF) and
   CountVectorizer(200); L2-normalize both (M1-M5, :151-178).
4. Top-5 most similar users to a query user by cosine = dot of normalized
   vectors, ties broken by HIGHER user id (golden output nb:220-230).

The reference does step 4 by collecting every user's vectors into a
driver-side dict, broadcasting it, and looping in Python (:181-188) — O(N)
driver memory. Here it is a broadcast hash join of the (tiny) query-user
vectors against the distributed corpus, with JVM-side dot products and a
window top-k: no driver collect, no Python in the hot path, scales with the
corpus partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors
from ..operators.topk import top_k_per_group


def build_user_documents(tweets: DataFrame, fidelity: bool = True) -> DataFrame:
    """P1 + F1 + A1 (COMP5349_2.py:146): per-user interaction-ID documents.

    Returns ``(user_id, tokens array<string>)``.

    ``fidelity=True`` (default) reproduces the reference's exact token
    semantics (COMP5349_2.py:146,151-152): the collected IDs are joined with
    ``', '`` into one document string and re-tokenized by whitespace
    (Tokenizer semantics: lowercase + ``\\s+`` split), so **every token but
    the last carries a trailing comma** (``'123,'``), which changes the
    CountVectorizer vocabulary and cosine scores vs bare tokens. Two
    deliberate deviations, both required for determinism and pinned by the
    golden tests: the collected list is sorted (``sort_array``) before the
    join — the reference relies on nondeterministic ``collect_list`` order,
    which decides *which* ID ends up comma-less — and that is the only
    difference. The reference also does NOT filter null ``user_id`` in W1
    (only W2 does), so the null-author group forms a document that
    participates in the vocabulary and can appear as a neighbor; we keep it.

    ``fidelity=False`` keeps bare sorted tokens and drops the null-user row
    — the sane-semantics mode for new pipelines.
    """
    filtered = tweets.filter("replyto_id IS NOT NULL OR retweet_id IS NOT NULL")
    if not fidelity:
        filtered = filtered.filter(F.col("user_id").isNotNull())
    interactions = filtered.select(
        "user_id",
        # F1 hazard kept verbatim: concat_ws('-') would join BOTH ids with
        # '-' if both were non-null, exactly as the reference would.
        F.concat_ws(
            "-",
            F.col("replyto_id").cast("string"),
            F.col("retweet_id").cast("string"),
        ).alias("interaction"),
    )
    grouped = interactions.groupBy("user_id").agg(
        F.sort_array(F.collect_list("interaction")).alias("sorted_ids")
    )
    if not fidelity:
        return grouped.select("user_id", F.col("sorted_ids").alias("tokens"))
    # The reference's join → Tokenizer round-trip: 'a, b, c' → ['a,','b,','c']
    doc = F.concat_ws(", ", "sorted_ids")
    return grouped.select(
        "user_id",
        F.filter(F.split(F.lower(doc), r"\s+"), lambda t: t != "").alias("tokens"),
    )


def vectorize_documents(
    docs: DataFrame,
    tokens_col: str = "tokens",
    num_features: int = 200,
    vocab_size: int = 200,
    min_df: float = 1.0,
) -> DataFrame:
    """M1-M5 as one ``pyspark.ml.Pipeline``: TF-IDF (HashingTF + IDF) and
    CountVectorizer branches, both L2-normalized, with reference
    hyperparameters (COMP5349_2.py:151-178: numFeatures=200, vocabSize=200,
    minDF=1, Normalizer p=2).

    Output adds ``tfidf array<double>`` and ``cv array<double>`` (unit
    vectors — dot product == cosine). Arrays, not VectorUDT, so downstream
    similarity is pure SQL (SURVEY §7: VectorUDT is not SQL-native).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import CountVectorizer, HashingTF, IDF, Normalizer
    from pyspark.ml.functions import vector_to_array

    pipeline = Pipeline(
        stages=[
            HashingTF(inputCol=tokens_col, outputCol="raw_tf", numFeatures=num_features),
            IDF(inputCol="raw_tf", outputCol="tfidf_vec"),
            CountVectorizer(
                inputCol=tokens_col, outputCol="cv_vec", vocabSize=vocab_size, minDF=min_df
            ),
            Normalizer(inputCol="tfidf_vec", outputCol="tfidf_norm", p=2.0),
            Normalizer(inputCol="cv_vec", outputCol="cv_norm", p=2.0),
        ]
    )
    model = pipeline.fit(docs)
    return model.transform(docs).select(
        *docs.columns,
        vector_to_array("tfidf_norm").cast("array<double>").alias("tfidf"),
        vector_to_array("cv_norm").cast("array<double>").alias("cv"),
    )


def user_similarity_top_k(
    docs: DataFrame,
    query_user_ids: "list[int] | DataFrame",
    k: int = 5,
    id_col: str = "user_id",
    tokens_col: str = "tokens",
    num_features: int = 200,
    vocab_size: int = 200,
) -> DataFrame:
    """End-to-end W1: top-``k`` most similar users to each query user, under
    BOTH vectorizations, reference tie-break (sim DESC, user id DESC —
    pinned by nb:220-230).

    Output: ``(query_id, vectorizer, neighbor_id, sim, rn)`` where
    ``vectorizer`` in {'tfidf', 'cv'}.
    """
    vec = vectorize_documents(docs, tokens_col, num_features, vocab_size).cache()

    spark = docs.sparkSession
    if isinstance(query_user_ids, DataFrame):
        # Fully-planned query set (single column) — no driver round trip;
        # the broadcast hint below keeps the join driver-collect-free too.
        q_ids = query_user_ids.select(
            F.col(query_user_ids.columns[0]).cast("bigint").alias("query_id")
        )
    else:
        q_ids = spark.createDataFrame(
            [(int(u),) for u in query_user_ids], "query_id bigint"
        )
    results = []
    for vectorizer in ("tfidf", "cv"):
        q = vec.join(
            F.broadcast(q_ids), vec[id_col] == q_ids.query_id, "inner"
        ).select("query_id", F.col(vectorizer).alias("q_vec"))
        corpus = vec.select(
            F.col(id_col).alias("neighbor_id"), F.col(vectorizer).alias("c_vec")
        )
        # J1 re-expressed: corpus x broadcast(queries), theta id != id
        pairs = corpus.crossJoin(F.broadcast(q)).filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = pairs.select(
            "query_id",
            F.lit(vectorizer).alias("vectorizer"),
            "neighbor_id",
            # unit vectors: dot == cosine (COMP5349_2.py:170-173)
            vectors.dot(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        results.append(
            top_k_per_group(
                scored,
                ["query_id", "vectorizer"],
                [F.col("sim").desc(), F.col("neighbor_id").desc()],
                k,
            )
        )
    out = results[0].unionAll(results[1])
    return out.select("query_id", "vectorizer", "neighbor_id", "sim", "rn").orderBy(
        "query_id", "vectorizer", "rn"
    )
