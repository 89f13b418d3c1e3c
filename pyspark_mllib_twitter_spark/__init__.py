"""spark-twitter-engine: a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``katerinaalexandra/PySpark-MLLib-Twitter`` (a PySpark
Twitter-analytics job — see SURVEY.md), re-expressed Spark-first:

- DataFrame / Spark SQL for all relational work (Catalyst + Tungsten pick the
  physical strategy; no RDD escapes, no driver-side O(N^2) loops).
- ``pyspark.ml`` Pipelines for feature extraction (Tokenizer, CountVectorizer,
  HashingTF, IDF, Normalizer) and ALS recommendation.
- Structured Streaming for event-time windowed processing.
- LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
  text analysis) designed for 100 TB scale.

Package layout:

- ``session``    — SparkSession factory (AQE, Arrow, UTC, Kryo).
- ``sources``    — schema'd readers/writers for the fixture tables and tweets.
- ``plans``      — relational operator recipes (the SURVEY §2.12 surface) and
                   their DuckDB oracle SQL.
- ``functions``  — scalar/text helper functions (pure ``pyspark.sql.functions``
                   compositions; JVM-side, codegen-friendly).
- ``operators``  — dedup, similarity search, top-k, multimodal operators.
- ``workloads``  — the reference's two end-to-end workloads (W1 similarity,
                   W2 ALS recommendation), rebuilt idiomatically.
- ``streaming``  — Structured Streaming recipes over the ``events`` table.
"""

__version__ = "0.1.0"
