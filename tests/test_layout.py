"""Zone-sorted lake layout (sources/layout): footer-stat selectivity,
pushed In filter, and fetch correctness — the q_ef probe-session remedy
(round-12 verdict task 6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pyspark_mllib_twitter_spark.sources import layout, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "docs_sorted")
    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    layout.write_zone_sorted(docs, path, "doc_id", n_files=8)
    return path


def test_zone_sorted_footer_spans_are_disjoint(sorted_lake):
    """Every file's row groups carry a narrow [min, max] doc_id span and
    file spans are pairwise disjoint — the property that makes footer
    stats selective. A bounded id probe must overlap only a small
    fraction of the row groups."""
    import pyarrow.parquet as pq

    spans = []
    for name in os.listdir(sorted_lake):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(sorted_lake, name)).metadata
        for g in range(meta.num_row_groups):
            col = next(
                meta.row_group(g).column(c)
                for c in range(meta.row_group(g).num_columns)
                if meta.row_group(g).column(c).path_in_schema == "doc_id"
            )
            spans.append((col.statistics.min, col.statistics.max))
    assert len(spans) >= 8
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "row-group spans overlap — layout not zone-sorted"
    # a 5-id probe overlaps at most 5 row groups
    probe = [1, 2, 3, 250, 499]
    touched = [s for s in spans if any(s[0] <= i <= s[1] for i in probe)]
    assert len(touched) <= len(probe) < len(spans)


def test_fetch_pushes_in_filter_and_returns_exact_rows(spark, sorted_lake):
    probe = [3, 7, 123, 400]
    df = layout.fetch_by_ids(spark, sorted_lake, "doc_id", probe)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(doc_id" in plan, plan[:800]
    got = sorted(r["doc_id"] for r in df.collect())
    want = sorted(
        r["doc_id"]
        for r in read_table(spark, SF, "documents")
        .filter(F.col("doc_id").isin(probe))
        .collect()
    )
    assert got == want


def test_fetch_guards_unbounded_id_sets(spark, sorted_lake):
    with pytest.raises(ValueError, match="join, not filter"):
        layout.fetch_by_ids(
            spark, sorted_lake, "doc_id", range(200), max_ids=100
        )


def test_fetch_prunes_row_groups_at_realistic_candidate_size(
    spark, tmp_path_factory
):
    """r13 advice: the 4-id pushdown assertion said nothing about the
    regime real candidate sets live in — above the parquet
    ``inFilterThreshold`` (10) Spark silently degrades the pushed ``In``
    to the [min, max] RANGE, which prunes nothing once ids scatter.
    This test probes 400 ids in TWO DISTANT clusters of a 100k-row
    zone-sorted lake: a range fallback would cover ~90% of the row
    groups; exact-In pushdown must leave the scan's output rows at the
    few row groups the clusters overlap."""
    path = str(tmp_path_factory.mktemp("lake") / "wide_sorted")
    df = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.sha1(F.col("id").cast("string")).alias("text")
    )
    layout.write_zone_sorted(df, path, "doc_id", n_files=32)
    # two distant, non-contiguous clusters (step 3 inside each)
    probe = [i * 3 for i in range(200)] + [90_000 + i * 3 for i in range(200)]
    fetched = layout.fetch_by_ids(spark, path, "doc_id", probe)
    got = sorted(r["doc_id"] for r in fetched.collect())
    assert got == sorted(probe)
    # scan-node output rows = rows surviving ROW-GROUP pruning (vectorized
    # reader; no record-level filter), BEFORE the post-scan Filter. Walk
    # to the leaf of the executed plan (scan has no children).
    node = fetched._jdf.queryExecution().executedPlan()
    while node.children().length() > 0:
        node = node.children().apply(0)
    scan_rows = node.metrics().apply("numOutputRows").value()
    total = 100_000
    # each 600-wide cluster overlaps a bounded number of row groups; a
    # range fallback (span 0..90_597) would scan ~90% of the lake.
    assert scan_rows < total * 0.2, (
        f"scan produced {scan_rows} of {total} rows — In pushdown "
        "degraded to a range (row groups not pruned)"
    )
