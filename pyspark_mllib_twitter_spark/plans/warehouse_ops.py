"""Warehouse / BI operators (round 8, batch 2): exact distributed
percentiles, calendar gap-fill with LOCF, and ratio-to-parent rollup
shares.

Design rules carried from the rest of the engine:

- **Cross-engine float discipline.** Ranks, counts, cents and epoch
  hours stay exact integers; each output float is one shared-text
  closing expression.
- **Percentiles without a global sort.** The exact-percentile recipe is
  the repo's distributed-rank pattern (q_yj/q_yv): collapse to
  (group, value, count) cells, cumulate per group over the value order,
  select by integer target rank — the corpus is never totally ordered.
- **Calendar-bounded windows.** Gap-fill and shares run on per-group
  daily/hourly aggregates whose size is bounded by the calendar, not by
  the corpus.

Reference scope: the reference (COMP5349_2.py:1-211) has none of this
surface; north-star warehouse-analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import query

# ---------------------------------------------------------------------------
# Exact per-group percentiles (p50 / p95 / p99)
# ---------------------------------------------------------------------------

#: Integer target rank for quantile a/b over n rows: ceil(a*n/b) with
#: INTEGER division only. NOT shared text — `/` is float division on
#: both engines but DuckDB's BIGINT cast rounds-to-nearest while
#: Spark's truncates (the q_al SAX lesson), so each engine gets its own
#: exact integer-division operator (DIV vs //); integer ops need no
#: shared text to agree.
def _rank_spark(a: int, b: int) -> str:
    return f"CAST(({a} * n + {b} - 1) DIV {b} AS BIGINT)"


def _rank_duck(a: int, b: int) -> str:
    return f"CAST(({a} * n + {b} - 1) // {b} AS BIGINT)"


_PCTL_PICKS = {"p50": (1, 2), "p95": (19, 20), "p99": (99, 100)}


@query(
    "q_b8_percentiles",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, cents,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS c,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM cells)
    SELECT event_type, CAST(min(n) AS BIGINT) AS n,
           round(CAST(min(CASE WHEN c >= {_rank_duck(1, 2)} THEN cents END)
                      AS DOUBLE) / 100.0, 6) AS p50,
           round(CAST(min(CASE WHEN c >= {_rank_duck(19, 20)} THEN cents END)
                      AS DOUBLE) / 100.0, 6) AS p95,
           round(CAST(min(CASE WHEN c >= {_rank_duck(99, 100)} THEN cents END)
                      AS DOUBLE) / 100.0, 6) AS p99
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
)
def q_b8_percentiles(spark, sf_dir):
    """EXACT per-group percentiles (p50/p95/p99 of event value) by the
    distributed-rank recipe: collapse to (group, value, count) cells
    (one combinable shuffle — the corpus is never globally sorted),
    cumulate counts over the value order within each group, then pick
    the smallest value whose cumulative count reaches the integer target
    rank ceil(q*n) — computed without ANY float ((a*n + b - 1) / b in
    BIGINTs, so no 0.95*n boundary ambiguity). The SLA/latency
    dashboard staple, exact where approx_percentile is not, and the
    deterministic twin the mergeable-bins entry (q_yo) trades against.

    Scale shape: the window runs over DISTINCT VALUES per group (cells,
    not rows); at 1e9 rows with bounded-cardinality metrics that is
    thousands of cells per group. For truly continuous metrics the
    documented swap is pre-bucketing to fixed precision (cents already
    is one).
    """
    cells = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "cents",
        F.sum("cnt").over(w).alias("c"),
        F.sum("cnt").over(wn).alias("n"),
    )
    picks = [F.min("n").cast("bigint").alias("n")]
    for name, (a, b) in _PCTL_PICKS.items():
        picks.append(
            F.expr(
                f"round(CAST(min(CASE WHEN c >= {_rank_spark(a, b)} THEN cents END)"
                " AS DOUBLE) / 100.0, 6)"
            ).alias(name)
        )
    return cum.groupBy("event_type").agg(*picks).orderBy("event_type")


# ---------------------------------------------------------------------------
# Calendar gap-fill with LOCF
# ---------------------------------------------------------------------------


@query(
    "q_b9_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                       date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hr,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hourly),
    spine AS (
      SELECT DISTINCT h.event_type, g.hr
      FROM (SELECT DISTINCT event_type FROM hourly) h,
           (SELECT unnest(generate_series(lo, hi)) AS hr FROM bounds) g),
    joined AS (
      SELECT s.event_type, s.hr, o.cents,
             CASE WHEN o.cents IS NULL THEN 1 ELSE 0 END AS filled
      FROM spine s LEFT JOIN hourly o
        ON o.event_type = s.event_type AND o.hr = s.hr),
    locf AS (
      SELECT event_type, hr, filled,
             last_value(cents IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cents
      FROM joined)
    SELECT event_type, CAST(hr AS BIGINT) AS hr,
           CAST(filled AS BIGINT) AS filled,
           round(CAST(cents AS DOUBLE) / 100.0, 6) AS value_locf
    FROM locf WHERE cents IS NOT NULL
    ORDER BY event_type, hr
    """,
)
def q_b9_gapfill(spark, sf_dir):
    """Calendar GAP-FILL with last-observation-carried-forward: the
    hourly per-type series is joined against a dense generated hour
    spine (min..max), missing cells are flagged and LOCF-filled with one
    running ``last(..., ignoreNulls)`` window — the
    resample-to-regular-grid operator every downstream window/forecast
    op assumes (q_y7's time-weighted average is the interval-weighted
    cousin; this materializes the grid). Leading cells before a series'
    first observation stay undefined and are excluded on both engines.

    Scale shape: the corpus collapses to hourly cells first; the spine
    is generated (sequence explode), calendar-bounded, and joined
    per-group; the LOCF window is one running frame over
    hours-per-group. Everything after the first aggregate is
    grid-sized, not corpus-sized.
    """
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (
            F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp")))
            / F.lit(3_600_000_000)
        )
        .cast("bigint")
        .alias("hr"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    types = hourly.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hr"),
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        "cents",
        F.when(F.col("cents").isNull(), 1).otherwise(0).alias("filled"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    locf = joined.select(
        "event_type",
        "hr",
        "filled",
        F.last("cents", ignorenulls=True).over(w).alias("cents"),
    )
    return (
        locf.filter(F.col("cents").isNotNull())
        .select(
            "event_type",
            F.col("hr").cast("bigint"),
            F.col("filled").cast("bigint"),
            F.round(F.col("cents").cast("double") / 100.0, 6).alias("value_locf"),
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# Ratio-to-parent rollup shares
# ---------------------------------------------------------------------------


@query(
    "q_ba_ratio_to_parent",
    oracle="""
    WITH sales AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT)
                      AS DECIMAL(38,0))) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2),
    lev AS (
      SELECT region, nation, cents,
             SUM(cents) OVER (PARTITION BY region) AS region_cents,
             SUM(cents) OVER () AS global_cents
      FROM sales)
    SELECT region, nation,
           CAST(cents AS BIGINT) AS cents,
           round(CAST(cents AS DOUBLE) / CAST(region_cents AS DOUBLE), 6)
             AS share_of_region,
           round(CAST(region_cents AS DOUBLE) / CAST(global_cents AS DOUBLE), 6)
             AS region_share_of_global
    FROM lev ORDER BY region, nation
    """,
)
def q_ba_ratio_to_parent(spark, sf_dir):
    """RATIO-TO-PARENT rollup (the BI ratio_to_report / share-of-parent
    analytic): nation revenue as a share of its region, and the region
    as a share of global — the two-level drill-down every revenue
    dashboard renders. Cents accumulate as DECIMAL(38,0) (exact,
    order-free); the two shares are shared-text closes over the exact
    sums, so the whole share tree is hash-checked.

    Scale shape: the fact table aggregates ONCE to (region, nation)
    cells (map-side combinable through three broadcast dim joins); the
    parent sums are windows over the 25-row cell table — hierarchy
    depth costs windows over the DIMENSION cardinality, never a second
    fact scan.
    """
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    sales = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .cast("decimal(38,0)")
            ).alias("cents")
        )
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    lev = sales.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(wr).alias("region_cents"),
        F.sum("cents").over(wg).alias("global_cents"),
    )
    return lev.selectExpr(
        "region",
        "nation",
        "CAST(cents AS BIGINT) AS cents",
        "round(CAST(cents AS DOUBLE) / CAST(region_cents AS DOUBLE), 6)"
        " AS share_of_region",
        "round(CAST(region_cents AS DOUBLE) / CAST(global_cents AS DOUBLE), 6)"
        " AS region_share_of_global",
    ).orderBy("region", "nation")


# ---------------------------------------------------------------------------
# Data profiling (per-column stats in one scan)
# ---------------------------------------------------------------------------

#: Columns profiled (all integer/string-typed or quantized so min/max
#: stringify identically on both engines — doubles are profiled via
#: their exact cents form).
_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "q_bg_profile",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
      FROM orders)
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM src
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM src
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM src
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM src
    UNION ALL
    SELECT 'total_cents', CAST(count(*) - count(total_cents) AS BIGINT),
           CAST(count(DISTINCT total_cents) AS BIGINT),
           CAST(min(total_cents) AS VARCHAR), CAST(max(total_cents) AS VARCHAR)
    FROM src
    ORDER BY column_name
    """,
)
def q_bg_profile(spark, sf_dir):
    """DATA PROFILING: per-column null count, exact distinct count, and
    min/max for the orders table — the data-quality summary every
    ingestion pipeline materializes (the Deequ/Great-Expectations
    profile shape, public tools). All five columns profile in ONE scan
    (a single aggregate computes every stat; the long format is a
    constant-size unpivot of that one row); the float column is profiled
    through its exact cents form so min/max stringify identically on
    both engines.

    Scale shape: one map-side-combinable aggregate per scan — at 100 TB
    you pay the scan once for the whole profile, not per column; exact
    distinct is the one shuffle-expensive stat and is the documented
    swap-in point for the portable HLL (q_aw) when approximation is
    acceptable.
    """
    src = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    cols = list(_PROFILE_COLS) + ["total_cents"]
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = src.agg(*aggs)
    stack = ", ".join(
        f"'{c}', CAST(_n - {c}__nn AS BIGINT), CAST({c}__nd AS BIGINT),"
        f" {c}__mn, {c}__mx"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack})"
        " AS (column_name, n_nulls, n_distinct, min_value, max_value)"
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# Incremental view maintenance (algebraic rollup delta-merge)
# ---------------------------------------------------------------------------


@query(
    "q_bh_incremental_agg",
    oracle="""
    WITH final_rows AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey % 4 = 0
         OR (o_orderkey % 4 <> 0 AND o_orderkey % 8 <> 1))
    SELECT priority, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS sum_cents
    FROM final_rows GROUP BY priority ORDER BY priority
    """,
)
def q_bh_incremental_agg(spark, sf_dir):
    """INCREMENTAL VIEW MAINTENANCE of an algebraic rollup (the
    self-maintainable-aggregate theory — Gupta & Mumick, "Maintenance of
    materialized views", 1995, public): a per-priority (count, sum)
    materialized aggregate built from the base v1 is brought to v2 by
    merging INSERT deltas (+) and DELETE deltas (−) — count and sum are
    self-maintainable, so the base is NEVER rescanned (the materialized
    row set is pinned with an eager checkpoint; only the two delta
    batches are aggregated). Groups whose count reaches zero drop out.
    The oracle recomputes v2 from scratch, so the delta algebra itself
    is value-checked.

    Scale shape: maintaining a 100 TB rollup costs O(delta) per batch —
    aggregate each delta map-side, merge with the (group-count sized)
    materialized state by one co-grouped outer join. This is the batch
    algebra underneath every streaming update-mode aggregation.
    """
    src = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v1 = src.filter(F.col("o_orderkey") % 4 != 0)
    inserts = src.filter(F.col("o_orderkey") % 4 == 0)
    deletes = v1.filter(F.col("o_orderkey") % 8 == 1)
    # the materialized aggregate: built once, pinned — never rescanned
    mat = (
        v1.groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
        )
        .localCheckpoint(eager=True)
    )

    def _delta(df, sign):
        return df.groupBy("priority").agg(
            (F.lit(sign) * F.count("*")).cast("bigint").alias("d_n"),
            (F.lit(sign) * F.sum(F.col("cents").cast("decimal(38,0)"))).alias(
                "d_sum"
            ),
        )

    deltas = (
        _delta(inserts, 1)
        .unionByName(_delta(deletes, -1))
        .groupBy("priority")
        .agg(F.sum("d_n").alias("d_n"), F.sum("d_sum").alias("d_sum"))
    )
    merged = mat.join(deltas, "priority", "full_outer").select(
        "priority",
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0)))
        .cast("bigint")
        .alias("n_rows"),
        (
            F.coalesce(F.col("sum_cents"), F.lit(0).cast("decimal(38,0)"))
            + F.coalesce(F.col("d_sum"), F.lit(0).cast("decimal(38,0)"))
        ).alias("sum_cents"),
    )
    return (
        merged.filter(F.col("n_rows") > 0)
        .select("priority", "n_rows", F.col("sum_cents").cast("bigint"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (FK orphan detection across the star schema)
# ---------------------------------------------------------------------------

#: Audited FK edges: (label, child table, child key, parent table,
#: parent key, parent-is-dimension). Dimension parents broadcast; the
#: one fact-sized parent (orders) takes a shuffled join.
_FK_EDGES = (
    ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
    ("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders.customer", "orders", "o_custkey", "customer", "c_custkey", True),
)


@query(
    "q_br_fk_orphans",
    oracle="""
    SELECT 'customer.nation' AS edge,
           CAST(count(*) AS BIGINT) AS n_child_rows,
           CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphan_rows,
           CAST(count(DISTINCT CASE WHEN n_nationkey IS NULL
                                    THEN c_nationkey END) AS BIGINT)
             AS n_orphan_keys
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'lineitem.orders', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT CASE WHEN o_orderkey IS NULL
                                    THEN l_orderkey END) AS BIGINT)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem.part', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT CASE WHEN p_partkey IS NULL
                                    THEN l_partkey END) AS BIGINT)
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    UNION ALL
    SELECT 'lineitem.supplier', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT CASE WHEN s_suppkey IS NULL
                                    THEN l_suppkey END) AS BIGINT)
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    UNION ALL
    SELECT 'orders.customer', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
                                    THEN o_custkey END) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    ORDER BY edge
    """,
)
def q_br_fk_orphans(spark, sf_dir):
    """REFERENTIAL-INTEGRITY AUDIT: orphan detection for every FK edge
    of the star schema in one report — child row count, orphaned child
    rows, and distinct orphaned keys per edge (the ingestion gate that
    catches broken upstream joins before they silently drop rows in
    INNER joins downstream; complements q_y4's single-table
    expectations with CROSS-table contracts).

    Spark-first shape: each edge pre-aggregates the child to (key,
    row-count) — one map-side-combinable shuffle on the key — then
    LEFT-joins the parent's key set: dimension parents broadcast
    (nation/part/supplier/customer), the one fact-sized parent (orders)
    takes a shuffled join that AQE sizes. The orphan arithmetic then
    runs on the KEY-grain frame, so the distinct-count is over
    already-distinct keys — no second distinct shuffle. At 100 TB each
    edge costs one child scan + one key-grain join; edges are
    independent and union trivially.
    """
    results = []
    for label, child_t, ckey, parent_t, pkey, is_dim in _FK_EDGES:
        child = read_table(spark, sf_dir, child_t)
        parent = read_table(spark, sf_dir, parent_t).select(pkey).distinct()
        if is_dim:
            parent = F.broadcast(parent)
        keyed = child.groupBy(ckey).agg(F.count("*").alias("cnt"))
        joined = keyed.join(parent, keyed[ckey] == parent[pkey], "left")
        orphan = F.col(pkey).isNull()
        results.append(
            joined.agg(
                F.lit(label).alias("edge"),
                F.sum("cnt").cast("bigint").alias("n_child_rows"),
                F.sum(F.when(orphan, F.col("cnt")).otherwise(0))
                .cast("bigint")
                .alias("n_orphan_rows"),
                F.sum(F.when(orphan, 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphan_keys"),
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# Diversified top-k (round-robin interleave across sources)
# ---------------------------------------------------------------------------

#: Global result size and the per-source prune depth (k is enough: a
#: source can contribute at most k of the final k).
_DIV_K = 20


@query(
    "q_bt_diversified_topk",
    oracle=f"""
    WITH per AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS src_rank
      FROM documents),
    pruned AS (SELECT * FROM per WHERE src_rank <= {_DIV_K}),
    interleaved AS (
      SELECT doc_id, source, n_chars, src_rank,
             row_number() OVER (ORDER BY src_rank, n_chars DESC, doc_id)
               AS final_rank
      FROM pruned)
    SELECT CAST(final_rank AS INT) AS final_rank, doc_id, source,
           n_chars, CAST(src_rank AS INT) AS src_rank
    FROM interleaved WHERE final_rank <= {_DIV_K}
    ORDER BY final_rank
    """,
)
def q_bt_diversified_topk(spark, sf_dir):
    """DIVERSIFIED TOP-K: the round-robin interleave that search and
    feed ranking use to stop one source dominating the page — rank
    documents within each source (score = length proxy), then order
    globally by (within-source rank, score) so rank-1 docs of every
    source appear before any rank-2 doc (the "slot-based diversity"
    scheme; same goal as q_ar's MMR but deterministic and
    SQL-expressible, so it gets a full value oracle). Ties break on
    doc_id at both levels — total order, engine-identical.

    Spark-first shape: the per-source window is a WindowGroupLimit prune
    (rank <= k cuts each partition to k rows DURING the shuffle — the
    q_w1_topk plan shape), so the global interleave window sorts only
    n_sources * k rows, never the corpus. At 100 TB the corpus-sized
    stage is one partitioned window with group-limit pushdown; the
    final sort frame stays bounded.
    """
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w_src = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    pruned = d.withColumn("src_rank", F.row_number().over(w_src)).filter(
        F.col("src_rank") <= _DIV_K
    )
    w_all = Window.orderBy("src_rank", F.col("n_chars").desc(), F.col("doc_id"))
    return (
        pruned.withColumn("final_rank", F.row_number().over(w_all))
        .filter(F.col("final_rank") <= _DIV_K)
        .select(
            F.col("final_rank").cast("int").alias("final_rank"),
            "doc_id",
            "source",
            "n_chars",
            F.col("src_rank").cast("int").alias("src_rank"),
        )
        .orderBy("final_rank")
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) inventory classification of parts by revenue
# ---------------------------------------------------------------------------

#: Class from the PRIOR cumulative revenue share (exact integer
#: cross-multiplication against the 80%/95% literal thresholds — the
#: boundary part whose prefix crosses a threshold belongs to the
#: class it STARTS in, deterministic on both engines).
_ABC_CLASS = (
    "(CASE WHEN 100 * (cum - rev) < 80 * tot THEN 'A'"
    " WHEN 100 * (cum - rev) < 95 * tot THEN 'B'"
    " ELSE 'C' END)"
)


@query(
    "q_d9_abc_class",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS tot
      FROM per_part),
    classed AS (
      SELECT {_ABC_CLASS} AS abc, rev, tot FROM ranked)
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           round(CAST(sum(rev) AS DOUBLE) / CAST(min(tot) AS DOUBLE), 6)
             AS revenue_share,
           round(CAST(sum(rev) AS DOUBLE) / 100e0, 2) AS revenue_dollars
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def q_d9_abc_class(spark, sf_dir):
    """ABC (PARETO) INVENTORY CLASSIFICATION of parts by discounted
    revenue — the classic 80/15/5 warehouse segmentation (A-parts get
    cycle counts and safety stock, C-parts get bulk policies; the
    (s,Q) simulation q_by consumes exactly this split): rank parts by
    revenue DESC, classify by the PRIOR cumulative share against the
    80%/95% thresholds via exact integer cross-multiplication — no
    float share ever feeds a comparison, so the boundary part lands in
    the same class on both engines. Emits per-class part counts and
    revenue shares.

    Scale shape: one map-side-combinable per-part rollup; the ranked
    prefix runs at part grain (sublinear in the fact table; the q_yj
    distributed-rank recipe swaps in when the part dimension itself is
    huge — integer-exact either way). 100 TB = one scan + one
    part-grain shuffle + a 3-row close.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev")
    )
    w_cum = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy()
    ranked = per_part.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_tot).alias("tot"),
    )
    classed = ranked.select(
        F.expr(_ABC_CLASS).alias("abc"), "rev", "tot"
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(
                F.sum("rev").cast("double") / F.min("tot").cast("double"), 6
            ).alias("revenue_share"),
            F.round(F.sum("rev").cast("double") / 100.0, 2).alias(
                "revenue_dollars"
            ),
        )
        .orderBy("abc")
    )


# ---------------------------------------------------------------------------
# Knee / elbow detection on the Pareto revenue curve
# ---------------------------------------------------------------------------

#: Chord deviation of the cumulative revenue curve at rank i, exact
#: integer cross-multiplication: dev_i = cum_i * N - i * T (the
#: "kneedle" max-distance-from-chord criterion up to the constant
#: chord-length factor, which does not move the argmax).
_KNEE_DEV = "(cum * n_parts - i * tot)"


@query(
    "q_dk_pareto_knee",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev DESC, l_partkey) AS i,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS tot,
             COUNT(*) OVER () AS n_parts
      FROM per_part),
    best AS (
      SELECT i, cum, tot, n_parts, {_KNEE_DEV} AS dev
      FROM ranked ORDER BY dev DESC, i ASC LIMIT 1)
    SELECT CAST(i AS BIGINT) AS knee_rank,
           CAST(n_parts AS BIGINT) AS n_parts,
           round(CAST(i AS DOUBLE) / CAST(n_parts AS DOUBLE), 6)
             AS knee_part_share,
           round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             AS knee_revenue_share
    FROM best
    """,
)
def q_dk_pareto_knee(spark, sf_dir):
    """KNEE DETECTION on the Pareto revenue curve (the "kneedle"
    max-distance-from-chord criterion, Satopaa et al. ICDCS-W 2011):
    where does cumulative part revenue stop earning its rank? The
    answer replaces q_d9's FIXED 80/95 thresholds with the
    data-chosen cutoff — the same primitive picks k from a scree plot
    (q_bw PCA spectrum). The deviation dev_i = cum_i*N - i*T is an
    exact integer cross-multiplication (no float share feeds the
    argmax) and the argmax is TakeOrderedAndProject with a
    deterministic rank tie-break.

    Scale shape: one per-part rollup + a part-grain prefix (q_yj
    distributed-rank swap applies) + a top-1 tail. 100 TB = one scan
    + one part-grain shuffle + a 1-row close.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev")
    )
    w_ord = Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    ranked = per_part.select(
        "rev",
        F.row_number().over(w_ord).alias("i"),
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("n_parts"),
    )
    best = (
        ranked.select(
            "i", "cum", "tot", "n_parts", F.expr(_KNEE_DEV).alias("dev")
        )
        .orderBy(F.desc("dev"), F.asc("i"))
        .limit(1)
    )
    return best.select(
        F.col("i").cast("bigint").alias("knee_rank"),
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.round(
            F.col("i").cast("double") / F.col("n_parts").cast("double"), 6
        ).alias("knee_part_share"),
        F.round(
            F.col("cum").cast("double") / F.col("tot").cast("double"), 6
        ).alias("knee_revenue_share"),
    )
