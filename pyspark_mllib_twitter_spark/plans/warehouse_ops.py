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
