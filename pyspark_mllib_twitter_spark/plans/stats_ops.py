"""Statistical-inference / ops-analytics operators (round 8, batch 3):
Benjamini-Hochberg FDR control over a family of per-nation tests,
sweep-line peak concurrency, and exact weighted medians.

Design rules carried from the rest of the engine:

- **Cross-engine float discipline.** Counts, cents, epoch microseconds
  and ranks stay exact integers; every double is produced by ONE
  shared-text expression evaluated by both engines (z statistic, the
  normal-CDF polynomial, the closing divisions), so BH accept/reject
  decisions — comparisons on those doubles — are bit-identical.
- **No global sort of the corpus.** The concurrency sweep is a
  SEGMENTED prefix sum: a per-day window (parallel across days) plus a
  calendar-bounded day-grain carry cumsum — the classic scan
  decomposition (Blelloch, "Prefix sums and their applications", 1990,
  public). The weighted median uses the repo's distributed-rank recipe
  (collapse to value cells, cumulate per group).
- **Hypothesis-family windows are family-bounded.** BH ranks run over
  one row per nation (25 rows) — never over raw customers.

Reference scope: the reference (COMP5349_2.py:1-211) has none of this
surface; north-star experimentation/observability mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import query

# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation proportion tests
# ---------------------------------------------------------------------------

#: High-balance cutoff for the per-nation "positive rate" under test.
_BH_CUTOFF = 5000.0

#: BH target false-discovery rate (alpha). Kept a literal inside the
#: shared-text threshold expression.
_BH_ALPHA = "0.10"

#: Shared-text two-proportion z (nation vs rest-of-world, pooled
#: variance). Inputs are exact BIGINTs: k1/n1 = nation positives/size,
#: kk/nn = global positives/size. Degenerate pooled variance -> NULL
#: (never a divide-by-zero; the q_yi_abtest_ztest contract).
_BH_Z_EXPR = (
    "(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(kk - k1 AS DOUBLE) / CAST(nn - n1 AS DOUBLE))"
    " / sqrt(nullif((CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (1.0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(nn - n1 AS DOUBLE)), 0.0))"
)

#: Shared-text Abramowitz & Stegun 26.2.17 upper-tail polynomial
#: (Zelen & Severo; |error| < 7.5e-8 — far inside the 6dp rounding the
#: driver applies). ``tt`` is the Horner variable 1/(1 + 0.2316419|z|);
#: 2.5066282746310002 is sqrt(2*pi) as a literal so neither engine's
#: pi() enters the text. least(1.0, ...) absorbs the approximation's
#: epsilon excursion above 1 at z = 0.
_BH_T_EXPR = "1.0 / (1.0 + 0.2316419 * abs(z_raw))"
_BH_P_EXPR = (
    "least(1.0, 2.0 * (exp(-(z_raw * z_raw) / 2.0) / 2.5066282746310002)"
    " * (0.319381530 * tt - 0.356563782 * tt * tt"
    " + 1.781477937 * tt * tt * tt - 1.821255978 * tt * tt * tt * tt"
    " + 1.330274429 * tt * tt * tt * tt * tt))"
)

#: Shared-text BH step-up threshold for rank i of m: i * alpha / m.
_BH_CRIT_EXPR = f"CAST(p_rank AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)"


@query(
    "q_bi_bh_fdr",
    oracle=f"""
    WITH per AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN c_acctbal > {_BH_CUTOFF} THEN 1 ELSE 0 END)
                  AS BIGINT) AS k1
      FROM customer GROUP BY c_nationkey),
    tot AS (
      SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(k1) AS BIGINT) AS kk
      FROM per),
    z AS (
      SELECT n_name AS nation, n1, k1, {_BH_Z_EXPR} AS z_raw
      FROM per CROSS JOIN tot
      JOIN nation ON n_nationkey = c_nationkey),
    t AS (
      SELECT nation, n1, k1, z_raw, {_BH_T_EXPR} AS tt
      FROM z WHERE z_raw IS NOT NULL),
    p AS (
      SELECT nation, n1, k1, z_raw, {_BH_P_EXPR} AS p_raw FROM t),
    ranked AS (
      SELECT nation, n1, k1, z_raw, p_raw,
             row_number() OVER (ORDER BY p_raw, nation) AS p_rank,
             count(*) OVER () AS m
      FROM p),
    flagged AS (
      SELECT *, CASE WHEN p_raw <= {_BH_CRIT_EXPR} THEN p_rank ELSE 0 END
                AS ok_rank
      FROM ranked),
    kstar AS (SELECT max(ok_rank) AS k_star FROM flagged)
    SELECT nation, n1 AS n_customers, k1 AS n_high,
           round(z_raw, 6) AS z_score, round(p_raw, 6) AS p_value,
           CAST(p_rank AS INT) AS p_rank,
           CAST(CASE WHEN p_rank <= k_star THEN 1 ELSE 0 END AS INT)
             AS rejected
    FROM flagged CROSS JOIN kstar
    ORDER BY p_rank
    """,
)
def q_bi_bh_fdr(spark, sf_dir):
    """MULTIPLE-TESTING CONTROL: Benjamini-Hochberg step-up FDR
    (Benjamini & Hochberg 1995, public) over the family of per-nation
    "is this nation's high-balance rate different from the rest of the
    world" two-proportion z-tests — the experimentation-platform readout
    that keeps a dashboard of 25 simultaneous segment tests honest.
    Per-nation z uses the pooled-variance one-vs-rest form on exact
    integer counts; the two-sided p-value is the Abramowitz-Stegun
    26.2.17 normal-tail polynomial evaluated as ONE shared-text
    expression (both engines compute bit-identical doubles from
    identical integer inputs, so the step-up comparisons — p_(i) <=
    i*alpha/m and the max-rank cutoff — decide identically). Degenerate
    pooled variance yields NULL z and drops from the family (m counts
    non-null tests only).

    Scale shape: the only corpus-scan work is one map-side-combinable
    groupBy(nation) over customers; everything after (totals cross
    join, p-values, the BH rank/step-up windows) runs on ONE ROW PER
    HYPOTHESIS — 25 rows here, family-bounded at any corpus size. At
    100 TB the test family is still tiny; the windows never see raw
    rows.
    """
    c = read_table(spark, sf_dir, "customer")
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = c.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n1"),
        F.sum(
            F.when(F.col("c_acctbal") > _BH_CUTOFF, 1).otherwise(0)
        ).cast("bigint").alias("k1"),
    )
    tot = per.agg(
        F.sum("n1").cast("bigint").alias("nn"),
        F.sum("k1").cast("bigint").alias("kk"),
    )
    z = (
        per.crossJoin(F.broadcast(tot))
        .join(F.broadcast(nat), per.c_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n1",
            "k1",
            F.expr(_BH_Z_EXPR).alias("z_raw"),
        )
        .filter(F.col("z_raw").isNotNull())
        .withColumn("tt", F.expr(_BH_T_EXPR))
        .withColumn("p_raw", F.expr(_BH_P_EXPR))
    )
    # The BH windows run over one row per hypothesis (family-bounded
    # frame), so the unpartitioned window is a 25-row sort, not a
    # corpus sort.
    ranked = z.select(
        "nation",
        "n1",
        "k1",
        "z_raw",
        "p_raw",
        F.row_number().over(Window.orderBy("p_raw", "nation")).alias("p_rank"),
        F.count("*").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("m"),
    ).withColumn(
        "ok_rank",
        F.when(F.col("p_raw") <= F.expr(_BH_CRIT_EXPR), F.col("p_rank")).otherwise(
            F.lit(0)
        ),
    )
    kstar = ranked.agg(F.max("ok_rank").alias("k_star"))
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "nation",
            F.col("n1").alias("n_customers"),
            F.col("k1").alias("n_high"),
            F.round("z_raw", 6).alias("z_score"),
            F.round("p_raw", 6).alias("p_value"),
            F.col("p_rank").cast("int").alias("p_rank"),
            F.when(F.col("p_rank") <= F.col("k_star"), 1)
            .otherwise(0)
            .cast("int")
            .alias("rejected"),
        )
        .orderBy("p_rank")
    )


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency (segmented prefix sum)
# ---------------------------------------------------------------------------

#: Deterministic synthetic session duration in seconds: 5-35 minutes,
#: a pure function of event_id so both engines derive identical
#: intervals from the shared fixture.
_CONC_DUR_S = "300 + event_id % 1800"

_US_PER_DAY = 86_400_000_000


@query(
    "q_bj_peak_concurrency",
    oracle=f"""
    WITH iv AS (
      SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
             epoch_us(CAST(ts AS TIMESTAMP))
               + ({_CONC_DUR_S}) * 1000000 AS e_us
      FROM events),
    bounds AS (
      SELECT event_id, s_us AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_id, e_us AS t, -1 AS delta FROM iv),
    within AS (
      SELECT t // {_US_PER_DAY} AS day_idx, t, delta, event_id,
             sum(delta) OVER (PARTITION BY t // {_US_PER_DAY}
                              ORDER BY t, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_in_day
      FROM bounds),
    day_tot AS (
      SELECT day_idx, sum(delta) AS day_delta
      FROM within GROUP BY day_idx),
    carry AS (
      SELECT day_idx,
             COALESCE(sum(day_delta) OVER (ORDER BY day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS carry_in
      FROM day_tot)
    SELECT CAST(w.day_idx AS BIGINT) AS day_idx,
           CAST(min(c.carry_in) AS BIGINT) AS carry_in,
           CAST(sum(CASE WHEN w.delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(max(CASE WHEN w.delta = 1
                         THEN c.carry_in + w.run_in_day END) AS BIGINT)
             AS peak_concurrency
    FROM within w JOIN carry c ON w.day_idx = c.day_idx
    GROUP BY w.day_idx ORDER BY w.day_idx
    """,
)
def q_bj_peak_concurrency(spark, sf_dir):
    """PEAK CONCURRENCY per day by sweep line: each event opens a
    deterministic 5-35-minute session ``[ts, ts + dur)``; boundary
    events (+1 at start, -1 at end, half-open so an end at instant t
    frees its slot before a start at t) are prefix-summed in time order,
    and the per-day peak is the maximum running value over that day's
    START boundaries — exact, because concurrency only increases at
    starts, so the global maximum within any day is attained at a start
    (a day whose maximum is midnight carry-in alone reports the max at
    its starts; with 35-minute sessions carry-in decays within the first
    hour). The capacity-planning readout behind "how many simultaneous
    sessions must we serve".

    Scale shape: the prefix sum is SEGMENTED, never global — a window
    PARTITIONED BY day (parallel across days, each segment
    calendar-bounded) plus a day-grain carry cumsum over <= 31 rows
    (Blelloch scan decomposition, public). All arithmetic is exact
    epoch-microsecond integers; there is no global sort and no
    single-partition window over the corpus. At 100 TB the segments
    parallelize across executors and the carry table stays
    calendar-sized.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.expr(_CONC_DUR_S).cast("bigint") * 1_000_000
        ).alias("e_us"),
    )
    # One corpus scan: each interval explodes to its two boundary rows
    # (a union of starts and ends would read the scan twice).
    bounds = ev.select(
        "event_id",
        F.explode(
            F.array(
                F.struct(F.col("s_us").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e_us").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select("event_id", "b.t", "b.delta")
    w_day = (
        Window.partitionBy("day_idx")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = bounds.select(
        F.expr(f"t DIV {_US_PER_DAY}").alias("day_idx"), "t", "delta", "event_id"
    ).withColumn("run_in_day", F.sum("delta").over(w_day))
    day_tot = within.groupBy("day_idx").agg(F.sum("delta").alias("day_delta"))
    w_carry = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, -1)
    carry = day_tot.select(
        "day_idx",
        F.coalesce(F.sum("day_delta").over(w_carry), F.lit(0)).alias("carry_in"),
    )
    return (
        within.join(F.broadcast(carry), "day_idx")
        .groupBy("day_idx")
        .agg(
            F.min("carry_in").cast("bigint").alias("carry_in"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_starts"),
            F.max(
                F.when(
                    F.col("delta") == 1, F.col("carry_in") + F.col("run_in_day")
                )
            )
            .cast("bigint")
            .alias("peak_concurrency"),
        )
        .select(
            F.col("day_idx").cast("bigint").alias("day_idx"),
            "carry_in",
            "n_starts",
            "peak_concurrency",
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Exact weighted median (distributed-rank recipe)
# ---------------------------------------------------------------------------


@query(
    "q_bk_weighted_median",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wc
      FROM lineitem GROUP BY 1, 2, 3),
    cum AS (
      SELECT l_returnflag, l_linestatus, cents, wc,
             sum(wc) OVER (PARTITION BY l_returnflag, l_linestatus
                           ORDER BY cents
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cw,
             sum(wc) OVER (PARTITION BY l_returnflag, l_linestatus)
               AS w_total,
             sum(CAST(cents AS DECIMAL(38,0)) * wc)
               OVER (PARTITION BY l_returnflag, l_linestatus) AS swc
      FROM cells)
    SELECT l_returnflag, l_linestatus,
           CAST(min(w_total) AS BIGINT) AS total_weight,
           round(CAST(min(CASE WHEN 2 * cw >= w_total THEN cents END)
                      AS DOUBLE) / 100.0, 6) AS wmedian_price,
           round(CAST(min(swc) AS DOUBLE) / CAST(min(w_total) AS DOUBLE)
                 / 100.0, 6) AS wmean_price
    FROM cum GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus
    """,
)
def q_bk_weighted_median(spark, sf_dir):
    """EXACT WEIGHTED MEDIAN of extended price per (returnflag,
    linestatus), weighted by quantity (the lower weighted median:
    smallest value whose cumulative weight reaches half the total — the
    robust "typical unit price" where each line counts per unit sold,
    standard order-statistics definition). Reported next to the weighted
    mean, whose gap from the median is the skew readout.

    Scale shape: the repo's distributed-rank recipe (q_yj/q_b8) — the
    corpus collapses to (group, cents, weight-sum) cells in one
    map-side-combinable shuffle; cumulative and total windows then run
    over the CELL table (bounded by distinct prices per group, not rows).
    The 2*cw >= W selection is pure integer arithmetic — no float enters
    until the closing shared-text division. At 100 TB the cell table is
    orders of magnitude smaller than the scan and partitions by group.
    """
    li = read_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("l_returnflag", "l_linestatus", "cents")
        .agg(F.sum("w").cast("bigint").alias("wc"))
    )
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = cells.select(
        "l_returnflag",
        "l_linestatus",
        "cents",
        F.sum("wc")
        .over(grp.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("wc").over(grp).alias("w_total"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("wc"))
        .over(grp)
        .alias("swc"),
    )
    return (
        cum.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("w_total").cast("bigint").alias("total_weight"),
            F.round(
                F.min(
                    F.when(2 * F.col("cw") >= F.col("w_total"), F.col("cents"))
                ).cast("double")
                / 100.0,
                6,
            ).alias("wmedian_price"),
            F.round(
                F.min("swc").cast("double") / F.min("w_total").cast("double") / 100.0,
                6,
            ).alias("wmean_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
