"""Quantitative-risk / nonparametric-statistics operators (round 8,
batch 4): Kruskal-Wallis rank ANOVA, exact 1-D Wasserstein drift
distance, and Value-at-Risk / CVaR tail risk.

Design rules carried from the rest of the engine:

- **Cross-engine float discipline.** Ranks, counts and cents stay
  exact integers for as long as possible; every double is produced by
  ONE shared-text expression evaluated by both engines, and any
  order-sensitive double accumulation runs inside an explicitly
  ORDERed window frame so both engines add in the same sequence (the
  q_ck_perm_entropy contract).
- **Collapse before you rank.** Every rank/CDF computation groups raw
  rows down to (value-cell, group) count cells first — the combinable
  map-side aggregate — and only then runs prefix sums at cell grain.
  Locally the prefix sum is one ordered window; at 100 TB it swaps for
  the distributed range-repartition + broadcast-offsets recipe already
  proven in q_yv_auc / q_yj_gini. The statistics are engineered
  integer-exact so either layout hashes identically (q_zq contract).
- **Family-bounded tails.** Closes run over <= 5 arm rows or one
  global row; nothing iterates over the corpus after the first
  aggregate.

Reference scope: the reference (COMP5349_2.py:1-211) has none of this
surface; north-star experimentation/risk-observability mandate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import query

# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (rank ANOVA across the five order-priority arms)
# ---------------------------------------------------------------------------

#: Per-arm contribution to the H sum, in double-rank units: R2 is the
#: arm's sum of DOUBLED average ranks (2*cum - t + 1, always an exact
#: integer even for tie groups), so R_j^2/n_j = R2^2 / (4 n_j).
_KW_TERM = (
    "(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE))"
    " / (4e0 * CAST(n_arm AS DOUBLE))"
)

#: Shared-text H close: 12*S/(N(N+1)) - 3(N+1), then the tie
#: correction divisor C = 1 - sum(t^3 - t)/(N^3 - N). A single-arm or
#: all-tied degenerate family yields NULL via nullif, never an
#: ANSI-mode divide error (the q_zk_assortativity lesson).
_KW_H = (
    "(12e0 * s / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1e0))"
    " - 3e0 * (CAST(n AS DOUBLE) + 1e0))"
)
_KW_C = (
    "(1e0 - CAST(tie_sum AS DOUBLE)"
    " / nullif(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " - CAST(n AS DOUBLE), 0e0))"
)


@query(
    "q_cn_kruskal_wallis",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS arm,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    cell AS (
      SELECT arm, cents, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2),
    vcell AS (
      SELECT cents, CAST(sum(c) AS BIGINT) AS t
      FROM cell GROUP BY 1),
    vrank AS (
      SELECT cents, t,
             SUM(t) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum
      FROM vcell),
    arm_sum AS (
      SELECT c.arm,
             CAST(sum(c.c) AS BIGINT) AS n_arm,
             CAST(sum(c.c * (2 * v.cum - v.t + 1)) AS BIGINT) AS r2
      FROM cell c JOIN vrank v ON v.cents = c.cents
      GROUP BY 1),
    gl AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
      FROM vcell),
    acc AS (
      SELECT a.arm, a.n_arm, a.r2, g.n, g.tie_sum,
             SUM({_KW_TERM}) OVER (ORDER BY a.arm
               ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS s
      FROM arm_sum a CROSS JOIN gl g)
    SELECT arm, n_arm, r2 AS rank_sum_x2,
           round({_KW_H}, 6) AS h_stat,
           round({_KW_H} / nullif({_KW_C}, 0e0), 6) AS h_tie_corrected,
           CAST(4 AS BIGINT) AS df
    FROM acc ORDER BY arm
    """,
)
def q_cn_kruskal_wallis(spark, sf_dir):
    """KRUSKAL-WALLIS H TEST (Kruskal & Wallis, JASA 1952 — the
    rank-based one-way ANOVA) across the five order-priority arms on
    order value: do the arms draw from the same distribution, without
    q_c4_anova's normality assumption? Average ranks are carried in
    DOUBLED units (2*cum - t + 1 for a tie group of size t ending at
    cumulative position cum — always an exact integer), so per-arm
    rank sums are exact BIGINTs and the only doubles are the
    shared-text H close and the tie-correction divisor, both
    accumulated in fixed arm order. Degenerate families (all values
    tied) close to NULL via nullif, never a divide error.

    Scale shape: raw rows collapse to (arm, cents) cells map-side,
    then to value cells; the prefix sum runs at value-cell grain
    (locally one ordered window — at 100 TB the distributed
    range-repartition + broadcast-offsets recipe from q_yv_auc, which
    hashes identically because ranks are integer-exact). The H close
    runs on a 5-row frame. 100 TB = one scan + two cell-grain
    shuffles + a constant tail.
    """
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("arm"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cell = base.groupBy("arm", "cents").agg(
        F.count("*").cast("bigint").alias("c")
    )
    vcell = cell.groupBy("cents").agg(F.sum("c").cast("bigint").alias("t"))
    w_val = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    vrank = vcell.select(
        "cents", "t", F.sum("t").over(w_val).alias("cum")
    )
    arm_sum = (
        cell.join(vrank, "cents")
        .groupBy("arm")
        .agg(
            F.sum("c").cast("bigint").alias("n_arm"),
            F.sum(
                F.col("c") * (2 * F.col("cum") - F.col("t") + 1)
            )
            .cast("bigint")
            .alias("r2"),
        )
    )
    glob = vcell.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_sum"),
    )
    w_all = Window.orderBy("arm").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = arm_sum.crossJoin(F.broadcast(glob)).select(
        "arm",
        "n_arm",
        "r2",
        "n",
        "tie_sum",
        F.sum(F.expr(_KW_TERM)).over(w_all).alias("s"),
    )
    return acc.select(
        "arm",
        "n_arm",
        F.col("r2").alias("rank_sum_x2"),
        F.round(F.expr(_KW_H), 6).alias("h_stat"),
        F.round(F.expr(f"{_KW_H} / nullif({_KW_C}, 0e0)"), 6).alias(
            "h_tie_corrected"
        ),
        F.lit(4).cast("bigint").alias("df"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# Exact 1-D Wasserstein (earth mover's) distance between event types
# ---------------------------------------------------------------------------

W1_SAMPLE_A = "purchase"
W1_SAMPLE_B = "click"

#: Per-cell transport term |F_a - F_b| * dv: the CDF gap is the exact
#: integer cross-difference |cum_a*nb - cum_b*na| divided once, dv the
#: exact integer micro-unit gap to the NEXT distinct value. Summed in
#: ascending-value window order so both engines add the same doubles
#: in the same sequence.
_W1_TERM = (
    "(CAST(abs(cum_a * nb - cum_b * na) AS DOUBLE)"
    " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))"
    " * (CAST(dv AS DOUBLE) / 1e6)"
)


@query(
    "q_co_wasserstein",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 1e6) AS BIGINT) AS v,
             CASE WHEN event_type = '{W1_SAMPLE_A}' THEN 1 ELSE 0 END AS ia,
             CASE WHEN event_type = '{W1_SAMPLE_B}' THEN 1 ELSE 0 END AS ib
      FROM events WHERE event_type IN ('{W1_SAMPLE_A}', '{W1_SAMPLE_B}')),
    grp AS (
      SELECT v, CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(ib) AS BIGINT) AS cb
      FROM ev GROUP BY v),
    cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b,
             lead(v) OVER (ORDER BY v) - v AS dv
      FROM grp),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * v) AS BIGINT) AS sum_a,
             CAST(SUM(cb * v) AS BIGINT) AS sum_b
      FROM grp),
    seg AS (
      SELECT SUM(CASE WHEN c.dv IS NOT NULL THEN {_W1_TERM} ELSE 0e0 END)
               OVER (ORDER BY c.v ROWS UNBOUNDED PRECEDING) AS w1_acc,
             c.v, t.na, t.nb, t.sum_a, t.sum_b
      FROM cum c CROSS JOIN tot t),
    last AS (
      SELECT na, nb, sum_a, sum_b, w1_acc
      FROM seg ORDER BY v DESC LIMIT 1)
    SELECT na, nb,
           round(w1_acc, 6) AS w1_distance,
           round(CAST(sum_a AS DOUBLE) / (1e6 * CAST(na AS DOUBLE)), 6)
             AS mean_a,
           round(CAST(sum_b AS DOUBLE) / (1e6 * CAST(nb AS DOUBLE)), 6)
             AS mean_b
    FROM last
    """,
)
def q_co_wasserstein(spark, sf_dir):
    """EXACT 1-D WASSERSTEIN-1 (earth mover's) DISTANCE between the
    value distributions of two event types — the drift metric that
    reports HOW MUCH mass must move (in value units), complementing
    q_zq's KS sup-gap (a max that ignores magnitude) and q_xu's PSI
    (binning-dependent). For 1-D distributions W1 = integral of
    |F_a(x) - F_b(x)| dx, evaluated exactly over the observed support:
    values quantize to exact integer micro-units, CDF gaps are
    cross-multiplied integers (|cum_a*nb - cum_b*na|, the q_zq
    contract), and each segment's transport term is one shared-text
    double accumulated in ascending-value window order so both engines
    sum the identical sequence (the q_ck_perm_entropy contract). The
    one-sided sanity bound W1 >= |mean_a - mean_b| ships in the same
    row via the exact integer value sums.

    Scale shape: group-by-value-cell first (combinable), one
    cell-grain prefix window (the q_zq local/distributed swap note
    applies verbatim), a top-1 tail pick. 100 TB = one scan + one
    cell-grain shuffle + a 1-row close.
    """
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(W1_SAMPLE_A, W1_SAMPLE_B))
        .select(
            F.round(F.col("value") * 1e6).cast("bigint").alias("v"),
            (F.col("event_type") == W1_SAMPLE_A).cast("long").alias("ia"),
            (F.col("event_type") == W1_SAMPLE_B).cast("long").alias("ib"),
        )
    )
    grp = ev.groupBy("v").agg(
        F.sum("ia").cast("bigint").alias("ca"),
        F.sum("ib").cast("bigint").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("v")
    cum = grp.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        (F.lead("v").over(w_lead) - F.col("v")).alias("dv"),
    )
    tot = grp.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * F.col("v")).cast("bigint").alias("sum_a"),
        F.sum(F.col("cb") * F.col("v")).cast("bigint").alias("sum_b"),
    )
    seg = cum.crossJoin(F.broadcast(tot)).select(
        F.sum(
            F.when(F.col("dv").isNotNull(), F.expr(_W1_TERM)).otherwise(
                F.lit(0.0)
            )
        )
        .over(w)
        .alias("w1_acc"),
        "v",
        "na",
        "nb",
        "sum_a",
        "sum_b",
    )
    last = seg.orderBy(F.desc("v")).limit(1)
    return last.select(
        "na",
        "nb",
        F.round(F.col("w1_acc"), 6).alias("w1_distance"),
        F.round(
            F.col("sum_a").cast("double")
            / (F.lit(1e6) * F.col("na").cast("double")),
            6,
        ).alias("mean_a"),
        F.round(
            F.col("sum_b").cast("double")
            / (F.lit(1e6) * F.col("nb").cast("double")),
            6,
        ).alias("mean_b"),
    )


# ---------------------------------------------------------------------------
# Value-at-Risk + CVaR (expected shortfall) per order-priority desk
# ---------------------------------------------------------------------------

#: Exact integer target rank ceil(19n/20) for the 95th percentile —
#: integer division only, per-dialect operator (DIV vs //), no float
#: touches the rank (the q_b8 contract).
_VAR_K_SPARK = "CAST((19 * n_arm + 19) DIV 20 AS BIGINT)"
_VAR_K_DUCK = "CAST((19 * n_arm + 19) // 20 AS BIGINT)"


@query(
    "q_cq_cvar",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS arm,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    cell AS (
      SELECT arm, cents, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2),
    cum AS (
      SELECT arm, cents, c,
             SUM(c) OVER (PARTITION BY arm ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cum_c,
             SUM(c * cents) OVER (PARTITION BY arm ORDER BY cents
                                  ROWS UNBOUNDED PRECEDING) AS cum_s
      FROM cell),
    tot AS (
      SELECT arm, CAST(sum(c) AS BIGINT) AS n_arm,
             CAST(sum(c * cents) AS BIGINT) AS tot_s
      FROM cell GROUP BY 1),
    hit AS (
      SELECT c.arm, c.cents, c.cum_c, c.cum_s, c.c, t.n_arm, t.tot_s,
             row_number() OVER (PARTITION BY c.arm ORDER BY c.cents) AS hit_rk
      FROM cum c JOIN tot t ON t.arm = c.arm
      WHERE c.cum_c >= {_VAR_K_DUCK}),
    pick AS (SELECT * FROM hit WHERE hit_rk = 1)
    SELECT arm, n_arm,
           CAST(n_arm - (cum_c - c) AS BIGINT) AS tail_n,
           round(CAST(cents AS DOUBLE) / 1e2, 6) AS var95,
           round(CAST(tot_s - (cum_s - c * cents) AS DOUBLE)
                 / (1e2 * CAST(n_arm - (cum_c - c) AS DOUBLE)), 6) AS cvar95
    FROM pick ORDER BY arm
    """,
)
def q_cq_cvar(spark, sf_dir):
    """VALUE-AT-RISK (95%) + CVaR / EXPECTED SHORTFALL per
    order-priority desk (Rockafellar & Uryasev, J. Risk 2000 — the
    coherent tail-risk measure Basel committees moved to precisely
    because VaR alone ignores tail shape): VaR95 is the exact
    ceil(0.95 n)-th order statistic of order value (integer rank via
    the shared DIV expression, the q_b8 contract — no float touches
    rank selection), and CVaR95 is the exact mean of every observation
    at or above it (tail count and tail cents both exact integers
    derived from the complement of the prefix sums, so ties at the VaR
    boundary are handled identically on both engines).

    Scale shape: raw rows collapse to (arm, cents) cells map-side; the
    per-arm prefix sums run at cell grain PARTITIONED BY ARM (5
    independent windows — parallel, never a global sort); the boundary
    pick is a per-arm row_number over the qualifying suffix, which
    AQE resolves as a WindowGroupLimit-style small tail. 100 TB = one
    scan + one cell-grain shuffle + a 5-row close.
    """
    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("arm"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cell = base.groupBy("arm", "cents").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_arm = Window.partitionBy("arm").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cell.select(
        "arm",
        "cents",
        "c",
        F.sum("c").over(w_arm).alias("cum_c"),
        F.sum(F.col("c") * F.col("cents")).over(w_arm).alias("cum_s"),
    )
    tot = cell.groupBy("arm").agg(
        F.sum("c").cast("bigint").alias("n_arm"),
        F.sum(F.col("c") * F.col("cents")).cast("bigint").alias("tot_s"),
    )
    hit = (
        cum.join(F.broadcast(tot), "arm")
        .filter(F.col("cum_c") >= F.expr(_VAR_K_SPARK))
        .withColumn(
            "hit_rk",
            F.row_number().over(
                Window.partitionBy("arm").orderBy("cents")
            ),
        )
    )
    pick = hit.filter(F.col("hit_rk") == 1)
    tail_n = F.col("n_arm") - (F.col("cum_c") - F.col("c"))
    tail_s = F.col("tot_s") - (F.col("cum_s") - F.col("c") * F.col("cents"))
    return pick.select(
        "arm",
        "n_arm",
        tail_n.cast("bigint").alias("tail_n"),
        F.round(F.col("cents").cast("double") / 1e2, 6).alias("var95"),
        F.round(
            tail_s.cast("double") / (F.lit(1e2) * tail_n.cast("double")), 6
        ).alias("cvar95"),
    ).orderBy("arm")
