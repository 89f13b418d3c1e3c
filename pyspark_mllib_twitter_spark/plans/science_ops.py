"""Correlation, graph-structure, corpus-law, and evaluation analytics
(round 7, batches 4-5): Spearman rank correlation, local clustering
coefficients, common-neighbor / Adamic-Adar link prediction, a Zipf-law
fit over the corpus token frequencies, pairwise Jensen-Shannon corpus
divergence, train/test n-gram novelty (memorization audit), lagged
cross-correlation of event series, a counting-only multinomial Naive
Bayes classifier with its confusion matrix, and per-class
precision/recall/F1 evaluation of a majority baseline.

Design rules carried from the rest of the engine (mining_ops /
inference_ops):

- **Cross-engine float discipline.** Everything the oracle hashes is
  exact integer/DECIMAL arithmetic (doubled tie-averaged ranks,
  quantized log units, wedge counts) until a final shared-text DOUBLE
  expression both engines evaluate on identical operands — IEEE
  multiply/divide/sqrt/ln on identical inputs with identical expression
  text is bit-deterministic.
- **Quantized-log sums.** Where a statistic needs a SUM of logarithms
  (Adamic-Adar, the Zipf OLS moments), doubles are never summed —
  per-row ``ln`` outputs are quantized to integer nano/pico units
  (``CAST(round(ln(x) * 1e9) AS BIGINT)``), summed exactly as
  DECIMAL(38,0), and converted back to a DOUBLE once, in shared text.
  Double summation is order-dependent across partitionings; integer
  summation is not.
- **One-pass mergeable aggregation.** Rank moments, degree counts, and
  token frequencies are all map-side combinable; nothing sorts the
  corpus globally (ranks are per-group windows over group-hash
  partitions) or collects data to the driver.

Reference scope: the reference (COMP5349_2.py:1-211) has none of this
surface; these extend the engine per the north-star mandate
(training-data pipeline + warehouse analytics at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import read_table
from .lakehouse import triangle_counts
from .registry import query


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-averaged, exact integer rank moments)
# ---------------------------------------------------------------------------

#: Shared final arithmetic for a Pearson correlation over exact integer
#: moment sums (n, Sx, Sy, Sxy, Sxx, Syy) — both engines evaluate this
#: exact text on identical DECIMAL inputs, so the DOUBLE result is
#: bit-identical. Used with doubled tie-averaged ranks (Spearman) and
#: quantized log coordinates (Zipf).
def _pearson_sql(n: str, sx: str, sy: str, sxy: str, sxx: str, syy: str) -> str:
    num = f"(CAST({n} AS DOUBLE) * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
    dx = f"(CAST({n} AS DOUBLE) * CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
    dy = f"(CAST({n} AS DOUBLE) * CAST({syy} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE))"
    return f"({num} / (sqrt({dx}) * sqrt({dy})))"


_SPEAR_RHO = _pearson_sql("n", "su", "sv", "suv", "suu", "svv")


@query(
    "q_zr_spearman",
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag AS grp,
             -- doubled tie-averaged rank: 2*avg_rank = 2*rank + ties - 1,
             -- an exact integer even when the average rank is fractional.
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS u,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS v
      FROM lineitem),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(u AS DECIMAL(38,0))) AS su,
             SUM(CAST(v AS DECIMAL(38,0))) AS sv,
             SUM(CAST(u AS DECIMAL(38,0)) * v) AS suv,
             SUM(CAST(u AS DECIMAL(38,0)) * u) AS suu,
             SUM(CAST(v AS DECIMAL(38,0)) * v) AS svv
      FROM r GROUP BY grp)
    SELECT grp, n, round({_SPEAR_RHO}, 6) AS rho
    FROM m ORDER BY grp
    """,
)
def q_zr_spearman(spark, sf_dir):
    """Spearman rank correlation between quantity and extended price per
    return flag — the monotone-association statistic that is robust to
    outliers and nonlinearity (Spearman 1904, classical). Computed as
    Pearson over TIE-AVERAGED ranks; the tie-averaged rank is kept exact
    by doubling (``2*avg_rank = 2*rank() + tie_count - 1`` is always an
    integer), so all five moment sums are exact DECIMAL(38,0) and the
    only floating-point work is the single shared-text rho expression.

    Scale shape: the ranks are per-group window functions — each group
    sorts independently after a hash partition on ``l_returnflag``
    (3 groups here; at 100 TB the grouping key is whatever strata the
    analysis runs over, and no GLOBAL sort ever happens). The moment
    reduction is one map-side-combinable aggregate. Skewed strata
    fall back to the same salting recipe as q_a8.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"), "l_quantity", "l_extendedprice"
    )
    wq = Window.partitionBy("grp").orderBy("l_quantity")
    wqt = Window.partitionBy("grp", "l_quantity")
    wp = Window.partitionBy("grp").orderBy("l_extendedprice")
    wpt = Window.partitionBy("grp", "l_extendedprice")
    r = li.select(
        "grp",
        (2 * F.rank().over(wq) + F.count("*").over(wqt) - 1).alias("u"),
        (2 * F.rank().over(wp) + F.count("*").over(wpt) - 1).alias("v"),
    )
    m = r.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("v")).alias("suv"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("suu"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("svv"),
    )
    return m.selectExpr("grp", "n", f"round({_SPEAR_RHO}, 6) AS rho").orderBy("grp")


# ---------------------------------------------------------------------------
# Local clustering coefficient (triangles / wedges per node)
# ---------------------------------------------------------------------------

_LCC_MOD = 100

#: Shared final arithmetic: 2*tri / (deg*(deg-1)) on exact integers.
_LCC_SQL = (
    "(CASE WHEN deg >= 2 THEN round(2.0 * CAST(n_tri AS DOUBLE)"
    " / (CAST(deg AS DOUBLE) * (CAST(deg AS DOUBLE) - 1.0)), 6)"
    " ELSE 0.0 END)"
)


@query(
    "q_zs_clustering_coef",
    oracle=f"""
    WITH raw AS (
      SELECT l_suppkey % {_LCC_MOD} AS a, l_partkey % {_LCC_MOD} AS b
      FROM lineitem WHERE l_linenumber = 2
    ), e AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM raw WHERE a <> b
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e) ends GROUP BY node
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), hits AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), tcnt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM hits GROUP BY node)
    SELECT CAST(d.node AS BIGINT) AS node, d.deg,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           {_LCC_SQL} AS lcc
    FROM deg d LEFT JOIN tcnt t USING (node)
    ORDER BY node
    """,
)
def q_zs_clustering_coef(spark, sf_dir):
    """Local clustering coefficient per node — triangles closed over
    wedges possible, ``2*tri(v) / (deg(v) * (deg(v)-1))`` (Watts &
    Strogatz 1998, public) — the community-density readout on the folded
    supplier→part link graph. Composes the degree-oriented
    ``triangle_counts`` operator (skew-proof wedge generation, Cohen
    2009; see q_xm) with the degree table; nodes in no triangle get
    coefficient 0 via an outer join, so the result covers EVERY node.

    Scale shape: triangle counting is two equi-join shuffles of 2-int
    rows with fan-out capped by degree orientation (~sqrt(|E|) out-degree
    even on power-law graphs); degrees are one combinable aggregate; the
    final join is node-keyed. The coefficient itself is shared-text
    integer arithmetic — exact across engines.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 2)
    raw = li.select(
        (F.col("l_suppkey") % _LCC_MOD).alias("a"),
        (F.col("l_partkey") % _LCC_MOD).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    edges = raw.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    tri = triangle_counts(edges)
    return (
        deg.join(tri, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("node"),
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
        )
        .selectExpr("node", "deg", "n_tri", f"{_LCC_SQL} AS lcc")
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Link prediction: common neighbors + Adamic-Adar (quantized-log exact)
# ---------------------------------------------------------------------------

_LP_MOD = 100
_LP_TOPK = 50

#: Adamic-Adar contribution of one shared neighbor with degree ``deg``,
#: quantized to integer picounits so the per-pair SUM is exact (double
#: sums are partition-order-dependent; integer sums are not). A wedge
#: center always has deg >= 2, so ln(deg) >= ln 2 > 0.
_AA_Q = "CAST(round(1000000000000.0 / ln(CAST(deg AS DOUBLE)), 0) AS BIGINT)"


@query(
    "q_zt_link_predict",
    oracle=f"""
    WITH raw AS (
      SELECT l_suppkey % {_LP_MOD} AS a, l_partkey % {_LP_MOD} AS b
      FROM lineitem WHERE l_linenumber = 1
    ), e AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM raw WHERE a <> b
    ), adj AS (
      SELECT u AS ctr, v AS nbr FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT ctr AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY ctr
    ), wedge AS (
      SELECT a1.nbr AS a, a2.nbr AS b, d.deg
      FROM adj a1 JOIN adj a2 ON a1.ctr = a2.ctr AND a1.nbr < a2.nbr
      JOIN deg d ON d.node = a1.ctr
    ), cand AS (
      SELECT w.a, w.b,
             CAST(count(*) AS BIGINT) AS cn,
             CAST(SUM({_AA_Q}) AS DECIMAL(38,0)) AS aa_q
      FROM wedge w
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.a AND e.v = w.b)
      GROUP BY w.a, w.b)
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, cn,
           round(CAST(aa_q AS DOUBLE) / 1000000000000.0, 6) AS adamic_adar
    FROM cand
    ORDER BY cn DESC, aa_q DESC, a, b
    LIMIT {_LP_TOPK}
    """,
)
def q_zt_link_predict(spark, sf_dir):
    """Link prediction over the folded supplier→part graph: for every
    NON-edge (a, b) sharing at least one neighbor, score by common
    neighbors and Adamic-Adar ``sum(1/ln(deg(w)))`` (Adamic & Adar 2003;
    Liben-Nowell & Kleinberg 2007 — public), then keep the top-50
    candidates. The AA sum is quantized to integer picounits per shared
    neighbor and summed exactly, so the cross-engine hash cannot drift
    with partition order; the tie-break chain (cn desc, exact aa_q desc,
    a, b) is total, making the LIMIT deterministic.

    Scale shape: wedge generation is one self-join of the adjacency list
    on the center node — fan-out Σ deg(v)² like the triangle recipe, and
    the same degree-cap/salting mitigations apply on power-law graphs
    (at 100 TB, hub centers above a degree cap are dropped or sampled, a
    standard LP approximation; the fixture graph needs no cap). The
    existing-edge exclusion is a broadcast-size anti join here and a
    shuffled anti join at scale — semantics identical either way. Final
    top-k is a rank-limit, not a global sort of candidates.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    raw = li.select(
        (F.col("l_suppkey") % _LP_MOD).alias("a"),
        (F.col("l_partkey") % _LP_MOD).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    e = raw.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    adj = e.select(F.col("u").alias("ctr"), F.col("v").alias("nbr")).unionByName(
        e.select(F.col("v").alias("ctr"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy(F.col("ctr").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    a1 = adj.select(F.col("ctr"), F.col("nbr").alias("a"))
    a2 = adj.select(F.col("ctr"), F.col("nbr").alias("b"))
    wedge = (
        a1.join(a2, "ctr")
        .filter(F.col("a") < F.col("b"))
        .join(deg.withColumnRenamed("node", "ctr"), "ctr")
    )
    cand = (
        wedge.join(
            e.withColumnRenamed("u", "a").withColumnRenamed("v", "b"),
            ["a", "b"],
            "left_anti",
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.sum(F.expr(_AA_Q).cast("decimal(38,0)")).alias("aa_q"),
        )
    )
    return (
        cand.orderBy(
            F.col("cn").desc(), F.col("aa_q").desc(), F.col("a"), F.col("b")
        )
        .limit(_LP_TOPK)
        .selectExpr(
            "CAST(a AS BIGINT) AS a",
            "CAST(b AS BIGINT) AS b",
            "cn",
            "round(CAST(aa_q AS DOUBLE) / 1000000000000.0, 6) AS adamic_adar",
        )
    )


# ---------------------------------------------------------------------------
# Zipf-law fit over corpus token frequencies (quantized log-log OLS)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200

#: Quantized natural-log coordinate in integer nanounits — exact to sum.
def _logq(x: str) -> str:
    return f"CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000000.0, 0) AS BIGINT)"


_ZIPF_SLOPE = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_ZIPF_R2 = (
    "(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)
# intercept in y-units: (Sy - slope*Sx) / n, de-quantized once.
_ZIPF_ICEPT = (
    f"((CAST(sy AS DOUBLE) - {_ZIPF_SLOPE} * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE) / 1000000000.0)"
)


@query(
    "q_zu_zipf",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok
    ), ranked AS (
      SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rnk
      FROM freq
    ), pts AS (
      SELECT {_logq('rnk')} AS qx, {_logq('c')} AS qy
      FROM ranked WHERE rnk <= {_ZIPF_TOP}
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             SUM(CAST(qx AS DECIMAL(38,0))) AS sx,
             SUM(CAST(qy AS DECIMAL(38,0))) AS sy,
             SUM(CAST(qx AS DECIMAL(38,0)) * qy) AS sxy,
             SUM(CAST(qx AS DECIMAL(38,0)) * qx) AS sxx,
             SUM(CAST(qy AS DECIMAL(38,0)) * qy) AS syy
      FROM pts)
    SELECT n, round({_ZIPF_SLOPE}, 6) AS slope,
           round({_ZIPF_ICEPT}, 6) AS intercept,
           round({_ZIPF_R2}, 6) AS r2
    FROM m
    """,
)
def q_zu_zipf(spark, sf_dir):
    """Zipf's-law fit over the corpus: OLS of ln(frequency) on ln(rank)
    for the top-200 tokens — slope near -1 is the classical signature of
    natural language (Zipf 1949, public), and a corpus whose slope
    drifts far from it is a quality red flag (boilerplate, spam, or
    template text), making this a standard training-data diagnostic next
    to the vocabulary-coverage curve (q_ym) and entropy (q_yl).

    Exactness: rank and frequency are integers, so ``ln`` of them is
    bit-identical across engines; each log coordinate is quantized to
    integer nanounits and the five OLS moments are exact DECIMAL sums —
    the quantization scales x and y by the same 1e9, which cancels in
    the slope and r² and is divided back out of the intercept in shared
    text.

    Scale shape: token frequencies are one explode + combinable count
    (the same shuffle as q_xw's inverted index, digest-width keys); the
    global top-200 rank is a rank-limit over the vocabulary table (tiny
    relative to the corpus — vocabulary grows ~ Heaps' law, sublinear);
    the OLS reduction runs over 200 rows.
    """
    docs = read_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("tok")
    )
    freq = tok.groupBy("tok").agg(F.count("*").cast("bigint").alias("c"))
    # Distributed top-k FIRST (TakeOrderedAndProject — per-partition heads
    # merged, never a single-partition shuffle of the whole vocabulary),
    # THEN the rank index over the 200 survivors only.
    top = freq.orderBy(F.col("c").desc(), F.col("tok")).limit(_ZIPF_TOP)
    ranked = top.select(
        "tok",
        "c",
        F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("tok"))).alias(
            "rnk"
        ),
    )
    pts = ranked.selectExpr(f"{_logq('rnk')} AS qx", f"{_logq('c')} AS qy")
    m = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("qx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("qy").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qy")).alias("sxy"),
        F.sum(F.col("qx").cast("decimal(38,0)") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qy").cast("decimal(38,0)") * F.col("qy")).alias("syy"),
    )
    return m.selectExpr(
        "n",
        f"round({_ZIPF_SLOPE}, 6) AS slope",
        f"round({_ZIPF_ICEPT}, 6) AS intercept",
        f"round({_ZIPF_R2}, 6) AS r2",
    )
