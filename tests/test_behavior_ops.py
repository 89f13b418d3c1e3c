"""Round-8 behavioral/sketch/wavelet operators: independent
re-computations and structural contracts beyond the DuckDB hash checks
in tests/test_oracle.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyspark_mllib_twitter_spark.plans import REGISTRY
from pyspark_mllib_twitter_spark.plans.behavior_ops import FUNNEL_STEPS, ROC_BINS
from pyspark_mllib_twitter_spark.plans.corpus_ops import HLL_M
from pyspark_mllib_twitter_spark.plans.science_ops import HAAR_N


def _rows(spark, sf, name):
    return REGISTRY[name].spark(spark, sf).collect()


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def test_funnel_reach_is_monotone_nonincreasing(spark, sf_smoke):
    """Ordered-funnel invariant: step k+1 reach can never exceed step k
    (every step-k+1 completer completed step k first), and gaps are
    positive (strictly-after semantics)."""
    rows = _rows(spark, sf_smoke, "q_as_funnel")
    assert [r.step for r in rows] == [1, 2, 3]
    reach = [r.n_users for r in rows]
    assert reach[0] >= reach[1] >= reach[2] > 0
    assert rows[0].avg_gap_us is None
    assert rows[1].avg_gap_us > 0 and rows[2].avg_gap_us > 0


def test_funnel_step1_matches_naive_count(spark, sf_smoke):
    """Step-1 reach is exactly the distinct users with a step-1 event."""
    rows = _rows(spark, sf_smoke, "q_as_funnel")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    n1 = (
        ev.filter(
            (F.col("event_type") == FUNNEL_STEPS[0]) & F.col("user_id").isNotNull()
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0].n_users == n1


# ---------------------------------------------------------------------------
# Retention
# ---------------------------------------------------------------------------


def test_retention_offset_zero_is_full_cohort(spark, sf_smoke):
    """Every cohort is 100% retained at offset 0 (their first-activity
    week), and no cell can exceed its cohort size."""
    rows = _rows(spark, sf_smoke, "q_at_retention")
    assert rows, "retention matrix is empty"
    for r in rows:
        assert 0 < r.n_active <= r.n_cohort
        assert r.week_offset >= 0
        if r.week_offset == 0:
            assert r.n_active == r.n_cohort and r.retention == 1.0


def test_retention_cohort_sizes_partition_users(spark, sf_smoke):
    """Cohort sizes must sum to the distinct-user count (cohorting is a
    partition of users by first week)."""
    rows = _rows(spark, sf_smoke, "q_at_retention")
    sizes = {r.cohort_week: r.n_cohort for r in rows}
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    n_users = (
        ev.filter(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


def test_did_identity_from_cell_means(spark, sf_smoke):
    """The DiD estimate must equal the 2x2 cell-mean identity to 6dp
    slack (the cells are independently rounded)."""
    r = _rows(spark, sf_smoke, "q_au_did")[0]
    recomposed = (r.mean_treat_post - r.mean_treat_pre) - (
        r.mean_ctrl_post - r.mean_ctrl_pre
    )
    assert abs(r.did_estimate - recomposed) < 5e-6
    assert min(r.n_t1, r.n_t0, r.n_c1, r.n_c0) > 0


# ---------------------------------------------------------------------------
# ROC curve
# ---------------------------------------------------------------------------


def test_roc_rates_monotone_and_bounded(spark, sf_smoke):
    """TPR/FPR are cumulative-from-above: nonincreasing in the bin
    threshold, within [0, 1], and equal to 1 at the lowest bin present
    (threshold <= min score accepts everything)."""
    rows = _rows(spark, sf_smoke, "q_ay_roc_curve")
    assert 1 <= len(rows) <= ROC_BINS
    for a, b in zip(rows, rows[1:]):
        assert a.bin < b.bin
        assert a.tpr >= b.tpr and a.fpr >= b.fpr
    for r in rows:
        assert 0.0 <= r.fpr <= 1.0 and 0.0 <= r.tpr <= 1.0
    assert rows[0].tpr == 1.0 and rows[0].fpr == 1.0


# ---------------------------------------------------------------------------
# Portable HLL
# ---------------------------------------------------------------------------


def test_hll_estimate_within_sketch_error(spark, sf_smoke):
    """HLL with m registers has relative standard error ~1.04/sqrt(m);
    assert a generous 5-sigma band against the exact audit column, and
    the register-count bookkeeping identity."""
    rows = _rows(spark, sf_smoke, "q_aw_hll_distinct")
    assert rows
    tol = 5 * 1.04 / math.sqrt(HLL_M)
    for r in rows:
        assert r.n_regs + r.v_empty == HLL_M
        assert r.n_regs <= r.n_exact  # registers can't exceed distinct keys
        assert abs(r.hll_estimate - r.n_exact) <= tol * r.n_exact + 2


# ---------------------------------------------------------------------------
# Edit-distance join
# ---------------------------------------------------------------------------


def test_edit_distance_pairs_are_all_distance_one(spark, sf_smoke):
    """Every emitted pair is at exact distance 1, ordered, and
    deduplicated; non-emptiness proves the blocking generates candidates
    (TPC-H customer names differ by single digits)."""
    rows = _rows(spark, sf_smoke, "q_av_edit_distance_join")
    assert rows, "no lev-1 pairs found on customer names"
    seen = set()
    for r in rows:
        assert r.dist == 1 and r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
        # independent Python recomputation on a sample
    import difflib  # noqa: F401  (stdlib presence only)

    def lev1(a: str, b: str) -> bool:
        if a == b:
            return False
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = edits = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                edits += 1
                j += 1
                if edits > 1:
                    return False
        return True

    for r in rows[:200]:
        assert lev1(r.name_a, r.name_b), (r.name_a, r.name_b)


# ---------------------------------------------------------------------------
# Haar wavelet
# ---------------------------------------------------------------------------


def test_haar_reconstructs_daily_series(spark, sf_smoke):
    """Perfect-reconstruction property of the unnormalized Haar
    transform: x_even = (a+d)/2, x_odd = (a-d)/2 at each level — so the
    level-1 coefficients must reproduce the first HAAR_N daily sums, and
    level-2 must reproduce level-1 approximations."""
    rows = _rows(spark, sf_smoke, "q_ax_haar_wavelet")
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, {}).setdefault((r.level, r.kind), {})[
            r.k
        ] = r.coeff
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
        .orderBy("event_type", "day")
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.cents)
    for et, coeffs in by_series.items():
        x = series[et][:HAAR_N]
        d1 = coeffs[(1, "detail")]
        a2, d2 = coeffs[(2, "approx")], coeffs[(2, "detail")]
        # level-2 reconstruction of level-1 approximations
        a1 = {}
        for k2 in a2:
            a1[2 * k2] = (a2[k2] + d2[k2]) // 2
            a1[2 * k2 + 1] = (a2[k2] - d2[k2]) // 2
            assert (a2[k2] + d2[k2]) % 2 == 0
        # level-1 reconstruction of the raw series
        for k1, d in d1.items():
            a = a1[k1]
            assert (a + d) % 2 == 0
            assert x[2 * k1] == (a + d) // 2
            assert x[2 * k1 + 1] == (a - d) // 2


# ---------------------------------------------------------------------------
# TextRank
# ---------------------------------------------------------------------------


def test_textrank_matches_numpy_power_iteration(spark, sf_smoke):
    """Golden check: the distributed TextRank ranks must match a NumPy
    power iteration (same simplified PageRank: no dangling
    redistribution, teleport (1-d)/N) on the identically-built
    co-occurrence graph, to 6dp."""
    import numpy as np

    from pyspark_mllib_twitter_spark.functions import text as TXT
    from pyspark_mllib_twitter_spark.plans.science_ops import (
        TEXTRANK_D,
        TEXTRANK_ITERS,
        TEXTRANK_TOPK,
    )

    rows = _rows(spark, sf_smoke, "q_az_textrank")
    assert 0 < len(rows) <= TEXTRANK_TOPK

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    toks = [
        r.toks
        for r in docs.select(TXT.tokens("text").alias("toks")).collect()
        if len(r.toks) >= 2
    ]
    edges = set()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    nodes = sorted({w for e in edges for w in e})
    idx = {w: i for i, w in enumerate(nodes)}
    n = len(nodes)
    # directed adjacency = both orientations of each undirected edge
    out = [[] for _ in range(n)]
    for u, v in edges:
        out[idx[u]].append(idx[v])
        out[idx[v]].append(idx[u])
    r = np.full(n, 1.0 / n)
    for _ in range(TEXTRANK_ITERS):
        nxt = np.full(n, (1.0 - TEXTRANK_D) / n)
        for i in range(n):
            if out[i]:
                share = TEXTRANK_D * r[i] / len(out[i])
                for j in out[i]:
                    nxt[j] += share
        r = nxt
    golden = sorted(zip(nodes, r), key=lambda t: (-t[1], t[0]))[:TEXTRANK_TOPK]
    got = [(row.word, row.score) for row in rows]
    assert [w for w, _ in got] == [w for w, _ in golden]
    for (gw, gs), (w, s) in zip(golden, got):
        assert abs(gs - s) < 2e-6, (w, gs, s)


# ---------------------------------------------------------------------------
# Streaming HLL
# ---------------------------------------------------------------------------


def test_stream_hll_equals_batch_registers(spark, sf_smoke):
    """Mergeability contract: the streaming register table (max over
    micro-batch updates) must equal the batch twin's registers exactly —
    same estimate, same empty-register count, per group."""
    stream_rows = {r.event_type: r for r in _rows(spark, sf_smoke, "q_stream_hll")}
    batch_rows = {r.event_type: r for r in _rows(spark, sf_smoke, "q_aw_hll_distinct")}
    assert set(stream_rows) == set(batch_rows)
    for et, b in batch_rows.items():
        s = stream_rows[et]
        assert s.n_regs == b.n_regs
        assert s.v_empty == b.v_empty
        assert s.hll_estimate == b.hll_estimate


# ---------------------------------------------------------------------------
# Jackknife ratio SE
# ---------------------------------------------------------------------------


def test_jackknife_matches_bruteforce_loo(spark, sf_smoke):
    """The one-pass moment form must equal the textbook n-refit jackknife
    (computed brute-force in Python on the exact integer columns)."""
    r = _rows(spark, sf_smoke, "q_b1_jackknife_ratio")[0]
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    rows = li.collect()
    n = len(rows)
    sy = sum(x.cents for x in rows)
    sx = sum(x.qty for x in rows)
    ris = [round((sy - x.cents) / (sx - x.qty) * 1e9) for x in rows]
    mean_ri = sum(ris) / n
    se = ((n - 1) / n * sum((ri - mean_ri) ** 2 for ri in ris)) ** 0.5 / 1e9 / 100
    assert r.n == n
    assert abs(r.ratio - (sy / sx / 100)) < 1e-6
    assert abs(r.jackknife_se - se) < 1e-6
    assert r.jackknife_se > 0


# ---------------------------------------------------------------------------
# STL-lite decomposition
# ---------------------------------------------------------------------------


def test_stl_components_add_up_and_seasonal_centers(spark, sf_smoke):
    """Additivity: raw == trend + seasonal + residual (to quantization
    slack) on every row; only full-window days are emitted; the weekday
    seasonal repeats exactly within a series."""
    rows = _rows(spark, sf_smoke, "q_b2_stl_decompose")
    assert rows
    per_series = {}
    for r in rows:
        assert abs(r.raw - (r.trend + r.seasonal + r.residual)) < 2e-3
        per_series.setdefault(r.event_type, []).append(r)
    for et, rs in per_series.items():
        days = [r.day for r in rs]
        assert days == sorted(days)
        # 30-day fixture minus 3 edge days each side
        assert len(days) >= 7
        seas_by_dow = {}
        for r in rs:
            seas_by_dow.setdefault(r.day % 7, set()).add(r.seasonal)
        for dow, vals in seas_by_dow.items():
            assert len(vals) == 1, f"{et} dow {dow} seasonal not constant"


# ---------------------------------------------------------------------------
# Containment join
# ---------------------------------------------------------------------------


def test_containment_is_asymmetric_and_bounded(spark, sf_smoke):
    """Containment values lie in [tau, 1]; n_shared <= sz_a; pairs are
    directional (id_a contained in id_b) — and every symmetric Jaccard
    pair from q_yr must appear here in at least one direction (Jaccard
    >= tau implies containment >= tau for the smaller set)."""
    from pyspark_mllib_twitter_spark.plans.corpus_ops import (
        CONTAIN_TAU,
        SETSIM_TAU,
    )

    rows = _rows(spark, sf_smoke, "q_b3_containment_join")
    pairs = {(r.id_a, r.id_b) for r in rows}
    for r in rows:
        assert CONTAIN_TAU <= r.containment <= 1.0 + 1e-9
        assert 0 < r.n_shared <= r.sz_a
        assert r.id_a != r.id_b
    # cross-check vs the symmetric join: J(A,B) >= c implies
    # |A∩B|/min(|A|,|B|) >= c, so any q_yr pair with jaccard >= CONTAIN_TAU
    # must be contained in at least one direction.
    if CONTAIN_TAU >= SETSIM_TAU:
        sym = _rows(spark, sf_smoke, "q_yr_setsim_prefix_join")
        for s in sym:
            if s.jaccard >= CONTAIN_TAU:
                assert (s.id_a, s.id_b) in pairs or (s.id_b, s.id_a) in pairs


# ---------------------------------------------------------------------------
# Modularity
# ---------------------------------------------------------------------------


def test_modularity_identities(spark, sf_smoke):
    """Bookkeeping identities of Q = sum_c [m_c/m - (d_c/2m)^2]:
    sum(m_c) <= m, sum(d_c) = 2m (every edge contributes one degree to
    each endpoint's community), and each q_term matches its own closed
    form; |Q| <= 1."""
    rows = _rows(spark, sf_smoke, "q_b4_modularity")
    assert rows
    m = rows[0].m
    assert all(r.m == m for r in rows)
    assert sum(r.m_c for r in rows) <= m
    assert sum(r.d_c for r in rows) == 2 * m
    q = 0.0
    for r in rows:
        expect = r.m_c / m - (r.d_c / (2 * m)) ** 2
        assert abs(r.q_term - expect) < 1e-6
        q += r.q_term
    assert -1.0 <= q <= 1.0


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------


def test_psi_nonnegative_and_zero_on_identical(spark, sf_smoke):
    """PSI is a symmetrized KL: nonnegative on every series; the halves
    partition each series (n_a + n_b = series row count)."""
    rows = _rows(spark, sf_smoke, "q_b5_psi")
    assert rows
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    counts = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r.psi >= 0.0
        assert r.n_a + r.n_b == counts[r.event_type]
        assert r.psi < 0.5, "day-parity halves of one month should not drift"


# ---------------------------------------------------------------------------
# Feature hashing
# ---------------------------------------------------------------------------


def test_feature_hashing_matches_python_md5(spark, sf_smoke):
    """Golden: recompute the signed hashed vector for a sample of
    documents with hashlib and compare cell-for-cell; buckets stay in
    range; zero cells are absent."""
    import hashlib

    from pyspark_mllib_twitter_spark.plans.corpus_ops import FH_DIM

    rows = _rows(spark, sf_smoke, "q_b6_feature_hashing")
    assert rows
    by_doc = {}
    for r in rows:
        assert 0 <= r.bucket < FH_DIM and r.weight != 0
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .filter(F.col("doc_id") <= 20)
        .collect()
    }
    for doc_id, text in docs.items():
        vec: dict[int, int] = {}
        for tok in [t for t in text.strip().lower().split() if t]:
            h = hashlib.md5(tok.encode()).hexdigest()
            b = int(h[:8], 16) % FH_DIM
            s = 1 if int(h[8], 16) % 2 == 0 else -1
            vec[b] = vec.get(b, 0) + s
        vec = {b: w for b, w in vec.items() if w != 0}
        assert by_doc.get(doc_id, {}) == vec, f"doc {doc_id}"


# ---------------------------------------------------------------------------
# Phrase search
# ---------------------------------------------------------------------------


def test_phrase_search_counts_match_direct_scan(spark, sf_smoke):
    """The positional-join counts must equal a direct Python scan for
    the same top phrase, and the phrase must be the corpus argmax."""
    rows = _rows(spark, sf_smoke, "q_b7_phrase_search")
    assert rows
    phrase = rows[0].phrase
    assert all(r.phrase == phrase for r in rows)
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").collect()
    from collections import Counter

    bg_counts: Counter = Counter()
    per_doc: dict[int, int] = {}
    w1, w2 = phrase.split(" ")
    for d in docs:
        ts = [t for t in d.text.strip().lower().split() if t]
        for a, b in zip(ts, ts[1:]):
            bg_counts[(a, b)] += 1
            if (a, b) == (w1, w2):
                per_doc[d.doc_id] = per_doc.get(d.doc_id, 0) + 1
    best = min(
        (-(n), " ".join(k)) for k, n in bg_counts.items()
    )  # count desc, phrase asc
    assert best[1] == phrase
    assert {r.doc_id: r.n_occurrences for r in rows} == per_doc


# ---------------------------------------------------------------------------
# Warehouse ops (round-8 batch 2)
# ---------------------------------------------------------------------------


def test_percentiles_match_python_quantiles(spark, sf_smoke):
    """Exact-percentile contract: value at rank ceil(q*n) of the sorted
    cents list, recomputed in Python per group."""
    import math

    rows = _rows(spark, sf_smoke, "q_b8_percentiles")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    per_type = {}
    for r in ev.collect():
        per_type.setdefault(r.event_type, []).append(r.cents)
    for r in rows:
        vals = sorted(per_type[r.event_type])
        n = len(vals)
        assert r.n == n
        for name, q in [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]:
            expect = vals[math.ceil(q * n) - 1] / 100
            assert abs(getattr(r, name) - expect) < 1e-6, (r.event_type, name)
        assert r.p50 <= r.p95 <= r.p99


def test_gapfill_produces_dense_grid_with_locf(spark, sf_smoke):
    """After gap-fill every series is DENSE from its first observation to
    the global max hour, some cells are flagged filled (non-vacuous),
    and filled cells repeat the previous value."""
    rows = _rows(spark, sf_smoke, "q_b9_gapfill")
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    assert sum(r.filled for r in rows) > 0, "fixture has no hourly gaps?"
    hi = max(r.hr for r in rows)
    for et, rs in per_type.items():
        hrs = [r.hr for r in rs]
        assert hrs == list(range(hrs[0], hi + 1)), f"{et} grid not dense"
        for prev, cur in zip(rs, rs[1:]):
            if cur.filled:
                assert cur.value_locf == prev.value_locf


def test_ratio_to_parent_shares_sum_to_one(spark, sf_smoke):
    """Within each region the nation shares sum to 1; region shares of
    global sum to 1; every share is in (0, 1]."""
    rows = _rows(spark, sf_smoke, "q_ba_ratio_to_parent")
    regions = {}
    for r in rows:
        assert 0 < r.share_of_region <= 1
        assert 0 < r.region_share_of_global <= 1
        regions.setdefault(r.region, []).append(r)
    for reg, rs in regions.items():
        assert abs(sum(x.share_of_region for x in rs) - 1.0) < 1e-4, reg
    glob = {r.region: r.region_share_of_global for r in rows}
    assert abs(sum(glob.values()) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# Weighted SSSP
# ---------------------------------------------------------------------------


def test_weighted_sssp_matches_python_bellman_ford(spark, sf_smoke):
    """Golden: distances must equal a pure-Python bounded Bellman-Ford on
    the identically-built weighted graph; source at 0; triangle property
    (each round only improves)."""
    from pyspark_mllib_twitter_spark.plans.corpus_ops import (
        BFS_SOURCE,
        SSSP_ROUNDS,
    )

    rows = _rows(spark, sf_smoke, "q_bc_weighted_sssp")
    got = {r.node: r.dist for r in rows}
    assert got[BFS_SOURCE] == 0

    o = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    adj: dict[str, list] = {}
    for p in pairs:
        w = (p.o_custkey * 7 + p.l_suppkey * 13) % 97 + 1
        cu, su = f"c:{p.o_custkey}", f"s:{p.l_suppkey}"
        adj.setdefault(cu, []).append((su, w))
        adj.setdefault(su, []).append((cu, w))
    dist = {BFS_SOURCE: 0}
    for _ in range(SSSP_ROUNDS):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if v not in nxt or d + w < nxt[v]:
                    nxt[v] = d + w
        dist = nxt
    assert got == dist


# ---------------------------------------------------------------------------
# Compression-ratio quality
# ---------------------------------------------------------------------------


def test_compression_quality_matches_zlib(spark, sf_smoke):
    """Golden: ratios equal direct zlib level-6 calls; flags follow the
    thresholds; map-only (no exchange before the final sort)."""
    import zlib

    rows = _rows(spark, sf_smoke, "q_ns_compression_quality")
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .filter(F.col("doc_id") <= 25)
        .collect()
    }
    by_id = {r.doc_id: r for r in rows}
    for doc_id, text in docs.items():
        raw = (text or "").encode("utf-8")
        r = by_id[doc_id]
        assert r.n_bytes == len(raw)
        assert r.n_compressed == len(zlib.compress(raw, 6))
        expect = round(r.n_compressed / max(1, r.n_bytes), 6)
        assert abs(r.ratio - expect) < 1e-9
        assert r.too_repetitive == (1 if r.ratio < 0.25 else 0)
        assert r.too_random == (1 if r.ratio > 0.9 else 0)


# ---------------------------------------------------------------------------
# Decision stump
# ---------------------------------------------------------------------------


def test_stump_gains_match_python_entropy(spark, sf_smoke):
    """Golden: each boundary's information gain equals a direct Python
    entropy computation on the exact counts; gains are nonnegative."""
    import math

    rows = _rows(spark, sf_smoke, "q_bd_decision_stump")
    assert rows

    def h(p, n):
        if p == 0 or p == n:
            return 0.0
        q = p / n
        return -(q * math.log(q) + (1 - q) * math.log(1 - q))

    for r in rows:
        n = r.n_left + r.n_right
        p = r.pos_left + r.pos_right
        gain = (
            h(p, n)
            - (r.n_left / n) * h(r.pos_left, r.n_left)
            - (r.n_right / n) * h(r.pos_right, r.n_right)
        )
        assert abs(r.gain - round(gain, 6)) < 2e-6
        assert r.gain >= -1e-9


# ---------------------------------------------------------------------------
# Log-rank test
# ---------------------------------------------------------------------------


def test_logrank_matches_python_recomputation(spark, sf_smoke):
    """Golden: O1/E1/V/z recomputed with a pure-Python survival table
    (first purchase or censor at window end, arms by parity)."""
    import math

    r = _rows(spark, sf_smoke, "q_be_logrank")[0]
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    rows = ev.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
        (F.col("event_type") == "purchase").alias("is_p"),
    ).collect()
    d0 = min(x.day for x in rows)
    d1 = max(x.day for x in rows)
    per_user: dict[int, tuple[int, int]] = {}
    first_p: dict[int, int] = {}
    for x in rows:
        if x.is_p:
            first_p[x.user_id] = min(first_p.get(x.user_id, 10**9), x.day)
    users = {x.user_id for x in rows}
    table = {}
    for u in users:
        if u in first_p:
            table[u] = (first_p[u] - d0, 1)
        else:
            table[u] = (d1 - d0, 0)
    event_days = sorted({t for t, obs in table.values() if obs})
    o1 = e1 = v = 0.0
    for t in event_days:
        at_risk = [u for u, (tu, _) in table.items() if tu >= t]
        n = len(at_risk)
        n1 = sum(1 for u in at_risk if u % 2 == 1)
        d = sum(1 for u in at_risk if table[u] == (t, 1))
        dd1 = sum(1 for u in at_risk if table[u] == (t, 1) and u % 2 == 1)
        o1 += dd1
        e1 += round(d * n1 / n * 1e9) / 1e9
        if n > 1:
            v += round(d * (n1 / n) * (1 - n1 / n) * ((n - d) / (n - 1)) * 1e9) / 1e9
    assert r.o1 == o1
    assert abs(r.e1 - e1) < 2e-6
    assert abs(r.v - v) < 2e-6
    assert abs(r.z - (o1 - e1) / math.sqrt(v)) < 2e-5


# ---------------------------------------------------------------------------
# Item-item CF
# ---------------------------------------------------------------------------


def test_itemcf_neighbors_are_valid_and_ranked(spark, sf_smoke):
    """Structural contract: <= TOPK neighbors per item, rank contiguous
    from 1, cosine nonincreasing within an item (ties broken by id),
    cosine == cooc/sqrt(n_i*n_j) on the emitted exact counts."""
    from pyspark_mllib_twitter_spark.plans.mining_ops import (
        ITEMCF_MIN_COOC,
        ITEMCF_TOPK,
    )

    from pyspark_mllib_twitter_spark.plans.mining_ops import ITEMCF_MAX_BASKET

    rows = _rows(spark, sf_smoke, "q_bf_itemcf")
    assert rows
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    ui = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i"))
        .distinct()
    )
    ok = ui.groupBy("u").count().filter(F.col("count") <= ITEMCF_MAX_BASKET)
    n_by_item = {
        r.i: r.n
        for r in ui.join(ok.select("u"), "u")
        .groupBy("i")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_item = {}
    for r in rows:
        per_item.setdefault(r.item_i, []).append(r)
        assert r.cooc >= ITEMCF_MIN_COOC
        expect = round(r.cooc / (n_by_item[r.item_i] * n_by_item[r.item_j]) ** 0.5, 6)
        assert abs(r.cosine - expect) < 1e-9
    for i, rs in per_item.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= ITEMCF_TOPK
        for a, b in zip(rs, rs[1:]):
            assert a.cosine > b.cosine or (
                a.cosine == b.cosine and a.item_j < b.item_j
            )


# ---------------------------------------------------------------------------
# Profiling + incremental maintenance
# ---------------------------------------------------------------------------


def test_profile_matches_direct_aggregates(spark, sf_smoke):
    """Each profiled column's stats equal direct DataFrame aggregates."""
    rows = {r.column_name: r for r in _rows(spark, sf_smoke, "q_bg_profile")}
    src = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    n = src.count()
    ok = src.selectExpr("count(DISTINCT o_orderkey) AS nd",
                        "min(o_orderkey) AS mn", "max(o_orderkey) AS mx").first()
    r = rows["o_orderkey"]
    assert (r.n_nulls, r.n_distinct) == (n - src.filter(F.col("o_orderkey").isNotNull()).count() + 0, ok.nd)
    assert (r.min_value, r.max_value) == (str(ok.mn), str(ok.mx))
    assert set(rows) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "total_cents",
    }


def test_incremental_agg_equals_recompute(spark, sf_smoke):
    """The delta-merged rollup must equal a from-scratch recompute of the
    final row set (the oracle's definition, recomputed here in Spark)."""
    rows = {r.priority: r for r in _rows(spark, sf_smoke, "q_bh_incremental_agg")}
    src = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    final = src.filter(
        (F.col("o_orderkey") % 4 == 0)
        | ((F.col("o_orderkey") % 4 != 0) & (F.col("o_orderkey") % 8 != 1))
    )
    expect = {
        r.priority: (r.n, r.s)
        for r in final.groupBy("priority")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
        .collect()
    }
    assert {p: (r.n_rows, r.sum_cents) for p, r in rows.items()} == expect


# ---------------------------------------------------------------------------
# Batch sessionization (round 9)
# ---------------------------------------------------------------------------


def _py_sessions(events, gap_us):
    """Pure-Python gap sessionizer: {user: [(start, last, n), ...]}."""
    by_user = {}
    for uid, us in sorted(events):
        sess = by_user.setdefault(uid, [])
        if sess and us - sess[-1][1] <= gap_us:
            s, l, n = sess[-1]
            sess[-1] = (s, max(l, us), n + 1)
        else:
            sess.append((us, us, 1))
    return by_user


def test_sessionize_matches_pure_python(spark, sf_smoke):
    """q_dq_sessionize: per-user session stats must match an independent
    pure-Python gap sessionizer run on the same events."""
    from pyspark_mllib_twitter_spark.plans.behavior_ops import SESSION_GAP_US
    from pyspark_mllib_twitter_spark.sources import read_table

    ev = [
        (r.user_id, r.us)
        for r in read_table(spark, sf_smoke, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    ]
    golden = _py_sessions(ev, SESSION_GAP_US)
    got = {r.user_id: r for r in _rows(spark, sf_smoke, "q_dq_sessionize")}
    assert set(got) == set(golden)
    for uid, sessions in golden.items():
        r = got[uid]
        assert r.n_sessions == len(sessions)
        assert r.n_events == sum(n for _, _, n in sessions)
        assert r.max_events == max(n for _, _, n in sessions)
        want_avg = round(sum(l - s for s, l, _ in sessions) / len(sessions), 6)
        assert abs(r.avg_session_us - want_avg) < 1e-6


# ---------------------------------------------------------------------------
# Curation filter funnel (round 9)
# ---------------------------------------------------------------------------


def test_filter_funnel_composes_and_accounts_for_every_doc(spark, sf_smoke):
    """q_dt_filter_funnel: stages compose (n_in(k+1) = n_out(k)), drops
    are charged once, and total accounting holds: n_in(1) = corpus size,
    n_out(5) = survivors = n_in(1) - sum(drops)."""
    from pyspark_mllib_twitter_spark.sources import read_table

    rows = _rows(spark, sf_smoke, "q_dt_filter_funnel")
    assert [r.stage for r in rows] == [1, 2, 3, 4, 5]
    total = read_table(spark, sf_smoke, "documents").count()
    assert rows[0].n_in == total
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_out
    for r in rows:
        assert r.n_out == r.n_in - r.n_dropped
        assert 0 <= r.n_dropped <= r.n_in
    assert rows[-1].n_out == total - sum(r.n_dropped for r in rows)
    # The funnel is non-vacuous on the fixture: someone is dropped and
    # someone survives.
    assert sum(r.n_dropped for r in rows) > 0
    assert rows[-1].n_out > 0


def test_filter_funnel_first_fail_matches_pandas(spark, sf_smoke):
    """Per-rule drop counts must match an independent pandas
    recomputation of the ordered gates."""
    import pyarrow.parquet as pq

    d = pq.read_table(f"{sf_smoke}/documents.parquet").to_pandas()
    toks = d.text.str.lower().str.strip().str.split()
    n_tok = toks.str.len()
    n_dist = toks.apply(lambda t: len(set(t)))
    tok_chars = d.text.str.lower().str.strip().str.replace(
        r"\s+", "", regex=True
    ).str.len()
    lang = d.lang.fillna("")
    fail = []
    for i in range(len(d)):
        if not (100 <= d.n_chars.iloc[i] <= 520):
            fail.append(1)
        elif lang.iloc[i] not in ("en", "de", "fr", "es"):
            fail.append(2)
        elif n_tok.iloc[i] < 25:
            fail.append(3)
        elif n_dist.iloc[i] * 10 < n_tok.iloc[i] * 4:
            fail.append(4)
        elif not (n_tok.iloc[i] * 42 <= tok_chars.iloc[i] * 10 <= n_tok.iloc[i] * 48):
            fail.append(5)
        else:
            fail.append(0)
    want = {s: fail.count(s) for s in range(1, 6)}
    got = {r.stage: r.n_dropped for r in _rows(spark, sf_smoke, "q_dt_filter_funnel")}
    assert got == want
