"""Query registry: every engine capability is declared here as a named query.

Each entry pairs a Spark DataFrame recipe ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL string the DuckDB oracle
runs on the same parquet tables. The driver compares row count + schema +
order-insensitive value hash — so every computed column is aliased to the
SAME name on both sides, floats are left for the driver to round (6dp), and
every query has a total ORDER BY for determinism.

Naming: registrations use stable descriptive *base* names (``q_j_asof``,
``q_stream_window_counts`` …). External checkers process the registry
alphabetically under a bounded budget (first 50 sorted names), so each round
``CHECK_WINDOW`` pins the 50 entries that most need a fresh external
correctness row: the registered public name becomes ``q_{idx:03d}_{base}``
for window members (digits sort before letters, so exactly the window lands
in the checked slots) while everything else keeps its base name. Rotating
the window between rounds is a one-list edit here — no registration or test
changes. Lookup by base name always resolves regardless of current window.

Round-9 window — ledger convergence (round-8 verdict task #3): the 50
OLDEST of the 104 oracle-backed entries that have never had a driver
row, in registration order — the eight round-7 stragglers
(``q_ag/q_ai/q_al/q_am/q_an/q_ao/q_ap/q_aq``), the ``q_as``-``q_ay``
behavior/science block, the full ``q_b1``-``q_bv`` block plus
``q_bx_sprt``/``q_bz_timed_funnel``, and ``q_c1_allen_relations``/
``q_c3_hill_tail``. Queued for round 10: the remaining 54 oracle-backed
never-checked entries (``q_c4``-``q_dp``, ``q_sb_docstore_merge``,
``q_stream_hll/kmv/lateness``), the 13 rows-only never-checked entries,
and the five round-9 additions (``q_dq_sessionize``,
``q_dt_filter_funnel``, ``q_ds_curriculum_interleave``, plus rows-only
``q_stream_tws``/``q_stream_tws_timers``). Round-9 registry additions
were CAPPED at those five (budget <= 15) so the backlog keeps shrinking
toward one window.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Base names (in prefix order) pinned into the externally-checked window this
# round. Must name registered entries; length <= 50 asserted at import.
CHECK_WINDOW: list[str] = [
    # -- round-7 stragglers (the 8 that missed the round-8 window) ----------
    "q_ag_rake_keywords",
    "q_ai_isotonic",
    "q_al_sax",
    "q_am_backtest",
    "q_an_readability",
    "q_ao_impute",
    "q_ap_dp_counts",
    "q_aq_path_prefixes",
    # -- behavior/science block q_as..q_ay (round-8) -------------------------
    "q_as_funnel",
    "q_at_retention",
    "q_au_did",
    "q_av_edit_distance_join",
    "q_aw_hll_distinct",
    "q_ax_haar_wavelet",
    "q_ay_roc_curve",
    # -- q_b1..q_bv block (round-8) ------------------------------------------
    "q_b1_jackknife_ratio",
    "q_b2_stl_decompose",
    "q_b3_containment_join",
    "q_b4_modularity",
    "q_b5_psi",
    "q_b6_feature_hashing",
    "q_b7_phrase_search",
    "q_b8_percentiles",
    "q_b9_gapfill",
    "q_ba_ratio_to_parent",
    "q_bb_cdc_apply",
    "q_bc_weighted_sssp",
    "q_bd_decision_stump",
    "q_be_logrank",
    "q_bf_itemcf",
    "q_bg_profile",
    "q_bh_incremental_agg",
    "q_bi_bh_fdr",
    "q_bj_peak_concurrency",
    "q_bk_weighted_median",
    "q_bl_kendall_tau",
    "q_bm_nelson_aalen",
    "q_bn_fellegi_sunter",
    "q_bo_vwap",
    "q_bp_simpson",
    "q_bq_brier",
    "q_br_fk_orphans",
    "q_bs_mase",
    "q_bt_diversified_topk",
    "q_bu_negative_sampling",
    "q_bv_skew_advisor",
    "q_bx_sprt",
    "q_bz_timed_funnel",
    # -- first two of the q_c block (round-8) --------------------------------
    "q_c1_allen_relations",
    "q_c3_hill_tail",
    # Queued for round 10 (the window only holds 50): q_c4..q_dp,
    # q_sb_docstore_merge, q_stream_hll/kmv/lateness, and the 13
    # never-checked rows-only entries — see module docstring.
]

# Hard errors, not asserts: these guards must survive python -O (a typo'd
# window silently wastes externally-checked slots otherwise).
if len(CHECK_WINDOW) > 50:
    raise ValueError("CHECK_WINDOW exceeds the external checker's 50 slots")
if len(set(CHECK_WINDOW)) != len(CHECK_WINDOW):
    raise ValueError("duplicate CHECK_WINDOW entry")

_PREFIX_RE = re.compile(r"^q_\d{3}_")


def base_name(name: str) -> str:
    """Stable base name for a registered (possibly window-prefixed) name."""
    return _PREFIX_RE.sub("q_", name)


def public_name(base: str) -> str:
    """Registered (externally visible) name for a base query name."""
    try:
        idx = CHECK_WINDOW.index(base)
    except ValueError:
        return base
    return f"q_{idx + 1:03d}_{base[2:]}"


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check


class _Registry(dict):
    """Dict keyed by public name; lookup by base name always resolves, and
    lookup by a stale ``q_NNN_``-prefixed name falls back to its base."""

    def __missing__(self, key: str) -> QuerySpec:
        pub = public_name(key)
        if pub != key and dict.__contains__(self, pub):
            return dict.__getitem__(self, pub)
        base = _PREFIX_RE.sub("q_", key)
        if base != key:
            return self[base]  # may recurse once into public_name branch
        raise KeyError(key)

    def __contains__(self, key: object) -> bool:  # keep `in` consistent
        try:
            self[key]  # type: ignore[index]
        except KeyError:
            return False
        return True


REGISTRY: _Registry = _Registry()


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a Spark query recipe under base name ``name``; the
    public name gains a check-priority prefix while ``name`` is in
    ``CHECK_WINDOW``. ``oracle`` is the DuckDB twin SQL (None → rows-only)."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        pub = public_name(name)
        if dict.__contains__(REGISTRY, pub):
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[pub] = QuerySpec(name=pub, spark=fn, oracle=oracle)
        return fn

    return wrap
