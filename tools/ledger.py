"""Cumulative driver-correctness ledger — makes window rotation mechanical.

Reads every ``CORRECTNESS_r*.json`` (driver output: top-level dict keyed by
the then-public query name → {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}), folds it per BASE name, and reports:

- per-entry LAST status (green / rows-only / FAILED) + the round it came from
- entries that have NEVER had a driver row, split oracle-backed vs rows-only
- a suggested next CHECK_WINDOW (oldest-registered never-checked first,
  oracle-backed before rows-only, capped at 50)
- with ``--survey-table``: the generated per-entry markdown status table
  embedded in SURVEY.md §2.12 (regenerate + paste after each round's
  CORRECTNESS file lands; round-10 verdict task #6 replaced the accreted
  round-notes prose with this table)

Usage: python tools/ledger.py [--window] [--survey-table]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _base(name: str) -> str:
    # The registry's own prefix-stripping, not a re-implementation — a
    # format change there must keep reclassifying ledger names correctly.
    from pyspark_mllib_twitter_spark.plans.registry import base_name

    return base_name(name)


def load_ledger(repo_dir: str = ".") -> dict[str, tuple[int, str]]:
    """base name -> (last round seen, last status)."""
    return {k: (last, st) for k, (first, last, st) in load_full_ledger(repo_dir).items()}


def load_full_ledger(repo_dir: str = ".") -> dict[str, tuple[int, int, str]]:
    """base name -> (first round seen, last round seen, last status)."""
    ledger: dict[str, tuple[int, int, str]] = {}
    # Numeric round order, not lexicographic: zero-padded r01..r99 happens to
    # sort correctly as strings, but r100 would sort between r10 and r11 and
    # silently let an older round's status overwrite a newer one.
    # Anchored to the basename: a checkout directory containing "_r<digits>"
    # (e.g. /tmp/repo_r2/) must not misparse every file's round (r11 advice).
    def _round_of(path: str) -> int | None:
        # None for non-canonical names the glob can still match (e.g.
        # CORRECTNESS_r12_old.json) — skipped, not an AttributeError (r12 advice).
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        return int(m.group(1)) if m else None

    paths = [
        p
        for p in glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))
        if _round_of(p) is not None
    ]
    for path in sorted(paths, key=_round_of):
        rnd = _round_of(path)
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # The driver's record for a rows-only entry: registered,
                # executed, no DuckDB twin — the expected weaker check.
                status = "rows-only"
            elif row.get("err"):
                status = f"ERROR: {str(row['err'])[:60]}"
            elif row.get("hash_match"):
                status = "green"
            elif row.get("hash_match") is None and row.get("rows_match") is not False:
                status = "rows-only"
            elif all(
                row.get(k) is None
                for k in ("rows_match", "schema_match", "hash_match")
            ):
                status = "rows-only"
            else:
                status = "FAILED"
            b = _base(name)
            first = ledger[b][0] if b in ledger else rnd
            ledger[b] = (first, rnd, status)
    return ledger


def main() -> None:
    from pyspark_mllib_twitter_spark.plans import REGISTRY
    from pyspark_mllib_twitter_spark.plans.registry import base_name

    # Registration order: REGISTRY is an insertion-ordered dict.
    reg_order = [base_name(n) for n in REGISTRY]
    has_oracle = {base_name(n): s.oracle is not None for n, s in REGISTRY.items()}
    ledger = load_ledger(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    bad = {k: v for k, v in ledger.items() if v[1] not in ("green", "rows-only")}
    never = [k for k in reg_order if k not in ledger]
    never_oracle = [k for k in never if has_oracle[k]]
    never_rowsonly = [k for k in never if not has_oracle[k]]
    stale = {k for k in ledger if k not in has_oracle}

    print(f"registry entries : {len(reg_order)}")
    print(f"ever checked     : {len([k for k in reg_order if k in ledger])}")
    print(f"last-status bad  : {len(bad)}")
    for k, (rnd, st) in sorted(bad.items()):
        print(f"  r{rnd} {k}: {st}")
    if stale:
        print(f"ledger names not in registry (renamed/removed): {sorted(stale)}")
    print(f"never checked    : {len(never)} "
          f"({len(never_oracle)} oracle-backed + {len(never_rowsonly)} rows-only)")
    print("  oracle-backed:", " ".join(never_oracle) or "(none)")
    print("  rows-only    :", " ".join(never_rowsonly) or "(none)")

    if "--window" in sys.argv:
        suggestion = (never_oracle + never_rowsonly)[:50]
        if not suggestion:
            # Ledger closed (round 11): every entry has a driver row. The
            # rotation policy becomes evidence FRESHNESS — re-check the
            # entries whose last driver row is oldest, oracle-backed
            # first within each round, registration order as tie-break.
            reg_pos = {k: i for i, k in enumerate(reg_order)}
            stale_first = sorted(
                (k for k in reg_order if k in ledger),
                key=lambda k: (ledger[k][0], not has_oracle[k], reg_pos[k]),
            )
            suggestion = stale_first[:50]
            print("\nledger CLOSED — suggesting the 50 stalest-evidence "
                  "entries for re-validation:")
        else:
            print("\nsuggested CHECK_WINDOW (paste into plans/registry.py):")
        for n in suggestion:
            print(f'    "{n}",')

    if "--survey-table" in sys.argv:
        full = load_full_ledger(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        print("\n| entry | check | first driver row | last driver row | last status |")
        print("|---|---|---|---|---|")
        for k in reg_order:
            kind = "oracle" if has_oracle[k] else "rows-only"
            if k in full:
                first, last, st = full[k]
                print(f"| {k} | {kind} | r{first} | r{last} | {st} |")
            else:
                print(f"| {k} | {kind} | — | — | never driver-checked |")


if __name__ == "__main__":
    main()
