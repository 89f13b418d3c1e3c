#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named registry queries to files.

Usage::

    python tools/dump_plans.py --out plans/r14 --suffix _before q_zh_poisson_bootstrap ...

Writes ``<out>/<base_name><suffix>.txt`` per query. Plan-only for most
queries: builds each DataFrame and formats its plan without executing it
(beyond the bounded scan-partition probes some recipes do while planning).
EXCEPTIONS (r14 advice #4): recipes that pin a probe-sized intermediate
with ``localCheckpoint(eager=True)`` — q_em_fuzzy_decontaminate and
q_ef_minhash_delta_index (which also rebuilds its bucketed index table) —
run those upstream jobs at DataFrame-construction time; dumping their
plans is not job-free.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyspark_mllib_twitter_spark.plans import REGISTRY
    from pyspark_mllib_twitter_spark.plans.registry import base_name
    from pyspark_mllib_twitter_spark.session import get_spark

    spark = get_spark("dump-plans")
    os.makedirs(os.path.join(_REPO, args.out), exist_ok=True)
    by_base = {base_name(n): n for n in REGISTRY}
    for want in args.names:
        name = want if want in REGISTRY else by_base.get(want)
        if name is None:
            print(f"SKIP unknown query {want}", file=sys.stderr)
            continue
        df = REGISTRY[name].spark(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(_REPO, args.out, f"{base_name(name)}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
