"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query recipe and its DuckDB oracle SQL over the same parquet
tables, normalizes both results (columns sorted by name, floats rounded to
6dp, timestamps/dates as ISO strings, rows sorted), and diffs them. Used by
tests/test_oracle.py so every declared query is verified locally before the
driver's t2 gate sees it.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # collapse -0.0
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def run_spark(spec, spark, sf_dir: str):
    df = spec.spark(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


def run_oracle(spec, con) -> tuple[list[tuple], list[str]]:
    cur = con.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


def compare(spec, spark, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_rows, s_cols = run_spark(spec, spark, sf_dir)
    con = duckdb_connection(sf_dir)
    try:
        o_rows, o_cols = run_oracle(spec, con)
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    sn = normalize(s_rows, s_cols)
    on = normalize(o_rows, o_cols)
    if sn != on:
        diffs = [
            f"  row {i}: spark={a} oracle={b}"
            for i, (a, b) in enumerate(zip(sn, on))
            if a != b
        ]
        if not diffs and len(sn) != len(on):
            diffs = [f"  length {len(sn)} vs {len(on)}"]
        problems.append("value mismatch:\n" + "\n".join(diffs[:10]))
    return problems
