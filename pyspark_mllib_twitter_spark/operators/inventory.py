"""Inventory replenishment simulation (capped running balance).

The classic "cumulative sum with a floor and conditional refill" —
NOT window-expressible in SQL (each day's stock depends on the
previous day's post-decision state, a non-associative recurrence), so
this is one of the engine's sanctioned Python escape hatches: an
Arrow-batched ``applyInPandas`` per item, sequential only WITHIN an
item's (calendar-bounded) day series, fully parallel ACROSS items.

Policy (the textbook (s, Q) reorder rule, any operations-research
text): start at ``start_stock``; each day satisfy demand from stock
(unmet demand is lost, not back-ordered); if end-of-day stock falls
below ``reorder_point`` and no order is in flight, place an order of
``order_qty`` that arrives after ``lead_days`` days.

At 100 TB: demand first collapses to (item, day, qty) grain — one
map-side-combinable shuffle — so the Python stage sees per-item daily
series bounded by the calendar, never raw order lines. Items partition
arbitrarily; state never crosses groups.

Reference scope: the reference (COMP5349_2.py:1-211) has no such
surface; north-star warehouse-operations mandate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SIM_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("n_days", LongType()),
        StructField("total_demand", LongType()),
        StructField("unmet_demand", LongType()),
        StructField("n_stockout_days", LongType()),
        StructField("n_reorders", LongType()),
        StructField("end_stock", LongType()),
    ]
)


def simulate_inventory_py(
    days: list[tuple[int, int]],
    start_stock: int,
    reorder_point: int,
    order_qty: int,
    lead_days: int,
) -> tuple[int, int, int, int, int]:
    """Pure-Python single-item reference policy (also the golden oracle
    in tests). ``days`` = sorted (day_idx, demand). Days without demand
    between observed days still advance in-flight orders. Returns
    (total_demand, unmet, stockout_days, reorders, end_stock)."""
    stock, unmet, stockouts, reorders = start_stock, 0, 0, 0
    arrive_day = None  # day the open order lands (None = none in flight)
    total = 0
    prev_day = None
    for day, demand in days:
        if prev_day is not None and day <= prev_day:
            raise ValueError("days must be strictly increasing")
        if arrive_day is not None and day >= arrive_day:
            stock += order_qty
            arrive_day = None
        total += demand
        served = min(stock, demand)
        if served < demand:
            unmet += demand - served
            stockouts += 1
        stock -= served
        if stock < reorder_point and arrive_day is None:
            reorders += 1
            arrive_day = day + lead_days
        prev_day = day
    if arrive_day is not None:
        # order still in flight at horizon end: count it, don't receive.
        pass
    return total, unmet, stockouts, reorders, stock


def simulate_inventory(
    demand: DataFrame,
    item_col: str = "item_id",
    day_col: str = "day_idx",
    qty_col: str = "qty",
    start_stock: int = 500,
    reorder_point: int = 100,
    order_qty: int = 500,
    lead_days: int = 1,
) -> DataFrame:
    """Distributed (s, Q) simulation: one summary row per item."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(day_col)
        days = list(
            zip(pdf[day_col].astype(int).tolist(), pdf[qty_col].astype(int).tolist())
        )
        total, unmet, stockouts, reorders, stock = simulate_inventory_py(
            days, start_stock, reorder_point, order_qty, lead_days
        )
        return pd.DataFrame(
            {
                "item_id": [int(pdf[item_col].iloc[0])],
                "n_days": [len(days)],
                "total_demand": [total],
                "unmet_demand": [unmet],
                "n_stockout_days": [stockouts],
                "n_reorders": [reorders],
                "end_stock": [stock],
            }
        )

    # Collapse to (item, day) grain FIRST — the Python stage must see
    # calendar-bounded series, not raw lines.
    daily = demand.groupBy(item_col, day_col).agg(
        F.sum(qty_col).cast("bigint").alias(qty_col)
    )
    return daily.groupBy(item_col).applyInPandas(run, SIM_SCHEMA)
