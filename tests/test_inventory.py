"""Golden + hypothesis tests for the (s, Q) inventory simulation."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_mllib_twitter_spark.operators.inventory import (
    simulate_inventory,
    simulate_inventory_py,
)


def test_policy_hand_worked_example():
    """Hand-traced: start 10, reorder below 5, order 10, lead 1 day."""
    days = [(0, 4), (1, 4), (2, 6), (3, 2)]
    # d0: stock 10-4=6 (>=5, no order)
    # d1: 6-4=2 <5 -> order, arrives d2
    # d2: receive 10 -> 12; 12-6=6
    # d3: 6-2=4 <5 -> order (in flight at end)
    total, unmet, stockouts, reorders, stock = simulate_inventory_py(
        days, start_stock=10, reorder_point=5, order_qty=10, lead_days=1
    )
    assert (total, unmet, stockouts, reorders, stock) == (16, 0, 0, 2, 4)


def test_stockout_and_lost_sales():
    days = [(0, 8), (1, 8)]
    total, unmet, stockouts, reorders, stock = simulate_inventory_py(
        days, start_stock=10, reorder_point=5, order_qty=10, lead_days=2
    )
    # d0: 10-8=2 <5 -> order arrives d2 (never, horizon ends d1)
    # d1: demand 8, stock 2 -> serve 2, unmet 6, stock 0
    assert (total, unmet, stockouts, reorders, stock) == (16, 6, 1, 1, 0)


@given(
    demands=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    start=st.integers(min_value=0, max_value=200),
    rp=st.integers(min_value=0, max_value=100),
    q=st.integers(min_value=1, max_value=200),
    lead=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=200, deadline=None)
def test_invariants(demands, start, rp, q, lead):
    days = list(enumerate(demands))
    total, unmet, stockouts, reorders, stock = simulate_inventory_py(
        days, start, rp, q, lead
    )
    assert total == sum(demands)
    assert 0 <= unmet <= total
    assert 0 <= stockouts <= len(days)
    # Conservation: served = total - unmet; stock = start + receipts - served.
    served = total - unmet
    receipts_upper = reorders * q
    assert stock >= 0
    assert start + receipts_upper - served >= stock  # at most all orders landed
    # With an infinite start stock there are never stockouts.
    t2, u2, s2, r2, _ = simulate_inventory_py(days, 10**9, rp, q, lead)
    assert (u2, s2) == (0, 0)


def test_distributed_matches_reference(spark):
    pdf = pd.DataFrame(
        {
            "item_id": [1, 1, 1, 2, 2, 2, 2],
            "day_idx": [0, 1, 2, 0, 1, 1, 3],
            "qty": [4, 4, 6, 8, 4, 4, 8],
        }
    )
    out = {
        r["item_id"]: r
        for r in simulate_inventory(
            spark.createDataFrame(pdf),
            start_stock=10,
            reorder_point=5,
            order_qty=10,
            lead_days=1,
        ).collect()
    }
    # item 2's day 1 has TWO rows (4+4) — the pre-aggregation must merge
    # them before the recurrence runs.
    ref1 = simulate_inventory_py([(0, 4), (1, 4), (2, 6)], 10, 5, 10, 1)
    ref2 = simulate_inventory_py([(0, 8), (1, 8), (3, 8)], 10, 5, 10, 1)
    for item, ref in ((1, ref1), (2, ref2)):
        got = out[item]
        assert (
            got["total_demand"],
            got["unmet_demand"],
            got["n_stockout_days"],
            got["n_reorders"],
            got["end_stock"],
        ) == ref


def test_rejects_unsorted_duplicate_days():
    with pytest.raises(ValueError):
        simulate_inventory_py([(1, 2), (1, 3)], 10, 5, 10, 1)
