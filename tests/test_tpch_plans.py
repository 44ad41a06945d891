"""Plan-shape assertions for the TPC-H completion suite: the scale
contract for the 13 added query shapes. Values are proven by
test_oracle_parity; these prove the physical plans are the ones that
survive a 100x scale-up."""

from __future__ import annotations

import pytest

from pac_spark.operators import tpch as T
from tests.test_plans import _exec_plan

ALL = [
    T.q2_top_balance_supplier,
    T.q7_volume_shipping,
    T.q8_market_share,
    T.q9_product_profit,
    T.q10_returned_items,
    T.q11_important_parts,
    T.q12_ship_delay_priority,
    T.q14_promo_revenue,
    T.q15_top_supplier,
    T.q16_supplier_part_counts,
    T.q19_discounted_revenue,
    T.q20_heavy_promo_suppliers,
    T.q21_last_to_ship,
]


@pytest.mark.parametrize("fn", ALL, ids=[f.__name__ for f in ALL])
def test_no_cartesian_product(spark, sf_dir, fn):
    """No TPC-H shape may plan an unkeyed cross product. The only
    nested-loop joins allowed are 1-row scalar-subquery broadcasts
    (q11/q15/q20 thresholds), which AQE plans as
    BroadcastNestedLoopJoin over a single-row side."""
    assert "CartesianProduct" not in _exec_plan(fn(spark, sf_dir))


def test_q2_rank_filter_plans_window_group_limit(spark, sf_dir):
    """rank()==1 must push into WindowGroupLimit (per-partition top-1
    retained before the full window sort) — at scale this is the
    difference between sorting every part's supplier list and keeping
    one row per part per task."""
    assert "WindowGroupLimit" in _exec_plan(T.q2_top_balance_supplier(spark, sf_dir))


def test_q10_top20_is_take_ordered(spark, sf_dir):
    """The top-20 must run as TakeOrderedAndProject (per-partition
    heaps + driver merge), never a global sort."""
    assert "TakeOrderedAndProject" in _exec_plan(T.q10_returned_items(spark, sf_dir))


def test_q21_single_window_exchange(spark, sf_dir):
    """Both per-order window aggregates must share one exchange on
    l_orderkey — the plan replaces Q21's traditional double self-join
    with windows precisely to pay that shuffle once."""
    plan = _exec_plan(T.q21_last_to_ship(spark, sf_dir))
    assert plan.count("Window") >= 2
    # windows run back-to-back: no exchange between the two Window ops
    between = plan.split("Window")[1]
    assert "Exchange" not in between


def test_q16_exclusion_is_anti_join(spark, sf_dir):
    """NOT IN (negative-balance suppliers) must plan as a broadcast
    anti join against the filtered supplier scan."""
    plan = _exec_plan(T.q16_supplier_part_counts(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_qualifier_is_semi_join(spark, sf_dir):
    """The qualifying-supplier set must gate the supplier scan through
    a semi join (one row per supplier, no fan-out)."""
    assert "LeftSemi" in _exec_plan(T.q20_heavy_promo_suppliers(spark, sf_dir))
