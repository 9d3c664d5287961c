"""Physical-plan pins for the r15 registrations (r14 verdict task 3 —
pin on registration day): the sessionizer SLA must keep every window
partitioned by user_id and collapse in two exchanges; all dim joins in
the relational four must broadcast (never cartesian, never a shuffled
small side); the join-free basket profile must stay exactly two
map-side-combined exchanges."""

from __future__ import annotations

import re

from tests.conftest import plan_string as _plan


def test_session_duration_percentiles_windows_partitioned(spark):
    """Both sessionizer windows (lag + running sum) ride ONE user_id
    partitioning — an unpartitioned window would be a single-task
    global sort of events — and the whole plan is two exchanges:
    the user_id shuffle plus the final single-partition percentile."""
    plan = _plan(spark, "session_duration_percentiles")
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows
    for ln in windows:
        assert re.search(r"Window \[[^\]]*\], \[.+?\], \[", ln), (
            f"unpartitioned window: {ln.strip()}")
    assert len(re.findall(r"\bExchange\b", plan)) == 2, plan
    assert "partial" in plan


def test_region_trade_flow_dims_broadcast(spark):
    """customer/supplier/nation/region lookups all broadcast (at
    sf0.001 the statically-estimated orders side broadcasts too);
    nothing degenerates to a cartesian or a broadcast nested loop."""
    plan = _plan(spark, "region_trade_flow")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\bBroadcastHashJoin\b", plan)) >= 3, plan
    assert "partial" in plan


def test_order_fulfillment_days_two_exchanges(spark):
    """Per-order max shuffles on the order key, the histogram on the
    week key — two exchanges with partial aggregation below each
    (the orders join broadcasts at this SF; at scale it rides the
    same order key, adding no third shuffle shape)."""
    plan = _plan(spark, "order_fulfillment_days")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\bExchange\b", plan)) == 2, plan
    assert "partial" in plan


def test_brand_return_rate_broadcast_single_shuffle(spark):
    """The part dim broadcasts (the fact side never shuffles for the
    join), so the ONLY exchange is the ~25-row brand groupBy with
    its map-side combine below."""
    plan = _plan(spark, "brand_return_rate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    assert "partial" in plan


def test_basket_size_value_profile_join_free(spark):
    """No joins at all: groupBy(l_orderkey) then groupBy(n_lines) —
    exactly two exchanges, both map-side combined."""
    plan = _plan(spark, "basket_size_value_profile")
    assert not re.search(r"\w*Join", plan), plan
    assert len(re.findall(r"\bExchange\b", plan)) == 2, plan
    assert "partial" in plan
