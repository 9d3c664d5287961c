"""Physical-plan pins for the r16 registrations (pinned in the same
commit as the registration, per the r12+ discipline): the retention
curve's only non-equi joins are the two broadcast range/horizon joins
over tiny rollups; the tenure and weekday rollups stay map-side
combined with bounded exchanges; dedup_prefix stays join-free (one
row per doc — no shingle explosion); the cosine sweep's window runs
over the ≤16-row histogram only."""

from __future__ import annotations

import re

from tests.conftest import plan_string as _plan


def test_user_retention_curve_no_corpus_nonequi_join(spark):
    """The corpus-sized frames (events scan, first-day rollup, the
    (day,user) distinct) meet only in EQUI joins; the two
    BroadcastNestedLoopJoins are the 1-row horizon cross and the
    ≤|days|²-row eligibility range join — both explicitly broadcast
    tiny rollups, never a corpus side."""
    plan = _plan(spark, "user_retention_curve")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)) <= 2, plan
    assert "partial" in plan


def test_value_by_user_tenure_single_fact_shuffle(spark):
    """First-day rollup shuffles on user_id once; the join broadcasts
    the user-sized side at this SF; the band groupBy (with its
    countDistinct expansion) is map-side combined — no cartesian,
    no unbroadcast small side."""
    plan = _plan(spark, "value_by_user_tenure")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert len(re.findall(r"\bExchange\b", plan)) <= 3, plan
    assert "partial" in plan


def test_order_weekday_profile_join_free_one_exchange(spark):
    """One linear scan into a 7-row groupBy: exactly one exchange,
    partial aggregation below it, no joins at all."""
    plan = _plan(spark, "order_weekday_profile")
    assert not re.search(r"\w*Join", plan), plan
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan
    assert "partial" in plan


def test_dedup_prefix_join_free_two_exchanges(spark):
    """No joins and no explode — one row per doc into the prefix
    groupBy; the countDistinct(source) expansion costs the second
    exchange, both map-side combined."""
    plan = _plan(spark, "dedup_prefix")
    assert not re.search(r"\w*Join", plan), plan
    assert "Generate" not in plan  # no shingle explosion
    assert len(re.findall(r"\bExchange\b", plan)) == 2, plan
    assert "partial" in plan


def test_cosine_threshold_sweep_window_on_histogram_only(spark):
    """The IVF candidate machinery stays equi/broadcast (never
    cartesian); exactly ONE window exists and it runs over the
    bucket histogram — a frame already collapsed by an aggregation,
    so the single-partition sort is ≤~16 rows."""
    plan = _plan(spark, "cosine_threshold_sweep")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    windows = re.findall(r"\bWindow \[", plan)
    assert len(windows) == 1, plan
    assert "partial" in plan
