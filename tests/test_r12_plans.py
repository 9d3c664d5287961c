"""Physical-plan pins for the r12 registrations: the WAV witness must
stay a single linear Arrow pass (no exchange at all), the KMV sketch's
windows must all be partitioned (the salted two-phase top-k exists
precisely so no task ever sorts a week's full user set), and the
degree histogram must reuse the shared posting frame rather than
re-shingling."""

from __future__ import annotations

import re

from tests.conftest import plan_string as _plan


def test_synth_wav_inventory_no_exchange(spark):
    """Encode→decode stays inside the Arrow batch: one projected scan
    into one mapInPandas — any Exchange means doc bytes started
    shuffling."""
    plan = _plan(spark, "synth_wav_inventory")
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    # column pruning: only (doc_id, n_chars) reach the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) \
        == {"doc_id", "n_chars"}


def test_kmv_windows_all_partitioned(spark):
    """Every window in the KMV plan carries a non-empty PARTITION BY
    (wk+salt local rank, then wk refine over ≤ salts·k rows) — an
    unpartitioned row_number would be a single-task global sort of
    the corpus' distinct users."""
    plan = _plan(spark, "kmv_weekly_user_overlap")
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows  # the sketch is window-built
    for ln in windows:
        assert re.search(r"Window \[[^\]]*\], \[.+?\], \[", ln), (
            f"unpartitioned window in kmv plan: {ln.strip()}")


def test_dup_degree_rides_shared_postings(spark):
    """The degree histogram must join off the (persisted) shared
    posting frame — InMemoryTableScan in the plan — not re-shingle
    the documents table per run."""
    plan = _plan(spark, "dup_degree_distribution")
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_ship_lag_joins_on_order_key(spark):
    """Fact⋈fact equi-join keyed on the order key (the bucketed
    co-location key at scale) and never a nested loop."""
    plan = _plan(spark, "ship_lag_by_priority")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(l_orderkey|o_orderkey)#\d+", plan)


def test_token_length_histogram_pushes_projection(spark):
    """Only the text column reaches the scan (the explode is over one
    projected column, never the whole documents row)."""
    plan = _plan(spark, "token_length_histogram")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) \
        == {"text"}
