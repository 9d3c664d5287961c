"""Physical-plan pins for the r13 + r14 registrations (r13 verdict
task 6): every codec witness must stay ONE linear Arrow pass — a
projected (doc_id, n_chars) scan into one mapInPandas, no Exchange,
so no synthesized image bytes ever shuffle; the simhash histogram
must ride the pigeonhole equi-join over the shared persisted posting
frame (never a cartesian, never a re-shingle); the two analytics
pins hold their one-shuffle shapes."""

from __future__ import annotations

import re

import pytest

from tests.conftest import plan_string as _plan

WITNESSES = [
    "synth_png_inventory",
    "synth_jpeg_inventory",
    "synth_gif_inventory",
    "synth_jpeg_lossless_inventory",
    "synth_tiff_inventory",
    "synth_exif_inventory",
]


@pytest.mark.parametrize("name", WITNESSES)
def test_codec_witness_one_arrow_pass(spark, name):
    """Encode→decode stays inside the Arrow batch: any Exchange means
    image/audio bytes started shuffling, and a wider ReadSchema means
    the witness stopped pruning the documents scan."""
    plan = _plan(spark, name)
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) \
        == {"doc_id", "n_chars"}, f"{name} scan not pruned: {m}"


def test_simhash_histogram_no_cartesian_rides_postings(spark):
    """Candidates come from the 8-bit pigeonhole BLOCK equi-join —
    a hash/sort-merge join, never an all-pairs nested loop — and the
    sketch builds off the shared persisted posting frame instead of
    re-shingling documents."""
    plan = _plan(spark, "simhash_hamming_histogram")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_customer_order_gap_weeks_windows_partitioned(spark):
    """The consecutive-order lag rides ONE o_custkey-partitioned
    window (per-customer sequences are short); an unpartitioned
    window would be a single-task global sort of orders."""
    plan = _plan(spark, "customer_order_gap_weeks")
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows
    for ln in windows:
        assert re.search(r"Window \[[^\]]*\], \[.+?\], \[", ln), (
            f"unpartitioned window: {ln.strip()}")


def test_user_weekly_regularity_no_global_window(spark):
    """Distinct + two groupBys only: no window at all, no cartesian —
    the decile is arithmetic on per-user aggregates, so the plan is
    map-side-combined hash aggregation end to end."""
    plan = _plan(spark, "user_weekly_regularity")
    assert "Window [" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_discount_band_revenue_single_shuffle(spark):
    """ONE groupBy onto ≤ ~101 band rows: exactly one exchange
    (the band-key shuffle) with partial aggregation below it — a
    second exchange would mean the map-side combine was lost."""
    plan = _plan(spark, "discount_band_revenue")
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    assert n_exchanges == 1, f"expected 1 exchange, plan:\n{plan}"
    assert "partial" in plan  # map-side combine present
