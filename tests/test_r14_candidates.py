"""Round-12+ registration candidates (fourth pool): built,
oracle-twinned, and parity-tested now; driver registration deferred to
keep the verify-window rotation draining (SURVEY §7 budget).  Five
ops: customer_order_gap_weeks (repeat-purchase cadence histogram),
user_weekly_regularity (engagement-regularity deciles),
discount_band_revenue (promo-effectiveness rollup),
mktsegment_order_stats (segment demand planning table), and
simhash_hamming_histogram (dedup radius-tuning diagnostics)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ------------------------------------------- purchase cadence


def test_customer_order_gap_weeks_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        CUSTOMER_ORDER_GAP_WEEKS_ORACLE, customer_order_gap_weeks,
    )
    sdf = customer_order_gap_weeks(cat.orders)
    rows = _compare(sdf, duck, CUSTOMER_ORDER_GAP_WEEKS_ORACLE)
    assert rows
    # every gap is non-negative and counted once
    assert all(r[0] >= 0 and r[1] > 0 for r in rows)


def test_customer_order_gap_hand_case(spark):
    """Gaps of 7 and 22 days → week buckets 1 and 3; a single-order
    customer contributes no gap; same-date orders gap at 0."""
    o = spark.createDataFrame(
        [(1, 10, datetime(2024, 1, 1)), (2, 10, datetime(2024, 1, 8)),
         (3, 10, datetime(2024, 1, 30)), (4, 20, datetime(2024, 3, 1)),
         (5, 30, datetime(2024, 5, 1)), (6, 30, datetime(2024, 5, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp")
    from data_ingestion_challenge_spark.operators.stats import (
        customer_order_gap_weeks,
    )
    out = {r.gap_weeks: r.n_gaps
           for r in customer_order_gap_weeks(o).collect()}
    assert out == {1: 1, 3: 1, 0: 1}


# ------------------------------------------- engagement regularity


def test_user_weekly_regularity_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        USER_WEEKLY_REGULARITY_ORACLE, user_weekly_regularity,
    )
    sdf = user_weekly_regularity(cat.events)
    rows = _compare(sdf, duck, USER_WEEKLY_REGULARITY_ORACLE)
    assert rows
    # sorted columns: n_users, regularity_decile — decile is index 1
    deciles = {r[1] for r in rows}
    assert deciles <= set(range(0, 11))


def test_user_weekly_regularity_hand_case(spark):
    """Active weeks {0,2} of a 3-week span → decile 6; a single-week
    user is a perfect 10."""
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 2)), (1, datetime(2024, 1, 16)),
         (2, datetime(2024, 2, 7))],
        "user_id long, ts timestamp")
    from data_ingestion_challenge_spark.operators.stats import (
        user_weekly_regularity,
    )
    out = {r.regularity_decile: r.n_users
           for r in user_weekly_regularity(ev).collect()}
    assert out == {6: 1, 10: 1}


# ------------------------------------------- promo effectiveness


def test_discount_band_revenue_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        DISCOUNT_BAND_REVENUE_ORACLE, discount_band_revenue,
    )
    sdf = discount_band_revenue(cat.lineitem)
    rows = _compare(sdf, duck, DISCOUNT_BAND_REVENUE_ORACLE)
    assert rows
    total = sum(r[1] for r in rows)  # sorted cols: discount_pct,
    assert total == cat.lineitem.count()  # n_lines, revenue, sum_qty


def test_discount_band_hand_case(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.05, 2.0), (2, 100.0, 0.05, 3.0),
         (3, 200.0, 0.0, 1.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_quantity double")
    from data_ingestion_challenge_spark.operators.stats import (
        discount_band_revenue,
    )
    out = {r.discount_pct: (r.n_lines, r.revenue, r.sum_qty)
           for r in discount_band_revenue(li).collect()}
    assert out == {5: (2, 190.0, 5.0), 0: (1, 200.0, 1.0)}


# ------------------------------------------- segment demand


def test_mktsegment_order_stats_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        MKTSEGMENT_ORDER_STATS_ORACLE, mktsegment_order_stats,
    )
    sdf = mktsegment_order_stats(cat.customer, cat.orders)
    rows = _compare(sdf, duck, MKTSEGMENT_ORDER_STATS_ORACLE)
    assert rows
    # customer denominators cover the whole customer table
    assert sum(r[1] for r in rows) == cat.customer.count()


def test_mktsegment_hand_case(spark):
    """An order-less customer keeps its segment's denominator; a
    segment with zero orders reports NULL revenue and ratio 0."""
    c = spark.createDataFrame(
        [(1, "AUTO"), (2, "AUTO"), (3, "TOYS")],
        "c_custkey long, c_mktsegment string")
    o = spark.createDataFrame(
        [(10, 1, 50.0), (11, 1, 70.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    from data_ingestion_challenge_spark.operators.stats import (
        mktsegment_order_stats,
    )
    out = {r.c_mktsegment: (r.n_customers, r.n_orders, r.revenue,
                            r.orders_per_customer)
           for r in mktsegment_order_stats(c, o).collect()}
    assert out["AUTO"] == (2, 2, 120.0, 1.0)
    assert out["TOYS"] == (1, 0, None, 0.0)


# ------------------------------------------- simhash radius tuning


def test_simhash_hamming_histogram_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.dedup import (
        simhash_hamming_histogram, simhash_hamming_oracle_sql,
    )
    from data_ingestion_challenge_spark.plans.llm import _SH_CTE
    sdf = simhash_hamming_histogram(cat.documents, n=3, max_hamming=3)
    rows = _compare(sdf, duck, simhash_hamming_oracle_sql(_SH_CTE))
    assert rows
    assert all(0 <= r[0] <= 3 for r in rows)


def test_simhash_hamming_hand_case(spark):
    """Two identical docs collide at hamming 0; the unique doc joins
    no candidate pair (disjoint shingles → different blocks almost
    surely, and any collision is still counted exactly)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base),
         (3, "one two three four five six seven eight")],
        "doc_id long, text string")
    from data_ingestion_challenge_spark.operators.dedup import (
        simhash_hamming_histogram,
    )
    out = {r.hamming: r.n_pairs
           for r in simhash_hamming_histogram(docs).collect()}
    assert out[0] == 1
