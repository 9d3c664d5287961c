"""r19 candidate pool (built + parity-tested, UNREGISTERED — the
registration budget drains it ≤5/round): region_trade_flow (the
supplier-region × customer-region revenue matrix),
order_fulfillment_days (order-to-last-ship lag histogram by week),
event_type_hour_entropy (temporal concentration + peak hour per
type), part_type_revenue_share (part-family revenue breakdown with
exact shares), customer_recency_bands (churn-risk recency funnel
incl. never-ordered).  Oracle parity is pinned at BOTH sf0.001 and
sf0.01; each op carries a closed-form hand case."""

from __future__ import annotations

from tests.test_r9_candidates import _compare



# ----------------------------------------------- trade-flow matrix


def test_region_trade_flow_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        REGION_TRADE_FLOW_ORACLE, region_trade_flow,
    )
    cat, duck = sf_pair
    sdf = region_trade_flow(cat.lineitem, cat.orders, cat.customer,
                            cat.supplier, cat.nation, cat.region)
    rows = _compare(sdf, duck, REGION_TRADE_FLOW_ORACLE)
    assert 0 < len(rows) <= 25          # at most regions^2 cells


def test_region_trade_flow_hand_case(spark):
    li = spark.createDataFrame(
        [(1, 10, 100.0, 0.0), (2, 20, 40.0, 0.5)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double")
    o = spark.createDataFrame([(1, 5), (2, 6)],
                              "o_orderkey long, o_custkey long")
    c = spark.createDataFrame([(5, 100), (6, 200)],
                              "c_custkey long, c_nationkey long")
    s = spark.createDataFrame([(10, 100), (20, 100)],
                              "s_suppkey long, s_nationkey long")
    n = spark.createDataFrame([(100, "N1", 1), (200, "N2", 2)],
                              "n_nationkey long, n_name string, "
                              "n_regionkey long")
    r = spark.createDataFrame([(1, "EAST"), (2, "WEST")],
                              "r_regionkey long, r_name string")
    from data_ingestion_challenge_spark.operators.stats import (
        region_trade_flow,
    )
    out = {(x.supp_region, x.cust_region): (x.n_lines, x.revenue)
           for x in region_trade_flow(li, o, c, s, n, r).collect()}
    assert out == {("EAST", "EAST"): (1, 100.0),
                   ("EAST", "WEST"): (1, 20.0)}


# ----------------------------------------------- fulfillment speed


def test_order_fulfillment_days_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        ORDER_FULFILLMENT_DAYS_ORACLE, order_fulfillment_days,
    )
    cat, duck = sf_pair
    sdf = order_fulfillment_days(cat.lineitem, cat.orders)
    rows = _compare(sdf, duck, ORDER_FULFILLMENT_DAYS_ORACLE)
    assert rows
    # alphabetical: avg_days, fulfill_week, n_orders, total_days
    for avg_days, wk, n_orders, total in rows:
        assert n_orders >= 1
        assert abs(avg_days - total / n_orders) < 1e-6


def test_order_fulfillment_days_hand_case(spark):
    li = spark.createDataFrame(
        [(1, "2024-01-05"), (1, "2024-01-20"), (2, "2024-02-01")],
        "l_orderkey long, l_shipdate string")
    o = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01")],
        "o_orderkey long, o_orderdate string")
    from data_ingestion_challenge_spark.operators.stats import (
        order_fulfillment_days,
    )
    out = {r.fulfill_week: (r.n_orders, r.total_days, r.avg_days)
           for r in order_fulfillment_days(li, o).collect()}
    # order 1: last ship +19 days -> week 2; order 2: same-day -> 0
    assert out == {2: (1, 19, 19.0), 0: (1, 0, 0.0)}


# ----------------------------------------------- hour entropy


def test_event_type_hour_entropy_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        EVENT_TYPE_HOUR_ENTROPY_ORACLE, event_type_hour_entropy,
    )
    cat, duck = sf_pair
    sdf = event_type_hour_entropy(cat.events)
    rows = _compare(sdf, duck, EVENT_TYPE_HOUR_ENTROPY_ORACLE)
    assert rows
    # alphabetical: entropy_bits, event_type, n_events, peak_hour
    import math
    for ent, _, n, peak in rows:
        assert 0 <= ent <= math.log2(24) + 1e-9
        assert 0 <= peak <= 23


def test_event_type_hour_entropy_hand_case(spark):
    rows = [("e", f"2024-01-01 0{h}:00:00") for h in (1, 1, 2, 3)]
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        event_type_hour_entropy,
    )
    [r] = event_type_hour_entropy(df).collect()
    # counts 2/1/1 over n=4: H = 0.5*1 + 0.25*2 + 0.25*2 = 1.5 bits
    assert (r.event_type, r.n_events, r.peak_hour) == ("e", 4, 1)
    assert abs(r.entropy_bits - 1.5) < 1e-6


def test_event_type_hour_entropy_peak_tiebreak(spark):
    # hours 3 and 5 tie on count: the SMALLER hour must win
    rows = [("e", "2024-01-01 03:00:00"), ("e", "2024-01-01 05:00:00")]
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    from data_ingestion_challenge_spark.operators.stats import (
        event_type_hour_entropy,
    )
    [r] = event_type_hour_entropy(df).collect()
    assert r.peak_hour == 3


# ----------------------------------------------- type-family share


def test_part_type_revenue_share_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        PART_TYPE_REVENUE_SHARE_ORACLE, part_type_revenue_share,
    )
    cat, duck = sf_pair
    sdf = part_type_revenue_share(cat.lineitem, cat.part)
    rows = _compare(sdf, duck, PART_TYPE_REVENUE_SHARE_ORACLE)
    assert rows
    # alphabetical: n_lines, revenue, revenue_share, type_family
    assert abs(sum(r[2] for r in rows) - 1.0) < 1e-4


def test_part_type_revenue_share_hand_case(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 300.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double")
    p = spark.createDataFrame(
        [(1, "PROMO BRUSHED TIN"), (2, "STANDARD POLISHED STEEL")],
        "p_partkey long, p_type string")
    from data_ingestion_challenge_spark.operators.stats import (
        part_type_revenue_share,
    )
    out = {r.type_family: (r.n_lines, r.revenue, r.revenue_share)
           for r in part_type_revenue_share(li, p).collect()}
    assert out == {"PROMO": (1, 100.0, 0.25),
                   "STANDARD": (1, 300.0, 0.75)}


# ----------------------------------------------- recency funnel


def test_customer_recency_bands_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        CUSTOMER_RECENCY_BANDS_ORACLE, customer_recency_bands,
    )
    cat, duck = sf_pair
    sdf = customer_recency_bands(cat.orders, cat.customer)
    rows = _compare(sdf, duck, CUSTOMER_RECENCY_BANDS_ORACLE)
    assert rows
    bands = {r[1] for r in rows}
    assert bands <= {"never", "d30", "d90", "d365", "older"}


def test_customer_recency_bands_hand_case(spark):
    o = spark.createDataFrame(
        [(1, "2024-12-31"), (1, "2024-01-01"),   # cust 1: 0 days
         (2, "2024-12-01"),                      # cust 2: 30 days
         (3, "2024-06-01"),                      # cust 3: 213 days
         (4, "2023-01-01")],                     # cust 4: 730 days
        "o_custkey long, o_orderdate string")
    c = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)],
                              "c_custkey long")
    from data_ingestion_challenge_spark.operators.stats import (
        customer_recency_bands,
    )
    out = {r.recency_band: r.n_customers
           for r in customer_recency_bands(o, c).collect()}
    assert out == {"d30": 2, "d365": 1, "older": 1, "never": 1}