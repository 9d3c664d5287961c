"""Round-15 registrations (SURVEY.md §2A/§2B): the r14-verdict lead —
five from the parity-tested pool, oldest-built first to keep the §2
families balanced.  One events-side SLA readout
(session_duration_percentiles, tests/test_r15_candidates.py) and four
relational rollups (region_trade_flow / order_fulfillment_days,
tests/test_r19_candidates.py; brand_return_rate /
basket_size_value_profile, tests/test_r18_candidates.py).  All five
were built and oracle-parity-tested in earlier rounds; this module
only promotes them into the driver-gated registry.

Parity notes: session durations are integral MICROSECONDS end to end
(percentiles of bigints land on exact .0/.5 doubles in both engines);
every revenue sum rides the q1 exact-DECIMAL(30,6) discipline with ONE
rounded cast; every rate/mean is ONE double divide rounded 6dp; the
fulfillment histogram floors (not truncates) negative weeks so the two
engines bucket ship-before-order rows identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------- session-duration SLA


@query(
    "session_duration_percentiles",
    # Exact interpolated p50/p90/p99 of the 30-min-gap sessionizer's
    # durations plus the session count — the engagement-depth SLA
    # readout next to session_stats' per-user rollup
    # (operators/stats.py:session_duration_percentiles).
    oracle=ST.SESSION_DURATION_PCTL_ORACLE,
)
def session_duration_percentiles(cat: Catalog) -> DataFrame:
    """The sessionizer's single user_id shuffle, then one global
    percentile over |sessions| longs — durations stay integral
    microseconds until the final 6dp seconds divide."""
    return ST.session_duration_percentiles(cat.events)


# -------------------------------------------- region trade matrix


@query(
    "region_trade_flow",
    # Revenue by (supplier region → customer region): the 25-cell
    # board-level rollup q5/q7 drill into; diagonal = intra-region
    # trade (operators/stats.py:region_trade_flow).
    oracle=ST.REGION_TRADE_FLOW_ORACLE,
)
def region_trade_flow(cat: Catalog) -> DataFrame:
    """lineitem⋈orders is the one fact⋈fact shuffle (order-key
    bucketed co-location at 100 TB); customer/supplier/nation/region
    all broadcast; the final groupBy collapses to regions² rows."""
    return ST.region_trade_flow(cat.lineitem, cat.orders,
                                cat.customer, cat.supplier,
                                cat.nation, cat.region)


# --------------------------------------- fulfillment-lag histogram


@query(
    "order_fulfillment_days",
    # Days from order date to LAST line shipped, bucketed by week —
    # the end-to-end order-to-done distribution an ops team holds
    # against its SLA (operators/stats.py:order_fulfillment_days).
    oracle=ST.ORDER_FULFILLMENT_DAYS_ORACLE,
)
def order_fulfillment_days(cat: Catalog) -> DataFrame:
    """Per-order max is map-side combined on the order key, the
    fact⋈fact join rides the SAME key (no second shuffle shape at
    100 TB with order-key bucketing), then a ≤dozens-row histogram."""
    return ST.order_fulfillment_days(cat.lineitem, cat.orders)


# ------------------------------------------------ brand returns


@query(
    "brand_return_rate",
    # 'R'-flagged share per part brand with the returned revenue
    # priced — WHAT gets returned, next to q10's WHO
    # (operators/stats.py:brand_return_rate).
    oracle=ST.BRAND_RETURN_RATE_ORACLE,
)
def brand_return_rate(cat: Catalog) -> DataFrame:
    """fact⋈broadcast(dim) on partkey, one map-side-combined groupBy
    to a ~25-row brand rollup; counts exact BIGINT, revenue exact
    DECIMAL, the rate ONE rounded divide."""
    return ST.brand_return_rate(cat.lineitem, cat.part)


# ------------------------------------------- basket-size profile


@query(
    "basket_size_value_profile",
    # Order line-count vs basket value curve — are big baskets
    # carrying the revenue, or a long tail of singles?
    # (operators/stats.py:basket_size_value_profile).
    oracle=ST.BASKET_SIZE_VALUE_PROFILE_ORACLE,
)
def basket_size_value_profile(cat: Catalog) -> DataFrame:
    """Join-free two-level aggregation: groupBy(l_orderkey) shuffles
    once (bucket-co-located at 100 TB), the second groupBy collapses
    to ≤max-lines rows; both levels map-side combinable."""
    return ST.basket_size_value_profile(cat.lineitem)
