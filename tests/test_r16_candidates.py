"""r16 candidate pool (built + parity-tested, UNREGISTERED — the r13+
registration budget drains it ≤5/round): user_retention_curve (day-k
growth curve), value_by_user_tenure (monetization by account age),
order_weekday_profile (weekday seasonality, portable epoch-mod-7),
dedup_prefix (first-k-token template-dup screen),
cosine_threshold_sweep (the embedding twin of dedup_threshold_sweep,
IVF-candidate-fed τ calibration)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ------------------------------------------- growth curve


def test_user_retention_curve_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        USER_RETENTION_CURVE_ORACLE, user_retention_curve,
    )
    sdf = user_retention_curve(cat.events)
    rows = _compare(sdf, duck, USER_RETENTION_CURVE_ORACLE)
    assert len(rows) >= 5


def test_user_retention_curve_hand_case(spark):
    """3 users first seen day 0; u1 returns day 1 and day 2, u2
    returns day 2, u3 never.  Horizon = day 2, so everyone is
    eligible at k=1 and k=2: k1 → 1/3, k2 → 2/3.  A user first seen
    on the horizon is eligible for nothing."""
    rows = [(1, 1, datetime(2024, 1, 1)), (2, 1, datetime(2024, 1, 2)),
            (3, 1, datetime(2024, 1, 3)),
            (4, 2, datetime(2024, 1, 1)), (5, 2, datetime(2024, 1, 3)),
            (6, 3, datetime(2024, 1, 1)),
            (7, 4, datetime(2024, 1, 3))]  # first seen on horizon
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    from data_ingestion_challenge_spark.operators.stats import (
        user_retention_curve,
    )
    out = {r.k_days: (r.n_eligible, r.n_retained, r.retained_ratio)
           for r in user_retention_curve(ev).collect()}
    assert out == {1: (3, 1, round(1 / 3, 6)),
                   2: (3, 2, round(2 / 3, 6))}


# ------------------------------------------- monetization mix


def test_value_by_user_tenure_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        VALUE_BY_USER_TENURE_ORACLE, value_by_user_tenure,
    )
    sdf = value_by_user_tenure(cat.events)
    rows = _compare(sdf, duck, VALUE_BY_USER_TENURE_ORACLE)
    assert 1 <= len(rows) <= 4


def test_value_by_user_tenure_hand_case(spark):
    """Bands split on exact day diffs; value sums are exact; a user
    contributes n_users=1 to every band they appear in."""
    rows = [(1, 1, datetime(2024, 1, 1), 10.0),   # day 0
            (2, 1, datetime(2024, 1, 5), 20.0),   # tenure 4 -> 1-7d
            (3, 1, datetime(2024, 2, 15), 40.0)]  # tenure 45 -> 31d+
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    from data_ingestion_challenge_spark.operators.stats import (
        value_by_user_tenure,
    )
    out = {r.tenure_band: (r.n_events, r.n_users, r.value_sum)
           for r in value_by_user_tenure(ev).collect()}
    assert out == {"0d": (1, 1, 10.0), "1-7d": (1, 1, 20.0),
                   "31d+": (1, 1, 40.0)}


# ------------------------------------------- weekday seasonality


def test_order_weekday_profile_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        ORDER_WEEKDAY_PROFILE_ORACLE, order_weekday_profile,
    )
    sdf = order_weekday_profile(cat.orders)
    rows = _compare(sdf, duck, ORDER_WEEKDAY_PROFILE_ORACLE)
    assert len(rows) == 7


def test_order_weekday_epoch_mod_anchor(spark):
    """1970-01-01 was a Thursday: weekday 0 = Thursday by
    construction, and consecutive days increment mod 7."""
    rows = [(1, datetime(1970, 1, 1), 10.0),   # weekday 0
            (2, datetime(1970, 1, 2), 20.0),   # weekday 1 (Friday)
            (3, datetime(1970, 1, 8), 30.0)]   # weekday 0 again
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, "
              "o_totalprice double")
    from data_ingestion_challenge_spark.operators.stats import (
        order_weekday_profile,
    )
    out = {r.weekday: (r.n_orders, r.revenue)
           for r in order_weekday_profile(o).collect()}
    assert out == {0: (2, 40.0), 1: (1, 20.0)}


# ------------------------------------------- prefix template screen


def test_dedup_prefix_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.dedup import (
        dedup_prefix, dedup_prefix_oracle_sql,
    )
    sdf = dedup_prefix(cat.documents)
    _compare(sdf, duck, dedup_prefix_oracle_sql())


def test_dedup_prefix_hand_case(spark):
    """Same 16-token prefix with different tails groups; a short doc
    groups only with an identical short doc; keeper is min id and
    n_sources counts distinct providers."""
    head = " ".join(f"w{i}" for i in range(16))
    docs = [(10, head + " tail one extra words", "web"),
            (3, head + " completely different ending", "books"),
            (7, "short prefix", "web"),
            (8, "short prefix", "web"),
            (9, "unique document body entirely", "web")]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string")
    from data_ingestion_challenge_spark.operators.dedup import (
        dedup_prefix,
    )
    out = {r.keep_id: (r.n_docs, r.n_sources)
           for r in dedup_prefix(df).collect()}
    assert out == {3: (2, 2), 7: (2, 1)}


# ------------------------------------------- τ calibration sweep


def test_cosine_threshold_sweep_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.similarity import (
        cosine_sweep_oracle_sql, cosine_threshold_sweep,
    )
    sdf = cosine_threshold_sweep(cat.embeddings)
    rows = _compare(sdf, duck, cosine_sweep_oracle_sql())
    assert len(rows) >= 3


def test_cosine_threshold_sweep_cumulative_is_monotone(spark, cat):
    from data_ingestion_challenge_spark.operators.similarity import (
        cosine_threshold_sweep,
    )
    out = sorted((r.cos_bucket, r.n_pairs, r.cum_pairs_at_or_above)
                 for r in cosine_threshold_sweep(cat.embeddings)
                 .collect())
    # descending buckets accumulate: cum(bucket) = cum(next) + n
    for (b1, n1, c1), (b2, n2, c2) in zip(out, out[1:]):
        assert c1 == c2 + n1
    assert out[-1][1] == out[-1][2]
