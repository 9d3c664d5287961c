"""Round-12+ registration candidates (fifth pool): built,
oracle-twinned, and parity-tested now; driver registration deferred to
keep the verify-window rotation draining (SURVEY §7 budget).  Five
ops: session_duration_percentiles (engagement-depth SLA),
order_priority_share_by_month (priority-mix seasonality),
value_dow_hour_heatmap (load-shape table), supplier_balance_by_region
(procurement-risk rollup), ascii_ratio_by_lang (encoding-rot
audit)."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "supplier", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ------------------------------------------- session-duration SLA


def test_session_duration_percentiles_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        SESSION_DURATION_PCTL_ORACLE, session_duration_percentiles,
    )
    sdf = session_duration_percentiles(cat.events)
    rows = _compare(sdf, duck, SESSION_DURATION_PCTL_ORACLE)
    assert len(rows) == 1
    d = dict(zip(sorted(sdf.columns), rows[0]))
    assert d["n_sessions"] > 0
    assert d["p50_s"] <= d["p90_s"] <= d["p99_s"]


def test_session_duration_hand_case(spark):
    """Two sessions for one user (31-min gap splits), one single-event
    session for another: durations {600, 0, 0} s → p50 = 0, p90
    interpolates toward 600."""
    from data_ingestion_challenge_spark.operators.stats import (
        session_duration_percentiles,
    )
    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = [(1, 100, t0), (2, 100, datetime(2024, 1, 1, 10, 10)),
            (3, 100, datetime(2024, 1, 1, 11, 0)),
            (4, 200, datetime(2024, 1, 1, 9, 0))]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    r = session_duration_percentiles(ev).collect()[0]
    assert r.n_sessions == 3 and r.p50_s == 0.0
    assert 0 < r.p90_s <= 600.0 and r.p99_s <= 600.0


# ------------------------------------------- priority seasonality


def test_order_priority_share_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        ORDER_PRIORITY_SHARE_ORACLE, order_priority_share_by_month,
    )
    sdf = order_priority_share_by_month(cat.orders)
    rows = _compare(sdf, duck, ORDER_PRIORITY_SHARE_ORACLE)
    assert rows
    # shares sum to ~1 within each month (sorted cols: month,
    # month_share, n_orders, priority)
    from collections import defaultdict
    by_month = defaultdict(float)
    for r in rows:
        by_month[r[0]] += r[1]
    assert all(abs(s - 1.0) < 1e-4 for s in by_month.values())


# ------------------------------------------- load-shape heatmap


def test_value_dow_hour_heatmap_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        VALUE_DOW_HOUR_HEATMAP_ORACLE, value_dow_hour_heatmap,
    )
    sdf = value_dow_hour_heatmap(cat.events)
    rows = _compare(sdf, duck, VALUE_DOW_HOUR_HEATMAP_ORACLE)
    assert rows and len(rows) <= 168
    assert sum(r[2] for r in rows) == cat.events.count()


def test_heatmap_dow_is_monday_zero(spark):
    """2024-01-01 was a Monday → dow 0; Sunday the 7th → dow 6."""
    from data_ingestion_challenge_spark.operators.stats import (
        value_dow_hour_heatmap,
    )
    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 5), 1.0),
         (2, datetime(2024, 1, 7, 23), 2.0)],
        "event_id long, ts timestamp, value double")
    out = {(r.dow, r.hour): r.value_sum_micros
           for r in value_dow_hour_heatmap(ev).collect()}
    assert out == {(0, 5): 1000000, (6, 23): 2000000}


# ------------------------------------------- supplier geography


def test_supplier_balance_by_region_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        SUPPLIER_BALANCE_BY_REGION_ORACLE, supplier_balance_by_region,
    )
    sdf = supplier_balance_by_region(cat.supplier, cat.nation,
                                     cat.region)
    rows = _compare(sdf, duck, SUPPLIER_BALANCE_BY_REGION_ORACLE)
    assert rows
    assert sum(r[2] for r in rows) == cat.supplier.count()


def test_supplier_balance_plan_broadcasts_dims(spark, cat):
    from data_ingestion_challenge_spark.operators.stats import (
        supplier_balance_by_region,
    )
    plan = (supplier_balance_by_region(cat.supplier, cat.nation,
                                       cat.region)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastHashJoin") >= 2


# ------------------------------------------- encoding audit


def test_ascii_ratio_by_lang_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        ASCII_RATIO_BY_LANG_ORACLE, ascii_ratio_by_lang,
    )
    sdf = ascii_ratio_by_lang(cat.documents)
    rows = _compare(sdf, duck, ASCII_RATIO_BY_LANG_ORACLE)
    assert rows
    for r in rows:
        d = dict(zip(sorted(sdf.columns), r))
        assert 0.0 <= d["min_ascii_ratio"] <= d["mean_ascii_ratio"] <= 1.0


def test_ascii_ratio_hand_case(spark):
    """'héllo wörld' is 9/11 printable-ASCII; pure ASCII is 1.0; an
    empty doc is excluded from its language's stats."""
    from data_ingestion_challenge_spark.operators.textstats import (
        ascii_ratio_by_lang,
    )
    docs = spark.createDataFrame(
        [(1, "héllo wörld", "de"), (2, "plain ascii here", "en"),
         (3, "", "en")],
        "doc_id long, text string, lang string")
    out = {r.lang: (r.n_docs, r.mean_ascii_ratio, r.min_ascii_ratio)
           for r in ascii_ratio_by_lang(docs).collect()}
    assert out["en"] == (1, 1.0, 1.0)
    assert out["de"][0] == 1 and abs(out["de"][1] - round(9 / 11, 4)) < 1e-6


# ------------------------------------------- KMV theta overlap


def test_kmv_weekly_user_overlap_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.sketch import (
        kmv_overlap_oracle_sql, kmv_weekly_user_overlap,
    )
    sdf = kmv_weekly_user_overlap(cat.events)
    rows = _compare(sdf, duck, kmv_overlap_oracle_sql())
    assert rows
    for r in rows:
        d = dict(zip(sorted(sdf.columns), r))
        assert d["est_overlap"] >= 0.0 and d["exact_overlap"] >= 0
        # the estimator tracks truth within a loose sketch bound
        hi = max(d["est_users_a"], d["est_users_b"])
        assert d["est_overlap"] <= hi * 1.5 + 1


def test_kmv_small_sets_are_exact(spark):
    """Below k values the 'sketch' IS the value set: estimates equal
    exact counts, and the overlap estimate equals the exact overlap
    (theta = full domain)."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.sketch import (
        kmv_weekly_user_overlap,
    )
    mon1, mon2 = datetime(2024, 1, 1), datetime(2024, 1, 8)
    rows = [(i, u, t) for i, (u, t) in enumerate(
        [(u, mon1) for u in (1, 2, 3, 4)]
        + [(u, mon2) for u in (3, 4, 5)])]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    r = kmv_weekly_user_overlap(ev).collect()
    assert len(r) == 1
    row = r[0]
    assert row.est_users_a == 4.0 and row.est_users_b == 3.0
    assert row.est_overlap == 2.0 and row.exact_overlap == 2


def test_kmv_sketch_regime_estimates_reasonably(spark):
    """Above k the estimator kicks in: with k=8 over 200/150-user
    weeks sharing 100 users, estimates land within a generous
    sketch-error band of truth (deterministic — fixed hash)."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.sketch import (
        kmv_weekly_user_overlap,
    )
    mon1, mon2 = datetime(2024, 1, 1), datetime(2024, 1, 8)
    rows = []
    for u in range(200):
        rows.append((len(rows), u, mon1))
    for u in range(100, 250):
        rows.append((len(rows), u, mon2))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    row = kmv_weekly_user_overlap(ev, k=8).collect()[0]
    assert row.exact_overlap == 100
    assert 60 <= row.est_users_a <= 600  # k=8 is deliberately crude
    assert 0 <= row.est_overlap <= 600
