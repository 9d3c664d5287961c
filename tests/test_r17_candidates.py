"""r17 candidate pool (built + parity-tested, UNREGISTERED — the
r14+ registration budget drains it ≤5/round): supplier_part_breadth
(procurement-risk lanes per supplier nation), returns_by_nation
(market-quality return rates per customer nation),
hour_of_week_profile (the 168-slot capacity heatmap),
weekly_new_vs_returning (acquisition-vs-habit growth split), and
embedding_norm_percentiles_by_label (encoder-health norm
distribution).  Oracle parity is pinned at BOTH sf0.001 and sf0.01;
each op also carries a closed-form hand case."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from tests.test_r9_candidates import _compare

_SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


@pytest.fixture(scope="module", params=_SFS)
def sf_pair(request, spark):
    from data_ingestion_challenge_spark.catalog import Catalog
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders",
              "lineitem", "supplier", "customer", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{request.param}/{t}.parquet'")
    return Catalog(spark, request.param), con


# ------------------------------------------- supply-base breadth


def test_supplier_part_breadth_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        SUPPLIER_PART_BREADTH_ORACLE, supplier_part_breadth,
    )
    cat, duck = sf_pair
    sdf = supplier_part_breadth(cat.lineitem, cat.supplier,
                                cat.nation)
    rows = _compare(sdf, duck, SUPPLIER_PART_BREADTH_ORACLE)
    assert rows
    # alphabetical column order: n_name, n_supp_part_lanes,
    # n_suppliers, total_qty
    for _, n_lanes, n_sup, qty in rows:
        assert n_lanes >= n_sup >= 1 and qty > 0


def test_supplier_part_breadth_hand_case(spark):
    li = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 7.0), (1, 10, 3.0), (2, 12, 2.0)],
        "l_suppkey long, l_partkey long, l_quantity double")
    s = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)],
        "s_suppkey long, s_nationkey long")
    n = spark.createDataFrame(
        [(100, "A"), (200, "B")], "n_nationkey long, n_name string")
    from data_ingestion_challenge_spark.operators.stats import (
        supplier_part_breadth,
    )
    out = {r.n_name: (r.n_suppliers, r.n_supp_part_lanes, r.total_qty)
           for r in supplier_part_breadth(li, s, n).collect()}
    # supplier 3 never ships -> nation B absent; lanes: (1,10),(1,11),
    # (2,12) = 3 lanes over 2 suppliers, qty 17
    assert out == {"A": (2, 3, 17.0)}


# ------------------------------------------- return rates


def test_returns_by_nation_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        RETURNS_BY_NATION_ORACLE, returns_by_nation,
    )
    cat, duck = sf_pair
    sdf = returns_by_nation(cat.lineitem, cat.orders, cat.customer,
                            cat.nation)
    rows = _compare(sdf, duck, RETURNS_BY_NATION_ORACLE)
    assert rows
    # alphabetical: n_lines, n_name, n_returned, return_rate
    for n_lines, _, n_ret, rate in rows:
        assert 0 <= n_ret <= n_lines
        assert rate == round(n_ret / n_lines, 6)


def test_returns_by_nation_hand_case(spark):
    li = spark.createDataFrame(
        [(1, "R"), (1, "N"), (2, "N"), (3, "R")],
        "l_orderkey long, l_returnflag string")
    o = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 8)], "o_orderkey long, o_custkey long")
    c = spark.createDataFrame(
        [(7, 100), (8, 200)], "c_custkey long, c_nationkey long")
    n = spark.createDataFrame(
        [(100, "A"), (200, "B")], "n_nationkey long, n_name string")
    from data_ingestion_challenge_spark.operators.stats import (
        returns_by_nation,
    )
    out = {r.n_name: (r.n_lines, r.n_returned, r.return_rate)
           for r in returns_by_nation(li, o, c, n).collect()}
    assert out == {"A": (3, 1, round(1 / 3, 6)), "B": (1, 1, 1.0)}


# ------------------------------------------- 168-slot heatmap


def test_hour_of_week_profile_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        HOUR_OF_WEEK_PROFILE_ORACLE, hour_of_week_profile,
    )
    cat, duck = sf_pair
    rows = _compare(hour_of_week_profile(cat.events), duck,
                    HOUR_OF_WEEK_PROFILE_ORACLE)
    assert rows
    for hour, n_events, n_users, weekday in rows:
        assert 0 <= weekday <= 6 and 0 <= hour <= 23
        assert n_events >= n_users >= 1


def test_hour_of_week_profile_hand_case(spark):
    # 1970-01-01 was a Thursday = weekday 0 in the epoch-mod spelling
    ev = spark.createDataFrame(
        [(1, 1, datetime(1970, 1, 1, 5)),
         (2, 2, datetime(1970, 1, 1, 5)),
         (3, 1, datetime(1970, 1, 2, 23)),
         (4, 1, datetime(1970, 1, 8, 5))],  # next Thursday, same slot
        "event_id long, user_id long, ts timestamp")
    from data_ingestion_challenge_spark.operators.stats import (
        hour_of_week_profile,
    )
    out = {(r.weekday, r.hour): (r.n_events, r.n_users)
           for r in hour_of_week_profile(ev).collect()}
    assert out == {(0, 5): (3, 2), (1, 23): (1, 1)}


# ------------------------------------------- growth split


def test_weekly_new_vs_returning_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        WEEKLY_NEW_VS_RETURNING_ORACLE, weekly_new_vs_returning,
    )
    cat, duck = sf_pair
    rows = _compare(weekly_new_vs_returning(cat.events), duck,
                    WEEKLY_NEW_VS_RETURNING_ORACLE)
    assert rows
    # alphabetical: n_new, n_returning, week — the globally first
    # active week has no returning users
    first = min(rows, key=lambda r: r[2])
    assert first[1] == 0 and first[0] > 0


def test_weekly_new_vs_returning_hand_case(spark):
    ev = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1)),   # week W for both users
         (2, 2, datetime(2024, 1, 2)),
         (3, 1, datetime(2024, 1, 9)),   # W+1: u1 returns, u3 new
         (4, 3, datetime(2024, 1, 9)),
         (5, 1, datetime(2024, 1, 10))],  # same week, still one row
        "event_id long, user_id long, ts timestamp")
    from data_ingestion_challenge_spark.operators.stats import (
        weekly_new_vs_returning,
    )
    out = {r.week: (r.n_new, r.n_returning)
           for r in weekly_new_vs_returning(ev).collect()}
    w0 = min(out)
    assert out == {w0: (2, 0), w0 + 1: (1, 1)}


# ------------------------------------------- encoder health


def test_embedding_norm_percentiles_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.embstats import (
        EMBEDDING_NORM_PERCENTILES_ORACLE,
        embedding_norm_percentiles_by_label,
    )
    cat, duck = sf_pair
    rows = _compare(embedding_norm_percentiles_by_label(cat.embeddings),
                    duck, EMBEDDING_NORM_PERCENTILES_ORACLE)
    assert rows
    for _, n_vecs, p50, p90 in rows:
        assert n_vecs >= 1 and 0 < p50 <= p90


def test_embedding_norm_percentiles_hand_case(spark):
    emb = spark.createDataFrame(
        [(1, [3.0, 4.0], "a"),       # norm 5
         (2, [6.0, 8.0], "a"),       # norm 10
         (3, [0.0, 2.0], "b")],      # norm 2
        "vec_id long, embedding array<float>, label string")
    from data_ingestion_challenge_spark.operators.embstats import (
        embedding_norm_percentiles_by_label,
    )
    out = {r.label: (r.n_vecs, r.p50_norm, r.p90_norm)
           for r in embedding_norm_percentiles_by_label(emb).collect()}
    # label a: p50 interpolates halfway between 5 and 10 = 7.5;
    # p90 = 5 + 0.8*(10-5) = 9.5 (linear interpolation, n=2)
    assert out == {"a": (2, 7.5, 9.5), "b": (1, 2.0, 2.0)}
