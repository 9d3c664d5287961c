"""r21 overflow pool (built + parity-tested in r14, UNREGISTERED —
keeps the ≤5/round registration budget stocked one full round past
r20).  Eight candidates: order_line_value_corr (order-composition
Pearson), weekly_event_type_share_drift (traffic mix-shift monitor),
brand_price_spread (assortment-width table), cohort_first_week_share
(front-loadedness curve), quantity_discount_profile (bulk-discount
interaction), value_percentiles_by_type (per-type value SLA),
dup_rate_by_length_bucket (dedup length-bias audit, rides the shared
shingle/pair CTEs), ttr_percentiles_by_source (repetitiveness
profile).
Oracle parity pinned at BOTH sf0.001 and sf0.01; closed-form hand
cases per op."""

from __future__ import annotations

from tests.test_r9_candidates import _compare


# -------------------------------------------- order composition


def test_order_line_value_corr_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        ORDER_LINE_VALUE_CORR_ORACLE, order_line_value_corr,
    )
    cat, duck = sf_pair
    sdf = order_line_value_corr(cat.lineitem, cat.orders)
    [row] = _compare(sdf, duck, ORDER_LINE_VALUE_CORR_ORACLE)
    # alphabetical: avg_lines, corr_lines_value, n_orders
    avg_lines, corr, n = row
    assert n > 0 and avg_lines >= 1.0
    assert corr is None or -1.0 - 1e-9 <= corr <= 1.0 + 1e-9


def test_order_line_value_corr_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        order_line_value_corr,
    )
    orders = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)],
        "o_orderkey long, o_totalprice double")
    lines = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "l_orderkey long")
    [r] = order_line_value_corr(lines, orders).collect()
    # x = (1,2,3), y = (100,200,300): perfectly linear
    assert (r.n_orders, r.avg_lines, r.corr_lines_value) == (3, 2.0, 1.0)


def test_order_line_value_corr_degenerate_null(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        order_line_value_corr,
    )
    orders = spark.createDataFrame(
        [(1, 100.0), (2, 200.0)], "o_orderkey long, o_totalprice double")
    lines = spark.createDataFrame([(1,), (2,)], "l_orderkey long")
    [r] = order_line_value_corr(lines, orders).collect()
    assert r.corr_lines_value is None       # zero line-count variance


# -------------------------------------------- traffic mix shift


def test_weekly_event_type_share_drift_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        WEEKLY_EVENT_TYPE_SHARE_DRIFT_ORACLE,
        weekly_event_type_share_drift,
    )
    cat, duck = sf_pair
    sdf = weekly_event_type_share_drift(cat.events)
    rows = _compare(sdf, duck, WEEKLY_EVENT_TYPE_SHARE_DRIFT_ORACLE)
    assert rows
    # alphabetical: event_type, n_events, share, share_drift, week
    for _, n, share, drift, _ in rows:
        assert n > 0 and 0.0 < share <= 1.0
        assert drift is None or -1.0 <= drift <= 1.0


def test_weekly_event_type_share_drift_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        weekly_event_type_share_drift,
    )
    # week 0 (epoch Thu 1970-01-01..): a×3, b×1; week 1: a×1, b×1;
    # type c appears week 0 and week 3 (GAP -> NULL drift both times)
    rows = ([("a", "1970-01-01 00:00:00")] * 3
            + [("b", "1970-01-02 00:00:00")]
            + [("a", "1970-01-08 00:00:00"),
               ("b", "1970-01-09 00:00:00")]
            + [("c", "1970-01-03 00:00:00"),
               ("c", "1970-01-24 00:00:00")])
    df = spark.createDataFrame(rows, "event_type string, ts string") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts")
    got = {(r.week, r.event_type): (r.share, r.share_drift)
           for r in weekly_event_type_share_drift(df).collect()}
    assert got[(0, "a")] == (0.6, None)          # 3 of 5 in week 0
    assert got[(1, "a")] == (0.5, -0.1)
    assert got[(1, "b")][1] == 0.3               # 0.5 - 0.2
    assert got[(3, "c")] == (1.0, None)          # gap week: no drift


# -------------------------------------------- assortment width


def test_brand_price_spread_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        BRAND_PRICE_SPREAD_ORACLE, brand_price_spread,
    )
    cat, duck = sf_pair
    rows = _compare(brand_price_spread(cat.part), duck,
                    BRAND_PRICE_SPREAD_ORACLE)
    assert rows
    # alphabetical: avg_price, max_price, min_price, n_parts,
    #               p_brand, price_spread
    for avg, mx, mn, n, _, spread in rows:
        assert mn <= avg <= mx and n > 0
        assert abs(spread - round(mx - mn, 6)) < 1e-9


def test_brand_price_spread_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        brand_price_spread,
    )
    part = spark.createDataFrame(
        [("B1", 10.0), ("B1", 30.0), ("B2", 5.0)],
        "p_brand string, p_retailprice double")
    got = {r.p_brand: r for r in brand_price_spread(part).collect()}
    assert (got["B1"].n_parts, got["B1"].avg_price,
            got["B1"].price_spread) == (2, 20.0, 20.0)
    assert (got["B2"].min_price, got["B2"].max_price) == (5.0, 5.0)


# -------------------------------------------- cohort front-load


def test_cohort_first_week_share_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        COHORT_FIRST_WEEK_SHARE_ORACLE, cohort_first_week_share,
    )
    cat, duck = sf_pair
    rows = _compare(cohort_first_week_share(cat.events), duck,
                    COHORT_FIRST_WEEK_SHARE_ORACLE)
    assert rows
    # alphabetical: cohort_week, first_week_share, n_events, n_users
    for _, share, n_ev, n_us in rows:
        assert 0.0 < share <= 1.0 and n_ev >= n_us > 0


def test_cohort_first_week_share_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        cohort_first_week_share,
    )
    # user 1: 2 events in the first 7 days, 2 events on day 10 ->
    # share 0.5; all in cohort_week 0.  user 2 joins week 52 with
    # everything inside the first week -> share 1.0.
    rows = [(1, "1970-01-01 00:00:00"), (1, "1970-01-05 00:00:00"),
            (1, "1970-01-11 00:00:00"), (1, "1970-01-11 06:00:00"),
            (2, "1971-01-01 00:00:00"), (2, "1971-01-02 00:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    got = {r.cohort_week: r
           for r in cohort_first_week_share(df).collect()}
    assert got[0].n_users == 1 and got[0].first_week_share == 0.5
    assert got[52].first_week_share == 1.0 and got[52].n_events == 2


# -------------------------------------------- bulk discount


def test_quantity_discount_profile_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        QUANTITY_DISCOUNT_PROFILE_ORACLE, quantity_discount_profile,
    )
    cat, duck = sf_pair
    rows = _compare(quantity_discount_profile(cat.lineitem), duck,
                    QUANTITY_DISCOUNT_PROFILE_ORACLE)
    assert rows
    # alphabetical: avg_discount, n_lines, quantity, revenue
    for avg_d, n, q, rev in rows:
        assert 0.0 <= avg_d <= 1.0 and n > 0 and q >= 0 and rev >= 0


def test_quantity_discount_profile_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        quantity_discount_profile,
    )
    li = spark.createDataFrame(
        [(1.0, 0.10, 100.0), (1.0, 0.30, 200.0), (5.0, 0.00, 50.0)],
        "l_quantity double, l_discount double, l_extendedprice double")
    got = {r.quantity: r
           for r in quantity_discount_profile(li).collect()}
    assert got[1].n_lines == 2 and got[1].avg_discount == 0.2
    assert got[1].revenue == 230.0          # 90 + 140
    assert got[5].avg_discount == 0.0 and got[5].revenue == 50.0


# -------------------------------------------- per-type value SLA


def test_value_percentiles_by_type_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        VALUE_PERCENTILES_BY_TYPE_ORACLE, value_percentiles_by_type,
    )
    cat, duck = sf_pair
    rows = _compare(value_percentiles_by_type(cat.events), duck,
                    VALUE_PERCENTILES_BY_TYPE_ORACLE)
    assert rows
    # alphabetical: event_type, n_events, p50, p90, p99
    for _, n, p50, p90, p99 in rows:
        assert n > 0 and p50 <= p90 <= p99


def test_value_percentiles_by_type_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        value_percentiles_by_type,
    )
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4, 5)],
        "event_type string, value double")
    [r] = value_percentiles_by_type(df).collect()
    # quantile_cont over 1..5: p50=3, p90=4.6, p99=4.96
    assert (r.p50_value, r.p90_value, r.p99_value) == (3.0, 4.6, 4.96)


# -------------------------------------------- dedup length bias


def test_dup_rate_by_length_bucket_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.dedup import (
        dup_rate_by_length_bucket, dup_rate_by_length_oracle_sql,
    )
    from data_ingestion_challenge_spark.plans.llm import _SH_CTE
    cat, duck = sf_pair
    sdf = dup_rate_by_length_bucket(cat.documents, n=3, tau=0.8)
    rows = _compare(sdf, duck, dup_rate_by_length_oracle_sql(_SH_CTE))
    assert rows
    # alphabetical: dup_rate, len_bucket, n_docs, n_dup_docs
    total = sum(r[2] for r in rows)
    assert total == cat.documents.count()   # every doc in one bucket
    for rate, _, n_docs, n_dup in rows:
        assert 0 <= n_dup <= n_docs
        assert abs(rate - round(1.0 * n_dup / n_docs, 6)) < 1e-9


def test_dup_rate_by_length_hand_case(spark):
    # two identical docs (a verified pair) + one unique doc of the
    # same length bucket + one long unique doc: bucket of the dups
    # shows rate 2/3, the long doc's bucket shows 0.
    dup = "alpha beta gamma delta epsilon zeta eta theta"   # 46 ch
    uniq = "one two three four five six seven eight nine!"  # 46 ch
    long_u = " ".join(f"w{i}" for i in range(40))            # >128 ch
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, uniq), (4, long_u)],
        "doc_id long, text string") \
        .selectExpr("doc_id", "text",
                    "CAST(length(text) AS BIGINT) AS n_chars")
    from data_ingestion_challenge_spark.operators.dedup import (
        dup_rate_by_length_bucket,
    )
    got = {r.len_bucket: r
           for r in dup_rate_by_length_bucket(docs).collect()}
    b46 = 5                                   # floor(log2(46)) = 5
    assert got[b46].n_docs == 3 and got[b46].n_dup_docs == 2
    assert got[b46].dup_rate == round(2 / 3, 6)
    blong = [b for b in got if b != b46]
    assert len(blong) == 1 and got[blong[0]].n_dup_docs == 0


# -------------------------------------------- repetitiveness profile


def test_ttr_percentiles_by_source_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.textstats import (
        TTR_PERCENTILES_BY_SOURCE_ORACLE, ttr_percentiles_by_source,
    )
    cat, duck = sf_pair
    rows = _compare(ttr_percentiles_by_source(cat.documents), duck,
                    TTR_PERCENTILES_BY_SOURCE_ORACLE)
    assert rows
    # alphabetical: n_docs, p10_ttr, p50_ttr, p90_ttr, source
    for n, p10, p50, p90, _ in rows:
        assert n > 0 and 0.0 < p10 <= p50 <= p90 <= 1.0


def test_ttr_percentiles_hand_case(spark):
    # source A: three docs with TTR 1.0, 0.5, 0.25 -> p50 = 0.5,
    # p10/p90 interpolate between neighbours.
    docs = spark.createDataFrame(
        [(1, "a b c d", "A"),             # 4 distinct / 4 = 1.0
         (2, "a a b b", "A"),             # 2 / 4 = 0.5
         (3, "a a a a", "A")],            # 1 / 4 = 0.25
        "doc_id long, text string, source string")
    from data_ingestion_challenge_spark.operators.textstats import (
        ttr_percentiles_by_source,
    )
    [r] = ttr_percentiles_by_source(docs).collect()
    assert r.n_docs == 3 and r.p50_ttr == 0.5
    assert r.p10_ttr == 0.3 and r.p90_ttr == 0.9   # linear interp


def test_dup_rate_by_length_empty_doc_guard(spark):
    """n_chars = 0 is legal; log2(0) raises in DuckDB and NULLs in
    Spark, so both engines bucket through greatest(n_chars, 1) —
    empty docs land in bucket 0 and parity holds."""
    from data_ingestion_challenge_spark.operators.dedup import (
        dup_rate_by_length_bucket,
    )
    docs = spark.createDataFrame(
        [(1, "", 0), (2, "alpha beta gamma delta", 22),
         (3, "alpha beta gamma delta", 22)],
        "doc_id long, text string, n_chars long")
    got = {r.len_bucket: r
           for r in dup_rate_by_length_bucket(docs).collect()}
    assert got[0].n_docs == 1 and got[0].n_dup_docs == 0
    assert got[4].n_dup_docs == 2          # floor(log2(22)) = 4
