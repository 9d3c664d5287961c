"""r23 overflow pool (built + parity-tested in r16, UNREGISTERED —
keeps the ≤5/round registration budget stocked past the r17-r20
slots).  Five candidates: event_value_cv_by_type (value-column
stability audit), orderstatus_mix_by_month (fulfillment-pipeline
trend), monthly_return_rate (return-rate regression dating),
embedding_sparsity_by_label (dead-dimension encoder health),
doc_web_artifacts (URL/email scrape-cleanliness audit).  Oracle
parity pinned at BOTH sf0.001 and sf0.01; closed-form hand cases
per op."""

from __future__ import annotations

from datetime import datetime

from tests.test_r9_candidates import _compare


# ------------------------------------------- value stability


def test_event_value_cv_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        EVENT_VALUE_CV_BY_TYPE_ORACLE, event_value_cv_by_type,
    )
    cat, duck = sf_pair
    rows = _compare(event_value_cv_by_type(cat.events), duck,
                    EVENT_VALUE_CV_BY_TYPE_ORACLE)
    assert rows


def test_event_value_cv_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        event_value_cv_by_type,
    )
    ev = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 4.0), (3, "a", None),
         (4, "b", 5.0)],
        "event_id long, event_type string, value double")
    out = {r.event_type: r for r in
           event_value_cv_by_type(ev).collect()}
    a = out["a"]
    # mean 3, E[x²] 10, var 1, sd 1, cv 1/3 — NULL value excluded
    assert (a.n_events, a.n_valued) == (3, 2)
    assert (a.mean_value, a.stddev_value, a.value_cv) \
        == (3.0, 1.0, round(1 / 3, 6))
    b = out["b"]
    assert (b.mean_value, b.stddev_value, b.value_cv) \
        == (5.0, 0.0, 0.0)


# --------------------------------------------- status mix trend


def test_orderstatus_mix_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        ORDERSTATUS_MIX_BY_MONTH_ORACLE, orderstatus_mix_by_month,
    )
    cat, duck = sf_pair
    rows = _compare(orderstatus_mix_by_month(cat.orders), duck,
                    ORDERSTATUS_MIX_BY_MONTH_ORACLE)
    assert rows


def test_orderstatus_mix_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        orderstatus_mix_by_month,
    )
    o = spark.createDataFrame(
        [(1, "O", datetime(2024, 1, 5), 10.0),
         (2, "O", datetime(2024, 1, 20), 20.0),
         (3, "F", datetime(2024, 1, 25), 30.0),
         (4, "F", datetime(2024, 2, 2), 40.0)],
        "o_orderkey long, o_orderstatus string, "
        "o_orderdate timestamp, o_totalprice double")
    out = {(str(r.month), r.o_orderstatus):
           (r.n_orders, r.revenue, r.status_share)
           for r in orderstatus_mix_by_month(o).collect()}
    assert out == {("2024-01-01", "O"): (2, 30.0, round(2 / 3, 6)),
                   ("2024-01-01", "F"): (1, 30.0, round(1 / 3, 6)),
                   ("2024-02-01", "F"): (1, 40.0, 1.0)}


# --------------------------------------------- return-rate trend


def test_monthly_return_rate_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        MONTHLY_RETURN_RATE_ORACLE, monthly_return_rate,
    )
    cat, duck = sf_pair
    rows = _compare(monthly_return_rate(cat.lineitem, cat.orders),
                    duck, MONTHLY_RETURN_RATE_ORACLE)
    assert rows


def test_monthly_return_rate_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        monthly_return_rate,
    )
    li = spark.createDataFrame(
        [(1, "R", 100.0, 0.1), (1, "N", 50.0, 0.0),
         (2, "A", 80.0, 0.5)],
        "l_orderkey long, l_returnflag string, "
        "l_extendedprice double, l_discount double")
    o = spark.createDataFrame(
        [(1, datetime(2024, 3, 10)), (2, datetime(2024, 4, 1))],
        "o_orderkey long, o_orderdate timestamp")
    out = {str(r.month): (r.n_lines, r.returned_lines,
                          r.returned_revenue, r.return_rate)
           for r in monthly_return_rate(li, o).collect()}
    assert out == {"2024-03-01": (2, 1, 90.0, 0.5),
                   "2024-04-01": (1, 0, 0.0, 0.0)}


# --------------------------------------------- encoder sparsity


def test_embedding_sparsity_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.embstats import (
        embedding_sparsity_by_label, embedding_sparsity_oracle_sql,
    )
    cat, duck = sf_pair
    rows = _compare(embedding_sparsity_by_label(cat.embeddings),
                    duck, embedding_sparsity_oracle_sql())
    assert rows


def test_embedding_sparsity_hand_case(spark):
    from data_ingestion_challenge_spark.operators.embstats import (
        embedding_sparsity_by_label,
    )
    e = spark.createDataFrame(
        [(1, [0.0, 0.005, 1.0, -0.009], 7),
         (2, [0.5, -0.5, 0.02, 0.0], 7),
         (3, [1.0, 1.0], 8)],
        "vec_id long, embedding array<float>, label int")
    out = {r.label: (r.n_vecs, r.n_coords, r.n_near_zero,
                     r.near_zero_frac)
           for r in embedding_sparsity_by_label(e).collect()}
    assert out == {7: (2, 8, 4, 0.5), 8: (1, 2, 0, 0.0)}


# --------------------------------------------- scrape artifacts


def test_doc_web_artifacts_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.textstats import (
        DOC_WEB_ARTIFACTS_ORACLE, doc_web_artifacts,
    )
    cat, duck = sf_pair
    rows = _compare(doc_web_artifacts(cat.documents), duck,
                    DOC_WEB_ARTIFACTS_ORACLE)
    assert rows


def test_doc_web_artifacts_hand_case(spark):
    from data_ingestion_challenge_spark.operators.textstats import (
        doc_web_artifacts,
    )
    docs = spark.createDataFrame(
        [(1, "see https://a.example and http://b.example now", "w"),
         (2, "mail Me@Example.COM for details", "w"),
         (3, "plain prose with no artifacts at all", "w"),
         (4, "https://only.example", "x")],
        "doc_id long, text string, source string")
    out = {r.source: (r.n_docs, r.docs_with_url, r.docs_with_email,
                      r.n_urls, r.urls_per_doc)
           for r in doc_web_artifacts(docs).collect()}
    assert out == {"w": (3, 1, 1, 2, round(2 / 3, 6)),
                   "x": (1, 1, 0, 1, 1.0)}
