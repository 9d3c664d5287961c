"""Round-10/11 registration candidates (second pool): built,
oracle-twinned, and parity-tested now; driver registration deferred to
keep the verify-window rotation draining (SURVEY §7 budget).  Five ops:
lang_confusion_matrix (declared-vs-predicted language calibration),
customer_value_deciles (distributed ntile revenue concentration on
TPC-H), source_quality_percentiles (per-provider quality contract),
vocab_coverage_curve (tokenizer vocab-size sizing), and
hourly_seasonal_baseline (seasonal-naive forecast MAE monitor)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ----------------------------------------- language confusion matrix

def test_lang_confusion_matrix_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        lang_confusion_matrix, lang_confusion_oracle_sql,
    )
    sdf = lang_confusion_matrix(cat.documents)
    rows = _compare(sdf, duck, lang_confusion_oracle_sql())
    assert rows
    # every doc lands in exactly one cell (sorted columns:
    # lang, n_docs, predicted_lang — n_docs is index 1)
    assert sum(r[1] for r in rows) == cat.documents.count()


# ------------------------------------------- customer value deciles

def test_customer_value_deciles_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        CUSTOMER_VALUE_DECILES_ORACLE, customer_value_deciles,
    )
    sdf = customer_value_deciles(cat.customer, cat.orders)
    rows = _compare(sdf, duck, CUSTOMER_VALUE_DECILES_ORACLE)
    assert len(rows) == 10
    # sorted columns: avg_value, decile, max_value, min_value,
    # n_customers, value_share — decile is index 1
    by_decile = {r[1]: r for r in rows}
    # value_share strictly increasing head→tail and summing to ~1
    shares = [by_decile[d][-1] for d in range(1, 11)]
    assert abs(sum(shares) - 1.0) < 1e-4
    assert shares[-1] == max(shares)


def test_customer_value_deciles_plan_has_no_global_sort(spark, cat):
    """The decile cut must ride global_ntile's range-repartition plan:
    no single-task unpartitioned Sort over the customer rollup."""
    from data_ingestion_challenge_spark.operators.stats import (
        customer_value_deciles,
    )
    plan = (customer_value_deciles(cat.customer, cat.orders)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ntile" not in plan.lower()


# ------------------------------------- per-source quality percentiles

def test_source_quality_percentiles_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        SOURCE_QUALITY_PCTL_ORACLE, source_quality_percentiles,
    )
    sdf = source_quality_percentiles(cat.documents)
    rows = _compare(sdf, duck, SOURCE_QUALITY_PCTL_ORACLE)
    assert rows
    for r in rows:
        d = dict(zip(sorted(sdf.columns), r))
        assert d["p25"] <= d["p50"] <= d["p75"]
        assert 0.0 <= d["keep_rate"] <= 1.0


# ------------------------------------------------ vocab coverage

def test_vocab_coverage_curve_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        vocab_coverage_curve, vocab_coverage_oracle_sql,
    )
    sdf = vocab_coverage_curve(cat.documents)
    rows = _compare(sdf, duck, vocab_coverage_oracle_sql())
    assert len(rows) == 3
    cov = {r[1]: r[0] for r in rows}  # columns sorted: coverage, k, …
    # coverage is monotone in k and ends ≤ 1
    ks = sorted(cov)
    assert cov[ks[0]] <= cov[ks[1]] <= cov[ks[2]] <= 1.0 + 1e-9


def test_vocab_coverage_hand_case(spark):
    """3 tokens a,a,b: top-1 covers 2/3; k beyond vocab reports full
    coverage at rank V (no missing rows, no overshoot)."""
    from data_ingestion_challenge_spark.operators.textstats import (
        vocab_coverage_curve,
    )
    docs = spark.createDataFrame([(1, "a a b")],
                                 "doc_id long, text string")
    out = {r.k: r for r in
           vocab_coverage_curve(docs, ks=(1, 5)).collect()}
    assert out[1].rank_at == 1 and abs(out[1].coverage - 2 / 3) < 1e-6
    assert out[5].rank_at == 2 and abs(out[5].coverage - 1.0) < 1e-9


def test_vocab_coverage_plan_is_topk(spark, cat):
    """The vocab rank must be TakeOrderedAndProject over the counts,
    never a global data-sized sort."""
    from data_ingestion_challenge_spark.operators.textstats import (
        vocab_coverage_curve,
    )
    plan = (vocab_coverage_curve(cat.documents)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


# -------------------------------------------- seasonal-naive baseline

def test_hourly_seasonal_baseline_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        HOURLY_SEASONAL_BASELINE_ORACLE, hourly_seasonal_baseline,
    )
    sdf = hourly_seasonal_baseline(cat.events)
    rows = _compare(sdf, duck, HOURLY_SEASONAL_BASELINE_ORACLE)
    assert rows
    for r in rows:
        d = dict(zip(sorted(sdf.columns), r))
        assert d["mae"] >= 0.0 and d["n_hours"] > 0


def test_hourly_seasonal_baseline_hand_case(spark):
    """Two Mondays 00:00 with counts 1 and 3 → base 2, MAE 1; a
    single-occurrence slot predicts itself exactly (error 0)."""
    from data_ingestion_challenge_spark.operators.stats import (
        hourly_seasonal_baseline,
    )
    rows = []
    # two Mondays, hour 00: 1 event vs 3 events
    for i in range(1):
        rows.append((i, 100, "click", "2024-01-01 00:10:00"))
    for i in range(3):
        rows.append((10 + i, 100, "click", "2024-01-08 00:20:00"))
    # one lone Tuesday hour for a second slot with zero error
    rows.append((99, 100, "view", "2024-01-02 05:00:00"))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in hourly_seasonal_baseline(ev).collect()}
    assert out["click"].n_hours == 2 and abs(out["click"].mae - 1.0) < 1e-9
    assert out["view"].n_hours == 1 and out["view"].mae == 0.0
