"""Unit tests for the monitoring/segmentation batch (plans/events3.py).
Oracle parity for the first two is covered by test_oracle_parity."""

from __future__ import annotations

from data_ingestion_challenge_spark.plans import QUERIES

from tests.conftest import SF_DIR


def _run(spark, name):
    return QUERIES[name](spark, SF_DIR).toPandas()


def test_anomaly_flag_consistent_with_z(spark):
    df = _run(spark, "hourly_anomaly_zscore")
    flagged = df[df.is_anomaly == 1]
    unflagged = df[(df.is_anomaly == 0) & df.z.notna()]
    assert (flagged.z.abs() > 2 - 1e-9).all()
    assert (unflagged.z.abs() <= 2 + 1e-4).all()


def test_rfm_quartiles_balanced_and_ordered(spark):
    df = _run(spark, "customer_rfm_segments")
    n = len(df)
    for c in ["r_q", "f_q", "m_q"]:
        sizes = df[c].value_counts()
        assert sorted(sizes.index) == [1, 2, 3, 4]
        assert sizes.max() - sizes.min() <= 1  # ntile balance
    # monetary quartile respects the metric ordering
    q = df.groupby("m_q").monetary
    assert (q.max().sort_index().values[:-1]
            <= q.min().sort_index().values[1:] + 1e-9).all()


def test_hll_weekly_merge_close_to_exact(spark):
    df = _run(spark, "weekly_distinct_users_hll_merge")
    assert len(df) > 0
    assert df.merge_ok.all()  # lgK=12 → ~1.6% std error, gated at 5%
    assert (df.exact_users > 0).all()
