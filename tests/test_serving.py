"""Serving-layer tests: a keyed point lookup against a served rollup
must be correct AND cheap — one bucket file, no shuffle (the layout
contract serving.py documents)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.api import Engine
from data_ingestion_challenge_spark.serving import (
    _AUTO_BUCKETED,
    build_keyed_rollup,
    point_lookup,
    point_lookup_df,
)

from tests.conftest import SF_DIR


def _cleanup(spark, table):
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_point_lookup_correct_and_bucket_pruned(spark, cat, tmp_path):
    """Serve the per-user lifetime rollup; a user's point read returns
    exactly the batch aggregate's row and scans 1 bucket out of N."""
    rollup = (cat.events.groupBy("user_id")
              .agg(F.count("*").alias("n_events"),
                   F.round(F.sum("value"), 4).alias("total_value")))
    try:
        build_keyed_rollup(rollup, "srv_users", str(tmp_path / "srv"),
                           key="user_id", n_buckets=8)
        uid, want_n, want_v = rollup.orderBy("user_id").first()

        prev = spark.conf.get(_AUTO_BUCKETED, "true")
        spark.conf.set(_AUTO_BUCKETED, "false")
        try:
            got = point_lookup_df(spark, "srv_users", "user_id", uid)
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount: 1 out of 8" in plan, plan
            assert "Exchange" not in plan, "point read must not shuffle"
        finally:
            spark.conf.set(_AUTO_BUCKETED, prev)

        rows = point_lookup(spark, "srv_users", "user_id", uid)
        assert len(rows) == 1
        assert (rows[0]["n_events"], rows[0]["total_value"]) == \
            (want_n, want_v)
        # the scoped execution restored the session conf
        assert spark.conf.get(_AUTO_BUCKETED, "true") == prev
    finally:
        _cleanup(spark, "srv_users")


def test_engine_serve_and_lookup_roundtrip(spark, tmp_path):
    """The Engine facade round-trip: serve() a registry query, then
    lookup() a key — the reference's rollup-read endpoint shape."""
    eng = Engine(SF_DIR, spark=spark)
    try:
        eng.serve("user_lifetime_stats", "srv_lifetime",
                  str(tmp_path / "srv_lifetime"), key="user_id",
                  n_buckets=4)
        full = eng.run("user_lifetime_stats")
        some = full.orderBy("user_id").first()
        got = eng.lookup("srv_lifetime", "user_id", some["user_id"])
        assert [tuple(r) for r in got] == [tuple(some)]
    finally:
        _cleanup(spark, "srv_lifetime")


def test_engine_close_scoped_to_own_cache(spark):
    """Closing one Engine evicts only ITS posting-cache entries; a
    sibling engine sharing the application keeps its cache."""
    from data_ingestion_challenge_spark.plans.llm import (
        _POSTING_CACHE, _shared_postings)
    eng_a = Engine(SF_DIR, spark=spark)
    eng_b = Engine("/root/testdata/sf0.01", spark=spark)
    _shared_postings(eng_a.catalog)
    _shared_postings(eng_b.catalog)
    keys_b = {k for k in _POSTING_CACHE if k[1] == eng_b.catalog.sf_dir}
    assert keys_b
    eng_a.close()
    assert all(k in _POSTING_CACHE for k in keys_b), \
        "sibling engine's cache must survive a close()"
    assert not any(k[1] == eng_a.catalog.sf_dir for k in _POSTING_CACHE)
    eng_b.close()
