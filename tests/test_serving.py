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


def test_murmur3_matches_spark_hash(spark):
    """The fast path's bucket routing stands on _murmur3_long being
    bit-equal to Spark's hash() (Murmur3, seed 42) for BIGINT keys —
    checked across sign/magnitude edge cases."""
    from data_ingestion_challenge_spark.serving import _murmur3_long
    vals = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), 2**63 - 1,
            -(2**63), 123456789012345, -987654321098765]
    row = spark.sql(
        "SELECT " + ", ".join(f"hash({v}L)" for v in vals)).collect()[0]
    assert [_murmur3_long(v) for v in vals] == list(row)


def test_point_lookup_fast_equals_sql_path(spark, cat, tmp_path):
    """Every key must return identical rows through the plannerless
    Arrow path and the SQL-planner path, including missing keys."""
    from data_ingestion_challenge_spark import serving
    rollup = (cat.events.groupBy("user_id")
              .agg(F.count("*").alias("n_events")))
    try:
        serving.build_keyed_rollup(rollup, "srv_fast_eq",
                                   str(tmp_path / "sfe"),
                                   key="user_id", n_buckets=8)
        keys = [r[0] for r in rollup.limit(20).collect()] + [10**15]
        for k in keys:
            a = sorted(map(tuple, serving.point_lookup(
                spark, "srv_fast_eq", "user_id", k)))
            b = sorted(map(tuple, serving.point_lookup_fast(
                spark, "srv_fast_eq", "user_id", k)))
            assert a == b, f"fast path diverged for key {k}"
    finally:
        _cleanup(spark, "srv_fast_eq")


def test_manifest_cache_invalidated_on_rebuild(spark, cat, tmp_path):
    """Rebuilding a serving table must evict its cached manifest, or
    lookups would read the PREVIOUS build's files forever."""
    from data_ingestion_challenge_spark import serving
    r1 = cat.events.groupBy("user_id").agg(F.count("*").alias("n"))
    r2 = r1.withColumn("n", F.col("n") * 2)
    try:
        serving.build_keyed_rollup(r1, "srv_rebuild",
                                   str(tmp_path / "b1"),
                                   key="user_id", n_buckets=4)
        k = r1.orderBy("user_id").first()["user_id"]
        before = serving.point_lookup_fast(
            spark, "srv_rebuild", "user_id", k)
        serving.build_keyed_rollup(r2, "srv_rebuild",
                                   str(tmp_path / "b2"),
                                   key="user_id", n_buckets=4)
        after = serving.point_lookup_fast(
            spark, "srv_rebuild", "user_id", k)
        assert after[0]["n"] == 2 * before[0]["n"], \
            "fast lookup served a stale manifest after rebuild"
    finally:
        _cleanup(spark, "srv_rebuild")


def test_engine_check_api(spark):
    """Engine.check runs a query against its DuckDB oracle and
    reports the three-way match — the external gate as a product
    API."""
    eng = Engine(SF_DIR, spark=spark)
    try:
        rep = eng.check("event_type_breakdown")
        assert rep["rows_match"] and rep["schema_match"] \
            and rep["values_match"]
        assert rep["spark_rows"] == rep["oracle_rows"] > 0
    finally:
        eng.close()
