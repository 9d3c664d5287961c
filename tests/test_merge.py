"""Copy-on-write MERGE sink tests: upsert/delete semantics must equal
a full recompute, and untouched bucket partitions must not rewrite
(the O(touched buckets) contract merge.py documents)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_challenge_spark import merge


def _files_with_mtimes(root: str) -> dict:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


def test_merge_upsert_equals_recompute(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, v long")
    updates = spark.createDataFrame(
        [(5, 999), (50, 888), (1000, 777)], "k long, v long")
    out = str(tmp_path / "m1")
    merge.init_keyed(base, out, key="k", n_buckets=8)
    merge.merge_into_keyed(spark, out, updates, key="k", n_buckets=8)
    got = {(r["k"], r["v"]) for r in
           merge.read_merged(spark, out).collect()}
    want = {(i, i * 10) for i in range(100) if i not in (5, 50)}
    want |= {(5, 999), (50, 888), (1000, 777)}
    assert got == want


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, i) for i in range(200)], "k long, v long")
    out = str(tmp_path / "m2")
    merge.init_keyed(base, out, key="k", n_buckets=8)
    before = _files_with_mtimes(out)
    one = spark.createDataFrame([(7, -7)], "k long, v long")
    merge.merge_into_keyed(spark, out, one, key="k", n_buckets=8)
    after = _files_with_mtimes(out)
    bucket7 = spark.sql("SELECT pmod(hash(7L), 8)").collect()[0][0]
    touched_dir = f"{merge._BUCKET}={bucket7}"
    untouched_before = {p: m for p, m in before.items()
                        if touched_dir not in p}
    assert untouched_before, "expected untouched bucket files"
    for p, m in untouched_before.items():
        assert after.get(p) == m, f"untouched bucket rewritten: {p}"
    assert any(touched_dir in p and p not in before for p in after), \
        "touched bucket was not rewritten"


def test_merge_delete_keys(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, i) for i in range(50)], "k long, v long")
    out = str(tmp_path / "m3")
    merge.init_keyed(base, out, key="k", n_buckets=4)
    dels = spark.createDataFrame([(3,), (4,)], "k long")
    merge.merge_into_keyed(spark, out,
                           spark.createDataFrame([], "k long, v long"),
                           key="k", n_buckets=4, deletes=dels)
    got = {r["k"] for r in merge.read_merged(spark, out).collect()}
    assert got == set(range(50)) - {3, 4}


def test_merge_gate_query_matches_full_rollup(spark, cat):
    """The registered merge_upsert_rollup equals the one-shot per-user
    aggregate (the driver oracle's claim), exercising both the update
    and the insert arm on real data."""
    from data_ingestion_challenge_spark.plans import QUERIES
    from tests.conftest import SF_DIR
    got = sorted(map(tuple,
                     QUERIES["merge_upsert_rollup"](spark, SF_DIR)
                     .collect()))
    micros = F.sum(F.round(F.col("value") * 1000000).cast("bigint"))
    want = sorted(map(tuple,
                      cat.events.groupBy("user_id")
                      .agg(F.count("*").alias("n"), micros.alias("s"))
                      .collect()))
    assert got == want


def test_accumulate_replay_gate_idempotent(spark, tmp_path):
    """Replaying the SAME batch id must be a no-op for buckets already
    committed by it — the crash-replay contract accumulate_batch
    mirrors from streaming/incremental.py."""
    out = str(tmp_path / "acc")
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, n long")
    merge.accumulate_batch(b0, 0, out, key="k", sum_cols=["n"],
                           n_buckets=4)
    merge.accumulate_batch(b0, 0, out, key="k", sum_cols=["n"],
                           n_buckets=4)  # replay: must not double-count
    got = {(r["k"], r["n"]) for r in
           merge.read_merged(spark, out).drop("last_batch_id").collect()}
    assert got == {(1, 10), (2, 20)}
    b1 = spark.createDataFrame([(1, 5), (3, 7)], "k long, n long")
    merge.accumulate_batch(b1, 1, out, key="k", sum_cols=["n"],
                           n_buckets=4)
    got = {(r["k"], r["n"]) for r in
           merge.read_merged(spark, out).drop("last_batch_id").collect()}
    assert got == {(1, 15), (2, 20), (3, 7)}


def test_streaming_keyed_upsert_equals_batch(spark, cat, tmp_path):
    """Drained streaming state == one-shot per-user aggregate."""
    from data_ingestion_challenge_spark.plans import QUERIES
    from tests.conftest import SF_DIR
    got = sorted(map(tuple,
                     QUERIES["streaming_keyed_upsert"](spark, SF_DIR)
                     .collect()))
    micros = F.sum(F.round(F.col("value") * 1000000).cast("bigint"))
    want = sorted(map(tuple,
                      cat.events.groupBy("user_id")
                      .agg(F.count("*").alias("n"), micros.alias("s"))
                      .collect()))
    assert got == want
