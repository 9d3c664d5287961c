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


# ------------------------------------------- single-writer fencing

def test_merge_second_writer_raises_and_lock_releases(spark, tmp_path):
    """Two concurrent writers on a plain-parquet layout silently lose
    one writer's updates (no commit protocol) — the lock turns that
    into an explicit ConcurrentMergeError, and a clean merge releases
    it so the next writer proceeds."""
    import pytest

    base = spark.createDataFrame(
        [(i, i) for i in range(50)], "k long, v long")
    out = str(tmp_path / "mlock")
    merge.init_keyed(base, out, key="k", n_buckets=4)
    one = spark.createDataFrame([(7, -7)], "k long, v long")
    with merge._writer_lock(out):  # another writer holds the target
        with pytest.raises(merge.ConcurrentMergeError):
            merge.merge_into_keyed(spark, out, one, key="k", n_buckets=4)
    # released → same merge now succeeds, and releases again
    merge.merge_into_keyed(spark, out, one, key="k", n_buckets=4)
    assert not os.path.exists(merge._lock_path(out))
    got = {(r["k"], r["v"]) for r in
           merge.read_merged(spark, out).collect()}
    assert (7, -7) in got and len(got) == 50


def test_force_unlock_recovers_stale_lock(spark, tmp_path):
    import pytest

    base = spark.createDataFrame([(1, 1)], "k long, v long")
    out = str(tmp_path / "mstale")
    merge.init_keyed(base, out, key="k", n_buckets=2)
    # a crashed writer's leftover lock
    with open(merge._lock_path(out), "w") as fh:
        fh.write("pid=999999 token=dead")
    upd = spark.createDataFrame([(2, 2)], "k long, v long")
    with pytest.raises(merge.ConcurrentMergeError):
        merge.merge_into_keyed(spark, out, upd, key="k", n_buckets=2)
    merge.force_unlock(out)
    merge.merge_into_keyed(spark, out, upd, key="k", n_buckets=2)
    assert merge.read_merged(spark, out).count() == 2


def test_merge_duplicate_update_keys_raise(spark, tmp_path):
    """SQL MERGE errors on >1 source row per key; so do we (both rows
    inserted would leave duplicate keys in the target)."""
    import pytest

    base = spark.createDataFrame([(1, 1)], "k long, v long")
    out = str(tmp_path / "mdup")
    merge.init_keyed(base, out, key="k", n_buckets=2)
    dup = spark.createDataFrame([(5, 1), (5, 2)], "k long, v long")
    with pytest.raises(ValueError, match="at most one source row"):
        merge.merge_into_keyed(spark, out, dup, key="k", n_buckets=2)


def test_accumulate_corrupt_target_raises(spark, tmp_path):
    """A read failure over EXISTING accumulated state must propagate —
    the old bare-except treated any read error as 'first batch' and
    silently discarded all prior totals (round-4 ADVICE)."""
    import pytest

    out = str(tmp_path / "macc")
    agg0 = spark.createDataFrame(
        [(1, 10), (2, 20)], "k long, n long")
    merge.accumulate_batch(agg0, 0, out, key="k", sum_cols=["n"],
                           n_buckets=2)
    # corrupt the layout: a non-parquet file where a footer must be
    bucket_dirs = [d for d in os.listdir(out) if d.startswith("_bucket=")]
    with open(os.path.join(out, bucket_dirs[0],
                           "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"not a parquet file")
    agg1 = spark.createDataFrame([(1, 1), (2, 1)], "k long, n long")
    with pytest.raises(Exception):
        merge.accumulate_batch(agg1, 1, out, key="k", sum_cols=["n"],
                               n_buckets=2)
