"""Keyed MERGE INTO (upsert/delete) over a plain-parquet lake layout.

The reference's storage backends upsert per-key state in place; lake
deployments do it with Delta/Iceberg `MERGE INTO`.  Neither jar ships
in this container, so this module implements the same contract on
files Spark writes natively: a target laid out as parquet partitioned
by a Murmur3 key-bucket column, and a copy-on-write merge that
rewrites ONLY the bucket partitions containing changed keys —
O(touched buckets), not O(table) — using Spark's dynamic partition
overwrite for the atomic directory swap (staged write + rename, the
same commit protocol the built-in sinks use).

MERGE semantics (SQL `MERGE INTO t USING u ON t.key = u.key`):
  WHEN MATCHED THEN UPDATE       — update row replaces target row
  WHEN NOT MATCHED THEN INSERT   — update row appends
  (optional) deletes             — listed keys are removed

At 100 TB: n_buckets scales with table volume (hold partitions at a
few hundred MB); a trickle of updates touches few buckets, and each
rewrite is one bucket-sized scan+anti-join.  The bucket column is
`pmod(hash(key), n)` — Spark's own Murmur3, so routing is consistent
for any engine that can replay it (serving._murmur3_long is the
Python twin, test-enforced).

SINGLE-WRITER: plain parquet has no transactional commit log, so two
interleaved copy-on-write merges would silently lose one writer's
updates.  Every write path takes an exclusive lockfile (sibling
`<target>.lock`, O_CREAT|O_EXCL); a second writer gets an explicit
ConcurrentMergeError instead of corruption.  True multi-writer ACID
needs Delta/Iceberg MERGE INTO (jar absent in this container).
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

_BUCKET = "_bucket"
_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


class ConcurrentMergeError(RuntimeError):
    """A second writer tried to merge into a target another writer
    holds.  This layout is SINGLE-WRITER by construction (plain
    parquet has no transactional commit protocol — two interleaved
    copy-on-write merges lose one writer's updates silently); the
    lock turns that silent lost-update into this explicit error.
    True multi-writer ACID needs a table format with a commit log
    (Delta/Iceberg MERGE INTO) — the jar is absent in this container."""


def _lock_path(target_dir: str) -> str:
    # Sibling of target_dir, NOT inside it: mode("overwrite") writes
    # delete the target directory tree, which would strip an in-dir
    # lock mid-hold and let a second writer acquire it.
    return target_dir.rstrip("/") + ".lock"


@contextlib.contextmanager
def _writer_lock(target_dir: str):
    """Exclusive advisory writer lock via O_CREAT|O_EXCL — atomic on
    POSIX local/NFS filesystems.  The token written inside names the
    holder for the error message.  A crashed writer leaves a stale
    lock: recover explicitly with force_unlock() after confirming the
    holder is gone (auto-expiry would re-introduce the two-writer
    race it exists to stop)."""
    path = _lock_path(target_dir)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    token = f"pid={os.getpid()} token={uuid.uuid4().hex}"
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        try:
            with open(path) as fh:
                holder = fh.read().strip()
        except OSError:
            holder = "<unreadable>"
        raise ConcurrentMergeError(
            f"merge target {target_dir!r} is locked by another writer "
            f"({holder}); this layout is single-writer — wait for it, "
            f"or force_unlock() if the holder crashed") from None
    try:
        os.write(fd, token.encode())
        os.close(fd)
        yield
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def force_unlock(target_dir: str) -> None:
    """Remove a stale writer lock left by a crashed process.  Only
    call after confirming no writer is alive — removing a LIVE
    writer's lock reopens the lost-update race."""
    try:
        os.remove(_lock_path(target_dir))
    except FileNotFoundError:
        pass


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(_BUCKET, F.pmod(F.hash(col(key)),
                                         F.lit(n_buckets)))


def _layout_exists(target_dir: str) -> bool:
    """True iff target_dir already holds a written bucket layout
    (any parquet part file under a _bucket= partition dir)."""
    if not os.path.isdir(target_dir):
        return False
    for root, _dirs, files in os.walk(target_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def init_keyed(df: DataFrame, target_dir: str, key: str,
               n_buckets: int = 32) -> None:
    """Full (re)build of the merge target layout."""
    with _writer_lock(target_dir):
        (_with_bucket(df, key, n_buckets)
         .repartition(_BUCKET)
         .write.mode("overwrite").partitionBy(_BUCKET)
         .parquet(target_dir))


def read_merged(spark: SparkSession, target_dir: str) -> DataFrame:
    return spark.read.parquet(target_dir).drop(_BUCKET)


def merge_into_keyed(spark: SparkSession, target_dir: str,
                     updates: DataFrame, key: str,
                     n_buckets: int = 32,
                     deletes: DataFrame | None = None) -> None:
    """Copy-on-write MERGE: upsert `updates` (full-row schema) and
    drop `deletes` (a one-column keys frame) into the init_keyed
    layout at target_dir, rewriting only touched bucket partitions.

    Contract (matches SQL MERGE's single-source-row-per-key rule):
    `updates` must carry AT MOST ONE row per key — duplicates would
    leave duplicate keys in the target where SQL MERGE raises, so
    this function raises too (cheap check: it scans only the
    batch-sized updates frame).  A key present in BOTH `updates` and
    `deletes` is an upsert: the update wins (both sides land in the
    anti-join drop set; the update row is then re-inserted)."""
    dup = (updates.groupBy(key).count()
           .where(col("count") > 1).take(1))
    if dup:
        raise ValueError(
            f"merge_into_keyed: updates has >1 row for key "
            f"{dup[0][0]!r}; MERGE requires at most one source row "
            f"per key")
    upd = _with_bucket(updates, key, n_buckets)
    changed = upd.select(_BUCKET)
    if deletes is not None:
        changed = changed.unionByName(
            _with_bucket(deletes, key, n_buckets).select(_BUCKET))
    # Bounded collect: at most n_buckets ids, whatever the update size.
    touched = [r[0] for r in changed.distinct().collect()]
    if not touched:
        return
    with _writer_lock(target_dir):
        current = (spark.read.parquet(target_dir)
                   .where(col(_BUCKET).isin(touched)))
        drop_keys = upd.select(key)
        if deletes is not None:
            drop_keys = drop_keys.unionByName(deletes.select(key))
        merged = (current.join(drop_keys.distinct(), key, "left_anti")
                  .unionByName(upd)
                  # materialize BEFORE overwriting the files being read
                  # (same protocol as streaming/incremental.py)
                  .localCheckpoint())
        prev = spark.conf.get(_OVERWRITE_MODE, "static")
        spark.conf.set(_OVERWRITE_MODE, "dynamic")
        try:
            (merged.repartition(_BUCKET)
             .write.mode("overwrite").partitionBy(_BUCKET)
             .parquet(target_dir))
        finally:
            spark.conf.set(_OVERWRITE_MODE, prev)
        # Dynamic overwrite only replaces partitions PRESENT in the
        # written frame — a delete that empties a bucket would
        # otherwise be a silent no-op (hypothesis-caught).  Drop
        # emptied bucket dirs explicitly; `merged` is checkpointed, so
        # this distinct is a cheap scan bounded by |touched|.
        import shutil

        still = {r[0] for r in
                 merged.select(_BUCKET).distinct().collect()}
        for b in set(touched) - still:
            shutil.rmtree(os.path.join(target_dir, f"{_BUCKET}={b}"),
                          ignore_errors=True)


# ------------------------------------------- streaming accumulation
#
# The streaming twin: per micro-batch, SUM-accumulate a keyed batch
# aggregate into the layout (t.col += s.col per key) instead of
# replacing rows.  Same unit of overwrite (bucket partition), same
# per-unit replay gate as streaming/incremental.py — a bucket whose
# rows already carry this batch_id was committed before a crash, so
# its increment is skipped on replay.  Key cardinality is unbounded
# (users), which is exactly what the bucket layout is for: touched
# buckets per batch ≤ n_buckets regardless of key count.

_BATCH_COL = "last_batch_id"


def accumulate_batch(batch_agg: DataFrame, batch_id: int,
                     target_dir: str, key: str, sum_cols: list[str],
                     n_buckets: int = 32) -> None:
    """One micro-batch of keyed sum-accumulation into target_dir."""
    spark_b = batch_agg.sparkSession
    inc = _with_bucket(batch_agg, key, n_buckets).localCheckpoint()
    touched = [r[0] for r in inc.select(_BUCKET).distinct().collect()]
    if not touched:
        return
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in inc.schema.fields)
    with _writer_lock(target_dir):
        # First batch is detected EXPLICITLY (no parquet part files
        # under target_dir yet) rather than by catching read errors:
        # a transient or corruption failure reading real accumulated
        # state must propagate, not silently restart accumulation
        # from this batch's increments (that would discard every
        # prior total).
        if _layout_exists(target_dir):
            current = (spark_b.read.parquet(target_dir)
                       .where(col(_BUCKET).isin(touched))
                       .select(*inc.columns, _BATCH_COL)
                       .localCheckpoint())
        else:
            current = spark_b.createDataFrame(
                [], f"{ddl}, {_BATCH_COL} bigint")
        done = [r[0] for r in
                current.where(col(_BATCH_COL) >= batch_id)
                .select(_BUCKET).distinct().collect()]
        if done:
            inc = inc.where(~col(_BUCKET).isin(done))
            current = current.where(~col(_BUCKET).isin(done))
            if not inc.take(1):
                return
        merged = (
            current.drop(_BATCH_COL).unionByName(inc)
            .groupBy(key, _BUCKET)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
            .withColumn(_BATCH_COL, F.lit(batch_id).cast("bigint"))
            .localCheckpoint()     # materialize BEFORE overwriting
        )
        prev = spark_b.conf.get(_OVERWRITE_MODE, "static")
        spark_b.conf.set(_OVERWRITE_MODE, "dynamic")
        try:
            (merged.repartition(_BUCKET)
             .write.mode("overwrite").partitionBy(_BUCKET)
             .parquet(target_dir))
        finally:
            spark_b.conf.set(_OVERWRITE_MODE, prev)


def run_keyed_upsert(spark: SparkSession, events_path: str,
                     out_dir: str, checkpoint: str,
                     n_buckets: int = 32) -> None:
    """Drain the bounded events source (availableNow), maintaining the
    per-user (n_events, value_sum_micros) state at out_dir through
    accumulate_batch — the reference's queue→per-key-state loop on the
    real streaming engine, ending in a directly serveable layout."""
    from data_ingestion_challenge_spark.streaming.pipeline import (
        build_source)

    def _agg(df: DataFrame) -> DataFrame:
        return (df.groupBy("user_id")
                .agg(F.count("*").alias("n_events"),
                     F.sum(F.round(col("value") * 1000000)
                           .cast("bigint")).alias("value_sum_micros")))

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        accumulate_batch(_agg(batch_df), batch_id, out_dir,
                         key="user_id",
                         sum_cols=["n_events", "value_sum_micros"],
                         n_buckets=n_buckets)

    q = (build_source(spark, events_path)
         .writeStream
         .foreachBatch(_merge)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
