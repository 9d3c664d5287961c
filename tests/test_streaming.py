"""Streaming pipeline tests: bounded drain matches batch; jsonl
directory-watch ingestion processes late-arriving drops."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.sources.streams import jsonl_stream
from data_ingestion_challenge_spark.streaming.pipeline import run_bounded
from data_ingestion_challenge_spark.streaming.sessionize import (
    run_sessionize_bounded,
)

from tests.conftest import SF_DIR


def test_bounded_stream_matches_batch(spark, cat):
    got = {r["hour_ts"]: (r["n_events"], r["total_value"])
           for r in run_bounded(spark, f"{SF_DIR}/events.parquet").collect()}
    want = {r["hour_ts"]: (r["n_events"], r["total_value"])
            for r in (cat.events
                      .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
                      .agg(F.count("*").alias("n_events"),
                           F.round(F.sum("value"), 2).alias("total_value"))
                      ).collect()}
    assert got == want


def test_jsonl_stream_ingests_drops(spark, tmp_path):
    watch = tmp_path / "drops"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    watch.mkdir()

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop("batch1.jsonl", [
        {"event_id": 1, "ts": "2024-01-01 00:00:01", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 00:30:00", "user_id": 8,
         "event_type": "view", "value": 2.0, "props": "{}"},
    ])

    stream = jsonl_stream(spark, str(watch))
    q = (stream.writeStream.format("parquet")
         .option("path", str(out))
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    got = spark.read.parquet(str(out))
    assert got.count() == 2
    assert {r["user_id"] for r in got.collect()} == {7, 8}

    # A later drop is picked up by the next trigger from the same
    # checkpoint — exactly-once file tracking.
    drop("batch2.jsonl", [
        {"event_id": 3, "ts": "2024-01-01 01:00:00", "user_id": 9,
         "event_type": "click", "value": 3.0, "props": "{}"}])
    q2 = (jsonl_stream(spark, str(watch)).writeStream.format("parquet")
          .option("path", str(out))
          .option("checkpointLocation", str(ckpt))
          .trigger(availableNow=True)
          .start())
    q2.awaitTermination()
    assert spark.read.parquet(str(out)).count() == 3
    assert os.path.isdir(str(ckpt))


def test_stateful_sessionize_across_batches(spark, tmp_path):
    """Per-user session state must survive micro-batch boundaries: the
    first drop opens a session, the second (a later trigger from the
    same checkpoint) closes it, so the completed session only appears
    after batch 2."""
    from data_ingestion_challenge_spark.streaming.sessionize import (
        OUTPUT_SCHEMA, sessionize_stream)

    src = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def drop(name, rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "stage" / name))
        import glob
        import shutil
        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{name}.parquet")

    def drain():
        from data_ingestion_challenge_spark.streaming.pipeline import build_source
        q = (sessionize_stream(build_source(spark, str(src)))
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.read.schema(OUTPUT_SCHEMA).parquet(str(out))

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    drop("b1", [(1, t0, 7, "click", 1.0, "{}"),
                (2, t0 + dt.timedelta(minutes=5), 7, "view", 1.0, "{}")])
    assert drain().count() == 0  # session still open → nothing emitted

    # 40 min later: proves the 30-min gap, closing session 1 — state
    # survived the micro-batch boundary via the checkpoint state store.
    drop("b2", [(3, t0 + dt.timedelta(minutes=45), 7, "click", 1.0, "{}")])
    rows = drain().collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 7
    assert rows[0]["session_start"] == t0
    assert rows[0]["session_end"] == t0 + dt.timedelta(minutes=5)
    assert rows[0]["n_events"] == 2


def test_incremental_rollup_equals_recompute(spark, tmp_path, cat):
    """The foreachBatch-maintained rollup must equal a from-scratch
    batch aggregation after every incremental drain."""
    import shutil

    from data_ingestion_challenge_spark.streaming.incremental import (
        _day_agg, read_rollup, run_incremental_rollup)

    src = tmp_path / "events"
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    full = cat.events.orderBy("event_id").limit(400).localCheckpoint()
    half1 = full.where(F.col("event_id") % 2 == 0)
    half2 = full.where(F.col("event_id") % 2 == 1)

    def drop(df, name):
        stage = tmp_path / "stage" / name
        df.coalesce(1).write.parquet(str(stage))
        import glob
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{name}.parquet")

    def rollup_now():
        return {(r["day_ts"], r["n_events"], r["value_sum_micros"])
                for r in read_rollup(spark, out).collect()}

    def batch_ref(df):
        return {(r["day_ts"], r["n_events"], r["value_sum_micros"])
                for r in _day_agg(df).collect()}

    drop(half1, "b1")
    run_incremental_rollup(spark, str(src), out, ckpt)
    assert rollup_now() == batch_ref(half1)

    # second drain merges only the touched day partitions
    drop(half2, "b2")
    run_incremental_rollup(spark, str(src), out, ckpt)
    assert rollup_now() == batch_ref(full)


def test_incremental_rollup_replay_is_idempotent(spark, tmp_path, cat):
    """A replayed micro-batch (write committed, checkpoint commit lost)
    must NOT double-count: every sink row carries last_batch_id and a
    day whose partition already holds the replayed id is skipped."""
    from data_ingestion_challenge_spark.streaming.incremental import (
        merge_batch, read_rollup)

    out = str(tmp_path / "rollup")
    batch = cat.events.orderBy("event_id").limit(300).localCheckpoint()

    def snapshot():
        return {(r["day_ts"], r["n_events"], r["value_sum_micros"])
                for r in read_rollup(spark, out).collect()}

    merge_batch(batch, 0, out)
    before = snapshot()
    # replay of batch 0 against the committed sink: must be a no-op
    merge_batch(batch, 0, out)
    assert snapshot() == before
    # a genuinely NEW batch still merges
    merge_batch(batch, 1, out)
    doubled = {(d, 2 * n, 2 * v) for d, n, v in before}
    assert snapshot() == doubled


def test_keyed_rollup_delta_equals_overwrite_path(spark, tmp_path):
    """r11 unification: the delta-backed keyed continuous aggregate
    (accumulate_batch commit_mode='delta' — O(batch) append-delta
    runs) must equal the dynamic-partition-overwrite path row for row
    over the SAME drained stream, including after a run fold, and a
    re-drain with the same checkpoint must be a no-op (exactly-once
    through the txn log, no per-bucket gate needed)."""
    import os

    from data_ingestion_challenge_spark.streaming.incremental import (
        read_keyed_rollup, read_keyed_rollup_delta,
        run_incremental_keyed_rollup,
        run_incremental_keyed_rollup_delta,
    )
    from tests.conftest import SF_DIR

    src_dir = str(tmp_path / "src")
    (spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
     .repartition(4).write.mode("overwrite").parquet(src_dir))

    ow_out, ow_ck = str(tmp_path / "ow"), str(tmp_path / "owck")
    run_incremental_keyed_rollup(spark, src_dir, ow_out, ow_ck)
    want = sorted(tuple(r) for r in
                  read_keyed_rollup(spark, ow_out).collect())

    d_out, d_ck = str(tmp_path / "d"), str(tmp_path / "dck")
    t = run_incremental_keyed_rollup_delta(spark, src_dir, d_out, d_ck,
                                           compact_every=2)
    got = sorted(tuple(r) for r in read_keyed_rollup_delta(t).collect())
    assert got == want and want
    # re-drain: checkpoint resumes, nothing recommitted
    v = t.version()
    t2 = run_incremental_keyed_rollup_delta(spark, src_dir, d_out, d_ck)
    assert t2.version() == v
    assert sorted(tuple(r) for r in
                  read_keyed_rollup_delta(t2).collect()) == want
    # the full fold keeps the decode exact (windowless table)
    t2.compact_runs(level="full")
    assert sorted(tuple(r) for r in
                  read_keyed_rollup_delta(t2).collect()) == want


def test_incremental_merge_read_prunes_partitions(spark, tmp_path, cat):
    """The read-side of the upsert must prune on the PARTITION STRING
    (PartitionFilters → O(touched) directory listing), never filter
    the in-file timestamp (which lists every file in the sink's
    history first).  Audits the exact production read path for both
    the day and the keyed sink."""
    import re

    from data_ingestion_challenge_spark.streaming.incremental import (
        _KEYED_SCHEMA, _SINK_SCHEMA, _read_touched, merge_batch,
        merge_keyed_batch,
    )

    batch = cat.events.orderBy("event_id").limit(300).localCheckpoint()
    day_out = str(tmp_path / "day")
    keyed_out = str(tmp_path / "keyed")
    merge_batch(batch, 0, day_out)
    merge_keyed_batch(batch, 0, keyed_out)

    for out, schema, part_col, val in (
            (day_out, _SINK_SCHEMA, "day", "2024-01-01"),
            (keyed_out, _KEYED_SCHEMA, "bucket", "2024-01-01-10")):
        df = _read_touched(spark, out, schema, part_col, [val])
        plan = df._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        # single-value IN folds to equality; either form prunes
        assert m and re.search(
            rf"{part_col}#\d+ (=|IN)", m.group(1)), \
            f"{part_col} read not partition-pruned: {m}"


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics end-to-end: an event arriving after the
    watermark passed its window is DROPPED — the finalized window's
    count never changes and no duplicate row appears."""
    from pyspark.sql import functions as F2

    from data_ingestion_challenge_spark.streaming.pipeline import build_source

    src = tmp_path / "events"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def drop(name, rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string"
        ).coalesce(1).write.parquet(str(tmp_path / "stage" / name))
        import glob
        import shutil
        part = glob.glob(str(tmp_path / "stage" / name / "part-*.parquet"))[0]
        shutil.copy(part, src / f"{name}.parquet")

    def drain():
        q = (build_source(spark, str(src))
             .withWatermark("ts", "1 hour")
             .groupBy(F2.window("ts", "1 hour").alias("win"))
             .agg(F2.count("*").alias("n"))
             .select(F2.col("win.start").alias("ws"), "n")
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return {(r["ws"], r["n"]) for r in
                spark.read.schema("ws timestamp, n bigint")
                .parquet(out).collect()}

    import datetime as dt
    t = dt.datetime(2024, 1, 1)

    # batch 1: event in the 00:00 window + one at 05:00 → watermark
    # advances to 04:00, finalizing (emitting) the 00:00 window.
    drop("b1", [(1, t + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
                (2, t + dt.timedelta(hours=5), 2, "view", 1.0, "{}")])
    assert drain() == {(t, 1)}

    # batch 2: a LATE event for the finalized 00:00 window (dropped)
    # + one at 07:00 (advances watermark → 05:00 window emitted).
    drop("b2", [(3, t + dt.timedelta(minutes=20), 3, "click", 1.0, "{}"),
                (4, t + dt.timedelta(hours=7), 4, "view", 1.0, "{}")])
    got = drain()
    assert got == {(t, 1), (t + dt.timedelta(hours=5), 1)}, \
        f"late event must be dropped, 00:00 stays at 1: {got}"


def test_dedup_stream_within_watermark(spark, tmp_path):
    """Duplicate event_ids inside the watermark horizon are filtered;
    state is watermark-bounded (dropDuplicatesWithinWatermark)."""
    from data_ingestion_challenge_spark.sources.streams import dedup_stream
    from data_ingestion_challenge_spark.streaming.pipeline import build_source

    src = tmp_path / "events"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    import datetime as dt
    t = dt.datetime(2024, 1, 1)
    rows = [(1, t, 7, "click", 1.0, "{}"),
            (1, t + dt.timedelta(minutes=1), 7, "click", 1.0, "{}"),  # dup
            (2, t + dt.timedelta(minutes=2), 8, "view", 2.0, "{}"),
            (2, t + dt.timedelta(minutes=3), 8, "view", 2.0, "{}"),   # dup
            (3, t + dt.timedelta(minutes=4), 9, "error", 0.5, "{}")]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(tmp_path / "stage"))
    import glob
    import shutil
    shutil.copy(glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0],
                src / "b1.parquet")

    q = (dedup_stream(build_source(spark, str(src)))
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = (spark.read
           .schema("event_id bigint, ts timestamp, user_id bigint, "
                   "event_type string, value double, props string")
           .parquet(out))
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3]


def test_kafka_stream_raises_without_connector(spark):
    import pytest as _pytest

    from data_ingestion_challenge_spark.sources.streams import kafka_stream
    with _pytest.raises(ImportError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")


def test_attribution_join_across_batches(spark, tmp_path):
    """Stream-stream interval join: clicks arriving in an EARLIER
    micro-batch than their purchase still match (join state buffers
    across triggers; maxFilesPerTrigger=1 forces separate batches)."""
    from datetime import datetime

    from data_ingestion_challenge_spark.streaming.pipeline import (
        run_attribution_bounded)

    def ev(eid, ts_min, uid, etype):
        return (eid, datetime(2024, 1, 1, 10, ts_min), uid, etype, 1.0, "{}")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import glob
    import shutil

    src = str(tmp_path / "ev"); os.makedirs(src)

    def land(name, rows):
        stage = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(stage)
        shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                    os.path.join(src, name + ".parquet"))

    # batch 1: two clicks (u1 in-window, u2 will be out of window)
    land("f1", [ev(1, 0, 1, "click"), ev(2, 0, 2, "click")])
    # batch 2: u1 purchase 20 min later (match), u2 purchase 40 min
    # later (outside the 30-min window), u3 purchase with no click
    land("f2", [ev(3, 20, 1, "purchase"), ev(4, 40, 2, "purchase"),
                ev(5, 20, 3, "purchase")])

    got = run_attribution_bounded(spark, src).collect()
    assert [(r.purchase_id, r.click_id, r.user_id, r.gap_s)
            for r in got] == [(3, 1, 1, 1200)]


def test_streaming_cms_equals_batch_sketch(spark):
    """The stream-built sketch serves IDENTICAL top-k estimates to the
    batch count-min sketch (bucket-wise merge is exact)."""
    from data_ingestion_challenge_spark.plans import QUERIES
    from tests.conftest import SF_DIR
    got = QUERIES["streaming_cms_topk"](spark, SF_DIR).collect()
    want = QUERIES["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_keyed_rollup_delta_null_event_type(spark, tmp_path):
    """A null event_type must round-trip the composite key: the delta
    path groups and decodes it as a genuine NULL, row-identical to
    the overwrite path's null grouping (concat_ws would have silently
    dropped the separator and fabricated the epoch as the type)."""
    from datetime import datetime

    from data_ingestion_challenge_spark.streaming.incremental import (
        _keyed_rollup_delta_table, keyed_delta_increments,
        merge_keyed_batch, read_keyed_rollup, read_keyed_rollup_delta,
    )

    rows = [(None, datetime(2024, 1, 1, 5, 10), 1.0),
            (None, datetime(2024, 1, 1, 5, 40), 2.0),
            ("click", datetime(2024, 1, 1, 5, 20), 4.0),
            ("5|weird|type", datetime(2024, 1, 1, 6, 5), 8.0)]
    batch = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double")

    ow_out = str(tmp_path / "ow")
    merge_keyed_batch(batch, 0, ow_out)
    want = sorted((tuple(r) for r in
                   read_keyed_rollup(spark, ow_out).collect()),
                  key=repr)

    t = _keyed_rollup_delta_table(spark, str(tmp_path / "d"))
    t.accumulate_batch(keyed_delta_increments(batch, "hour"), 0,
                       sum_cols=["n_events", "value_sum_micros"],
                       app="keyed_rollup", commit_mode="delta")
    got = sorted((tuple(r) for r in
                  read_keyed_rollup_delta(t).collect()), key=repr)
    assert got == want
    by_type = {r[0]: r for r in got}
    assert None in by_type and by_type[None][2] == 2  # both null rows
    assert "5|weird|type" in by_type  # '|' in the type never corrupts
