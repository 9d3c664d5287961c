"""Structured Streaming ingestion pipeline.

The reference ingests an unbounded event feed through workers into
storage; the Spark-native shape is `readStream → windowed agg →
writeStream`.  The SAME aggregation logic as the batch plans runs
behind a watermark; `run_bounded` drains a bounded source with an
availableNow trigger so correctness can be checked against the batch
oracle (plans/streaming_q.py) — this exercises the real streaming
engine (state store, watermarks, incremental execution), not a batch
re-dress.

Scale notes: state is keyed by (window, …) and bounded by the
watermark horizon; update-mode sinks emit deltas.  File source at
100 TB → swap for Kafka by changing only `build_source`.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def build_source(spark: SparkSession, events_path: str) -> DataFrame:
    """File-based streaming source with the events schema (schema must
    be explicit for streams; inferred once from the parquet footer)."""
    import os

    from data_ingestion_challenge_spark.catalog import normalize_ts
    from data_ingestion_challenge_spark.scratch import scratch_dir
    schema = spark.read.parquet(events_path).schema
    if os.path.isfile(events_path):
        # The file stream source only accepts directories — stage a dir
        # of symlinks (zero-copy) when handed a bare file; lives under
        # the session scratch root (removed at interpreter exit — the
        # stream reads it lazily until the drain completes).
        stage = scratch_dir("stream_src_")
        os.symlink(events_path, os.path.join(stage, os.path.basename(events_path)))
        events_path = stage
    return normalize_ts(
        spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path))


def hourly_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked 1-hour tumbling-window rollup — the streaming twin of
    plans/events.hourly_user_events aggregated across users."""
    return (
        stream
        .withWatermark("ts", watermark)
        .groupBy(F.window(col("ts"), "1 hour").alias("win"))
        .agg(F.count("*").alias("n_events"),
             F.sum(col("value").cast("decimal(30,6)")).alias("_total_value"))
    )


def run_bounded(spark: SparkSession, events_path: str) -> DataFrame:
    """Drain the bounded source through the streaming engine
    (availableNow) into a memory sink; return the finished result."""
    name = "stream_rollup_" + uuid.uuid4().hex[:8]
    q = (
        hourly_rollup(build_source(spark, events_path))
        .writeStream
        .queryName(name)
        .outputMode("complete")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(col("win.start").alias("hour_ts"),
                "n_events",
                F.round(col("_total_value"), 2).cast("double").alias("total_value"))
    )


def run_dedup_bounded(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming idempotent ingestion: dropDuplicates on event_id keeps
    exactly the first arrival of every event (re-delivered records are
    filtered by keyed state), then a per-type rollup.  Production note:
    with a watermark this becomes dropDuplicatesWithinWatermark so the
    dedup state ages out; bounded-drain tests omit it so the whole key
    space stays checkable."""
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    q = (
        build_source(spark, events_path)
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_events"))
        .writeStream
        .queryName(name)
        .outputMode("complete")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_dedup_watermark_bounded(spark: SparkSession,
                                events_path: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: the PRODUCTION shape of
    idempotent ingestion — dedup state ages out with the event-time
    watermark instead of growing forever (run_dedup_bounded's
    dropDuplicates keeps every key for the life of the query).

    The synthetic duplicate rides the SAME input row (explode of a
    two-element array), so both copies always land in one micro-batch:
    the dedup verdict is batch-boundary-invariant and the bounded
    drain stays deterministic under any availableNow splitting."""
    name = "stream_dedup_wm_" + uuid.uuid4().hex[:8]
    src = build_source(spark, events_path)
    dup = src.select(
        F.explode(F.array(F.lit(0), F.lit(1))).alias("_copy"), "*")
    q = (
        dup.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events_deduped"))
        .writeStream
        .queryName(name)
        .outputMode("complete")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def rate_demo(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Unbounded rate-source demo stream (synthetic ingest load) — used
    by tests to prove the pipeline accepts genuinely unbounded input."""
    rate = spark.readStream.format("rate") \
        .option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        col("timestamp").alias("ts"),
        (col("value") % 100).alias("user_id"),
        F.when(col("value") % 3 == 0, "view").otherwise("click")
        .alias("event_type"),
        (col("value") % 50).cast("double").alias("value"),
    )


def run_attribution_bounded(spark: SparkSession, events_path: str) -> DataFrame:
    """Stream-STREAM interval join on the real engine: each purchase
    matches the same user's clicks from the preceding 30 minutes
    (click→purchase attribution).

    Both sides are watermarked and the join condition time-bounds the
    match window, so the engine can expire join state: a buffered click
    is dropped once the watermark passes click_ts + 30 min — state is
    O(watermark horizon × arrival rate), never O(stream history).
    Append mode (matches emit exactly once).  Bounded drain via
    availableNow; the batch oracle is the identical interval join in
    SQL."""
    name = "stream_attr_" + uuid.uuid4().hex[:8]
    src = build_source(spark, events_path)
    clicks = (src.where(col("event_type") == "click")
              .select(col("event_id").alias("click_id"),
                      col("user_id").alias("c_user"),
                      col("ts").alias("c_ts"))
              .withWatermark("c_ts", "2 hours"))
    purchases = (build_source(spark, events_path)
                 .where(col("event_type") == "purchase")
                 .select(col("event_id").alias("purchase_id"),
                         col("user_id").alias("user_id"),
                         col("ts").alias("p_ts"))
                 .withWatermark("p_ts", "2 hours"))
    joined = purchases.join(
        clicks,
        (col("user_id") == col("c_user"))
        & (col("c_ts") <= col("p_ts"))
        & (col("c_ts") >= col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner")
    q = (
        joined.select(
            "purchase_id", "click_id", "user_id",
            ((F.unix_micros(col("p_ts")) - F.unix_micros(col("c_ts")))
             / F.lit(1_000_000)).cast("long").alias("gap_s"))
        .writeStream
        .queryName(name)
        .outputMode("append")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_cms_bounded(spark: SparkSession, events_path: str,
                    k: int = 10) -> DataFrame:
    """Count-min sketch ON the streaming engine: the bucket aggregate
    (operators/sketch.cms_build) runs as a streaming groupBy whose
    entire state is the fixed d·w = 1024 counters — the textbook
    mergeable-sketch stream: state size is CONSTANT in stream length,
    and every micro-batch's contribution merges by bucket-wise sum.

    Bounded drain (availableNow, complete mode) yields the final
    sketch table; top-k serving is the batch-side probe against it —
    exactly how a production deployment splits build (continuous) from
    serve (on demand)."""
    from data_ingestion_challenge_spark.operators import sketch as SK

    name = "stream_cms_" + uuid.uuid4().hex[:8]
    q = (
        SK.cms_build(build_source(spark, events_path))
        .writeStream
        .queryName(name)
        .outputMode("complete")
        .format("memory")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    users = spark.read.parquet(events_path).select("user_id").distinct()
    return SK.cms_probe(spark.table(name), users, k)
