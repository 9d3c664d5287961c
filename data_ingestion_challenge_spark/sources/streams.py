"""Streaming source builders (thin façade over streaming/pipeline plus
a JSON-lines directory watcher — the shape of the reference's
listen-for-records ingest loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_challenge_spark.sources.files import EVENTS_SCHEMA
from data_ingestion_challenge_spark.streaming.pipeline import (  # noqa: F401
    build_source, rate_demo,
)


def jsonl_stream(spark: SparkSession, watch_dir: str,
                 schema: str = EVENTS_SCHEMA,
                 max_files_per_trigger: int = 16) -> DataFrame:
    """Watch a directory for JSON-lines drops — file-transport ingest.
    Swap for Kafka at deploy time without touching downstream plans."""
    return (spark.readStream
            .schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(watch_dir))


def parse_event_values(raw: DataFrame, schema: str = EVENTS_SCHEMA,
                       value_col: str = "value") -> DataFrame:
    """The Kafka wire contract as a standalone projection: a frame
    carrying JSON event payloads in a binary/string `value_col` →
    typed events columns.  This is EXACTLY what kafka_stream applies
    after .load(); factoring it out makes the transform testable on a
    batch DataFrame without the connector jar (absent here) — the
    contract test proves it byte-identical to the jsonl source's
    parse of the same payload lines (tests/test_kafka_contract.py).
    Works on batch and streaming frames alike (pure projection)."""
    from pyspark.sql import functions as F
    return (raw.select(F.from_json(F.col(value_col).cast("string"), schema)
                       .alias("e"))
            .select("e.*"))


def kafka_stream(spark: SparkSession, bootstrap_servers: str,
                 topic: str, schema: str = EVENTS_SCHEMA,
                 starting_offsets: str = "latest") -> DataFrame:
    """Kafka ingest: value bytes → JSON → typed events columns.  The
    downstream contract is IDENTICAL to jsonl_stream/build_source —
    every plan in this repo runs unchanged on a Kafka feed.

    Requires the spark-sql-kafka connector jar on the classpath (not
    shipped in this container); without it the data-source lookup
    fails at .load(), which we surface as a clear ImportError."""
    try:
        raw = (spark.readStream.format("kafka")
               .option("kafka.bootstrap.servers", bootstrap_servers)
               .option("subscribe", topic)
               .option("startingOffsets", starting_offsets)
               .load())
    except Exception as exc:  # connector jar absent
        raise ImportError(
            "kafka source needs the spark-sql-kafka connector jar "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        ) from exc
    return parse_event_values(raw, schema)


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Idempotent ingest with BOUNDED state: duplicates of event_id are
    filtered within the watermark horizon and the dedup state ages out
    with it — the production form of dropDuplicates (whose state grows
    forever).  A replay older than the horizon would re-insert; size
    the watermark to the transport's redelivery window."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))
