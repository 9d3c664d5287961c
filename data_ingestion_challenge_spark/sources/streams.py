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
