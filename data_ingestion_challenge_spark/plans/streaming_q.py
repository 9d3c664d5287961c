"""Streaming-backed query entry (SURVEY.md §2D): the driver's
correctness gate runs the REAL streaming engine end-to-end and checks
the result against a plain batch SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query
from data_ingestion_challenge_spark.streaming import pipeline


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def streaming_hourly_rollup(cat: Catalog) -> DataFrame:
    return pipeline.run_bounded(cat.spark, f"{cat.sf_dir}/events.parquet")
