"""Streaming pipeline tests: bounded drain matches batch; jsonl
directory-watch ingestion processes late-arriving drops."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.sources.streams import jsonl_stream
from data_ingestion_challenge_spark.streaming.pipeline import run_bounded

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
