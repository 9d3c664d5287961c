"""Kafka parse-contract test: the value-JSON → typed-events projection
kafka_stream applies after .load() (sources/streams.parse_event_values)
must be byte-identical to the jsonl source's parse of the same payload
lines.  The connector jar is absent in this container, so this is the
executable contract for the Kafka path's transform — swap the transport
at deploy time and the downstream plans see identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_WIRE_SCHEMA = ("event_id long, ts_us long, user_id long, "
                "event_type string, value double")


def test_kafka_value_parse_matches_jsonl_source(spark, cat, tmp_path):
    from data_ingestion_challenge_spark.sources.files import read_jsonl
    from data_ingestion_challenge_spark.sources.streams import (
        parse_event_values)

    wire = cat.events.select(
        "event_id", F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id", "event_type", "value").coalesce(1)
    out = str(tmp_path / "payloads")
    wire.write.mode("overwrite").json(out)

    via_jsonl = read_jsonl(spark, out, schema=_WIRE_SCHEMA)
    # Kafka-shaped frame: each JSON line as a BINARY `value` payload —
    # exactly what the kafka source's .load() exposes.
    kafka_shaped = (spark.read.text(out)
                    .select(F.encode(F.col("value"), "UTF-8")
                            .alias("value")))
    via_kafka = parse_event_values(kafka_shaped, schema=_WIRE_SCHEMA)

    assert via_kafka.columns == via_jsonl.columns
    a = sorted(tuple(r) for r in via_jsonl.collect())
    b = sorted(tuple(r) for r in via_kafka.collect())
    assert a == b and len(a) > 0


def test_parse_event_values_is_pure_projection(spark):
    """The contract transform must stay a narrow projection (no
    shuffle): its physical plan may not contain an Exchange — at
    ingest scale the parse rides the source partitioning."""
    from data_ingestion_challenge_spark.sources.streams import (
        parse_event_values)

    raw = spark.range(10).select(
        F.encode(F.to_json(F.struct(
            F.col("id").alias("event_id"),
            F.lit(0).alias("ts_us"),
            F.col("id").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.5).alias("value"))), "UTF-8").alias("value"))
    plan = (parse_event_values(raw, schema=_WIRE_SCHEMA)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_parse_event_values_on_streaming_frame(spark, cat, tmp_path):
    """The contract transform must run unchanged under readStream —
    spark.readStream.text() exposes the same value-column shape as
    the Kafka source's .load(), so draining it through
    parse_event_values proves the projection is streaming-safe (pure,
    no batch-only ops)."""
    import uuid

    wire = cat.events.select(
        "event_id", F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id", "event_type", "value").coalesce(1)
    out = str(tmp_path / "stream_payloads")
    wire.write.mode("overwrite").json(out)

    from data_ingestion_challenge_spark.sources.streams import (
        parse_event_values)

    name = "kafka_shape_" + uuid.uuid4().hex[:8]
    stream = (spark.readStream.text(out)
              .select(F.encode(F.col("value"), "UTF-8").alias("value")))
    q = (parse_event_values(stream, schema=_WIRE_SCHEMA)
         .groupBy("event_type")
         .agg(F.count("*").alias("n"),
              F.sum("ts_us").alias("ts_sum"))
         .writeStream.queryName(name)
         .outputMode("complete").format("memory")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in
            wire.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("ts_us").alias("ts_sum")).collect()}
    assert got == want and got
