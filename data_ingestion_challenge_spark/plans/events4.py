"""Events analytics, batch 4 (SURVEY.md §2A): sequence transitions,
inter-arrival gaps, DAU/WAU stickiness, tail latency of the value
stream, and a JSONL-source ingest gate.

Parity notes: every event-time window orders by (ts, event_id) — the
composite is unique, so lag() is deterministic in both engines; gap
arithmetic stays in integral microseconds (epoch_us == unix_micros)
until the final rounded division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ sequence analysis

@query(
    "event_type_transitions",
    # First-order Markov transition counts over each user's event
    # sequence — the input of any behavioral next-event model.
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events)
    SELECT prev AS from_type, event_type AS to_type,
           count(*) AS n_transitions
    FROM seq WHERE prev IS NOT NULL
    GROUP BY prev, event_type
    """,
)
def event_type_transitions(cat: Catalog) -> DataFrame:
    """One shuffle on user_id for the lag window (per-user sequences
    are bounded), then a map-side-combined count over the tiny
    (from, to) key space."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (cat.events.select("user_id", "event_type", "ts", "event_id")
           .withColumn("prev", F.lag("event_type").over(w)))
    return (seq.where(col("prev").isNotNull())
            .groupBy(col("prev").alias("from_type"),
                     col("event_type").alias("to_type"))
            .agg(F.count("*").alias("n_transitions")))


@query(
    "user_interarrival_stats",
    # Per-user event cadence: gaps in integral microseconds (exact in
    # both engines), averaged exactly (BIGINT sum, then one division).
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS gap_us
        FROM events)
    SELECT user_id, count(*) AS n_gaps,
           round(avg(gap_us) / 1000000.0, 4) AS avg_gap_s,
           round(max(gap_us) / 1000000.0, 4) AS max_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def user_interarrival_stats(cat: Catalog) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(col("ts"))
    g = (cat.events.select("user_id", "ts", "event_id")
         .withColumn("gap_us", us - F.lag(us).over(w))
         .where(col("gap_us").isNotNull()))
    return (g.groupBy("user_id")
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.avg("gap_us") / 1000000.0, 4).alias("avg_gap_s"),
                 F.round(F.max("gap_us") / 1000000.0, 4).alias("max_gap_s")))


# ------------------------------------------------ engagement ratios

@query(
    "dau_wau_stickiness",
    # Stickiness = DAU / trailing-7d WAU per day — the engagement KPI
    # on top of the rolling_7d_dau range join.
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS d
                  FROM events),
    wau AS (SELECT d, count(DISTINCT e.user_id) AS wau
            FROM days JOIN events e
              ON e.ts >= d - INTERVAL 6 DAY AND e.ts < d + INTERVAL 1 DAY
            GROUP BY d),
    dau AS (SELECT date_trunc('day', ts)::TIMESTAMP AS d,
                   count(DISTINCT user_id) AS dau
            FROM events GROUP BY 1)
    SELECT dau.d AS day_ts, dau.dau, wau.wau,
           round(dau.dau / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def dau_wau_stickiness(cat: Catalog) -> DataFrame:
    """The tiny `days` dim broadcasts against one events scan (same
    plan discipline as rolling_7d_dau); the final dau⋈wau join is
    |days| rows on both sides."""
    days = (cat.events
            .select(F.date_trunc("day", col("ts")).alias("d")).distinct())
    wau = (cat.events.select("ts", "user_id")
           .join(broadcast(days),
                 (col("ts") >= col("d") - F.expr("INTERVAL 6 DAYS"))
                 & (col("ts") < col("d") + F.expr("INTERVAL 1 DAY")))
           .groupBy("d").agg(F.countDistinct("user_id").alias("wau")))
    dau = (cat.events
           .groupBy(F.date_trunc("day", col("ts")).alias("d"))
           .agg(F.countDistinct("user_id").alias("dau")))
    return (dau.join(wau, "d")
            .select(col("d").alias("day_ts"), "dau", "wau",
                    F.round(col("dau") / col("wau"), 4).alias("stickiness")))


@query(
    "hourly_value_p95",
    # Exact interpolated tail percentile per hour (Spark `percentile`
    # == DuckDB `quantile_cont`, the order_value_percentiles pairing).
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n_events,
           round(quantile_cont(value, 0.95), 4) AS p95_value
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def hourly_value_p95(cat: Catalog) -> DataFrame:
    return (cat.events
            .groupBy(F.date_trunc("hour", col("ts")).alias("hour_ts"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.percentile("value", F.lit(0.95)), 4)
                 .alias("p95_value")))


# --------------------------------------------- file-source gates
#
# One gate per text/columnar wire format: materialize events once in
# the format under test (idempotent via Spark's _SUCCESS marker), read
# it back through the sources/files.py reader, and aggregate — the
# oracle reads the parquet ground truth, so any row lost or value bent
# in the round-trip diverges.  Timestamps travel as integral unix
# micros in the text formats (lossless; ISO strings round-trip µs
# ambiguously across engines).

def _format_dir_for(cat: Catalog, fmt: str, write_fn) -> str:
    import hashlib
    import os
    import tempfile

    # The tag includes the source parquet's (mtime, size): testdata is
    # regenerated between rounds, and a stale /tmp scaffold keyed on
    # sf_dir alone would silently serve last round's rows.
    src = f"{cat.sf_dir}/events.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{cat.sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_{fmt}_{tag}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write_fn(out)
    return out


def _wire_events(cat: Catalog) -> DataFrame:
    return cat.events.select(
        "event_id", F.unix_micros(col("ts")).alias("ts_us"),
        "user_id", "event_type", "value").coalesce(2)


_WIRE_SCHEMA = ("event_id long, ts_us long, user_id long, "
                "event_type string, value double")


def _jsonl_dir_for(cat: Catalog) -> str:
    return _format_dir_for(
        cat, "jsonl",
        lambda out: _wire_events(cat).write.mode("overwrite").json(out))


def _hourly_rollup(df: DataFrame) -> DataFrame:
    """The gate aggregate checks EVERY wire column, not just the group
    key: value rides as sum of integral micros (a CSV double bent in
    the text round-trip diverges), event_id as min/max (a dropped or
    duplicated row moves count; a corrupted id moves the extrema)."""
    return (df.groupBy(F.date_trunc("hour", F.timestamp_micros(
                col("ts_us"))).alias("hour_ts"))
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.round(col("value") * 1000000).cast("bigint"))
                 .alias("value_sum_micros"),
                 F.min("event_id").alias("min_event_id"),
                 F.max("event_id").alias("max_event_id"),
                 F.countDistinct("event_type").alias("n_types")))


_HOURLY_ORACLE = """
    SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS value_sum_micros,
           min(event_id) AS min_event_id,
           max(event_id) AS max_event_id,
           count(DISTINCT event_type) AS n_types
    FROM events GROUP BY date_trunc('hour', ts)
    """


@query("jsonl_source_hourly_counts", oracle=_HOURLY_ORACLE)
def jsonl_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates spark.read.json with an EXPLICIT schema (schema inference
    is a full extra pass at 100 TB — never rely on it) against the
    parquet ground truth.  The oracle reads the parquet view: any row
    lost or value bent in the JSONL round-trip diverges."""
    from data_ingestion_challenge_spark.sources.files import read_jsonl

    df = read_jsonl(cat.spark, _jsonl_dir_for(cat), schema=_WIRE_SCHEMA)
    return _hourly_rollup(df)


@query("csv_source_hourly_counts", oracle=_HOURLY_ORACLE)
def csv_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates the header-on CSV reader (sources/files.read_csv) — the
    format's stringly types make it the easiest place to silently bend
    a double or overflow a long, hence the parquet-oracle check."""
    from data_ingestion_challenge_spark.sources.files import read_csv

    path = _format_dir_for(
        cat, "csv",
        lambda out: (_wire_events(cat).write.mode("overwrite")
                     .option("header", "true").csv(out)))
    return _hourly_rollup(read_csv(cat.spark, path, schema=_WIRE_SCHEMA))


@query("orc_source_hourly_counts", oracle=_HOURLY_ORACLE)
def orc_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates the ORC reader (sources/files.read_orc) — same vectorized
    scan contract as parquet, verified against the parquet twin."""
    from data_ingestion_challenge_spark.sources.files import read_orc

    path = _format_dir_for(
        cat, "orc",
        lambda out: _wire_events(cat).write.mode("overwrite").orc(out))
    return _hourly_rollup(read_orc(cat.spark, path))


def _eventlog_write(cat: Catalog, out: str) -> None:
    """Executor-side wire-line writer: one .log file per partition in
    the eventlog source's `id|iso_ts|user|type|value|props` format.
    repr(float) round-trips the double exactly; the timestamp travels
    as ISO-8601 with microseconds (the format the source parses)."""
    import os

    import pandas as pd

    os.makedirs(out, exist_ok=True)
    wire = cat.events.select(
        "event_id", F.unix_micros(col("ts")).alias("ts_us"),
        "user_id", "event_type", "value", "props").coalesce(2)

    def _write(batches):
        from datetime import datetime, timedelta

        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out, f"part-{pid:05d}.log")
        n = 0
        epoch = datetime(1970, 1, 1)
        with open(path, "w", encoding="utf-8") as fh:
            for pdf in batches:
                for eid, us, uid, et, v, pr in pdf.itertuples(
                        index=False, name=None):
                    ts = (epoch
                          + timedelta(microseconds=int(us))).isoformat()
                    # float(v) first: itertuples yields numpy scalars,
                    # and numpy>=2 reprs them as 'np.float64(0.5)' —
                    # not a parseable wire literal.
                    fh.write(f"{eid}|{ts}|{uid}|{et}|{float(v)!r}|{pr}\n")
                    n += 1
        yield pd.DataFrame({"written": [n]})

    (wire.mapInPandas(_write, "written long")
     .agg(F.sum("written")).collect())
    open(os.path.join(out, "_SUCCESS"), "w").close()


@query("eventlog_source_hourly_counts", oracle=_HOURLY_ORACLE)
def eventlog_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates the CUSTOM Python DataSource (sources/eventlog.py) under
    the driver: events materialize as real wire-format .log lines
    (executor-side writer), read back through the registered
    `eventlog` format, and the rollup must equal the parquet ground
    truth — a bent ISO timestamp, a float that didn't round-trip, or a
    line sent to the _corrupt column all diverge."""
    from data_ingestion_challenge_spark.sources.eventlog import (
        read_eventlog)

    path = _format_dir_for(cat, "eventlog",
                           lambda out: _eventlog_write(cat, out))
    df = read_eventlog(cat.spark, path).select(
        "event_id", F.unix_micros(col("ts")).alias("ts_us"),
        "user_id", "event_type", "value")
    return _hourly_rollup(df)


@query("xml_source_hourly_counts", oracle=_HOURLY_ORACLE)
def xml_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates Spark 4's NATIVE xml source (sources/files.read_xml —
    spark-xml merged upstream, no external jar): events round-trip
    through real <event> elements and the rollup must equal the
    parquet ground truth — a bent double in the text encoding, a
    dropped element, or a mis-nested tag diverges."""
    from data_ingestion_challenge_spark.sources.files import (
        read_xml, write_xml)

    path = _format_dir_for(
        cat, "xml", lambda out: write_xml(_wire_events(cat), out))
    return _hourly_rollup(read_xml(cat.spark, path,
                                   schema=_WIRE_SCHEMA))


@query("avro_source_hourly_counts", oracle=_HOURLY_ORACLE)
def avro_source_hourly_counts(cat: Catalog) -> DataFrame:
    """Gates the Avro wire format END-TO-END: events are written as
    real Avro container files (pure-Python OCF writer, executor-side —
    sources/avro_ocf.py implements the public Avro spec since neither
    the spark-avro jar nor a Python avro package ships in this
    container), read back through the avro_ocf Python DataSource, and
    rolled up against the parquet ground truth.  A bent varint, a
    mis-framed block, or a dropped row diverges from the oracle."""
    from data_ingestion_challenge_spark.sources.avro_ocf import (
        read_avro_ocf, write_avro_ocf)

    path = _format_dir_for(
        cat, "avro",
        lambda out: write_avro_ocf(_wire_events(cat), out))
    return _hourly_rollup(read_avro_ocf(cat.spark, path,
                                        schema=_WIRE_SCHEMA))
