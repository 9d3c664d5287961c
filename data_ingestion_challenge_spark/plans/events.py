"""Ingestion analytics over the `events` stream table (SURVEY.md §2A).

This is the reference's core surface — GlenDC/data-ingestion-challenge
ingests per-user events and serves hourly rollups, distinct-user counts
and top-k user rankings.  Here each aggregate is a declarative plan the
same code runs in batch or (see streaming/) behind a watermark.

Scale notes: (user_id, hour) keys are high-cardinality and unskewed →
clean hash aggregation with map-side combine.  Top-k uses
TakeOrderedAndProject (orderBy+limit), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import msum, query


@query(
    "hourly_user_events",
    oracle="""
    SELECT user_id, date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
    bench=True,
)
def hourly_user_events(cat: Catalog) -> DataFrame:
    return (
        cat.events
        .groupBy("user_id", F.date_trunc("hour", col("ts")).alias("hour_ts"))
        .agg(F.count("*").alias("n_events"),
             msum(col("value")).alias("total_value"))
    )


@query(
    "hourly_distinct_users",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def hourly_distinct_users(cat: Catalog) -> DataFrame:
    return (
        cat.events
        .groupBy(F.date_trunc("hour", col("ts")).alias("hour_ts"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "distinct_users_approx",
    # The sketch estimate itself isn't SQL-replayable; the checkable
    # surface is the exact count (hashed by the oracle) plus the ε
    # bound the sketch is specified by.
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           count(DISTINCT user_id) AS n_users,
           TRUE AS approx_ok
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def distinct_users_approx(cat: Catalog) -> DataFrame:
    """HLL sketch path — mergeable, constant memory per group; this is
    the 100 TB answer to distinct-counting (exact distinct needs a
    second shuffle on (hour, user)).  The production plan is the
    approx agg ALONE; registered with its exact twin + ε-gate
    (|approx − exact| ≤ 5%·exact at rsd 0.01) so the sketch is
    driver-verifiable."""
    return (
        cat.events
        .groupBy(F.date_trunc("hour", col("ts")).alias("hour_ts"))
        .agg(F.approx_count_distinct("user_id", 0.01).alias("_apx"),
             F.countDistinct("user_id").alias("n_users"))
        .select("hour_ts", "n_users",
                (F.abs(col("_apx") - col("n_users"))
                 <= 0.05 * col("n_users")).alias("approx_ok"))
    )


@query(
    "top_users",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id LIMIT 10
    """,
    bench=True,
)
def top_users(cat: Catalog) -> DataFrame:
    return (
        cat.events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(col("n_events").desc(), "user_id")
        .limit(10)
    )


@query(
    "top_users_by_type",
    oracle="""
    SELECT event_type, user_id, n_events, rk FROM (
        SELECT event_type, user_id, count(*) AS n_events,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY count(*) DESC, user_id) AS rk
        FROM events GROUP BY event_type, user_id
    ) WHERE rk <= 5
    """,
)
def top_users_by_type(cat: Catalog) -> DataFrame:
    counts = cat.events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(col("n_events").desc(), "user_id")
    return counts.withColumn("rk", F.row_number().over(w)).where(col("rk") <= 5)


@query(
    "event_type_breakdown",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def event_type_breakdown(cat: Catalog) -> DataFrame:
    return (
        cat.events.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             msum(col("value")).alias("total_value"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


@query(
    "daily_revenue",
    oracle="""
    SELECT date_trunc('day', ts)::TIMESTAMP AS day_ts,
           CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue, count(*) AS n_purchases
    FROM events WHERE event_type = 'purchase'
    GROUP BY date_trunc('day', ts)::TIMESTAMP
    """,
)
def daily_revenue(cat: Catalog) -> DataFrame:
    return (
        cat.events.where(col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
        .agg(msum(col("value")).alias("revenue"),
             F.count("*").alias("n_purchases"))
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(cat: Catalog) -> DataFrame:
    """Semi-structured payload parsing — JVM-side from_json (no Python)."""
    k = F.from_json(col("props"), "k BIGINT").getField("k")
    return (
        cat.events
        .select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(F.round(F.avg("_k"), 4).alias("avg_k"),
             F.max("_k").alias("max_k"))
    )


@query(
    "sessionize",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM seq
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec
    FROM sess GROUP BY user_id, session_seq
    """,
    bench=True,
)
def sessionize(cat: Catalog) -> DataFrame:
    """30-min-gap sessionization: lag → gap flag → running sum = session
    id, then per-session aggregates.  One shuffle on user_id which both
    window passes and the final groupBy reuse (same partitioning)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros(col("ts")) - F.unix_micros(F.lag("ts").over(w))
           > 30 * 60 * 1000000), 1).otherwise(0)
    sess = (
        cat.events
        .select("user_id", "ts", "event_id")
        .withColumn("_new", new_sess)
        .withColumn("session_seq",
                    F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
              / 1000000.0).alias("duration_sec"))
    )


@query(
    "daily_active_users",
    oracle="""
    SELECT date_trunc('day', ts)::TIMESTAMP AS day_ts,
           count(DISTINCT user_id) AS dau
    FROM events GROUP BY date_trunc('day', ts)::TIMESTAMP
    """,
)
def daily_active_users(cat: Catalog) -> DataFrame:
    return (
        cat.events
        .groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )


@query(
    "rolling_7d_dau",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS d FROM events)
    SELECT d AS day_ts, count(DISTINCT e.user_id) AS n_active_7d
    FROM days JOIN events e
      ON e.ts >= d - INTERVAL 6 DAY AND e.ts < d + INTERVAL 1 DAY
    GROUP BY d
    """,
)
def rolling_7d_dau(cat: Catalog) -> DataFrame:
    """Trailing-7-day distinct actives — a RANGE JOIN: the tiny `days`
    side is broadcast so the fact scan streams once through a nested
    loop against ~30 rows (never a shuffle)."""
    days = (cat.events
            .select(F.date_trunc("day", col("ts")).alias("d")).distinct())
    e = cat.events.select("ts", "user_id")
    return (
        e.join(broadcast(days),
               (col("ts") >= col("d") - F.expr("INTERVAL 6 DAYS"))
               & (col("ts") < col("d") + F.expr("INTERVAL 1 DAY")))
        .groupBy(col("d").alias("day_ts"))
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
    )


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS first_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
        SELECT count(DISTINCT e.user_id) AS n_converted
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.first_signup
    )
    SELECT (SELECT count(*) FROM s) AS n_signup_users,
           n_converted,
           round(n_converted / (SELECT count(*) FROM s)::DOUBLE, 4) AS conv_rate
    FROM conv
    """,
)
def funnel_signup_purchase(cat: Catalog) -> DataFrame:
    signups = (cat.events.where(col("event_type") == "signup")
               .groupBy("user_id").agg(F.min("ts").alias("first_signup")))
    converted = (
        cat.events.where(col("event_type") == "purchase")
        .join(signups, "user_id")
        .where(col("ts") > col("first_signup"))
        .agg(F.countDistinct("user_id").alias("n_converted"))
    )
    totals = signups.agg(F.count("*").alias("n_signup_users"))
    return (
        converted.join(broadcast(totals))
        .select("n_signup_users", "n_converted",
                F.round(col("n_converted") / col("n_signup_users")
                        .cast("double"), 4).alias("conv_rate"))
    )


@query(
    "event_dedup_idempotent",
    oracle="""
    SELECT count(*) AS n_rows, CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value
    FROM (SELECT DISTINCT * FROM
          (SELECT * FROM events UNION ALL SELECT * FROM events))
    """,
)
def event_dedup_idempotent(cat: Catalog) -> DataFrame:
    """Idempotent re-ingestion: replaying the same batch must not change
    downstream aggregates (the reference dedupes on event identity at
    ingest).  Exact-dedup = one hash shuffle on all columns."""
    replayed = cat.events.unionByName(cat.events)
    return (replayed.distinct()
            .agg(F.count("*").alias("n_rows"),
                 msum(col("value")).alias("total_value")))
