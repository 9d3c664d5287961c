"""Ingestion analytics, batch 5 (SURVEY.md §2A): session-level rollups
and abuse/burst detection — the monitoring surface an ingestion
service runs next to its counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

# The 30-min-gap sessionization chain shared with `sessionize`'s
# oracle, ending in per-session rows sess(user_id, session_seq, ts).
_SESS_CTE = """
    seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM seq
    )
"""


@query(
    "session_stats",
    # Per-user engagement profile over the sessionized stream: the
    # rollup a product/abuse dashboard reads (sessions, events per
    # session, longest session).  Durations in integral micros stay
    # exact; the ratio rounds at 4dp in both engines.
    oracle=f"""
    WITH {_SESS_CTE},
    per_sess AS (
        SELECT user_id, session_seq, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(avg(n_events), 4) AS avg_events_per_session,
           CAST(max(dur_us) AS BIGINT) AS max_session_us
    FROM per_sess GROUP BY user_id
    """,
)
def session_stats(cat: Catalog) -> DataFrame:
    """Per-user session rollup on top of the 30-min-gap sessionizer.

    Scale shape: ONE shuffle on user_id serves the lag window, the
    running sum, and both aggregates (identical partitioning
    throughout — the sessionize discipline, extended one level)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros(col("ts")) - F.unix_micros(F.lag("ts").over(w))
           > 30 * 60 * 1000000), 1).otherwise(0)
    sess = (cat.events.select("user_id", "ts", "event_id")
            .withColumn("_new", new_sess)
            .withColumn("session_seq",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    per_sess = (sess.groupBy("user_id", "session_seq")
                .agg(F.count("*").alias("n_events"),
                     (F.max(F.unix_micros(col("ts")))
                      - F.min(F.unix_micros(col("ts")))).alias("dur_us")))
    return (per_sess.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.round(F.avg("n_events"), 4)
                 .alias("avg_events_per_session"),
                 F.max("dur_us").alias("max_session_us")))


@query(
    "bot_burst_flag",
    # Burst detector: a user's max event count inside ANY trailing
    # 60-second window.  RANGE frames over integral epoch micros give
    # identical peer semantics in both engines; the ≥20 threshold is
    # an integer compare.
    oracle="""
    SELECT user_id,
           CAST(max(c) AS BIGINT) AS max_burst_60s,
           max(c) >= 20 AS bot_flag
    FROM (
        SELECT user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 60000000 PRECEDING
                                        AND CURRENT ROW) AS c
        FROM events)
    GROUP BY user_id
    """,
)
def bot_burst_flag(cat: Catalog) -> DataFrame:
    """Rate-abuse monitor: per user, the max events inside any
    trailing 60 s window, flagged at ≥20 — the ingest-side throttle
    signal the reference's service would act on.

    Scale shape: one shuffle on user_id; the RANGE window scans each
    user's sorted events once with a sliding frame (no self-join);
    the per-user max partial-aggregates on the same partitioning."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(col("ts")))
         .rangeBetween(-60_000_000, 0))
    burst = (cat.events.select("user_id", "ts")
             .withColumn("_c", F.count("*").over(w)))
    return (burst.groupBy("user_id")
            .agg(F.max("_c").alias("max_burst_60s"),
                 (F.max("_c") >= 20).alias("bot_flag")))


@query(
    "event_type_cooccurrence",
    # Behavioural co-occurrence matrix: for every unordered event-type
    # pair, how many users emitted both — the "users who X also Y"
    # surface.  Per-user distinct types is bounded by |types| (a
    # handful), so the per-user pair fan-out is a small constant.
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def event_type_cooccurrence(cat: Catalog) -> DataFrame:
    """Scale shape: the distinct collapses map-side; the self-join is
    an equi-join on user_id whose per-key fan-out is ≤ |types|² (a
    constant); the final rollup is |types|²-sized."""
    ut = cat.events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", col("event_type").alias("type_a"))
    b = ut.select("user_id", col("event_type").alias("type_b"))
    return (a.join(b, "user_id")
            .where(col("type_a") < col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count("*").alias("n_users")))
