"""Ingestion analytics, batch 2 (SURVEY.md §2A): pivots, per-user
lifetime stats, error-rate monitoring, cohort retention, histograms —
the serving-side aggregates an ingestion pipeline exposes."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_daily_event_counts",
    oracle="""
    SELECT date_trunc('day', ts)::TIMESTAMP AS day_ts,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY date_trunc('day', ts)::TIMESTAMP
    """,
)
def pivot_daily_event_counts(cat: Catalog) -> DataFrame:
    """Wide pivot with an EXPLICIT pivot-value list — without it Spark
    runs an extra distinct-collection job over the full table."""
    return (
        cat.events
        .groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
    )


@query(
    "user_lifetime_stats",
    oracle="""
    SELECT user_id, min(ts) AS first_seen, max(ts) AS last_seen,
           count(*) AS n_events,
           count(DISTINCT date_trunc('day', ts)::TIMESTAMP) AS active_days
    FROM events GROUP BY user_id
    """,
)
def user_lifetime_stats(cat: Catalog) -> DataFrame:
    return (
        cat.events.groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"),
             F.max("ts").alias("last_seen"),
             F.count("*").alias("n_events"),
             F.countDistinct(F.date_trunc("day", col("ts")))
             .alias("active_days"))
    )


@query(
    "hourly_error_rate",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 / count(*), 4) AS error_rate
    FROM events GROUP BY date_trunc('hour', ts)
    """,
)
def hourly_error_rate(cat: Catalog) -> DataFrame:
    return (
        cat.events
        .groupBy(F.date_trunc("hour", col("ts")).alias("hour_ts"))
        .agg(F.round(
            F.sum(F.when(col("event_type") == "error", 1).otherwise(0))
            / F.count("*"), 4).alias("error_rate"))
    )


@query(
    "signup_cohort_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, min(date_trunc('day', ts)::TIMESTAMP) AS cohort_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT cohort_day, count(DISTINCT c.user_id) AS cohort_size,
           count(DISTINCT CASE WHEN e.user_id IS NOT NULL
                               THEN c.user_id END) AS retained_next_day
    FROM cohort c
    LEFT JOIN events e
      ON e.user_id = c.user_id
     AND e.ts >= cohort_day + INTERVAL 1 DAY
     AND e.ts <  cohort_day + INTERVAL 2 DAY
    GROUP BY cohort_day
    """,
)
def signup_cohort_retention(cat: Catalog) -> DataFrame:
    """Classic D1 retention: cohort by first signup day, retained =
    any event in the following day.  LEFT range-join keeps empty
    cohorts; count(DISTINCT CASE…) counts matched users once."""
    cohort = (cat.events.where(col("event_type") == "signup")
              .groupBy("user_id")
              .agg(F.min(F.date_trunc("day", col("ts"))).alias("cohort_day")))
    e = cat.events.select(col("user_id").alias("_eu"), "ts")
    joined = cohort.join(
        e, (col("_eu") == col("user_id"))
        & (col("ts") >= col("cohort_day") + F.expr("INTERVAL 1 DAY"))
        & (col("ts") < col("cohort_day") + F.expr("INTERVAL 2 DAYS")),
        "left")
    return (
        joined.groupBy("cohort_day")
        .agg(F.countDistinct("user_id").alias("cohort_size"),
             F.countDistinct(F.when(col("_eu").isNotNull(), col("user_id")))
             .alias("retained_next_day"))
    )


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 20.0) AS BIGINT) AS bucket,
           count(*) AS n_events,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY CAST(floor(value / 20.0) AS BIGINT)
    """,
)
def value_histogram(cat: Catalog) -> DataFrame:
    bucket = F.floor(col("value") / 20.0).cast("long")
    return (
        cat.events.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.min("value"), 2).alias("min_value"),
             F.round(F.max("value"), 2).alias("max_value"))
    )


@query(
    "first_touch_attribution",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT event_type AS first_event_type, count(*) AS n_users
    FROM ranked WHERE rn = 1 GROUP BY event_type
    """,
)
def first_touch_attribution(cat: Catalog) -> DataFrame:
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        cat.events
        .withColumn("_rn", F.row_number().over(w))
        .where(col("_rn") == 1)
        .groupBy(col("event_type").alias("first_event_type"))
        .agg(F.count("*").alias("n_users"))
    )


from data_ingestion_challenge_spark.operators.sketch import (  # noqa: E402
    cms_oracle_sql, cms_user_topk)


@query("cms_heavy_hitters", oracle=cms_oracle_sql(10))
def cms_heavy_hitters(cat: Catalog) -> DataFrame:
    """Top-10 users by count-min-sketch ESTIMATE (operators/sketch.py):
    mergeable O(d·w) state instead of a per-user shuffle; the md5-based
    sketch is reproduced bucket-for-bucket by the oracle."""
    return cms_user_topk(cat.events, k=10)


@query(
    "unpivot_event_type_counts",
    # The melt of the wide pivot keeps explicit zeros (a day with no
    # errors still has an 'error' row) — hence the days × types frame.
    oracle="""
    WITH days AS (
        SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS day_ts
        FROM events
    ), types AS (
        SELECT unnest(['click','error','purchase','signup','view'])
               AS event_type
    ), counts AS (
        SELECT date_trunc('day', ts)::TIMESTAMP AS day_ts, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT d.day_ts, t.event_type, COALESCE(c.n, 0) AS n
    FROM days d CROSS JOIN types t
    LEFT JOIN counts c USING (day_ts, event_type)
    """,
)
def unpivot_event_type_counts(cat: Catalog) -> DataFrame:
    """UNPIVOT (melt): wide per-type columns back to long rows — the
    inverse of pivot_daily_event_counts, zeros preserved."""
    wide = (
        cat.events
        .groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
    )
    return wide.unpivot(
        ids=["day_ts"], values=list(EVENT_TYPES),
        variableColumnName="event_type", valueColumnName="n")


@query(
    "sessionize_builtin",
    # Spark's session_window closes a session when the NEXT event is
    # ≥ gap after the last (end-exclusive window), so the oracle's gap
    # test is >= — unlike manual `sessionize`, whose rule is strictly >.
    oracle="""
    WITH seq AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end_excl,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def sessionize_builtin(cat: Catalog) -> DataFrame:
    """Sessionization via the BUILT-IN session_window aggregate (state
    merged by the engine, also usable under readStream unchanged) —
    cross-checked against the window-function formulation's SQL."""
    return (
        cat.events
        .groupBy("user_id", F.session_window(col("ts"), "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                col("session_window.start").alias("session_start"),
                col("session_window.end").alias("session_end_excl"),
                "n_events")
    )


from data_ingestion_challenge_spark.operators.stats import (  # noqa: E402
    GINI_ORACLE, user_activity_gini)


@query("user_activity_gini", oracle=GINI_ORACLE)
def user_activity_gini_q(cat: Catalog) -> DataFrame:
    """Custom aggregate (applyInPandas UDAF shape): per-type Gini of
    user activity — operators/stats.py."""
    return user_activity_gini(cat.events)


@query(
    "sliding_window_counts",
    # Spark's window(ts, 5m, 1m) assigns each event to the 5
    # epoch-aligned minute windows covering it — reproduced by
    # exploding k ∈ [0,5) window offsets per event.
    oracle="""
    SELECT date_trunc('minute', ts) - k * INTERVAL 1 MINUTE AS window_start,
           count(*) AS n_events
    FROM (SELECT ts, unnest(range(0, 5)) AS k FROM events)
    GROUP BY 1
    """,
)
def sliding_window_counts(cat: Catalog) -> DataFrame:
    """Sliding-window rate: 5-minute windows advancing every minute
    (each event expands into 5 windows via Expand — one scan, map-side
    combined; identical code runs under readStream with a watermark)."""
    return (
        cat.events
        .groupBy(F.window(col("ts"), "5 minutes", "1 minute").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(col("win.start").alias("window_start"), "n_events")
    )
