"""Ingestion analytics, batch 6 (SURVEY.md §2A): strict-order 3-step
funnel and hour-over-hour volume movers.

Parity notes: the funnel chains on strict `>` timestamp comparisons
(all integral-µs under the UTC session); movers rank on integer count
deltas with (|Δ| DESC, type ASC, hour ASC) tie-breaks in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ strict 3-step funnel

@query(
    "funnel_3step_strict",
    # signup → click AFTER the first signup → purchase AFTER that
    # first qualifying click, per user — the ordered form marketers
    # mean by "funnel" (funnel_signup_purchase is the 2-step any-order
    # cousin).  Each stage anchors on the FIRST qualifying event, so
    # the chain is deterministic per user.
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.s_ts
        GROUP BY e.user_id
    ), p AS (
        SELECT DISTINCT e.user_id
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_signup_click,
           (SELECT count(*) FROM p) AS n_full_funnel,
           round((SELECT count(*) FROM c)
                 / (SELECT count(*) FROM s)::DOUBLE, 4) AS click_rate,
           round((SELECT count(*) FROM p)
                 / (SELECT count(*) FROM s)::DOUBLE, 4) AS full_rate
    """,
)
def funnel_3step_strict(cat: Catalog) -> DataFrame:
    """Each stage is one groupBy on user_id; the stage joins carry
    only (user_id, anchor_ts) — at 100 TB the funnel state is a
    per-user scalar, never the event payload, and every join keys on
    the same user_id partitioning (AQE reuses it)."""
    ev = cat.events
    s = (ev.where(col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    c = (ev.where(col("event_type") == "click")
         .join(s, "user_id")
         .where(col("ts") > col("s_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("c_ts")))
    p = (ev.where(col("event_type") == "purchase")
         .join(c, "user_id")
         .where(col("ts") > col("c_ts"))
         .select("user_id").distinct())
    n_s = s.agg(F.count("*").alias("n_signup"))
    n_c = c.agg(F.count("*").alias("n_signup_click"))
    n_p = p.agg(F.count("*").alias("n_full_funnel"))
    return (n_s.join(broadcast(n_c)).join(broadcast(n_p))
            .select("n_signup", "n_signup_click", "n_full_funnel",
                    F.round(col("n_signup_click")
                            / col("n_signup").cast("double"), 4)
                    .alias("click_rate"),
                    F.round(col("n_full_funnel")
                            / col("n_signup").cast("double"), 4)
                    .alias("full_rate")))


# ------------------------------------------------ hourly movers

@query(
    "hourly_topk_movers",
    # Monitoring surface: the 10 (event_type, hour) cells whose volume
    # moved most vs the type's previous OBSERVED hour — the first
    # thing an on-call looks at when a traffic alarm fires.  Delta is
    # an exact integer; rank ties break on (type, hour).
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               count(*) AS cnt
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), d AS (
        SELECT event_type, hour_ts, cnt,
               lag(cnt) OVER (PARTITION BY event_type
                              ORDER BY hour_ts) AS prev_cnt
        FROM h
    )
    SELECT event_type, hour_ts, cnt, prev_cnt,
           cnt - prev_cnt AS delta, rk
    FROM (SELECT *, cnt - prev_cnt AS delta,
                 CAST(row_number() OVER (
                     ORDER BY abs(cnt - prev_cnt) DESC, event_type,
                              hour_ts) AS INT) AS rk
          FROM d WHERE prev_cnt IS NOT NULL)
    WHERE rk <= 10
    """,
)
def hourly_topk_movers(cat: Catalog) -> DataFrame:
    """The rollup shrinks the stream to |types|·|hours| rows before
    any window runs; the top-10 selection is a distributed TakeOrdered
    (orderBy + limit — per-partition top-k, no global sort: the hours
    axis grows without bound on a long-lived stream, so even the
    aggregate should never funnel through one sort task), and the rank
    window runs over the 10 survivors only."""
    h = (cat.events
         .groupBy("event_type",
                  F.date_trunc("hour", col("ts")).alias("hour_ts"))
         .agg(F.count("*").alias("cnt")))
    d = h.withColumn(
        "prev_cnt", F.lag("cnt").over(
            Window.partitionBy("event_type").orderBy("hour_ts")))
    top = (d.where(col("prev_cnt").isNotNull())
           .withColumn("delta", col("cnt") - col("prev_cnt"))
           .orderBy(F.abs(col("delta")).desc(), "event_type",
                    "hour_ts")
           .limit(10))
    ranked = top.withColumn("rk", F.row_number().over(
        Window.orderBy(F.abs(col("delta")).desc(),
                       "event_type", "hour_ts")))
    return (ranked.select("event_type", "hour_ts", "cnt", "prev_cnt",
                          "delta", "rk"))


# ------------------------------------------------ journey discovery

@query(
    "event_path_3step",
    # Top-20 ordered 3-step user journeys — funnel DISCOVERY (which
    # paths dominate), vs the fixed funnels above that verify a known
    # path.  Per-user order is (ts, event_id); rank (n desc, path).
    oracle=__import__(
        "data_ingestion_challenge_spark.operators.stats",
        fromlist=["oracle_event_path_3step"],
    ).oracle_event_path_3step(20),
)
def event_path_3step(cat: Catalog) -> DataFrame:
    """Sliding lead() window per user (the sessionize partitioning),
    then a map-side-combined count over a |types|³-bounded key space
    (operators/stats.py:event_path_3step) — the final top-k window
    runs over that tiny aggregate only."""
    from data_ingestion_challenge_spark.operators.stats import (
        event_path_3step as _paths,
    )
    return _paths(cat.events, k=20)
