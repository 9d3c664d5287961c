"""Custom aggregates (UDAF shape): metrics Spark has no built-in for,
computed as Arrow-batched grouped-map pandas UDFs (applyInPandas).

Discipline for oracle parity: keep everything integer until ONE final
float expression, written token-for-token the same in the SQL twin —
per-group numpy work is exact int64 up to 2^53, so the only float ops
are the closing divisions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

GINI_SCHEMA = "event_type string, gini double, n_users bigint"


def user_activity_gini(events: DataFrame) -> DataFrame:
    """Per event_type: Gini coefficient of per-user event counts (0 =
    perfectly even usage, →1 = one user dominates) — the inequality
    audit an ingestion operator runs to spot abuse/bot traffic.

    Stage 1 is an ordinary distributed count; only the per-type count
    VECTOR (≤ users-per-type rows) reaches Python.  Formula (sorted
    x_1..x_n ascending): G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n."""
    counts = (events.groupBy("event_type", "user_id")
              .agg(F.count("*").alias("n")))

    def _gini(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(pdf["n"].to_numpy().astype("int64"))
        n = len(x)
        s = int(np.sum(np.arange(1, n + 1, dtype="int64") * x))
        t = int(x.sum())
        g = (2.0 * s) / (n * t) - (n + 1.0) / n
        return pd.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                             "gini": [round(g, 4)],
                             "n_users": [n]})

    return counts.groupBy("event_type").applyInPandas(_gini, GINI_SCHEMA)


GINI_ORACLE = """
    WITH counts AS (
        SELECT event_type, user_id, count(*) AS n
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT event_type, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n, user_id) AS i
        FROM counts
    )
    SELECT event_type,
           round((2.0 * sum(i * n)) / (count(*) * sum(n))
                 - (count(*) + 1.0) / count(*), 4) AS gini,
           count(*) AS n_users
    FROM ranked GROUP BY event_type
"""


def event_path_3step(events: DataFrame, k: int = 20) -> DataFrame:
    """Top-k ordered 3-step user journeys — the (e1 → e2 → e3)
    event-type sequences that occur most often across user timelines
    (funnel DISCOVERY, vs the fixed-funnel operators that verify a
    known path).  Sliding window over each user's ts-ordered stream:
    every consecutive triple counts once.

    Determinism: per-user order is (ts, event_id) — event_id breaks
    same-timestamp ties identically in both engines; top-k rank is
    (n desc, e1, e2, e3).

    Scale shape: one shuffle on user_id for the lead() window (the
    same partitioning every sessionize/funnel op reuses), then a
    map-side-combined count over a |types|³-bounded key space —
    result is tiny regardless of corpus size."""
    from pyspark.sql import Window
    from pyspark.sql.functions import col

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    paths = (seq.where(col("e2").isNotNull() & col("e3").isNotNull())
             .groupBy("e1", "e2", "e3")
             .agg(F.count("*").alias("n")))
    wk = Window.orderBy(col("n").desc(), "e1", "e2", "e3")
    return (paths.withColumn("rank", F.row_number().over(wk))
            .where(col("rank") <= k)
            .select("rank", "e1", "e2", "e3", "n"))


def oracle_event_path_3step(k: int = 20) -> str:
    """DuckDB twin of event_path_3step — identical (ts, event_id)
    per-user order and (n desc, path) rank."""
    return f"""
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
              GROUP BY e1, e2, e3)
    SELECT rank, e1, e2, e3, n FROM (
        SELECT *, row_number() OVER (ORDER BY n DESC, e1, e2, e3)
                   AS rank
        FROM paths)
    WHERE rank <= {k}
    """


def weekly_churn(events: DataFrame) -> DataFrame:
    """Per-week churn: of the users active in week w (Monday-start),
    how many were NOT active in week w+1.  The retention-health
    counterpart of dau_wau_stickiness — an ingestion service's first
    cohort-free engagement alarm.  The last observed week is excluded
    (its w+1 is unobservable).

    Scale shape: one distinct over (user, week) — the same shuffle key
    the activity rollups use — then a LEFT ANTI self-join on
    (user, week+7d), co-partitioned with the distinct (no extra
    shuffle under AQE), and two week-sized aggregates.  Rate is one
    bigint/bigint double division, rounded at 6dp."""
    from pyspark.sql.functions import col

    active = (events.select(
        "user_id",
        F.date_trunc("week", col("ts")).cast("date").alias("wk"))
        .distinct())
    nxt = active.select("user_id", F.date_sub(col("wk"), 7).alias("wk"))
    churned = active.join(nxt, ["user_id", "wk"], "left_anti")
    act = active.groupBy("wk").agg(F.count("*").alias("n_active"))
    chc = churned.groupBy("wk").agg(F.count("*").alias("n_churned"))
    maxwk = active.agg(F.max("wk").alias("mx"))
    return (act.join(chc, "wk", "left")
            .crossJoin(F.broadcast(maxwk))
            .where(col("wk") < col("mx"))
            .select(col("wk").alias("week_start"),
                    "n_active",
                    F.coalesce(col("n_churned"), F.lit(0))
                    .cast("bigint").alias("n_churned"),
                    F.round(F.coalesce(col("n_churned"), F.lit(0))
                            / col("n_active"), 6).alias("churn_rate")))


WEEKLY_CHURN_ORACLE = """
    WITH a AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS wk
               FROM events),
    ch AS (SELECT a.user_id, a.wk
           FROM a LEFT JOIN a n
             ON n.user_id = a.user_id AND n.wk = a.wk + 7
           WHERE n.user_id IS NULL),
    act AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_active
            FROM a GROUP BY wk),
    chc AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_churned
            FROM ch GROUP BY wk)
    SELECT act.wk AS week_start, n_active,
           CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned,
           round(coalesce(n_churned, 0) / n_active, 6) AS churn_rate
    FROM act LEFT JOIN chc ON act.wk = chc.wk
    WHERE act.wk < (SELECT max(wk) FROM a)
"""


def user_streak_histogram(events: DataFrame) -> DataFrame:
    """Histogram of each user's LONGEST consecutive-active-week streak
    (Monday-start weeks): (streak_weeks, n_users).  The habit-strength
    counterpart of weekly_churn — churn says how many leave each week,
    this says how sticky the attached ones are, the first input to a
    retention-curve model.

    Gaps-and-islands, fully distributed: one distinct over
    (user, week), a per-USER window (datediff-minus-7·row_number
    constant within a run of consecutive weeks — exact integer
    arithmetic, no float), then three map-side-combined aggregates
    stepping down user×island → user → |streak-lengths| rows.  Every
    window is partitioned by user_id; nothing global ever sorts."""
    from pyspark.sql.functions import col

    active = (events.select(
        "user_id",
        F.date_trunc("week", col("ts")).cast("date").alias("wk"))
        .distinct())
    # 1970-01-05 is a Monday: datediff is an exact multiple of 7 for
    # Monday-start weeks, so consecutive weeks differ by exactly 7.
    w = Window.partitionBy("user_id").orderBy("wk")
    grp = (F.datediff(col("wk"), F.lit("1970-01-05"))
           - 7 * F.row_number().over(w))
    streaks = (active.withColumn("_g", grp)
               .groupBy("user_id", "_g")
               .agg(F.count("*").alias("_len")))
    longest = streaks.groupBy("user_id").agg(
        F.max("_len").alias("streak_weeks"))
    return (longest.groupBy("streak_weeks")
            .agg(F.count("*").cast("bigint").alias("n_users")))


USER_STREAK_HISTOGRAM_ORACLE = """
    WITH a AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS wk
               FROM events),
    g AS (SELECT user_id, wk,
                 date_diff('day', DATE '1970-01-05', wk)
                 - 7 * CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY wk) AS BIGINT)
                 AS grp
          FROM a),
    s AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
          FROM g GROUP BY user_id, grp),
    l AS (SELECT user_id, max(len) AS streak_weeks
          FROM s GROUP BY user_id)
    SELECT streak_weeks, CAST(count(*) AS BIGINT) AS n_users
    FROM l GROUP BY streak_weeks
"""
