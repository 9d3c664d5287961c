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
