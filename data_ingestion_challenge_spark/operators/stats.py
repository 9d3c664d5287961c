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
