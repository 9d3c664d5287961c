"""Temporal operators (SURVEY.md §2 extensions): as-of join, range
join against value bands, and a hypertable-style multi-grain time
rollup — the time-series surface the reference's event store implies.

Scale notes: the as-of join is the union+window formulation — ONE
shuffle on user_id, linear scan per partition, no per-key loops and no
range self-join blow-up.  The band join broadcasts the (tiny) band dim
through a nested-loop join — the 100 TB fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import msum, msum_sql, query


@query(
    "asof_last_touch",
    # Oracle mirrors the union+window formulation (a LATERAL per-row
    # probe would be quadratic per user in DuckDB); tie-break on equal
    # right-side ts = max event_id, identical in both engines.
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, value,
               NULL::BIGINT AS touch_event_id, NULL::VARCHAR AS touch_type,
               1 AS side
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, NULL, NULL, event_id, event_type, 0
        FROM events WHERE event_type <> 'purchase'
    ), filled AS (
        SELECT user_id, ts, event_id, value, side,
               last_value(touch_event_id IGNORE NULLS) OVER w AS touch_event_id,
               last_value(touch_type IGNORE NULLS) OVER w AS touch_type
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, touch_event_id
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, ts, value, touch_event_id, touch_type
    FROM filled WHERE side = 1
    """,
)
def asof_last_touch(cat: Catalog) -> DataFrame:
    """AS-OF join: each purchase event picks up the most recent
    (ts <= purchase ts) non-purchase "touch" event by the same user.

    Spark-first formulation: tag both sides, union, and carry the last
    non-null right-side attributes forward with last(ignorenulls) over
    a (ts, side, touch_event_id) ordering — right rows sort before left
    rows at equal ts (<= semantics) and the max event_id wins equal-ts
    right ties.  One shuffle on user_id; linear in events.
    """
    e = cat.events
    left = (e.filter(col("event_type") == "purchase")
            .select("user_id", "ts", "event_id", "value",
                    lit(None).cast("bigint").alias("touch_event_id"),
                    lit(None).cast("string").alias("touch_type"),
                    lit(1).alias("side")))
    right = (e.filter(col("event_type") != "purchase")
             .select("user_id", "ts",
                     lit(None).cast("bigint").alias("event_id"),
                     lit(None).cast("double").alias("value"),
                     col("event_id").alias("touch_event_id"),
                     col("event_type").alias("touch_type"),
                     lit(0).alias("side")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "side", "touch_event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        left.unionByName(right)
        .withColumn("t_id", F.last("touch_event_id", ignorenulls=True).over(w))
        .withColumn("t_ty", F.last("touch_type", ignorenulls=True).over(w))
        .filter(col("side") == 1)
        .select("event_id", "user_id", "ts", "value",
                col("t_id").alias("touch_event_id"),
                col("t_ty").alias("touch_type"))
    )


# (band, lo, hi) — hi exclusive; literal twins live in the oracle SQL.
VALUE_BANDS = (
    ("low", 0.0, 10.0),
    ("mid", 10.0, 50.0),
    ("high", 50.0, 100.0),
    ("whale", 100.0, 1e18),
)


@query(
    "range_join_value_bands",
    oracle=f"""
    SELECT b.band, count(*) AS n_events,
           {msum_sql('e.value')} AS total_value
    FROM events e
    JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 50.0),
                 ('high', 50.0, 100.0), ('whale', 100.0, 1e18))
         b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_value_bands(cat: Catalog) -> DataFrame:
    """RANGE join: bucket every event into a value band via a non-equi
    join against a broadcast band dim (BroadcastNestedLoopJoin against
    4 rows — the fact side streams, never shuffles pre-agg)."""
    bands = broadcast(cat.spark.createDataFrame(
        list(VALUE_BANDS), "band string, lo double, hi double"))
    return (
        cat.events.select("value")
        .join(bands, (col("value") >= col("lo")) & (col("value") < col("hi")))
        .groupBy("band")
        .agg(F.count("*").alias("n_events"),
             msum(col("value")).alias("total_value"))
    )


@query(
    "time_rollup_multi_grain",
    # hypertable-style continuous aggregate: hour + day + grand total
    # in one pass (ROLLUP).  NULL grouping slots are coalesced to a
    # sentinel timestamp so hash parity is well-defined.
    oracle=f"""
    SELECT coalesce(day_ts, TIMESTAMP '1900-01-01') AS day_ts,
           coalesce(hour_ts, TIMESTAMP '1900-01-01') AS hour_ts,
           count(*) AS n_events,
           {msum_sql('value')} AS total_value
    FROM (SELECT date_trunc('day', ts)::TIMESTAMP AS day_ts,
                 date_trunc('hour', ts)::TIMESTAMP AS hour_ts, value
          FROM events)
    GROUP BY ROLLUP(day_ts, hour_ts)
    """,
)
def time_rollup_multi_grain(cat: Catalog) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-
    aggregate shape): hourly, daily, and total aggregates from ONE scan
    via ROLLUP — partial aggregation handles all grains map-side."""
    return (
        cat.events
        .select(F.date_trunc("day", col("ts")).alias("day_ts"),
                F.date_trunc("hour", col("ts")).alias("hour_ts"),
                "value")
        .rollup("day_ts", "hour_ts")
        .agg(F.count("*").alias("n_events"),
             msum(col("value")).alias("total_value"))
        .select(F.coalesce(col("day_ts"), F.to_timestamp(lit("1900-01-01")))
                .alias("day_ts"),
                F.coalesce(col("hour_ts"), F.to_timestamp(lit("1900-01-01")))
                .alias("hour_ts"),
                "n_events", "total_value")
    )
