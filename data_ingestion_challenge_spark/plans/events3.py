"""Ingestion analytics, batch 3 (SURVEY.md §2A): monitoring and
segmentation ops an event pipeline serves once rollups exist.

Scale notes per query in the docstrings; the common theme is that
every full-corpus pass collapses map-side (hourly keys, per-customer
groups, HLL sketch buffers) before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query


@query(
    "hourly_anomaly_zscore",
    oracle="""
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour_ts,
                      count(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT event_type, hour_ts, n,
           round((n - avg(n) OVER (PARTITION BY event_type))
                 / nullif(stddev_samp(n) OVER (PARTITION BY event_type), 0),
                 4) AS z,
           CASE WHEN abs((n - avg(n) OVER (PARTITION BY event_type))
                 / nullif(stddev_samp(n) OVER (PARTITION BY event_type), 0))
                     > 2
                THEN 1 ELSE 0 END AS is_anomaly
    FROM h
    """,
)
def hourly_anomaly_zscore(cat: Catalog) -> DataFrame:
    """Volume-anomaly monitor: z-score of each (event_type, hour)
    count against that type's own hourly distribution; |z|>2 flags.

    The groupBy collapses the stream to |types|×|hours| rows map-side;
    the per-type window then runs over that tiny rollup — the window
    shuffle is KBs regardless of input scale."""
    h = (cat.events
         .groupBy("event_type",
                  F.date_trunc("hour", col("ts")).alias("hour_ts"))
         .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type")
    z = ((col("n") - F.avg("n").over(w))
         / F.nullif(F.stddev_samp("n").over(w), F.lit(0)))
    return h.select(
        "event_type", "hour_ts", "n",
        F.round(z, 4).alias("z"),
        F.when(F.abs(z) > 2, 1).otherwise(0).alias("is_anomaly"))


@query(
    "customer_rfm_segments",
    oracle="""
    WITH maxd AS (SELECT max(o_orderdate::DATE) AS d0 FROM orders),
    rfm AS (SELECT o_custkey,
                   date_diff('day', max(o_orderdate::DATE), (SELECT d0 FROM maxd))
                       AS recency_days,
                   count(*) AS frequency,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2)
                        AS DOUBLE) AS monetary
            FROM orders GROUP BY o_custkey)
    SELECT o_custkey, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
           ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
           ntile(4) OVER (ORDER BY monetary, o_custkey) AS m_q
    FROM rfm
    """,
)
def customer_rfm_segments(cat: Catalog) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary plus
    exact quartile labels (ntile semantics with deterministic custkey
    tie-break).

    Scale note: each quartile label runs through
    operators/ranking.global_ntile — range repartition +
    per-partition rank + broadcast offsets — so no metric ever takes
    a single-reducer global sort; three range shuffles of the
    CUSTOMER rollup (≪ orders), each sorted locally in balanced
    partitions, exact at any customer count.  Monetary uses the
    msum() decimal discipline so quartile boundaries are
    engine-exact; the oracle keeps the plain ntile spelling."""
    from data_ingestion_challenge_spark.operators.ranking import (
        global_ntile,
    )

    maxd = cat.orders.agg(
        F.max(col("o_orderdate").cast("date")).alias("d0"))
    rfm = (cat.orders
           .groupBy("o_custkey")
           .agg(F.max(col("o_orderdate").cast("date")).alias("last_d"),
                F.count("*").alias("frequency"),
                F.round(F.sum(col("o_totalprice").cast("decimal(30,6)")), 2)
                .cast("double").alias("monetary"))
           .crossJoin(F.broadcast(maxd))
           .select("o_custkey",
                   F.datediff(col("d0"), col("last_d")).alias("recency_days"),
                   "frequency", "monetary"))
    out = global_ntile(rfm, 4, ["recency_days", "o_custkey"], "r_q")
    out = global_ntile(out, 4, ["frequency", "o_custkey"], "f_q")
    out = global_ntile(out, 4, ["monetary", "o_custkey"], "m_q")
    return out.select("o_custkey", "recency_days", "frequency",
                      "monetary", "r_q", "f_q", "m_q")


@query(
    "weekly_distinct_users_hll_merge",
    # Exact weekly counts hash-checked; the sketch-merge estimate is
    # verified through its specified error bound (lgK=12 → ~1.6% std
    # error; gate at 5%).
    oracle="""
    SELECT date_trunc('week', ts)::TIMESTAMP AS week_ts,
           count(*) AS n_events,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS merge_ok
    FROM events GROUP BY 1
    """,
)
def weekly_distinct_users_hll_merge(cat: Catalog) -> DataFrame:
    """Mergeable-sketch rollup: build a DataSketches HLL per DAY with
    hll_sketch_agg, then answer the WEEKLY distinct-user question by
    UNIONING the daily sketches (hll_union_agg) — never re-touching
    raw events.  This is the 100 TB pattern for serving distinct
    counts at multiple grains: sketches are tiny (KBs), associative,
    and the weekly pass aggregates |days| rows, not the stream.
    Emits the exact weekly count plus the merge-accuracy gate
    (estimate within ~2% at lgK=12; gated at 5%)."""
    daily = (cat.events
             .groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
             .agg(F.hll_sketch_agg("user_id").alias("sk"),
                  F.count("*").alias("n_events")))
    weekly_from_sketches = (
        daily
        .groupBy(F.date_trunc("week", col("day_ts")).alias("week_ts"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
             .alias("approx_users"),
             F.sum("n_events").alias("n_events")))
    exact = (cat.events
             .groupBy(F.date_trunc("week", col("ts")).alias("week_ts"))
             .agg(F.countDistinct("user_id").alias("exact_users")))
    return (weekly_from_sketches.join(exact, "week_ts")
            .select("week_ts", "n_events", "exact_users",
                    (F.abs(col("approx_users") - col("exact_users"))
                     <= 0.05 * col("exact_users")).alias("merge_ok")))
