"""Relational analytics suite (SURVEY.md §2B) — TPC-H-shaped queries
adapted to the driver's star schema.

Design notes (100 TB):
- Every dim join is an explicit ``broadcast()`` — fact tables shuffle on
  join keys only when both sides are large (orders⋈lineitem).
- All filters are applied before joins so Catalyst pushes them into the
  parquet scan (verify: PushedFilters in .explain).
- Aggregates are hash aggregates with map-side partial combine; float
  outputs rounded per SURVEY.md §6 for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import msum, msum_sql, query

def _rev():
    return col("l_extendedprice") * (1 - col("l_discount"))


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            msum(col("l_extendedprice")).alias("sum_base_price"),
            msum(_rev()).alias("sum_disc_price"),
            msum(_rev() * (1 + col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3_shipping_priority(cat: Catalog) -> DataFrame:
    cutoff = lit("1998-03-15").cast("timestamp")
    return (
        cat.lineitem.where(col("l_shipdate") > cutoff)
        .join(cat.orders.where(col("o_orderdate") < cutoff),
              col("l_orderkey") == col("o_orderkey"))
        # customer is a dim at this schema's scale — broadcast the filter.
        .join(broadcast(cat.customer.where(col("c_mktsegment") == "BUILDING")
                        .select("c_custkey")),
              col("o_custkey") == col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(msum(_rev()).alias("revenue"))
        .orderBy(col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
)
def q5_local_supplier_volume(cat: Catalog) -> DataFrame:
    orders = cat.orders.where(
        (col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        & (col("o_orderdate") < lit("1998-01-01").cast("timestamp")))
    dim = (
        broadcast(cat.nation)
        .join(broadcast(cat.region.where(col("r_name") == "ASIA")),
              col("n_regionkey") == col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        cat.lineitem
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cat.supplier), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(cat.customer.select("c_custkey", "c_nationkey")),
              (col("o_custkey") == col("c_custkey"))
              & (col("c_nationkey") == col("s_nationkey")))
        .join(broadcast(dim), col("s_nationkey") == col("n_nationkey"))
        .groupBy("n_name")
        .agg(msum(_rev()).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
)
def q6_forecast_revenue(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem
        .where((col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
               & (col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
               & col("l_discount").between(0.03, 0.07)
               & (col("l_quantity") < 24))
        .agg(msum(col("l_extendedprice") * col("l_discount")).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem.where(col("l_returnflag") == "R")
        .join(cat.orders.where(
            (col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
            & (col("o_orderdate") < lit("1996-07-01").cast("timestamp"))),
            col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cat.customer), col("o_custkey") == col("c_custkey"))
        .join(broadcast(cat.nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(msum(_rev()).alias("revenue"))
        .orderBy(col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue",
                F.round(col("c_acctbal"), 2).alias("acctbal"), "n_name")
    )


@query(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, revenue, rk FROM (
        SELECT p_brand, p_partkey,
               CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue,
               row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY sum(CAST((l_extendedprice * (1 - l_discount))
                                AS DECIMAL(30,6))) DESC, p_partkey
               ) AS rk
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    ) WHERE rk <= 3
    """,
)
def top_parts_per_brand(cat: Catalog) -> DataFrame:
    from pyspark.sql.window import Window
    per_part = (
        cat.lineitem
        .join(broadcast(cat.part.select("p_partkey", "p_brand")),
              col("l_partkey") == col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(_rev().cast("decimal(30,6)")).alias("_rev"))
    )
    w = Window.partitionBy("p_brand").orderBy(col("_rev").desc(), col("p_partkey"))
    return (
        per_part
        .withColumn("rk", F.row_number().over(w))
        .where(col("rk") <= 3)
        .select("p_brand", "p_partkey",
                F.round(col("_rev"), 2).cast("double").alias("revenue"), "rk")
    )


@query(
    "nation_revenue_rollup",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_price,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def nation_revenue_rollup(cat: Catalog) -> DataFrame:
    joined = (
        cat.orders
        .join(broadcast(cat.customer.select("c_custkey", "c_nationkey")),
              col("o_custkey") == col("c_custkey"))
        .join(broadcast(cat.nation), col("c_nationkey") == col("n_nationkey"))
        .join(broadcast(cat.region), col("n_regionkey") == col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(msum(col("o_totalprice")).alias("total_price"),
             F.count("*").alias("n_orders"))
        .select(F.coalesce(col("r_name"), lit("ALL")).alias("region_name"),
                F.coalesce(col("n_name"), lit("ALL")).alias("nation_name"),
                "total_price", "n_orders")
    )


@query(
    "order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def order_priority_count(cat: Catalog) -> DataFrame:
    # EXISTS → left-semi join: no duplication, no distinct needed.
    big_items = cat.lineitem.where(col("l_quantity") > 45).select("l_orderkey")
    return (
        cat.orders
        .where((col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
               & (col("o_orderdate") < lit("1997-01-01").cast("timestamp")))
        .join(big_items, col("o_orderkey") == col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "avg_acctbal_positive",
    oracle="""
    SELECT count(*) AS n_rich_inactive,
           coalesce(CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,6))), 2) AS DOUBLE), 0.0) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def avg_acctbal_positive(cat: Catalog) -> DataFrame:
    # Scalar subquery → 1-row broadcast cross join (stays declarative —
    # no driver-side collect); NOT EXISTS → left-anti join.
    threshold = (cat.customer.where(col("c_acctbal") > 0)
                 .agg(F.avg("c_acctbal").alias("_thr")))
    return (
        cat.customer
        .join(broadcast(threshold))
        .where(col("c_acctbal") > col("_thr"))
        .join(cat.orders.select("o_custkey"),
              col("c_custkey") == col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("n_rich_inactive"),
             F.coalesce(msum(col("c_acctbal")), lit(0.0)).alias("total_bal"))
    )


@query(
    "market_share_window",
    oracle="""
    WITH rev AS (
        SELECT year(o_orderdate) AS o_year, n_name,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
    )
    SELECT o_year,
           round(sum(CASE WHEN n_name = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM rev GROUP BY o_year
    """,
)
def market_share_window(cat: Catalog) -> DataFrame:
    rev = (
        cat.lineitem
        .join(cat.orders.select("o_orderkey", "o_orderdate"),
              col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(cat.nation.select("n_nationkey", "n_name")),
              col("s_nationkey") == col("n_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"), col("n_name"),
                _rev().alias("volume"))
    )
    return (
        rev.groupBy("o_year")
        .agg(F.round(
            F.sum(F.when(col("n_name") == "NATION_3", col("volume"))
                  .otherwise(0.0)) / F.sum("volume"), 4).alias("mkt_share"))
    )
