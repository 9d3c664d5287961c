"""Relational analytics, batch 2 (SURVEY.md §2B): multi-nation joins,
disjunctive predicates, grouping sets/CUBE, exact percentiles, pivots,
window-relative filters.  Adapted to this schema (no partsupp table, no
l_shipmode/commitdate columns — noted per query)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import msum, query


def _rev():
    return col("l_extendedprice") * (1 - col("l_discount"))


@query(
    "q7_nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, o_year,
           CAST(round(sum(CAST(volume AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
           OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    ) GROUP BY supp_nation, cust_nation, o_year
    """,
)
def q7_nation_trade_volume(cat: Catalog) -> DataFrame:
    ns = broadcast(cat.nation.select(
        col("n_nationkey").alias("_snk"), col("n_name").alias("supp_nation")))
    nc = broadcast(cat.nation.select(
        col("n_nationkey").alias("_cnk"), col("n_name").alias("cust_nation")))
    j = (
        cat.lineitem
        .join(cat.orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(cat.customer.select("c_custkey", "c_nationkey")),
              col("o_custkey") == col("c_custkey"))
        .join(ns, col("s_nationkey") == col("_snk"))
        .join(nc, col("c_nationkey") == col("_cnk"))
        .where(((col("supp_nation") == "NATION_1") & (col("cust_nation") == "NATION_2"))
               | ((col("supp_nation") == "NATION_2") & (col("cust_nation") == "NATION_1")))
    )
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("o_orderdate").alias("o_year"))
        .agg(msum(_rev()).alias("revenue"))
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name, o_year, CAST(round(sum(CAST(amount AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name, year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_type = 'PROMO'
    ) GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation_year(cat: Catalog) -> DataFrame:
    """Q9 flavor; the schema has no partsupp, so supply cost is proxied
    as 10% of retail price."""
    amount = _rev() - 0.1 * col("p_retailprice") * col("l_quantity")
    return (
        cat.lineitem
        .join(broadcast(cat.part.where(col("p_type") == "PROMO")
                        .select("p_partkey", "p_retailprice")),
              col("l_partkey") == col("p_partkey"))
        .join(broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
              col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(cat.nation.select("n_nationkey", "n_name")),
              col("s_nationkey") == col("n_nationkey"))
        .join(cat.orders.select("o_orderkey", "o_orderdate"),
              col("l_orderkey") == col("o_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(msum(amount).alias("sum_profit"))
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(cat: Catalog) -> DataFrame:
    """Q12 flavor (schema has no l_shipmode; buckets by linestatus)."""
    high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem
        .where((col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
               & (col("l_shipdate") < lit("1998-01-01").cast("timestamp")))
        .join(cat.orders.select("o_orderkey", "o_orderpriority"),
              col("l_orderkey") == col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_share(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem
        .where((col("l_shipdate") >= lit("1997-03-01").cast("timestamp"))
               & (col("l_shipdate") < lit("1997-04-01").cast("timestamp")))
        .join(broadcast(cat.part.select("p_partkey", "p_type")),
              col("l_partkey") == col("p_partkey"))
        .agg(F.round(
            100.0 * F.sum(F.when(col("p_type") == "PROMO", _rev())
                          .otherwise(0.0)) / F.sum(_rev()), 4)
            .alias("promo_pct"))
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_diversity(cat: Catalog) -> DataFrame:
    """Q16 flavor via lineitem (no partsupp in this schema)."""
    return (
        cat.lineitem
        .join(broadcast(cat.part
                        .where((col("p_brand") != "Brand#1")
                               & col("p_size").isin(1, 5, 9, 13, 17, 21))
                        .select("p_partkey", "p_brand", "p_size")),
              col("l_partkey") == col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS total_price,
           round(sum(l_quantity), 2) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 150
    """,
)
def q18_large_volume_orders(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem
        .join(cat.orders.select("o_orderkey", "o_custkey",
                                "o_orderdate", "o_totalprice"),
              col("l_orderkey") == col("o_orderkey"))
        .groupBy("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(col("_qty") > 150)
        .select("o_custkey", "o_orderkey", "o_orderdate",
                F.round(col("o_totalprice"), 2).alias("total_price"),
                F.round(col("_qty"), 2).alias("total_qty"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30)
       OR (p_size BETWEEN 1 AND 10 AND l_quantity < 15)
    """,
)
def q19_disjunctive_revenue(cat: Catalog) -> DataFrame:
    cond = (
        ((col("p_brand") == "Brand#1") & col("l_quantity").between(1, 20))
        | ((col("p_brand") == "Brand#2") & col("l_quantity").between(10, 30))
        | (col("p_size").between(1, 10) & (col("l_quantity") < 15))
    )
    return (
        cat.lineitem
        .join(broadcast(cat.part.select("p_partkey", "p_brand", "p_size")),
              col("p_partkey") == col("l_partkey"))
        .where(cond)
        .agg(msum(_rev()).alias("revenue"))
    )


@query(
    "cube_returnflag_status",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(cat: Catalog) -> DataFrame:
    return (
        cat.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(F.coalesce(col("l_returnflag"), lit("ALL")).alias("rflag"),
                F.coalesce(col("l_linestatus"), lit("ALL")).alias("lstatus"),
                "n_items", "total_qty")
    )


@query(
    "order_value_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_percentiles(cat: Catalog) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    quantile_cont semantics).  The approx path for 100 TB is
    approx_percentile below (rows-only)."""
    return (
        cat.orders.groupBy("o_orderpriority")
        .agg(F.round(F.percentile("o_totalprice", lit(0.5)), 4)
             .alias("median_price"),
             F.round(F.percentile("o_totalprice", lit(0.9)), 4)
             .alias("p90_price"))
    )


@query(
    "order_value_percentiles_approx",
    # The sketch values aren't SQL-replayable; the checkable surface
    # is the accuracy bound vs the exact percentiles computed in the
    # same plan (the exact values themselves are hash-checked by the
    # order_value_percentiles twin above).
    oracle="""
    SELECT o_orderpriority, TRUE AS median_ok, TRUE AS p90_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_percentiles_approx(cat: Catalog) -> DataFrame:
    """Mergeable t-digest-style sketch — the distributed-scale
    percentile path (single pass, bounded memory per group).  Gated:
    each approx percentile must land within 3% of the exact one (the
    sketch returns an ELEMENT while the exact path interpolates, so
    small groups carry discreteness error — measured worst 1.1% at
    sf0.001)."""
    def ok(apx, ex):
        return (F.abs(col(apx) - col(ex)) <= 0.03 * F.abs(col(ex)))
    return (
        cat.orders.groupBy("o_orderpriority")
        .agg(F.approx_percentile("o_totalprice", lit(0.5), lit(1000))
             .alias("_am"),
             F.approx_percentile("o_totalprice", lit(0.9), lit(1000))
             .alias("_ap"),
             F.percentile("o_totalprice", lit(0.5)).alias("_em"),
             F.percentile("o_totalprice", lit(0.9)).alias("_ep"))
        .select("o_orderpriority",
                ok("_am", "_em").alias("median_ok"),
                ok("_ap", "_ep").alias("p90_ok"))
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM (SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
          FROM orders)
    WHERE o_totalprice > 1.5 * cavg
    """,
)
def orders_above_customer_avg(cat: Catalog) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    return (
        cat.orders
        .withColumn("_cavg", F.avg("o_totalprice").over(w))
        .where(col("o_totalprice") > 1.5 * col("_cavg"))
        .select("o_orderkey", "o_custkey",
                F.round(col("o_totalprice"), 2).alias("total_price"))
    )
