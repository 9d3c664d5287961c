"""Relational analytics, batch 3 (SURVEY.md §2B): the remaining TPC-H
patterns — outer-join histograms (q13), scalar-max view join (q15),
correlated-average filters (q17), min-cost-per-group selection (q2),
global-share HAVING (q11), semi/anti double-correlation (q21), and
anti-join + scalar threshold (q22).  This schema has no partsupp table,
so q2/q11/q20-style supply stats derive from lineitem.

Float-determinism discipline: every threshold that feeds a comparison
or a rank is computed with exact DECIMAL sums first (associative →
partition-order-independent), then converted to DOUBLE — never a raw
double sum, whose partial-aggregation order differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col, lit

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import msum, msum_sql, query


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(cat: Catalog) -> DataFrame:
    """TPC-H Q13: how many customers placed how many orders (zero
    included via the outer join).  customer side broadcast; count then
    re-aggregate — the second groupBy runs on ~50 distinct counts."""
    per_cust = (
        broadcast(cat.customer.select("c_custkey"))
        .join(cat.orders.select("o_custkey", "o_orderkey"),
              col("c_custkey") == col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {msum_sql('l_extendedprice * (1 - l_discount)')}
               AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(cat: Catalog) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue.  The revenue
    view aggregates once; its 1-row max is broadcast back — no window
    over a single global partition."""
    rev = (
        cat.lineitem
        .filter((col("l_shipdate") >= lit("1996-01-01")) &
                (col("l_shipdate") < lit("1996-04-01")))
        .groupBy("l_suppkey")
        .agg(msum(col("l_extendedprice") * (1 - col("l_discount")))
             .alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(broadcast(mx), col("total_revenue") == col("_mx"))
        .join(broadcast(cat.supplier.select("s_suppkey", "s_name")),
              col("l_suppkey") == col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH thresh AS (
        SELECT l_partkey AS t_partkey,
               0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                      / count(*)) AS qty_limit
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part   ON p_partkey = l_partkey
    JOIN thresh ON t_partkey = l_partkey
    WHERE l_quantity < qty_limit
    GROUP BY p_brand
    """,
)
def q17_small_quantity_revenue(cat: Catalog) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders, per brand.
    The per-part average is a self-aggregation joined back on partkey
    (decorrelated subquery); the part dim is broadcast."""
    thresh = (
        cat.lineitem
        .groupBy(col("l_partkey").alias("t_partkey"))
        .agg((0.2 * (F.sum(col("l_quantity").cast("decimal(30,6)"))
                     .cast("double") / F.count("*"))).alias("qty_limit"))
    )
    return (
        cat.lineitem
        .join(broadcast(cat.part.select("p_partkey", "p_brand")),
              col("p_partkey") == col("l_partkey"))
        .join(thresh, col("t_partkey") == col("l_partkey"))
        .filter(col("l_quantity") < col("qty_limit"))
        .groupBy("p_brand")
        .agg((msum(col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@query(
    "q2_min_cost_supplier",
    # No partsupp table: supply cost per (part, supplier) derives from
    # lineitem.  Unit price is computed ENTIRELY in integer micro-units
    # (prices are 2dp, quantities integral) — float rounding of a ratio
    # is engine-dependent at half-way values (observed: 1378.57875 →
    # .5788 in Spark, .5787 in DuckDB), integer division never is.
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT))
                 // sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS unit_price_micros
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY l_partkey
                                     ORDER BY unit_price_micros, l_suppkey) AS rn
        FROM ps
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, unit_price_micros
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1
    """,
)
def q2_min_cost_supplier(cat: Catalog) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part.  One shuffle on
    (part, supp) for the agg; the per-part rank reuses the part-side
    partitioning; dims broadcast at the end."""
    ps = (
        cat.lineitem
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr(
            "sum(CAST(round(l_extendedprice * 1000000) AS BIGINT))"
            " div sum(CAST(round(l_quantity) AS BIGINT))")
            .alias("unit_price_micros"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price_micros", "l_suppkey")
    return (
        ps.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .join(broadcast(cat.part.select("p_partkey", "p_name")),
              col("p_partkey") == col("l_partkey"))
        .join(broadcast(cat.supplier.select("s_suppkey", "s_name")),
              col("s_suppkey") == col("l_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name",
                "unit_price_micros")
    )


@query(
    "q11_significant_parts",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey, {msum_sql('l_extendedprice * (1 - l_discount)')}
               AS part_rev
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, part_rev
    FROM pr
    WHERE part_rev > (SELECT CAST(sum(CAST(part_rev AS DECIMAL(30,6)))
                                  AS DOUBLE) * 0.001 FROM pr)
    """,
)
def q11_significant_parts(cat: Catalog) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 0.1% of total.
    The global total re-sums the ROUNDED per-part revenues as exact
    decimals (order-independent), broadcast as a 1-row threshold."""
    pr = (
        cat.lineitem
        .groupBy(col("l_partkey").alias("partkey"))
        .agg(msum(col("l_extendedprice") * (1 - col("l_discount")))
             .alias("part_rev"))
    )
    total = pr.agg(
        (F.sum(col("part_rev").cast("decimal(30,6)")).cast("double") * 0.001)
        .alias("_thresh"))
    return (
        pr.join(broadcast(total), col("part_rev") > col("_thresh"))
        .select("partkey", "part_rev")
    )


@query(
    "q21_lone_fault_supplier",
    # No commit/receipt dates in this schema: "fault" = a returned line
    # (l_returnflag = 'R') on a finished multi-supplier order where NO
    # other supplier's line was returned — same EXISTS + NOT EXISTS
    # double correlation as TPC-H Q21.
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_lone_fault_supplier(cat: Catalog) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely at fault on multi-supplier
    orders.  Both correlations are orderkey equi-joins (semi + anti)
    with the supplier-differs predicate as a join condition — shuffled
    hash joins on l_orderkey, shareable partitioning, no cartesian."""
    li = cat.lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    l1 = (li.filter(col("l_returnflag") == "R")
          .join(cat.orders.filter(col("o_orderstatus") == "F")
                .select("o_orderkey"),
                col("l_orderkey") == col("o_orderkey"))
          .select("l_orderkey", "l_suppkey"))
    l2 = li.select(col("l_orderkey").alias("o2"), col("l_suppkey").alias("s2"))
    l3 = (li.filter(col("l_returnflag") == "R")
          .select(col("l_orderkey").alias("o3"), col("l_suppkey").alias("s3")))
    cand = (
        l1.join(l2, (col("l_orderkey") == col("o2"))
                & (col("l_suppkey") != col("s2")), "leftsemi")
        .join(l3, (col("l_orderkey") == col("o3"))
              & (col("l_suppkey") != col("s3")), "leftanti")
    )
    return (
        cand.join(broadcast(cat.supplier.select("s_suppkey", "s_name")),
                  col("l_suppkey") == col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH thresh AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
               / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, count(*) AS numcust,
           {msum_sql('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg_bal FROM thresh)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(cat: Catalog) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never
    ordered, per market segment (no phone column → segment stands in
    for country code).  Anti join on o_custkey + broadcast scalar
    threshold from an exact decimal mean."""
    thresh = cat.customer.filter(col("c_acctbal") > 0).agg(
        (F.sum(col("c_acctbal").cast("decimal(30,6)")).cast("double")
         / F.count("*")).alias("avg_bal"))
    return (
        cat.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(broadcast(thresh), col("c_acctbal") > col("avg_bal"))
        .join(cat.orders.select("o_custkey"),
              col("c_custkey") == col("o_custkey"), "leftanti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             msum(col("c_acctbal")).alias("totacctbal"))
    )


@query(
    "q20_heavy_promo_suppliers",
    # No partsupp/availqty: "excess stock" becomes shipped-quantity of
    # PROMO-type parts in 1996 over an integer threshold (quantities
    # are integral → exact comparisons).
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS promo_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, promo_qty
    FROM supplier JOIN shipped ON s_suppkey = l_suppkey
    WHERE promo_qty > 50
    """,
)
def q20_heavy_promo_suppliers(cat: Catalog) -> DataFrame:
    """TPC-H Q20 shape: suppliers moving heavy volume of a part class.
    The part-class filter broadcasts into the lineitem scan; the
    shipdate predicate pushes down to parquet."""
    shipped = (
        cat.lineitem
        .filter((col("l_shipdate") >= lit("1996-01-01")) &
                (col("l_shipdate") < lit("1997-01-01")))
        .join(broadcast(cat.part.filter(col("p_type") == "PROMO")
                        .select("p_partkey")),
              col("p_partkey") == col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.round(col("l_quantity")).cast("bigint"))
             .alias("promo_qty"))
        .filter(col("promo_qty") > 50)
    )
    return (
        shipped.join(broadcast(cat.supplier.select("s_suppkey", "s_name")),
                     col("l_suppkey") == col("s_suppkey"))
        .select("s_suppkey", "s_name", "promo_qty")
    )
