"""Data-quality constraint checking (Deequ-style): declarative
constraints over the ingested tables, evaluated in one pass per table
and reported as a compact violations table.

A real ingestion pipeline gates publication on exactly these checks
(pk uniqueness, referential integrity, accepted domains, null budgets);
the reference's ingest workers validate per record — here validation is
set-based so it runs at corpus scale as ordinary aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query(
    "dq_constraint_report",
    oracle=f"""
    SELECT 'events.event_id unique' AS constraint,
           count(*) AS n_checked,
           count(*) - count(DISTINCT event_id) AS n_violations
    FROM events
    UNION ALL
    SELECT 'events.user_id not null', count(*),
           count(*) - count(user_id) FROM events
    UNION ALL
    SELECT 'events.event_type in domain', count(*),
           count(*) FILTER (event_type NOT IN
               {str(tuple(_EVENT_TYPES))}) FROM events
    UNION ALL
    SELECT 'events.value non-negative', count(*),
           count(*) FILTER (value < 0) FROM events
    UNION ALL
    SELECT 'orders.o_custkey in customer', count(*),
           count(*) FILTER (c_custkey IS NULL)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey in orders', count(*),
           count(*) FILTER (o_orderkey IS NULL)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'documents.n_chars = len(text)', count(*),
           count(*) FILTER (n_chars <> length(text)) FROM documents
    """,
)
def dq_constraint_report(cat: Catalog) -> DataFrame:
    """One row per declared constraint: rows checked, rows violating.

    Scale shape: per-table constraints fuse into a single scan's
    aggregates (count + conditional counts share one pass); the two
    referential checks are key joins — customer broadcasts, and
    lineitem⋈orders at 100 TB is the same shuffle every fact join
    pays (or zero extra with the bucketed layout in sources/files)."""
    ev = cat.events
    events_checks = ev.agg(
        F.count("*").alias("_n"),
        (F.count("*") - F.countDistinct("event_id")).alias("_dup"),
        (F.count("*") - F.count("user_id")).alias("_null_uid"),
        F.count(F.when(~col("event_type").isin(*_EVENT_TYPES), 1))
        .alias("_bad_type"),
        F.count(F.when(col("value") < 0, 1)).alias("_neg_value"))

    def _unpack(df, pairs):
        rows = [
            F.struct(F.lit(name).alias("constraint"),
                     col("_n").alias("n_checked"),
                     col(c).alias("n_violations"))
            for name, c in pairs]
        return df.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

    ev_report = _unpack(events_checks, [
        ("events.event_id unique", "_dup"),
        ("events.user_id not null", "_null_uid"),
        ("events.event_type in domain", "_bad_type"),
        ("events.value non-negative", "_neg_value")])

    orders_ref = (
        cat.orders.join(F.broadcast(cat.customer.select("c_custkey")),
                        col("o_custkey") == col("c_custkey"), "left")
        .agg(F.lit("orders.o_custkey in customer").alias("constraint"),
             F.count("*").alias("n_checked"),
             F.count(F.when(col("c_custkey").isNull(), 1))
             .alias("n_violations")))
    lineitem_ref = (
        cat.lineitem.select("l_orderkey")
        .join(cat.orders.select("o_orderkey"),
              col("l_orderkey") == col("o_orderkey"), "left")
        .agg(F.lit("lineitem.l_orderkey in orders").alias("constraint"),
             F.count("*").alias("n_checked"),
             F.count(F.when(col("o_orderkey").isNull(), 1))
             .alias("n_violations")))
    doc_len = cat.documents.agg(
        F.lit("documents.n_chars = len(text)").alias("constraint"),
        F.count("*").alias("n_checked"),
        F.count(F.when(col("n_chars") != F.length("text"), 1))
        .alias("n_violations"))

    return (ev_report.unionByName(orders_ref).unionByName(lineitem_ref)
            .unionByName(doc_len))
