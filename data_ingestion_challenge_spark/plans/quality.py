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


@query(
    "events_profile",
    oracle="""
    SELECT 'event_id' AS column, count(*) AS n,
           count(*) - count(event_id) AS n_null,
           count(DISTINCT event_id) AS n_distinct,
           CAST(min(event_id) AS DOUBLE) AS min_num,
           CAST(max(event_id) AS DOUBLE) AS max_num
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           count(DISTINCT event_type), NULL, NULL FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value),
           count(DISTINCT value),
           round(min(value), 4), round(max(value), 4) FROM events
    UNION ALL
    SELECT 'ts', count(*), count(*) - count(ts), count(DISTINCT ts),
           CAST(epoch_us(min(ts)) AS DOUBLE),
           CAST(epoch_us(max(ts)) AS DOUBLE) FROM events
    """,
)
def events_profile(cat: Catalog) -> DataFrame:
    """Per-column profile of the ingestion stream (null budget,
    cardinality, range) — the schema-drift tripwire a pipeline runs
    before publishing a batch.  ONE scan: all per-column aggregates
    fuse into a single hash-aggregate pass (the exact distinct counts
    rewrite to expand+aggregate; swap for approx_count_distinct at
    100 TB where ±2% is acceptable — same shape, mergeable sketch).
    Timestamps profile as epoch micros: engine-portable, no string
    formatting parity trap."""
    ev = cat.events
    a = ev.agg(
        F.count("*").alias("n"),
        *[x for c in ("event_id", "user_id", "event_type", "value", "ts")
          for x in ((F.count("*") - F.count(c)).alias(f"null_{c}"),
                    F.countDistinct(c).alias(f"nd_{c}"))],
        F.min("event_id").alias("mn_event_id"),
        F.max("event_id").alias("mx_event_id"),
        F.min("user_id").alias("mn_user_id"),
        F.max("user_id").alias("mx_user_id"),
        F.round(F.min("value"), 4).alias("mn_value"),
        F.round(F.max("value"), 4).alias("mx_value"),
        F.unix_micros(F.min("ts")).alias("mn_ts"),
        F.unix_micros(F.max("ts")).alias("mx_ts"))

    def prof(name, mn, mx):
        return F.struct(
            F.lit(name).alias("column"), col("n").alias("n"),
            col(f"null_{name}").alias("n_null"),
            col(f"nd_{name}").alias("n_distinct"),
            (mn.cast("double") if mn is not None
             else F.lit(None).cast("double")).alias("min_num"),
            (mx.cast("double") if mx is not None
             else F.lit(None).cast("double")).alias("max_num"))

    rows = [prof("event_id", col("mn_event_id"), col("mx_event_id")),
            prof("user_id", col("mn_user_id"), col("mx_user_id")),
            prof("event_type", None, None),
            prof("value", col("mn_value"), col("mx_value")),
            prof("ts", col("mn_ts"), col("mx_ts"))]
    return a.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@query(
    "documents_profile",
    # The documents twin of events_profile: null budget, cardinality
    # and range per column in ONE fused scan — the publication-gate
    # profile for the text corpus.
    oracle="""
    SELECT count(*) AS n_docs,
           CAST(count(*) - count(doc_id) AS BIGINT) AS null_doc_id,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS nd_doc_id,
           CAST(count(*) - count(lang) AS BIGINT) AS null_lang,
           CAST(count(DISTINCT lang) AS BIGINT) AS nd_lang,
           CAST(count(*) - count(source) AS BIGINT) AS null_source,
           CAST(count(DISTINCT source) AS BIGINT) AS nd_source,
           min(n_chars) AS mn_chars, max(n_chars) AS mx_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_chars_mismatch
    FROM documents
    """,
)
def documents_profile(cat: Catalog) -> DataFrame:
    """One-scan corpus profile, including the n_chars-vs-text
    consistency tripwire (a mismatch means the metadata column and the
    payload diverged somewhere in the pipeline).  All aggregates fuse
    into a single hash-aggregate pass; exact distincts rewrite to
    expand+aggregate (swap for approx_count_distinct at 100 TB)."""
    d = cat.documents
    return d.agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.count("doc_id")).alias("null_doc_id"),
        F.countDistinct("doc_id").alias("nd_doc_id"),
        (F.count("*") - F.count("lang")).alias("null_lang"),
        F.countDistinct("lang").alias("nd_lang"),
        (F.count("*") - F.count("source")).alias("null_source"),
        F.countDistinct("source").alias("nd_source"),
        F.min("n_chars").alias("mn_chars"),
        F.max("n_chars").alias("mx_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.when(F.length(col("text")) != col("n_chars"), 1)
              .otherwise(0)).alias("n_chars_mismatch"))
