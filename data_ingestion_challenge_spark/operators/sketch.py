"""Mergeable frequency sketches (count-min) for heavy-hitter queries.

The exact `top_users` rollup shuffles every (user, count) group; at
100 TB with hundreds of millions of users the sketch path answers
"who are the heavy hitters, roughly how heavy" with O(d·w) state per
partition instead:

- BUILD: each event increments d=4 counters, one per hash row, in a
  w=256-bucket array.  As a DataFrame plan that's explode(d rows) →
  groupBy((i, bucket)) count — only d·w = 1024 groups exist, so
  map-side combine collapses every partition's contribution to ≤1024
  rows regardless of input size, and the final shuffle moves ~KBs.
  Sketches from different partitions/days MERGE by bucket-wise sum
  (the same groupBy) — the property that makes this streamable.
- ESTIMATE: count(u) ≈ min over i of sketch[i][h_i(u)] — an upper
  bound (collisions only inflate).

Hashing is the md5-derived integer scheme of functions/hashing.py, so
the whole sketch — buckets, counters, estimates, final top-k — is
bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from data_ingestion_challenge_spark.functions import hashing as H

CMS_D = 4     # hash rows
CMS_W = 256   # buckets per row


def _bucket(h: "F.Column", a: int, b: int) -> "F.Column":
    return (lit(a) * h + lit(b)) % lit(H.MINHASH_P) % lit(CMS_W)


def _hash_buckets() -> "F.Column":
    """d (i, bucket) pairs for the md5-derived hash of the current
    `_h` column — shared by sketch build and probe."""
    params = H.minhash_params(CMS_D)
    return F.explode(F.array(*[
        F.struct(lit(i).alias("i"), _bucket(col("_h"), a, b).alias("bucket"))
        for i, (a, b) in enumerate(params)])).alias("e")


def user_hash() -> "F.Column":
    return H.h32(col("user_id").cast("string"))


def cms_build(events: DataFrame) -> DataFrame:
    """The sketch as a table: (i, bucket, c) with ≤ d·w rows.  Works
    identically on a batch frame or a streaming source (the groupBy
    is the mergeable state)."""
    return (
        events.select(user_hash().alias("_h"))
        .select(_hash_buckets())
        .groupBy(col("e.i").alias("i"), col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_probe(sketch: DataFrame, users: DataFrame, k: int = 10) -> DataFrame:
    """Serve top-k from a (possibly streamed-in) sketch table: probe
    each candidate's d buckets, estimate = min counter."""
    probes = (users.withColumn("_h", user_hash())
              .select("user_id", _hash_buckets())
              .select("user_id", col("e.i").alias("i"),
                      col("e.bucket").alias("bucket")))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("est_count"))
        .orderBy(col("est_count").desc(), "user_id")
        .limit(k)
    )


def cms_user_topk(events: DataFrame, k: int = 10) -> DataFrame:
    """Heavy hitters by event count via count-min sketch: returns
    (user_id, est_count) for the k users with the largest estimates,
    ties broken by user_id."""
    return cms_probe(cms_build(events),
                     events.select("user_id").distinct(), k)


def cms_oracle_sql(k: int = 10) -> str:
    """DuckDB twin of cms_user_topk — same hashes, buckets, minima."""
    params = H.minhash_params(CMS_D)
    vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    return f"""
    WITH p(i, a, b) AS (VALUES {vals}),
    ev AS (
        SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h32
        FROM events
    ),
    sketch AS (
        SELECT p.i, (p.a * ev.h32 + p.b) % {H.MINHASH_P} % {CMS_W} AS bucket,
               count(*) AS c
        FROM ev CROSS JOIN p GROUP BY 1, 2
    ),
    users AS (
        SELECT DISTINCT user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h32
        FROM events
    ),
    est AS (
        SELECT u.user_id, min(s.c) AS est_count
        FROM users u
        CROSS JOIN p
        JOIN sketch s
          ON s.i = p.i AND s.bucket = (p.a * u.h32 + p.b) % {H.MINHASH_P} % {CMS_W}
        GROUP BY u.user_id
    )
    SELECT user_id, est_count FROM est
    ORDER BY est_count DESC, user_id LIMIT {k}
    """
