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


# ------------------------------------ KMV theta sketch (r15 pool)
#
# HLL (weekly_distinct_users_hll_merge) unions; it cannot INTERSECT.
# The k-minimum-values (theta) sketch can: keep each set's k smallest
# deterministic hash values; distinct(W) ≈ (k-1)·D / kth_min, and for
# two sets the common values below θ = min(θ_A, θ_B) estimate the
# intersection as c·D/θ — the audience-overlap / cross-snapshot-dedup
# estimator a 100 TB corpus runs where the exact distinct-intersection
# join is a batch job.  Built on the md5-derived h32 (deterministic in
# both engines), so sketch contents, thresholds, and estimates are
# bit-reproducible in the DuckDB oracle — a GATED sketch, unlike the
# rows-only HLL.

KMV_DOMAIN = 1 << 32  # h32's range


def kmv_weekly_user_overlap(events: DataFrame, k: int = 64,
                            salts: int = 16) -> DataFrame:
    """Consecutive-week audience overlap, estimated from per-week KMV
    sketches and AUDITED against the exact distinct intersection in
    the same row (the ann_recall_audit pattern: estimator and ground
    truth side by side, so drift is a hash mismatch).

    Scale shape: one map-side-combined distinct over (week, h); the
    per-week k-min runs the repo's two-phase salted top-n (local
    row_number per (week, salt) ≤ k prefilter — the pigeonhole
    argument guarantees no global top-k survivor is lost — then the
    global rank over ≤ salts·k rows), so no single task ever sorts a
    week's full user set.  Everything after operates on k·|weeks|
    rows.  The exact-intersection audit column is the one corpus-
    sized join (user-keyed equi-join); at 100 TB run the estimator
    alone and sample the audit."""
    from pyspark.sql.window import Window

    wk = F.date_trunc("week", col("ts")).cast("date")
    uw = events.select(wk.alias("wk"), col("user_id")).distinct()
    vals = uw.select("wk", user_hash().alias("h")).distinct()
    wloc = Window.partitionBy("wk", "_salt").orderBy("h")
    wref = Window.partitionBy("wk").orderBy("h")
    topk = (vals
            .withColumn("_salt", F.pmod(col("h"), lit(salts)))
            .withColumn("_lrk", F.row_number().over(wloc))
            .where(col("_lrk") <= k)
            .withColumn("_rk", F.row_number().over(wref))
            .where(col("_rk") <= k)
            .select("wk", "h"))
    stats = (topk.groupBy("wk")
             .agg(F.count("*").alias("cnt"), F.max("h").alias("kth"))
             .withColumn("theta",
                         F.when(col("cnt") == k, col("kth"))
                         .otherwise(lit(KMV_DOMAIN))))

    def _est(cnt, kth):
        return F.round(
            F.when(cnt == k,
                   lit(float((k - 1) * KMV_DOMAIN)) / kth)
            .otherwise(cnt.cast("double")), 4)

    a, b = stats.alias("a"), stats.alias("b")
    pairs = (a.join(b, F.col("b.wk") == F.date_add(F.col("a.wk"), 7))
             .select(F.col("a.wk").alias("week_a"),
                     F.col("b.wk").alias("week_b"),
                     _est(F.col("a.cnt"), F.col("a.kth"))
                     .alias("est_users_a"),
                     _est(F.col("b.cnt"), F.col("b.kth"))
                     .alias("est_users_b"),
                     F.least(F.col("a.theta"), F.col("b.theta"))
                     .alias("_theta")))
    ta, tb = topk.alias("ta"), topk.alias("tb")
    common = (pairs.join(
        ta, F.col("ta.wk") == F.col("week_a")).join(
        tb, (F.col("tb.wk") == F.col("week_b"))
        & (F.col("tb.h") == F.col("ta.h")))
        .where(F.col("ta.h") < F.col("_theta"))
        .groupBy("week_a").agg(F.count("*").alias("_c")))
    exact = (uw.alias("x").join(
        uw.alias("y"), (F.col("y.user_id") == F.col("x.user_id"))
        & (F.col("y.wk") == F.date_add(F.col("x.wk"), 7)))
        .groupBy(F.col("x.wk").alias("week_a"))
        .agg(F.countDistinct("x.user_id").alias("exact_overlap")))
    return (pairs
            .join(common, "week_a", "left")
            .join(exact, "week_a", "left")
            .select("week_a", "week_b", "est_users_a", "est_users_b",
                    F.round(F.coalesce(col("_c"), lit(0))
                            * lit(float(KMV_DOMAIN)) / col("_theta"),
                            4).alias("est_overlap"),
                    F.coalesce(col("exact_overlap"), lit(0))
                    .alias("exact_overlap")))


def kmv_overlap_oracle_sql(k: int = 64) -> str:
    """DuckDB twin: same h32, same rank-≤k sketch, same θ/estimate
    arithmetic, same exact-intersection audit."""
    d = float(KMV_DOMAIN)
    return f"""
    WITH uw AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE)
                       AS wk, user_id
                FROM events),
    vals AS (SELECT DISTINCT wk,
                    ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                    1, 8))::BIGINT AS h
             FROM uw),
    rk AS (SELECT wk, h,
                  row_number() OVER (PARTITION BY wk ORDER BY h) AS r
           FROM vals),
    topk AS (SELECT wk, h FROM rk WHERE r <= {k}),
    stats AS (SELECT wk, count(*) AS cnt, max(h) AS kth,
                     CASE WHEN count(*) = {k} THEN max(h)
                          ELSE {KMV_DOMAIN} END AS theta
              FROM topk GROUP BY wk),
    pairs AS (SELECT a.wk AS week_a, b.wk AS week_b,
                     round(CASE WHEN a.cnt = {k}
                                THEN {(k - 1) * KMV_DOMAIN}.0 / a.kth
                                ELSE CAST(a.cnt AS DOUBLE) END, 4)
                         AS est_users_a,
                     round(CASE WHEN b.cnt = {k}
                                THEN {(k - 1) * KMV_DOMAIN}.0 / b.kth
                                ELSE CAST(b.cnt AS DOUBLE) END, 4)
                         AS est_users_b,
                     least(a.theta, b.theta) AS theta
              FROM stats a JOIN stats b ON b.wk = a.wk + 7),
    common AS (SELECT p.week_a, count(*) AS c
               FROM pairs p
               JOIN topk ta ON ta.wk = p.week_a
               JOIN topk tb ON tb.wk = p.week_b AND tb.h = ta.h
               WHERE ta.h < p.theta
               GROUP BY p.week_a),
    ex AS (SELECT x.wk AS week_a,
                  CAST(count(DISTINCT x.user_id) AS BIGINT)
                      AS exact_overlap
           FROM uw x JOIN uw y ON y.user_id = x.user_id
                             AND y.wk = x.wk + 7
           GROUP BY x.wk)
    SELECT p.week_a, p.week_b, p.est_users_a, p.est_users_b,
           round(coalesce(c.c, 0) * {d} / p.theta, 4) AS est_overlap,
           coalesce(ex.exact_overlap, 0) AS exact_overlap
    FROM pairs p
    LEFT JOIN common c ON c.week_a = p.week_a
    LEFT JOIN ex ON ex.week_a = p.week_a
    """
