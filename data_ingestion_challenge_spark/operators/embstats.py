"""Embedding-space diagnostics: per-dimension covariance structure.

Before building a PQ codebook or an IVF index over an embedding
column, a pipeline audits the dimensions themselves: strongly
covarying dimension PAIRS mean redundant axes (PQ subspaces should not
split them; PCA/OPQ rotation would help), and the audit is also the
cheapest detector of a degenerate encoder (whole blocks of correlated
dims).  This operator reports the top-k |covariance| dimension pairs.

Parity discipline: per-row products round to 1e-9 and sum as
DECIMAL(30,9) (the repo's exact-sum pattern), so every cov value is
independent of Spark-vs-DuckDB summation order; the final covariance
is one double expression over exact decimal sums, rounded at 6dp, and
the rank orders by the ROUNDED |cov| with (i, j) as the unique
tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def embedding_dim_covariance(embeddings: DataFrame,
                             k: int = 25) -> DataFrame:
    """Top-``k`` dimension pairs (i < j, 0-based) by |cov(i, j)| where
    cov = E[v_i·v_j] − E[v_i]·E[v_j] over all vectors.

    Scale shape: one posexplode (n·d rows), a self-equi-join on vec_id
    (co-partitioned — one shuffle each side, never a cartesian)
    producing the n·d(d−1)/2 upper-triangle products, then two
    map-side-combined groupBys (d² and d rows).  The d²-row result is
    model-sized: the join-back of per-dim means broadcasts, and the
    top-k is TakeOrdered over d² rows.  At very large d the
    upper-triangle blowup (d²/2 per vector) would move to a blocked
    gemm (operators/similarity's pattern) — at embedding dims ≤ ~1k
    the declarative join IS the right plan (d=64 here: 2016 products
    per vector)."""
    e = embeddings.select(
        "vec_id", F.posexplode(col("embedding")).alias("i", "v"))
    e = e.select("vec_id", "i", col("v").cast("double").alias("v"))

    prods = (e.alias("a").join(e.alias("b"), "vec_id")
             .where(col("a.i") < col("b.i"))
             .select(col("a.i").alias("i"), col("b.i").alias("j"),
                     F.round(col("a.v") * col("b.v"), 9)
                     .cast("decimal(30,9)").alias("p")))
    g = (prods.groupBy("i", "j")
         .agg(F.sum("p").alias("sp"), F.count("*").alias("n")))

    m = (e.groupBy("i")
         .agg(F.sum(F.round(col("v"), 9).cast("decimal(30,9)"))
              .alias("sv"),
              F.count("*").alias("nm")))
    mi = m.select(col("i"), col("sv").alias("svi"),
                  col("nm").alias("ni"))
    mj = m.select(col("i").alias("j"), col("sv").alias("svj"),
                  col("nm").alias("nj"))

    cov = (g.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
           .select(
               "i", "j",
               F.round(
                   col("sp").cast("double") / col("n")
                   - (col("svi").cast("double") / col("ni"))
                   * (col("svj").cast("double") / col("nj")),
                   6).alias("cov")))
    top = cov.orderBy(F.abs(col("cov")).desc(), "i", "j").limit(k)
    rk = Window.orderBy(F.abs(col("cov")).desc(), "i", "j")
    return (top.withColumn("rank", F.row_number().over(rk))
            .select("rank", "i", "j", "cov"))


def dim_covariance_oracle_sql(k: int = 25) -> str:
    """DuckDB twin of embedding_dim_covariance: generate_subscripts/
    unnest pair off positions exactly like posexplode (0-based after
    the −1), same 1e-9-rounded DECIMAL(30,9) sums, same final double
    expression and (|cov| desc, i, j) rank."""
    return f"""
    WITH e AS (SELECT vec_id,
                      generate_subscripts(embedding, 1) - 1 AS i,
                      CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    m AS (SELECT i, sum(CAST(round(v, 9) AS DECIMAL(30,9))) AS sv,
                 CAST(count(*) AS BIGINT) AS nm
          FROM e GROUP BY i),
    g AS (SELECT a.i AS i, b.i AS j,
                 sum(CAST(round(a.v * b.v, 9) AS DECIMAL(30,9)))
                     AS sp,
                 CAST(count(*) AS BIGINT) AS n
          FROM e a JOIN e b
            ON a.vec_id = b.vec_id AND a.i < b.i
          GROUP BY a.i, b.i),
    c AS (SELECT g.i, g.j,
                 round(CAST(g.sp AS DOUBLE) / g.n
                       - (CAST(mi.sv AS DOUBLE) / mi.nm)
                       * (CAST(mj.sv AS DOUBLE) / mj.nm),
                       6) AS cov
          FROM g JOIN m mi ON g.i = mi.i
                 JOIN m mj ON g.j = mj.i)
    SELECT rank, i, j, cov FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY abs(cov) DESC, i, j) AS INT) AS rank
        FROM c)
    WHERE rank <= {k}
    """
