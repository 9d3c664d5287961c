"""Lexical retrieval over the documents table: BM25 top-k.

A training-data pipeline uses query-based retrieval constantly —
"pull the docs most about X" for targeted curation, decontamination
review, eval-set mining, and mixture debugging.  BM25 (Robertson/
Sparck Jones; the Lucene-default scoring function) is the standard
lexical ranker; this is its Spark-first formulation:

- term frequencies / doc lengths / document frequencies are the three
  map-side-combined aggregates over ONE tokenize pass;
- the query side is tiny by construction (a human's query set), so
  query terms — and the per-term (df, idf) stats joined onto them —
  BROADCAST to the corpus-side tf table: the corpus is touched by
  exactly one scan plus one shuffle on doc_id (the dl join), and only
  docs containing ≥1 query term survive into scoring;
- per-(query, doc) scores sum per-term contributions as
  DECIMAL(20,9) after a 1e-9 round — the msum() trick — so the sum
  is exact and associative: identical under ANY partitioning and in
  the DuckDB oracle, which makes the top-k rank (score DESC, doc_id)
  deterministic cross-engine with no float-tie hazard.

At 100 TB: everything is linear in the corpus with map-side partial
aggregation; nothing is quadratic and no corpus-side broadcast
exists.  A deployment materializes tf/dl/dfreq once per corpus
snapshot (they are the classic inverted-index statistics) and pays
only the broadcast-join scoring per query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

K1 = 1.2
B = 0.75


def bm25_topk(docs: DataFrame, queries: list[tuple[str, str]],
              k: int = 10, k1: float = K1, b: float = B) -> DataFrame:
    """Top-``k`` docs per query by BM25: (query_id, doc_id, rank,
    bm25).  ``queries`` = [(query_id, query_text)]; query text is
    whitespace-tokenized, duplicate terms deduped (binary query-term
    frequency — the common simplification).  idf is the Lucene
    variant ln(1 + (N − df + ½)/(df + ½)), non-negative for any df."""
    if not queries:
        raise ValueError("bm25_topk: queries must be non-empty")
    blank = [qid for qid, q in queries if not q.split()]
    if blank:
        raise ValueError(f"bm25_topk: blank query text for {blank}")
    spark = docs.sparkSession
    # Empty tokens (consecutive/leading spaces) are dropped: they
    # would inflate dl and make '' a scorable term.
    tok = (docs.select(
        "doc_id", F.explode(F.split(col("text"), " ")).alias("token"))
        .where(col("token") != ""))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").cast("double").alias("N"),
                   F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    qt = spark.createDataFrame(
        sorted({(qid, t) for qid, q in queries
                for t in q.split(" ") if t}),
        "query_id string, token string")
    # (df, token) stats restricted to query terms FIRST — the result
    # is query-sized, so the corpus-side tf join is a broadcast.
    qstats = dfreq.join(broadcast(qt), "token")
    idf = F.log(F.lit(1.0)
                + (col("N") - col("df") + 0.5) / (col("df") + 0.5))
    denom = (col("tf")
             + k1 * (1 - b + b * col("dl") / col("avgdl")))
    contrib = idf * (col("tf") * (k1 + 1)) / denom
    scored = (
        tf.join(broadcast(qstats), "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.round(contrib, 9).cast("decimal(20,9)"))
             .alias("_s")))
    w = Window.partitionBy("query_id").orderBy(col("_s").desc(),
                                               "doc_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(col("rank") <= k)
            .select("query_id", "doc_id", "rank",
                    F.round(col("_s"), 4).cast("double").alias("bm25")))


def oracle_bm25_topk(table: str, queries: list[tuple[str, str]],
                     k: int = 10, k1: float = K1,
                     b: float = B) -> str:
    """DuckDB twin of bm25_topk — same tokenization, same Lucene idf,
    same decimal-exact contribution sum, same tie-break.  Query ids
    and terms are quote-escaped: natural-language terms contain
    apostrophes, and an unescaped interpolation is both a syntax
    error and an injection vector."""
    if not queries:
        raise ValueError("oracle_bm25_topk: queries must be non-empty")
    blank = [qid for qid, q in queries if not q.split()]
    if blank:
        raise ValueError(
            f"oracle_bm25_topk: blank query text for {blank}")

    def _q(s: str) -> str:
        return s.replace("'", "''")

    terms = sorted({(qid, t) for qid, q in queries
                    for t in q.split(" ") if t})
    values = ", ".join(f"('{_q(qid)}', '{_q(t)}')" for qid, t in terms)
    return f"""
    WITH tok0 AS (SELECT doc_id, unnest(string_split(text, ' '))
                             AS token
                  FROM {table}),
    tok AS (SELECT doc_id, token FROM tok0 WHERE token <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok GROUP BY doc_id, token),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*)::DOUBLE AS N, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    qt(query_id, token) AS (VALUES {values}),
    matched AS (
        SELECT qt.query_id, tf.doc_id,
               round(ln(1.0 + (N - df + 0.5) / (df + 0.5))
                     * (tf * ({k1} + 1))
                     / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)),
                     9) AS contrib
        FROM tf
        JOIN qt USING (token)
        JOIN dfreq USING (token)
        JOIN dl USING (doc_id)
        CROSS JOIN stats),
    scored AS (SELECT query_id, doc_id,
                      sum(CAST(contrib AS DECIMAL(20,9))) AS s
               FROM matched GROUP BY query_id, doc_id),
    ranked AS (SELECT query_id, doc_id, s,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY s DESC, doc_id)
                          AS rank
               FROM scored)
    SELECT query_id, doc_id, rank,
           CAST(round(s, 4) AS DOUBLE) AS bm25
    FROM ranked WHERE rank <= {k}
    """
