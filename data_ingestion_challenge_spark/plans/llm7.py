"""LLM-training-data pipeline, batch 7 (SURVEY.md §2C): SemDeDup-style
semantic pruning over embeddings, perplexity-bucket mixture stats, and
per-language tokenizer fertility.

Parity notes: the semantic-prune cells replay in SQL from the seeded
hyperplane literals (model constants, same pattern as the LSH family);
the perplexity buckets use exact distributed ntile (operators/ranking)
over a (decimal-exact xent, doc_id) total order so decile membership is
deterministic in both engines; per-bucket and per-language averages
divide EXACT integer/decimal sums so no cross-engine float
accumulation exists before the final rounded ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.functions import text as T
from data_ingestion_challenge_spark.operators import similarity as S
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ semantic pruning

@query(
    "semdedup_prune",
    oracle=S.semdedup_oracle_sql(tau=0.4, bits=4, dim=64),
)
def semdedup_prune(cat: Catalog) -> DataFrame:
    """SemDeDup-shaped per-vector prune verdict: inside each seeded
    sign-bucket cell, drop any vector with a lower-id cell-mate at
    cosine ≥ 0.4 (operators/similarity.py:semdedup_prune — Σ|cell|²
    gemm work, never corpus²)."""
    return S.semdedup_prune(cat.embeddings, tau=0.4, bits=4, dim=64)


# ------------------------------------------------ perplexity mixture

@query(
    "mixture_ppl_buckets",
    # CCNet's head/middle/tail split generalized to deciles: bucket
    # docs by unigram cross-entropy (the doc_unigram_logloss signal)
    # and report each decile's doc count, token mass, and mean xent —
    # the table a mixture designer reads to decide how much of each
    # quality band enters training.  ntile order is (rounded xent,
    # doc_id): deterministic in both engines; per-bucket mean divides
    # an exact DECIMAL sum of the 4dp-rounded per-doc values.
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
               FROM documents),
    f AS (SELECT t, count(*) AS c FROM t GROUP BY t),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM f),
    xent AS (SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_tokens,
                    round(CAST(sum(CAST(round(-log2(
                              c / (SELECT total FROM n)), 9)
                          AS DECIMAL(30,9))) AS DOUBLE)
                          / count(*), 4) AS xent_bits
             FROM t JOIN f USING (t) GROUP BY doc_id),
    b AS (SELECT doc_id, n_tokens, xent_bits,
                 ntile(10) OVER (ORDER BY xent_bits, doc_id) AS bucket
          FROM xent)
    SELECT bucket, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(CAST(xent_bits AS DECIMAL(20,8)))
                      AS DOUBLE) / count(*), 4) AS avg_xent_bits,
           round(sum(n_tokens) /
                 (SELECT CAST(total AS DOUBLE) FROM n), 4)
               AS token_share
    FROM b GROUP BY bucket
    """,
)
def mixture_ppl_buckets(cat: Catalog) -> DataFrame:
    """Decile mixture table over the unigram-LM quality signal.

    Scale shape: the frequency model is one map-side-combined
    groupBy(token) (vocabulary-sized → broadcast back); the corpus
    token total is a bounded driver scalar; the decile assignment
    runs through operators/ranking.global_ntile — exact SQL ntile
    semantics via range repartition + per-partition rank + broadcast
    offsets, so even a trillion-doc corpus never funnels through a
    single-task sort (the oracle keeps the plain ntile spelling:
    value-exact parity is the test that the distributed plan IS
    ntile).

    Determinism: per-doc xent_bits rounds each token's -log2(p) to
    1e-9 and sums as DECIMAL(30,9) (the source_outlier_score
    pattern), so the value — and therefore decile membership — is
    independent of Spark-vs-DuckDB summation order; a float avg
    rounded at 4dp could flip at a rounding boundary and shift a
    whole block of ntile assignments."""
    from data_ingestion_challenge_spark.operators.ranking import (
        global_ntile,
    )

    toks = cat.documents.select(
        "doc_id", F.explode(T.words(col("text"))).alias("t"))
    freq = toks.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c")).collect()[0][0]
    xent = (toks.join(F.broadcast(freq), "t")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(
                     F.sum(F.round(-F.log2(col("c")
                                           / F.lit(float(total))), 9)
                           .cast("decimal(30,9)")).cast("double")
                     / F.count("*"), 4).alias("xent_bits")))
    b = global_ntile(xent, 10, ["xent_bits", "doc_id"], out="bucket")
    return (b.groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.round(
                     F.sum(col("xent_bits").cast("decimal(20,8)"))
                     .cast("double") / F.count("*"), 4)
                 .alias("avg_xent_bits"),
                 F.round(F.sum("n_tokens") / F.lit(float(total)), 4)
                 .alias("token_share")))


# ------------------------------------------------ tokenizer fertility

@query(
    "tokenizer_fertility",
    # Tokenizer-fertility report per language: alpha-token (BPE-ish
    # regex word) count per whitespace token and characters per alpha
    # token — the "how expensive is this language for the tokenizer"
    # table read when balancing a multilingual mixture.  All sums are
    # exact integers; ratios are single double divisions rounded 4dp.
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT)
               AS alpha_tokens,
           round(sum(len(regexp_extract_all(text, '[a-z]+'))) /
                 CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 4)
               AS fertility,
           round(sum(n_chars) /
                 CAST(sum(len(regexp_extract_all(text, '[a-z]+')))
                      AS DOUBLE), 4) AS chars_per_alpha
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility(cat: Catalog) -> DataFrame:
    """Per-language fertility: one narrow scan, map-side-combined
    integer sums, language-count-sized result.  Uses the same token
    definitions as token_counts (functions in operators/textstats.py)
    so the two audits agree."""
    return (cat.documents
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.size(T.words(col("text"))))
                 .alias("ws_tokens"),
                 F.sum(F.size(T.alpha_tokens(col("text"))))
                 .alias("alpha_tokens"),
                 F.round(F.sum(F.size(T.alpha_tokens(col("text"))))
                         / F.sum(F.size(T.words(col("text"))))
                         .cast("double"), 4).alias("fertility"),
                 F.round(F.sum("n_chars")
                         / F.sum(F.size(T.alpha_tokens(col("text"))))
                         .cast("double"), 4)
                 .alias("chars_per_alpha")))
