"""Collocation mining: PMI-ranked adjacent bigrams over the corpus.

The classic corpus-linguistics signal a training-data pipeline uses to
find multi-word units worth protecting from tokenizer splits (and to
audit synthetic/templated text, whose top collocations look nothing
like natural language).  PMI(x,y) = log2 p(xy) − log2 p(x) − log2 p(y)
with p from corpus counts.

Parity discipline: every probability is a single bigint/bigint double
division and the PMI is the same three-term log2 expression spelled
token-for-token in both engines — no float accumulation anywhere (the
counts are exact), so the only cross-engine surface is IEEE log2 on
identical doubles, rounded at 6dp (the lang_id risk class, accepted
repo-wide).  The rank orders by the ROUNDED pmi with (w1, w2) as the
unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.functions import text as T


def token_pmi_bigrams(documents: DataFrame, k: int = 25,
                      min_count: int = 5) -> DataFrame:
    """Top-``k`` adjacent-bigram collocations by PMI (ties (w1, w2)),
    bigrams rarer than ``min_count`` excluded (singleton bigrams have
    inflated PMI — standard practice).

    Scale shape: one map-side-combined groupBy for unigrams
    (vocab-sized) and one for bigrams (distinct-bigram-sized); the two
    corpus totals are 1-row broadcast aggregates; the unigram counts
    re-attach by plain equi-join (AQE broadcasts when the vocab table
    is actually small).  Top-k runs as
    TakeOrdered (orderBy + limit — distributed partial top-k, no
    global sort); the rank window is over the k survivors only."""
    w = T.words(col("text"))
    # Adjacent pairs via one sequence-transform over the token array —
    # arithmetic-only lambda (interpreted but evaluated once per row;
    # no md5/split inside, per the repo's higher-order-lambda rule).
    bg = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + 1).alias("w2"))),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = (documents.select(F.explode(bg).alias("b"))
             .select("b.w1", "b.w2"))
    bgc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_xy"))

    uni = (documents.select(F.explode(w).alias("t"))
           .groupBy("t").agg(F.count("*").alias("c")))
    totals = (bgc.agg(F.sum("n_xy").alias("b_total"))
              .crossJoin(uni.agg(F.sum("c").alias("u_total"))))

    # No broadcast hint on the vocab joins: a web-scale corpus can
    # carry 1e8+ distinct tokens, past safe broadcast size — AQE
    # broadcasts when the count table is actually small (the
    # hard_negative_pairs precedent).  The 1-row totals stay hinted.
    scored = (bgc.where(col("n_xy") >= min_count)
              .join(uni.select(col("t").alias("w1"),
                               col("c").alias("c1")), "w1")
              .join(uni.select(col("t").alias("w2"),
                               col("c").alias("c2")), "w2")
              .crossJoin(F.broadcast(totals))
              .select(
                  "w1", "w2", "n_xy",
                  F.round(F.log2(col("n_xy") / col("b_total"))
                          - F.log2(col("c1") / col("u_total"))
                          - F.log2(col("c2") / col("u_total")),
                          6).alias("pmi")))
    top = (scored
           .orderBy(col("pmi").desc(), "w1", "w2")
           .limit(k))
    # Window over ≤ k rows only — the top-k itself was distributed.
    rk = Window.orderBy(col("pmi").desc(), "w1", "w2")
    return (top.withColumn("rank", F.row_number().over(rk))
            .select("rank", "w1", "w2", "n_xy", "pmi"))


def pmi_oracle_sql(k: int = 25, min_count: int = 5) -> str:
    """DuckDB twin of token_pmi_bigrams: adjacency via a positional
    token self-join (same multiset of bigrams as the Spark transform),
    identical three-term log2 PMI, identical (pmi desc, w1, w2)
    rank."""
    return f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    tok AS (SELECT doc_id, generate_subscripts(ws, 1) AS p,
                   unnest(ws) AS tk
            FROM w),
    uni AS (SELECT tk, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY tk),
    u AS (SELECT CAST(sum(c) AS BIGINT) AS u_total FROM uni),
    bg AS (SELECT a.tk AS w1, b.tk AS w2
           FROM tok a JOIN tok b
             ON a.doc_id = b.doc_id AND b.p = a.p + 1),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy
            FROM bg GROUP BY w1, w2),
    bt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS b_total FROM bgc),
    scored AS (
        SELECT w1, w2, n_xy,
               round(log2(n_xy / (SELECT b_total FROM bt))
                     - log2(u1.c / (SELECT u_total FROM u))
                     - log2(u2.c / (SELECT u_total FROM u)),
                     6) AS pmi
        FROM bgc
        JOIN uni u1 ON bgc.w1 = u1.tk
        JOIN uni u2 ON bgc.w2 = u2.tk
        WHERE n_xy >= {min_count})
    SELECT rank, w1, w2, n_xy, pmi FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY pmi DESC, w1, w2) AS INT) AS rank
        FROM scored)
    WHERE rank <= {k}
    """


# ------------------------------------------------ BPE merge mining

def bpe_merge_candidates(documents: DataFrame, k: int = 25
                         ) -> DataFrame:
    """Top-``k`` word-internal adjacent character pairs by corpus
    frequency — the FIRST merge-selection step of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016): count every adjacent
    symbol pair inside each word, weighted by the word's corpus
    frequency, and rank.  Running it per corpus snapshot shows how
    the tokenizer's earliest merges would shift with the mixture —
    the corpus-side leg of the tokenizer_fertility audit.

    Exact integers end to end (pair weight = Σ_w n_w · occurrences
    in w); the only cross-engine surface is the (cnt desc, left,
    right) rank — no floats at all.

    Scale shape: tokenize → word-frequency groupBy (vocab-sized,
    map-side combined) → per-WORD pair explode (runs over the VOCAB
    table, not the corpus — a 100 TB corpus has bounded distinct
    words, so the explode is model-sized) → pair groupBy → TakeOrdered
    top-k; the rank window sees only k rows."""
    w = T.words(col("text"))
    vocab = (documents.select(F.explode(w).alias("w"))
             .groupBy("w").agg(F.count("*").alias("n")))
    ch = F.split(col("w"), "")
    pairs = F.when(
        F.length(col("w")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(col("w")) - 1),
            lambda i: F.struct(
                F.element_at(ch, i).alias("left"),
                F.element_at(ch, i + 1).alias("right"))),
    ).otherwise(
        F.array().cast("array<struct<left:string,right:string>>"))
    pc = (vocab.select("n", F.explode(pairs).alias("p"))
          .groupBy("p.left", "p.right")
          .agg(F.sum("n").alias("cnt")))
    top = (pc.orderBy(col("cnt").desc(), "left", "right").limit(k))
    rk = Window.orderBy(col("cnt").desc(), "left", "right")
    return (top.withColumn("rank", F.row_number().over(rk))
            .select("rank", "left", "right", "cnt"))


def bpe_oracle_sql(k: int = 25) -> str:
    """DuckDB twin of bpe_merge_candidates: same word-frequency CTE,
    adjacency via a positional char self-join over the vocab (the
    pmi_oracle_sql pattern one level down), same exact-integer
    weights and (cnt desc, left, right) rank."""
    return f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS n
              FROM tok WHERE w <> '' GROUP BY w),
    ch AS (SELECT w, n, generate_subscripts(cs, 1) AS p,
                  unnest(cs) AS c
           FROM (SELECT w, n, string_split(w, '') AS cs
                 FROM vocab)),
    pr AS (SELECT a.c AS "left", b.c AS "right", a.n
           FROM ch a JOIN ch b
             ON a.w = b.w AND a.n = b.n AND b.p = a.p + 1),
    pc AS (SELECT "left", "right", CAST(sum(n) AS BIGINT) AS cnt
           FROM pr GROUP BY "left", "right")
    SELECT rank, "left", "right", cnt FROM (
        SELECT *, CAST(row_number() OVER (
            ORDER BY cnt DESC, "left", "right") AS INT) AS rank
        FROM pc)
    WHERE rank <= {k}
    """
