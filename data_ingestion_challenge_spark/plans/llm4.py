"""LLM-training-data pipeline, batch 4 (SURVEY.md §2C): Gopher-style
corpus quality rules, token statistics, a sketch-accuracy audit for the
MinHash estimator, and int8 embedding compression.

Parity notes: every ratio is an exact integer division rendered as
DOUBLE in both engines; float folds over arrays run in identical
element order (Spark `aggregate` left fold == DuckDB `list_sum` over
`list_transform`), so even the quantization RMSE replays bit-for-bit
before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.functions import hashing as H
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.plans.llm import (
    _MH_VALUES, _SH_CTE, _shared_postings)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ quality filtering

@query(
    "gopher_quality_filter",
    # Gopher-style rule battery (Rae et al. §A1.1 shape): word-count
    # bounds, mean/max word length bounds, lexical diversity.  All
    # rules are exact integer arithmetic → identical verdicts in both
    # engines; thresholds are the published ballpark adapted to the
    # synthetic corpus.
    oracle="""
    WITH t AS (SELECT doc_id, lang, n_chars,
                      string_split(text, ' ') AS w FROM documents)
    SELECT doc_id, lang,
           len(w) AS n_words,
           round((n_chars - len(w) + 1) / len(w), 4) AS mean_word_len,
           list_max(list_transform(w, x -> length(x))) AS max_word_len,
           round(len(list_distinct(w)) / len(w), 4) AS distinct_ratio,
           CASE WHEN len(w) BETWEEN 10 AND 10000
                 AND (n_chars - len(w) + 1) / len(w) BETWEEN 2 AND 12
                 AND list_max(list_transform(w, x -> length(x))) <= 20
                 AND len(list_distinct(w)) / len(w) >= 0.2
                THEN 1 ELSE 0 END AS keep_flag
    FROM t
    """,
)
def gopher_quality_filter(cat: Catalog) -> DataFrame:
    """Narrow map over the corpus — zero shuffle; at 100 TB this is
    the cheapest pass in the pipeline and the one that drops the most
    bytes, so it runs FIRST (before any dedup shuffle pays for docs
    the rules would discard anyway).

    The tokenization binds ONCE in a lower projection: every rule
    references `w`, and CollapseProject refuses to inline a non-cheap
    expression used more than once — a single-select formulation
    re-evaluates split(text) per rule (~10× the scan's CPU)."""
    d = cat.documents.select(
        "doc_id", "lang", "n_chars", F.split(col("text"), " ").alias("w"))
    n_words = F.size(col("w"))
    mean_wl = (col("n_chars") - n_words + 1) / n_words
    max_wl = F.array_max(F.transform(col("w"), F.length))
    dratio = F.size(F.array_distinct(col("w"))) / n_words
    return d.select(
        "doc_id", "lang",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        max_wl.alias("max_word_len"),
        F.round(dratio, 4).alias("distinct_ratio"),
        F.when(n_words.between(10, 10000)
               & mean_wl.between(2, 12)
               & (max_wl <= 20)
               & (dratio >= 0.2), 1)
        .otherwise(0).alias("keep_flag"))


@query(
    "doc_token_entropy",
    # Shannon entropy of the per-doc token distribution — the
    # "gibberish vs natural text" signal quality classifiers key on.
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
            FROM cnt GROUP BY doc_id)
    SELECT c.doc_id,
           min(t.n) AS n_tokens,
           count(*) AS n_unique,
           round(-sum((c / t.n) * log2(c / t.n)), 4) AS entropy
    FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id
    """,
)
def doc_token_entropy(cat: Catalog) -> DataFrame:
    """Both aggregations key on doc_id, so AQE reuses one hash
    partitioning for the count and the entropy fold; per-doc group
    sizes are bounded by doc length — no skew surface."""
    tok = cat.documents.select(
        "doc_id", F.explode(F.split(col("text"), " ")).alias("w"))
    cnt = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = col("c") / col("n")
    return (cnt.join(tot, "doc_id")
            .groupBy("doc_id")
            .agg(F.min("n").alias("n_tokens"),
                 F.count("*").alias("n_unique"),
                 F.round(-F.sum(p * F.log2(p)), 4).alias("entropy")))


@query(
    "token_freq_topk",
    # Corpus-level heavy hitters, EXACT (the CMS sketch twin lives in
    # cms_heavy_hitters): groupBy partial-aggregates map-side, then a
    # distributed TakeOrdered picks the global top 50 — the vocabulary
    # never sorts in one task.
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents),
    c AS (SELECT w AS token, count(*) AS cnt FROM tok GROUP BY w),
    r AS (SELECT token, cnt,
                 CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT)
                     AS rank
          FROM c)
    SELECT token, cnt, rank FROM r WHERE rank <= 50
    """,
)
def token_freq_topk(cat: Catalog) -> DataFrame:
    tok = cat.documents.select(
        F.explode(F.split(col("text"), " ")).alias("token"))
    c = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    top = c.orderBy(col("cnt").desc(), "token").limit(50)
    # rank window runs on the 50 surviving rows only.
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(col("cnt").desc(),
                                                   "token")))


# ------------------------------------------------ sketch accuracy

@query(
    "minhash_estimate_audit",
    # The MinHash estimator's accuracy, AUDITED: for every LSH band
    # candidate pair, the signature-agreement estimate k_eq/16 next to
    # the exact Jaccard — the per-pair error a tuning pass reads before
    # picking (k, bands).  Signatures replay exactly in SQL (same
    # md5-derived h32, same (a,b) params), so est/exact/err all match
    # bit-for-bit before rounding.
    oracle=f"""
    WITH {_SH_CTE},
    hs AS (SELECT doc_id, s,
                  ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
           FROM sh),
    params(i, a, b) AS (VALUES {_MH_VALUES}),
    sig AS (SELECT doc_id, p.i,
                   min((p.a * h + p.b) % {H.MINHASH_P}) AS m
            FROM hs CROSS JOIN params p GROUP BY doc_id, p.i),
    band AS (SELECT doc_id, i // 2 AS bi,
                    string_agg(m, ':' ORDER BY i) AS bkey
             FROM sig GROUP BY doc_id, i // 2),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM band x JOIN band y
               ON x.bi = y.bi AND x.bkey = y.bkey
              AND x.doc_id < y.doc_id),
    est AS (SELECT doc_a, doc_b,
                   sum(CASE WHEN xa.m = yb.m THEN 1 ELSE 0 END) / 16.0
                       AS est
            FROM cand
            JOIN sig xa ON xa.doc_id = doc_a
            JOIN sig yb ON yb.doc_id = doc_b AND xa.i = yb.i
            GROUP BY doc_a, doc_b),
    inter AS (SELECT doc_a, doc_b, count(*) AS ic
              FROM cand
              JOIN sh a ON a.doc_id = doc_a
              JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
              GROUP BY doc_a, doc_b)
    SELECT e.doc_a, e.doc_b,
           round(e.est, 4) AS est_jaccard,
           round(ic / (sa.n + sb.n - ic), 4) AS jaccard,
           round(abs(e.est - ic / (sa.n + sb.n - ic)), 4) AS abs_err
    FROM est e
    JOIN inter USING (doc_a, doc_b)
    JOIN sizes sa ON sa.doc_id = e.doc_a
    JOIN sizes sb ON sb.doc_id = e.doc_b
    """,
)
def minhash_estimate_audit(cat: Catalog) -> DataFrame:
    posting = _shared_postings(cat)
    k = 16
    hashed = posting.select("doc_id", H.h32(col("s")).alias("h"))
    sig = hashed.groupBy("doc_id").agg(*[
        F.min((F.lit(a) * col("h") + F.lit(b)) % F.lit(H.MINHASH_P))
        .alias(f"m{i}")
        for i, (a, b) in enumerate(H.minhash_params(k))])
    rows = 2
    band_cols = [
        F.concat_ws(":", F.lit(str(b)),
                    *[col(f"m{b * rows + r}").cast("string")
                      for r in range(rows)])
        for b in range(k // rows)]
    bandrows = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bkey"))
    cand = (bandrows.alias("x").join(bandrows.alias("y"), "bkey")
            .where(col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").alias("doc_a"),
                    col("y.doc_id").alias("doc_b"))
            .distinct())
    eq = sum(F.when(col(f"xa.m{i}") == col(f"yb.m{i}"), 1).otherwise(0)
             for i in range(k))
    est = (cand
           .join(sig.alias("xa"), col("xa.doc_id") == col("doc_a"))
           .join(sig.alias("yb"), col("yb.doc_id") == col("doc_b"))
           .select("doc_a", "doc_b", (eq / float(k)).alias("est")))
    sizes = posting.groupBy("doc_id").agg(F.count("*").alias("n"))
    # tau=0 keeps every candidate: the audit wants the error on misses
    # (est high, exact low) just as much as on hits.  abs_err derives
    # from the UNROUNDED jaccard (keep_raw) — the oracle computes
    # abs(est - ic/(na+nb-ic)) on the raw ratio, and rounding first
    # flips the 4th decimal whenever the true error sits within 5e-5
    # of a rounding boundary (data-dependent flake).
    exact = D._verify_candidates(cand, posting, sizes, tau=0.0,
                                 keep_raw=True)
    return (est.join(exact, ["doc_a", "doc_b"])
            .select("doc_a", "doc_b",
                    F.round(col("est"), 4).alias("est_jaccard"),
                    "jaccard",
                    F.round(F.abs(col("est") - col("jaccard_raw")), 4)
                    .alias("abs_err")))


# --------------------------------------------- pipeline terminal

@query(
    "corpus_train_ready",
    # The document pipeline's FUNNEL VERDICT per source: a doc is
    # train-ready iff it (a) passes the Gopher rule battery, (b) is
    # its exact-dup group's survivor (min doc_id per md5), (c) is not
    # an eval-slice member, and (d) is not contaminated (shingle
    # overlap with the eval slice < 0.5).  One row per source with the
    # survival funnel — what a pipeline operator actually reads before
    # shipping a corpus snapshot.
    oracle=f"""
    WITH {_SH_CTE},
    bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
    ov AS (SELECT c.doc_id,
                  count(b.s) / count(*) >= 0.5 AS contaminated
           FROM sh c LEFT JOIN bsh b ON c.s = b.s
           WHERE c.doc_id % 97 <> 0
           GROUP BY c.doc_id),
    toks AS (SELECT doc_id, source, n_chars,
                    md5(text) AS h, string_split(text, ' ') AS w2
             FROM documents),
    base AS (
        SELECT doc_id, source,
               min(doc_id) OVER (PARTITION BY h) = doc_id AS is_survivor,
               len(w2) BETWEEN 10 AND 10000
                 AND (n_chars - len(w2) + 1) / len(w2) BETWEEN 2 AND 12
                 AND list_max(list_transform(w2, x -> length(x))) <= 20
                 AND len(list_distinct(w2)) / len(w2) >= 0.2 AS rules_ok
        FROM toks)
    SELECT b.source,
           count(*) AS n_docs,
           CAST(count(*) FILTER (
               b.rules_ok AND b.is_survivor AND b.doc_id % 97 <> 0
               AND NOT coalesce(o.contaminated, FALSE)) AS BIGINT)
               AS n_train_ready,
           round(count(*) FILTER (
               b.rules_ok AND b.is_survivor AND b.doc_id % 97 <> 0
               AND NOT coalesce(o.contaminated, FALSE)) / count(*), 4)
               AS train_ready_share
    FROM base b LEFT JOIN ov o ON b.doc_id = o.doc_id
    GROUP BY b.source
    """,
)
def corpus_train_ready(cat: Catalog) -> DataFrame:
    """Composes the registered signals — gopher_quality_filter's rule
    verdict, dedup_exact's survivor choice, decontaminate_overlap's
    contamination flag — into the per-source funnel.  Scale shape: all
    three signals are narrow maps or reuse the shared posting table;
    the md5 survivor window shuffles once on the hash (dup groups are
    tiny); the final aggregate is per-source, map-side combined."""
    from data_ingestion_challenge_spark.plans.llm3 import _BENCH_MOD

    d = cat.documents.select(
        "doc_id", "source", "n_chars",
        F.md5(col("text")).alias("_h"),
        F.split(col("text"), " ").alias("w"))
    n_words = F.size(col("w"))
    mean_wl = (col("n_chars") - n_words + 1) / n_words
    rules_ok = (n_words.between(10, 10000)
                & mean_wl.between(2, 12)
                & (F.array_max(F.transform(col("w"), F.length)) <= 20)
                & ((F.size(F.array_distinct(col("w"))) / n_words) >= 0.2))
    surv = (F.min("doc_id").over(Window.partitionBy("_h"))
            == col("doc_id"))
    flags = d.select("doc_id", "source",
                     rules_ok.alias("rules_ok"), surv.alias("is_survivor"))
    ov = D.benchmark_overlap(
        _shared_postings(cat),
        bench_pred=col("doc_id") % _BENCH_MOD == 0,
        tau=0.5).select("doc_id", "contaminated")
    ready = (col("rules_ok") & col("is_survivor")
             & (col("doc_id") % _BENCH_MOD != 0)
             & ~F.coalesce(col("contaminated"), F.lit(False)))
    return (flags.join(ov, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(ready.cast("long")).alias("n_train_ready"),
                 F.round(F.sum(ready.cast("int")) / F.count("*"), 4)
                 .alias("train_ready_share")))


# --------------------------------------------- embedding compression

@query(
    "embedding_quantize_int8",
    # Symmetric per-vector int8 quantization (the 4× memory cut an ANN
    # index takes before PQ): scale = 127/max|x|, q = round(x·scale),
    # reconstruction RMSE.  The fold runs in array order in both
    # engines, so the doubles agree bit-for-bit before rounding.
    oracle="""
    WITH s AS (SELECT vec_id,
                      embedding::DOUBLE[] AS e,
                      127.0 / list_max(list_transform(
                          embedding::DOUBLE[], x -> abs(x))) AS sc
               FROM embeddings)
    SELECT vec_id,
           round(sc, 6) AS scale,
           round(sqrt(list_sum(list_transform(
                     e, x -> pow(x - round(x * sc) / sc, 2)))
                 / len(e)), 6) AS rmse
    FROM s
    """,
)
def embedding_quantize_int8(cat: Catalog) -> DataFrame:
    """Narrow map (no shuffle); arithmetic-only lambdas are safe inside
    higher-order functions (the no-md5/split-in-lambda rule guards
    re-evaluated EXPENSIVE exprs, not folds like this)."""
    e = cat.embeddings.selectExpr(
        "vec_id",
        "CAST(embedding AS ARRAY<DOUBLE>) AS e",
        "127.0D / array_max(transform(CAST(embedding AS ARRAY<DOUBLE>),"
        " x -> abs(x))) AS sc")
    return e.selectExpr(
        "vec_id",
        "round(sc, 6) AS scale",
        "round(sqrt(aggregate(e, 0.0D,"
        " (acc, x) -> acc + pow(x - round(x * sc) / sc, 2),"
        " acc -> acc / size(e))), 6) AS rmse")
