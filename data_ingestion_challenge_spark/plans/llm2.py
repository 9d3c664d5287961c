"""LLM-training-data pipeline queries, batch 2 (SURVEY.md §2C).

Corpus-curation operators a 100 TB training-data pipeline needs beyond
dedup/similarity: Gopher-style repetition filters, deterministic
stratified sampling, mixture re-weighting, and TF-IDF term profiling.

Scale notes:
- Every shuffle is keyed by doc_id (+word) — high-cardinality, bounded
  per-doc fan-out (docs are length-capped), so no skew at any SF.
- The word explode is the heavy stage in all four; each query projects
  to the minimal (doc_id[, lang], word[, pos]) columns BEFORE the
  shuffle so only a few bytes per token move.
- TF-IDF's document-frequency side collapses to |vocab| rows — it is
  broadcast into the tf join; N (corpus size) is a broadcast scalar.
- Sampling is a pure map (md5 mod threshold) — no shuffle at all; at
  cluster scale it composes with any downstream op for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.functions.hashing import h32
from data_ingestion_challenge_spark.plans.registry import query

# Exploded (doc_id, lang, pos, word) token table — the shared first
# stage.  split() runs ONCE per row here (never inside a lambda: no
# CSE there), then only the narrow token columns enter the shuffles.
def _tokens(cat: Catalog) -> DataFrame:
    return cat.documents.select(
        "doc_id", "lang",
        F.posexplode(F.split(col("text"), " ")).alias("pos", "word"),
    )


@query(
    "doc_repetition_stats",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    t AS (SELECT doc_id, unnest(w) AS word,
                 unnest(range(1, len(w) + 1)) AS pos FROM d),
    t2 AS (SELECT doc_id, word,
                  lead(word) OVER (PARTITION BY doc_id ORDER BY pos) nxt
           FROM t),
    pw AS (SELECT doc_id, word, count(*) c FROM t2 GROUP BY 1, 2),
    a1 AS (SELECT doc_id, max(c) top_cnt, CAST(sum(c) AS BIGINT) n_tokens
           FROM pw GROUP BY 1),
    a2 AS (SELECT doc_id,
                  count(DISTINCT word || ' ' || nxt) n_distinct_bi,
                  count(*) n_bi
           FROM t2 WHERE nxt IS NOT NULL GROUP BY 1)
    SELECT a1.doc_id, n_tokens,
           round(top_cnt / n_tokens, 4) AS top_word_share,
           coalesce(round(1 - n_distinct_bi / n_bi, 4), 0.0)
               AS dup_bigram_share,
           CASE WHEN top_cnt / n_tokens <= 0.1
                 AND coalesce(1 - n_distinct_bi / n_bi, 0) <= 0.5
                THEN 1 ELSE 0 END AS keep_flag
    FROM a1 LEFT JOIN a2 ON a1.doc_id = a2.doc_id
    """,
)
def doc_repetition_stats(cat: Catalog) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    most-frequent-word share and duplicate-bigram share per document.

    One explode → one shuffle on doc_id (window) → doc_id-keyed aggs.
    The bigram stream is built with lead() instead of materializing a
    w-gram array — no 2× token expansion before the shuffle."""
    t = _tokens(cat)
    w = Window.partitionBy("doc_id").orderBy("pos")
    t2 = t.select(
        "doc_id", "word",
        F.lead("word").over(w).alias("nxt"),
    )
    pw = t2.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    a1 = pw.groupBy("doc_id").agg(
        F.max("c").alias("top_cnt"), F.sum("c").alias("n_tokens"))
    a2 = (t2.where(col("nxt").isNotNull())
          .select("doc_id", F.concat_ws(" ", "word", "nxt").alias("bi"))
          .groupBy("doc_id")
          .agg(F.countDistinct("bi").alias("n_distinct_bi"),
               F.count("*").alias("n_bi")))
    top_share = col("top_cnt") / col("n_tokens")
    dup_share = F.lit(1) - col("n_distinct_bi") / col("n_bi")
    return (a1.join(a2, "doc_id", "left")
            .select(
                "doc_id", "n_tokens",
                F.round(top_share, 4).alias("top_word_share"),
                F.coalesce(F.round(dup_share, 4), F.lit(0.0))
                .alias("dup_bigram_share"),
                F.when((top_share <= 0.1)
                       & (F.coalesce(dup_share, F.lit(0.0)) <= 0.5), 1)
                .otherwise(0).alias("keep_flag")))


# Per-lang Bernoulli sampling rates (percent) — the curation knob.
_STRAT_RATES = {"en": 50, "zh": 25}
_STRAT_DEFAULT = 10


@query(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang,
           ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 8))::BIGINT
               % 100 AS bucket
    FROM documents
    WHERE ('0x' || substr(md5('strat:' || doc_id::VARCHAR), 1, 8))::BIGINT
               % 100
          < CASE lang WHEN 'en' THEN {_STRAT_RATES['en']}
                      WHEN 'zh' THEN {_STRAT_RATES['zh']}
                      ELSE {_STRAT_DEFAULT} END
    """,
)
def stratified_sample_by_lang(cat: Catalog) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a doc iff
    md5-derived uniform bucket < the stratum's rate.  Pure map — no
    shuffle, no RNG state; re-running on re-ingested data selects the
    SAME sample (idempotent curation), unlike df.sample()."""
    bucket = h32(F.concat(F.lit("strat:"),
                          col("doc_id").cast("string"))) % 100
    rate = (F.when(col("lang") == "en", _STRAT_RATES["en"])
            .when(col("lang") == "zh", _STRAT_RATES["zh"])
            .otherwise(_STRAT_DEFAULT))
    return (cat.documents
            .select("doc_id", "lang", bucket.alias("bucket"), rate.alias("r"))
            .where(col("bucket") < col("r"))
            .drop("r"))


@query(
    "corpus_sampling_weights",
    oracle="""
    WITH lt AS (SELECT lang, count(*) n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           n_tokens
                FROM documents GROUP BY lang)
    SELECT lang, n_docs, n_tokens,
           round(n_tokens / sum(n_tokens) OVER (), 4) AS token_share,
           round(sum(n_tokens) OVER ()
                 / (count(*) OVER () * n_tokens), 4) AS uniform_weight
    FROM lt
    """,
)
def corpus_sampling_weights(cat: Catalog) -> DataFrame:
    """Mixture re-weighting: per-language token share and the sampling
    weight that equalizes the mixture (target = uniform over langs).
    The groupBy collapses the corpus to |langs| rows BEFORE the
    global-window pass — the unpartitioned window touches 5 rows, not
    the corpus."""
    lt = (cat.documents
          .select("lang", F.size(F.split(col("text"), " ")).alias("nt"))
          .groupBy("lang")
          .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")))
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    return lt.select(
        "lang", "n_docs", "n_tokens",
        F.round(col("n_tokens") / total, 4).alias("token_share"),
        F.round(total / (F.count("*").over(w) * col("n_tokens")), 4)
        .alias("uniform_weight"))


@query(
    "tfidf_top_terms",
    oracle="""
    WITH t AS (SELECT doc_id, lang,
                      unnest(string_split(text, ' ')) word FROM documents),
    tf AS (SELECT lang, word, count(*) tf FROM t GROUP BY 1, 2),
    df AS (SELECT word, count(DISTINCT doc_id) df FROM t GROUP BY 1),
    n AS (SELECT count(*) n FROM documents),
    s AS (SELECT lang, tf.word, tf.tf,
                 round(tf.tf * ln((n.n + 1) / (df.df + 1)), 4) AS tfidf
          FROM tf JOIN df ON tf.word = df.word CROSS JOIN n)
    SELECT lang, word, tf, tfidf, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY tfidf DESC, word) rnk FROM s)
    WHERE rnk <= 5
    """,
)
def tfidf_top_terms(cat: Catalog) -> DataFrame:
    """Top-5 TF-IDF terms per language — corpus term profiling.

    df collapses to |vocab| rows → broadcast into the tf join; N is a
    broadcast scalar (crossJoin of a 1-row aggregate).  The only
    corpus-sized shuffles are the two token-keyed groupBys."""
    t = _tokens(cat)
    tf = t.groupBy("lang", "word").agg(F.count("*").alias("tf"))
    df = (t.select("doc_id", "word").distinct()
          .groupBy("word").agg(F.count("*").alias("df")))
    n = cat.documents.agg(F.count("*").alias("n"))
    s = (tf.join(F.broadcast(df), "word")
         .crossJoin(F.broadcast(n))
         .select("lang", "word", "tf",
                 F.round(col("tf") * F.log((col("n") + 1) / (col("df") + 1)),
                         4).alias("tfidf")))
    rnk = F.row_number().over(
        Window.partitionBy("lang").orderBy(col("tfidf").desc(), "word"))
    return (s.withColumn("rnk", rnk).where(col("rnk") <= 5)
            .select("lang", "word", "tf", "tfidf", "rnk"))


# ------------------------------------------------- sequence packing

_PACK_CAP = 2048  # token budget per training sequence


@query(
    "sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ), packed AS (
        SELECT source, n_tok,
               CAST((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok) // {_PACK_CAP}
                    AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT source, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM packed GROUP BY source, pack_id
    """,
)
def sequence_pack(cat: Catalog) -> DataFrame:
    """Pretraining sequence packing: assign each doc to the fixed
    token-budget pack where its token stream BEGINS (contiguous
    chunking of the per-source doc stream in deterministic doc_id
    order) and report per-pack document/token counts — the batch-prep
    step that turns a curated corpus into fixed-length training rows.

    Scale shape: ONE running-sum window per source partition (the
    per-source stream is the parallel unit, like a shard file); the
    rollup reuses the same partitioning, so AQE sees a single shuffle.
    A pathologically hot source splits into (source, doc_id-range)
    sub-streams first — packing is chunking, so any deterministic
    sub-split stays a valid packing."""
    toks = cat.documents.select(
        "doc_id", "source",
        F.size(F.split(col("text"), " ")).alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # Integral `div`, not `/`+floor: the double path loses exactness
    # once per-source cumulative tokens pass 2^53 (real at 100 TB).
    packed = (toks
              .withColumn("_start", F.sum("n_tok").over(w) - col("n_tok"))
              .withColumn("pack_id", F.expr(f"_start div {_PACK_CAP}")))
    return (packed.groupBy("source", "pack_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("n_tokens")))


# -------------------------------------- temperature-scaled mixture

_MIX_ALPHA = 0.3  # mT5/XLM-R style exponent: upsample the tail


@query(
    "mixture_temperature_weights",
    oracle=f"""
    WITH lt AS (SELECT lang, count(*) AS n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY lang),
    sh AS (SELECT *,
                  n_tokens / sum(n_tokens) OVER () AS share,
                  pow(n_tokens / sum(n_tokens) OVER (), {_MIX_ALPHA})
                      AS powed
           FROM lt)
    SELECT lang, n_docs, n_tokens,
           round(share, 4) AS token_share,
           round(powed / sum(powed) OVER (), 4) AS sample_prob,
           round((powed / sum(powed) OVER ()) / share, 4) AS upsample
    FROM sh
    """,
)
def mixture_temperature_weights(cat: Catalog) -> DataFrame:
    """Temperature-scaled language mixture (p_l ∝ share_l^α, α=0.3 —
    the mT5/XLM-R recipe): low-resource languages upsample, head
    languages downsample, and `upsample` is the per-lang repeat factor
    a sampler applies.  Complements corpus_sampling_weights (uniform
    target) with the tunable-α production path.

    Scale shape: one token-count aggregate per lang (map-side
    combined); the |langs|-row table then computes shares with window
    sums over a broadcast-sized frame."""
    lt = (cat.documents
          .groupBy("lang")
          .agg(F.count("*").alias("n_docs"),
               F.sum(F.size(F.split(col("text"), " "))).alias("n_tokens")))
    total = Window.partitionBy()
    share = col("n_tokens") / F.sum("n_tokens").over(total)
    powed = F.pow(share, F.lit(_MIX_ALPHA))
    prob = powed / F.sum(powed).over(total)
    return lt.select(
        "lang", "n_docs", "n_tokens",
        F.round(share, 4).alias("token_share"),
        F.round(prob, 4).alias("sample_prob"),
        F.round(prob / share, 4).alias("upsample"))
