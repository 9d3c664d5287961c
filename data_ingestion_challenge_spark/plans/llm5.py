"""LLM-training-data pipeline, batch 5 (SURVEY.md §2C): quality-aware
dedup survivors, corpus-level repeated-substring signal, deterministic
importance resampling, and a unigram LM score.

Same parity discipline as the earlier batches: md5-derived hashing,
integer-safe thresholds where a float boundary could flip a verdict,
ratios rounded to 4dp in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.functions import text as T
from data_ingestion_challenge_spark.functions.hashing import h32
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.plans.llm import (
    _SH_CTE, _shared_postings)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------- quality-aware survivor

# Near-dup pairs (exact PPJoin, tau=0.8) as a reusable CTE chain: the
# same candidate+verify shape as dedup_ngram_jaccard's oracle, ending
# in jp(doc_a, doc_b).
_JP_CTE = f"""
    {_SH_CTE},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id),
    jp AS (
        SELECT i.doc_a, i.doc_b
        FROM (SELECT doc_a, doc_b, count(*) AS ic FROM cand
              JOIN sh a ON a.doc_id = doc_a
              JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
              GROUP BY doc_a, doc_b) i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE i.ic / (sa.n + sb.n - i.ic) >= 0.8
    )
"""


@query(
    "dedup_keep_best_quality",
    # Survivor = LONGEST doc per near-dup cluster (ties → lowest id) —
    # the policy real pipelines prefer over keep-lowest-id: near-dups
    # are usually truncations/wrappers of one best copy.  The oracle
    # replays the PPJoin pair graph, closes it with the recursive CC
    # CTE, and picks the survivor with the same window.
    oracle=f"""
    WITH RECURSIVE {_JP_CTE},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM jp
        UNION SELECT doc_b, doc_a FROM jp
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), clusters AS (
        SELECT src AS id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ), toks AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), lab AS (
        SELECT t.doc_id, coalesce(c.cluster_id, t.doc_id) AS cluster_id,
               t.n_tokens
        FROM toks t LEFT JOIN clusters c ON t.doc_id = c.id
    )
    SELECT doc_id, cluster_id, n_tokens,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_tokens DESC, doc_id) = 1
               AS keep
    FROM lab
    """,
)
def dedup_keep_best_quality(cat: Catalog) -> DataFrame:
    """Dedup terminal with a QUALITY-aware survivor policy: per
    near-dup cluster keep the doc with the most tokens (tie → lowest
    doc_id) instead of blindly keeping min-id — truncated or wrapped
    near-dups lose to the fullest copy.

    Scale shape: pair stage is the exact PPJoin (prefix-filtered,
    never cartesian); clusters via O(log diameter) CC of the pair
    graph (≪ corpus); the survivor pick is one window over the
    cluster-labeled VERTEX table, then a broadcast join back — the
    corpus itself never reshuffles."""
    from data_ingestion_challenge_spark.operators.graph import (
        connected_components)

    pairs = D.ngram_jaccard_pairs(cat.documents, n=3, tau=0.8,
                                  posting=_shared_postings(cat))
    clusters = connected_components(pairs, "doc_a", "doc_b")
    toks = cat.documents.select(
        "doc_id",
        F.size(T.words(col("text"))).cast("bigint").alias("n_tokens"))
    lab = (toks.join(F.broadcast(clusters),
                     toks["doc_id"] == clusters["id"], "left")
           .select("doc_id",
                   F.coalesce(col("cluster_id"), col("doc_id"))
                   .alias("cluster_id"),
                   "n_tokens"))
    w = Window.partitionBy("cluster_id").orderBy(
        col("n_tokens").desc(), col("doc_id"))
    return lab.select(
        "doc_id", "cluster_id", "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"))


# ----------------------------------- corpus repeated-substring signal

_REP_K = 20


@query(
    "corpus_repeated_substrings",
    # Lee et al. ExactSubstr SELF-dedup signal at corpus level: per
    # doc, how many of its char-20-gram offsets occur in ≥2 distinct
    # docs — the share of the doc that is verbatim-duplicated text
    # somewhere else in the corpus (license headers, templates,
    # mirrored paragraphs).
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               md5(substr(text, CAST(i AS INT), {_REP_K})) AS gh
        FROM (SELECT doc_id, text,
                     unnest(generate_series(
                         1, greatest(length(text) - {_REP_K - 1}, 0)))
                         AS i
              FROM documents)
    ),
    rep AS (SELECT gh FROM (SELECT gh, count(DISTINCT doc_id) AS nd
                            FROM g GROUP BY gh)
            WHERE nd >= 2),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
    hit AS (SELECT g.doc_id, count(*) AS n_repeated
            FROM g JOIN rep ON g.gh = rep.gh GROUP BY g.doc_id)
    SELECT d.doc_id,
           coalesce(t.n_grams, 0) AS n_grams,
           coalesce(h.n_repeated, 0) AS n_repeated,
           round(coalesce(h.n_repeated, 0)
                 / greatest(coalesce(t.n_grams, 0), 1), 4)
               AS repeated_ratio
    FROM documents d
    LEFT JOIN tot t ON d.doc_id = t.doc_id
    LEFT JOIN hit h ON d.doc_id = h.doc_id
    """,
)
def corpus_repeated_substrings(cat: Catalog) -> DataFrame:
    """Per-doc share of character offsets whose 20-gram appears in ≥2
    distinct docs — the corpus-wide verbatim-duplication signal the
    Lee et al. ExactSubstr pass cuts on (boilerplate headers, mirrored
    spans), WITHOUT any doc-pair join.

    Scale shape: char grams are a zero-shuffle narrow map (O(total
    chars) rows); the gram→doc-count aggregate partial-aggregates
    map-side; the repeated-vocabulary join shuffles on gh and reuses
    the aggregate's partitioning.  Everything is linear — the doc×doc
    dimension never appears."""
    g = D.char_gram_hashes(cat.documents, _REP_K)
    rep = (g.groupBy("gh")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .where(col("nd") >= 2)
           .select("gh"))
    tot = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hit = (g.join(rep, "gh")
           .groupBy("doc_id").agg(F.count("*").alias("n_repeated")))
    base = cat.documents.select("doc_id")
    n_grams = F.coalesce(col("n_grams"), F.lit(0))
    n_rep = F.coalesce(col("n_repeated"), F.lit(0))
    return (base.join(tot, "doc_id", "left")
            .join(hit, "doc_id", "left")
            .select("doc_id",
                    n_grams.alias("n_grams"),
                    n_rep.alias("n_repeated"),
                    F.round(n_rep / F.greatest(n_grams, F.lit(1)), 4)
                    .alias("repeated_ratio")))


# -------------------------------------- deterministic importance resample

@query(
    "importance_resample_by_length",
    # Token-proportional resampling (weight = min(n_tokens, 100)%):
    # the md5-uniform acceptance test is an INTEGER compare — no float
    # power near a threshold boundary, so the verdict can't flip
    # between engines (the stratified-sample pattern, weighted).
    oracle="""
    SELECT doc_id, lang,
           CAST(least(len(string_split(text, ' ')), 100) AS BIGINT)
               AS weight_pct
    FROM documents
    WHERE ('0x' || substr(md5('resample:' || doc_id::VARCHAR), 1, 8))
              ::BIGINT % 100
          < least(len(string_split(text, ' ')), 100)
    """,
)
def importance_resample_by_length(cat: Catalog) -> DataFrame:
    """Deterministic importance resampling, P(keep) ∝ doc weight
    (token count capped at 100): the md5-bucket acceptance makes the
    sample a pure function of the data — re-ingestion re-selects the
    SAME docs (idempotent curation), unlike rand()-based sampling.
    Weighted variant of stratified_sample_by_lang; zero-shuffle map."""
    w_pct = F.least(F.size(T.words(col("text"))), F.lit(100))
    bucket = h32(F.concat(F.lit("resample:"),
                          col("doc_id").cast("string"))) % 100
    return (cat.documents
            .select("doc_id", "lang",
                    w_pct.cast("bigint").alias("weight_pct"),
                    bucket.alias("_b"))
            .where(col("_b") < col("weight_pct"))
            .drop("_b"))


# ------------------------------------------------ unigram LM scoring

@query(
    "doc_unigram_logloss",
    # CCNet-style LM quality proxy: per-doc mean negative log2
    # probability of its tokens under the CORPUS unigram distribution.
    # Gibberish / rare-token soup scores high, common prose low.
    # Same log-parity treatment as doc_token_entropy (4dp round).
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
               FROM documents),
    f AS (SELECT t, count(*) AS c FROM t GROUP BY t),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM f)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-log2(c / (SELECT total FROM n))), 4)
               AS xent_bits
    FROM t JOIN f USING (t)
    GROUP BY doc_id
    """,
)
def doc_unigram_logloss(cat: Catalog) -> DataFrame:
    """Unigram LM cross-entropy per doc (bits/token) against the
    corpus's own token distribution — the cheap stand-in for the
    KenLM-perplexity quality filter (CCNet): outlier docs spend most
    of their mass on rare tokens.

    Scale shape: one groupBy(token) builds the frequency model
    (map-side combined; vocabulary-sized result → broadcast to the
    scoring join); the corpus total is a driver scalar (bounded);
    per-doc aggregate partial-aggregates.  Complements
    doc_token_entropy (per-doc distribution) and
    doc_bigram_familiarity (integer bigram typicality)."""
    toks = cat.documents.select(
        "doc_id", F.explode(T.words(col("text"))).alias("t"))
    freq = toks.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c")).collect()[0][0]
    return (toks.join(F.broadcast(freq), "t")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(-F.log2(col("c") / F.lit(float(total)))),
                         4).alias("xent_bits")))


# ------------------------------------------------ threshold tuning

@query(
    "dedup_threshold_sweep",
    # The τ-tuning table a dedup operator reads before picking a
    # threshold: verified pair counts per 0.1-wide Jaccard bucket plus
    # the cumulative pairs-at-or-above count.  One verified pair set
    # (τ ≥ 0.5) serves every candidate threshold — no re-run per τ.
    oracle=f"""
    WITH {_SH_CTE},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id),
    jpv AS (
        SELECT i.doc_a, i.doc_b,
               round(i.ic / (sa.n + sb.n - i.ic), 4) AS jaccard
        FROM (SELECT doc_a, doc_b, count(*) AS ic FROM cand
              JOIN sh a ON a.doc_id = doc_a
              JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
              GROUP BY doc_a, doc_b) i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE i.ic / (sa.n + sb.n - i.ic) >= 0.5
    ),
    bucketed AS (
        SELECT CAST(floor(jaccard * 10) AS BIGINT) AS tau_bucket,
               count(*) AS n_pairs
        FROM jpv GROUP BY 1
    )
    SELECT tau_bucket, n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY tau_bucket DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_pairs_at_or_above
    FROM bucketed
    """,
)
def dedup_threshold_sweep(cat: Catalog) -> DataFrame:
    """Threshold-tuning surface: exact-verified Jaccard pairs at
    τ ≥ 0.5, bucketed by 0.1, with the cumulative count a pipeline
    reads to pick its dedup threshold ("τ=0.8 drops N pairs, τ=0.7
    drops M").  Reuses the shared posting table and the PPJoin pair
    machinery at the lower τ — the per-τ answer comes from ONE run.

    Scale shape: identical to dedup_ngram_jaccard (prefix filter is
    just looser at τ=0.5); the sweep itself is a tiny aggregate."""
    pairs = D.ngram_jaccard_pairs(cat.documents, n=3, tau=0.5,
                                  posting=_shared_postings(cat))
    bucketed = (pairs
                .groupBy(F.floor(col("jaccard") * 10).cast("bigint")
                         .alias("tau_bucket"))
                .agg(F.count("*").alias("n_pairs")))
    w = (Window.orderBy(col("tau_bucket").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    return bucketed.select(
        "tau_bucket", "n_pairs",
        F.sum("n_pairs").over(w).cast("bigint")
        .alias("n_pairs_at_or_above"))


# ------------------------------------------------- ANN recall audit

from data_ingestion_challenge_spark.operators import similarity as S  # noqa: E402
from data_ingestion_challenge_spark.plans.llm import _QD_COS  # noqa: E402


@query(
    "ann_recall_audit",
    # Recall@5 of the IVF index vs exact brute force, PER QUERY — the
    # accuracy/throughput dial an ANN deployment tunes (nprobe/nlist).
    # Both index replays are the existing oracle constructions, nested
    # as CTE bodies; the audit is their per-query intersection.
    oracle=f"""
    WITH brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {_QD_COS} DESC, d.vec_id) AS rk
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < 10) q
            JOIN embeddings d ON q.vec_id <> d.vec_id
        ) WHERE rk <= 5
    ),
    ivf AS ({S.ivf_oracle_sql(n_queries=10, k=5)}),
    hits AS (
        SELECT b.query_id, count(*) AS n_hits
        FROM brute b JOIN ivf i
          ON b.query_id = i.query_id
         AND b.neighbor_id = i.neighbor_id
        GROUP BY b.query_id
    )
    SELECT q.query_id,
           coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) / 5.0, 4) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM brute) q
    LEFT JOIN hits h ON q.query_id = h.query_id
    """,
)
def ann_recall_audit(cat: Catalog) -> DataFrame:
    """Per-query recall@5 of the IVF index against exact brute force —
    the tuning artifact that justifies an nprobe/nlist choice before a
    100 TB deployment.  Both sides are the registered index operators;
    the audit is one small join on their (query, neighbor) outputs."""
    brute = (S.brute_force_topk(cat.embeddings, n_queries=10, k=5)
             .select("query_id", "neighbor_id"))
    ivf = (S.ivf_topk(cat.embeddings, n_queries=10, k=5)
           .select("query_id", "neighbor_id"))
    hits = (brute.join(ivf, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    base = brute.select("query_id").distinct()
    n_hits = F.coalesce(col("n_hits"), F.lit(0))
    return (base.join(hits, "query_id", "left")
            .select("query_id", n_hits.alias("n_hits"),
                    F.round(n_hits / 5.0, 4).alias("recall_at_5")))


# ------------------------------------------- packing efficiency

_PACK_CAP = 2048  # same budget as sequence_pack


@query(
    "packing_efficiency_audit",
    # The batch-prep efficiency report: per source, pack count and
    # fill ratio (tokens / packs·cap).  Waste shows up as fill < 1 —
    # the number a pipeline watches when it tunes pack budget vs doc
    # length distribution.
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
    SELECT source,
           CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           count(*) AS n_docs,
           round(sum(n_tok)
                 / (count(DISTINCT pack_id) * {_PACK_CAP}.0), 4)
               AS fill_ratio
    FROM packed GROUP BY source
    """,
)
def packing_efficiency_audit(cat: Catalog) -> DataFrame:
    """Per-source packing efficiency over the sequence_pack layout:
    pack count, token total and fill ratio against the fixed 2048
    budget.  Same one-window-per-source shape as sequence_pack; the
    audit rollup rides the identical partitioning."""
    toks = cat.documents.select(
        "doc_id", "source",
        F.size(F.split(col("text"), " ")).alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (toks
              .withColumn("_start", F.sum("n_tok").over(w) - col("n_tok"))
              .withColumn("pack_id", F.expr(f"_start div {_PACK_CAP}")))
    return (packed.groupBy("source")
            .agg(F.countDistinct("pack_id").alias("n_packs"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.count("*").alias("n_docs"),
                 F.round(F.sum("n_tok")
                         / (F.countDistinct("pack_id") * _PACK_CAP), 4)
                 .alias("fill_ratio")))


@query(
    "doc_length_percentiles",
    # The curation thresholds' source of truth: per-language doc
    # length quantiles (chars + tokens) a length filter is tuned from.
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 4) AS p25_chars,
           round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
           round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
           round(quantile_cont(len(string_split(text, ' ')), 0.5), 4)
               AS p50_tokens
    FROM documents GROUP BY lang
    """,
)
def doc_length_percentiles(cat: Catalog) -> DataFrame:
    """Per-language length distribution (exact interpolated
    percentiles, the order_value_percentiles pairing) — where the
    Gopher min/max word-count bounds come from when they're re-fit to
    a new corpus.  One groupBy(lang); tokenization binds once in a
    lower projection."""
    d = cat.documents.select(
        "lang", "n_chars",
        F.size(T.words(col("text"))).alias("_nt"))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.percentile("n_chars", F.lit(0.25)), 4)
                 .alias("p25_chars"),
                 F.round(F.percentile("n_chars", F.lit(0.5)), 4)
                 .alias("p50_chars"),
                 F.round(F.percentile("n_chars", F.lit(0.9)), 4)
                 .alias("p90_chars"),
                 F.round(F.percentile("_nt", F.lit(0.5)), 4)
                 .alias("p50_tokens")))


@query("ann_lsh_multiprobe_topk",
       oracle=S.lsh_multiprobe_oracle_sql(n_queries=10, k=5, bits=4))
def ann_lsh_multiprobe_topk(cat: Catalog) -> DataFrame:
    """Multi-probe LSH ANN (own bucket + hamming-1 buckets): recovers
    the near-boundary recall single-bucket LSH loses, scanning
    (bits+1)/2^bits of the corpus.  Deterministic seeded planes →
    exact DuckDB replay, like ann_lsh_topk."""
    return S.lsh_multiprobe_topk(cat.embeddings, n_queries=10, k=5,
                                 bits=4)


# --------------------------------------------- normalization + QA

from data_ingestion_challenge_spark.operators import textstats as TS  # noqa: E402


@query(
    "dedup_exact_normalized",
    # C4-style fuzzy-exact dedup: normalize (lowercase + collapse
    # whitespace + strip trailing/leading space) BEFORE hashing, so
    # casing/spacing variants of the same text collapse into one
    # group.  Reports groups that the RAW md5 would have missed.
    oracle="""
    WITH n AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
                   AS nh,
               md5(text) AS rh
        FROM documents
    )
    SELECT nh AS norm_hash,
           count(*) AS dup_count,
           min(doc_id) AS keep_doc_id,
           CAST(count(DISTINCT rh) AS BIGINT) AS n_raw_variants
    FROM n GROUP BY nh
    """,
)
def dedup_exact_normalized(cat: Catalog) -> DataFrame:
    """Exact dedup on NORMALIZED text (lowercase, collapsed
    whitespace): the cheap fuzzy-exact pass real pipelines run between
    raw-md5 and MinHash.  n_raw_variants > 1 marks groups the raw hash
    missed.  Same map-side-collapsing hash-groupBy shape as
    dedup_exact."""
    norm = F.md5(F.trim(F.regexp_replace(F.lower(col("text")),
                                         " +", " ")))
    return (cat.documents
            .select("doc_id", norm.alias("norm_hash"),
                    F.md5(col("text")).alias("_rh"))
            .groupBy("norm_hash")
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("keep_doc_id"),
                 F.countDistinct("_rh").alias("n_raw_variants")))


@query(
    "eval_split_assign",
    # Deterministic train/val/test assignment (md5 bucket % 100 →
    # 90/5/5): the split a pipeline must reproduce bit-for-bit on
    # re-ingestion — rand() splits silently reshuffle examples between
    # train and eval across runs (leakage).
    oracle="""
    WITH a AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 8))
                   ::BIGINT % 100 AS b
        FROM documents
    )
    SELECT CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
           lang, count(*) AS n_docs
    FROM a GROUP BY 1, lang
    """,
)
def eval_split_assign(cat: Catalog) -> DataFrame:
    """Deterministic 90/5/5 split assignment via md5 bucketing —
    idempotent across re-ingestion (the stratified-sample discipline
    applied to the train/eval boundary, where non-determinism means
    contamination).  Zero-shuffle map + a tiny rollup."""
    b = h32(F.concat(F.lit("split:"), col("doc_id").cast("string"))) % 100
    split = (F.when(b < 90, "train").when(b < 95, "val")
             .otherwise("test"))
    return (cat.documents
            .select(split.alias("split"), "lang")
            .groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs")))


@query(
    "doc_lang_mismatch_audit",
    # Label-noise QA: the char-bigram classifier's prediction vs the
    # labeled lang, as a confusion rollup.  Both sides of the join are
    # deterministic (the classifier model is a literal), so the full
    # matrix replays exactly.
    oracle=f"""
    WITH pred AS ({TS.lang_id_oracle_sql()})
    SELECT d.lang AS labeled_lang, p.predicted_lang,
           count(*) AS n_docs,
           d.lang = p.predicted_lang AS agree
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.lang, p.predicted_lang
    """,
)
def doc_lang_mismatch_audit(cat: Catalog) -> DataFrame:
    """Dataset-QA confusion rollup: labeled lang × classifier
    prediction with doc counts — where label noise and classifier
    blind spots surface before a lang-stratified sample bakes them in.
    One narrow classify map + a tiny |langs|² rollup."""
    pred = TS.lang_id(cat.documents).select("doc_id", "predicted_lang")
    lab = cat.documents.select("doc_id", col("lang").alias("labeled_lang"))
    return (lab.join(pred, "doc_id")
            .groupBy("labeled_lang", "predicted_lang")
            .agg(F.count("*").alias("n_docs"),
                 (col("labeled_lang") == col("predicted_lang"))
                 .alias("agree")))
