"""Text analysis operators (SURVEY.md §2C): language ID heuristic.

Most text stats are pure Catalyst expressions registered directly in
plans/llm.py; language ID is the one genuinely-custom op — a character
n-gram cosine classifier against fixed language profiles, run as an
Arrow-batched mapInPandas (numpy inside, one pass over the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

# Tiny fixed char-bigram profiles per language.  Real deployments learn
# these from labeled corpora; fixed profiles keep the op deterministic.
_PROFILES = {
    "en": ["th", "he", "in", "er", "an"],
    "de": ["en", "er", "ch", "de", "ei"],
    "fr": ["es", "le", "de", "re", "en"],
    "es": ["de", "en", "el", "la", "os"],
    "zh": ["zh", "sh", "ng", "ia", "ua"],
}
_LANGS = sorted(_PROFILES)
_BIGRAMS = sorted({b for v in _PROFILES.values() for b in v})
_BG_IDX = {b: i for i, b in enumerate(_BIGRAMS)}

_PROFILE_MAT = np.zeros((len(_LANGS), len(_BIGRAMS)))
for _li, _lang in enumerate(_LANGS):
    for _rank, _bg in enumerate(_PROFILES[_lang]):
        _PROFILE_MAT[_li, _BG_IDX[_bg]] = len(_PROFILES[_lang]) - _rank
_PROFILE_MAT /= np.linalg.norm(_PROFILE_MAT, axis=1, keepdims=True)

LANG_ID_SCHEMA = "doc_id bigint, predicted_lang string, confidence double"


def lang_id_oracle_sql() -> str:
    """DuckDB twin of lang_id: the profile matrix is a fixed constant,
    so it embeds as literals; the doc vector is the count of each
    profiled bigram over all positions (overlap-correct via unnest),
    L2-normalized; argmax ties resolve to the alphabetically first
    language (numpy argmax = first index over sorted _LANGS)."""
    rows = []
    for li, lang in enumerate(_LANGS):
        for bi, bg in enumerate(_BIGRAMS):
            w = _PROFILE_MAT[li, bi]
            if w != 0.0:
                rows.append(f"('{lang}', '{bg}', {w!r})")
    vals = ", ".join(rows)
    bgl = ", ".join(f"'{b}'" for b in _BIGRAMS)
    langs = ", ".join(f"('{l}')" for l in _LANGS)
    return f"""
    WITH prof(lang, bg, w) AS (VALUES {vals}),
    langs(lang) AS (VALUES {langs}),
    pos AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(text)),
                          i -> substr(text, i, 2))) AS bg
            FROM documents),
    cnt AS (SELECT doc_id, bg, count(*)::DOUBLE AS c
            FROM pos WHERE bg IN ({bgl}) GROUP BY doc_id, bg),
    nrm AS (SELECT doc_id, sqrt(sum(c * c)) AS n FROM cnt
            GROUP BY doc_id),
    score AS (
        SELECT d.doc_id, l.lang,
               coalesce(sum((c.c / nrm.n) * p.w), 0.0) AS s
        FROM documents d
        CROSS JOIN langs l
        LEFT JOIN cnt c ON c.doc_id = d.doc_id
        LEFT JOIN nrm ON nrm.doc_id = d.doc_id
        LEFT JOIN prof p ON p.lang = l.lang AND p.bg = c.bg
        GROUP BY d.doc_id, l.lang
    )
    SELECT doc_id, lang AS predicted_lang, round(s, 4) AS confidence
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY round(s, 6) DESC, lang) AS rn FROM score)
    WHERE rn = 1
    """


def _doc_vector(text: str) -> np.ndarray:
    v = np.zeros(len(_BIGRAMS))
    for i in range(len(text) - 1):
        j = _BG_IDX.get(text[i:i + 2])
        if j is not None:
            v[j] += 1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def lang_id(documents: DataFrame) -> DataFrame:
    """Char-bigram cosine language classifier (deterministic)."""

    def _classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack([_doc_vector(t) for t in pdf["text"]])
            scores = vecs @ _PROFILE_MAT.T          # (docs, langs)
            # Tie-break on a 1e-6 grid: scores that are mathematically
            # equal pick up engine-specific summation-order ulps; the
            # rounded argmax resolves those ties alphabetically in
            # BOTH engines (oracle ranks by round(s, 6) DESC, lang).
            best = np.round(scores, 6).argmax(axis=1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "predicted_lang": [_LANGS[i] for i in best],
                "confidence": scores[np.arange(len(best)), best],
            })

    return documents.select("doc_id", "text").mapInPandas(
        _classify, LANG_ID_SCHEMA)


def split_sentences_udtf(spark, documents: DataFrame) -> DataFrame:
    """Python UDTF (Spark 4 API): one input row → N sentence rows.

    Coverage demo for the lateral table-function surface; note this is
    row-at-a-time Python — for a production explode use the relational
    split+posexplode (JVM codegen, ~10× faster).  The semantics here
    are deliberately simple (split on '. ', drop empties) so the DuckDB
    oracle reproduces them exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string")
    class _SplitSentences:
        def eval(self, doc_id: int, text: str):
            idx = 0
            for s in (text or "").split(". "):
                if s:
                    yield doc_id, idx, s
                idx += 1

    spark.udtf.register("split_sentences_udtf", _SplitSentences)
    documents.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.sent_idx, s.sentence "
        "FROM _docs_for_udtf d, LATERAL split_sentences_udtf(d.doc_id, d.text) s")


# ---------------------------------------------- source outlier score

def source_outlier_score(documents: DataFrame,
                         round_dp: int = 4) -> DataFrame:
    """Naive-Bayes mislabel/outlier signal per document — the cheap
    stand-in for the fastText-style quality/domain classifier a
    training-data pipeline runs before mixing sources: train unigram
    NB over (source → token) counts with add-1 smoothing, score every
    doc under EVERY source, and report
    (doc_id, source, pred_source, margin) where margin = the doc's
    log-likelihood under its OWN source minus the best other source
    (4dp).  Strongly negative margin = the doc reads like a different
    source (mislabeled scrape, template leak, contamination).

    Cross-engine determinism is exact, not approximate: per-token log
    probabilities are rounded to 1e-9 and summed as DECIMAL(30,9)
    (the BM25 msum trick), so scores are identical under ANY
    partitioning and in the DuckDB twin; pred_source ties break
    alphabetically on the exact decimal score.

    Scale shape (100 TB): the model is one map-side-combined
    groupBy(source, token) — vocabulary×sources-sized, broadcast back
    to the token stream; the scored stream is tokens×|sources| rows
    (|sources| is small) with partial aggregation onto (doc, source);
    the vocab size is a bounded driver scalar."""
    from pyspark.sql.functions import broadcast

    docs = documents.select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id", "source",
        F.explode(F.split(col("text"), " ")).alias("t")
    ).where(col("t") != "")
    V = tok.select("t").distinct().count()   # bounded driver scalar
    cstats = tok.groupBy("source", "t").agg(F.count("*").alias("c"))
    # NB: the per-source total is "_tot", not "T" — Spark resolves
    # identifiers case-insensitively, so a "T" alias would make the
    # token column `t` ambiguous in the cstats⋈tot self-join.
    tot = cstats.groupBy("source").agg(F.sum("c").alias("_tot"))
    logp = (cstats.join(tot, "source")
            .select(col("source").alias("_ms"),
                    col("t").alias("_mt"),
                    F.round(F.log((col("c") + 1)
                                  / (col("_tot") + F.lit(V))), 9)
                    .alias("_lp")))
    dflt = tot.select(col("source").alias("_ds"),
                      F.round(F.log(F.lit(1.0)
                                    / (col("_tot") + F.lit(V))), 9)
                      .alias("_dlp"))
    # Both sides derive from the same `tok` plan (self-join lineage):
    # explicit aliases keep the analyzer from seeing tok's `t`
    # attribute on both inputs.
    stream = (tok.select("doc_id", "t")
              .crossJoin(broadcast(dflt)).alias("L"))
    tokscore = (
        stream.join(broadcast(logp.alias("R")),
                    (col("L._ds") == col("R._ms"))
                    & (col("L.t") == col("R._mt")), "left")
        .groupBy("L.doc_id", col("L._ds").alias("_src"))
        .agg(F.sum(F.coalesce(col("R._lp"), col("L._dlp"))
                   .cast("decimal(30,9)")).alias("_ll")))
    # Complete per-doc grid: a token-less doc has an empty sum under
    # EVERY source (log-likelihood 0), not a vanished row — the op's
    # contract is one row per input doc.
    grid = docs.select("doc_id", "source").crossJoin(
        broadcast(dflt.select(col("_ds"))))
    scored = (grid.join(tokscore,
                        (grid["doc_id"] == tokscore["doc_id"])
                        & (grid["_ds"] == tokscore["_src"]), "left")
              .select(grid["doc_id"], grid["source"],
                      grid["_ds"].alias("_src"),
                      F.coalesce(col("_ll"),
                                 F.lit(0).cast("decimal(30,9)"))
                      .alias("_ll")))
    w = Window.partitionBy("doc_id").orderBy(col("_ll").desc(), "_src")
    best = scored.withColumn("_rk", F.row_number().over(w))
    own = (best.where(col("_src") == col("source"))
           .select("doc_id", "source", col("_ll").alias("_own")))
    # LEFT join on best_other: a single-source corpus has no "other
    # source" — margin is NULL (no signal), never a dropped row.
    other = (best.where(col("_src") != col("source"))
             .groupBy("doc_id").agg(F.max("_ll").alias("_best_other")))
    pred = best.where(col("_rk") == 1).select(
        "doc_id", col("_src").alias("pred_source"))
    return (own.join(pred, "doc_id").join(other, "doc_id", "left")
            .select("doc_id", "source", "pred_source",
                    F.round((col("_own") - col("_best_other"))
                            .cast("double"), round_dp).alias("margin")))


def source_outlier_oracle_sql(table: str = "documents",
                              round_dp: int = 4) -> str:
    """DuckDB twin of source_outlier_score — same tokenization, same
    add-1 smoothing, same 1e-9 round + DECIMAL(30,9) exact sums, same
    alphabetical tie-break."""
    return f"""
    WITH tok0 AS (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS t
                  FROM {table}),
    tok AS (SELECT * FROM tok0 WHERE t <> ''),
    vsz AS (SELECT count(DISTINCT t) AS V FROM tok),
    cstats AS (SELECT source, t, count(*) AS c
               FROM tok GROUP BY source, t),
    -- "tc", not "T": DuckDB (like Spark) resolves identifiers
    -- case-insensitively, and "T" would collide with the token
    -- column t in the cstats join.
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tc
            FROM cstats GROUP BY source),
    logp AS (SELECT source, t,
                    round(ln((c + 1) / CAST(tc + (SELECT V FROM vsz)
                                            AS DOUBLE)), 9) AS lp
             FROM cstats JOIN tot USING (source)),
    dflt AS (SELECT source,
                    round(ln(1.0 / CAST(tc + (SELECT V FROM vsz)
                                        AS DOUBLE)), 9) AS dlp
             FROM tot),
    scored0 AS (
        SELECT k.doc_id, d.source AS src,
               sum(CAST(coalesce(lp.lp, d.dlp) AS DECIMAL(30,9)))
                   AS ll
        FROM (SELECT doc_id, t FROM tok) k
        CROSS JOIN dflt d
        LEFT JOIN logp lp ON lp.source = d.source AND lp.t = k.t
        GROUP BY k.doc_id, d.source),
    -- Complete per-doc grid: token-less docs keep a row (empty sum =
    -- 0 log-likelihood under every source), never vanish.
    scored AS (
        SELECT g.doc_id, g.source, g.src,
               coalesce(s0.ll, CAST(0 AS DECIMAL(30,9))) AS ll
        FROM (SELECT d.doc_id, d.source, f.source AS src
              FROM {table} d CROSS JOIN dflt f) g
        LEFT JOIN scored0 s0
          ON s0.doc_id = g.doc_id AND s0.src = g.src),
    pred AS (SELECT doc_id, src AS pred_source FROM (
                 SELECT doc_id, src,
                        row_number() OVER (PARTITION BY doc_id
                            ORDER BY ll DESC, src) AS rk
                 FROM scored) WHERE rk = 1),
    own AS (SELECT doc_id, source, ll AS own_ll
            FROM scored WHERE src = source),
    other AS (SELECT doc_id, max(ll) AS best_other
              FROM scored WHERE src <> source GROUP BY doc_id)
    -- LEFT JOIN other: a single-source corpus has no other source —
    -- margin NULL, never a dropped row.
    SELECT own.doc_id, own.source, pred.pred_source,
           round(CAST(own.own_ll - other.best_other AS DOUBLE),
                 {round_dp}) AS margin
    FROM own JOIN pred USING (doc_id) LEFT JOIN other USING (doc_id)
    """


def length_vocab_corr(documents: DataFrame) -> DataFrame:
    """Per-source Pearson correlation between document length (tokens)
    and vocabulary size (distinct tokens) — the Heaps'-law audit: a
    source whose type-token relationship is an outlier (near-1.0 =
    no repetition = likely templated/synthetic; unusually low =
    heavy boilerplate) gets flagged before it enters the mixture.

    Parity discipline: x and y are exact integers per doc, all five
    sufficient statistics are exact BIGINT sums, and the correlation
    is ONE double expression over them (spelled token-for-token in the
    SQL twin), rounded at 6dp — zero cross-engine accumulation
    surface.  Zero-variance / single-doc sources return NULL via the
    same CASE guard in both engines.

    Scale shape: one narrow map over documents, one map-side-combined
    groupBy(source) — linear, |sources|-row output."""
    from pyspark.sql.functions import col

    from data_ingestion_challenge_spark.functions import text as T

    w = T.words(col("text"))
    per_doc = documents.select(
        "source",
        F.size(w).cast("bigint").alias("x"),
        F.size(F.array_distinct(w)).cast("bigint").alias("y"))
    s = (per_doc.groupBy("source")
         .agg(F.count("*").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(col("x") * col("x")).alias("sxx"),
              F.sum(col("y") * col("y")).alias("syy"),
              F.sum(col("x") * col("y")).alias("sxy")))
    vx = 1.0 * col("n") * col("sxx") - 1.0 * col("sx") * col("sx")
    vy = 1.0 * col("n") * col("syy") - 1.0 * col("sy") * col("sy")
    r = ((1.0 * col("n") * col("sxy") - 1.0 * col("sx") * col("sy"))
         / F.sqrt(vx * vy))
    return s.select(
        "source", col("n").alias("n_docs"),
        F.when((vx > 0) & (vy > 0), F.round(r, 6))
        .otherwise(F.lit(None).cast("double")).alias("corr_len_vocab"))


LENGTH_VOCAB_CORR_ORACLE = """
    WITH per_doc AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
               CAST(len(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS y
        FROM documents),
    s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM per_doc GROUP BY source)
    SELECT source, n AS n_docs,
           CASE WHEN (1.0 * n * sxx - 1.0 * sx * sx) > 0
                 AND (1.0 * n * syy - 1.0 * sy * sy) > 0
                THEN round((1.0 * n * sxy - 1.0 * sx * sy)
                           / sqrt((1.0 * n * sxx - 1.0 * sx * sx)
                                  * (1.0 * n * syy - 1.0 * sy * sy)),
                           6)
                ELSE NULL END AS corr_len_vocab
    FROM s
"""


def source_token_kl(documents: DataFrame) -> DataFrame:
    """Per-source KL divergence (bits) of the source's unigram token
    distribution from the corpus distribution — the mixture-design
    "how idiosyncratic is this source" number: ~0 means the source
    reads like the corpus average; a large value flags a domain all
    its own (code, legalese, another register) that deserves its own
    mixture weight rather than being averaged away.

    KL(P_s ‖ P) = Σ_t (c_st/N_s) · (log2(c_st/N_s) − log2(c_t/N))
    with every count exact BIGINT.  Terms with c_st = 0 contribute 0
    and P_s ≪ P by construction (a source's token is in the corpus),
    so the sum is always finite.  Parity discipline: each term is one
    double expression over exact integers, rounded to 1e-9 and summed
    as DECIMAL(30,9) (the repo's exact-sum pattern — summation-order
    independent in both engines); final value rounds at 6dp.  The
    only cross-engine surface is IEEE log2 on identical doubles (the
    accepted lang_id risk class).

    Scale shape: one map-side-combined groupBy(source, token)
    (vocab×|sources| rows); corpus counts DERIVE from it (never a
    second corpus pass); the per-source and corpus totals are
    |sources|-row and 1-row broadcast aggregates; the term stream is
    vocab×|sources|-sized with partial aggregation onto source."""
    from pyspark.sql.functions import col

    tok = (documents.select(
        "source", F.explode(F.split(col("text"), " ")).alias("t"))
        .where(col("t") != ""))
    cs = tok.groupBy("source", "t").agg(
        F.count("*").cast("bigint").alias("c"))
    ns = cs.groupBy("source").agg(F.sum("c").alias("nsum"))
    ct = cs.groupBy("t").agg(F.sum("c").alias("ctot"))
    nn = ns.agg(F.sum("nsum").alias("ntot"))
    term = F.round(
        (col("c") / col("nsum"))
        * (F.log2(col("c") / col("nsum"))
           - F.log2(col("ctot") / col("ntot"))),
        9).cast("decimal(30,9)")
    return (cs.join(F.broadcast(ns), "source").join(ct, "t")
            .crossJoin(F.broadcast(nn))
            .groupBy("source", "nsum")
            .agg(F.sum(term).alias("_kl"))
            .select("source", col("nsum").alias("n_tokens"),
                    F.round(col("_kl").cast("double"), 6)
                    .alias("kl_bits")))


SOURCE_TOKEN_KL_ORACLE = """
    WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    tk AS (SELECT source, t FROM tok WHERE t <> ''),
    cs AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
           FROM tk GROUP BY source, t),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS nsum
           FROM cs GROUP BY source),
    ct AS (SELECT t, CAST(sum(c) AS BIGINT) AS ctot
           FROM cs GROUP BY t),
    nn AS (SELECT CAST(sum(nsum) AS BIGINT) AS ntot FROM ns),
    terms AS (
        SELECT cs.source, ns.nsum,
               CAST(round((cs.c / ns.nsum)
                          * (log2(cs.c / ns.nsum)
                             - log2(ct.ctot / nn.ntot)), 9)
                    AS DECIMAL(30,9)) AS term
        FROM cs JOIN ns USING (source) JOIN ct USING (t)
        CROSS JOIN nn)
    SELECT source, nsum AS n_tokens,
           round(CAST(sum(term) AS DOUBLE), 6) AS kl_bits
    FROM terms GROUP BY source, nsum
"""


def lang_confusion_matrix(documents: DataFrame) -> DataFrame:
    """Declared-vs-predicted language confusion rollup: run the
    char-bigram classifier (lang_id) over the corpus and count docs
    per (declared lang, predicted_lang) cell — the calibration audit
    a curation pipeline reads before trusting EITHER label source
    (a hot off-diagonal cell means one of them is systematically
    wrong for that pair; doc_lang_mismatch_audit lists the rows, this
    prices the pattern).  Cost shape: the classifier's one Arrow pass
    plus a cells-sized groupBy — |langs|² output, never doc-sized."""
    pred = lang_id(documents).select("doc_id", "predicted_lang")
    return (documents.select("doc_id", "lang").join(pred, "doc_id")
            .groupBy("lang", "predicted_lang")
            .agg(F.count("*").cast("long").alias("n_docs")))


def lang_confusion_oracle_sql() -> str:
    """DuckDB twin: the lang_id oracle CTE joined back to the
    declared labels and rolled up."""
    inner = lang_id_oracle_sql()
    return f"""
    WITH pred AS ({inner})
    SELECT d.lang, p.predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.predicted_lang
    """


def source_quality_percentiles(documents: DataFrame) -> DataFrame:
    """Per-source quality-score distribution: exact interpolated
    p25/p50/p75 of the stopword ratio plus the mean keep_flag rate —
    the per-provider quality contract a mixture designer reads before
    weighting sources (one bad provider drags the tail, not the
    mean).  Scores are rounded at 4dp BEFORE the percentile so both
    engines interpolate over identical grids; Spark `percentile` ==
    DuckDB quantile_cont semantics (same contract as
    order_value_percentiles)."""
    from pyspark.sql.functions import lit

    from data_ingestion_challenge_spark.functions import text as T

    d = documents.select(
        "source", "n_chars", T.words(col("text")).alias("w"))
    n_tokens = F.size(col("w"))
    scored = d.select(
        "source",
        F.round(T.stopword_count(col("w")) / n_tokens, 4)
        .alias("stop_ratio"),
        F.when(col("n_chars").between(100, 20000) & (n_tokens >= 10),
               1).otherwise(0).alias("keep_flag"))
    return (scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.percentile("stop_ratio", lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("stop_ratio", lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("stop_ratio", lit(0.75)), 4).alias("p75"),
        F.round(F.avg("keep_flag"), 4).alias("keep_rate")))


SOURCE_QUALITY_PCTL_ORACLE = """
    WITH t AS (SELECT source,
                      round(len(list_filter(string_split(text, ' '),
                            x -> x IN ('the','a','of','and','in','to')))
                            / len(string_split(text, ' ')), 4)
                          AS stop_ratio,
                      CASE WHEN n_chars BETWEEN 100 AND 20000
                                AND len(string_split(text, ' ')) >= 10
                           THEN 1 ELSE 0 END AS keep_flag
               FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(stop_ratio, 0.25), 4) AS p25,
           round(quantile_cont(stop_ratio, 0.5), 4) AS p50,
           round(quantile_cont(stop_ratio, 0.75), 4) AS p75,
           round(avg(keep_flag), 4) AS keep_rate
    FROM t GROUP BY source
"""


def vocab_coverage_curve(documents: DataFrame,
                         ks: tuple = (100, 1000, 10000)) -> DataFrame:
    """Cumulative token-frequency coverage at vocabulary cutoffs: for
    each k, the share of ALL token occurrences covered by the top-k
    tokens (frequency desc, token asc ties) — the curve that decides
    tokenizer vocab size and prices OOV ahead of training (Zipf says
    the head covers most of the mass; this measures how much, on THIS
    corpus).  If the corpus vocabulary V < k the row reports full
    coverage at rank V.

    Scale shape: one doc-sized tokenize+groupBy to vocab-sized
    counts, then orderBy().limit(max k) — TakeOrderedAndProject, the
    top-k family plan — with the cumulative window over ≤ max-k rows
    and the total-occurrence scalar broadcast via a 1-row crossJoin.
    Nothing data-sized is globally sorted."""
    from data_ingestion_challenge_spark.functions import text as T

    freq = (documents
            .select(F.explode(T.words(col("text"))).alias("t"))
            .groupBy("t").agg(F.count("*").alias("c")))
    total = freq.agg(F.sum("c").alias("_total"),
                     F.count("*").alias("_vocab"))
    top = (freq.orderBy(col("c").desc(), col("t"))
           .limit(max(ks)))
    w = (Window.orderBy(col("c").desc(), col("t"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (top
              .withColumn("_rank", F.row_number().over(
                  Window.orderBy(col("c").desc(), col("t"))))
              .withColumn("_cum", F.sum("c").over(w))
              .crossJoin(F.broadcast(total)))
    kdf = ranked.sparkSession.createDataFrame(
        [(k,) for k in ks], "k int")
    return (ranked.join(
        F.broadcast(kdf),
        col("_rank") == F.least(col("k"), col("_vocab")))
        .select("k", col("_rank").alias("rank_at"),
                F.round(col("_cum") / col("_total"), 6)
                .alias("coverage")))


def vocab_coverage_oracle_sql(ks: tuple = (100, 1000, 10000)) -> str:
    kvals = ", ".join(f"({k})" for k in ks)
    return f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                 FROM documents),
    freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok
             GROUP BY t),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS vocab FROM freq),
    r AS (SELECT c,
                 row_number() OVER (ORDER BY c DESC, t) AS rnk,
                 sum(c) OVER (ORDER BY c DESC, t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM freq),
    ks(k) AS (VALUES {kvals})
    SELECT ks.k, CAST(r.rnk AS INT) AS rank_at,
           round(r.cum / tot.total, 6) AS coverage
    FROM ks CROSS JOIN tot
    JOIN r ON r.rnk = least(ks.k, tot.vocab)
    """


def token_length_histogram(documents: DataFrame) -> DataFrame:
    """Corpus token-length profile: (tok_len, n_tokens, n_distinct) —
    the tokenizer/vocab design table (BPE vocab sizing starts here):
    a heavy long-length tail flags unsegmented scripts / URLs /
    base64 blobs that blow up fertility, and a wide
    occurrences-vs-distinct gap at a length flags templated spam.

    Exact integers end to end (count + count distinct per length).
    Scale shape: tokenize-explode (linear) → ONE groupBy(length)
    with a distinct-count expand — ≤ ~100 output rows; the distinct
    aggregation shuffles (length, token), bounded by the corpus
    VOCAB size, not its token count."""
    from data_ingestion_challenge_spark.functions import text as T

    tok = (documents
           .select(F.explode(T.words(col("text"))).alias("w"))
           .where(col("w") != ""))
    return (tok.groupBy(F.length("w").alias("tok_len"))
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("w").alias("n_distinct")))


TOKEN_LENGTH_HISTOGRAM_ORACLE = """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
                 FROM documents)
    SELECT CAST(length(w) AS INT) AS tok_len,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_distinct
    FROM tok WHERE w <> '' GROUP BY 1
"""


# ---------------------------------------- encoding audit (r15 pool)


def ascii_ratio_by_lang(documents: DataFrame) -> DataFrame:
    """Per-language printable-ASCII share audit — the encoding-rot
    detector (mojibake, binary bleed-through, wrong-charset scrapes
    show up as a falling ratio long before they poison a tokenizer).
    Per-doc ratio = printable-ASCII chars / chars, rounded 1e-4 (the
    repo's cross-engine ratio grid), then per-lang mean as an exact
    DECIMAL sum of the rounded terms with ONE double divide, plus the
    min (the worst offender) — both engine-portable.  The char class
    is spelled [ -~] (space through tilde): identical semantics in
    Java regex and RE2, no hex-escape dialect risk.  One linear scan,
    |langs| output rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    ratio = F.round(
        F.length(F.regexp_replace(col("text"), "[^ -~]", ""))
        / F.length(col("text")), 4)
    per_doc = documents.where(F.length("text") > 0).select(
        "lang", ratio.alias("_r"))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.sum(col("_r").cast("decimal(30,6)"))
                         .cast("double") / F.count("*"), 6)
                 .alias("mean_ascii_ratio"),
                 F.min("_r").alias("min_ascii_ratio")))


ASCII_RATIO_BY_LANG_ORACLE = """
    WITH t AS (SELECT lang,
                      round(length(regexp_replace(text, '[^ -~]', '',
                                                  'g'))
                            / length(text), 4) AS r
               FROM documents WHERE length(text) > 0)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(r AS DECIMAL(30,6))) AS DOUBLE)
                 / count(*), 6) AS mean_ascii_ratio,
           min(r) AS min_ascii_ratio
    FROM t GROUP BY lang
"""


def uppercase_ratio_by_source(documents: DataFrame) -> DataFrame:
    """SHOUTING audit per source: the share of A-Z characters in all
    text bytes — high caps ratio flags boilerplate banners, scraped
    navigation, and OCR noise the quality battery's length/punct
    ratios miss; read next to doc_quality before setting per-source
    sampling weights.

    Exact integer character counts on both engines (regexp strip +
    length), ONE double divide rounded 6dp.  Scale shape: one scan,
    two Catalyst string expressions, map-side-combined groupBy to a
    sources-sized output."""
    upper = F.length(F.regexp_replace(col("text"), "[^A-Z]", ""))
    total = F.length(col("text"))
    return (documents
            .groupBy("source")
            .agg(F.sum(upper.cast("bigint")).alias("n_upper"),
                 F.sum(total.cast("bigint")).alias("n_chars_total"))
            .withColumn("upper_ratio",
                        F.round(col("n_upper").cast("double")
                                / col("n_chars_total"), 6)))


UPPERCASE_RATIO_BY_SOURCE_ORACLE = """
    WITH g AS (
        SELECT source,
               CAST(sum(length(regexp_replace(text, '[^A-Z]', '',
                                              'g'))) AS BIGINT)
                   AS n_upper,
               CAST(sum(length(text)) AS BIGINT) AS n_chars_total
        FROM documents GROUP BY source)
    SELECT source, n_upper, n_chars_total,
           round(CAST(n_upper AS DOUBLE) / n_chars_total, 6)
               AS upper_ratio
    FROM g
"""


def ttr_percentiles_by_source(documents: DataFrame) -> DataFrame:
    """Per-source type-token-ratio distribution: exact interpolated
    p10/p50/p90 of each doc's distinct-tokens/tokens ratio — the
    repetitiveness profile behind length_vocab_corr's single summary
    number (a low p10 tail flags template/boilerplate pockets inside
    an otherwise healthy source; a p90 near 1.0 at length says
    synthetic text).  Per-doc TTR is ONE double divide over exact
    integer counts (identical IEEE both engines); the percentile is
    Spark `percentile` == DuckDB quantile_cont interpolation (the
    order_value_percentiles precedent), 6dp.  Scale shape: one
    narrow map over documents, one percentile shuffle per source,
    |sources| output rows."""
    from pyspark.sql.functions import col, lit

    from data_ingestion_challenge_spark.functions import text as T

    w = T.words(col("text"))
    per_doc = documents.select(
        "source",
        (1.0 * F.size(F.array_distinct(w)) / F.size(w)).alias("ttr"))
    return (per_doc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.percentile("ttr", lit(0.1)), 6)
                 .alias("p10_ttr"),
                 F.round(F.percentile("ttr", lit(0.5)), 6)
                 .alias("p50_ttr"),
                 F.round(F.percentile("ttr", lit(0.9)), 6)
                 .alias("p90_ttr")))


TTR_PERCENTILES_BY_SOURCE_ORACLE = """
    WITH per_doc AS (
        SELECT source,
               1.0 * len(list_distinct(string_split(text, ' ')))
                   / len(string_split(text, ' ')) AS ttr
        FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(ttr, 0.1), 6) AS p10_ttr,
           round(quantile_cont(ttr, 0.5), 6) AS p50_ttr,
           round(quantile_cont(ttr, 0.9), 6) AS p90_ttr
    FROM per_doc GROUP BY source
"""


def digit_ratio_by_source(documents: DataFrame) -> DataFrame:
    """Numeric-noise audit per source: the share of 0-9 characters in
    all text bytes, plus how many docs are digit-HEAVY (>10 % digits)
    — tables, serial dumps, price scrapes, and log spam carry digit
    densities prose never reaches, so a source whose heavy-doc count
    grows is drifting away from trainable text; read next to
    uppercase_ratio_by_source before setting sampling weights.

    Exact integer character counts (regexp strip + length); the
    heavy-doc test is the INTEGER comparison 10·digits > chars, so no
    float ever decides membership cross-engine; the ratio is ONE
    double divide rounded 6dp.  Scale shape: one scan, two Catalyst
    string expressions, map-side-combined groupBy to a sources-sized
    output."""
    digits = F.length(F.regexp_replace(col("text"), "[^0-9]", ""))
    total = F.length(col("text"))
    return (documents
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(digits.cast("bigint")).alias("n_digits"),
                 F.sum(total.cast("bigint")).alias("n_chars_total"),
                 F.count_if(digits.cast("bigint") * 10
                            > total.cast("bigint"))
                 .alias("n_digit_heavy"))
            .withColumn("digit_ratio",
                        F.round(col("n_digits").cast("double")
                                / col("n_chars_total"), 6)))


DIGIT_RATIO_BY_SOURCE_ORACLE = """
    WITH t AS (
        SELECT source,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS d,
               CAST(length(text) AS BIGINT) AS c
        FROM documents),
    g AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(d) AS BIGINT) AS n_digits,
               CAST(sum(c) AS BIGINT) AS n_chars_total,
               CAST(count(*) FILTER (d * 10 > c) AS BIGINT)
                   AS n_digit_heavy
        FROM t GROUP BY source)
    SELECT source, n_docs, n_digits, n_chars_total, n_digit_heavy,
           round(CAST(n_digits AS DOUBLE) / n_chars_total, 6)
               AS digit_ratio
    FROM g
"""


# ------------------------------------------------- r23 pool


_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"


def doc_web_artifacts(documents: DataFrame) -> DataFrame:
    """Web-artifact density per source: docs carrying URLs / email
    addresses and the URL occurrences per doc — the
    scrape-cleanliness audit read next to pii_redaction_audit (a
    source whose email density jumps needs the PII pass re-run; a
    URL-dense source is navigation boilerplate the quality filters
    under-penalize).

    Parity: the URL probe is a plain substring contains ('http://'
    or 'https://'); the email probe and the occurrence count share
    ONE regex literal evaluated on lowercased text in both engines
    (the character-class subset of Java and RE2 that agrees).  All
    counts exact BIGINTs; the density is ONE 6dp divide.  Scale
    shape: one linear scan, map-side-combined groupBy to |sources|
    rows."""
    has_url = (col("text").contains("http://")
               | col("text").contains("https://")).cast("long")
    has_email = F.lower(col("text")).rlike(_EMAIL_RE).cast("long")
    n_urls = F.regexp_count(col("text"), F.lit("https?://"))
    return (documents
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(has_url).alias("docs_with_url"),
                 F.sum(has_email).alias("docs_with_email"),
                 F.sum(n_urls).alias("n_urls"))
            .withColumn("urls_per_doc",
                        F.round(col("n_urls") / col("n_docs"), 6)))


DOC_WEB_ARTIFACTS_ORACLE = f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN contains(text, 'http://')
                          OR contains(text, 'https://')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_url,
           CAST(sum(CASE WHEN regexp_matches(lower(text),
                                             '{_EMAIL_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_email,
           CAST(sum(len(regexp_extract_all(text, 'https?://')))
                AS BIGINT) AS n_urls,
           round(CAST(sum(len(regexp_extract_all(text, 'https?://')))
                      AS DOUBLE) / count(*), 6) AS urls_per_doc
    FROM documents GROUP BY source
"""
