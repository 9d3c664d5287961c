"""LLM-training-data pipeline, batch 6 (SURVEY.md §2C): tokenizer
vocabulary coverage, corpus Zipf fit, per-source duplication report,
and embedding-space label-centroid drift.

Parity notes: vocabulary cut-offs and top-k fits use deterministic
(count DESC, token ASC) tie-breaks in both engines; the centroid drift
op quantizes embedding elements to integer micros FIRST so every
cross-row sum is exact integer/decimal arithmetic — the only floating
point is the final fixed-order norm/ratio expression, identical in
both engines (the msum() trick applied to vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ vocabulary coverage

@query(
    "doc_vocab_coverage",
    # Tokenizer-coverage audit: share of each doc's token OCCURRENCES
    # inside the corpus top-16 vocabulary — the "how much of this doc
    # would an in-domain tokenizer represent without <unk> fallbacks"
    # signal curation reads before fixing a vocab.  Cut-off tie-break
    # is (count DESC, token ASC) in both engines.
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    v AS (SELECT token FROM c ORDER BY cnt DESC, token LIMIT 16),
    tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
    cov AS (SELECT t.doc_id, count(*) AS n_covered
            FROM tok t JOIN v USING (token) GROUP BY t.doc_id)
    SELECT tot.doc_id, tot.n_tokens,
           coalesce(cov.n_covered, 0) AS n_covered,
           round(coalesce(cov.n_covered, 0) / tot.n_tokens::DOUBLE, 4)
               AS coverage
    FROM tot LEFT JOIN cov ON tot.doc_id = cov.doc_id
    """,
)
def doc_vocab_coverage(cat: Catalog) -> DataFrame:
    """The vocabulary is |V|-bounded (top 16 here; the synthetic
    corpus holds only 31 distinct tokens at every SF, so a realistic
    32k cut would cover every doc trivially — 16 keeps the gate
    discriminative) → broadcast to the
    coverage join; the token explode partial-aggregates map-side for
    both the global counts and the per-doc totals.  At 100 TB: one
    corpus scan for the vocab (amortizable across audits), one for
    the per-doc shares — never a doc×vocab shuffle."""
    tok = cat.documents.select(
        "doc_id", F.explode(F.split(col("text"), " ")).alias("token"))
    vocab = (tok.groupBy("token").agg(F.count("*").alias("cnt"))
             .orderBy(col("cnt").desc(), "token").limit(16)
             .select("token"))
    tot = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    cov = (tok.join(broadcast(vocab), "token")
           .groupBy("doc_id").agg(F.count("*").alias("n_covered")))
    return (tot.join(cov, "doc_id", "left")
            .select("doc_id", "n_tokens",
                    F.coalesce(col("n_covered"), F.lit(0))
                    .alias("n_covered"),
                    F.round(F.coalesce(col("n_covered"), F.lit(0))
                            / col("n_tokens").cast("double"), 4)
                    .alias("coverage")))


# ------------------------------------------------ Zipf fit

@query(
    "corpus_zipf_slope",
    # OLS fit of ln(count) ~ ln(rank) over the top-100 tokens — the
    # Zipf exponent a natural corpus keeps near -1; a synthetic or
    # boilerplate-heavy corpus bends it.  The fit runs over exactly
    # 100 (x, y) points with a deterministic rank order, so both
    # engines sum the same tiny series; 4dp rounding absorbs ulp
    # order differences.
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token)
                     AS rank
          FROM c),
    pts AS (SELECT ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y
            FROM r WHERE rank <= 100),
    agg AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM pts)
    SELECT CAST(n AS BIGINT) AS n_tokens_fit,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 4) AS intercept
    FROM agg
    """,
)
def corpus_zipf_slope(cat: Catalog) -> DataFrame:
    """Heavy lifting is the token count (map-side partial agg); the
    fit itself runs over 100 rows — a driver-sized regression kept
    distributed only to stay in one plan."""
    tok = cat.documents.select(
        F.explode(F.split(col("text"), " ")).alias("token"))
    c = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    top = (c.orderBy(col("cnt").desc(), "token").limit(100)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(col("cnt").desc(), "token"))))
    pts = top.select(F.log(col("rank").cast("double")).alias("x"),
                     F.log(col("cnt").cast("double")).alias("y"))
    agg = pts.agg(F.count("*").cast("double").alias("n"),
                  F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                  F.sum(col("x") * col("y")).alias("sxy"),
                  F.sum(col("x") * col("x")).alias("sxx"))
    slope = ((col("n") * col("sxy") - col("sx") * col("sy"))
             / (col("n") * col("sxx") - col("sx") * col("sx")))
    return agg.select(
        col("n").cast("bigint").alias("n_tokens_fit"),
        F.round(slope, 4).alias("slope"),
        F.round((col("sy") - slope * col("sx")) / col("n"), 4)
        .alias("intercept"))


# ------------------------------------------------ per-source dup report

@query(
    "dup_ratio_by_source",
    # The curation dashboard's "which source is flooding us with
    # copies" rollup: per source, docs vs distinct texts and the dup
    # share — what per_source_cap and the dedup keep-list are tuned
    # from.
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique_texts,
           round(1 - count(DISTINCT md5(text)) / count(*)::DOUBLE, 4)
               AS dup_share
    FROM documents GROUP BY source
    """,
)
def dup_ratio_by_source(cat: Catalog) -> DataFrame:
    """One shuffle on source; the distinct rides the same aggregate
    (Spark expands it to a two-phase agg keyed on (source, hash) —
    partial map-side collapse, no doc×doc comparison)."""
    return (cat.documents
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct(F.md5(col("text")))
                 .alias("n_unique_texts"),
                 F.round(F.lit(1)
                         - F.countDistinct(F.md5(col("text")))
                         / F.count("*").cast("double"), 4)
                 .alias("dup_share")))


# ------------------------------------------------ centroid drift

_MU = 1_000_000  # element quantization: micros


@query(
    "label_centroid_drift",
    # Embedding-space drift audit: per label, the cosine between the
    # label's centroid and the GLOBAL centroid plus the centroid's L2
    # norm — the "is this class collapsing toward the mean /
    # drifting off" check an embedding pipeline runs per snapshot.
    # EXACT cross-engine parity: elements quantize to integer micros
    # first (same round+cast both engines), every cross-row sum is
    # integer, every cross-dim product/sum is DECIMAL(38,0) — the
    # only floats are the final fixed-order sqrt/ratio expressions.
    oracle=f"""
    WITH el AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_MU})
                    AS BIGINT) AS q
        FROM embeddings
    ),
    lab AS (SELECT label, pos, CAST(sum(q) AS DECIMAL(18,0)) AS s
            FROM el GROUP BY label, pos),
    nv AS (SELECT label, count(*) AS n_vecs
           FROM embeddings GROUP BY label),
    cg AS (SELECT pos, CAST(sum(s) AS DECIMAL(18,0)) AS g
             FROM lab GROUP BY pos),
    dots AS (
        SELECT l.label,
               CAST(sum(l.s * g.g) AS DOUBLE) AS dot_lg,
               CAST(sum(l.s * l.s) AS DOUBLE) AS na,
               CAST(min(t.nb) AS DOUBLE) AS nb
        FROM lab l
        JOIN cg g ON l.pos = g.pos
        CROSS JOIN (SELECT CAST(sum(g * g) AS DECIMAL(38,0)) AS nb
                    FROM cg) t
        GROUP BY l.label
    )
    SELECT d.label, nv.n_vecs,
           round(d.dot_lg / (sqrt(d.na) * sqrt(d.nb)), 6)
               AS cos_to_global,
           round(sqrt(d.na) / (nv.n_vecs * {_MU}.0), 6)
               AS centroid_l2
    FROM dots d JOIN nv ON d.label = nv.label
    """,
)
def label_centroid_drift(cat: Catalog) -> DataFrame:
    """Scale shape: posexplode is a narrow map (64 rows/vector);
    per-(label, pos) sums partial-aggregate map-side to ≤ |labels|·64
    rows — the whole drift computation after the first aggregate
    touches KBs regardless of corpus size, and the global centroid
    derives from the label sums (no second corpus scan)."""
    el = (cat.embeddings
          .select("label", F.posexplode(col("embedding"))
                  .alias("pos", "e"))
          .select("label", (col("pos") + 1).alias("pos"),
                  F.round(col("e").cast("double") * _MU)
                  .cast("bigint").alias("q")))
    lab = (el.groupBy("label", "pos")
           .agg(F.sum("q").cast("decimal(18,0)").alias("s")))
    nv = cat.embeddings.groupBy("label").agg(
        F.count("*").alias("n_vecs"))
    glob = lab.groupBy("pos").agg(
        F.sum("s").cast("decimal(18,0)").alias("g"))
    nb = glob.agg(F.sum(col("g") * col("g"))
                  .cast("decimal(38,0)").alias("nb"))
    dots = (lab.join(broadcast(glob), "pos")
            .crossJoin(broadcast(nb))
            .groupBy("label")
            .agg(F.sum(col("s") * col("g")).cast("double")
                 .alias("dot_lg"),
                 F.sum(col("s") * col("s")).cast("double").alias("na"),
                 F.min("nb").cast("double").alias("nb")))
    return (dots.join(broadcast(nv), "label")
            .select("label", "n_vecs",
                    F.round(col("dot_lg")
                            / (F.sqrt(col("na")) * F.sqrt(col("nb"))),
                            6).alias("cos_to_global"),
                    F.round(F.sqrt(col("na"))
                            / (col("n_vecs") * F.lit(float(_MU))), 6)
                    .alias("centroid_l2")))
