"""LLM-training-data pipeline queries (SURVEY.md §2C): dedup family,
similarity search, text analysis, multimodal plumbing.

Oracle strategy: all hashing is md5-derived integer arithmetic
(functions/hashing.py), so even the MinHash+LSH pipeline has an exact
DuckDB oracle — the SQL below reproduces signatures, band keys and
candidate generation bit-for-bit.  Since round 2 the same holds for
every "approx" op: model constants (simhash h32 bits, LSH planes, IVF
seed centroids, the lang-id profile matrix) embed as SQL literals for
exact replay, and the iterative trainers gate on recall instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.functions import text as T
from data_ingestion_challenge_spark.functions.hashing import MINHASH_P, minhash_params
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import multimodal as M
from data_ingestion_challenge_spark.operators import similarity as S
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.registry import query

# ---------------------------------------------------------------- dedup

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, count(*) AS dup_count,
           min(doc_id) AS keep_doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(cat: Catalog) -> DataFrame:
    return D.exact_dedup(cat.documents)


# The persisted shingle posting table is the shared input of the
# Jaccard / MinHash / SimHash pipelines — at cluster scale you
# materialize it ONCE (checkpoint/table) and fan the dedup variants out
# from it.  Cache per (application, sf_dir): one split+explode+distinct
# instead of three when several dedup queries run in one session.
# Keyed by applicationId (stable; id(spark) can be re-used after GC)
# and bounded: beyond _POSTING_CACHE_MAX entries the oldest is
# unpersisted and evicted, so executor storage can't leak across many
# Engine instances in a long-lived application.
_POSTING_CACHE: dict = {}
_POSTING_CACHE_MAX = 6


def _cache_shared(cat: Catalog, tag, build):
    key = (cat.spark.sparkContext.applicationId, cat.sf_dir, tag)
    if key not in _POSTING_CACHE:
        while len(_POSTING_CACHE) >= _POSTING_CACHE_MAX:
            old = _POSTING_CACHE.pop(next(iter(_POSTING_CACHE)))
            try:
                old.unpersist()
            except Exception:
                pass  # its session may already be stopped
        _POSTING_CACHE[key] = build()
    return _POSTING_CACHE[key]


def _shared_postings(cat: Catalog, n: int = 3):
    # _postings persists internally, so the cache just keys the handle.
    return _cache_shared(cat, n, lambda: D._postings(cat.documents, n))


def _shared_winnow(cat: Catalog, n: int = 3, w: int = 4):
    """Winnowing fingerprint table, persisted and shared exactly like
    the shingle postings: doc_winnow_fingerprints, doc_containment and
    decontaminate_substring each branch from it multiple times per
    plan — without the persist every branch re-runs the whole
    postings→hash→window-min pipeline (their shuffles differ, so
    ReusedExchange can't save them)."""
    return _cache_shared(
        cat, ("winnow", n, w),
        lambda: D.winnow_fingerprints(cat.documents, n=n, w=w).persist())


def clear_posting_cache(app_id: str | None = None,
                        sf_dir: str | None = None) -> None:
    """Unpersist and evict cached posting tables.  With no arguments,
    everything; with app_id/sf_dir, only matching keys — Engine.close
    passes both so one engine's close never evicts a sibling engine's
    cache in a shared application."""
    doomed = [k for k in _POSTING_CACHE
              if (app_id is None or k[0] == app_id)
              and (sf_dir is None or k[1] == sf_dir)]
    for k in doomed:
        try:
            _POSTING_CACHE[k].unpersist()
        except Exception:
            pass
        del _POSTING_CACHE[k]


# Shared DuckDB CTE: distinct word-3-gram shingles per doc.
_SH_CTE = """
    d AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                      range(1, greatest(len(w) - 1, 1)),
                      i -> array_to_string(w[i:i+2], ' ')))) AS s
           FROM d),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

_JACCARD_TAIL = """
    inter AS (SELECT doc_a, doc_b, count(*) AS ic
              FROM cand
              JOIN sh a ON a.doc_id = doc_a
              JOIN sh b ON b.doc_id = doc_b AND a.s = b.s
              GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           round(ic / (sa.n + sb.n - ic), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ic / (sa.n + sb.n - ic) >= {tau}
"""


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SH_CTE},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id),
    {_JACCARD_TAIL.format(tau=0.8)}
    """,
    bench=True,
)
def dedup_ngram_jaccard(cat: Catalog) -> DataFrame:
    return D.ngram_jaccard_pairs(cat.documents, n=3, tau=0.8,
                                 posting=_shared_postings(cat))


_MH_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(16)))

@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SH_CTE},
    hs AS (SELECT doc_id, s,
                  ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
           FROM sh),
    params(i, a, b) AS (VALUES {_MH_VALUES}),
    sig AS (SELECT doc_id, p.i,
                   min((p.a * h + p.b) % {MINHASH_P}) AS m
            FROM hs CROSS JOIN params p GROUP BY doc_id, p.i),
    band AS (SELECT doc_id, i // 2 AS bi,
                    string_agg(m, ':' ORDER BY i) AS bkey
             FROM sig GROUP BY doc_id, i // 2),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM band x JOIN band y
               ON x.bi = y.bi AND x.bkey = y.bkey
              AND x.doc_id < y.doc_id),
    {_JACCARD_TAIL.format(tau=0.8)}
    """,
    bench=True,
)
def dedup_minhash_lsh(cat: Catalog) -> DataFrame:
    return D.minhash_lsh_pairs(cat.documents, n=3, k=16, bands=8, tau=0.8,
                               posting=_shared_postings(cat))


def _simhash_oracle(max_hamming: int = 3) -> str:
    """DuckDB twin of operators/dedup.simhash_pairs: same md5-derived
    h32 per shingle (the engine-portable hash the CMS oracle already
    relies on), same ±1 bit tallies → 32-bit sketch, and an all-pairs
    bit_count(xor) ≤ r filter (fine at oracle SF; the Spark side uses
    the pigeonhole block join instead of all pairs)."""
    tallies = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS t{i}"
        for i in range(32))
    bits = " + ".join(
        f"CASE WHEN t{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END"
        for i in range(32))
    return f"""
    WITH {_SH_CTE},
    hashed AS (SELECT doc_id,
                      ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
               FROM sh),
    tallies AS (SELECT doc_id, {tallies} FROM hashed GROUP BY doc_id),
    sk AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM tallies)
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           bit_count(xor(x.simhash, y.simhash)) AS hamming
    FROM sk x JOIN sk y ON x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
    """


@query("dedup_simhash", oracle=_simhash_oracle(3))
def dedup_simhash(cat: Catalog) -> DataFrame:
    return D.simhash_pairs(cat.documents, n=3, max_hamming=3,
                           posting=_shared_postings(cat))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_same_fp
    FROM (SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(
                     string_split(text, ' '))), ' ')) AS fp
          FROM documents)
    """,
)
def doc_fingerprint(cat: Catalog) -> DataFrame:
    return D.fingerprint_dedup(cat.documents)


# ----------------------------------------------------- similarity search

# Explicit cosine so DuckDB matches the Spark fold formula
# dot / (sqrt(na)*sqrt(nb)) exactly (not list_cosine_similarity, whose
# internal formula may differ in final-ulp rounding).  ONE definition —
# similarity._dk_cos — serves every embedding oracle (here and the
# LSH/IVF oracles) so a parity tweak can't desynchronize them.
_DK_COS = S._dk_cos("a", "b")


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DK_COS}, 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_DK_COS} >= 0.4
    """,
)
def dedup_embedding_cosine(cat: Catalog) -> DataFrame:
    return S.embedding_cosine_pairs(cat.embeddings, tau=0.4)


_QD_COS = S._dk_cos("q", "d")

@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10)
    SELECT query_id, neighbor_id, rk, cos_sim FROM (
        SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_QD_COS} DESC, d.vec_id) AS rk,
               round({_QD_COS}, 4) AS cos_sim
        FROM q JOIN embeddings d ON q.vec_id <> d.vec_id
    ) WHERE rk <= 5
    """,
    bench=True,
)
def ann_bruteforce_topk(cat: Catalog) -> DataFrame:
    return S.brute_force_topk(cat.embeddings, n_queries=10, k=5)


@query("ann_lsh_topk", oracle=S.lsh_oracle_sql(n_queries=10, k=5, bits=4))
def ann_lsh_topk(cat: Catalog) -> DataFrame:
    """Approximate (bucket-limited) — but DETERMINISTIC: the seeded
    hyperplanes are model constants, so the DuckDB oracle replays the
    index exactly (see similarity.lsh_oracle_sql)."""
    return S.lsh_topk(cat.embeddings, n_queries=10, k=5, bits=4)


@query("ann_ivf_topk",
       oracle=S.ivf_oracle_sql(n_queries=10, k=5, nlist=16, nprobe=4))
def ann_ivf_topk(cat: Catalog) -> DataFrame:
    """IVF with the training-free lowest-id centroid seeding — the
    whole index (assign, probe, scan) replays exactly in the DuckDB
    oracle (similarity.ivf_oracle_sql)."""
    return S.ivf_topk(cat.embeddings, n_queries=10, k=5, nlist=16, nprobe=4)


@query(
    "knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < 20),
    topk AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {_QD_COS} DESC, d.vec_id) AS rk
            FROM q JOIN embeddings d ON q.vec_id <> d.vec_id
        ) WHERE rk <= 5
    ),
    votes AS (
        SELECT t.query_id, e.label, count(*) AS c
        FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
        GROUP BY t.query_id, e.label
    ),
    pred AS (
        SELECT query_id, label AS pred_label FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY c DESC, label) AS rn FROM votes
        ) WHERE rn = 1
    )
    SELECT p.query_id, p.pred_label, q.label AS true_label,
           p.pred_label = q.label AS correct
    FROM pred p JOIN q ON q.vec_id = p.query_id
    """,
)
def knn_label_vote(cat: Catalog) -> DataFrame:
    """kNN label vote over the embedding column — the standard
    embedding-quality eval (does cosine neighborhood predict the
    label?).  Majority of the exact top-5 neighbors' labels, ties to
    the smallest label; emits per-query prediction vs truth.

    Scale shape: rides brute_force_topk's single corpus pass (per-batch
    partial top-k); the vote aggregates ≤ queries×k rows and the label
    join touches only those neighbor ids."""
    emb = cat.embeddings
    topk = S.brute_force_topk(emb, n_queries=20, k=5)
    votes = (topk
             .join(emb.select(col("vec_id").alias("neighbor_id"), "label"),
                   "neighbor_id")
             .groupBy("query_id", "label")
             .agg(F.count("*").alias("c")))
    w = Window.partitionBy("query_id").orderBy(col("c").desc(), "label")
    pred = (votes.withColumn("rn", F.row_number().over(w))
            .where(col("rn") == 1)
            .select("query_id", col("label").alias("pred_label")))
    truth = (emb.where(col("vec_id") < 20)
             .select(col("vec_id").alias("query_id"),
                     col("label").alias("true_label")))
    return (pred.join(truth, "query_id")
            .select("query_id", "pred_label", "true_label",
                    (col("pred_label") == col("true_label"))
                    .alias("correct")))


def _recall_gate(approx: DataFrame, exact: DataFrame,
                 floor: float) -> DataFrame:
    """Single-row recall audit of an ANN result vs the exact top-k:
    (n_queries, recall_ok).  The iterative trainers (k-means, PQ) are
    not SQL-replayable, so the driver-checkable surface is the recall
    bound — the metric an ANN index is actually specified by."""
    hits = approx.select("query_id", "neighbor_id").withColumn(
        "_hit", F.lit(1))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .agg(F.count_distinct(col("query_id")).alias("n_queries"),
             (F.count("_hit") >= floor * F.count("*")).alias("recall_ok"))
    )


_GATE_ORACLE = """
    SELECT count(*) AS n_queries, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
"""


@query("ann_ivf_trained_topk", oracle=_GATE_ORACLE)
def ann_ivf_trained_topk(cat: Catalog) -> DataFrame:
    """IVF with TRAINED (k-means||) centroids — balanced cells, same
    probe machinery as ann_ivf_topk.  Training is iterative (not
    SQL-replayable), so the registered surface is the recall gate:
    nprobe=4/16 cells must recover ≥45% of the exact top-5 (measured
    0.62–0.68 across sf0.001–0.1; the raw top-k operator is
    S.ivf_topk(centroids=...), unit-tested directly)."""
    cents = S.kmeans_centroids(cat.embeddings, k=16, seed=7)
    approx = S.ivf_topk(cat.embeddings, n_queries=10, k=5, nprobe=4,
                        centroids=cents)
    exact = S.brute_force_topk(cat.embeddings, n_queries=10, k=5)
    return _recall_gate(approx, exact, floor=0.45)


@query(
    "dedup_clusters",
    # Transitive closure of the cosine≥0.4 near-dup pairs; the DuckDB
    # twin is a recursive CTE (terminates: UNION dedups), the Spark
    # side iterative min-label propagation (operators/graph.py).
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_DK_COS} >= 0.4
    ), edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION
        SELECT vb, va FROM pairs
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS id, least(src, min(dst)) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def dedup_clusters(cat: Catalog) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): connected components over
    the embedding-cosine pair graph; cluster_id = min member id, the
    survivor a dedup pass would keep."""
    from data_ingestion_challenge_spark.operators.graph import (
        connected_components,
    )
    pairs = S.embedding_cosine_pairs(cat.embeddings, tau=0.4)
    return connected_components(pairs, "vec_a", "vec_b")


@query(
    "dedup_cluster_stats",
    # The report a dedup run ships with: how many near-dup clusters of
    # each size, and how many docs each size class removes (size-1 ×
    # n_clusters).  Singletons (no pair) are excluded — same contract
    # as dedup_clusters.
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_DK_COS} >= 0.4
    ), edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION
        SELECT vb, va FROM pairs
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), clusters AS (
        SELECT src AS id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    ), by_cluster AS (
        SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY cluster_id
    )
    SELECT sz AS cluster_size,
           count(*) AS n_clusters,
           CAST((sz - 1) * count(*) AS BIGINT) AS n_docs_removed
    FROM by_cluster GROUP BY sz
    """,
)
def dedup_cluster_stats(cat: Catalog) -> DataFrame:
    """Cluster-size histogram over the connected components — the
    shuffle runs over the (tiny) cluster table, never the corpus."""
    from data_ingestion_challenge_spark.operators.graph import (
        connected_components,
    )
    pairs = S.embedding_cosine_pairs(cat.embeddings, tau=0.4)
    by_cluster = (connected_components(pairs, "vec_a", "vec_b")
                  .groupBy("cluster_id").agg(F.count("*").alias("sz")))
    return (by_cluster.groupBy(col("sz").alias("cluster_size"))
            .agg(F.count("*").alias("n_clusters"),
                 ((col("sz") - 1) * F.count("*")).cast("long")
                 .alias("n_docs_removed")))


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(
               embedding::DOUBLE[], x -> x*x))), 4) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(cat: Catalog) -> DataFrame:
    from data_ingestion_challenge_spark.functions import vectors as V
    return cat.embeddings.select(
        "vec_id",
        F.round(V.norm2_batch(col("embedding")), 4).alias("l2_norm"))


# ----------------------------------------------------------- text stats

@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS n_alpha_tokens
    FROM documents
    """,
    bench=True,
)
def token_counts(cat: Catalog) -> DataFrame:
    return cat.documents.select(
        "doc_id",
        F.size(T.words(col("text"))).alias("n_ws_tokens"),
        F.size(T.alpha_tokens(col("text"))).alias("n_alpha_tokens"),
    )


@query(
    "doc_quality",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w
               FROM documents)
    SELECT doc_id, len(w) AS n_tokens,
           round(len(list_filter(w,
               x -> x IN ('the','a','of','and','in','to'))) / len(w), 4)
               AS stop_ratio,
           round((n_chars - len(w) + 1) / len(w), 4) AS avg_word_len,
           CASE WHEN n_chars BETWEEN 100 AND 20000 AND len(w) >= 10
                THEN 1 ELSE 0 END AS keep_flag
    FROM t
    """,
)
def doc_quality(cat: Catalog) -> DataFrame:
    # Tokenize ONCE in a lower projection (CollapseProject keeps a
    # non-cheap expr referenced >1× un-inlined) — the collapsed form
    # re-ran split(text) six times per row.
    d = cat.documents.select(
        "doc_id", "n_chars", T.words(col("text")).alias("w"))
    n_tokens = F.size(col("w"))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(T.stopword_count(col("w")) / n_tokens, 4)
        .alias("stop_ratio"),
        F.round((col("n_chars") - n_tokens + 1) / n_tokens, 4)
        .alias("avg_word_len"),
        F.when(col("n_chars").between(100, 20000) & (n_tokens >= 10), 1)
        .otherwise(0).alias("keep_flag"),
    )


@query(
    "lang_distribution",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def lang_distribution(cat: Catalog) -> DataFrame:
    return (cat.documents.groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))


@query("lang_id", oracle=TS.lang_id_oracle_sql())
def lang_id(cat: Catalog) -> DataFrame:
    """Char-bigram cosine classifier — deterministic model constants,
    so the DuckDB oracle replays the classification exactly
    (textstats.lang_id_oracle_sql)."""
    return TS.lang_id(cat.documents).withColumn(
        "confidence", F.round(col("confidence"), 4))


# ----------------------------------------------------------- multimodal

@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 7 + 1 AS n_frames,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def multimodal_features(cat: Catalog) -> DataFrame:
    """Arrow-batched mapInPandas over binary payloads (decode stubbed —
    SURVEY.md §2C); the Spark plumbing (binary col, struct metadata,
    batch UDF, fixed schema) is the real deliverable."""
    return M.extract_features(M.to_binary_table(cat.documents))


@query(
    "multimodal_frame_sample",
    # Stub decode is deterministic (n_frames = byte_len % 7 + 1), so
    # the frame EXPLODE itself is oracle-checkable; frame payload bytes
    # stay operator-side (binary slices aren't hash-comparable via SQL).
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, octet_length(encode(text)) % 7 + 1)) AS INT)
               AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(cat: Catalog) -> DataFrame:
    """Per-frame explode via mapInPandas (video frame-sample shape)."""
    return (M.sample_frames(M.to_binary_table(cat.documents))
            .select("doc_id", "frame_idx"))


@query(
    "doc_winnow_fingerprints",
    # Shared relational restatement of winnowing (see
    # dedup.winnow_fps_oracle_cte — also the base of the containment
    # and substring-decontamination oracles).
    oracle=f"""
    WITH {D.winnow_fps_oracle_cte(n=3, w=4)}
    SELECT DISTINCT doc_id, mh AS fp_hash, mpos AS fp_pos FROM sel
    """,
)
def doc_winnow_fingerprints(cat: Catalog) -> DataFrame:
    """MOSS-style winnowing fingerprint table (operators/dedup.py)."""
    return _shared_winnow(cat, n=3, w=4)


@query(
    "doc_bigram_familiarity",
    # Quality score: how typical the doc's word bigrams are of the
    # corpus (garbage/outlier docs score low).  Counts are integers →
    # the only float op is one final division, deterministic in both
    # engines.
    oracle="""
    WITH bg AS (
        SELECT doc_id,
               array_to_string(w[i:i+1], ' ') AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             LATERAL (SELECT unnest(range(1, len(w))) AS i) u
        WHERE len(w) >= 2
    ), freq AS (
        SELECT b, count(*) AS c FROM bg GROUP BY b
    )
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(freq.c) AS BIGINT) AS familiarity_sum,
           round(sum(freq.c) / count(*), 4) AS familiarity
    FROM bg JOIN freq USING (b)
    GROUP BY bg.doc_id
    """,
)
def doc_bigram_familiarity(cat: Catalog) -> DataFrame:
    """Corpus-typicality quality score: mean corpus frequency of the
    doc's word bigrams.  Two shuffles (bigram count, per-doc sum); the
    bigram↔freq join is a shuffled equi-join reusing the bigram key."""
    wds = cat.documents.select("doc_id", T.words(col("text")).alias("w"))
    bg = (
        wds.select(
            "doc_id", "w",
            F.explode(
                F.when(F.size("w") >= 2,
                       F.sequence(F.lit(1), F.size("w") - 1))
                .otherwise(F.array().cast("array<int>"))).alias("i"))
        .select("doc_id",
                F.concat_ws(" ", F.element_at(col("w"), col("i")),
                            F.element_at(col("w"), col("i") + 1)).alias("b"))
    )
    freq = bg.groupBy("b").agg(F.count("*").alias("c"))
    return (
        bg.join(freq, "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.sum("c").alias("familiarity_sum"),
             F.round(F.sum("c") / F.count("*"), 4).alias("familiarity"))
    )


@query(
    "kmeans_cluster_sizes",
    # Iterative training isn't SQL-replayable; the driver-checkable
    # surface is the partition invariant: the cell histogram covers
    # every vector exactly once (sum == corpus count, hashed by the
    # oracle) with ≤ k non-empty cells.
    oracle="""
    SELECT count(*) AS n_points, TRUE AS cells_ok FROM embeddings
    """,
)
def kmeans_cluster_sizes_q(cat: Catalog) -> DataFrame:
    """Trained k-means|| cell histogram over embeddings (operators/
    ml.py) — the trained-centroid counterpart of ann_ivf_topk.  The
    raw (cluster_id, n_vectors) histogram is unit-tested directly;
    registered here as its partition-invariant audit."""
    from data_ingestion_challenge_spark.operators.ml import (
        kmeans_cluster_sizes,
    )
    sizes = kmeans_cluster_sizes(cat.embeddings, k=8, seed=7)
    return sizes.agg(
        F.sum("n_vectors").alias("n_points"),
        ((F.count("*") <= 8) & (F.min("n_vectors") > 0)).alias("cells_ok"))


@query(
    "doc_sentences_udtf",
    # sent_idx counts split positions including empties; empty segments
    # themselves are dropped — mirrored by the k-indexed filter below.
    oracle="""
    SELECT doc_id, CAST(k AS INT) AS sent_idx, parts[k + 1] AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS parts,
                 unnest(range(0, len(string_split(text, '. ')))) AS k
          FROM documents)
    WHERE parts[k + 1] <> ''
    """,
)
def doc_sentences_udtf(cat: Catalog) -> DataFrame:
    """Python UDTF lateral join (operators/textstats.py) — the Spark 4
    table-function surface, correctness-gated like everything else."""
    return TS.split_sentences_udtf(cat.spark, cat.documents)


@query(
    "dedup_levenshtein",
    # Fuzzy (edit-distance) near-dup: candidates blocked on
    # (lang, length band) so the pair join is an equi-join; the
    # 40-char prefix caps the O(n·m) distance cost per pair.  Integer
    # metric → no float hazards.
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))
               AS edit_dist
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang
     AND a.n_chars // 20 = b.n_chars // 20
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 5
    """,
)
def dedup_levenshtein(cat: Catalog) -> DataFrame:
    """Edit-distance near-dup pairs (typo-level variants that shingle
    Jaccard can miss on short docs).

    Candidate generation is PassJoin-style SEGMENT blocking, exact by
    pigeonhole: split the 40-char prefix into k+1 = 6 segments; ≤ k
    edits leave ≥ 1 segment untouched, and that segment appears
    verbatim in the partner at a start position shifted by at most k.
    So candidates = equi-join on (lang, band, segment#, segment text)
    against the partner's ±k-shifted same-length substrings — per-doc
    join fan-out is a CONSTANT (6 probe + 66 index keys), never the
    (lang, band) block's full membership.  This replaces the r2 plain
    (lang, band) block join whose hot band was quadratic in a
    natural-language corpus (length distributions concentrate).  Docs
    shorter than the 40-char prefix (bands 0-1 — disjoint from the
    segmented bands by construction) keep the plain block join; exact
    levenshtein verification decides membership either way, so results
    are identical to the all-pairs oracle."""
    k = 5
    d = cat.documents.select(
        "doc_id", "lang",
        (col("n_chars").cast("long") / 20).cast("long").alias("band"),
        F.substring("text", 1, 40).alias("prefix"))
    longs = d.where(F.length("prefix") == 40)
    shorts = d.where(F.length("prefix") < 40)

    # Fixed segmentation of the 40-char prefix: 4×7 + 2×6.
    segs = [(0, 7), (7, 7), (14, 7), (21, 7), (28, 6), (34, 6)]
    probe_entries = [
        F.struct(F.lit(i).alias("i"),
                 F.substring("prefix", p + 1, L).alias("s"))
        for i, (p, L) in enumerate(segs)]
    probe = (longs.select(col("doc_id").alias("doc_a"), "lang", "band",
                          F.explode(F.array(*probe_entries)).alias("e"))
             .select("doc_a", "lang", "band",
                     col("e.i").alias("i"), col("e.s").alias("s")))
    index_entries = [
        F.struct(F.lit(i).alias("i"),
                 F.substring("prefix", q + 1, L).alias("s"))
        for i, (p, L) in enumerate(segs)
        for q in range(max(0, p - k), min(40 - L, p + k) + 1)]
    index = (longs.select(col("doc_id").alias("doc_b"), "lang", "band",
                          F.explode(F.array_distinct(
                              F.array(*index_entries))).alias("e"))
             .select("doc_b", "lang", "band",
                     col("e.i").alias("i"), col("e.s").alias("s")))
    # Probe×index covers both directions (either endpoint may play the
    # segmented role), so canonicalize with least/greatest + distinct.
    cand = (probe.join(index, ["lang", "band", "i", "s"])
            .where(col("doc_a") != col("doc_b"))
            .select(F.least("doc_a", "doc_b").alias("doc_a"),
                    F.greatest("doc_a", "doc_b").alias("doc_b"))
            .distinct())
    pa = d.select(col("doc_id").alias("doc_a"), col("prefix").alias("_pa"))
    pb = d.select(col("doc_id").alias("doc_b"), col("prefix").alias("_pb"))
    long_pairs = cand.join(pa, "doc_a").join(pb, "doc_b")

    sa = shorts.select(col("doc_id").alias("doc_a"), "lang", "band",
                       col("prefix").alias("_pa"))
    sb = shorts.select(col("doc_id").alias("doc_b"), "lang", "band",
                       col("prefix").alias("_pb"))
    short_pairs = (sa.join(sb, ["lang", "band"])
                   .where(col("doc_a") < col("doc_b"))
                   .select("doc_a", "doc_b", "_pa", "_pb"))

    return (
        long_pairs.select("doc_a", "doc_b", "_pa", "_pb")
        .unionByName(short_pairs)
        .withColumn("edit_dist", F.levenshtein(col("_pa"), col("_pb")))
        .where(col("edit_dist") <= k)
        .select("doc_a", "doc_b", "edit_dist")
    )
