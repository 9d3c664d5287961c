"""LLM-training-data pipeline, batch 3 (SURVEY.md §2C): benchmark
decontamination, per-source corpus caps, PII redaction, and VARIANT
(semi-structured JSON) ingestion on the Spark 4 native type.

All four are fully oracle-gated: hashing is md5 (identical hex in both
engines), regexes stay in the RE2 ∩ java.util.regex common subset, and
integer division uses `div` / `//` (never `/`, which is DOUBLE in both
engines — see SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import similarity as S
from data_ingestion_challenge_spark.plans.llm import (
    _GATE_ORACLE, _SH_CTE, _shared_postings, _shared_winnow)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------- decontamination

# Benchmark membership: a fixed deterministic slice of doc_ids stands
# in for the held-out eval set (the real pipeline would read it from a
# separate table; the overlap machinery is identical).
_BENCH_MOD = 97

@query(
    "decontaminate_overlap",
    oracle=f"""
    WITH {_SH_CTE},
    bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
    per AS (SELECT c.doc_id, count(*) AS n_shingles,
                   count(b.s) AS n_overlap
            FROM sh c LEFT JOIN bsh b ON c.s = b.s
            WHERE c.doc_id % {_BENCH_MOD} <> 0
            GROUP BY c.doc_id)
    SELECT doc_id, n_shingles, n_overlap,
           round(n_overlap / n_shingles, 4) AS overlap_share,
           n_overlap / n_shingles >= 0.5 AS contaminated
    FROM per
    """,
    bench=True,
)
def decontaminate_overlap(cat: Catalog) -> DataFrame:
    """Eval-set decontamination: flag corpus docs whose distinct
    3-gram shingles overlap a benchmark set above τ=0.5 (the n-gram
    overlap check of Lee et al. / GPT-3 appendix C, Spark-shaped: the
    benchmark vocabulary broadcasts, the corpus never re-shuffles
    beyond its per-doc aggregate)."""
    return D.benchmark_overlap(
        _shared_postings(cat),
        bench_pred=col("doc_id") % _BENCH_MOD == 0, tau=0.5)


# ------------------------------------------------- per-source caps

_CAP = 20
_CAP_SALTS = 16

@query(
    "per_source_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    SELECT source,
           count(*) AS n_total,
           count(*) FILTER (rk <= {_CAP}) AS n_kept,
           CAST(coalesce(sum(n_chars) FILTER (rk <= {_CAP}), 0) AS BIGINT)
               AS chars_kept
    FROM ranked GROUP BY source
    """,
)
def per_source_cap(cat: Catalog) -> DataFrame:
    """Per-source document caps (CommonCrawl-style anti-domination: no
    single domain may contribute more than N docs).  Selection is a
    deterministic uniform sample — rank by md5(doc_id) within source —
    so reruns keep the same docs.

    Skew-proof EXACT top-N per key (two-phase): a plain row_number
    over `source` single-tasks a hot domain (the r1 scale-killer); here
    each doc first ranks within (source, salt) — the largest task is
    hot_source/SALTS — and only the per-salt top-CAP survive (a doc in
    the global top-CAP of its source is in its salt group's top-CAP, so
    no candidate is lost).  The exact rank then runs over ≤ SALTS×CAP
    rows per source.  Totals come from a partially-aggregated count
    (map-side combine absorbs the skew)."""
    docs = cat.documents.select("source", "doc_id", "n_chars")
    key = F.md5(col("doc_id").cast("string"))
    salt = F.pmod(F.xxhash64(col("doc_id")), F.lit(_CAP_SALTS))
    local = Window.partitionBy("source", "_salt").orderBy("_k", "doc_id")
    exact = Window.partitionBy("source").orderBy("_k", "doc_id")
    kept = (docs
            .withColumn("_k", key).withColumn("_salt", salt)
            .withColumn("_lrk", F.row_number().over(local))
            .where(col("_lrk") <= _CAP)
            .withColumn("_rk", F.row_number().over(exact))
            .where(col("_rk") <= _CAP)
            .groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("n_chars").alias("chars_kept")))
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    return (totals.join(kept, "source", "left")
            .select("source", "n_total",
                    F.coalesce("n_kept", F.lit(0).cast("long"))
                    .alias("n_kept"),
                    F.coalesce("chars_kept", F.lit(0).cast("long"))
                    .alias("chars_kept")))


# ------------------------------------------------- PII redaction

# The synthetic corpus contains no organic PII, so the query plants a
# deterministic contact suffix derived from doc_id and then proves the
# scrubber removes it — the regex/redaction path is exercised end-to-end
# and stays engine-portable (RE2 ∩ Java subset: no lookaround, no
# backreferences).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

@query(
    "pii_redaction_audit",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.'
                    || CAST(doc_id % 200 AS VARCHAR) || '.0.'
                    || CAST(doc_id % 250 + 1 AS VARCHAR) AS t
        FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
               AS n_emails,
           len(regexp_extract_all(t,
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
           md5(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
               'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>',
               'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_redaction_audit(cat: Catalog) -> DataFrame:
    """PII detect + redact (emails, IPv4) per document — counts plus an
    md5 of the scrubbed text (the full redacted corpus is what a real
    run writes; hashing keeps the gate row compact).  Pure codegen'd
    JVM regex — a narrow map, no shuffle, scales linearly and pushes
    nothing to Python."""
    aug = F.concat(
        col("text"), F.lit(" contact user"), col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (col("doc_id") % 200).cast("string"), F.lit(".0."),
        (col("doc_id") % 250 + 1).cast("string"))
    d = cat.documents.select("doc_id", aug.alias("t"))
    redacted = F.regexp_replace(
        F.regexp_replace(col("t"), _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(col("t"), F.lit(_EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(col("t"), F.lit(_IP_RE), F.lit(0)))
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"))


# ------------------------------------------------- VARIANT ingestion

@query(
    "props_variant_agg",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) // 10 AS k_bucket,
           count(*) AS n,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY 1
    """,
)
def props_variant_agg(cat: Catalog) -> DataFrame:
    """Semi-structured ingestion on Spark 4's native VARIANT type:
    parse_json once, extract typed fields with variant_get, aggregate.
    VARIANT keeps the parsed tree in a binary columnar encoding —
    repeated field extraction doesn't re-parse the JSON string per
    expression the way get_json_object does, the right default for
    schema-on-read event properties at ingest scale."""
    k = F.variant_get(F.parse_json(col("props")), "$.k", "int")
    return (cat.events
            .select(k.alias("k"), "value")
            .groupBy(F.expr("k div 10").alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("value"), 4).alias("avg_value")))


# ------------------------------------------------- PQ ANN

@query(
    "ann_pq_topk",
    # Codebook training is iterative (not SQL-replayable) → the
    # driver-checkable surface is the recall gate, mirroring
    # ann_ivf_trained_topk (same shared oracle string).  bench.py times
    # the raw pq_topk operator directly so the measured cost stays the
    # index scan, not the brute-force audit twin.
    oracle=_GATE_ORACLE,
)
def ann_pq_topk(cat: Catalog) -> DataFrame:
    """Product-quantization ANN (see operators/similarity.pq_topk):
    m=8 sub-codebooks → 8 B codes per 64-dim vector, ADC lookup-table
    scan, exact top-k re-rank.  The memory-bound answer to '100 TB of
    embeddings' — the code table is ~32× smaller than the floats.
    ksub=32 (5-bit codes), rerank=96: recall@5 ≈ 0.9 vs brute force on
    the synthetic corpus; registered as the ≥0.5-recall audit."""
    from data_ingestion_challenge_spark.operators.similarity import pq_topk
    from data_ingestion_challenge_spark.plans.llm import _recall_gate
    from data_ingestion_challenge_spark.operators import similarity as S
    approx = pq_topk(cat.embeddings, n_queries=10, k=5, ksub=32, rerank=96)
    exact = S.brute_force_topk(cat.embeddings, n_queries=10, k=5)
    return _recall_gate(approx, exact, floor=0.5)


# ------------------------------------------------- binary-payload dedup

@query(
    "multimodal_dedup",
    oracle="""
    SELECT md5(text) AS payload_md5, count(*) AS dup_count,
           min(doc_id) AS keep_doc_id, min(strlen(text)) AS n_bytes
    FROM documents GROUP BY md5(text)
    """,
)
def multimodal_dedup(cat: Catalog) -> DataFrame:
    """Exact dedup over OPAQUE BINARY payloads (image/audio dedup by
    content hash — the first pass of any multimodal pipeline; at 100 TB
    the md5 collapses map-side so only (hash, count) rows shuffle).
    The payload here is the utf-8 encoding of `text` (multimodal stub),
    so the oracle hashes the same bytes via md5(text)."""
    from data_ingestion_challenge_spark.operators.multimodal import (
        to_binary_table)
    bt = to_binary_table(cat.documents)
    return (bt.groupBy(F.md5(col("payload")).alias("payload_md5"))
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("keep_doc_id"),
                 F.min(col("meta.n_bytes")).alias("n_bytes")))


def _binary_dir_for(cat: Catalog) -> str:
    """Materialize the documents table as one .bin file per doc
    (payload = utf-8 text bytes, filename = <doc_id>.bin) under a
    per-sf temp dir, so the REAL binaryFile source path — not just the
    in-plan to_binary_table stub — is correctness-gated.  The files
    are written EXECUTOR-side (mapInPandas partition writer) so the
    corpus never lands in driver memory — the driver sees only one
    written-count row per partition; file content is deterministic per
    path, so a task retry just overwrites identical bytes.  Idempotent
    via a _DONE marker (local[*] shares the driver filesystem; on a
    real cluster the scaffold would target shared object storage)."""
    import hashlib
    import os
    import tempfile

    # Tag includes the source parquet's (mtime, size): testdata is
    # regenerated between rounds, and a stale /tmp scaffold keyed on
    # sf_dir alone would silently serve last round's bytes.
    src = f"{cat.sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{cat.sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_bin_{tag}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)

        def _write_partition(batches):
            import pandas as pd
            n = 0
            for pdf in batches:
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    path = os.path.join(out, f"{doc_id}.bin")
                    with open(path, "wb") as f:
                        f.write(text.encode("utf-8"))
                n += len(pdf)
            yield pd.DataFrame({"written": [n]})

        total = (cat.documents.select("doc_id", "text")
                 .mapInPandas(_write_partition, "written long")
                 .agg(F.sum("written").alias("n")).collect()[0]["n"])
        if total is None or total <= 0:
            raise RuntimeError(f"binary scaffold wrote no files to {out}")
        open(marker, "w").close()
    return out


@query(
    "multimodal_binary_source_dedup",
    # Same verdict as multimodal_dedup, but the payloads come off DISK
    # through the binaryFile source — file length and content bytes
    # must round-trip exactly (text is ascii, so strlen = byte length).
    oracle="""
    SELECT md5(text) AS payload_md5, count(*) AS dup_count,
           min(doc_id) AS keep_doc_id, min(strlen(text)) AS n_bytes
    FROM documents GROUP BY md5(text)
    """,
)
def multimodal_binary_source_dedup(cat: Catalog) -> DataFrame:
    """Content-hash dedup over REAL binary files (sources/files.py:
    read_binary_files): one row per file with (path, length, content),
    doc identity recovered from the filename.  At 100 TB files are the
    parallel unit and the md5 collapses map-side exactly as in
    multimodal_dedup — this entry exists to gate the source itself
    (schema, glob filter, payload round-trip), which the in-plan
    binary-table stub can't exercise."""
    from data_ingestion_challenge_spark.sources.files import (
        read_binary_files)

    bf = read_binary_files(cat.spark, _binary_dir_for(cat), glob="*.bin")
    return (bf.select(
                F.regexp_extract("path", r"(\d+)\.bin$", 1)
                .cast("long").alias("doc_id"),
                F.md5("content").alias("payload_md5"),
                col("length"))
            .groupBy("payload_md5")
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("keep_doc_id"),
                 F.min("length").alias("n_bytes")))


# ------------------------------------------------- dedup keep-list

@query(
    "dedup_keep_list",
    # Terminal decision of the dedup pipeline: every vec keeps iff it
    # is its cluster's survivor (min id); singletons (no near-dup
    # pair) always keep.  The pair stage is the SUB-QUADRATIC IVF
    # candidate path (multi-probe cell blocking + exact cosine verify
    # on candidates only) — the oracle replays the identical index via
    # ivf_candidate_cte, then extends it with the recursive
    # connected-components CTE and the keep verdict over ALL corpus
    # members.  `dedup_embedding_cosine` stays registered as the exact
    # O(n²) audit twin of the pair stage.
    oracle=f"""
    WITH RECURSIVE {S.ivf_candidate_cte(tau=0.4)}, edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION SELECT vb, va FROM pairs
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), clusters AS (
        SELECT src AS id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src
    )
    SELECT e.vec_id, coalesce(c.cluster_id, e.vec_id) AS cluster_id,
           (c.cluster_id IS NULL OR c.cluster_id = e.vec_id) AS keep
    FROM embeddings e LEFT JOIN clusters c ON e.vec_id = c.id
    """,
    # benched: the connected-components terminal is the real 100 TB
    # dedup cost center — its wall time (IVF candidates + O(log d)
    # pointer-doubling rounds) belongs in the headline suite.
    bench=True,
)
def dedup_keep_list(cat: Catalog,
                    assignments: DataFrame | None = None) -> DataFrame:
    """The dedup pipeline's OUTPUT: per corpus member, its cluster and
    the keep/drop verdict (keep = cluster survivor, min id; singletons
    trivially keep).  The pair feed is ivf_candidate_pairs — O(n)
    candidate rows with a fixed nprobe²·cell constant, never the
    all-pairs gemm — so the terminal stays sub-quadratic end to end.
    The left join back to the corpus is keyed on id — at 100 TB the
    cluster table (≪ corpus: only members of some near-dup pair)
    broadcasts or buckets; everything upstream reuses dedup_clusters'
    shuffle discipline."""
    from data_ingestion_challenge_spark.operators.graph import (
        connected_components)

    pairs = S.ivf_candidate_pairs(cat.embeddings, tau=0.4,
                                  assignments=assignments)
    clusters = connected_components(pairs, "vec_a", "vec_b")
    base = cat.embeddings.select("vec_id")
    joined = base.join(F.broadcast(clusters),
                       base["vec_id"] == clusters["id"], "left")
    return joined.select(
        "vec_id",
        F.coalesce(col("cluster_id"), col("vec_id")).alias("cluster_id"),
        (col("cluster_id").isNull() | (col("cluster_id") == col("vec_id")))
        .alias("keep"))


# --------------------------------------------- intra-doc cleaning

@query(
    "intra_doc_dedup",
    # Same '. '-split sentence semantics as doc_sentences_udtf (empties
    # dropped), so one relational definition serves both engines.
    oracle="""
    WITH sent AS (
        SELECT doc_id, s FROM (
            SELECT doc_id, unnest(string_split(text, '. ')) AS s
            FROM documents)
        WHERE s <> ''
    )
    SELECT doc_id,
           count(*) AS n_sentences,
           count(DISTINCT s) AS n_unique,
           CAST(count(*) - count(DISTINCT s) AS BIGINT) AS n_dup,
           round(1.0 - count(DISTINCT s) / count(*), 4) AS dup_ratio
    FROM sent GROUP BY doc_id
    """,
)
def intra_doc_dedup(cat: Catalog) -> DataFrame:
    """C4-style INTRA-document cleaning signal: repeated sentences
    within one doc (boilerplate, scraped nav bars, SSG artifacts).
    Pipelines drop the repeats or the whole doc above a dup-ratio cap.

    Scale shape: split+explode then one groupBy(doc_id) — the shuffle
    carries (doc_id, sentence-hash-sized) rows and combines map-side;
    per-doc fan-out is bounded by doc length."""
    sent = (cat.documents
            .select("doc_id",
                    F.explode(F.split(col("text"), "\\. ")).alias("s"))
            .where(col("s") != ""))
    n, nu = F.count("*"), F.countDistinct("s")
    return (sent.groupBy("doc_id")
            .agg(n.alias("n_sentences"),
                 nu.alias("n_unique"),
                 (n - nu).alias("n_dup"),
                 F.round(F.lit(1.0) - nu / n, 4).alias("dup_ratio")))


# --------------------------------------------- near-containment

_CONTAIN_TAU = 0.6
_CONTAIN_MAX_DF = 64  # drop fingerprints shared by more docs (boilerplate)

# Winnowing fingerprint sets reduced to distinct (doc_id, fp_hash) —
# built on the ONE shared relational winnow restatement so this oracle
# can never drift from doc_winnow_fingerprints' (see
# dedup.winnow_fps_oracle_cte).
_WINNOW_FPS_CTE = f"""{D.winnow_fps_oracle_cte(n=3, w=4)}, fps AS (
        SELECT DISTINCT doc_id, mh AS fp_hash FROM sel
    )
"""


@query(
    "doc_containment",
    oracle=f"""
    WITH {_WINNOW_FPS_CTE},
    capped AS (
        SELECT fp_hash FROM fps GROUP BY fp_hash
        HAVING count(*) <= {_CONTAIN_MAX_DF}
    ), use_fps AS (
        SELECT f.doc_id, f.fp_hash FROM fps f JOIN capped USING (fp_hash)
    ), sizes AS (
        SELECT doc_id, count(*) AS n_fp FROM use_fps GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
               count(*) AS ic
        FROM use_fps a JOIN use_fps b
          ON a.fp_hash = b.fp_hash AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT inner_doc, outer_doc,
           round(ic / s.n_fp, 4) AS containment
    FROM inter JOIN sizes s ON s.doc_id = inner_doc
    WHERE ic / s.n_fp >= {_CONTAIN_TAU}
    """,
)
def doc_containment(cat: Catalog) -> DataFrame:
    """Near-CONTAINMENT detection (quotes, excerpts, wrapped reposts):
    directional overlap of winnowing fingerprint sets —
    |fp(inner) ∩ fp(outer)| / |fp(inner)| ≥ τ.  Jaccard-style dedup
    misses these (a small doc inside a big one has low symmetric
    similarity); containment is the signal Lee et al.-style substring
    decontamination needs at doc granularity.

    Scale shape: inverted-index equi-join on fp_hash with a document-
    frequency cap (df ≤ {_CONTAIN_MAX_DF} drops boilerplate
    fingerprints, bounding every posting list), intersection counts
    via map-side-combined groupBy — never all-pairs."""
    fps = (_shared_winnow(cat, n=3, w=4)
           .select("doc_id", "fp_hash").distinct())
    capped = (fps.groupBy("fp_hash")
              .agg(F.count("*").alias("_df"))
              .where(col("_df") <= _CONTAIN_MAX_DF)
              .select("fp_hash"))
    use = fps.join(capped, "fp_hash")
    sizes = use.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = use.select(col("doc_id").alias("inner_doc"), "fp_hash")
    b = use.select(col("doc_id").alias("outer_doc"), "fp_hash")
    inter = (a.join(b, "fp_hash")
             .where(col("inner_doc") != col("outer_doc"))
             .groupBy("inner_doc", "outer_doc")
             .agg(F.count("*").alias("ic")))
    cont = col("ic") / col("n_fp")
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "inner_doc"),
                  "inner_doc")
            .where(cont >= _CONTAIN_TAU)
            .select("inner_doc", "outer_doc",
                    F.round(cont, 4).alias("containment")))


# --------------------------------------- exact-substring decontamination

@query(
    "decontaminate_substring",
    # The winnowing guarantee (window w=4, gram n=3): any shared run of
    # w+n-1 = 6 words yields a shared fingerprint — so "shares ≥1
    # fingerprint with the eval slice" is exact-substring contamination
    # at 6-word granularity, the Lee et al. check at doc resolution.
    oracle=f"""
    WITH {_WINNOW_FPS_CTE},
    eval_fps AS (
        SELECT DISTINCT fp_hash FROM fps WHERE doc_id % {_BENCH_MOD} = 0
    )
    SELECT f.doc_id,
           count(*) AS n_fps,
           count(e.fp_hash) AS n_shared,
           count(e.fp_hash) > 0 AS contaminated
    FROM fps f LEFT JOIN eval_fps e ON f.fp_hash = e.fp_hash
    WHERE f.doc_id % {_BENCH_MOD} <> 0
    GROUP BY f.doc_id
    """,
)
def decontaminate_substring(cat: Catalog) -> DataFrame:
    """EXACT-substring decontamination (Lee et al. §4 shape): flag any
    corpus doc sharing a ≥6-word verbatim run with the held-out eval
    slice.  Complements decontaminate_overlap (n-gram share ≥ τ): that
    catches paraphrase-level overlap, this catches a single verbatim
    quote regardless of doc length.

    Scale shape: the eval fingerprint set is corpus-independent-sized
    → broadcast semi-mark; the corpus side is one winnow pass (shared
    with doc_winnow_fingerprints/doc_containment) + a per-doc
    aggregate.  No corpus self-join at all."""
    fps = (_shared_winnow(cat, n=3, w=4)
           .select("doc_id", "fp_hash").distinct())
    eval_fps = (fps.where(col("doc_id") % _BENCH_MOD == 0)
                .select("fp_hash").distinct()
                .withColumn("_hit", F.lit(1)))
    corpus = fps.where(col("doc_id") % _BENCH_MOD != 0)
    return (corpus.join(F.broadcast(eval_fps), "fp_hash", "left")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_fps"),
                 F.count("_hit").alias("n_shared"),
                 (F.count("_hit") > 0).alias("contaminated")))


_SUBSTR_K = 20


@query(
    "decontaminate_substring_exact",
    # Char-level exactness: two texts share a verbatim run of ≥ k
    # characters iff they share a k-gram at SOME character offset, so
    # hashing every offset's k-gram is the complete any-position check
    # — no word alignment, no winnow sampling.  The oracle replays the
    # same index with unnest(generate_series) + substr + md5.
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               md5(substr(text, CAST(i AS INT), {_SUBSTR_K})) AS gh
        FROM (SELECT doc_id, text,
                     unnest(generate_series(
                         1, greatest(length(text) - {_SUBSTR_K - 1}, 0)))
                         AS i
              FROM documents)
    ),
    eval_g AS (SELECT DISTINCT gh FROM g WHERE doc_id % {_BENCH_MOD} = 0),
    agg AS (
        SELECT c.doc_id, count(*) AS n_grams, count(e.gh) AS n_shared
        FROM g c LEFT JOIN eval_g e ON c.gh = e.gh
        WHERE c.doc_id % {_BENCH_MOD} <> 0
        GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.n_shared, 0) AS n_shared,
           coalesce(a.n_shared, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    WHERE d.doc_id % {_BENCH_MOD} <> 0
    """,
)
def decontaminate_substring_exact(cat: Catalog) -> DataFrame:
    """EXACT any-position substring decontamination (Lee et al. §4 at
    character resolution): flag every corpus doc sharing a verbatim
    run of ≥ 20 characters with the held-out eval slice, at ANY
    character offset — including runs shorter than the winnow gate's
    w+n-1 = 6 words and runs that don't align with word boundaries,
    the two known gaps of `decontaminate_substring`.

    Scale shape: the corpus side is a zero-shuffle narrow map emitting
    |text| hashed k-grams per doc (O(total corpus chars) — the budget
    a distributed suffix-array build pays, without the global sort);
    the eval k-gram vocabulary is corpus-independent-sized → broadcast
    semi-mark; one map-side-combined per-doc aggregate.  No corpus
    self-join.  n_shared counts contaminated OFFSETS, so it also
    approximates the contaminated span length in characters."""
    g = D.char_gram_hashes(cat.documents, _SUBSTR_K)
    eval_g = (g.where(col("doc_id") % _BENCH_MOD == 0)
              .select("gh").distinct().withColumn("_hit", F.lit(1)))
    corpus = g.where(col("doc_id") % _BENCH_MOD != 0)
    agg = (corpus.join(F.broadcast(eval_g), "gh", "left")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_grams"),
                F.count("_hit").alias("n_shared")))
    base = (cat.documents.where(col("doc_id") % _BENCH_MOD != 0)
            .select("doc_id"))
    return (base.join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(col("n_grams"), F.lit(0)).alias("n_grams"),
                    F.coalesce(col("n_shared"), F.lit(0))
                    .alias("n_shared"),
                    (F.coalesce(col("n_shared"), F.lit(0)) > 0)
                    .alias("contaminated")))
