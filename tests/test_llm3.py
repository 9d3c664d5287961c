"""Semantics of the batch-3 LLM-pipeline queries (plans/llm3.py):
decontamination, per-source caps, PII redaction, VARIANT ingestion.
(Engine-vs-DuckDB parity is covered by test_oracle_parity.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.operators.dedup import (
    _postings, benchmark_overlap)
from data_ingestion_challenge_spark.plans import QUERIES

from tests.conftest import SF_DIR


def test_benchmark_overlap_flags_copy(spark):
    """A doc that copies the benchmark verbatim is contaminated; a
    disjoint doc has zero overlap; benchmark members are excluded."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),       # benchmark (id%2=0)
         (1, "alpha beta gamma delta epsilon"),       # verbatim copy
         (3, "one two three four five six")],         # disjoint
        "doc_id long, text string")
    out = {r.doc_id: r for r in benchmark_overlap(
        _postings(docs), F.col("doc_id") % 2 == 0, tau=0.5).collect()}
    assert set(out) == {1, 3}
    assert out[1].contaminated and out[1].overlap_share == 1.0
    assert (not out[3].contaminated) and out[3].n_overlap == 0


def test_per_source_cap_semantics(spark):
    rows = QUERIES["per_source_cap"](spark, SF_DIR).collect()
    assert all(r.n_kept <= 20 and r.n_kept <= r.n_total for r in rows)
    # small sources survive whole; big sources are clipped to the cap
    assert all(r.n_kept == min(r.n_total, 20) for r in rows)
    assert all(r.chars_kept >= 0 for r in rows)


def test_per_source_cap_deterministic(spark):
    a = sorted(map(tuple, QUERIES["per_source_cap"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, QUERIES["per_source_cap"](spark, SF_DIR).collect()))
    assert a == b


def test_pii_redaction_removes_planted_pii(spark):
    df = QUERIES["pii_redaction_audit"](spark, SF_DIR)
    rows = df.collect()
    # every doc got exactly the planted email + IP (corpus has none)
    assert all(r.n_emails == 1 and r.n_ips == 1 for r in rows)
    # and a second pass over the REDACTED text finds nothing
    from data_ingestion_challenge_spark.plans.llm3 import _EMAIL_RE, _IP_RE
    aug = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 250 + 1).cast("string"))
    red = F.regexp_replace(F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"),
                           _IP_RE, "<IP>")
    leftovers = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                 .select(red.alias("t"))
                 .where(F.col("t").rlike(_EMAIL_RE)
                        | F.col("t").rlike(_IP_RE)))
    assert leftovers.count() == 0


def test_props_variant_total(spark):
    df = QUERIES["props_variant_agg"](spark, SF_DIR)
    total = df.agg(F.sum("n")).first()[0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total == n_events
    assert df.where("k_bucket is null").count() == 0


def test_pq_topk_recall_and_shape(spark):
    """PQ+re-rank recovers most true neighbours and keeps the same
    output contract as brute force (k rows per query, ranked).
    Exercises the raw operator (the registry entry is the recall
    gate over this same pipeline)."""
    from data_ingestion_challenge_spark.operators.similarity import pq_topk
    bf = QUERIES["ann_bruteforce_topk"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pq = pq_topk(emb, n_queries=10, k=5, ksub=32, rerank=96).collect()
    assert len(pq) == len(bf) == 50
    by_q = {}
    for r in pq:
        by_q.setdefault(r.query_id, []).append(r.rk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    bfs = {(r.query_id, r.neighbor_id) for r in bf}
    pqs = {(r.query_id, r.neighbor_id) for r in pq}
    assert len(pqs & bfs) / len(bfs) >= 0.8
    # re-ranked scores are EXACT cosine: shared pairs agree with BF
    bf_cos = {(r.query_id, r.neighbor_id): r.cos_sim for r in bf}
    assert all(abs(bf_cos[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-9
               for r in pq if (r.query_id, r.neighbor_id) in bf_cos)


def test_pq_codebooks_deterministic(spark):
    from data_ingestion_challenge_spark.operators.similarity import pq_train
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    import numpy as np
    a, b = pq_train(emb, m=8, ksub=16), pq_train(emb, m=8, ksub=16)
    assert a.shape == (8, 16, 8) and np.array_equal(a, b)


def test_dq_report_detects_planted_violations(spark, tmp_path):
    """Corrupt a copy of the tables; every constraint must fire with
    the exact violation count."""
    from datetime import datetime
    sf = str(tmp_path)
    ev = ("event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string")
    t0 = datetime(2024, 1, 1)
    spark.createDataFrame(
        [(1, t0, 1, "click", 1.0, "{}"),
         (1, t0, 2, "view", 2.0, "{}"),        # dup event_id
         (3, t0, None, "teleport", -5.0, "{}")],  # null uid, bad type, neg
        ev).write.parquet(f"{sf}/events.parquet")
    spark.createDataFrame([(1, 10), (2, 99)], "o_orderkey long, o_custkey long") \
        .write.parquet(f"{sf}/orders.parquet")          # 99 is an orphan
    spark.createDataFrame([(10,)], "c_custkey long") \
        .write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame([(1,), (7,)], "l_orderkey long") \
        .write.parquet(f"{sf}/lineitem.parquet")        # 7 is an orphan
    spark.createDataFrame([(1, "abc", 3), (2, "abc", 99)],
                          "doc_id long, text string, n_chars long") \
        .write.parquet(f"{sf}/documents.parquet")
    got = {r.constraint: (r.n_checked, r.n_violations)
           for r in QUERIES["dq_constraint_report"](spark, sf).collect()}
    assert got == {
        "events.event_id unique": (3, 1),
        "events.user_id not null": (3, 1),
        "events.event_type in domain": (3, 1),
        "events.value non-negative": (3, 1),
        "orders.o_custkey in customer": (2, 1),
        "lineitem.l_orderkey in orders": (2, 1),
        "documents.n_chars = len(text)": (2, 1),
    }


def test_containment_detects_planted_quote(spark):
    """A doc that verbatim-quotes another must be flagged by the
    containment operator (inner = quoted doc) even though symmetric
    Jaccard similarity is low."""
    from data_ingestion_challenge_spark.operators.dedup import (
        winnow_fingerprints,
    )
    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id bigint, text string")
    fps = winnow_fingerprints(docs, n=3, w=4).select(
        "doc_id", "fp_hash").distinct()
    inner = {r["fp_hash"] for r in fps.where("doc_id = 1").collect()}
    outer = {r["fp_hash"] for r in fps.where("doc_id = 2").collect()}
    assert inner, "quoted doc produced no fingerprints"
    assert inner <= outer, "every inner fingerprint must appear in outer"


def test_substring_decontamination_flags_eval_quote(spark):
    """decontaminate_substring marks exactly the corpus docs sharing a
    ≥6-word verbatim run with the eval slice on the real table."""
    from data_ingestion_challenge_spark.plans import QUERIES
    rows = QUERIES["decontaminate_substring"](spark, SF_DIR).collect()
    assert rows
    assert all((r["n_shared"] > 0) == r["contaminated"] for r in rows)
    assert all(r["n_shared"] <= r["n_fps"] for r in rows)


def test_char_gram_exactness_vs_bruteforce(spark):
    """char_gram_hashes is a complete any-position index: two texts
    share a k-gram hash iff they share a ≥k-char verbatim run —
    checked against a brute-force python substring scan."""
    from data_ingestion_challenge_spark.operators.dedup import (
        char_gram_hashes,
    )
    k = 8
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fix jumped the gun entirely",
        3: "xyzzyplughfoobarbazqux",
        4: "completely unrelated words here now",
        5: "zz the lazy dogs bark xyzzyplugh",
    }
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id bigint, text string")
    grams = {d: set() for d in texts}
    for r in char_gram_hashes(docs, k=k).collect():
        grams[r["doc_id"]].add(r["gh"])
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            ta, tb = texts[a], texts[b]
            brute = any(ta[i:i + k] in tb
                        for i in range(len(ta) - k + 1))
            assert bool(grams[a] & grams[b]) == brute, (a, b)


def test_substring_exact_catches_unaligned_short_runs(spark):
    """The exact variant's reason to exist: a verbatim run that is
    (a) shorter than 6 words and (b) not word-aligned is invisible to
    the winnow-based gate but flagged by the char-level index."""
    from data_ingestion_challenge_spark.operators.dedup import (
        char_gram_hashes, winnow_fingerprints,
    )
    # eval doc 0; corpus doc 1 embeds a 24-char run of it MID-WORD
    # ("...razorQUOTED RUN HEREknife...") — word tokens all differ.
    run = "QUOTEDVERBATIMRUN12345678"
    eval_doc = "irrelevant prefix " + run + " irrelevant suffix"
    corpus_doc = "razor" + run + "knife and other unrelated words"
    docs = spark.createDataFrame(
        [(0, eval_doc), (1, corpus_doc)], "doc_id bigint, text string")
    g = char_gram_hashes(docs, k=20)
    ev = {r["gh"] for r in g.where("doc_id = 0").collect()}
    co = {r["gh"] for r in g.where("doc_id = 1").collect()}
    assert ev & co, "char-level index must flag the unaligned run"
    fps = winnow_fingerprints(docs, n=3, w=4).select(
        "doc_id", "fp_hash").distinct()
    evf = {r["fp_hash"] for r in fps.where("doc_id = 0").collect()}
    cof = {r["fp_hash"] for r in fps.where("doc_id = 1").collect()}
    assert not (evf & cof), \
        "winnow gate should NOT see this run (word tokens differ)"


def test_substring_exact_registered_query(spark):
    """The registered query's verdict columns are internally
    consistent on the real table."""
    from data_ingestion_challenge_spark.plans import QUERIES
    rows = QUERIES["decontaminate_substring_exact"](spark, SF_DIR).collect()
    assert rows
    assert all((r["n_shared"] > 0) == r["contaminated"] for r in rows)
    assert all(r["n_shared"] <= r["n_grams"] for r in rows)


def test_multiprobe_recall_dominates_single_bucket(spark, cat):
    """Multi-probe candidates are a superset of the single-bucket
    candidates (probe set contains the own bucket), so recall@5 vs
    brute force must be >= single-bucket LSH recall, per query."""
    from data_ingestion_challenge_spark.operators import similarity as S
    emb = cat.embeddings
    brute = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, 10, 5).collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in S.lsh_topk(emb, 10, 5, bits=4).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in S.lsh_multiprobe_topk(emb, 10, 5, bits=4).collect()}
    assert len(multi & brute) >= len(single & brute), \
        "multi-probe lost recall vs single bucket"
