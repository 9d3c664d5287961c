"""Engine.health_report — the one-call ops surface folding the
corpus-table ladder, posting-store audit, admission-lease state, IVF
occupancy drift, and signature-table size into a single tidy frame a
pipeline operator can alert on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_challenge_spark.api import Engine


@pytest.fixture()
def pipeline(spark, cat, tmp_path):
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    cat.documents.where(F.col("doc_id") < 400).write.parquet(
        str(base_dir / "documents.parquet"))
    cat.embeddings.where(F.col("vec_id") < 400).write.parquet(
        str(base_dir / "embeddings.parquet"))
    eng = Engine(str(base_dir), spark=spark)
    d = {k: str(tmp_path / k) for k in
         ("watch", "corpus", "postings", "log", "sizes", "ckpt")}
    docs = [(400 + i, f"health report document {i} body hx{i}a "
                      f"hx{i}b hx{i}c", "en", "t") for i in range(20)]
    (spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string")
     .coalesce(1).write.mode("append").json(d["watch"]))
    return eng, d


def _as_map(df):
    return {(r.component, r.metric): (r.value, r.note)
            for r in df.collect()}


def test_health_report_full_pipeline(spark, cat, pipeline, tmp_path):
    eng, d = pipeline
    pt, st, it = "health_post", "health_sig", "health_ivf"
    ivf_path = str(tmp_path / "ivf")
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, str(tmp_path / "sig"),
                                   k=16)
        eng.materialize_ivf(it, ivf_path)
        eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"],
            sig_table=st, sig_path=str(tmp_path / "sig"))
        rep = eng.health_report(
            table_path=d["corpus"], postings_dir=d["postings"],
            sizes_dir=d["sizes"], ivf_table=it, ivf_path=ivf_path,
            sig_table=st)
        assert rep.columns == ["component", "metric", "value", "note"]
        m = _as_map(rep)
        # corpus ladder: one drain committed, runs live (append mode)
        assert m[("corpus_table", "version")][0] >= 1
        assert (m[("corpus_table", "base_rows")][0]
                + m[("corpus_table", "run_rows")][0]) == 20
        # posting store: all runs committed, lease free after drain
        assert m[("posting_store", "uncommitted_runs")][0] == 0
        assert m[("posting_store", "posting_rows")][0] > 0
        assert m[("posting_store", "lease_state")][0] == 0.0
        assert m[("posting_store", "lease_state")][1] == "free"
        # IVF: bootstrap occupancy vs frozen design
        assert m[("ivf_index", "n_assignments")][0] == 400 * 4
        assert m[("ivf_index", "design_occupancy")][0] > 0
        assert m[("ivf_index", "occupancy_drift")][0] > 0
        # signature table: base 400 + the 20 admitted docs
        assert m[("signature_table", "k")][0] == 16
        assert m[("signature_table", "n_docs")][0] == 420
    finally:
        for t in (pt, st, it):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_health_report_components_optional(spark, pipeline, tmp_path):
    """Only the passed components are audited — a deployment without
    an IVF index gets no ivf rows and no table-not-found error."""
    eng, d = pipeline
    corpus = eng.ingest_documents(
        d["watch"], d["corpus"], d["postings"], d["log"], d["ckpt"],
        sizes_dir=d["sizes"])
    rep = eng.health_report(table_path=d["corpus"],
                            postings_dir=d["postings"],
                            sizes_dir=d["sizes"])
    comps = {r.component for r in rep.collect()}
    assert comps == {"corpus_table", "posting_store"}
    # after a full fold the generation count drops to zero runs
    corpus.compact_runs(level="full")
    m = _as_map(eng.health_report(table_path=d["corpus"]))
    assert m[("corpus_table", "run_generations")][0] == 0
    assert m[("corpus_table", "run_rows")][0] == 0


def test_health_report_flags_stale_lease(spark, pipeline):
    eng, d = pipeline
    eng.ingest_documents(
        d["watch"], d["corpus"], d["postings"], d["log"], d["ckpt"],
        sizes_dir=d["sizes"])
    from data_ingestion_challenge_spark.streaming.admission import (
        _LEASE,
    )
    with open(os.path.join(d["postings"], _LEASE), "w") as f:
        f.write("999999999")  # no such pid
    m = _as_map(eng.health_report(postings_dir=d["postings"],
                                  table_path=d["corpus"]))
    assert m[("posting_store", "lease_state")][0] == 2.0
    # the audit's own lease acquisition stole the dead holder's file
    assert not os.path.exists(os.path.join(d["postings"], _LEASE))


def test_health_report_live_lease_skips_store_audit(spark, pipeline):
    """While a drain HOLDS the lease the store scan would raise
    ConcurrentAdmissionError — health must stay readable: it reports
    the live lease and an audit_skipped row instead of crashing."""
    eng, d = pipeline
    eng.ingest_documents(
        d["watch"], d["corpus"], d["postings"], d["log"], d["ckpt"],
        sizes_dir=d["sizes"])
    from data_ingestion_challenge_spark.streaming.admission import (
        _LEASE,
    )
    lease = os.path.join(d["postings"], _LEASE)
    with open(lease, "w") as f:
        f.write(str(os.getpid()))  # a LIVE holder (this process)
    try:
        m = _as_map(eng.health_report(postings_dir=d["postings"],
                                      table_path=d["corpus"]))
        assert m[("posting_store", "lease_state")][0] == 1.0
        assert m[("posting_store", "audit_skipped")][0] == 1.0
        assert ("posting_store", "n_runs") not in m
        # the corpus-table block is lease-free and still reported
        assert ("corpus_table", "version") in m
    finally:
        os.unlink(lease)


def test_health_report_empty_ivf_table_drift_zero(spark, pipeline,
                                                  tmp_path):
    """An empty assignment table aggregates to NULLs — drift must be
    0.0, not a float(None) crash."""
    import json as _json

    eng, _ = pipeline
    table, path = "health_ivf_empty", str(tmp_path / "ivf_empty")
    try:
        (spark.createDataFrame(
            [], "vec_id long, embedding array<float>, _cell int")
         .write.option("path", path)
         .bucketBy(4, "_cell").sortBy("_cell").saveAsTable(table))
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
            _json.dump({"nprobe": 4, "cell": 128,
                        "centroids": [[0.0] * 4]}, f)
        m = _as_map(eng.health_report(ivf_table=table, ivf_path=path))
        assert m[("ivf_index", "occupancy_drift")][0] == 0.0
        assert m[("ivf_index", "n_assignments")][0] in (0.0, None)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
