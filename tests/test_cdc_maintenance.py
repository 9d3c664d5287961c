"""CDC-fed index maintenance in Engine.ingest_documents (r12): after
the first drain baselines an index, subsequent drains feed
extend_signatures / extend_ivf from TxnTable.changes(hwm) — O(changed
files), never a corpus rescan — with the full-corpus anti-join kept as
the fallback for exactly the cases CDC attribution is unavailable
(no mark / crash marker / typed changes() refusal) and with pending
vectors never silently dropped.  Every path must be value-EQUIVALENT
to the anti-join result."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_challenge_spark.api import (
    Engine, _load_index_hwm, _store_index_hwm,
)
from data_ingestion_challenge_spark.txn import TxnTable


@pytest.fixture()
def split_engine(spark, cat, tmp_path):
    """An Engine over the first 400 sf0.001 docs (bootstrap corpus
    for the materialized indexes) + admission scratch dirs."""
    base_dir = tmp_path / "sf_base"
    base_dir.mkdir()
    cat.documents.where(F.col("doc_id") < 400).write.parquet(
        str(base_dir / "documents.parquet"))
    cat.embeddings.where(F.col("vec_id") < 400).write.parquet(
        str(base_dir / "embeddings.parquet"))
    eng = Engine(str(base_dir), spark=spark)
    d = {k: str(tmp_path / k) for k in
         ("watch", "corpus", "postings", "log", "sizes", "ckpt")}
    return eng, d


def _stage_drop(spark, watch: str, lo: int, hi: int):
    docs = [(i, f"cdc maintenance document number {i} "
                f"with distinct words w{i}a w{i}b w{i}c", "en", "t")
            for i in range(lo, hi)]
    (spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string")
     .coalesce(1).write.mode("append").json(watch))


def _drain_sig(eng, d, st, sig_path):
    return eng.ingest_documents(
        d["watch"], d["corpus"], d["postings"], d["log"], d["ckpt"],
        sizes_dir=d["sizes"], sig_table=st, sig_path=sig_path)


def _sig_rows(spark, st):
    return sorted(tuple(r) for r in spark.table(st).collect())


def _oneshot_sigs(spark, eng, corpus_table, st):
    """Reference: base docs + everything admitted, signed one-shot."""
    from data_ingestion_challenge_spark.operators.dedup import (
        _postings, build_signatures,
    )
    base = eng.catalog.documents.select("doc_id", "text")
    admitted = corpus_table.read().select("doc_id", "text")
    post = _postings(base.unionByName(admitted), 3)
    out = sorted(tuple(r) for r in
                 build_signatures(post, 16).collect())
    post.unpersist()
    return out


def test_sig_cdc_path_after_baseline_equivalent_and_file_bounded(
        spark, split_engine, tmp_path, monkeypatch):
    """Drain 1 baselines via the anti-join and writes the mark;
    drain 2 rides changes(hwm): result identical to a one-shot
    rebuild, the mark advances to the new head, the CDC read's
    inputFiles are disjoint from the pre-drain snapshot's (bounded by
    the changed files), and changes() was actually invoked."""
    eng, d = split_engine
    pt, st = "cdc_sig_post1", "cdc_sig_tbl1"
    sig_path = str(tmp_path / "sig")
    calls = []
    orig = TxnTable.changes

    def _spy(self, since_version, **kw):
        calls.append(since_version)
        return orig(self, since_version, **kw)

    monkeypatch.setattr(TxnTable, "changes", _spy)
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, sig_path, k=16)
        assert _load_index_hwm(sig_path) is None
        _stage_drop(spark, d["watch"], 400, 420)
        corpus = _drain_sig(eng, d, st, sig_path)
        v1 = corpus.version()
        hwm = _load_index_hwm(sig_path)
        assert hwm == {"table_path": os.path.abspath(d["corpus"]),
                       "version": v1, "in_progress": False,
                       "pending": []}
        assert not calls  # first drain: no mark yet -> anti-join
        pre_files = set(corpus.read().inputFiles())

        _stage_drop(spark, d["watch"], 420, 440)
        corpus = _drain_sig(eng, d, st, sig_path)
        v2 = corpus.version()
        assert v2 > v1
        assert calls == [v1]  # second drain rode CDC
        assert _load_index_hwm(sig_path)["version"] == v2
        assert not _load_index_hwm(sig_path)["in_progress"]
        # O(changes) files: the CDC read never touches the old runs.
        chg_files = set(orig(corpus, v1).inputFiles())
        assert chg_files and chg_files.isdisjoint(pre_files)
        assert _sig_rows(spark, st) == _oneshot_sigs(spark, eng,
                                                     corpus, st)
    finally:
        for t in (pt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sig_crash_marker_forces_antijoin_and_heals(
        spark, split_engine, tmp_path):
    """A crash between the CDC extend and the mark advance leaves
    in_progress=True with the rows ALREADY appended: the next drain
    must take the anti-join (which skips them), append no duplicates,
    and rewrite a clean mark at the new head."""
    eng, d = split_engine
    pt, st = "cdc_sig_post2", "cdc_sig_tbl2"
    sig_path = str(tmp_path / "sig")
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, sig_path, k=16)
        _stage_drop(spark, d["watch"], 400, 420)
        corpus = _drain_sig(eng, d, st, sig_path)
        v1 = corpus.version()
        # Simulate the crash window: doc 420 was extended by a CDC
        # attempt that died before advancing the mark.
        pre_crash = spark.createDataFrame(
            [(420, "cdc maintenance document number 420 "
                   "with distinct words w420a w420b w420c")],
            "doc_id long, text string")
        eng.extend_signatures(pre_crash, st, sig_path)
        _store_index_hwm(sig_path, d["corpus"], v1, in_progress=True)

        _stage_drop(spark, d["watch"], 420, 440)
        corpus = _drain_sig(eng, d, st, sig_path)
        hwm = _load_index_hwm(sig_path)
        assert hwm["version"] == corpus.version()
        assert not hwm["in_progress"]
        per_doc = (spark.table(st).groupBy("doc_id").count()
                   .where("count > 1").count())
        assert per_doc == 0  # the pre-crash row was not re-appended
        assert _sig_rows(spark, st) == _oneshot_sigs(spark, eng,
                                                     corpus, st)
    finally:
        for t in (pt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sig_cdc_boundary_crossing_fold_falls_back(
        spark, split_engine, tmp_path):
    """A full fold that crossed the mark's boundary makes changes()
    refuse typed; the drain must re-baseline through the anti-join —
    same final table, mark advanced past the fold."""
    eng, d = split_engine
    pt, st = "cdc_sig_post3", "cdc_sig_tbl3"
    sig_path = str(tmp_path / "sig")
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, sig_path, k=16)
        _stage_drop(spark, d["watch"], 400, 420)
        corpus = _drain_sig(eng, d, st, sig_path)
        v1 = corpus.version()
        _stage_drop(spark, d["watch"], 420, 440)
        corpus = _drain_sig(eng, d, st, sig_path)
        # Fold the run ladder, then rewind the mark to v1 so the fold
        # CROSSES the boundary (the stale-consumer scenario).
        corpus.compact_runs(level="full")
        with pytest.raises(ValueError):
            corpus.changes(v1)
        _store_index_hwm(sig_path, d["corpus"], v1, in_progress=False)

        _stage_drop(spark, d["watch"], 440, 460)
        corpus = _drain_sig(eng, d, st, sig_path)
        hwm = _load_index_hwm(sig_path)
        assert hwm["version"] == corpus.version()
        assert not hwm["in_progress"]
        assert _sig_rows(spark, st) == _oneshot_sigs(spark, eng,
                                                     corpus, st)
    finally:
        for t in (pt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_pending_vectors_survive_cdc(spark, cat, split_engine,
                                         tmp_path):
    """A doc whose embedding arrives AFTER its drain must not be
    dropped by the mark advance: the CDC path parks the straggler ids
    on the mark's bounded ``pending`` list (the mark still advances),
    and the next call re-candidates them — the late vector is indexed
    the drain it lands."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.similarity import (
        probe_against_matrix,
    )
    eng, d = split_engine
    table, path = "cdc_ivf_tbl1", str(tmp_path / "ivf")
    vecs_path = str(tmp_path / "vectors.parquet")
    try:
        eng.materialize_ivf(table, path)
        _stage_drop(spark, d["watch"], 400, 420)
        (cat.embeddings
         .where((F.col("vec_id") >= 400) & (F.col("vec_id") < 420))
         .select("vec_id", "embedding")
         .write.mode("overwrite").parquet(vecs_path))
        eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        hwm = _load_index_hwm(path)
        assert hwm and not hwm["in_progress"]  # full coverage

        # Drop 2, but the vector service is BEHIND: ids 420-429 only.
        _stage_drop(spark, d["watch"], 420, 440)
        (cat.embeddings
         .where((F.col("vec_id") >= 400) & (F.col("vec_id") < 430))
         .select("vec_id", "embedding")
         .write.mode("overwrite").parquet(vecs_path))
        eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        hwm = _load_index_hwm(path)
        # the mark ADVANCES; the stragglers ride its pending list
        assert not hwm["in_progress"]
        assert hwm["pending"] == list(range(430, 440))
        indexed = {r[0] for r in spark.table(table)
                   .select("vec_id").distinct()
                   .where("vec_id >= 400").collect()}
        assert indexed == set(range(400, 430))

        # Vector service catches up; nothing new to drain — the
        # next CDC pass re-candidates the pending ids, indexes the
        # late vectors, and empties the list.
        (cat.embeddings
         .where((F.col("vec_id") >= 400) & (F.col("vec_id") < 440))
         .select("vec_id", "embedding")
         .write.mode("overwrite").parquet(vecs_path))
        corpus = eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        hwm = _load_index_hwm(path)
        assert hwm["version"] == corpus.version()
        assert not hwm["in_progress"] and hwm["pending"] == []
        got = spark.table(table).where("vec_id >= 400")
        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        C = np.asarray(meta["centroids"], dtype=np.float64)
        expect = probe_against_matrix(
            spark.read.parquet(vecs_path), C,
            np.linalg.norm(C, axis=1), meta["nprobe"])
        assert ({(r["vec_id"], r["_cell"]) for r in got.collect()}
                == {(r["vec_id"], r["_cell"]) for r in
                    expect.collect()})
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ivf_cdc_second_drain_equivalent(spark, cat, split_engine,
                                         tmp_path, monkeypatch):
    """Happy-path IVF CDC: second drain rides changes(hwm) and lands
    the same assignments a one-shot probe of all admitted vectors
    would — with changes() verifiably invoked exactly once."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.similarity import (
        probe_against_matrix,
    )
    eng, d = split_engine
    table, path = "cdc_ivf_tbl2", str(tmp_path / "ivf")
    vecs_path = str(tmp_path / "vectors.parquet")
    calls = []
    orig = TxnTable.changes

    def _spy(self, since_version, **kw):
        calls.append(since_version)
        return orig(self, since_version, **kw)

    monkeypatch.setattr(TxnTable, "changes", _spy)
    try:
        eng.materialize_ivf(table, path)
        _stage_drop(spark, d["watch"], 400, 420)
        (cat.embeddings.where((F.col("vec_id") >= 400)
                              & (F.col("vec_id") < 440))
         .select("vec_id", "embedding")
         .write.mode("overwrite").parquet(vecs_path))
        corpus = eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        v1 = corpus.version()
        assert not calls
        _stage_drop(spark, d["watch"], 420, 440)
        corpus = eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        assert calls == [v1]
        assert _load_index_hwm(path)["version"] == corpus.version()
        got = spark.table(table).where("vec_id >= 400")
        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        C = np.asarray(meta["centroids"], dtype=np.float64)
        expect = probe_against_matrix(
            spark.read.parquet(vecs_path), C,
            np.linalg.norm(C, axis=1), meta["nprobe"])
        assert ({(r["vec_id"], r["_cell"]) for r in got.collect()}
                == {(r["vec_id"], r["_cell"]) for r in
                    expect.collect()})
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cdc_upsert_never_duplicates_index_rows(spark, split_engine,
                                                tmp_path):
    """A RE-COMMITTED doc_id (latest-wins replacement: same id, new
    non-dup text) comes back through changes() — the CDC path's
    anti-join against the index's id column must keep the extend
    contract: exactly one signature row per doc_id, ever."""
    eng, d = split_engine
    pt, st = "cdc_sig_up", "cdc_sig_up_tbl"
    sig_path = str(tmp_path / "sig")
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, sig_path, k=16)
        _stage_drop(spark, d["watch"], 400, 420)
        _drain_sig(eng, d, st, sig_path)          # baseline + mark
        # same doc_id 405, entirely different (non-near-dup) text:
        # the admission screen admits it, the txn commit upserts it
        upsert = [(405, "completely different replacement body "
                        "qq1 qq2 qq3 qq4 qq5 qq6 qq7", "en", "t")]
        (spark.createDataFrame(
            upsert,
            "doc_id long, text string, lang string, source string")
         .coalesce(1).write.mode("append").json(d["watch"]))
        corpus = _drain_sig(eng, d, st, sig_path)  # CDC path
        assert {r.doc_id for r in
                corpus.read().where("doc_id = 405").collect()} == {405}
        dup = (spark.table(st).groupBy("doc_id").count()
               .where("count > 1").count())
        assert dup == 0  # one signature row per doc, never two
        hwm = _load_index_hwm(sig_path)
        assert hwm["version"] == corpus.version()
    finally:
        for t in (pt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_murmur3_int_matches_spark_hash(spark):
    """The IntegerType bucket hash (api._murmur3_int, routing the IVF
    index's _cell buckets) must be bit-equal to Spark SQL hash() on an
    INT column — the same enforcement serving's LongType twin carries."""
    from data_ingestion_challenge_spark.api import _murmur3_int
    vals = [0, 1, -1, 2, 7, 31, 127, 1024, 2**31 - 1, -2**31,
            123456789, -987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r["v"]: r["h"] for r in
           df.selectExpr("v", "hash(v) AS h").collect()}
    for v in vals:
        assert _murmur3_int(v) == got[v], v


def test_sig_cdc_antijoin_is_bucket_pruned(spark, split_engine,
                                           tmp_path, monkeypatch):
    """The CDC drain's upsert-safety check must read ONLY the bucket
    files the batch's candidate ids route to — never the full
    signature table — while staying value-equivalent to the full
    anti-join (the one-shot rebuild comparison)."""
    from data_ingestion_challenge_spark.api import Engine as _E
    from data_ingestion_challenge_spark.serving import (
        _BUCKET_FILE_RE, _murmur3_long,
    )
    eng, d = split_engine
    pt, st = "cdc_sig_pr", "cdc_sig_pr_tbl"
    sig_path = str(tmp_path / "sig")
    seen = []
    orig = _E._pruned_index_keys

    def _spy(self, table, path, key_col, buckets):
        df = orig(self, table, path, key_col, buckets)
        seen.append((table, key_col, set(buckets), df))
        return df

    monkeypatch.setattr(_E, "_pruned_index_keys", _spy)
    try:
        eng.materialize_postings(pt, str(tmp_path / "post"))
        eng.materialize_signatures(pt, st, sig_path, k=16)
        _stage_drop(spark, d["watch"], 400, 420)
        _drain_sig(eng, d, st, sig_path)          # baseline (anti-join)
        assert not seen                           # no pruning pre-mark
        _stage_drop(spark, d["watch"], 420, 424)  # small CDC batch
        corpus = _drain_sig(eng, d, st, sig_path)
        sig_calls = [c for c in seen if c[0] == st]
        assert len(sig_calls) == 1
        _, key_col, buckets, df = sig_calls[0]
        assert key_col == "doc_id"
        nb = eng._table_bucket_count(st)
        expect = {_murmur3_long(i) % nb for i in range(420, 424)}
        assert buckets == expect
        # the read touched ONLY those buckets' files, and skipped some
        read = {os.path.basename(f) for f in df.inputFiles()}
        all_files = {fn for fn in os.listdir(sig_path)
                     if _BUCKET_FILE_RE.match(fn)}
        assert read <= all_files
        for fn in read:
            assert int(_BUCKET_FILE_RE.match(fn).group(1)) in buckets
        skipped = {fn for fn in all_files
                   if int(_BUCKET_FILE_RE.match(fn).group(1))
                   not in buckets}
        assert skipped, "prune must actually skip index files"
        # equivalence vs the full anti-join result
        assert _sig_rows(spark, st) == _oneshot_sigs(spark, eng,
                                                     corpus, st)
    finally:
        for t in (pt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_cdc_antijoin_is_bucket_pruned(spark, cat, split_engine,
                                           tmp_path, monkeypatch):
    """The IVF CDC drain's 'already indexed?' check must read ONLY
    the bucket files of the cells the candidates probe into under the
    frozen centroid model — and the final index must still equal the
    one-shot probe of all admitted vectors."""
    import numpy as np

    from data_ingestion_challenge_spark.api import (
        Engine as _E, _murmur3_int,
    )
    from data_ingestion_challenge_spark.operators.similarity import (
        probe_against_matrix,
    )
    from data_ingestion_challenge_spark.serving import _BUCKET_FILE_RE
    eng, d = split_engine
    table, path = "cdc_ivf_pr", str(tmp_path / "ivf")
    vecs_path = str(tmp_path / "vectors.parquet")
    seen = []
    orig = _E._pruned_index_keys

    def _spy(self, tbl, pth, key_col, buckets):
        df = orig(self, tbl, pth, key_col, buckets)
        seen.append((tbl, key_col, set(buckets), df))
        return df

    monkeypatch.setattr(_E, "_pruned_index_keys", _spy)
    try:
        eng.materialize_ivf(table, path)
        (cat.embeddings.where((F.col("vec_id") >= 400)
                              & (F.col("vec_id") < 440))
         .select("vec_id", "embedding")
         .write.mode("overwrite").parquet(vecs_path))
        _stage_drop(spark, d["watch"], 400, 420)
        eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        assert not [c for c in seen if c[0] == table]
        _stage_drop(spark, d["watch"], 420, 424)
        eng.ingest_documents(
            d["watch"], d["corpus"], d["postings"], d["log"],
            d["ckpt"], sizes_dir=d["sizes"], vectors_path=vecs_path,
            ivf_table=table, ivf_path=path)
        ivf_calls = [c for c in seen if c[0] == table]
        assert len(ivf_calls) == 1
        _, key_col, buckets, df = ivf_calls[0]
        assert key_col == "vec_id"
        # expected buckets: the candidates' frozen-model probe cells
        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        C = np.asarray(meta["centroids"], dtype=np.float64)
        cand = (spark.read.parquet(vecs_path)
                .where((F.col("vec_id") >= 420)
                       & (F.col("vec_id") < 424)))
        cells = {r[0] for r in
                 probe_against_matrix(cand, C,
                                      np.linalg.norm(C, axis=1),
                                      meta["nprobe"])
                 .select("_cell").distinct().collect()}
        nb = eng._table_bucket_count(table)
        assert buckets == {_murmur3_int(int(c)) % nb for c in cells}
        for f in df.inputFiles():
            m = _BUCKET_FILE_RE.match(os.path.basename(f))
            assert m and int(m.group(1)) in buckets
        # the final index equals the one-shot probe of everything
        got = spark.table(table).where("vec_id >= 400")
        expect = probe_against_matrix(
            spark.read.parquet(vecs_path).where("vec_id < 424"), C,
            np.linalg.norm(C, axis=1), meta["nprobe"])
        assert ({(r["vec_id"], r["_cell"]) for r in got.collect()}
                == {(r["vec_id"], r["_cell"]) for r in
                    expect.collect()})
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
