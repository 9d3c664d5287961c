"""TxnTable.changes(since_version) — the CDC read for the LSM ingest
path: net upserts (run histories) / net increments (delta histories)
since a high-water-mark version, fold-invariant where attribution is
possible and TYPED refusals where it is not (boundary-crossing folds,
content-changing merges, expired records)."""

from __future__ import annotations

import pytest

from data_ingestion_challenge_spark.txn import TxnTable


def _mk(spark, tmp_path, name="t", schema="k long, v long", rows=()):
    return TxnTable.create(
        spark, str(tmp_path / name),
        spark.createDataFrame(list(rows), schema), key="k",
        n_buckets=2)


def _rows(t_or_df):
    df = t_or_df.read() if hasattr(t_or_df, "read") else t_or_df
    return {r.k: r.v for r in df.collect()}


def test_changes_net_upserts_since_version(spark, tmp_path):
    """Run history: changes(V) = newest row per key among commits
    after V — shadowing inside the window resolves to the newest row,
    keys untouched since V never appear, and an upsert of a
    pre-boundary key appears with its new value."""
    t = _mk(spark, tmp_path, rows=[(1, 10), (2, 20)])
    v0 = t.version()
    t.append_run(spark.createDataFrame([(2, 21), (3, 30)],
                                       "k long, v long"))
    t.append_run(spark.createDataFrame([(3, 31), (4, 40)],
                                       "k long, v long"))
    assert _rows(t.changes(v0)) == {2: 21, 3: 31, 4: 40}
    # intermediate boundary
    assert _rows(t.changes(v0 + 1)) == {3: 31, 4: 40}
    # at head: empty, schema intact
    head = t.changes(t.version())
    assert head.count() == 0 and head.columns == ["k", "v"]
    # since 0: everything, create rows included
    assert _rows(t.changes(0)) == {1: 10, 2: 21, 3: 31, 4: 40}


def test_changes_delta_sums_increments(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=[(1, 100)])
    v0 = t.version()
    for inc in ([(1, 5), (2, 7)], [(1, 3), (2, -2)]):
        t.append_delta(spark.createDataFrame(inc, "k long, v long"))
    assert _rows(t.changes(v0)) == {1: 8, 2: 5}
    assert _rows(t) == {1: 108, 2: 5}


def test_changes_fold_invariant_inside_window(spark, tmp_path):
    """A stepped fold of wholly post-boundary generations substitutes
    its output: changes(V) is identical before and after the fold."""
    t = _mk(spark, tmp_path, rows=[(i, 0) for i in range(30)])
    v0 = t.version()
    for j in range(3):
        t.append_run(spark.createDataFrame(
            [(100 + j, j), (5, 50 + j)], "k long, v long"))
    before = _rows(t.changes(v0))
    assert before == {100: 0, 101: 1, 102: 2, 5: 52}
    assert t.compact_runs(level="auto") is not None
    assert _rows(t.changes(v0)) == before


def test_changes_boundary_crossing_fold_refuses(spark, tmp_path):
    """A fold mixing pre- and post-boundary generations into one file
    makes attribution impossible — typed refusal, not wrong rows."""
    t = _mk(spark, tmp_path, rows=[])
    t.append_run(spark.createDataFrame([(1, 1)], "k long, v long"))
    t.append_run(spark.createDataFrame([(2, 2)], "k long, v long"))
    mid = t.version() - 1  # boundary between the two appends
    t.append_run(spark.createDataFrame([(3, 3)], "k long, v long"))
    # the auto ladder folds all three same-size generations together
    assert t.compact_runs(level="auto") is not None
    with pytest.raises(ValueError, match="crossed"):
        t.changes(mid)
    # a fresh boundary AFTER the fold works again
    v1 = t.version()
    t.append_run(spark.createDataFrame([(9, 9)], "k long, v long"))
    assert _rows(t.changes(v1)) == {9: 9}


def test_changes_full_fold_semantics(spark, tmp_path):
    """A content-preserving full fold of PRE-boundary state is
    ignored; one that swallows post-boundary appends refuses."""
    t = _mk(spark, tmp_path, rows=[(1, 10)])
    t.append_run(spark.createDataFrame([(2, 20)], "k long, v long"))
    t.compact_runs(level="full")
    v0 = t.version()
    t.append_run(spark.createDataFrame([(3, 30)], "k long, v long"))
    assert _rows(t.changes(v0)) == {3: 30}
    t.compact_runs(level="full")  # swallows the post-v0 append
    with pytest.raises(ValueError, match="full fold.*crossed"):
        t.changes(v0)


def test_changes_merge_commit_refuses_typed(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=[(1, 10)])
    v0 = t.version()
    t.merge_into(spark.createDataFrame([(1, 11)], "k long, v long"))
    with pytest.raises(ValueError, match="no row-level change"):
        t.changes(v0)


def test_changes_below_expired_log_refuses_typed(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=[(1, 10)])
    t.append_run(spark.createDataFrame([(2, 20)], "k long, v long"))
    t.checkpoint()
    t.expire_log()
    with pytest.raises(ValueError, match="re-baseline"):
        t.changes(0)


def test_changes_drives_incremental_consumer(spark, tmp_path):
    """The intended composition: a consumer holding a high-water mark
    applies changes() per drain; on a boundary-crossing fold it takes
    the documented remedy (re-baseline from a snapshot read) and
    keeps going — the replica equals the table at the end either
    way.  The mid-stream fold here DOES cross (base-less auto
    escalates to a full fold), so the refusal path is exercised, and
    a fold inside one consumer window (between reads) is handled
    transparently."""
    t = _mk(spark, tmp_path, rows=[])
    replica: dict[int, int] = {}
    hwm = t.version()
    rebaselined = 0
    for b in range(8):
        t.append_run(spark.createDataFrame(
            [(b % 3, b * 10), (10 + b, b)], "k long, v long"))
        if b == 4:
            t.compact_runs(level="auto")
        new_hwm = t.version()
        try:
            replica.update(_rows(t.changes(hwm)))
        except ValueError:
            replica = _rows(t.read(version=new_hwm))
            rebaselined += 1
        hwm = new_hwm
    assert replica == _rows(t)
    assert rebaselined == 1  # exactly the crossing fold


def test_corpus_changes_across_admission_drains(spark, tmp_path):
    """End to end on the REAL sink: drain 1 establishes the
    high-water mark; drain 2's corpus_changes(hwm) is exactly the
    newly admitted docs (corpus dups of drain 1 never appear — they
    were rejected, not upserted)."""
    from data_ingestion_challenge_spark.api import Engine
    from data_ingestion_challenge_spark.streaming.admission import (
        run_document_admission,
    )
    from tests.conftest import SF_DIR

    eng = Engine(SF_DIR, spark=spark)
    d = {k: str(tmp_path / k) for k in
         ("watch", "corpus", "postings", "log", "sizes", "ckpt")}
    batch1 = [(i, f"first drain document number {i} " * 4, "en", "a")
              for i in range(10)]
    (spark.createDataFrame(
        batch1, "doc_id long, text string, lang string, source string")
     .coalesce(1).write.mode("overwrite").json(d["watch"]))
    t = run_document_admission(
        spark, d["watch"], d["corpus"], d["postings"], d["log"],
        d["ckpt"], sizes_dir=d["sizes"])
    hwm = t.version()
    # drain 2: 5 new docs + 1 corpus dup (same text as doc 0)
    batch2 = [(100 + i, f"second drain document number {i} " * 4,
               "en", "b") for i in range(5)]
    batch2.append((200, batch1[0][1], "en", "b"))
    (spark.createDataFrame(
        batch2, "doc_id long, text string, lang string, source string")
     .coalesce(1).write.mode("append").json(d["watch"]))
    run_document_admission(
        spark, d["watch"], d["corpus"], d["postings"], d["log"],
        d["ckpt"], sizes_dir=d["sizes"])
    got = {r.doc_id for r in
           eng.corpus_changes(d["corpus"], hwm).select("doc_id")
           .collect()}
    assert got == {100, 101, 102, 103, 104}


def test_changes_beyond_head_refuses_typed(spark, tmp_path):
    """A high-water mark beyond the log head is always consumer-state
    corruption (wrong path, or a rebuilt table with a reset version
    counter) — typed refusal, never a silent 'no changes'."""
    t = _mk(spark, tmp_path, rows=[(1, 10)])
    assert t.changes(t.version()).count() == 0  # at head: legit no-op
    with pytest.raises(ValueError, match="beyond the log head"):
        t.changes(t.version() + 1)


# ------------------------------- bounded windows (until=, r12)


def test_changes_until_bounds_the_window(spark, tmp_path):
    """A consumer steps through history in pinned version windows:
    applying windowed upserts in order equals the one-shot read, each
    window is reproducible, and the window end excludes later
    commits."""
    t = _mk(spark, tmp_path, rows=[(1, 10)])
    v0 = t.version()
    t.append_run(spark.createDataFrame([(1, 11), (2, 20)],
                                       "k long, v long"))
    v1 = t.version()
    t.append_run(spark.createDataFrame([(2, 21), (3, 30)],
                                       "k long, v long"))
    v2 = t.version()
    w1, w2 = _rows(t.changes(v0, v1)), _rows(t.changes(v1, v2))
    assert w1 == {1: 11, 2: 20} and w2 == {2: 21, 3: 30}
    replay = dict(w1)
    replay.update(w2)  # windows applied in order == full-range read
    assert replay == _rows(t.changes(v0))
    # reproducible: the same pinned window re-reads identically even
    # after new commits land past it
    t.append_run(spark.createDataFrame([(4, 40)], "k long, v long"))
    assert _rows(t.changes(v0, v1)) == w1
    # empty window and delta windows
    assert t.changes(v1, v1).count() == 0


def test_changes_until_delta_windows_sum(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=[(1, 100)])
    v0 = t.version()
    t.append_delta(spark.createDataFrame([(1, 5)], "k long, v long"))
    v1 = t.version()
    t.append_delta(spark.createDataFrame([(1, 3), (2, 7)],
                                         "k long, v long"))
    v2 = t.version()
    assert _rows(t.changes(v0, v1)) == {1: 5}
    assert _rows(t.changes(v1, v2)) == {1: 3, 2: 7}


def test_changes_until_beyond_head_refuses_typed(spark, tmp_path):
    t = _mk(spark, tmp_path, rows=[(1, 1)])
    with pytest.raises(ValueError, match="beyond the log head"):
        t.changes(0, until_version=t.version() + 5)


def test_changes_until_window_consumed_by_fold_refuses(spark,
                                                       tmp_path):
    """A bounded window whose run files a LATER full fold + vacuum
    consumed refuses typed instead of failing mid-scan — the
    consumer's remedy is a head read or a fresh baseline."""
    t = _mk(spark, tmp_path, rows=[(1, 1)])
    v0 = t.version()
    t.append_run(spark.createDataFrame([(2, 2)], "k long, v long"))
    v1 = t.version()
    t.compact_runs(level="full")
    t.vacuum(retain_orphans_s=0)
    with pytest.raises(ValueError,
                       match="consumed by a later fold"):
        t.changes(v0, until_version=v1).collect()
