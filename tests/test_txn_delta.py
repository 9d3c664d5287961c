"""Append-DELTA (aggregate-merge LSM) commit mode for TxnTable: keyed
sum increments land as O(batch) runs; reads fold per key with a plain
commutative SUM (no window — addition is order-free).  The delta twin
of the latest-wins append-run mode, built for accumulate_batch so the
streaming keyed-upsert loop's commit never reads table state."""

from __future__ import annotations

import json
import os

import pytest

from data_ingestion_challenge_spark.txn import TxnTable


def _mk(spark, tmp_path, rows, name="t", n_buckets=4):
    df = spark.createDataFrame(rows, "k long, n long, m int")
    return TxnTable.create(spark, str(tmp_path / name), df, key="k",
                           n_buckets=n_buckets)


def _state(t):
    return {r.k: (r.n, r.m) for r in t.read().collect()}


def test_append_delta_sums_on_read(spark, tmp_path):
    """Deltas add to base totals; duplicate keys WITHIN one batch are
    legal (sums commute); int columns keep their dtype through the
    sum fold; absent keys read as their base row untouched."""
    t = _mk(spark, tmp_path, [(1, 10, 1), (2, 20, 2)])
    t.append_delta(spark.createDataFrame(
        [(1, 5, 1), (1, 5, 1), (3, 7, 3)], "k long, n long, m int"))
    assert _state(t) == {1: (20, 3), 2: (20, 2), 3: (7, 3)}
    assert dict(t.read().dtypes)["m"] == "int"
    # a second run keeps folding
    t.append_delta(spark.createDataFrame(
        [(2, -20, 0)], "k long, n long, m int"))
    assert _state(t)[2] == (0, 2)
    # time travel before the second run
    v2 = {r.k: r.n for r in t.read(version=2).collect()}
    assert v2[2] == 20


def test_delta_schema_and_mixing_guards(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, 10, 1)])
    with pytest.raises(ValueError, match="summed schema"):
        t.append_delta(spark.createDataFrame([(1, 5)],
                                             "k long, n long"))
    t.append_delta(spark.createDataFrame(
        [(1, 5, 0)], "k long, n long, m int"))
    with pytest.raises(NotImplementedError, match="sum-merge"):
        t.append_run(spark.createDataFrame(
            [(9, 9, 9)], "k long, n long, m int"))
    # and the reverse: latest-wins runs refuse deltas
    t2 = _mk(spark, tmp_path, [(1, 10, 1)], name="t2")
    t2.append_run(spark.createDataFrame(
        [(2, 2, 2)], "k long, n long, m int"))
    with pytest.raises(NotImplementedError, match="latest-wins"):
        t2.append_delta(spark.createDataFrame(
            [(1, 5, 0)], "k long, n long, m int"))


def test_accumulate_delta_equals_merge_mode(spark, tmp_path):
    """The same increment stream through commit_mode='delta' and
    'merge' lands the IDENTICAL table; the delta table's commits are
    O(batch) (base files untouched); replay of a committed batch id
    is skipped whole in both modes."""
    incs = [
        [(1, 5), (2, 7)],
        [(1, 3), (3, 11)],
        [(2, 1), (3, 2), (1, 4)],
    ]

    def drive(mode, name):
        t = TxnTable.create(
            spark, str(tmp_path / name),
            spark.createDataFrame([(1, 100), (2, 200)],
                                  "k long, n long"),
            key="k", n_buckets=2)
        for bid, rows in enumerate(incs):
            t.accumulate_batch(
                spark.createDataFrame(rows, "k long, n long"),
                bid, ["n"], app="s", commit_mode=mode)
        # replay: no double count
        t.accumulate_batch(
            spark.createDataFrame(incs[-1], "k long, n long"),
            2, ["n"], app="s", commit_mode=mode)
        return t

    td = drive("delta", "d")
    tm = drive("merge", "m")
    got_d = {r.k: r.n for r in td.read().collect()}
    got_m = {r.k: r.n for r in tm.read().collect()}
    assert got_d == got_m == {1: 112, 2: 208, 3: 13}
    # O(batch): the delta table's base files were never rewritten
    ops = set()
    log_dir = os.path.join(td.path, "_log")
    for f in sorted(os.listdir(log_dir)):
        if f.startswith("v"):
            with open(os.path.join(log_dir, f)) as fh:
                ops.add(json.load(fh).get("op"))
    assert "append-delta" in ops and "merge" not in ops


def test_delta_compact_and_checkpoint_lifecycle(spark, tmp_path):
    """compact_runs(auto) folds delta runs into one delta run
    (record carries delta=true, reads still sum); full fold lands a
    windowless merge-only table; checkpoint+expire carry the delta
    marking (a post-expiry read still sums correctly)."""
    t = _mk(spark, tmp_path, [(1, 10, 0), (2, 20, 0)], n_buckets=2)
    for j in range(3):
        t.append_delta(spark.createDataFrame(
            [(1, 1, 1), (50 + j, 5, 0)], "k long, n long, m int"))
    before = _state(t)
    assert before[1] == (13, 3)
    v = t.compact_runs(level="auto")
    if v is not None:  # ladder may escalate to full on tiny bases
        assert _state(t) == before
    t2 = _mk(spark, tmp_path, [(1, 10, 0)], name="big", n_buckets=2)
    # big base so auto stays a partial (delta-marked) fold
    t2.merge_into(spark.createDataFrame(
        [(k, 0, 0) for k in range(2, 60)], "k long, n long, m int"))
    for j in range(3):
        t2.append_delta(spark.createDataFrame(
            [(1, 1, 0)], "k long, n long, m int"))
    b2 = _state(t2)
    v2 = t2.compact_runs(level="auto")
    assert v2 is not None
    with open(os.path.join(t2.path, "_log",
                           f"v{v2:010d}.json")) as fh:
        rec = json.load(fh)
    assert rec["op"] == "fold-runs" and rec.get("delta") is True
    assert _state(t2) == b2 and _state(t2)[1] == (13, 0)
    # checkpoint + expiry keep the delta kind
    t2.checkpoint()
    t2.expire_log()
    assert _state(t2)[1] == (13, 0)
    t2.append_delta(spark.createDataFrame(
        [(1, 1, 0)], "k long, n long, m int"))
    assert _state(t2)[1] == (14, 0)
    # full fold → merge-only, windowless & aggregate-free read
    t2.compact_runs(level="full")
    assert _state(t2)[1] == (14, 0)
    plan = t2.read()._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan and "Window" not in plan


def test_delta_point_read_bucket_pruned(spark, tmp_path):
    from data_ingestion_challenge_spark.serving import _murmur3_long

    t = _mk(spark, tmp_path, [(i, 10, 0) for i in range(8)],
            n_buckets=4)
    for j in range(2):
        t.append_delta(spark.createDataFrame(
            [(5, 1, 1)], "k long, n long, m int"))
    df = t.point_read(5)
    assert [(r.k, r.n, r.m) for r in df.collect()] == [(5, 12, 2)]
    b = _murmur3_long(5) % t.n_buckets
    files = df.inputFiles()
    assert files and all(f.endswith(f"-b{b}.parquet") for f in files)


def test_run_keyed_upsert_delta_equals_merge(spark, tmp_path):
    """The streaming keyed-upsert loop in delta mode lands the same
    table as merge mode (and the one-shot aggregate)."""
    from data_ingestion_challenge_spark.txn import run_keyed_upsert
    from tests.conftest import SF_DIR

    src = f"{SF_DIR}/events.parquet"

    td = run_keyed_upsert(spark, src, str(tmp_path / "d"),
                          str(tmp_path / "dck"), n_buckets=8)
    tm = run_keyed_upsert(spark, src, str(tmp_path / "m"),
                          str(tmp_path / "mck"), n_buckets=8,
                          commit_mode="merge")
    rows_d = sorted(tuple(r) for r in td.read().collect())
    rows_m = sorted(tuple(r) for r in tm.read().collect())
    assert rows_d == rows_m and rows_d
    # and the ladder keeps the delta table maintainable
    assert td.compact_runs(level="full") is not None
    assert sorted(tuple(r) for r in td.read().collect()) == rows_d
