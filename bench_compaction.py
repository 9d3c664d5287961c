"""Diagnostic: measured stepped-merge behavior of the admission
posting store over a longer batch stream (not part of bench.py's
headline JSON — run by hand like bench_skew.py).

Drives N single-doc admission batches through the sink with
``compact_every=1`` (fold every batch — the worst-case cadence) and
records, per batch: live run count, total store bytes, and the fold's
wall time.  The claims this verifies empirically:

- run count stays LOG-BOUNDED (the geometric invariant), never one
  increment per batch;
- per-fold wall time does not grow linearly with the corpus (most
  folds touch only small runs; occasional larger merges amortize).

Usage:  python bench_compaction.py [n_batches]   (default 12)
Prints one JSON line: {"runs_per_batch": [...], "fold_s": [...],
"store_kb": [...], "max_runs": M}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    from data_ingestion_challenge_spark.session import get_spark
    from data_ingestion_challenge_spark.streaming.admission import (
        DOCS_SCHEMA, _batch_tags, _is_base, document_admission_sink,
    )

    spark = get_spark("bench-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_compaction_")
    d = {k: os.path.join(root, k)
         for k in ("table", "postings", "log", "sizes")}
    try:
        admit, _table = document_admission_sink(
            spark, d["table"], d["postings"], d["log"],
            sizes_dir=d["sizes"], compact_every=1)
        runs_per_batch, fold_s, store_kb = [], [], []
        for b in range(n_batches):
            # Distinct text per batch: every doc admits, the store
            # grows monotonically (the worst case for maintenance).
            # The ratio policy reads parquet ROW counts (logical
            # size), so batch size only affects fold wall time, not
            # the ladder's correctness; 100 docs × 300 tokens keeps
            # per-fold work realistic.
            rows = [(b * 1000 + i,
                     " ".join(f"tok{b}x{i}x{j}" for j in range(300)),
                     "en", "web") for i in range(100)]
            t0 = time.perf_counter()
            admit(spark.createDataFrame(rows, DOCS_SCHEMA), b)
            fold_s.append(round(time.perf_counter() - t0, 3))
            tags = _batch_tags(d["postings"])
            assert all(_is_base(t) for t in tags), tags
            runs_per_batch.append(len(tags))
            total = 0
            for r, _dirs, files in os.walk(d["postings"]):
                total += sum(os.path.getsize(os.path.join(r, f))
                             for f in files)
            store_kb.append(round(total / 1024, 1))
        print(json.dumps({
            "runs_per_batch": runs_per_batch,
            "fold_s": fold_s,
            "store_kb": store_kb,
            "max_runs": max(runs_per_batch),
            "n_batches": n_batches,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
