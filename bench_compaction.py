"""Diagnostic: measured stepped-merge behavior of the admission
posting store over a longer batch stream (not part of bench.py's
headline JSON — run by hand like bench_skew.py).

Drives N 100-doc admission batches through the sink, then runs the
in-place fold EXPLICITLY after each batch (same effect as
``compact_every=1``, but the fold is timed in isolation — timing the
whole admit() would conflate screen + maintenance + commit with the
fold and could hide growth).  Records, per batch: live run count,
total store bytes, and the ISOLATED fold wall time.  The claims this
verifies empirically:

- run count stays LOG-BOUNDED (the geometric invariant), never one
  increment per batch;
- per-fold wall time does not grow linearly with the corpus (most
  folds touch only small runs; occasional larger merges amortize).

Since r10 the CORPUS TABLE is append-run committed by default, so the
same two claims apply to its run ladder (TxnTable.compact_runs
level=auto): the script times that fold in the same isolation and
records the table's live generation count per batch.

Usage:  python bench_compaction.py [n_batches]   (default 12)
Prints one JSON line: {"runs_per_batch": [...], "fold_s": [...],
"store_kb": [...], "max_runs": M, "table_gens_per_batch": [...],
"table_fold_s": [...], "max_table_gens": G}.
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
        DOCS_SCHEMA, _batch_tags, _is_base, compact_store_in_place,
        document_admission_sink,
    )

    spark = get_spark("bench-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_compaction_")
    d = {k: os.path.join(root, k)
         for k in ("table", "postings", "log", "sizes")}
    try:
        admit, table = document_admission_sink(
            spark, d["table"], d["postings"], d["log"],
            sizes_dir=d["sizes"])
        runs_per_batch, fold_s, store_kb = [], [], []
        table_gens, table_fold_s = [], []
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
            admit(spark.createDataFrame(rows, DOCS_SCHEMA), b)
            t0 = time.perf_counter()
            compact_store_in_place(spark, d["postings"], table,
                                   sizes_dir=d["sizes"], level="auto")
            fold_s.append(round(time.perf_counter() - t0, 3))
            tags = _batch_tags(d["postings"])
            assert all(_is_base(t) for t in tags), tags
            runs_per_batch.append(len(tags))
            # The corpus table's run ladder, timed in the same
            # isolation (append mode: one run per batch).
            t1 = time.perf_counter()
            table.compact_runs(level="auto")
            table_fold_s.append(round(time.perf_counter() - t1, 3))
            table_gens.append(table.run_generations())
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
            "table_gens_per_batch": table_gens,
            "table_fold_s": table_fold_s,
            "max_table_gens": max(table_gens),
            "n_batches": n_batches,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
