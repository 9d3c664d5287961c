#!/usr/bin/env python
"""Round-18 evidence for the merge-mode accumulate commit fix (r17
verdict task 6): times bench._keyed_upsert_rate on THIS tree —
`merge` (the changed path: one bucket read per commit instead of ~4)
and `delta` (unchanged, the load control) — N reps each, interleaved.

Run it per tree (HEAD vs the pre-change commit via git worktree) and
compare the merge medians; the delta medians bracket box load:

  git worktree add /tmp/r18_pre_txn <pre-change-sha>
  python scripts/r18_txn_merge_ab.py 3          # HEAD
  (cd /tmp/r18_pre_txn && python scripts/r18_txn_merge_ab.py 3)

Prints one JSON line
{"merge_rows_s": [...], "delta_rows_s": [...], "median": {...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-txn-merge-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the streaming/txn path once at the smallest SF
    B._keyed_upsert_rate(spark, "/root/testdata/sf0.001", "merge")
    runs = {"merge": [], "delta": []}
    for i in range(reps):
        for mode in runs:
            runs[mode].append(
                B._keyed_upsert_rate(spark, sf_dir, mode))
        print(f"rep {i}: merge {runs['merge'][-1]}, "
              f"delta {runs['delta'][-1]}",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "merge_rows_s": runs["merge"], "delta_rows_s": runs["delta"],
        "median": {m: statistics.median(v) for m, v in runs.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
