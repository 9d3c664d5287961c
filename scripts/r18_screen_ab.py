#!/usr/bin/env python
"""Round-18 evidence for the screen-plan knobs (r17 verdict task 7:
the candidate-intersection job is ~40% of drain wall).  Interleaved
same-box, same-session A/B of the unsharded drain at the bench's
two-drop geometry, one arm per knob plus base (r17 plan) and all:

  base   — _BCAST_DFREQ=_BCAST_PREFIX=_FOLD_INTER_COUNT=False
  dfreq  — broadcast the rarity-count lookup (batch-shingle-bounded)
  prefix — broadcast the candidate join's prefix side (batch-bounded)
  fold   — persist+count the pair table in ONE job
  all    — the three together (the committed defaults)

Each rep runs every arm once, so box load hits all arms equally.
kept_fraction must be identical across arms (the knobs are plan-only).

Usage: python scripts/r18_screen_ab.py [reps] [arm ...] -- prints one
JSON line {"docs_s": {arm: [reps...]}, "median": {arm: m}, "kept":
[...]}.  Arms default to all five; pass a subset (e.g. ``base all``)
for a tighter head-to-head when box load swamps the 5-arm matrix.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402
from data_ingestion_challenge_spark.streaming import admission as A  # noqa: E402

ARMS = {
    "base": (False, False, False),
    "dfreq": (True, False, False),
    "prefix": (False, True, False),
    "fold": (False, False, True),
    "all": (True, True, True),
}


def one_drain(spark, docs, n_docs):
    root = tempfile.mkdtemp(prefix="screen_ab_")
    dirs = {k: os.path.join(root, k)
            for k in ("watch", "table", "postings", "log", "sizes",
                      "ckpt")}
    try:
        half = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)
        half.repartition(8).write.mode("overwrite").json(dirs["watch"])
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            t0 = time.perf_counter()
            A.run_document_admission(
                spark, dirs["watch"], dirs["table"], dirs["postings"],
                dirs["log"], dirs["ckpt"], sizes_dir=dirs["sizes"])
            elapsed = time.perf_counter() - t0
            (rest.repartition(8).write.mode("append")
             .json(dirs["watch"]))
            t1 = time.perf_counter()
            table = A.run_document_admission(
                spark, dirs["watch"], dirs["table"], dirs["postings"],
                dirs["log"], dirs["ckpt"], sizes_dir=dirs["sizes"])
            elapsed += time.perf_counter() - t1
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        kept = table.read().count() / n_docs
        return round(n_docs / elapsed, 1), round(kept, 4)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    arms = {a: ARMS[a] for a in (sys.argv[2:] or ARMS)}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-screen-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read
            .parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text", "lang", "source"))
    n_docs = docs.count()
    runs = {arm: [] for arm in arms}
    kepts = set()
    for i in range(reps):
        for arm, (d, p, f) in arms.items():
            A._BCAST_DFREQ, A._BCAST_PREFIX, A._FOLD_INTER_COUNT = \
                d, p, f
            r, k = one_drain(spark, docs, n_docs)
            runs[arm].append(r)
            kepts.add(k)
        print(f"rep {i}: " + ", ".join(
            f"{a} {runs[a][-1]}" for a in arms),
            file=sys.stderr, flush=True)
    med = {a: statistics.median(v) for a, v in runs.items()}
    print(json.dumps({"docs_s": runs, "median": med,
                      "speedup_vs_base": {
                          a: round(med[a] / med["base"], 3)
                          for a in arms} if "base" in arms else None,
                      "kept": sorted(kepts)}))
    spark.stop()


if __name__ == "__main__":
    main()
