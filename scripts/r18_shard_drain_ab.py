#!/usr/bin/env python
"""Round-18 evidence for the sharded-drain write fan-out fix (r16/r17
verdict carry-over): drain the bench's exact two-drop admission
geometry (bench._admission_ingest) with shard_col="source" vs
unsharded, interleaved, and report docs/s for each.

Through r17 every sharded increment wrote one file per non-empty
(shard, bucket) cell (~2× drain time at bench geometry,
docs/SCREEN_SCALING.md); since r18 increments ride the single
__mixed__ partition level with the true shard in the doc_shard data
column — the same file fan-out as the unsharded drain.  Target:
sharded/unsharded wall ratio ≤ ~1.1 on this tree (the residual is the
doc_shard join + the data-filtered screen read).

Usage: python scripts/r18_shard_drain_ab.py [reps]
Prints one JSON line {"sharded_docs_s": [...], "plain_docs_s": [...],
"ratio_of_medians": r}.
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
from data_ingestion_challenge_spark.streaming.admission import (  # noqa: E402
    run_document_admission,
)


def one_drain(spark, docs, n_docs, shard_col):
    root = tempfile.mkdtemp(prefix="shard_ab_")
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
            run_document_admission(
                spark, dirs["watch"], dirs["table"], dirs["postings"],
                dirs["log"], dirs["ckpt"], sizes_dir=dirs["sizes"],
                shard_col=shard_col)
            elapsed = time.perf_counter() - t0
            (rest.repartition(8).write.mode("append")
             .json(dirs["watch"]))
            t1 = time.perf_counter()
            table = run_document_admission(
                spark, dirs["watch"], dirs["table"], dirs["postings"],
                dirs["log"], dirs["ckpt"], sizes_dir=dirs["sizes"],
                shard_col=shard_col)
            elapsed += time.perf_counter() - t1
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        kept = table.read().count() / n_docs
        return round(n_docs / elapsed, 1), round(kept, 4)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-shard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read
            .parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text", "lang", "source"))
    n_docs = docs.count()
    sharded, plain, kepts = [], [], set()
    for i in range(reps):  # interleaved same-box A/B
        s, k1 = one_drain(spark, docs, n_docs, "source")
        p, k2 = one_drain(spark, docs, n_docs, None)
        sharded.append(s)
        plain.append(p)
        kepts |= {k1, k2}
        print(f"rep {i}: sharded {s} docs/s, plain {p} docs/s",
              file=sys.stderr, flush=True)
    ms, mp = statistics.median(sharded), statistics.median(plain)
    print(json.dumps({
        "sharded_docs_s": sharded, "plain_docs_s": plain,
        "median_sharded": ms, "median_plain": mp,
        "wall_ratio_sharded_over_plain": round(mp / ms, 3),
        "kept_fractions": sorted(kepts),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
