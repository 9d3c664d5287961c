#!/usr/bin/env python
"""Round-18 plan-shape evidence for the screen knobs (verdict task 7),
load-independent: wall clock on this box is a lottery, so the claim
is pinned on the PHYSICAL PLAN of the candidate-intersection job —
the ~40% drain phase — exactly as the real screen runs it: corpus
postings from parquet, batch postings persisted, rel/inter boundaries
live (the knobs-off arm is the r17 plan).  _screen_pairs appends the
materialized rel and inter frames to `caches`, so the executed plan
of caches[-1] IS the intersection job the drain runs.

The counted facts: `Exchange hashpartitioning` (shuffles) and
`BroadcastExchange`/`BroadcastHashJoin` nodes in that executed plan.

Usage: python scripts/r18_screen_plan_evidence.py <outdir>
Writes <outdir>/screen_intersection_{before,after}.txt + a JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_challenge_spark.operators.dedup import (  # noqa: E402
    _postings,
)
from data_ingestion_challenge_spark.session import get_spark  # noqa: E402
from data_ingestion_challenge_spark.streaming import admission as A  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r18"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("r18-screen-plan-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    # The drain scopes AQE off (adaptive=False is the sink default) —
    # match it so the captured plan is the one the drain runs.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # BENCH geometry, not a toy: at toy corpus sizes the planner
    # auto-broadcasts every downstream screen join from the tiny
    # parquet estimates and the knobs are a no-op — the knobs exist
    # for the real regime where the corpus posting scan's estimate
    # (carried through the rel checkpoint's originStats) is above the
    # broadcast threshold.  Mirror the drain's two-drop shape: corpus
    # = postings of the even-doc_id half of the sf0.1 documents,
    # batch = the odd half.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    docs = (spark.read
            .parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    store = tempfile.mkdtemp(prefix="screen_plan_")
    stats = {}
    try:
        cp0 = _postings(docs.where(F.col("doc_id") % 2 == 0), 3)
        cp0.write.parquet(os.path.join(store, "post"))
        cp0.unpersist()
        cp = spark.read.parquet(os.path.join(store, "post"))
        batch = docs.where(F.col("doc_id") % 2 == 1)
        bp = _postings(batch, 3)
        bs = bp.groupBy("doc_id").agg(F.count("*").alias("n"))
        cs = cp.groupBy("doc_id").agg(F.count("*").alias("n"))
        # Patch the CONCRETE class (Spark 4 splits the pyspark.sql
        # DataFrame facade from pyspark.sql.classic.dataframe).
        DataFrame = type(bp)
        orig_lc, orig_p = DataFrame.localCheckpoint, DataFrame.persist
        for tag, on in (("before", False), ("after", True)):
            A._BCAST_DFREQ = A._BCAST_PREFIX = A._FOLD_INTER_COUNT = on
            # The boundary op truncates its receiver's lineage, so
            # record each receiver's PHYSICAL plan at call time (AQE
            # is off: executedPlan is the static final plan) — the
            # last boundary inside _screen_pairs is the intersection
            # frame in both arms.
            seen = []

            def _grab(df):
                seen.append(df._jdf.queryExecution().executedPlan()
                            .toString())

            DataFrame.localCheckpoint = (
                lambda self, *a, **k: (_grab(self),
                                       orig_lc(self, *a, **k))[1])
            DataFrame.persist = (
                lambda self, *a, **k: (_grab(self),
                                       orig_p(self, *a, **k))[1])
            caches = []
            try:
                pairs = A._screen_pairs(bp, bs,
                                        cp.select("doc_id", "s"),
                                        cs, 0.8, caches=caches)
                pairs.collect()
            finally:
                DataFrame.localCheckpoint = orig_lc
                DataFrame.persist = orig_p
            plan = seen[-1]
            with open(os.path.join(
                    outdir, f"screen_intersection_{tag}.txt"),
                    "w") as fh:
                fh.write(plan)
            stats[tag] = {
                "exchange_hash": plan.count(
                    "Exchange hashpartitioning"),
                "broadcast_exchange": plan.count("BroadcastExchange"),
                "broadcast_hash_join": plan.count("BroadcastHashJoin"),
                "sort_merge_join": plan.count("SortMergeJoin"),
            }
            for h in caches:
                h.unpersist()
        bp.unpersist()
    finally:
        A._BCAST_DFREQ = A._BCAST_PREFIX = A._FOLD_INTER_COUNT = True
        shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
