#!/usr/bin/env python
"""Round-18 LOAD-INDEPENDENT evidence for the AQE coalescing change
(r17 verdict task 5): per-query wall clock on this box is a lottery
(r17: 13/14 "regressions" with bit-identical plans), so the claim is
pinned on a runtime-plan FACT instead — the number of post-shuffle
partitions the final adaptive plan actually runs, under
coalescePartitions.parallelismFirst=true (the Spark default, r17
behavior: coalesce stops at defaultParallelism = 32) vs false + the
64m advisory target (r18 session default: coalesce to the DATA size).

For each query: run to completion (collect), then read the final
adaptive plan's output partitioning via executedPlan().execute()
.getNumPartitions() and the AQEShuffleRead markers in the plan text.

Usage: python scripts/r18_aqe_plan_evidence.py <outfile> [query ...]
Writes one JSON line per query; also saves the two runtime plans of
the first query to plans/r18/ for the judge.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402

_PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    outfile = sys.argv[1]
    names = sys.argv[2:] or ["top_users", "q1_pricing_summary",
                             "hourly_user_events", "sessionize",
                             "q3_shipping_priority",
                             "dedup_ngram_jaccard"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-aqe-plan-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    qs = B._bench_queries(spark)
    B._posting_for(spark, sf_dir)
    rows = []
    for name in names:
        rec = {"query": name}
        for tag, pf in (("parallelism_first", "true"),
                        ("size_first", "false")):
            spark.conf.set(_PF, pf)
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(
                f"aqe-evidence {tag}: {name}")
            df.collect()
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            try:
                nparts = qe.executedPlan().execute().getNumPartitions()
            except Exception:
                nparts = None
            rec[tag] = {
                "final_partitions": nparts,
                "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
                "coalesced_reads": plan.count(
                    "AQEShuffleRead coalesced"),
                "is_final": "isFinalPlan=true" in plan,
            }
            rec.setdefault("_plans", {})[tag] = plan
        spark.sparkContext.setJobDescription(None)
        plans = rec.pop("_plans")
        if name == names[0]:
            for tag, plan in plans.items():
                p = os.path.join("plans", "r18",
                                 f"{name}_runtime_{tag}.txt")
                with open(p, "w") as fh:
                    fh.write(plan)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    with open(outfile, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
