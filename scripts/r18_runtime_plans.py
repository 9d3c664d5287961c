#!/usr/bin/env python
"""Round-18 (r17 verdict task 4): capture the RUNTIME (post-execution)
adaptive plan for headline queries — static explain under AQE shows
only the initial plan (isFinalPlan=false) and can never show
`ReusedExchange`, which is exactly the unverified r17 claim about the
doubled sizes aggregation in dedup_ngram_jaccard / dedup_minhash_lsh.

Runs each query to completion under the noop sink, then dumps the SAME
DataFrame's executedPlan (the AdaptiveSparkPlanExec after its final
re-optimization, isFinalPlan=true) — the artifact the SQL-tab final
plan renders.

Usage: python scripts/r18_runtime_plans.py <outdir> [query ...]
Writes <outdir>/<query>_runtime.txt.  Defaults to the dedup family.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or ["dedup_ngram_jaccard", "dedup_minhash_lsh"]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-runtime-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    qs = B._bench_queries(spark)
    B._posting_for(spark, sf_dir)
    B._ivf_for(spark, sf_dir)
    for name in names:
        df = qs[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"{name}: runtime plan")
        # collect(), NOT the noop sink: a write plans its OWN
        # QueryExecution, so the df's executedPlan would stay
        # unexecuted (isFinalPlan=false — observed).  collect()
        # drives exactly df._jdf.queryExecution(); result sets here
        # are pair/agg-sized.
        df.collect()
        spark.sparkContext.setJobDescription(None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(outdir, f"{name}_runtime.txt"),
                  "w") as fh:
            fh.write(plan)
        n_reuse = plan.count("ReusedExchange")
        n_exch = plan.count("Exchange")
        print(f"{name}: isFinalPlan="
              f"{'isFinalPlan=true' in plan} "
              f"exchanges={n_exch} reused={n_reuse}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
