#!/usr/bin/env python
"""Round-18 evidence for the AQE coalescing change (r17 verdict task
5): interleaved A/B of the 14 headline queries under the r17 session
(coalescePartitions.parallelismFirst=true — the Spark default, which
only coalesces down to defaultParallelism) vs the r18 session
(parallelismFirst=false + advisoryPartitionSizeInBytes=64m — coalesce
to the DATA-sized target).  Both are runtime SQL confs, so one
session A/Bs them honestly; each rep alternates configs so box load
hits both sides equally.

Usage: python scripts/r18_aqe_ab.py [reps] -- prints one JSON line
{"old": {q: med}, "new": {q: med}, "speedup": {q: old/new}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402

_PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
_ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r18-aqe-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = B._bench_queries(spark)
    B._posting_for(spark, sf_dir)
    B._ivf_for(spark, sf_dir)
    for q in qs.values():  # warm codegen/Arrow like bench does
        try:
            q(spark, sf_dir).count()
        except Exception:
            pass
    cfgs = {"old": ("true", "64MB"), "new": ("false", "64MB")}
    runs: dict[str, dict[str, list[float]]] = {
        k: {n: [] for n in qs} for k in cfgs}
    for i in range(reps):
        for tag, (pf, adv) in cfgs.items():
            spark.conf.set(_PF, pf)
            spark.conf.set(_ADV, adv)
            for name, q in qs.items():
                spark.sparkContext.setJobDescription(
                    f"aqe-ab {tag} r{i}: {name}")
                t0 = time.perf_counter()
                q(spark, sf_dir).count()
                runs[tag][name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"rep {i} done", file=sys.stderr, flush=True)
    med = {tag: {n: round(statistics.median(v), 3)
                 for n, v in d.items()} for tag, d in runs.items()}
    speed = {n: round(med["old"][n] / med["new"][n], 2)
             if med["new"][n] else None for n in qs}
    tot = {tag: round(sum(d.values()), 3) for tag, d in med.items()}
    print(json.dumps({"old": med["old"], "new": med["new"],
                      "speedup_old_over_new": speed,
                      "totals": tot}))
    spark.stop()


if __name__ == "__main__":
    main()
