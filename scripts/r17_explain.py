#!/usr/bin/env python
"""Round-17 measurement harness (guide §1): capture
.explain("formatted") for every headline bench query plus per-query
wall time under BOTH actions — the bench's historical count() and the
guide-§1.4 noop sink — so plan shapes and any count()-induced
column-pruning undermeasurement are visible side by side.

Usage: python scripts/r17_explain.py <outdir> [before|after]
Writes <outdir>/<query>_<tag>.txt and <outdir>/timings_<tag>.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r17-explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = B._bench_queries(spark)
    # Materialize the lake tables outside any timing, as bench does.
    B._posting_for(spark, sf_dir)
    B._ivf_for(spark, sf_dir)

    # Warm-up (codegen, Arrow workers) like bench's warm pass.
    for q in qs.values():
        try:
            q(spark, sf_dir).count()
        except Exception:
            pass

    timings: dict[str, dict] = {}
    for name, q in qs.items():
        df = q(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"),
                  "w") as fh:
            fh.write(buf.getvalue())

        def _med(action, runs=3):
            ts = []
            for _ in range(runs):
                d = q(spark, sf_dir)
                t0 = time.perf_counter()
                action(d)
                ts.append(time.perf_counter() - t0)
            return round(statistics.median(ts), 3)

        spark.sparkContext.setJobDescription(f"{name}: count")
        t_count = _med(lambda d: d.count())
        spark.sparkContext.setJobDescription(f"{name}: noop")
        t_noop = _med(lambda d: d.write.format("noop")
                      .mode("overwrite").save())
        spark.sparkContext.setJobDescription(None)
        timings[name] = {"count_s": t_count, "noop_s": t_noop}
        print(f"{name}: count={t_count}s noop={t_noop}s", flush=True)

    with open(os.path.join(outdir, f"timings_{tag}.json"), "w") as fh:
        json.dump(timings, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
