#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged queries from the registry
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from data_ingestion_challenge_spark import plans
    from data_ingestion_challenge_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in plans.QUERIES.items() if q.bench}
    timings: dict[str, float] = {}

    # Warm the JVM + parquet footers once with the cheapest query so the
    # first measured query isn't charged for session spin-up.
    next(iter(bench_queries.values()))(spark, sf_dir).count()

    for name, q in bench_queries.items():
        t0 = time.perf_counter()
        df = q(spark, sf_dir)
        df.count()  # full execution; count avoids collect-to-driver cost
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
