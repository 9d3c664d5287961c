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

    # The registered ann_pq_topk is a recall GATE (includes the exact
    # brute-force audit twin); the bench times the raw PQ index scan so
    # the number stays comparable across rounds.
    from data_ingestion_challenge_spark.catalog import Catalog
    from data_ingestion_challenge_spark.operators.similarity import pq_topk

    bench_queries["ann_pq_topk"] = lambda spark, d: pq_topk(
        Catalog(spark, d).embeddings, n_queries=10, k=5, ksub=32, rerank=96)
    timings: dict[str, float] = {}

    # Warm-up pass: run every bench query once at the smallest SF so
    # whole-stage codegen compilation, Arrow/pandas worker spin-up, and
    # parquet reader init are paid before the measured runs — the
    # timings below are steady-state throughput, not JVM JIT latency.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for q in bench_queries.values():
            try:
                q(spark, warm_dir).count()
            except Exception:
                pass  # a warm-up failure must never kill the bench

    # median of 3 measured runs per query: the box carries variable
    # external load (observed 2-8× swings); the median keeps one noise
    # spike from reading as a regression when rounds are compared.
    for name, q in bench_queries.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            df.count()  # full execution; avoids collect-to-driver cost
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    (p50_ms, p99_ms), (sql_p50_ms, sql_p99_ms) = \
        _point_lookup_latency(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "point_lookup_p50_ms": p50_ms,
        "point_lookup_p99_ms": p99_ms,
        "point_lookup_sql_p50_ms": sql_p50_ms,
        "point_lookup_sql_p99_ms": sql_p99_ms,
        "sf": sf,
    }))
    spark.stop()


def _point_lookup_latency(spark, sf_dir: str, n_lookups: int = 40):
    """Serving-path latency: build the keyed user rollup once (the
    bucketed+sorted layout serving.py contracts), then time end-to-end
    keyed reads — the reference's core read path is exactly this
    lookup, so the bench reports its p50/p99 alongside throughput.
    Two paths: the SERVING read (point_lookup_fast — Murmur3 bucket
    routing + cached manifest + Arrow predicate read, no planner) and
    the SQL-planner read (point_lookup) for comparison.  Returns
    ((fast_p50, fast_p99), (sql_p50, sql_p99)) in ms."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from data_ingestion_challenge_spark import serving
    from data_ingestion_challenge_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    rollup = (cat.events.groupBy("user_id")
              .agg(F.count("*").alias("n_events"),
                   F.sum("value").alias("value_sum")))
    tmp = tempfile.mkdtemp(prefix="serving_bench_")
    table = "bench_point_lookup_rollup"
    try:
        serving.build_keyed_rollup(rollup, table, tmp,
                                   key="user_id", n_buckets=32)
        keys = [r[0] for r in
                rollup.select("user_id").limit(4 * n_lookups).collect()]
        keys = keys[::4][:n_lookups] or [0]
        def _percentiles(fn):
            fn(spark, table, "user_id", keys[0])  # warm
            lat = []
            for k in keys:
                t0 = time.perf_counter()
                fn(spark, table, "user_id", k)
                lat.append((time.perf_counter() - t0) * 1000.0)
            lat.sort()
            p50 = lat[len(lat) // 2]
            p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
            return round(p50, 2), round(p99, 2)

        return (_percentiles(serving.point_lookup_fast),
                _percentiles(serving.point_lookup))
    finally:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        except Exception:
            pass
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
