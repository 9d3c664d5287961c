#!/usr/bin/env python
"""Round-17 micro-bench: the admission meter alone (docs/s, kept,
compact_s) N times near-idle — the targeted re-measurement the r16
verdict asked for ("classify the admission_compact_s 3.7x swing").

Usage: python scripts/r17_compact_bench.py [n_samples]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench as B  # noqa: E402

from data_ingestion_challenge_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("r17-compact")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for i in range(n):
        dps, kept, compact_s = B._admission_ingest(spark, sf_dir)
        out.append({"docs_per_sec": dps, "kept": kept,
                    "compact_s": compact_s})
        print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"samples": out}))
    spark.stop()


if __name__ == "__main__":
    main()
