#!/usr/bin/env python
"""Skew-join benchmark: synthetic hot-key fact ⋈ mid-size dim, compared
across three strategies on the same data:

  plain_no_aqe  — sort-merge join, AQE off: the hot key's entire volume
                  lands on ONE reducer (the 100 TB failure mode).
  plain_aqe     — AQE skew-join splitting (session default): runtime
                  re-plan splits oversized partitions.
  salted        — operators/skew.salted_join: explicit salt spread,
                  the tool for when the dim is too big to broadcast
                  but small enough to replicate salt×.

Prints one JSON line: {"strategy": sec, ...}.  Diagnostic only — not
part of the driver bench (data is synthesized, not from testdata).

Usage: python bench_skew.py [n_fact] [n_dim] [hot_pct]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from data_ingestion_challenge_spark.operators.skew import salted_join
from data_ingestion_challenge_spark.session import get_spark


def synth(spark, n_fact: int, n_dim: int, hot_pct: int):
    """Deterministic skewed tables: hot_pct% of fact rows share key 0,
    the rest spread uniformly over the dim's key space."""
    fact = spark.range(n_fact).select(
        F.when(F.pmod("id", 100) < hot_pct, F.lit(0))
        .otherwise(F.pmod("id", n_dim)).alias("k"),
        (col("id") % 997).alias("v"))
    dim = spark.range(n_dim).select(
        col("id").alias("k"), (col("id") * 2).alias("dv"))
    return fact, dim


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 90

    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # Force the shuffle-join path: a broadcast would hide the skew and
    # at the target scale the dim is assumed too big to broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact, dim = synth(spark, n_fact, n_dim, hot_pct)
    fact.localCheckpoint(); dim.localCheckpoint()  # exclude synth cost

    out: dict[str, float] = {}
    expected = None
    for name, aqe, join in [
        ("plain_no_aqe", "false", lambda: fact.join(dim, "k")),
        ("plain_aqe", "true", lambda: fact.join(dim, "k")),
        ("salted", "true", lambda: salted_join(fact, dim, "k", salt=16)),
    ]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        agg = join().groupBy().agg(
            F.count("*").alias("n"), F.sum(col("v") + col("dv")).alias("s"))
        dt, _ = timed(agg)
        row = agg.first()
        if expected is None:
            expected = (row["n"], row["s"])
        assert (row["n"], row["s"]) == expected, f"{name} wrong result"
        out[name] = round(dt, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps({"bench": "skew_join", "n_fact": n_fact,
                      "n_dim": n_dim, "hot_pct": hot_pct,
                      "sec": out}))


if __name__ == "__main__":
    main()
