"""operators/ranking.py: distributed exact ntile must agree with
Spark's own single-task ntile window for every N/k shape, including
N < k, N = k, heavy ties, and multi-column orders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_challenge_spark.operators.ranking import (
    global_ntile,
)


def _check(spark, rows, k, order_cols):
    df = spark.createDataFrame(rows, "v int, id int")
    got = {(r.v, r.id): r.b for r in
           global_ntile(df, k, order_cols, out="b").collect()}
    want = {(r.v, r.id): r.b for r in
            df.withColumn("b", F.ntile(k).over(
                Window.orderBy(*order_cols))).collect()}
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 4), (3, 10), (10, 10),
                                 (11, 4), (40, 4), (97, 10)])
def test_matches_builtin_ntile(spark, n, k):
    # Values collide heavily (v = i % 7) so the unique-id tiebreak is
    # what makes the order total — the contract's hard case.
    rows = [(i % 7, i) for i in range(n)]
    _check(spark, rows, k, ["v", "id"])


def test_matches_builtin_ntile_desc_and_multicol(spark):
    rows = [((i * 13) % 5, i) for i in range(53)]
    df = spark.createDataFrame(rows, "v int, id int")
    got = {r.id: r.b for r in
           global_ntile(df, 3, [F.col("v").desc(), "id"],
                        out="b").collect()}
    want = {r.id: r.b for r in
            df.withColumn("b", F.ntile(3).over(
                Window.orderBy(F.col("v").desc(), "id"))).collect()}
    assert got == want


def test_no_single_task_global_sort_in_plan(spark):
    """The point of the operator: the physical plan must carry NO
    empty-partition window (Window [...] over the whole input) — the
    only unpartitioned window allowed is over the P-row offsets
    aggregate, which sits above the partial-count Exchange."""
    df = spark.range(1000).select(
        (F.col("id") % 97).cast("int").alias("v"),
        F.col("id").cast("int").alias("id"))
    plan = (global_ntile(df, 10, ["v", "id"], out="b")
            ._jdf.queryExecution().executedPlan().toString())
    # Spark prints a data-sized global window as
    # "Window [...], [v ASC ...]" with no partition spec on the raw
    # input; our plan's only Window nodes are partitioned by _pid or
    # fed by the HashAggregate of counts.
    import re
    for m in re.finditer(r"Window \[[^\]]*ntile", plan):
        raise AssertionError("built-in global ntile leaked into plan")
    assert "row_number" in plan


def test_rejects_existing_out_and_bad_k(spark):
    df = spark.createDataFrame([(1, 1)], "v int, b int")
    with pytest.raises(ValueError, match="already exists"):
        global_ntile(df, 2, ["v"], out="b")
    with pytest.raises(ValueError, match="n_buckets"):
        global_ntile(df, 0, ["v"])


def test_range_exchange_reused_across_branches(spark):
    """Correctness leans on both branches (local ranks; per-partition
    counts) reading the SAME row→partition assignment: the executed
    plan must serve the counts branch from a ReusedExchange of the one
    range shuffle, not a second independent (resampled) exchange."""
    df = spark.range(5000).select(
        (F.col("id") % 31).cast("int").alias("v"),
        F.col("id").cast("int").alias("id"))
    out = global_ntile(df, 7, ["v", "id"], out="b")
    out.collect()  # finalize the adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, \
        "counts branch re-executed the range shuffle"
