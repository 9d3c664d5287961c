"""Distributed exact global ranking — ntile/rank over a total order
WITHOUT a single-task sort.

The naive Spark spelling of SQL ``ntile(k) OVER (ORDER BY ...)`` is
``Window.orderBy(...)`` with no partitionBy: the analyzer warns and
the physical plan moves EVERY row through one task — correct at
sf0.1, a straight scale-killer at 100 TB (one executor sorts the
whole table).  This module provides the classic two-phase distributed
ranking instead:

1. ``repartitionByRange(order_cols)`` — Spark's RangePartitioner
   samples the key distribution and assigns balanced, ORDERED ranges
   (every key in partition i sorts before every key in i+1).
2. ``row_number`` per range partition — a LOCAL sort of ~N/P rows.
3. Per-partition row counts → cumulative offsets (a P-row aggregate;
   P = shuffle partitions), broadcast-joined back: global rank =
   partition offset + local rank.
4. The bucket label from the exact SQL ntile size split: with N rows
   and k buckets, the first (N mod k) buckets hold ceil(N/k) rows and
   the rest floor(N/k) — pure integer arithmetic (``div``), no float
   rounding at any N.

Determinism contract: ``order_cols`` must define a TOTAL order
(include a unique tie-breaker column).  Range boundaries come from
sampling and vary run to run, but the GLOBAL rank of each row does
not — the range partitioner guarantees cross-partition order, and a
total order leaves no intra-boundary tie for sampling to scramble.

Used by ``mixture_ppl_buckets`` and ``customer_rfm_segments`` (their
DuckDB oracles keep the plain ``ntile(k) OVER (ORDER BY ...)``
spelling — value-exact parity is the test that this IS ntile).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window


def global_ntile(df: DataFrame, n_buckets: int,
                 order_cols: Sequence[str],
                 out: str = "bucket") -> DataFrame:
    """Exact ``ntile(n_buckets) OVER (ORDER BY *order_cols)`` with no
    global single-task sort.  ``order_cols`` must form a total order
    (append a unique key); returns ``df`` plus an int ``out`` column.

    Cost shape: one range shuffle (sampled balanced boundaries), one
    hash shuffle for the per-partition window, plus a P-row offsets
    aggregate broadcast back — every sort is partition-local over
    ~N/P rows.  Catalyst's ReuseExchange serves the ranked branch and
    the counts branch from the same range-shuffle files
    (test-asserted): both branches therefore see the SAME row→_pid
    assignment even though _pid comes from spark_partition_id().
    Two independent executions would also agree — RangePartitioner's
    sampling is seeded per input-partition index (byteswap32),
    deterministic over the same input — and AQE's post-shuffle
    coalescing merges ADJACENT range partitions with a deterministic
    rule over identical stats, so both reads coalesce identically and
    merged ranges stay ordered."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    cols = df.columns
    if out in cols:
        raise ValueError(f"output column {out!r} already exists")
    order_cols = [col(c) if isinstance(c, str) else c
                  for c in order_cols]
    part = (df.repartitionByRange(*order_cols)
            .withColumn("_pid", F.spark_partition_id()))
    local = part.withColumn(
        "_lrank", F.row_number().over(
            Window.partitionBy("_pid").orderBy(*order_cols)))
    # Offsets: P rows (P = shuffle partitions) — the only global
    # window runs over THIS tiny frame, never the data.
    woff = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    wtot = (Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    offs = (part.groupBy("_pid").agg(F.count("*").alias("_pn"))
            .select("_pid",
                    F.coalesce(F.sum("_pn").over(woff),
                               F.lit(0)).alias("_off"),
                    F.sum("_pn").over(wtot).alias("_total")))
    ranked = (local.join(F.broadcast(offs), "_pid")
              .withColumn("_grank", col("_off") + col("_lrank")))
    # ntile split in pure integer arithmetic (`div`, never float
    # division — a double ratio can misround ceil() once ranks pass
    # 2^53): q = N div k, r = N mod k; ranks 1..r·(q+1) land in the
    # first r buckets of size q+1 (bucket = ceil(rank/(q+1))), the
    # rest in buckets of size q.  greatest(_q,1) only guards the
    # branch that is unreachable when q = 0 (N < k) from ANSI-mode
    # div-by-zero.
    ranked = (ranked
              .withColumn("_q", F.expr(f"_total div {n_buckets}"))
              .withColumn("_r", col("_total") % n_buckets))
    head = col("_r") * (col("_q") + 1)
    bucket = (F.when(col("_grank") <= head,
                     F.expr("(_grank + _q) div (_q + 1)"))
              .otherwise(col("_r") + F.expr(
                  "(_grank - _r * (_q + 1) + _q - 1) "
                  "div greatest(_q, 1)")))
    return ranked.withColumn(out, bucket.cast("int")).select(*cols, out)
