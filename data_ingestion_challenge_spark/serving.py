"""Keyed serving layer: the low-latency point-lookup analog of the
reference's ingest→query service endpoints.

The reference serves per-key rollup reads (a user's counters, a day's
totals) straight from its storage engine.  The Spark-native equivalent
is a LAYOUT contract, not a server: materialize the rollup once into a
bucketed + sorted table, and a point lookup then needs

  - NO shuffle (the table is already clustered by key),
  - ONE bucket file out of N (Catalyst bucket pruning on a literal
    equality filter — the plan shows ``SelectedBucketsCount: 1 out of
    N``), and
  - few row groups within that file (rows are sorted by key, so
    parquet min/max stats skip the rest).

At 100 TB the same layout holds: bucket count scales with data volume
(keep each bucket's file at a few hundred MB), and a keyed read stays
O(1 file) regardless of corpus size.  Serving day-grain rollups uses
directory partitioning instead (partition pruning), built on
sources/files.write_partitioned_parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from data_ingestion_challenge_spark.sources.files import write_bucketed


def build_keyed_rollup(df: DataFrame, table: str, path: str,
                       key: str, n_buckets: int = 32) -> None:
    """Materialize `df` as the serving table for point reads on `key`.

    Size n_buckets so each bucket file stays in the 100-500 MB range
    at the target scale; the lookup cost is one bucket regardless."""
    write_bucketed(df, table, path, bucket_key=key, n_buckets=n_buckets)


def point_lookup(spark: SparkSession, table: str, key: str,
                 value) -> DataFrame:
    """Keyed read against a build_keyed_rollup table.  The literal
    equality predicate is what unlocks bucket pruning — Catalyst
    computes the bucket id from the literal and scans only that file.

    autoBucketedScan must be OFF for the pruning to apply: with it on,
    the planner "helpfully" falls back to a plain file scan for
    queries with no bucketing-exploiting join/agg, which reads all N
    buckets.  Point reads are exactly the case the bucketed scan
    exists for, so pin it off here (scan-side conf; runtime-settable)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark.table(table).where(col(key) == value)
