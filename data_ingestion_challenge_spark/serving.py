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


_AUTO_BUCKETED = "spark.sql.sources.bucketing.autoBucketedScan.enabled"


def point_lookup_df(spark: SparkSession, table: str, key: str,
                    value) -> DataFrame:
    """Lazy keyed read against a build_keyed_rollup table.  The literal
    equality predicate is what unlocks bucket pruning — Catalyst
    computes the bucket id from the literal and scans only that file.

    Caveat: {conf} must be false AT EXECUTION TIME for the pruning to
    apply — with it on (the default), the planner falls back to a
    plain file scan for queries with no bucketing-exploiting join/agg
    and reads all N buckets.  Use point_lookup() for the scoped
    set-execute-restore path; this variant leaves confs alone so the
    caller controls scoping.""".format(conf=_AUTO_BUCKETED)
    return spark.table(table).where(col(key) == value)


def point_lookup(spark: SparkSession, table: str, key: str,
                 value) -> list:
    """Keyed point read, executed eagerly (a serving lookup returns
    rows, not a plan): disables autoBucketedScan ONLY for the scoped
    execution and restores it after, so the rest of the session's
    bucketed-table scans keep their planner-chosen parallelism."""
    prev = spark.conf.get(_AUTO_BUCKETED, "true")
    spark.conf.set(_AUTO_BUCKETED, "false")
    try:
        return point_lookup_df(spark, table, key, value).collect()
    finally:
        spark.conf.set(_AUTO_BUCKETED, prev)
