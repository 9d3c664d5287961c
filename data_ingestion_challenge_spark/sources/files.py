"""Batch file sources/sinks.

The reference's ingest accepts records over pluggable transports; the
batch equivalents here are schema-explicit file readers (schema
inference is a full extra pass at 100 TB — never rely on it in
production paths) and a partitioned parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_parquet(spark: SparkSession, path: str,
                 merge_schema: bool = False) -> DataFrame:
    """merge_schema=True unions the schemas of all files (schema
    evolution: late files may carry added columns; older rows surface
    NULL there).  Off by default — merging reads every footer."""
    return (spark.read
            .option("mergeSchema", str(merge_schema).lower())
            .parquet(path))


def compact_parquet(spark: SparkSession, path: str, out_path: str,
                    n_files: int = 1,
                    sort_by: list[str] | None = None) -> None:
    """Small-file compaction: rewrite a (streaming-sink) directory of
    many small part files into n_files sorted files.  Streaming sinks
    produce one file per micro-batch per partition; scan efficiency at
    100 TB needs row groups in the 100MB-1GB range, so compaction runs
    as periodic maintenance.  repartition (not coalesce): coalesce
    would skip the shuffle but produce unbalanced files and break the
    sort clustering."""
    df = spark.read.parquet(path)
    df = df.repartition(n_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    df.write.mode("overwrite").parquet(out_path)


def read_csv(spark: SparkSession, path: str,
             schema: str | StructType = EVENTS_SCHEMA,
             header: bool = True) -> DataFrame:
    return (spark.read
            .schema(schema)
            .option("header", str(header).lower())
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .csv(path))


def read_jsonl(spark: SparkSession, path: str,
               schema: str | StructType = EVENTS_SCHEMA) -> DataFrame:
    # json source reads JSON-lines natively; explicit schema keeps the
    # scan single-pass and null-safe on corrupt records.
    return (spark.read
            .schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path))


def read_xml(spark: SparkSession, path: str,
             schema: str | StructType = EVENTS_SCHEMA,
             row_tag: str = "event") -> DataFrame:
    """XML reader via Spark 4's NATIVE xml source (the spark-xml
    package was merged upstream in 4.0 — no external jar).  Explicit
    schema for the same reason as jsonl: inference is a full extra
    pass at 100 TB, and a typed schema null-safes corrupt elements."""
    return (spark.read.format("xml")
            .option("rowTag", row_tag)
            .schema(schema)
            .load(path))


def write_xml(df: DataFrame, path: str, row_tag: str = "event",
              root_tag: str = "events") -> None:
    (df.write.mode("overwrite").format("xml")
     .option("rowTag", row_tag).option("rootTag", root_tag)
     .save(path))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — same vectorized/pushdown properties as parquet;
    some lakes standardize on it, so the engine accepts both."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_key: str, n_buckets: int = 8,
                   fmt: str = "parquet") -> None:
    """Bucketed + sorted table sink: rows are hash-clustered into
    n_buckets files by bucket_key and sorted within each bucket.

    THE co-location tool for 100 TB fact⋈fact joins: two tables
    bucketed on the join key with the same bucket count join with NO
    exchange on either side (verified in tests/test_sources.py — the
    physical plan has zero Exchange nodes).  At scale this turns the
    nightly orders⋈lineitem shuffle (the single largest network cost)
    into a map-side merge."""
    (df.write.mode("overwrite")
     .format(fmt)
     .option("path", path)
     .bucketBy(n_buckets, bucket_key)
     .sortBy(bucket_key)
     .saveAsTable(table))


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: list[str] | None = None,
                              sort_within: list[str] | None = None) -> None:
    """Partitioned + sorted parquet sink: partition pruning for readers,
    clustered row groups for range predicates."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 8, num_files: int | None = None) -> None:
    """Z-order (Morton-interleave) layout: cluster rows so parquet
    row-group min/max stats prune on EVERY listed column, not just the
    leading sort key of a linear layout.

    Each column is min-max binned to 2^bits levels (one tiny agg →
    broadcast), the bin codes are bit-interleaved into a Morton key,
    and rows are range-partitioned + sorted by that key.  A point/range
    predicate on any single z-column then touches O(n^((d-1)/d)) of the
    row groups instead of all of them — the standard lake trick
    (Delta OPTIMIZE ZORDER BY) built from plain Spark ops.

    Numeric columns only (binning is linear in the value)."""
    from pyspark.sql import functions as F

    stats = df.agg(*[f(c).alias(f"{a}_{c}")
                     for c in cols for a, f in
                     (("mn", F.min), ("mx", F.max))]).first()
    levels = 1 << bits
    code = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1
        bin_c = F.least(
            F.lit(levels - 1),
            ((F.col(c) - F.lit(mn)) / F.lit(span) * levels).cast("long"))
        # interleave: bit b of column i lands at position b*d + i
        for b in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(bin_c, b).bitwiseAND(F.lit(1)),
                            b * len(cols) + i))
    zdf = df.withColumn("_z", code)
    if num_files:
        zdf = zdf.repartitionByRange(num_files, "_z")
    out = zdf.sortWithinPartitions("_z").drop("_z")
    out.write.mode("overwrite").parquet(path)


def read_avro(spark, path: str):
    """Avro batch reader.  spark-avro is an EXTERNAL module (not on the
    default classpath); this container ships without the jar, so fail
    with the exact deploy fix instead of Spark's generic error.  Same
    pattern as sources/streams.kafka_stream: the code path is real, the
    connector is a spark-submit flag away."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as ex:  # AnalysisException: failed to find source
        if "avro" in str(ex).lower():
            raise ImportError(
                "spark-avro not on the classpath; launch with "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from ex
        raise


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Opaque-payload ingest (images/audio/video/model shards) via
    Spark's built-in binaryFile source: one row per file with (path,
    modificationTime, length, content BINARY).  The multimodal decode
    operators (operators/multimodal.py) consume `content` directly.

    Scale notes: files are the parallel unit (no splitting), so shard
    media into object-store-friendly sizes upstream;
    spark.sql.files.maxPartitionBytes packs small files per task.
    Filters on path/length prune BEFORE payload reads."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
