"""Table catalog: maps a scale-factor directory of parquet files to
DataFrames / temp views.

The reference ingests into pluggable storage backends; our storage is
columnar parquet read through Spark's vectorized reader, which gives
predicate pushdown + column pruning for free (verify with
``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables that should always be broadcast in joins: at 100 TB
# the fact side (lineitem/orders/events) shuffles, these never should.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType (LTZ, session tz UTC)
    whatever the driver generated this round:

    - parquet TIMESTAMP(NANOS) → long via the nanosAsLong conf;
      truncate ns→µs exactly like DuckDB does.  Must use integral
      `div` — doubles can't hold 1e18 ns exactly.
    - parquet timestamp[us] (no tz) → TIMESTAMP_NTZ; cast to LTZ.
      With the session pinned to UTC the wall-clock (and thus every
      oracle comparison) is unchanged, and downstream plans keep the
      TimestampType they were written against (unix_micros & co.
      reject NTZ inputs).
    """
    from pyspark.sql import functions as F
    for f in df.schema.fields:
        if f.name != "ts":
            continue
        kind = f.dataType.simpleString()
        if kind == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif kind == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Catalog:
    """Lazy view of one scale-factor directory."""

    # Confs the testdata requires regardless of who built the session.
    # Callers (the correctness driver included) hand us a vanilla
    # SparkSession; both confs are runtime-settable, so set them here
    # rather than relying on session.py's builder having run.
    _REQUIRED_CONFS = (
        # events.ts is INT64 TIMESTAMP(NANOS) — unreadable without this.
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # Deterministic wall-clock rendering to match the DuckDB oracle.
        ("spark.sql.session.timeZone", "UTC"),
    )

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}
        for key, value in self._REQUIRED_CONFS:
            try:
                if spark.conf.get(key, None) != value:
                    spark.conf.set(key, value)
            except Exception:
                spark.conf.set(key, value)

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        if name not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            self._cache[name] = normalize_ts(df)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, suffix: str = "") -> None:
        """Register every table as a temp view (for spark.sql plans)."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name + suffix)
