"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — every implemented operator from SURVEY.md §2.
oracle_sql() — DuckDB twins for the correctness gate (t2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_challenge_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core hourly per-user rollup."""
    return plans.QUERIES["hourly_user_events"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
