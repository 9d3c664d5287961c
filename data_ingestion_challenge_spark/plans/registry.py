"""Central registry: every operator from SURVEY.md §2 is a named Query
with a Spark plan builder and (when SQL-expressible) a DuckDB oracle.

Parity rules (SURVEY.md §6): alias every computed column identically in
both plan and oracle; round float aggregates (money→2dp, ratios→4dp);
deterministic tie-breaks in every top-k.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_challenge_spark.catalog import Catalog

PlanFn = Callable[[Catalog], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    plan: PlanFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    bench: bool = False  # include in bench.py headline suite

    def __call__(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        return self.plan(Catalog(spark, sf_dir))


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator registering a plan builder under ``name``."""
    def deco(fn: PlanFn) -> PlanFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, plan=fn, oracle=oracle, bench=bench)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}
