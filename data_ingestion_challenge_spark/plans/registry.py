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


def msum(c):
    """Money-exact sum: accumulate as DECIMAL(30,6) (exact, associative
    → identical under ANY partitioning/order in ANY engine), then round
    to 2dp and cast double.  Plain double sums differ between engines
    in the last ulps, which flips the rounded cent on ~1 in 1e4 groups
    (observed on q9).  Quantize-then-sum is deterministic everywhere."""
    from pyspark.sql import functions as F
    return F.round(F.sum(c.cast("decimal(30,6)")), 2).cast("double")


def msum_sql(x: str) -> str:
    """DuckDB twin of msum()."""
    return f"CAST(round(sum(CAST(({x}) AS DECIMAL(30,6))), 2) AS DOUBLE)"


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
