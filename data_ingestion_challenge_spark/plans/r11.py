"""Round-11 registrations (SURVEY.md §2A/§2B/§2C): the four r12-pool
leftovers — customer-value revenue deciles, per-source quality
percentiles, the tokenizer vocab-coverage curve, the seasonal-naive
forecast baseline — plus the near-dup source crosstab from the r13
pool.  All five were built and parity-tested in earlier rounds
(tests/test_r12_candidates.py, tests/test_r13_candidates.py); this
module only promotes them into the driver-gated registry.

Parity notes: deciles ride the DISTRIBUTED global_ntile (range
repartition + per-partition row_number + broadcast offsets — the
plan-audited no-single-task-sort discipline) with DECIMAL(28,2) value
sums; quality percentiles pair Spark ``percentile`` with DuckDB
``quantile_cont`` on 1e-4-rounded ratios; the coverage curve's
cumulative sums run over the top-max(k) rows only
(TakeOrderedAndProject, plan-audited); the seasonal MAE sums
|n − mean| as DECIMAL over integer counts scaled by the slot size
(exact in both engines); the crosstab reuses the verified
jaccard-pair set with least/greatest source normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.llm import (
    _SH_CTE, _shared_postings,
)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------ revenue concentration


@query(
    "customer_value_deciles",
    # Lifetime order value per customer cut into exact deciles —
    # the §2B revenue-concentration table
    # (operators/stats.py:customer_value_deciles).
    oracle=ST.CUSTOMER_VALUE_DECILES_ORACLE,
)
def customer_value_deciles(cat: Catalog) -> DataFrame:
    """LEFT join customer⋈orders collapses map-side to one row per
    customer; the decile cut is the DISTRIBUTED global_ntile (range
    repartition, never a single-task global sort — plan-pinned in
    tests/test_r12_candidates.py); the share divide runs over the
    10-row rollup only."""
    return ST.customer_value_deciles(cat.customer, cat.orders)


# ------------------------------------------ provider quality SLA


@query(
    "source_quality_percentiles",
    # Per-source stopword-ratio p25/p50/p75 + keep rate — the
    # per-provider quality contract
    # (operators/textstats.py:source_quality_percentiles).
    oracle=TS.SOURCE_QUALITY_PCTL_ORACLE,
)
def source_quality_percentiles(cat: Catalog) -> DataFrame:
    """One linear scan to per-doc ratios (split + filter builtins,
    JVM-side), then ONE map-side-combined groupBy(source) with exact
    interpolated percentiles — |sources| output rows."""
    return TS.source_quality_percentiles(cat.documents)


# ------------------------------------------ tokenizer vocab sizing


@query(
    "vocab_coverage_curve",
    # Token-occurrence coverage at vocab cutoffs k — the curve that
    # sizes a tokenizer's vocabulary
    # (operators/textstats.py:vocab_coverage_curve).
    oracle=TS.vocab_coverage_oracle_sql(),
)
def vocab_coverage_curve(cat: Catalog) -> DataFrame:
    """Tokenize → vocab-sized frequency groupBy → top-max(k) via
    TakeOrderedAndProject (plan-pinned: never a data-sized global
    sort) → cumulative window over those ≤max(k) rows only; total
    occurrences is one scalar agg broadcast back."""
    return TS.vocab_coverage_curve(cat.documents)


# ------------------------------------------ forecast baseline MAE


@query(
    "hourly_seasonal_baseline",
    # Seasonal-naive (same hour-of-week mean) forecast MAE per
    # event_type — the baseline an anomaly detector must beat
    # (operators/stats.py:hourly_seasonal_baseline).
    oracle=ST.HOURLY_SEASONAL_BASELINE_ORACLE,
)
def hourly_seasonal_baseline(cat: Catalog) -> DataFrame:
    """One scan collapses to |types|×|hours| counts; the hour-of-week
    mean is a window over that tiny rollup; MAE sums exact DECIMAL
    |n·slots − total| terms — no float drift between engines."""
    return ST.hourly_seasonal_baseline(cat.events)


# ------------------------------------------ source mirror audit


@query(
    "near_dup_source_crosstab",
    # Verified near-dup pair counts per unordered source pair —
    # which providers mirror/scrape each other
    # (operators/dedup.py:near_dup_source_crosstab).
    oracle=D.near_dup_crosstab_oracle_sql(_SH_CTE),
)
def near_dup_source_crosstab(cat: Catalog) -> DataFrame:
    """Rides the shared persisted posting table: PPJoin-filtered
    candidate equi-join → verified jaccard pairs → broadcast the
    doc→source map onto the pair set → |sources|²-bounded groupBy
    with least/greatest normalization (an (a,b) and a (b,a) pair
    land in one cell)."""
    return D.near_dup_source_crosstab(
        cat.documents, n=3, tau=0.8, posting=_shared_postings(cat))
