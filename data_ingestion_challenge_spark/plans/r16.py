"""Round-16 registrations (SURVEY.md §2A/§2B/§2C): the r15-verdict
lead — five from the parity-tested pool, the r16-slated batch
(tests/test_r16_candidates.py).  Two events-side growth readouts
(user_retention_curve, value_by_user_tenure), one relational
seasonality profile (order_weekday_profile), and two corpus-curation
ops (dedup_prefix template screen, cosine_threshold_sweep τ
calibration).  All five were built and oracle-parity-tested in r15;
this module only promotes them into the driver-gated registry.

Parity notes: retention/tenure ride exact integer day diffs with ONE
rounded divide; the weekday key is epoch-mod-7 (portable across the
Spark/DuckDB dow dialect split); dedup_prefix hashes the identical
space-rejoined prefix string in both engines; the cosine sweep buckets
the 4dp-ROUNDED cosine so bucket membership can't flip on a last-ulp
verify difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import dedup as DD
from data_ingestion_challenge_spark.operators import similarity as SIM
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ retention curve


@query(
    "user_retention_curve",
    # Day-k retention folded over ALL cohorts: of users first seen ≥ k
    # days before the horizon, how many were active again exactly k
    # days after their first day (operators/stats.py:
    # user_retention_curve).
    oracle=ST.USER_RETENTION_CURVE_ORACLE,
)
def user_retention_curve(cat: Catalog) -> DataFrame:
    """One user-keyed first-day rollup + one (day, user) distinct feed
    a user_id equi-join; eligibility comes from a ≤|days|²-row
    broadcast range join over two tiny rollups — never a second
    corpus scan."""
    return ST.user_retention_curve(cat.events)


# ------------------------------------------------ monetization mix


@query(
    "value_by_user_tenure",
    # Revenue split by account age at event time (day-0 / 1-7d /
    # 8-30d / 31d+): do we earn from new or from retained users?
    # (operators/stats.py:value_by_user_tenure).
    oracle=ST.VALUE_BY_USER_TENURE_ORACLE,
)
def value_by_user_tenure(cat: Catalog) -> DataFrame:
    """groupBy(user) for first days, ONE user_id equi-join (the
    user-sized first-day frame broadcasts at dim scale, shuffle-joins
    at corpus scale), one map-side-combined groupBy to 4 rows."""
    return ST.value_by_user_tenure(cat.events)


# -------------------------------------------- weekday seasonality


@query(
    "order_weekday_profile",
    # Order flow by day of week — the staffing/capacity table behind
    # the daily revenue monitor; weekday = days-since-epoch mod 7
    # (0 = Thursday), sidestepping the Spark-vs-DuckDB dow dialect
    # (operators/stats.py:order_weekday_profile).
    oracle=ST.ORDER_WEEKDAY_PROFILE_ORACLE,
)
def order_weekday_profile(cat: Catalog) -> DataFrame:
    """One linear scan, one map-side-combined groupBy to exactly 7
    rows; revenue exact DECIMAL with ONE rounded cast."""
    return ST.order_weekday_profile(cat.orders)


# ---------------------------------------- prefix template screen


@query(
    "dedup_prefix",
    # First-16-token prefix dup families: the cheap screen for
    # template/boilerplate dups (mirror scrapes, generated pages)
    # that exact-hash misses because tails differ and shingle dedup
    # prices at full-text cost (operators/dedup.py:dedup_prefix).
    oracle=DD.dedup_prefix_oracle_sql(),
)
def dedup_prefix(cat: Catalog) -> DataFrame:
    """ONE row per doc (no shingle explosion): linear tokenize+hash
    scan, one map-side-combined groupBy(prefix_hash), HAVING ≥ 2 —
    output is dup-family-sized."""
    return DD.dedup_prefix(cat.documents)


# --------------------------------------------- τ calibration sweep


@query(
    "cosine_threshold_sweep",
    # The embedding twin of dedup_threshold_sweep: IVF-candidate
    # pairs verified at a low floor, bucketed by 0.05 of exact
    # cosine with cumulative pairs-at-or-above — read before
    # committing to a SemDeDup τ (operators/similarity.py:
    # cosine_threshold_sweep).
    oracle=SIM.cosine_sweep_oracle_sql(),
)
def cosine_threshold_sweep(cat: Catalog) -> DataFrame:
    """ONE sub-quadratic IVF candidate run feeds every bucket (never
    a run per τ); the cumulative window runs over ≤ ~16 bucket rows
    on a single partition of a tiny frame."""
    return SIM.cosine_threshold_sweep(cat.embeddings)
