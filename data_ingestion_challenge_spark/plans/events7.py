"""Events analytics, batch 7 (SURVEY.md §2A): retention health —
weekly churn and the longest-streak histogram, the cohort-free
counterparts of signup_cohort_retention / dau_wau_stickiness.

Parity notes: both reduce to exact BIGINT counts over Monday-start
(date_trunc 'week') user-week distincts; the only float is churn's
final bigint/bigint division rounded at 6dp.  The streak grouper is
datediff-minus-7·row_number integer arithmetic — gaps-and-islands with
no float surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.plans.registry import query

# --------------------------------------------------- weekly churn

@query(
    "weekly_churn",
    # Of the users active in week w, how many were NOT active in
    # w+1 (operators/stats.py:weekly_churn).  Last observed week is
    # excluded — its w+1 is unobservable.
    oracle=ST.WEEKLY_CHURN_ORACLE,
)
def weekly_churn(cat: Catalog) -> DataFrame:
    """One distinct over (user, week) — the same shuffle key every
    activity rollup uses — then a LEFT ANTI self-join on
    (user, week+7d) co-partitioned with it, and two week-sized
    aggregates.  Linear in events at 100 TB; output is |weeks| rows."""
    return ST.weekly_churn(cat.events)


# ---------------------------------------------- streak histogram

@query(
    "user_streak_histogram",
    # Histogram of each user's longest consecutive-active-week run
    # (operators/stats.py:user_streak_histogram) — the habit-strength
    # complement of weekly_churn.
    oracle=ST.USER_STREAK_HISTOGRAM_ORACLE,
)
def user_streak_histogram(cat: Catalog) -> DataFrame:
    """Gaps-and-islands with every window partitioned by user_id
    (never a global sort): distinct user-weeks → per-user integer
    run-grouper → three map-side-combined aggregates stepping down
    user×island → user → |streak-lengths| rows."""
    return ST.user_streak_histogram(cat.events)
