"""Round-11+ registration candidates: built, oracle-twinned, and
parity-tested now; driver registration deferred to keep the
verify-window rotation draining (SURVEY §7 budget).  Five ops:
near_dup_source_crosstab (which sources mirror each other, by
VERIFIED pairs), dup_degree_distribution (near-dup graph shape before
components), token_length_histogram (tokenizer/vocab design),
ship_lag_by_priority (fulfillment SLA, Q4 flavor),
returning_user_ratio_daily (growth accounting)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ------------------------------------------- source mirror audit

def test_near_dup_source_crosstab_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.dedup import (
        near_dup_crosstab_oracle_sql, near_dup_source_crosstab,
    )
    from data_ingestion_challenge_spark.plans.llm import _SH_CTE
    sdf = near_dup_source_crosstab(cat.documents, n=3, tau=0.8)
    rows = _compare(sdf, duck, near_dup_crosstab_oracle_sql(_SH_CTE))
    assert len(rows) >= 1  # sf0.01 plants cross-source near-dups


def test_near_dup_crosstab_hand_case(spark):
    """An (a,b) and a (b,a) pair land in ONE normalized cell; a
    same-source pair keeps its own diagonal cell."""
    from data_ingestion_challenge_spark.operators.dedup import (
        near_dup_source_crosstab,
    )
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base, "web"), (2, base + " iota", "books"),
         (3, base, "books"), (4, "x y z w v u t s", "web")],
        "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r.n_pairs for r in
           near_dup_source_crosstab(docs).collect()}
    # pairs: (1,2) web-books, (1,3) web-books, (2,3) books-books
    assert out[("books", "web")] == 2
    assert out[("books", "books")] == 1
    assert ("web", "web") not in out


# ------------------------------------------- dup graph shape

def test_dup_degree_distribution_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.dedup import (
        dup_degree_distribution, dup_degree_oracle_sql,
    )
    from data_ingestion_challenge_spark.plans.llm import _SH_CTE
    sdf = dup_degree_distribution(cat.documents, n=3, tau=0.8)
    rows = _compare(sdf, duck, dup_degree_oracle_sql(_SH_CTE))
    assert len(rows) >= 1


def test_dup_degree_hand_case(spark):
    """A triangle of near-identical docs gives three degree-2 docs;
    an isolated pair gives two degree-1 docs; a unique doc never
    appears."""
    from data_ingestion_challenge_spark.operators.dedup import (
        dup_degree_distribution,
    )
    tri = "alpha beta gamma delta epsilon zeta eta theta"
    pair = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, tri), (2, tri), (3, tri),
         (4, pair), (5, pair),
         (6, "lonely words that match nothing else at all")],
        "doc_id long, text string")
    out = {r.degree: r.n_docs for r in
           dup_degree_distribution(docs).collect()}
    assert out == {2: 3, 1: 2}


# ------------------------------------------- tokenizer design

def test_token_length_histogram_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        TOKEN_LENGTH_HISTOGRAM_ORACLE, token_length_histogram,
    )
    sdf = token_length_histogram(cat.documents)
    rows = _compare(sdf, duck, TOKEN_LENGTH_HISTOGRAM_ORACLE)
    assert len(rows) >= 2


def test_token_length_hand_case(spark):
    """Occurrences count repeats, distinct does not; lengths are
    character counts."""
    from data_ingestion_challenge_spark.operators.textstats import (
        token_length_histogram,
    )
    docs = spark.createDataFrame(
        [(1, "aa bb aa ccc")], "doc_id long, text string")
    out = {r.tok_len: (r.n_tokens, r.n_distinct) for r in
           token_length_histogram(docs).collect()}
    assert out == {2: (3, 2), 3: (1, 1)}


# ------------------------------------------- fulfillment SLA

def test_ship_lag_by_priority_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        SHIP_LAG_BY_PRIORITY_ORACLE, ship_lag_by_priority,
    )
    sdf = ship_lag_by_priority(cat.orders, cat.lineitem)
    rows = _compare(sdf, duck, SHIP_LAG_BY_PRIORITY_ORACLE)
    assert len(rows) >= 1


def test_ship_lag_hand_case(spark):
    """Lags are exact day diffs: 10 and 20 days → avg 15.0, max 20."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.stats import (
        ship_lag_by_priority,
    )
    o = spark.createDataFrame(
        [(1, "1-URGENT", datetime(2024, 1, 1))],
        "o_orderkey long, o_orderpriority string, "
        "o_orderdate timestamp")
    li = spark.createDataFrame(
        [(1, datetime(2024, 1, 11)), (1, datetime(2024, 1, 21))],
        "l_orderkey long, l_shipdate timestamp")
    r = ship_lag_by_priority(o, li).collect()[0]
    assert r.n_lines == 2 and r.avg_lag_days == 15.0
    assert r.max_lag_days == 20


# ------------------------------------------- growth accounting

def test_returning_user_ratio_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        RETURNING_USER_RATIO_ORACLE, returning_user_ratio_daily,
    )
    sdf = returning_user_ratio_daily(cat.events)
    rows = _compare(sdf, duck, RETURNING_USER_RATIO_ORACLE)
    assert len(rows) >= 2


def test_returning_user_hand_case(spark):
    """Day 1: both users new (ratio 0).  Day 2: one returning user
    and one new → ratio 0.5.  Day 3: the returning user alone →
    ratio 1."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.stats import (
        returning_user_ratio_daily,
    )
    rows = [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 1)),
            (1, datetime(2024, 1, 2)), (3, datetime(2024, 1, 2)),
            (1, datetime(2024, 1, 3)), (1, datetime(2024, 1, 3))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r.day): (r.n_active, r.n_returning, r.returning_ratio)
           for r in returning_user_ratio_daily(ev).collect()}
    assert out["2024-01-01"] == (2, 0, 0.0)
    assert out["2024-01-02"] == (2, 1, 0.5)
    assert out["2024-01-03"] == (1, 1, 1.0)
