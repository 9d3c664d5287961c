"""Round-9 registration candidates: built, oracle-twinned, and
parity-tested now; driver registration deferred so the verify-window
rotation keeps draining (SURVEY §7 budget).  Four ops:
token_pmi_bigrams (collocation mining), embedding_dim_covariance
(redundant-axis audit before PQ/IVF), weekly_churn (retention alarm),
length_vocab_corr (Heaps'-law source audit)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


def _compare(sdf, duck, sql):
    """Order-insensitive row compare with fields aligned by COLUMN
    NAME (the driver's rule)."""
    rel = duck.sql(sql)
    dcols, drows = rel.columns, rel.fetchall()
    scols = sdf.columns
    assert sorted(scols) == sorted(dcols)
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    got = sorted((tuple(r[i] for i in sorder)
                  for r in sdf.collect()), key=repr)
    want = sorted((tuple(r[i] for i in dorder)
                   for r in drows), key=repr)
    assert got == want
    return got


# ------------------------------------------------------ collocations

def test_token_pmi_bigrams_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.collocation import (
        pmi_oracle_sql, token_pmi_bigrams,
    )
    sdf = token_pmi_bigrams(cat.documents, k=25, min_count=5)
    rows = _compare(sdf, duck, pmi_oracle_sql(k=25, min_count=5))
    assert 0 < len(rows) <= 25


def test_token_pmi_hand_case(spark):
    """A bigram whose parts always co-occur (new york) scores far
    above a filler pair built from the corpus's commonest token
    (the the), and bigram counts are adjacent-sliding exact."""
    from data_ingestion_challenge_spark.operators.collocation import (
        token_pmi_bigrams,
    )
    rows = [(i, " ".join(["new york"] * 3 + ["the"] * 6))
            for i in range(5)]
    rows += [(100 + i, "the quick brown fox the lazy dog the end "
              "the start") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.w1, r.w2): r for r in
           token_pmi_bigrams(docs, k=50, min_count=5).collect()}
    assert out[("new", "york")].n_xy == 15
    assert out[("the", "the")].n_xy == 25
    assert out[("new", "york")].pmi > out[("the", "the")].pmi


def test_token_pmi_short_docs_safe(spark):
    """0- and 1-token docs contribute no bigrams (the sequence guard),
    not a crash or a corrupted pair."""
    from data_ingestion_challenge_spark.operators.collocation import (
        token_pmi_bigrams,
    )
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b a b a b a b a b")],
        "doc_id long, text string")
    out = token_pmi_bigrams(docs, k=10, min_count=1).collect()
    assert {(r.w1, r.w2) for r in out} == {("a", "b"), ("b", "a")}


# ------------------------------------------- dim-covariance audit

def test_embedding_dim_covariance_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.embstats import (
        dim_covariance_oracle_sql, embedding_dim_covariance,
    )
    sdf = embedding_dim_covariance(cat.embeddings, k=25)
    rows = _compare(sdf, duck, dim_covariance_oracle_sql(k=25))
    assert len(rows) == 25


def test_embedding_dim_covariance_hand_case(spark):
    """dims 0 and 1 move together (cov > 0), dim 2 mirrors dim 0
    (cov < 0), dim 3 is constant (cov 0 with everything) — the rank
    must surface the correlated pairs first."""
    from data_ingestion_challenge_spark.operators.embstats import (
        embedding_dim_covariance,
    )
    vecs = [(i, [float(i), float(i), float(-i), 1.0]) for i in range(8)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>")
    out = embedding_dim_covariance(emb, k=6).collect()
    by_pair = {(r.i, r.j): r.cov for r in out}
    assert by_pair[(0, 1)] > 0
    assert by_pair[(0, 2)] < 0
    assert abs(by_pair[(0, 1)]) == abs(by_pair[(0, 2)])
    assert by_pair[(0, 3)] == 0.0
    # constant dim sorts last among the six pairs
    assert out[-1].cov == 0.0


# ------------------------------------------------------ weekly churn

def test_weekly_churn_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        WEEKLY_CHURN_ORACLE, weekly_churn,
    )
    sdf = weekly_churn(cat.events)
    rows = _compare(sdf, duck, WEEKLY_CHURN_ORACLE)
    assert len(rows) >= 1


def test_weekly_churn_hand_case(spark):
    """u1 active wk1 only (churned), u2 active wk1+wk2 (retained in
    wk1, churned in wk2 — but wk2 is the last week, so excluded)."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.stats import (
        weekly_churn,
    )
    rows = [(1, datetime(2024, 1, 1, 10)),   # wk of Jan 1 (Mon)
            (2, datetime(2024, 1, 2, 10)),
            (2, datetime(2024, 1, 8, 10))]   # wk of Jan 8
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = weekly_churn(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r.week_start) == "2024-01-01"
    assert r.n_active == 2 and r.n_churned == 1
    assert r.churn_rate == 0.5


# ---------------------------------------------- Heaps'-law audit

def test_length_vocab_corr_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        LENGTH_VOCAB_CORR_ORACLE, length_vocab_corr,
    )
    sdf = length_vocab_corr(cat.documents)
    rows = _compare(sdf, duck, LENGTH_VOCAB_CORR_ORACLE)
    assert len(rows) >= 1
    # real corpus: correlation is strong but not degenerate
    for r in sdf.collect():
        assert r.corr_len_vocab is None or -1 <= r.corr_len_vocab <= 1


def test_length_vocab_corr_hand_case(spark):
    """All-distinct docs give corr exactly 1.0; a zero-variance source
    (identical docs) yields NULL via the CASE guard, not a div-0."""
    from data_ingestion_challenge_spark.operators.textstats import (
        length_vocab_corr,
    )
    rows = [(1, "perfect", "a b"), (2, "perfect", "a b c"),
            (3, "perfect", "a b c d"),
            (10, "flat", "x x x"), (11, "flat", "x x x")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = {r.source: r for r in length_vocab_corr(docs).collect()}
    assert out["perfect"].corr_len_vocab == 1.0
    assert out["flat"].corr_len_vocab is None
    assert out["flat"].n_docs == 2
