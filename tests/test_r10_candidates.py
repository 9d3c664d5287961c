"""Further registration candidates (round-9/10 pool): built,
oracle-twinned, and parity-tested now; driver registration deferred so
the verify-window rotation keeps draining (SURVEY §7 budget).  Three
ops: source_minhash_overlap (which sources mirror each other),
source_token_kl (per-source mixture idiosyncrasy), and
user_streak_histogram (longest consecutive-active-week streaks)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.test_r9_candidates import _compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


# ------------------------------------------- cross-source overlap

def test_source_minhash_overlap_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.dedup import (
        source_minhash_overlap, source_overlap_oracle_sql,
    )
    from data_ingestion_challenge_spark.plans.llm import (
        _MH_VALUES, _SH_CTE,
    )
    sdf = source_minhash_overlap(cat.documents, n=3, k=16)
    rows = _compare(sdf, duck,
                    source_overlap_oracle_sql(_SH_CTE, _MH_VALUES,
                                              k=16))
    assert len(rows) >= 1
    for r in sdf.collect():
        assert 0 <= r.n_agree <= 16
        assert abs(r.est_jaccard - r.n_agree / 16) < 1e-12


def test_source_minhash_overlap_identical_sources(spark):
    """Two sources with the SAME shingle union agree on every minimum
    (est 1.0); a disjoint third source estimates near 0.  Min-of-min
    == union minhash: duplicated docs inside a source must not move
    the signature."""
    from data_ingestion_challenge_spark.operators.dedup import (
        source_minhash_overlap,
    )
    base = "the quick brown fox jumps over the lazy dog again"
    other = "zebra xylophone quartz vortex jumble wizard kiln onyx"
    rows = [(1, base, "s1"), (2, base, "s2"),
            (3, base, "s2"),          # dup doc: no signature shift
            (4, other, "s3")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r
           for r in source_minhash_overlap(docs).collect()}
    assert out[("s1", "s2")].est_jaccard == 1.0
    assert out[("s1", "s3")].n_agree <= 2
    assert out[("s2", "s3")].n_agree == out[("s1", "s3")].n_agree


def test_source_minhash_overlap_short_doc_source_absent(spark):
    """A source whose docs are all < n words has no shingles, no
    signature, and no pair rows — not a NULL-filled row."""
    from data_ingestion_challenge_spark.operators.dedup import (
        source_minhash_overlap,
    )
    rows = [(1, "a b c d e", "real"), (2, "tiny", "empty_src")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    assert source_minhash_overlap(docs).collect() == []


# ------------------------------------------------ source token KL

def test_source_token_kl_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        SOURCE_TOKEN_KL_ORACLE, source_token_kl,
    )
    sdf = source_token_kl(cat.documents)
    rows = _compare(sdf, duck, SOURCE_TOKEN_KL_ORACLE)
    assert len(rows) >= 1
    for r in sdf.collect():
        # KL ≥ 0 up to the 1e-9 per-term rounding of the exact sum
        assert r.kl_bits >= -1e-5


def test_source_token_kl_hand_case(spark):
    """A source distributed exactly like the corpus has KL 0; a
    source concentrated on tokens the other never uses has KL > 0."""
    from data_ingestion_challenge_spark.operators.textstats import (
        source_token_kl,
    )
    rows = [(1, "a b", "mirror"), (2, "a b", "mirror2"),
            (3, "z z z z", "weird"), (4, "a b a b", "mirror"),
            (5, "a b a b", "mirror2")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {r.source: r for r in source_token_kl(docs).collect()}
    # mirror and mirror2 have identical distributions over {a, b};
    # weird is all-z.  KL(mirror ‖ corpus) equals KL(mirror2 ‖ corpus)
    # and both are < KL(weird ‖ corpus).
    assert out["mirror"].kl_bits == out["mirror2"].kl_bits
    assert out["weird"].kl_bits > out["mirror"].kl_bits
    assert out["weird"].n_tokens == 4


# ------------------------------------------------- streak histogram

def test_user_streak_histogram_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.stats import (
        USER_STREAK_HISTOGRAM_ORACLE, user_streak_histogram,
    )
    sdf = user_streak_histogram(cat.events)
    rows = _compare(sdf, duck, USER_STREAK_HISTOGRAM_ORACLE)
    assert len(rows) >= 1
    assert sum(r[0] for r in rows) == cat.events.select(
        "user_id").distinct().count()


def test_user_streak_histogram_hand_case(spark):
    """u1: weeks 1-3 consecutive (streak 3).  u2: week 1, gap, weeks
    3-4 (longest 2).  u3: week 1 only (streak 1).  Multiple events in
    one week collapse."""
    from datetime import datetime

    from data_ingestion_challenge_spark.operators.stats import (
        user_streak_histogram,
    )
    rows = [(1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 8)),
            (1, datetime(2024, 1, 15)), (1, datetime(2024, 1, 16)),
            (2, datetime(2024, 1, 1)), (2, datetime(2024, 1, 15)),
            (2, datetime(2024, 1, 22)),
            (3, datetime(2024, 1, 3))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.streak_weeks: r.n_users
           for r in user_streak_histogram(ev).collect()}
    assert out == {3: 1, 2: 1, 1: 1}
