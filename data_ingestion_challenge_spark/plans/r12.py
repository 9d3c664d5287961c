"""Round-12 registrations (SURVEY.md §2A/§2B/§2C/§2D): the two
r11-verdict leads — the KMV/theta set-intersection sketch (closes the
last open §2 checkbox) and the synthetic-WAV inventory (puts the round
real WAV encode→decode path behind the driver's correctness gate) —
plus three from the r13 pool: the near-dup graph degree histogram, the
tokenizer token-length profile, and the per-priority fulfillment-lag
SLA table.  All five were built and parity-tested in earlier rounds
(tests/test_r15_candidates.py, tests/test_multimodal_real.py,
tests/test_r13_candidates.py); this module only promotes them into the
driver-gated registry.

Parity notes: the KMV sketch rides the md5-derived h32 so sketch
contents, θ, and estimates replay bit-exactly in DuckDB, with the
exact distinct-intersection audit in the same row; the WAV witness is
a closed-form oracle (square-wave RMS = amplitude, bytes =
44 + 2·frames) over the REAL encoder+parser; the degree histogram and
the crosstab share the persisted posting table; ship-lag averages are
ONE double divide of an exact BIGINT day-diff sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import multimodal as MM
from data_ingestion_challenge_spark.operators import sketch as SK
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.llm import (
    _SH_CTE, _shared_postings,
)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------ KMV audience overlap


@query(
    "kmv_weekly_user_overlap",
    # Consecutive-week audience overlap from per-week KMV/theta
    # sketches, exact-intersection audit column in the same row
    # (operators/sketch.py:kmv_weekly_user_overlap).
    oracle=SK.kmv_overlap_oracle_sql(),
)
def kmv_weekly_user_overlap(cat: Catalog) -> DataFrame:
    """One map-side-combined distinct to (week, h); the per-week
    k-min runs the two-phase salted top-n (local row_number per
    (week, salt) prefilter, then a global rank over ≤ salts·k rows —
    no single task sorts a week's full user set); everything after
    operates on k·|weeks| rows.  The exact audit column is the one
    user-keyed equi-join; at 100 TB run the estimator alone and
    sample the audit."""
    return SK.kmv_weekly_user_overlap(cat.events)


# ------------------------------------------ real-WAV decode witness


@query(
    "synth_wav_inventory",
    # Gateable witness that the WAV path is a REAL parser: genuine
    # square-wave WAV bytes synthesized + decoded per doc inside one
    # Arrow pass, exact closed-form oracle
    # (operators/multimodal.py:synth_wav_inventory).
    oracle=MM.SYNTH_WAV_INVENTORY_ORACLE,
)
def synth_wav_inventory(cat: Catalog) -> DataFrame:
    """Linear mapInPandas over (doc_id, n_chars) only — encode and
    parse stay inside the Arrow batch, no bytes ever shuffle; a
    chunk-walk / block-align / RMS decode bug lands as a driver hash
    mismatch, not just a unit-test failure."""
    return MM.synth_wav_inventory(cat.documents)


# ------------------------------------------ dup graph shape


@query(
    "dup_degree_distribution",
    # Degree histogram of the verified near-dup pair graph — the
    # graph-shape audit read before connected components
    # (operators/dedup.py:dup_degree_distribution).
    oracle=D.dup_degree_oracle_sql(_SH_CTE),
)
def dup_degree_distribution(cat: Catalog) -> DataFrame:
    """Rides the shared persisted posting table (PPJoin-filtered
    equi-join candidates, never all pairs); the histogram is a
    near-dup-sized endpoint union, one groupBy(doc), one tiny
    groupBy(degree)."""
    return D.dup_degree_distribution(
        cat.documents, n=3, tau=0.8, posting=_shared_postings(cat))


# ------------------------------------------ tokenizer design


@query(
    "token_length_histogram",
    # Corpus token-length profile (tok_len, n_tokens, n_distinct) —
    # the BPE vocab-sizing table
    # (operators/textstats.py:token_length_histogram).
    oracle=TS.TOKEN_LENGTH_HISTOGRAM_ORACLE,
)
def token_length_histogram(cat: Catalog) -> DataFrame:
    """Tokenize-explode (linear) → ONE groupBy(length) with a
    distinct-count expand bounded by VOCAB size, not token count;
    ≤ ~100 output rows."""
    return TS.token_length_histogram(cat.documents)


# ------------------------------------------ fulfillment SLA


@query(
    "ship_lag_by_priority",
    # Per-priority order→ship lag profile (Q4's late-line flavor
    # rolled up per priority class)
    # (operators/stats.py:ship_lag_by_priority).
    oracle=ST.SHIP_LAG_BY_PRIORITY_ORACLE,
)
def ship_lag_by_priority(cat: Catalog) -> DataFrame:
    """Fact⋈fact equi-join on the order key (the bucketed-layout
    join at 100 TB), exact integer day diffs, then one
    map-side-combined groupBy to 5 rows."""
    return ST.ship_lag_by_priority(cat.orders, cat.lineitem)
