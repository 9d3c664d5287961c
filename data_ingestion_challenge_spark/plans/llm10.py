"""Round-10 registrations (SURVEY.md §2B/§2C): the four r11-pool
leftovers — BPE merge-candidate mining, the posting-store df
histogram, the PQ subspace-variance codebook audit, monthly order
seasonality — plus the declared-vs-predicted language confusion
rollup from the r12 pool.  All five were built and parity-tested in
earlier rounds (tests/test_r11_candidates.py,
tests/test_r12_candidates.py); this module only promotes them into
the driver-gated registry.

Parity notes: exact BIGINT counts everywhere; monthly revenue rides
the q1 msum discipline (exact DECIMAL sum → round 2 → double) with
growth as ONE double divide rounded 6dp; pq_subspace_variance uses
integer-micro moments and a 1e-9-rounded DECIMAL(30,9) cross-dim sum;
lang_confusion reuses the lang_id classifier's 1e-6 score-grid
contract verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import collocation as CL
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import embstats as ES
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.llm import (
    _SH_CTE, _shared_postings,
)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ tokenizer design


@query(
    "bpe_merge_candidates",
    # Top-25 word-internal adjacent char pairs by corpus-frequency-
    # weighted count — BPE merge-selection step 1 (Sennrich 2016),
    # the corpus-side leg of the tokenizer_fertility audit
    # (operators/collocation.py:bpe_merge_candidates).
    oracle=CL.bpe_oracle_sql(k=25),
)
def bpe_merge_candidates(cat: Catalog) -> DataFrame:
    """Tokenize → vocab-sized word-frequency groupBy (map-side
    combined) → per-WORD char-pair explode over the VOCAB table (a
    100 TB corpus has bounded distinct words, so the explode is
    model-sized, never corpus-sized) → pair groupBy → TakeOrdered
    top-k; the rank window sees only k rows."""
    return CL.bpe_merge_candidates(cat.documents, k=25)


# ------------------------------------------- posting-store capacity


@query(
    "shingle_df_distribution",
    # log2-bucketed shingle document-frequency histogram — the
    # inverted-index capacity/skew planning table
    # (operators/dedup.py:shingle_df_distribution).
    oracle=D.shingle_df_oracle_sql(_SH_CTE),
)
def shingle_df_distribution(cat: Catalog) -> DataFrame:
    """Rides the shared persisted posting table; one map-side-combined
    groupBy(s) to df (shingle-vocab-sized) and one tiny bucket
    groupBy — linear, output ≤ ~50 rows."""
    return D.shingle_df_distribution(
        cat.documents, n=3, posting=_shared_postings(cat))


# --------------------------------------------- PQ codebook design


@query(
    "pq_subspace_variance",
    # Per-PQ-subspace total variance (m=8 contiguous blocks) — the
    # codebook budget audit run before ann_pq_topk training
    # (operators/embstats.py:pq_subspace_variance).
    oracle=ES.pq_subspace_oracle_sql(m=8),
)
def pq_subspace_variance(cat: Catalog) -> DataFrame:
    """posexplode → ONE map-side-combined groupBy(dim) to d model
    rows (exact integer-micro moments); everything after is
    driver-trivial.  Linear in vectors at 100 TB."""
    return ES.pq_subspace_variance(cat.embeddings, m=8)


# --------------------------------------------- demand seasonality


@query(
    "monthly_order_growth",
    # Per-month order volume / revenue / MoM growth — the §2B
    # seasonality-trend table (operators/stats.py:
    # monthly_order_growth).
    oracle=ST.MONTHLY_ORDER_GROWTH_ORACLE,
)
def monthly_order_growth(cat: Catalog) -> DataFrame:
    """One map-side-combined groupBy to |months| rows; the lag window
    runs over that tiny rollup only (a century is 1200 rows)."""
    return ST.monthly_order_growth(cat.orders)


# --------------------------------------------- label calibration


@query(
    "lang_confusion_matrix",
    # Declared-vs-predicted language confusion cells — the label-
    # calibration audit over the lang_id classifier
    # (operators/textstats.py:lang_confusion_matrix).
    oracle=TS.lang_confusion_oracle_sql(),
)
def lang_confusion_matrix(cat: Catalog) -> DataFrame:
    """The classifier's one Arrow pass plus a |langs|²-sized groupBy —
    model-sized output, never doc-sized."""
    return TS.lang_confusion_matrix(cat.documents)
