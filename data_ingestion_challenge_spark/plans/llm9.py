"""LLM-training-data pipeline, batch 9 (SURVEY.md §2C): corpus
linguistics (PMI collocations), embedding-space redundancy audit, the
two per-source mixture-design audits (Heaps'-law correlation, unigram
KL), and the cross-source MinHash mirror detector.

Parity notes: all five ride the repo's established cross-engine
disciplines — exact BIGINT counts with one final double expression
(pmi, length_vocab_corr), 1e-9-rounded DECIMAL(30,9) exact sums
(source_token_kl, embedding_dim_covariance's products), and the
md5-arithmetic MinHash twin (source_minhash_overlap reuses plans.llm's
_SH_CTE/_MH_VALUES verbatim, grouped by source instead of doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import collocation as CL
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import embstats as ES
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.llm import (
    _MH_VALUES, _SH_CTE, _shared_postings,
)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ collocation mining

@query(
    "token_pmi_bigrams",
    # Top-25 adjacent-bigram collocations by PMI (min_count 5) — the
    # multi-word-unit / templated-text audit
    # (operators/collocation.py:token_pmi_bigrams).
    oracle=CL.pmi_oracle_sql(k=25, min_count=5),
)
def token_pmi_bigrams(cat: Catalog) -> DataFrame:
    """Two map-side-combined groupBys (vocab- and distinct-bigram-
    sized), un-hinted vocab equi-joins (AQE broadcasts when actually
    small — a web corpus's vocab may not be), 1-row broadcast totals,
    and a TakeOrdered top-k; the rank window sees only k rows.  Linear
    in corpus tokens at 100 TB."""
    return CL.token_pmi_bigrams(cat.documents, k=25, min_count=5)


# ------------------------------------------- embedding-space audit

@query(
    "embedding_dim_covariance",
    # Top-25 dimension pairs by |covariance| — the redundant-axis
    # audit run before spending on PQ/IVF training
    # (operators/embstats.py:embedding_dim_covariance).
    oracle=ES.dim_covariance_oracle_sql(k=25),
)
def embedding_dim_covariance(cat: Catalog) -> DataFrame:
    """posexplode → co-partitioned self-equi-join on vec_id (upper
    triangle, d²/2 products per vector — the right declarative plan at
    d=64; a blocked gemm takes over at d≳1k), two map-side-combined
    groupBys down to d² model-sized rows, broadcast mean join-back,
    TakeOrdered top-k."""
    return ES.embedding_dim_covariance(cat.embeddings, k=25)


# -------------------------------------------- per-source audits

@query(
    "length_vocab_corr",
    # Per-source Pearson r between doc length and vocab size — the
    # Heaps'-law templated/boilerplate source flag
    # (operators/textstats.py:length_vocab_corr).
    oracle=TS.LENGTH_VOCAB_CORR_ORACLE,
)
def length_vocab_corr(cat: Catalog) -> DataFrame:
    """One narrow map + one map-side-combined groupBy(source) over
    five exact-BIGINT sufficient statistics; the correlation is a
    single double expression per |sources|-row.  Pure linear scan at
    100 TB; zero-variance sources yield NULL via the CASE guard."""
    return TS.length_vocab_corr(cat.documents)


@query(
    "source_token_kl",
    # Per-source KL(source-unigrams ‖ corpus-unigrams) in bits — the
    # "does this source deserve its own mixture weight" number
    # (operators/textstats.py:source_token_kl).
    oracle=TS.SOURCE_TOKEN_KL_ORACLE,
)
def source_token_kl(cat: Catalog) -> DataFrame:
    """One groupBy(source, token) pass; corpus counts DERIVE from it
    (no second corpus scan); totals are broadcast aggregates; terms
    round to 1e-9 and sum as DECIMAL(30,9) so the value is
    summation-order independent in both engines."""
    return TS.source_token_kl(cat.documents)


# ------------------------------------------- cross-source overlap

@query(
    "source_minhash_overlap",
    # Which sources mirror each other: per source-PAIR MinHash
    # Jaccard of the sources' UNION shingle sets
    # (operators/dedup.py:source_minhash_overlap).  min-of-min over a
    # source's per-doc minima IS the union MinHash — duplicated docs
    # cannot shift a signature.
    oracle=D.source_overlap_oracle_sql(_SH_CTE, _MH_VALUES, k=16),
)
def source_minhash_overlap(cat: Catalog) -> DataFrame:
    """Rides the shared persisted shingle-posting table (one corpus
    pass fanned across the dedup family); the pair comparison is a
    broadcast self-join of a |sources|-row aggregate — model-sized,
    never corpus².  est_jaccard = n_agree/16 is binary-exact."""
    return D.source_minhash_overlap(cat.documents, n=3, k=16,
                                    posting=_shared_postings(cat))
