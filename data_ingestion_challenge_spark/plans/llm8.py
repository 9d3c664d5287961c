"""LLM-training-data pipeline, batch 8 (SURVEY.md §2C): source-level
label/outlier audit, contrastive hard-negative mining, and the LSH
banding recommender.

Parity notes: source_outlier_score rounds per-token log-probs to 1e-9
and sums as DECIMAL(30,9) so scores are partition-order-independent
(the BM25 msum pattern); hard_negative_pairs reuses the
dedup_embedding_cosine pair oracle with a label-mismatch filter;
recommend_banding computes the S-curve with each engine's own pow()
over the same structural (bands, rows) divisor table — the selection
threshold sits far from every computed probability so IEEE pow
agreement is not load-bearing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import similarity as S
from data_ingestion_challenge_spark.operators import textstats as TS
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------------ source-label audit

@query(
    "source_outlier_score",
    # Unigram naive-Bayes mislabel/outlier margin per document — the
    # fastText-classifier stand-in a pipeline runs before mixing
    # sources.  DECIMAL(30,9) exact log-likelihood sums; pred_source
    # ties break alphabetically on the exact decimal score.
    oracle=TS.source_outlier_oracle_sql(),
)
def source_outlier_score(cat: Catalog) -> DataFrame:
    """(doc_id, source, pred_source, margin): margin = own-source
    log-likelihood minus best other source under an add-1-smoothed
    unigram NB (operators/textstats.py:source_outlier_score).  Model
    is one vocab×|sources| groupBy broadcast back; scored stream is
    tokens×|sources| with partial aggregation — linear at 100 TB."""
    return TS.source_outlier_score(cat.documents)


# ------------------------------------------------ contrastive mining

@query(
    "hard_negative_pairs",
    # Close-embedding different-label pairs (cosine ≥ 0.35): the
    # contrastive-training negatives list doubling as a label-noise
    # audit (operators/similarity.py:hard_negative_pairs).
    oracle=S.hard_negative_oracle_sql(tau=0.35),
)
def hard_negative_pairs(cat: Catalog) -> DataFrame:
    """EXACTNESS AUDIT twin of hard_negative_pairs_ann: candidate
    pairs come from the blocked-gemm cosine join — exact O(n²) FLOPs
    by declared contract, the recall ground truth; the ANN entry
    below is the plan a deployment runs at corpus scale.  Labels
    attach via two plain equi-joins with NO broadcast hint — the
    (vec_id, label) projection is corpus-sized, AQE broadcasts only
    when it is actually small."""
    return S.hard_negative_pairs(cat.embeddings, tau=0.35)


@query(
    "hard_negative_pairs_ann",
    # The SCALE path: multi-probe IVF candidates (linear in corpus
    # size) + label-mismatch filter + exact-cosine verify.  The
    # oracle replays the approximate index EXACTLY (ivf_candidate_cte
    # — same seeding, same probe rank), so the hash gates the ANN
    # plan itself; recall vs the gemm twin is floor-gated in
    # tests/test_r8_candidates.py (0.93 measured at sf0.001 and
    # sf0.01, ANN set provably a subset — verify readmits nothing).
    oracle=S.hard_negative_ann_oracle_sql(tau=0.35),
)
def hard_negative_pairs_ann(cat: Catalog) -> DataFrame:
    """Scale-safe hard-negative mining: candidates from the
    multi-probe IVF index (O(n·nprobe²·cell) materialized rows —
    LINEAR, vs the gemm twin's O(n²)), exact-cosine verified, then
    the label-mismatch filter (operators/similarity.py:
    hard_negative_pairs_ann).  Pass the maintained index table
    (Engine.materialize_ivf/extend_ivf) as assignments in a
    deployment to skip the probe stage entirely."""
    return S.hard_negative_pairs_ann(cat.embeddings, tau=0.35)


# ------------------------------------------------ LSH band planning

_RB_K, _RB_TAU, _RB_FN = 16, 0.8, 0.05
_RB_DIVS = [(b, _RB_K // b) for b in range(1, _RB_K + 1)
            if _RB_K % b == 0]


@query(
    "recommend_banding",
    # The cost-optimal banding of a k=16 MinHash signature for
    # target τ=0.8 under a 5% false-negative budget: the FIRST
    # banding in ascending-bands order whose S-curve collision
    # probability reaches 1−0.05 (fewer bands ⇒ fewer candidate
    # pairs to verify).  Each engine computes 1−(1−τ^r)^b itself
    # over the same structural divisor table — unlike
    # lsh_band_planner's literal probabilities, this gate checks the
    # S-curve MATH cross-engine, not just the constants.
    oracle=f"""
    WITH c(bands, rows_per_band) AS (VALUES
        {", ".join(f"({b}, {r})" for b, r in _RB_DIVS)})
    SELECT bands, rows_per_band,
           round(1 - power(1 - power({_RB_TAU}, rows_per_band),
                           bands), 6) AS p_collision
    FROM c
    WHERE 1 - power(1 - power({_RB_TAU}, rows_per_band), bands)
          >= {1 - _RB_FN}
    ORDER BY bands LIMIT 1
    """,
)
def recommend_banding(cat: Catalog) -> DataFrame:
    """One-row plan: the banding Engine.recommend_banding picks, as a
    registered query (VALUES-sized frame; zero data I/O — model math
    is driver-cost-free at any corpus scale)."""
    divs = cat.spark.createDataFrame(
        _RB_DIVS, "bands int, rows_per_band int")
    p = 1 - F.pow(1 - F.pow(F.lit(_RB_TAU), col("rows_per_band")),
                  col("bands"))
    return (divs.where(p >= 1 - _RB_FN)
            .orderBy("bands").limit(1)
            .select("bands", "rows_per_band",
                    F.round(p, 6).alias("p_collision")))
