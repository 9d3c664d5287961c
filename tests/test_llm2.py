"""Unit + plan audits for the corpus-curation batch (plans/llm2.py).

Oracle parity is covered by test_oracle_parity; these check the
operator invariants and the physical plans' scale discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_challenge_spark.plans import QUERIES
from data_ingestion_challenge_spark.plans.llm2 import (
    _STRAT_DEFAULT, _STRAT_RATES)

from tests.conftest import SF_DIR


def _run(spark, name):
    return QUERIES[name](spark, SF_DIR)


def test_repetition_stats_invariants(spark, cat):
    df = _run(spark, "doc_repetition_stats").toPandas()
    assert len(df) == cat.documents.count()
    assert (df.top_word_share > 0).all() and (df.top_word_share <= 1).all()
    assert (df.dup_bigram_share >= 0).all() and (df.dup_bigram_share < 1).all()
    # n_tokens agrees with an independent count
    nt = (cat.documents
          .select("doc_id", F.size(F.split("text", " ")).alias("nt"))
          .toPandas().set_index("doc_id").nt)
    merged = df.set_index("doc_id")
    assert (merged.n_tokens == nt.loc[merged.index]).all()


def test_stratified_sample_deterministic_and_within_rate(spark, cat):
    a = _run(spark, "stratified_sample_by_lang").toPandas()
    b = _run(spark, "stratified_sample_by_lang").toPandas()
    key = ["doc_id", "lang", "bucket"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))  # idempotent sample
    for lang, grp in a.groupby("lang"):
        rate = _STRAT_RATES.get(lang, _STRAT_DEFAULT)
        assert (grp.bucket < rate).all()
    # rates bind: a higher-rate stratum keeps a larger share
    n_by_lang = (cat.documents.groupBy("lang").count().toPandas()
                 .set_index("lang")["count"])
    kept = a.groupby("lang").size()
    share = (kept / n_by_lang.loc[kept.index]).to_dict()
    assert share["en"] > share["de"]


def test_corpus_weights_equalize(spark):
    df = _run(spark, "corpus_sampling_weights").toPandas()
    assert abs(df.token_share.sum() - 1.0) < 1e-3
    # weight * share * n_langs ≈ 1 → applying the weight hits uniform
    prod = df.uniform_weight * df.token_share * len(df)
    assert ((prod - 1).abs() < 1e-2).all()


def test_tfidf_shape_and_rank(spark):
    df = _run(spark, "tfidf_top_terms").toPandas()
    for _, grp in df.groupby("lang"):
        assert sorted(grp.rnk) == [1, 2, 3, 4, 5]
        ordered = grp.sort_values("rnk")
        assert (ordered.tfidf.diff().dropna() <= 1e-9).all()


def test_stratified_sample_no_shuffle(spark):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = _run(spark, "stratified_sample_by_lang")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "sampling must be a pure map"


def test_tfidf_broadcasts_df_side(spark):
    df = _run(spark, "tfidf_top_terms")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
