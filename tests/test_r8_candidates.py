"""Round-8 registration candidates: built, oracle-twinned, and
parity-tested now; driver registration deferred so the verify-window
rotation keeps draining (SURVEY §7 budget).  Three ops:
source_outlier_score (NB mislabel signal), hard_negative_pairs
(contrastive mining / label-noise audit), dataset_card (per-source
release summary)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


def _compare(sdf, duck, sql):
    got = sorted((tuple(r) for r in sdf.collect()), key=repr)
    want = sorted((tuple(r) for r in duck.sql(sql).fetchall()),
                  key=repr)
    assert sorted(sdf.columns) == sorted(duck.sql(sql).columns)
    assert got == want
    return got


def test_source_outlier_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        source_outlier_oracle_sql, source_outlier_score,
    )
    rows = _compare(source_outlier_score(cat.documents), duck,
                    source_outlier_oracle_sql())
    assert len(rows) == 500
    # margin is a real signal: some docs score clearly below their
    # own source's model (outliers), most near zero.
    margins = [r[3] for r in rows]
    assert min(margins) < -0.5 < 0.5 < max(margins)


def test_source_outlier_hand_case(spark):
    """A doc pasted into the wrong source gets a negative margin and
    a pred_source pointing at the source it reads like."""
    from data_ingestion_challenge_spark.operators.textstats import (
        source_outlier_score,
    )
    rows = [(i, "web", "click buy cart checkout deal "
                       "sale price offer shop") for i in range(5)]
    rows += [(10 + i, "arxiv", "theorem proof lemma bound "
                               "convergence matrix norm") for i in range(5)]
    rows.append((99, "arxiv", "click buy cart checkout deal sale "
                              "price offer shop"))  # mislabeled
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in source_outlier_score(docs).collect()}
    assert out[99].pred_source == "web"
    assert out[99].margin < 0
    assert out[0].pred_source == "web" and out[10].pred_source == "arxiv"


def test_hard_negative_pairs(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.similarity import (
        hard_negative_oracle_sql, hard_negative_pairs,
    )
    rows = _compare(hard_negative_pairs(cat.embeddings), duck,
                    hard_negative_oracle_sql())
    assert rows  # planted near-dups with differing labels exist
    for a, b, la, lb, cs in rows:
        assert a < b and la != lb and cs >= 0.35


def test_dataset_card(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.curation import (
        ORACLE_DATASET_CARD, dataset_card,
    )
    _compare(dataset_card(cat.documents), duck, ORACLE_DATASET_CARD)
    out = {r.source: r for r in dataset_card(cat.documents).collect()}
    assert sum(r.n_docs for r in out.values()) == 500
    for r in out.values():
        assert 0 <= r.dup_ratio <= 1 and r.avg_chars > 0
        assert r.n_langs >= 1 and r.top_lang
