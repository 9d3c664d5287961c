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
    """Order-insensitive row compare with fields aligned by COLUMN
    NAME (the driver's rule) — positional tuples would silently
    compare mismatched fields when select orders differ."""
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


def test_source_outlier_matches_oracle(spark, cat, duck):
    from data_ingestion_challenge_spark.operators.textstats import (
        source_outlier_oracle_sql, source_outlier_score,
    )
    sdf = source_outlier_score(cat.documents)
    rows = _compare(sdf, duck, source_outlier_oracle_sql())
    assert len(rows) == 500
    # margin is a real signal: some docs score clearly below their
    # own source's model (outliers), most near zero.
    margins = [r.margin for r in sdf.collect()]
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
    sdf = hard_negative_pairs(cat.embeddings)
    rows = _compare(sdf, duck, hard_negative_oracle_sql())
    assert rows  # planted near-dups with differing labels exist
    for r in sdf.collect():
        assert r.vec_a < r.vec_b and r.label_a != r.label_b
        assert r.cos_sim >= 0.35


def test_hard_negative_pairs_ann_recall_and_parity(spark, cat, duck):
    """The ANN-fed scale path (r9): oracle parity via the exact index
    replay, SOUNDNESS (every returned pair is a true tau-pair — the
    ANN set is a subset of the gemm audit's), and a recall floor vs
    the exact twin (measured 0.93 at sf0.001 and sf0.01; gate at
    0.75 to absorb testdata regeneration)."""
    from data_ingestion_challenge_spark.operators.similarity import (
        hard_negative_ann_oracle_sql, hard_negative_pairs,
        hard_negative_pairs_ann,
    )
    sdf = hard_negative_pairs_ann(cat.embeddings)
    _compare(sdf, duck, hard_negative_ann_oracle_sql())
    ann = {(r.vec_a, r.vec_b) for r in sdf.collect()}
    exact = {(r.vec_a, r.vec_b)
             for r in hard_negative_pairs(cat.embeddings).collect()}
    assert ann <= exact          # exact verify readmits nothing
    assert len(ann) >= 0.75 * len(exact) > 0


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


def test_source_outlier_edge_cases(spark, duck):
    """Per-doc contract survives the edges: a token-less doc keeps
    its row (0 log-likelihood under every source), and a
    single-source corpus returns every doc with margin NULL instead
    of zero rows — on BOTH engines."""
    from data_ingestion_challenge_spark.operators.textstats import (
        source_outlier_oracle_sql, source_outlier_score,
    )
    docs = spark.createDataFrame(
        [(1, "web", "hash join scan"), (2, "web", ""),
         (3, "arxiv", "theorem proof")],
        "doc_id long, source string, text string")
    out = {r.doc_id: r for r in source_outlier_score(docs).collect()}
    assert set(out) == {1, 2, 3}  # the empty-text doc keeps its row
    duck.sql("CREATE OR REPLACE VIEW edge_docs AS "
             "SELECT 1::BIGINT AS doc_id, 'web' AS source, "
             "'hash join scan' AS text "
             "UNION ALL SELECT 2, 'web', '' "
             "UNION ALL SELECT 3, 'arxiv', 'theorem proof'")
    drows = {r[0]: r for r in duck.sql(
        source_outlier_oracle_sql("edge_docs")).fetchall()}
    assert set(drows) == {1, 2, 3}
    for i in (1, 2, 3):
        assert (out[i].source, out[i].pred_source, out[i].margin) \
            == (drows[i][1], drows[i][2], drows[i][3])

    one = spark.createDataFrame(
        [(1, "web", "hash join"), (2, "web", "scan filter")],
        "doc_id long, source string, text string")
    rows = source_outlier_score(one).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert all(r.margin is None and r.pred_source == "web"
               for r in rows)


def test_dataset_card_null_lang_tiebreak(spark, duck):
    """NULL langs: Spark ASC is NULLS FIRST, DuckDB ASC is NULLS
    LAST — the explicit asc_nulls_last keeps the top_lang tie-break
    identical cross-engine."""
    from data_ingestion_challenge_spark.operators.curation import (
        ORACLE_DATASET_CARD, dataset_card,
    )
    docs = spark.createDataFrame(
        [(1, "w", None, "a b", 3), (2, "w", "en", "c d", 3)],
        "doc_id long, source string, lang string, text string, "
        "n_chars long")
    got = dataset_card(docs).collect()[0]
    duck.sql("CREATE OR REPLACE VIEW documents AS "
             "SELECT 1::BIGINT AS doc_id, 'w' AS source, "
             "NULL AS lang, 'a b' AS text, 3::BIGINT AS n_chars "
             "UNION ALL SELECT 2, 'w', 'en', 'c d', 3")
    want = duck.sql(ORACLE_DATASET_CARD).fetchall()[0]
    assert got.top_lang == "en" == want[4]
    duck.sql("DROP VIEW documents")
    duck.sql(f"CREATE VIEW documents AS SELECT * "
             f"FROM '{SF_DIR}/documents.parquet'")


def test_event_path_3step(spark, cat):
    """Top-k 3-step journey mining matches the DuckDB replay on the
    events table (ts+event_id per-user order, n desc path-asc rank)
    and the hand case: a planted dominant path ranks first."""
    import duckdb as _duckdb

    from data_ingestion_challenge_spark.operators.stats import (
        event_path_3step, oracle_event_path_3step,
    )
    con = _duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM '{SF_DIR}/events.parquet'")
    got = _compare(event_path_3step(cat.events, k=20), con,
                   oracle_event_path_3step(20))
    assert len(got) == 20

    import datetime as dt
    rows = []
    base = dt.datetime(2024, 1, 1)
    for u in range(5):
        for i, et in enumerate(["signup", "click", "purchase"]):
            rows.append((u * 10 + i, base + dt.timedelta(minutes=i),
                         u, et))
    rows.append((99, base, 9, "view"))  # lone event: no triple
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    out = event_path_3step(ev, k=5).collect()
    assert out[0].rank == 1
    assert (out[0].e1, out[0].e2, out[0].e3) == \
        ("signup", "click", "purchase")
    assert out[0].n == 5


def test_recommend_banding_query_matches_engine(spark, duck):
    """The registered recommend_banding row must be exactly the dict
    Engine.recommend_banding returns for the same constants — and
    must match the oracle, which recomputes the S-curve with DuckDB's
    own power() (math-level cross-engine gate, not literal echo)."""
    from data_ingestion_challenge_spark.api import Engine
    from data_ingestion_challenge_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    q = QUERIES["recommend_banding"]
    row = _compare(q(spark, SF_DIR), duck, q.oracle)[0]
    want = Engine(SF_DIR, spark=spark).recommend_banding(
        target_tau=0.8, max_fn_rate=0.05, k=16)
    got = dict(zip(sorted(["bands", "rows_per_band", "p_collision"]),
                   row))
    assert got["bands"] == want["bands"]
    assert got["rows_per_band"] == want["rows"]
    assert got["p_collision"] == round(want["p_collision"], 6)
