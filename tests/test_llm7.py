"""Batch-7 LLM-pipeline operators (plans/llm7.py): SemDeDup-style
semantic pruning, perplexity-bucket mixture, tokenizer fertility.
Cross-engine parity for all three is covered by test_oracle_parity;
these tests pin the SEMANTICS on hand-checkable inputs."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_semdedup_prune_hand_case(spark):
    """Two near-identical vectors and one orthogonal: exactly the
    higher id of the near-pair is pruned, with the lower id as its
    witness; vectors without a dominating cell-mate are kept."""
    from data_ingestion_challenge_spark.operators.similarity import (
        semdedup_prune,
    )

    dim = 64
    a = [1.0] + [0.0] * (dim - 1)
    a2 = [0.999] + [0.001] * (dim - 1)       # cos(a, a2) ≈ 1
    b = [0.0, 1.0] + [0.0] * (dim - 2)       # orthogonal to both
    emb = spark.createDataFrame(
        [(1, a), (2, a2), (3, b)],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in
            semdedup_prune(emb, tau=0.9, bits=4, dim=dim).collect()}
    assert len(rows) == 3
    assert rows[1].kept and rows[1].pruned_by is None \
        and rows[1].witness_cos is None
    assert not rows[2].kept and rows[2].pruned_by == 1 \
        and rows[2].witness_cos > 0.99
    assert rows[3].kept


def test_semdedup_prune_lowest_witness(spark):
    """pruned_by is the LOWEST dominating id, not the most similar."""
    from data_ingestion_challenge_spark.operators.similarity import (
        semdedup_prune,
    )

    dim = 64
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.99] + [0.01] * (dim - 1)
    nearer = [0.999] + [0.001] * (dim - 1)
    emb = spark.createDataFrame(
        [(5, base), (6, nearer), (9, near)],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in
            semdedup_prune(emb, tau=0.9, bits=4, dim=dim).collect()}
    assert rows[5].kept
    assert rows[6].pruned_by == 5
    assert rows[9].pruned_by == 5  # 6 is closer, but 5 is lower


def test_mixture_ppl_buckets_semantics(spark):
    from data_ingestion_challenge_spark.plans import QUERIES

    out = QUERIES["mixture_ppl_buckets"](spark, SF_DIR).collect()
    assert sorted(r.bucket for r in out) == list(range(1, 11))
    n_docs = sum(r.n_docs for r in out)
    assert n_docs == 500
    # Shares partition the corpus token mass (4dp rounding slack).
    assert abs(sum(r.token_share for r in out) - 1.0) < 0.01
    # Deciles are ordered by quality signal: first decile's mean xent
    # is the minimum, last is the maximum.
    by_bucket = sorted(out, key=lambda r: r.bucket)
    assert by_bucket[0].avg_xent_bits == min(r.avg_xent_bits
                                             for r in out)
    assert by_bucket[-1].avg_xent_bits == max(r.avg_xent_bits
                                              for r in out)


def test_tokenizer_fertility_semantics(spark):
    from data_ingestion_challenge_spark.plans import QUERIES

    out = QUERIES["tokenizer_fertility"](spark, SF_DIR).collect()
    assert len(out) >= 2                    # multilingual corpus
    assert sum(r.n_docs for r in out) == 500
    for r in out:
        assert r.ws_tokens > 0 and r.alpha_tokens > 0
        assert 0 < r.fertility < 10
        assert r.chars_per_alpha > 1
