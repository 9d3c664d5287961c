"""r22 overflow pool (built + parity-tested in r15, UNREGISTERED —
keeps the ≤5/round registration budget stocked one-plus round past
r20).  Five candidates: tax_discount_grid (2-D pricing-interaction
surface), size_revenue_profile (part-size revenue concentration),
value_zero_rate_by_type (value-column instrumentation health),
digit_ratio_by_source (numeric-noise text audit),
label_centroid_confusion (label-pair centroid cosine map).
Oracle parity pinned at BOTH sf0.001 and sf0.01; closed-form hand
cases per op."""

from __future__ import annotations

from tests.test_r9_candidates import _compare


# ---------------------------------------- pricing interaction grid


def test_tax_discount_grid_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        TAX_DISCOUNT_GRID_ORACLE, tax_discount_grid,
    )
    cat, duck = sf_pair
    rows = _compare(tax_discount_grid(cat.lineitem), duck,
                    TAX_DISCOUNT_GRID_ORACLE)
    assert rows


def test_tax_discount_grid_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        tax_discount_grid,
    )
    li = spark.createDataFrame(
        [(100.0, 0.10, 0.05), (200.0, 0.10, 0.05), (50.0, 0.0, 0.0)],
        "l_extendedprice double, l_discount double, l_tax double")
    got = {(r.tax_band, r.discount_band): (r.n_lines, r.revenue)
           for r in tax_discount_grid(li).collect()}
    # 100*0.9*1.05 + 200*0.9*1.05 = 283.5 in the (5, 10) cell
    assert got == {(5, 10): (2, 283.5), (0, 0): (1, 50.0)}


# ---------------------------------------- part-size concentration


def test_size_revenue_profile_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        SIZE_REVENUE_PROFILE_ORACLE, size_revenue_profile,
    )
    cat, duck = sf_pair
    rows = _compare(size_revenue_profile(cat.lineitem, cat.part),
                    duck, SIZE_REVENUE_PROFILE_ORACLE)
    assert rows


def test_size_revenue_profile_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        size_revenue_profile,
    )
    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (1, 100.0, 0.5), (2, 40.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double")
    part = spark.createDataFrame(
        [(1, 7), (2, 7)], "p_partkey long, p_size int")
    [r] = size_revenue_profile(li, part).collect()
    assert (r.p_size, r.n_parts, r.n_lines, r.revenue) \
        == (7, 2, 3, 190.0)
    assert abs(r.avg_line_revenue - 190.0 / 3) < 1e-6


# ---------------------------------------- value-column health


def test_value_zero_rate_by_type_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        VALUE_ZERO_RATE_BY_TYPE_ORACLE, value_zero_rate_by_type,
    )
    cat, duck = sf_pair
    rows = _compare(value_zero_rate_by_type(cat.events), duck,
                    VALUE_ZERO_RATE_BY_TYPE_ORACLE)
    assert rows


def test_value_zero_rate_hand_case(spark):
    from data_ingestion_challenge_spark.operators.stats import (
        value_zero_rate_by_type,
    )
    ev = spark.createDataFrame(
        [("a", 0.0), ("a", None), ("a", 3.0), ("a", 5.0),
         ("b", 0.0)],
        "event_type string, value double")
    got = {r.event_type: r for r in
           value_zero_rate_by_type(ev).collect()}
    a = got["a"]
    assert (a.n_events, a.n_zero, a.n_null) == (4, 1, 1)
    assert a.zero_rate == 0.25 and a.mean_nonzero_value == 4.0
    b = got["b"]
    assert (b.n_zero, b.mean_nonzero_value) == (1, None)


# ---------------------------------------- numeric-noise text audit


def test_digit_ratio_by_source_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.textstats import (
        DIGIT_RATIO_BY_SOURCE_ORACLE, digit_ratio_by_source,
    )
    cat, duck = sf_pair
    rows = _compare(digit_ratio_by_source(cat.documents), duck,
                    DIGIT_RATIO_BY_SOURCE_ORACLE)
    assert rows


def test_digit_ratio_hand_case(spark):
    from data_ingestion_challenge_spark.operators.textstats import (
        digit_ratio_by_source,
    )
    docs = spark.createDataFrame(
        [("w", "abc123"), ("w", "no digits here"),
         ("w", "1234567890x")],  # 10/11 digits → heavy
        "source string, text string")
    [r] = digit_ratio_by_source(docs).collect()
    assert (r.n_docs, r.n_digits, r.n_chars_total) == (3, 13, 31)
    # integer heavy test 10·d > c: "abc123" (30 > 6) and
    # "1234567890x" (100 > 11) are heavy; the digit-free doc is not
    assert r.n_digit_heavy == 2
    assert abs(r.digit_ratio - round(13 / 31, 6)) < 1e-9


# ---------------------------------------- label confusability map


def test_label_centroid_confusion_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.embstats import (
        LABEL_CENTROID_CONFUSION_ORACLE, label_centroid_confusion,
    )
    cat, duck = sf_pair
    rows = _compare(label_centroid_confusion(cat.embeddings), duck,
                    LABEL_CENTROID_CONFUSION_ORACLE)
    assert rows
    # _compare returns column-NAME-sorted tuples: (centroid_cos,
    # label_a, label_b)
    for cos, _a, _b in rows:
        assert -1.0 - 1e-9 <= cos <= 1.0 + 1e-9


def test_label_centroid_confusion_hand_case(spark):
    from data_ingestion_challenge_spark.operators.embstats import (
        label_centroid_confusion,
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [1.0, 0.0], "x"),
         (3, [0.0, 1.0], "y"), (4, [1.0, 1.0], "z")],
        "vec_id long, embedding array<float>, label string")
    got = {(r.label_a, r.label_b): r.centroid_cos
           for r in label_centroid_confusion(emb).collect()}
    import math
    assert got[("x", "y")] == 0.0
    assert abs(got[("x", "z")] - round(1 / math.sqrt(2), 6)) < 1e-9
    assert abs(got[("y", "z")] - round(1 / math.sqrt(2), 6)) < 1e-9


# ------------------- property: confusion matrix vs numpy brute force


def test_label_centroid_confusion_matches_numpy(spark):
    """The distributed DECIMAL-summed formulation must agree with a
    plain numpy centroid-cosine to ~1e-6 on adversarial-ish data
    (mixed signs, magnitudes across 4 orders, ragged label sizes) —
    the property that pins the optimized plan to the definition
    rather than to its own oracle twin."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows, expected_vecs = [], {}
    d = 12
    for li, (label, n) in enumerate([("a", 1), ("b", 3), ("c", 17)]):
        vecs = (rng.standard_normal((n, d))
                * (10.0 ** rng.integers(-2, 2, size=(n, 1))))
        expected_vecs[label] = vecs
        for j in range(n):
            rows.append((li * 100 + j,
                         [float(x) for x in vecs[j]], label))
    from data_ingestion_challenge_spark.operators.embstats import (
        label_centroid_confusion,
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    got = {(r.label_a, r.label_b): r.centroid_cos
           for r in label_centroid_confusion(emb).collect()}
    # numpy reference: float32-quantized inputs (the column is
    # array<float>), full-precision centroids and cosine
    for (a, b), cos in got.items():
        ca = expected_vecs[a].astype(np.float32).astype(np.float64) \
            .mean(axis=0)
        cb = expected_vecs[b].astype(np.float32).astype(np.float64) \
            .mean(axis=0)
        want = float(ca @ cb / (np.linalg.norm(ca)
                                * np.linalg.norm(cb)))
        assert abs(cos - want) < 5e-6, (a, b, cos, want)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
