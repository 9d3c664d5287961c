"""r18 candidate pool (built + parity-tested, UNREGISTERED — the
r14+ registration budget drains it ≤5/round).  Five candidates:
synth_jpeg_lossless_inventory — the lossless-JPEG (SOF3, T.81
Annex H) codec witness, a horizontal-ramp image (REAL nonzero
prediction differences) cycled through all seven Annex-H predictors
and both frame precisions per doc; synth_tiff_inventory — the TIFF
codec witness (strip layout, both byte orders, none/LZW/PackBits,
horizontal predictor); synth_exif_inventory — the EXIF APP1 IFD-walk
witness (conforming segment spliced into a real JPEG, parsed back);
brand_return_rate — product-quality return shares with priced
returned revenue; basket_size_value_profile — the join-free
two-level order-composition curve.  The witnesses gate on
closed-form decoded-value oracles; oracle parity is pinned at BOTH
sf0.001 and sf0.01 and each op carries closed-form hand cases."""

from __future__ import annotations

from tests.test_r9_candidates import _compare



# ------------------------------------- lossless-JPEG codec witness


def test_synth_jpeg_lossless_inventory_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_JPEG_LOSSLESS_INVENTORY_ORACLE,
        synth_jpeg_lossless_inventory,
    )
    cat, duck = sf_pair
    sdf = synth_jpeg_lossless_inventory(cat.documents)
    rows = _compare(sdf, duck, SYNTH_JPEG_LOSSLESS_INVENTORY_ORACLE)
    assert rows
    # alphabetical order: doc_id, height, predictor, px_sum, width
    for _, h, pred, px_sum, w in rows:
        assert 1 <= pred <= 7 and w >= 2 and h >= 1
        assert px_sum >= 0


def test_synth_jpeg_lossless_inventory_hand_case(spark):
    # n_chars = 5: w = 5%19+2 = 7, h = 5%10+1 = 6, base = 5,
    # predictor = 5%7+1 = 6, 16-bit lane (5 odd):
    # ramp row sum = 7*5 + 21 = 56; px_sum = 257 * 6 * 56 = 86352.
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_chars long")
    from data_ingestion_challenge_spark.operators.multimodal import (
        synth_jpeg_lossless_inventory,
    )
    [r] = synth_jpeg_lossless_inventory(df).collect()
    assert (r.width, r.height, r.predictor) == (7, 6, 6)
    assert r.px_sum == 257 * 6 * 56


def test_synth_jpeg_lossless_inventory_8bit_lane(spark):
    # n_chars = 4: w = 6, h = 5, base = 4, predictor = 5, 8-bit:
    # row sum = 6*4 + 15 = 39; px_sum = 5 * 39 = 195.
    df = spark.createDataFrame([(2, 4)], "doc_id long, n_chars long")
    from data_ingestion_challenge_spark.operators.multimodal import (
        synth_jpeg_lossless_inventory,
    )
    [r] = synth_jpeg_lossless_inventory(df).collect()
    assert (r.width, r.height, r.predictor, r.px_sum) == (6, 5, 5, 195)


# --------------------------------------------- TIFF codec witness


def test_synth_tiff_inventory_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_TIFF_INVENTORY_ORACLE, synth_tiff_inventory,
    )
    cat, duck = sf_pair
    sdf = synth_tiff_inventory(cat.documents)
    rows = _compare(sdf, duck, SYNTH_TIFF_INVENTORY_ORACLE)
    assert rows
    # alphabetical order: compression, doc_id, height, px_sum, width
    comps = {r[0] for r in rows}
    assert comps <= {1, 5, 32773}
    assert len(comps) == 3     # all three compression lanes exercised


def test_synth_tiff_inventory_hand_case(spark):
    # n_chars = 7: w = 7%15+1 = 8, h = 7%7+1 = 1, base = 7, comp
    # lane 7%3 = 1 -> LZW(5) with predictor; px_sum = 8 * 7 = 56.
    df = spark.createDataFrame([(3, 7)], "doc_id long, n_chars long")
    from data_ingestion_challenge_spark.operators.multimodal import (
        synth_tiff_inventory,
    )
    [r] = synth_tiff_inventory(df).collect()
    assert (r.width, r.height, r.compression, r.px_sum) == (8, 1, 5, 56)


# --------------------------------------------- EXIF parser witness


def test_synth_exif_inventory_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_EXIF_INVENTORY_ORACLE, synth_exif_inventory,
    )
    cat, duck = sf_pair
    sdf = synth_exif_inventory(cat.documents)
    rows = _compare(sdf, duck, SYNTH_EXIF_INVENTORY_ORACLE)
    assert rows
    # alphabetical order: doc_id, make, orientation
    for _, make, orientation in rows:
        assert 1 <= orientation <= 8 and make.startswith("CAM-")


def test_synth_exif_inventory_hand_case(spark):
    # n_chars = 9: orientation 9%8+1 = 2, make CAM-4, big-endian lane
    df = spark.createDataFrame([(4, 9)], "doc_id long, n_chars long")
    from data_ingestion_challenge_spark.operators.multimodal import (
        synth_exif_inventory,
    )
    [r] = synth_exif_inventory(df).collect()
    assert (r.orientation, r.make) == (2, "CAM-4")


# ------------------------------------------- brand return quality


def test_brand_return_rate_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        BRAND_RETURN_RATE_ORACLE, brand_return_rate,
    )
    cat, duck = sf_pair
    sdf = brand_return_rate(cat.lineitem, cat.part)
    rows = _compare(sdf, duck, BRAND_RETURN_RATE_ORACLE)
    assert rows
    # alphabetical: n_lines, n_returned, p_brand, return_rate,
    # returned_revenue
    for n_lines, n_ret, _, rate, rev in rows:
        assert 0 <= n_ret <= n_lines
        assert (rev > 0) == (n_ret > 0)
        assert abs(rate - n_ret / n_lines) < 1e-6


def test_brand_return_rate_hand_case(spark):
    li = spark.createDataFrame(
        [(1, "R", 100.0, 0.1), (1, "N", 50.0, 0.0),
         (2, "R", 10.0, 0.0)],
        "l_partkey long, l_returnflag string, "
        "l_extendedprice double, l_discount double")
    p = spark.createDataFrame([(1, "B#1"), (2, "B#2")],
                              "p_partkey long, p_brand string")
    from data_ingestion_challenge_spark.operators.stats import (
        brand_return_rate,
    )
    out = {r.p_brand: (r.n_lines, r.n_returned, r.return_rate,
                       r.returned_revenue)
           for r in brand_return_rate(li, p).collect()}
    assert out == {"B#1": (2, 1, 0.5, 90.0),
                   "B#2": (1, 1, 1.0, 10.0)}


# ------------------------------------------- basket composition


def test_basket_size_value_profile_matches_oracle(spark, sf_pair):
    from data_ingestion_challenge_spark.operators.stats import (
        BASKET_SIZE_VALUE_PROFILE_ORACLE, basket_size_value_profile,
    )
    cat, duck = sf_pair
    sdf = basket_size_value_profile(cat.lineitem)
    rows = _compare(sdf, duck, BASKET_SIZE_VALUE_PROFILE_ORACLE)
    assert rows
    # alphabetical: avg_basket_value, n_lines, n_orders, revenue
    total_orders = sum(r[2] for r in rows)
    assert total_orders > 0
    for avg_val, n_lines, n_orders, revenue in rows:
        assert n_lines >= 1 and n_orders >= 1
        assert abs(avg_val - revenue / n_orders) < 0.01


def test_basket_size_value_profile_hand_case(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (1, 50.0, 0.0),    # order 1: 2 lines, 150
         (2, 30.0, 0.5),                     # order 2: 1 line, 15
         (3, 25.0, 0.0)],                    # order 3: 1 line, 25
        "l_orderkey long, l_extendedprice double, l_discount double")
    from data_ingestion_challenge_spark.operators.stats import (
        basket_size_value_profile,
    )
    out = {r.n_lines: (r.n_orders, r.revenue, r.avg_basket_value)
           for r in basket_size_value_profile(li).collect()}
    assert out == {2: (1, 150.0, 150.0), 1: (2, 40.0, 20.0)}
