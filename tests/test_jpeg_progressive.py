"""Progressive JPEG (operators/jpeg_progressive.py) — the full
Annex-G pipeline: spectral-selection bands, successive approximation
(DC arithmetic-shift vs AC sign-magnitude point transforms),
multi-block EOB runs with buffered correction bits, ZRL-in-refinement
— all exercised through encode→decode round trips that must be
BIT-IDENTICAL to the baseline decoder on the same image (both
codecs quantize identically, so any packaging bug shows as a pixel
diff)."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.jpeg_codec import (
    decode_jpeg_pixels, encode_jpeg_gray, encode_jpeg_rgb,
)
from data_ingestion_challenge_spark.operators.jpeg_progressive import (
    decode_jpeg_progressive, encode_jpeg_progressive_gray,
    encode_jpeg_progressive_rgb,
)


def test_solid_even_offset_exact_through_progressive():
    """The witness exactness class survives the progressive pipeline
    too: DC-only blocks, refined across two successive-approximation
    scans."""
    for v in (0, 64, 128, 130, 254):
        img = np.full((10, 13), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_progressive_gray(img))
        assert dec.shape == (10, 13)
        assert (dec == img).all(), v


def test_progressive_equals_baseline_gray_torture():
    """40 random sizes/contents: progressive decode == baseline
    decode bit-for-bit (same quantized coefficients, different scan
    packaging — any EOB/refinement/correction-bit bug diverges)."""
    rng = np.random.RandomState(3)
    for trial in range(40):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_gray(img))
        prog = decode_jpeg_pixels(encode_jpeg_progressive_gray(img))
        assert (base == prog).all(), (h, w, trial)


def test_progressive_equals_baseline_color():
    rng = np.random.RandomState(5)
    for trial in range(8):
        h, w = rng.randint(1, 30), rng.randint(1, 30)
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_rgb(img))
        prog = decode_jpeg_pixels(encode_jpeg_progressive_rgb(img))
        assert prog.shape == img.shape
        assert (base == prog).all(), (h, w, trial)


def test_multi_block_eob_runs_and_sparse_content():
    """Solid and near-solid images force long EOBn runs (the encoder
    accumulates them across blocks; the decoder's run-tail must
    consume each run block's buffered correction bits in order)."""
    big = np.full((64, 64), 130, dtype=np.uint8)
    assert (decode_jpeg_pixels(encode_jpeg_progressive_gray(big))
            == big).all()
    sp = np.full((48, 48), 128, dtype=np.uint8)
    sp[5, 7] = 255
    sp[30, 40] = 0
    sp[47, 0] = 200
    assert (decode_jpeg_pixels(encode_jpeg_progressive_gray(sp))
            == decode_jpeg_pixels(encode_jpeg_gray(sp))).all()


def test_gradient_and_structured_content():
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    assert (decode_jpeg_pixels(encode_jpeg_progressive_gray(img))
            == decode_jpeg_pixels(encode_jpeg_gray(img))).all()
    # checkerboard: maximal high-frequency AC content
    cb = (np.indices((24, 24)).sum(axis=0) % 2 * 255).astype(np.uint8)
    assert (decode_jpeg_pixels(encode_jpeg_progressive_gray(cb))
            == decode_jpeg_pixels(encode_jpeg_gray(cb))).all()


def test_progressive_routes_through_shared_surfaces():
    """decode_jpeg_pixels routes SOF2 automatically, so decode_real /
    decode_media / media_inventory pick up progressive files with no
    caller change."""
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_media, decode_real,
    )
    img = np.arange(120, dtype=np.uint8).reshape(10, 12)
    payload = encode_jpeg_progressive_gray(img)
    assert decode_real(payload) == (len(payload), 1)
    d = decode_media(payload)
    assert d["mime"] == "image/jpeg"
    assert (d["width"], d["height"]) == (12, 10)


def test_progressive_typed_refusals():
    img = np.full((8, 8), 100, dtype=np.uint8)
    # a baseline payload refuses at the progressive entrypoint
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg_progressive(encode_jpeg_gray(img))


def test_progressive_restart_intervals():
    """DRI + RSTn inside progressive scans: every interval decodes
    identically to the restart-free stream (per-scan byte-align,
    marker modulo, DC-predictor AND EOB-run resets)."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        _rgb_to_ycbcr_planes,
    )
    from data_ingestion_challenge_spark.operators.jpeg_progressive \
        import encode_jpeg_progressive

    rng = np.random.RandomState(6)
    for trial in range(6):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_gray(img))
        for ri in (1, 3, 7):
            p = encode_jpeg_progressive([img], h, w,
                                        restart_every=ri)
            assert (decode_jpeg_pixels(p) == base).all(), (h, w, ri)
    img = rng.randint(0, 256, size=(21, 17, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(_rgb_to_ycbcr_planes(img), 21, 17,
                                restart_every=2)
    assert (decode_jpeg_pixels(p)
            == decode_jpeg_pixels(encode_jpeg_rgb(img))).all()
    # long EOB runs truncated by restart boundaries (solid image)
    big = np.full((64, 64), 130, dtype=np.uint8)
    p = encode_jpeg_progressive([big], 64, 64, restart_every=3)
    assert (decode_jpeg_pixels(p) == big).all()


def test_dc_refinement_negative_values():
    """DC point transform is an ARITHMETIC shift: odd negative DC
    values exercise the floor-shift + OR-refinement identity
    ((v>>1)<<1 | (v&1) == v for v < 0)."""
    # very dark solid images give strongly negative DC; odd widths
    # with edge padding give odd quantized values across blocks
    rng = np.random.RandomState(9)
    for trial in range(10):
        img = rng.randint(0, 40, size=(17, 19)).astype(np.uint8)
        assert (decode_jpeg_pixels(encode_jpeg_progressive_gray(img))
                == decode_jpeg_pixels(encode_jpeg_gray(img))).all()
