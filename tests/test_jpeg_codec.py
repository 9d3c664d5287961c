"""Baseline grayscale JPEG codec (operators/jpeg_codec.py) — REAL
pixel-level decode in pure numpy+stdlib: exact round trips for the
even-offset solid class, bounded error for smooth content, the
decoder driven by the FILE's own DQT/DHT tables, typed refusals for
the genuinely-PIL variants, and the driver-gateable witness."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.jpeg_codec import (
    decode_jpeg_gray, encode_jpeg_gray,
)


def test_solid_even_offset_roundtrip_exact():
    """The exactness anchor: a solid image with even level-shift
    offset survives the lossy pipeline EXACTLY (DC-only block, Q=16
    divides 8·even cleanly) — at non-8-multiple dims, so padding +
    crop are in the loop."""
    for v in (0, 64, 128, 130, 200, 254):
        img = np.full((10, 13), v, dtype=np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img))
        assert dec.shape == (10, 13)
        assert (dec == img).all(), v


def test_smooth_gradient_error_bounded():
    """Quantization error on smooth content stays small (the codec
    is the standard Annex-K table, ~quality 50)."""
    x = np.linspace(0, 255, 24)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3


def test_blocky_image_roundtrip_reasonable():
    """8-aligned constant blocks are also DC-only: exact per block
    when the offsets are even."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:] = 50, 130
    img[8:, :8], img[8:, 8:] = 200, 128
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    assert (dec == img).all()


def test_decoder_uses_file_tables_and_header_interops():
    """The structure parser reads the codec's output (one consistent
    JPEG dialect), and decode_media classifies it with true dims."""
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_jpeg_header, decode_media,
    )
    img = np.full((9, 17), 90, dtype=np.uint8)
    payload = encode_jpeg_gray(img)
    d = decode_jpeg_header(payload)
    assert (d["width"], d["height"], d["channels"]) == (17, 9, 1)
    assert decode_media(payload)["mime"] == "image/jpeg"


def test_progressive_and_restart_raise_typed():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(encode_jpeg_gray(img))
    # flip SOF0 (0xC0) to SOF2 (progressive)
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_gray(bytes(payload))
    # a DRI segment right after SOI
    dri = b"\xff\xdd" + struct.pack(">H", 4) + b"\x00\x08"
    payload2 = (b"\xff\xd8" + dri
                + bytes(encode_jpeg_gray(img))[2:])
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_gray(payload2)


def test_entropy_truncation_raises_typed():
    img = np.full((8, 8), 77, dtype=np.uint8)
    payload = encode_jpeg_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg_gray(payload[:len(payload) - 12])


def test_synth_jpeg_inventory_matches_oracle(spark):
    """The full-codec witness over the documents table equals the
    closed-form oracle row for row — every row pads/crops at
    non-8-multiple dims."""
    import duckdb

    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_JPEG_INVENTORY_ORACLE, synth_jpeg_inventory,
    )
    from tests.conftest import SF_DIR
    from tests.test_r9_candidates import _compare

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF_DIR}/documents.parquet'")
    rows = _compare(synth_jpeg_inventory(docs), con,
                    SYNTH_JPEG_INVENTORY_ORACLE)
    assert len(rows) == docs.count()


# ------------------------------------ 4:4:4 color path (r12)


def test_rgb_solid_gray_roundtrip_exact():
    """Solid R=G=B with even offset: Y = v exactly, Cb = Cr = 128
    exactly — the color pipeline reconstructs it EXACTLY through the
    interleaved-MCU scan and the YCbCr inverse."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb,
    )
    for v in (0, 64, 130, 200, 254):
        img = np.full((9, 14, 3), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_rgb(img))
        assert dec.shape == (9, 14, 3)
        assert (dec == img).all(), v


def test_rgb_color_error_bounded():
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb,
    )
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :] = (200, 60, 120)
    dec = decode_jpeg_pixels(encode_jpeg_rgb(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    x = np.linspace(0, 255, 24)
    g = np.clip(np.add.outer(x, x) / 2, 0, 255)
    img = np.stack([g, g[::-1], np.full_like(g, 80)],
                   axis=-1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_rgb(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 4


def test_gray_wrapper_rejects_color():
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_gray, encode_jpeg_rgb,
    )
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    with pytest.raises(ValueError, match="not a grayscale"):
        decode_jpeg_gray(encode_jpeg_rgb(img))


# ---------------------------------- 4:2:0 subsampling (r12)


def test_420_solid_roundtrip_exact_and_bounded():
    """The dominant real-world shape: four Y blocks + Cb + Cr per
    MCU, chroma box-averaged down and sample-replicated back.  Solid
    even-offset images stay EXACT (constant chroma survives the box
    average); smooth/color content stays bounded."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb_420,
    )
    for v in (0, 64, 130, 254):
        img = np.full((11, 19, 3), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_rgb_420(img))
        assert dec.shape == (11, 19, 3)
        assert (dec == img).all(), v
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :] = (200, 60, 120)
    dec = decode_jpeg_pixels(encode_jpeg_rgb_420(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    x = np.linspace(0, 255, 40)
    g = np.clip(np.add.outer(x, x) / 2, 0, 255)
    img = np.stack([g, g[::-1], np.full_like(g, 80)],
                   axis=-1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_rgb_420(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4


def test_sampling_beyond_2x2_raises_typed():
    import struct as _st

    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb_420,
    )
    img = np.full((8, 8, 3), 100, dtype=np.uint8)
    payload = bytearray(encode_jpeg_rgb_420(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 11] = 0x41  # Y sampling 4x1
    with pytest.raises(NotImplementedError, match="beyond 2x2"):
        decode_jpeg_pixels(bytes(payload))
