"""Truevision TGA codec tests.  TGA carries NO leading magic, so the
sniff contract is footer-based (TGA 2.0 only) and headerless files
decode only when called explicitly — both directions pinned here,
plus a hand-built external fixture with bottom-up row order and raw
BGR byte layout straight from the spec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.multimodal import (
    decode_media,
    decode_tga,
    decode_tga_pixels,
    decode_tga_structure,
    encode_tga,
)

RNG = np.random.default_rng(1312)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("shape", [(9, 7), (6, 5, 3), (4, 8, 4)])
def test_round_trip(rle, shape):
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_tga_pixels(encode_tga(px, rle=rle))
    np.testing.assert_array_equal(out, px)


def test_rle_actually_compresses_runs():
    px = np.full((32, 32, 3), 200, dtype=np.uint8)
    assert len(encode_tga(px, rle=True)) < len(encode_tga(px))


def test_hand_built_bottom_up_bgr_fixture():
    # 2x2 uncompressed truecolor, BOTTOM-UP origin (descriptor 0),
    # BGR on the wire: bottom row first.
    header = struct.pack("<BBBHHBHHHHBB",
                         0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 24, 0)
    # image rows bottom-up; pixels BGR:
    #   file row 0 (image bottom): blue, green
    #   file row 1 (image top):    red, white
    raster = bytes([255, 0, 0,  0, 255, 0,
                    0, 0, 255,  255, 255, 255])
    out = decode_tga_pixels(header + raster)
    expected = np.array([[[255, 0, 0], [255, 255, 255]],
                         [[0, 0, 255], [0, 255, 0]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, expected)


def test_hand_built_rle_packets():
    # 1x4 gray, RLE (type 11): run of 3 x 50 + raw 1 x 77,
    # top-to-bottom descriptor
    header = struct.pack("<BBBHHBHHHHBB",
                         0, 0, 11, 0, 0, 0, 0, 0, 4, 1, 8, 0x20)
    body = bytes([0x82, 50, 0x00, 77])
    out = decode_tga_pixels(header + body)
    assert list(out[0]) == [50, 50, 50, 77]


def test_id_field_skipped():
    px = RNG.integers(0, 256, size=(3, 3), dtype=np.uint8)
    payload = bytearray(encode_tga(px))
    payload[0] = 5                              # declare 5 id bytes
    patched = bytes(payload[:18]) + b"hello" + bytes(payload[18:])
    np.testing.assert_array_equal(decode_tga_pixels(patched), px)


def test_color_mapped_gated_and_garbage_rejected():
    header = struct.pack("<BBBHHBHHHHBB",
                         0, 1, 1, 0, 4, 24, 0, 0, 2, 2, 8, 0)
    with pytest.raises(NotImplementedError):
        decode_tga_pixels(header + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_tga_pixels(b"definitely not a tga")
    # truncated RLE stream
    with pytest.raises(ValueError):
        decode_tga_pixels(struct.pack(
            "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, 8, 8, 24,
            0x20) + b"\x81")


def test_footer_sniff_contract():
    px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    with_footer = encode_tga(px)
    d = decode_media(with_footer)
    assert d["mime"] == "image/x-tga"
    assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)
    # footerless TGA bytes must NOT be sniffed (no magic -> too
    # ambiguous), but explicit decode still works
    bare = with_footer[:-26]
    assert decode_media(bare)["mime"] == "application/octet-stream"
    np.testing.assert_array_equal(decode_tga_pixels(bare), px)
    assert decode_tga(bare)["channels"] == 3


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("shape", [(9, 7), (6, 5, 3), (4, 8, 4)])
def test_structure_probe_matches_full_decode(rle, shape):
    """The header-bounded intake probe (no raster materialization)
    must report exactly what the full decoder reports on every
    supported class — the hot decode_media path rides the probe."""
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    payload = encode_tga(px, rle=rle)
    assert decode_tga_structure(payload) == decode_tga(payload)


def test_structure_probe_same_refusals_as_decoder():
    # color-mapped: typed gate, both paths
    header = struct.pack("<BBBHHBHHHHBB",
                         0, 1, 1, 0, 4, 24, 0, 0, 2, 2, 8, 0)
    with pytest.raises(NotImplementedError):
        decode_tga_structure(header + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_tga_structure(b"definitely not a tga")
    # truncated RLE stream caught by the packet WALK (no pixels)
    with pytest.raises(ValueError):
        decode_tga_structure(struct.pack(
            "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, 8, 8, 24,
            0x20) + b"\x81")
    # truncated uncompressed raster caught by the exact length check
    good = encode_tga(RNG.integers(0, 256, (4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_tga_structure(good[:20])
    # RLE packets overrunning the declared image
    overrun = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 2, 1, 8,
        0x20) + bytes([0x83, 50])               # run of 4 into 2 px
    with pytest.raises(ValueError):
        decode_tga_structure(overrun)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20),
           st.sampled_from([1, 3, 4]), st.booleans(),
           st.integers(0, 2 ** 31 - 1))
    def test_property_round_trip(h, w, ch, rle, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        # low-cardinality values force long runs through the RLE path
        px = rng.integers(0, 4, size=shape, dtype=np.uint8) * 80
        out = decode_tga_pixels(encode_tga(px, rle=rle))
        np.testing.assert_array_equal(out, px)
except ImportError:  # pragma: no cover
    pass