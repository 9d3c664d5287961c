"""Netpbm (P1-P6) codec tests + the multi-page TIFF pixel-decode
addition.  ASCII fixtures are written by hand (the format IS its own
external fixture — the header grammar and raster layout come straight
from the spec text), so decoder drift from the spec fails without an
encoder round trip to hide behind."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.multimodal import (
    decode_media,
    decode_pnm,
    decode_pnm_pixels,
    encode_pnm,
)

RNG = np.random.default_rng(1311)


@pytest.mark.parametrize("rgb", [False, True])
@pytest.mark.parametrize("ascii_format", [False, True])
def test_round_trip_8bit(rgb, ascii_format):
    shape = (7, 11, 3) if rgb else (7, 11)
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_pnm_pixels(encode_pnm(px, ascii_format=ascii_format))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("rgb", [False, True])
def test_round_trip_16bit_binary(rgb):
    shape = (4, 5, 3) if rgb else (4, 5)
    px = RNG.integers(0, 65536, size=shape, dtype=np.uint16)
    out = decode_pnm_pixels(encode_pnm(px))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)


def test_hand_built_p2_with_comments():
    payload = b"P2\n# a comment\n3 2\n# another\n255\n0 10 20\n30 40 50\n"
    expected = np.array([[0, 10, 20], [30, 40, 50]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm_pixels(payload), expected)


def test_hand_built_p1_run_together_digits():
    # P1 allows digits with no separating whitespace; 1 = BLACK -> 0
    payload = b"P1\n4 2\n1010\n0101\n"
    expected = np.array([[0, 255, 0, 255], [255, 0, 255, 0]],
                        dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm_pixels(payload), expected)


def test_hand_built_p4_packed_rows():
    # 10x2 bitmap: each row is 2 bytes, MSB-first, 1 = black -> 0
    raster = bytes([0b10100000, 0b01000000,
                    0b01010000, 0b10000000])
    payload = b"P4\n10 2\n" + raster
    out = decode_pnm_pixels(payload)
    assert out.shape == (2, 10)
    # row 0 bits (MSB-first): 1,0,1,0,0,0,0,0 | 0,1 -> 1 = black = 0
    assert list(out[0]) == [0, 255, 0, 255, 255,
                            255, 255, 255, 255, 0]
    # row 1 bits: 0,1,0,1,0,0,0,0 | 1,0
    assert list(out[1]) == [255, 0, 255, 0, 255,
                            255, 255, 255, 0, 255]


def test_hand_built_p3_color():
    payload = b"P3 2 1 255  255 0 0  0 0 255\n"
    out = decode_pnm_pixels(payload)
    np.testing.assert_array_equal(
        out, np.array([[[255, 0, 0], [0, 0, 255]]], dtype=np.uint8))


def test_p1_comment_inside_raster_skipped():
    # '#' comments are legal ANYWHERE in plain formats — '0'/'1'
    # characters inside one must not become pixels
    payload = b"P1\n2 2\n# row 1 note: 1011\n10\n01\n"
    expected = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm_pixels(payload), expected)


def test_p1_invalid_digit_rejected():
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P1\n2 2\n1 2 0 1 1\n")


def test_encode_pnm_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_pnm(np.zeros((2, 2, 4), dtype=np.uint8))   # RGBA
    with pytest.raises(ValueError):
        encode_pnm(np.zeros((2, 2, 1), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_pnm(np.zeros(4, dtype=np.uint8))           # 1-D


def test_structure_probe_header_bounded():
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_pnm_structure,
    )
    px = RNG.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    d = decode_pnm_structure(encode_pnm(px))
    assert (d["width"], d["height"], d["channels"]) == (4, 6, 3)
    # binary raster truncation IS caught by the length arithmetic
    with pytest.raises(ValueError):
        decode_pnm_structure(encode_pnm(px)[:-5])
    # 16-bit binary needs 2 bytes per sample
    wide = RNG.integers(0, 65536, size=(3, 3), dtype=np.uint16)
    assert decode_pnm_structure(encode_pnm(wide))["channels"] == 1
    with pytest.raises(ValueError):
        decode_pnm_structure(encode_pnm(wide)[:-1])


def test_sample_exceeding_maxval_rejected():
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P2\n1 1\n100\n200\n")


def test_truncated_rasters_raise():
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P5\n4 4\n255\n" + b"\x00" * 7)
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P4\n16 2\n\xff")
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P2\n3 3\n255\n1 2 3\n")


def test_not_pnm_rejected():
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"P7\n1 1\n255\n\x00")   # PAM unsupported
    with pytest.raises(ValueError):
        decode_pnm_pixels(b"Plain text, not an image")


def test_decode_media_classifies_pnm():
    px = RNG.integers(0, 256, size=(3, 4), dtype=np.uint8)
    d = decode_media(encode_pnm(px))
    assert d["mime"] == "image/x-portable-anymap"
    assert (d["width"], d["height"], d["channels"]) == (4, 3, 1)
    # bare text starting with 'P5' but no whitespace is NOT sniffed
    d2 = decode_media(b"P5x not an image")
    assert d2["mime"] == "application/octet-stream"


def test_decode_pnm_dict_rgb():
    px = RNG.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    d = decode_pnm(encode_pnm(px, ascii_format=True))
    assert d["channels"] == 3 and d["n_frames"] == 1


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 16), st.integers(1, 16), st.booleans(),
           st.booleans(), st.booleans(), st.integers(0, 2 ** 31 - 1))
    def test_property_round_trip(h, w, rgb, wide, ascii_format, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        if wide:
            px = rng.integers(0, 65536, size=shape, dtype=np.uint16)
            if ascii_format:
                return          # 16-bit ASCII: covered by 8-bit lane
        else:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_pnm_pixels(
            encode_pnm(px, ascii_format=ascii_format))
        np.testing.assert_array_equal(out, px)
except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------- #
# multi-page TIFF pixel decode                                      #
# ---------------------------------------------------------------- #

def test_tiff_page_selection():
    from data_ingestion_challenge_spark.operators.tiff_codec import (
        decode_tiff_pixels, encode_tiff,
    )
    a = RNG.integers(0, 256, size=(4, 5), dtype=np.uint8)
    b = RNG.integers(0, 256, size=(3, 6), dtype=np.uint8)
    pa, pb = encode_tiff(a), encode_tiff(b)
    # chain: splice page b's whole file after page a and patch
    # page a's next-IFD pointer to it, rebasing b's offsets
    base = len(pa)
    bo = "<"
    b_ifd = struct.unpack_from(bo + "I", pb, 4)[0]
    patched = bytearray(pa + pb)
    struct.pack_into(bo + "I", patched, len(pa) - 4, base + b_ifd + 0)
    # rebase strip offsets inside page b's IFD (tag 273) and any
    # out-of-line values: walk its entries and add `base`
    ifd_pos = base + b_ifd
    n = struct.unpack_from(bo + "H", patched, ifd_pos)[0]
    for k in range(n):
        e = ifd_pos + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(bo + "HHI", patched, e)
        size = {3: 2, 4: 4}.get(typ, 1) * cnt
        if size > 4:                        # out-of-line value
            off = struct.unpack_from(bo + "I", patched, e + 8)[0]
            struct.pack_into(bo + "I", patched, e + 8, base + off)
        elif tag == 273:                    # inline strip offset(s)
            off = struct.unpack_from(bo + "I", patched, e + 8)[0]
            struct.pack_into(bo + "I", patched, e + 8, base + off)
    payload = bytes(patched)
    np.testing.assert_array_equal(decode_tiff_pixels(payload, page=0),
                                  a)
    np.testing.assert_array_equal(decode_tiff_pixels(payload, page=1),
                                  b)
    with pytest.raises(ValueError):
        decode_tiff_pixels(payload, page=2)