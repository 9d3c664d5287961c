"""Lossless JPEG (SOF3, T.81 Annex H) codec tests.

Discipline per the r12 advice: beyond self-round-trips (which cannot
catch self-consistent encoder/decoder transposition bugs), an
EXTERNAL fixture is hand-built in this file with its own independent
Huffman assignment and bit packing — if the decoder's canonical-code
construction, magnitude extension, positional prediction rules, or
modulo arithmetic drift from the spec, the fixture decodes wrong
even though round trips still pass.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.jpeg_codec import (
    decode_jpeg_pixels,
)
from data_ingestion_challenge_spark.operators.jpeg_lossless import (
    decode_jpeg_lossless,
    encode_jpeg_lossless,
)

RNG = np.random.default_rng(1309)


@pytest.mark.parametrize("predictor", range(1, 8))
def test_round_trip_gray8_all_predictors(predictor):
    px = RNG.integers(0, 256, size=(13, 17), dtype=np.uint8)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(px, predictor=predictor))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_round_trip_gray16(predictor):
    px = RNG.integers(0, 65536, size=(9, 11), dtype=np.uint16)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(px, predictor=predictor))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, px)


def test_round_trip_three_component_interleaved():
    px = RNG.integers(0, 256, size=(8, 10, 3), dtype=np.uint8)
    out = decode_jpeg_lossless(encode_jpeg_lossless(px, predictor=4))
    assert out.shape == (8, 10, 3)
    np.testing.assert_array_equal(out, px)


def test_round_trip_extreme_diffs():
    # 0 <-> 65535 transitions exercise the mod-2**16 wrap and the
    # SSSS=16 (-32768 == +32768) no-extra-bits category.
    px = np.array([[0, 65535, 0, 32768],
                   [65535, 0, 32768, 0]], dtype=np.uint16)
    for predictor in range(1, 8):
        out = decode_jpeg_lossless(
            encode_jpeg_lossless(px, predictor=predictor))
        np.testing.assert_array_equal(out, px)


def test_round_trip_single_pixel_and_single_row():
    one = np.array([[200]], dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg_lossless(encode_jpeg_lossless(one)), one)
    row = np.arange(256, dtype=np.uint8)[None, :]
    np.testing.assert_array_equal(
        decode_jpeg_lossless(encode_jpeg_lossless(row, predictor=5)),
        row)


def test_point_transform_round_trip():
    # Pt=2: samples are coded >>2 and reconstructed <<2 — the decode
    # equals the input with the two low bits dropped.
    px = RNG.integers(0, 256, size=(6, 7), dtype=np.uint8)
    out = decode_jpeg_lossless(
        encode_jpeg_lossless(px, predictor=1, point_transform=2))
    np.testing.assert_array_equal(out, (px >> 2) << 2)


@pytest.mark.parametrize("predictor", [1, 6])
def test_restart_interval_round_trip(predictor):
    px = RNG.integers(0, 256, size=(11, 13), dtype=np.uint8)
    payload = encode_jpeg_lossless(px, predictor=predictor,
                                   restart_every=7)
    assert b"\xff\xdd" in payload            # DRI present
    assert b"\xff\xd0" in payload            # RST0 present
    np.testing.assert_array_equal(decode_jpeg_lossless(payload), px)


def test_restart_resets_to_one_dimensional_line():
    # T.81 H.1.2: after an RSTn the next sample predicts from the
    # default and the REST OF THAT LINE uses Ra (predictor 1), even
    # under a 2-D scan predictor.  This fixture is hand-packed with
    # that rule; a decoder that resumes the 2-D predictor after the
    # restart reconstructs (1,2) as 135 instead of 133.
    import struct as _s

    def seg(marker, body):
        return marker + _s.pack(">H", 2 + len(body)) + body

    bits = [0, 1, 5] + [0] * 13
    vals = [0, 1, 2, 3, 4, 5]
    sof = seg(b"\xff\xc3", _s.pack(">BHHB", 8, 2, 3, 1)
              + bytes([1, 0x11, 0]))
    dht = seg(b"\xff\xc4", b"\x00" + bytes(bits) + bytes(vals))
    dri = seg(b"\xff\xdd", _s.pack(">H", 4))      # restart every 4
    sos = seg(b"\xff\xda", bytes([1, 1, 0x00, 4, 0x00, 0]))  # Ss=4
    # samples 128 130 127 / 126 130 133, predictor 4, restart at
    # MCU 4 = sample (1,1):
    #   (0,0) default->d0:00  (0,1) Ra->+2:011,10  (0,2) Ra->-3:011,00
    #   (1,0) Rb->-2:011,01   [pad 1s, RST0]
    #   (1,1) default->+2:011,10  (1,2) Ra(130)->+3:011,11
    entropy = (bytes([0x1C, 0xC6, 0xFF, 0x00])    # 17 bits + 1-pad
               + b"\xff\xd0"                       # RST0
               + bytes([0x73, 0xFF, 0x00]))        # 10 bits + 1-pad
    payload = (b"\xff\xd8" + sof + dht + dri + sos + entropy
               + b"\xff\xd9")
    expected = np.array([[128, 130, 127], [126, 130, 133]],
                        dtype=np.uint8)
    np.testing.assert_array_equal(decode_jpeg_lossless(payload),
                                  expected)
    # the encoder emits the identical positional rule: its bytes for
    # these pixels under the same predictor/DRI round-trip
    enc = encode_jpeg_lossless(expected, predictor=4,
                               restart_every=4)
    np.testing.assert_array_equal(decode_jpeg_lossless(enc),
                                  expected)


def test_five_component_scan_rejected():
    px = np.zeros((2, 2, 5), dtype=np.uint8)
    with pytest.raises(ValueError, match="Ns<=4"):
        encode_jpeg_lossless(px)


def test_decode_jpeg_pixels_routes_sof3():
    px = RNG.integers(0, 256, size=(5, 6), dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_lossless(px, predictor=2))
    np.testing.assert_array_equal(out, px)


def test_truncated_stream_raises():
    px = RNG.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = encode_jpeg_lossless(px)
    with pytest.raises(ValueError):
        decode_jpeg_lossless(payload[:len(payload) // 2])


def test_bad_predictor_rejected():
    px = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(px, predictor=0)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(px, predictor=8)


def test_subsampled_lossless_gated():
    # Build a frame declaring 2x1 sampling: typed NotImplementedError.
    px = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(encode_jpeg_lossless(px))
    i = payload.index(b"\xff\xc3")
    # marker(2) + len(2) + P(1) + H(2) + W(2) + Nf(1) + cid(1) -> the
    # component's sampling byte sits at offset 11
    assert payload[i + 11] == 0x11
    payload[i + 11] = 0x21
    with pytest.raises(NotImplementedError):
        decode_jpeg_lossless(bytes(payload))


# ---------------------------------------------------------------- #
# External fixture: hand-built bit stream, INDEPENDENT of the codec. #
# ---------------------------------------------------------------- #

def _fixture_bytes() -> tuple[bytes, np.ndarray]:
    """A 2x3 8-bit predictor-1 scan packed by hand.

    Huffman table (written to DHT): SSSS 0 -> code 00 (2 bits),
    SSSS 1 -> 010 (3), SSSS 2 -> 011 (3), SSSS 3 -> 100 (3),
    SSSS 4 -> 101 (3), SSSS 5 -> 110 (3) — the canonical assignment
    for BITS=[0,1,5,0,...], VALS=[0,1,2,3,4,5].

    Samples (P=8, Pt=0, predictor 1):
      row 0: 128, 130, 127   row 1: 126, 126, 130
    Differences per H.1.2 positional rules:
      (0,0): pred 128 (=2**7)        -> d 0    : 00
      (0,1): pred left  128          -> d +2   : 011 + extra '10'
      (0,2): pred left  130          -> d -3   : 011 + extra '00'
      (1,0): pred above 128          -> d -2   : 011 + extra '01'
      (1,1): pred left  126 (Ss=1)   -> d 0    : 00
      (1,2): pred left  126          -> d +4   : 100 + extra '100'
    Stream: 00 01110 01100 01101 00 100100 (25 bits) -> pad with
    1s to 00011100 11000110 10010010 01111111 = 1C C6 92 7F.
    """
    import struct as _s

    def seg(marker, body):
        return marker + _s.pack(">H", 2 + len(body)) + body

    bits = [0, 1, 5] + [0] * 13
    vals = [0, 1, 2, 3, 4, 5]
    sof = seg(b"\xff\xc3", _s.pack(">BHHB", 8, 2, 3, 1)
              + bytes([1, 0x11, 0]))
    dht = seg(b"\xff\xc4", b"\x00" + bytes(bits) + bytes(vals))
    sos = seg(b"\xff\xda", bytes([1, 1, 0x00, 1, 0x00, 0]))
    entropy = bytes([0x1C, 0xC6, 0x92, 0x7F])
    payload = b"\xff\xd8" + sof + dht + sos + entropy + b"\xff\xd9"
    expected = np.array([[128, 130, 127], [126, 126, 130]],
                        dtype=np.uint8)
    return payload, expected


def test_external_hand_built_fixture_decodes_exactly():
    payload, expected = _fixture_bytes()
    np.testing.assert_array_equal(decode_jpeg_lossless(payload),
                                  expected)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24),
           st.integers(1, 7), st.integers(0, 2 ** 31 - 1),
           st.booleans(), st.integers(0, 9))
    def test_property_round_trip(h, w, predictor, seed, wide,
                                 restart):
        rng = np.random.default_rng(seed)
        if wide:
            px = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        else:
            px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_jpeg_lossless(encode_jpeg_lossless(
            px, predictor=predictor, restart_every=restart))
        np.testing.assert_array_equal(out, px)
except ImportError:  # pragma: no cover
    pass


def test_encoder_emits_spec_dht_serialization():
    # The DHT body must be class 0, the 16 BITS counts, then the
    # SSSS symbols in canonical order — byte-comparable to the spec
    # serialization (catches any silent table drift).
    from data_ingestion_challenge_spark.operators.jpeg_lossless import (
        LL_BITS,
        LL_VALS,
    )
    payload = encode_jpeg_lossless(np.zeros((2, 2), dtype=np.uint8))
    i = payload.index(b"\xff\xc4")
    body = payload[i + 4:i + 4 + 1 + 16 + len(LL_VALS)]
    assert body == b"\x00" + bytes(LL_BITS) + bytes(LL_VALS)
