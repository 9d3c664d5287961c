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


def test_progressive_routing_and_restart_typed():
    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(encode_jpeg_gray(img))
    # flip SOF0 (0xC0) to SOF2: routes to the r13 progressive decoder,
    # which rejects the baseline scan header (a DC scan with Se=63)
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_gray(bytes(payload))
    # lossless (0xC3) routes to the Annex-H decoder, which rejects
    # this frankenstein payload's baseline scan header (Ss=0 is not
    # a lossless predictor)
    payload[i + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_gray(bytes(payload))
    # a genuinely unhandled SOF (arithmetic, 0xC9) refuses typed
    payload[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg_gray(bytes(payload))
    # a DRI segment no longer refuses (r13) — an interval larger than
    # the MCU count simply never fires a restart
    dri = b"\xff\xdd" + struct.pack(">H", 4) + b"\x00\x08"
    payload2 = (b"\xff\xd8" + dri
                + bytes(encode_jpeg_gray(img))[2:])
    assert (decode_jpeg_gray(payload2) == img).all()


def test_restart_interval_roundtrips():
    """DRI + RSTn: every interval yields the same pixels as the
    restart-free stream (byte-align, marker modulo cycle, DC
    predictor resets) across all three codec shapes."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb, encode_jpeg_rgb_420,
    )
    rng = np.random.RandomState(4)
    for trial in range(6):
        h, w = rng.randint(1, 50), rng.randint(1, 50)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        for ri in (1, 2, 7):
            assert (decode_jpeg_pixels(
                encode_jpeg_gray(img, restart_every=ri))
                == decode_jpeg_pixels(encode_jpeg_gray(img))).all()
    img = rng.randint(0, 256, size=(19, 23, 3)).astype(np.uint8)
    for enc in (encode_jpeg_rgb, encode_jpeg_rgb_420):
        assert (decode_jpeg_pixels(enc(img, restart_every=2))
                == decode_jpeg_pixels(enc(img))).all()
    # > 8 restarts so the RSTn marker number wraps its modulo
    big = rng.randint(0, 256, size=(80, 80)).astype(np.uint8)
    assert (decode_jpeg_pixels(encode_jpeg_gray(big, restart_every=1))
            == decode_jpeg_pixels(encode_jpeg_gray(big))).all()
    # a WRONG restart-marker number is a hard structural error
    payload = bytearray(encode_jpeg_gray(big, restart_every=1))
    i = payload.index(b"\xff\xd0")
    payload[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_pixels(bytes(payload))


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


def test_rgb_411_and_16bit_dqt():
    """The r13 widenings: 4:1:1 (Y at 4×1 — the T.81 Nb=4 maximum)
    round-trips through the generalized MCU loop, and a DQT rewritten
    at 16-bit precision (Pq=1) with the same values decodes
    identically."""
    import struct as _st

    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        STD_LUMA_QUANT, _ZZ, decode_jpeg_pixels, encode_jpeg_rgb_411,
    )
    for v in (0, 64, 130, 254):
        img = np.full((9, 21, 3), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_rgb_411(img))
        assert dec.shape == (9, 21, 3)
        assert (dec == img).all(), v
    x = np.linspace(0, 255, 40)
    g = np.clip(np.add.outer(x, x) / 2, 0, 255)
    img = np.stack([g, g[::-1], np.full_like(g, 80)],
                   axis=-1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_rgb_411(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 20 and err.mean() < 5
    assert (decode_jpeg_pixels(encode_jpeg_rgb_411(img,
                                                   restart_every=2))
            == dec).all()
    # rewrite the 8-bit DQT as a 16-bit-precision table (Pq=1)
    gray = np.arange(120, dtype=np.uint8).reshape(10, 12)
    payload = encode_jpeg_gray(gray)
    zz_quant = STD_LUMA_QUANT[_ZZ[:, 0], _ZZ[:, 1]]
    dqt16_body = b"\x10" + b"".join(
        _st.pack(">H", int(q)) for q in zz_quant)
    dqt16 = b"\xff\xdb" + _st.pack(">H", 2 + len(dqt16_body)) \
        + dqt16_body
    i = payload.index(b"\xff\xdb")
    size = _st.unpack_from(">H", payload, i + 2)[0]
    patched = payload[:i] + dqt16 + payload[i + 2 + size:]
    assert (decode_jpeg_pixels(patched)
            == decode_jpeg_pixels(payload)).all()


# ---------------------------------------------------------------
# External conformance fixtures (spec-side, NOT self-round-trips):
# these pin the codec to the PUBLISHED T.81 byte layout so a
# self-cancelling encoder/decoder bug (e.g. a transposed zigzag,
# which round trips perfectly) cannot hide.
# ---------------------------------------------------------------

# ITU T.81 Figure 5 zigzag order as flat row-major indices — the
# well-known published 64-entry table, hardcoded independently of
# the codec's sorted() construction.
_STD_ZIGZAG_FLAT = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_published_table():
    from data_ingestion_challenge_spark.operators.jpeg_codec import _ZZ
    flat = (_ZZ[:, 0] * 8 + _ZZ[:, 1]).tolist()
    assert flat == _STD_ZIGZAG_FLAT


def test_dqt_segment_is_standard_zigzag_serialization():
    """The emitted DQT payload must equal Annex K.1 serialized in the
    PUBLISHED zigzag order (the K.1 table is asymmetric, so a
    transposed writer produces different bytes)."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        STD_LUMA_QUANT,
    )
    payload = encode_jpeg_gray(np.full((8, 8), 100, dtype=np.uint8))
    i = payload.index(b"\xff\xdb")
    body = payload[i + 4:i + 4 + struct.unpack_from(
        ">H", payload, i + 2)[0] - 2]
    assert body[0] == 0x00
    expect = [int(STD_LUMA_QUANT.ravel()[j]) for j in _STD_ZIGZAG_FLAT]
    assert list(body[1:65]) == expect
    # spot-pin the first diagonal against the spec values directly
    assert expect[:6] == [16, 11, 12, 14, 12, 10]


def _hand_built_baseline_jpeg():
    """Construct a conforming baseline JPEG ENTIRELY in the test —
    own segment writer, own canonical-Huffman construction from the
    published Annex-K BITS/VALS, own bit packer, the PUBLISHED zigzag
    order — for one 8×8 grayscale block whose only nonzero
    coefficient is AC zigzag-index 1 = (row 0, col 1), value +100,
    with an all-ones quant table.  The decoded block is then the
    closed-form (0,1) DCT basis: CONSTANT down rows, a cosine ramp
    ACROSS columns.  A transposed decoder yields the transpose."""
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    ac_vals = [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21,
               0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07]  # prefix is
    # enough: canonical codes depend only on earlier entries.
    ac_vals += [0] * (sum(ac_bits) - len(ac_vals))

    def canonical(bits, vals):
        codes, code, i = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[i]] = (code, ln)
                code += 1
                i += 1
            code <<= 1
        return codes

    dc = canonical(dc_bits, dc_vals)
    ac = canonical(ac_bits, ac_vals)

    out_bits = []

    def put(code, ln):
        for k in range(ln - 1, -1, -1):
            out_bits.append((code >> k) & 1)

    put(*dc[0])                    # DC diff = 0 (size-0 symbol)
    put(*ac[0x07])                 # run 0, size 7
    put(100, 7)                    # magnitude bits of +100
    put(*ac[0x00])                 # EOB
    while len(out_bits) % 8:
        out_bits.append(1)         # pad with 1s per the spec
    scan = bytearray()
    for i in range(0, len(out_bits), 8):
        b = 0
        for bit in out_bits[i:i + 8]:
            b = (b << 1) | bit
        scan.append(b)
        if b == 0xFF:
            scan.append(0x00)

    def seg(marker, body):
        return marker + struct.pack(">H", 2 + len(body)) + body

    dqt = seg(b"\xff\xdb", b"\x00" + bytes([1] * 64))
    sof = seg(b"\xff\xc0", struct.pack(">BHHB", 8, 8, 8, 1)
              + bytes([1, 0x11, 0x00]))
    dht = seg(b"\xff\xc4",
              b"\x00" + bytes(dc_bits) + bytes(dc_vals)
              + b"\x10" + bytes(ac_bits) + bytes(ac_vals))
    sos = seg(b"\xff\xda", bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht + sos + bytes(scan)
            + b"\xff\xd9")


def test_externally_built_asymmetric_fixture_decodes_exactly():
    payload = _hand_built_baseline_jpeg()
    dec = decode_jpeg_gray(payload)
    # independent IDCT of F with F[0,1]=100, everything else 0
    C = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            C[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    F = np.zeros((8, 8))
    F[0, 1] = 100.0
    expect = np.clip(np.round(C.T @ F @ C + 128.0),
                     0, 255).astype(np.uint8)
    assert (dec == expect).all()
    # orientation pin: rows constant, columns ramp (a transposed
    # decoder produces the transpose of this)
    assert (dec == dec[0:1, :]).all()
    assert dec[0, 0] != dec[0, 7]


def test_rgb_422_roundtrip():
    """4:2:2 — horizontal-only chroma subsampling through the same
    generalized MCU loop: exact on the even-offset solid class,
    bounded error on smooth content, restart-compatible."""
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels, encode_jpeg_rgb_422,
    )
    for v in (0, 64, 130, 254):
        img = np.full((9, 15, 3), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg_rgb_422(img))
        assert dec.shape == (9, 15, 3)
        assert (dec == img).all(), v
    x = np.linspace(0, 255, 40)
    g = np.clip(np.add.outer(x, x) / 2, 0, 255)
    img = np.stack([g, g[::-1], np.full_like(g, 80)],
                   axis=-1).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_rgb_422(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4
    assert (decode_jpeg_pixels(encode_jpeg_rgb_422(img,
                                                   restart_every=2))
            == dec).all()
