"""TIFF 6.0 codec + EXIF parser tests — round trips over every
supported (compression, byte order, predictor, shape) combination,
LZW torture at the width-bump and table-reset boundaries, and
hand-built EXTERNAL fixtures (independent byte-level packing in this
file) so a self-consistent encoder/decoder drift from the spec still
fails."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_challenge_spark.operators.tiff_codec import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _packbits_decode,
    _packbits_encode,
    build_exif_app1,
    decode_tiff,
    decode_tiff_pixels,
    encode_tiff,
    parse_exif,
)

RNG = np.random.default_rng(1310)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_round_trip_gray(bo, comp):
    px = RNG.integers(0, 256, size=(21, 17), dtype=np.uint8)
    out = decode_tiff_pixels(
        encode_tiff(px, compression=comp, byte_order=bo))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_round_trip_rgb(comp):
    px = RNG.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    out = decode_tiff_pixels(encode_tiff(px, compression=comp))
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("rps", [1, 3, 64])
def test_strip_geometry(rps):
    px = RNG.integers(0, 256, size=(11, 5), dtype=np.uint8)
    out = decode_tiff_pixels(encode_tiff(px, rows_per_strip=rps))
    np.testing.assert_array_equal(out, px)


def test_lzw_predictor_round_trip():
    # smooth gradients are the predictor's target material
    base = np.add.outer(np.arange(16), np.arange(32)) % 256
    px = base.astype(np.uint8)
    payload = encode_tiff(px, compression=5, predictor=2)
    np.testing.assert_array_equal(decode_tiff_pixels(payload), px)
    # predictor tag must be declared
    assert b"\x3d\x01" in payload or b"\x01\x3d" in payload


def test_lzw_stream_width_bump_and_reset_torture():
    # Random-ish data forces dictionary growth through the 511/1023/
    # 2047 width bumps and past the 4094 reset.
    data = bytes(RNG.integers(0, 8, size=60000, dtype=np.uint8))
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data
    assert len(enc) < len(data)            # it actually compresses


def test_lzw_all_byte_values_round_trip():
    data = bytes(range(256)) * 40
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data


def test_packbits_boundary_cases():
    for data in (b"", b"a", b"ab", b"aaa", b"aab", b"abb",
                 b"a" * 400, bytes(RNG.integers(0, 3, 999,
                                                dtype=np.uint8)),
                 b"ab" * 200 + b"c" * 130):
        if data:
            assert _packbits_decode(_packbits_encode(data),
                                    len(data)) == data


def test_16bit_tiff_gated():
    px = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    # flip BitsPerSample (tag 258, type SHORT, inline) from 8 to 16
    i = payload.find(struct.pack("<HHI", 258, 3, 1))
    assert i > 0
    payload[i + 8:i + 10] = struct.pack("<H", 16)
    with pytest.raises(NotImplementedError):
        decode_tiff_pixels(bytes(payload))


def test_unknown_compression_gated():
    px = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    i = payload.find(struct.pack("<HHI", 259, 3, 1))
    payload[i + 8:i + 10] = struct.pack("<H", 7)   # JPEG-in-TIFF
    with pytest.raises(NotImplementedError):
        decode_tiff_pixels(bytes(payload))


def test_white_is_zero_inverts():
    # flip PhotometricInterpretation (262) from BlackIsZero to
    # WhiteIsZero: decoded intensities must invert
    px = RNG.integers(0, 256, size=(5, 7), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    i = payload.find(struct.pack("<HHI", 262, 3, 1))
    assert i > 0
    payload[i + 8:i + 10] = struct.pack("<H", 0)
    np.testing.assert_array_equal(decode_tiff_pixels(bytes(payload)),
                                  255 - px)


def test_palette_tiff_maps_colormap():
    # hand-build: 2x2 indices 0..3 + a ColorMap whose 16-bit entries
    # fold (>>8) to (idx, 2*idx, 3*idx)
    idx = bytes([0, 1, 2, 3])
    head = b"II*\x00" + struct.pack("<I", 12)

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + val

    n_tags = 10
    cmap_off = 12 + 2 + 12 * n_tags + 4
    e = [
        entry(256, 3, 1, struct.pack("<HH", 2, 0)),
        entry(257, 3, 1, struct.pack("<HH", 2, 0)),
        entry(258, 3, 1, struct.pack("<HH", 8, 0)),
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),
        entry(262, 3, 1, struct.pack("<HH", 3, 0)),   # palette
        entry(273, 4, 1, struct.pack("<I", 8)),
        entry(277, 3, 1, struct.pack("<HH", 1, 0)),
        entry(278, 3, 1, struct.pack("<HH", 2, 0)),
        entry(279, 4, 1, struct.pack("<I", 4)),
        entry(320, 3, 768, struct.pack("<I", cmap_off)),
    ]
    ifd = (struct.pack("<H", len(e)) + b"".join(e)
           + struct.pack("<I", 0))
    cmap = ([(v << 8) for v in range(256)]
            + [((2 * v) & 0xFF) << 8 for v in range(256)]
            + [((3 * v) & 0xFF) << 8 for v in range(256)])
    payload = (head + idx + ifd
               + struct.pack("<768H", *cmap))
    out = decode_tiff_pixels(payload)
    assert out.shape == (2, 2, 3)
    expect = np.array([[[0, 0, 0], [1, 2, 3]],
                       [[2, 4, 6], [3, 6, 9]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_unknown_photometric_gated():
    px = RNG.integers(0, 256, size=(4, 4), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    i = payload.find(struct.pack("<HHI", 262, 3, 1))
    payload[i + 8:i + 10] = struct.pack("<H", 6)   # YCbCr
    with pytest.raises(NotImplementedError):
        decode_tiff_pixels(bytes(payload))


def test_photometric_sample_mismatch_raises():
    px = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_tiff(px))
    i = payload.find(struct.pack("<HHI", 262, 3, 1))
    payload[i + 8:i + 10] = struct.pack("<H", 1)   # gray w/ 3 spp
    with pytest.raises(ValueError):
        decode_tiff_pixels(bytes(payload))


def test_not_a_tiff_raises():
    with pytest.raises(ValueError):
        decode_tiff_pixels(b"PK\x03\x04 not a tiff")


def test_decode_tiff_dict_shape():
    px = RNG.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    d = decode_tiff(encode_tiff(px))
    assert d == {"mime": "image/tiff", "n_frames": 1, "rate": None,
                 "channels": 3, "width": 9, "height": 6,
                 "pcm_rms": None}


# ---------------------------------------------------------------- #
# External fixture: a little-endian uncompressed 2x3 grayscale TIFF #
# packed by hand, byte by byte — independent of encode_tiff.        #
# ---------------------------------------------------------------- #

def _hand_tiff() -> tuple[bytes, np.ndarray]:
    pixels = bytes([10, 20, 30, 40, 50, 60])     # 2 rows x 3 cols
    # layout: header(8) | pixels(6) | IFD at 14
    head = b"II*\x00" + struct.pack("<I", 14)

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + val

    e = [
        entry(256, 3, 1, struct.pack("<HH", 3, 0)),    # width
        entry(257, 3, 1, struct.pack("<HH", 2, 0)),    # height
        entry(258, 3, 1, struct.pack("<HH", 8, 0)),    # bits
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),    # no compression
        entry(262, 3, 1, struct.pack("<HH", 1, 0)),    # BlackIsZero
        entry(273, 4, 1, struct.pack("<I", 8)),        # strip offset
        entry(277, 3, 1, struct.pack("<HH", 1, 0)),    # 1 sample
        entry(278, 3, 1, struct.pack("<HH", 2, 0)),    # rows/strip
        entry(279, 4, 1, struct.pack("<I", 6)),        # strip bytes
    ]
    ifd = struct.pack("<H", len(e)) + b"".join(e) + struct.pack("<I", 0)
    payload = head + pixels + ifd
    expected = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    return payload, expected


def test_external_hand_built_tiff_decodes_exactly():
    payload, expected = _hand_tiff()
    np.testing.assert_array_equal(decode_tiff_pixels(payload),
                                  expected)


def test_multi_page_ifd_chain_counted():
    # Chain a second IFD (sharing the strip bytes) onto the hand
    # fixture: n_frames must report 2, pixel decode stays page 0.
    from data_ingestion_challenge_spark.operators.tiff_codec import (
        count_tiff_pages,
    )
    payload, expected = _hand_tiff()
    second = payload[14:]                  # the IFD block itself
    patched = bytearray(payload + second)
    # first IFD's next pointer (last 4 bytes of the original file)
    struct.pack_into("<I", patched, len(payload) - 4, len(payload))
    patched = bytes(patched)
    assert count_tiff_pages(patched) == 2
    assert decode_tiff(patched)["n_frames"] == 2
    np.testing.assert_array_equal(decode_tiff_pixels(patched),
                                  expected)


def test_ifd_cycle_guard():
    from data_ingestion_challenge_spark.operators.tiff_codec import (
        count_tiff_pages,
    )
    payload, _ = _hand_tiff()
    patched = bytearray(payload)
    struct.pack_into("<I", patched, len(payload) - 4, 14)  # self-loop
    with pytest.raises(ValueError):
        count_tiff_pages(bytes(patched))


def test_external_hand_built_packbits_strip():
    # 257-n replicate coding straight from the TIFF 6.0 spec example
    # shape: F8 aa = 'aa' x 9, 02 'bcd' literal.
    strip = bytes([0xF8, 0xAA, 0x02]) + b"bcd"
    assert _packbits_decode(strip, 12) == b"\xaa" * 9 + b"bcd"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20),
           st.sampled_from([1, 5, 32773]), st.sampled_from(["<", ">"]),
           st.integers(1, 6), st.booleans(),
           st.integers(0, 2 ** 31 - 1), st.booleans())
    def test_property_round_trip(h, w, comp, bo, rps, rgb, seed,
                                 pred):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if rgb else (h, w)
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        predictor = 2 if (pred and comp == 5) else 1
        out = decode_tiff_pixels(encode_tiff(
            px, compression=comp, byte_order=bo, rows_per_strip=rps,
            predictor=predictor))
        np.testing.assert_array_equal(out, px)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=3000))
    def test_property_lzw_arbitrary_bytes(data):
        assert _lzw_decode_tiff(_lzw_encode_tiff(data),
                                len(data)) == data

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=3000))
    def test_property_packbits_arbitrary_bytes(data):
        assert _packbits_decode(_packbits_encode(data),
                                len(data)) == data
except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------- #
# BigTIFF (version 43, 8-byte offsets)                               #
# ---------------------------------------------------------------- #

@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_bigtiff_round_trip(bo, comp):
    px = RNG.integers(0, 256, size=(9, 14), dtype=np.uint8)
    payload = encode_tiff(px, compression=comp, byte_order=bo,
                          bigtiff=True)
    assert payload[2:4] in (b"+\x00", b"\x00+")   # version 43
    np.testing.assert_array_equal(decode_tiff_pixels(payload), px)


def test_bigtiff_rgb_and_dict():
    px = RNG.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = encode_tiff(px, bigtiff=True)
    np.testing.assert_array_equal(decode_tiff_pixels(payload), px)
    d = decode_tiff(payload)
    assert (d["width"], d["height"], d["channels"],
            d["n_frames"]) == (6, 5, 3, 1)


def test_bigtiff_hand_built_with_long8_offsets():
    # 2x2 grayscale, strips declared via the BigTIFF LONG8 type (16)
    pixels = bytes([7, 8, 9, 10])
    head = (b"II" + struct.pack("<HHH", 43, 8, 0)
            + struct.pack("<Q", 20))       # IFD at 20

    def entry(tag, typ, cnt, val8):
        return struct.pack("<HHQ", tag, typ, cnt) + val8

    def q(v):
        return struct.pack("<Q", v)

    e = [
        entry(256, 3, 1, struct.pack("<HHI", 2, 0, 0)),
        entry(257, 3, 1, struct.pack("<HHI", 2, 0, 0)),
        entry(258, 3, 1, struct.pack("<HHI", 8, 0, 0)),
        entry(259, 3, 1, struct.pack("<HHI", 1, 0, 0)),
        entry(262, 3, 1, struct.pack("<HHI", 1, 0, 0)),
        entry(273, 16, 1, q(16)),          # LONG8 strip offset
        entry(277, 3, 1, struct.pack("<HHI", 1, 0, 0)),
        entry(278, 3, 1, struct.pack("<HHI", 2, 0, 0)),
        entry(279, 16, 1, q(4)),           # LONG8 byte count
    ]
    ifd = q(len(e)) + b"".join(e) + q(0)
    payload = head + pixels + ifd
    np.testing.assert_array_equal(
        decode_tiff_pixels(payload),
        np.array([[7, 8], [9, 10]], dtype=np.uint8))
    assert decode_tiff(payload)["n_frames"] == 1


def test_bigtiff_malformed_offset_size_rejected():
    bad = b"II" + struct.pack("<HHH", 43, 4, 0) + struct.pack("<Q", 16)
    with pytest.raises(ValueError):
        decode_tiff_pixels(bad)


def test_truncated_headers_raise_valueerror_not_struct_error():
    for frag in (b"II+\x00", b"II+\x00\x08\x00", b"II*\x00",
                 b"MM\x00*\x00"):
        with pytest.raises(ValueError):
            decode_tiff_pixels(frag)


def test_multipage_bigtiff_chain_counted():
    # splice a second BigTIFF page and patch page 1's next pointer:
    # the chain count must use the BigTIFF IFD layout throughout
    a = RNG.integers(0, 256, size=(3, 4), dtype=np.uint8)
    b = RNG.integers(0, 256, size=(2, 5), dtype=np.uint8)
    pa, pb = (encode_tiff(a, bigtiff=True),
              encode_tiff(b, bigtiff=True))
    base = len(pa)
    b_ifd = struct.unpack_from("<Q", pb, 8)[0]
    patched = bytearray(pa + pb)
    # page 1's next-IFD pointer is the trailing 8 bytes of pa
    struct.pack_into("<Q", patched, len(pa) - 8, base + b_ifd)
    # rebase page 2's strip offsets (inline, 20-byte entries)
    ifd_pos = base + b_ifd
    n = struct.unpack_from("<Q", patched, ifd_pos)[0]
    for k in range(n):
        e = ifd_pos + 8 + 20 * k
        tag, typ = struct.unpack_from("<HH", patched, e)
        cnt = struct.unpack_from("<Q", patched, e + 4)[0]
        size = {3: 2, 4: 4, 16: 8}.get(typ, 1) * cnt
        if size > 8:
            off = struct.unpack_from("<Q", patched, e + 12)[0]
            struct.pack_into("<Q", patched, e + 12, base + off)
        elif tag == 273:
            off = struct.unpack_from("<I", patched, e + 12)[0]
            struct.pack_into("<I", patched, e + 12, base + off)
    payload = bytes(patched)
    from data_ingestion_challenge_spark.operators.tiff_codec import (
        count_tiff_pages,
    )
    assert count_tiff_pages(payload) == 2
    assert decode_tiff(payload)["n_frames"] == 2
    np.testing.assert_array_equal(decode_tiff_pixels(payload, 1), b)


def test_bigtiff_sniffed_by_decode_media():
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_media,
    )
    px = RNG.integers(0, 256, size=(3, 3), dtype=np.uint8)
    d = decode_media(encode_tiff(px, bigtiff=True))
    assert d["mime"] == "image/tiff" and d["width"] == 3


# ---------------------------------------------------------------- #
# EXIF                                                              #
# ---------------------------------------------------------------- #

def _jpeg_with_exif(app1: bytes) -> bytes:
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )
    base = encode_jpeg_gray(np.full((4, 4), 100, dtype=np.uint8))
    return base[:2] + app1 + base[2:]


@pytest.mark.parametrize("bo", ["<", ">"])
def test_exif_round_trip(bo):
    app1 = build_exif_app1(orientation=6, make="ACME",
                           model="Snap 9000",
                           datetime_str="2026:08:16 12:00:00",
                           byte_order=bo)
    meta = parse_exif(_jpeg_with_exif(app1))
    assert meta["orientation"] == 6
    assert meta["make"] == "ACME"
    assert meta["model"] == "Snap 9000"
    assert meta["datetime"] == "2026:08:16 12:00:00"


def test_exif_absent_returns_empty():
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )
    jpg = encode_jpeg_gray(np.full((4, 4), 100, dtype=np.uint8))
    assert parse_exif(jpg) == {}


def test_exif_still_decodes_as_jpeg():
    # an APP1 segment must not break the pixel decoder or the
    # structure parser
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        decode_jpeg_pixels,
    )
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_jpeg_header,
    )
    jpg = _jpeg_with_exif(build_exif_app1(orientation=3))
    assert decode_jpeg_pixels(jpg).shape == (4, 4)
    assert decode_jpeg_header(jpg)["width"] == 4


def test_exif_hand_built_fixture():
    # A hand-packed big-endian APP1: IFD0 with Orientation=8 only.
    tiff = (b"MM\x00*" + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 274, 3, 1)
            + struct.pack(">HH", 8, 0)
            + struct.pack(">I", 0))
    seg = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg
    meta = parse_exif(_jpeg_with_exif(app1))
    assert meta == {"orientation": 8}


def test_exif_tolerates_fill_bytes():
    # a legal 0xFF fill byte before APP1 must not desync the walk
    app1 = build_exif_app1(orientation=5)
    jpg = _jpeg_with_exif(app1)
    padded = jpg[:2] + b"\xff" + jpg[2:]
    assert parse_exif(padded)["orientation"] == 5


def test_decode_real_counts_tiff_pages():
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_real,
    )
    payload, _ = _hand_tiff()
    second = payload[14:]
    patched = bytearray(payload + second)
    struct.pack_into("<I", patched, len(payload) - 4, len(payload))
    n_bytes, n_frames = decode_real(bytes(patched))
    assert (n_bytes, n_frames) == (len(patched), 2)


def test_exif_malformed_raises():
    seg = b"Exif\x00\x00" + b"II*\x00" + struct.pack("<I", 9999)
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg
    with pytest.raises(ValueError):
        parse_exif(_jpeg_with_exif(app1))


def test_exif_features_column_op(spark):
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )
    from data_ingestion_challenge_spark.operators.multimodal import (
        exif_features,
    )
    with_exif = _jpeg_with_exif(build_exif_app1(
        orientation=6, make="ACME",
        datetime_str="2026:08:16 10:00:00"))
    plain = bytes(encode_jpeg_gray(np.full((4, 4), 9, np.uint8)))
    malformed = _jpeg_with_exif(
        b"\xff\xe1" + struct.pack(">H", 12)
        + b"Exif\x00\x00" + b"II*\x00")
    df = spark.createDataFrame(
        [(1, bytearray(with_exif)), (2, bytearray(plain)),
         (3, bytearray(b"not media at all")),
         (4, bytearray(malformed))],
        "doc_id long, payload binary")
    out = {r.doc_id: r for r in exif_features(df).collect()}
    assert out[1].exif_ok and out[1].orientation == 6
    assert out[1].make == "ACME"
    assert out[1].datetime_original == "2026:08:16 10:00:00"
    for bad in (2, 3, 4):
        assert not out[bad].exif_ok
        assert out[bad].orientation is None
