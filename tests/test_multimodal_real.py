"""REAL media decode over REAL bytes — no stubs: the pure-stdlib
WAV/BMP round trips (encode with struct → decode with the parser →
stats equal the generator's parameters), the Arrow-batched
media_inventory pass over a mixed binary column, and garbage
robustness (a 100 TB crawl always contains corrupt payloads)."""

from __future__ import annotations

import numpy as np

from data_ingestion_challenge_spark.operators.multimodal import (
    decode_bmp, decode_media, decode_wav, encode_bmp24,
    encode_wav_pcm16, media_inventory,
)


def _sine_pcm(rate=8000, secs=0.5, hz=440, amp=12000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * hz * t)).astype("<i2")


def test_wav_round_trip_exact():
    pcm = _sine_pcm()
    payload = encode_wav_pcm16(pcm, rate=8000)
    d = decode_wav(payload)
    assert d["mime"] == "audio/wav"
    assert d["rate"] == 8000 and d["channels"] == 1
    assert d["n_frames"] == len(pcm)
    want_rms = int(np.sqrt(np.mean(pcm.astype(np.int64) ** 2)))
    assert d["pcm_rms"] == want_rms and d["pcm_rms"] > 0


def test_wav_stereo_frames_count_blocks():
    pcm = np.zeros(400, dtype="<i2")  # 200 stereo frames
    payload = encode_wav_pcm16(pcm, rate=16000, channels=2)
    d = decode_wav(payload)
    assert d["channels"] == 2 and d["n_frames"] == 200
    assert d["rate"] == 16000 and d["pcm_rms"] == 0


def test_bmp_round_trip_exact():
    # 3x5 gradient; width forces row padding (5*3=15 -> stride 16)
    px = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = encode_bmp24(px)
    d = decode_bmp(payload)
    assert d["mime"] == "image/bmp"
    assert (d["width"], d["height"]) == (5, 3)
    assert d["n_frames"] == 1
    # mean pixel excludes the padding bytes exactly
    assert d["pcm_rms"] == int(px.astype(np.int64).sum() // px.size)


def test_decode_media_sniffs_and_survives_garbage():
    wav = encode_wav_pcm16(_sine_pcm(secs=0.01), rate=8000)
    bmp = encode_bmp24(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_media(wav)["mime"] == "audio/wav"
    assert decode_media(bmp)["mime"] == "image/bmp"
    for junk in (b"", b"BM", b"RIFFxxxxWAVE", b"plain text bytes",
                 wav[:20], bmp[:10]):
        d = decode_media(junk)
        assert d["mime"] == "application/octet-stream"


def test_media_inventory_classifies_mixed_column(spark):
    """The Arrow pass over a mixed binary column: every payload REALLY
    decoded (wav stats, bmp dims) or inventoried as opaque — one
    mapInPandas, schema stable."""
    pcm = _sine_pcm(secs=0.1)
    wav = encode_wav_pcm16(pcm, rate=8000)
    bmp = encode_bmp24(
        np.full((4, 6, 3), 200, dtype=np.uint8))
    rows = [(1, bytearray(wav)), (2, bytearray(bmp)),
            (3, bytearray(b"not media at all"))]
    bt = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in media_inventory(bt).collect()}
    assert out[1].mime == "audio/wav" and out[1].rate == 8000
    assert out[1].n_frames == len(pcm)
    assert out[2].mime == "image/bmp"
    assert (out[2].width, out[2].height) == (6, 4)
    assert out[2].pcm_rms == 200  # constant image -> exact mean
    assert out[3].mime == "application/octet-stream"
    assert out[3].n_frames is None
    assert all(out[i].n_bytes == len(rows[i - 1][1]) for i in (1, 2, 3))


def test_decode_real_handles_wav_bmp_natively():
    """decode_real no longer raises for WAV/BMP — only for the
    formats that genuinely need the absent libs."""
    import pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        HAS_MEDIA_LIBS, decode_real,
    )
    pcm = _sine_pcm(secs=0.05)
    wav = encode_wav_pcm16(pcm, rate=8000)
    assert decode_real(wav) == (len(wav), len(pcm))
    bmp = encode_bmp24(np.zeros((2, 3, 3), dtype=np.uint8))
    assert decode_real(bmp) == (len(bmp), 1)
    if not HAS_MEDIA_LIBS:
        # Recognized-signature garbage reaches the REAL parsers
        # (incl. the r13 MP4 box walk), which raise ValueError on
        # broken structure.
        with pytest.raises(ValueError):
            decode_real(b"\x00\x00\x00\x18ftypmp42 not a real mp4")
        with pytest.raises(ValueError):
            decode_real(b"\xff\xd8\xff\xe0 not really a jpeg")
        with pytest.raises(ValueError):
            decode_real(b"\x89PNG\r\n\x1a\n not really a png")


def test_synth_wav_inventory_matches_oracle(spark):
    """The encode→decode round trip over the documents table equals
    the closed-form oracle row for row — the gateable witness that
    the WAV path is a real parser (r12-pool registration
    candidate)."""
    import duckdb

    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_WAV_INVENTORY_ORACLE, synth_wav_inventory,
    )
    from tests.conftest import SF_DIR
    from tests.test_r9_candidates import _compare

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF_DIR}/documents.parquet'")
    rows = _compare(synth_wav_inventory(docs), con,
                    SYNTH_WAV_INVENTORY_ORACLE)
    assert len(rows) == docs.count()


# ------------------------------------------- REAL PNG codec (r12)


def test_png_roundtrip_every_filter_rgb_and_gray():
    """decode(encode(img, filter=f)) reconstructs the EXACT pixel
    stats for every scanline filter type — Sub's modular cumsum, Up,
    Average's floor divide, and Paeth's tie-break order all verified
    against random images (a wrong predictor shifts the mean)."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png, encode_png,
    )
    rng = np.random.default_rng(7)
    for shape in ((5, 9, 3), (4, 7)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want_mean = int(img.astype(np.int64).sum() // img.size)
        for f in range(5):
            d = decode_png(encode_png(img, filter_type=f))
            assert (d["width"], d["height"]) == (shape[1], shape[0])
            assert d["pcm_rms"] == want_mean, f"filter {f}"
            assert d["mime"] == "image/png" and d["n_frames"] == 1


def test_png_decode_media_and_decode_real():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_media, decode_real, encode_png,
    )
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    payload = encode_png(img, filter_type=4)
    assert decode_media(payload)["mime"] == "image/png"
    assert decode_real(payload) == (len(payload), 1)
    # garbage with a PNG signature classifies opaque, never raises
    junk = b"\x89PNG\r\n\x1a\n" + b"not chunks at all"
    assert decode_media(junk)["mime"] == "application/octet-stream"


def test_png_illegal_depth_combo_raises_typed():
    """The genuinely-ungated remainder — a depth/color-type combo the
    spec itself forbids (2-bit TRUECOLOR) — raises typed
    NotImplementedError from the parser (decode_media catches);
    16-bit / palette / interlaced / sub-8-bit gray all decode
    natively since r13."""
    import struct
    import zlib

    import pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png,
    )

    def _chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 2, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr2)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
               + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="combination"):
        decode_png(payload)


def test_synth_png_inventory_matches_oracle(spark):
    """Encode→decode round trip over the documents table equals the
    closed-form oracle row for row — every unfilter path exercised
    across the corpus (filter = n_chars % 5)."""
    import duckdb

    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_PNG_INVENTORY_ORACLE, synth_png_inventory,
    )
    from tests.conftest import SF_DIR
    from tests.test_r9_candidates import _compare

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF_DIR}/documents.parquet'")
    rows = _compare(synth_png_inventory(docs), con,
                    SYNTH_PNG_INVENTORY_ORACLE)
    assert len(rows) == docs.count()


# ----------------------------- JPEG/GIF structure parse (r12)


def _jpeg_bytes(w, h, ch=3):
    """Genuine JPEG segment structure: SOI, APP0/JFIF, a DQT stub,
    SOF0 with the real dimension fields, SOS start — the exact walk
    decode_jpeg_header performs on a real camera file."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, h, w, ch) + b"\x01\x11\x00" * ch
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
            + b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00")


def _gif_bytes(w, h, n_frames):
    """Genuine GIF89a block structure: logical screen + global color
    table, a graphic-control extension per frame, image descriptors
    with length-prefixed LZW sub-block chains, trailer."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # gct, 2 entries
    out += b"\x00\x00\x00\xff\xff\xff"              # the table
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE + terminator
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x02"                              # LZW min code size
        out += b"\x03\x84\x51\x91" + b"\x00"        # data sub-blocks
    out += b"\x3b"
    return bytes(out)


def test_jpeg_header_parse_real_structure():
    import pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_jpeg_header, decode_media,
    )
    d = decode_jpeg_header(_jpeg_bytes(640, 480))
    assert (d["width"], d["height"], d["channels"]) == (640, 480, 3)
    assert d["mime"] == "image/jpeg" and d["pcm_rms"] is None
    assert decode_media(_jpeg_bytes(33, 7, ch=1))["width"] == 33
    # truncated garbage behind the SOI marker: typed, media-opaque
    with pytest.raises(ValueError):
        decode_jpeg_header(b"\xff\xd8\x00\x00garbage")
    assert decode_media(b"\xff\xd8\x00\x00garbage")["mime"] \
        == "application/octet-stream"


def test_gif_structure_parse_counts_frames_exactly():
    import pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_gif_structure, decode_media,
    )
    for n in (1, 3, 7):
        d = decode_gif_structure(_gif_bytes(12, 9, n))
        assert (d["width"], d["height"], d["n_frames"]) == (12, 9, n)
        assert d["mime"] == "image/gif"
    m = decode_media(_gif_bytes(2, 2, 2))
    assert m["mime"] == "image/gif" and m["n_frames"] == 2
    with pytest.raises(ValueError):
        decode_gif_structure(b"GIF89a\x00")  # truncated
    assert decode_media(b"GIF89ajunk")["mime"] \
        == "application/octet-stream"


def test_media_inventory_classifies_all_real_formats(spark):
    """One mixed binary column through the Arrow intake audit: every
    stdlib-parseable format lands with its true stats; garbage stays
    opaque; nothing fails the batch."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        encode_bmp24, encode_png, encode_wav_pcm16, media_inventory,
    )
    wav = encode_wav_pcm16(np.full(30, 5, dtype="<i2"), rate=8000)
    bmp = encode_bmp24(np.zeros((2, 3, 3), dtype=np.uint8))
    png = encode_png(np.full((4, 5, 3), 9, dtype=np.uint8), 3)
    rows = [(1, wav), (2, bmp), (3, png),
            (4, _jpeg_bytes(64, 32)), (5, _gif_bytes(8, 8, 4)),
            (6, b"just some text bytes")]
    bt = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: (r.mime, r.n_frames, r.width, r.height)
           for r in media_inventory(bt).collect()}
    assert out[1] == ("audio/wav", 30, None, None)
    assert out[2] == ("image/bmp", 1, 3, 2)
    assert out[3] == ("image/png", 1, 5, 4)
    assert out[4] == ("image/jpeg", 1, 64, 32)
    assert out[5] == ("image/gif", 4, 8, 8)
    assert out[6] == ("application/octet-stream", None, None, None)


# ---------------------------- AIFF / .au real parse (r12)


def test_aiff_round_trip_exact():
    """encode→decode reconstructs rate (through the 80-bit extended
    float), channels, frame count, and the exact integer RMS of the
    big-endian PCM."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_aiff, decode_media, encode_aiff_pcm16,
    )
    pcm = _sine_pcm(secs=0.05)
    for rate in (8000, 44100, 48000):
        payload = encode_aiff_pcm16(pcm, rate=rate)
        d = decode_aiff(payload)
        assert d["mime"] == "audio/aiff" and d["rate"] == rate
        assert d["channels"] == 1 and d["n_frames"] == len(pcm)
        want = int(np.sqrt(np.mean(pcm.astype(np.int64) ** 2)))
        assert d["pcm_rms"] == want
    assert decode_media(payload)["mime"] == "audio/aiff"
    stereo = encode_aiff_pcm16(np.zeros(400, dtype="<i2"),
                               rate=16000, channels=2)
    d2 = decode_aiff(stereo)
    assert d2["channels"] == 2 and d2["n_frames"] == 200


def test_au_parse_exact():
    import struct

    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_au, decode_media,
    )
    pcm = _sine_pcm(secs=0.03).astype(">i2")
    hdr = b".snd" + struct.pack(">5L", 24, len(pcm.tobytes()),
                                3, 8000, 1)
    payload = hdr + pcm.tobytes()
    d = decode_au(payload)
    assert d["mime"] == "audio/basic" and d["rate"] == 8000
    assert d["n_frames"] == len(pcm)
    want = int(np.sqrt(np.mean(pcm.astype(np.int64) ** 2)))
    assert d["pcm_rms"] == want
    assert decode_media(payload)["mime"] == "audio/basic"
    # non-PCM encodings inventory without frame stats
    mu = b".snd" + struct.pack(">5L", 24, 8, 1, 8000, 1) + b"\x00" * 8
    d3 = decode_au(mu)
    assert d3["n_frames"] is None and d3["pcm_rms"] is None
    assert decode_media(b".sndjunk")["mime"] \
        == "application/octet-stream"


def test_jpeg_fill_bytes_and_tem_markers_parse():
    """ITU T.81 allows 0xFF fill bytes before any marker and the
    standalone TEM (0x01) marker — both legal structures must parse,
    not classify as opaque."""
    import struct

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_jpeg_header,
    )
    sof = struct.pack(">BHHB", 8, 10, 20, 3) + b"\x01\x11\x00" * 3
    payload = (b"\xff\xd8"
               + b"\xff\x01"                     # TEM, standalone
               + b"\xff\xff\xff\xc0"             # fill bytes then SOF0
               + struct.pack(">H", 2 + len(sof)) + sof)
    d = decode_jpeg_header(payload)
    assert (d["width"], d["height"]) == (20, 10)


# ---------------------------- GIF pixel decode via real LZW (r12)


def test_gif_lzw_roundtrip_torture():
    """Real LZW both ways: random streams across alphabet sizes and
    stream lengths (width growth, 12-bit cap + clear-reset) and
    heavy-repeat streams (deep dictionary chains + the KwKwK
    self-reference case)."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        _lzw_decode, _lzw_encode,
    )
    rng = np.random.default_rng(11)
    for mcs in (2, 3, 4, 8):
        for n in (1, 5, 300, 5000, 20000):
            idx = rng.integers(0, 1 << mcs, n).tolist()
            assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == idx
        rep = [i % (1 << mcs) for i in
               ([3] * 500 + [0, 1, 2] * 200) * 4]
        assert _lzw_decode(_lzw_encode(rep, mcs), mcs) == rep


def test_gif_pixel_roundtrip_exact():
    """GIF is lossless: encode → decode reproduces every pixel
    byte-for-byte — solid, 4-color random, and a 200-color image
    (multi-growth code widths)."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_gif_pixels, encode_gif_rgb,
    )
    rng = np.random.default_rng(5)
    solid = np.full((7, 13, 3), (40, 90, 200), dtype=np.uint8)
    assert (decode_gif_pixels(encode_gif_rgb(solid)) == solid).all()
    pal4 = np.array([(0, 0, 0), (255, 0, 0), (0, 255, 0),
                     (12, 34, 56)], dtype=np.uint8)
    img = pal4[rng.integers(0, 4, (20, 30))]
    assert (decode_gif_pixels(encode_gif_rgb(img)) == img).all()
    pal200 = np.stack([np.arange(200) % 256,
                       (np.arange(200) * 7) % 256,
                       (np.arange(200) * 13) % 256],
                      axis=1).astype(np.uint8)
    img = pal200[rng.integers(0, 200, (64, 64))]
    payload = encode_gif_rgb(img)
    assert (decode_gif_pixels(payload) == img).all()
    # the structure parser and intake audit agree on the same bytes
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_gif_structure, decode_media,
    )
    d = decode_gif_structure(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (64, 64, 1)
    assert decode_media(payload)["mime"] == "image/gif"


def test_gif_pixel_typed_refusals():
    import struct as _st

    import numpy as np
    import pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_gif_pixels, encode_gif_rgb,
    )
    img = np.full((4, 4, 3), 9, dtype=np.uint8)
    # interlace is no longer a refusal (r13): a solid image decodes
    # identically whichever row order the flag declares
    payload = bytearray(encode_gif_rgb(img))
    i = payload.index(b"\x2c")
    payload[i + 9] |= 0x40
    assert (decode_gif_pixels(bytes(payload)) == img).all()
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(encode_gif_rgb(img))[:20])
    # >256 colors is a typed encoder refusal
    big = np.zeros((17, 16, 3), dtype=np.uint8)
    big[:, :, 0] = np.arange(17 * 16).reshape(17, 16) % 256
    big[:, :, 1] = np.arange(17 * 16).reshape(17, 16) // 256
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif_rgb(big)


def test_synth_gif_inventory_matches_oracle(spark):
    import duckdb

    from data_ingestion_challenge_spark.operators.multimodal import (
        SYNTH_GIF_INVENTORY_ORACLE, synth_gif_inventory,
    )
    from tests.conftest import SF_DIR
    from tests.test_r9_candidates import _compare

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF_DIR}/documents.parquet'")
    rows = _compare(synth_gif_inventory(docs), con,
                    SYNTH_GIF_INVENTORY_ORACLE)
    assert len(rows) == docs.count()


def test_gif_lzw_stream_without_leading_clear():
    """A spec-legal stream may start directly with data codes (the
    leading Clear is conventional, not mandatory): the decoder must
    begin from the post-clear table state, not crash."""
    from data_ingestion_challenge_spark.operators.multimodal import (
        _lzw_decode, _lzw_encode,
    )
    mcs = 2                       # clear=4, eoi=5, width starts at 3
    # hand-pack codes [1, 2, 6, 5]: after (1),(2) the table holds
    # entry 6=(1,2); code 6 emits it; 5 = EOI.  LSB-first packing,
    # width grows 3→4 once the table reaches 7 entries (after the
    # second code), so codes 6 and 5 are 4 bits wide.
    bits = []
    for code, width in ((1, 3), (2, 3), (6, 4), (5, 4)):
        for k in range(width):
            bits.append((code >> k) & 1)
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << j
        data.append(b)
    assert _lzw_decode(bytes(data), mcs) == [1, 2, 1, 2]
    # and the encoder's own output still round-trips unchanged
    idx = [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 1, 1]
    assert _lzw_decode(_lzw_encode(idx, mcs), mcs) == idx


# ---------------------------------------------------------------
# r13 codec widening: PNG palette / 16-bit / alpha / Adam7,
# interlaced GIF, MP4 structure parse.
# ---------------------------------------------------------------


def _rng_img(shape, seed=7, dtype="uint8"):
    import numpy as np
    rng = np.random.RandomState(seed)
    hi = 65536 if dtype == "uint16" else 256
    return rng.randint(0, hi, size=shape).astype(dtype)


def test_png_rgba_and_gray_alpha_roundtrip():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png_pixels, encode_png,
    )
    for ch in (2, 4):
        img = _rng_img((9, 7, ch), seed=ch)
        for f in range(5):
            dec = decode_png_pixels(encode_png(img, filter_type=f))
            assert dec.shape == img.shape and dec.dtype == np.uint8
            assert (dec == img).all(), (ch, f)


def test_png_16bit_roundtrip_all_filters():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png, decode_png_pixels, encode_png,
    )
    gray = _rng_img((6, 11), seed=1, dtype="uint16")
    rgb = _rng_img((5, 8, 3), seed=2, dtype="uint16")
    for img in (gray, rgb):
        for f in range(5):
            dec = decode_png_pixels(encode_png(img, filter_type=f))
            assert dec.dtype == np.uint16
            assert (dec == img).all(), f
    # stat wrapper reports the high byte on the 0-255 scale
    d = decode_png(encode_png(np.full((4, 4), 0xAB00,
                                      dtype=np.uint16)))
    assert d["pcm_rms"] == 0xAB


def test_png_palette_roundtrip():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png_pixels, encode_png,
    )
    img = (_rng_img((10, 13, 3), seed=3) // 64) * 64  # ≤64 colors
    for f in range(5):
        dec = decode_png_pixels(encode_png(img, filter_type=f,
                                           palette=True))
        assert dec.shape == img.shape and (dec == img).all(), f


def test_png_adam7_interlace_roundtrip():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png_pixels, encode_png,
    )
    # dims straddle the 8x8 pass grid (odd, < 8, and > 8 in each
    # axis) so empty and partial passes are all exercised
    for shape in ((3, 5, 3), (16, 16), (13, 9, 3), (1, 1), (7, 21)):
        img = _rng_img(shape, seed=sum(shape))
        for f in (0, 1, 4):
            dec = decode_png_pixels(encode_png(img, filter_type=f,
                                               interlace=True))
            assert dec.shape == img.shape and (dec == img).all()
    # 16-bit + palette both compose with interlacing
    img16 = _rng_img((9, 6), seed=11, dtype="uint16")
    assert (decode_png_pixels(encode_png(img16, interlace=True))
            == img16).all()
    imgp = (_rng_img((11, 4, 3), seed=12) // 32) * 32
    assert (decode_png_pixels(encode_png(imgp, palette=True,
                                         interlace=True))
            == imgp).all()


def test_png_sub8bit_gray_roundtrips():
    """1/2/4-bit grayscale (and packed palette) decode natively since
    late r13: MSB-first bit unpacking, byte-unit filtering, exact
    presentation-grid scaling."""
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png_pixels, encode_png,
    )
    rng = np.random.RandomState(8)
    for d in (1, 2, 4):
        scale = 255 // ((1 << d) - 1)
        img = (rng.randint(0, 1 << d, size=(7, 11))
               * scale).astype(np.uint8)
        for f in range(5):
            dec = decode_png_pixels(encode_png(img, filter_type=f,
                                               depth=d))
            assert (dec == img).all(), (d, f)
        assert (decode_png_pixels(encode_png(img, depth=d,
                                             interlace=True))
                == img).all(), d
        # packed palette at the same depth
        pal = rng.randint(0, 256, size=(1 << d, 3)).astype(np.uint8)
        pimg = pal[rng.randint(0, 1 << d, size=(9, 6))]
        assert (decode_png_pixels(encode_png(pimg, palette=True,
                                             depth=d))
                == pimg).all(), d


def test_gif_interlaced_roundtrip():
    import numpy as np

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_gif_pixels, encode_gif_rgb,
    )
    for h, w in ((1, 3), (4, 5), (8, 2), (13, 7), (29, 3)):
        img = ((_rng_img((h, w, 3), seed=h * w) // 32) * 32)
        plain = decode_gif_pixels(encode_gif_rgb(img))
        inter = decode_gif_pixels(encode_gif_rgb(img,
                                                 interlace=True))
        assert (plain == img).all()
        assert (inter == img).all(), (h, w)


def test_mp4_structure_parse_roundtrip():
    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_media, decode_mp4_structure, decode_real,
        encode_mp4_skeleton,
    )
    p = encode_mp4_skeleton(640, 360, duration=7200, timescale=600,
                            n_tracks=2)
    d = decode_mp4_structure(p)
    assert d == {"mime": "video/mp4", "n_frames": 7200, "rate": 600,
                 "channels": 2, "width": 640, "height": 360,
                 "pcm_rms": None}
    assert decode_real(p) == (len(p), 7200)
    assert decode_media(p)["mime"] == "video/mp4"


def test_mp4_garbage_and_truncation_raise():
    import pytest as _pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_mp4_structure, encode_mp4_skeleton,
    )
    with _pytest.raises(ValueError, match="not an ISO-BMFF"):
        decode_mp4_structure(b"\x00" * 16)
    p = encode_mp4_skeleton(64, 48, duration=10)
    with _pytest.raises(ValueError):
        decode_mp4_structure(p[:20])       # moov gone -> no mvhd


def test_png_palette_index_beyond_plte_is_typed():
    import pytest as _pytest

    from data_ingestion_challenge_spark.operators.multimodal import (
        decode_png_pixels, encode_png,
    )
    img = (_rng_img((4, 4, 3), seed=5) // 64) * 64
    payload = bytearray(encode_png(img, palette=True))
    # corrupt the PLTE length down to 1 entry (3 bytes), keeping the
    # chunk framing valid: rebuild with a truncated palette
    i = payload.index(b"PLTE")
    size = int.from_bytes(payload[i - 4:i], "big")
    import struct as _st
    import zlib as _zl
    body = payload[i + 4:i + 4 + 3]     # keep first color only
    new_chunk = (_st.pack(">I", 3) + b"PLTE" + body
                 + _st.pack(">I", _zl.crc32(b"PLTE" + bytes(body))))
    rebuilt = (bytes(payload[:i - 4]) + new_chunk
               + bytes(payload[i + 8 + size:]))
    with _pytest.raises(ValueError, match="beyond PLTE"):
        decode_png_pixels(rebuilt)
