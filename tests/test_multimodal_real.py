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
        with pytest.raises(NotImplementedError):
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
