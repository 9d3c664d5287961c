"""Multimodal column plumbing (SURVEY.md §2C).

Images/audio/video are opaque `binary` payloads + typed metadata.  The
Spark-side machinery is real: binary columns, metadata structs, and
Arrow-batched `mapInPandas` feature extraction with a stable output
schema.  Since r11 decoding is REAL for the stdlib-parseable formats —
WAV (RIFF/PCM) and BMP parse with struct + numpy (decode_wav /
decode_bmp, round-trip tested against generated genuine bytes), and
`media_inventory` runs the sniff-and-decode intake audit as one Arrow
pass.  Formats that genuinely need PIL/ffmpeg (JPEG, PNG, MP4) stay
gated: `decode_stub` is the deterministic fake for those paths and
`decode_real` raises a typed NotImplementedError for them when the
libs are absent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_frames bigint, mime string"
)


def to_binary_table(documents: DataFrame) -> DataFrame:
    """Opaque payload + typed metadata, as a media table would look:
    (doc_id, payload binary, meta struct<mime,n_bytes>)."""
    payload = F.encode(col("text"), "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(F.lit("application/octet-stream").alias("mime"),
                 F.octet_length(payload).cast("bigint").alias("n_bytes"))
        .alias("meta"),
    )


# Import-time probe: real decode binds to whatever media lib is
# present; in this container both probes fail and decode_real stays a
# marked stub.  The registered multimodal queries ALWAYS run
# decode_stub (deterministic, oracle-replayable) — decode_real is the
# production drop-in, exercised by a conditional test that skips when
# the libs are absent (tests/test_operators.py).
try:  # pragma: no cover - lib not shipped here
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None
try:  # pragma: no cover - lib not shipped here
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

HAS_MEDIA_LIBS = _PIL_Image is not None or _soundfile is not None


def decode_real(payload: bytes):
    """Real media decode.  Since r11 WAV and BMP payloads decode for
    REAL with the pure-stdlib parsers below (struct + numpy — this
    container ships both; round-trip tested against generated
    genuine bytes in tests/test_multimodal_real.py); other formats
    bind to PIL/soundfile when present.  Raises NotImplementedError
    only for formats that genuinely need the absent libs (JPEG, PNG,
    MP4, ...) — the registered multimodal queries still run
    decode_stub (deterministic, oracle-replayable)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        d = decode_wav(payload)
        return len(payload), d["n_frames"]
    if payload[:2] == b"BM":
        decode_bmp(payload)  # validates; images are 1 frame
        return len(payload), 1
    if _PIL_Image is not None:  # pragma: no cover - lib not shipped
        import io
        with _PIL_Image.open(io.BytesIO(payload)) as img:
            return len(payload), getattr(img, "n_frames", 1)
    if _soundfile is not None:  # pragma: no cover - lib not shipped
        import io
        info = _soundfile.info(io.BytesIO(payload))
        return len(payload), int(info.frames)
    raise NotImplementedError(
        "decode of this format requires PIL/av/soundfile — not "
        "available here; WAV/BMP decode natively (decode_media), and "
        "decode_stub is the deterministic fake path for the rest")


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': (n_bytes, fake frame count)."""
    n = len(payload)
    return n, n % 7 + 1


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def sample_frames(binary_table: DataFrame, stride: int = 1) -> DataFrame:
    """Frame sampling: one output row per (video, sampled frame) —
    the explode a video pipeline runs before per-frame inference.

    Real plumbing, stubbed decode: frame count comes from decode_stub
    and each 'frame' is a 16-byte payload slice standing in for a
    decoded image; a real build swaps the slice for an av.open() frame
    grab with the SAME schema and batching.  Output fan-out is bounded
    (≤7 frames/doc here; stride caps it in production), so one input
    Arrow batch yields one bounded output batch — no frame buffer
    blow-up."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, n_frames = decode_stub(payload)
                for i in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(bytes(payload[i * 16:(i + 1) * 16]))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(blobs, dtype=object),
            })

    return binary_table.mapInPandas(_frames, FRAME_SCHEMA)


def extract_features(binary_table: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams record batches through Python once — the shape
    a real image-resize / frame-sample UDF would use.  Output schema is
    fixed so downstream plans stay statically typed."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_stub)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": feats.map(lambda t: t[0]).astype("int64"),
                "n_frames": feats.map(lambda t: t[1]).astype("int64"),
                "mime": pdf["meta"].map(lambda m: m["mime"]),
            })

    return binary_table.mapInPandas(_extract, FEATURE_SCHEMA)


# ---------------------------------- REAL stdlib decoders (r11)
#
# "No media libs in the container" was never the whole story: WAV
# (RIFF/PCM) and BMP (BITMAPINFOHEADER) are fully parseable with
# nothing but `struct` + numpy, both of which this container ships.
# These are REAL decoders over REAL bytes — the round-trip tests
# generate genuine WAV/BMP payloads (pure stdlib too) and assert the
# decoded stats equal the generator's parameters — so the multimodal
# gap narrows to the formats that genuinely need PIL/ffmpeg (JPEG,
# PNG, MP4), which stay behind the probe below.

import struct


def encode_wav_pcm16(samples, rate: int, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer for int16 PCM (interleaved if
    multi-channel) — the fixture generator for the real decode
    tests; also handy to materialize synthetic audio columns."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block = 2 * channels
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * block, block, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def encode_bmp24(pixels) -> bytes:
    """Minimal 24-bit BMP writer (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) — the image-side fixture generator."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):          # bottom-up
        row = px[r, :, ::-1].tobytes()      # BGR
        rows += row + b"\x00" * (stride - len(row))
    data = bytes(rows)
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(data), 2835, 2835, 0, 0))
    return hdr + data


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE payload: chunk walk to fmt + data, frame
    count from data size / block align, and the exact integer RMS of
    16-bit PCM samples (deterministic — no float accumulation
    order)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_fmt, channels, rate, _, block, bits = fmt
    n_frames = len(data) // block if block else 0
    rms = None
    if audio_fmt == 1 and bits == 16 and len(data) >= 2:
        s = np.frombuffer(data[:(len(data) // 2) * 2], dtype="<i2")
        rms = int(np.sqrt(np.mean(s.astype(np.int64) ** 2)))
    return {"mime": "audio/wav", "n_frames": int(n_frames),
            "rate": int(rate), "channels": int(channels),
            "width": None, "height": None, "pcm_rms": rms}


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER BMP: dimensions + bpp from the DIB
    header, mean pixel byte (padding excluded) for 24-bit images."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    dib = struct.unpack_from("<I", payload, 14)[0]
    if dib < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    mean_px = None
    if bpp == 24:
        stride = ((w * 3 + 3) // 4) * 4
        rows = []
        for r in range(abs(h)):
            start = offset + r * stride
            rows.append(np.frombuffer(
                payload[start:start + w * 3], dtype=np.uint8))
        if rows:
            mean_px = int(np.concatenate(rows).astype(np.int64).sum()
                          // (abs(h) * w * 3))
    return {"mime": "image/bmp", "n_frames": 1, "rate": None,
            "channels": None, "width": int(w), "height": int(abs(h)),
            "pcm_rms": mean_px}


def decode_media(payload: bytes) -> dict:
    """Sniff-and-decode: REAL stdlib parsers for WAV/BMP; PIL /
    soundfile for other formats when present; anything else (or any
    parse failure) classifies as opaque bytes rather than failing the
    batch — a 100 TB media crawl always contains garbage."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if _PIL_Image is not None:  # pragma: no cover - lib absent
            import io
            with _PIL_Image.open(io.BytesIO(payload)) as img:
                return {"mime": "image/" + (img.format or "?").lower(),
                        "n_frames": getattr(img, "n_frames", 1),
                        "rate": None, "channels": None,
                        "width": img.width, "height": img.height,
                        "pcm_rms": None}
    except Exception:
        pass
    return {"mime": "application/octet-stream", "n_frames": None,
            "rate": None, "channels": None, "width": None,
            "height": None, "pcm_rms": None}


INVENTORY_SCHEMA = ("doc_id bigint, mime string, n_bytes bigint, "
                    "n_frames bigint, rate bigint, channels int, "
                    "width int, height int, pcm_rms bigint")


def media_inventory(binary_table: DataFrame) -> DataFrame:
    """REAL decode over a binary media column: one Arrow-batched
    mapInPandas pass classifying and parsing each payload (WAV/BMP
    genuinely decoded; unknown formats inventoried as opaque) — the
    corpus-intake audit a multimodal pipeline runs first.  Same batch
    shape and schema discipline as extract_features; per-row work is
    header-bounded except the PCM RMS, which is one vectorized numpy
    pass over the payload."""

    def _inv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "mime", "n_bytes",
                                   "n_frames", "rate", "channels",
                                   "width", "height", "pcm_rms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_media(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(payload))
                for k in ("mime", "n_frames", "rate", "channels",
                          "width", "height", "pcm_rms"):
                    out[k].append(d[k])
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "mime": pd.Series(out["mime"], dtype=object),
                "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
                "n_frames": pd.Series(out["n_frames"], dtype="Int64"),
                "rate": pd.Series(out["rate"], dtype="Int64"),
                "channels": pd.Series(out["channels"], dtype="Int32"),
                "width": pd.Series(out["width"], dtype="Int32"),
                "height": pd.Series(out["height"], dtype="Int32"),
                "pcm_rms": pd.Series(out["pcm_rms"], dtype="Int64"),
            })

    return binary_table.mapInPandas(_inv, INVENTORY_SCHEMA)


def synth_wav_inventory(documents: DataFrame) -> DataFrame:
    """The REAL encode→decode path behind an EXACT oracle: per doc,
    synthesize a genuine square-wave WAV (amplitude and frame count
    are closed-form functions of n_chars), run it through the real
    encoder and the real parser inside one Arrow pass, and emit the
    decoded stats.  A square wave's integer RMS is exactly its
    amplitude (every sample² = A²), the byte size is exactly
    44 + 2·frames, so a DuckDB oracle replays the whole round trip
    arithmetically — decode bugs (chunk walk, block align, RMS) land
    as hash mismatches, not just unit-test failures.  This is the
    gateable witness that the WAV path is real, not a stub."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, rates, frames, rms, nbytes = [], [], [], [], []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                amp = int(n_chars) % 1000 * 10
                n = int(n_chars) % 500 + 10
                pcm = np.full(n, amp, dtype="<i2")
                pcm[1::2] = -amp
                payload = encode_wav_pcm16(pcm, rate=8000)
                d = decode_media(payload)  # the REAL parser
                ids.append(doc_id)
                rates.append(d["rate"])
                frames.append(d["n_frames"])
                rms.append(d["pcm_rms"])
                nbytes.append(len(payload))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "rate": pd.Series(rates, dtype="int64"),
                "n_frames": pd.Series(frames, dtype="int64"),
                "pcm_rms": pd.Series(rms, dtype="int64"),
                "n_bytes": pd.Series(nbytes, dtype="int64"),
            })

    return (documents.select("doc_id", "n_chars")
            .mapInPandas(_synth, "doc_id bigint, rate bigint, "
                                 "n_frames bigint, pcm_rms bigint, "
                                 "n_bytes bigint"))


SYNTH_WAV_INVENTORY_ORACLE = """
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS rate,
           CAST(n_chars % 500 + 10 AS BIGINT) AS n_frames,
           CAST(n_chars % 1000 * 10 AS BIGINT) AS pcm_rms,
           CAST(44 + 2 * (n_chars % 500 + 10) AS BIGINT) AS n_bytes
    FROM documents
"""
