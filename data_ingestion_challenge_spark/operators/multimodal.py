"""Multimodal column plumbing (SURVEY.md §2C).

Images/audio/video are opaque `binary` payloads + typed metadata.  The
Spark-side machinery is real: binary columns, metadata structs, and
Arrow-batched `mapInPandas` feature extraction with a stable output
schema.  Actual media decoding is STUBBED (no image/audio libs in this
container): `decode_stub` derives deterministic fake features from the
payload bytes, and `decode_real` raises NotImplementedError where a
PIL/ffmpeg call would go.
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
    """Real media decode, bound at import to the available lib:
    images via PIL (returns (n_bytes, n_frames) with n_frames from
    the container's frame count), audio via soundfile (n_frames =
    sample frames).  Raises NotImplementedError when neither lib is
    installed — this container ships none, so the deterministic
    decode_stub carries every registered query."""
    if _PIL_Image is not None:  # pragma: no cover - lib not shipped
        import io
        with _PIL_Image.open(io.BytesIO(payload)) as img:
            return len(payload), getattr(img, "n_frames", 1)
    if _soundfile is not None:  # pragma: no cover - lib not shipped
        import io
        info = _soundfile.info(io.BytesIO(payload))
        return len(payload), int(info.frames)
    raise NotImplementedError(
        "media decode requires PIL/av/soundfile — not available here; "
        "use decode_stub for the deterministic fake path")


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
