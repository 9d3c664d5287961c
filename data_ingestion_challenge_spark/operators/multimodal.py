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


def decode_real(payload: bytes):  # pragma: no cover - documented stub
    """Where the real decoder goes (PIL.Image.open / av.open / soundfile).
    The container ships no media libraries, so this is a marked stub."""
    raise NotImplementedError(
        "media decode requires PIL/av/soundfile — not available here; "
        "use decode_stub for the deterministic fake path")


def decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': (n_bytes, fake frame count)."""
    n = len(payload)
    return n, n % 7 + 1


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
