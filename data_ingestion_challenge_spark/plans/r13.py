"""Round-13 registrations (SURVEY.md §2A/§2B/§2C): the r12-verdict
lead — the PNG/JPEG/GIF codec-witness trilogy, putting the round-12
real media codecs (full PNG inflate+unfilter, baseline JPEG
DCT/Huffman in all three common shapes, GIF two-way LZW) behind the
driver's correctness gate — plus two from the r14 pool: the simhash
Hamming-radius tuning histogram (extends the dedup family) and the
customer purchase-cadence table.  All five were built and
parity-tested in earlier rounds (tests/test_multimodal_real.py,
tests/test_jpeg_codec.py, tests/test_r14_candidates.py); this module
only promotes them into the driver-gated registry.

Parity notes: each codec witness synthesizes GENUINE format bytes per
doc and pixel-decodes them inside one Arrow pass, gated by a pure
closed-form DuckDB oracle (PNG/GIF are lossless so the decoded mean
is the synthesized color; JPEG uses the even-level-shift solid class
that survives the lossy pipeline EXACTLY) — any inflate / unfilter /
Huffman / LZW / bit-packing bug lands as a driver hash mismatch.  The
simhash histogram replays the md5-derived 32-bit sketch bit-exactly
in DuckDB; order gaps are exact integer day diffs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import dedup as D
from data_ingestion_challenge_spark.operators import multimodal as MM
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.plans.llm import (
    _SH_CTE, _shared_postings,
)
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------------ PNG codec witness


@query(
    "synth_png_inventory",
    # Gateable witness that decode_png is a REAL codec: genuine
    # PNG bytes (zlib deflate, scanline filters) synthesized +
    # pixel-decoded per doc, lossless closed-form oracle
    # (operators/multimodal.py:synth_png_inventory).
    oracle=MM.SYNTH_PNG_INVENTORY_ORACLE,
)
def synth_png_inventory(cat: Catalog) -> DataFrame:
    """Linear mapInPandas over (doc_id, n_chars) only — encode and
    decode stay inside the Arrow batch, no image bytes ever shuffle;
    an inflate / unfilter / channel-order bug is a driver hash
    mismatch, not just a unit-test failure."""
    return MM.synth_png_inventory(cat.documents)


# ------------------------------------------ JPEG codec witness


@query(
    "synth_jpeg_inventory",
    # Gates the full baseline JPEG codec in all three shapes
    # (grayscale SOF0, 4:4:4 color, 4:2:0 subsampled) via the
    # even-level-shift solid class that is EXACT through the lossy
    # pipeline (operators/jpeg_codec.py, the spec-conforming zigzag
    # pinned by tests/test_jpeg_codec.py's external fixtures).
    oracle=MM.SYNTH_JPEG_INVENTORY_ORACLE,
)
def synth_jpeg_inventory(cat: Catalog) -> DataFrame:
    """One Arrow pass; n%3 cycles the codec shape so ONE closed form
    gates the grayscale, 4:4:4, and 4:2:0 paths every row; non-8
    multiple dims exercise block padding + crop throughout."""
    return MM.synth_jpeg_inventory(cat.documents)


# ------------------------------------------ GIF codec witness


@query(
    "synth_gif_inventory",
    # Gates the REAL two-way LZW codec (growing code widths, 12-bit
    # clear-reset, KwKwK) — GIF is lossless so the decoded mean byte
    # is exactly floor((r+g+b)/3)
    # (operators/multimodal.py:synth_gif_inventory).
    oracle=MM.SYNTH_GIF_INVENTORY_ORACLE,
)
def synth_gif_inventory(cat: Catalog) -> DataFrame:
    """One Arrow pass per batch: palette build, LZW pack, sub-block
    chunking, then the full pixel decode — a bit-packing or
    dictionary-reset bug lands as a driver hash mismatch."""
    return MM.synth_gif_inventory(cat.documents)


# ------------------------------------------ simhash radius tuning


@query(
    "simhash_hamming_histogram",
    # Hamming-distance histogram of the simhash candidate pairs at
    # radius ≤ 3 — the radius-tuning table read before committing to
    # a max_hamming (operators/dedup.py:simhash_hamming_histogram).
    oracle=D.simhash_hamming_oracle_sql(_SH_CTE),
)
def simhash_hamming_histogram(cat: Catalog) -> DataFrame:
    """Rides simhash_pairs' pigeonhole block join (candidates are an
    equi-join on 8-bit blocks, never all pairs) over the shared
    persisted posting table; output ≤ radius+1 rows."""
    return D.simhash_hamming_histogram(
        cat.documents, n=3, max_hamming=3,
        posting=_shared_postings(cat))


# ------------------------------------------ purchase cadence


@query(
    "customer_order_gap_weeks",
    # Repeat-purchase rhythm histogram: consecutive-order gaps per
    # customer bucketed by week
    # (operators/stats.py:customer_order_gap_weeks).
    oracle=ST.CUSTOMER_ORDER_GAP_WEEKS_ORACLE,
)
def customer_order_gap_weeks(cat: Catalog) -> DataFrame:
    """ONE o_custkey shuffle for the lag window (per-customer
    sequences are short), then a map-side-combined groupBy onto a
    few hundred bucket rows; gaps are exact integer day diffs."""
    return ST.customer_order_gap_weeks(cat.orders)
