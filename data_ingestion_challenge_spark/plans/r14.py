"""Round-14 registrations (SURVEY.md §2B/§2C): the r13-verdict lead
— the second codec-witness trilogy, putting the continuation
sessions' lossless-JPEG (T.81 Annex H), TIFF 6.0 (strips, both byte
orders, PackBits + early-change LZW + predictor), and EXIF APP1
IFD-walk code behind the driver's correctness gate — plus two from
the r14 analytics pool: the engagement-regularity decile histogram
and the discount-band promo rollup.  All five were built and
parity-tested in earlier rounds (tests/test_r18_candidates.py,
tests/test_r14_candidates.py, tests/test_tiff_codec.py); this module
only promotes them into the driver-gated registry.

Parity notes: lossless JPEG and TIFF are LOSSLESS codecs, so the
witnesses use ramp images with genuinely nonzero prediction diffs /
real LZW dictionary churn and the DuckDB oracle states the decoded
pixel SUM in pure closed form; the EXIF witness splices a conforming
APP1 into a real JPEG and the oracle states orientation + make
directly.  The analytics twins are exact-integer (distinct weeks,
datediff//7) and exact-DECIMAL (msum discipline) respectively — no
float crosses an engine boundary unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestion_challenge_spark.catalog import Catalog
from data_ingestion_challenge_spark.operators import multimodal as MM
from data_ingestion_challenge_spark.operators import stats as ST
from data_ingestion_challenge_spark.plans.registry import query

# ------------------------------------ lossless-JPEG codec witness


@query(
    "synth_jpeg_lossless_inventory",
    # Gates the T.81 Annex-H predictive codec: horizontal-ramp
    # images (nonzero diffs at every step) cycled through ALL seven
    # Annex-H predictors and both frame precisions (8-bit, 16-bit
    # via x257) per doc (operators/jpeg_lossless.py).
    oracle=MM.SYNTH_JPEG_LOSSLESS_INVENTORY_ORACLE,
)
def synth_jpeg_lossless_inventory(cat: Catalog) -> DataFrame:
    """One Arrow pass over (doc_id, n_chars) only — encode and
    decode stay inside the batch, no image bytes ever shuffle; a
    prediction / magnitude-extension / mod-2**16 / Huffman bug is a
    driver hash mismatch, not just a unit-test failure."""
    return MM.synth_jpeg_lossless_inventory(cat.documents)


# --------------------------------------------- TIFF codec witness


@query(
    "synth_tiff_inventory",
    # Gates the TIFF 6.0 strip codec: vertical-ramp grayscale,
    # all three compressions (none / early-change LZW+predictor /
    # PackBits), both byte orders, varying rows_per_strip
    # (operators/tiff_codec.py).
    oracle=MM.SYNTH_TIFF_INVENTORY_ORACLE,
)
def synth_tiff_inventory(cat: Catalog) -> DataFrame:
    """One Arrow pass; n%3 cycles the compression lane so ONE
    closed form gates all three every row; an IFD-walk / strip /
    LZW / PackBits / predictor bug is a driver hash mismatch."""
    return MM.synth_tiff_inventory(cat.documents)


# --------------------------------------------- EXIF parse witness


@query(
    "synth_exif_inventory",
    # Gates the EXIF APP1 IFD walker: a conforming APP1 (embedded
    # TIFF IFD, byte order cycling by doc) spliced into a real JPEG
    # and parsed back (operators/tiff_codec.py build_exif_app1 /
    # parse_exif, the production op being exif_features).
    oracle=MM.SYNTH_EXIF_INVENTORY_ORACLE,
)
def synth_exif_inventory(cat: Catalog) -> DataFrame:
    """One Arrow pass; orientation and camera make are doc-derived
    closed forms, so an APP1-walk / byte-order / inline-vs-offset
    value bug lands as a driver hash mismatch."""
    return MM.synth_exif_inventory(cat.documents)


# ----------------------------------------- engagement regularity


@query(
    "user_weekly_regularity",
    # Share of active weeks over each user's first→last span, cut
    # into integer deciles — the retention-shape readout
    # (operators/stats.py:user_weekly_regularity).
    oracle=ST.USER_WEEKLY_REGULARITY_ORACLE,
)
def user_weekly_regularity(cat: Catalog) -> DataFrame:
    """One map-side-combined distinct over (user, week), one
    groupBy(user), one tiny groupBy(decile); exact integer
    arithmetic end to end (datediff//7 spans, integer div)."""
    return ST.user_weekly_regularity(cat.events)


# -------------------------------------------- discount-band promo


@query(
    "discount_band_revenue",
    # Revenue/volume by integer discount band — the
    # promo-effectiveness rollup behind q14/q19's point predicates
    # (operators/stats.py:discount_band_revenue).
    oracle=ST.DISCOUNT_BAND_REVENUE_ORACLE,
)
def discount_band_revenue(cat: Catalog) -> DataFrame:
    """ONE map-side-combined groupBy collapsing lineitem into
    ≤ ~101 band rows; revenue rides the q1 exact-DECIMAL msum
    discipline (partition-order independent)."""
    return ST.discount_band_revenue(cat.lineitem)
