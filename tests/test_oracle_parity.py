"""Local replica of the driver's t2 correctness gate: every query with
an oracle runs on Spark AND DuckDB at sf0.001 and must match on row
count + column names + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

from data_ingestion_challenge_spark.catalog import TABLES
from data_ingestion_challenge_spark.plans import QUERIES

from tests.conftest import SF_DIR


_CON = None

def _duck():
    global _CON
    if _CON is None:
        _CON = duckdb.connect()
        for t in TABLES:
            _CON.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return _CON


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLED = [q for q in QUERIES.values() if q.oracle]


@pytest.mark.parametrize("q", ORACLED, ids=[q.name for q in ORACLED])
def test_oracle_emits_no_hugeint(q):
    """DuckDB sum() over integers returns HUGEINT (int128); the driver's
    value-hasher distinguishes it from Spark's int64 even when every
    value is equal (r1: q12/q2/q20 failed on exactly this).  Every
    integer sum in oracle SQL must be CAST(... AS BIGINT) — including
    window sums surfaced as output columns."""
    types = [str(t) for t in _duck().sql(q.oracle).types]
    assert not any("HUGEINT" in t or "INT128" in t for t in types), (
        f"{q.name}: oracle emits {types}")


@pytest.mark.parametrize("q", ORACLED, ids=[q.name for q in ORACLED])
def test_matches_oracle(q, spark):
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = _duck().sql(q.oracle)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{q.name}: column names differ"
    assert len(srows) == len(drows), f"{q.name}: row count {len(srows)} != {len(drows)}"
    assert _rowset(srows, scols) == _rowset(drows, dcols), f"{q.name}: values differ"
