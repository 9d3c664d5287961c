from __future__ import annotations

import os

import pytest

from data_ingestion_challenge_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    """Attach the `slow` marker from the COMMITTED measured list
    (tests/slow_tests.txt, node ids: the 57 >= ~9 s tests of the r18
    baseline run plus the >= ~2.5 s band of the r18 instrumented gate
    run) instead of scattering decorators over 14 files: pytest.ini
    deselects `slow` by default so the driver's verify command fits
    its window (r17 verdict task 2), while `-m "slow or not slow"`
    runs everything — see pytest.ini for the contract.  The default
    gate KEEPS, regardless of duration: every oracle-parity test,
    every plan-pin test, and the current round's change pins (r18:
    the sharded-layout pins + the screen knob value-identity test).
    A stale id (renamed/removed test) simply stops matching; it
    never errors."""
    try:
        with open(_SLOW_LIST) as fh:
            slow = {ln.strip() for ln in fh
                    if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    for item in items:
        if item.nodeid in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    import os
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cat(spark):
    from data_ingestion_challenge_spark.catalog import Catalog
    return Catalog(spark, SF_DIR)


def plan_string(spark, name: str) -> str:
    """Executed-plan string for a registered query at SF_DIR — the
    shared helper behind the plan-pin modules (test_r12/r13/r15_plans
    carried drifting copies before r15).  Scoped: the spark fixture is
    session-wide, so a leaked metadata length would make later
    plan-string tests order-dependent."""
    from data_ingestion_challenge_spark.plans import QUERIES
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        df = QUERIES[name](spark, SF_DIR)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


@pytest.fixture(scope="module", params=("/root/testdata/sf0.001",
                                        "/root/testdata/sf0.01"))
def sf_pair(request, spark):
    """(Catalog, DuckDB connection) over the SAME SF dir, all ten
    tables registered — the shared oracle-parity fixture the
    candidate-pool test modules use (one definition; the per-file
    copies drifted on their table lists)."""
    import duckdb

    from data_ingestion_challenge_spark.catalog import Catalog
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders",
              "lineitem", "supplier", "customer", "nation", "part",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{request.param}/{t}.parquet'")
    return Catalog(spark, request.param), con
