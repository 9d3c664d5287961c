from __future__ import annotations

import pytest

from data_ingestion_challenge_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


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
