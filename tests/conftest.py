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
