"""Query plan registry.  Importing this package registers every query."""

from data_ingestion_challenge_spark.plans.registry import (
    QUERIES, Query, query, queries, oracle_sql,
)

# Import for side effect: each module registers its queries.
from data_ingestion_challenge_spark.plans import tpch      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import tpch2     # noqa: F401,E402
from data_ingestion_challenge_spark.plans import tpch3     # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events    # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events2   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events3   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import llm       # noqa: F401,E402
from data_ingestion_challenge_spark.plans import llm2      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import llm3      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import quality   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import temporal  # noqa: F401,E402
from data_ingestion_challenge_spark.plans import streaming_q  # noqa: F401,E402

__all__ = ["QUERIES", "Query", "query", "queries", "oracle_sql"]
