"""Query plan registry.  Importing this package registers every query."""

from data_ingestion_challenge_spark.plans.registry import (
    QUERIES, Query, query, queries, oracle_sql,
)

# Import for side effect: each module registers its queries.
# Registration ORDER matters: the correctness driver verifies a window of
# queries in registration order, so the novel LLM-pipeline / streaming /
# temporal surface registers first; the TPC-H + events families (already
# driver-verified or gated by the local oracle suite) come after.
from data_ingestion_challenge_spark.plans import llm       # noqa: F401,E402
from data_ingestion_challenge_spark.plans import llm2      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import llm3      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import quality   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import temporal  # noqa: F401,E402
from data_ingestion_challenge_spark.plans import streaming_q  # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events3   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events    # noqa: F401,E402
from data_ingestion_challenge_spark.plans import events2   # noqa: F401,E402
from data_ingestion_challenge_spark.plans import tpch      # noqa: F401,E402
from data_ingestion_challenge_spark.plans import tpch2     # noqa: F401,E402
from data_ingestion_challenge_spark.plans import tpch3     # noqa: F401,E402

__all__ = ["QUERIES", "Query", "query", "queries", "oracle_sql"]
