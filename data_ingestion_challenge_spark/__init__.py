"""PySpark-native analytics engine with the query/data-processing
capabilities of GlenDC/data-ingestion-challenge (event-ingestion
analytics), extended with LLM-training-data pipeline operators.

Everything is expressed as declarative DataFrame plans so Catalyst
handles pushdown, pruning, and join strategy; see SURVEY.md §3.
"""

from data_ingestion_challenge_spark.session import get_spark
from data_ingestion_challenge_spark.catalog import Catalog, TABLES

__all__ = ["Engine", "get_spark", "Catalog", "TABLES"]


def __getattr__(name):
    # Lazy: api imports the full plan registry, which pulls in every
    # plan module — only pay that on first use of Engine.
    if name == "Engine":
        from data_ingestion_challenge_spark.api import Engine
        return Engine
    raise AttributeError(name)
