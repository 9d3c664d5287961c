"""PySpark-native analytics engine with the query/data-processing
capabilities of GlenDC/data-ingestion-challenge (event-ingestion
analytics), extended with LLM-training-data pipeline operators.

Everything is expressed as declarative DataFrame plans so Catalyst
handles pushdown, pruning, and join strategy; see SURVEY.md §3.
"""

from data_ingestion_challenge_spark.session import get_spark
from data_ingestion_challenge_spark.catalog import Catalog, TABLES

__all__ = ["get_spark", "Catalog", "TABLES"]
