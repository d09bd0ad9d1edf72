"""last_minute_legends_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the `Gugizm/last_minute_legends`
consumer-segmentation pipeline (Kafka + Spark + Snowflake), extended
with the operators a large-scale LLM-training-data pipeline needs
(dedup, similarity search, multimodal columns, text analysis).

Design rules (see SURVEY.md §6):
- DataFrame/SQL API only; Catalyst plans everything.
- No row-at-a-time Python UDFs; Pandas/Arrow batches where Python is
  unavoidable (multimodal decode only).
- Dims broadcast, facts shuffle on keys, AQE on.
"""

from last_minute_legends_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
