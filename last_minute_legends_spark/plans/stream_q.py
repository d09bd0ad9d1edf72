"""Streaming + semi-structured ETL queries (SURVEY §2.2 tail).

All three are rows-only entries (non-SQL-expressible): real
Structured Streaming runs and a distributed text-block parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from last_minute_legends_spark.sources.tables import Catalog
from last_minute_legends_spark.sources.text_catalog import (
    compose_item_lines,
    parse_item_blocks,
)


def catalog_text_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-block text lines (rendered from ``part``) → parsed wide
    catalog; re-expresses the reference's Movies.txt batch job
    (/root/reference/services/spark_batch_processor.py:26-73)."""
    lines = compose_item_lines(Catalog(spark, sf_dir).part)
    return parse_item_blocks(lines).orderBy("item_id")


def stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.pipeline import run_windowed_pipeline

    return run_windowed_pipeline(spark, sf_dir)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.sessionize import run_stream_sessionize

    return run_stream_sessionize(spark, sf_dir)


SPARK = {
    "catalog_text_etl": catalog_text_etl,
    "stream_pipeline": stream_pipeline,
    "stream_sessionize": stream_sessionize,
}

SQL = {
    "catalog_text_etl": None,
    "stream_pipeline": None,
    "stream_sessionize": None,
}
