"""Streaming sources: Kafka builder (gated) + declared-schema JSON parse.

Reference parity: /root/reference/services/spark_streaming_processor.py
:27-36 declares a StructType for the user-activity payload, :44-50
reads ``readStream.format("kafka")`` and parses
``from_json(col("value"), schema)``. This module re-expresses both
pieces Spark-first and decouples them:

- ``kafka_stream``: the Kafka source builder. Needs a broker + the
  spark-sql-kafka package at runtime, so it is construction-only here
  (``kafka_available`` probes for the package without connecting).
- ``USER_ACTIVITY_SCHEMA``: the reference's declared payload schema,
  field-for-field (timestamp/event_name/user_id/item_id/cart_id/
  payment_method/title/genre/list_price — the union of its 7 Avro
  event records, cf. /root/reference/schemas/*.avsc).
- ``EVENTS_WIRE_SCHEMA`` + ``parse_event_json``: the same parse stage
  over THIS repo's events table wire format. The timestamp travels as
  epoch microseconds (exact integer — JSON timestamp strings lose
  sub-millisecond precision and are timezone-ambiguous across
  engines); ``parse_event_json`` restores a proper timestamp column.
- ``events_as_json``: renders the events table into Kafka-value-shaped
  JSON strings — the batch twin of what the reference's publisher
  puts on the topic, used by the file-stream pipeline and the
  ``stream_json_parse`` correctness entry.

At scale the parse is a narrow map over the stream — no shuffle; the
declared schema keeps Catalyst able to prune parsed fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructType,
)

# The reference's declared streaming payload schema, verbatim fields
# (spark_streaming_processor.py:27-36).
USER_ACTIVITY_SCHEMA = (
    StructType()
    .add("timestamp", StringType())
    .add("event_name", StringType())
    .add("user_id", StringType())
    .add("item_id", StringType(), True)
    .add("cart_id", StringType(), True)
    .add("payment_method", StringType(), True)
    .add("title", StringType(), True)
    .add("genre", StringType(), True)
    .add("list_price", FloatType(), True)
)

# Wire schema for this repo's events table: ts as epoch micros (exact
# integer round-trip; JSON string timestamps truncate micros).
EVENTS_WIRE_SCHEMA = (
    StructType()
    .add("event_id", LongType())
    .add("ts_us", LongType())
    .add("user_id", LongType())
    .add("event_type", StringType())
    .add("value", DoubleType())
    .add("props", StringType())
)

EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka package is on the classpath (the
    source can be constructed; a broker is still needed to start)."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — classpath probe only
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(spark: SparkSession, bootstrap_servers: str,
                 topic: str, starting_offsets: str = "earliest") -> DataFrame:
    """Kafka source → raw (value string) stream, parse-ready.

    Mirrors spark_streaming_processor.py:44-50. Raises a clear error
    when the kafka package is absent instead of a deep JVM stack.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka package not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )


def events_as_json(events: DataFrame) -> DataFrame:
    """events table → one-column (value: string) Kafka-value-shaped
    JSON frame; ts serialized as exact epoch micros."""
    return events.select(
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            )
        ).alias("value")
    )


def parse_event_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """The reference's parse stage: string payload → from_json with the
    declared schema → typed columns (works on batch and streaming
    DataFrames alike). Restores ``ts`` from the epoch-micros wire field."""
    parsed = raw.withColumn(
        "event", F.from_json(F.col(value_col), EVENTS_WIRE_SCHEMA)
    )
    return parsed.select(
        F.col("event.event_id").alias("event_id"),
        F.timestamp_micros(F.col("event.ts_us")).alias("ts"),
        F.col("event.user_id").alias("user_id"),
        F.col("event.event_type").alias("event_type"),
        F.col("event.value").alias("value"),
        F.col("event.props").alias("props"),
    )


def parse_user_activity(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """from_json against the reference's USER_ACTIVITY_SCHEMA — the
    exact transformation its streaming job performs."""
    return raw.withColumn(
        "event", F.from_json(F.col(value_col), USER_ACTIVITY_SCHEMA)
    ).select("event.*")


def file_json_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stand-in for the Kafka topic: a directory of JSON
    lines read as an unbounded (value: string) stream — the identical
    downstream plan (parse → watermark → agg) as the Kafka path."""
    return (
        spark.readStream
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .text(path)
        .withColumnRenamed("value", "value")
    )
