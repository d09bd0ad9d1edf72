"""Avro wire-format ingestion (gated behind the spark-avro package).

The reference's events are Avro-schema'd on the Kafka topic
(/root/reference/schemas/*.avsc, published by
services/kafka_event_publisher.py via a schema registry). Equivalent
schema fixtures ship in-repo under ``last_minute_legends_spark/schemas/``
(events_wire.avsc for this repo's events table; user_activity.avsc
mirroring the union of the reference's 7 event records) — nothing
reads the reference path at runtime.

``from_avro``/``to_avro`` live in the external spark-avro module, not
the core Spark distribution, so every entry point is gated:
``avro_available()`` probes the classpath, and the builders raise a
clear RuntimeError naming the ``--packages`` coordinate when it is
absent (this container ships without it; the unit test skips).

Usage on a cluster:

    spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-version> ...
    raw = kafka_stream(spark, brokers, topic_bytes)      # value: binary
    events = decode_avro_events(raw_bytes_df, schema=load_schema("events_wire"))

At scale the decode is a narrow map (no shuffle), identical in plan
shape to the JSON ``parse_event_json`` path in sources/streams.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "schemas")

_PACKAGES_HINT = (
    "spark-avro not on the classpath; submit with "
    "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
)


def load_schema(name: str) -> str:
    """Read an in-repo .avsc fixture (e.g. 'events_wire')."""
    with open(os.path.join(SCHEMA_DIR, f"{name}.avsc"), encoding="utf-8") as f:
        return f.read()


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro data source is loadable."""
    try:
        jvm = spark._jvm  # noqa: SLF001 — classpath probe only
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def encode_avro(df: DataFrame, cols: list[str], schema: str) -> DataFrame:
    """struct(cols) → single (value: binary) Avro column — the shape a
    Kafka producer publishes."""
    from pyspark.sql.avro.functions import to_avro

    if not avro_available(df.sparkSession):
        raise RuntimeError(_PACKAGES_HINT)
    return df.select(to_avro(F.struct(*cols), schema).alias("value"))


def decode_avro(raw: DataFrame, schema: str,
                value_col: str = "value") -> DataFrame:
    """(value: binary) → typed columns per the declared Avro schema —
    the reference's parse stage at its real wire format."""
    from pyspark.sql.avro.functions import from_avro

    if not avro_available(raw.sparkSession):
        raise RuntimeError(_PACKAGES_HINT)
    return raw.select(
        from_avro(F.col(value_col), schema).alias("event")
    ).select("event.*")


def decode_avro_events(raw: DataFrame, schema: str | None = None) -> DataFrame:
    """Avro-encoded events wire → the events table layout (ts restored
    from exact epoch micros)."""
    decoded = decode_avro(raw, schema or load_schema("events_wire"))
    return decoded.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
