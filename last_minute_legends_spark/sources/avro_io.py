"""Avro wire-format ingestion: JVM spark-avro when present, in-repo
pure-Python binary codec otherwise.

The reference's events are Avro-schema'd on the Kafka topic
(/root/reference/schemas/*.avsc, published by
services/kafka_event_publisher.py via a schema registry). Equivalent
schema fixtures ship in-repo under ``last_minute_legends_spark/schemas/``
(events_wire.avsc for this repo's events table; user_activity.avsc
mirroring the union of the reference's 7 event records) — nothing
reads the reference path at runtime.

``from_avro``/``to_avro`` live in the external spark-avro module, not
the core Spark distribution. ``avro_available()`` probes the
classpath; when the jar is present the builders use the JVM
functions (codegen, fast path). When it is absent they fall back to
the spec-compliant pure-Python binary codec in
``sources/avro_codec.py``, run as Arrow-batched ``mapInPandas`` —
same wire bytes (spec-vector-tested), Python-side speed, so the Avro
path executes and round-trips even in jar-less environments like
this container. ``strict=True`` restores the old raise-if-no-jar
behaviour for callers that must not silently take the slow path.

Usage on a cluster:

    spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-version> ...
    raw = kafka_stream(spark, brokers, topic_bytes)      # value: binary
    events = decode_avro_events(raw_bytes_df, schema=load_schema("events_wire"))

At scale the decode is a narrow map (no shuffle), identical in plan
shape to the JSON ``parse_event_json`` path in sources/streams.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.avro_codec import (
    decode_record,
    decode_record_resolved,
    encode_record,
    parse_fields,
    resolve_schemas,
    spark_ddl,
)

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


# Driver-side engagement log of the pure-Python codec path. The
# Python codec is Arrow-batched but per-RECORD Python inside the
# batch (~6 s on the events_avro_evolution bench cell vs built-ins'
# sub-second — SURVEY §8), so when the JVM spark-avro jar is absent
# it must stay confined to the wire-parity entries that EXIST to
# exercise the wire format. Builders append here at plan-build time;
# tests/test_plans.py::test_no_shuffle_cartesian_or_row_udf asserts
# no other registry entry engages it.
PY_CODEC_USES: list[str] = []


def _encode_avro_py(df: DataFrame, cols: list[str], schema: str) -> DataFrame:
    """Arrow-batched pure-Python Avro encode (jar-less fallback)."""
    PY_CODEC_USES.append("encode")
    fields = parse_fields(schema)
    names = [n for n, _, _ in fields]
    if list(cols) != names:
        raise ValueError(
            f"cols {list(cols)} must match schema field order {names} "
            "(Avro records encode fields in declaration order)"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vals = (
                tuple(None if pd.isna(v) else v for v in row)
                for row in pdf[names].itertuples(index=False)
            )
            yield pd.DataFrame(
                {"value": [encode_record(r, fields) for r in vals]}
            )

    return df.select(*cols).mapInPandas(gen, "value binary")


def _decode_avro_py(raw: DataFrame, schema: str, value_col: str = "value",
                    reader_schema: str | None = None) -> DataFrame:
    """Arrow-batched pure-Python Avro decode (jar-less fallback).
    With ``reader_schema``, each datum is decoded with the WRITER
    schema and resolved into the reader layout per the Avro spec
    (defaults / dropped fields / promotions)."""
    PY_CODEC_USES.append("decode")
    fields = parse_fields(schema)
    if reader_schema is None:
        out_fields = fields

        def decode_one(b: bytes) -> tuple:
            return decode_record(b, fields)
    else:
        wf, actions = resolve_schemas(schema, reader_schema)
        out_fields = parse_fields(reader_schema)

        def decode_one(b: bytes) -> tuple:
            return decode_record_resolved(b, wf, actions)

    names = [n for n, _, _ in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                [decode_one(bytes(b)) for b in pdf[value_col]],
                columns=names,
            )

    return raw.select(value_col).mapInPandas(gen, spark_ddl(out_fields))


def encode_avro(df: DataFrame, cols: list[str], schema: str,
                strict: bool = False) -> DataFrame:
    """struct(cols) → single (value: binary) Avro column — the shape a
    Kafka producer publishes. JVM to_avro when the jar is present;
    pure-Python codec fallback otherwise (strict=True raises instead)."""
    if not avro_available(df.sparkSession):
        if strict:
            raise RuntimeError(_PACKAGES_HINT)
        return _encode_avro_py(df, cols, schema)
    from pyspark.sql.avro.functions import to_avro

    return df.select(to_avro(F.struct(*cols), schema).alias("value"))


def _resolution_projection(decoded: DataFrame, schema: str,
                           reader_schema: str) -> DataFrame:
    """Column-level schema resolution over an already-decoded frame:
    reader-only fields become literal defaults, promotions become
    casts, writer-only columns are pruned. Used after the JVM
    from_avro (which decodes with the writer schema); same resolution
    rules as the codec's datum-level path."""
    _, actions = resolve_schemas(schema, reader_schema)
    out_fields = parse_fields(reader_schema)
    cols = []
    for (name, typ, _), action in zip(out_fields, actions):
        spark_t = {"int": "int", "long": "long", "float": "float",
                   "double": "double", "string": "string",
                   "bytes": "binary", "boolean": "boolean"}[typ]
        if action[0] == "default":
            cols.append(F.lit(action[1]).cast(spark_t).alias(name))
        else:
            cols.append(F.col(name).cast(spark_t).alias(name))
    return decoded.select(*cols)


def decode_avro(raw: DataFrame, schema: str,
                value_col: str = "value", strict: bool = False,
                reader_schema: str | None = None) -> DataFrame:
    """(value: binary) → typed columns per the declared Avro schema —
    the reference's parse stage at its real wire format. JVM from_avro
    when the jar is present; pure-Python codec fallback otherwise
    (strict=True raises instead).

    ``reader_schema``: decode data WRITTEN with ``schema`` into this
    (evolved) layout per the Avro spec's schema-resolution rules —
    the schema-registry consumer semantics (added fields take their
    defaults, removed fields are dropped, numeric/string promotions
    widen). At 100 TB with years of retained topics, drifted writer
    versions are the norm, not the exception."""
    if not avro_available(raw.sparkSession):
        if strict:
            raise RuntimeError(_PACKAGES_HINT)
        return _decode_avro_py(raw, schema, value_col, reader_schema)
    from pyspark.sql.avro.functions import from_avro

    decoded = raw.select(
        from_avro(F.col(value_col), schema).alias("event")
    ).select("event.*")
    if reader_schema is not None:
        decoded = _resolution_projection(decoded, schema, reader_schema)
    return decoded


def decode_avro_events(raw: DataFrame, schema: str | None = None) -> DataFrame:
    """Avro-encoded events wire → the events table layout (ts restored
    from exact epoch micros)."""
    decoded = decode_avro(raw, schema or load_schema("events_wire"))
    return decoded.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
