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
    IntegerType,
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


# Per-event-type declared schemas, field-for-field with the
# reference's Avro records (/root/reference/schemas/*.avsc;
# UserEvents.py:30-118). Every type shares (timestamp, event_name,
# user_id); the extras are type-specific.
_COMMON = [("timestamp", StringType()), ("event_name", StringType()),
           ("user_id", StringType())]


def _typed(extra: list[tuple[str, object]]) -> StructType:
    st = StructType()
    for name, typ in _COMMON + extra:
        st = st.add(name, typ, True)
    return st


# The 6 user-activity event types (share timestamp/event_name/user_id).
USER_EVENT_SCHEMAS: dict[str, StructType] = {
    "consumer_registration": _typed([
        ("age", IntegerType()), ("masked_email", StringType()),
        ("preferred_language", StringType()),
    ]),
    "sign_in": _typed([]),
    "sign_out": _typed([]),
    "item_view": _typed([("item_id", StringType())]),
    "added_to_cart": _typed([("item_id", StringType()),
                             ("cart_id", StringType())]),
    "checkout_to_cart": _typed([("cart_id", StringType()),
                                ("payment_method", StringType())]),
}

# The 7th typed event: the enriched movie-catalog topic — a flat
# record with NO user_id (it describes a catalog item, not a user
# action), field-for-field with
# /root/reference/schemas/movies_catalog_enriched.avsc.
CATALOG_EVENT_NAME = "movie_catalog_enriched"

MOVIE_CATALOG_SCHEMA = (
    StructType()
    .add("timestamp", StringType())
    .add("event_name", StringType())
    .add("movie_id", StringType(), True)
    .add("title", StringType(), True)
    .add("genre", StringType(), True)
    .add("list_price", FloatType(), True)
)

TYPED_EVENT_SCHEMAS: dict[str, StructType] = {
    **USER_EVENT_SCHEMAS,
    CATALOG_EVENT_NAME: MOVIE_CATALOG_SCHEMA,
}

# Deterministic mapping of this repo's generic event_type domain onto
# the reference's typed event names (synthetic but fixed, so the wire
# render and any oracle agree; sign_in stays in the registry even
# though no generic type maps to it — an unseen type simply parses
# zero rows).
EVENT_NAME_MAP = {
    "signup": "consumer_registration",
    "click": "added_to_cart",
    "error": "sign_out",
    "view": "item_view",
    "purchase": "checkout_to_cart",
}

def _union_schema(schemas: dict[str, StructType]) -> StructType:
    """Union of every typed schema's fields, first-seen declaration
    order, every field nullable — the analytics view a consumer of
    all topics sees. Derived from the per-type registry so the union
    can never drift from the per-topic contracts."""
    st = StructType()
    seen: set[str] = set()
    for schema in schemas.values():
        for f in schema.fields:
            if f.name not in seen:
                seen.add(f.name)
                st = st.add(f.name, f.dataType, True)
    return st


TYPED_UNION_SCHEMA = _union_schema(TYPED_EVENT_SCHEMAS)
TYPED_UNION_COLS = tuple(f.name for f in TYPED_UNION_SCHEMA.fields)


def _typed_field_exprs() -> dict[str, object]:
    """The deterministic type-specific field derivations used by the
    wire render (and mirrored by the events_typed_parse oracle SQL):
    engine-portable column math over (event_id, ts, user_id)."""
    return {
        "timestamp": F.unix_micros(F.col("ts")).cast("string"),
        "user_id": F.col("user_id").cast("string"),
        "age": (F.lit(18) + F.pmod(F.col("user_id"), F.lit(78))).cast("int"),
        "masked_email": F.concat(F.lit("user"), F.col("user_id").cast("string"),
                                 F.lit("@masked.com")),
        "preferred_language": F.element_at(
            F.array(F.lit("eng"), F.lit("geo"), F.lit("")),
            (F.pmod(F.col("user_id"), F.lit(3)) + 1).cast("int"),
        ),
        "item_id": (F.pmod(F.col("event_id"), F.lit(200)) + 1).cast("string"),
        "cart_id": F.concat(F.lit("cart-"), F.col("user_id").cast("string")),
        "payment_method": F.element_at(
            F.array(F.lit("card"), F.lit("paypal"), F.lit("apple_pay")),
            (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int"),
        ),
    }


def events_as_typed_json(events: DataFrame) -> DataFrame:
    """events table → (value: string) typed wire records: each row is
    rendered as its mapped reference event type with that type's
    fields only — the per-topic payload shape the reference's
    publisher produces (one Avro schema per topic; here JSON with the
    same field sets).

    Single pass: one CASE over the rendered-per-type to_json structs,
    so the source is scanned ONCE however many event types exist (a
    union of per-type filtered frames would re-scan the fact table
    per type at 100 TB). A per-topic publisher partitions this same
    frame by event_name instead of re-rendering."""
    exprs = _typed_field_exprs()
    name_map = F.create_map(
        *[F.lit(x) for kv in EVENT_NAME_MAP.items() for x in kv]
    )
    ev_name_col = name_map[F.col("event_type")]
    value = None
    for ev_name, schema in USER_EVENT_SCHEMAS.items():
        cols = [
            (F.lit(ev_name) if f.name == "event_name" else exprs[f.name])
            .alias(f.name)
            for f in schema.fields
        ]
        rendered = F.to_json(F.struct(*cols))
        value = (F.when(ev_name_col == ev_name, rendered) if value is None
                 else value.when(ev_name_col == ev_name, rendered))
    return events.select(value.alias("value")).filter(F.col("value").isNotNull())


def parse_typed_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Single-pass typed parse + union view: ONE ``from_json`` with
    the union-of-fields schema parses every payload (absent fields →
    null — already the union-view contract), then a per-column
    ``event_name IN (types that declare it)`` mask keeps field
    placement identical to a strict per-type parse — a stray field in
    a payload whose type doesn't declare it stays null, exactly as if
    that type's own StructType had parsed it. Unknown event names and
    malformed JSON drop, as before.

    The per-type ``TYPED_EVENT_SCHEMAS`` registry remains the
    contract for per-topic streaming consumers (one schema per Kafka
    topic, ≙ the reference's schema-registry layout); this union path
    is the all-topics analytics view. Works on batch and streaming
    frames alike; a narrow map with NO shuffle — and the source is
    scanned ONCE however many event types exist. (The r4 formulation
    unioned one filter+from_json branch per type: k full scans of the
    fact table — the shape that killed it at 100 TB.)"""
    fields_of = {t: {f.name for f in s.fields}
                 for t, s in TYPED_EVENT_SCHEMAS.items()}
    common = set.intersection(*fields_of.values())
    parsed = raw.select(F.from_json(F.col(value_col), TYPED_UNION_SCHEMA).alias("e"))
    cols = []
    for c in TYPED_UNION_COLS:
        if c in common:
            cols.append(F.col(f"e.{c}").alias(c))
        else:
            declaring = sorted(t for t, fs in fields_of.items() if c in fs)
            cols.append(
                F.when(F.col("e.event_name").isin(declaring), F.col(f"e.{c}"))
                .alias(c)
            )
    return (
        parsed.filter(F.col("e.event_name").isin(list(TYPED_EVENT_SCHEMAS)))
        .select(*cols)
    )


def catalog_as_typed_json(part: DataFrame) -> DataFrame:
    """part table (≙ the reference's movie catalog, sources/tables.py
    mapping) → (value: string) wire records of the 7th typed event,
    ``movie_catalog_enriched`` — what the reference's publisher puts
    on the catalog topic (one schema per topic; JSON here with the
    same field set). Deterministic derivations so the wire render and
    any oracle agree: movie_id = p_partkey, title = p_name,
    genre = p_type, list_price = float(p_retailprice), timestamp =
    p_partkey seconds as epoch micros. Single narrow pass, no shuffle."""
    exprs = {
        "timestamp": (F.col("p_partkey").cast("long")
                      * F.lit(1_000_000)).cast("string"),
        "event_name": F.lit(CATALOG_EVENT_NAME),
        "movie_id": F.col("p_partkey").cast("string"),
        "title": F.col("p_name"),
        "genre": F.col("p_type"),
        "list_price": F.col("p_retailprice").cast("float"),
    }
    cols = [exprs[f.name].alias(f.name) for f in MOVIE_CATALOG_SCHEMA.fields]
    return part.select(F.to_json(F.struct(*cols)).alias("value"))


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


# --- Kafka WRITE side (reference's publisher, Spark-first) ---------------
#
# /root/reference/services/kafka_event_publisher.py:42-55 publishes
# each event keyed by user_id to its per-type topic. Spark-first that
# is a (key, value) frame handed to the kafka sink — batch
# ``df.write.format("kafka")`` for backfills, ``writeStream`` for the
# live pipeline. Both builders are construction-gated like
# ``kafka_stream`` (no broker or kafka package in this container).


def events_as_kafka_records(events: DataFrame) -> DataFrame:
    """events table → (key: string, value: string) Kafka producer
    records: key = user_id (the reference's keying — all of a user's
    events land in one partition, preserving per-user order), value =
    the wire JSON. Keyed layout means downstream consumers can
    sessionize without a shuffle."""
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            )
        ).alias("value"),
    )


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka package not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        )


def write_kafka(records: DataFrame, bootstrap_servers: str, topic: str) -> None:
    """Batch-publish a (key, value) frame to a topic — the backfill
    twin of the reference's publisher loop (one distributed write, not
    a driver-side produce-per-row)."""
    _require_kafka(records.sparkSession)
    (records.select("key", "value").write.format("kafka")
     .option("kafka.bootstrap.servers", bootstrap_servers)
     .option("topic", topic)
     .save())


def kafka_sink(records: DataFrame, bootstrap_servers: str, topic: str,
               checkpoint_dir: str):
    """Streaming publish: writeStream → kafka with checkpointing
    (exactly-once to the topic under retries via the checkpoint's
    epoch tracking). Returns the started StreamingQuery."""
    _require_kafka(records.sparkSession)
    return (
        records.select("key", "value").writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
