"""Confluent-framed Avro values + a local schema registry.

Reference parity: services/kafka_event_publisher.py:1-55 publishes
with confluent-kafka's ``AvroSerializer``, whose wire format is the
Confluent framing — one magic byte ``0x00``, a 4-byte big-endian
schema id assigned by the Schema Registry for subject
``{topic}-value``, then the Avro binary body — and
``get_serializer`` fetches/caches the subject's latest schema. The
consumer side reads the id off every message and decodes with THAT
writer schema resolved against its own reader. Re-expressed
Spark-first:

- the FRAME is pure built-in column algebra over binary
  (concat / substring / hex / unhex — whole-stage codegen, no UDF):
  ``frame_value`` / ``confluent_schema_id`` / ``confluent_body``;
- the REGISTRY is a deterministic in-repo client over the mirrored
  ``.avsc`` fixtures (no network in this sandbox): subjects are
  ``{topic}-value``, ids assigned in sorted-subject order — the
  lookup surface of ``SchemaRegistryClient.get_latest_version``. A
  networked deployment swaps this class for a real client; the
  column-level framing and the dispatch below are unchanged;
- ``decode_confluent`` dispatches frames on their schema id and
  decodes each id-group with its writer schema resolved against the
  caller's reader (sources/avro_io.py) — the schema-evolution
  consumer semantics. The dispatch is one filter+decode per DISTINCT
  id present, unioned: ids are bounded by the registry (a handful),
  rows are not — so the only driver-side collect is over that
  bounded distinct-id set, never the data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from last_minute_legends_spark.sources.avro_io import decode_avro, load_schema

CONFLUENT_MAGIC = b"\x00"

#: the reference's 7 per-topic registry contracts
#: (/root/reference/schemas/*.avsc), mirrored as in-repo fixtures.
REFERENCE_TOPICS = (
    "added_to_cart",
    "checkout",
    "consumer_registration",
    "item_view",
    "movies_catalog_enriched",
    "sign_in",
    "sign_out",
)


class LocalSchemaRegistry:
    """Deterministic subject → (id, schema) registry over the .avsc
    fixtures. A subject maps to one schema string OR a list of schema
    VERSIONS (the Schema Registry's evolution model: a topic's writers
    drift across versions under one subject, each version getting its
    own global id). Ids are allocated in VERSION-MAJOR order: every
    subject's v1 first (sorted by subject), then every v2, and so on —
    so adding a LATER version to one subject appends new ids without
    renumbering any id a previously persisted frame was written with
    (sequential (subject, version) numbering would shift every later
    subject's ids, and old frames would then silently decode against
    the wrong writer schema). With single-version subjects this
    reduces to the legacy sorted-subject numbering. Ids are still only
    stable for a fixed SUBJECT set: adding a new subject shifts the
    v1 block, so frames must never be compared across registries with
    different subject sets — a real Schema Registry's ids are global
    and persistent for exactly this reason."""

    def __init__(self, subjects: dict[str, str | list[str]] | None = None):
        if subjects is None:
            subjects = {f"{t}-value": load_schema(t) for t in REFERENCE_TOPICS}
        self._versions: dict[str, list[str]] = {
            s: (list(v) if isinstance(v, (list, tuple)) else [v])
            for s, v in sorted(subjects.items())
        }
        self._schema_of_id: dict[int, str] = {}
        self._subject_of: dict[int, str] = {}
        self._ids_of: dict[str, list[int]] = {}
        next_id = 1
        max_versions = max((len(v) for v in self._versions.values()),
                           default=0)
        for vi in range(max_versions):
            for s, schemas in self._versions.items():
                if vi >= len(schemas):
                    continue
                self._schema_of_id[next_id] = schemas[vi]
                self._subject_of[next_id] = s
                self._ids_of.setdefault(s, []).append(next_id)
                next_id += 1

    def subjects(self) -> list[str]:
        return list(self._versions)

    def id_for(self, subject: str) -> int:
        """The LATEST version's id for ``subject``."""
        if subject not in self._ids_of:
            raise KeyError(f"subject {subject!r} not registered "
                           f"(have: {', '.join(self._versions)})")
        return self._ids_of[subject][-1]

    def latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_str) — ``get_latest_version`` shape."""
        return self.id_for(subject), self._versions[subject][-1]

    def version(self, subject: str, n: int) -> tuple[int, str]:
        """(schema_id, schema_str) for the subject's 1-based version
        ``n`` — ``get_version`` shape."""
        self.id_for(subject)
        vs = self._versions[subject]
        if not 1 <= n <= len(vs):
            raise KeyError(f"subject {subject!r} has versions "
                           f"1..{len(vs)}, not {n}")
        return self._ids_of[subject][n - 1], vs[n - 1]

    def schema_by_id(self, schema_id: int) -> str:
        if schema_id not in self._subject_of:
            raise KeyError(
                f"schema id {schema_id} not in the registry (have ids "
                f"{sorted(self._subject_of)}); a consumer must fail loudly "
                "on an unknown writer rather than misdecode")
        return self._schema_of_id[schema_id]

    def subject_by_id(self, schema_id: int) -> str:
        self.schema_by_id(schema_id)
        return self._subject_of[schema_id]


def frame_value(value: Column, schema_id: int | Column) -> Column:
    """Confluent-frame an Avro binary column: 0x00 | int32-BE id |
    body. The id renders via hex → lpad(8) → unhex (4 bytes
    big-endian) — binary concat, all JVM built-ins.

    Ids outside the Confluent int32 range [0, 0x7FFFFFFF] FAIL
    LOUDLY: hex()+lpad(8) would otherwise keep the leftmost 8 hex
    digits, silently truncating an oversized (or negative, which
    hexes to 16 F-digits) id into a frame that decodes as some OTHER
    schema's id. Literal ids raise at plan-build time; column ids get
    a row-level assert_true guard."""
    if isinstance(schema_id, int):
        if not 0 <= schema_id <= 0x7FFFFFFF:
            raise ValueError(
                f"schema id {schema_id} outside the Confluent int32 id "
                "range [0, 2147483647] — refusing to emit a truncated frame")
        sid = F.lit(schema_id)
    else:
        ok = F.assert_true(
            schema_id.cast("long").between(0, 0x7FFFFFFF),
            "schema id outside the Confluent int32 id range "
            "[0, 2147483647] — refusing to emit a truncated frame",
        )
        sid = F.when(ok.isNull(), schema_id)
    id_be = F.unhex(F.lpad(F.hex(sid.cast("long")), 8, "0"))
    return F.concat(F.lit(CONFLUENT_MAGIC), id_be, value)


def confluent_schema_id(value: Column) -> Column:
    """Bytes 2-5 as the big-endian schema id (int column)."""
    return F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("int")


def confluent_body(value: Column, check_magic: bool = True) -> Column:
    """The Avro body (byte 6 onward). With ``check_magic`` the first
    byte must be 0x00 — a non-Confluent value fails the job loudly
    instead of misdecoding from a shifted offset."""
    body = F.substring(value, 6, 2147483647)
    if not check_magic:
        return body
    ok = F.assert_true(
        F.substring(value, 1, 1) == F.lit(CONFLUENT_MAGIC),
        "not a Confluent-framed Avro value (magic byte != 0x00)",
    )
    return F.when(ok.isNull(), body)


def encode_confluent(df: DataFrame, cols: list[str], topic: str,
                     registry: LocalSchemaRegistry) -> DataFrame:
    """struct(cols) → one Confluent-framed (value: binary) column —
    what the reference's producer puts on ``topic`` (the serializer's
    subject is ``{topic}-value``)."""
    from last_minute_legends_spark.sources.avro_io import encode_avro

    sid, schema = registry.latest(f"{topic}-value")
    enc = encode_avro(df, cols, schema)
    return enc.select(frame_value(F.col("value"), sid).alias("value"))


def decode_confluent_topic(raw: DataFrame, registry: LocalSchemaRegistry,
                           topic: str, reader_schema: str | None = None,
                           value_col: str = "value") -> DataFrame:
    """Per-topic Confluent consumer: every frame on ``topic`` must
    carry the subject's registered schema id (a foreign id fails the
    job loudly — the wrong-topic/wrong-version guard), then the body
    decodes with that writer schema, optionally resolved to
    ``reader_schema``. No driver-side collect anywhere, so this works
    UNCHANGED on a streaming DataFrame — it is the consumer loop of a
    single-topic subscriber, while ``decode_confluent`` below is the
    multi-topic (batch) dispatch."""
    sid, writer = registry.latest(f"{topic}-value")
    ok = F.assert_true(
        confluent_schema_id(F.col(value_col)) == F.lit(sid),
        f"frame schema id != {sid} (registered for {topic}-value): "
        "not this topic's writer",
    )
    body = F.when(ok.isNull(), confluent_body(F.col(value_col)))
    return decode_avro(raw.select(body.alias("value")),
                       schema=writer, reader_schema=reader_schema)


def decode_confluent(raw: DataFrame, registry: LocalSchemaRegistry,
                     reader_schema: str,
                     value_col: str = "value") -> DataFrame:
    """Confluent-framed frames (possibly MIXED writers/topics/schema
    VERSIONS) → typed rows in the reader layout, plus ``subject`` and
    ``schema_id`` columns naming each row's writer (two versions of
    one subject share the subject but carry distinct ids — the
    lineage a consumer audits evolution with). Per-id dispatch:
    unframe once, then one decode per distinct schema id present,
    each resolving its writer schema against ``reader_schema``,
    unioned by name. The distinct-id collect is bounded by the
    registry size (ids), never the row count."""
    framed = raw.select(
        confluent_schema_id(F.col(value_col)).alias("_sid"),
        confluent_body(F.col(value_col)).alias("value"),
    )
    ids = sorted(r._sid for r in framed.select("_sid").distinct().collect())
    parts = []
    for sid in ids:
        writer = registry.schema_by_id(sid)  # raises on unknown writer
        part = decode_avro(
            framed.filter(F.col("_sid") == sid).select("value"),
            schema=writer, reader_schema=reader_schema,
        ).withColumn("subject", F.lit(registry.subject_by_id(sid))) \
         .withColumn("schema_id", F.lit(sid))
        parts.append(part)
    if not parts:
        schema_cols = decode_avro(
            framed.limit(0).select("value"),
            schema=reader_schema, reader_schema=reader_schema,
        ).withColumn("subject", F.lit("")) \
         .withColumn("schema_id", F.lit(0))
        return schema_cols
    return reduce(DataFrame.unionByName, parts)
