"""Streaming + semi-structured ETL queries (SURVEY §2.2 tail).

``stream_json_parse`` is the oracle-checked batch twin of the
reference's Kafka parse stage; the stream_* entries are rows-only
(real Structured Streaming runs) and ``catalog_text_etl`` is the
distributed text-block parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.streams import (
    catalog_as_typed_json,
    events_as_json,
    events_as_typed_json,
    parse_event_json,
    parse_typed_events,
)
from last_minute_legends_spark.sources.tables import (
    Catalog,
    load_table,
    spread_cpu_scan,
)
from last_minute_legends_spark.sources.text_catalog import (
    compose_item_lines,
    parse_item_blocks,
)


def catalog_text_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-block text lines (rendered from ``part``) → parsed wide
    catalog; re-expresses the reference's Movies.txt batch job
    (/root/reference/services/spark_batch_processor.py:26-73).

    Oracle-checked end-to-end: the DuckDB oracle computes the
    expected wide rows DIRECTLY from ``part`` (item_id is the running
    ITEM-marker count over line_no = p_partkey*6+pos, i.e. the
    rank of p_partkey; the price string round-trips to
    round(p_retailprice, 2)), so any infidelity in the render, the
    distributed prefix-sum id assignment, the k=v parse, the pivot,
    or the price extraction hash-mismatches."""
    lines = compose_item_lines(Catalog(spark, sf_dir).part)
    return parse_item_blocks(lines).orderBy("item_id")


CATALOG_TEXT_ETL_SQL = """
SELECT CAST(row_number() OVER (ORDER BY p_partkey) AS BIGINT) AS item_id,
       p_name AS name,
       p_brand AS brand,
       p_type AS type,
       CAST(p_size AS INT) AS size,
       round(p_retailprice, 2) AS price_usd
FROM part
ORDER BY item_id
"""


def stream_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-parse parity, oracle-checked: events rendered to the wire
    JSON shape (≙ the reference publisher's topic values), parsed back
    through the declared-schema ``from_json`` stage
    (/root/reference/services/spark_streaming_processor.py:27-50), then
    aggregated. The oracle computes the same aggregate DIRECTLY from
    the base table, so any round-trip/parse infidelity (types, micros,
    nulls) hash-mismatches."""
    # the JSON render+parse is CPU-bound per row: give the wire
    # pipeline full-core parallelism even off an under-split scan
    events = spread_cpu_scan(spark, Catalog(spark, sf_dir).events)
    parsed = parse_event_json(events_as_json(events))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("props").isNotNull(), 1)).alias("n_props"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .orderBy("event_type")
    )


STREAM_JSON_PARSE_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(props) AS n_props,
       round(sum(value), 2) AS sum_value,
       min(epoch_us(ts)) AS first_us,
       max(epoch_us(ts)) AS last_us
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_typed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed per-event-schema round trip over ALL 7 topics,
    oracle-checked: events are rendered as their mapped reference
    event type's wire record and ``part`` as the
    ``movie_catalog_enriched`` catalog topic (sources/streams.py
    TYPED_EVENT_SCHEMAS ≙ /root/reference/schemas/*.avsc, one schema
    per topic), the combined wire frame is parsed in a SINGLE
    union-schema pass (each source table scanned once — plan-asserted
    in tests/test_plans.py), and the analytics view is aggregated
    over every typed field. The oracle computes the same aggregate
    DIRECTLY from the base tables via the same deterministic field
    derivations — any schema/parse/union infidelity hash-mismatches."""
    cat = Catalog(spark, sf_dir)
    wire = events_as_typed_json(spread_cpu_scan(spark, cat.events)).unionByName(
        catalog_as_typed_json(cat.part)
    )
    parsed = parse_typed_events(wire)
    return (
        parsed.groupBy("event_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.avg("age"), 2).alias("avg_age"),
            F.count("preferred_language").alias("n_lang"),
            F.count_distinct("item_id").alias("n_items"),
            F.count_distinct("cart_id").alias("n_carts"),
            F.count_distinct("payment_method").alias("n_pay"),
            F.count("title").alias("n_titles"),
            F.count_distinct("genre").alias("n_genres"),
            F.round(F.sum("list_price"), 2).alias("sum_price"),
            F.min(F.col("timestamp").cast("long")).alias("first_us"),
        )
        .orderBy("event_name")
    )


EVENTS_TYPED_PARSE_SQL = """
WITH m AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CASE event_type
                WHEN 'signup'   THEN 'consumer_registration'
                WHEN 'click'    THEN 'added_to_cart'
                WHEN 'error'    THEN 'sign_out'
                WHEN 'view'     THEN 'item_view'
                WHEN 'purchase' THEN 'checkout_to_cart'
           END AS event_name,
           NULL AS title, NULL AS genre, CAST(NULL AS REAL) AS list_price
    FROM events
    UNION ALL
    SELECT NULL AS event_id, NULL AS user_id,
           p_partkey * 1000000 AS ts_us,
           'movie_catalog_enriched' AS event_name,
           p_name AS title, p_type AS genre,
           CAST(p_retailprice AS REAL) AS list_price
    FROM part
)
SELECT event_name,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(avg(CASE WHEN event_name = 'consumer_registration'
                      THEN 18 + user_id % 78 END), 2) AS avg_age,
       count(CASE WHEN event_name = 'consumer_registration'
                  THEN 1 END) AS n_lang,
       count(DISTINCT CASE WHEN event_name IN ('item_view', 'added_to_cart')
                           THEN (event_id % 200) + 1 END) AS n_items,
       count(DISTINCT CASE WHEN event_name IN ('added_to_cart', 'checkout_to_cart')
                           THEN user_id END) AS n_carts,
       count(DISTINCT CASE WHEN event_name = 'checkout_to_cart'
                           THEN event_id % 3 END) AS n_pay,
       count(title) AS n_titles,
       count(DISTINCT genre) AS n_genres,
       round(sum(list_price), 2) AS sum_price,
       min(ts_us) AS first_us
FROM m
GROUP BY event_name
ORDER BY event_name
"""


def events_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Avro binary wire (in-repo events_wire.avsc ≙ the
    reference's schema-registry topic payloads) → Confluent frame
    (magic 0x00 + int32-BE registry id, the exact producer layout,
    sources/registry.py) → magic-checked unframe → declared-schema
    decode → aggregate. Uses the JVM spark-avro functions when the
    jar is present, else the spec-vector-tested pure-Python codec
    (sources/avro_codec.py) — either way the real Avro binary wire
    format round-trips, inside the real Confluent envelope. In the
    driver window since r10: EVENTS_AVRO_ROUNDTRIP_SQL computes the
    same aggregate directly from the base table (any encode/frame/
    decode infidelity — types, micros, nulls, a shifted body offset
    — value-mismatches), and tests/test_streaming.py asserts the
    full-table round trip is lossless at the row level."""
    from last_minute_legends_spark.sources.avro_io import (
        decode_avro_events,
        encode_avro,
        load_schema,
    )
    from last_minute_legends_spark.sources.registry import (
        LocalSchemaRegistry,
        confluent_body,
        frame_value,
    )

    events = spread_cpu_scan(spark, Catalog(spark, sf_dir).events).select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props",
    )
    reg = LocalSchemaRegistry({"events-value": load_schema("events_wire")})
    sid, schema = reg.latest("events-value")
    wire = encode_avro(events, list(events.columns), schema)
    framed = wire.select(frame_value(F.col("value"), sid).alias("value"))
    unframed = framed.select(confluent_body(F.col("value")).alias("value"))
    back = decode_avro_events(unframed)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min(F.unix_micros("ts")).alias("first_us"),
        )
        .orderBy("event_type")
    )


def events_avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution consumer, end-to-end at the wire level: the
    events topic carries TWO writer versions under one registry
    subject — even event_ids encode with the v1 schema
    (events_wire), odd ids with the evolved v2 (events_wire_v2: adds
    source_region, drops props, narrows value to float) — each framed
    with its own Confluent id, unioned into one mixed stream, and
    decoded by ``decode_confluent`` resolving EACH writer against the
    v1 READER per the Avro spec: v2's source_region is skipped
    (writer-only), the reader's props fills its null default on v2
    rows, and v2's float value promotes back to double at float32
    precision. The aggregate splits counts by writer ``schema_id``
    and counts surviving props, so the oracle (computed directly from
    the base table with the same parity split and REAL-cast) value-
    mismatches if any resolution rule misfires. Row-level
    lossless-ness of the same path is locked by
    tests/test_streaming.py's evolution round-trip test."""
    from last_minute_legends_spark.sources.avro_io import (
        encode_avro,
        load_schema,
    )
    from last_minute_legends_spark.sources.registry import (
        LocalSchemaRegistry,
        decode_confluent,
        frame_value,
    )

    events = spread_cpu_scan(spark, Catalog(spark, sf_dir).events).select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props",
    )
    reg = LocalSchemaRegistry({
        "events-value": [load_schema("events_wire"),
                         load_schema("events_wire_v2")],
    })
    sid1, v1 = reg.version("events-value", 1)
    sid2, v2 = reg.version("events-value", 2)

    old_rows = events.filter(F.col("event_id") % 2 == 0)
    wire1 = encode_avro(old_rows, list(old_rows.columns), v1).select(
        frame_value(F.col("value"), sid1).alias("value"))

    new_rows = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "ts_us", "user_id", "event_type",
        F.col("value").cast("float").alias("value"),
        F.concat(F.lit("r"), F.pmod("user_id", F.lit(4)).cast("string")
                 ).alias("source_region"),
    )
    wire2 = encode_avro(new_rows, list(new_rows.columns), v2).select(
        frame_value(F.col("value"), sid2).alias("value"))

    mixed = wire1.unionByName(wire2)
    back = decode_confluent(mixed, reg, reader_schema=v1)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("schema_id") == sid1, 1)).alias("n_v1"),
            F.count(F.when(F.col("schema_id") == sid2, 1)).alias("n_v2"),
            F.count("props").alias("n_props"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts_us").alias("first_us"),
        )
        .orderBy("event_type")
    )


EVENTS_AVRO_EVOLUTION_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_v1,
       count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_v2,
       count(CASE WHEN event_id % 2 = 0 THEN props END) AS n_props,
       round(sum(CASE WHEN event_id % 2 = 0 THEN value
                      ELSE CAST(CAST(value AS REAL) AS DOUBLE) END), 2)
           AS sum_value,
       min(epoch_us(ts)) AS first_us
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.pipeline import run_windowed_pipeline

    return run_windowed_pipeline(spark, sf_dir)


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.sessionize import run_stream_sessionize

    return run_stream_sessionize(spark, sf_dir)


def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.pipeline import run_enriched_pipeline

    return run_enriched_pipeline(spark, sf_dir)


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.pipeline import run_dedup_pipeline

    return run_dedup_pipeline(spark, sf_dir)


def simulate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distributed stand-in for the reference's
    driver-loop Kafka simulator (UserActivitySimulator.py) — pure
    hash-derived generation over spark.range, no RNG state, no
    shuffle. sf_dir is unused (the generator IS the source)."""
    from last_minute_legends_spark.sources.simulator import simulate_user_activity

    return simulate_user_activity(spark, n_events=10_000)


def stream_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from last_minute_legends_spark.streaming.curate import run_curation_stream

    return run_curation_stream(spark, sf_dir)


def simulate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live load-generation pipeline: rate-micro-batch source →
    closed-form event generator → per-topic wire JSON → single-scan
    typed parse, run as a real stream and bounded to the first 2000
    events (the batch generator reproduces them exactly —
    parity-tested in tests/test_streaming.py). sf_dir unused."""
    import time as _time

    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity_stream, simulated_as_typed_json,
    )
    from last_minute_legends_spark.sources.streams import parse_typed_events

    sim = simulate_user_activity_stream(spark, rows_per_batch=1000)
    parsed = parse_typed_events(simulated_as_typed_json(sim))
    q = (parsed.writeStream.format("memory").queryName("simulated_events")
         .outputMode("append").start())
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.table("simulated_events").count() >= 2000:
                break
            _time.sleep(0.25)
    finally:
        q.stop()
    return (spark.table("simulated_events")
            .orderBy(F.col("timestamp").cast("long")).limit(2000))



def stream_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → JDBC warehouse landing, run to completion on
    embedded Derby (streaming/pipeline.py run_warehouse_pipeline):
    multi-epoch update-mode aggregate through
    foreachBatch(warehouse_epoch_sink) — per-epoch idempotent append
    log — read back as latest-per-key. The returned view is exactly
    the batch aggregate, so the local oracle is a full value compare
    (STREAM_WAREHOUSE_SQL); per-epoch redelivery idempotence is
    locked by tests/test_streaming.py."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_warehouse_pipeline,
    )

    return run_warehouse_pipeline(spark, sf_dir)


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (view -> purchase per
    user within 2 hours), run to completion on the file-stream
    harness (streaming/pipeline.py run_stream_join_pipeline). The
    row-level output is deterministic — the bounded corpus joins to a
    fixed pair set however micro-batches slice — so unlike the other
    streaming runs this entry carries a FULL value oracle
    (STREAM_STREAM_JOIN_SQL); batch parity vs the identical batch
    plan is locked in tests/test_stream_oracle.py."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_join_pipeline,
    )

    return run_stream_join_pipeline(spark, sf_dir)


CSV_OPTS = {
    "header": "true",
    # Spark's default CSV timestamp format carries MILLIS only — the
    # micros the events table actually holds would silently truncate
    # and the oracle's min(epoch_us(ts)) would value-mismatch
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    # props is JSON: embedded quotes/commas need RFC-4180 quote
    # doubling (escape == quote), not backslash escaping
    "quote": '"',
    "escape": '"',
    # distinguish NULL from empty string on the way back
    "nullValue": "\\N",
}

EVENTS_CSV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                     "event_type string, value double, props string")


def events_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → CSV files → declared-schema read-back → aggregate:
    the text interchange format every external warehouse/export story
    still speaks. The fidelity traps are real and each is handled
    explicitly (CSV_OPTS): micros-precision timestamps (default
    format truncates to millis), JSON props with embedded
    quotes/commas (RFC-4180 quote doubling), NULL-vs-empty-string.
    The oracle computes the same aggregate from the BASE table, so
    any encode/parse infidelity value-mismatches; row-level
    losslessness over the full table is locked in
    tests/test_streaming.py. At scale: CSV scans carry no footer
    stats or column pruning — this entry is the EXPORT/import lane,
    not a storage recommendation (parquet layouts remain the scan
    path)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="llm_spark_csv_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").options(**CSV_OPTS).csv(d)
    back = spark.read.schema(EVENTS_CSV_SCHEMA).options(**CSV_OPTS).csv(d)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.min(F.unix_micros("ts")).alias("first_us"))
        .orderBy("event_type")
    )


def events_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC files → read-back → aggregate: the second
    columnar storage lane (Hive-ecosystem interchange). Same oracle
    shape as the CSV/Avro round-trips — the aggregate recomputed from
    the base table value-mismatches on any type/precision
    infidelity; row-level losslessness locked in tests. ORC keeps
    footer stats + column pruning, so unlike CSV it IS a valid scan
    format; parquet stays the repo's layout default for its
    ecosystem (partition discovery, the epoch sinks, Z-order
    layouts)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="llm_spark_orc_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").orc(d)
    back = spark.read.orc(d)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.min(F.unix_micros("ts")).alias("first_us"))
        .orderBy("event_type")
    )


# same aggregate-from-base shape as EVENTS_AVRO_ROUNDTRIP_SQL: any
# wire infidelity (truncated micros, broken quoting, null/empty
# confusion, a lost row) value-mismatches
EVENTS_CSV_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(epoch_us(ts)) AS first_us
FROM events
GROUP BY event_type
ORDER BY event_type
"""

EVENTS_ORC_ROUNDTRIP_SQL = EVENTS_CSV_ROUNDTRIP_SQL


STREAM_STREAM_JOIN_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS purchase_id,
       epoch_us(v.ts) AS view_us,
       epoch_us(c.ts) AS purchase_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS wait_us
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'purchase'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
ORDER BY view_id, purchase_id
"""


def stream_join_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream inner join under MULTI-BATCH delivery
    (r15, VERDICT r14 #3): the corpus arrives as 6 watermark-ordered
    micro-batches (streaming/pipeline.py stage_events_json_batched),
    so join-state eviction runs MID-CORPUS and per-batch state stays
    bounded at rate × (bound + delay) — the production micro-batch
    regime, and the form the Zipf skew ladder measures
    (tools/scale_bench.py; the one-batch harness wedges a hot key on
    corpus-scale state). Output is identical to the one-batch entry
    (time-range groups are never late; parity test-locked), so it
    carries the SAME full value oracle."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_join_pipeline,
    )

    return run_stream_join_pipeline(spark, sf_dir, n_batches=6)


def stream_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOT-KEY-SAFE stream-join form (r16, VERDICT r15 #3):
    per-user hourly view/purchase COUNTS joined on (user_id, window)
    — two windowed streaming aggregates followed by a stream-stream
    window join (Spark 3.5+ multiple-stateful-operator support), so
    a Zipf-hot user emits O(open windows) rows instead of the
    pair-emitting join's O(views × purchases). Deterministic on the
    bounded corpus → FULL value oracle (STREAM_JOIN_AGG_SQL); batch
    parity vs batch_join_agg_twin and the multi-batch form are
    locked in tests/test_streaming.py; the Zipf ladder rows live in
    tools/scale_bench.py (stream_join_agg_mb)."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_join_agg_pipeline,
    )

    return run_stream_join_agg_pipeline(spark, sf_dir)


# DuckDB twin: time_bucket is epoch-aligned exactly like Spark's
# window(ts, '1 hour').start.
STREAM_JOIN_AGG_SQL = """
WITH v AS (
    SELECT user_id, epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS win_us,
           count(*) AS n_views
    FROM events WHERE event_type = 'view' GROUP BY 1, 2
), p AS (
    SELECT user_id, epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS win_us,
           count(*) AS n_purchases
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT v.user_id, v.win_us, n_views, n_purchases
FROM v JOIN p ON v.user_id = p.user_id AND v.win_us = p.win_us
ORDER BY v.user_id, v.win_us
"""


def stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT-OUTER join (every view ->
    purchases within 2 hours, null-purchase row for views that never
    converted), run to completion on the file-stream harness
    (streaming/pipeline.py run_stream_outer_join_pipeline). The
    semantics under test: unmatched views emit ONLY on
    watermark-driven state eviction (sentinel-advanced), matches emit
    eagerly; late input is best-effort (measured — see
    run_stream_outer_join_pipeline), so the harness delivers all real
    rows on time. Output is deterministic on the bounded corpus, so
    this carries a FULL value oracle (STREAM_OUTER_JOIN_SQL); batch
    parity vs batch_outer_join_twin and the late-view contract are
    locked in tests."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_outer_join_pipeline,
    )

    return run_stream_outer_join_pipeline(spark, sf_dir)


# The purchase-side predicates live in the JOIN condition; filtering
# c.event_type in WHERE would silently turn the outer join inner.
STREAM_OUTER_JOIN_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS purchase_id,
       epoch_us(v.ts) AS view_us,
       epoch_us(c.ts) AS purchase_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS wait_us
FROM events v
LEFT JOIN events c
  ON v.user_id = c.user_id
 AND c.event_type = 'purchase'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
WHERE v.event_type = 'view'
ORDER BY view_id, purchase_id
"""


def stream_partitioned_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming landing into the day-partitioned parquet layout with
    per-epoch dynamic-partition-overwrite idempotence
    (streaming/pipeline.py run_partitioned_landing_pipeline) — the
    r12 Derby epoch sink's semantics on the layout that survives
    100 TB. Returns the landed table's daily rollup, which must equal
    the batch rollup of the base table (full value oracle); per-epoch
    redelivery idempotence and planning-time pruning of the landed
    layout are locked in tests/test_streaming.py."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_partitioned_landing_pipeline,
    )

    return run_partitioned_landing_pipeline(spark, sf_dir)


STREAM_PARTITIONED_LANDING_SQL = """
SELECT epoch_us(date_trunc('day', ts)) AS event_day_us,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


SPARK = {
    "stream_json_parse": stream_json_parse,
    "events_typed_parse": events_typed_parse,
    "catalog_text_etl": catalog_text_etl,
    "events_avro_roundtrip": events_avro_roundtrip,
    "events_csv_roundtrip": events_csv_roundtrip,
    "events_orc_roundtrip": events_orc_roundtrip,
    "events_avro_evolution": events_avro_evolution,
    "stream_pipeline": stream_pipeline,
    "stream_sessionize": stream_sessionize,
    "stream_enrich": stream_enrich,
    "stream_dedup": stream_dedup,
    "stream_curate": stream_curate,
    "simulate_events": simulate_events,
    "simulate_stream": simulate_stream,
    "stream_warehouse": stream_warehouse,
    "stream_stream_join": stream_stream_join,
    "stream_join_multibatch": stream_join_multibatch,
    "stream_join_agg": stream_join_agg,
    "stream_outer_join": stream_outer_join,
    "stream_partitioned_landing": stream_partitioned_landing,
}

# The round-trip entry's aggregate is SQL-expressible directly from
# the base table (like STREAM_JSON_PARSE_SQL: any encode/decode
# infidelity — types, micros, nulls — value-mismatches); r10 promotes
# it into the driver window for its first external value-level check.
EVENTS_AVRO_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(epoch_us(ts)) AS first_us
FROM events
GROUP BY event_type
ORDER BY event_type
"""

SQL = {
    "stream_json_parse": STREAM_JSON_PARSE_SQL,
    "events_typed_parse": EVENTS_TYPED_PARSE_SQL,
    "catalog_text_etl": CATALOG_TEXT_ETL_SQL,
    # r12-new: mixed writer-schema-version consumption through reader
    # resolution, in the gate window for its first external observation
    "events_avro_evolution": EVENTS_AVRO_EVOLUTION_SQL,
    # r14-new wire formats: CSV (micros timestampFormat, RFC-4180
    # quote doubling, explicit nullValue) and ORC round-trips —
    # never observed, so the mechanical rotation windows them
    "events_csv_roundtrip": EVENTS_CSV_ROUNDTRIP_SQL,
    "events_orc_roundtrip": EVENTS_ORC_ROUNDTRIP_SQL,
    # The streaming/simulator runs below are genuinely
    # non-SQL-expressible at the gate (each drives a Structured
    # Streaming pipeline); all were rotated through the window for a
    # round of driver-visible rows confirmation by r10, so r11 parks
    # them outside it. Their value-level checks are the direct DuckDB
    # compares in tests/test_stream_oracle.py.
    "stream_pipeline": None,   # direct DuckDB compare (observed r7)
    "stream_sessionize": None,  # direct DuckDB compare (observed r7)
    "stream_enrich": None,     # direct DuckDB compare (observed r10)
    "stream_dedup": None,      # exactly-once parity + DuckDB compare (r10)
    "stream_curate": None,     # batch parity + DuckDB compare (observed r10)
    "simulate_events": None,  # determinism/integrity + hash-replay (r10)
    "simulate_stream": None,  # batch-parity + LIVE-vs-replay compare (r10)
    # r13-new: unlike the runs above, these two streaming entries have
    # DETERMINISTIC row-level/rollup outputs, so they carry full value
    # oracles — the first streaming entries the driver can hash-check
    "stream_stream_join": STREAM_STREAM_JOIN_SQL,
    # r15: multi-batch delivery, identical deterministic output →
    # the same full value oracle (never observed → windowed)
    "stream_join_multibatch": STREAM_STREAM_JOIN_SQL,
    # r16: the aggregate-push (hot-key-safe) form — deterministic
    # per-(user, window) counts, full value oracle; never observed →
    # the mechanical rotation windows it this round
    "stream_join_agg": STREAM_JOIN_AGG_SQL,
    # r14-new: the left-outer form — deterministic row-level output
    # (eviction-time nulls included), so a full value oracle; never
    # observed, so the mechanical rotation windows it this round
    "stream_outer_join": STREAM_OUTER_JOIN_SQL,
    "stream_partitioned_landing": STREAM_PARTITIONED_LANDING_SQL,
}

# r11: events_avro_roundtrip, driver-hash-green on its first external
# observation (r10), lends its window slot back; the identical
# round-trip value compare runs locally via tests/test_oracle.py.
# r12: the warehouse-landing stream's latest-per-key view IS the batch
# aggregate, so unlike the other stream runs it gets a full local
# value compare (rows-only at the gate: the window is full and the
# entry drives a real Structured Streaming run per call).
STREAM_WAREHOUSE_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""

LOCAL_SQL = {
    "events_avro_roundtrip": EVENTS_AVRO_ROUNDTRIP_SQL,
    "stream_warehouse": STREAM_WAREHOUSE_SQL,
}
