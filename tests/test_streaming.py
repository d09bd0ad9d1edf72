"""Streaming + text-catalog ETL tests: real streaming runs via the
file source with processAllAvailable, plus batch/streaming parity."""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def test_event_json_roundtrip_exact(spark, sf_dir):
    """events → wire JSON → from_json parse must be lossless (ids,
    micros-exact timestamps, doubles, null props)."""
    from last_minute_legends_spark.sources.streams import (
        events_as_json, parse_event_json,
    )
    from last_minute_legends_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    back = parse_event_json(events_as_json(events))
    diff = events.exceptAll(back).count() + back.exceptAll(events).count()
    assert diff == 0, f"{diff} rows changed in JSON round-trip"


def test_user_activity_schema_parse(spark):
    """The reference's declared-schema parse: payload fields land
    typed, absent optional fields land NULL, malformed rows null out."""
    from last_minute_legends_spark.sources.streams import parse_user_activity

    raw = spark.createDataFrame(
        [
            ('{"timestamp":"2024-01-01T00:00:00","event_name":"item_view",'
             '"user_id":"u1","item_id":"i9"}',),
            ('{"timestamp":"2024-01-01T00:00:01","event_name":"checkout_to_cart",'
             '"user_id":"u2","cart_id":"c3","payment_method":"card",'
             '"list_price":8.99}',),
            ("not json at all",),
        ],
        "value string",
    )
    rows = parse_user_activity(raw).collect()
    by_user = {r.user_id: r for r in rows}
    assert by_user["u1"].item_id == "i9" and by_user["u1"].cart_id is None
    assert by_user["u2"].payment_method == "card"
    assert abs(by_user["u2"].list_price - 8.99) < 1e-6
    assert sum(1 for r in rows if r.user_id is None) == 1  # malformed → nulls


def test_kafka_builder_gated(spark):
    """kafka_stream either constructs (package present) or raises the
    documented RuntimeError — never a raw JVM stack."""
    from last_minute_legends_spark.sources.streams import (
        kafka_available, kafka_stream,
    )

    if kafka_available(spark):
        df = kafka_stream(spark, "localhost:9092", "t")
        assert df.schema["value"].dataType.typeName() == "string"
    else:
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_stream(spark, "localhost:9092", "t")


def test_kafka_write_side_gated(spark, sf_dir):
    """The producer-record render is real (key = user_id, value = wire
    JSON that parses back losslessly); the kafka write builders either
    construct or raise the documented RuntimeError."""
    from last_minute_legends_spark.sources.streams import (
        events_as_kafka_records, kafka_available, kafka_sink,
        parse_event_json, write_kafka,
    )
    from last_minute_legends_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    recs = events_as_kafka_records(events)
    assert recs.columns == ["key", "value"]
    back = parse_event_json(recs.select("value"))
    assert events.exceptAll(back).count() + back.exceptAll(events).count() == 0
    keyed = recs.withColumn(
        "uid", F.get_json_object("value", "$.user_id")
    ).filter(F.col("uid") != F.col("key"))
    assert keyed.count() == 0, "key != payload user_id"

    if not kafka_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            write_kafka(recs, "localhost:9092", "events")
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_sink(recs, "localhost:9092", "events", "/tmp/ckpt-nope")


def test_warehouse_jdbc_gated(spark, sf_dir):
    """The JDBC warehouse builders either construct (driver jar
    present) or raise the documented RuntimeError — never a deep JVM
    stack; argument validation fires before the classpath gate."""
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.sources.warehouse import (
        jdbc_driver_available, read_warehouse, write_warehouse,
    )

    url = "jdbc:postgresql://localhost:5432/wh"
    drv = "org.postgresql.Driver"
    with pytest.raises(ValueError, match="exactly one"):
        read_warehouse(spark, url, drv)
    with pytest.raises(ValueError, match="exactly one"):
        read_warehouse(spark, url, drv, table="t", query="SELECT 1")
    if not jdbc_driver_available(spark, drv):
        with pytest.raises(RuntimeError, match="JDBC driver"):
            read_warehouse(spark, url, drv, table="t")
        with pytest.raises(RuntimeError, match="JDBC driver"):
            write_warehouse(load_table(spark, sf_dir, "nation"),
                            url, drv, "nation_export")


def test_warehouse_jdbc_executes_on_derby(spark, sf_dir, tmp_path):
    """The JDBC read/write builders EXECUTE end-to-end against the
    Derby embedded driver that ships inside Spark's own jars dir (it
    backs the Hive metastore), not just construct: distributed
    batched INSERT out, then table-mode, pushdown-query-mode, and
    partitioned-range reads back, value-compared against the source.
    ≙ snowflake_query_service.py:14-57 fetch_data/execute_query with
    the executors moving the rows instead of a driver cursor."""
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.sources.warehouse import (
        jdbc_driver_available, read_warehouse, write_warehouse,
    )

    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    # keep derby.log inside the test tmp dir, not the repo — MUST be
    # set before the first Class.forName touches the Derby engine
    # (the availability probe below loads it)
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", str(tmp_path))
    if not jdbc_driver_available(spark, drv):
        pytest.skip("Derby driver not on the classpath")
    url = f"jdbc:derby:{tmp_path}/wh;create=true"

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    write_warehouse(nation, url, drv, "nation_export", mode="overwrite")

    back = read_warehouse(spark, url, drv, table="nation_export")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, nation.collect()))

    # Spark's JDBC writer creates columns quoted (case-exact), while
    # Derby uppercases unquoted identifiers — pushdown SQL written for
    # the warehouse must quote them, same as against Snowflake.
    agg = read_warehouse(
        spark, url, drv,
        query=('SELECT "n_regionkey", COUNT(*) AS "cnt" '
               'FROM nation_export GROUP BY "n_regionkey"'))
    expect = {(r.n_regionkey, r.cnt) for r in nation.groupBy("n_regionkey")
              .agg(F.count("*").alias("cnt")).collect()}
    assert {(r.n_regionkey, r.cnt) for r in agg.collect()} == expect

    part = read_warehouse(
        spark, url, drv, table="nation_export",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        num_partitions=4)
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == nation.count()


def test_confluent_topic_consumer_streams(spark, sf_dir, tmp_path):
    """The per-topic Confluent consumer runs UNCHANGED as a
    structured-streaming plan (no driver-side collect in its path):
    framed Avro frames staged as parquet files ≙ the topic, readStream
    → id-checked unframe → writer-schema decode → memory sink, and
    the streamed rows equal the batch decode of the same frames. A
    foreign schema id on the topic fails the (batch) job loudly."""
    from pyspark.errors import SparkRuntimeException

    from last_minute_legends_spark.sources.avro_io import load_schema
    from last_minute_legends_spark.sources.registry import (
        LocalSchemaRegistry, decode_confluent_topic, encode_confluent,
        frame_value,
    )
    from last_minute_legends_spark.sources.tables import load_table

    reg = LocalSchemaRegistry(
        {"events-value": load_schema("events_wire"),
         "other-value": load_schema("item_view")})
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props").limit(200)
    cols = list(ev.columns)
    frames = encode_confluent(ev, cols, "events", reg)
    frames.write.mode("overwrite").parquet(f"{tmp_path}/topic")

    batch = decode_confluent_topic(
        spark.read.parquet(f"{tmp_path}/topic"), reg, "events")
    expect = sorted(map(tuple, batch.collect()))
    assert len(expect) == 200

    stream = spark.readStream.schema("value binary").parquet(
        f"{tmp_path}/topic")
    out = decode_confluent_topic(stream, reg, "events")
    q = (out.writeStream.format("memory").queryName("confluent_topic")
         .option("checkpointLocation", f"{tmp_path}/ckpt").start())
    try:
        q.processAllAvailable()
        got = sorted(map(tuple, spark.table("confluent_topic").collect()))
    finally:
        q.stop()
    assert got == expect

    # a frame written by another subject's schema id on this topic
    wrong = frames.limit(1).select(
        frame_value(F.substring("value", 6, 2147483647),
                    reg.id_for("other-value")).alias("value"))
    with pytest.raises(SparkRuntimeException, match="not this topic's writer"):
        decode_confluent_topic(wrong, reg, "events").collect()


def test_typed_event_schemas_roundtrip(spark, sf_dir):
    """Per-type render → per-type declared-schema parse → union view:
    row counts per type survive, type-specific fields land typed and
    only on their own type's rows, all six schemas registered."""
    from last_minute_legends_spark.sources.streams import (
        EVENT_NAME_MAP, TYPED_EVENT_SCHEMAS, catalog_as_typed_json,
        events_as_typed_json, parse_typed_events,
    )
    from last_minute_legends_spark.sources.tables import load_table

    assert set(TYPED_EVENT_SCHEMAS) == {
        "consumer_registration", "sign_in", "sign_out", "item_view",
        "added_to_cart", "checkout_to_cart", "movie_catalog_enriched",
    }
    events = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    wire = events_as_typed_json(events).unionByName(catalog_as_typed_json(part))
    parsed = parse_typed_events(wire)
    got = {r.event_name: r.n for r in
           parsed.groupBy("event_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {EVENT_NAME_MAP[r.event_type]: r.n for r in
            events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    want["movie_catalog_enriched"] = part.count()
    assert got == want
    # field placement: ages only on registrations, typed as int
    assert dict(parsed.dtypes)["age"] == "int"
    assert parsed.filter(
        (F.col("event_name") != "consumer_registration") & F.col("age").isNotNull()
    ).count() == 0
    reg = parsed.filter(F.col("event_name") == "consumer_registration")
    assert reg.filter(F.col("age").isNull()).count() == 0
    assert reg.filter(~F.col("masked_email").rlike("^user[0-9]+@masked.com$")).count() == 0
    # 7th type: catalog fields land only on catalog rows, typed float
    assert dict(parsed.dtypes)["list_price"] == "float"
    cat = parsed.filter(F.col("event_name") == "movie_catalog_enriched")
    assert cat.filter(F.col("user_id").isNotNull()).count() == 0
    assert cat.filter(F.col("title").isNull() | F.col("list_price").isNull()
                      ).count() == 0
    assert parsed.filter(
        (F.col("event_name") != "movie_catalog_enriched")
        & F.col("title").isNotNull()
    ).count() == 0


def test_avro_codec_spec_vectors():
    """The pure-Python codec must produce the byte strings the Avro
    specification's own worked examples give — that is what makes its
    wire bytes interoperable with real Avro readers."""
    from last_minute_legends_spark.sources.avro_codec import (
        _zigzag_decode, _zigzag_encode, decode_record, encode_record,
        parse_fields,
    )

    # zigzag table straight from the spec ("Binary encoding" section)
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                    (64, b"\x80\x01")]:
        assert _zigzag_encode(n) == want, n
        assert _zigzag_decode(want, 0) == (n, len(want))

    # record example from the spec: {"a": 27, "b": "foo"} with
    # schema fields (a long, b string) → 36 06 66 6f 6f
    fields = parse_fields(
        '{"type":"record","name":"T","fields":'
        '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    wire = encode_record((27, "foo"), fields)
    assert wire == b"\x36\x06\x66\x6f\x6f"
    assert decode_record(wire, fields) == (27, "foo")

    # null-union branches: ["null","string"]
    nf = parse_fields(
        '{"type":"record","name":"N","fields":'
        '[{"name":"p","type":["null","string"],"default":null}]}'
    )
    assert encode_record((None,), nf) == b"\x00"
    assert encode_record(("x",), nf) == b"\x02\x02x"
    assert decode_record(b"\x00", nf) == (None,)
    assert decode_record(b"\x02\x02x", nf) == ("x",)


def test_avro_schema_resolution_spec_vectors():
    """Reader/writer resolution per the Avro spec: added defaulted
    fields, removed fields, promotions, and the error outcomes."""
    import pytest as _pytest

    from last_minute_legends_spark.sources.avro_codec import (
        decode_record_resolved, encode_record, parse_fields,
        resolve_schemas,
    )

    writer = (
        '{"type":"record","name":"E","fields":['
        '{"name":"a","type":"int"},'
        '{"name":"dropped","type":"string"},'
        '{"name":"p","type":["null","string"],"default":null}]}'
    )
    reader = (
        '{"type":"record","name":"E","fields":['
        '{"name":"a","type":"double"},'                       # int → double
        '{"name":"added","type":"string","default":"backfill"},'
        '{"name":"flag","type":["null","long"],"default":null},'
        '{"name":"p","type":["null","bytes"],"default":null}]}'  # str → bytes
    )
    wf = parse_fields(writer)
    wire = encode_record((7, "gone", "x"), wf)
    wf2, actions = resolve_schemas(writer, reader)
    got = decode_record_resolved(wire, wf2, actions)
    # reader layout: a (promoted), added (default), flag (default), p (promoted)
    assert got == (7.0, "backfill", None, b"x")
    assert isinstance(got[0], float)

    # null union branch survives resolution
    assert decode_record_resolved(
        encode_record((1, "g", None), wf), wf2, actions
    ) == (1.0, "backfill", None, None)

    # error outcomes: no default for a reader-only field; illegal demotion
    with _pytest.raises(ValueError, match="declares no default"):
        resolve_schemas(writer, '{"type":"record","name":"E","fields":'
                                '[{"name":"missing","type":"int"}]}')
    with _pytest.raises(ValueError, match="not promotable"):
        resolve_schemas('{"type":"record","name":"E","fields":'
                        '[{"name":"a","type":"double"}]}',
                        '{"type":"record","name":"E","fields":'
                        '[{"name":"a","type":"int"}]}')


def test_avro_evolved_reader_dataframe(spark, sf_dir):
    """Full-frame evolution: events encoded with the v1 wire schema,
    decoded through decode_avro with an evolved v2 reader — added
    defaulted field, dropped field, widened value column."""
    import json

    from last_minute_legends_spark.sources.avro_io import (
        decode_avro, encode_avro, load_schema,
    )
    from last_minute_legends_spark.sources.tables import load_table

    writer = load_schema("events_wire")
    v2 = json.loads(writer)
    v2["fields"] = [
        f for f in v2["fields"] if f["name"] != "props"  # removed field
    ] + [{"name": "source", "type": "string", "default": "backfill"}]
    reader = json.dumps(v2)

    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props",
    )
    wire = encode_avro(events, list(events.columns), writer)
    evolved = decode_avro(wire, writer, reader_schema=reader)
    assert "props" not in evolved.columns
    assert evolved.filter(F.col("source") != "backfill").count() == 0
    orig = events.select("event_id", "ts_us", "user_id", "event_type", "value")
    back = evolved.drop("source")
    assert orig.exceptAll(back).count() + back.exceptAll(orig).count() == 0


def test_avro_mixed_version_topic_row_level(spark, sf_dir):
    """The events_avro_evolution path at row level: a topic carrying
    TWO writer versions under one registry subject (v1 events_wire;
    v2 adds source_region, drops props, narrows value to float),
    decoded by decode_confluent against the v1 READER. Every
    resolution rule is asserted per row: v2 rows get props = the
    reader default null and value back at float32 precision; v1 rows
    round-trip exactly; schema_id tags each row's true writer while
    both share one subject."""
    from last_minute_legends_spark.sources.avro_io import (
        encode_avro, load_schema,
    )
    from last_minute_legends_spark.sources.registry import (
        LocalSchemaRegistry, decode_confluent, frame_value,
    )
    from last_minute_legends_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props",
    ).limit(500)
    reg = LocalSchemaRegistry({
        "events-value": [load_schema("events_wire"),
                         load_schema("events_wire_v2")],
    })
    sid1, v1 = reg.version("events-value", 1)
    sid2, v2 = reg.version("events-value", 2)
    assert (sid1, sid2) == (1, 2)
    assert reg.latest("events-value") == (sid2, v2)

    old_rows = events.filter(F.col("event_id") % 2 == 0)
    new_rows = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "ts_us", "user_id", "event_type",
        F.col("value").cast("float").alias("value"),
        F.lit("r1").alias("source_region"),
    )
    mixed = encode_avro(old_rows, list(old_rows.columns), v1).select(
        frame_value(F.col("value"), sid1).alias("value")
    ).unionByName(
        encode_avro(new_rows, list(new_rows.columns), v2).select(
            frame_value(F.col("value"), sid2).alias("value"))
    )
    back = decode_confluent(mixed, reg, reader_schema=v1)
    assert "source_region" not in back.columns  # writer-only: skipped
    assert back.select("subject").distinct().collect()[0][0] == "events-value"
    # schema_id splits the rows exactly along the writer parity
    assert (back.filter(F.col("schema_id") == sid2)
            .filter(F.col("event_id") % 2 == 0).count()) == 0
    # v2-written rows: props resolved to the reader default (null)
    assert back.filter(F.col("schema_id") == sid2).filter(
        F.col("props").isNotNull()).count() == 0
    # v1 rows round-trip exactly
    v1_back = back.filter(F.col("schema_id") == sid1).select(*old_rows.columns)
    assert old_rows.exceptAll(v1_back).count() + \
        v1_back.exceptAll(old_rows).count() == 0
    # v2 rows: float32-precision value widened back to double
    v2_expect = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "ts_us", "user_id", "event_type",
        F.col("value").cast("float").cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    v2_back = back.filter(F.col("schema_id") == sid2).select(*old_rows.columns)
    assert v2_expect.exceptAll(v2_back).count() + \
        v2_back.exceptAll(v2_expect).count() == 0


def test_avro_roundtrip(spark, sf_dir):
    """Avro encode/decode round-trip of events through the in-repo
    .avsc fixture — runs on BOTH paths: the JVM spark-avro functions
    when the jar is present, the pure-Python binary codec otherwise
    (never skips)."""
    from last_minute_legends_spark.sources.avro_io import (
        avro_available, decode_avro, decode_avro_events, encode_avro,
        load_schema,
    )
    from last_minute_legends_spark.sources.tables import load_table

    # schema fixtures must parse as valid JSON regardless of the jar
    import json
    assert json.loads(load_schema("events_wire"))["name"] == "EventWire"
    assert json.loads(load_schema("user_activity"))["name"] == "UserActivity"

    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props",
    )
    wire = encode_avro(events, list(events.columns), load_schema("events_wire"))
    back = decode_avro_events(wire)
    orig = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert orig.exceptAll(back).count() + back.exceptAll(orig).count() == 0

    # strict mode restores the gated behaviour when the jar is absent
    if not avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            encode_avro(events, list(events.columns),
                        load_schema("events_wire"), strict=True)
        with pytest.raises(RuntimeError, match="spark-avro"):
            decode_avro(wire, load_schema("events_wire"), strict=True)


def test_catalog_etl_roundtrip(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import catalog_text_etl
    from last_minute_legends_spark.sources.tables import Catalog

    part = Catalog(spark, sf_dir).part
    out = catalog_text_etl(spark, sf_dir)
    assert out.count() == part.count()
    # item ids are the running-sum order = ascending p_partkey order
    joined = (
        out.orderBy("item_id").limit(5).collect(),
        part.orderBy("p_partkey").limit(5).collect(),
    )
    for o, p in zip(*joined):
        assert o.name == p.p_name
        assert o.brand == p.p_brand
        assert o.size == p.p_size
        assert abs(o.price_usd - round(p.p_retailprice, 2)) < 1e-9


def test_block_id_prefix_sum_matches_global_window(spark):
    """The two-phase distributed prefix sum must equal the naive
    single-window running sum."""
    from last_minute_legends_spark.sources.text_catalog import assign_block_ids

    rows = []
    ln = 0
    for item in range(50):
        rows.append((ln, f"ITEM {item}")); ln += 1
        for k in range(3):
            rows.append((ln, f"k{k}=v")); ln += 1
    lines = spark.createDataFrame(rows, "line_no long, line string").repartition(7)
    out = assign_block_ids(lines)
    got = {r.line_no: r.item_id for r in out.collect()}
    expect_item = 0
    for line_no, line in rows:
        if line.startswith("ITEM"):
            expect_item += 1
        assert got[line_no] == expect_item, f"line {line_no}"


def test_stream_pipeline_matches_batch_window(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import stream_pipeline
    from last_minute_legends_spark.plans.events_analytics import events_windowed

    streamed = stream_pipeline(spark, sf_dir)
    batch = events_windowed(spark, sf_dir).select(
        "window_start_us", "event_type", "n_events", "sum_value"
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, f"stream/batch mismatch: {len(s)} vs {len(b)} groups"


def test_stream_enrich_matches_batch(spark, sf_dir):
    """Stream-static enrichment must equal the same join+window
    computed in batch."""
    from last_minute_legends_spark.plans.stream_q import stream_enrich
    from last_minute_legends_spark.sources.tables import load_table

    streamed = stream_enrich(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("user_id"),
                F.col("n_name").alias("nation"))
    )
    batch = (
        ev.join(dim, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "nation")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                "nation", "n_events", "sum_value")
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, f"stream/batch enrich mismatch: {len(s)} vs {len(b)}"


def test_stream_sessionize_matches_batch(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import stream_sessionize
    from last_minute_legends_spark.plans.events_analytics import sessionization

    streamed = stream_sessionize(spark, sf_dir)
    batch = sessionization(spark, sf_dir)
    # identical gap rule → identical session set (start, end, count)
    s = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
         for r in streamed.collect()}
    b = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
         for r in batch.collect()}
    assert s == b, (
        f"streaming sessions != batch sessions: {len(s)} vs {len(b)}; "
        f"only-stream={list(s - b)[:3]} only-batch={list(b - s)[:3]}"
    )


def test_stream_dedup_exactly_once(spark, sf_dir):
    """Redelivered topic (every file delivered twice) through
    dropDuplicatesWithinWatermark must yield each event exactly once
    — row-identical to the batch events table."""
    from last_minute_legends_spark.plans.stream_q import stream_dedup
    from last_minute_legends_spark.sources.tables import load_table

    deduped = stream_dedup(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert deduped.count() == events.count()
    diff = (events.exceptAll(deduped).count()
            + deduped.exceptAll(events).count())
    assert diff == 0, f"{diff} rows differ after exactly-once dedup"


def test_python_state_sessionize_matches_native(spark, sf_dir):
    """The applyInPandasWithState demonstrator must emit exactly the
    sessions the native session_window aggregation emits."""
    from last_minute_legends_spark.streaming.sessionize import (
        run_stream_sessionize, run_stream_sessionize_python_state,
    )

    native = {tuple(r) for r in run_stream_sessionize(spark, sf_dir).collect()}
    python = {tuple(r) for r in
              run_stream_sessionize_python_state(spark, sf_dir).collect()}
    assert native == python, (
        f"native vs python-state mismatch: {len(native)} vs {len(python)}"
    )


def test_stream_curate_matches_batch(spark, sf_dir):
    """In-flight curation must keep exactly the documents the same
    stateless gates keep in batch (language ∧ quality ∧ not
    repetitive ∧ PII-free ∧ not contaminated ∧ not eval)."""
    import pyspark.sql.functions as F

    from last_minute_legends_spark.functions.text import word_shingles
    from last_minute_legends_spark.plans.stream_q import stream_curate
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.streaming.curate import curation_gate

    streamed = {(r.doc_id, r.quality_score)
                for r in stream_curate(spark, sf_dir).collect()}

    docs = load_table(spark, sf_dir, "documents")
    eval_shingles = sorted(
        r.s for r in docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.explode(word_shingles(F.col("text"), 8)).alias("s"))
        .distinct().collect()
    )
    keep, score = curation_gate(eval_shingles, 8)
    batch = {(r.doc_id, r.quality_score)
             for r in docs.filter(F.col("doc_id") % 7 != 0).filter(keep)
             .select("doc_id", score.alias("quality_score")).collect()}
    assert streamed == batch, (
        f"stream kept {len(streamed)} docs, batch kept {len(batch)}"
    )
    assert len(streamed) > 0, "curation stream kept nothing — gates broken"


def test_simulator_deterministic_and_typed(spark):
    """The distributed load generator must be a pure function of the
    row id: identical output across runs AND partitionings, schema
    identical to the typed union view, per-type field sets matching
    USER_EVENT_SCHEMAS exactly."""
    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity,
    )
    from last_minute_legends_spark.sources.streams import (
        TYPED_UNION_SCHEMA, USER_EVENT_SCHEMAS,
    )

    sim = simulate_user_activity(spark, n_events=1200)
    # names+types must match the union view exactly; nullability may
    # be tighter (timestamp/event_name are provably non-null here)
    assert [(f.name, f.dataType) for f in sim.schema.fields] == [
        (f.name, f.dataType) for f in TYPED_UNION_SCHEMA.fields
    ]

    a = sorted(map(tuple, sim.collect()))
    b = sorted(map(tuple, simulate_user_activity(
        spark, n_events=1200).repartition(7).collect()))
    assert a == b, "generator is not deterministic / partition-invariant"

    rows = simulate_user_activity(spark, n_events=1200).collect()
    assert {r.event_name for r in rows} == set(USER_EVENT_SCHEMAS)
    common = {"timestamp", "event_name", "user_id"}
    for r in rows:
        want = {f.name for f in USER_EVENT_SCHEMAS[r.event_name].fields}
        got = {f for f in r.asDict() if r[f] is not None}
        assert common <= got, f"{r.event_name} missing a common field"
        assert got <= want, (
            f"{r.event_name} carries fields outside its schema: {got - want}"
        )


def test_simulator_referential_soundness(spark):
    """Action events may only reference users the simulation has
    already registered (the reference's pick-an-existing-user
    semantics), and minted registration ids never collide."""
    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity,
    )

    rows = simulate_user_activity(spark, n_events=3000).collect()
    rows.sort(key=lambda r: int(r.timestamp))
    registered = set()
    for r in rows:
        if r.event_name == "consumer_registration":
            assert r.user_id not in registered, "minted uid collision"
            registered.add(r.user_id)
        else:
            assert r.user_id in registered, (
                f"{r.event_name} references unregistered user {r.user_id}"
            )


def test_simulator_wire_roundtrip(spark):
    """Simulator → per-topic wire JSON → the existing single-scan
    typed parse must reproduce the simulated union view exactly."""
    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity, simulated_as_typed_json,
    )
    from last_minute_legends_spark.sources.streams import parse_typed_events

    sim = simulate_user_activity(spark, n_events=800)
    back = parse_typed_events(simulated_as_typed_json(sim))
    diff = sim.exceptAll(back).count() + back.exceptAll(sim).count()
    assert diff == 0, f"{diff} rows changed in simulator wire round-trip"


def test_simulator_stream_matches_batch(spark):
    """The rate-source streaming generator must produce EXACTLY the
    batch generator's events: same pure function of the id, so the
    first N streamed rows == simulate_user_activity(N)."""
    import time as _time

    from last_minute_legends_spark.sources.simulator import (
        simulate_user_activity, simulate_user_activity_stream,
    )

    sim = simulate_user_activity_stream(spark, rows_per_batch=500)
    q = (sim.writeStream.format("memory").queryName("sim_stream")
         .outputMode("append").start())
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.table("sim_stream").count() >= 1000:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    streamed = spark.table("sim_stream")
    n = streamed.count()
    assert n >= 1000, f"stream produced only {n} rows in 60s"
    want = {tuple(r) for r in simulate_user_activity(spark, n_events=1000).collect()}
    got = {tuple(r) for r in
           streamed.orderBy(F.col("timestamp").cast("long")).limit(1000).collect()}
    assert got == want, "streamed events diverge from the batch generator"


def test_staged_topic_is_spread_across_files(spark, sf_dir):
    """The staged JSON topic must be defaultParallelism files, not one:
    a micro-batch's partition count IS its file count, so single-file
    staging serializes every batch's from_json parse on one core (the
    regression this locks out re-cost the enrich pipeline 2x)."""
    import glob

    from last_minute_legends_spark.streaming.pipeline import (
        stage_events_json, staged_files,
    )

    staging, max_ts = stage_events_json(spark, sf_dir)
    files = glob.glob(f"{staging}/in/part-*")
    assert len(files) == staged_files(spark), (
        f"staged {len(files)} files; want {staged_files(spark)} "
        "(= first micro-batch's parse parallelism)"
    )
    assert max_ts is not None, "stage must return the real max event ts"


def test_stream_restart_from_checkpoint(spark, sf_dir):
    """Stop/restart recovery: a windowed stream stopped mid-topic and
    restarted from the SAME checkpoint must produce exactly the
    one-continuous-run (= batch) result — no lost windows, no
    duplicated windows. The topic halves are split by event TIME
    (early files, then late files): a restart boundary is also a
    watermark boundary, so data arriving after the restart must be
    younger than the checkpointed watermark to survive append-mode
    semantics — the same constraint a real deployment's replayable
    source ordering provides."""
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.plans.events_analytics import (
        events_windowed,
    )
    from last_minute_legends_spark.sources.streams import (
        events_as_json, file_json_stream, parse_event_json,
    )
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.streaming.pipeline import (
        RESULT_SCHEMA, SENTINEL_TYPE, append_sentinels, staged_files,
    )

    root = tempfile.mkdtemp(prefix="ckpt_restart_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        split = lo + (hi - lo) / 2
        n = staged_files(spark)

        def start_query():
            stream = parse_event_json(
                file_json_stream(spark, f"{root}/in",
                                 max_files_per_trigger=n))
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.round(F.sum("value"), 2).alias("sum_value"))
                .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                        "event_type", "n_events", "sum_value")
            )
            return (
                agg.writeStream.format("parquet")
                .option("path", f"{root}/out")
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .start()
            )

        # phase 1: early half of the topic, then a hard stop
        (events_as_json(ev.filter(F.col("ts") <= F.lit(split)))
         .repartition(n).write.mode("overwrite").text(f"{root}/in"))
        q1 = start_query()
        q1.processAllAvailable()
        q1.stop()

        # phase 2: late half arrives; a NEW query resumes from the
        # SAME checkpoint (file source replays nothing, state store
        # restores the open windows)
        (events_as_json(ev.filter(F.col("ts") > F.lit(split)))
         .repartition(n).write.mode("append").text(f"{root}/in"))
        q2 = start_query()
        q2.processAllAvailable()
        append_sentinels(spark, root, hi, query=q2)
        q2.stop()

        got = {tuple(r) for r in
               spark.read.schema(RESULT_SCHEMA).parquet(f"{root}/out")
               .filter(F.col("event_type") != SENTINEL_TYPE).collect()}
        want = {tuple(r) for r in events_windowed(spark, sf_dir).collect()}
        assert got == want, (
            f"restart diverged from continuous run: lost={want - got} "
            f"dup_or_extra={got - want}"
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_sessionize_restart_from_checkpoint(spark, sf_dir):
    """Session-window state recovery: a native session_window stream
    stopped mid-topic and restarted from the SAME checkpoint must emit
    exactly the continuous-run (= batch) session set. The topic halves
    are split by event TIME, so sessions OPEN at the stop boundary are
    restored from the checkpointed state store and extended by
    phase-2 events — recovered state, not replay, determines their
    start/end/count."""
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.plans.events_analytics import sessionization
    from last_minute_legends_spark.sources.streams import (
        events_as_json, file_json_stream, parse_event_json,
    )
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.streaming.pipeline import (
        append_sentinels, sentinel_paced, staged_files,
    )
    from last_minute_legends_spark.streaming.sessionize import (
        GAP_MINUTES, OUTPUT_SCHEMA, SENTINEL_USER,
    )

    root = tempfile.mkdtemp(prefix="ckpt_sess_restart_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        split = lo + (hi - lo) / 2
        n = staged_files(spark)

        def start_query():
            stream = parse_event_json(
                file_json_stream(spark, f"{root}/in",
                                 max_files_per_trigger=n))
            sessions = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.session_window(
                    "ts", f"{GAP_MINUTES} minutes").alias("w"), "user_id")
                .agg(F.unix_micros(F.min("ts")).alias("session_start_us"),
                     F.unix_micros(F.max("ts")).alias("session_end_us"),
                     F.count(F.lit(1)).alias("n_events"))
                .select("user_id", "session_start_us",
                        "session_end_us", "n_events")
            )
            return (
                sessions.writeStream.format("parquet")
                .option("path", f"{root}/out")
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .start()
            )

        with sentinel_paced(spark):
            # phase 1: early half, then a hard stop mid-topic
            (events_as_json(ev.filter(F.col("ts") <= F.lit(split)))
             .repartition(n).write.mode("overwrite").text(f"{root}/in"))
            q1 = start_query()
            q1.processAllAvailable()
            q1.stop()

            # phase 2: late half; a NEW query resumes from the SAME
            # checkpoint — open sessions restored from the state store
            (events_as_json(ev.filter(F.col("ts") > F.lit(split)))
             .repartition(n).write.mode("append").text(f"{root}/in"))
            q2 = start_query()
            q2.processAllAvailable()
            append_sentinels(spark, root, hi, query=q2)
            q2.stop()

        got = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
               for r in spark.read.schema(OUTPUT_SCHEMA)
               .parquet(f"{root}/out")
               .filter(F.col("user_id") != SENTINEL_USER).collect()}
        want = {(r.user_id, r.session_start_us, r.session_end_us, r.n_events)
                for r in sessionization(spark, sf_dir).collect()}
        assert got == want, (
            f"sessionize restart diverged: lost={list(want - got)[:3]} "
            f"dup_or_extra={list(got - want)[:3]}"
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_dedup_restart_from_checkpoint(spark, sf_dir):
    """dropDuplicatesWithinWatermark state recovery: stop after the
    early half of the topic, then restart from the SAME checkpoint
    with the late half PLUS a full redelivery of every file. The
    restored per-key state (not replay) must drop the redelivered
    rows inside the watermark horizon; redeliveries behind the
    checkpointed watermark are dropped as late (the original already
    emitted) — either way, each event lands exactly once."""
    import glob as _glob
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.sources.streams import (
        events_as_json, file_json_stream, parse_event_json,
    )
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.streaming.pipeline import (
        EVENT_SCHEMA, sentinel_paced, staged_files,
    )

    root = tempfile.mkdtemp(prefix="ckpt_dedup_restart_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        split = lo + (hi - lo) / 2
        n = staged_files(spark)

        def start_query(max_files: int):
            stream = parse_event_json(
                file_json_stream(spark, f"{root}/in",
                                 max_files_per_trigger=max_files))
            deduped = (
                stream.withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"])
            )
            return (
                deduped.writeStream.format("parquet")
                .option("path", f"{root}/out")
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .start()
            )

        with sentinel_paced(spark):
            # phase 1: early-half originals only
            (events_as_json(ev.filter(F.col("ts") <= F.lit(split)))
             .repartition(n).write.mode("overwrite").text(f"{root}/in"))
            q1 = start_query(n)
            q1.processAllAvailable()
            q1.stop()

            # phase 2: redeliver EVERY phase-1 file, then append the
            # late half; one batch covers all new files so no original
            # can slide behind the watermark its own batch advances
            originals = _glob.glob(f"{root}/in/part-*")
            for f in originals:
                _sh.copy(f, f"{f}-redelivered.txt")
            (events_as_json(ev.filter(F.col("ts") > F.lit(split)))
             .repartition(n).write.mode("append").text(f"{root}/in"))
            q2 = start_query(len(originals) + n)
            q2.processAllAvailable()
            q2.stop()

        got = spark.read.schema(EVENT_SCHEMA).parquet(f"{root}/out")
        assert got.count() == ev.count(), (
            f"exactly-once violated across restart: {got.count()} rows "
            f"vs {ev.count()} distinct events"
        )
        diff = ev.exceptAll(got).count() + got.exceptAll(ev).count()
        assert diff == 0, f"{diff} rows differ after restart dedup"
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_warehouse_epoch_sink_idempotent(spark, sf_dir, tmp_path):
    """Streaming → warehouse landing (the missing half of the
    reference's spark_streaming_processor: parse but never land): a
    real file-stream of events runs a per-type aggregate through
    foreachBatch(warehouse_epoch_sink) into embedded Derby, and
    (a) the landed log's latest-per-key state equals the batch
    computation of the same aggregate (batch parity), and
    (b) FORCED REDELIVERY of every epoch — calling the sink again
    with the same epoch ids, as a restart replaying uncommitted
    batches would — leaves the table byte-identical (per-epoch
    idempotence: redelivered epochs replace their own rows)."""
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.sources.warehouse import (
        jdbc_driver_available, read_warehouse, warehouse_epoch_sink,
    )

    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", str(tmp_path))
    if not jdbc_driver_available(spark, drv):
        pytest.skip("Derby driver not on the classpath")
    url = f"jdbc:derby:{tmp_path}/whs;create=true"

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    ).limit(300)
    # two staged files -> availableNow takes them in one or more
    # epochs; either way every epoch lands tagged
    ev.filter(F.col("event_id") % 2 == 0).write.mode(
        "overwrite").parquet(f"{tmp_path}/topic/p0")
    ev.filter(F.col("event_id") % 2 == 1).write.mode(
        "append").parquet(f"{tmp_path}/topic/p1")

    agg = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp_path}/topic/*")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )
    sink = warehouse_epoch_sink(url, drv, "events_landed")
    q = (agg.writeStream.outputMode("update").foreachBatch(sink)
         .option("checkpointLocation", f"{tmp_path}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    landed = read_warehouse(spark, url, drv, table="events_landed")
    rows = [tuple(r) for r in landed.collect()]
    assert rows, "nothing landed"
    epochs = sorted({r[-1] for r in rows})
    assert len(epochs) >= 2, f"want multiple epochs, got {epochs}"

    # (a) batch parity: latest emission per key == batch aggregate
    latest = {}
    for et, n, sv, ep in sorted(rows, key=lambda r: r[-1]):
        latest[et] = (n, sv)
    expect = {r.event_type: (r.n, r.sv) for r in ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 2).alias("sv")).collect()}
    assert latest == expect

    # (b) forced redelivery of EVERY epoch: replay each epoch's rows
    # through the sink again with the same epoch id
    for ep in epochs:
        # materialize BEFORE the sink runs: a real redelivery's
        # batch_df comes from the stream source, not the target table,
        # so a lazy read-back of the table we are about to DELETE from
        # would not model it (and would race the delete)
        replay_rows = [r for r in rows if r[-1] == ep]
        replay = spark.createDataFrame(
            [r[:-1] for r in replay_rows],
            "event_type string, n bigint, sv double")
        sink(replay, ep)
    again = sorted(tuple(r) for r in
                   read_warehouse(spark, url, drv,
                                  table="events_landed").collect())
    assert again == sorted(rows), "redelivered epochs changed the table"


def test_day_partition_sink_idempotent(spark, tmp_path):
    """The day-partitioned landing sink must be per-epoch idempotent:
    redelivering an epoch (same epoch_id — a restart replaying an
    uncommitted batch) REPLACES its own (day, epoch) partitions, never
    duplicates, and other epochs' rows under the same day survive.
    The landed layout must then serve planning-time day-pruned reads
    (static PartitionFilters, like the write-once layout)."""
    from last_minute_legends_spark.sources.partitioned_events import (
        DAY_US, day_partition_epoch_sink, list_days, read_day_range,
    )

    path = str(tmp_path / "landed")
    sink = day_partition_epoch_sink(path)
    b0 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 10, "view", 1.0, "{}"),
         (2, dt.datetime(2024, 1, 2, 6), 11, "view", 2.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    b1 = spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 2, 7), 12, "purchase", 3.0, "{}")],
        b0.schema)
    sink(b0, 0)
    sink(b1, 1)
    # redeliver epoch 0 — byte-identical state, no duplicates
    sink(b0, 0)
    landed = spark.read.parquet(path)
    assert sorted(r.event_id for r in landed.collect()) == [1, 2, 3]
    # a REVISED redelivery of epoch 0 replaces its old rows entirely
    b0rev = b0.limit(1)
    sink(b0rev, 0)
    assert sorted(r.event_id
                  for r in spark.read.parquet(path).collect()) == [1, 3]

    # planning-time pruning over the landed layout
    days = list_days(path)
    assert len(days) == 2
    plan = (read_day_range(spark, path, max(days))
            ._jdf.queryExecution().executedPlan().toString())
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans and all("PartitionFilters: [" in ln and
                         "event_day_us#" in ln.split("PartitionFilters:", 1)[1]
                         for ln in scans), plan


def test_outer_join_late_view_on_time_rows_exact(spark):
    """What the outer join actually guarantees about LATE input —
    measured, not assumed, because all three intuitive contracts are
    FALSE in Spark 4.1:

    - late rows are NOT input-filtered by the watermark
      (numRowsDroppedByWatermark = 0 on the late batch);
    - a late view CAN still match: within a batch, input joins
      against state BEFORE the end-of-batch state cleanup, so if the
      partner purchase's eviction hadn't run yet the late view
      converts (observed (9, 2) here);
    - or, file→batch timing deciding otherwise, it enters state
      post-cleanup, finds nothing, and emits an eviction-time NULL
      (observed (9, None) across reruns of this very scenario).

    Late-input handling is therefore BEST-EFFORT and race-dependent;
    the hard guarantee is that ON-TIME rows' results are exact and a
    late row yields at most ONE output row. That is why the
    registered pipeline delivers every real file in the first
    micro-batch (stage_events_json's max_files_per_trigger contract)
    and why a production deployment sizes the watermark DELAY to
    cover its real lateness — the delay is the correctness knob;
    there is no post-hoc late filter to save you.

    Staging: batch 1 = V1+P1 (a pair; P1 is also inside V_LATE's 2h
    window), V0 (never converts), sentinel t0+10h; batch 2 = V_LATE
    at t0+1min (hours late); batches 3/4 = sentinels to evict all
    state."""
    import datetime as dt
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.sources.streams import (
        events_as_json, file_json_stream, parse_event_json,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        JOIN_BOUND_HOURS, JOIN_SCHEMA, SENTINEL_TYPE, sentinel_paced,
    )

    root = tempfile.mkdtemp(prefix="late_view_")
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    def stage(rows, mode):
        (events_as_json(spark.createDataFrame(rows, schema))
         .coalesce(1).write.mode(mode).text(f"{root}/in"))

    try:
        stage([(1, t0, 1, "view", 1.0, "{}"),                      # V1
               (2, t0 + dt.timedelta(minutes=30), 1,
                "purchase", 2.0, "{}"),                            # P1
               (3, t0, 4, "view", 1.0, "{}"),                      # V0
               (-1, t0 + dt.timedelta(hours=10), -1,
                SENTINEL_TYPE, 0.0, "{}")], "overwrite")

        def side(event_type, prefix):
            return (
                parse_event_json(
                    file_json_stream(spark, f"{root}/in",
                                     max_files_per_trigger=64))
                .withWatermark("ts", "1 hour")
                .filter(F.col("event_type").isin(event_type, SENTINEL_TYPE))
                .select(F.col("event_id").alias(f"{prefix}_id"),
                        F.col("user_id").alias(f"{prefix}_user"),
                        F.col("ts").alias(f"{prefix}_ts"))
            )

        joined = (
            side("view", "view").join(
                side("purchase", "purchase"),
                F.expr(f"""view_user = purchase_user
                           AND purchase_ts >= view_ts
                           AND purchase_ts <= view_ts
                               + interval {JOIN_BOUND_HOURS} hours"""),
                "leftOuter")
            .select(F.col("view_user").alias("user_id"), "view_id",
                    "purchase_id",
                    F.unix_micros("view_ts").alias("view_us"),
                    F.unix_micros("purchase_ts").alias("purchase_us"),
                    (F.unix_micros("purchase_ts")
                     - F.unix_micros("view_ts")).alias("wait_us"))
        )
        with sentinel_paced(spark):
            q = (joined.writeStream.format("parquet")
                 .option("path", f"{root}/out")
                 .option("checkpointLocation", f"{root}/ckpt")
                 .outputMode("append").start())
            q.processAllAvailable()
            # batch 2: the late view (watermark is already t0+9h) + a
            # sentinel; then two more sentinel batches to evict all
            # surviving view state
            stage([(9, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
                   (-2, t0 + dt.timedelta(hours=13), -1,
                    SENTINEL_TYPE, 0.0, "{}")], "append")
            q.processAllAvailable()
            for i, h in enumerate((16, 19)):
                stage([(-3 - i, t0 + dt.timedelta(hours=h), -1,
                        SENTINEL_TYPE, 0.0, "{}")], "append")
                q.processAllAvailable()
            q.stop()

        out = (spark.read.schema(JOIN_SCHEMA).parquet(f"{root}/out")
               .filter(F.col("user_id") >= 0))
        rows = [(r.view_id, r.purchase_id) for r in out.collect()]
        got = set(rows)
        assert len(rows) == len(got), f"duplicate emissions: {rows}"
        # on-time rows: exact
        assert {(1, 2), (3, None)} <= got, got
        # late view: at most ONE row, matched or null, depending on
        # whether it beat the partner's state cleanup — never both
        assert got - {(1, 2), (3, None)} <= {(9, None), (9, 2)}, got
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_partitioned_landing_kill_restart_recovery(spark, sf_dir):
    """KILL-and-restart recovery through the epoch-REPLACE sink — the
    failure mode day_partition_epoch_sink exists for, exercised
    through a real query death, not in-process forced redelivery:

    phase 1 runs the landing stream with a sink that CRASHES after
    its 3rd batch's files have landed but BEFORE Structured Streaming
    commits the batch — exactly a sink-side executor/driver death
    with effects already on disk. Phase 2 restarts a NEW query from
    the SAME checkpoint: the offsets log has batch 2 written but the
    commit log doesn't, so the engine re-delivers it with the SAME
    epoch id, and the sink's strict per-epoch REPLACE (drop
    epoch=N dirs, dynamic overwrite) absorbs the half-landed epoch.

    The landed table must be IDENTICAL — every row including its
    (event_day_us, epoch) assignment — to an uninterrupted run with
    its own fresh checkpoint: nothing lost, nothing duplicated, and
    the file→epoch slicing reproduced from the checkpoint, not
    re-derived."""
    import shutil as _sh
    import tempfile

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from last_minute_legends_spark.sources.partitioned_events import (
        day_partition_epoch_sink,
    )
    from last_minute_legends_spark.sources.tables import load_table
    from last_minute_legends_spark.streaming.pipeline import EVENT_SCHEMA

    root = tempfile.mkdtemp(prefix="kill_restart_")
    try:
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        events.repartition(6).write.mode("overwrite").parquet(f"{root}/in")

        def stream():
            return (spark.readStream.schema(EVENT_SCHEMA)
                    .option("maxFilesPerTrigger", "1")
                    .parquet(f"{root}/in"))

        # phase 1: crash AFTER the 3rd batch's sink effects landed,
        # BEFORE its checkpoint commit
        inner = day_partition_epoch_sink(f"{root}/landed")
        seen = {"n": 0}

        def crashing_sink(batch_df, epoch_id):
            inner(batch_df, epoch_id)
            seen["n"] += 1
            if seen["n"] == 3:
                raise RuntimeError("injected sink death after write")

        q1 = (stream().writeStream.foreachBatch(crashing_sink)
              .option("checkpointLocation", f"{root}/ckpt")
              .trigger(availableNow=True).start())
        with pytest.raises(StreamingQueryException):
            q1.awaitTermination()
        assert seen["n"] == 3  # it really died mid-topic

        # phase 2: restart from the SAME checkpoint with the plain sink
        q2 = (stream().writeStream
              .foreachBatch(day_partition_epoch_sink(f"{root}/landed"))
              .option("checkpointLocation", f"{root}/ckpt")
              .trigger(availableNow=True).start())
        q2.awaitTermination()

        # uninterrupted twin: fresh checkpoint, same topic
        q3 = (stream().writeStream
              .foreachBatch(day_partition_epoch_sink(f"{root}/landed_ref"))
              .option("checkpointLocation", f"{root}/ckpt_ref")
              .trigger(availableNow=True).start())
        q3.awaitTermination()

        got = {tuple(r) for r in
               spark.read.parquet(f"{root}/landed").collect()}
        want = {tuple(r) for r in
                spark.read.parquet(f"{root}/landed_ref").collect()}
        assert len(want) == events.count()
        assert got == want, (
            f"recovered landing diverged: lost={len(want - got)} "
            f"extra={len(got - want)}")
    finally:
        _sh.rmtree(root, ignore_errors=True)


def test_csv_roundtrip_lossless_row_level(spark, sf_dir):
    """The CSV wire (CSV_OPTS) must round-trip the FULL events table
    row-for-row: micros timestamps (the default format truncates to
    millis), JSON props with embedded quotes (RFC-4180 doubling),
    null/empty distinction."""
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.plans.stream_q import (
        CSV_OPTS, EVENTS_CSV_SCHEMA,
    )
    from last_minute_legends_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        ev.write.mode("overwrite").options(**CSV_OPTS).csv(d)
        back = spark.read.schema(EVENTS_CSV_SCHEMA).options(**CSV_OPTS).csv(d)
        cols = ["event_id", F.unix_micros("ts").alias("us"),
                "user_id", "event_type", "value", "props"]
        a, b = ev.select(*cols), back.select(*cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        assert back.count() == ev.count() > 0
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_orc_roundtrip_lossless_row_level(spark, sf_dir):
    import shutil as _sh
    import tempfile

    from last_minute_legends_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props")
        ev.write.mode("overwrite").orc(d)
        back = spark.read.orc(d)
        cols = ["event_id", F.unix_micros("ts").alias("us"),
                "user_id", "event_type", "value", "props"]
        a, b = ev.select(*cols), back.select(*cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        assert back.count() == ev.count() > 0
    finally:
        _sh.rmtree(d, ignore_errors=True)


def test_tws_sessionize_gated_parity(spark, sf_dir):
    """The transformWithStateInPandas (v2) sessionizer either runs and
    matches the native session_window result exactly, or (this
    container: no google.protobuf, the v2 state protocol's transport)
    raises the documented RuntimeError — never the raw
    driver-worker-crashed stack the unguarded call produces."""
    from last_minute_legends_spark.streaming.sessionize import (
        run_stream_sessionize, run_stream_sessionize_tws, tws_available,
    )

    if not tws_available():
        with pytest.raises(RuntimeError, match="google.protobuf"):
            run_stream_sessionize_tws(spark, sf_dir)
        return
    got = {tuple(r)
           for r in run_stream_sessionize_tws(spark, sf_dir).collect()}
    want = {tuple(r) for r in run_stream_sessionize(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_multibatch_join_parity(spark, sf_dir):
    """Multi-batch watermark-ordered delivery (VERDICT r14 #3) must be
    output-IDENTICAL to the one-batch harness for both stream-stream
    joins: time-range groups mean nothing arrives late, a view is
    never evicted before an in-bound purchase can reach it (the
    watermark trails the newest group's min ts by the full delay),
    and the outer form's mid-run eviction emits exactly the null set
    the trailing sentinels otherwise would. This is the property that
    makes the Zipf skew ladder's multi-batch cells measure the SAME
    operator the registry entries run."""
    from last_minute_legends_spark.streaming.pipeline import (
        run_stream_join_pipeline,
        run_stream_outer_join_pipeline,
    )

    one = {tuple(r) for r in run_stream_join_pipeline(spark, sf_dir)
           .collect()}
    mb = {tuple(r) for r in run_stream_join_pipeline(
        spark, sf_dir, n_batches=6).collect()}
    assert one and mb == one

    oone = {tuple(r) for r in run_stream_outer_join_pipeline(
        spark, sf_dir).collect()}
    omb = {tuple(r) for r in run_stream_outer_join_pipeline(
        spark, sf_dir, n_batches=6).collect()}
    assert oone and omb == oone
    # the outer set must actually contain both verdict kinds or the
    # parity proves less than it claims
    assert any(r[2] is None for r in oone)       # never-converted view
    assert any(r[2] is not None for r in oone)   # converted view


def test_multibatch_staging_is_watermark_ordered(spark, sf_dir):
    """The batched stager's contract, checked from the staged bytes:
    groups partition the corpus, every event in group i+1 is >= every
    event in group i (so no group can land behind the watermark an
    earlier group advanced), and group 0 is pre-delivered to the
    topic dir."""
    import glob
    import json
    import os

    from last_minute_legends_spark.streaming.pipeline import (
        stage_events_json_batched,
    )

    staging, max_ts, groups = stage_events_json_batched(spark, sf_dir, 5)
    assert len(groups) == 5
    delivered = glob.glob(os.path.join(staging, "in", "*"))
    assert sorted(delivered) == sorted(d for _, d in groups[0])

    def ts_range(group):
        ts = []
        for src_f, _dst in group:
            with open(src_f) as fh:
                for line in fh:
                    if line.strip():
                        ts.append(json.loads(line)["ts_us"])
        return (min(ts), max(ts)) if ts else None

    ranges = [r for r in map(ts_range, groups) if r]
    assert len(ranges) >= 2, "corpus too small to split"
    for prev, nxt in zip(ranges, ranges[1:]):
        assert prev[1] <= nxt[0], (prev, nxt)
    n_events = sum(
        1 for g in groups for f, _ in g for line in open(f) if line.strip())
    from last_minute_legends_spark.sources.tables import load_table
    assert n_events == load_table(spark, sf_dir, "events").count()


def test_stream_join_agg_parity_and_oracle(spark, sf_dir):
    """r16 (VERDICT r15 #3) — the aggregate-push join: the streaming
    two-windowed-aggregates → window-join pipeline must equal its
    batch twin AND the direct DuckDB oracle, one-batch and
    multi-batch delivery identical (time-range groups never reopen a
    window). The per-(user, window) output is the hot-key-safe
    contract: row count is bounded by users × open windows however
    skewed the event counts are."""
    from last_minute_legends_spark.plans.stream_q import (
        STREAM_JOIN_AGG_SQL,
    )
    from last_minute_legends_spark.streaming.pipeline import (
        batch_join_agg_twin,
        run_stream_join_agg_pipeline,
    )
    from tests.oracle import _norm_frame, run_oracle

    one = run_stream_join_agg_pipeline(spark, sf_dir)
    rows = {tuple(r) for r in one.collect()}
    assert rows, "vacuous: corpus must produce joined windows"
    twin = {tuple(r) for r in batch_join_agg_twin(spark, sf_dir)
            .collect()}
    assert rows == twin
    mb = {tuple(r) for r in run_stream_join_agg_pipeline(
        spark, sf_dir, n_batches=6).collect()}
    assert mb == rows
    assert _norm_frame(one.toPandas()) == _norm_frame(
        run_oracle(STREAM_JOIN_AGG_SQL, sf_dir))
