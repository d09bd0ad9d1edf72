"""Structured Streaming pipeline: JSON file source → from_json parse →
watermark → windowed aggregation → parquet sink.

Reference parity: /root/reference/services/spark_streaming_processor.py
:44-50 reads Kafka and parses the string payload with a declared
schema (:27-36). Re-expressed Spark-first: the source here is a
directory of JSON lines read as an unbounded (value: string) stream —
byte-for-byte the Kafka value shape — fed through the SAME
``parse_event_json`` stage a Kafka deployment would use
(sources/streams.py; swap ``file_json_stream`` for ``kafka_stream``
and nothing downstream changes). The aggregation is a watermarked
1-hour tumbling window in APPEND mode and the sink is a parquet
directory (≙ warehouse append): each window lands exactly once when
the watermark closes it, and the result is read back as a distributed
DataFrame — no driver-side collect.

Watermark flushing: append mode only emits a window once the
watermark passes its end, so after the real files two sentinel events
(max_ts + 3h, + 6h) advance the watermark past every real window;
sentinel rows are filtered from the result.

At scale: watermark bounds state; the windowed agg is a streaming
shuffle on (window, event_type) with partial aggregation per
micro-batch; the parquet sink append is idempotent per window.
"""

from __future__ import annotations

import atexit
import os
import contextlib
import datetime
import glob
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.streams import (
    events_as_json,
    file_json_stream,
    parse_event_json,
)
from last_minute_legends_spark.sources.tables import load_table

SENTINEL_TYPE = "sentinel"

RESULT_SCHEMA = (
    "window_start_us long, event_type string, n_events long, sum_value double"
)


def stage_events_json(spark: SparkSession, sf_dir: str) -> tuple[str, object]:
    """Materialize the events table as a directory of Kafka-value-shaped
    JSON lines for the file stream; returns ``(staging_root, max_ts)``
    (``<root>/in`` = topic, ``<root>/out`` = sink, ``<root>/ckpt`` =
    checkpoints; ``max_ts`` feeds the sentinel writer without a second
    scan — the staged JSON would otherwise be re-read and re-parsed
    just to learn it).

    The topic is staged as ``defaultParallelism`` files: a micro-batch's
    partition count IS its file count, so file granularity is the
    streaming equivalent of the batch side's CPU-spread scan — a
    single-file topic serializes every batch's from_json parse on one
    core (measured: the enrich pipeline's data batch dominated by a
    1-task parse stage). Callers pass ``STAGED_FILES`` (or a multiple)
    as ``max_files_per_trigger`` so ALL real files land in the FIRST
    micro-batch: the files are written round-robin, so every file's
    event-time range spans the whole table, and any real file left to
    a second batch would arrive behind the advanced watermark and be
    dropped as late.

    The sink dir must outlive the call (the returned DataFrame scans
    it), so the root can't be removed eagerly; it is registered for
    removal at interpreter exit instead — repeated bench/test runs in
    one process reuse nothing but also leak nothing.

    The RENDER is cached per corpus fingerprint (sources/layout_cache
    — the write-once derived-layout discipline the partitioned/
    bucketed/IVF layouts use): every run-to-completion streaming cell
    re-stages the same topic, and the JSON render + max_ts scan are
    two Spark jobs each time where a production topic simply EXISTS.
    Each caller still gets its own private staging dir — the staged
    part files are HARDLINKED out of the cache (content-identical,
    ~free), which is safe because nothing ever modifies a staged file
    in place: sentinels append NEW files, and the atexit cleanup just
    unlinks the links."""
    staging = tempfile.mkdtemp(prefix="llm_spark_stream_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    n = staged_files(spark)

    from last_minute_legends_spark.sources.layout_cache import (
        build_once, layout_dir,
    )

    src = os.path.join(sf_dir, "events.parquet")
    cache = layout_dir("staged_topic", src, version=f"v1-n{n}")

    def _build(tmp: str) -> None:
        events = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
        max_ts = events.agg(F.max("ts").alias("m")).collect()[0].m
        (events_as_json(events).repartition(n)
         .write.mode("overwrite").text(os.path.join(tmp, "in")))
        with open(os.path.join(tmp, "max_ts.txt"), "w") as fh:
            fh.write(max_ts.isoformat())

    # atomic rename-into-place (layout_cache.build_once): a pytest and
    # a bench process racing on an unbuilt fingerprint used to both
    # overwrite cache/in while the other hardlinked from it
    build_once(cache, _build)
    with open(os.path.join(cache, "max_ts.txt")) as fh:
        max_ts = datetime.datetime.fromisoformat(fh.read().strip())

    os.makedirs(f"{staging}/in")
    for f in sorted(glob.glob(os.path.join(cache, "in", "part-*"))):
        dst = os.path.join(f"{staging}/in", os.path.basename(f))
        try:
            os.link(f, dst)
        except OSError:  # cross-device cache root: fall back to a copy
            shutil.copy2(f, dst)
    return staging, max_ts


def staged_files(spark: SparkSession) -> int:
    """Number of files the staged topic is split into (= the first
    micro-batch's parse parallelism)."""
    return spark.sparkContext.defaultParallelism


def stage_events_json_batched(spark: SparkSession, sf_dir: str,
                              n_batches: int) -> tuple[str, object, list]:
    """The MULTI-BATCH staged topic (VERDICT r14 #3): the corpus
    rendered as ``n_batches`` WATERMARK-ORDERED file groups — group
    boundaries are exact ts percentiles, so every event in group i+1
    is >= every event in group i and nothing ever lands behind the
    watermark an earlier group advanced. This removes the one-batch
    harness's structural artifact for stateful operators: delivering
    the whole corpus in ONE micro-batch means watermark eviction
    never runs mid-corpus, so a stream-stream join's per-key state
    (and a Zipf hot key's quadratic probe cost) grows with the WHOLE
    corpus instead of rate × (bound + delay). With K ordered groups,
    state is bounded per batch exactly as in a production deployment
    of continuous micro-batches.

    Returns ``(staging, max_ts, groups)`` where ``groups`` is the
    per-group file lists — group 0 is already linked into
    ``<staging>/in``; the caller drains the running query between
    linking successive groups (``deliver_group``), which is what
    guarantees one-group-per-micro-batch alignment without any
    fragile file-count/mtime arithmetic."""
    staging = tempfile.mkdtemp(prefix="llm_spark_stream_mb_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    n = staged_files(spark)

    from last_minute_legends_spark.sources.layout_cache import (
        build_once, layout_dir,
    )

    src = os.path.join(sf_dir, "events.parquet")
    cache = layout_dir("staged_topic", src, version=f"v1-n{n}-b{n_batches}")

    def _build(tmp: str) -> None:
        events = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
        max_ts = events.agg(F.max("ts").alias("m")).collect()[0].m
        fracs = [i / n_batches for i in range(1, n_batches)]
        cuts = events.agg(F.expr(
            f"percentile(unix_micros(ts), array({', '.join(map(str, fracs))}))"
        ).alias("c")).collect()[0].c
        grp = F.lit(0)
        for c in cuts:
            grp = grp + (F.unix_micros("ts") > F.lit(float(c))).cast("int")
        tagged = events.withColumn("_grp", grp)
        for i in range(n_batches):
            (events_as_json(tagged.filter(F.col("_grp") == i)
                            .drop("_grp"))
             .repartition(n)
             .write.mode("overwrite").text(os.path.join(tmp, f"in_b{i:03d}")))
        with open(os.path.join(tmp, "max_ts.txt"), "w") as fh:
            fh.write(max_ts.isoformat())

    build_once(cache, _build)
    with open(os.path.join(cache, "max_ts.txt")) as fh:
        max_ts = datetime.datetime.fromisoformat(fh.read().strip())

    os.makedirs(f"{staging}/in")
    groups = []
    for i in range(n_batches):
        files = sorted(glob.glob(os.path.join(cache, f"in_b{i:03d}",
                                              "part-*")))
        groups.append([(f, os.path.join(
            f"{staging}/in", f"b{i:03d}-{os.path.basename(f)}"))
            for f in files])
    deliver_group(groups[0])
    return staging, max_ts, groups


def deliver_group(group: list) -> None:
    """Hardlink one staged group's files into the live topic dir
    (copy across devices) — the 'producer writes the next batch'
    step of the multi-batch harness."""
    for src_f, dst in group:
        try:
            os.link(src_f, dst)
        except OSError:
            shutil.copy2(src_f, dst)


def staged_file_count(staging: str) -> int:
    """ACTUAL number of staged topic part files, counted from disk.

    ``max_files_per_trigger`` must cover every staged file: the files
    are written round-robin, so each one's event-time range spans the
    whole table, and any file left to a later micro-batch arrives
    behind the watermark the first batch advanced and is silently
    dropped as late — wrong results, not an error. Sizing the trigger
    from ``staged_files(spark)`` (the requested repartition count)
    made correctness silently depend on the write producing <= that
    many files; counting the real files removes the assumption."""
    n = len(glob.glob(f"{staging}/in/part-*"))
    if n == 0:
        raise RuntimeError(f"no staged part files under {staging}/in")
    return n


@contextlib.contextmanager
def sentinel_paced(spark: SparkSession):
    """Disable no-data micro-batches for a run-to-completion pipeline
    whose state emission is STRUCTURAL (two watermark sentinels, the
    second of whose DATA batches performs the final emission —
    completeness never rides on the engine's no-data batches). For
    these pipelines a no-data batch is pure fixed cost (~1 s of
    state-store round per batch on local[32]; disabling cut the
    windowed pipeline 8.6 -> 5.3 s at sf0.1, identical output, A/B'd).

    Scoped HERE, around each driver, rather than set globally in
    session.py: an always-on deployment (the reference's Kafka shape)
    wants windows/sessions/timeouts to emit on watermark progress, not
    only on new-data arrival, so the library-wide default must stay
    the engine's. The conf is read at query start, so wrapping
    start()..stop() is sufficient; the previous value is restored on
    exit whoever owns the session."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _parse_byte_string(s: str) -> int:
    """Spark byte-string conf value → bytes, in Python (ADVICE r17:
    the former call through ``sparkContext._jvm...JavaUtils`` coupled
    to a py4j private API and breaks under Spark Connect, where there
    is no sparkContext). Semantics match
    ``JavaUtils.byteStringAsBytes`` for conf values: a bare number is
    BYTES; case-insensitive k/m/g/t/p suffixes with optional trailing
    'b' are binary (1024-based) multiples."""
    s = str(s).strip().lower()
    for suffix, m in (("k", 1024), ("m", 1024 ** 2), ("g", 1024 ** 3),
                      ("t", 1024 ** 4), ("p", 1024 ** 5)):
        for suf in (suffix + "b", suffix):
            if s.endswith(suf):
                return int(s[:-len(suf)].strip() or 0) * m
    if s.endswith("b"):
        s = s[:-1].strip()
    return int(s or 0)


def _dir_bytes(path: str) -> int:
    """Total bytes under a directory (the staged topic's size).

    Multi-batch caveat (ADVICE r17): for a batched topic only group 0
    is linked into the dir at query start (later groups are delivered
    while the query runs), so for those drivers this measures
    PER-BATCH bytes, not whole-topic bytes — which is the right
    operand for sizing per-micro-batch state exchanges anyway; for the
    stream-stream joins both input streams re-read the same files, so
    the estimate is per-side."""
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.stat(os.path.join(dirpath, f)).st_size
            except OSError:
                pass
    return total


@contextlib.contextmanager
def scaled_state_partitions(spark: SparkSession, topic_dir: str):
    """Size the streaming query's shuffle-partition count from the
    staged topic's bytes — the AQE advisory-size policy applied to
    the one place AQE cannot reach.

    Stateful operators PIN their state partitioning at first query
    start, and adaptive execution never re-optimizes micro-batch
    shuffles — so a streaming query always runs its exchanges at the
    raw ``spark.sql.shuffle.partitions``. The session's cores-derived
    count (right for batch, where AQE coalesces by size) overshards
    small streams: a stream-stream join runs 4 state stores per
    partition, so 32 partitions = 128 RocksDB load+commit rounds per
    micro-batch for KBs of state — measured (thread dumps): the
    per-commit filesystem round (fork-per-chmod on this native-lib-
    less sandbox) was ~1.6 s of pure wait per task per batch, and
    dropping stream_join_multibatch to topic-sized partitioning read
    19.6 → 7-9 s with bit-identical output.

    The policy is the SAME one AQE applies to batch exchanges —
    ``ceil(bytes / advisoryPartitionSizeInBytes)`` — capped at the
    session count: a 100 TB topic saturates every core exactly as
    today, a 12 MB one stops paying 128 store commits a batch.
    Scoped around start()..stop(): the conf is read at query start,
    and batch work outside the scope keeps the session value.
    ``SPARK_GRAFT_STREAM_STATE_PARTS`` forces a value for A/B runs."""
    sess = spark.conf.get("spark.sql.shuffle.partitions")
    forced = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS")
    if forced:
        n = max(1, int(forced))
    else:
        advisory = _parse_byte_string(
            spark.conf.get("spark.sql.adaptive."
                           "advisoryPartitionSizeInBytes", "64MB"))
        n = max(1, min(int(sess),
                       -(-_dir_bytes(topic_dir) // max(advisory, 1))))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", sess)


_EVENT_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def append_sentinels(spark: SparkSession, staging: str, max_ts,
                     hours: tuple[int, ...] = (3, 6), *, query) -> None:
    """Write watermark-advancing sentinel events so event-time state
    flushes deterministically. Two sentinels are needed because a
    batch emits against the watermark computed at the END of the
    PREVIOUS batch: the first sentinel's batch advances the watermark
    past every real window, the second's batch performs the emission.

    ``query`` is REQUIRED: each sentinel must be drained into its own
    micro-batch before the next is written — with
    ``max_files_per_trigger`` sized to the staged topic, both sentinel
    files would otherwise coalesce into ONE batch and (with no-data
    batches disabled by ``sentinel_paced``) the final emission would
    silently never happen. A default of None invited exactly that
    bug, so the drain-per-sentinel contract is enforced at the call
    site."""
    if query is None:
        raise ValueError(
            "append_sentinels requires the running StreamingQuery: each "
            "sentinel must drain into its own micro-batch "
            "(query.processAllAvailable) or the final emission is lost")
    for i, h in enumerate(hours):
        sentinel = spark.createDataFrame(
            [(-(i + 1), max_ts + datetime.timedelta(hours=h),
              -1, SENTINEL_TYPE, 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        events_as_json(sentinel).write.mode("append").text(f"{staging}/in")
        if query is not None:
            query.processAllAvailable()


def run_windowed_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full streaming pipeline to completion on the staged
    events and return the windowed aggregate read back from the
    parquet sink (distributed — the sink directory is the pipeline's
    output dataset and outlives this call)."""
    staging, max_ts = stage_events_json(spark, sf_dir)

    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=staged_file_count(staging)))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type", "n_events", "sum_value",
        )
    )
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        append_sentinels(spark, staging, max_ts, query=q)
        q.stop()

    out = (
        spark.read.schema(RESULT_SCHEMA).parquet(f"{staging}/out")
        .filter(F.col("event_type") != SENTINEL_TYPE)
    )
    # input topic + checkpoints are consumed; the sink dir stays (it IS
    # the output dataset the returned DataFrame scans)
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def run_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery → exactly-once event set: the staged
    topic is delivered TWICE (every file redelivered — the Kafka
    consumer-retry story), and the stream drops duplicate event_ids
    with ``dropDuplicatesWithinWatermark`` — per-key state in the
    executor state store, evicted once the watermark passes the key's
    event time + delay, so state size ~ the watermark horizon, not
    history. Rows older than the watermark are dropped as late — for
    a redelivery that is exactly the correct outcome (the original
    already emitted), so the output is each event exactly once
    however the redelivery interleaves. Batch parity asserted in
    tests/test_streaming.py.

    ``max_files_per_trigger`` covers originals AND redeliveries in one
    micro-batch: the staged files are round-robin (every file's
    event-time range spans the table), so if any ORIGINAL file slid to
    a second batch its rows would arrive behind the watermark the
    first batch advanced and be dropped as late — losing events, not
    just duplicates. The file source's intra-batch order is not part
    of its contract, so the safe unit is one batch; the state store
    still does the dedup work (``dropDuplicatesWithinWatermark``
    dedups within a batch through the same per-key state)."""
    staging, _max_ts = stage_events_json(spark, sf_dir)
    originals = glob.glob(f"{staging}/in/part-*")
    for f in originals:
        shutil.copy(f, f"{f}-redelivered.txt")

    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=2 * len(originals)))
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            deduped.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    out = spark.read.schema(EVENT_SCHEMA).parquet(f"{staging}/out")
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


ENRICH_SCHEMA = (
    "window_start_us long, nation string, n_events long, sum_value double"
)


def run_enriched_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined to the
    customer→nation dimension (a broadcast hash join re-planned per
    micro-batch — the static side may be refreshed between batches)
    before the watermarked window. The reference enriches its stream
    against the warehouse the same way; at scale the dimension is a
    broadcast, so the stream side never shuffles for the join."""
    staging, max_ts = stage_events_json(spark, sf_dir)

    dim = (
        load_table(spark, sf_dir, "customer")
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("user_id"),
                F.col("n_name").alias("nation"))
    )
    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=staged_file_count(staging)))
    agg = (
        stream.join(F.broadcast(dim), "user_id", "left")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"),
                 F.coalesce("nation", F.lit("UNKNOWN")).alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "nation", "n_events", "sum_value",
        )
    )
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        append_sentinels(spark, staging, max_ts, query=q)
        q.stop()

    out = (
        spark.read.schema(ENRICH_SCHEMA).parquet(f"{staging}/out")
        .filter(F.col("nation") != "UNKNOWN")
    )
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def run_warehouse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream → WAREHOUSE landing, run to completion: the staged
    events topic feeds an update-mode per-type aggregate through
    ``foreachBatch(warehouse_epoch_sink)`` into an embedded-Derby
    database (the same JDBC surface a Snowflake deployment presents ≙
    the reference's spark_streaming_processor + snowflake_query_service
    pair, which parses but never lands), then returns the warehouse
    state collapsed to its LATEST emission per key — the log+view
    read. Per-epoch idempotence of the landing (restart replays
    REPLACE, never duplicate) is locked by
    tests/test_streaming.py::test_warehouse_epoch_sink_idempotent.

    The topic is staged as multiple files with one file per trigger,
    so the landing really exercises multi-epoch accumulation, not one
    bulk insert."""
    from pyspark.sql import Window

    from last_minute_legends_spark.sources.warehouse import (
        EPOCH_COL, read_warehouse, warehouse_epoch_sink,
    )

    staging = tempfile.mkdtemp(prefix="llm_spark_wh_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    # keep derby.log inside the staging dir, not the caller's cwd —
    # only effective before the Derby engine first boots in this JVM,
    # which is exactly when it matters
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.system.home", staging)
    url = f"jdbc:derby:{staging}/wh;create=true"

    events = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
    n_files = min(8, staged_files(spark))
    (events.repartition(n_files)
     .write.mode("overwrite").parquet(f"{staging}/in"))

    agg = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{staging}/in")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )
    with scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(warehouse_epoch_sink(url, DERBY_DRIVER,
                                               "events_landed"))
            .option("checkpointLocation", f"{staging}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    landed = read_warehouse(spark, url, DERBY_DRIVER, table="events_landed")
    w = Window.partitionBy("event_type").orderBy(F.desc(EPOCH_COL))
    out = (
        landed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n_events", "sum_value")
        .orderBy("event_type")
    )
    # materialize the view BEFORE returning: the frame must survive
    # the staging cleanup at exit and repeated reads (other stream
    # entries return parquet-backed frames; a JDBC-backed one would
    # re-query a database whose files atexit removes)
    return spark.createDataFrame(out.collect(), out.schema)


JOIN_SCHEMA = (
    "user_id long, view_id long, purchase_id long, view_us long, "
    "purchase_us long, wait_us long"
)

JOIN_BOUND_HOURS = 2


def run_stream_join_pipeline(spark: SparkSession, sf_dir: str,
                             n_batches: int | None = None) -> DataFrame:
    """Watermarked STREAM-STREAM inner join, run to completion: the
    staged events topic is read as TWO independent streams — item
    views and purchases (the reference's item_view / added_to_cart
    cart shape, reference/UserEvents.py) — joined per user within a
    2-hour event-time bound.

    Semantics and scale: the equi-key (user_id) makes the join a
    streaming state-store hash join co-partitioned on user_id; the
    time-bound condition plus BOTH sides' watermarks let the engine
    evict join state older than (watermark - bound), so state is
    O(rate x horizon), not history. Inner-join matches emit eagerly
    in the micro-batch they complete in — no sentinel flush needed —
    and the parquet-sink append is the run-to-completion harness
    shared with the other pipelines. Batch parity is locked in
    tests/test_stream_oracle.py; the full DuckDB value oracle is
    STREAM_STREAM_JOIN_SQL (plans/stream_q.py).

    ``n_batches``: deliver the corpus as that many watermark-ordered
    micro-batches (stage_events_json_batched) instead of one — state
    then stays bounded at rate × (bound + delay) DURING the run, the
    production regime, which is what lets the Zipf skew ladder
    measure this operator (tools/scale_bench.py; the one-batch form
    wedges on a hot key's corpus-scale state). Output is IDENTICAL
    either way: groups are time-range split, so a view is never
    evicted before any in-bound purchase arrives (eviction needs
    watermark > view_ts + bound, and the watermark trails the newest
    group's min ts by the full delay) — locked by
    tests/test_streaming.py::test_multibatch_join_parity."""
    if n_batches:
        staging, _max_ts, groups = stage_events_json_batched(
            spark, sf_dir, n_batches)
        n_files = sum(len(g) for g in groups)
    else:
        staging, _max_ts = stage_events_json(spark, sf_dir)
        n_files = staged_file_count(staging)
        groups = None

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            parse_event_json(
                file_json_stream(spark, f"{staging}/in",
                                 max_files_per_trigger=n_files))
            .filter(F.col("event_type") == event_type)
            .withWatermark("ts", "1 hour")
            .select(F.col("event_id").alias(f"{prefix}_id"),
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("ts").alias(f"{prefix}_ts"))
        )

    views = side("view", "view")
    purchases = side("purchase", "purchase")
    joined = (
        views.join(
            purchases,
            F.expr(f"""view_user = purchase_user
                       AND purchase_ts >= view_ts
                       AND purchase_ts <= view_ts
                           + interval {JOIN_BOUND_HOURS} hours"""),
            "inner")
        .select(F.col("view_user").alias("user_id"), "view_id",
                "purchase_id",
                F.unix_micros("view_ts").alias("view_us"),
                F.unix_micros("purchase_ts").alias("purchase_us"),
                (F.unix_micros("purchase_ts")
                 - F.unix_micros("view_ts")).alias("wait_us"))
    )
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            joined.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        if groups:
            # producer loop: drain, then land the next ordered group —
            # each group becomes (at least) one micro-batch with
            # watermark eviction running between them
            for grp in groups[1:]:
                deliver_group(grp)
                q.processAllAvailable()
        q.stop()

    out = spark.read.schema(JOIN_SCHEMA).parquet(f"{staging}/out")
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


def run_stream_outer_join_pipeline(spark: SparkSession, sf_dir: str,
                                   n_batches: int | None = None
                                   ) -> DataFrame:
    """Watermarked STREAM-STREAM **left-outer** join, run to
    completion: every item view joined to its purchases within the
    2-hour event-time bound, PLUS a null-purchase row for every view
    with NO purchase inside the bound — the other half of the
    reference's item_view / added_to_cart cart story
    (reference/UserEvents.py): the views that did NOT convert.

    The semantics the inner join cannot express: matches emit eagerly
    (same as inner), but an unmatched view row emits ONLY when the
    watermark passes ``view_ts + bound`` and the engine EVICTS the
    view from join state — that is the moment \"no match can ever
    arrive\" becomes provable, so outer-null emission is
    watermark-driven state eviction, not a query-end flush. Two
    structural consequences, both load-bearing here:

    - the watermark must keep advancing after the last real event or
      the final views' nulls never emit. Placing ``withWatermark``
      before the per-side event-type filter is NOT enough: Catalyst
      pushes the deterministic filter below the EventTimeWatermark
      operator into the scan (measured — the watermark froze at
      max-view-ts − delay and the last ~3 h of views never got their
      verdict), so sentinel rows must PASS each side's filter
      (``event_type IN (side, 'sentinel')``) to advance both
      watermarks. Sentinels carry ``user_id = -1`` and can therefore
      only ever join OTHER sentinels; their rows are dropped on the
      batch read-back of the sink (outside the streaming plan, where
      a filter can't be pushed under the watermark);
    - a batch emits against the watermark computed at the end of the
      PREVIOUS batch, and eviction needs watermark STRICTLY past
      ``max_ts + bound``, so TWO drained sentinel batches at +4h/+8h
      guarantee even the max-ts view's verdict: the +4h batch
      advances the watermark to max_ts+3h (strictly past every
      view's max_ts+2h deadline), and the +8h batch runs against it,
      evicting and emitting every remaining view. (The first
      formulation used +3h/+6h/+9h — three drains — because
      +3h − 1h delay lands EXACTLY on the max-ts view's boundary;
      shifting the first sentinel to +4h clears it strictly and
      saves one full state-round batch, ~20% of the cell.)

    At scale this is the same user_id-co-partitioned state-store hash
    join as the inner form with state still O(rate × horizon) — left
    rows are held exactly ``bound + watermark delay`` past their
    event time, then either matched or emitted null.

    LATE input (behind the watermark on arrival) is BEST-EFFORT, and
    the measured reality is laxer than every intuitive contract
    (tests/test_streaming.py pins it): late rows are NOT
    input-filtered (numRowsDroppedByWatermark = 0), and within a
    batch input joins state BEFORE the end-of-batch cleanup, so a
    late view either still matches surviving partner state or emits
    an eviction-time null — race-dependent, at most one row either
    way. On-time rows are exact regardless. Consequently this
    harness delivers every real file in the FIRST micro-batch
    (stage_events_json's max_files_per_trigger contract) and a
    production deployment must size the watermark DELAY to cover its
    real lateness — the delay is the correctness knob, not a
    post-hoc filter. The bounded corpus makes the row-level output
    deterministic, so the entry carries a FULL DuckDB value oracle
    (STREAM_OUTER_JOIN_SQL, plans/stream_q.py) plus batch parity vs
    batch_outer_join_twin.

    ``n_batches``: multi-batch watermark-ordered delivery
    (stage_events_json_batched — see run_stream_join_pipeline).
    Time-range groups are never late, so nothing rides the
    best-effort late path; outer nulls for early views emit MID-RUN
    as later groups advance the watermark past their deadlines
    (bounded state — the property the Zipf ladder measures), the
    trailing sentinels still flush the final horizon, and the output
    set is identical (test-locked)."""
    if n_batches:
        staging, max_ts, groups = stage_events_json_batched(
            spark, sf_dir, n_batches)
        n_files = sum(len(g) for g in groups)
    else:
        staging, max_ts = stage_events_json(spark, sf_dir)
        n_files = staged_file_count(staging)
        groups = None

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            parse_event_json(
                file_json_stream(spark, f"{staging}/in",
                                 max_files_per_trigger=n_files))
            .withWatermark("ts", "1 hour")
            .filter(F.col("event_type").isin(event_type, SENTINEL_TYPE))
            .select(F.col("event_id").alias(f"{prefix}_id"),
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("ts").alias(f"{prefix}_ts"))
        )

    views = side("view", "view")
    purchases = side("purchase", "purchase")
    joined = (
        views.join(
            purchases,
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
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            joined.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        if groups:
            for grp in groups[1:]:
                deliver_group(grp)
                q.processAllAvailable()
        append_sentinels(spark, staging, max_ts, hours=(4, 8), query=q)
        q.stop()

    out = (spark.read.schema(JOIN_SCHEMA).parquet(f"{staging}/out")
           .filter(F.col("user_id") >= 0))
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


def batch_outer_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same left-outer view->purchase join as a batch plan — the
    parity oracle for run_stream_outer_join_pipeline. The purchase
    predicates live in the JOIN condition (not a post-filter, which
    would turn the outer join back into an inner one); the view
    filter is a plain left-side pre-filter."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"))
    return (
        views.join(
            purchases,
            F.expr(f"""view_user = purchase_user
                       AND purchase_ts >= view_ts
                       AND purchase_ts <= view_ts
                           + interval {JOIN_BOUND_HOURS} hours"""),
            "left_outer")
        .select(F.col("view_user").alias("user_id"), "view_id",
                "purchase_id",
                F.unix_micros("view_ts").alias("view_us"),
                F.unix_micros("purchase_ts").alias("purchase_us"),
                (F.unix_micros("purchase_ts")
                 - F.unix_micros("view_ts")).alias("wait_us"))
    )


def batch_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same view->purchase join as a batch plan — the parity
    oracle for run_stream_join_pipeline (and what this query IS on a
    bounded corpus)."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"))
    return (
        views.join(
            purchases,
            F.expr(f"""view_user = purchase_user
                       AND purchase_ts >= view_ts
                       AND purchase_ts <= view_ts
                           + interval {JOIN_BOUND_HOURS} hours"""),
            "inner")
        .select(F.col("view_user").alias("user_id"), "view_id",
                "purchase_id",
                F.unix_micros("view_ts").alias("view_us"),
                F.unix_micros("purchase_ts").alias("purchase_us"),
                (F.unix_micros("purchase_ts")
                 - F.unix_micros("view_ts")).alias("wait_us"))
    )


JOIN_AGG_SCHEMA = ("user_id long, win_us long, n_views long, "
                   "n_purchases long")
JOIN_AGG_WINDOW = "1 hour"


def run_stream_join_agg_pipeline(spark: SparkSession, sf_dir: str,
                                 n_batches: int | None = None
                                 ) -> DataFrame:
    """The HOT-KEY-SAFE stream-join form (VERDICT r15 #3): per-user
    windowed AGGREGATES joined on (user_id, window) instead of raw
    view×purchase pair emission — views and purchases each collapse
    to one count per (user, hour) BEFORE the join, so a Zipf-hot
    user emits O(windows) rows where the pair-emitting join must
    emit O(views × purchases) (its r15 ladder honestly went
    superlinear x10→x30 on exactly that output term, exponent 0.786
    — a property of the pair-shaped QUERY any engine pays; this is
    the production rewrite when downstream wants per-user/per-window
    statistics, the funnel/conversion shape of the reference's
    item_view→added_to_cart story, reference/UserEvents.py).

    Engine shape: Spark 3.5+ multiple-stateful-operator support —
    time-window aggregation in TWO separate streams followed by a
    stream-stream WINDOW join (equality on the window column gives
    the engine the event-time constraint; both aggregates emit a
    window exactly once when the watermark passes its end, and the
    join matches those finalized rows eagerly). Each aggregate does
    map-side partial combine, so a hot user's events reduce within
    each micro-batch before any state-store or shuffle sees them —
    the state per side is O(users × open windows), never O(events).

    Completeness: the final windows only finalize when the watermark
    passes their end, so the run appends the standard two
    watermark-sentinel batches (+4h/+8h — the outer join's drain
    discipline; sentinels carry user_id = −1, can only ever join
    each other, and are dropped on read-back). Output on the bounded
    corpus is deterministic → FULL DuckDB value oracle
    (plans/stream_q.py STREAM_JOIN_AGG_SQL) + batch parity vs
    ``batch_join_agg_twin``; ``n_batches`` delivers the corpus as
    watermark-ordered groups (identical output — groups are
    time-range split, so no window ever reopens; this is the form
    the Zipf ladder measures)."""
    if n_batches:
        staging, max_ts, groups = stage_events_json_batched(
            spark, sf_dir, n_batches)
        n_files = sum(len(g) for g in groups)
    else:
        staging, max_ts = stage_events_json(spark, sf_dir)
        n_files = staged_file_count(staging)
        groups = None

    def side(event_type: str, out_name: str) -> DataFrame:
        return (
            parse_event_json(
                file_json_stream(spark, f"{staging}/in",
                                 max_files_per_trigger=n_files))
            .withWatermark("ts", "1 hour")
            # sentinels must PASS the filter (the outer join's
            # Catalyst-pushes-the-filter-below-the-watermark lesson)
            # so both sides' watermarks advance past the last window
            .filter(F.col("event_type").isin(event_type, SENTINEL_TYPE))
            .groupBy("user_id", F.window("ts", JOIN_AGG_WINDOW).alias("win"))
            .agg(F.count(F.lit(1)).alias(out_name))
        )

    views = side("view", "n_views")
    purchases = side("purchase", "n_purchases")
    joined = (
        views.join(purchases, ["user_id", "win"], "inner")
        .select("user_id",
                F.unix_micros(F.col("win.start")).alias("win_us"),
                "n_views", "n_purchases")
    )
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            joined.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        if groups:
            for grp in groups[1:]:
                deliver_group(grp)
                q.processAllAvailable()
        append_sentinels(spark, staging, max_ts, hours=(4, 8), query=q)
        q.stop()

    out = (spark.read.schema(JOIN_AGG_SCHEMA).parquet(f"{staging}/out")
           .filter(F.col("user_id") >= 0))
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


def batch_join_agg_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-(user, hour-window) view/purchase count join as a
    batch plan — the parity oracle for run_stream_join_agg_pipeline
    (and what this query IS on a bounded corpus)."""
    events = load_table(spark, sf_dir, "events")

    def agg(event_type: str, out_name: str) -> DataFrame:
        return (events.filter(F.col("event_type") == event_type)
                .groupBy("user_id",
                         F.window("ts", JOIN_AGG_WINDOW).alias("win"))
                .agg(F.count(F.lit(1)).alias(out_name)))

    return (
        agg("view", "n_views")
        .join(agg("purchase", "n_purchases"), ["user_id", "win"], "inner")
        .select("user_id",
                F.unix_micros(F.col("win.start")).alias("win_us"),
                "n_views", "n_purchases")
    )


LANDED_SCHEMA = "event_day_us long, n_events long, sum_value double"


def land_events_partitioned(spark: SparkSession, sf_dir: str,
                            cache: bool = False) -> str:
    """Stage the events topic as multi-file parquet and stream it
    (one file per trigger — real multi-epoch accumulation) through
    ``foreachBatch(day_partition_epoch_sink)`` into a
    ``partitionBy(event_day_us, epoch)`` layout; returns the landed
    path (``<staging>/landed``; topic + checkpoints are consumed).
    Shared by the landing entry and the incremental-rollup
    maintenance entry.

    ``cache=True`` (r17-opt) serves the landed layout from the
    write-once derived-layout cache, keyed per corpus fingerprint,
    with a private hardlink clone per call: the landing is a
    production artifact that exists once per corpus (it is what the
    ``stream_partitioned_landing`` entry builds and MEASURES — that
    caller keeps ``cache=False`` and streams for real every run),
    while the three incremental-maintenance entries only READ it as
    their epoch source — re-streaming the identical landing per
    maintenance cell measured 8-12 s per bench sample, ~60% of each
    cell, none of it maintenance cost (the cached band/IVF index
    economics, applied to the landing)."""
    from last_minute_legends_spark.sources.partitioned_events import (
        day_partition_epoch_sink,
    )

    staging = tempfile.mkdtemp(prefix="llm_spark_land_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    n_files = min(8, staged_files(spark))

    # input staging cached per corpus fingerprint (the
    # stage_events_json pattern): the parquet topic render is harness
    # overhead — a production topic exists — while the landing stream
    # itself (the thing the landing entry measures) still runs per
    # call unless the caller opted into the landed-layout cache.
    # Hardlinks are safe: the file source only READS the topic files.
    from last_minute_legends_spark.sources.layout_cache import (
        build_once, layout_dir,
    )

    src = os.path.join(sf_dir, "events.parquet")
    topic_cache = layout_dir("staged_topic_parquet", src,
                             version=f"v1-n{n_files}")

    def _build_topic(tmp: str) -> None:
        events = load_table(spark, sf_dir, "events").select(*_EVENT_COLS)
        (events.repartition(n_files)
         .write.mode("overwrite").parquet(os.path.join(tmp, "in")))

    def _run_landing(landed_dir: str) -> None:
        build_once(topic_cache, _build_topic)
        os.makedirs(f"{staging}/in", exist_ok=True)
        for f in sorted(glob.glob(os.path.join(topic_cache, "in",
                                               "part-*"))):
            dst = os.path.join(f"{staging}/in", os.path.basename(f))
            try:
                os.link(f, dst)
            except OSError:  # cross-device cache root: copy instead
                shutil.copy2(f, dst)

        stream = (spark.readStream.schema(EVENT_SCHEMA)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{staging}/in"))
        q = (
            stream.writeStream
            .foreachBatch(day_partition_epoch_sink(landed_dir))
            .option("checkpointLocation", f"{staging}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        shutil.rmtree(f"{staging}/in", ignore_errors=True)
        shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)

    if cache:
        landed_cache = build_once(
            layout_dir("landed_day_epoch", src, version=f"v1-n{n_files}"),
            lambda tmp: _run_landing(os.path.join(tmp, "landed")))
        # private clone even though current readers are read-only: a
        # future caller mutating its landing (the CDC merge pattern)
        # must never reach back into the shared cache
        _clone_tree(os.path.join(landed_cache, "landed"),
                    f"{staging}/landed")
    else:
        _run_landing(f"{staging}/landed")
    return f"{staging}/landed"


def run_partitioned_landing_pipeline(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Stream → day-partitioned PARQUET landing, run to completion:
    the staged events topic (multi-file, one file per trigger — real
    multi-epoch accumulation) lands through
    ``foreachBatch(day_partition_epoch_sink)`` into a
    ``partitionBy(event_day_us, epoch)`` layout with per-epoch
    dynamic-partition-overwrite idempotence, then returns the landed
    table's daily rollup. This is the scale-safe warehouse landing —
    the Derby JDBC epoch sink demonstrates the same semantics against
    a database; a 100 TB deployment lands exactly like THIS, and the
    landed layout serves planning-time day-pruned reads
    (tests/test_streaming.py asserts the PartitionFilters on it)."""
    landed = spark.read.parquet(land_events_partitioned(spark, sf_dir))
    out = (
        landed.filter(F.col("event_day_us").isNotNull())
        .groupBy("event_day_us")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_day_us")
    )
    return out


def _clone_tree(src: str, dst: str) -> None:
    """Private mutable copy of a cached immutable layout: directories
    recreated, files HARDLINKED (content-identical, ~free). Safe for
    the add-only layouts here — parquet ``mode("append")`` only adds
    files, never rewrites one in place, so mutating the clone cannot
    reach back into the cache."""
    for dirpath, dirs, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        tgt = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(tgt, exist_ok=True)
        for f in files:
            s, d = os.path.join(dirpath, f), os.path.join(tgt, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _split_by_percentile(df: DataFrame, id_col: str,
                         n_groups: int) -> DataFrame:
    """Tag ``df`` with ``_grp`` = its id-range group (0..n_groups-1),
    boundaries at exact id percentiles — the epoch split every
    streaming delta runner stages its topic from."""
    fracs = [i / n_groups for i in range(1, n_groups)]
    if fracs:
        cuts = df.agg(F.expr(
            f"percentile({id_col}, array({', '.join(map(str, fracs))}))"
        ).alias("c")).collect()[0].c
    else:
        cuts = []
    grp = F.lit(0)
    for c in cuts:
        grp = grp + (F.col(id_col) > F.lit(float(c))).cast("int")
    return df.withColumn("_grp", grp)


def _render_topic_groups(tagged: DataFrame, json_cols, dest: str,
                         group_ids, n_files: int) -> None:
    """Render each ``_grp`` group as ``n_files`` JSON text files under
    ``dest/grp<i>`` — the staged topic the producer loop delivers.
    Rendering is part of staging the HARNESS's topic (a production
    topic simply exists), so the delta runners build it inside their
    write-once cached layout (the stage_events_json discipline) and
    hardlink it out per run."""
    for i in group_ids:
        (tagged.filter(F.col("_grp") == i).drop("_grp")
         .select(F.to_json(F.struct(*json_cols)).alias("value"))
         .repartition(n_files)
         .write.mode("overwrite").text(os.path.join(dest, f"grp{i:03d}")))


def _link_topic_groups(src: str, staging: str, group_ids) -> list:
    """Hardlink the staged group files into ``<staging>/in`` delivery
    tuples (the deliver_group shape); content-identical, ~free.

    An EMPTY staged group raises, DELIBERATELY (ADVICE r17 kept as
    fail-fast): the delta runners' percentile splits over their
    planted corpora always produce non-empty groups, so a groupless
    dir means the cached layout is truncated/corrupt — delivering
    nothing and silently absorbing zero epochs would pass the row
    gate while skipping the work under test."""
    groups = []
    for i in group_ids:
        files = sorted(glob.glob(os.path.join(src, f"grp{i:03d}",
                                              "part-*")))
        if not files:
            raise RuntimeError(f"no staged group files under "
                               f"{src}/grp{i:03d}")
        groups.append([
            (f, os.path.join(f"{staging}/in",
                             f"g{i:03d}-{os.path.basename(f)}"))
            for f in files])
    return groups


def stream_absorb_epoch(spark: SparkSession, batch_df: DataFrame,
                        epoch_id: int, idx: str, corpus: str,
                        threshold: float, perm_hash=None, band_hash=None,
                        health_every: int = 2,
                        labels_dir: str | None = None) -> None:
    """ONE epoch of the streaming dedup sink — module-level so the
    redelivery test can invoke it twice with the same ``epoch_id``
    and assert duplicate-idempotence (ADVICE r15). Steps:

    1. absorb the epoch against the persisted band index, verifying
       against the corpus landed so far (recursive listing: base
       files at the root, epochs in subdirs);
    2. with ``labels_dir``, fold the epoch into the MAINTAINED
       cluster labels: the fold's edge set is the absorb's OWN
       freshly-derived pair set (r18) — value-identical to "every
       stored pair touching one of the epoch's doc ids" (epoch ids
       are strictly new, so only this epoch's pairs can touch them)
       without re-scanning the whole stored pair set per epoch, and
       still redelivery-convergent: a retried (or
       crashed-before-labels) epoch re-derives the identical pair set
       deterministically and already-connected edges merge as no-ops.
       Labels live in a BUCKET-PARTITIONED store
       (operators/labels_store.py, r17 — VERDICT r16 #1): the fold
       rewrites only the bucket directories holding a merge-map key,
       so per-epoch label I/O is epoch-sized, not corpus-sized; a
       retry folding the same edges into the already-folded store is
       a no-op by confluence (test-locked);
    3. land the epoch at ``corpus/epoch<id>`` with OVERWRITE — a
       redelivered epoch replaces its own files instead of
       double-landing, so later epochs' shingle-intersection verify
       never sees doubled counts;
    4. every ``health_every`` epochs, consult ``band_index_health``
       and compact the appended layout when it recommends."""
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_delta, band_index_health, compact_band_index,
    )

    sc = spark.sparkContext
    indexed = (spark.read.option("recursiveFileLookup", "true")
               .parquet(corpus))
    def _fold_and_land(new_pairs) -> None:
        """Runs CONCURRENTLY with the absorb's band-rows append
        (absorb_delta ``post_pairs`` — guide #2.6 "overlap independent
        jobs"): both units only need the pairs write done, and they
        touch disjoint state (labels store + corpus epoch dir vs the
        bands dir). Job descriptions are thread-local, so the probe
        labels stay correct."""
        if labels_dir:
            from last_minute_legends_spark.operators.labels_store import (
                merge_labels_store,
            )

            # the fold's edge set is the absorb's OWN freshly-derived
            # pair set (r18): an epoch's doc ids are strictly new, so
            # the stored pairs touching them are exactly this epoch's
            # new pairs — the former per-epoch scan of the WHOLE
            # stored pair set + two semi-joins + distinct recovered
            # precisely what the absorb had just computed. Redelivery
            # still converges: a retried epoch re-derives the
            # identical pair set deterministically (the absorb's probe
            # guards make the re-probe self-pair-safe), and
            # already-folded edges merge as no-ops in the confluent
            # fold.
            sc.setJobDescription(f"sdd epoch {epoch_id}: labels fold")
            merge_labels_store(spark, labels_dir,
                               new_pairs.select("doc_a", "doc_b"),
                               write=True)
        sc.setJobDescription(f"sdd epoch {epoch_id}: land epoch")
        # size-targeted epoch files (guide #6): every later epoch's
        # verify re-scans the landed corpus, so an 8-sliver epoch dir
        # charges 8 task launches + listing paths per later absorb
        (batch_df.hint("rebalance").write.mode("overwrite")
         .parquet(os.path.join(corpus, f"epoch{int(epoch_id):06d}")))
        sc.setJobDescription(None)

    sc.setJobDescription(f"sdd epoch {epoch_id}: absorb")
    res = absorb_delta(spark, indexed, batch_df, idx, threshold,
                       perm_hash=perm_hash, band_hash=band_hash,
                       append=True, return_new=bool(labels_dir),
                       post_pairs=_fold_and_land)
    if labels_dir:
        _full, new_pairs = res
        new_pairs.unpersist()
    sc.setJobDescription(None)
    # fire on epoch_id % health_every == 0 (skipping epoch 0, which has
    # absorbed nothing before it): with the default health_every=2 the
    # shipped n_epochs=4 registry runs (foreachBatch epoch ids 0..2)
    # execute at least one health check end-to-end — the previous
    # ``% N == N-1`` form with N=4 never fired inside them (ADVICE r16)
    if health_every > 0 and int(epoch_id) > 0 \
            and int(epoch_id) % health_every == 0:
        if band_index_health(spark, idx)["compact_recommended"]:
            compact_band_index(spark, idx)


def stream_phash_absorb_epoch(spark: SparkSession, batch_df: DataFrame,
                              epoch_id: int, idx: str,
                              health_every: int = 2) -> None:
    """ONE epoch of the streaming IMAGE-dedup sink (module-level so
    the redelivery test can invoke it twice with the same epoch id):
    perceptual-hash the epoch's payloads in one Arrow pass, absorb
    the signatures against the persisted hamming band index (add-only
    appends; the popcount verify rides the band rows, so no corpus
    read at all), and consult ``band_index_health`` every
    ``health_every`` epochs. Redelivery is wrong-row-safe the same
    way the MinHash sink is: the ``doc_id !=`` probe guard plus the
    final ``distinct()`` absorb duplicate-only appends."""
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_hamming_delta, band_index_health, compact_band_index,
    )
    from last_minute_legends_spark.operators.multimodal import (
        phash_images,
    )

    sig = phash_images(batch_df.select(
        "doc_id", F.unbase64(F.col("payload_b64")).alias("payload")))
    absorb_hamming_delta(spark, sig, idx, append=True)
    if health_every > 0 and int(epoch_id) > 0 \
            and int(epoch_id) % health_every == 0:
        if band_index_health(spark, idx)["compact_recommended"]:
            compact_band_index(spark, idx)


def run_stream_phash_delta(spark: SparkSession, sf_dir: str,
                           n_epochs: int = 4,
                           cache_tag: str | None = None) -> DataFrame:
    """STREAMING INGEST IMAGE DEDUP (r17, VERDICT r16 #2) — the
    incremental hamming-tier lifecycle (operators/dedup_delta.py::
    absorb_hamming_delta) driven end-to-end by Structured Streaming:
    the LAION-ingest shape, deduping a stream of images in flight.

    - the perceptual-hash corpus (documents as opaque binary plus the
      planted in-place-substituted companions —
      plans/multimodal_q.py::_phash_payloads, the same frame the
      batch entries hash) is split into ``n_epochs`` doc_id-range
      groups; group 0 seeds the write-once hamming band index + the
      stored pair set;
    - the remaining groups arrive as a JSON file-stream topic
      (payloads base64-framed on the wire — the binary-over-text
      discipline of the Confluent wire tests), one group per
      micro-batch, and ``foreachBatch`` absorbs each epoch:
      signature-sized work only, since the hamming verify's popcount
      arithmetic rides the band rows of BOTH sides — absorbing an
      epoch never re-reads the indexed corpus (no landing dir at
      all, unlike the MinHash form);
    - every ``health_every`` epochs the sink consults
      ``band_index_health`` and compacts when it fires.

    Returns the stored pair set after the last epoch ==
    the single-shot dedup_phash output over the full corpus
    (per-document banding decomposes exactly; chained-absorb equality
    is test-locked), so the registry entry carries the UNCHANGED
    byte-segment replay oracle DEDUP_PHASH_SQL."""
    from last_minute_legends_spark.operators.dedup_delta import (
        stored_pairs, write_hamming_index,
    )
    from last_minute_legends_spark.operators.multimodal import (
        phash_images,
    )
    from last_minute_legends_spark.plans.multimodal_q import (
        PHASH_MAX_HAMMING, _phash_payloads,
    )

    staging = tempfile.mkdtemp(prefix="llm_spark_spd_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    payloads = _phash_payloads(spark, sf_dir)

    idx = f"{staging}/idx"
    n_files = 8
    os.makedirs(f"{staging}/in")

    def _build(tmp: str) -> None:
        # hamming index + staged topic groups, both deterministic in
        # the corpus — built once per fingerprint (r17-opt: the topic
        # render joined the cached layout; it was a percentile job +
        # 3 base64 renders per run, none of it absorb cost)
        tagged = _split_by_percentile(payloads, "doc_id", n_epochs)
        base = tagged.filter(F.col("_grp") == 0).drop("_grp")
        sig = phash_images(base).persist()
        write_hamming_index(sig, os.path.join(tmp, "idx"),
                            ["ph0", "ph1"], [32, 32],
                            band_width=16,
                            max_hamming=PHASH_MAX_HAMMING)
        sig.unpersist()
        _render_topic_groups(
            tagged,
            (F.col("doc_id"),
             F.base64(F.col("payload")).alias("payload_b64")),
            tmp, range(1, n_epochs), n_files)

    if cache_tag:
        from last_minute_legends_spark.sources.layout_cache import (
            build_once, layout_dir,
        )

        cached = build_once(
            layout_dir("stream_phash_delta_base",
                       os.path.join(sf_dir, "documents.parquet"),
                       f"v2-{cache_tag}-e{n_epochs}-h{PHASH_MAX_HAMMING}"),
            _build)
        src = cached
        _clone_tree(os.path.join(cached, "idx"), idx)
    else:
        _build(staging)
        src = staging
    groups = _link_topic_groups(src, staging, range(1, n_epochs))

    parsed = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", n_files)
        .load(f"{staging}/in")
        .select(F.from_json(F.col("value"),
                            "doc_id long, payload_b64 string").alias("d"))
        .select("d.*")
    )

    def absorb(batch_df, epoch_id):
        stream_phash_absorb_epoch(spark, batch_df, epoch_id, idx)

    with sentinel_paced(spark):
        q = (parsed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", f"{staging}/ckpt")
             .start())
        deliver_group(groups[0])
        q.processAllAvailable()
        for g in groups[1:]:
            deliver_group(g)
            q.processAllAvailable()
        q.stop()

    return stored_pairs(spark, idx).distinct()


def stream_embedding_absorb_epoch(spark: SparkSession,
                                  batch_df: DataFrame, epoch_id: int,
                                  idx: str, corpus: str,
                                  health_every: int = 2) -> None:
    """ONE epoch of the streaming EMBEDDING-dedup sink (module-level
    for the redelivery test): unit-norm the epoch's vectors, absorb
    against the persisted frozen-plane band index (the indexed side —
    read only for the candidate-only exact-cosine verify — is the
    corpus landed so far), land the epoch as an OVERWRITTEN subdir
    (redelivery replaces, never double-lands), and consult BOTH
    maintenance triggers every ``health_every`` epochs: file
    fragmentation (compact) and the tier's unique band-geometry
    drift (reband at the grown corpus size)."""
    from last_minute_legends_spark.functions.vectors import norm
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_embedding_delta, compact_band_index,
        embedding_index_health, reband_embedding_index,
    )

    delta = (batch_df.select("id", "v")
             .withColumn("nrm", norm(F.col("v"))))
    indexed = (spark.read.option("recursiveFileLookup", "true")
               .parquet(corpus))
    absorb_embedding_delta(spark, indexed, delta, idx, append=True)
    (delta.hint("rebalance").write.mode("overwrite")
     .parquet(os.path.join(corpus, f"epoch{int(epoch_id):06d}")))
    if health_every > 0 and int(epoch_id) > 0 \
            and int(epoch_id) % health_every == 0:
        n_total = (spark.read.option("recursiveFileLookup", "true")
                   .parquet(corpus).count())
        h = embedding_index_health(spark, idx, n_total=n_total)
        if h["reband_recommended"]:
            emb = (spark.read.option("recursiveFileLookup", "true")
                   .parquet(corpus))
            reband_embedding_index(spark, emb, idx)
        elif h["compact_recommended"]:
            compact_band_index(spark, idx)


def run_stream_embedding_delta(spark: SparkSession, sf_dir: str,
                               n_epochs: int = 4,
                               cache_tag: str | None = None) -> DataFrame:
    """STREAMING INGEST EMBEDDING DEDUP (r17) — the third and last
    near-dup tier's incremental lifecycle driven end-to-end by
    Structured Streaming, completing the set (MinHash r15, hamming/
    image stream_phash_delta r17): semantic dedup of a vector stream
    in flight, the frozen-hyperplane absorb per micro-batch.

    - the planted embedding corpus (plans/dedup_q.py::
      _embedding_corpus — the same frame the batch entries hash) is
      split into ``n_epochs`` id-range groups; group 0 seeds the
      frozen-geometry sign-LSH band index (adaptive width at the SEED
      corpus size — absorbs re-derive identical planes from the
      params, nothing model-sized shipped) and lands as the corpus
      base;
    - the remaining groups arrive as a JSON file-stream topic
      (vectors as JSON double arrays — Jackson round-trips IEEE
      doubles exactly), one group per micro-batch; ``foreachBatch``
      absorbs each epoch (delta-sized plane dots, size-gated literal
      probes, exact-cosine verify fetching candidate vectors from the
      landed corpus) then lands the epoch for the next batch's verify
      side;
    - every ``health_every`` epochs the sink consults
      ``embedding_index_health``: geometry drift → staged atomic
      re-band, else fragmentation → compaction — the full maintenance
      loop of this tier, on the streaming path.

    Returns the stored pair set after the last epoch == the
    single-shot dedup_embedding output over the full corpus (the
    lossless per-vector banding decomposition, chained), so the
    registry entry carries the UNCHANGED exact all-pairs oracle
    DEDUP_EMBEDDING_SQL — recall at the frozen seed geometry is part
    of what the hash match proves."""
    from last_minute_legends_spark.functions.vectors import norm
    from last_minute_legends_spark.operators.dedup_delta import (
        stored_pairs, write_embedding_index,
    )
    from last_minute_legends_spark.operators.similarity import (
        with_unit_vectors,
    )
    from last_minute_legends_spark.plans.dedup_q import (
        COSINE_THRESHOLD, _embedding_corpus,
    )

    staging = tempfile.mkdtemp(prefix="llm_spark_sed_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir))

    idx = f"{staging}/idx"
    corpus = f"{staging}/corpus"
    n_files = 8
    os.makedirs(f"{staging}/in")

    def _build(tmp: str) -> None:
        # frozen-geometry index + landed base + staged topic groups,
        # all deterministic in the corpus — one write-once layout
        # (r17-opt: the topic render joined the cache)
        tagged = _split_by_percentile(emb, "id", n_epochs)
        b = tagged.filter(F.col("_grp") == 0).drop("_grp").persist()
        write_embedding_index(b, os.path.join(tmp, "idx"),
                              COSINE_THRESHOLD)
        (b.select("id", "v", "nrm").hint("rebalance")
         .write.mode("overwrite")
         .parquet(os.path.join(tmp, "corpus")))
        b.unpersist()
        _render_topic_groups(tagged, ("id", "v"), tmp,
                             range(1, n_epochs), n_files)

    if cache_tag:
        from last_minute_legends_spark.sources.layout_cache import (
            build_once, layout_dir,
        )

        cached = build_once(
            layout_dir("stream_embedding_delta_base",
                       os.path.join(sf_dir, "embeddings.parquet"),
                       f"v3-{cache_tag}-e{n_epochs}-t{COSINE_THRESHOLD}"),
            _build)
        src = cached
    else:
        src = f"{staging}/build"
        _build(src)
    _clone_tree(os.path.join(src, "idx"), idx)
    _clone_tree(os.path.join(src, "corpus"), corpus)
    groups = _link_topic_groups(src, staging, range(1, n_epochs))

    parsed = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", n_files)
        .load(f"{staging}/in")
        .select(F.from_json(F.col("value"),
                            "id long, v array<double>").alias("d"))
        .select("d.*")
    )

    def absorb(batch_df, epoch_id):
        stream_embedding_absorb_epoch(spark, batch_df, epoch_id, idx,
                                      corpus)

    with sentinel_paced(spark):
        q = (parsed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", f"{staging}/ckpt")
             .start())
        deliver_group(groups[0])
        q.processAllAvailable()
        for g in groups[1:]:
            deliver_group(g)
            q.processAllAvailable()
        q.stop()

    return stored_pairs(spark, idx).distinct()


def run_stream_dedup_delta(spark: SparkSession, sf_dir: str,
                           n_epochs: int = 4, threshold: float = 0.8,
                           perm_hash=None, band_hash=None,
                           cache_tag: str | None = None,
                           maintain_labels: bool = False) -> DataFrame:
    """STREAMING INGEST DEDUP — the r15 incremental-dedup lifecycle
    (operators/dedup_delta.py) driven end-to-end by Structured
    Streaming, i.e. "dedup the ingest, not the corpus" made literal:

    - the documents corpus is split into ``n_epochs`` doc_id-range
      groups (exact percentile boundaries); group 0 seeds the
      write-once band-bucket index + stored pair set (the one-time
      base build);
    - the remaining groups arrive as a JSON file-stream topic, one
      group per micro-batch (the producer-loop drain pattern of the
      multi-batch staged topic), and ``foreachBatch`` ABSORBS each
      epoch: delta-sized signatures, bucket probes against the
      persisted layout, exact verify against the corpus landed so
      far, add-only appends of band rows + new pairs, then the epoch
      itself lands in the corpus dir for the next batch's verify
      side. Per-epoch cost ∝ epoch size at any corpus size — the
      measured-flat dedup_delta_fixed economics, now on the
      streaming path the reference's ingest loop actually runs
      (spark_batch_processor.py:83-86's incremental new-record
      detection, upgraded from exact-id diff to near-dup semantics).

    Returns the stored pair set after the last epoch, which equals
    the single-shot minhash_lsh_pairs over the FULL corpus (the
    lossless-decomposition argument in operators/dedup_delta.py,
    chained across epochs) — so with the portable md5 hashes the
    registry entry carries the UNCHANGED single-shot DuckDB replay
    oracle. foreachBatch's at-least-once redelivery is wrong-row-safe
    (ADVICE r15): the absorb probes carry a ``doc_id !=`` guard (a
    retried epoch probing its own already-appended band rows cannot
    fabricate jaccard-1.0 self-pairs), the epoch lands in the corpus
    as a per-epoch OVERWRITTEN subdir (never double-counted by later
    epochs' shingle-intersection verify), and the band/pair appends
    are duplicate-only (absorbed by the final ``distinct()``) —
    locked by tests/test_dedup_delta.py's double-absorb redelivery
    test. Every ``health_every`` epochs the sink consults
    ``band_index_health`` and compacts the appended layout when it
    fires (VERDICT r15 #7 — the rebuild_ivf_index maintenance
    pattern, so the streaming path no longer grows files-per-dir
    unboundedly until a manual pass).

    ``maintain_labels=True`` (r16) runs the lifecycle END-TO-END:
    keeper-election cluster labels are maintained per micro-batch
    (seeded from the base pair graph, folded epoch-at-a-time via
    merge_cluster_labels' contracted-graph merge) and the FINAL
    labels frame is returned instead of the pair set — equal to
    single-shot connected_components over the full corpus' pair
    graph, so the md5 registry form (stream_clusters_delta) carries
    the full recursive-closure DuckDB oracle."""
    from last_minute_legends_spark.operators.dedup import (
        connected_components,
    )
    from last_minute_legends_spark.operators.labels_store import (
        write_labels_store,
    )
    from last_minute_legends_spark.operators.dedup_delta import (
        stored_pairs, write_band_index,
    )

    staging = tempfile.mkdtemp(prefix="llm_spark_sdd_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    idx = f"{staging}/idx"
    corpus = f"{staging}/corpus"
    n_files = 8
    os.makedirs(f"{staging}/in")

    def _build(tmp: str, with_labels: bool = True) -> None:
        # base index + landed base corpus + the staged topic groups +
        # the seed labels — ALL deterministic functions of the corpus,
        # built once per fingerprint. The seed labels are the
        # maintained store's INITIAL state (CC over the base pair
        # graph), so caching them is the same write-once discipline as
        # the index itself; every per-epoch fold still runs live. The
        # CACHED layout always carries them (both the pairs-only and
        # labels entries share one fingerprint dir); an UNCACHED
        # pairs-only run (tests) skips the full CC it would never read
        # (ADVICE r17).
        tagged = _split_by_percentile(docs, "doc_id", n_epochs)
        base = tagged.filter(F.col("_grp") == 0).drop("_grp")
        write_band_index(base, os.path.join(tmp, "idx"), threshold,
                         perm_hash=perm_hash, band_hash=band_hash)
        # size-targeted base files (guide #6): the verify side scans
        # this dir every epoch with recursive listing — 32 task-grain
        # slivers cost ~40 scan tasks + a 60-path listing per absorb
        (base.hint("rebalance").write.mode("overwrite")
         .parquet(os.path.join(tmp, "corpus")))
        _render_topic_groups(tagged, ("doc_id", "text"), tmp,
                             range(1, n_epochs), n_files)
        if with_labels:
            write_labels_store(
                connected_components(
                    stored_pairs(spark, os.path.join(tmp, "idx"))),
                os.path.join(tmp, "labels"))

    if cache_tag:
        # the base build (a full single-shot dedup of the seed
        # quarter) is immutable and identical across runs — cache it
        # per corpus fingerprint and hardlink-clone into the private
        # staging, since the STREAM then mutates its copy via add-only
        # appends. Measured: dropped the sf0.1 bench cell 47.9 → the
        # absorb-only cost, the same write-once economics as the IVF
        # probe entries. r17-opt: the staged topic groups and the seed
        # labels joined the cached layout (they were rebuilt per run —
        # a percentile job + 3 renders + a full CC per invocation,
        # none of it absorb cost).
        from last_minute_legends_spark.sources.layout_cache import (
            build_once, layout_dir,
        )

        cached = build_once(
            layout_dir("stream_dedup_delta_base",
                       os.path.join(sf_dir, "documents.parquet"),
                       f"v4-{cache_tag}-e{n_epochs}-t{threshold}"),
            _build)
        src = cached
        _clone_tree(os.path.join(cached, "idx"), idx)
        _clone_tree(os.path.join(cached, "corpus"), corpus)
    else:
        _build(staging, with_labels=maintain_labels)
        src = staging
    groups = _link_topic_groups(src, staging, range(1, n_epochs))

    parsed = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", n_files)
        .load(f"{staging}/in")
        .select(F.from_json(F.col("value"),
                            "doc_id long, text string").alias("d"))
        .select("d.*")
    )

    labels_dir = None
    if maintain_labels:
        # seed the maintained-labels state: keeper labels of the base
        # index's pair graph, persisted as the bucket-partitioned
        # store each epoch's fold then rewrites touched-buckets-only
        # (operators/labels_store.py — VERDICT r16 #1). The seed comes
        # out of the write-once layout (built in _build above); the
        # clone is private, so the folds' bucket swaps never touch the
        # cache.
        labels_dir = f"{staging}/labels"
        if src != staging:
            _clone_tree(os.path.join(src, "labels"), labels_dir)

    def absorb(batch_df, epoch_id):
        stream_absorb_epoch(spark, batch_df, epoch_id, idx, corpus,
                            threshold, perm_hash=perm_hash,
                            band_hash=band_hash, labels_dir=labels_dir)

    with sentinel_paced(spark):
        q = (parsed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", f"{staging}/ckpt")
             .start())
        deliver_group(groups[0])
        q.processAllAvailable()
        for g in groups[1:]:
            deliver_group(g)
            q.processAllAvailable()
        q.stop()

    if maintain_labels:
        from last_minute_legends_spark.operators.labels_store import (
            read_labels_store,
        )

        return read_labels_store(spark, labels_dir)
    return stored_pairs(spark, idx).distinct()


def stream_semantic_absorb_epoch(spark: SparkSession,
                                 batch_df: DataFrame, epoch_id: int,
                                 idx: str, corpus: str,
                                 health_every: int = 2) -> None:
    """ONE epoch of the streaming SEMANTIC-dedup sink (module-level
    for the redelivery test): unit-norm the epoch's vectors, absorb
    against the frozen k-means membership store (bucket-pruned probe,
    candidate vectors fetched from the corpus landed so far), land
    the epoch as an OVERWRITTEN subdir, and consult
    ``semantic_index_health`` every ``health_every`` epochs —
    geometry drift retrains at the grown population's adaptive k
    (staged atomic swap). Redelivery is wrong-row-safe: the absorb's
    verdict/membership landings are per-epoch overwrites, and a retry
    probing its own already-landed membership rows only duplicates
    pair candidates, which the min/arg_min verdict fold absorbs."""
    from last_minute_legends_spark.functions.vectors import norm
    from last_minute_legends_spark.operators.dedup_delta import (
        absorb_semantic_delta, release_absorb_persists,
        retrain_semantic_index, semantic_index_health,
    )

    delta = (batch_df.select("id", "v")
             .withColumn("nrm", norm(F.col("v"))))
    indexed = (spark.read.option("recursiveFileLookup", "true")
               .parquet(corpus))
    absorb_semantic_delta(spark, indexed, delta, idx, append=True)
    # append=True materialized every landing inside the call — drop
    # the absorb's tracked persists so a long stream can't accumulate
    # one pinned epoch frame per micro-batch (VERDICT r16 #6 hygiene)
    release_absorb_persists()
    (delta.hint("rebalance").write.mode("overwrite")
     .parquet(os.path.join(corpus, f"epoch{int(epoch_id):06d}")))
    if health_every > 0 and int(epoch_id) > 0 \
            and int(epoch_id) % health_every == 0:
        h = semantic_index_health(spark, idx)
        if h["retrain_recommended"]:
            emb = (spark.read.option("recursiveFileLookup", "true")
                   .parquet(corpus))
            retrain_semantic_index(spark, emb, idx)


def run_stream_semantic_delta(spark: SparkSession, sf_dir: str,
                              n_epochs: int = 4,
                              cache_tag: str | None = None) -> DataFrame:
    """STREAMING SEMANTIC DEDUP (r17b) — the SemDeDup tier's
    incremental lifecycle driven end-to-end by Structured Streaming,
    the fourth streaming dedup lifecycle beside MinHash (r15),
    hamming/image and sign-LSH embedding (r17):

    - the bottom 80% of ids seeds the frozen k-means index (the SAME
      split, geometry, and md5 training striping as the batch
      ``dedup_semantic_delta`` entry — so the registry entry carries
      that entry's UNCHANGED frozen-geometry replay oracle) and lands
      as the corpus base;
    - the remaining ids arrive as a JSON file-stream topic in
      id-ORDERED epochs (ingestion order is id order — the
      monotone-verdict contract that makes the verdict store
      append-only), one epoch per micro-batch; ``foreachBatch``
      absorbs each epoch and lands it for the next batch's candidate
      fetch;
    - every ``health_every`` epochs the sink consults
      ``semantic_index_health`` (a retrain would fire only past 4x
      cluster-size drift — the 20% growth here exercises the check,
      not the rebuild, exactly like the embedding tier's reband).

    Returns the maintained verdict frame after the last epoch ==
    the single-shot frozen-geometry prune over the full corpus."""
    from last_minute_legends_spark.functions.portable_hash import (
        md5_id_hash,
    )
    from last_minute_legends_spark.operators.dedup_delta import (
        _SEM_ASSIGN, _SEM_VERDICTS, write_semantic_index,
    )
    from last_minute_legends_spark.operators.similarity import (
        with_unit_vectors,
    )
    from last_minute_legends_spark.plans.dedup_q import (
        SEM_ITERS, SEM_K, SEM_TAU, _embedding_corpus,
    )
    from last_minute_legends_spark.sources.tables import Catalog

    staging = tempfile.mkdtemp(prefix="llm_spark_ssd_")
    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    emb = with_unit_vectors(_embedding_corpus(spark, sf_dir))
    mx = int(Catalog(spark, sf_dir).embeddings
             .agg(F.max("vec_id")).first()[0])
    split = int(mx * 0.8)
    base = emb.filter(F.col("id") < split)
    delta_all = emb.filter(F.col("id") >= split)

    idx = f"{staging}/idx"
    corpus = f"{staging}/corpus"

    # id-ORDERED epochs over the top-20% delta (monotone ingestion)
    n_eps = max(1, n_epochs - 1)
    n_files = 8
    os.makedirs(f"{staging}/in")

    def _build(tmp: str) -> None:
        # frozen k-means index + landed base + staged topic groups
        # (r17-opt: the topic render joined the cached layout)
        b = base.persist()
        write_semantic_index(b, os.path.join(tmp, "idx"), SEM_TAU,
                             k=SEM_K, iters=SEM_ITERS,
                             id_hash=md5_id_hash)
        (b.select("id", "v", "nrm").hint("rebalance")
         .write.mode("overwrite")
         .parquet(os.path.join(tmp, "corpus")))
        b.unpersist()
        _render_topic_groups(_split_by_percentile(delta_all, "id", n_eps),
                             ("id", "v"), tmp, range(n_eps), n_files)

    if cache_tag:
        from last_minute_legends_spark.sources.layout_cache import (
            build_once, layout_dir,
        )

        cached = build_once(
            layout_dir("stream_semantic_delta_base",
                       os.path.join(sf_dir, "embeddings.parquet"),
                       f"v3-{cache_tag}-k{SEM_K}t{SEM_TAU}-e{n_epochs}"),
            _build)
        src = cached
    else:
        src = f"{staging}/build"
        _build(src)
    _clone_tree(os.path.join(src, "idx"), idx)
    _clone_tree(os.path.join(src, "corpus"), corpus)
    groups = _link_topic_groups(src, staging, range(n_eps))

    parsed = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", n_files)
        .load(f"{staging}/in")
        .select(F.from_json(F.col("value"),
                            "id long, v array<double>").alias("d"))
        .select("d.*")
    )

    def absorb(batch_df, epoch_id):
        stream_semantic_absorb_epoch(spark, batch_df, epoch_id, idx,
                                     corpus)

    with sentinel_paced(spark):
        q = (parsed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", f"{staging}/ckpt")
             .start())
        deliver_group(groups[0])
        q.processAllAvailable()
        for g in groups[1:]:
            deliver_group(g)
            q.processAllAvailable()
        q.stop()

    return (spark.read.parquet(os.path.join(idx, _SEM_VERDICTS))
            .select("id", "bucket", "keep", "dup_of", "dup_cos"))
