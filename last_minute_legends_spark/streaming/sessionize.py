"""Streaming gap sessionization — native session_window (the default
path) + an applyInPandasWithState variant (the arbitrary-stateful-
logic demonstrator).

The count/min/max-per-session shape needs NO custom state logic:
``groupBy(session_window(ts, gap), user_id)`` under a watermark is a
JVM-side streaming aggregation — state lives in the executor state
store (RocksDB/HDFS-backed on a cluster), the whole plan is
codegen'd, and no Python workers sit in the hot path. That is the
production plan at 100 TB and what ``run_stream_sessionize`` (the
registry entry) uses.

``run_stream_sessionize_python_state`` keeps the
applyInPandasWithState formulation: per-user Python state with
event-time timeouts. It is the template for session aggregates the
built-ins genuinely can't express (per-session ML feature vectors,
pattern-dependent emission) — ~10x slower than the native plan here,
which is exactly why it is NOT the default.

Both ride the same Kafka-value-shaped JSON file stream through the
declared-schema ``parse_event_json`` stage (sources/streams.py) —
swap in ``kafka_stream`` and nothing downstream changes. The sink is
a parquet directory read back as a distributed DataFrame — no
driver-side collect.

Batch-mode parity: the same gap rule as operators/sessions.py —
tests/test_streaming.py asserts streaming sessions equal the batch
sessionization, and the two streaming variants equal each other.

At scale: state is partitioned by user_id across executors; the
watermark bounds state lifetime, so state size ~ active users, not
history.
"""

from __future__ import annotations

import shutil
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from last_minute_legends_spark.sources.streams import (
    file_json_stream,
    parse_event_json,
)
from last_minute_legends_spark.streaming.pipeline import (
    append_sentinels,
    scaled_state_partitions,
    sentinel_paced,
    stage_events_json,
    staged_file_count,
)

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000

OUTPUT_SCHEMA = "user_id long, session_start_us long, session_end_us long, n_events long"
STATE_SCHEMA = "session_start_us long, last_ts_us long, n_events long"

SENTINEL_USER = -1


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, start, last, n)],
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()

    closed: list[tuple[int, int, int, int]] = []
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    for t in ts_us:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > _GAP_US:
            closed.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    if start is not None:
        state.update((start, last, n))
        # flush when the watermark passes the session's gap deadline
        timeout_ms = last // 1000 + GAP_MINUTES * 60 * 1000
        watermark_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, watermark_ms + 1))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )


def _drive(spark: SparkSession, staging: str, sessions: DataFrame,
           max_ts) -> DataFrame:
    """Run a sessions stream to completion: data batch, then two
    watermark-advancing sentinel files so every real session closes
    deterministically (append mode only emits a session once the
    watermark passes its gap deadline); result read back from the
    parquet sink (distributed)."""
    with sentinel_paced(spark), \
            scaled_state_partitions(spark, f"{staging}/in"):
        q = (
            sessions.writeStream.format("parquet")
            .option("path", f"{staging}/out")
            .option("checkpointLocation", f"{staging}/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        append_sentinels(spark, staging, max_ts, query=q)
        q.stop()

    out = (
        spark.read.schema(OUTPUT_SCHEMA).parquet(f"{staging}/out")
        .filter(F.col("user_id") != SENTINEL_USER)
    )
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out


def run_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap sessionization: watermarked
    ``groupBy(session_window(ts, gap), user_id)`` — merged session
    windows in the JVM state store, the whole plan codegen'd, zero
    Python in the hot path. ``session_window.start`` = first event
    ts; the session end reported is the LAST EVENT's ts (min/max
    aggregates), matching the batch sessionization contract (the
    window's own ``end`` is last event + gap)."""
    staging, max_ts = stage_events_json(spark, sf_dir)

    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=staged_file_count(staging)))
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", f"{GAP_MINUTES} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    return _drive(spark, staging, sessions, max_ts)


class _SessionProcessorV2:
    """transformWithStateInPandas StatefulProcessor for gap
    sessionization — the Spark 4 v2 arbitrary-state API sibling of
    ``_sessionize_group``: the same (start, last, n) triple, but held
    in a NAMED ValueState variable and flushed by an explicit
    event-time TIMER instead of the v1 GroupStateTimeout channel.
    The v2 surface is what new custom stateful operators should
    target: typed state variables (value/list/map), multiple timers
    per key, state TTL, composability — v1's single opaque tuple and
    one-timeout-per-key are the compatibility path.

    Timer discipline: a key holds at most ONE live timer — each input
    batch deletes the previous deadline before registering the new
    one (listTimers/deleteTimer); stale timers would otherwise fire
    on an already-extended session and emit it early. The registered
    expiry is ``max(last + gap, watermark + 1)`` — the v1 formulation's
    rule: never set a deadline the watermark has already passed, or
    the flush never fires (EventTime timers expire only on watermark
    ADVANCE past the expiry)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("session", STATE_SCHEMA)
        self._handle = handle

    def close(self) -> None:
        pass

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()

        cur = self._state.get() if self._state.exists() else None
        start, last, n = cur if cur is not None else (None, None, 0)
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > _GAP_US:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            self._state.update((start, last, n))
            for old in list(self._handle.listTimers()):
                self._handle.deleteTimer(old)
            deadline_ms = last // 1000 + GAP_MINUTES * 60 * 1000
            self._handle.registerTimer(
                max(deadline_ms, timerValues.getCurrentWatermarkInMs() + 1))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us",
                         "session_end_us", "n_events"],
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        cur = self._state.get() if self._state.exists() else None
        if cur is None:
            return
        start, last, n = cur
        self._state.clear()
        yield pd.DataFrame(
            [(user_id, start, last, n)],
            columns=["user_id", "session_start_us",
                     "session_end_us", "n_events"],
        )


def tws_available() -> bool:
    """Whether transformWithStateInPandas can actually RUN here: the
    v2 state API's Python↔JVM state protocol is protobuf-based
    (pyspark/sql/streaming/proto/StateMessage_pb2), so it needs the
    ``google.protobuf`` package — absent from this container (the v1
    applyInPandasWithState channel is Arrow-only and unaffected).
    Same gating discipline as kafka_available / jdbc_driver_available:
    probe, never crash with a deep worker stack."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def run_stream_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transformWithStateInPandas (v2 state API, Spark 4) variant:
    named ValueState + explicit event-time timers
    (_SessionProcessorV2). Requires the RocksDB state store provider —
    scoped around query START (the conf is read there), restored
    after, so the session's default provider is untouched. Same
    sources, sink, and gap rule as the native path and the v1
    applyInPandasWithState variant (parity gated-tested in
    tests/test_streaming.py). GATED on google.protobuf
    (tws_available): without it the v2 driver worker crashes at init
    (measured — StateMessage_pb2 import), so this raises the
    documented RuntimeError instead; on a cluster with protobuf
    installed the path runs unchanged."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the google.protobuf "
            "package (the v2 state protocol is protobuf-based); install "
            "protobuf or use run_stream_sessionize_python_state (v1) / "
            "run_stream_sessionize (native session_window)")
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass declared at call time so the module imports even if a
    # future build drops the v2 API (the ABC is the only dependency)
    proc_cls = type("SessionProcessorV2", (StatefulProcessor,),
                    dict(_SessionProcessorV2.__dict__))

    staging, max_ts = stage_events_json(spark, sf_dir)
    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=staged_file_count(staging)))
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc_cls(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    try:
        return _drive(spark, staging, sessions, max_ts)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def run_stream_sessionize_python_state(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """The applyInPandasWithState variant: per-user Python state with
    event-time timeouts — the template for session logic the native
    aggregates can't express. Same sources, sink, and gap rule as the
    native path (asserted equal in tests/test_streaming.py)."""
    staging, max_ts = stage_events_json(spark, sf_dir)

    stream = parse_event_json(
        file_json_stream(spark, f"{staging}/in",
                         max_files_per_trigger=staged_file_count(staging)))
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return _drive(spark, staging, sessions, max_ts)
