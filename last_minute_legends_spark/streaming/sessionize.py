"""Stateful streaming sessionization via applyInPandasWithState.

The custom stateful operator Spark's built-ins don't cover: gap-based
sessions emitted as they CLOSE (event-time timeout), not at batch end.
State per user = (session_start_us, last_ts_us, n_events); an event
past the gap closes the open session and starts a new one; the
event-time timeout (watermark passing last_ts + gap) flushes sessions
with no successor event.

The source is the same Kafka-value-shaped JSON file stream as
streaming/pipeline.py, fed through the declared-schema
``parse_event_json`` stage (sources/streams.py) — swap in
``kafka_stream`` and nothing downstream changes. The sink is a
parquet directory read back as a distributed DataFrame — no
driver-side collect.

Batch-mode parity: the same gap rule as operators/sessions.py —
tests/test_streaming.py asserts the streaming session count equals
the batch sessionization count.

At scale: state is partitioned by user_id across executors (RocksDB /
HDFS-backed state store on a cluster); the watermark bounds state
lifetime, so state size ~ active users, not history.
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
    stage_events_json,
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


def run_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful sessionizer over the staged JSON event files
    in three micro-batch groups (data, then two watermark-advancing
    sentinel files) so every real session closes deterministically;
    result is read back from the parquet sink (distributed)."""
    staging = stage_events_json(spark, sf_dir)
    raw_events = parse_event_json(spark.read.text(f"{staging}/in"))
    max_ts = raw_events.agg(F.max("ts").alias("m")).collect()[0].m

    stream = parse_event_json(file_json_stream(spark, f"{staging}/in"))
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
    q = (
        sessions.writeStream.format("parquet")
        .option("path", f"{staging}/out")
        .option("checkpointLocation", f"{staging}/ckpt")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # sentinel batches: advance the watermark far past every real
    # session's gap deadline so event-time timeouts flush them
    append_sentinels(spark, staging, max_ts)
    q.processAllAvailable()
    q.stop()

    out = (
        spark.read.schema(OUTPUT_SCHEMA).parquet(f"{staging}/out")
        .filter(F.col("user_id") != SENTINEL_USER)
    )
    shutil.rmtree(f"{staging}/in", ignore_errors=True)
    shutil.rmtree(f"{staging}/ckpt", ignore_errors=True)
    return out
