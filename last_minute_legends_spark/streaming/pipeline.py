"""Structured Streaming pipeline: file source → watermark → windowed
aggregation → sink.

Reference parity: /root/reference/services/spark_streaming_processor.py
:44-55 reads Kafka, parses with a declared schema (:27-36), and lands
in a warehouse sink. Re-expressed Spark-first: the source here is a
file stream (Kafka needs a broker; the file source exercises the
identical unbounded-DataFrame plan — swap ``readStream.parquet`` for
``readStream.format("kafka")`` + ``from_json`` in production), the
aggregation is a watermarked 1-hour tumbling window, and the sink is
the in-memory table sink (≙ warehouse append).

At scale: watermark bounds state; the windowed agg is a streaming
shuffle on (window, event_type) with partial aggregation per
micro-batch; sink append is idempotent per window once the watermark
closes it.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.tables import load_table

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stage_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the events table as a parquet landing directory
    (nanos normalized to proper timestamps) for the file stream."""
    staging = tempfile.mkdtemp(prefix="llm_spark_stream_")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    events.write.mode("overwrite").parquet(f"{staging}/in")
    return staging


def run_windowed_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full streaming pipeline to completion on the staged
    events and return the final windowed aggregate as a DataFrame."""
    staging = stage_events_dir(spark, sf_dir)
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{staging}/in")
        )
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
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # materialize off the memory sink so the result outlives cleanup
        return spark.createDataFrame(
            spark.table(name).collect(),
            "window_start_us long, event_type string, n_events long, sum_value double",
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
