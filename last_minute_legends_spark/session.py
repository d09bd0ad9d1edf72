"""SparkSession factory tuned for both local testing and cluster scale.

The reference builds ad-hoc sessions per service
(`/root/reference/services/spark_streaming_processor.py:15`,
`/root/reference/services/spark_batch_processor.py:18`); here a single
factory applies scale-oriented defaults once:

- AQE on (runtime coalesce / skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong for some stage.
- Arrow execution for any pandas interchange (multimodal ops).
- Broadcast threshold raised so every star-schema dimension
  (region/nation/supplier/part/customer at per-executor-safe sizes)
  broadcast-joins instead of shuffling the fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "last_minute_legends_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local test runs use ``local[$SPARK_GRAFT_CPUS]`` (default all
    cores); on a real cluster the master comes from spark-submit and
    the builder's master setting is ignored.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
