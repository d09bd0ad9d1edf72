"""Write-time DATE partitioning for the events fact table.

The third write-time layout next to ``bucketed.py`` (co-located joins)
and ``ivf_index.py`` (ANN probes): at 100 TB an event stream lands
partitioned by day — ``partitionBy(event_day_us)`` parquet — so every
time-ranged query prunes to its days at PLANNING time (a static
``event_day_us >= lo`` PartitionFilter on the scan; the other N-2 day
directories are never listed, opened, or read — asserted in
tests/test_plans.py::test_events_partition_pruned_scan). The day
boundary rides as epoch micros of ``date_trunc('day', ts)`` — a plain
long, immune to partition-value string/timezone round-trips, and the
exact expression the rollup oracles already prove both engines agree
on (plans/events_analytics.py rollup_timeseries).

Range resolution reads the partition LISTING (the metastore analogue),
not the data: ``list_days`` is a driver-side directory scan of
bounded size (one entry per day — at 100 TB, thousands, not billions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_US = 86_400_000_000
_PART = "event_day_us"


def write_day_partitioned(events: DataFrame, path: str) -> None:
    """Persist events partitioned by the UTC day of ``ts`` (epoch
    micros of the day boundary). One exchange — the write-time
    repartition by day — paid once per corpus."""
    (events.withColumn(_PART, F.unix_micros(F.date_trunc("day", F.col("ts"))))
     .write.partitionBy(_PART).mode("overwrite").parquet(path))


def list_days(path: str) -> list[int]:
    """The day partitions present, from the directory listing (what a
    metastore partition listing returns on a cluster). Rows with a
    NULL ts land in Hive's default partition
    (``event_day_us=__HIVE_DEFAULT_PARTITION__``) — they have no day,
    so they are not a day partition and are skipped here (a day-range
    read never selects them; the oracle's ``day_us >= lo`` comparison
    excludes NULL days the same way)."""
    days = []
    for d in os.listdir(path):
        if not d.startswith(f"{_PART}="):
            continue
        val = d.split("=", 1)[1]
        if val == "__HIVE_DEFAULT_PARTITION__":
            continue
        days.append(int(val))
    return sorted(days)


def read_day_range(spark: SparkSession, path: str, lo_us: int,
                   hi_us: int | None = None) -> DataFrame:
    """Events with day partition in [lo_us, hi_us] — literal bounds,
    so the filter is a planning-time PartitionFilter, never a scan."""
    df = spark.read.parquet(path).filter(F.col(_PART) >= F.lit(lo_us))
    if hi_us is not None:
        df = df.filter(F.col(_PART) <= F.lit(hi_us))
    return df
