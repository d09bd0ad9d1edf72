"""Time-partitioned parquet sink: the write-side layout that makes
100 TB scans prunable.

The reference lands its streams in warehouse tables keyed by event
time; Spark-first that is hive-style partitioned parquet —
``.../event_date=2024-01-01/part-*.parquet`` — so that ANY reader
with an event_date predicate touches only the matching directories
(partition pruning happens at planning time, before a single row is
read; visible as ``PartitionFilters`` on the scan, asserted in
tests/test_operators.py).

Design notes for the 100 TB case:

- Partition columns are DERIVED (date/hour strings from the event
  timestamp), and the raw timestamp column stays in the data — the
  partition value is a directory name, not a replacement for the
  column.
- Granularity bounds both file counts and pruning payoff: daily
  partitions at ~TB/day beat hourly (24x the directories, same
  pruning for date-range queries); go hourly only when typical
  predicates are sub-day. Too-fine partitioning is the classic
  small-files failure.
- ``repartition(partition cols)`` before the write gives ONE shuffle
  that routes each partition's rows to few writer tasks — without it
  every task writes a file into every open partition (tasks x
  partitions small files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GRANULARITIES = {
    "day": [("event_date", "yyyy-MM-dd")],
    "hour": [("event_date", "yyyy-MM-dd"), ("event_hour", "HH")],
}


def write_time_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                           granularity: str = "day",
                           mode: str = "overwrite") -> list[str]:
    """Write ``df`` as hive-partitioned parquet under ``path`` with
    partition directories derived from ``ts_col``; returns the
    partition column names (in directory nesting order)."""
    if granularity not in _GRANULARITIES:
        raise ValueError(
            f"granularity {granularity!r} not in {sorted(_GRANULARITIES)}"
        )
    spec = _GRANULARITIES[granularity]
    out = df
    for name, fmt in spec:
        out = out.withColumn(name, F.date_format(F.col(ts_col), fmt))
    names = [n for n, _ in spec]
    (
        out.repartition(*[F.col(n) for n in names])
        .write.mode(mode)
        .partitionBy(*names)
        .parquet(path)
    )
    return names


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned dataset back; partition columns surface as
    regular string columns and predicates on them prune directories at
    planning time."""
    return spark.read.parquet(path)
