"""Write-time bucketing: shuffle-free co-located joins.

At 100 TB the biggest recurring cost is re-shuffling the same fact
table on the same key for every join. Bucketing pays that shuffle
ONCE at write time: both sides hash-partitioned (and sorted) into the
same number of buckets on the join key, so Catalyst plans the join as
a zip of corresponding buckets — a SortMergeJoin with NO Exchange on
either side (asserted in tests/test_operators.py::
test_bucketed_join_has_no_shuffle).

The tables are registered as EXTERNAL (explicit ``path``) so the
parquet lives where the caller puts it; bucket metadata lives in the
session catalog. On a cluster the catalog is the metastore and the
layout survives across jobs — the write-once/join-many economics this
module exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   path: str) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as external table
    ``table`` at ``path``."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (a plain
    ``spark.read.parquet`` of the same files would lose it and
    re-shuffle on join)."""
    return spark.table(table)
