"""Parquet star-schema catalog.

Tables mirror the driver testdata layout (TESTDATA.md): TPC-H-ish
dims + facts, an ``events`` stream table, and the LLM-pipeline
``documents`` / ``embeddings`` tables. The reference's domain maps on:
its movie catalog ≙ ``part``, consumers ≙ ``customer``, user-activity
topics ≙ ``events`` partitioned by ``event_type``
(cf. /root/reference/UserEvents.py:59-162).

Scale notes: plain ``spark.read.parquet`` keeps predicate pushdown and
column pruning available to Catalyst — no eager caching here. At
100 TB each table is a partitioned parquet dataset; the same reader
works unchanged (directory = dataset root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/part/customer grow with SF but
# stay << fact tables — AQE + the raised autoBroadcastJoinThreshold
# decide at runtime, we only *hint* for the fixed-size ones).
BROADCAST_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Catalog:
    """Lazy handle to one scale factor's tables.

    ``cat.lineitem`` etc. return fresh DataFrames so each query's plan
    starts from the scan (keeps pruning/pushdown per query).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql use."""
        for name in TABLE_NAMES:
            load_table(self.spark, self.sf_dir, name).createOrReplaceTempView(name)
