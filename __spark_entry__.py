"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Apply session confs the engine needs when the driver owns the
    SparkSession (nanos-timestamp parquet reads, UTC determinism)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # (no-data micro-batches: the run-to-completion streaming drivers
    # scope that opt-out around their own queries — streaming/
    # pipeline.py sentinel_paced — so no session-level replay here)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1 pricing summary) on sf0.001."""
    _prepare(spark)
    from last_minute_legends_spark.plans.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from last_minute_legends_spark.plans.queries import QUERIES

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query key."""
    from last_minute_legends_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
