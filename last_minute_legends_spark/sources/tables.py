"""Parquet star-schema catalog.

Tables mirror the driver testdata layout (TESTDATA.md): TPC-H-ish
dims + facts, an ``events`` stream table, and the LLM-pipeline
``documents`` / ``embeddings`` tables. The reference's domain maps on:
its movie catalog ≙ ``part``, consumers ≙ ``customer``, user-activity
topics ≙ ``events`` partitioned by ``event_type``
(cf. /root/reference/UserEvents.py:59-162).

``events.ts`` has arrived in two parquet encodings across testdata
generations, and ``load_table`` normalizes both to one shape
(session-UTC ``timestamp`` + int64 ``ts_ns``):

- TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong=true``
  (session.py) it reads as int64 nanoseconds; normalized via exact
  integer division to microseconds (``ts div 1000``), matching
  DuckDB's own nanos→micros truncation.
- timestamp[us]: reads as TIMESTAMP_NTZ; cast to session-zone
  TIMESTAMP (tz is UTC — value-preserving), ``ts_ns`` synthesized.

Either way, Spark results and the DuckDB oracle (which reads the same
parquet) see identical timestamp values.

Scale notes: plain ``spark.read.parquet`` keeps predicate pushdown and
column pruning available to Catalyst — no eager caching here. At
100 TB each table is a partitioned parquet dataset; the same reader
works unchanged (directory = dataset root).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Fixed-size dimensions that are always broadcast-safe; the larger
# SF-scaled dims (supplier/part/customer) are left to AQE + the raised
# autoBroadcastJoinThreshold to decide at runtime.
BROADCAST_DIMS = ("region", "nation")


def spread_cpu_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan that cannot parallelize.

    A parquet scan parallelizes at best per row group; the testdata
    tables are single-file single-row-group, so every narrow stage
    (regexp tokenization, shingle explode, signature math) otherwise
    runs on 1 of the cluster's cores. When the dataset has fewer
    files than cores, the data is by construction small enough that
    one round-robin exchange is trivial next to the CPU work it
    unlocks (measured 16x on the repetition filters). At 100 TB the
    dataset has orders of magnitude more files than cores and this
    is a structural no-op — no code path change, no config.

    Applied EXPLICITLY at the entry of CPU-heavy pipelines (regexp
    tokenization, shingling) — never inside ``load_table``: a blanket
    spread taxes cheap one-shuffle aggregates with an exchange they
    don't need (measured 2-3x on dedup_exact / train_val_split when
    r6 spread every documents consumer). "CPU-heavy" is a measured
    property, not a structural one: the multimodal mapInPandas passes
    and the embedding sign-LSH fold LOOK heavy but their per-row work
    is trivial (stubbed decode / 64 fused multiply-adds), and
    spreading them costs 4x in exchange overhead (measured sf0.1,
    r8) — those entries document their own opt-out in place.

    Catalyst pushes column pruning and predicate pushdown below the
    Repartition, so the exchange carries only what the query reads.
    """
    cores = spark.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if 0 < n_files < cores:
        return df.repartition(cores)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            # int64 nanos → timestamp (micros), exact integer math;
            # keep the raw nanos as ts_ns for integer-domain math.
            df = (df.withColumn("ts_ns", F.col("ts"))
                    .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
        elif ts_dtype in ("timestamp_ntz", "timestamp"):
            # parquet timestamp[us] reads as TIMESTAMP_NTZ (and the
            # adjusted-to-UTC variant as TIMESTAMP — same instant under
            # the UTC session tz, session.py); cast to the session-zone
            # TIMESTAMP (value-preserving, a no-op for the already-
            # timestamp shape) so unix_micros()/window() call sites
            # work identically for every ingest shape, and synthesize
            # ts_ns so all shapes expose the same columns.
            df = (df.withColumn("ts", F.col("ts").cast("timestamp"))
                    .withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)))
        else:  # a new testdata encoding would break 12+ entries at
            # plan time with a cryptic AnalysisException each — fail
            # here with the one place to fix instead
            raise TypeError(
                f"events.ts arrived as unhandled dtype {ts_dtype!r}; "
                "extend load_table's normalization (sources/tables.py) "
                "to produce (ts timestamp, ts_ns bigint)")
    return df


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
