"""SparkSession factory tuned for both local testing and cluster scale.

The reference builds ad-hoc sessions per service
(`/root/reference/services/spark_streaming_processor.py:15`,
`/root/reference/services/spark_batch_processor.py:18`); here a single
factory applies scale-oriented defaults once:

- AQE on (runtime coalesce / skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong for some stage.
- Arrow execution for any pandas interchange (multimodal ops).
- Broadcast threshold raised so every star-schema dimension
  (region/nation/supplier at per-executor-safe sizes) broadcast-joins
  instead of shuffling the fact table.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver testdata
  stores ``events.ts`` as parquet TIMESTAMP(NANOS), which Spark cannot
  read natively (PARQUET_TYPE_ILLEGAL); with this flag it surfaces as
  int64 nanoseconds and ``sources/tables.py`` normalizes it to a
  proper timestamp (exact integer math, no double rounding).
"""

from __future__ import annotations

import os

from pyspark import SparkConf
from pyspark.sql import SparkSession


def get_spark(app_name: str = "last_minute_legends_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local test runs use ``local[$SPARK_GRAFT_CPUS]`` (default all
    cores). On a real cluster, spark-submit supplies the master via
    the ``spark.master`` conf / MASTER env — in that case we do NOT
    call ``.master()`` (a programmatic master would override
    spark-submit and force local mode).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by SIZE, not core count
        # (guide §2.2 "fewer, larger reduce partitions"): the default
        # parallelismFirst=true re-expands every small shuffle to
        # ~cores partitions, so a KB-sized exchange still schedules 32
        # reduce tasks — pure fixed overhead repeated across the many
        # small stages of the delta/absorb operators (measured: 33-task
        # jobs over <1 MB shuffles throughout). Sizing by
        # advisoryPartitionSizeInBytes is the scale-correct policy: at
        # 100 TB a shuffle stage gets bytes/64MB partitions (plenty of
        # parallelism), locally a tiny stage collapses to 1 task.
        # Env-overridable for A/B runs.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST",
                               "false"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Cached-plan AQE (coalesce/skew-split UNDER a persist()) is
        # left at the upstream default (false). r18 A/B'd true: it
        # collapses the full-width exchanges persisted intermediates
        # materialize through, and helped the stream-join family
        # (~20%), but the incremental/landing family regressed up to
        # 2x (incremental_quantile 6.1 -> 11.3 s subset A/B, 5.7 ->
        # 8.0 in-suite) — net mixed, so the suite keeps the safe
        # default; flip per-run via env to re-examine.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                os.environ.get("SPARK_GRAFT_AQE_CACHED", "false"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Size-gate probes (`limit(static_max+1).collect()/count()` in
        # the delta-dedup/ANN operators) collect FEWER rows than their
        # limit whenever the gate passes, so the default incremental
        # limit execution (initial 1 partition, x4 escalation) always
        # walks every partition anyway — across 4-5 sequential Spark
        # jobs per probe (measured r17-opt: dedup_clusters_delta runs
        # 13 probe jobs out of 46 total). Starting at one full wave of
        # partitions turns each probe into a single job; derived from
        # the same shuffle-partitions knob, so it stays one scheduling
        # wave at any scale. TakeOrderedAndProject (`orderBy().limit`)
        # is unaffected — it never used incremental execution.
        .config("spark.sql.limit.initialNumPartitions",
                str(shuffle_partitions))
        # Whole-stage-codegen COMPILE cache (static conf, default 100
        # entries). An 80-query workload holds far more than 100
        # distinct generated classes, so the LRU thrashes and every
        # revisit of a big plan pays Janino again — measured r12: the
        # minhash-replay cell executes in ~3-4 s warm but 10-20 s
        # whenever 45 other plans have run since its last compile
        # (code cache NOT full — 71/116 MB — it is purely this LRU).
        # 2000 entries ≈ the suite's working set with headroom; cost
        # is class metadata, freed with the classes on GC.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # RocksDB state store for stateful streaming (stream-stream
        # joins, session windows, dedup state). The default HDFS-backed
        # provider holds all state on-heap (GC pressure at scale, state
        # bounded by executor memory) and its per-commit delta-file
        # handling measured 0.4-1.7 s of task time PER STORE COMMIT on
        # this workload (32 partitions x 4 join stores = 128 commits a
        # micro-batch: commitTimeMs 54-216 s per batch for ~7k state
        # rows). RocksDB is the production-standard provider for large
        # state (incremental checkpoints, off-heap, spills to disk);
        # measured on the stream-stream join pipeline: 50-55 s -> 27-35
        # s end-to-end. Env-overridable for A/B runs.
        .config("spark.sql.streaming.stateStore.providerClass",
                os.environ.get(
                    "SPARK_GRAFT_STATE_STORE",
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"))
        # Spark 4.1 writes a sibling checksum file for EVERY checkpoint
        # file (offsets/commits/every state-store file) through a
        # blocking await on a shared pool — thread dumps of the
        # stream-stream join showed all 32 tasks parked in
        # ChecksumCheckpointFileManager.awaitResult, each commit
        # doubling its file ops (and each local-FS create forking a
        # shell chmod: no native hadoop lib here). Measured A/B on
        # stream_join_multibatch: 33.2/26.6 s on vs 20.0/19.6/17.9 s
        # off. The checkpoint COMMIT protocol (atomic rename + fsync)
        # is unaffected — the checksum is a bitrot detector for
        # unreliable object stores; enable it there via env.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
                os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
        # Changelog checkpointing: commit uploads the batch's CHANGES
        # (a changelog file) instead of zipping a full RocksDB
        # snapshot; snapshots move to the background maintenance
        # thread. The production-standard setting for large state —
        # per-commit work becomes O(delta), not O(store). Measured A/B
        # (checksum off): stream_join_multibatch 24.4/19.3 s full
        # snapshots vs 17.4/16.7 s changelog.
        .config("spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                os.environ.get("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"))
        # numRowsTotal bookkeeping costs a RocksDB get per put; with it
        # off the metric reads -1 and nothing else changes (the Spark
        # tuning docs' recommendation for write-heavy state). Measured
        # A/B: 18.5 -> 16.7 s on the same cell.
        .config("spark.sql.streaming.stateStore.rocksdb."
                "trackTotalNumberOfRows",
                os.environ.get("SPARK_GRAFT_ROCKSDB_TRACK_ROWS", "false"))
        # NOTE: spark.sql.streaming.noDataMicroBatches stays at the
        # engine default here. The run-to-completion streaming drivers
        # disable it around their own queries (streaming/pipeline.py
        # sentinel_paced) — scoping it there keeps the library-wide
        # default correct for always-on deployments, which need
        # windows/sessions/timeouts to emit on watermark progress.
        # Diagnostics (tools/probe_jobs.py) re-enable the UI via env to
        # read per-job timings from the REST API; default stays off so
        # the driver's 2000-char capture window is never polluted.
        .config("spark.ui.enabled",
                os.environ.get("SPARK_GRAFT_UI", "false"))
        # The driver's bench gate captures the LAST 2000 chars of
        # combined stdout+stderr; the stage progress bar (stderr)
        # shares that window with bench.py's one machine-readable
        # JSON line (BENCH_r07's tail shows progress-bar frames
        # eating ~180 chars of it). No human watches these runs.
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Only force a master when none was provided externally (tests,
    # bare `python` runs). spark-submit injects its --master into the
    # driver's default SparkConf (env vars like MASTER are NOT set in
    # the driver process — PYSPARK_SUBMIT_ARGS only exists under the
    # pyspark shell wrapper), so probe SparkConf; an active session
    # also implies a master and must not be overridden to local.
    if (SparkSession.getActiveSession() is None
            and not SparkConf().contains("spark.master")):
        builder = builder.master(f"local[{cpus}]")
        # In local mode the driver JVM IS the executor: the default
        # ~1 GiB heap put the r4 bench one GC pause from death (an
        # OOM in a 64-column hash aggregate killed the JVM mid-suite
        # and GC pressure fabricated 6x phantom regressions). These
        # only take effect at JVM launch, so they belong to the
        # local-mode branch — under spark-submit the submitter sizes
        # the driver and this conf would be silently ignored anyway.
        builder = (
            builder.config("spark.driver.memory",
                           os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
            .config("spark.driver.maxResultSize", "4g")
        )
    return builder.getOrCreate()
