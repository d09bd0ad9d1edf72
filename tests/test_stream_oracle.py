"""Structured Streaming pipelines vs DuckDB oracles — cross-engine.

The stream≡batch parity tests (tests/test_streaming.py) prove each
streaming run emits exactly what its batch twin computes, but both
sides of that compare are Spark. Here every run-to-completion
streaming entry is compared DIRECTLY against a DuckDB oracle with the
driver's own rows+schema+values gate, so the staged-topic delivery,
watermarking, state store, and sink round-trip must reproduce a
second engine's answer — not just Spark's own:

- stream_pipeline   vs the events_windowed hour-window aggregate
- stream_enrich     vs the customer→nation join + hour window
- stream_sessionize vs a lag/cumsum 30-min-gap sessionization
- stream_dedup      vs the raw events projection (exactly-once: the
                    redelivered topic must collapse back to the table)
- stream_curate     vs the stateless-gate curation SQL (the batch
                    flagship's oracle minus the keeper election —
                    exact dedup is stateful by nature and the
                    in-flight plan is deliberately stateless)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from last_minute_legends_spark.plans.curation_q import STREAM_CURATE_ORACLE_SQL
from last_minute_legends_spark.plans.events_analytics import EVENTS_WINDOWED_SQL
from last_minute_legends_spark.plans.stream_q import (
    stream_dedup,
    stream_enrich,
    stream_pipeline,
    stream_sessionize,
)
from tests.oracle import compare, run_oracle

STREAM_ENRICH_SQL = """
SELECT epoch_us(date_trunc('hour', e.ts)) AS window_start_us,
       n.n_name AS nation,
       count(*) AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
ORDER BY window_start_us, nation
"""

# sessionization's driver oracle minus the session_seq column (the
# streaming session_window aggregation has no global sequence) —
# same 30-min gap rule, lag + cumulative-sum formulation.
STREAM_SESSIONIZE_SQL = """
WITH x AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) // 1000000
                     - epoch_us(lag(ts) OVER w) // 1000000 > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM x
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, session_seq
ORDER BY user_id, session_start_us
"""

STREAM_DEDUP_SQL = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       value, props
FROM events ORDER BY event_id
"""


def _check(sdf, sql, sf_dir, label):
    issues = compare(sdf, run_oracle(sql, sf_dir))
    assert not issues, f"{label}: " + "\n".join(issues)


def test_stream_pipeline_vs_duckdb(spark, sf_dir):
    sdf = stream_pipeline(spark, sf_dir).orderBy("window_start_us",
                                                 "event_type")
    _check(sdf, EVENTS_WINDOWED_SQL, sf_dir, "stream_pipeline")


def test_stream_enrich_vs_duckdb(spark, sf_dir):
    sdf = stream_enrich(spark, sf_dir).orderBy("window_start_us", "nation")
    _check(sdf, STREAM_ENRICH_SQL, sf_dir, "stream_enrich")


def test_stream_sessionize_vs_duckdb(spark, sf_dir):
    sdf = stream_sessionize(spark, sf_dir).orderBy("user_id",
                                                   "session_start_us")
    _check(sdf, STREAM_SESSIONIZE_SQL, sf_dir, "stream_sessionize")


def test_stream_dedup_vs_duckdb(spark, sf_dir):
    sdf = stream_dedup(spark, sf_dir).select(
        "event_id", F.unix_micros("ts").alias("ts_us"),
        "user_id", "event_type", "value", "props",
    ).orderBy("event_id")
    _check(sdf, STREAM_DEDUP_SQL, sf_dir, "stream_dedup")


def test_stream_curate_vs_duckdb(spark, sf_dir):
    from last_minute_legends_spark.plans.stream_q import stream_curate

    sdf = stream_curate(spark, sf_dir).orderBy("doc_id")
    _check(sdf, STREAM_CURATE_ORACLE_SQL, sf_dir, "stream_curate")


def test_stream_stream_join_batch_parity(spark, sf_dir):
    """The watermarked stream-stream inner join must emit EXACTLY the
    batch join's pairs — however the micro-batches slice, the bounded
    corpus joins to one fixed pair set (eager inner-join emission;
    watermarks only bound state). The DuckDB value oracle for the
    same entry runs via test_oracle.py (STREAM_STREAM_JOIN_SQL)."""
    from last_minute_legends_spark.streaming.pipeline import (
        batch_join_twin, run_stream_join_pipeline,
    )

    got = {tuple(r) for r in run_stream_join_pipeline(spark, sf_dir).collect()}
    exp = {tuple(r) for r in batch_join_twin(spark, sf_dir).collect()}
    assert got == exp and len(exp) > 0


def test_stream_outer_join_batch_parity(spark, sf_dir):
    """The LEFT-OUTER stream-stream join must emit exactly the batch
    left-outer join's rows: every matched pair (eager emission) PLUS
    one null-purchase row per never-converted view, emitted only at
    watermark-driven state eviction (sentinel-advanced past
    max_ts + bound). Parity therefore proves the eviction actually
    fired for EVERY unmatched view — a frozen watermark (the
    filter-below-watermark pushdown trap, see
    run_stream_outer_join_pipeline) shows up as missing tail nulls,
    not an error. The DuckDB value oracle for the same entry runs via
    test_oracle.py (STREAM_OUTER_JOIN_SQL)."""
    from last_minute_legends_spark.streaming.pipeline import (
        batch_outer_join_twin, run_stream_outer_join_pipeline,
    )

    got = {tuple(r)
           for r in run_stream_outer_join_pipeline(spark, sf_dir).collect()}
    exp = {tuple(r) for r in batch_outer_join_twin(spark, sf_dir).collect()}
    assert got == exp and len(exp) > 0
    # the outer join is only exercised if some views never converted
    assert any(r[2] is None for r in exp)
