"""As-of join — Spark-first, no pandas.

Spark has no native ASOF JOIN (DuckDB/Polars do). The scalable
DataFrame expression is the *union-sort* trick:

1. tag left rows (need a match) and right rows (provide values),
2. union on the common key + timestamp,
3. one window per key ordered by (ts, tiebreak): ``last(value,
   ignorenulls=True)`` carries the most recent right-side value
   forward,
4. keep left rows.

Cost: ONE shuffle on the key (the window partition). No range
explosion, no per-key collect — this is exactly the merge-join shape
a 100 TB as-of needs, and AQE handles key skew. Whole-stage codegen
covers everything (window + filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row's ``value_cols`` from the
    latest right event with ``right.ts <= left.ts`` and equal key ``on``.

    Rows from ``right`` at exactly the same timestamp sort before the
    left row (i.e. are eligible matches) — covered by
    tests/test_operators.py::test_asof_same_ts_matches.

    Determinism note: if MULTIPLE right rows share (key, ts), which
    one supplies the value is tie-broken by the union sort only up to
    (ts, side); callers needing a total order should pre-aggregate
    the right side to one row per (key, ts) (e.g. max of the value
    col) — the plans in this repo export the matched *timestamp*,
    which is identical across ties.
    """
    lcols = [c for c in left.columns]
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
    )
    for v in value_cols:
        l = l.withColumn(f"__v_{v}", F.lit(None).cast(right.schema[v].dataType))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    for c in lcols:
        if c not in (on,):
            if c not in r.columns:
                r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(
        *[F.col(c) for c in lcols], "__ts", "__side",
        *[F.col(f"__v_{v}") for v in value_cols],
    ).unionByName(
        r.select(
            *[F.col(c) for c in lcols], "__ts", "__side",
            *[F.col(f"__v_{v}") for v in value_cols],
        )
    )
    # right rows (__side=0) sort before left rows at equal ts
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}", F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w)
        )
    return out.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"{v}{suffix}") for v in value_cols]
    )


def asof_last_event(
    events: DataFrame,
    anchor_type: str,
    lookup_type: str,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Specialized single-table as-of: for each ``anchor_type`` event,
    the id of the most recent ``lookup_type`` event by the same key at
    or before its timestamp. One window, one shuffle.
    """
    e = events.filter(F.col("event_type").isin([anchor_type, lookup_type]))
    lookup_id = F.when(F.col("event_type") == lookup_type, F.col(id_col))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("__lookup", F.last(lookup_id, ignorenulls=True).over(w))
        .filter(F.col("event_type") == anchor_type)
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(key),
            F.col("__lookup").alias("matched_id"),
        )
    )
