"""Gap-based sessionization over the event stream.

Reference context: the streaming processor
(/root/reference/services/spark_streaming_processor.py:27-36) parses
per-user activity events (sign_in/sign_out/item_view/...); consumer
segmentation needs those grouped into sessions. Spark-first shape:

    lag(ts) over (user)  →  gap > timeout ⇒ new-session flag
    running sum of flags →  session number per user

Two window passes over ONE shuffle partitioning (both windows share
``partitionBy(user)``), all in whole-stage codegen. At 100 TB this is
the canonical approach — no state store needed for batch; the
streaming variant lives in streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_id`` (per-user ordinal, starting at 1)."""
    by_user = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(by_user).cast("long")
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    running = by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(running)
    ).drop("__new")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: session count + avg events/session."""
    s = sessionize(events, gap_minutes)
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_session_events"),
    )
