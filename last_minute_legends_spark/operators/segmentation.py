"""RFM-style consumer segmentation.

The reference's north star is consumer segmentation (README). Its
event stream carries purchases (checkout events with payment_method,
/root/reference/UserEvents.py:146-162); the standard batch
segmentation over that is RFM: Recency / Frequency / Monetary with
threshold-derived segments.

One groupBy(user) — single shuffle with map-side combine; the segment
label is a pure CASE expression (codegen). Deterministic thresholds
(not ntile) so results are stable under re-partitioning — at scale,
quantile-based cuts would use approx_percentile and a broadcast of
the cut points instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(
    events: DataFrame,
    as_of: str = "2024-02-01",
    purchase_type: str = "purchase",
    freq_hi: int = 15,
    monetary_hi: float = 1500.0,
) -> DataFrame:
    p = events.filter(F.col("event_type") == purchase_type)
    per_user = p.groupBy("user_id").agg(
        F.datediff(F.lit(as_of).cast("date"), F.max(F.col("ts")).cast("date")).alias(
            "recency_days"
        ),
        F.count("*").alias("frequency"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    segment = (
        F.when(
            (F.col("frequency") >= freq_hi) & (F.col("monetary") >= monetary_hi),
            F.lit("champion"),
        )
        .when(F.col("frequency") >= freq_hi, F.lit("loyal"))
        .when(F.col("monetary") >= monetary_hi, F.lit("big_spender"))
        .when(F.col("recency_days") <= 7, F.lit("recent"))
        .otherwise(F.lit("standard"))
    )
    return per_user.withColumn("segment", segment)
