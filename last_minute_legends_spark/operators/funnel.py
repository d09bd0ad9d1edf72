"""Ordered funnel analysis over the event stream.

The reference's segmentation goal (README: "consumer segmentation ...
real-time and batch") implies conversion funnels over its
item_view → added_to_cart → checkout event chain
(/root/reference/UserEvents.py:110-162). Generalized here to any
ordered list of event types on the driver ``events`` table.

Shape: one groupBy(user) computing min(ts) per stage (map-side partial
aggregation — a single shuffle), then ordered-reach flags, then a
global single-row count. No windows, no self-joins: at 100 TB the
per-user agg is the only shuffle and it combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(events: DataFrame, stages: list[str]) -> DataFrame:
    """Single-row DataFrame: n_stage1, n_stage2, ... where stage k
    counts users whose first stage-k event happened at/after their
    first stage-(k-1) event (ordered conversion).
    """
    aggs = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"__t{i}")
        for i, s in enumerate(stages)
    ]
    per_user = events.groupBy("user_id").agg(*aggs)
    reached_prev = F.col("__t0").isNotNull()
    flags = [reached_prev.alias("__r0")]
    for i in range(1, len(stages)):
        reached_prev = (
            reached_prev
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") >= F.col(f"__t{i-1}"))
        )
        flags.append(reached_prev.alias(f"__r{i}"))
    flagged = per_user.select(*flags)
    return flagged.agg(
        *[
            F.sum(F.col(f"__r{i}").cast("long")).alias(f"n_{s}")
            for i, s in enumerate(stages)
        ]
    )
