"""Incremental new-record detection.

Reference parity: the batch processor diffs the freshly parsed movie
catalog against already-published ids fetched from the warehouse and
publishes only the novel rows
(/root/reference/services/spark_batch_processor.py:83-102). There the
"existing ids" set is collected to the driver and used with
``~col.isin(existing)`` — which dies at scale. The Spark-first
re-expression is a LEFT ANTI join: fully distributed, broadcast-able
when the published-id side is small, shuffle-hash otherwise, and
Catalyst picks which.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_records(candidates: DataFrame, published: DataFrame, key: str,
                published_key: str | None = None) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` never appears in
    ``published[published_key]``.

    NULL-key policy (explicit, diverges from the reference's
    ``~col.isin(existing)`` which silently drops NULL-key rows):
    a NULL key never equi-matches, so NULL-key candidates are
    retained — i.e. NULL keys count as NEW. Callers wanting the
    reference's behavior add ``.filter(col(key).isNotNull())``.
    Covered by tests/test_operators.py::test_incremental_null_policy.
    """
    pk = published_key or key
    pub = published.select(F.col(pk).alias("__pub_key")).distinct()
    return candidates.join(
        pub, on=candidates[key] == F.col("__pub_key"), how="left_anti"
    )


def fold_rollup(rollup: DataFrame | None, delta: DataFrame,
                keys: list[str], sums: list[str]) -> DataFrame:
    """One step of incremental materialized-view maintenance for a
    SUM-MERGEABLE rollup: fold a new delta (the aggregate of newly
    arrived data) into the existing rollup by summing per key. The
    100 TB refresh pattern: each maintenance pass aggregates ONLY the
    new epoch's partitions and touches rollup state whose size is the
    AGGREGATE's (days × types), never the fact table's — a full
    recompute reads everything, this reads the delta.

    Count/sum (and any commutative-monoid measure) compose exactly;
    avg/min/max derive from stored sums or need their own mergeable
    state — callers store (count, sum) and derive avg at read time."""
    if rollup is None:
        return delta
    return (rollup.unionByName(delta)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in sums]))
