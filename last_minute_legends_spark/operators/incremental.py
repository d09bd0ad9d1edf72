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
