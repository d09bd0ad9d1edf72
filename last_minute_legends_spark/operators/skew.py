"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins with materialized shuffle statistics. Explicit
salting is the planner-independent tool when one join key dominates
(the classic null-key / celebrity-user / hot-document problem):

- the skewed (big) side gets a deterministic salt in [0, salt_n) from
  a high-cardinality discriminator column — same-key rows spread
  across salt_n partitions;
- the other side is replicated salt_n times (an explode over a
  literal range — salt_n is small, so the blow-up is bounded and
  map-side);
- the join key becomes (key, salt), so no single reducer sees a whole
  hot key.

Result is row-identical to the plain equi-join (asserted in
tests/test_operators.py::test_salted_join_equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                discriminator: str, salt_n: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``skewed`` (hot keys) with ``other`` on ``key``.

    ``discriminator`` is any column of the skewed side with per-row
    variety (an event id, a line number) — it only seeds the salt, so
    ties are harmless. Output columns = skewed's + other's minus the
    duplicate key, like a plain ``join(other, key)``.

    Only inner/left-family joins are supported: ``other`` is
    replicated salt_n times, so with how='right'/'full' its unmatched
    rows would appear salt_n times in the output (not row-identical
    to the plain join). Salting the other direction = swap the
    arguments.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti",
               "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not row-identical to a plain "
            f"join (the replicated side would duplicate unmatched rows); "
            f"use one of {sorted(allowed)} or swap the join sides"
        )
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(discriminator)), F.lit(salt_n))
    )
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return s.join(o, [key, "_salt"], how).drop("_salt")
