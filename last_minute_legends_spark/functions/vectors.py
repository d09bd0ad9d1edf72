"""Vector math as native Spark SQL expressions (zip_with/aggregate).

No UDFs: the dot product, norm, and cosine are Catalyst expressions
that run in whole-stage codegen and sum left-to-right — the same
sequential order DuckDB's list_dot_product uses, so oracle values
match to the last ulp (outputs are additionally rounded).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, norm_a: Column, b: Column, norm_b: Column) -> Column:
    """cos = dot(a,b) / (|a|*|b|) — norms precomputed once per vector
    so the pairwise stage only pays the dot product."""
    return dot(a, b) / (norm_a * norm_b)
