"""Z-order (Morton-curve) clustering for multi-column data skipping.

The fourth write-time layout (next to bucketed joins, the IVF index,
and day partitioning): partitioning prunes on ONE axis; a corpus
queried selectively on TWO axes (user AND time, tenant AND key, ...)
needs its row groups to be narrow in BOTH. Sorting by the interleaved
bits of the two quantized columns (the Morton z-value) places rows
that are close in EITHER dimension into the same neighborhood of the
sort, so after a range-partitioned write every file's parquet min/max
stats are tight on BOTH columns — a reader with a predicate on either
column (or both) skips most files/row groups from footer stats alone,
with no partition explosion (day × user partitioning would create
billions of tiny partitions at 100 TB; z-order gets 2-D skipping out
of ONE flat file set).

Everything is JVM bit arithmetic inside whole-stage codegen
(shift/and/or chains — no UDFs); the only driver traffic is the
4-scalar min/max collect that anchors quantization. The write costs
one range exchange + local sort — the same shape as any sorted
rewrite — paid once per corpus.

Reference parity: the reference has no layout surface at all (thin
Kafka/Snowflake glue); this extends the engine the same way the other
``sources/`` layouts do (SURVEY §6).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-column quantization width → 32-bit z-values


def quantize(col: Column, mn: float, mx: float,
             bits: int = Z_BITS) -> Column:
    """Scale ``col`` to the integer grid [0, 2^bits): the z-curve
    needs fixed-width non-negative coordinates. Degenerate (constant)
    columns quantize to 0."""
    span = mx - mn
    if span <= 0:
        return F.lit(0).cast("long")
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        F.floor((col.cast("double") - F.lit(float(mn)))
                / F.lit(float(span)) * F.lit(float(1 << bits)))
        .cast("long"))


def zvalue(qa: Column, qb: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two quantized coordinates — column a on
    even bit positions, b on odd. A pure shift/and/or expression
    chain, fully inside whole-stage codegen."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(
            F.shiftrightunsigned(qa, b).bitwiseAND(F.lit(1)), 2 * b))
        terms.append(F.shiftleft(
            F.shiftrightunsigned(qb, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 32, bits: int = Z_BITS) -> None:
    """Rewrite ``df`` clustered on the z-curve of (col_a, col_b):
    range-partition by z-value into ``n_files`` files, sort within
    each, drop the helper column. After this, every file's min/max
    footer stats are tight on BOTH columns (asserted from the actual
    parquet footers in tests/test_operators.py::test_zorder_skipping)
    and any reader — Spark pushdown, DuckDB, Trino — skips files from
    stats alone."""
    bounds = df.agg(
        F.min(col_a).alias("a0"), F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"), F.max(col_b).alias("b1")).collect()[0]
    z = zvalue(
        quantize(F.col(col_a), float(bounds.a0), float(bounds.a1), bits),
        quantize(F.col(col_b), float(bounds.b0), float(bounds.b1), bits),
        bits)
    (df.withColumn("_z", z)
     .repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))
