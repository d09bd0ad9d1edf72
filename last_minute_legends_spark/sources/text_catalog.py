"""Semi-structured ITEM-block text → wide catalog table.

Reference parity (re-expressed, not translated):
/root/reference/services/spark_batch_processor.py
  :26-33  "ITEM n" marker lines + running-sum window to assign ids
  :35-38  key=value line split
  :40     pivot to one wide row per item
  :50-66  price extraction from '899USD$8.99' strings (there a per-row
          Python UDF — here native regexp_extract)
  :69-73  fillna cleaning

Scale design — the reference's running sum is a single unbounded
window (one partition = driver-sized bottleneck). Here the global
running count of ITEM markers is a two-phase distributed prefix sum:

1. range-repartition lines by line_no (contiguous ranges per
   partition, ascending partition ids),
2. per-partition local cumsum (window partitioned by partition id —
   parallel),
3. tiny per-partition totals (N_partitions rows) turned into
   preceding-partition offsets by a triangular self-join aggregate —
   broadcast back,
4. item_id = local_cumsum + offset of all preceding partitions.

That is the textbook parallel scan: no single-partition window at
any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from last_minute_legends_spark.functions.prices import extract_trailing_price

CATALOG_KEYS = ("name", "brand", "type", "size", "price")


def assign_block_ids(lines: DataFrame, line_col: str = "line",
                     order_col: str = "line_no",
                     marker_prefix: str = "ITEM") -> DataFrame:
    """Add ``item_id`` = running count of marker lines at or before
    each line, via a distributed two-phase prefix sum."""
    flagged = lines.withColumn(
        "__flag", F.when(F.col(line_col).startswith(marker_prefix), 1).otherwise(0)
    )
    parts = flagged.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("__local", F.sum("__flag").over(local_w))
    totals = parts.groupBy("__pid").agg(F.sum("__flag").alias("__tot"))
    # offset of partition p = sum of totals of partitions < p. The
    # totals frame is N_partitions rows, so a triangular self-join
    # aggregate is O(P^2) on a tiny frame — and unlike the
    # Window.orderBy formulation it emits no "No Partition Defined"
    # warning flood (that window WAS benign — P rows — but drowned
    # real signals in the logs).
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__tot"), F.lit(0)).alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("item_id", (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__flag", "__pid", "__local", "__offset")
    )


def parse_item_blocks(lines: DataFrame, line_col: str = "line",
                      order_col: str = "line_no") -> DataFrame:
    """Lines of 'ITEM' markers + 'key=value' rows → one wide row per
    item: (item_id, name, brand, type, size, price_usd), cleaned."""
    with_ids = assign_block_ids(lines, line_col, order_col)
    kv = (
        with_ids.filter(F.col(line_col).contains("="))
        .select(
            "item_id",
            F.regexp_extract(line_col, r"^([^=]+)=", 1).alias("k"),
            F.regexp_extract(line_col, r"^[^=]+=(.*)$", 1).alias("v"),
        )
        .filter(F.col("k").isin(*CATALOG_KEYS))
    )
    wide = kv.groupBy("item_id").pivot("k", list(CATALOG_KEYS)).agg(F.first("v"))
    return (
        wide.select(
            "item_id",
            F.coalesce(F.col("name"), F.lit("UNKNOWN")).alias("name"),
            F.coalesce(F.col("brand"), F.lit("UNKNOWN")).alias("brand"),
            F.coalesce(F.col("type"), F.lit("UNKNOWN")).alias("type"),
            F.coalesce(F.col("size").cast("int"), F.lit(0)).alias("size"),
            F.round(
                F.coalesce(extract_trailing_price(F.col("price")), F.lit(0.0)), 2
            ).alias("price_usd"),
        )
    )


def compose_item_lines(part: DataFrame) -> DataFrame:
    """Render the driver's ``part`` table into ITEM-block text lines —
    exercises the parser on real data without external files. Each
    part becomes 6 lines with a deterministic global line_no; in
    production the lines come from ``spark.read.text`` with file
    offsets."""
    from last_minute_legends_spark.functions.prices import compose_price_string

    lines = F.array(
        F.concat(F.lit("ITEM "), F.col("p_partkey").cast("string")),
        F.concat(F.lit("name="), F.col("p_name")),
        F.concat(F.lit("brand="), F.col("p_brand")),
        F.concat(F.lit("type="), F.col("p_type")),
        F.concat(F.lit("size="), F.col("p_size").cast("string")),
        F.concat(F.lit("price="), compose_price_string(F.col("p_retailprice"))),
    )
    return part.select(
        F.col("p_partkey"), F.posexplode(lines).alias("pos", "line")
    ).select(
        (F.col("p_partkey") * 6 + F.col("pos")).alias("line_no"), "line"
    )
