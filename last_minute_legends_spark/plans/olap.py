"""Core OLAP suite over the TPC-H-ish star schema (SURVEY §2.1).

Re-expresses the warehouse-query capability of the reference's
`services/snowflake_query_service.py:32-45` (execute/fetch SQL over a
star schema) as declarative DataFrame plans that Catalyst optimizes:
filters reach the parquet scan, small dims broadcast, aggregates get
map-side partial combine.

Every query has a DuckDB oracle twin in ``SQL`` (driver correctness
gate). Conventions shared by both sides so value-hashes match:

- money sums rounded to 2 decimals, averages/ratios to 4;
- dates output as 'YYYY-MM-DD' strings, timestamps as epoch micros;
- every computed column aliased identically in Spark and SQL;
- ORDER BY + LIMIT queries carry a deterministic tiebreak key.

Scale notes (100 TB): dims (region/nation/supplier) broadcast via the
raised autoBroadcastJoinThreshold + explicit hints; fact-fact joins
shuffle on join keys with AQE skew splitting; no collect(), no UDFs —
everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from last_minute_legends_spark.sources.tables import Catalog


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- q1: pricing summary (scan → filter → groupBy agg → sort) -----------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_rev()), 2).alias("sum_disc_price"),
            F.round(F.sum(_rev() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- q3: shipping priority (3-way join, top-N) --------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.orders.filter(F.col("o_orderdate") < "1996-03-15")
    li = cat.lineitem.filter(F.col("l_shipdate") > "1996-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q4: order priority via EXISTS semi-join ----------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    big_lines = cat.lineitem.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(big_lines, orders.o_orderkey == big_lines.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q5: local supplier volume (6-way join) -----------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        cat.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(cat.supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- q6: forecast revenue (pushdown showcase) ---------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- q10: returned items (join + agg + top-N) ---------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q13: customer order-count distribution -----------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat.customer.join(
            cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q14: promo effect (conditional aggregation) ------------------------

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-03-01")
    )
    joined = li.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return joined.agg(
        F.round(100.0 * F.sum(promo) / F.sum(_rev()), 4).alias("promo_revenue")
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'
"""


# --- q18: large-volume customers (HAVING subquery + join) ---------------

def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    big_orders = (
        cat.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey")
    )
    li = cat.lineitem
    return (
        cat.orders.join(
            big_orders, F.col("o_orderkey") == big_orders.l_orderkey, "left_semi"
        )
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- q22: idle high-balance customers (anti-join + scalar subquery) -----

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    avg_bal_df = cat.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    recent = cat.orders.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    rich = (
        cat.customer.join(F.broadcast(avg_bal_df))
        .filter(F.col("c_acctbal") > F.col("__avg"))
    )
    idle = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        idle.join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT n_name AS cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# --- topn_per_group: top-3 parts by revenue per brand -------------------

def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    per_part = (
        cat.lineitem.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


TOPN_SQL = """
SELECT p_brand, p_partkey, revenue, rn
FROM (
    SELECT p_brand, p_partkey, revenue,
           row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rn
    FROM (
        SELECT p_brand, p_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    )
)
WHERE rn <= 3
ORDER BY p_brand, rn
"""


# --- q7: nation-pair volume shipping (TPC-H Q7, adapted columns) --------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional trade volume between two nations by ship year.
    Both nation joins broadcast; the OR pair-filter prunes before the
    fact join; year() stays on the shuffle key side."""
    cat = Catalog(spark, sf_dir)
    n1 = cat.nation.select(F.col("n_nationkey").alias("s_nk"),
                           F.col("n_name").alias("supp_nation"))
    n2 = cat.nation.select(F.col("n_nationkey").alias("c_nk"),
                           F.col("n_name").alias("cust_nation"))
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    joined = (
        li.join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- q8: market share (TPC-H Q8, adapted columns) -----------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of PROMO-part volume sold into EUROPE by order
    year — conditional aggregation over one joined frame (no second
    scan for the numerator)."""
    cat = Catalog(spark, sf_dir)
    region = cat.region.filter(F.col("r_name") == "EUROPE")
    nat_c = cat.nation.join(F.broadcast(region),
                            F.col("n_regionkey") == F.col("r_regionkey"))
    nat_s = cat.nation.select(F.col("n_nationkey").alias("s_nk"),
                              F.col("n_name").alias("supp_nation"))
    part = cat.part.filter(F.col("p_type") == "PROMO")
    joined = (
        cat.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = _rev()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                      .otherwise(F.lit(0.0))) / F.sum(vol), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY 1
ORDER BY 1
"""


# --- q9: product margin by nation/year (TPC-H Q9, adapted: retailprice
# stands in for ps_supplycost — no partsupp table in this schema) --------

def q9_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_name").like("%widget%"))
    nat = cat.nation.select(F.col("n_nationkey").alias("s_nk"),
                            F.col("n_name").alias("nation"))
    margin = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        cat.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("s_nk"))
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(margin), 2).alias("sum_margin"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS sum_margin
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- q15: top supplier (TPC-H Q15) --------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max 3-month revenue: the revenue "view" is one
    aggregation; the max is a 1-row broadcast joined back — no window
    over the whole supplier set, no second scan of lineitem."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .join(cat.supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- q17: small-quantity revenue (TPC-H Q17, adapted: brand filter) ------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average weekly revenue from orders of less than half the
    part's average quantity — the correlated avg becomes a per-part
    aggregate joined back (shuffle on partkey shared by both sides)."""
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(F.col("p_brand") == "Brand#1")
    li = cat.lineitem.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly"))
    )


Q17_SQL = """
SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_weekly
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#1'
  AND l1.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
  )
"""


# --- q16: supplier count per part profile (TPC-H Q16, adapted:
# lineitem is the part↔supplier link — no partsupp in this schema) -------

def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    part = cat.part.filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 9, 13)
    )
    return (
        cat.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 9, 13)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q19: discounted revenue, OR-of-ANDs predicate (TPC-H Q19 shape) -----

def q19_or_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of brand/size/quantity conjunctions — the predicate
    shape that exercises OR pushdown and join-condition placement."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    joined = li.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- cube_agg: GROUP BY CUBE over orders ---------------------------------

def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (orderstatus, orderpriority): every grouping-set
    combination in one pass — Spark expands grouping sets map-side, so
    it's still a single shuffle with partial aggregation. CUBE's
    grouping sets are a strict superset of ROLLUP's, so this entry
    also covers the multi-level-rollup operator class (the former
    separate ``rollup_agg`` entry); hierarchical GROUPING SETS are
    additionally exercised by ``rollup_timeseries``."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("orderpriority"),
            "n_orders", "sum_price",
        )
        .orderBy("orderstatus", "orderpriority")
    )


CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY orderstatus, orderpriority
"""


SPARK = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q22_idle_customers": q22_idle_customers,
    "topn_per_group": topn_per_group,
    "cube_agg": cube_agg,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q9_product_margin": q9_product_margin,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count": q16_supplier_count,
    "q17_small_quantity": q17_small_quantity,
    "q19_or_predicate": q19_or_predicate,
}

# r12 rotation: twelve OLAP entries — all driver-hash-green in r11
# (and in several earlier rounds) — lend their window slots to the
# nine returning curation oracles (plans/curation_q.py, demoted for
# one round in r11) and the three r12-new entries
# (dedup_minhash_lsh_replay, ann_ivf_topk_replay,
# events_avro_evolution). Every demoted entry keeps the identical
# value-level DuckDB compare locally via LOCAL_SQL +
# tests/test_oracle.py; five OLAP entries stay in the window as the
# family's standing external anchors.
SQL = {
    "q8_market_share": Q8_SQL,
    "q9_product_margin": Q9_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_count": Q16_SQL,
    "q17_small_quantity": Q17_SQL,
}

LOCAL_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q4_order_priority": Q4_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_nation_volume": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_effect": Q14_SQL,
    "q18_large_volume_customer": Q18_SQL,
    "q19_or_predicate": Q19_SQL,
    "q22_idle_customers": Q22_SQL,
    "topn_per_group": TOPN_SQL,
    "cube_agg": CUBE_SQL,
}
