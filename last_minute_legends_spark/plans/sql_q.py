"""SQL query surface: text SQL executed end-to-end via spark.sql.

Parity with the reference's execute/fetch query service
(/root/reference/services/snowflake_query_service.py:32-45) — a user
submits SQL text against registered tables and gets rows back. Here
the warehouse is the parquet star schema registered as temp views
(sources/tables.py Catalog.register_views), and Catalyst plans the
text exactly as it would the DataFrame API (broadcast dims, pushed
filters) — the SQL surface is the same engine, not a second path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from last_minute_legends_spark.sources.tables import Catalog

# Supplier-side revenue rollup by region/nation — a text query shaped
# like the reference's warehouse reports: multi-join + group + order.
SQL_SURFACE_TEXT = """
SELECT r.r_name AS region,
       n.n_name AS nation,
       count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY region, nation
"""


def sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register views, execute the text query — the full execute/fetch
    path a reference user would call."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(SQL_SURFACE_TEXT)


SPARK = {
    "sql_surface": sql_surface,
}

SQL = {
    # the oracle twin IS the same ANSI text (both engines parse it)
    "sql_surface": SQL_SURFACE_TEXT,
}
