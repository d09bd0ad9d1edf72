from last_minute_legends_spark.plans.queries import QUERIES, ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
