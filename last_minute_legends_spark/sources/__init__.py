from last_minute_legends_spark.sources.tables import Catalog, load_table

__all__ = ["Catalog", "load_table"]
