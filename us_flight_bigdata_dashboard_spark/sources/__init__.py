from us_flight_bigdata_dashboard_spark.sources.catalog import TABLES, load_table, register_all

__all__ = ["TABLES", "load_table", "register_all"]
