from duckdb_data_eng_proj_spark.io.sources import TESTDATA_TABLES, load_table, register_views

__all__ = ["TESTDATA_TABLES", "load_table", "register_views"]
