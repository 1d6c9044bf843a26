from .readers import TPCH_TABLES, load_table, load_tables, read_csv, read_json, read_parquet, with_rid

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "with_rid",
]
