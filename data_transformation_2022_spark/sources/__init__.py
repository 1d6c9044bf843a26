from .readers import TPCH_TABLES, load_table, load_tables, read_csv, read_json, read_parquet, with_rid
from .writers import read_bucketed, write_bucketed, write_csv, write_json, write_partitioned

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "read_bucketed",
    "read_csv",
    "read_json",
    "read_parquet",
    "with_rid",
    "write_bucketed",
    "write_csv",
    "write_json",
    "write_partitioned",
]
