from financial_big_data_exp_4_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from financial_big_data_exp_4_spark.sources.csv import (
    read_csv,
    write_single_csv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "write_single_csv",
]
