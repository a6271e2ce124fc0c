from financial_big_data_exp_4_spark.sources.parquet import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from financial_big_data_exp_4_spark.sources.csv import (
    read_csv,
    write_single_csv,
    write_text,
)
from financial_big_data_exp_4_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
    write_partitioned_parquet,
)
from financial_big_data_exp_4_spark.sources.orc import (
    read_orc,
    write_orc,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_jsonl",
    "read_orc",
    "register_views",
    "write_jsonl",
    "write_text",
    "write_orc",
    "write_partitioned_parquet",
    "write_single_csv",
]
