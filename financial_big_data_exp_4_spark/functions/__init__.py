from financial_big_data_exp_4_spark.functions.core import (
    bucket_edge,
    bucket_label,
    bucket_label_from_edge,
    exact_money_sum,
    fixed_point_sum,
    interest_expr,
    md5_hash64,
    parse_bucket_left_edge,
    parse_work_year,
    share_expr,
)

__all__ = [
    "bucket_edge",
    "bucket_label",
    "bucket_label_from_edge",
    "exact_money_sum",
    "fixed_point_sum",
    "interest_expr",
    "md5_hash64",
    "parse_bucket_left_edge",
    "parse_work_year",
    "share_expr",
]
