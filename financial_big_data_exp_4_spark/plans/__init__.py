from financial_big_data_exp_4_spark.plans.reference import REFERENCE_QUERIES
from financial_big_data_exp_4_spark.plans.oracle import REFERENCE_ORACLE_SQL

__all__ = ["REFERENCE_QUERIES", "REFERENCE_ORACLE_SQL"]
