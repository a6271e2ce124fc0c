from financial_big_data_exp_4_spark.plans.extensions import EXTENSION_QUERIES
from financial_big_data_exp_4_spark.plans.oracle import (
    REFERENCE_ORACLE_SQL as _REF_SQL,
)
from financial_big_data_exp_4_spark.plans.oracle_ext import (
    EXTENSION_ORACLE_SQL,
)
from financial_big_data_exp_4_spark.plans.reference import (
    REFERENCE_QUERIES as _REF_QUERIES,
)

#: Full declared-query registry: reference surface (SURVEY §2) + LLM-data
#: pipeline extensions (SURVEY §2.8). Names must be unique across both.
REFERENCE_QUERIES = {**_REF_QUERIES, **EXTENSION_QUERIES}
REFERENCE_ORACLE_SQL = {**_REF_SQL, **EXTENSION_ORACLE_SQL}

assert len(REFERENCE_QUERIES) == len(_REF_QUERIES) + len(EXTENSION_QUERIES)
assert set(REFERENCE_ORACLE_SQL) <= set(REFERENCE_QUERIES)

__all__ = [
    "EXTENSION_ORACLE_SQL",
    "EXTENSION_QUERIES",
    "REFERENCE_ORACLE_SQL",
    "REFERENCE_QUERIES",
]
