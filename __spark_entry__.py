"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real code lives in the ``financial_big_data_exp_4_spark`` package;
this module is pure glue.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from financial_big_data_exp_4_spark.plans import (
    REFERENCE_ORACLE_SQL,
    REFERENCE_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (task-1 group-count + total-order sort) at sf0.001."""
    return REFERENCE_QUERIES["q_industry_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8."""
    return dict(REFERENCE_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; keys missing here get the
    driver's weaker rows-only check (non-SQL-expressible ops only)."""
    return dict(REFERENCE_ORACLE_SQL)
