"""Star-schema join operators over the fixture tables (SURVEY §2.8 X6 —
the reference has zero joins; these demonstrate the engine's join surface).

100 TB design notes
-------------------
* ``nation`` (25 rows) and ``region`` (5 rows) are **always broadcast** —
  explicit ``F.broadcast`` so the plan is BroadcastHashJoin regardless of
  statistics staleness. ``customer`` scales with the fact table, so
  orders⋈customer is a shuffle (hash/sort-merge) join on the key — at
  cluster scale both sides would be bucketed by custkey to make it
  co-located; AQE converts it to broadcast automatically when the sf is
  small enough.
* Revenue uses the exact DECIMAL(38,2) sum (partition-invariant, see
  ``functions.core.exact_money_sum``) — a raw double sum would make the
  result depend on partitioning.
* The anti-join is ``LEFT ANTI`` — Spark's null-safe, broadcast-able
  "NOT EXISTS" physical form; never an OUTER-join-then-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.functions.core import exact_money_sum
from financial_big_data_exp_4_spark.sources import load_table


def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation(bcast) ⋈ region(bcast) → revenue rollup.

    Output: (r_name, n_name, n_orders, revenue) — revenue exact-summed.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            exact_money_sum("o_totalprice").alias("revenue"),
        )
    )


LARGE_ORDER_THRESHOLD = 400_000.0


def customers_without_orders(
    spark: SparkSession, sf_dir: str, min_total: float = LARGE_ORDER_THRESHOLD
) -> DataFrame:
    """LEFT ANTI join: customers with no order above ``min_total``,
    counted per segment (every fixture customer has *some* order, so the
    unfiltered anti-join is vacuously empty — the price filter makes the
    operator observable and pushes into the orders scan).

    The anti-join shuffles only the filtered key column of the big side;
    the aggregate output is bounded by segment cardinality.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > min_total
    )
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
