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

from financial_big_data_exp_4_spark.functions.core import (
    exact_money_sum,
    floor_div_sql,
)
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


US_PER_HOUR = 3_600_000_000


def range_join_bucketed(
    probes: DataFrame,
    intervals: DataFrame,
    key: str,
    probe_ts: str,
    start_ts: str,
    width_us: int = US_PER_HOUR,
) -> DataFrame:
    """Interval-containment join, bucketed so it plans as an EQUI-join.

    Semantics: probe p matches interval i (same ``key``) iff
    ``i.start <= p.ts < i.start + width``. A naive
    ``ON p.ts BETWEEN ...`` condition is not an equi-join — Spark plans a
    broadcast-nested-loop (or worse, a cartesian per key group) that is
    O(|P|·|I|) per key. Instead both sides are mapped onto coarse time
    buckets of the interval width: a probe lives in exactly one bucket, a
    width-bounded interval spans at most two, so the interval side
    explodes ×2 and the join becomes a hash join on ``(key, bucket)``
    with the exact containment predicate applied as a cheap post-filter.
    Cost: one shuffle of |P| + 2|I| rows — the standard bucketed range
    join (the same trick Databricks' RANGE_JOIN hint applies). Each
    matching pair is produced exactly once (the probe's bucket is
    unique). Buckets FLOOR (``floor_div_sql``) per the repo-wide time
    rule: truncating DIV happens to stay complete here (both sides shift
    the same way near zero), but that safety is an accident of the ±1
    expansion — flooring keeps the invariant load-bearing-free.
    """
    p = probes.withColumn(
        "_bucket", F.expr(floor_div_sql(probe_ts, width_us))
    )
    i = intervals.withColumn(
        "_b0", F.expr(floor_div_sql(start_ts, width_us))
    ).select(
        "*",
        F.explode(
            F.array(F.col("_b0"), F.col("_b0") + F.lit(1))
        ).alias("_bucket"),
    ).drop("_b0")
    joined = p.join(i, on=[key, "_bucket"]).where(
        (F.col(probe_ts) >= F.col(start_ts))
        & (F.col(probe_ts) < F.col(start_ts) + F.lit(width_us))
    )
    return joined.drop("_bucket")


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
