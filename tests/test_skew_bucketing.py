"""Skew utilities + bucketed co-located joins (scale toolkit)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def test_salted_groupby_count_matches_plain(spark):
    from financial_big_data_exp_4_spark.operators.skew import (
        salted_groupby_count,
    )

    # 90% of rows share one hot key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k")
    )
    salted = {
        r["k"]: r["cnt"] for r in salted_groupby_count(df, "k").collect()
    }
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert salted == plain
    assert salted["HOT"] == 9_000


def test_salted_join_small_matches_plain(spark):
    from financial_big_data_exp_4_spark.operators.skew import salted_join_small

    big = spark.range(5_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k long, name string"
    )
    out = salted_join_small(big, small, "k")
    assert out.count() == 5_000
    sample = out.where("v = 13").collect()[0]
    assert sample["name"] == f"dim{13 % 7}"


def test_bucketed_join_has_no_exchange(spark):
    from financial_big_data_exp_4_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    left = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(left, "t_left_bkt", "k", 4, path=f"{d}/l")
        write_bucketed(right, "t_right_bkt", "k", 4, path=f"{d}/r")
        # at test scale the planner prefers broadcast (and then skips the
        # bucketed scan); disable it to expose the co-located SMJ that a
        # fact⋈fact join would use at real scale
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "t_left_bkt", "t_right_bkt", "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan  # co-located: no shuffle
            assert "SortMergeJoin" in plan
            assert joined.count() == 1_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS t_left_bkt")
            spark.sql("DROP TABLE IF EXISTS t_right_bkt")
