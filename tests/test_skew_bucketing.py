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


def test_salt_identical_rows_share_one_bucket_and_salt_cols_spreads(spark):
    """Executable form of the _salt contract (round-12 VERDICT #8):
    content-derived salts mean BYTE-IDENTICAL rows land in ONE salt
    bucket (the disclosed no-spread case), and the ``salt_cols`` escape
    hatch restores the spread when the caller names a high-entropy
    column the projection would otherwise drop."""
    from financial_big_data_exp_4_spark.operators.skew import _salt

    n_salts = 16
    # hot key, every row byte-identical on (k, v): no spread by design
    ident = spark.range(2_000).select(
        F.lit("hot").alias("k"), F.lit(1).alias("v")
    )
    n_buckets = (
        ident.select(_salt(ident, n_salts).alias("s")).distinct().count()
    )
    assert n_buckets == 1
    # same frame plus an id column named via salt_cols: spread returns,
    # and the salt stays deterministic row-content function (re-eval
    # equals itself)
    with_id = spark.range(2_000).select(
        F.col("id"), F.lit("hot").alias("k"), F.lit(1).alias("v")
    )
    spread = with_id.select(
        _salt(with_id, n_salts, salt_cols=["id"]).alias("s")
    )
    assert spread.distinct().count() == n_salts
    again = with_id.select(
        _salt(with_id, n_salts, salt_cols=["id"]).alias("s")
    )
    assert [r.s for r in spread.collect()] == [r.s for r in again.collect()]


def test_salted_ops_with_salt_cols_match_plain(spark):
    from financial_big_data_exp_4_spark.operators.skew import (
        salted_groupby_count,
        salted_join_small,
    )

    big = spark.range(4_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("k"),
        F.lit("payload").alias("p"),
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], ["k", "label"]
    )
    expect_cnt = {
        (r.k, r["count"]) for r in big.groupBy("k").count().collect()
    }
    got_cnt = {
        (r.k, r.cnt)
        for r in salted_groupby_count(
            big, "k", salt_cols=["id"]
        ).collect()
    }
    assert got_cnt == expect_cnt
    expect_join = {
        tuple(r)
        for r in big.join(small, "k").select("k", "id", "label").collect()
    }
    got_join = {
        tuple(r)
        for r in salted_join_small(big, small, "k", salt_cols=["id"])
        .select("k", "id", "label")
        .collect()
    }
    assert got_join == expect_join


def test_broadcast_threshold_parses_spark_size_suffixes():
    """Round-12 ADVICE: a user-lowered '1KB'/'10m' threshold must be
    honored by the explicit-broadcast decision, not silently replaced
    with a 10 MiB fallback."""
    from financial_big_data_exp_4_spark.operators.skew import (
        _SIZE_SUFFIX,
        _broadcast_threshold_bytes,
    )

    class _FakeConf:
        def __init__(self, val):
            self._v = val

        def get(self, _key):
            return self._v

    class _FakeSession:
        def __init__(self, val):
            self.conf = _FakeConf(val)

    cases = {
        "10485760b": 10 * 1024 * 1024,
        "1KB": 1024,
        "1kb": 1024,
        "10m": 10 * 1024 * 1024,
        "10MB": 10 * 1024 * 1024,
        "1g": 1 << 30,
        "-1": -1,
        "123": 123,
    }
    for raw, want in cases.items():
        assert _broadcast_threshold_bytes(_FakeSession(raw)) == want, raw
    # malformed / unreadable → the Spark default, never an exception
    assert _broadcast_threshold_bytes(_FakeSession("oops")) == 10 * 1024 * 1024
    assert _broadcast_threshold_bytes(None) == 10 * 1024 * 1024
    assert "" in _SIZE_SUFFIX and _SIZE_SUFFIX["pb"] == 1 << 50


def test_skewed_keys_detects_planted_hot_key_and_uniform_is_empty(spark):
    from financial_big_data_exp_4_spark.operators.skew import skewed_keys

    # 60% of rows on one key, the rest spread over 5000 keys
    skewed = spark.range(50_000).select(
        F.when(F.col("id") % 5 < 3, F.lit(7777))
        .otherwise(F.col("id") % 5000)
        .alias("k"),
        F.col("id").alias("v"),
    )
    assert skewed_keys(skewed, "k", sample_fraction=0.2) == [7777]
    uniform = spark.range(50_000).select(
        (F.col("id") % 5000).alias("k"), F.col("id").alias("v")
    )
    assert skewed_keys(uniform, "k", sample_fraction=0.2) == []


def test_adaptive_skew_join_salts_hot_path_and_matches_plain(spark):
    from financial_big_data_exp_4_spark.operators.skew import (
        adaptive_skew_join,
    )

    big = spark.range(20_000).select(
        F.when(F.col("id") % 4 < 3, F.lit(42))
        .otherwise(F.col("id") % 500)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), "id").alias("name")
    )
    plain = big.join(small, "k")
    # measured path: the planted hot key must ENGAGE the salted split —
    # visible as the union of the salted hot slice and the cold join
    adaptive = adaptive_skew_join(big, small, "k", sample_fraction=0.2)
    assert "Union" in adaptive._jdf.queryExecution().executedPlan().toString()
    assert adaptive.count() == plain.count()
    a = {(r["k"], r["v"], r["name"]) for r in adaptive.collect()}
    p = {(r["k"], r["v"], r["name"]) for r in plain.collect()}
    assert a == p


def test_adaptive_skew_join_uniform_takes_plain_join(spark):
    from financial_big_data_exp_4_spark.operators.skew import (
        adaptive_skew_join,
    )

    big = spark.range(20_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), "id").alias("name")
    )
    adaptive = adaptive_skew_join(big, small, "k", sample_fraction=0.2)
    plan = adaptive._jdf.queryExecution().executedPlan().toString()
    # no measured hot key -> no salted split, no replication
    assert "Union" not in plan and "_salt" not in plan
    assert adaptive.count() == big.join(small, "k").count()
