"""Skew-mitigation utilities: salted two-stage aggregation and a salted
broadcast-replicated join (BASELINE north star: "skewed keys → salting or
AQE skew-join").

AQE (enabled session-wide) already splits skewed *shuffle-join* partitions
at runtime; these helpers cover the cases AQE does not:

* a single hot GROUP BY key whose partial aggregate still funnels into
  one reducer → :func:`salted_groupby_count` spreads the final combine
  over ``n_salts`` reducers, then merges the tiny salted result;
* a shuffle join where one side's hot keys overwhelm a task and the
  other side is small enough to replicate per salt →
  :func:`salted_join_small` (the classic salt-and-replicate pattern).

Both are pure DataFrame compositions — no RDDs, no custom partitioners —
so Catalyst/AQE still optimize around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: ``xxhash64`` over every column of the
    row, mod ``n_salts``. Derived purely from row *content* so a task
    retry or speculative re-execution recomputes the identical salt —
    ``monotonically_increasing_id()``/``rand()`` would not: a stage
    recompute after a shuffle-fetch failure could re-salt rows
    differently and silently drop/duplicate join rows at scale. Fully
    identical rows share a salt; spreading a hot key relies on per-row
    attribute diversity, the normal case for hot keys with distinct
    payloads."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
    )


def salted_groupby_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """``groupBy(key).count()`` that survives a pathologically hot key.

    Stage 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the ≤ n_salts partial rows per
    key. With Spark's map-side partial aggregation stage 1 is usually
    enough on its own; the salt guards the *reduce* side, which partial
    aggregation cannot help when all rows share one key.
    Output: (key, cnt) — identical to the unsalted aggregate.
    """
    stage1 = (
        df.withColumn("_salt", _salt(df, n_salts))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").cast("long").alias("cnt"))


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join a skewed big side against a small side by salting the big
    side and replicating the small side once per salt value.

    Cost: small side × n_salts rows shuffled (or broadcast). Use when the
    small side is too big to broadcast outright but small enough to
    replicate, and the big side's key histogram is too skewed for a plain
    shuffle join. (With a broadcastable small side, just ``F.broadcast`` —
    Spark never shuffles the big side then; this helper is for the middle
    regime.)
    """
    from financial_big_data_exp_4_spark.session import plan_size_bytes

    salted_big = big.withColumn("_salt", _salt(big, n_salts))
    salts = big.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    replicated = small.crossJoin(salts)
    # Physical-strategy selection, pinned to the operator's OWN side
    # roles (the big side must always STREAM — left alone, Catalyst has
    # picked both wrong forms: sort-merge at the 10× fixture, sorting
    # the salted big side; and BuildLeft broadcast of the BIG side at
    # sf0.1, collecting 600k salted rows to the driver):
    # * replicated side fits the broadcast threshold → explicit
    #   ``F.broadcast`` — big side never shuffles, the degenerate-but-
    #   correct tiny-scale form (0.6 s vs 1.5 s at sf0.1);
    # * otherwise → shuffle-hash hint: per-salt hash build from the
    #   replicated slice, streamed big side, no sort (6.9 s vs 11.4 s
    #   SMJ at the 10× fixture). The statistical size check is the
    #   docstring's "middle regime" boundary, made executable.
    try:
        thresh = int(
            str(
                big.sparkSession.conf.get(
                    "spark.sql.autoBroadcastJoinThreshold"
                )
            ).rstrip("b")
        )
    except Exception:  # pragma: no cover - non-numeric (e.g. "10MB")
        thresh = 10 * 1024 * 1024
    small_bytes = plan_size_bytes(small)
    if small_bytes is not None and 0 <= small_bytes * n_salts <= thresh:
        replicated = F.broadcast(replicated)
    else:
        replicated = replicated.hint("shuffle_hash")
    joined = salted_big.join(replicated, on=[key, "_salt"])
    return joined.drop("_salt")
