"""Relational pipeline patterns: CDC keep-latest deduplication,
deterministic sampling, MERGE-style change application, SCD Type-2
interval builds, and per-group winsorization (BASELINE north star —
staples of a training-data ingestion pipeline that the reference's
single-table workload never needed).

100 TB design notes
-------------------
* **Keep-latest** shuffles once on the entity key and reduces inside the
  aggregate (``max_by`` over a (ts, tiebreak) struct — partial
  aggregation keeps one row per key per map task, so the shuffle carries
  |keys| rows, not |events|). The window/row_number formulation computes
  the same answer but shuffles every row and sorts each partition; the
  aggregate form is the one to ship.
* **Hash sampling** is map-only and *deterministic across engines, runs,
  and partition layouts* — the multiplicative hash is plain integer
  arithmetic (same formula as the train/test split), so a sample drawn
  today reproduces bit-for-bit tomorrow, which ``TABLESAMPLE``/``rand``
  cannot promise. Filter sits directly on the scan.
* **MERGE apply** never shuffles the base table: the change set (tiny by
  CDC construction) is **broadcast**, matched rows resolve map-side
  (update = overwrite, delete = filter), and tagged inserts union in —
  the whole merge is one map-only pass over the base plus a union. A
  full-outer-join formulation computes the same rows but shuffles 100 TB
  of base to co-locate a few MB of changes; Delta/Iceberg MERGE works
  like this broadcast form (find touched files, rewrite them map-side).
* **SCD Type-2** is one exchange total: the change-detection window, the
  (key, version) aggregate, and the validity-interval window all cluster
  by the entity key, and hash-partitioning on ``user_id`` satisfies the
  ``(user_id, version)`` clustering requirement, so Catalyst reuses the
  first shuffle for all three (verified in the plan audit).
* **Winsorize** computes per-group exact percentile bounds in a first
  aggregate pass (group count is small — the bounds broadcast), then
  clips map-side in a second scan. Exact ``percentile`` is sort-based
  per group; at extreme scale swap the bounds pass to
  ``approx_percentile`` without touching the clip pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def keep_latest(
    df: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """One row per ``key``: the one with the greatest ``(ts, tiebreak)``.

    ``max_by`` over a struct gives the lexicographic argmax — ties on the
    timestamp are broken by the unique ``tiebreak`` column, making the
    result total-ordered and hash-stable. Output: (key, ts, tiebreak).
    """
    best = F.max(F.struct(F.col(ts), F.col(tiebreak))).alias("_best")
    return (
        df.groupBy(key)
        .agg(best)
        .select(
            key,
            F.col(f"_best.{ts}").alias(ts),
            F.col(f"_best.{tiebreak}").alias(tiebreak),
        )
    )


def hash_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Deterministic ``pct``-percent sample by integer key.

    Keeps rows where ``det_hash_mod(key, 100) < pct`` (``((key pmod P) *
    knuth) mod P mod 100``) — pure integer arithmetic, identical in any
    engine, pushed into the scan as an ordinary filter (partition/file
    pruning still applies).
    """
    from financial_big_data_exp_4_spark.functions.core import det_hash_mod

    # det_hash_mod is sign-safe (pmod): a plain % would give negative
    # buckets for negative keys, which pass `bucket < pct` at ANY pct
    return df.where(det_hash_mod(key, 100) < pct)


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    cols: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a CDC change set to ``base`` — MERGE INTO semantics without a
    table format: ``changes`` carries ``(key, op, cols...)`` with
    ``op ∈ {'I','U','D'}`` (tagged by the upstream CDC source).

    ``'I'`` and ``'U'`` are both full **upserts** (matched → the row is
    rewritten with the change's column values; unmatched → the change row
    is inserted); ``'D'`` drops the matched row. Upsert-U matters for
    real CDC batches: an ``I`` followed by a ``U`` for the same new key
    collapses to a ``U`` whose key is absent from base — update-only
    semantics would silently drop that row (observed failure mode), where
    the upsert inserts it with the final payload.

    Plan shape (module notes): broadcast LEFT join of base→changes, so
    update/delete resolve map-side with zero shuffle of the base; inserts
    union the change set plus the unmatched upserts (found via one extra
    key-pruned scan of base under a broadcast join — the base is still
    never shuffled). Output column set = (key, cols).

    Duplicate keys in the change set are collapsed *structurally* before
    the join — the broadcast LEFT join would otherwise fan out every
    matching base row once per duplicate. With ``seq_col`` (a per-change
    monotone sequence — log offset, LSN), resolution is
    **last-writer-wins**: the highest sequence is the batch's net effect,
    exactly MERGE-on-a-compacted-changelog. Without one there is no
    order to recover, so resolution falls back to a deterministic
    priority (``D > U > I``, then lexicographically greatest payload) —
    conservative (the destructive op wins) and documented rather than
    row-order-dependent. Either way this is a small-side-only
    aggregation — lazy, broadcast-sized, no driver action, zero effect
    on unique change sets beyond a tiny agg.

    ``seq_col`` edge cases (resolution is ``max(struct(_seq, _p,
    payload))``, so both are deterministic but worth knowing): a NULL
    sequence sorts below every non-NULL one — an unsequenced change row
    always LOSES to any sequenced change for the same key; and exact
    sequence ties fall back to the priority-then-payload order above.
    Mixed or absent sequence numbers are therefore NOT order-preserving;
    callers with a real changelog should populate ``seq_col`` on every
    row.
    """
    prio = (
        F.when(F.col("op") == "D", F.lit(3))
        .when(F.col("op") == "U", F.lit(2))
        .otherwise(F.lit(1))
    )
    new_cols = [f"_new_{c}" for c in cols]
    rank_cols = ([F.col(seq_col).alias("_seq")] if seq_col else []) + [
        prio.alias("_p")
    ]
    ch = (
        changes.select(
            key,
            "op",
            *([seq_col] if seq_col else []),
            *[F.col(c).alias(f"_new_{c}") for c in cols],
        )
        .groupBy(key)
        .agg(
            F.max(
                F.struct(*rank_cols, F.col("op"), *new_cols)
            ).alias("_ch")
        )
        .select(
            key,
            F.col("_ch.op").alias("op"),
            *[F.col(f"_ch.{nc}").alias(nc) for nc in new_cols],
        )
    )
    upsert = F.col("op").isin("U", "I")
    joined = base.join(F.broadcast(ch), key, "left")
    survivors = joined.where(
        F.col("op").isNull() | upsert
    ).select(
        key,
        *[
            F.when(upsert, F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in cols
        ],
    )
    # unmatched upserts: change keys with no base row. The semi join
    # streams a key-pruned base scan against the broadcast change set
    # (tiny output), then the anti join runs broadcast-vs-broadcast —
    # the base is never shuffled and never broadcast.
    matched_keys = base.select(key).join(
        F.broadcast(ch.select(key)), key, "left_semi"
    )
    inserts = ch.where(upsert).join(
        F.broadcast(matched_keys), key, "left_anti"
    ).select(key, *[F.col(f"_new_{c}").alias(c) for c in cols])
    return survivors.unionByName(inserts)


def scd2_intervals(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts_s: str = "ts_s",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-Changing-Dimension Type-2 build: collapse an event history
    into validity intervals of ``attr`` per ``key``.

    A new version opens whenever ``attr`` differs from the previous event
    (ordered by ``(ts_s, tiebreak)`` — a total order, so versioning is
    deterministic); ``valid_to_s`` is the next version's ``valid_from_s``
    (NULL for the current version — the open interval).

    One exchange total: change-detection window, (key, version) aggregate
    and the validity window all cluster on ``key`` (module notes).
    Output: (key, version, attr, valid_from_s, valid_to_s, n_events).
    """
    w = Window.partitionBy(key).orderBy(ts_s, tiebreak)
    prev = F.lag(attr).over(w)
    # null-safe change test (IS DISTINCT FROM): a NULL attr value is a
    # real state that opens/closes versions like any other; the first
    # event has prev = NULL-from-lag, which eqNullSafe counts as a
    # change only when attr is non-NULL — so a leading NULL attr still
    # opens version 1 via the explicit first-row test
    first_row = F.row_number().over(w) == 1
    is_new = F.when(
        first_row | ~prev.eqNullSafe(F.col(attr)), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = events.withColumn("_new", is_new).withColumn(
        "version", F.sum("_new").over(wsum)
    )
    intervals = versioned.groupBy(key, "version").agg(
        F.min(attr).alias(attr),  # constant within a version
        F.min(ts_s).alias("valid_from_s"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(key).orderBy("version")
    return intervals.select(
        key,
        "version",
        attr,
        "valid_from_s",
        F.lead("valid_from_s").over(wv).alias("valid_to_s"),
        "n_events",
    )


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Data-quality profile: per column, null count and exact distinct
    count — the ingest-validation pass every pipeline runs before
    trusting a new drop.

    Exact path — MEASURED shape (r15): one independent two-phase
    aggregate per column, unioned. The previous single-aggregate form
    planned the multi-column exact distincts as ONE Expand — a
    (|cols|+1)× row blow-up (4 profiled columns = 7.5 M expanded rows at
    the 10× fixture) pushed through a compound-key HashAggregate; the
    per-column union prunes each scan branch to a single column (same
    total bytes off columnar storage as one wide scan), dedups each
    column in its own 2-phase aggregate, and derives every metric from
    the group counts: n_rows = Σcnt, n_nulls = cnt of the NULL group,
    n_distinct = non-null group count. Measured at 10×: 3.03 s → 1.68 s
    warm (repartition-by-column variants measured and rejected:
    1.67-1.42 s per-branch costs say the 2-phase partials are not the
    bottleneck). The branches are independent jobs inside one action, so
    they backfill each other's stragglers. Counts only (BIGINT) —
    min/max are deliberately excluded from the declared output because
    their string rendering is engine-specific; production adds them
    per-type. Output: (column, n_rows, n_nulls, n_distinct) —
    ``n_distinct`` excludes NULL (SQL ``count(DISTINCT col)``
    semantics).

    ``approx=True`` is the 100 TB mode: ``approx_count_distinct``
    (HyperLogLog++, default rsd 5%) is a plain partial-aggregable
    expression — no per-column dedup state, ONE pass over one wide scan,
    constant state per column — the profile every warehouse actually
    runs at scale. The declared query keeps ``approx=False`` so the
    oracle semantics stay exact; the knob is scale-gated in
    tools/scale_bench.py (q_profile_approx)."""
    if approx:
        metrics = [F.count(F.lit(1)).alias("_rows")]
        for c in cols:
            metrics.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}")
            )
            metrics.append(F.approx_count_distinct(F.col(c)).alias(f"_nd_{c}"))
        one = df.agg(*metrics)
        rows = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("_rows").alias("n_rows"),
                    F.col(f"_nn_{c}").alias("n_nulls"),
                    F.col(f"_nd_{c}").alias("n_distinct"),
                )
                for c in cols
            ]
        )
        return one.select(F.explode(rows).alias("_r")).select(
            "_r.column", "_r.n_rows", "_r.n_nulls", "_r.n_distinct"
        )
    branches = []
    for c in cols:
        g = df.select(c).groupBy(c).agg(F.count(F.lit(1)).alias("_cnt"))
        branches.append(
            g.agg(
                F.lit(c).alias("column"),
                # coalesce: on EMPTY input the grouped frame has zero
                # rows, so sum() is NULL where the old single-aggregate
                # form reported 0 — keep the 0 contract
                F.coalesce(F.sum("_cnt"), F.lit(0))
                .cast("long")
                .alias("n_rows"),
                F.coalesce(
                    F.sum(
                        F.when(F.col(c).isNull(), F.col("_cnt")).otherwise(
                            F.lit(0)
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_nulls"),
                F.count(F.when(F.col(c).isNotNull(), F.lit(1)))
                .cast("long")
                .alias("n_distinct"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, cols: Sequence[str]
) -> DataFrame:
    """Reconcile two table snapshots: per-key classification into
    added / removed / changed / unchanged, summarized as one count per
    class — the drift check run after every MERGE/backfill. ``key`` is
    the snapshot's primary key (unique per side); comparison is
    null-safe per column, and a NULL key is one real key on either side.
    Output: (diff_class, n_keys), classes that occur only.

    Plan shape — MEASURED, not assumed (r15, closing the r14 regression):
    a diff needs both sides co-located on the key, and the full-outer
    sort-merge join IS the cheapest way to get there on this engine.
    Round 14 rewrote it as tag-union → one repartition(key) → two
    exchange-free HashAggregates ("fewer exchanges must win") and the
    10× wall REGRESSED 3.8 → 5.2 s: the single exchange ships the same
    3 M rows as the join's two (union vs per-side), while the first
    aggregate builds a ~3 M-entry hash table whose group keys carry the
    payload columns — decomposed at 10×: exchange 1.3 s, +2.6 s for
    that aggregate alone, vs 2.3-2.7 s for the ENTIRE join form (two
    1.5 M-row sorts merge cheaper than one 3 M-group hash build; the
    artifact-format hypothesis was tested too — leaf 5.31 s vs
    columnar-persisted 4.89 s — and is not the story). Shuffled-hash
    hint and a key-partitioned artifact were also measured and lost
    (2.9-4.0 s: the eqNullSafe join wraps the key, so a raw-key
    partitioning cannot satisfy its distribution). AQE handles skew at
    the join's exchanges.

    Correctness notes: explicit presence markers — payload columns may
    be legitimately NULL, and the join coalesces/duplicates the key, so
    neither can test presence. The key comparison itself is eqNullSafe:
    a plain equi-join never matches NULL keys, so a NULL-key row
    identical in both snapshots would misreport as one added plus one
    removed.
    """
    o = old.select(
        F.col(key).alias("_o_key"),
        F.lit(1).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key).alias("_n_key"),
        F.lit(1).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    joined = o.join(
        n, F.col("_o_key").eqNullSafe(F.col("_n_key")), "full_outer"
    )
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    has_old = F.col("_o_present").isNotNull()
    has_new = F.col("_n_present").isNotNull()
    cls = (
        F.when(~has_old, F.lit("added"))
        .when(~has_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.select(cls.alias("diff_class"))
        .groupBy("diff_class")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def standard_scale(
    df: DataFrame, group: str, value: str
) -> DataFrame:
    """Per-group z-score standardization ((v − mean)/std) with
    engine-exact moments — the relational twin of MLlib's StandardScaler
    (which operates on assembled vectors; same math).

    The group moments route through DECIMAL sums (associative — a double
    sum's value depends on reduction order in its low bits, a decimal
    sum's does not), then the closed-form population std
    ``sqrt((n·Σx² − (Σx)²)/n²)`` combines in IEEE double (−, ×, /, sqrt
    are correctly rounded → bit-identical on any engine evaluating the
    same tree). Moments broadcast; the scale pass is map-side. The
    ``value`` column must carry ≤ 2 decimal digits (exact decimal cast —
    same contract as the correlation operator). Output adds
    (group_mean, group_std, {value}_scaled).

    decimal(18,2), not (12,2): values to ±1e16 stay exact, and the
    x·x product lands at decimal(37,4) — still inside the 38-digit
    cap, so the square sum stays exact too. (12,2) aborted on a
    ±9.9e11 balance under ANSI (found by tools/fuzz_correctness.py).
    """
    v = F.col(value)
    x = v.cast("decimal(18,2)")
    # count the VALUE column, not rows: sum() skips NULLs, so dividing by
    # count(*) would bias both moments on NULL-bearing input (every
    # z-score in the group shifts and mis-scales)
    n = F.count(x).cast("double")
    sx = F.sum(x).cast("double")
    sxx = F.sum(x * x).cast("double")
    # greatest(·, 0): for a constant group the double combination
    # n·Σx² − (Σx)² can round to a tiny NEGATIVE, and sqrt would be NaN
    var = F.greatest((n * sxx - sx * sx) / (n * n), F.lit(0.0))
    moments = df.groupBy(group).agg(
        (sx / n).alias("_mean"),
        F.sqrt(var).alias("_std"),
    )
    # std = 0 (constant or singleton group): the z-score is undefined —
    # emit NULL rather than divide (Spark 4 ANSI mode raises
    # DIVIDE_BY_ZERO even for doubles; pre-ANSI engines would emit
    # NaN/Inf, which is no more useful)
    scaled = F.when(
        F.col("_std") > 0.0, (v - F.col("_mean")) / F.col("_std")
    )
    return df.join(F.broadcast(moments), group).select(
        *df.columns,
        F.col("_mean").alias("group_mean"),
        F.col("_std").alias("group_std"),
        scaled.alias(f"{value}_scaled"),
    )


def exact_percentiles(
    df: DataFrame,
    group: str,
    value: str,
    ps: dict[str, float],
) -> DataFrame:
    """Per-group EXACT interpolated percentiles via sort + order-statistic
    selection — bit-identical to ``F.percentile`` / the ``Percentile``
    aggregate, at a fraction of its cost on large groups.

    Why not ``F.percentile``: Spark's exact-percentile AGGREGATE buffers
    a (value → count) map per partial and serializes the whole map
    through the merge — for a near-unique double column that is the full
    dataset moving through aggregation buffers (measured: 8.5 s for a
    1.5 M-row groupBy at the 10× fixture vs 3.2 s for this plan, same
    bits). Here the rows shuffle ONCE into a per-group sort
    (``row_number`` window), only the ≤ 2·|ps| order statistics each
    percentile needs survive the filter, and a trivial aggregate picks
    them up.

    Semantics replicated from ``Percentile.getPercentile`` exactly:

    * ``pos = p · (n−1)`` in double; take order statistics at
      ``floor(pos)`` / ``ceil(pos)`` (0-indexed over the NULL-free
      ascending sort — NULLs are ignored, like the aggregate);
    * result = ``(ceil(pos)−pos)·lower + (pos−floor(pos))·higher``,
      or ``lower`` when ``pos`` is integral — the aggregate's exact
      expression shape, validated bitwise against ``F.percentile``
      over randomized inputs in ``tests/test_relational.py``;
    * a group whose values are ALL NULL still emits its row with NULL
      percentiles, like the aggregate: NULLs sort LAST within the
      group, ``_n`` counts only non-NULL values (so non-NULL ranks are
      the right 0-indexed order statistics and a NULL row can never
      collide with a selected rank, ``_i ≥ _n > pos``), and the one
      ``_i == 0`` row of an all-NULL group rides the filter so the
      group surfaces with NULL percentiles — one pass, no second scan.

    Ties are safe under the non-deterministic ``row_number`` order:
    equal values make every tie-permutation produce the same selected
    values. Scale shape: one hash shuffle of (group, value), per-group
    sort — the same per-group single-reducer bound the aggregate has,
    minus its pathological buffer traffic. Output: one row per group,
    one column per ``ps`` key.
    """
    v = F.col(value).cast("double")
    w = Window.partitionBy(group).orderBy(F.col("_v").asc_nulls_last())
    wn = Window.partitionBy(group)
    ranked = (
        df.select(F.col(group), v.alias("_v"))
        .withColumn("_i", F.row_number().over(w) - F.lit(1))
        .withColumn("_n", F.count("_v").over(wn))
    )
    pos_of = {
        name: F.lit(p) * (F.col("_n") - F.lit(1)).cast("double")
        for name, p in ps.items()
    }
    needed = (F.col("_n") == 0) & (F.col("_i") == 0)
    for name in ps:
        pos = pos_of[name]
        needed = needed | (
            (F.col("_i") == F.floor(pos)) | (F.col("_i") == F.ceil(pos))
        )
    aggs = [F.first("_n").alias("_n")]
    for name in ps:
        pos = pos_of[name]
        aggs.append(
            F.max(F.when(F.col("_i") == F.floor(pos), F.col("_v"))).alias(
                f"_lo_{name}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("_i") == F.ceil(pos), F.col("_v"))).alias(
                f"_hi_{name}"
            )
        )
    picked = ranked.where(needed).groupBy(group).agg(*aggs)
    out_cols = [F.col(group)]
    for name, p in ps.items():
        pos = F.lit(p) * (F.col("_n") - F.lit(1)).cast("double")
        lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        out_cols.append(
            F.when(F.floor(pos) == F.ceil(pos), lo)
            .otherwise(
                (F.ceil(pos).cast("double") - pos) * lo
                + (pos - F.floor(pos).cast("double")) * hi
            )
            .alias(name)
        )
    return picked.select(*out_cols)


def winsorize(
    df: DataFrame,
    group: str,
    value: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group percentile clipping (winsorization) — the standard
    outlier treatment before scaling/training.

    Bounds are **exact** interpolated percentiles (``F.percentile`` ==
    SQL ``quantile_cont``) computed in one aggregate pass; the group
    cardinality is small, so the bounds **broadcast** and the clip is
    map-side (``least(greatest(v, lo), hi)`` — comparisons only, no
    arithmetic, so clipped values are bit-exact copies of the bound or
    the original). Output keeps every input column and adds the clip
    bounds, the clipped value, and a ``was_clipped`` audit flag.
    """
    v = F.col(value)
    # sort-based exact percentiles (see exact_percentiles: bit-identical
    # to the Percentile aggregate, without its value-map buffer traffic —
    # the aggregate form measured 8.7 s warm for this query at the 10×
    # fixture, the sort form ~2 s)
    bounds = exact_percentiles(
        df, group, value, {"_lo": lo, "_hi": hi}
    )
    # NULL guard: least/greatest SKIP NULL arguments, so an unguarded
    # clip would fabricate the lower bound for a NULL value — invented
    # data, not clipping. NULL in → NULL out, was_clipped false.
    clipped = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    )
    return df.join(F.broadcast(bounds), group).select(
        *df.columns,
        F.col("_lo").alias("lo_bound"),
        F.col("_hi").alias("hi_bound"),
        clipped.alias(f"{value}_clipped"),
        F.coalesce(
            (v < F.col("_lo")) | (v > F.col("_hi")), F.lit(False)
        ).alias("was_clipped"),
    )
