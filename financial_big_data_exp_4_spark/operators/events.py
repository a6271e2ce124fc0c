"""Event-stream operators over ``events``: tumbling-window aggregation,
gap-based sessionization, JSON property extraction (SURVEY §2.8 X5).

Batch semantics, streaming-shaped: the tumbling-window aggregation is the
exact batch twin of ``events.withWatermark('ts_utc', ...).groupBy(
F.window('ts_utc', '1 hour'), 'event_type').count()`` in Structured
Streaming (see :mod:`financial_big_data_exp_4_spark.streaming`), and the
sessionizer is the batch twin of a ``session_window`` / stateful
``applyInPandasWithState`` aggregation.

``events.ts`` arrives from the loader as canonical bigint nanoseconds
(``sources.parquet.load_table`` normalizes both physical encodings —
TIMESTAMP(NANOS) and TIMESTAMP(MICROS) — to it) and windows with exact
integer arithmetic — at ~1.7e18 ns a double round-trip would lose
precision. The
oracle mirrors via ``epoch_us`` (its reader truncates ns→µs; truncation
cannot move an event across an hour or session boundary defined in whole
seconds... gaps are computed in seconds below for exactly that reason).

100 TB design notes: tumbling counts are one partial-aggregated shuffle on
(hour, type) — bounded key space. Sessionization shuffles once on user_id
(range-partition + in-partition sort); session ids are per-user running
sums — no global coordination, the canonical scalable formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.functions.core import floor_div_sql

NS_PER_SEC = 1_000_000_000
SESSION_GAP_SEC = 30 * 60
#: Max elements per generated gap-fill grid array (~128KB of longs):
#: bounds executor memory per row however wide the event-time span is.
_GRID_CHUNK_HOURS = 16_384


def tumbling_counts(events: DataFrame, width_sec: int = 3600) -> DataFrame:
    """Events per (tumbling window, event_type); window key = epoch seconds
    of the window start.

    All time math is integer FLOOR division (``floor_div_sql`` — Spark's
    bare ``DIV`` truncates toward zero, putting pre-epoch events in a
    double-width bucket at zero; the DuckDB oracle's ``//`` truncates
    too, so the oracle floors via ``duck_floor_div``);
    a double round-trip on ~1.7e18 ns values would round (doubles are
    exact only to 2^53) and could misplace events at window boundaries."""
    win = (
        F.expr(floor_div_sql("ts", NS_PER_SEC * width_sec)) * width_sec
    ).cast("long")
    return (
        events.select(win.alias("window_start_s"), "event_type")
        .groupBy("window_start_s", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


def hopping_counts(
    events: DataFrame, width_sec: int = 3600, hop_sec: int = 1800
) -> DataFrame:
    """Events per (HOPPING window, event_type) — the sliding sibling of
    :func:`tumbling_counts` (width 1 h, hop 30 min by default: every
    event lands in width/hop = 2 overlapping windows). Spark's native
    ``F.window(ts, width, hop)`` expresses this over timestamps; the
    events loader normalizes ``ts`` to epoch-NANOSECOND bigints, so the
    windows are derived arithmetically instead, with the same integer
    floor-division discipline as the tumbling op (pre-epoch events
    bucket correctly; doubles would round above 2^53).

    Derivation: the window containing t whose start is ≡ j·hop
    (mod width) starts at ``floor((t − j·hop)/width)·width + j·hop``;
    exploding j = 0..width/hop−1 enumerates each event's windows
    exactly once. Map-side explode (×width/hop rows) then one grouped
    aggregate — the same single-shuffle shape as tumbling, just a
    constant-factor wider shuffle, which IS the cost of hopping
    windows on any engine. ``hop_sec`` must divide ``width_sec``."""
    if width_sec % hop_sec:
        raise ValueError(
            f"hop {hop_sec}s must divide width {width_sec}s for aligned "
            "hopping windows"
        )
    starts = [
        (
            F.expr(
                floor_div_sql(
                    f"ts - {j * hop_sec * NS_PER_SEC}",
                    NS_PER_SEC * width_sec,
                )
            )
            * width_sec
            + j * hop_sec
        ).cast("long")
        for j in range(width_sec // hop_sec)
    ]
    return (
        events.select(
            F.explode(F.array(*starts)).alias("window_start_s"),
            "event_type",
        )
        .groupBy("window_start_s", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event (same user) exceeds ``gap_sec``.

    session_idx = running count of session starts (per user, ordered by
    (ts_seconds, event_id) — second-truncated time so Spark's ns reader
    and the oracle's µs reader order identically, with the event_id
    tiebreak making the order total, hence the output deterministic).
    Output: one row per session with event count and duration in seconds.
    """
    base = events.select(
        "user_id",
        "event_id",
        F.expr(floor_div_sql("ts", NS_PER_SEC)).alias("ts_s"),  # floor-exact
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    prev = F.lag("ts_s").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts_s") - prev) > gap_sec), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = base.withColumn("_new", is_new).withColumn(
        "session_idx", F.sum("_new").over(wsum)
    )
    return (
        tagged.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
        )
        .select(
            "user_id",
            "session_idx",
            "n_events",
            (F.col("end_s") - F.col("start_s")).alias("duration_s"),
        )
    )


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Time-series resampling: per event_type, the *dense* hourly count
    series between that type's first and last event — missing hours
    emitted with count 0 (the gap-fill every downstream
    charting/forecasting consumer needs; an aggregate alone silently
    drops empty buckets).

    Shape: one partial-aggregated shuffle to hourly counts (bounded key
    space: types × hours), then the dense grid is *generated* from the
    tiny per-type (min, max) span via ``sequence``+``explode`` — the fact
    table is never scanned twice — and left-joined back to the counts.
    At 100 TB the grid is still only types × hours rows; everything after
    the first aggregate is dimension-sized.

    The grid generates in CHUNKS of ``_GRID_CHUNK_HOURS``: a single
    ``sequence(lo, hi)`` materializes the whole span as ONE in-memory
    array, so a span stretched by a corrupt timestamp (the fuzz fixture's
    1969→2100 events are 1.15M hours; a year-9999 outlier would be 70M)
    becomes a single-row memory bomb. Two nested bounded explodes emit
    the identical rows with every intermediate array ≤ chunk-sized, and
    the join that follows hash-spreads the grid rows regardless.
    """
    hour = F.expr(floor_div_sql("ts", NS_PER_SEC * 3600)).cast("long")
    counts = (
        events.select(F.col("event_type"), hour.alias("hour_bucket"))
        .groupBy("event_type", "hour_bucket")
        .agg(F.count("*").alias("n_events"))
    )
    spans = counts.groupBy("event_type").agg(
        F.min("hour_bucket").alias("_lo"), F.max("hour_bucket").alias("_hi")
    )
    w = _GRID_CHUNK_HOURS
    chunks = spans.select(
        "event_type",
        "_lo",
        "_hi",
        F.explode(
            F.sequence(
                F.expr(floor_div_sql("_lo", w)),
                F.expr(floor_div_sql("_hi", w)),
            )
        ).alias("_chunk"),
    )
    grid = chunks.select(
        "event_type",
        F.explode(
            F.sequence(
                F.greatest(F.col("_lo"), F.col("_chunk") * w),
                F.least(F.col("_hi"), F.col("_chunk") * w + (w - 1)),
            )
        ).alias("hour_bucket"),
    )
    return grid.join(counts, ["event_type", "hour_bucket"], "left").select(
        "event_type",
        (F.col("hour_bucket") * 3600).cast("long").alias("hour_start_s"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
            "n_events"
        ),
    )


def json_extract_stats(events: DataFrame) -> DataFrame:
    """Parse the ``props`` JSON column (``{"k": <int>}``) and aggregate the
    extracted value per event_type — the semi-structured-column pattern.
    ``get_json_object`` is a native JVM expression (Jackson), pushdown- and
    codegen-friendly; exact integer SUM keeps the result engine-portable.
    ``try_cast``, not ``cast``: semi-structured data WILL contain
    non-integer values eventually, and under Spark 4's default ANSI mode
    a plain cast would abort the whole aggregation on the first one —
    try_cast yields NULL, which the null-skipping sum/min/max absorb
    (DuckDB's TRY_CAST is the oracle mirror).
    """
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def funnel_counts(
    events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached stage k — i.e.
    performed stage-1 … stage-k events with strictly increasing first
    times (first view < first click < first purchase).

    One shuffle on user_id with map-side partial aggregation (the
    conditional ``min`` per stage — k columns of state per user, never a
    per-event row after the aggregate); the stage comparison and the
    final k-row summary are driver-free aggregates over |users| rows.
    First-touch timestamps are compared in exact integer µs. Output:
    (stage_idx, stage, n_users), stage_idx 1..k.
    """
    ts_us = F.expr(floor_div_sql("ts", 1000)).alias("ts_us")
    per_user = (
        events.select("user_id", "event_type", ts_us)
        .groupBy("user_id")
        .agg(
            *[
                F.min(
                    F.when(F.col("event_type") == s, F.col("ts_us"))
                ).alias(f"_t{i}")
                for i, s in enumerate(stages)
            ]
        )
    )
    # reached stage k ⇔ all first-touch times exist and strictly ascend
    reached = []
    for i in range(len(stages)):
        cond = F.col("_t0").isNotNull()
        for j in range(1, i + 1):
            cond = cond & F.col(f"_t{j}").isNotNull() & (
                F.col(f"_t{j-1}") < F.col(f"_t{j}")
            )
        # coalesce: SUM over zero users is NULL; an empty stream should
        # report 0 reached, not NULL (totality on empty input)
        reached.append(
            F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(f"_n{i}")
        )
    totals = per_user.agg(*reached)
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"_n{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return totals.select(F.explode(stage_rows).alias("_s")).select(
        "_s.stage_idx", "_s.stage", "_s.n_users"
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort-retention matrix: users grouped by their first active day
    (the cohort), counted per day-offset since that day.

    Two exchanges total and no count-distinct expand: one shuffle on
    user_id collects each user's distinct active-day set
    (``collect_set`` — state bounded by calendar days, with map-side
    partial aggregation); the cohort day is ``array_min`` of that set and
    the offsets explode map-side, so each (user, offset) appears exactly
    once and a plain ``count(*)`` per (cohort_day, day_offset) IS the
    distinct-user count. The second shuffle's key space is bounded
    (days²/2) — dimension-sized. Day arithmetic is exact integer ns→day
    division. Output: (cohort_day, day_offset, n_users).
    """
    day = F.expr(floor_div_sql("ts", 86_400_000_000_000)).cast(
        "long"
    )  # ns → day, floored
    per_user = events.select("user_id", day.alias("day")).groupBy(
        "user_id"
    ).agg(F.collect_set("day").alias("_days"))
    exploded = per_user.select(
        F.array_min("_days").alias("cohort_day"),
        F.explode("_days").alias("day"),
    )
    return (
        exploded.groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order event-sequence mining: counts of (previous event type →
    event type) transitions within each user's ordered history — the
    Markov-transition matrix behind path analysis and next-event models.

    One shuffle on user_id feeds the lag window; the transition pairs
    then partial-aggregate into a bounded key space (|types|²), so the
    second exchange is dimension-sized. The per-user order is
    (µs-floored ts, event_id) — total, so transitions are deterministic,
    and µs-truncated like every other ordered operator here: the oracle
    reads µs-precision timestamps, so ordering by raw ns would diverge
    on a NANOS-encoded fixture whenever two events share a µs but differ
    in sub-µs ns (the event_id tiebreak then decides on both engines).
    First events (no predecessor) are excluded. Output:
    (prev_type, event_type, n_transitions).
    """
    # two-step select: a window cannot reference a lateral alias from
    # the same projection (UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS)
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(floor_div_sql("ts", 1000)).alias("_ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("_ts_us", "event_id")
    tagged = base.select(
        "user_id",
        "event_id",
        "_ts_us",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        tagged.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def moving_value_avg(events: DataFrame, n: int = 3) -> DataFrame:
    """Per-user moving sum/average of ``value`` over the last ``n`` events
    (bounded ROWS frame, ordered by (µs timestamp, event_id) — a total
    order, so the frame contents are deterministic).

    The frame sum routes through DECIMAL(18,6): windowed double sums are
    engine-specific in association order (sliding-window optimizers
    subtract-and-add, segment trees regroup) and would drift by ULPs;
    decimal addition is associative, so the moving average is exact and
    portable. One shuffle on user_id; the frame is O(n) state per row.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    base = events.select(
        "event_id",
        "user_id",
        F.expr(floor_div_sql("ts", 1000)).alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("_v"),
    )
    msum = F.sum("_v").over(w)
    mcnt = F.count("_v").over(w)
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        msum.cast("double").alias("mov_sum"),
        (msum.cast("double") / mcnt.cast("double")).alias("mov_avg"),
    )
