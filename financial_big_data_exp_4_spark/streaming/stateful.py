"""Arbitrary-stateful streaming via ``applyInPandasWithState`` — the
escape hatch for operators Structured Streaming's built-ins can't express
(custom per-key accumulators, cross-event machines, model-state updates).

The built-in stateful operators (windowed aggregates, ``session_window``,
``dropDuplicates``, stream-stream joins) cover the declared streaming
surface in :mod:`.windows`; this module demonstrates the general form: a
user function receives each key's new rows per microbatch as Arrow-backed
pandas frames plus a ``GroupState`` handle, and owns the state schema,
update rule, and emission policy.

100 TB design notes
-------------------
* State is per-key and lives in the state store (one store per shuffle
  partition): the function sees ONE key at a time, so memory is bounded
  by the largest single key's batch rows, not by key count. The state
  struct here is two longs — the smallest useful accumulator.
* The pandas boundary is Arrow-batched per (partition, key-group) — the
  same transfer economics as batch ``applyInPandas``; a custom stateful
  op should still push every expressible predicate/projection *before*
  it so the Python worker sees minimal columns.
* ``GroupStateTimeout.NoTimeout`` keeps state forever — correct for a
  bounded availableNow drain; a 24/7 deployment sets processing- or
  event-time timeout and emits/clears on ``state.hasTimedOut`` (the
  standard TTL pattern), exactly like ``dropDuplicatesWithinWatermark``
  scopes its guarantee.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output/state schemas for :func:`streaming_user_running_totals` —
#: declared as DDL strings, the applyInPandasWithState contract.
USER_TOTALS_OUTPUT_SCHEMA = (
    "user_id long, n_events long, last_ts_us long"
)
USER_TOTALS_STATE_SCHEMA = "n long, last_ts_us long"

#: In-state/in-transit stand-in for "no real event time observed yet".
#: int64-min, not 0: a key whose events are all pre-epoch (negative µs —
#: backfills of historic data) must report its true max, which
#: ``max(0, ts)`` would silently pin to 0. NULL event times coalesce to
#: the same value BEFORE the Arrow boundary (nullable int64 → float64
#: loses exactness above 2^53), and any real timestamp dominates it.
_NO_TS_SENTINEL = -(2**63)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (event count, max event time): fold this batch's
    rows into the state, emit the updated totals once per batch.

    State carries :data:`_NO_TS_SENTINEL` while no real timestamp has
    been observed, but the EMITTED ``last_ts_us`` is NULL in that case
    (round-11 ADVICE: the batch oracle ``CAST(max(epoch_us(ts)) AS
    BIGINT)`` yields NULL for an all-NULL key, and int64-min is a
    theoretically reachable real value — NULL is the only faithful
    emission). Null-ts rows still COUNT toward ``n_events`` exactly like
    the oracle's ``count(*)``."""
    n, last = state.get if state.exists else (0, _NO_TS_SENTINEL)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            # ts_us is guaranteed non-null int64 (NULL event times are
            # coalesced to the sentinel BEFORE the Arrow boundary — see
            # streaming_user_running_totals), so the max stays
            # integer-exact end to end
            last = max(last, int(pdf["ts_us"].max()))
    state.update((n, last))
    # This constructor runs once PER KEY — at 10× that is 15k one-row
    # frames per drain, and dict-of-numpy construction measures ~2×
    # faster than the list/pd.array form. The nullable Int64 column
    # (pd.NA → true SQL NULL through the declared `long` schema) is
    # only needed in the all-NULL-timestamps case; a real max stays on
    # the plain-int64 fast path, integer-exact either way.
    if last == _NO_TS_SENTINEL:
        ts_out = pd.array([pd.NA], dtype="Int64")
    else:
        ts_out = np.array([last], dtype=np.int64)
    yield pd.DataFrame(
        {
            "user_id": np.array([key[0]], dtype=np.int64),
            "n_events": np.array([n], dtype=np.int64),
            "last_ts_us": ts_out,
        }
    )


def streaming_user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming aggregate: per-user running event count
    and last event time, maintained in ``GroupState`` and re-emitted
    each microbatch (update semantics).

    ``events`` must carry ``user_id`` and a ``ts_utc`` event-time column
    (the :func:`..streaming.read_events_stream` contract); the µs value
    is derived before the pandas boundary so the Python worker sees two
    narrow columns only.
    """
    from pyspark.sql import functions as F

    # Coalesce NULL event times to the int64-min sentinel HERE, before
    # the Arrow boundary: a nullable int64 column becomes float64 in
    # pandas, where µs magnitudes (~1.7e18) exceed float64's 2^53
    # exact-integer range — the max would silently drift by up to
    # ~256µs (round-10 review). The sentinel equals the fresh-state
    # seed and never beats a real timestamp; the update fn emits NULL
    # when only the sentinel was ever seen (matching the batch oracle's
    # NULL max), and null-ts rows still COUNT toward n_events exactly
    # like the oracle's count(*).
    slim = events.select(
        "user_id",
        F.coalesce(
            F.unix_micros(F.col("ts_utc")),
            F.lit(_NO_TS_SENTINEL).cast("long"),
        ).alias("ts_us"),
    )
    return slim.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=USER_TOTALS_OUTPUT_SCHEMA,
        stateStructType=USER_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
