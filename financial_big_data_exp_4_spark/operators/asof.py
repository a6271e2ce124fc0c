"""As-of (point-in-time) join — the canonical time-series operator Spark
lacks natively (BASELINE north star names it; DuckDB ships ``ASOF JOIN``).

Semantics: for each left row, attach the payload of the single right row
with the greatest ``right_ts ≤ left_ts`` within the same key (or NULL if
none). The classic implementation joins then filters then argmaxes —
exploding |left| × |right-per-key| rows. This one is the scalable
union-sort formulation:

1. union left probes and right payload rows, tagged;
2. one shuffle+sort per key on (ts, tag, tiebreak);
3. carry the last non-null payload forward with
   ``last(payload, ignorenulls=True)`` over the running window;
4. keep the probe rows.

Cost: ONE exchange of |L|+|R| rows and an in-partition sort — no
row explosion, no skew beyond the key distribution itself (a hot key
still lands in one partition: salt upstream or split time ranges if a
single key's history exceeds a task). Right-side rows carry only the
payload column through the shuffle.

Determinism: the sort key is (ts, tag, tiebreak) with a unique
right-side tiebreak, so ties between equal timestamps resolve
identically in any engine — the oracle mirrors the same union+window
formulation rather than relying on an engine's ASOF tie policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    tiebreak: str,
    payload_out: str = "asof_value",
) -> DataFrame:
    """Attach ``payload`` of the latest right row (right_ts ≤ left_ts, same
    key) to every left row. ``tiebreak`` is a unique right-side column
    ordering simultaneous right rows; left columns pass through.

    The carried value is the payload of the latest right ROW — a right
    row whose payload is legitimately NULL yields NULL, not a stale
    older value. Mechanically: the union-sort's ``last(ignorenulls)``
    skips NULLs by design (that is how probe rows are passed over), so
    the payload rides inside a one-field STRUCT — non-NULL for every
    right row regardless of the payload value — and is unwrapped after
    the window. The oracle mirrors the same struct wrap.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    pl_struct = StructType(
        [StructField("v", right.schema[payload].dataType)]
    )
    # the tiebreak rides in its NATIVE type — any orderable column works
    # (string uuid, timestamp, bigint). A cast("long") here would crash
    # under ANSI mode for non-numeric tiebreaks, and silently NULL them
    # (destroying the documented tie determinism) under non-ANSI. The
    # probe side's NULL literal takes the same type so the union lines up.
    probes = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(pl_struct).alias("_pl"),
        *[F.col(c) for c in lcols],
    )
    payloads = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tb"),
        F.struct(F.col(payload).alias("v")).alias("_pl"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = probes.unionByName(payloads).withColumn(
        "_asof_s", F.last("_pl", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_tag") == 1).select(
        *lcols, F.col("_asof_s.v").alias(payload_out)
    )
