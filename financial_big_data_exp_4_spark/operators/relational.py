"""Relational pipeline patterns: CDC keep-latest deduplication and
deterministic sampling (BASELINE north star — staples of a training-data
ingestion pipeline that the reference's single-table workload never
needed).

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Same multiplicative-hash constants as functions.core.train_test_split_col.
_HASH_P = 1_000_000_007
_KNUTH = 2_654_435_761


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

    Keeps rows where ``((key mod P) * knuth) mod P mod 100 < pct`` —
    pure integer arithmetic, identical in any engine, pushed into the
    scan as an ordinary filter (partition/file pruning still applies).
    """
    k = F.col(key)
    bucket = ((k % _HASH_P) * _KNUTH) % _HASH_P % 100
    return df.where(bucket < pct)
