"""Bucketed tables: pre-shuffle once at write time, join shuffle-free
forever after (BASELINE north star: "co-locate joins via bucketing").

``write_bucketed`` hash-partitions rows into ``n_buckets`` files per the
key and records the bucketing in the catalog; two tables bucketed the
same way join with NO Exchange on either side — the shuffle happened once
at ingest instead of per-query. This is the 100 TB answer for the
orders⋈customer style of repeated fact/fact joins where neither side is
broadcastable.

Bucket pruning also applies: an equality filter on the bucket key reads
1/n_buckets of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and in-bucket sorted)
    by ``key``. ``path`` makes it an external table (useful for tests);
    otherwise it lands in the session warehouse."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan contains no Exchange — each
    task reads bucket i from both sides and joins locally."""
    return spark.table(left_table).join(spark.table(right_table), on=key)
