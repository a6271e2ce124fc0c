"""ORC source/sink — the third columnar interchange format alongside
parquet and CSV (BASELINE north star: a drop-in for warehouses whose lake
standardized on ORC rather than parquet).

100 TB design notes
-------------------
* Spark's native ORC reader is vectorized and supports the same pushdown
  surface as parquet: predicate pushdown into stripe/row-group indexes
  (min/max + optional Bloom filters) and column pruning — `.explain`
  shows ``PushedFilters`` / ``ReadSchema`` exactly as for parquet, so
  every plan property the audit asserts for parquet scans carries over.
* Bloom filters are opt-in per column at write time
  (``orc.bloom.filter.columns``): worth paying for on point-lookup keys
  (id columns), wasted bytes on high-churn measure columns.
* ZSTD compression is the current default tradeoff (parquet parity);
  stripe size tunes scan granularity the way parquet row-group size does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame, path: str, bloom_filter_cols: list[str] | None = None
) -> None:
    """Write ``df`` as ORC under ``path`` (overwrite), optionally building
    Bloom filters for the named point-lookup columns."""
    writer = df.write.mode("overwrite").option("compression", "zstd")
    if bloom_filter_cols:
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        )
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC dataset (schema from the ORC footer — ORC embeds a
    typed schema, so unlike JSONL no explicit schema is required)."""
    return spark.read.orc(path)
