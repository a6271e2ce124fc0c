"""JSONL (newline-delimited JSON) source/sink and partitioned parquet
sink — the two interchange formats an LLM training-data pipeline lives
on (BASELINE north star; the reference's surface is CSV+parquet only).

100 TB design notes
-------------------
* Spark's json writer emits one JSON object per line per part file —
  JSONL natively, one file per task, no driver involvement. Readers
  ALWAYS pass an explicit schema: schema inference runs a full extra
  pass over the data and silently widens types (a malformed row turns a
  numeric column into string for the whole dataset).
* ``columnNameOfCorruptRecord`` routes malformed lines to a quarantine
  column instead of failing the job — at crawl scale malformed lines are
  a certainty, and FAILFAST on the 40-billionth line is a lost day.
* Partitioned parquet (`partitionBy`) is the standard layout for scan
  pruning: a filter on the partition column prunes directories before
  any IO (shown as PartitionFilters in the scan node). Keep partition
  cardinality bounded (date/type, never a high-cardinality id — a
  million tiny directories is a metadata DoS). ``dynamic`` partition
  overwrite replaces only the partitions present in the incoming data —
  idempotent daily re-runs don't clobber the rest of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as JSONL part files under ``path`` (overwrite)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Read JSONL with an explicit schema (never inferred — see module
    docstring). Malformed lines land in ``corrupt_col`` (PERMISSIVE)
    rather than failing the read; pass ``corrupt_col=None`` for strict
    FAILFAST ingestion.

    The quarantine column is appended to the caller's data schema HERE:
    Spark only populates ``columnNameOfCorruptRecord`` when that column
    exists in the read schema — configured without it, malformed lines
    silently become all-NULL data rows and the quarantine the docstring
    promises never materializes. A schema that ALREADY contains
    ``corrupt_col`` is used as-is (appending again would duplicate the
    column and make every downstream reference ambiguous)."""
    if corrupt_col is None:
        return (
            spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        )
    if isinstance(schema, str):
        # parse the DDL so the containment check is exact (a substring
        # test would false-positive on e.g. a column named
        # `my_corrupt_record`)
        parsed = StructType.fromDDL(schema)
        if corrupt_col not in parsed.fieldNames():
            parsed = parsed.add(corrupt_col, "string")
        schema = parsed
    elif corrupt_col not in schema.fieldNames():
        # copy the field list — StructType.add mutates in place, and
        # StructType(fields) keeps the caller's list by reference
        schema = StructType(list(schema.fields)).add(corrupt_col, "string")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Write a directory-partitioned parquet dataset (dynamic overwrite:
    only partitions present in ``df`` are replaced)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
