"""CSV source/sink — the reference's native IO surface.

Reference behaviours re-expressed (SURVEY.md §2.1):

* S3 — schema-less read (all strings, ``header=True``): supported but
  discouraged; pass a schema (S4 style) so scans are typed and NULL
  semantics are correct.
* S1/S2 — the MapReduce path's naive ``split(",")`` + per-split header-skip
  (reference ``IndustryCount.java:25-35``) is a bug factory (drops one data
  row per extra split, breaks on quoted commas — SURVEY note A). We use
  Spark's CSV source, which handles quoting and headers correctly; the bug
  is deliberately NOT reproduced.
* K2 — single-file GBK-encoded CSV sink (reference ``README.md:190,212,238``
  uses ``repartition(1)``): we ``coalesce(1)`` at the sink only, which
  avoids the full shuffle ``repartition(1)`` would do. Never coalesce
  upstream of compute — the narrow dependency would collapse parallelism
  for the whole stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    encoding: str = "utf-8",
) -> DataFrame:
    reader = spark.read.option("header", header).option("encoding", encoding)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_single_csv(
    df: DataFrame,
    path: str,
    encoding: str = "utf-8",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ONE csv file (reference K2 sink, incl. GBK support).

    Only valid for small (post-aggregate) results: a single output file is
    inherently one task. Large results should use the default parallel
    ``df.write.csv`` instead.
    """
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("header", header)
        .option("encoding", encoding)
        .csv(path)
    )


def write_text(
    df: DataFrame,
    path: str,
    sep: str = "\t",
    mode: str = "overwrite",
) -> None:
    """K1 — ``key<TAB>value`` text sink (reference ``IndustryCount.java:137,148``
    writes MR ``Text`` output lines). Concatenates all columns with ``sep``
    into one string column and writes parallel ``.text`` part files —
    unlike the single-file CSV sink, this keeps full write parallelism.

    NULLs render as empty fields: ``concat_ws`` SKIPS null arguments
    (its documented behavior), which would emit a shorter line and shift
    every later field one column left — silent misalignment for any
    downstream parser — so each column is coalesced to '' first, keeping
    the field count constant.
    """
    from pyspark.sql import functions as F

    line = F.concat_ws(
        sep,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in df.columns
        ],
    )
    df.select(line.alias("value")).write.mode(mode).text(path)
