"""Grouped-map pandas operators (``applyInPandas``): arbitrary per-group
Python over Arrow-batched group frames — the API for per-group transforms
that genuinely need Python (sklearn-style per-group model scoring,
per-entity normalization, custom resampling). BASELINE north star; the
declared query uses per-group *median centering* because the median is
exactly engine-portable (interpolated middle = one IEEE-exact average), so
the pandas path itself sits under the DuckDB oracle hash.

100 TB design notes
-------------------
* ``applyInPandas`` shuffles once on the group key and hands each group to
  a Python worker as ONE Arrow batch — so the operator's parallelism is
  ``min(n_groups, cores)`` and its memory bound is the largest group.
  It is the right tool for *many medium groups* (users, sessions,
  entities); for few giant groups (like this fixture's 5 event types at
  real scale) the group frame itself becomes the bottleneck and the
  transform should be re-expressed as aggregate + broadcast join (the
  pure-JVM form of this exact query is one ``percentile`` aggregate
  joined back — documented here as the scale escape hatch, kept out of
  the declared query precisely because the *pandas boundary* is what the
  oracle is exercising).
* The pandas function must be deterministic and row-order-independent
  (median is); anything order-sensitive would break under shuffle
  nondeterminism and task retries.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_median_center(
    df: DataFrame, key: str, value: str, out_col: str = "centered_value"
) -> DataFrame:
    """Subtract the per-``key`` group median of ``value`` from each row.

    Null ``value`` rows are dropped up front (both the numpy median and
    the oracle's ``quantile_cont`` would otherwise disagree on null
    handling). Output: the input columns plus ``out_col``.
    """
    clean = df.where(F.col(value).isNotNull())
    # build the output schema as a StructType, not DDL string-concat:
    # a column name needing backquotes ("event ts", a reserved word)
    # would make hand-assembled DDL a ParseException at plan time.
    # COPY the schema first — StructType.add mutates in place and
    # DataFrame.schema is cached on the DataFrame, so adding to it
    # directly would corrupt `clean`'s own column list.
    from pyspark.sql.types import StructType

    out_schema = StructType(list(clean.schema.fields)).add(out_col, "double")

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        # numpy interpolated median == quantile_cont(0.5): the even-count
        # case is one IEEE-exact (a+b)/2 — bit-identical across engines
        med = pdf[value].median()
        return pdf.assign(**{out_col: pdf[value] - med})

    return clean.groupBy(key).applyInPandas(center, schema=out_schema)
