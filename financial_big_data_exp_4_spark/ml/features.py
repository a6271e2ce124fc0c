"""Task-4 feature engineering (reference ``任务四/exp4_work4.ipynb`` cells
7-22, ``README.md:320-361``): impute → label-encode → quantile-bucket the
date indices → assemble → split.

Deviations from the reference, each deliberate (SURVEY §7 trap 4):
* the train/test split is a deterministic per-row hash
  (:func:`~financial_big_data_exp_4_spark.functions.core.train_test_split_col`)
  instead of the reference's *unseeded* ``randomSplit`` (nb4 cell 22) —
  reproducible on any cluster topology / partition layout;
* everything composes into one ``pyspark.ml.Pipeline`` (M12) so
  ``fit``/``transform``/``save`` carry the whole feature chain.

100 TB notes: ``StringIndexer.fit`` collects each column's distinct labels
to the driver — fine for the reference's categoricals (≤ thousands of
labels), fatal on a web-scale id-like column, so
:func:`build_feature_pipeline` guards it: ONE aggregate of
``approx_count_distinct`` over all to-be-indexed columns, raising before
any fit when a column exceeds ``MAX_INDEX_CARDINALITY``. On
reference-shaped data the guard never fires (nb4 cells 9-11 index 8
bounded-cardinality columns). ``QuantileDiscretizer`` uses the
Greenwald-Khanna sketch — one pass, mergeable across partitions, no sort.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    QuantileDiscretizer,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_big_data_exp_4_spark.functions.core import train_test_split_col
from financial_big_data_exp_4_spark.sources.loans import STRING_FEATURE_COLS

LABEL_COL = "is_default"

#: The two pseudo-date string columns the reference quantile-buckets into
#: 20 levels after indexing (nb4 cell 15, README.md:338-342).
DATE_INDEX_COLS: tuple[str, ...] = ("issue_date_ind", "earlies_credit_mon_ind")

#: Columns deliberately EXCLUDED from the feature vector. The reference's
#: indexed-string list (nb4 cell 9) covers 8 of its 9 string columns;
#: ``employer_type`` is the task-3 reporting dimension and is not a model
#: feature there — the exclusion is reference parity, and it must be
#: explicit: an unexpected dtype falling through a narrow allowlist would
#: silently shrink the feature vector with no error.
NON_FEATURE_COLS: tuple[str, ...] = ("loan_id", "user_id", "employer_type")

#: Ceiling on the distinct-label count of any column fed to
#: ``StringIndexer`` — its ``fit`` collects EVERY distinct label to the
#: driver, so an id-like column at web scale is a driver OOM, not a slow
#: job. 100k labels ≈ a few MB collected: generous for genuine
#: categoricals (the reference's 8 indexed columns are each ≤ thousands),
#: far below the id-column blowup the guard exists to catch.
MAX_INDEX_CARDINALITY = 100_000

FEATURE_PIPELINE_STAGES = (
    "impute(-1 / '-1')",
    "StringIndexer ×8 (frequencyDesc)",
    "QuantileDiscretizer(20) ×2",
    "VectorAssembler",
)


def impute(df: DataFrame) -> DataFrame:
    """M1: ``na.fill(-1)`` then ``na.fill('-1')`` (nb4 cell 7)."""
    return df.na.fill(-1).na.fill("-1")


def build_feature_pipeline(
    df: DataFrame,
    label_col: str = LABEL_COL,
    max_index_cardinality: int | None = MAX_INDEX_CARDINALITY,
) -> tuple[Pipeline, list[str]]:
    """The reference's feature chain as one Pipeline (M2+M3+M4+M12).

    Returns (pipeline, assembled_input_cols). Feature columns = every
    non-label column, with the 8 strings replaced by their indices and
    the 2 date indices replaced by their 20-quantile buckets — the
    reference's exact recipe (nb4 cells 9-20).

    ``max_index_cardinality`` (module docstring): every to-be-indexed
    column's distinct-label count is estimated in ONE
    ``approx_count_distinct`` aggregate, and any column above the ceiling
    raises *before* ``StringIndexer.fit`` can attempt to collect its
    labels to the driver. Pass ``None`` to skip the check (and its one
    scan) when the caller has already profiled the columns.
    """
    string_cols = [c for c in STRING_FEATURE_COLS if c in df.columns]
    if max_index_cardinality is not None and string_cols:
        # one job, map-side HLL sketches, a single driver row — vs the
        # full distinct-label collect StringIndexer.fit would do per
        # column. rsd 5%: plenty to separate "thousands" from "millions";
        # the ceiling is a guard rail, not an exact budget.
        card = (
            df.agg(
                *[
                    F.approx_count_distinct(c, rsd=0.05).alias(c)
                    for c in string_cols
                ]
            )
            .head()
            .asDict()
        )
        over = {
            c: n for c, n in card.items() if n > max_index_cardinality
        }
        if over:
            raise ValueError(
                "build_feature_pipeline: column(s) too high-cardinality "
                f"to StringIndex (approx distinct labels): {over} — "
                f"ceiling {max_index_cardinality}. Id-like columns do "
                "not belong in a label index (StringIndexer.fit collects "
                "every distinct label to the driver); hash-bucket or "
                "drop them instead."
            )
    indexers = [
        StringIndexer(
            inputCol=c, outputCol=f"{c}_ind", handleInvalid="keep"
        )
        for c in string_cols
    ]
    date_inds = [c for c in DATE_INDEX_COLS if c.removesuffix("_ind") in string_cols]
    buckets = [
        QuantileDiscretizer(
            numBuckets=20,
            inputCol=c,
            outputCol=f"{c}_bkt",
            relativeError=0.001,
        )
        for c in date_inds
    ]
    feature_cols = []
    for name, dtype in df.dtypes:
        if name == label_col or name in NON_FEATURE_COLS:
            continue
        if name in string_cols:
            ind = f"{name}_ind"
            feature_cols.append(
                f"{ind}_bkt" if ind in date_inds else ind
            )
        elif dtype in (
            "int",
            "bigint",
            "double",
            "float",
            "smallint",
            "tinyint",
            "boolean",
        ) or dtype.startswith("decimal"):
            # every numeric-family dtype is a feature — a narrow
            # allowlist silently drops tinyint flags or decimal amounts
            # from the vector and the model degrades with no error
            feature_cols.append(name)
        else:
            raise ValueError(
                f"build_feature_pipeline: column {name!r} has "
                f"non-feature dtype {dtype!r} — index it (add to "
                "string_cols), cast it, or drop it explicitly; silently "
                "excluding it would train on fewer features than declared"
            )
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="keep"
    )
    return Pipeline(stages=[*indexers, *buckets, assembler]), feature_cols


def prepare_features(df: DataFrame, label_col: str = LABEL_COL) -> DataFrame:
    """Impute + fit/transform the feature pipeline → (features, label)."""
    imputed = impute(df)
    pipeline, _ = build_feature_pipeline(imputed, label_col)
    return pipeline.fit(imputed).transform(imputed).select(
        "loan_id", "features", F.col(label_col).alias("label")
    )


def train_test_split(
    df: DataFrame, key_col: str = "loan_id", train_pct: int = 80
) -> tuple[DataFrame, DataFrame]:
    """M5: deterministic 80/20 split on a per-row hash of the key."""
    tagged = df.withColumn("_split", train_test_split_col(F.col(key_col), train_pct))
    train = tagged.where(F.col("_split") == "train").drop("_split")
    test = tagged.where(F.col("_split") == "test").drop("_split")
    return train, test
