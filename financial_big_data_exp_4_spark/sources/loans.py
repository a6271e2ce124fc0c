"""The reference's native table: ``loans`` (train_data.csv shape).

The reference declares an explicit 42-field schema for its loan-default
table (reference ``README.md:268-310``, ``任务四/exp4_work4.ipynb`` cells
3-5). The CSV itself was never committed, so tests synthesize a
loans-shaped DataFrame with the same schema and the distributional
properties the golden outputs imply (FIXTURES.md §1): 14 skewed
``industry`` values, 6 skewed ``employer_type`` values, the ``work_year``
string grammar incl. NULLs, ¥1000-bucketable ``total_loan``, and an
``is_default`` label correlated with the numeric features so the task-4
classifiers can reach the reference's AUC (LR 0.80 / RF 0.85).

Note the reference schema has no ``employer_type`` column — its task 3-1
groups by ``employer_type`` loaded from the schema-less (all-string) read
(nb2 cell 2). We add it as a 43rd nullable string column so one synthetic
table serves tasks 1-4; the 42 reference fields keep their exact names,
types, and order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

REFERENCE_FIELDS: list[tuple[str, T.DataType]] = [
    ("loan_id", T.IntegerType()),
    ("user_id", T.IntegerType()),
    ("total_loan", T.DoubleType()),
    ("year_of_loan", T.IntegerType()),
    ("interest", T.DoubleType()),
    ("monthly_payment", T.DoubleType()),
    ("class", T.StringType()),
    ("sub_class", T.StringType()),
    ("work_type", T.StringType()),
    ("employment_type", T.StringType()),
    ("industry", T.StringType()),
    ("work_year", T.StringType()),
    ("house_exist", T.IntegerType()),
    ("house_loan_status", T.IntegerType()),
    ("censor_status", T.IntegerType()),
    ("marriage", T.IntegerType()),
    ("offsprings", T.IntegerType()),
    ("issue_date", T.StringType()),
    ("use", T.IntegerType()),
    ("post_code", T.DoubleType()),
    ("region", T.IntegerType()),
    ("debt_loan_ratio", T.DoubleType()),
    ("del_in_18month", T.DoubleType()),
    ("scoring_low", T.DoubleType()),
    ("scoring_high", T.DoubleType()),
    ("pub_dero_bankrup", T.DoubleType()),
    ("early_return", T.IntegerType()),
    ("early_return_amount", T.IntegerType()),
    ("early_return_amount_3mon", T.DoubleType()),
    ("recircle_b", T.DoubleType()),
    ("recircle_u", T.DoubleType()),
    ("initial_list_status", T.IntegerType()),
    ("earlies_credit_mon", T.StringType()),
    ("title", T.DoubleType()),
    ("policy_code", T.DoubleType()),
    ("f0", T.DoubleType()),
    ("f1", T.DoubleType()),
    ("f2", T.DoubleType()),
    ("f3", T.DoubleType()),
    ("f4", T.DoubleType()),
    ("f5", T.DoubleType()),
    ("is_default", T.IntegerType()),
]

#: The 8 string columns the reference label-encodes (nb4 cells 9-11).
STRING_FEATURE_COLS: tuple[str, ...] = (
    "class",
    "sub_class",
    "work_type",
    "employment_type",
    "industry",
    "work_year",
    "issue_date",
    "earlies_credit_mon",
)

INDUSTRIES: tuple[str, ...] = (
    "金融业", "电力、热力生产供应业", "公共服务、社会组织", "住宿和餐饮业",
    "文化和体育业", "建筑业", "房地产业", "采矿业", "信息传输、软件和信息技术服务业",
    "交通运输、仓储和邮政业", "农、林、牧、渔业", "批发和零售业", "国际组织", "制造业",
)
EMPLOYER_TYPES: tuple[str, ...] = (
    "普通企业", "政府机构", "幼教与中小学校", "世界五百强", "高等教育机构", "上市企业",
)
WORK_TYPES: tuple[str, ...] = ("职员", "工人", "公务员", "其它")
EMPLOYMENT_TYPES: tuple[str, ...] = ("全职", "兼职", "自由职业")


def loans_schema(include_employer_type: bool = True) -> T.StructType:
    fields = [T.StructField(n, t, True) for n, t in REFERENCE_FIELDS]
    if include_employer_type:
        fields.append(T.StructField("employer_type", T.StringType(), True))
    return T.StructType(fields)


def work_year_string(n: int | None) -> str | None:
    """Render the reference's work_year grammar (README.md:224-233):
    NULL | '< 1 year' | '1 year' | '2 years'..'9 years' | '10+ years'."""
    if n is None:
        return None
    if n <= 0:
        return "< 1 year"
    if n >= 10:
        return "10+ years"
    return f"{n} year" + ("" if n == 1 else "s")


def synthesize_loans(
    spark: SparkSession, n_rows: int = 20_000, seed: int = 42
) -> DataFrame:
    """Deterministic loans-shaped table for tests/benchmarks.

    Built with numpy on the driver (test scale only) then parallelized; the
    label is a noisy logistic function of scoring/debt/interest features so
    task-4 classifiers can reach AUC >= 0.8.
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    idx = np.arange(n_rows)

    total_loan = np.round(rng.gamma(3.0, 4000.0, n_rows) + 500.0, 2)
    year_of_loan = rng.choice([3, 5], n_rows)
    interest = np.round(rng.uniform(5, 25, n_rows), 2)
    monthly_payment = np.round(
        total_loan * (1 + interest / 100.0) / (year_of_loan * 12), 2
    )
    wy_n = rng.integers(-1, 13, n_rows)  # -1 -> NULL sentinel pre-render
    work_year = np.array(
        [None if v < 0 else work_year_string(int(min(v, 11)))
         for v in wy_n], dtype=object,
    )
    scoring_low = np.round(rng.normal(550, 80, n_rows), 1)
    scoring_high = scoring_low + np.round(rng.uniform(20, 120, n_rows), 1)
    debt_loan_ratio = np.round(rng.uniform(0, 40, n_rows), 2)

    # Signal strength calibrated so the reference hyperparameters reach the
    # reference's AUC band (LR≈0.80, RF≈0.85 — nb4 cells 30/44): logit std
    # ≈ 2.2, plus an interest×debt interaction the tree models can exploit
    # but a linear model cannot (reproducing the reference's RF > LR gap).
    logit = (
        -0.02 * (scoring_low - 550)
        + 0.085 * (debt_loan_ratio - 20)
        + 0.2 * (interest - 15)
        + 0.006 * (interest - 15) * (debt_loan_ratio - 20)
        - 1.45
    )
    is_default = (
        rng.uniform(size=n_rows) < 1.0 / (1.0 + np.exp(-logit))
    ).astype("int32")

    def maybe_null(arr, frac=0.05):
        out = arr.astype(object)
        out[rng.uniform(size=n_rows) < frac] = None
        return out

    classes = np.array(list("ABCDEFG"))
    cls = classes[rng.integers(0, 7, n_rows)]
    pdf = pd.DataFrame(
        {
            "loan_id": idx.astype("int32"),
            "user_id": idx.astype("int32"),
            "total_loan": total_loan,
            "year_of_loan": year_of_loan.astype("int32"),
            "interest": interest,
            "monthly_payment": monthly_payment,
            "class": cls,
            "sub_class": np.char.add(cls.astype(str), rng.integers(1, 6, n_rows).astype(str)),
            "work_type": np.array(WORK_TYPES)[rng.integers(0, len(WORK_TYPES), n_rows)],
            "employment_type": np.array(EMPLOYMENT_TYPES)[rng.integers(0, len(EMPLOYMENT_TYPES), n_rows)],
            "industry": np.array(INDUSTRIES)[
                rng.choice(len(INDUSTRIES), n_rows, p=_skew(len(INDUSTRIES)))
            ],
            "work_year": work_year,
            "house_exist": rng.integers(0, 2, n_rows).astype("int32"),
            "house_loan_status": rng.integers(0, 3, n_rows).astype("int32"),
            "censor_status": rng.integers(0, 3, n_rows).astype("int32"),
            "marriage": rng.integers(0, 3, n_rows).astype("int32"),
            "offsprings": rng.integers(0, 4, n_rows).astype("int32"),
            "issue_date": np.array(
                [f"2{int(v) % 5}1{int(v) % 7}/{int(v) % 12 + 1}/1" for v in idx]
            ),
            "use": rng.integers(0, 14, n_rows).astype("int32"),
            "post_code": maybe_null(np.round(rng.uniform(100, 999, n_rows), 0)),
            "region": rng.integers(0, 50, n_rows).astype("int32"),
            "debt_loan_ratio": maybe_null(debt_loan_ratio),
            "del_in_18month": maybe_null(rng.integers(0, 10, n_rows).astype(float)),
            "scoring_low": scoring_low,
            "scoring_high": scoring_high,
            "pub_dero_bankrup": maybe_null(rng.integers(0, 3, n_rows).astype(float)),
            "early_return": rng.integers(0, 2, n_rows).astype("int32"),
            "early_return_amount": rng.integers(0, 5000, n_rows).astype("int32"),
            "early_return_amount_3mon": np.round(rng.uniform(0, 2000, n_rows), 2),
            "recircle_b": np.round(rng.uniform(0, 60000, n_rows), 2),
            "recircle_u": maybe_null(np.round(rng.uniform(0, 120, n_rows), 1)),
            "initial_list_status": rng.integers(0, 2, n_rows).astype("int32"),
            "earlies_credit_mon": np.array(
                [f"{1980 + int(v) % 40}-{int(v) % 12 + 1:02d}" for v in idx]
            ),
            "title": maybe_null(rng.integers(0, 50, n_rows).astype(float)),
            "policy_code": np.ones(n_rows),
            **{f"f{i}": maybe_null(np.round(rng.uniform(0, 30, n_rows), 2)) for i in range(6)},
            "is_default": is_default,
            "employer_type": np.array(EMPLOYER_TYPES)[
                rng.choice(len(EMPLOYER_TYPES), n_rows, p=_skew(len(EMPLOYER_TYPES)))
            ],
        }
    )
    return spark.createDataFrame(pdf, schema=loans_schema())


def _skew(k: int) -> list[float]:
    """Zipf-ish probability vector matching the reference's skewed
    categorical distributions (top industry holds ~16% of rows)."""
    raw = [1.0 / (i + 1) ** 0.8 for i in range(k)]
    s = sum(raw)
    return [r / s for r in raw]
