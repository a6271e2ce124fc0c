"""Task-4 classifiers + evaluation + persistence (reference
``任务四/exp4_work4.ipynb`` cells 26-45, ``README.md:355-416``).

Hyperparameters match the reference exactly (M6-M9):
* LogisticRegression(maxIter=10, regParam=0.01) — nb4 cell 26, AUC≈0.80
* LinearSVC(maxIter=100) — nb4 cell 32
* MLP layers [n_features, 64, 32, **2**] — nb4 cell 36 declared
  ``[..., 1]``, which is invalid for binary classification (the layer must
  have one unit per class; the reference's cells 36-38 show no output —
  it almost certainly failed). Corrected here per SURVEY §7 trap 4.
* RandomForest(maxDepth=7, maxBins=700, numTrees=30) — nb4 cell 40,
  AUC≈0.85, plus ``featureImportances`` (M11, cell 42)

Evaluation is ``BinaryClassificationEvaluator`` areaUnderROC on the label
column (M10, cells 30/44); persistence is ``model.save`` (K4, cell 45).

100 TB notes: LR/SVC run one ``treeAggregate`` gradient pass per
iteration; RF runs per-depth-level jobs — all shuffle-light, scaling with
executors. ``maxBins=700`` controls the per-feature histogram width RF
builds on workers — the reference chose it to cover its widest
categorical; kept verbatim.
"""

from __future__ import annotations

from pyspark.ml.classification import (
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.sql import DataFrame

SEED = 42

REFERENCE_CLASSIFIERS: tuple[str, ...] = ("lr", "svc", "mlp", "rf")


def make_classifier(name: str, n_features: int | None = None):
    """Instantiate one of the reference's four classifiers by short name.

    ``n_features`` is required for the MLP (its input layer width).
    """
    if name == "lr":
        return LogisticRegression(
            maxIter=10, regParam=0.01, labelCol="label", featuresCol="features"
        )
    if name == "svc":
        return LinearSVC(
            maxIter=100, labelCol="label", featuresCol="features"
        )
    if name == "mlp":
        if not n_features:
            raise ValueError("MLP needs n_features for its input layer")
        return MultilayerPerceptronClassifier(
            layers=[n_features, 64, 32, 2],  # 2-unit output (ref bug fixed)
            seed=SEED,
            labelCol="label",
            featuresCol="features",
        )
    if name == "rf":
        return RandomForestClassifier(
            maxDepth=7,
            maxBins=700,
            numTrees=30,
            seed=SEED,
            labelCol="label",
            featuresCol="features",
        )
    if name == "gbt":
        # engine extension beyond the reference's four: gradient-boosted
        # trees — sequential boosting rounds (maxIter per-tree jobs, each
        # shuffle-light like RF's) usually beat RF's bagging on tabular
        # default-risk data; kept shallow so rounds stay cheap
        return GBTClassifier(
            maxDepth=5,
            maxIter=20,
            # the assembled features carry wide categorical indices (same
            # reason the reference's RF sets maxBins=700); trees reject
            # any categorical wider than maxBins
            maxBins=700,
            seed=SEED,
            labelCol="label",
            featuresCol="features",
        )
    raise ValueError(
        f"unknown classifier {name!r}; pick from "
        f"{REFERENCE_CLASSIFIERS + ('gbt',)}"
    )


def strip_training_summary(model):
    """Drop a fitted model's training summary so the model serializes.

    Spark 4.1 interaction: ``fit`` attaches a training summary that holds
    the ``SparkSession``; the session's ``observationManager`` is a lazy
    val of a non-Serializable class. It stays ``null`` (and harmless)
    until the first ``df.observe(...)`` anywhere in the session — after
    which every action on ``model.transform(...)`` dies with
    ``NotSerializableException: ObservationManager`` when the task closure
    serializes model → summary → session. Since this engine exposes
    Observation-based metrics (``operators/corpus.py``) alongside ML,
    the two WILL share a session; stripping the summary after ``fit``
    makes the model self-contained. ``setSummary`` is ``private[ml]`` in
    Scala, which compiles to a public JVM method, so py4j can call it.
    No-op for models without the HasTrainingSummary mixin.
    """
    from py4j.protocol import Py4JError
    from pyspark import SparkContext

    jm = getattr(model, "_java_obj", None)
    sc = SparkContext._active_spark_context
    if jm is None or sc is None:
        return model
    try:
        jm.setSummary(getattr(getattr(sc._jvm.scala, "None$"), "MODULE$"))
    except Py4JError:  # model class without the HasTrainingSummary mixin
        pass
    return model


def evaluate_auc(predictions: DataFrame, label_col: str = "label") -> float:
    """M10: areaUnderROC via BinaryClassificationEvaluator.

    Uses rawPrediction (margin / log-odds) — defined for all four
    classifiers including LinearSVC, which emits no probability column.
    """
    return BinaryClassificationEvaluator(
        labelCol=label_col,
        rawPredictionCol="rawPrediction",
        metricName="areaUnderROC",
    ).evaluate(predictions)


def train_and_evaluate(
    train: DataFrame,
    test: DataFrame,
    names: tuple[str, ...] = ("lr", "rf"),
    save_dir: str | None = None,
) -> dict[str, float]:
    """Fit each named classifier on ``train``, return test AUC per name.

    ``save_dir`` persists each fitted model under ``{save_dir}/{name}``
    (K4 — nb4 cell 45 saves the RF model).
    """
    # the MLP is the only classifier that needs the feature width (its
    # input layer); computed lazily so the default names pay no extra
    # driver job, with an explicit error on an empty train set instead
    # of first()'s None crash
    n_features = None
    if "mlp" in names:
        head = train.first()
        if head is None:
            raise ValueError(
                "train_and_evaluate: empty training set (MLP needs the "
                "feature width from at least one row)"
            )
        n_features = head["features"].size
    aucs: dict[str, float] = {}
    for name in names:
        model = strip_training_summary(make_classifier(name, n_features).fit(train))
        aucs[name] = evaluate_auc(model.transform(test))
        if save_dir:
            model.write().overwrite().save(f"{save_dir}/{name}")
    return aucs


def load_model(name: str, path: str):
    """Reload a model saved by :func:`train_and_evaluate` (pair of K4)."""
    from pyspark.ml.classification import (
        GBTClassificationModel,
        LinearSVCModel,
        LogisticRegressionModel,
        MultilayerPerceptronClassificationModel,
        RandomForestClassificationModel,
    )

    cls = {
        "lr": LogisticRegressionModel,
        "svc": LinearSVCModel,
        "mlp": MultilayerPerceptronClassificationModel,
        "rf": RandomForestClassificationModel,
        "gbt": GBTClassificationModel,
    }[name]
    return cls.load(path)
