"""Task-4 ML pipeline surface (SURVEY §2.7 M1-M12): feature engineering +
the reference's four classifiers + evaluation + model persistence."""

from financial_big_data_exp_4_spark.ml.features import (
    FEATURE_PIPELINE_STAGES,
    build_feature_pipeline,
    prepare_features,
    train_test_split,
)
from financial_big_data_exp_4_spark.ml.models import (
    REFERENCE_CLASSIFIERS,
    evaluate_auc,
    make_classifier,
    train_and_evaluate,
)

__all__ = [
    "FEATURE_PIPELINE_STAGES",
    "REFERENCE_CLASSIFIERS",
    "build_feature_pipeline",
    "evaluate_auc",
    "make_classifier",
    "prepare_features",
    "train_and_evaluate",
    "train_test_split",
]
