from .metrics import MetricStats, AccuracyStats, SimilarityMetricsStats
from .wer import ErrorRateStats, edit_distance_details
from .evaluator import FeatureClassifier

__all__ = [
    "MetricStats",
    "AccuracyStats",
    "SimilarityMetricsStats",
    "ErrorRateStats",
    "edit_distance_details",
    "FeatureClassifier",
]
