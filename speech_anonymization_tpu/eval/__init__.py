from .metrics import MetricStats, AccuracyStats, SimilarityMetricsStats
from .wer import ErrorRateStats, edit_distance_details

__all__ = [
    "MetricStats",
    "AccuracyStats",
    "SimilarityMetricsStats",
    "ErrorRateStats",
    "edit_distance_details",
]
