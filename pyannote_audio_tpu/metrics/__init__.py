from .auroc import BinnedAUROC
from .der import (DiarizationErrorRate, GreedyDiarizationErrorRate,
                  detection_error_rate, diarization_error_rate,
                  optimal_mapping)
from .streaming import (DetectionErrorRate, EqualErrorRate, FalseAlarmRate,
                        MissedDetectionRate, OptimalDiarizationErrorRate,
                        SpeakerConfusionRate)
from .streaming import DiarizationErrorRate as StreamingDiarizationErrorRate

__all__ = [
    "DiarizationErrorRate",
    "GreedyDiarizationErrorRate",
    "diarization_error_rate",
    "detection_error_rate",
    "optimal_mapping",
    "StreamingDiarizationErrorRate",
    "FalseAlarmRate",
    "MissedDetectionRate",
    "SpeakerConfusionRate",
    "DetectionErrorRate",
    "OptimalDiarizationErrorRate",
    "EqualErrorRate",
    "BinnedAUROC",
]
