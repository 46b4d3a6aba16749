from .auroc import BinnedAUROC
from .der import (DiarizationErrorRate, GreedyDiarizationErrorRate,
                  detection_error_rate, diarization_error_rate,
                  optimal_mapping)
from .streaming import (DetectionErrorRate, DiarizationPrecision,
                        DiarizationRecall, EqualErrorRate, FalseAlarmRate,
                        MissedDetectionRate, OptimalDiarizationErrorRate,
                        OptimalDiarizationErrorRateThreshold,
                        OptimalFalseAlarmRate, OptimalMissedDetectionRate,
                        OptimalSpeakerConfusionRate, SpeakerConfusionRate,
                        der_update, det_curve, merge_psum)
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
    "OptimalDiarizationErrorRateThreshold",
    "OptimalFalseAlarmRate",
    "OptimalMissedDetectionRate",
    "OptimalSpeakerConfusionRate",
    "DiarizationPrecision",
    "DiarizationRecall",
    "EqualErrorRate",
    "BinnedAUROC",
    "der_update",
    "det_curve",
    "merge_psum",
]
