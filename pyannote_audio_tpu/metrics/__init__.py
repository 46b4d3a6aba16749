from .auroc import BinnedAUROC
# annotation-based metrics (pyannote.metrics parity) own the plain names
from .der import (DetectionErrorRate, DetectionPrecisionRecallFMeasure,
                  DiarizationErrorRate, GreedyDiarizationErrorRate,
                  IdentificationErrorRate, JaccardErrorRate,
                  detection_error_rate, diarization_error_rate,
                  optimal_mapping)
# frame-array streaming metrics keep Streaming- prefixed aliases
from .streaming import (DiarizationPrecision,
                        DiarizationRecall, EqualErrorRate, FalseAlarmRate,
                        MissedDetectionRate, OptimalDiarizationErrorRate,
                        OptimalDiarizationErrorRateThreshold,
                        OptimalFalseAlarmRate, OptimalMissedDetectionRate,
                        OptimalSpeakerConfusionRate, SpeakerConfusionRate,
                        der_update, det_curve, merge_psum)
from .streaming import DetectionErrorRate as StreamingDetectionErrorRate
from .streaming import DiarizationErrorRate as StreamingDiarizationErrorRate

__all__ = [
    "DiarizationErrorRate",
    "GreedyDiarizationErrorRate",
    "JaccardErrorRate",
    "IdentificationErrorRate",
    "DetectionPrecisionRecallFMeasure",
    "diarization_error_rate",
    "detection_error_rate",
    "optimal_mapping",
    "StreamingDiarizationErrorRate",
    "StreamingDetectionErrorRate",
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
