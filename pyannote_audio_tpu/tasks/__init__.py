from .embedding import SupervisedRepresentationLearningWithArcFace
from .segmentation import (MultiLabelSegmentation, SpeakerDiarization,
                           VoiceActivityDetection)
from .separation import PixIT

Segmentation = SpeakerDiarization  # historical alias

__all__ = [
    "SpeakerDiarization",
    "VoiceActivityDetection",
    "MultiLabelSegmentation",
    "SupervisedRepresentationLearningWithArcFace",
    "PixIT",
]
