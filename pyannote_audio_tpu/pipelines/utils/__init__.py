from .diarization import SpeakerDiarizationMixin, set_num_speakers
from .getter import (get_calibration, get_devices, get_model, get_pipeline,
                     get_plda)
from .hook import ArtifactHook, Hooks, ProgressHook, TimingHook, TraceHook
from .oracle import oracle_segmentation

__all__ = [
    "SpeakerDiarizationMixin",
    "set_num_speakers",
    "get_model",
    "get_pipeline",
    "get_calibration",
    "get_plda",
    "get_devices",
    "ArtifactHook",
    "ProgressHook",
    "TimingHook",
    "TraceHook",
    "Hooks",
    "oracle_segmentation",
]
