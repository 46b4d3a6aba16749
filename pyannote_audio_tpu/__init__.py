"""pyannote_audio_tpu — a TPU-native speaker diarization framework.

Built from scratch on JAX/XLA/Pallas/pjit with the capabilities of
pyannote.audio (reference mounted at /root/reference): a config-driven
``Pipeline.from_pretrained(...)`` inference product, a functional training
stack, and a benchmark/evaluation CLI — with the entire compute path
(segmentation NN, embeddings, powerset decoding, overlap-add aggregation,
clustering, reconstruction) running on-device under jit.

Public API mirrors pyannote.audio's top-level exports
(/root/reference/src/pyannote/audio/__init__.py:28-33).
"""

__version__ = "0.1.0"

from .core.segment import Segment, SlidingWindow, SlidingWindowFeature
from .core.annotation import Annotation, Timeline
from .core.io import Audio
from .core.model import Model, Specifications, Problem, Resolution
from .core.inference import Inference
from .core.pipeline import Pipeline

__all__ = [
    "Segment",
    "SlidingWindow",
    "SlidingWindowFeature",
    "Annotation",
    "Timeline",
    "Audio",
    "Model",
    "Specifications",
    "Problem",
    "Resolution",
    "Inference",
    "Pipeline",
]
