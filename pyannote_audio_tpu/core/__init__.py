from .annotation import Annotation, Timeline
from .calibration import Calibration
from .inference import Inference
from .io import Audio
from .model import Model, Problem, Resolution, Specifications
from .pipeline import Pipeline
from .plda import PLDA
from .segment import Segment, SlidingWindow, SlidingWindowFeature
from .task import Task

__all__ = [
    "Annotation", "Timeline", "Segment", "SlidingWindow",
    "SlidingWindowFeature", "Audio", "Model", "Specifications", "Problem",
    "Resolution", "Inference", "Pipeline", "Task", "Calibration", "PLDA",
]
