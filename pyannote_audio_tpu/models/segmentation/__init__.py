from .debug import SimpleSegmentationModel
from .pyannet import PyanNet
from .sseriouss import SSeRiouSS

__all__ = ["PyanNet", "SSeRiouSS", "SimpleSegmentationModel"]
