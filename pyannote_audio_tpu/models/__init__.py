from . import blocks, embedding, segmentation, separation

__all__ = ["blocks", "embedding", "segmentation", "separation"]
