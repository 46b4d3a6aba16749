from .debug import SimpleEmbeddingModel
from .wespeaker import (BaseWeSpeakerResNet, WeSpeakerResNet34,
                        WeSpeakerResNet152, WeSpeakerResNet221,
                        WeSpeakerResNet293)
from .xvector import XVectorMFCC, XVectorSincNet

__all__ = [
    "SimpleEmbeddingModel",
    "BaseWeSpeakerResNet",
    "WeSpeakerResNet34",
    "WeSpeakerResNet152",
    "WeSpeakerResNet221",
    "WeSpeakerResNet293",
    "XVectorMFCC",
    "XVectorSincNet",
]
