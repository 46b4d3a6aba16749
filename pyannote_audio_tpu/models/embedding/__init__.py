from .debug import SimpleEmbeddingModel
from .ecapa import ECAPA_TDNN
from .titanet import TitaNet
from .wespeaker import (BaseWeSpeakerResNet, WeSpeakerResNet34,
                        WeSpeakerResNet152, WeSpeakerResNet221,
                        WeSpeakerResNet293)
from .xvector import XVectorMFCC, XVectorSincNet

__all__ = [
    "SimpleEmbeddingModel",
    "ECAPA_TDNN",
    "TitaNet",
    "BaseWeSpeakerResNet",
    "WeSpeakerResNet34",
    "WeSpeakerResNet152",
    "WeSpeakerResNet221",
    "WeSpeakerResNet293",
    "XVectorMFCC",
    "XVectorSincNet",
]
