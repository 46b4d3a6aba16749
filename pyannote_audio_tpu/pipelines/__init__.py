from .clustering import (AgglomerativeClustering, Clustering,
                         KMeansClustering, OracleClustering, VBxClustering)
from .speaker_diarization import DiarizeOutput, SpeakerDiarization
from .voice_activity_detection import (OracleVoiceActivityDetection,
                                       VoiceActivityDetection)

__all__ = [
    "AgglomerativeClustering",
    "Clustering",
    "KMeansClustering",
    "OracleClustering",
    "VBxClustering",
    "DiarizeOutput",
    "SpeakerDiarization",
    "VoiceActivityDetection",
    "OracleVoiceActivityDetection",
]
