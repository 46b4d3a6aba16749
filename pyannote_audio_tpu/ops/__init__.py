from .aggregate import aggregate_scores, hamming_weights, overlap_add
from .ahc import ahc_on_device, centroid_linkage, device_linkage
from .binarize import hysteresis
from .fbank import fbank, fbank_num_frames, wespeaker_fbank
from .losses import (binary_cross_entropy, mse_loss, nll_loss,
                     powerset_pit_loss)
from .lstm import lstm_single_direction, multilayer_lstm
from .permutation import permutate, permutate_jax
from .powerset import Powerset, build_powerset_mapping

__all__ = [
    "aggregate_scores", "hamming_weights", "overlap_add",
    "ahc_on_device", "centroid_linkage", "device_linkage",
    "hysteresis",
    "fbank", "fbank_num_frames", "wespeaker_fbank",
    "binary_cross_entropy", "mse_loss", "nll_loss", "powerset_pit_loss",
    "lstm_single_direction", "multilayer_lstm",
    "permutate", "permutate_jax",
    "Powerset", "build_powerset_mapping",
]
