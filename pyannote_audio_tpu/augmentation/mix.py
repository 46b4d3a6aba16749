"""Batch-internal mixing augmentation for diarization training.

Parity: /root/reference/src/pyannote/audio/augmentation/mix.py
(MixSpeakerDiarization :31, candidate selection constrained by the
resulting speaker count :108-140). A batch sample is mixed with another
sample of the same batch whenever the SUM of their active-speaker counts
fits in ``max_num_speakers`` — speakers from different chunks are
distinct people even when they happen to occupy the same label columns —
and labels are OR-merged (positional columns, as the reference's
torch-audiomentations Mix base does).

TPU-native: the mix itself is pure array math and can run jitted; the
candidate pairing (tiny, per-batch) stays host-side numpy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class MixSpeakerDiarization:
    def __init__(self, p: float = 0.5,
                 min_snr_in_db: float = 0.0,
                 max_snr_in_db: float = 5.0,
                 max_num_speakers: Optional[int] = None,
                 seed: Optional[int] = None):
        self.p = p
        self.min_snr_in_db = min_snr_in_db
        self.max_snr_in_db = max_snr_in_db
        self.max_num_speakers = max_num_speakers
        self.rng = np.random.default_rng(seed)

    def __call__(self, X: np.ndarray, y: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """X (batch, ch, samples), y (batch, frames, speakers) binary."""
        batch = X.shape[0]
        X_out, y_out = X.copy(), y.copy()
        speaker_active = y.any(axis=1)              # (batch, speakers)
        num_speakers = speaker_active.sum(axis=1)   # (batch,)
        # reference default: the batch's actual max speaker count
        # (mix.py:110), NOT the label-column capacity
        max_speakers = self.max_num_speakers or int(num_speakers.max())
        for i in range(batch):
            if self.rng.uniform() >= self.p:
                continue
            # candidates constrained by the SUM of speaker counts
            # (reference mix.py:125: different chunks = distinct people)
            ok = np.where(
                (num_speakers + num_speakers[i] <= max_speakers)
                & (num_speakers + num_speakers[i] <= y.shape[-1]))[0]
            ok = ok[ok != i]
            if len(ok) == 0:
                continue
            j = int(self.rng.choice(ok))
            snr = self.rng.uniform(self.min_snr_in_db, self.max_snr_in_db)
            p_i = np.mean(X[i] ** 2) + 1e-12
            p_j = np.mean(X[j] ** 2) + 1e-12
            gain = np.sqrt(p_i / p_j) * 10.0 ** (-snr / 20.0)
            X_out[i] = X[i] + gain * X[j]
            # sample j's speakers are DISTINCT people: place them in
            # columns sample i leaves free (training targets left-align
            # local speakers, so plain positional max would merge two
            # different people into one label)
            cols_j = np.where(speaker_active[j])[0]
            free = np.where(~speaker_active[i])[0]
            for c_j, c_free in zip(cols_j, free):
                y_out[i][:, c_free] = np.maximum(y_out[i][:, c_free],
                                                 y[j][:, c_j])
        return X_out, y_out
