"""Isotonic-regression calibration of raw scores into probabilities.

Parity: /root/reference/src/pyannote/audio/core/calibration.py:
``Calibration(IsotonicRegression)`` with NaN-safe any-shape transform and
safetensors (de)serialization of the fitted breakpoints.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np
from sklearn.isotonic import IsotonicRegression

from ..utils.hf_hub import AssetFileName, looks_like_hub_id


class Calibration(IsotonicRegression):
    """Maps raw scores (e.g. cosine distances) to [0, 1] probabilities."""

    def __init__(self, y_min: Optional[float] = 0.0,
                 y_max: Optional[float] = 1.0,
                 increasing: Union[bool, str] = "auto",
                 out_of_bounds: str = "clip"):
        super().__init__(y_min=y_min, y_max=y_max, increasing=increasing,
                         out_of_bounds=out_of_bounds)

    @property
    def fitted(self) -> bool:
        return hasattr(self, "X_thresholds_")

    def safe_transform(self, scores: np.ndarray) -> np.ndarray:
        """NaN-safe, any-shape calibration (reference calibration.py:43)."""
        scores = np.asarray(scores, dtype=float)
        shape = scores.shape
        flat = scores.reshape(-1)
        valid = ~np.isnan(flat)
        out = np.full_like(flat, np.nan)
        if valid.any():
            out[valid] = self.transform(flat[valid])
        return out.reshape(shape)

    # -- serialization (safetensors) --------------------------------------

    def save(self, path: Union[str, Path]) -> None:
        from safetensors.numpy import save_file
        if not self.fitted:
            raise RuntimeError("cannot save an unfitted Calibration")
        save_file(
            {
                "X_thresholds": np.asarray(self.X_thresholds_,
                                           dtype=np.float64),
                "y_thresholds": np.asarray(self.y_thresholds_,
                                           dtype=np.float64),
                "increasing": np.asarray(
                    [1.0 if self.increasing_ else 0.0]),
                "X_min_max": np.asarray([self.X_min_, self.X_max_]),
            },
            str(path),
        )

    @classmethod
    def from_file(cls, path: Union[str, Path]) -> "Calibration":
        from safetensors.numpy import load_file
        data = load_file(str(path))
        calibration = cls()
        x = data["X_thresholds"]
        y = data["y_thresholds"]
        # refit from stored breakpoints (exact: isotonic fit of an isotonic
        # sequence is itself)
        calibration.increasing = bool(data["increasing"][0])
        calibration.fit(x, y)
        return calibration

    @classmethod
    def from_pretrained(cls, checkpoint: Union[str, Path],
                        subfolder: Optional[str] = None,
                        revision: Optional[str] = None,
                        token: Optional[str] = None,
                        cache_dir=None) -> "Calibration":
        """Load from a local dir/file or a hub id (parity: reference
        calibration.py:158-220 routes non-path ids through the hub and
        downloads ``calibration.safetensors``)."""
        path = Path(checkpoint)
        if not path.exists() and looks_like_hub_id(str(checkpoint)):
            from ..utils.hf_hub import download_from_hf_hub
            name = AssetFileName.Calibration.value
            filename = f"{subfolder}/{name}" if subfolder else name
            return cls.from_file(download_from_hf_hub(
                str(checkpoint), filename, revision=revision,
                token=token, cache_dir=cache_dir))
        if subfolder:
            path = path / subfolder
        if path.is_dir():
            path = path / str(AssetFileName.Calibration)
        return cls.from_file(path)
