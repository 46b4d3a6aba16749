"""Checkpoint asset resolution (hub shim).

Parity: /root/reference/src/pyannote/audio/utils/hf_hub.py (AssetFileName
:35-42, download_from_hf_hub :44-104). This environment has no network
egress, so "hub ids" resolve against local snapshot directories listed in
``PYANNOTE_TPU_HUB`` (colon-separated roots, like a model cache). A real
deployment can point this at an artifact store mount.
"""

from __future__ import annotations

import os
from enum import Enum
from pathlib import Path
from typing import Optional, Union


class AssetFileName(Enum):
    Calibration = "calibration.safetensors"
    Model = "params.msgpack"
    TorchModel = "pytorch_model.bin"
    Pipeline = "config.yaml"


def hub_roots() -> list:
    roots = os.environ.get("PYANNOTE_TPU_HUB", "")
    return [Path(r) for r in roots.split(":") if r]


def resolve_checkpoint(model_id: Union[str, Path],
                       subfolder: Optional[str] = None,
                       revision: Optional[str] = None) -> Path:
    """Resolve a model id to a local directory.

    Accepts absolute/relative paths directly; otherwise searches the
    PYANNOTE_TPU_HUB roots for ``<root>/<model_id>``.
    """
    path = Path(model_id)
    if path.exists():
        return path / subfolder if subfolder else path
    for root in hub_roots():
        candidate = root / str(model_id)
        if candidate.exists():
            return candidate / subfolder if subfolder else candidate
    raise FileNotFoundError(
        f"cannot resolve checkpoint {model_id!r} "
        f"(searched PYANNOTE_TPU_HUB={hub_roots()}); "
        "model downloads are unavailable without network access — "
        "place a local snapshot directory there instead.")


def download_from_hf_hub(model_id: str, asset: AssetFileName,
                         subfolder: Optional[str] = None,
                         revision: Optional[str] = None,
                         token: Optional[str] = None,
                         cache_dir=None) -> Path:
    """API-parity wrapper: resolve an asset file from a local snapshot."""
    directory = resolve_checkpoint(model_id, subfolder=subfolder,
                                   revision=revision)
    path = directory / asset.value
    if not path.exists():
        raise FileNotFoundError(f"{asset.value} not found in {directory}")
    return path
