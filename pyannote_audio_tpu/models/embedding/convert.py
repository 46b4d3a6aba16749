"""Offline converter: WeSpeaker / reference torch checkpoints -> ours.

Parity: /root/reference/src/pyannote/audio/models/embedding/wespeaker/
convert.py (:24-62) — turn an upstream WeSpeaker ``avg_model.pt`` (or a
reference ``pytorch_model.bin``) into a native checkpoint directory.

Usage:
    python -m pyannote_audio_tpu.models.embedding.convert \
        avg_model.pt out_dir --architecture WeSpeakerResNet34
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def convert(checkpoint: str, into: str,
            architecture: str = "WeSpeakerResNet34") -> None:
    import torch

    from . import wespeaker as ws
    Klass = getattr(ws, architecture)
    state = torch.load(checkpoint, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    state = {k: np.asarray(v) for k, v in state.items()
             if hasattr(v, "numpy")}
    # upstream WeSpeaker checkpoints lack the "resnet." prefix the
    # reference adds; normalize to the reference layout
    if not any(k.startswith("resnet.") for k in state):
        state = {f"resnet.{k}": v for k, v in state.items()}
    model = Klass()
    model.build()
    model.params = model.convert_torch_state_dict(state)
    model._jitted_apply = None
    model.save_checkpoint(into)
    print(f"converted {checkpoint} -> {into}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("into")
    parser.add_argument("--architecture", default="WeSpeakerResNet34")
    args = parser.parse_args(argv)
    convert(args.checkpoint, args.into, args.architecture)
    return 0


if __name__ == "__main__":
    sys.exit(main())
