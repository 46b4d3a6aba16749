"""Tutorial 2b as a runnable script: two-way checkpoint conversion.

Exports a (tiny) TPU-trained PyanNet and a WeSpeaker ResNet back to
reference-format checkpoints (lightning-style pytorch_model.bin with the
pyannote.audio vendor block / plain wespeaker state dict), then loads
each export back through the torch-checkpoint converter and verifies the
roundtrip is numerically exact.

Parity: the reference ecosystem's deploy path; converters live in
utils/torch_export.py + each architecture's convert_torch_state_dict.

    python examples/export_to_reference.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax.numpy as jnp

    from pyannote_audio_tpu.core.model import (Model, Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint

    root = Path(tempfile.mkdtemp(prefix="pat_export_"))

    # -- a "trained" segmentation model -----------------------------------
    seg = PyanNet(lstm={"hidden_size": 32, "num_layers": 1},
                  linear={"hidden_size": 32, "num_layers": 1})
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    export_reference_checkpoint(seg, root / "seg-export")
    exported = sorted(p.name for p in (root / "seg-export").iterdir())
    print(f"PyanNet export: {exported}")

    # the export loads back through the torch-checkpoint converter...
    wave = np.random.default_rng(0).standard_normal(
        (1, 1, 80000)).astype(np.float32)
    reloaded = Model.from_pretrained(root / "seg-export")
    ours = np.asarray(seg(jnp.asarray(wave)))
    theirs = np.asarray(reloaded(jnp.asarray(wave)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    print(f"PyanNet roundtrip exact: output {ours.shape}, "
          f"max |delta| = {np.abs(ours - theirs).max():.2e}")

    # -- a WeSpeaker embedding model (plain resnet.* state dict) ----------
    emb = WeSpeakerResNet34()
    emb.build()
    export_reference_checkpoint(emb, root / "emb-export")
    exported = sorted(p.name for p in (root / "emb-export").iterdir())
    print(f"WeSpeaker export: {exported}")
    # WeSpeaker exports as the PLAIN resnet.* state dict the wespeaker
    # toolkit loads (no vendor block), so reloading takes the explicit
    # architecture converter rather than Model.from_pretrained
    from pyannote_audio_tpu.models.embedding.convert import convert
    convert(str(root / "emb-export" / "pytorch_model.bin"),
            str(root / "emb-native"), architecture="WeSpeakerResNet34")
    reloaded = Model.from_pretrained(root / "emb-native")
    wave = np.random.default_rng(1).standard_normal(
        (1, 1, 32000)).astype(np.float32)
    e0 = np.asarray(emb(jnp.asarray(wave)))
    e1 = np.asarray(reloaded(jnp.asarray(wave)))
    np.testing.assert_allclose(e0, e1, atol=1e-4)
    print(f"WeSpeaker roundtrip exact: embedding {e0.shape}, "
          f"max |delta| = {np.abs(e0 - e1).max():.2e}")
    print("export OK")


if __name__ == "__main__":
    main()
