"""Load a full reference-style pipeline snapshot end to end.

Reconstructs the community-1 checkpoint layout — config.yaml naming
``pyannote.audio.pipelines.SpeakerDiarization`` with ``$model/{subfolder}``
references, torch ``pytorch_model.bin`` files for segmentation and
embedding, and PLDA npz files — then runs
``Pipeline.from_pretrained(dir)(file)`` with VBx clustering.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import yaml

import jax.numpy as jnp

from test_reference_checkpoint import _install_fake_reference_modules
from test_torch_parity import (TorchPyanNet, TorchResNet34Trunk,
                               _sinc_weights_np)


def _write_segmentation(path: Path, Spec, Problem, Resolution):
    torch.manual_seed(0)
    low, band, sinc_kernel = _sinc_weights_np()
    ref = TorchPyanNet(sinc_kernel)
    specs = Spec(problem=Problem.MONO_LABEL_CLASSIFICATION,
                 resolution=Resolution.FRAME, duration=10.0,
                 classes=["speaker#1", "speaker#2", "speaker#3"],
                 powerset_max_classes=2, permutation_invariant=True)
    ckpt = {
        "state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in
                       ref.reference_state_dict(low, band).items()},
        "hyper_parameters": {"sincnet": {"stride": 10}},
        "pyannote.audio": {
            "architecture": {"module": "pyannote.audio",
                             "class": "PyanNet"},
            "specifications": specs,
        },
    }
    path.mkdir(parents=True)
    torch.save(ckpt, path / "pytorch_model.bin")


def _write_embedding(path: Path):
    torch.manual_seed(1)
    trunk = TorchResNet34Trunk()
    state = {f"resnet.{k}": v for k, v in trunk.state_dict().items()
             if "num_batches" not in k}
    state["resnet.seg_1.weight"] = torch.randn(256, 5120) * 0.01
    state["resnet.seg_1.bias"] = torch.zeros(256)
    ckpt = {
        "state_dict": state,
        "hyper_parameters": {},
        "pyannote.audio": {
            "architecture": {"module": "pyannote.audio",
                             "class": "WeSpeakerResNet34"},
        },
    }
    path.mkdir(parents=True)
    torch.save(ckpt, path / "pytorch_model.bin")


def _write_plda(path: Path, dim: int = 256, lda_dim: int = 64):
    rng = np.random.default_rng(0)
    path.mkdir(parents=True)
    lda = rng.standard_normal((dim, lda_dim)).astype(np.float64) * 0.1
    np.savez(path / "xvec_transform.npz",
             mean1=rng.standard_normal(dim) * 0.01,
             mean2=rng.standard_normal(lda_dim) * 0.01,
             lda=lda)
    tr = np.linalg.qr(rng.standard_normal((lda_dim, lda_dim)))[0]
    np.savez(path / "plda.npz",
             mu=rng.standard_normal(lda_dim) * 0.01,
             tr=tr,
             psi=np.abs(rng.standard_normal(lda_dim)) + 0.5)


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("community_style")
    created, Spec, Problem, Resolution = _install_fake_reference_modules()
    try:
        _write_segmentation(root / "segmentation", Spec, Problem,
                            Resolution)
        _write_embedding(root / "embedding")
    finally:
        for name in created:
            del sys.modules[name]
    _write_plda(root / "plda")
    config = {
        "version": "4.0.0",
        "pipeline": {
            "name": "pyannote.audio.pipelines.SpeakerDiarization",
            "params": {
                "segmentation": "$model/segmentation",
                "embedding": "$model/embedding",
                "plda": "$model/plda",
                "clustering": "VBxClustering",
                "segmentation_batch_size": 8,
                "embedding_batch_size": 8,
            },
        },
        "params": {
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"threshold": 0.6, "Fa": 0.07, "Fb": 0.8},
        },
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return root


@pytest.mark.slow
def test_full_reference_pipeline_snapshot(snapshot, tmp_path):
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        DiarizeOutput

    pipeline = pat.Pipeline.from_pretrained(snapshot)
    assert type(pipeline).__name__ == "SpeakerDiarization"
    assert pipeline.klustering == "VBxClustering"

    file = default_two_speaker_file(tmp_path / "conv.wav")
    output = pipeline(file, max_speakers=3)
    assert isinstance(output, DiarizeOutput)
    assert len(output.speaker_diarization.labels()) <= 3
    assert output.speaker_embeddings is None or \
        np.isfinite(np.nan_to_num(output.speaker_embeddings)).all()
