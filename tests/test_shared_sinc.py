"""Shared whole-file sinc-conv front-end == per-chunk forwards.

PYANNOTE_TPU_SHARED_SINC computes PyanNet's first conv once per file and
gathers per-chunk frames with an affine instance-norm fold
(SincNet.from_conv). These tests pin the fold to the per-chunk reference
path on CPU, single-device and under the 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyannote_audio_tpu.core.inference import Inference
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet


@pytest.fixture(scope="module")
def pyannet():
    model = PyanNet(lstm={"hidden_size": 32, "num_layers": 1})
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    # non-trivial wav-norm affine so the fold actually carries gamma/beta
    params = jax.device_get(model.params)
    wav_norm = params["params"]["sincnet"]["wav_norm1d"]
    wav_norm["scale"] = np.asarray([1.3], dtype=np.float32)
    wav_norm["bias"] = np.asarray([-0.05], dtype=np.float32)
    model.params = jax.tree_util.tree_map(jnp.asarray, params)
    return model


@pytest.fixture(scope="module")
def waveform(rng):
    # 7.3 s: full chunks + a zero-padded tail chunk
    return (0.1 * rng.standard_normal((1, 7 * 16000 + 4800))
            ).astype(np.float32)


def _slide(model, waveform, mesh=None, batch_size=8):
    inf = Inference(model, duration=2.0, step=0.5, batch_size=batch_size,
                    mesh=mesh)
    out = inf.slide(waveform, 16000)
    return np.asarray(out.data)


def test_shared_frontend_matches_per_chunk(pyannet, waveform, monkeypatch):
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "0")
    baseline = _slide(pyannet, waveform)
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "1")
    shared = _slide(pyannet, waveform)
    assert shared.shape == baseline.shape
    np.testing.assert_allclose(shared, baseline, atol=1e-4)


@pytest.mark.parametrize("quant", ["int16", "mulaw"])
def test_shared_frontend_matches_with_quantized_transport(
        pyannet, waveform, monkeypatch, quant):
    """The shared gather/precompute dequantize int16 and mu-law uploads.

    On CPU the default transport ships raw f32, so the _dequantize
    branches inside the shared precompute/gather only run when forced —
    this pins both quantized modes off-TPU."""
    # PCM16-representable so the int16 fast path actually engages
    pcm = (np.round(waveform * np.float32(32768.0)).clip(-32768, 32767)
           / np.float32(32768.0)).astype(np.float32)
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", quant)
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "0")
    baseline = _slide(pyannet, pcm)
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "1")
    shared = _slide(pyannet, pcm)
    np.testing.assert_allclose(shared, baseline, atol=1e-4)


def test_shared_frontend_matches_on_mesh(pyannet, waveform, monkeypatch):
    from pyannote_audio_tpu.parallel import make_mesh
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "0")
    baseline = _slide(pyannet, waveform)
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "1")
    shared = _slide(pyannet, waveform, mesh=make_mesh())
    np.testing.assert_allclose(shared, baseline, atol=1e-4)


def test_shared_frontend_requires_aligned_step(pyannet, waveform,
                                               monkeypatch):
    """A step that misses the conv-stride grid falls back per chunk."""
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", "1")
    inf = Inference(pyannet, duration=2.0, step=0.5003, batch_size=8)
    window = round(2.0 * 16000)
    assert not inf._shared_frontend(window, round(0.5003 * 16000))
    # aligned grid opts in
    inf2 = Inference(pyannet, duration=2.0, step=0.5, batch_size=8)
    assert inf2._shared_frontend(window, round(0.5 * 16000))


def test_sincnet_from_conv_fold_is_exact(pyannet, rng):
    """Module-level fold check, independent of the inference engine."""
    module = pyannet.module
    params = pyannet.params
    chunks = jnp.asarray(
        0.1 * rng.standard_normal((3, 1, 32000)).astype(np.float32))

    full = module.apply(params, chunks)

    # shared path: raw whole-conv of each chunk + per-chunk stats
    conv = module.apply(params, chunks[:, 0, :],
                        method="precompute_frontend")
    # precompute_frontend treats (C, T); here batch plays that role:
    # (3, F, 80) conv of the raw waveforms
    mean = jnp.mean(chunks[:, 0, :], axis=-1)
    var = jnp.var(chunks[:, 0, :], axis=-1)
    shared = module.apply(params, conv, mean, var,
                          method="forward_from_frontend")
    np.testing.assert_allclose(np.asarray(shared), np.asarray(full),
                               atol=1e-4)
