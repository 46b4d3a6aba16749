"""Reference API-surface parity: names users import from pyannote.audio.

Each test pins one of the public reference symbols added in the round-3
surface audit (SegmentationErrorRate, interpolate, cost funcs, VBx
wrappers, reproducibility guards, dependency exceptions, load_stm,
batchify, augmentation wrapping, ResNet depth variants, ...).
"""

from __future__ import annotations

import numpy as np
import pytest


def test_segmentation_error_rate_windows():
    from pyannote_audio_tpu.metrics.streaming import (
        DiarizationErrorRate, SegmentationErrorRate)

    rng = np.random.default_rng(0)
    preds = rng.random((2, 40, 3)).astype(np.float32)
    target = (rng.random((2, 40, 3)) > 0.6).astype(np.float32)

    # short input: identical to plain DER (window covers everything)
    short = SegmentationErrorRate(window_size=40)
    plain = DiarizationErrorRate()
    assert short(preds, target) == pytest.approx(plain(preds, target))

    # windowed: equals DER over the manually unfolded batch
    windowed = SegmentationErrorRate(window_size=16, step_size=8)
    manual = DiarizationErrorRate()
    starts = range(0, 40 - 16 + 1, 8)
    unfolded_p = np.concatenate([preds[:, s:s + 16] for s in starts])
    unfolded_t = np.concatenate([target[:, s:s + 16] for s in starts])
    assert windowed(preds, target) == pytest.approx(
        manual(unfolded_p, unfolded_t))
    assert windowed.compute() == pytest.approx(manual.compute())
    # step defaults to half the window
    assert SegmentationErrorRate(window_size=16).step_size == 8


def test_interpolate_reference_signature():
    import jax.numpy as jnp

    from pyannote_audio_tpu.utils.loss import interpolate

    target = jnp.zeros((2, 10, 3))
    assert interpolate(target, None) is None
    weight = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1)
    weight = jnp.broadcast_to(weight, (2, 8, 1))
    out = interpolate(target, weight)
    assert out.shape == (2, 10, 1)


def test_cost_funcs_and_permutate_variants():
    from pyannote_audio_tpu.utils.permutation import (
        mae_cost_func, mse_cost_func, permutate, permutate_numpy,
        permutate_torch)

    rng = np.random.default_rng(1)
    Y = rng.random((20, 3)).astype(np.float32)
    y = rng.random((20, 3)).astype(np.float32)
    np.testing.assert_allclose(mse_cost_func(Y, y),
                               np.mean((Y - y) ** 2, axis=0), rtol=1e-6)
    np.testing.assert_allclose(mae_cost_func(Y, y),
                               np.mean(np.abs(Y - y), axis=0), rtol=1e-6)

    y1 = rng.random((2, 20, 3)).astype(np.float32)
    perm_order = [2, 0, 1]
    y2 = y1[:, :, perm_order]
    for cost in ("mse", "mae", mse_cost_func, mae_cost_func):
        permutated, perms = permutate(y1, y2, cost_func=cost)
        np.testing.assert_allclose(permutated, y1, atol=1e-6)

    # a custom callable goes through the host Hungarian path
    def neg_dot(Y, y, **kw):
        return -np.mean(Y * y, axis=0)

    permutated, perms = permutate(y1, y2, cost_func=neg_dot)
    np.testing.assert_allclose(permutated, y1, atol=1e-6)

    permutated, perms = permutate_numpy(y1, y2)
    np.testing.assert_allclose(permutated, y1, atol=1e-6)

    torch = pytest.importorskip("torch")
    permutated_t, perms_t = permutate_torch(
        torch.from_numpy(y1), torch.from_numpy(y2))
    assert isinstance(permutated_t, torch.Tensor)
    np.testing.assert_allclose(permutated_t.numpy(), y1, atol=1e-6)
    assert perms_t == perms


def test_vbx_reference_api(tmp_path):
    from pyannote_audio_tpu.utils.vbx import VBx, l2_norm, vbx_setup

    v = np.asarray([3.0, 4.0])
    np.testing.assert_allclose(l2_norm(v), v / 5.0)
    m = np.asarray([[3.0, 4.0], [0.0, 2.0]])
    np.testing.assert_allclose(np.linalg.norm(l2_norm(m), axis=1), 1.0)
    with pytest.raises(ValueError):
        l2_norm(np.zeros((2, 2, 2)))

    rng = np.random.default_rng(2)
    X = np.concatenate([rng.normal(-2, 0.1, (30, 4)),
                        rng.normal(2, 0.1, (30, 4))])
    Phi = np.full(4, 2.0)
    gamma, pi, Li = VBx(X, Phi, pi=4, maxIters=8)
    assert gamma.shape == (60, 4) and pi.shape == (4,)
    assert all(len(row) == 1 for row in Li)
    out = VBx(X, Phi, pi=4, maxIters=8, return_model=True)
    gamma, pi, Li, alpha, invL = out
    assert alpha.shape == (4, 4) and invL.shape == (4, 4)

    # vbx_setup: synthetic transform/PLDA npz roundtrip
    D, L = 8, 4
    lda = rng.normal(size=(D, L))
    np.savez(tmp_path / "transform.npz",
             mean1=rng.normal(size=D), mean2=rng.normal(size=L), lda=lda)
    tr = rng.normal(size=(L, L)) + 3 * np.eye(L)
    np.savez(tmp_path / "plda.npz", mu=rng.normal(size=L), tr=tr,
             psi=np.abs(rng.normal(size=L)) + 0.5)
    xvec_tf, plda_tf, plda_psi = vbx_setup(tmp_path / "transform.npz",
                                           tmp_path / "plda.npz")
    x = rng.normal(size=(5, D))
    latent = plda_tf(xvec_tf(x))
    assert latent.shape == (5, L) and plda_psi.shape == (L,)
    assert np.all(np.diff(plda_psi) <= 0)  # reordered descending


def test_reproducibility_guards():
    import jax

    from pyannote_audio_tpu.utils.reproducibility import (
        ReproducibilityError, ReproducibilityWarning,
        raise_reproducibility, warn_reproducibility)

    # CPU backend: always fine
    raise_reproducibility("cpu")
    warn_reproducibility("cpu")

    prior = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "default")
        with pytest.raises(ReproducibilityError):
            raise_reproducibility("tpu")
        with pytest.warns(ReproducibilityWarning):
            warn_reproducibility("tpu")
        jax.config.update("jax_default_matmul_precision", "highest")
        raise_reproducibility("tpu")
        warn_reproducibility("tpu")
    finally:
        jax.config.update("jax_default_matmul_precision", prior)


def test_dependency_exception_types():
    from pyannote_audio_tpu.utils.dependencies import (
        DependencyError, MissingDependency, WrongDependencyVersion,
        check_dependencies)

    assert issubclass(MissingDependency, DependencyError)
    assert issubclass(WrongDependencyVersion, DependencyError)
    with pytest.raises(MissingDependency):
        check_dependencies({"not_a_real_package_xyz": "1.0"}, strict=True)
    with pytest.raises(WrongDependencyVersion):
        check_dependencies({"numpy": "0.0.1"}, strict=True)


def test_load_stm(tmp_path):
    from pyannote_audio_tpu.sample import load_stm

    stm = tmp_path / "sample.stm"
    stm.write_text(
        "ses1 1 alice 0.0 1.5 hello there\n"
        "ses1 1 bob 2.0 3.0 hi\n"
        "\n"
        "ses2 1 carol 0.5 0.9 ok\n")
    sessions = load_stm(stm)
    assert set(sessions) == {"ses1", "ses2"}
    assert sessions["ses1"][0] == {
        "start": 0.0, "end": 1.5, "text": "hello there",
        "speaker": "alice"}
    assert len(sessions["ses1"]) == 2


def test_batchify():
    from pyannote_audio_tpu.pipelines.speech_separation import batchify

    batches = list(batchify("ABCDEFG", 3))
    assert batches == [("A", "B", "C"), ("D", "E", "F"),
                       ("G", None, None)]


def test_model_output_and_introspection():
    from pyannote_audio_tpu.core.model import Introspection, Output
    from pyannote_audio_tpu.core.segment import SlidingWindow

    Introspection()  # legacy unpickling compat: constructible, empty
    out = Output(num_frames=10, dimension=3,
                 frames=SlidingWindow(start=0.0, duration=0.1, step=0.1))
    assert out.num_frames == 10


def test_base_inference_hierarchy_and_external_backends():
    from pyannote_audio_tpu.core.inference import BaseInference, Inference
    from pyannote_audio_tpu.pipelines.speaker_verification import (
        NeMoPretrainedSpeakerEmbedding,
        PyannoteAudioPretrainedSpeakerEmbedding,
        SpeechBrainPretrainedSpeakerEmbedding)

    assert issubclass(Inference, BaseInference)
    assert issubclass(PyannoteAudioPretrainedSpeakerEmbedding,
                      BaseInference)
    with pytest.raises(ImportError, match="speechbrain"):
        SpeechBrainPretrainedSpeakerEmbedding()
    with pytest.raises(ImportError, match="NeMo"):
        NeMoPretrainedSpeakerEmbedding()


def test_wespeaker_depth_variants_and_tstp():
    import jax
    import jax.numpy as jnp

    from pyannote_audio_tpu.models.blocks.pooling import stats_pool
    from pyannote_audio_tpu.models.embedding import wespeaker as ws

    # the reference's bare builder names resolve to the flax models
    assert ws.ResNet34 is ws.WeSpeakerResNet34
    for name, blocks, bottleneck in [
            ("WeSpeakerResNet18", (2, 2, 2, 2), False),
            ("WeSpeakerResNet50", (3, 4, 6, 3), True),
            ("WeSpeakerResNet101", (3, 4, 23, 3), True)]:
        cls = getattr(ws, name)
        assert cls.NUM_BLOCKS == blocks and cls.BOTTLENECK is bottleneck
        module = cls().build_module()
        assert module.num_blocks == blocks

    frames = jnp.asarray(
        np.random.default_rng(3).random((2, 12, 6)).astype(np.float32))
    pooled = ws.TSTP().apply({}, frames)
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(stats_pool(jnp.swapaxes(frames, 1, 2))), rtol=1e-6)
    assert pooled.shape == (2, 12)


def test_wrap_augmentation():
    import torch

    from pyannote_audio_tpu.augmentation.registry import (
        TorchAudiomentationsWaveformTransformWrapper, wrap_augmentation)

    # plain (X, y) callables pass through untouched
    def identity(X, y):
        return X, y

    assert wrap_augmentation(identity) is identity

    class FakeWaveformTransform:
        sample_rate = 16000

        def __call__(self, samples=None, sample_rate=None):
            return samples * 2

    wrapped = wrap_augmentation(FakeWaveformTransform())
    assert isinstance(wrapped,
                      TorchAudiomentationsWaveformTransformWrapper)
    X = np.ones((2, 1, 8), dtype=np.float32)
    out, y = wrapped(X, "targets")
    np.testing.assert_allclose(out, 2 * X)
    assert y == "targets"
    with pytest.raises(ValueError, match="input"):
        TorchAudiomentationsWaveformTransformWrapper(
            FakeWaveformTransform(), when="output")


def test_telemetry_parity_names():
    from pyannote_audio_tpu.telemetry.metrics import (
        is_metrics_enabled, set_opentelemetry_log_level,
        telemetry_enabled)

    assert is_metrics_enabled() == telemetry_enabled()
    set_opentelemetry_log_level("error")


def test_task_name_aliases():
    from pyannote_audio_tpu.tasks.embedding import (
        SupervisedRepresentationLearningTaskMixin,
        SupervisedRepresentationLearningWithArcFace)
    from pyannote_audio_tpu.tasks.segmentation import (SegmentationTask,
                                                       SegmentationTaskMixin)

    assert SegmentationTask is SegmentationTaskMixin
    assert SupervisedRepresentationLearningTaskMixin is \
        SupervisedRepresentationLearningWithArcFace
