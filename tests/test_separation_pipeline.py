"""Speech separation pipeline + PixIT task tests (tiny ToTaToNet)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet
from pyannote_audio_tpu.tasks.separation import (PixIT, mixit_loss,
                                                 mixit_partitions,
                                                 negative_sisdr)
from pyannote_audio_tpu.train import Trainer
from pyannote_audio_tpu.utils.database import Protocol

from corpus import default_two_speaker_file, make_file


def _tiny_totatonet():
    model = ToTaToNet(dprnn={"n_repeats": 1, "bn_chan": 16,
                             "hid_size": 16, "chunk_size": 25},
                      encoder_decoder={"n_filters": 16},
                      linear={"hidden_size": 16, "num_layers": 1})
    model.build()
    return model


def test_negative_sisdr_perfect():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
    loss = np.asarray(negative_sisdr(x, x))
    assert (loss < -50).all()  # perfect reconstruction: very high SI-SDR


def test_mixit_partitions():
    parts = mixit_partitions(3)
    assert parts.shape == (6, 3)  # 2^3 - 2 (no empty/full)


def test_mixit_loss_recovers_assignment():
    rng = np.random.default_rng(0)
    s1 = rng.standard_normal(2000).astype(np.float32)
    s2 = rng.standard_normal(2000).astype(np.float32)
    s3 = rng.standard_normal(2000).astype(np.float32)
    # estimated sources = exactly the constituents
    est = jnp.asarray(np.stack([s1, s2, s3], axis=-1)[None])
    mix1 = jnp.asarray((s1 + s3)[None])
    mix2 = jnp.asarray(s2[None])
    loss = float(mixit_loss(est, mix1, mix2))
    assert loss < -50  # a perfect partition exists


def test_separation_pipeline_end_to_end(tmp_path):
    from pyannote_audio_tpu.pipelines.speech_separation import (
        SeparationOutput, SpeechSeparation)
    model = _tiny_totatonet()
    file = default_two_speaker_file(tmp_path / "sep.wav")
    pipeline = SpeechSeparation(segmentation=model,
                                segmentation_batch_size=4)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0, "threshold": 0.4},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    output = pipeline(file, max_speakers=3)
    assert isinstance(output, SeparationOutput)
    assert output.sources.shape[0] == 30 * 16000
    assert np.isfinite(output.sources).all()


def test_device_overlap_add_matches_host_loop(tmp_path):
    """The on-device clustered overlap-add must reproduce the host
    reference loop (incl. dropped -2 assignments and shared clusters)."""
    import jax
    import jax.numpy as jnp
    from pyannote_audio_tpu.pipelines.speech_separation import \
        SpeechSeparation

    rng = np.random.default_rng(0)
    C, win, local, K = 5, 400, 3, 2
    num_samples = 1500
    padded_len = 1700
    src = rng.standard_normal((C, win, local)).astype(np.float32)
    starts = np.arange(C, dtype=np.int32) * 300
    hard = rng.integers(-2, K, size=(C, local)).astype(np.int32)

    # host reference (the pre-device implementation)
    sources = np.zeros((num_samples, K), np.float32)
    weight = np.zeros((num_samples, K), np.float32)
    for c, start in enumerate(starts):
        stop = min(start + win, num_samples)
        n = stop - start
        for s in range(local):
            k = hard[c, s]
            if k < 0:
                continue
            sources[start:stop, k] += src[c][:n, s]
            weight[start:stop, k] += 1.0
    expected = sources / np.maximum(weight, 1.0)

    model = _tiny_totatonet()
    pipeline = SpeechSeparation(segmentation=model)
    pipeline.instantiate(pipeline.default_parameters())
    file = default_two_speaker_file(tmp_path / "ov.wav")
    pipeline(file, max_speakers=2)        # builds _jitted_overlay
    onehot = jax.nn.one_hot(jnp.asarray(hard), K, dtype=jnp.float32)
    srcs_dev, wts_dev = pipeline._jitted_overlay(
        jnp.asarray(src), onehot, jnp.asarray(starts), total=padded_len)
    got = np.asarray(srcs_dev)[:num_samples] \
        / np.maximum(np.asarray(wts_dev)[:num_samples], 1.0)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_pixit_task_loss(tmp_path):
    protocol = Protocol(
        name="d",
        subsets={"train": [default_two_speaker_file(tmp_path / "t.wav"),
                           make_file(tmp_path / "t2.wav",
                                     [("carol", 0.5, 6.0),
                                      ("dave", 7.0, 13.0)],
                                     duration=14.0, seed=5)]})
    task = PixIT(protocol, duration=2.0, batch_size=2)
    model = _tiny_totatonet()
    model.task = task
    task.setup(model)
    batch = next(iter(task.train_batches(epoch=0)))
    assert batch.X.shape == (2, 1, 32000)
    assert batch.meta is not None and "mix1" in batch.meta
    loss = float(task.loss(model, model.params, batch))
    assert np.isfinite(loss)


def test_pixit_optimizer_separate_wavlm_lr():
    """pixit_optimizer routes 'wavlm' params to their own learning rate
    (reference manual-optimization parity, PixIT.py:1011-1026)."""
    import optax

    from pyannote_audio_tpu.tasks.separation import pixit_optimizer
    params = {"wavlm": {"w": jnp.ones((4,))},
              "masker": {"w": jnp.ones((4,))}}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    tx = pixit_optimizer(lr=1e-1, wavlm_lr=1e-3, gradient_clip_val=1e9)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert abs(float(updates["masker"]["w"][0])) == \
        pytest.approx(1e-1, rel=1e-3)
    assert abs(float(updates["wavlm"]["w"][0])) == \
        pytest.approx(1e-3, rel=1e-3)


def test_pixit_validation_metrics(tmp_path):
    """PixIT validation: optimal-DER family over sigmoid multilabels +
    within-batch MoM separation loss (reference common_step:905-940,
    default_metric:1030-1042)."""
    from pyannote_audio_tpu.train import Trainer

    protocol = Protocol(
        name="d",
        subsets={"train": [default_two_speaker_file(tmp_path / "v.wav")],
                 "development": [
                     default_two_speaker_file(tmp_path / "v2.wav")]})
    task = PixIT(protocol, duration=2.0, batch_size=2)
    model = _tiny_totatonet()
    model.task = task
    task.setup(model)
    trainer = Trainer(max_epochs=1, limit_train_batches=1)
    trainer.fit(model, task)
    record = trainer.history[0]
    assert "der/val/optimal" in record
    assert np.isfinite(record["der/val/optimal"])
    assert "loss/val" in record and np.isfinite(record["loss/val"])
    assert task.val_monitor == ("der/val/optimal", "min")


def test_sources_are_peak_normalized(tmp_path):
    """Parity: reference peak-normalizes each speaker's source
    (speech_separation.py:656-660) — SI-SDR training is scale-free."""
    from pyannote_audio_tpu.pipelines.speech_separation import \
        SpeechSeparation
    model = _tiny_totatonet()
    file = default_two_speaker_file(tmp_path / "norm.wav")
    pipeline = SpeechSeparation(segmentation=model,
                                segmentation_batch_size=4)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0, "threshold": 0.4},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    out = pipeline(file, max_speakers=3)
    peaks = np.max(np.abs(out.sources), axis=0)
    active = peaks > 1e-6
    np.testing.assert_allclose(peaks[active], 1.0, rtol=1e-4)


def test_leakage_removal_hyperparameters(tmp_path):
    """separation.leakage_removal / asr_collar semantics (parity:
    reference speech_separation.py:193-196, 631-654): masking is gated,
    collar-dilated, and per-speaker."""
    from pyannote_audio_tpu.core.annotation import Annotation
    from pyannote_audio_tpu.core.segment import Segment
    from pyannote_audio_tpu.pipelines.speech_separation import (
        SpeechSeparation, _apply_leakage_mask)

    sr = 1000
    sources = np.ones((10 * sr, 2), np.float32)
    diar = Annotation(uri="x")
    diar[Segment(1.0, 3.0), 0] = 0      # speaker 0 active 1-3 s
    diar[Segment(6.0, 8.0), 1] = 1      # speaker 1 active 6-8 s

    off = _apply_leakage_mask(sources, diar, sr, leakage_removal=False)
    np.testing.assert_array_equal(off, sources)   # gate respected

    on = _apply_leakage_mask(sources, diar, sr, leakage_removal=True,
                             asr_collar=0.5)
    # active (+0.5 s collar) spans survive; outside is zeroed
    assert on[int(2.0 * sr), 0] == 1.0
    assert on[int(3.4 * sr), 0] == 1.0      # inside collar
    assert on[int(4.5 * sr), 0] == 0.0      # outside collar
    assert on[int(7.0 * sr), 1] == 1.0
    assert on[int(2.0 * sr), 1] == 0.0      # other speaker's span
    # wider collar zeroes strictly less
    wide = _apply_leakage_mask(sources, diar, sr, leakage_removal=True,
                               asr_collar=1.0)
    assert (wide == 0).sum() < (on == 0).sum()

    # hyperparameters flow from instantiate() to apply()
    model = _tiny_totatonet()
    pipeline = SpeechSeparation(segmentation=model,
                                segmentation_batch_size=4)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0, "threshold": 0.4},
        "separation": {"leakage_removal": False, "asr_collar": 0.05},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    assert pipeline.separation["leakage_removal"] is False
    out = pipeline(default_two_speaker_file(tmp_path / "lk.wav"),
                   max_speakers=3)
    assert np.isfinite(out.sources).all()
