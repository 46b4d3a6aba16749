"""Analytic FLOP counters (utils/flops.py) cross-checked against XLA's
HLO cost analysis on CPU — keeps the bench artifact's MFU numbers honest
(VERDICT r3 item 3)."""

import jax
import jax.numpy as jnp
import pytest

from pyannote_audio_tpu.utils import flops as F


def _xla_flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def test_resnet34_trunk_flops_matches_xla():
    from pyannote_audio_tpu.models.embedding.wespeaker import ResNetTrunk

    T = 256
    trunk = ResNetTrunk(dtype=jnp.float32)
    x = jnp.zeros((1, T, 80, 1), jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)
    measured = _xla_flops(lambda p, v: trunk.apply(p, v), params, x)
    analytic = F.resnet_trunk_flops_per_frame() * T
    # cost analysis also counts batch-norm/relu elementwise work (~1%)
    assert analytic == pytest.approx(measured, rel=0.05)


@pytest.mark.slow
def test_bottleneck_trunk_flops_matches_xla():
    from pyannote_audio_tpu.models.embedding.wespeaker import ResNetTrunk

    T = 64
    trunk = ResNetTrunk(num_blocks=(2, 2, 2, 2), bottleneck=True,
                        dtype=jnp.float32)
    x = jnp.zeros((1, T, 80, 1), jnp.float32)
    params = trunk.init(jax.random.PRNGKey(0), x)
    measured = _xla_flops(lambda p, v: trunk.apply(p, v), params, x)
    analytic = F.resnet_trunk_flops_per_frame(
        num_blocks=(2, 2, 2, 2), bottleneck=True) * T
    assert analytic == pytest.approx(measured, rel=0.05)


def test_fbank_conv_flops_matches_xla():
    frames, window, padded = 998, 400, 512
    nk = padded // 2 + 1

    def dft_and_mel(x, k, banks):
        out = jax.lax.conv_general_dilated(
            x[..., None], k, window_strides=(160,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
        power = jnp.square(out[..., :nk]) + jnp.square(out[..., nk:])
        return jnp.einsum("bnf,fm->bnm", power, banks)

    x = jnp.zeros((1, (frames - 1) * 160 + window), jnp.float32)
    k = jnp.zeros((window, 1, 2 * nk), jnp.float32)
    banks = jnp.zeros((nk, 80), jnp.float32)
    measured = _xla_flops(dft_and_mel, x, k, banks)
    analytic = F.fbank_conv_flops(frames, window, padded)
    # square+add of the power spectrum is the only uncounted term
    assert analytic == pytest.approx(measured, rel=0.05)


def test_sinc_and_post_conv_flops_match_xla():
    samples = 160000

    def sinc(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(10,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    x = jnp.zeros((1, samples, 1), jnp.float32)
    k = jnp.zeros((F.SINC_KERNEL, 1, F.SINC_FILTERS), jnp.float32)
    assert F.sincnet_whole_conv_flops(samples) == \
        pytest.approx(_xla_flops(sinc, x, k), rel=0.01)

    # per-chunk post-sinc convs: exact VALID-conv frame arithmetic
    parts = F.pyannet_post_sinc_flops(samples)
    assert parts["frames"] == 589          # PyanNet 10 s chunk frame count

    def post(x, k1, k2):
        y = jax.lax.conv_general_dilated(
            x, k1, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = y[:, : (y.shape[1] // 3) * 3].reshape(
            y.shape[0], -1, 3, 60).max(axis=2)
        return jax.lax.conv_general_dilated(
            y, k2, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    f1 = F.conv1d_out(samples, F.SINC_KERNEL, 10) // 3
    x = jnp.zeros((1, f1, 80), jnp.float32)
    k1 = jnp.zeros((5, 80, 60), jnp.float32)
    k2 = jnp.zeros((5, 60, 60), jnp.float32)
    assert parts["convs"] == pytest.approx(_xla_flops(post, x, k1, k2),
                                           rel=0.02)


def test_lstm_flops_formula():
    # 2 layers bidirectional H=128: layer inputs 60 then 256
    per_step_macs = (4 * 128 * (60 + 128) + 4 * 128 * (256 + 128)) * 2
    assert F.lstm_flops(589, [60, 256], 128) == 2 * per_step_macs * 589


def test_diarization_aggregate_shapes():
    stages = F.diarization_device_flops(600.0)
    assert stages["chunks"] == 591
    assert stages["chunks_executed"] == 640       # 2x256 + 128 tail
    assert stages["fbank_frames"] == F.conv1d_out(9_600_000, 400, 160)
    total = F.total_flops(stages)
    assert total > 0
    # the shared trunk dominates this pipeline's FLOPs
    assert stages["trunk"] > 0.5 * total
    # linear-ish growth with file length (padding quantized)
    hour = F.total_flops(F.diarization_device_flops(3600.0))
    assert 4.5 < hour / total < 7.5
