"""SincNet learnable band-pass front-end, flax + XLA.

Behavioral parity with the reference SincNet block
(/root/reference/src/pyannote/audio/models/blocks/sincnet.py): instance-norm
-> parameterized sinc filterbank conv (80 filters, k=251) -> abs ->
3x(maxpool3 + instance-norm + leaky-relu) with two Conv1d(80->60, 60->60,
k=5) stages. The sinc filterbank follows the public SincNet
parameterization (Ravanelli & Bengio, arXiv:1808.00158, as wrapped by
asteroid_filterbanks.ParamSincFB): learnable per-filter (low_hz_, band_hz_),
mel-spaced init, Hamming-windowed symmetric kernels.

TPU-native design: kernels are materialized on the fly from the 2x80 scalar
parameters (one tiny elementwise pass) and the filterbank is a single
strided convolution, which XLA lowers to an MXU-friendly contraction; the
entire block is fusable under jit. Layout is channel-last (B, T, C).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.receptive_field import (
    multi_conv_num_frames,
    multi_conv_receptive_field_center,
    multi_conv_receptive_field_size,
)
from .norm import InstanceNorm1d

# 251-tap sinc filterbank — single source of truth for the first conv's
# kernel size (SincConv default, _ladder, PyanNet.frontend_num_frames)
SINC_KERNEL_SIZE = 251


# conv/pool ladder of the block: [sinc, pool, conv, pool, conv, pool]
def _ladder(stride: int):
    return dict(
        kernel_size=[SINC_KERNEL_SIZE, 3, 5, 3, 5, 3],
        stride=[stride, 3, 1, 3, 1, 3],
        padding=[0, 0, 0, 0, 0, 0],
        dilation=[1, 1, 1, 1, 1, 1],
    )


def mel_initialized_bands(n_filters: int, sample_rate: int,
                          min_low_hz: float, min_band_hz: float
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Mel-spaced initial (low_hz, band_hz), as in public SincNet."""
    low_hz = 30.0
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)

    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), n_filters + 1)
    hz = to_hz(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


def sinc_filters(low_hz: jnp.ndarray, band_hz: jnp.ndarray,
                 kernel_size: int, sample_rate: int,
                 min_low_hz: float = 50.0, min_band_hz: float = 50.0
                 ) -> jnp.ndarray:
    """Materialize (kernel_size, n_filters) band-pass kernels.

    band_pass(t) = (sin(2π f_hi t) − sin(2π f_lo t)) / (πt), Hamming-windowed
    and peak-normalized per filter — the SincConv-fast construction.
    """
    n_filters = low_hz.shape[0]
    low = min_low_hz + jnp.abs(low_hz)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz),
                    min_low_hz, sample_rate / 2)
    band = (high - low)

    half = (kernel_size - 1) // 2
    # n_: (half,) time axis 2π t / sr for t = -half..-1
    t = jnp.arange(-half, 0, dtype=jnp.float32)
    n_ = 2.0 * jnp.pi * t / sample_rate
    # half Hamming window
    window = 0.54 - 0.46 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(half, dtype=jnp.float32)
        / (kernel_size - 1))

    f_lo = low[:, None] * n_[None, :]
    f_hi = high[:, None] * n_[None, :]
    left = ((jnp.sin(f_hi) - jnp.sin(f_lo)) / (n_[None, :] / 2.0)) \
        * window[None, :]
    center = 2.0 * band[:, None]
    right = left[:, ::-1]
    filters = jnp.concatenate([left, center, right], axis=1)
    filters = filters / (2.0 * band[:, None])
    return filters.T  # (kernel_size, n_filters)


class SincConv(nn.Module):
    """Learnable sinc filterbank as a strided conv. Input (B, T, 1).

    ``compute_dtype=bfloat16`` runs the big strided contraction on the
    MXU in bf16 (f32 partial-sum accumulation on TPU; the sinc
    parameters and kernel materialization stay f32, the bf16 output is
    cast back to f32 — AD-safe, unlike a mixed preferred_element_type).
    The input is instance-normalized (unit variance) so bf16's 8-bit
    mantissa costs ~1e-2 relative error — gated off by default, see
    SincNet.
    """

    n_filters: int = 80
    kernel_size: int = SINC_KERNEL_SIZE
    stride: int = 10
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    compute_dtype: object = jnp.float32

    def setup(self):
        init_low, init_band = mel_initialized_bands(
            self.n_filters, self.sample_rate, self.min_low_hz,
            self.min_band_hz)
        self.low_hz = self.param("low_hz", lambda _: jnp.asarray(init_low))
        self.band_hz = self.param("band_hz",
                                  lambda _: jnp.asarray(init_band))

    def kernels(self) -> jnp.ndarray:
        """Materialized (kernel_size, n_filters) filterbank (f32)."""
        return sinc_filters(self.low_hz, self.band_hz, self.kernel_size,
                            self.sample_rate, self.min_low_hz,
                            self.min_band_hz)

    def raw_conv(self, x: jnp.ndarray) -> jnp.ndarray:
        """The strided conv itself, output left in compute_dtype."""
        kernels = self.kernels()
        # output stays in compute_dtype, cast back by the caller: mixing
        # a bf16 operand with preferred_element_type=f32 breaks the
        # conv's VJP (f32 cotangent vs bf16 operand dtypes in the
        # transpose conv). The MXU still accumulates partial sums in
        # f32; bf16 costs one extra rounding of the OUTPUT only —
        # matching the flax nn.Conv(dtype=bf16) layers below.
        return jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype),
            kernels[:, None, :].astype(self.compute_dtype),
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.raw_conv(x).astype(jnp.float32)


class SincNet(nn.Module):
    """Full SincNet block. Input (B, channel, samples) -> (B, frames, 60).

    PYANNOTE_TPU_SEG_BF16 (resolved once at trace time; default ON for
    accelerator backends, off on CPU) runs the three convolutions in
    bf16 with f32 accumulation — instance norms, abs, and pooling stay
    f32. The sinc conv is the block's FLOPs peak (251-tap stride-10 over
    raw audio), so this roughly halves SincNet MXU time; the A/B DER
    delta is 0.0 on the synthetic corpus (benchmarks/seg_bf16_ab.py,
    docs/PARITY.md). PYANNOTE_TPU_SEG_BF16=0 restores f32 everywhere.
    """

    stride: int = 10
    sample_rate: int = 16000

    def setup(self):
        from ...utils.runtime import device_flag
        dtype = jnp.bfloat16 if device_flag("PYANNOTE_TPU_SEG_BF16") \
            else jnp.float32
        self.wav_norm1d = InstanceNorm1d(1)
        self.sinc_conv = SincConv(stride=self.stride,
                                  sample_rate=self.sample_rate,
                                  compute_dtype=dtype)
        self.norm1d_0 = InstanceNorm1d(80)
        self.conv1d_1 = nn.Conv(60, (5,), padding="VALID", dtype=dtype)
        self.norm1d_1 = InstanceNorm1d(60)
        self.conv1d_2 = nn.Conv(60, (5,), padding="VALID", dtype=dtype)
        self.norm1d_2 = InstanceNorm1d(60)

    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(waveforms, 1, 2)  # (B, T, C)
        x = self.wav_norm1d(x)
        x = self.sinc_conv(x)
        return self.post_conv(x)

    def post_conv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Everything after the sinc conv: abs + 3x(pool, norm, relu/conv)."""
        x = jnp.abs(x)
        x = _max_pool3(x)
        x = self.norm1d_0(x)
        x = nn.leaky_relu(x, 0.01)
        x = self.conv1d_1(x).astype(jnp.float32)
        x = _max_pool3(x)
        x = self.norm1d_1(x)
        x = nn.leaky_relu(x, 0.01)
        x = self.conv1d_2(x).astype(jnp.float32)
        x = _max_pool3(x)
        x = self.norm1d_2(x)
        x = nn.leaky_relu(x, 0.01)
        return x

    # -- shared whole-file front-end ---------------------------------------
    #
    # The sinc conv is linear, so conv(norm(chunk)) is an affine function
    # of conv(raw waveform): with per-chunk instance-norm statistics
    # (m, v) and affine (gamma, beta),
    #   conv(gamma * (x - m) / sqrt(v+eps) + beta)
    #     = gamma/sqrt(v+eps) * conv(x) + (beta - gamma*m/sqrt(v+eps)) * K1
    # where K1[f] = sum of filter f's taps (its DC gain). Computing
    # conv(x) ONCE over the whole file and gathering per-chunk frames
    # removes the ~10x redundant MXU work of 90%-overlapping chunks
    # (chunk starts must align to the conv stride for frames to be
    # gatherable — the sliding grid's step is 1 s = 16000 samples,
    # divisible by stride 10).

    def whole_conv(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """Sinc conv of the raw (un-normalized) waveform.

        waveform: (B, T, 1) -> (B, F_all, n_filters), kept in the
        compute dtype (bf16 on accelerators) to halve the HBM buffer.
        """
        return self.sinc_conv.raw_conv(waveform)

    def from_conv(self, frames: jnp.ndarray, mean: jnp.ndarray,
                  var: jnp.ndarray) -> jnp.ndarray:
        """Finish the block from gathered raw-conv frames.

        frames: (B, F_c, n_filters) slices of ``whole_conv`` output;
        mean/var: (B,) per-chunk raw-waveform statistics (mono).
        """
        gamma = self.wav_norm1d.scale[0]
        beta = self.wav_norm1d.bias[0]
        k1 = jnp.sum(self.sinc_conv.kernels(), axis=0)  # (n_filters,)
        inv = gamma / jnp.sqrt(var + self.wav_norm1d.eps)  # (B,)
        shift = beta - mean * inv                          # (B,)
        x = frames.astype(jnp.float32) * inv[:, None, None] \
            + shift[:, None, None] * k1[None, None, :]
        return self.post_conv(x)

    @staticmethod
    def num_frames(num_samples: int, stride: int = 10) -> int:
        return multi_conv_num_frames(num_samples, **_ladder(stride))

    @staticmethod
    def receptive_field_size(num_frames: int = 1, stride: int = 10) -> int:
        spec = _ladder(stride)
        return multi_conv_receptive_field_size(
            num_frames, kernel_size=spec["kernel_size"],
            stride=spec["stride"], dilation=spec["dilation"])

    @staticmethod
    def receptive_field_center(frame: int = 0, stride: int = 10) -> int:
        return multi_conv_receptive_field_center(frame, **_ladder(stride))


def _max_pool3(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(3,), strides=(3,), padding="VALID")
