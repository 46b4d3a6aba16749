"""Fbank golden tests against an independent per-frame numpy reference.

torchaudio is not available in this image, so the oracle is a deliberately
naive frame-by-frame numpy implementation of Kaldi's fbank recipe (dither=0,
snip_edges=True, remove_dc_offset, preemphasis 0.97, window, power spectrum,
Kaldi mel banks, log floor at float32 eps), written in a different style
from the vectorized XLA version to catch vectorization bugs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.ops.fbank import (fbank, fbank_num_frames,
                                          kaldi_mel_banks, wespeaker_fbank)


def naive_fbank(wav, sample_rate=16000, num_mel_bins=80, window_type="povey"):
    win, shift, nfft = 400, 160, 512
    num_frames = 1 + (len(wav) - win) // shift
    n = np.arange(win)
    if window_type == "povey":
        window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))) ** 0.85
    else:
        window = 0.54 - 0.46 * np.cos(2 * np.pi * n / (win - 1))
    banks = kaldi_mel_banks(num_mel_bins, nfft, sample_rate)  # (257, M)
    out = np.zeros((num_frames, num_mel_bins))
    for i in range(num_frames):
        frame = wav[i * shift:i * shift + win].astype(np.float64).copy()
        frame -= frame.mean()
        pre = np.empty_like(frame)
        pre[0] = frame[0] - 0.97 * frame[0]
        pre[1:] = frame[1:] - 0.97 * frame[:-1]
        frame = pre * window
        spec = np.fft.rfft(frame, n=nfft)
        power = np.abs(spec) ** 2
        mel = power @ banks
        out[i] = np.log(np.maximum(mel, 1.1920928955078125e-07))
    return out


@pytest.mark.parametrize("window_type", ["povey", "hamming"])
def test_fbank_matches_naive(window_type):
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(16000)).astype(np.float32) * 32768.0
    ours = np.asarray(fbank(jnp.asarray(wav), window_type=window_type))
    ref = naive_fbank(wav, window_type=window_type)
    assert ours.shape == ref.shape == (98, 80)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_fbank_num_frames():
    assert fbank_num_frames(16000) == 98
    assert fbank_num_frames(400) == 1
    assert fbank_num_frames(399) == 0
    assert fbank_num_frames(80000) == 498


def test_fbank_batched():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((3, 8000)).astype(np.float32)
    out = np.asarray(fbank(jnp.asarray(wav)))
    assert out.shape == (3, 48, 80)
    one = np.asarray(fbank(jnp.asarray(wav[1])))
    np.testing.assert_allclose(out[1], one, atol=1e-3)


def test_wespeaker_fbank_centered():
    rng = np.random.default_rng(2)
    wav = (0.1 * rng.standard_normal((2, 1, 16000))).astype(np.float32)
    out = np.asarray(wespeaker_fbank(jnp.asarray(wav)))
    assert out.shape == (2, 98, 80)
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)


def test_mel_banks_shape_and_coverage():
    banks = kaldi_mel_banks(80, 512, 16000)
    assert banks.shape == (257, 80)
    assert banks[-1].sum() == 0.0  # nyquist column zero-padded
    # every mel bin has some support; interior fft bins covered
    assert (banks.sum(axis=0) > 0).all()
    assert (banks[5:200].sum(axis=1) > 0).all()


@pytest.mark.parametrize("window_type", ["povey", "hamming"])
def test_conv_fbank_matches_naive(window_type, monkeypatch):
    """The composed-conv MXU path (PYANNOTE_TPU_CONV_FBANK) matches the
    per-frame oracle to the same tolerance as the rfft path."""
    monkeypatch.setenv("PYANNOTE_TPU_CONV_FBANK", "1")
    fbank.clear_cache()  # gate resolves at trace time
    try:
        rng = np.random.default_rng(0)
        wav = (0.1 * rng.standard_normal(16000)).astype(
            np.float32) * 32768.0
        ours = np.asarray(fbank(jnp.asarray(wav),
                                window_type=window_type))
        ref = naive_fbank(wav, window_type=window_type)
        assert ours.shape == ref.shape == (98, 80)
        np.testing.assert_allclose(ours, ref, atol=2e-3)
        # batched input agrees with per-item
        two = np.stack([wav, wav[::-1].copy()])
        out2 = np.asarray(fbank(jnp.asarray(two),
                                window_type=window_type))
        np.testing.assert_allclose(out2[0], ours, atol=1e-4)
    finally:
        monkeypatch.delenv("PYANNOTE_TPU_CONV_FBANK")
        fbank.clear_cache()
