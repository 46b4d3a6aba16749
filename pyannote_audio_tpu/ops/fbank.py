"""Kaldi-compatible log-mel filterbank features in pure JAX/XLA.

Replaces torchaudio.compliance.kaldi.fbank as used by the reference's
WeSpeaker front-end (/root/reference/src/pyannote/audio/models/embedding/
wespeaker/__init__.py:88-99,128-139): snip_edges framing, DC-offset removal,
preemphasis 0.97, hamming/povey window, power-of-two FFT padding, Kaldi mel
banks (1127*ln(1+f/700), low=20Hz, high=nyquist), log with float-eps floor.

TPU-native design: framing is a strided gather, windowing/preemphasis are
fused elementwise ops, the FFT is XLA's rfft, and the mel projection is one
(frames, 257) x (257, num_bins) MXU matmul. Everything is batched and
jit-compiled; golden-tested against torchaudio in tests/test_fbank.py.
"""

from __future__ import annotations

import math
import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = 1.1920928955078125e-07  # float32 machine epsilon, kaldi's log floor


def _mel(hz):
    return 1127.0 * np.log(1.0 + hz / 700.0)


def kaldi_mel_banks(num_bins: int, window_length_padded: int,
                    sample_rate: float, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """(num_fft_bins+1, num_bins) triangular mel filterbank, Kaldi-style.

    ``high_freq <= 0`` means nyquist + high_freq. The extra final row is the
    zero-padded nyquist bin (torchaudio appends a zero column likewise).
    """
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_rate / window_length_padded
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_mels = _mel(fft_bin_width * np.arange(num_fft_bins))  # (F,)
    left = mel_low + np.arange(num_bins) * mel_delta          # (M,)
    center = left + mel_delta
    right = center + mel_delta

    up = (bin_mels[None, :] - left[:, None]) / mel_delta
    down = (right[:, None] - bin_mels[None, :]) / mel_delta
    banks = np.maximum(0.0, np.minimum(up, down))             # (M, F)
    banks = np.concatenate([banks, np.zeros((num_bins, 1))], axis=1)
    return banks.T.astype(np.float32)                          # (F+1, M)


def _window(window_type: str, length: int) -> np.ndarray:
    n = np.arange(length, dtype=np.float64)
    if window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (length - 1))
    elif window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))
    elif window_type == "povey":
        w = (0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))) ** 0.85
    elif window_type == "rectangular":
        w = np.ones(length)
    else:
        raise ValueError(f"unknown window type {window_type!r}")
    return w.astype(np.float32)


def _next_power_of_two(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _use_dft_matmul() -> bool:
    """Opt-in matmul DFT (PYANNOTE_TPU_DFT_FBANK=1).

    Measured slower than XLA's rfft end-to-end on v5e at f32 precision
    (39.6 vs 13.0 s/audio-hour in bench.py), so rfft stays the default.
    Superseded by the composed-conv path below (PYANNOTE_TPU_CONV_FBANK),
    which skips the framing gather entirely; kept for A/B reference.
    """
    import os
    return os.environ.get("PYANNOTE_TPU_DFT_FBANK", "0") == "1"


def _use_conv_dft() -> bool:
    """Composed-conv fbank (PYANNOTE_TPU_CONV_FBANK, accelerator default).

    DC-offset removal, preemphasis, and windowing are all linear maps of
    the frame vector, so they compose with the DFT basis into one
    (window, 2*(padded/2+1)) matrix; the whole power-spectrum front-end
    is then a single stride-`shift` convolution that rides the MXU and
    never materializes the (frames, window) gather the rfft path needs.
    Measured 0.221 s -> ~0.01 s for a 10-min file on v5e
    (benchmarks/embed_breakdown.py); bit-equivalence is bounded by the
    golden fbank tests with the flag forced on.
    """
    from ..utils.runtime import device_flag
    return device_flag("PYANNOTE_TPU_CONV_FBANK")


@functools.lru_cache(maxsize=None)
def _conv_dft_kernel_np(window_size: int, padded: int, window_type: str,
                        remove_dc_offset: bool,
                        preemphasis_coefficient: float) -> np.ndarray:
    """(window_size, 2*(padded//2+1)) composed frame->[re|im] matrix.

    For a frame column vector f: out = C^T W P A f, with A = DC removal,
    P = preemphasis (kaldi edge handling: first sample uses itself as its
    left neighbour), W = diag(window), C = real-DFT basis. As a
    row-vector kernel: K = A^T P^T W C, precomputed in float64.
    """
    n = window_size
    A = np.eye(n)
    if remove_dc_offset:
        A = A - np.full((n, n), 1.0 / n)
    P = np.eye(n)
    if preemphasis_coefficient != 0.0:
        c = float(preemphasis_coefficient)
        P[np.arange(1, n), np.arange(0, n - 1)] = -c
        P[0, 0] = 1.0 - c
    w = _window(window_type, n).astype(np.float64)
    k = np.arange(padded // 2 + 1)
    angle = 2.0 * np.pi * np.outer(np.arange(n), k) / padded
    C = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    K = A.T @ P.T @ (w[:, None] * C)
    return K.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_basis_np(window_size: int, padded: int):
    k = np.arange(padded // 2 + 1)
    n = np.arange(window_size)
    angle = 2.0 * np.pi * np.outer(n, k) / padded
    return (np.cos(angle).astype(np.float32),
            -np.sin(angle).astype(np.float32))


def _dft_basis(window_size: int, padded: int):
    cos_b, sin_b = _dft_basis_np(window_size, padded)
    return jnp.asarray(cos_b), jnp.asarray(sin_b)


def fbank_num_frames(num_samples: int, sample_rate: int = 16000,
                     frame_length: float = 25.0, frame_shift: float = 10.0,
                     snip_edges: bool = True) -> int:
    window_size = int(sample_rate * frame_length * 0.001)
    window_shift = int(sample_rate * frame_shift * 0.001)
    if snip_edges:
        if num_samples < window_size:
            return 0
        return 1 + (num_samples - window_size) // window_shift
    return (num_samples + window_shift // 2) // window_shift


def fbank_impl(
    waveform: jnp.ndarray,              # (..., num_samples)
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,         # ms
    frame_shift: float = 10.0,          # ms
    window_type: str = "povey",
    round_to_power_of_two: bool = True,
    remove_dc_offset: bool = True,
    preemphasis_coefficient: float = 0.97,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> jnp.ndarray:
    """Log-mel fbank, output (..., num_frames, num_mel_bins)."""
    window_size = int(sample_rate * frame_length * 0.001)
    window_shift = int(sample_rate * frame_shift * 0.001)
    padded = _next_power_of_two(window_size) if round_to_power_of_two \
        else window_size

    num_samples = waveform.shape[-1]
    batch_shape = waveform.shape[:-1]
    if num_samples < window_size:
        # shorter than one window: 0 frames (kaldi snip_edges semantics,
        # matching fbank_num_frames) instead of a negative-size gather
        return jnp.zeros(batch_shape + (0, num_mel_bins), waveform.dtype)
    num_frames = 1 + (num_samples - window_size) // window_shift
    x = waveform.reshape((-1, num_samples))

    if _use_conv_dft():
        # single MXU pass: framing+DC+preemphasis+window+DFT as one
        # strided conv (kernel precomposed in float64); power falls
        # through to the shared mel/log tail below
        K = jnp.asarray(_conv_dft_kernel_np(
            window_size, padded, window_type, remove_dc_offset,
            float(preemphasis_coefficient)))
        out = jax.lax.conv_general_dilated(
            x[..., None], K[:, None, :],
            window_strides=(window_shift,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST)[:, :num_frames]
        nk = padded // 2 + 1
        power = jnp.square(out[..., :nk]) + jnp.square(out[..., nk:])
    else:
        # framing: strided gather (B, num_frames, window_size)
        idx = (jnp.arange(num_frames)[:, None] * window_shift
               + jnp.arange(window_size)[None, :])
        frames = x[:, idx]

        if remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if preemphasis_coefficient != 0.0:
            first = frames[..., :1] \
                - preemphasis_coefficient * frames[..., :1]
            rest = frames[..., 1:] \
                - preemphasis_coefficient * frames[..., :-1]
            frames = jnp.concatenate([first, rest], axis=-1)
        frames = frames * jnp.asarray(_window(window_type, window_size))

        if _use_dft_matmul():
            # the power spectrum as two real matmuls — XLA's TPU FFT
            # lowers poorly, while a (frames, window) x (window, bins)
            # DFT contraction rides the MXU. Zero-padding is implicit
            # (basis rows beyond the window are dropped).
            cos_b, sin_b = _dft_basis(window_size, padded)
            re = jnp.einsum("bnf,fk->bnk", frames, cos_b,
                            precision=jax.lax.Precision.HIGHEST)
            im = jnp.einsum("bnf,fk->bnk", frames, sin_b,
                            precision=jax.lax.Precision.HIGHEST)
            power = jnp.square(re) + jnp.square(im)
        else:
            if padded > window_size:
                frames = jnp.pad(
                    frames, ((0, 0), (0, 0), (0, padded - window_size)))
            spectrum = jnp.fft.rfft(frames, axis=-1)
            power = jnp.square(spectrum.real) \
                + jnp.square(spectrum.imag)

    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, sample_rate,
                                        low_freq, high_freq))
    mel = jnp.einsum("bnf,fm->bnm", power, banks,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.log(jnp.maximum(mel, EPSILON))
    return out.reshape(batch_shape + (num_frames, num_mel_bins))


# jitted entry point; fbank_impl stays importable for benchmarks/tests
# that need their own jit wrappers (the conv/rfft gate resolves at
# trace time)
fbank = partial(jax.jit, static_argnames=(
    "sample_rate", "num_mel_bins", "frame_length", "frame_shift",
    "window_type", "round_to_power_of_two", "remove_dc_offset",
    "preemphasis_coefficient", "low_freq", "high_freq"))(fbank_impl)


@functools.lru_cache(maxsize=None)
def _speechbrain_mel_banks(n_mels: int, n_fft: int, sample_rate: int,
                           f_min: float, f_max: float) -> np.ndarray:
    """(n_fft//2+1, n_mels) SpeechBrain-style SYMMETRIC triangular mel
    filterbank.

    SpeechBrain's Filterbank (speechbrain/processing/features.py) spaces
    n_mels+2 points on the HTK mel scale (2595*log10(1+f/700)), then
    builds each triangle SYMMETRICALLY around its center with half-width
    ``band[i] = hz[i+1] - hz[i]`` (the LEFT gap) — unlike Kaldi/HTK
    asymmetric triangles. Replicated exactly for ECAPA checkpoint parity.
    """
    def to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    hz = to_hz(np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2))
    band = (hz[1:] - hz[:-1])[:-1]          # (n_mels,) left gaps
    f_central = hz[1:-1]                     # (n_mels,)
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    slope = (all_freqs[:, None] - f_central[None, :]) / band[None, :]
    banks = np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0))
    return banks.astype(np.float32)          # (F, n_mels)


def speechbrain_fbank_num_frames(num_samples: int, hop: int = 160) -> int:
    """Centered STFT frame count: 1 + num_samples // hop."""
    return 1 + num_samples // hop


def _centered_stft_power(x: jnp.ndarray, n_fft: int, win_length: int,
                         hop_length: int, num_frames: int,
                         window: np.ndarray,
                         pad_mode: str = "constant") -> jnp.ndarray:
    """torch.stft(center=True)-layout power spectrum shared by the
    SpeechBrain and NeMo front-ends: pad ``n_fft//2`` on both sides
    (``pad_mode``), gather ``num_frames`` hop-strided frames, apply
    ``window`` (length ``win_length``, centered in the n_fft frame
    exactly as torch.stft pads a short window — NOT right-aligned),
    rfft, |X|^2.  (batch, samples) -> (batch, num_frames, n_fft//2+1).
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    # make sure the final centered frame has a full n_fft to gather
    needed = (num_frames - 1) * hop_length + n_fft
    if x.shape[-1] < needed:
        x = jnp.pad(x, ((0, 0), (0, needed - x.shape[-1])))
    idx = (jnp.arange(num_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = x[:, idx]                                   # (B, T, n_fft)
    full = np.zeros(n_fft, dtype=np.float32)
    left = (n_fft - win_length) // 2
    full[left:left + win_length] = np.asarray(window, dtype=np.float32)
    frames = frames * jnp.asarray(full)
    spectrum = jnp.fft.rfft(frames, axis=-1)
    return jnp.square(spectrum.real) + jnp.square(spectrum.imag)


def speechbrain_fbank(waveforms: jnp.ndarray, n_mels: int = 80,
                      sample_rate: int = 16000, n_fft: int = 400,
                      win_length: Optional[int] = None,
                      hop_length: Optional[int] = None,
                      f_min: float = 0.0, f_max: float = 8000.0,
                      amin: float = 1e-10, top_db: float = 80.0
                      ) -> jnp.ndarray:
    """SpeechBrain ``Fbank`` front-end (the ECAPA-TDNN input features).

    Replicates speechbrain.lobes.features.Fbank with its defaults as used
    by spkrec-ecapa-voxceleb: centered STFT (constant zero padding,
    periodic hamming window, n_fft 400 / hop 160), power spectrum
    (spectral_magnitude power=1 => |X|^2), symmetric-triangle mel
    filterbank, and 10*log10 dB conversion with a per-utterance
    ``max - top_db`` floor (Filterbank._amplitude_to_DB).

    ``win_length``/``hop_length`` default to SpeechBrain's 25 ms/10 ms
    at the given ``sample_rate`` (STFT converts ms -> samples the same
    way); ``n_fft`` and ``f_max`` stay 400/8000 regardless of rate,
    matching the upstream defaults.

    Input (batch[, channel], samples) — channel squeezed if present;
    output (batch, 1 + samples//hop, n_mels). TPU-native: one framing
    gather + rfft + one MXU mel matmul; no torch.
    """
    if win_length is None:
        win_length = int(round(sample_rate * 0.025))
    if hop_length is None:
        hop_length = int(round(sample_rate * 0.010))
    x = waveforms[..., 0, :] if waveforms.ndim == 3 else waveforms
    num_samples = x.shape[-1]
    num_frames = speechbrain_fbank_num_frames(num_samples, hop_length)
    # torch.hamming_window periodic=True: 0.54 - 0.46 cos(2 pi n / N)
    n = np.arange(win_length, dtype=np.float64)
    hamming = 0.54 - 0.46 * np.cos(2 * np.pi * n / win_length)
    power = _centered_stft_power(x, n_fft, win_length, hop_length,
                                 num_frames, hamming)
    banks = jnp.asarray(_speechbrain_mel_banks(
        n_mels, n_fft, sample_rate, f_min, f_max))
    mel = jnp.einsum("btf,fm->btm", power, banks,
                     precision=jax.lax.Precision.HIGHEST)
    x_db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    # db_multiplier = log10(max(amin, ref_value=1.0)) = 0
    floor = jnp.max(x_db, axis=(-2, -1), keepdims=True) - top_db
    return jnp.maximum(x_db, floor)


def wespeaker_fbank(waveforms: jnp.ndarray, num_mel_bins: int = 80,
                    sample_rate: int = 16000, frame_length: float = 25.0,
                    frame_shift: float = 10.0,
                    window_type: str = "hamming") -> jnp.ndarray:
    """WeSpeaker front-end: x * 2^15 -> fbank -> per-chunk mean centering.

    Parity: BaseWeSpeakerResNet.compute_fbank (wespeaker/__init__.py:113-159
    with fbank_centering_span=None). Input (batch, channel, samples) — the
    channel axis is squeezed (mono); output (batch, frames, mel).
    """
    x = waveforms[..., 0, :] if waveforms.ndim == 3 else waveforms
    feats = fbank(x * 32768.0, sample_rate=sample_rate,
                  num_mel_bins=num_mel_bins, frame_length=frame_length,
                  frame_shift=frame_shift, window_type=window_type)
    return feats - jnp.mean(feats, axis=-2, keepdims=True)


@functools.lru_cache(maxsize=None)
def _slaney_mel_banks(n_mels: int, n_fft: int, sample_rate: int,
                      f_min: float, f_max: float) -> np.ndarray:
    """(n_fft//2+1, n_mels) librosa-style mel filterbank: Slaney mel
    scale (linear below 1 kHz, log above) with Slaney area
    normalization — what NeMo's FilterbankFeatures builds via
    librosa.filters.mel(norm='slaney', htk=False)."""
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def to_mel(hz):
        hz = np.asarray(hz, dtype=np.float64)
        mel = hz / f_sp
        log_t = hz >= min_log_hz
        mel = np.where(log_t,
                       min_log_mel + np.log(np.maximum(hz, min_log_hz)
                                            / min_log_hz) / logstep,
                       mel)
        return mel

    def to_hz(mel):
        mel = np.asarray(mel, dtype=np.float64)
        hz = f_sp * mel
        log_t = mel >= min_log_mel
        hz = np.where(log_t,
                      min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                      hz)
        return hz

    pts = to_hz(np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2))
    all_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    fdiff = np.diff(pts)
    ramps = pts[:, None] - all_freqs[None, :]       # (n_mels+2, F)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (pts[2:] - pts[:-2])              # Slaney normalization
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)             # (F, n_mels)


def nemo_mel_num_frames(num_samples: int, hop: int = 160) -> int:
    """Centered STFT frame count (torch.stft center=True): 1 + n//hop."""
    return 1 + num_samples // hop


def nemo_mel_spectrogram(waveforms: jnp.ndarray,
                         lengths: Optional[jnp.ndarray] = None,
                         n_mels: int = 80,
                         sample_rate: int = 16000,
                         n_fft: int = 512,
                         win_length: int = 400,
                         hop_length: int = 160,
                         preemph: float = 0.97,
                         log_zero_guard: float = 2.0 ** -24,
                         normalize: str = "per_feature",
                         frame_mask: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """NeMo ``AudioToMelSpectrogramPreprocessor`` (TitaNet front-end).

    Replicates nemo.collections.asr FilterbankFeatures eval-mode
    semantics: pre-emphasis, centered reflect-padded STFT (periodic hann
    window of ``win_length`` zero-padded symmetrically to ``n_fft``,
    torch.stft layout), magnitude^2, Slaney mel filterbank,
    log(mel + 2^-24), then per-feature normalization over the VALID
    frames (unbiased std + 1e-5) with padded frames zeroed. ``lengths``
    are sample counts per batch item (defaults to full length).

    ``frame_mask`` (batch, frames) overrides ``lengths`` for the
    normalization statistics — it may have interior holes (the
    pipeline's speaker-weight masks), where NeMo's own path only ever
    sees prefix lengths because the wrapper compacts speech first.

    Input (batch[, channel], samples) -> (batch, 1 + samples//hop,
    n_mels) — note the (T, F) layout; NeMo emits (F, T).
    """
    x = waveforms[..., 0, :] if waveforms.ndim == 3 else waveforms
    num_samples = x.shape[-1]
    num_frames = nemo_mel_num_frames(num_samples, hop_length)
    if lengths is None:
        valid_frames = jnp.full((x.shape[0],), num_frames, jnp.int32)
    else:
        valid_frames = 1 + lengths.astype(jnp.int32) // hop_length

    # pre-emphasis (before padding, matching NeMo)
    x = jnp.concatenate([x[:, :1], x[:, 1:] - preemph * x[:, :-1]],
                        axis=-1)
    # SYMMETRIC hann of win_length (NeMo FilterbankFeatures constructs
    # torch.hann_window(win_length, periodic=False) — features.py)
    n = np.arange(win_length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win_length - 1))
    power = _centered_stft_power(x, n_fft, win_length, hop_length,
                                 num_frames, hann, pad_mode="reflect")
    banks = jnp.asarray(_slaney_mel_banks(n_mels, n_fft, sample_rate,
                                          0.0, sample_rate / 2.0))
    mel = jnp.einsum("btf,fm->btm", power, banks,
                     precision=jax.lax.Precision.HIGHEST)
    feats = jnp.log(mel + log_zero_guard)               # (B, T, M)

    if frame_mask is not None:
        mask = frame_mask[:, :, None].astype(feats.dtype)
    else:
        frame_ids = jnp.arange(num_frames)[None, :, None]
        mask = (frame_ids < valid_frames[:, None, None]).astype(
            feats.dtype)
    if normalize == "per_feature":
        count = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        mean = (feats * mask).sum(axis=1, keepdims=True) / count
        var = (jnp.square(feats - mean) * mask).sum(
            axis=1, keepdims=True) / jnp.maximum(count - 1.0, 1.0)
        feats = (feats - mean) / (jnp.sqrt(var) + 1e-5)
    elif normalize not in (None, "none"):
        raise ValueError(f"unsupported normalize mode {normalize!r}")
    return feats * mask
