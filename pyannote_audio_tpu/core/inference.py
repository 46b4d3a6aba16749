"""Sliding-window batched inference engine.

TPU-native rebuild of the reference's ``Inference``
(/root/reference/src/pyannote/audio/core/inference.py): chunk -> batch ->
forward -> powerset-to-multilabel -> hamming-weighted overlap-add.

Design (SURVEY.md §7.0/§7.1):
  * Chunk extraction happens *inside* the jitted step: the full waveform goes
    to HBM once, and each batch gathers its chunks with a vmapped
    dynamic-slice — no (num_chunks, window) materialization, no host round
    trips (the reference's ``waveform.unfold`` + per-batch ``.to(device)``
    loop, inference.py:261-305).
  * One executable serves every file: batch shapes are static
    (batch_size × window_samples); the ragged tail is padded and masked.
  * Powerset decode and overlap-add aggregation run on device
    (ops.powerset, ops.aggregate); only the final SlidingWindowFeature
    wrapper is host-side.
"""

from __future__ import annotations

import math
import os
import warnings
from pathlib import Path
from typing import Callable, Optional, Text, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.aggregate import aggregate_scores
from ..ops.powerset import Powerset
from .io import Audio, AudioFile
from .model import Model, Resolution, Specifications
from .segment import (DeviceSlidingWindowFeature, Segment, SlidingWindow,
                      SlidingWindowFeature)



_MULAW_MU = 255.0


_MULAW_LUT: Optional[np.ndarray] = None


def _mulaw_encode(waveform: np.ndarray) -> np.ndarray:
    """G.711-style mu-law companding to uint8 (host side, numpy).

    PCM16-exact f32 input (i/32768) takes a 65536-entry LUT (one int16
    gather instead of log1p over every sample — the encode otherwise
    costs ~0.1 s per 10-min file on the staging thread)."""
    global _MULAW_LUT
    scaled = waveform * np.float32(32768.0)
    # validate range BEFORE the int16 cast: casting NaN/Inf/out-of-range
    # floats emits numpy RuntimeWarnings (and is wasted work); NaN makes
    # the comparisons False so corrupt input falls to the clipping
    # formula below
    in_range = (waveform.dtype == np.float32 and scaled.size
                and bool(scaled.min() >= -32768.0)
                and bool(scaled.max() <= 32767.0))
    if in_range and np.array_equal(
            as_i16 := scaled.astype(np.int16, copy=False), scaled):
        if _MULAW_LUT is None:
            grid = np.arange(-32768, 32768, dtype=np.float32) / 32768.0
            y = np.sign(grid) * np.log1p(_MULAW_MU * np.abs(grid)) \
                / np.log1p(_MULAW_MU)
            _MULAW_LUT = np.round((y + 1.0) * 127.5).astype(np.uint8)
        return _MULAW_LUT[as_i16.astype(np.int32) + 32768]
    x = np.clip(waveform, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MULAW_MU * np.abs(x)) \
        / np.log1p(_MULAW_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def _mulaw_decode(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse companding, on device (uint8 -> f32 in [-1, 1])."""
    y = q.astype(jnp.float32) / jnp.float32(127.5) - 1.0
    return jnp.sign(y) * jnp.expm1(
        jnp.abs(y) * jnp.float32(np.log1p(_MULAW_MU))) \
        / jnp.float32(_MULAW_MU)


# -- 4-bit DPCM transport ---------------------------------------------------
#
# Halves the mu-law bytes again (~0.52 B/sample): per 256-sample block,
# 128 bytes of packed 4-bit delta codes + int16 scale + int16 first
# sample. The scale is tied to the block's max first-difference
# (s = ceil(maxdiff/7)), which makes closed-loop DPCM degenerate to
# independent quantization K[i] = round(x[i]/s) plus delta coding — so
# the host encode is vectorizable (no sequential state; C++ fast path
# native.dpcm4_encode), and the device decode is ONE segmented cumsum
# producing the same int16 buffer the "int16" transport uploads.
# ~32-36 dB SNR on speech (mu-law: ~38 dB). The ACCELERATOR DEFAULT
# since round 4 (DER A/B +0.0001, interleaved TPU A/B 1.645 s vs
# mu-law's 2.433 — docs/PARITY.md); PYANNOTE_TPU_UPLOAD_QUANT selects
# mulaw/int16/f32 instead.

_DPCM4_BLOCK = 256
_DPCM4_ROW = 132          # 128 code bytes + int16 scale + int16 x0


def _dpcm4_encode_numpy(waveform: np.ndarray,
                        padded_len: int) -> np.ndarray:
    """Pure-numpy encoder, bit-identical to native pat_dpcm4_encode.

    ``waveform`` (samples,) f32 -> (padded_len//256, 132) uint8.
    """
    b = _DPCM4_BLOCK
    scaled = np.clip(waveform * np.float32(32768.0), -32768.0, 32767.0)
    i16 = np.round(scaled).astype(np.int32)       # round-half-to-even
    pad = padded_len - i16.shape[0]
    blk = np.pad(i16, (0, pad)).reshape(-1, b)
    maxdiff = np.abs(np.diff(blk, axis=1)).max(axis=1, initial=0)
    s = np.maximum(1, (maxdiff + 6) // 7)
    # K = floor((2x+s)/(2s)) = round-half-up(x/s), exact integer math
    k = (2 * blk + s[:, None]) // (2 * s[:, None])
    c = np.diff(k, axis=1) + 8                    # in [1, 15]
    codes = np.empty(blk.shape, dtype=np.uint8)
    codes[:, 0] = 8
    codes[:, 1:] = c
    packed = codes[:, 0::2] | (codes[:, 1::2] << 4)
    rows = np.empty((blk.shape[0], _DPCM4_ROW), dtype=np.uint8)
    rows[:, :b // 2] = packed
    meta = np.empty((blk.shape[0], 2), dtype=np.int16)
    meta[:, 0] = s.astype(np.int16)
    meta[:, 1] = np.clip(k[:, 0] * s, -32768, 32767).astype(np.int16)
    rows[:, b // 2:] = meta.view(np.uint8)
    return rows


def _dpcm4_device_decode(rows: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(nb, 132) uint8 block stream -> (1, out_len) int16, on device.

    x[i] = x0 + s * cumsum(codes)[i] per block; runs once per file right
    after upload so every downstream stage sees a plain int16 buffer.
    """
    nb = rows.shape[0]
    packed = rows[:, :_DPCM4_BLOCK // 2].astype(jnp.int32)
    lo = (packed & 15) - 8
    hi = (packed >> 4) - 8
    c = jnp.stack([lo, hi], axis=-1).reshape(nb, _DPCM4_BLOCK)
    meta = jax.lax.bitcast_convert_type(
        rows[:, _DPCM4_BLOCK // 2:].reshape(nb, 2, 2), jnp.int16)
    s = meta[:, 0].astype(jnp.int32)
    x0 = meta[:, 1].astype(jnp.int32)
    xhat = x0[:, None] + s[:, None] * jnp.cumsum(c, axis=1)
    xhat = jnp.clip(xhat, -32768, 32767).astype(jnp.int16)
    return xhat.reshape(1, -1)[:, :out_len]


_DPCM4_DECODE = None


def _dpcm4_upload(waveform: np.ndarray, padded_len: int) -> jnp.ndarray:
    """Encode (1, n) f32 -> upload block stream -> decode to int16."""
    global _DPCM4_DECODE
    n = waveform.shape[-1]
    target = padded_len if padded_len is not None and padded_len > n \
        else n
    blocks = -(-target // _DPCM4_BLOCK) * _DPCM4_BLOCK
    mono = np.ascontiguousarray(waveform.reshape(-1))
    rows = None
    try:
        from .. import native
        rows = native.dpcm4_encode(mono, blocks)
    except Exception:
        rows = None
    if rows is None:
        rows = _dpcm4_encode_numpy(mono, blocks)
    if _DPCM4_DECODE is None:
        _DPCM4_DECODE = jax.jit(_dpcm4_device_decode,
                                static_argnums=(1,))
    # one tiny program per (nb, target) signature — the same 30 s
    # length buckets the chunk-gather/forward executables already
    # specialize on, so a new bucket's decode compile rides the same
    # first-file compile event rather than adding a new one
    return _DPCM4_DECODE(jnp.asarray(rows), target)


_WARNED_QUANT_MODES: set = set()


def _upload_quant_mode() -> str:
    """Resolve the waveform transport: "mulaw"|"int16"|"f32"|"dpcm4".

    PYANNOTE_TPU_UPLOAD_QUANT wins when set ("mulaw", "int16", "f32",
    "dpcm4" — the 4-bit block codec, half the mu-law bytes at ~32 dB
    SNR, DER delta +0.0001 on the A/B corpus; ""/"none" mean "int16",
    the bit-exact default; anything else warns once and falls back to
    "int16"). The legacy PYANNOTE_TPU_INT16_UPLOAD=0
    gate maps to "f32". Unset: "dpcm4" on accelerator backends — the TPU
    sits behind a host->device link whose transfers do not overlap
    compute, so upload bytes are a hard serial per-file cost; the 4-bit
    block codec won the round-4 interleaved A/B (best pass 1.645 s vs
    mu-law 2.433 on the identical 3x10-min batch) with the smallest DER
    delta of any lossy transport (+0.0001 — docs/PARITY.md); "int16" on
    CPU (bit-exact for PCM16 sources, f32 otherwise).
    """
    mode = os.environ.get("PYANNOTE_TPU_UPLOAD_QUANT")
    if mode is not None:
        mode = mode.strip().lower()
        if mode in ("", "none"):
            return "int16"
        if mode in ("mulaw", "int16", "f32", "dpcm4"):
            return mode
        if mode not in _WARNED_QUANT_MODES:
            _WARNED_QUANT_MODES.add(mode)
            warnings.warn(
                f"PYANNOTE_TPU_UPLOAD_QUANT={mode!r} is not one of "
                "'mulaw' | 'int16' | 'f32' | 'dpcm4'; using bit-exact "
                "'int16' transport")
        return "int16"
    if os.environ.get("PYANNOTE_TPU_INT16_UPLOAD", "1") != "1":
        return "f32"
    try:
        import jax
        if jax.default_backend() == "cpu":
            return "int16"
    except Exception:
        return "int16"
    # the dpcm4 DEFAULT requires the native encoder: the numpy twin is
    # 3-10x slower at 60-min scale, which would silently turn the
    # transport win into a staging-thread loss. Explicit =dpcm4 still
    # honors the request with the numpy fallback.
    if _native_dpcm4_available():
        return "dpcm4"
    if "dpcm4-native" not in _WARNED_QUANT_MODES:
        _WARNED_QUANT_MODES.add("dpcm4-native")
        warnings.warn(
            "native dpcm4 encoder unavailable (rebuild "
            "native/build.sh); using 8-bit mu-law transport instead")
    return "mulaw"


_NATIVE_DPCM4: Optional[bool] = None


def _native_dpcm4_available() -> bool:
    global _NATIVE_DPCM4
    if _NATIVE_DPCM4 is None:
        try:
            from .. import native
            _NATIVE_DPCM4 = native.dpcm4_encode(
                np.zeros(256, np.float32), 256) is not None
        except Exception:
            _NATIVE_DPCM4 = False
    return _NATIVE_DPCM4


def _upload_waveform(waveform: np.ndarray,
                     quant: Optional[str] = None,
                     padded_len: Optional[int] = None) -> jnp.ndarray:
    """Host->device waveform transfer, quantized to cut link bytes.

    The axon relay moves ~40-100 MB/s and transfers do NOT overlap device
    compute (benchmarks/overlap_probe.py), so upload bytes are a hard
    per-file cost. Default on accelerators: 4-bit block DPCM (an eighth
    of the f32 bytes, ~32-36 dB SNR; DER delta +0.0001 on the A/B
    corpus); "mulaw" is the 8-bit companded fallback. "int16" is
    bit-exact for PCM16-decoded waveforms (exactly i/32768; anything
    else falls back to f32); "f32" ships raw floats. ``quant`` overrides
    the env-resolved mode — pipelines whose *product is the audio
    itself* (speech separation) pass "int16" so transport can never cap
    output fidelity.

    ``padded_len`` zero-pads the time axis AFTER encoding (encode-then-
    pad): the silence padding of the 30 s length bucket is appended as
    1-byte codes instead of being copied and scanned as f32 — the
    pad/copy/encode work tracks the true file length, not the bucket.
    """
    mode = quant if quant is not None else _upload_quant_mode()
    n = waveform.shape[-1]
    pad = (padded_len - n) if padded_len is not None and padded_len > n \
        else 0

    def padded(arr, fill):
        if pad == 0:
            return arr
        return np.pad(arr, ((0, 0), (0, pad)), constant_values=fill)

    if mode == "dpcm4" and waveform.dtype == np.float32 \
            and waveform.ndim == 2 and waveform.shape[0] == 1:
        return _dpcm4_upload(waveform, padded_len)
    if mode == "dpcm4":
        mode = "mulaw"       # shapes the mono block codec doesn't cover
    if mode == "mulaw" and waveform.dtype == np.float32:
        # mu-law code for digital silence is 128 ((0+1)*127.5 rounded
        # half-to-even), the exact value the LUT/formula give for 0.0
        return jnp.asarray(padded(_mulaw_encode(waveform), 128))
    if mode != "f32" and waveform.dtype == np.float32:
        scaled = waveform * np.float32(32768.0)
        if scaled.size and np.all(scaled == np.rint(scaled)) and \
                scaled.min() >= -32768.0 and scaled.max() <= 32767.0:
            return jnp.asarray(padded(scaled.astype(np.int16), 0))
    return jnp.asarray(padded(waveform, 0))


def _dequantize(chunks: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the upload fast paths (static branch per jit
    signature): int16 -> /32768 (bit-exact), uint8 -> mu-law expand."""
    if chunks.dtype == jnp.int16:
        return chunks.astype(jnp.float32) / 32768.0
    if chunks.dtype == jnp.uint8:
        return _mulaw_decode(chunks)
    return chunks


def _to_pcm16_scale(x: jnp.ndarray) -> jnp.ndarray:
    """Device waveform -> kaldi fbank convention (int16-scale f32)."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32)
    if x.dtype == jnp.uint8:
        return _mulaw_decode(x) * 32768.0
    return x * 32768.0



def _tail_pad_to(batch_size: int, n_real: int, mesh=None) -> int:
    """Padded size for a batch of ``n_real`` items: a <= B/2 tail pads to
    B/2 instead of B — ONE extra jit specialization per stage that halves
    wasted tail compute (e.g. a 591-chunk file runs 256+256+128 instead
    of 3x256). Guards: the half batch must still divide a mesh's data
    axis, and PYANNOTE_TPU_TAIL_HALF_BATCH=0 restores single-shape
    batching (e.g. to cap remote-compile count). Shared by the
    segmentation and embedding batch loops so their gates never
    desynchronize from the shape-following mask slices."""
    half = batch_size // 2
    half_ok = half >= 1 and (mesh is None or half % mesh.size == 0) \
        and os.environ.get("PYANNOTE_TPU_TAIL_HALF_BATCH", "1") == "1"
    return half if (n_real <= half and half_ok) else batch_size


def _is_oom_error(exception: BaseException) -> bool:
    """XLA out-of-HBM detection (parity role: reference
    inference.py:201-206 / lightning's is_oom_error). XLA surfaces OOM as
    RESOURCE_EXHAUSTED XlaRuntimeError with an 'Out of memory' or
    'Attempting to allocate' message."""
    text = f"{type(exception).__name__}: {exception}"
    return "RESOURCE_EXHAUSTED" in text or "Out of memory" in text \
        or "out of memory" in text or "Attempting to allocate" in text


def _chunk_grid(num_samples: int, window_size: int, step_size: int,
                sample_rate: int):
    """Sliding-window chunk starts + padded waveform length.

    The padded length is rounded up to a 30 s bucket so the in-jit gather
    executable is reused across file lengths (parity role: reference
    inference.py:273-278 computes the same grid chunk by chunk).
    """
    if num_samples >= window_size:
        num_full = 1 + (num_samples - window_size) // step_size
    else:
        num_full = 0
    has_last = (num_samples < window_size) or \
        ((num_samples - window_size) % step_size > 0)
    starts = [i * step_size for i in range(num_full)]
    if has_last:
        starts.append(num_full * step_size)
    # int64: sample starts exceed int32 beyond ~37 h at 16 kHz; device
    # gathers stay int32 — the long-file slice path translates starts to
    # slice-local offsets first, and whole-file dispatch casts through
    # _starts_i32's overflow guard
    starts = np.asarray(starts, dtype=np.int64)
    needed = int(starts[-1]) + window_size
    bucket = 30 * sample_rate
    padded_len = max(needed, -(-needed // bucket) * bucket)
    return starts, padded_len


def _starts_i32(starts: np.ndarray, window_size: int) -> np.ndarray:
    """Cast global chunk starts for the int32 device gathers, refusing
    files whose samples exceed int32 on the WHOLE-FILE path (> ~37 h at
    16 kHz). Such files must go through the long-file slice plan
    (core/longfile.py), whose slice-local starts always fit — auto mode
    slices them far earlier on HBM grounds, so this only fires when
    slicing was explicitly disabled."""
    if len(starts) and int(starts[-1]) + window_size > \
            np.iinfo(np.int32).max:
        raise ValueError(
            "file too long for whole-file int32 sample gathers; the "
            "bounded-HBM slice path is required (do not force "
            "PYANNOTE_TPU_SEGMENT_MINUTES=0 for files beyond ~37 hours)")
    return starts.astype(np.int32)


def _waveform_fingerprint(waveform: np.ndarray) -> tuple:
    """Content key for device-buffer caches: shape + dtype + a full
    float64 checksum (one pass, ~5 ms per audio-hour — unlike a sparse
    4-point probe it cannot miss a mutated waveform in a reused file
    dict) plus a strided abs-sum to catch sign-flip mutations and the
    two endpoint samples. ONE recipe shared by _upload_waveform_cached
    and core/longfile.slice_uploads so the two caches can never diverge
    on what counts as "the same audio"."""
    n = waveform.shape[-1]
    stride = max(1, n // 4096)
    probe = (float(waveform.sum(dtype=np.float64)),
             float(np.abs(waveform[0, ::stride]).sum(dtype=np.float64)),
             float(waveform[0, 0]), float(waveform[0, n - 1]))
    return (waveform.shape, str(waveform.dtype), probe)


def _upload_waveform_cached(waveform: np.ndarray, cache,
                            quant: Optional[str] = None,
                            padded_len: Optional[int] = None
                            ) -> jnp.ndarray:
    """Per-file device-buffer reuse across pipeline stages.

    The diarization pipeline uploads the same (padded) waveform twice —
    once for segmentation, once for embeddings (~0.5 s per 10-min file
    each over the relay). Stages share one upload by caching the device
    buffer in the file dict, keyed by shape + a full float64 checksum
    (one pass, ~5 ms per audio-hour — small next to the int16
    representability scan — and unlike the old 4-point probe it cannot
    miss a mutated waveform in a reused file dict) plus a strided
    abs-sum to catch sign-flip mutations.
    """
    mode = quant if quant is not None else _upload_quant_mode()
    if cache is None:
        return _upload_waveform(waveform, quant=mode,
                                padded_len=padded_len)
    key = _waveform_fingerprint(waveform) + (mode, padded_len)
    hit = cache.get("_device_waveform")
    if hit is not None and hit[0] == key:
        return hit[1]
    buf = _upload_waveform(waveform, quant=mode, padded_len=padded_len)
    try:
        cache["_device_waveform"] = (key, buf)
    except TypeError:
        pass                      # immutable mapping: skip caching
    return buf


def jit_sharded(mesh, fn, in_specs: str, out_specs):
    """jit ``fn`` with mesh shardings when ``mesh`` is not None.

    Spec letters, one per argument: "r" replicated, "s" sharded on the
    chunk/data axis; ``out_specs`` may be a tuple for multi-output
    functions. Single source of truth for the mesh-vs-single-device
    branching shared by Inference's per-chunk and shared-frontend paths
    and the diarization pipeline's embedding hot paths.
    """
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    named = {"r": NamedSharding(mesh, P()),
             "s": NamedSharding(mesh, P("data"))}
    out = tuple(named[s] for s in out_specs) \
        if isinstance(out_specs, tuple) else named[out_specs]
    return jax.jit(fn,
                   in_shardings=tuple(named[s] for s in in_specs),
                   out_shardings=out)


class BaseInference:
    """Common base of inference engines (parity: reference
    core/inference.py:42-43; PretrainedSpeakerEmbedding backends also
    derive from it)."""


class Inference(BaseInference):
    """Run a model over a file with a sliding (or whole-file) window.

    Parameters mirror the reference (inference.py:78-181).
    """

    def __init__(
        self,
        model: Union[Model, Text, Path],
        window: Text = "sliding",
        duration: Optional[float] = None,
        step: Optional[float] = None,
        pre_aggregation_hook: Optional[Callable] = None,
        skip_aggregation: bool = False,
        skip_conversion: bool = False,
        batch_size: int = 32,
        mesh=None,
    ):
        if window not in ("sliding", "whole"):
            raise ValueError('`window` must be "sliding" or "whole".')
        self.model = model if isinstance(model, Model) \
            else Model.from_pretrained(model)
        specs = self.model.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]

        if window == "whole" and spec.resolution == Resolution.FRAME:
            warnings.warn(
                'Using "whole" window on a frame-resolution model.')
        self.window = window
        self.skip_aggregation = skip_aggregation
        self.skip_conversion = skip_conversion
        self.pre_aggregation_hook = pre_aggregation_hook
        # multi-chip: shard the chunk/batch axis over the mesh's 'data'
        # axis — chunks are embarrassingly parallel (SURVEY.md §5); XLA
        # runs each shard on its own chip with no collectives until the
        # host gathers scores
        self.mesh = mesh
        if mesh is not None and batch_size % mesh.devices.size != 0:
            batch_size = -(-batch_size // mesh.devices.size) * \
                mesh.devices.size
        self.batch_size = batch_size

        training_duration = spec.duration
        duration = duration or training_duration
        if training_duration and training_duration != duration:
            warnings.warn(
                f"Duration ({duration:g}s) != training duration "
                f"({training_duration:g}s); this may hurt performance.")
        self.duration = duration

        # default step: left warm-up (seconds), else 10% of duration
        # (reference inference.py:154-157)
        self.warm_up = spec.warm_up or (0.0, 0.0)
        if step is None:
            step = 0.1 * duration if self.warm_up[0] == 0.0 \
                else self.warm_up[0]
        if step > self.duration:
            raise ValueError("step must not be larger than duration")
        self.step = step

        self.audio = Audio(sample_rate=self.model.sample_rate,
                           mono="downmix")

        # powerset -> multilabel converter(s): one per Specifications
        # like the reference (inference.py:130-141) — multi-task tuples
        # get a tuple of per-output converters (None for non-powerset)
        self._powerset = None
        if isinstance(specs, Specifications):
            if spec.powerset:
                self._powerset = Powerset(len(spec.classes),
                                          spec.powerset_max_classes)
        else:
            per_spec = tuple(
                Powerset(len(s.classes), s.powerset_max_classes)
                if s.powerset else None for s in specs)
            if any(p is not None for p in per_spec):
                self._powerset = per_spec

        self._jitted_batch = None
        self._jitted_shared = None      # (precompute_fn, batch_fn)

    def _convert_powerset(self, out):
        """Apply the per-output powerset->multilabel conversion."""
        if self._powerset is None or self.skip_conversion:
            return out
        if isinstance(self._powerset, tuple):
            return tuple(p.to_multilabel(o) if p is not None else o
                         for p, o in zip(self._powerset, out))
        return self._powerset.to_multilabel(out)

    def to(self, device) -> "Inference":
        """Send the internal model to ``device`` (parity:
        Inference.to, reference core/inference.py:169-180; placement is
        XLA's job here, so this records the device and returns self)."""
        self.model.to(device)
        self.device = device
        return self

    # -- device compute ----------------------------------------------------

    def _shared_frontend(self, window_size: int, step_size: int) -> bool:
        """Use the shared whole-file front-end conv for this grid?

        Models advertising ``FRONTEND_SHARED`` (PyanNet) compute their
        first conv once per file; chunks gather aligned frames instead
        of re-convolving 90%-overlapping windows (~10x less MXU work on
        the front-end). Requires every chunk start to land on the conv
        stride; accelerator default, PYANNOTE_TPU_SHARED_SINC=0 reverts
        to per-chunk forwards.
        """
        module = self.model.module
        if not getattr(module, "FRONTEND_SHARED", False):
            return False
        from ..utils.runtime import device_flag
        if not device_flag("PYANNOTE_TPU_SHARED_SINC"):
            return False
        return step_size % module.frontend_stride == 0

    def _jit_sharded(self, fn, in_specs: str, out_specs):
        return jit_sharded(self.mesh, fn, in_specs, out_specs)

    def _make_shared_batch_fn(self, window_samples: int):
        """Shared-frontend variants of (precompute, gather+forward).

        ``precompute`` runs the raw whole-file sinc conv (one executable
        per padded-length bucket — same cost model as the embedding
        stage's whole-file fbank); ``batch_fn`` gathers each chunk's
        conv frames plus its raw-waveform instance-norm statistics and
        finishes the model from there (SincNet.from_conv fold).
        """
        module = self.model.module
        convert = self._convert_powerset
        stride = module.frontend_stride
        num_conv_frames = module.frontend_num_frames(window_samples)

        def precompute(params, waveform):
            return module.apply(params, _dequantize(waveform),
                                method="precompute_frontend")

        def gather(waveform, conv_whole, starts):
            def get(start):
                frames = jax.lax.dynamic_slice(
                    conv_whole, (0, start // stride, 0),
                    (1, num_conv_frames, conv_whole.shape[-1]))[0]
                raw = _dequantize(jax.lax.dynamic_slice(
                    waveform, (0, start),
                    (waveform.shape[0], window_samples)))
                return frames, jnp.mean(raw[0]), jnp.var(raw[0])
            return jax.vmap(get)(starts)

        def forward(params, frames, mean, var):
            out = module.apply(params, frames, mean, var,
                               method="forward_from_frontend")
            return convert(out)

        precompute_fn = self._jit_sharded(precompute, "rr", "r")
        gather_fn = self._jit_sharded(gather, "rrs", ("s", "s", "s"))
        forward_fn = self._jit_sharded(forward, "rsss", "s")

        def batch_fn(params, waveform, conv_whole, starts):
            return forward_fn(params,
                              *gather_fn(waveform, conv_whole, starts))

        return precompute_fn, batch_fn

    def _make_batch_fn(self, window_samples: int):
        """Two compiled pieces: per-length chunk gather (cheap compile) and
        a fixed-shape forward (expensive compile, done exactly once).

        Keeping the waveform out of the forward's signature means new file
        lengths never re-trigger the big model compile — only a trivial
        vmapped dynamic-slice recompiles.
        """
        module = self.model.module
        convert = self._convert_powerset

        def gather(waveform, starts):
            def get_chunk(start):
                return jax.lax.dynamic_slice(
                    waveform, (0, start),
                    (waveform.shape[0], window_samples))
            return _dequantize(jax.vmap(get_chunk)(starts))  # (B, ch, win)

        def forward(params, chunks):
            return convert(module.apply(params, chunks))

        gather_fn = self._jit_sharded(gather, "rs", "s")
        forward_fn = self._jit_sharded(forward, "rs", "s")

        def batch_fn(params, waveform, starts):
            return forward_fn(params, gather_fn(waveform, starts))

        return batch_fn

    def infer(self, chunks: jnp.ndarray) -> np.ndarray:
        """Forward an explicit (batch, channel, samples) array."""
        out = self._convert_powerset(self.model(chunks))
        if isinstance(out, tuple):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    # -- sliding-window engine ---------------------------------------------

    def _slide_scores(self, device_waveform, starts: np.ndarray,
                      window_size: int, shared: bool,
                      hook: Optional[Callable] = None,
                      hook_base: int = 0, hook_total: int = 0):
        """Batched forwards over explicit chunk ``starts`` gathered from
        one uploaded (slice of a) waveform; returns the device score tree.

        Extracted from ``slide`` so the bounded-HBM long-file path
        (core/longfile.py) can run the same executables per slice with
        translated starts — the gathers never require ``starts`` to
        enumerate the full grid of the uploaded buffer.
        """
        if shared:
            if self._jitted_shared is None:
                self._jitted_shared = self._make_shared_batch_fn(
                    window_size)
            precompute_fn, shared_batch_fn = self._jitted_shared
            try:
                conv_whole = precompute_fn(self.model.params,
                                           device_waveform)
            except Exception as exception:
                if _is_oom_error(exception):
                    raise MemoryError(
                        "the whole-file front-end conv buffer does not "
                        "fit in device memory for this file length; set "
                        "PYANNOTE_TPU_SHARED_SINC=0 to fall back to "
                        "per-chunk forwards.") from exception
                raise
        elif self._jitted_batch is None:
            self._jitted_batch = self._make_batch_fn(window_size)

        # batched forward with a fixed batch shape (single executable)
        B = self.batch_size
        num_chunks = len(starts)
        num_batches = math.ceil(num_chunks / B)
        outputs = []
        for b in range(num_batches):
            batch_starts = starts[b * B:(b + 1) * B]
            n_real = len(batch_starts)
            pad_to = _tail_pad_to(B, n_real, self.mesh)
            if n_real < pad_to:
                batch_starts = np.pad(batch_starts, (0, pad_to - n_real))
            try:
                if shared:
                    out = shared_batch_fn(self.model.params,
                                          device_waveform, conv_whole,
                                          jnp.asarray(batch_starts))
                else:
                    out = self._jitted_batch(self.model.params,
                                             device_waveform,
                                             jnp.asarray(batch_starts))
            except Exception as exception:
                if _is_oom_error(exception):
                    message = (
                        f"batch_size ({self.batch_size: d}) is probably "
                        f"too large. Try with a smaller value until "
                        f"memory error disappears.")
                    if shared:
                        message += (
                            " The shared front-end also holds a "
                            "whole-file conv buffer that batch_size "
                            "cannot shrink; PYANNOTE_TPU_SHARED_SINC=0 "
                            "reverts to per-chunk forwards.")
                    raise MemoryError(message) from exception
                raise
            outputs.append(jax.tree_util.tree_map(
                lambda o: o[:n_real], out))
            if hook is not None:
                hook(completed=hook_base + min((b + 1) * B, num_chunks),
                     total=hook_total or num_chunks)
        if len(outputs) > 1:
            return jax.tree_util.tree_map(
                lambda *parts: jnp.concatenate(parts, axis=0), *outputs)
        return outputs[0]

    def slide(self, waveform: np.ndarray, sample_rate: int,
              hook: Optional[Callable] = None,
              cache=None) -> SlidingWindowFeature:
        """Slide the model over a (channel, time) waveform.

        Parity: Inference.slide (reference inference.py:217-374). Files
        whose whole-file device buffers would exceed the HBM budget are
        processed in bounded halo'd slices (core/longfile.py) — per-chunk
        outputs are identical because every chunk's samples and shared
        front-end frames are fully contained in its slice.
        """
        window_size = round(self.duration * sample_rate)
        step_size = round(self.step * sample_rate)
        _, num_samples = waveform.shape

        specs = self.model.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        frame_resolution = spec.resolution == Resolution.FRAME
        if frame_resolution:
            frames = self.model.receptive_field
            num_frames_per_chunk = self.model.num_frames(window_size)
        else:
            frames = None
            num_frames_per_chunk = None

        # chunk start positions (last chunk zero-padded, inference.py:273-278)
        starts, padded_len = _chunk_grid(num_samples, window_size,
                                         step_size, sample_rate)
        num_chunks = len(starts)
        shared = waveform.shape[0] == 1 and \
            self._shared_frontend(window_size, step_size)

        from .longfile import plan_slices, slice_uploads
        plan = plan_slices(num_samples, window_size, step_size,
                           sample_rate, starts)
        if plan is not None and len(plan) > 1:
            get_upload, release_upload = slice_uploads(
                cache, waveform, plan, sample_rate, starts, window_size)
            # keep slice buffers cached only when a later device stage
            # (the diarization embedding path, which releases per group)
            # will reuse them; host-aggregating models (VAD, multilabel)
            # have no later stage, so retention would grow HBM with file
            # length — exactly what this mode exists to bound
            keep_for_later = frame_resolution and (
                self.skip_aggregation
                or (isinstance(specs, Specifications)
                    and spec.permutation_invariant
                    and self.pre_aggregation_hook is None))
            # ... and even then only while the retained total (decoded
            # int16, ~2 B/sample across all slices) stays a small share
            # of the HBM budget: beyond that the embedding stage
            # re-uploads per slice (O(slice) memory, 2x upload bytes)
            # instead of re-growing HBM with file length
            from .longfile import retained_upload_bytes_ok
            keep_for_later = keep_for_later and \
                retained_upload_bytes_ok(num_samples)
            parts = []
            for k, sl in enumerate(plan):
                device_slice, _ = get_upload(k)
                starts_rel = (starts[sl.i0:sl.i1]
                              - sl.a).astype(np.int32)
                parts.append(self._slide_scores(
                    device_slice, starts_rel, window_size, shared,
                    hook=hook, hook_base=sl.i0, hook_total=num_chunks))
                if not keep_for_later:
                    # async dispatches hold the buffer until executed
                    release_upload(k)
            scores = jax.tree_util.tree_map(
                lambda *p: jnp.concatenate(p, axis=0), *parts)
        else:
            device_waveform = _upload_waveform_cached(
                waveform, cache, padded_len=padded_len)
            scores = self._slide_scores(
                device_waveform, _starts_i32(starts, window_size),
                window_size, shared, hook=hook, hook_total=num_chunks)

        chunk_window = SlidingWindow(start=0.0, duration=self.duration,
                                     step=self.step)

        # multi-task models (e.g. ToTaToNet) return one output per
        # Specifications; wrap each as chunk-level scores (parity:
        # map_with_specifications, reference inference.py:328-369 — all
        # in-tree multi-task specs are permutation-invariant, so
        # aggregation is skipped for them)
        if isinstance(scores, tuple):
            return tuple(
                SlidingWindowFeature(np.asarray(s), chunk_window)
                for s in scores)

        if not frame_resolution:
            return SlidingWindowFeature(np.asarray(scores), chunk_window)

        if self.skip_aggregation or (spec.permutation_invariant
                                     and self.pre_aggregation_hook is None):
            # diarization hot path: scores stay in HBM so counting,
            # embedding masks and reconstruction run on device
            # (ops/diarize_fused.py); host access stays lazy. A
            # pre_aggregation_hook (VAD's max-over-speakers) makes the
            # output order-free, so aggregation applies like the
            # reference's gate (inference.py:336-343)
            return DeviceSlidingWindowFeature(scores, chunk_window)

        if self.pre_aggregation_hook is not None:
            scores = jnp.asarray(
                self.pre_aggregation_hook(np.asarray(scores)))

        # per-chunk output-frame offsets (closest_frame rounding — data, not
        # structure; computed host-side, tiny)
        chunk_starts_t = starts.astype(np.float64) / sample_rate
        offsets = np.array([frames.closest_frame(t + 0.5 * frames.duration)
                            for t in chunk_starts_t], dtype=np.int32)
        file_duration = num_samples / sample_rate
        num_output_frames = int(
            math.floor(file_duration / frames.step))
        total_frames = max(num_output_frames,
                           int(offsets[-1]) + num_frames_per_chunk)

        aggregated = aggregate_scores(
            scores,
            jnp.asarray(offsets),
            total_frames,
            hamming=True,
            # Specifications.warm_up is in seconds; ops expects a ratio
            warm_up=(self.warm_up[0] / self.duration,
                     self.warm_up[1] / self.duration),
            missing=0.0,
        )
        # trim frames beyond the true end of file (last-chunk padding)
        data = np.asarray(aggregated)[:num_output_frames]
        return SlidingWindowFeature(data, frames)

    # -- public API --------------------------------------------------------

    def preload(self, file: AudioFile) -> None:
        """Start the device upload of a file's (padded) waveform early.

        Called from the streaming batch-apply decode worker so the
        host->device transfer of file N+1 overlaps device compute of
        file N. Pads exactly like ``slide`` so the cached buffer key
        matches and ``slide`` skips its own upload. No-op for whole-window
        inference or immutable file objects.
        """
        if self.window != "sliding":
            return
        from collections.abc import MutableMapping
        if not isinstance(file, MutableMapping):
            return
        waveform, sample_rate = self.audio(file)
        window_size = round(self.duration * sample_rate)
        step_size = round(self.step * sample_rate)
        starts, padded_len = _chunk_grid(waveform.shape[-1], window_size,
                                         step_size, sample_rate)
        from .longfile import plan_slices, slice_uploads
        plan = plan_slices(waveform.shape[-1], window_size, step_size,
                           sample_rate, starts)
        if plan is not None and len(plan) > 1:
            # bounded-HBM long file: warm only the first slice's upload
            # (a whole-file buffer is exactly what the plan avoids)
            get_upload, _ = slice_uploads(file, waveform, plan,
                                          sample_rate, starts,
                                          window_size)
            get_upload(0)
            return
        _upload_waveform_cached(waveform, file, padded_len=padded_len)

    def __call__(self, file: AudioFile, hook: Optional[Callable] = None):
        """Run inference on a whole file (reference inference.py:375-415)."""
        waveform, sample_rate = self.audio(file)
        if self.window == "sliding":
            from collections.abc import MutableMapping
            cache = file if isinstance(file, MutableMapping) else None
            return self.slide(waveform, sample_rate, hook=hook,
                              cache=cache)
        outputs = self.infer(waveform[None])
        return outputs[0]

    def crop(
        self,
        file: AudioFile,
        chunk: Union[Segment, list],
        duration: Optional[float] = None,
        hook: Optional[Callable] = None,
    ):
        """Inference on a crop of the file (reference inference.py:417-496)."""
        if self.window == "sliding":
            if not isinstance(chunk, Segment):
                start = min(c.start for c in chunk)
                end = max(c.end for c in chunk)
                chunk = Segment(start=start, end=end)
            waveform, sample_rate = self.audio.crop(file, chunk,
                                                    duration=duration,
                                                    mode="pad")
            output = self.slide(waveform, sample_rate, hook=hook)
            if isinstance(output, SlidingWindowFeature):
                shifted = SlidingWindow(
                    start=output.sliding_window.start + chunk.start,
                    duration=output.sliding_window.duration,
                    step=output.sliding_window.step)
                output = SlidingWindowFeature(output.data, shifted)
            return output
        if isinstance(chunk, Segment):
            waveform, sample_rate = self.audio.crop(file, chunk,
                                                    duration=duration,
                                                    mode="pad")
            return self.infer(waveform[None])[0]
        waveforms = [self.audio.crop(file, c, duration=duration,
                                     mode="pad")[0] for c in chunk]
        return self.infer(np.stack(waveforms))

    # -- static helpers (parity: reference classmethods) -------------------

    @staticmethod
    def aggregate(
        scores: SlidingWindowFeature,
        frames: SlidingWindow,
        warm_up: Tuple[float, float] = (0.0, 0.0),
        epsilon: float = 1e-12,
        hamming: bool = False,
        missing: float = np.nan,
        skip_average: bool = False,
    ) -> SlidingWindowFeature:
        """Aggregate chunk-wise scores into frame-wise scores.

        Parity: Inference.aggregate (inference.py:498-620). Host entry point
        taking a (num_chunks, frames_per_chunk, C) SlidingWindowFeature.
        """
        data = np.asarray(scores.data, dtype=np.float32)
        num_chunks, frames_per_chunk, C = data.shape
        chunk_window = scores.sliding_window
        # output frame grid is rebased to the chunks' start
        # (reference inference.py:532-537)
        window = SlidingWindow(start=chunk_window.start,
                               duration=frames.duration, step=frames.step)
        offsets = np.array(
            [window.closest_frame(chunk_window[i].start
                                  + 0.5 * frames.duration)
             for i in range(num_chunks)], dtype=np.int32)
        num_output_frames = window.closest_frame(
            chunk_window.start + chunk_window.duration
            + (num_chunks - 1) * chunk_window.step
            + 0.5 * frames.duration) + 1
        # aggregate()'s warm_up is in seconds (reference inference.py:551-558)
        warm_up_ratio = (warm_up[0] / chunk_window.duration,
                         warm_up[1] / chunk_window.duration)
        out = aggregate_scores(
            jnp.asarray(data), jnp.asarray(offsets), num_output_frames,
            hamming=hamming, warm_up=warm_up_ratio, missing=missing,
            skip_average=skip_average)
        return SlidingWindowFeature(np.asarray(out), window)

    @staticmethod
    def trim(
        scores: SlidingWindowFeature,
        warm_up: Tuple[float, float] = (0.1, 0.1),
    ) -> SlidingWindowFeature:
        """Trim warm-up regions from chunk-wise scores.

        Parity: Inference.trim (inference.py:622-666).
        """
        chunk_window = scores.sliding_window
        num_chunks, num_frames, _ = scores.data.shape
        left = int(round(warm_up[0] * num_frames))
        right = int(round(warm_up[1] * num_frames))
        new_data = scores.data[:, left:num_frames - right]
        frame_duration = chunk_window.duration / num_frames
        new_window = SlidingWindow(
            start=chunk_window.start + left * frame_duration,
            duration=chunk_window.duration
            - (left + right) * frame_duration,
            step=chunk_window.step)
        return SlidingWindowFeature(new_data, new_window)
