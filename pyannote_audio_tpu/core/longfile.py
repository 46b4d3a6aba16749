"""Bounded-HBM processing of arbitrarily long files.

The fast diarization path materializes whole-file device buffers (shared
sinc features ~1.8 GB per audio-hour, whole-file fbank, ResNet trunk
panels — ~2.9 GB resident per audio-hour all in,
utils/flops.diarization_resident_hbm_bytes), so a multi-hour file would
exhaust a 16 GB chip. The reference never hits this because it keeps
activation memory O(chunk) via ``waveform.unfold`` + a batch loop
(reference core/inference.py:261-305) — at the price of recomputing
every front-end frame up to 10x.

This module restores the "any duration, bounded memory" capability
WITHOUT giving up the shared front-ends: long files are processed in
fixed-length slices with receptive-field halos. All front-ends involved
are convolutions (sinc conv, fbank framing, ResNet trunk) plus one
sliding-window CMN, so a slice that extends ``halo`` seconds of REAL
audio past its segment produces bit-identical frames for every chunk it
owns — only the per-chunk outputs (scores, embeddings) accumulate across
slices, and those are ~60 MB per audio-hour instead of ~2.9 GB.

Alignment: slice starts are floored to ALIGN = 12800 samples (0.8 s),
which is divisible by the sinc front-end stride (10), the fbank frame
shift (160) and ``frame_shift x trunk_stride`` for every stride that
divides 80 — so slice-local feature grids coincide with the whole-file
grids and gather indices translate by a constant.

Knobs
-----
PYANNOTE_TPU_SEGMENT_MINUTES
    "" / unset: auto — slice when the analytic resident-buffer model
    exceeds the budget. "0": never slice (whole-file buffers for any
    duration, round-4 behavior). Any other float: force that slice
    length for files longer than it.
PYANNOTE_TPU_HBM_BUDGET_GB
    Resident-buffer budget driving auto mode (default 6.0 of the 16 GB
    v5e: whole-file buffers for <= ~2 h files, slices beyond).
PYANNOTE_TPU_SEGMENT_HALO_SECONDS
    Halo of real audio on each side of a slice (default 20 s: covers the
    5 s CMN half-window + the trunk receptive field + the fbank window
    with margin).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

#: divisible by the sinc stride (10), the fbank frame shift (160) and
#: 160 x trunk_stride for every trunk stride dividing 80 — slice feature
#: grids therefore sit ON the whole-file grids
ALIGN = 12800


@dataclass(frozen=True)
class Slice:
    """One bounded piece of a long file.

    ``a:b`` are sample bounds of the (halo'd) slice into the file's
    waveform; chunks ``i0:i1`` of the GLOBAL chunk grid are owned by and
    fully contained in this slice (their starts translate by ``-a``).
    """
    a: int
    b: int
    i0: int
    i1: int


def _env_float(name: str, default: float) -> float:
    value = os.environ.get(name, "")
    try:
        return float(value) if value != "" else default
    except ValueError:
        return default


def halo_samples(sample_rate: int) -> int:
    """Per-side halo, CEILED to ALIGN: a user asking for exactly the
    CMN/receptive-field margin (e.g. 5.0 s) must never get less."""
    halo = int(_env_float("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", 20.0)
               * sample_rate)
    return max(ALIGN, -(-halo // ALIGN) * ALIGN)


def segment_minutes(file_seconds: float, sample_rate: int = 16000
                    ) -> Optional[float]:
    """Slice length for a file of this duration, or None for whole-file.

    Auto mode sizes slices so the analytic resident-buffer model of one
    slice (plus halos) fits the budget; explicit
    PYANNOTE_TPU_SEGMENT_MINUTES wins either way.
    """
    forced = os.environ.get("PYANNOTE_TPU_SEGMENT_MINUTES", "")
    if forced != "":
        try:
            minutes = float(forced)
        except ValueError:
            import warnings
            warnings.warn(
                f"PYANNOTE_TPU_SEGMENT_MINUTES={forced!r} is not a "
                "float; falling back to auto slicing")
            minutes = None
        if minutes is not None:
            if minutes <= 0:                  # "0" = never slice
                return None
            return minutes if file_seconds > minutes * 60.0 else None
    budget = _env_float("PYANNOTE_TPU_HBM_BUDGET_GB", 6.0) * 2.0 ** 30
    from ..utils.flops import diarization_resident_hbm_bytes
    if diarization_resident_hbm_bytes(file_seconds)["total"] <= budget:
        return None
    halo_sec = 2 * halo_samples(sample_rate) / sample_rate
    for minutes in (60.0, 40.0, 30.0, 20.0, 10.0, 6.0, 4.0, 2.0):
        model = diarization_resident_hbm_bytes(minutes * 60.0 + halo_sec)
        if model["total"] <= budget:
            return minutes
    return 2.0


def plan_slices(num_samples: int, window_size: int, step_size: int,
                sample_rate: int,
                starts: "np.ndarray") -> Optional[List[Slice]]:
    """Partition the global chunk grid into bounded halo'd slices.

    Returns None when the file should take the whole-file path. Every
    global chunk belongs to exactly one slice; slice sample ranges carry
    ``halo_samples`` of real audio on each side (clipped at the true
    file edges, where the whole-file path sees the same boundary), and
    slice starts are ALIGN-aligned so feature grids translate exactly.
    """
    minutes = segment_minutes(num_samples / sample_rate, sample_rate)
    if minutes is None:
        return None
    halo = halo_samples(sample_rate)
    seg_samples = int(minutes * 60.0 * sample_rate)
    chunks_per_slice = max(1, seg_samples // step_size)
    num_chunks = len(starts)
    slices: List[Slice] = []
    for i0 in range(0, num_chunks, chunks_per_slice):
        i1 = min(i0 + chunks_per_slice, num_chunks)
        a = max(0, ((int(starts[i0]) - halo) // ALIGN) * ALIGN)
        b = min(num_samples, int(starts[i1 - 1]) + window_size + halo)
        # slice-LOCAL starts feed int32 device gathers: a forced slice
        # length past ~37 h would wrap them silently (auto mode never
        # produces one — refuse the config loudly)
        if int(starts[i1 - 1]) - a + window_size > 2 ** 31 - 1:
            raise ValueError(
                f"slice length {minutes} min exceeds the int32 sample "
                "range of the device gathers (~37 h at 16 kHz); choose "
                "a smaller PYANNOTE_TPU_SEGMENT_MINUTES")
        slices.append(Slice(a=a, b=b, i0=i0, i1=i1))
    return slices


def slice_uploads(file, waveform: "np.ndarray", slices: List[Slice],
                  sample_rate: int, starts: "np.ndarray",
                  window_size: int):
    """Per-slice device uploads, cached in the file dict.

    Shared by the segmentation and embedding stages so each slice's
    (padded, quantized) waveform crosses the relay exactly once (the
    stages use the same chunk grid, so their keys coincide). The cache
    maps ``(a, b, padded_len, mode)`` to the device buffer, guarded by
    the same full-checksum content fingerprint as
    ``_upload_waveform_cached`` (a reused file dict whose waveform was
    replaced must not serve the old audio). ``release`` drops one
    slice's buffers; the embedding stage releases per group, and batch
    apply's eviction pops the whole dict entry.

    ``starts``/``window_size`` size the padding: the final slice's last
    chunk may extend past the true file end (the standard zero-padded
    tail chunk), in which case ``b`` is clipped to the file and the
    padded length must still cover ``starts[i1-1] - a + window_size`` or
    the in-jit gather would clamp instead of reading zeros.
    """
    from collections.abc import MutableMapping

    from .inference import (_upload_waveform, _upload_quant_mode,
                            _waveform_fingerprint)

    bucket = 30 * sample_rate
    mode = _upload_quant_mode()
    fingerprint = _waveform_fingerprint(waveform)
    cache = file.get("_longfile_uploads") \
        if isinstance(file, MutableMapping) else None
    if cache is None or cache.get("_fingerprint") != fingerprint:
        cache = {"_fingerprint": fingerprint}
        if isinstance(file, MutableMapping):
            try:
                file["_longfile_uploads"] = cache
            except TypeError:
                pass

    def get(k: int):
        sl = slices[k]
        length = sl.b - sl.a
        needed = max(length, int(starts[sl.i1 - 1]) - sl.a + window_size)
        padded_len = -(-needed // bucket) * bucket
        # keyed by slice INDEX, not just (a, b): with a halo longer than
        # the slice, neighbouring slices can share clipped (a, b) bounds
        # and a bounds-keyed release would evict each other's buffer
        key = (k, sl.a, sl.b, padded_len, mode)
        buf = cache.get(key)
        if buf is None:
            buf = _upload_waveform(waveform[:, sl.a:sl.b], quant=mode,
                                   padded_len=padded_len)
            cache[key] = buf
        return buf, padded_len

    def release(k: int):
        for key in [key for key in cache if isinstance(key, tuple)
                    and key[0] == k]:
            cache.pop(key, None)

    return get, release


def retained_upload_bytes_ok(num_samples: int) -> bool:
    """May the slice path retain ALL slice uploads between the
    segmentation and embedding stages?

    The retained buffers are the cached device waveforms (int16 for the
    dpcm4/int16 transports, uint8 for mulaw, f32 for raw), across every
    slice = the whole file — growth with file LENGTH, the exact scaling
    this mode bounds. Retention is therefore allowed only while that
    total stays a small share (25%) of the HBM budget; longer files
    re-upload per slice in the embedding stage (O(slice) memory for 2x
    upload bytes).
    """
    from .inference import _upload_quant_mode
    per_sample = {"f32": 4.0, "mulaw": 1.0}.get(_upload_quant_mode(),
                                                2.0)
    budget = _env_float("PYANNOTE_TPU_HBM_BUDGET_GB", 6.0) * 2.0 ** 30
    return per_sample * num_samples <= 0.25 * budget
