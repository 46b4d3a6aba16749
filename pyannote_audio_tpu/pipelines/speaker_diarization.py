"""Speaker diarization pipeline — THE product.

TPU-native rebuild of /root/reference/src/pyannote/audio/pipelines/
speaker_diarization.py: sliding-window segmentation -> speaker counting ->
per-(chunk, speaker) embeddings -> clustering -> count-constrained
reconstruction -> Annotation.

Hot-loop redesign (SURVEY.md §3.2, §7.2):
  * The reference extracts one embedding per (chunk, speaker) by running the
    full ResNet on the *same* chunk waveform once per speaker, with a fresh
    host-side ``Audio.crop`` per chunk (speaker_diarization.py:406-459).
    Since masking only happens at the pooling layer, the trunk work is
    num_speakers-fold redundant. Here the file's waveform is sent to HBM
    once, each batch gathers its chunks with a vmapped dynamic-slice, the
    ResNet trunk runs once per chunk, and a (batch, speakers, frames)
    masked stats-pool produces every speaker's embedding in one einsum.
  * Segmentation chunking/decoding/aggregation is the shared Inference
    engine (all on device); clustering operates on the tiny gathered
    embedding matrix on host (exact scipy parity), then reconstruction is
    vectorized.
"""

from __future__ import annotations

import functools
import math
import textwrap
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Mapping, Optional, Text, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.annotation import Annotation
from ..core.inference import Inference, _tail_pad_to
from ..core.io import Audio, AudioFile
from ..core.model import Model, Specifications
from ..core.pipeline import Pipeline
from ..core.plda import PLDA
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..utils.signal import binarize_swf
from .clustering import Clustering
from .parameter import ParamDict, Uniform
from .utils.diarization import SpeakerDiarizationMixin, set_num_speakers
from .utils.getter import PipelineModel, get_model, get_plda


def batchify(iterable, batch_size: int = 32, fillvalue=None):
    """Batch an iterable into ``batch_size`` tuples, padding the last one.

    Parity: batchify (reference speaker_diarization.py:56-60).
    batchify('ABCDEFG', 3) -> ('A','B','C') ('D','E','F') ('G', None, None)
    """
    import itertools
    args = [iter(iterable)] * batch_size
    return itertools.zip_longest(*args, fillvalue=fillvalue)


@dataclass
class DiarizeOutput:
    """Parity: DiarizeOutput (reference speaker_diarization.py:63-124)."""

    speaker_diarization: Annotation
    exclusive_speaker_diarization: Annotation
    speaker_embeddings: Optional[np.ndarray] = None

    def serialize(self) -> Dict[str, Any]:
        def turns(ann: Annotation):
            return [{"start": round(seg.start, 3), "end": round(seg.end, 3),
                     "speaker": label}
                    for seg, _, label in ann.itertracks(yield_label=True)]
        return {
            "diarization": turns(self.speaker_diarization),
            "exclusive_diarization":
                turns(self.exclusive_speaker_diarization),
        }


class _DeferredEmbeddings:
    """Per-batch device arrays from ``get_embeddings(defer_fetch=True)``.

    Holding this instead of a numpy array lets batch apply queue several
    files' embedding dispatches before the first host sync; ``fetch()``
    performs the one device->host transfer.
    """

    def __init__(self, parts):
        self._parts = parts

    def fetch(self) -> np.ndarray:
        parts = self._parts
        return np.asarray(jnp.concatenate(parts, axis=0)
                          if len(parts) > 1 else parts[0])


class EmbeddingHotPathMixin:
    """Fused per-(chunk, speaker) embedding extraction.

    Shared by SpeakerDiarization and SpeechSeparation. Requires attributes:
    ``_embedding`` (Model), ``_audio`` (Audio), ``embedding_batch_size``,
    ``mesh``, ``training``, ``_powerset``, ``segmentation`` (ParamDict),
    ``_jitted_embedding_batch`` (init to None).
    """

    def _make_whole_fbank_fn(self):
        """One jitted whole-file (uncentered) fbank shared by the
        fbank-gather and shared-trunk embedding paths — the two paths
        must stay byte-identical (same _to_pcm16_scale + fbank kwargs)
        or their chunk features silently diverge."""
        from ..ops.fbank import fbank

        @jax.jit
        def whole_fbank(waveform):
            # (channels, T) -> (T_frames, mel), uncentered; quantized
            # uploads expand to the x32768 kaldi convention on device
            from ..core.inference import _to_pcm16_scale
            x = _to_pcm16_scale(waveform[0])
            return fbank(x,
                         sample_rate=self._embedding.sample_rate,
                         num_mel_bins=self._embedding.num_mel_bins,
                         frame_length=self._embedding.frame_length,
                         frame_shift=self._embedding.frame_shift,
                         window_type=self._embedding.window_type)

        return whole_fbank

    def _make_embedding_batch_fn(self, window_samples: int,
                                 device_masks: bool = False):
        """Split gather (per-length, cheap) from forward (once, heavy).

        With ``device_masks`` the per-speaker masks live on device as one
        (C_pad, S, F) array and each batch slice happens inside the gather
        dispatch — no per-batch host mask upload.
        """
        module = self._embedding.module

        def gather_chunks(waveform, starts):
            from ..core.inference import _dequantize
            def get_chunk(start):
                return jax.lax.dynamic_slice(
                    waveform, (0, start),
                    (waveform.shape[0], window_samples))
            return _dequantize(jax.vmap(get_chunk)(starts))  # (B, ch, win)

        if device_masks:
            def gather(waveform, starts, all_masks, batch_start):
                # slice size follows the starts shape so the half-size
                # tail executable sees matching (B', ...) masks
                masks = jax.lax.dynamic_slice_in_dim(
                    all_masks, batch_start, starts.shape[0], axis=0)
                return gather_chunks(waveform, starts), masks
        else:
            def gather(waveform, starts, masks, batch_start):
                return gather_chunks(waveform, starts), masks

        def forward(params, chunks, masks):
            frames = module.apply(params, chunks,
                                  method=type(module).frames)
            return module.apply(params, frames, masks,
                                method=type(module).embed)  # (B, S, D)

        from ..core.inference import jit_sharded
        gather_fn = jit_sharded(self.mesh, gather, "rsrr", ("s", "s"))
        forward_fn = jit_sharded(self.mesh, forward, "rss", "s")

        def batch_fn(params, waveform, starts, masks, batch_start):
            chunks, batch_masks = gather_fn(waveform, starts, masks,
                                            batch_start)
            return forward_fn(params, chunks, batch_masks)

        return batch_fn

    def _make_fbank_embedding_batch_fn(self, window_samples: int,
                                       device_masks: bool = False):
        """Shared-fbank fast path: fbank once per file, gather frames.

        Chunks overlap ~90%, so per-chunk fbank recomputes each frame up
        to 10x. Fbank frames depend only on their own 400-sample window,
        so when chunk starts align to the 160-sample frame shift, slicing
        one whole-file (uncentered) fbank is exact; per-chunk mean
        centering happens in frames_from_fbank.
        """
        module = self._embedding.module
        from ..ops.fbank import fbank_num_frames
        frames_per_chunk = fbank_num_frames(
            window_samples, self._embedding.sample_rate,
            self._embedding.frame_length, self._embedding.frame_shift)

        whole_fbank = self._make_whole_fbank_fn()

        def gather_chunks(feats, frame_starts):
            def get_chunk(start):
                return jax.lax.dynamic_slice(
                    feats, (start, 0),
                    (frames_per_chunk, feats.shape[1]))
            return jax.vmap(get_chunk)(frame_starts)  # (B, T, mel)

        if device_masks:
            def gather(feats, frame_starts, all_masks, batch_start):
                # slice size follows the starts shape (half-size tail)
                masks = jax.lax.dynamic_slice_in_dim(
                    all_masks, batch_start, frame_starts.shape[0], axis=0)
                return gather_chunks(feats, frame_starts), masks
        else:
            def gather(feats, frame_starts, masks, batch_start):
                return gather_chunks(feats, frame_starts), masks

        def forward(params, chunk_feats, masks):
            frames = module.apply(params, chunk_feats, False,
                                  method=type(module).frames_from_fbank)
            return module.apply(params, frames, masks,
                                method=type(module).embed)

        from ..core.inference import jit_sharded
        gather_fn = jit_sharded(self.mesh, gather, "rsrr", ("s", "s"))
        forward_fn = jit_sharded(self.mesh, forward, "rss", "s")

        def batch_fn(params, feats, frame_starts, masks, batch_start):
            chunks, batch_masks = gather_fn(feats, frame_starts, masks,
                                            batch_start)
            return forward_fn(params, chunks, batch_masks)

        return whole_fbank, batch_fn

    # shared-trunk panel geometry (trunk-frame units): halo * stride input
    # frames of real context on each side >= the trunk's half receptive
    # field, so interior panel outputs equal the whole-file trunk exactly
    TRUNK_PANEL_CORE = 512
    TRUNK_PANEL_HALO = 64
    TRUNK_PANEL_BATCH = 8

    def _make_shared_trunk_fns(self, window_samples: int,
                               device_masks: bool):
        """Shared whole-file ResNet trunk: compute once, pool per chunk.

        Sliding chunks overlap ~90%, so the per-chunk trunk (reference
        semantics, wespeaker/__init__.py:288-343) recomputes every trunk
        frame up to 10x. Here the trunk runs ONCE over the whole file in
        fixed-size panels (static shapes; halo discarded), and each
        (chunk, speaker) embedding is a masked stats-pool over a slice of
        the shared trunk frames — ~10x less MXU work at 1 s steps.

        Two deliberate approximations vs the per-chunk path (gate:
        PYANNOTE_TPU_SHARED_TRUNK, default on for accelerator backends):
          * cepstral mean subtraction is a chunk-length sliding window
            per frame (kaldi apply-cmvn-sliding) instead of one constant
            mean per chunk;
          * chunks see real audio context at their boundaries instead of
            the zero padding a standalone chunk gets, and trunk frames
            align to the file's stride-8 grid (<= 7 fbank frames offset).
        tests/test_shared_trunk.py bounds the embedding deviation (the
        bound is loose because random untrained weights exaggerate CMN
        sensitivity; re-A/B DER on real checkpoints before relying on it
        for accuracy-critical work — PYANNOTE_TPU_SHARED_TRUNK=0 restores
        exact per-chunk semantics).
        """
        module = self._embedding.module
        mel = self._embedding.num_mel_bins
        from ..ops.fbank import fbank_num_frames
        frames_per_chunk = fbank_num_frames(
            window_samples, self._embedding.sample_rate,
            self._embedding.frame_length, self._embedding.frame_shift)

        def trunk_shape(T):
            return jax.eval_shape(
                lambda p, f: module.apply(
                    p, f, True, method=type(module).frames_from_fbank),
                self._embedding.params,
                jax.ShapeDtypeStruct((1, T, mel), jnp.float32))

        probe = trunk_shape(frames_per_chunk)
        trunk_frames_per_chunk, dim = probe.shape[1], probe.shape[2]
        stride = 80 // max(1, trunk_shape(frames_per_chunk + 80).shape[1]
                           - trunk_frames_per_chunk)
        core = self.TRUNK_PANEL_CORE
        halo = self.TRUNK_PANEL_HALO
        pbatch = self.TRUNK_PANEL_BATCH
        panel_in = (core + 2 * halo) * stride

        whole_fbank = self._make_whole_fbank_fn()

        def num_panel_batches(num_fbank_frames: int) -> int:
            trunk_total = -(-num_fbank_frames // stride)
            num_panels = -(-trunk_total // core)
            return -(-num_panels // pbatch)

        @jax.jit
        def prepare(feats, num_real):
            """Sliding-window CMN + halo/tail padding.

            Each frame is centered by the mean over a chunk-length window
            around it, clipped to real frames (kaldi apply-cmvn-sliding
            semantics, center=true) — the closest shared-trunk analogue
            of the reference's per-chunk mean subtraction
            (wespeaker/__init__.py:128-139).
            """
            T = feats.shape[0]
            idx = jnp.arange(T)
            mask = (idx < num_real)[:, None]
            masked = jnp.where(mask, feats, 0.0)
            csum = jnp.pad(jnp.cumsum(masked, axis=0), ((1, 0), (0, 0)))
            half = frames_per_chunk // 2
            lo = jnp.clip(idx - half, 0, None)
            hi = jnp.clip(idx + half, None,
                          jnp.maximum(num_real, 1))
            hi = jnp.maximum(hi, lo + 1)
            mean = (csum[hi] - csum[lo]) \
                / (hi - lo).astype(feats.dtype)[:, None]
            centered = (feats - mean) * mask
            total = (num_panel_batches(T) * pbatch * core
                     + 2 * halo) * stride
            return jnp.pad(centered,
                           ((halo * stride, total - halo * stride - T),
                            (0, 0)))

        def panel_trunk(params, padded, base):
            def get(i):
                return jax.lax.dynamic_slice(
                    padded, ((base + i) * (core * stride), 0),
                    (panel_in, mel))
            panels = jax.vmap(get)(jnp.arange(pbatch, dtype=jnp.int32))
            out = module.apply(params, panels, True,
                               method=type(module).frames_from_fbank)
            return out[:, halo:halo + core, :]       # (pbatch, core, D)

        from ..core.inference import jit_sharded
        # under a mesh the panel batch axis shards over 'data' so the
        # trunk MXU work spreads across devices (this path previously got
        # a plain jit and silently ran replicated)
        panel_trunk_fn = jit_sharded(self.mesh, panel_trunk, "rrr", "s")

        if device_masks:
            def gather_pool(params, trunk_frames, starts, all_masks,
                            batch_start):
                # slice size follows the starts shape (half-size tail)
                masks = jax.lax.dynamic_slice_in_dim(
                    all_masks, batch_start, starts.shape[0], axis=0)
                def get(s):
                    return jax.lax.dynamic_slice(
                        trunk_frames, (s, 0), (trunk_frames_per_chunk, dim))
                frames = jax.vmap(get)(starts)
                return module.apply(params, frames, masks,
                                    method=type(module).embed)
        else:
            def gather_pool(params, trunk_frames, starts, masks,
                            batch_start):
                def get(s):
                    return jax.lax.dynamic_slice(
                        trunk_frames, (s, 0), (trunk_frames_per_chunk, dim))
                frames = jax.vmap(get)(starts)
                return module.apply(params, frames, masks,
                                    method=type(module).embed)

        gather_pool_fn = jit_sharded(self.mesh, gather_pool,
                                     "rrsrr", "s")

        def compute_trunk(device_waveform, num_real_frames):
            feats = whole_fbank(device_waveform)
            padded = prepare(feats, jnp.int32(num_real_frames))
            n_pb = num_panel_batches(feats.shape[0])
            parts = [panel_trunk_fn(self._embedding.params, padded,
                                    jnp.int32(b * pbatch))
                     for b in range(n_pb)]
            trunk = parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, axis=0)
            return trunk.reshape(-1, dim)            # (>=T', D)

        geometry = {"stride": stride,
                    "trunk_frames_per_chunk": trunk_frames_per_chunk}
        return compute_trunk, gather_pool_fn, geometry

    def _start_shared_trunk(self, file, device_masks: bool) -> None:
        """Dispatch the whole-file embedding trunk EARLY (before the first
        host sync on the segmentation output).

        The shared trunk depends only on the waveform — not on the
        segmentation scores — so its panels can queue behind the
        segmentation forwards and execute while the host waits on the
        fused count/stats round-trip. ``get_embeddings`` picks the result
        up from the file dict; on any mismatch it recomputes (correctness
        never depends on the stash).
        """
        from collections.abc import MutableMapping
        if self._embedding is None or self.training or \
                not isinstance(file, MutableMapping):
            return
        duration = self._segmentation.duration
        step = self._segmentation.step
        sample_rate = self._embedding.sample_rate
        window_samples = round(duration * sample_rate)
        step_samples = round(step * sample_rate)
        frame_shift_samples = int(
            sample_rate * getattr(self._embedding, "frame_shift", 10.0)
            * 0.001)
        if self._embedding.module is None:
            self._embedding.build()
        shared_fbank = (
            hasattr(type(self._embedding.module), "frames_from_fbank")
            and frame_shift_samples > 0
            and step_samples % frame_shift_samples == 0)
        from ..utils.runtime import device_flag
        if not (shared_fbank and device_flag("PYANNOTE_TPU_SHARED_TRUNK")):
            return
        from ..core.inference import _chunk_grid, _upload_waveform_cached
        waveform, _ = self._audio(file)
        real_samples = waveform.shape[1]
        # identical grid + padded-length bucketing as get_embeddings /
        # slide — ONE source of truth so the stash key always matches
        starts, padded_len = _chunk_grid(real_samples, window_samples,
                                         step_samples, sample_rate)
        from ..core.longfile import plan_slices
        plan = plan_slices(real_samples, window_samples, step_samples,
                           sample_rate, starts)
        if plan is not None and len(plan) > 1:
            # bounded-HBM long file: get_embeddings runs per-slice
            # front-ends; a whole-file early trunk would defeat the point
            return
        device_waveform = _upload_waveform_cached(
            waveform, file, padded_len=padded_len)

        cache_attr = "_jitted_shared_trunk_dev" if device_masks \
            else "_jitted_shared_trunk"
        if getattr(self, cache_attr, None) is None:
            setattr(self, cache_attr,
                    self._make_shared_trunk_fns(
                        window_samples, device_masks=device_masks))
        compute_trunk, _, _ = getattr(self, cache_attr)
        from ..ops.fbank import fbank_num_frames
        num_real_frames = fbank_num_frames(
            min(real_samples, padded_len), sample_rate,
            self._embedding.frame_length, self._embedding.frame_shift)
        trunk = compute_trunk(device_waveform, num_real_frames)
        file["_device_trunk"] = (
            (window_samples, bool(device_masks), padded_len), trunk)

    def get_embeddings(
        self,
        file,
        binary_segmentations: SlidingWindowFeature,
        exclude_overlap: bool = False,
        hook: Optional[Callable] = None,
        defer_fetch: bool = False,
    ) -> Union["np.ndarray", "_DeferredEmbeddings"]:
        """(num_chunks, num_speakers, dimension) embeddings.

        Trunk runs once per chunk; per-speaker masks only drive pooling.
        With ``defer_fetch`` the per-batch device arrays are returned
        wrapped in a ``_DeferredEmbeddings`` (no host sync) so batch apply
        can queue several files' embeddings before the first round-trip;
        ignored in training mode (the training cache stores host arrays).
        """
        if self.training:
            cache = file.get("training_cache/embeddings", dict())
            if "embeddings" in cache and (
                    self._powerset or cache.get("segmentation.threshold")
                    == self.segmentation.threshold):
                return cache["embeddings"]

        from ..core.segment import DeviceSlidingWindowFeature
        device_masks = isinstance(binary_segmentations,
                                  DeviceSlidingWindowFeature)

        duration = binary_segmentations.sliding_window.duration
        if device_masks:
            num_chunks = binary_segmentations.num_valid
            _, num_frames, num_speakers = \
                binary_segmentations.device_data.shape
        else:
            num_chunks, num_frames, num_speakers = \
                binary_segmentations.data.shape

        # prefer overlap-free frames unless that leaves too little;
        # per-backend minimum like the reference's
        # self._embedding.min_num_samples (speaker_diarization.py:378)
        from .speaker_verification import analytic_min_num_samples
        min_num_samples = analytic_min_num_samples(self._embedding)
        num_samples = duration * self._embedding.sample_rate
        min_num_frames = math.ceil(
            num_frames * min_num_samples / num_samples)
        if device_masks:
            # masks never leave HBM (ops/diarize_fused.py); batches are
            # sliced inside the gather dispatch. The FULL bucketed array
            # goes in so the jitted mask program compiles once per
            # bucket, not once per file length; pad chunks are sliced
            # away with the batch tails below.
            from ..ops.diarize_fused import make_embedding_masks
            masks = make_embedding_masks(
                binary_segmentations.device_data,
                exclude_overlap, min_num_frames)    # (C_pad, S, F) device
        else:
            # overlap-free mask on RAW scores first (NaN frame -> sum
            # NaN -> not clean), NaN -> 0 afterwards — reference
            # speaker_diarization.py:375-420 ordering
            raw = binary_segmentations.data
            if exclude_overlap:
                alone = (np.sum(raw, axis=2, keepdims=True) < 2)
                clean = np.nan_to_num(raw * alone, nan=0.0) \
                    .astype(np.float32)
                enough = clean.sum(axis=1, keepdims=True) > min_num_frames
                masks = np.where(
                    enough, clean,
                    np.nan_to_num(raw, nan=0.0).astype(np.float32))
            else:
                masks = np.nan_to_num(raw, nan=0.0).astype(np.float32)
            masks = np.transpose(masks, (0, 2, 1))  # (C, S, F)

        waveform, sample_rate = self._audio(file)
        real_samples = waveform.shape[1]
        window_samples = round(duration * sample_rate)
        step_samples = round(
            binary_segmentations.sliding_window.step * sample_rate)
        starts = np.round(np.arange(num_chunks) * step_samples).astype(
            np.int64)   # int64: device gathers cast slice-local int32
        # bucket the padded length exactly like Inference.slide /
        # _start_shared_trunk so the chunk-gather executable and the
        # early-trunk stash key cache across file lengths
        from ..core.inference import _chunk_grid
        _, padded_len = _chunk_grid(waveform.shape[1], window_samples,
                                    step_samples, sample_rate)
        padded_len = max(padded_len, int(starts[-1]) + window_samples)
        from collections.abc import MutableMapping
        from ..core.inference import _upload_waveform_cached
        from ..core.longfile import plan_slices, slice_uploads
        cache = file if isinstance(file, MutableMapping) else None
        # bounded-HBM long files: per-slice uploads + front-ends instead
        # of whole-file buffers (core/longfile.py); the slice plan is the
        # same one the segmentation stage used, so uploads are shared
        plan = plan_slices(real_samples, window_samples, step_samples,
                           sample_rate, starts)
        if plan is not None and len(plan) <= 1:
            plan = None
        device_waveform = None
        if plan is None:
            device_waveform = _upload_waveform_cached(
                waveform, cache, padded_len=padded_len)

        if self._embedding.module is None:
            self._embedding.build()

        # shared-fbank fast path: exact when chunk starts align to the
        # fbank frame shift and the model supports frames_from_fbank
        frame_shift_samples = int(
            self._embedding.sample_rate
            * getattr(self._embedding, "frame_shift", 10.0) * 0.001)
        shared_fbank = (
            hasattr(type(self._embedding.module), "frames_from_fbank")
            and frame_shift_samples > 0
            and step_samples % frame_shift_samples == 0)
        from ..utils.runtime import device_flag
        shared_trunk = shared_fbank and \
            device_flag("PYANNOTE_TPU_SHARED_TRUNK")
        if shared_trunk:
            cache_attr = "_jitted_shared_trunk_dev" if device_masks \
                else "_jitted_shared_trunk"
            if getattr(self, cache_attr, None) is None:
                setattr(self, cache_attr,
                        self._make_shared_trunk_fns(
                            window_samples, device_masks=device_masks))
            compute_trunk, batch_fn, geometry = getattr(self, cache_attr)
            from ..ops.fbank import fbank_num_frames

            def input_for(device_buf, num_slice_samples, slice_padded):
                num_real_frames = fbank_num_frames(
                    min(num_slice_samples, slice_padded),
                    self._embedding.sample_rate,
                    self._embedding.frame_length,
                    self._embedding.frame_shift)
                return compute_trunk(device_buf, num_real_frames)

            def translate(starts_abs, a):
                # int64 subtract (a may exceed int32 on multi-hour
                # files); the slice-local result always fits int32
                return (((starts_abs - a) // frame_shift_samples)
                        // geometry["stride"]).astype(np.int32)
        elif shared_fbank:
            cache_attr = "_jitted_fbank_embedding_dev" if device_masks \
                else "_jitted_fbank_embedding"
            if getattr(self, cache_attr, None) is None:
                setattr(self, cache_attr,
                        self._make_fbank_embedding_batch_fn(
                            window_samples, device_masks=device_masks))
            whole_fbank, batch_fn = getattr(self, cache_attr)

            def input_for(device_buf, num_slice_samples, slice_padded):
                return whole_fbank(device_buf)

            def translate(starts_abs, a):
                return ((starts_abs - a)
                        // frame_shift_samples).astype(np.int32)
        else:
            cache_attr = "_jitted_embedding_batch_dev" if device_masks \
                else "_jitted_embedding_batch"
            if getattr(self, cache_attr, None) is None:
                setattr(self, cache_attr,
                        self._make_embedding_batch_fn(
                            window_samples, device_masks=device_masks))
            batch_fn = getattr(self, cache_attr)

            def input_for(device_buf, num_slice_samples, slice_padded):
                return device_buf

            def translate(starts_abs, a):
                return (starts_abs - a).astype(np.int32)

        # groups of (device_input thunk, translated starts, first global
        # chunk index): ONE whole-file group normally; one per bounded
        # slice for long files (core/longfile.py) — the batch loop below
        # is identical either way because gathers take explicit starts
        # and mask slices are indexed by GLOBAL chunk position
        if plan is None:
            # whole-file gathers are int32: refuse silently-wrapping
            # starts (only reachable when slicing is forced off for a
            # >37 h file — auto mode slices such files on HBM grounds)
            from ..core.inference import _starts_i32
            _starts_i32(starts, window_samples)
            if shared_trunk:
                stash = file.pop("_device_trunk", None) \
                    if isinstance(file, MutableMapping) else None
            else:
                stash = None
            if stash is not None and stash[0] == (
                    window_samples, bool(device_masks), padded_len):
                whole_input = stash[1]  # dispatched early in apply()
            else:
                whole_input = input_for(device_waveform, real_samples,
                                        padded_len)
            groups = [(lambda wi=whole_input: wi,
                       translate(starts, 0), 0)]
            release_upload = None
        else:
            get_upload, release_upload = slice_uploads(
                cache, waveform, plan, sample_rate, starts,
                window_samples)

            def slice_group(k):
                sl = plan[k]

                def make_input():
                    device_buf, slice_padded = get_upload(k)
                    return input_for(device_buf, sl.b - sl.a,
                                     slice_padded)
                return (make_input, translate(starts[sl.i0:sl.i1], sl.a),
                        sl.i0)

            groups = [slice_group(k) for k in range(len(plan))]

        B = self.embedding_batch_size
        num_batches = sum(math.ceil(len(g[1]) / B) for g in groups)
        if device_masks:
            # one padded (C_pad, S, F) device array; per-batch slices
            # happen inside the gather dispatch. The chunk bucket is
            # usually >= the batch grid already (both quantize the chunk
            # count); pad only if a batch's global window needs more
            need = max(g[2] + math.ceil(len(g[1]) / B) * B for g in groups)
            pad_chunks = need - masks.shape[0]
            all_masks = jnp.pad(masks, ((0, pad_chunks), (0, 0), (0, 0))) \
                if pad_chunks > 0 else masks
        out = []
        done = 0
        if hook is not None:
            hook("embeddings", None, total=num_batches, completed=0)
        for gi, (make_input, group_starts, chunk0) in enumerate(groups):
            device_input = make_input()
            group_batches = math.ceil(len(group_starts) / B)
            for b in range(group_batches):
                batch_starts = group_starts[b * B:(b + 1) * B]
                n_real = len(batch_starts)
                pad_to = _tail_pad_to(B, n_real, self.mesh)
                if n_real < pad_to:
                    batch_starts = np.pad(batch_starts,
                                          (0, pad_to - n_real))
                if device_masks:
                    emb = batch_fn(
                        self._embedding.params, device_input,
                        jnp.asarray(batch_starts), all_masks,
                        np.int32(chunk0 + b * B))
                else:
                    batch_masks = masks[chunk0 + b * B:
                                        chunk0 + b * B + n_real]
                    if n_real < pad_to:
                        batch_masks = np.pad(
                            batch_masks,
                            ((0, pad_to - n_real), (0, 0), (0, 0)))
                    emb = batch_fn(
                        self._embedding.params, device_input,
                        jnp.asarray(batch_starts),
                        jnp.asarray(batch_masks), np.int32(0))
                # keep on device: a host sync here would serialize the
                # batch pipeline; one transfer happens after the loop
                out.append(emb[:n_real])
                done += 1
                if hook is not None:
                    hook("embeddings", None, total=num_batches,
                         completed=done)
            if release_upload is not None:
                # drop the slice's cached upload: the dispatched programs
                # keep the buffer alive until they execute, after which
                # HBM use stays bounded by ~one slice in flight
                release_upload(gi)
        if defer_fetch and not self.training:
            return _DeferredEmbeddings(out)
        embeddings = np.asarray(jnp.concatenate(out, axis=0)
                                if len(out) > 1 else out[0])  # (C, S, D)

        if self.training:
            cache = {"embeddings": embeddings}
            if not self._powerset:
                cache["segmentation.threshold"] = \
                    self.segmentation.threshold
            file["training_cache/embeddings"] = cache
        return embeddings


class SpeakerDiarization(SpeakerDiarizationMixin, EmbeddingHotPathMixin,
                         Pipeline):
    """Parity: SpeakerDiarization (reference speaker_diarization.py:127+)."""

    # apply_batch streams its own per-file decode; skip the eager
    # whole-batch pre-decode in Pipeline._apply_batch
    STREAMS_DECODE = True

    def __init__(
        self,
        legacy: bool = False,
        segmentation: PipelineModel = None,
        segmentation_step: float = 0.1,
        embedding: PipelineModel = None,
        embedding_exclude_overlap: bool = False,
        plda=None,
        clustering: str = "AgglomerativeClustering",
        embedding_batch_size: int = 32,
        segmentation_batch_size: int = 32,
        der_variant: Optional[dict] = None,
        token=None,
        cache_dir=None,
        mesh=None,
    ):
        super().__init__()
        self.mesh = mesh
        if mesh is not None:
            n = mesh.devices.size
            embedding_batch_size = -(-embedding_batch_size // n) * n
        self.legacy = legacy
        self.segmentation_model = segmentation
        self.segmentation_step = segmentation_step
        self.embedding = embedding
        self.embedding_batch_size = embedding_batch_size
        self.embedding_exclude_overlap = embedding_exclude_overlap
        self.plda = plda
        self.klustering = clustering
        self.der_variant = der_variant or {"collar": 0.0,
                                           "skip_overlap": False}

        model: Model = get_model(segmentation, token=token,
                                 cache_dir=cache_dir)
        specs = model.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        segmentation_duration = spec.duration
        self._segmentation = Inference(
            model,
            duration=segmentation_duration,
            step=self.segmentation_step * segmentation_duration,
            skip_aggregation=True,
            batch_size=segmentation_batch_size,
            mesh=mesh,
        )
        self._powerset = spec.powerset

        if self._powerset:
            self.segmentation = ParamDict(
                min_duration_off=Uniform(0.0, 1.0))
        else:
            self.segmentation = ParamDict(
                threshold=Uniform(0.1, 0.9),
                min_duration_off=Uniform(0.0, 1.0))

        metric = "not_applicable" if clustering == "OracleClustering" \
            else "cosine"

        self._embedding = get_model(embedding, token=token,
                                    cache_dir=cache_dir) \
            if embedding is not None else None
        self._audio = Audio(sample_rate=16000, mono="downmix")

        try:
            Klustering = Clustering[clustering]
        except KeyError:
            raise ValueError(
                f"clustering must be one of "
                f"{[member.name for member in Clustering]}")
        if clustering == "VBxClustering":
            self.clustering = Klustering.value(
                plda=get_plda(plda, token=token, cache_dir=cache_dir),
                metric=metric)
        elif clustering == "OracleClustering":
            self.clustering = Klustering.value()
        else:
            self.clustering = Klustering.value(metric=metric)
        self._expects_num_speakers = self.clustering.expects_num_clusters

        self._jitted_embedding_batch = None

    def default_parameters(self) -> Dict[str, Any]:
        if self.klustering == "VBxClustering":
            return {
                "segmentation": {"min_duration_off": 0.0},
                "clustering": {"threshold": 0.6, "Fa": 0.07, "Fb": 0.8},
            }
        if self._powerset:
            return {
                "segmentation": {"min_duration_off": 0.0},
                "clustering": {"method": "centroid", "min_cluster_size": 15,
                               "threshold": 0.7},
            }
        raise NotImplementedError

    def classes(self):
        """Infinite SPEAKER_%02d label generator."""
        i = 0
        while True:
            yield f"SPEAKER_{i:02d}"
            i += 1

    # setup_hook: inherited from Pipeline (core/pipeline.py)

    # -- segmentation ------------------------------------------------------

    CACHED_SEGMENTATION = "training_cache/segmentation"

    def warmup(self, duration: float = 600.0, **kwargs) -> None:
        """Precompile the apply program for ``duration``-second files
        (serving convenience; the reference has no equivalent — its CUDA
        kernels JIT per shape too, it just never exposes a warmup).

        Executables are keyed by length BUCKET (waveform length rounds up
        to 30 s multiples, chunk count to 256, output frames to 4096), so
        one warmup covers one bucket combination; call once per expected
        file-length bucket for full coverage. Runs through the normal
        ``__call__`` entry (auto-instantiation, reproducibility guard) on
        synthetic harmonic "speech" loud enough that trained models
        detect speakers — so the embedding, clustering and reconstruction
        executables compile too, not just segmentation. With the
        persistent compilation cache enabled this also primes cold
        processes. Extra kwargs are forwarded to ``apply`` (e.g.
        ``max_speakers``) so parameter-dependent shapes match serving.
        """
        sr = self._audio.sample_rate
        n = int(duration * sr)
        rng = np.random.default_rng(0)
        t = np.arange(n) / sr
        waveform = 0.003 * rng.standard_normal(n).astype(np.float32)
        seg_len = 5.0
        for i, start in enumerate(
                np.arange(0.0, max(duration - seg_len, 0.0), 7.0)):
            f0 = [140.0, 210.0, 320.0][i % 3]
            i0, i1 = int(start * sr), int((start + seg_len) * sr)
            tt = t[i0:i1]
            waveform[i0:i1] += (
                0.2 * np.sin(2 * np.pi * f0 * tt)
                * (0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 3 * tt)))
            ).astype(np.float32)
        self({"waveform": waveform[None], "sample_rate": sr,
              "uri": "__warmup__"}, **kwargs)

    def preload(self, file) -> None:
        """Early device upload (segmentation + embeddings share one
        buffer). NOTE: diarization batches normally take the pipelined
        ``apply_batch`` path, where staging itself orders the uploads;
        this hook only runs on the generic streaming path (e.g. when
        ``apply_batch`` is disabled) and for external callers that want
        to warm a file's device buffer ahead of ``apply``."""
        self._segmentation.preload(file)

    def get_segmentations(self, file, hook=None) -> SlidingWindowFeature:
        if hook is not None:
            hook = functools.partial(hook, "segmentation", None)
        if self.training and self.CACHED_SEGMENTATION in file:
            return file[self.CACHED_SEGMENTATION]
        segmentations = self._segmentation(file, hook=hook)
        if self.training:
            file[self.CACHED_SEGMENTATION] = segmentations
        return segmentations

    # -- fused device post-processing ---------------------------------------

    @staticmethod
    def _aggregation_grid(chunk_window: SlidingWindow,
                          frames: SlidingWindow, num_chunks: int):
        """Output frame grid of Inference.aggregate, precomputed on host.

        Mirrors the offset math of Inference.aggregate (reference
        inference.py:532-543) bit-for-bit: same op order as
        SlidingWindow.closest_frame.
        """
        window = SlidingWindow(start=chunk_window.start,
                               duration=frames.duration, step=frames.step)
        t = chunk_window.start + np.arange(num_chunks) * chunk_window.step
        offsets = np.rint(
            (t + 0.5 * frames.duration - window.start
             - 0.5 * window.duration) / window.step).astype(np.int32)
        num_output_frames = window.closest_frame(
            chunk_window.start + chunk_window.duration
            + (num_chunks - 1) * chunk_window.step
            + 0.5 * frames.duration) + 1
        return offsets, num_output_frames, window

    def _dispatch_count_stats(self, binarized: SlidingWindowFeature):
        """Queue the fused on-device speaker count + activity stats.

        Returns device handles + grid metadata WITHOUT syncing, so batch
        apply can queue every file's device work before the first host
        round-trip; ``_fetch_count_stats`` completes the pair.
        """
        from ..ops.aggregate import _bucket, pad_chunk_bucket
        from ..ops.diarize_fused import fused_count_stats

        frames = self._segmentation.model.receptive_field
        chunk_window = binarized.sliding_window
        num_chunks = binarized.num_valid

        offsets, num_output_frames, window = self._aggregation_grid(
            chunk_window, frames, num_chunks)

        dev, offsets_padded, chunk_mask = pad_chunk_bucket(
            binarized.device_data[:num_chunks], offsets, num_chunks)
        F_bucket = _bucket(num_output_frames, 4096)

        device_handles = fused_count_stats(
            dev, jnp.asarray(offsets_padded), jnp.asarray(chunk_mask),
            F_bucket)
        return (device_handles, offsets, num_output_frames, window,
                num_chunks)

    def _fetch_count_stats(self, dispatched):
        """One host sync for the three small fused-count arrays."""
        (device_handles, offsets, num_output_frames, window,
         num_chunks) = dispatched
        count, speaker_frames, clean_frames = jax.device_get(
            device_handles)
        count = count[:num_output_frames]
        speaker_frames = speaker_frames[:num_chunks]
        clean_frames = clean_frames[:num_chunks]
        count_swf = SlidingWindowFeature(count.astype(np.uint8), window)
        return (count_swf, speaker_frames, clean_frames, offsets,
                num_output_frames)

    def _device_count_stats(self, binarized: SlidingWindowFeature):
        """Fused on-device speaker count + activity stats, one host sync.

        Replaces the host trim->sum->aggregate->rint of speaker_count
        (warm_up=(0,0), the product path) plus the host reductions that
        feed clustering (filter_embeddings clean frames, inactive/silent
        speaker masks) — the full score tensor never leaves HBM.
        """
        return self._fetch_count_stats(
            self._dispatch_count_stats(binarized))

    def _device_reconstruct(
        self,
        segmentations: SlidingWindowFeature,
        hard_clusters: np.ndarray,
        count: SlidingWindowFeature,
        offsets: np.ndarray,
        num_output_frames: int,
    ):
        """Fused reconstruct: normal + exclusive variants, one dispatch.

        Parity: reconstruct + to_diarization for both count variants
        (apply steps at reference speaker_diarization.py:688-713).
        """
        from ..ops.aggregate import _bucket, pad_chunk_bucket
        from ..ops.diarize_fused import fused_reconstruct, unpack_reconstruct

        num_chunks = segmentations.num_valid
        dev, offsets_padded, chunk_mask = pad_chunk_bucket(
            segmentations.device_data[:num_chunks], offsets, num_chunks)
        C_pad = dev.shape[0]

        hard = np.asarray(hard_clusters, dtype=np.int32)
        hard_padded = np.full((C_pad, hard.shape[1]), -2, dtype=np.int32)
        hard_padded[:num_chunks] = hard

        cnt = np.asarray(count.data).reshape(-1).astype(np.int32)
        n = min(num_output_frames, len(cnt))
        F_bucket = _bucket(num_output_frames, 4096)
        cnt_padded = np.zeros(F_bucket, dtype=np.int32)
        cnt_padded[:n] = cnt[:n]

        # like the host path, pad clusters up to the max count so the
        # rank-vs-count binarization can activate that many columns
        num_clusters = max(int(hard.max()) + 1,
                           int(cnt.max()) if len(cnt) else 0, 1)

        # bit-packed fetch (32x smaller than float32), exact unpack on host
        binary_bits, exclusive_bits = jax.device_get(fused_reconstruct(
            dev, jnp.asarray(hard_padded), jnp.asarray(offsets_padded),
            jnp.asarray(chunk_mask), jnp.asarray(cnt_padded),
            num_clusters, F_bucket))
        binary = unpack_reconstruct(binary_bits, F_bucket, num_clusters)[:n]
        exclusive = unpack_reconstruct(
            exclusive_bits, F_bucket, num_clusters)[:n]
        window = count.sliding_window
        return (SlidingWindowFeature(binary, window),
                SlidingWindowFeature(exclusive, window))

    # -- reconstruction ----------------------------------------------------

    def reconstruct(
        self,
        segmentations: SlidingWindowFeature,
        hard_clusters: np.ndarray,
        count: SlidingWindowFeature,
    ) -> SlidingWindowFeature:
        """Cluster-max over local speakers, then count-constrained argsort.

        Vectorized: one-hot cluster membership turns the reference's python
        loop (speaker_diarization.py:480-528) into a masked max.
        """
        num_chunks, num_frames, local_speakers = segmentations.data.shape
        num_clusters = int(np.max(hard_clusters)) + 1
        raw = segmentations.data
        nan_scores = np.isnan(raw)
        data = np.nan_to_num(raw, nan=-np.inf)
        # per cluster k: max over the local speakers assigned to k
        # (K is small, so K passes over (C, F, S) beat a (C, F, S, K) blow-up)
        clustered = np.full((num_chunks, num_frames, num_clusters), np.nan,
                            dtype=np.float32)
        for k in range(num_clusters):
            member = hard_clusters == k                   # (C, S)
            masked = np.where(member[:, None, :], data, -np.inf)
            best = masked.max(axis=2)                     # (C, F)
            # NaN member scores poison the max like the reference's
            # np.max over cluster members (speaker_diarization.py:519-521)
            any_nan = (member[:, None, :] & nan_scores).any(axis=2)
            clustered[:, :, k] = np.where(
                np.isfinite(best) & ~any_nan, best, np.nan)
        clustered_swf = SlidingWindowFeature(
            clustered, segmentations.sliding_window)
        return self.to_diarization(clustered_swf, count)

    # -- apply -------------------------------------------------------------

    def _stage(
        self,
        file: AudioFile,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        """Queue a file's full device program — segmentation forwards,
        shared embedding trunk, fused count/stats, masked embeddings —
        WITHOUT a single host sync.

        ``_finalize`` completes the host half (sync, clustering,
        reconstruction, annotation). ``apply`` = stage + finalize;
        ``apply_batch`` stages ahead so the device pipeline never drains
        while the host clusters/annotates the previous file.
        """
        if kwargs:
            warnings.warn(
                f"Ignoring unexpected keyword arguments: "
                f"{', '.join(kwargs)}")
        hook = self.setup_hook(file, hook=hook)
        num_speakers, min_speakers, max_speakers = set_num_speakers(
            num_speakers=num_speakers, min_speakers=min_speakers,
            max_speakers=max_speakers)

        if self._expects_num_speakers and num_speakers is None:
            if isinstance(file, Mapping) and "annotation" in file:
                num_speakers = len(file["annotation"].labels())
            else:
                raise ValueError(
                    f"num_speakers must be provided when using "
                    f"{self.klustering} clustering")

        segmentations = self.get_segmentations(file, hook=hook)
        hook("segmentation", segmentations)

        if self._powerset:
            binarized_segmentations = segmentations
        else:
            binarized_segmentations = binarize_swf(
                segmentations, onset=self.segmentation.threshold,
                initial_state=False)

        from ..core.segment import DeviceSlidingWindowFeature
        device_fast = isinstance(binarized_segmentations,
                                 DeviceSlidingWindowFeature)
        # queue the (segmentation-independent) embedding trunk behind the
        # segmentation forwards so it executes during the count host
        # sync; only worthwhile on the zero-sync device path (the host
        # path knows the count synchronously and can still skip silent
        # files before any embedding work)
        if device_fast and not (self.klustering == "OracleClustering"
                                and self._embedding is None):
            self._start_shared_trunk(file, device_masks=device_fast)

        if device_fast:
            count_dispatch = self._dispatch_count_stats(
                binarized_segmentations)
            count = None
        else:
            count_dispatch = None
            count = self.speaker_count(
                binarized_segmentations,
                self._segmentation.model.receptive_field,
                warm_up=(0.0, 0.0))

        if (self.klustering == "OracleClustering"
                and self._embedding is None) or \
                (count is not None and np.nanmax(count.data) == 0.0):
            # host-path silent file: the count is already known, so skip
            # the embedding program entirely (the device_fast path can't
            # know without a sync — its wasted dispatch on rare silent
            # files is the price of zero-sync staging)
            embeddings = None
        else:
            embeddings = self.get_embeddings(
                file, binarized_segmentations,
                exclude_overlap=self.embedding_exclude_overlap,
                hook=hook, defer_fetch=device_fast)

        return {
            "file": file, "hook": hook,
            "num_speakers": num_speakers,
            "min_speakers": min_speakers,
            "max_speakers": max_speakers,
            "segmentations": segmentations,
            "binarized": binarized_segmentations,
            "device_fast": device_fast,
            "count_dispatch": count_dispatch,
            "count": count,
            "embeddings": embeddings,
        }

    def apply(
        self,
        file: AudioFile,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
        **kwargs,
    ) -> Union[DiarizeOutput, Annotation]:
        return self._finalize(self._stage(
            file, num_speakers=num_speakers, min_speakers=min_speakers,
            max_speakers=max_speakers, hook=hook, **kwargs))

    def apply_batch(
        self,
        files: List[AudioFile],
        hook: Optional[Callable] = None,
        stage_ahead: int = 2,
        **kwargs,
    ) -> List[Union[DiarizeOutput, Annotation]]:
        """Pipelined batch apply: the device program of up to
        ``stage_ahead`` upcoming files is queued before the current file's
        host half (sync + clustering + annotation) runs, so host work and
        relay round-trips overlap device compute instead of draining the
        pipeline between files. Replaces the sequential reference
        ``apply_batch`` hook (core/pipeline.py:489-508).

        Depth 2 balances keeping the device fed against the per-file
        reconstruct dispatch queueing behind too many staged files
        (benchmarks/batch_sweep.py: 1-2 ahead ≈ equal, 3+ slower).

        Decode streams instead of batching: upcoming files decode in
        background threads while the current file's device program is
        staged (an eager whole-batch pre-decode adds its full wall time
        as dead lead before the first dispatch — ~0.4 s for 3x10-min
        files, benchmarks/batch_timeline.py). The C++ decoder releases
        the GIL, so the overlap is real.
        """
        import threading
        from collections import deque

        if not files:
            return []

        # rolling bounded prefetch: decode stays stage_ahead+1 files in
        # front of staging (unbounded fan-out would decode a 200-file
        # batch concurrently — RAM = whole batch, threads compete with
        # the critical path). preload=False is deliberate: worker-thread
        # uploads contend with the current file's staging on the
        # serialized relay (measured 5.95 -> 11.0 s/audio-hour —
        # benchmarks/batch_timeline.py); staging orders uploads itself.
        decode_threads: Dict[int, threading.Thread] = {}
        window = stage_ahead + 1

        def start_prefetch(j: int) -> None:
            if 0 < j < len(files) and j not in decode_threads:
                t = threading.Thread(target=self._decode_into,
                                     args=(files[j], False), daemon=True)
                t.start()
                decode_threads[j] = t

        for j in range(1, min(window + 1, len(files))):
            start_prefetch(j)
        # file 0 sits on the critical path either way: decode it inline
        # so every stage consumer hits the cached waveform
        self._decode_into(files[0], False)

        staged: deque = deque()
        results: List = []
        for i, file in enumerate(files):
            t = decode_threads.pop(i, None)
            if t is not None:
                t.join()
            elif i > 0:
                self._decode_into(file, False)
            # the initial loop already primed 1..window, so the rolling
            # lead is i + window (not +1: one extra thread would exceed
            # the documented stage_ahead+1 decode window)
            start_prefetch(i + window)
            staged.append(self._stage(file, hook=hook, **kwargs))
            if len(staged) > stage_ahead:
                results.append(self._finalize_and_release(staged.popleft()))
        while staged:
            results.append(self._finalize_and_release(staged.popleft()))
        return results

    def _finalize_and_release(self, staged: Dict[str, Any]):
        """_finalize, then drop the file's device buffer — and, for
        dicts the batch machinery decoded itself, the host waveform:
        the batch list keeps every file dict alive, so without eviction
        HBM (padded device buffer) and host RAM (~230 MB f32 per
        audio-hour) grow linearly with batch size."""
        out = self._finalize(staged)
        f = staged.get("file")
        if isinstance(f, dict):
            f.pop("_device_waveform", None)
            f.pop("_longfile_uploads", None)
            if f.pop("_batch_decoded", None):
                f.pop("waveform", None)
                f.pop("sample_rate", None)
        return out

    def _finalize(self, staged: Dict[str, Any]
                  ) -> Union[DiarizeOutput, Annotation]:
        """Host half of ``apply``: sync, cluster, reconstruct, annotate."""
        file = staged["file"]
        hook = staged["hook"]
        num_speakers = staged["num_speakers"]
        min_speakers = staged["min_speakers"]
        max_speakers = staged["max_speakers"]
        segmentations = staged["segmentations"]
        binarized_segmentations = staged["binarized"]
        device_fast = staged["device_fast"]

        if device_fast:
            (count, speaker_frames, _clean_frames, agg_offsets,
             agg_num_frames) = self._fetch_count_stats(
                staged["count_dispatch"])
            # clustering consumes these instead of re-reducing the full
            # score tensor on host (see BaseClustering.filter_embeddings)
            binarized_segmentations.precomputed_speaker_frames = \
                speaker_frames
            binarized_segmentations.precomputed_clean_frames = \
                _clean_frames
        else:
            count = staged["count"]
        hook("speaker_counting", count)

        # early exit on silent files
        if np.nanmax(count.data) == 0.0:
            empty = Annotation(uri=file["uri"])
            output = DiarizeOutput(
                speaker_diarization=empty,
                exclusive_speaker_diarization=Annotation(uri=file["uri"]),
                speaker_embeddings=np.zeros(
                    (0, self._embedding.dimension
                     if self._embedding else 0)))
            return output.speaker_diarization if self.legacy else output

        embeddings = staged["embeddings"]
        if isinstance(embeddings, _DeferredEmbeddings):
            embeddings = embeddings.fetch()
        if embeddings is not None:
            hook("embeddings", embeddings)

        hard_clusters, _, centroids = self.clustering(
            embeddings=embeddings,
            segmentations=binarized_segmentations,
            num_clusters=num_speakers,
            min_clusters=min_speakers,
            max_clusters=max_speakers,
            file=file,
            frames=self._segmentation.model.receptive_field)

        num_different_speakers = int(np.max(hard_clusters)) + 1
        if num_different_speakers < min_speakers or \
                num_different_speakers > max_speakers:
            warnings.warn(textwrap.dedent(
                f"""
                The detected number of speakers ({num_different_speakers})
                for {file['uri']} is outside the given bounds
                [{min_speakers}, {max_speakers}]. The audio file may be too
                short for {min_speakers} speakers.
                """))

        count.data = np.minimum(count.data, max_speakers).astype(np.int8)

        if device_fast:
            inactive_speakers = speaker_frames == 0
        else:
            inactive_speakers = \
                np.sum(binarized_segmentations.data, axis=1) == 0
        hard_clusters[inactive_speakers] = -2

        if device_fast:
            # one dispatch produces both the normal and the exclusive
            # discrete diarization; scores never leave HBM
            discrete_diarization, exclusive_discrete = \
                self._device_reconstruct(segmentations, hard_clusters,
                                         count, agg_offsets,
                                         agg_num_frames)
            hook("discrete_diarization", discrete_diarization)
            diarization = self.to_annotation(
                discrete_diarization, min_duration_on=0.0,
                min_duration_off=self.segmentation.min_duration_off)
            diarization.uri = file["uri"]
            exclusive_diarization = self.to_annotation(
                exclusive_discrete, min_duration_on=0.0,
                min_duration_off=self.segmentation.min_duration_off)
            exclusive_diarization.uri = file["uri"]
        else:
            discrete_diarization = self.reconstruct(
                segmentations, hard_clusters, count)
            hook("discrete_diarization", discrete_diarization)
            diarization = self.to_annotation(
                discrete_diarization, min_duration_on=0.0,
                min_duration_off=self.segmentation.min_duration_off)
            diarization.uri = file["uri"]

            # exclusive variant: at most one active speaker at a time
            count.data = np.minimum(count.data, 1).astype(np.int8)
            exclusive_discrete = self.reconstruct(
                segmentations, hard_clusters, count)
            exclusive_diarization = self.to_annotation(
                exclusive_discrete, min_duration_on=0.0,
                min_duration_off=self.segmentation.min_duration_off)
            exclusive_diarization.uri = file["uri"]

        if "annotation" in file and file["annotation"]:
            _, mapping = self.optimal_mapping(
                file["annotation"], diarization, return_mapping=True)
            mapping = {key: mapping.get(key, key)
                       for key in diarization.labels()}
        else:
            mapping = {label: expected for label, expected in
                       zip(diarization.labels(), self.classes())}
        diarization = diarization.rename_labels(mapping=mapping)
        exclusive_diarization = exclusive_diarization.rename_labels(
            mapping=mapping)

        if centroids is None:
            output = DiarizeOutput(
                speaker_diarization=diarization,
                exclusive_speaker_diarization=exclusive_diarization,
                speaker_embeddings=None)
            return output.speaker_diarization if self.legacy else output

        if len(diarization.labels()) > centroids.shape[0]:
            centroids = np.pad(
                centroids,
                ((0, len(diarization.labels()) - centroids.shape[0]),
                 (0, 0)))
        inverse_mapping = {label: index
                           for index, label in mapping.items()}
        centroids = centroids[
            [inverse_mapping[label] for label in diarization.labels()]]

        output = DiarizeOutput(
            speaker_diarization=diarization,
            exclusive_speaker_diarization=exclusive_diarization,
            speaker_embeddings=centroids)
        return output.speaker_diarization if self.legacy else output

    def get_metric(self):
        from ..metrics.der import GreedyDiarizationErrorRate
        return GreedyDiarizationErrorRate(**self.der_variant)
