"""Speech separation pipeline (PixIT inference).

Parity: /root/reference/src/pyannote/audio/pipelines/speech_separation.py
(SpeechSeparation :61-733): joint diarization + per-speaker source
reconstruction — sliding-window ToTaToNet inference produces (diarization
scores, separated sources) per chunk; diarization follows the standard
count-constrained reconstruction; clustered sources are overlap-added per
global speaker, leakage is suppressed where the speaker is inactive
(binary dilation), and sources are SI-SDR-preserving renormalized.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np
from scipy.ndimage import binary_dilation

from ..core.annotation import Annotation
from ..core.inference import Inference
from ..core.io import Audio, AudioFile
from ..core.model import Model
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..core.pipeline import Pipeline
from ..utils.signal import binarize_swf
from .clustering import Clustering
from .parameter import Categorical, ParamDict, Parameter, Uniform
from .speaker_diarization import (DiarizeOutput, EmbeddingHotPathMixin,
                                  batchify)  # noqa: F401 — re-export:
# the reference defines batchify in BOTH pipeline modules; one impl here
from .utils.diarization import SpeakerDiarizationMixin, set_num_speakers
from .utils.getter import PipelineModel, get_model


class SeparationOutput(DiarizeOutput):
    """DiarizeOutput + per-speaker sources (num_samples, num_speakers)."""

    def __init__(self, speaker_diarization, exclusive_speaker_diarization,
                 speaker_embeddings=None, sources=None):
        super().__init__(speaker_diarization,
                         exclusive_speaker_diarization,
                         speaker_embeddings)
        self.sources = sources


class SpeechSeparation(SpeakerDiarizationMixin, EmbeddingHotPathMixin,
                       Pipeline):
    def __init__(
        self,
        segmentation: PipelineModel = None,
        embedding: PipelineModel = None,
        clustering: str = "AgglomerativeClustering",
        segmentation_step: float = 0.1,
        embedding_batch_size: int = 32,
        segmentation_batch_size: int = 32,
        der_variant: Optional[dict] = None,
        token=None,
        cache_dir=None,
        **kwargs,
    ):
        super().__init__()
        self.segmentation_model = segmentation
        self.segmentation_step = segmentation_step
        self.embedding = embedding
        self.embedding_batch_size = embedding_batch_size
        self.klustering = clustering
        self.der_variant = der_variant or {"collar": 0.0,
                                           "skip_overlap": False}

        model: Model = get_model(segmentation, token=token,
                                 cache_dir=cache_dir)
        specs = model.specifications
        spec = specs[0] if isinstance(specs, tuple) else specs
        self._segmentation = Inference(
            model,
            duration=spec.duration,
            step=self.segmentation_step * spec.duration,
            skip_aggregation=True,
            batch_size=segmentation_batch_size,
        )
        self.segmentation = ParamDict(
            min_duration_off=Uniform(0.0, 1.0),
            threshold=Uniform(0.1, 0.9))
        # leakage-removal hyperparameters (parity: reference
        # speech_separation.py:193-196)
        self.separation = ParamDict(
            leakage_removal=Categorical([True, False]),
            asr_collar=Uniform(0.0, 1.0))
        self._embedding = get_model(
            embedding, token=token, cache_dir=cache_dir) \
            if embedding is not None else None
        self._audio = Audio(sample_rate=model.sample_rate, mono="downmix")

        Klustering = Clustering[clustering]
        self.clustering = Klustering.value(metric="cosine")
        self._expects_num_speakers = self.clustering.expects_num_clusters
        self.mesh = None
        self._powerset = False
        self._jitted_embedding_batch = None

    def default_parameters(self):
        return {"segmentation": {"min_duration_off": 0.0,
                                 "threshold": 0.5},
                "separation": {"leakage_removal": True,
                               "asr_collar": 0.1},
                "clustering": {"method": "centroid", "threshold": 0.6,
                               "min_cluster_size": 1}}

    def classes(self):
        i = 0
        while True:
            yield f"SPEAKER_{i:02d}"
            i += 1

    def setup_hook(self, file, hook=None) -> Callable:
        if hook is None:
            return lambda *a, **k: None
        return functools.partial(hook, file=file)

    def apply(
        self,
        file: AudioFile,
        num_speakers: Optional[int] = None,
        min_speakers: Optional[int] = None,
        max_speakers: Optional[int] = None,
        hook: Optional[Callable] = None,
        **kwargs,
    ):
        hook = self.setup_hook(file, hook=hook)
        num_speakers, min_speakers, max_speakers = set_num_speakers(
            num_speakers=num_speakers, min_speakers=min_speakers,
            max_speakers=max_speakers)

        waveform, sample_rate = self._audio(file)
        num_samples = waveform.shape[1]

        # sliding-window joint inference: model returns (diar, sources).
        # TPU-native hot path: the (padded) waveform is uploaded ONCE and
        # chunks are gathered in-jit with a vmapped dynamic_slice — the
        # host never ships the ~10x-overlapping chunk tensor, and the
        # separated sources stay in HBM until the final per-speaker
        # overlap-add (the reference materializes every chunk on host,
        # speech_separation.py:~520-560).
        import jax
        import jax.numpy as jnp

        from ..core.inference import (_chunk_grid, _dequantize,
                                      _starts_i32,
                                      _upload_waveform_cached)
        from collections.abc import MutableMapping

        model = self._segmentation.model
        duration = self._segmentation.duration
        step = self._segmentation.step
        window_size = round(duration * sample_rate)
        step_size = round(step * sample_rate)
        starts_np, padded_len = _chunk_grid(num_samples, window_size,
                                            step_size, sample_rate)
        starts = [int(s) for s in _starts_i32(starts_np, window_size)]
        padded = waveform
        if padded_len > num_samples:
            padded = np.pad(waveform,
                            ((0, 0), (0, padded_len - num_samples)))
        cache = file if isinstance(file, MutableMapping) else None
        # separation's product IS audio: force bit-exact transport so the
        # accelerator mu-law default can never cap source fidelity at
        # companded 8 bits (core/inference.py:_upload_quant_mode)
        device_waveform = _upload_waveform_cached(padded, cache,
                                                  quant="int16")

        if getattr(self, "_jitted_sep_batch", None) is None:
            module = model.module

            def gather_forward(params, wav, batch_starts):
                def get(s):
                    return jax.lax.dynamic_slice(
                        wav, (0, s), (wav.shape[0], window_size))
                chunks = _dequantize(jax.vmap(get)(batch_starts))
                return module.apply(params, chunks)
            self._jitted_sep_batch = jax.jit(gather_forward)

        # batched forward with a fixed batch shape (one executable);
        # per-batch outputs stay on device — one diar download after the
        # loop, sources not until the clustered overlap-add
        B = getattr(self._segmentation, "batch_size", 32)
        diar_parts, source_parts = [], []
        for b in range(0, len(starts), B):
            batch_starts = np.asarray(starts[b:b + B], np.int32)
            n_real = len(batch_starts)
            if n_real < B:
                batch_starts = np.pad(batch_starts, (0, B - n_real))
            diar, sources = self._jitted_sep_batch(
                model.params, device_waveform, jnp.asarray(batch_starts))
            diar_parts.append(diar[:n_real])
            source_parts.append(sources[:n_real])
        diar_chunks = np.asarray(
            jnp.concatenate(diar_parts, axis=0)
            if len(diar_parts) > 1 else diar_parts[0])
        source_chunks_dev = jnp.concatenate(source_parts, axis=0) \
            if len(source_parts) > 1 else source_parts[0]
        segmentations = SlidingWindowFeature(
            diar_chunks,
            SlidingWindow(start=0.0, duration=duration, step=step))
        hook("segmentation", segmentations)

        binarized = binarize_swf(segmentations,
                                 onset=self.segmentation.threshold,
                                 initial_state=False)
        count = self.speaker_count(binarized, model.receptive_field,
                                   warm_up=(0.0, 0.0))
        hook("speaker_counting", count)

        if np.nanmax(count.data) == 0.0:
            empty = Annotation(uri=file["uri"])
            return SeparationOutput(empty, Annotation(uri=file["uri"]),
                                    None,
                                    np.zeros((num_samples, 0)))

        # cluster local sources into global speakers using diarization
        # activity patterns as "embeddings" when no embedding model given
        num_chunks, num_frames, local = binarized.data.shape
        if self._embedding is not None:
            embeddings = self.get_embeddings(
                file, binarized, exclude_overlap=False, hook=hook)
        else:
            embeddings = np.transpose(binarized.data, (0, 2, 1))
        hard_clusters, _, centroids = self.clustering(
            embeddings=embeddings, segmentations=binarized,
            num_clusters=num_speakers, min_clusters=min_speakers,
            max_clusters=max_speakers, file=file,
            frames=model.receptive_field)

        count.data = np.minimum(count.data, max_speakers).astype(np.int8)
        inactive = np.sum(binarized.data, axis=1) == 0
        hard_clusters[inactive] = -2

        from .speaker_diarization import SpeakerDiarization as _SD
        discrete = _SD.reconstruct(self, segmentations, hard_clusters,
                                   count)
        diarization = self.to_annotation(
            discrete, min_duration_on=0.0,
            min_duration_off=self.segmentation.min_duration_off)
        diarization.uri = file["uri"]

        count.data = np.minimum(count.data, 1).astype(np.int8)
        exclusive = self.to_annotation(
            _SD.reconstruct(self, segmentations, hard_clusters, count),
            min_duration_on=0.0,
            min_duration_off=self.segmentation.min_duration_off)
        exclusive.uri = file["uri"]

        # overlap-add clustered sources per global speaker — ON DEVICE:
        # each chunk's (win, local) sources project onto global clusters
        # with a one-hot of its hard assignments (negative = dropped),
        # then scatter-add at the chunk offset. Only the final
        # (num_samples, num_clusters) matrix crosses to host, not the
        # ~10x-overlapping chunk tensor.
        num_clusters = int(np.max(hard_clusters)) + 1

        if getattr(self, "_jitted_overlay", None) is None:
            def overlay(src, onehot, starts_arr, total):
                K = onehot.shape[2]
                win = src.shape[1]

                def body(carry, x):
                    srcs, wts = carry
                    chunk, oh, s = x
                    contrib = chunk @ oh                      # (win, K)
                    wrow = jnp.broadcast_to(oh.sum(axis=0)[None, :],
                                            (win, K))
                    cur = jax.lax.dynamic_slice(srcs, (s, 0), (win, K))
                    srcs = jax.lax.dynamic_update_slice(
                        srcs, cur + contrib, (s, 0))
                    curw = jax.lax.dynamic_slice(wts, (s, 0), (win, K))
                    wts = jax.lax.dynamic_update_slice(
                        wts, curw + wrow, (s, 0))
                    return (srcs, wts), None

                init = (jnp.zeros((total, K), jnp.float32),
                        jnp.zeros((total, K), jnp.float32))
                (srcs, wts), _ = jax.lax.scan(
                    body, init, (src, onehot, starts_arr))
                return srcs, wts
            self._jitted_overlay = jax.jit(
                overlay, static_argnames=("total",))

        onehot = jax.nn.one_hot(jnp.asarray(hard_clusters), num_clusters,
                                dtype=jnp.float32)  # (C, local, K)
        srcs_dev, wts_dev = self._jitted_overlay(
            source_chunks_dev, onehot,
            jnp.asarray(np.asarray(starts, np.int32)), total=padded_len)
        sources, weight = jax.device_get((srcs_dev, wts_dev))
        sources = sources[:num_samples] \
            / np.maximum(weight[:num_samples], 1.0)

        # leakage removal: zero a speaker's source where inactive,
        # dilated by the tunable asr_collar (parity: reference
        # speech_separation.py:631-654; hyperparameters
        # separation.leakage_removal / separation.asr_collar)
        sep_params = self.separation   # _DotDict after instantiate,
        leakage_removal = sep_params.get("leakage_removal")  # ParamDict before
        asr_collar = sep_params.get("asr_collar")
        if isinstance(leakage_removal, Parameter) or \
                leakage_removal is None:
            leakage_removal = True     # defaults when un-instantiated
        if isinstance(asr_collar, Parameter) or asr_collar is None:
            asr_collar = 0.1
        sources = _apply_leakage_mask(
            sources, diarization, sample_rate,
            leakage_removal=bool(leakage_removal),
            asr_collar=float(asr_collar))

        # separated sources may be scaled arbitrarily (SI-SDR training is
        # scale-invariant) — peak-normalize per speaker (parity:
        # reference speech_separation.py:656-660)
        sources = sources / (
            np.max(np.abs(sources), axis=0, keepdims=True) + 1e-8)

        # label mapping (parity: reference speech_separation.py:672-692):
        # against a provided reference annotation, map hypothesis speakers
        # onto reference names (extra speakers keep their own label);
        # otherwise rename in NUMERIC cluster order so that SPEAKER_{i:02d}
        # follows cluster order — labels() sorts by str ('10' < '2'), so
        # the mapping must use the numeric order
        numeric_labels = sorted(
            int(label) for label in diarization.labels()
            if isinstance(label, (int, np.integer)))
        from collections.abc import Mapping as _Mapping
        if isinstance(file, _Mapping) and file.get("annotation"):
            _, mapping = self.optimal_mapping(
                file["annotation"], diarization, return_mapping=True)
            mapping = {label: mapping.get(label, label)
                       for label in diarization.labels()}
        else:
            names = self.classes()
            mapping = {label: next(names) for label in numeric_labels}
        diarization = diarization.rename_labels(mapping=mapping)
        exclusive = exclusive.rename_labels(mapping=mapping)

        # re-order sources and centroids to diarization.labels() order
        # (reference speech_separation.py:700-728); centroids are padded
        # with zero rows when clustering returned fewer rows than the
        # final label count
        inverse_mapping = {new: old for old, new in mapping.items()}
        order = [int(inverse_mapping[label])
                 for label in diarization.labels()]
        if order:
            # count-constrained reconstruction can emit more speakers
            # than clusters; pad dummy zero sources like the reference
            # (speech_separation.py:619-624) before re-ordering
            need_src = max(order) + 1
            if need_src > sources.shape[1]:
                sources = np.pad(
                    sources, ((0, 0), (0, need_src - sources.shape[1])))
            sources = sources[:, order]
            if centroids is not None:
                # cluster ids can be sparse here (inactive clusters keep
                # their id), so pad to the highest referenced row
                need = max(order) + 1
                if need > centroids.shape[0]:
                    centroids = np.pad(
                        centroids,
                        ((0, need - centroids.shape[0]), (0, 0)))
                centroids = centroids[order]

        return SeparationOutput(diarization, exclusive, centroids, sources)

    def get_metric(self):
        """Optimization metric (parity: speech_separation.py:732-733)."""
        from ..metrics.der import GreedyDiarizationErrorRate
        return GreedyDiarizationErrorRate(**self.der_variant)


def _apply_leakage_mask(sources: np.ndarray, diarization,
                        sample_rate: int, leakage_removal: bool = True,
                        asr_collar: float = 0.1) -> np.ndarray:
    """Zero each speaker's source where that speaker is inactive.

    Activity comes from the (renamed-label-free, integer-labelled)
    diarization; inactivity is dilated by ``asr_collar`` seconds on each
    side before zeroing (parity: reference speech_separation.py:631-654,
    hyperparameters separation.leakage_removal / separation.asr_collar).
    """
    if not leakage_removal:
        return sources
    num_samples, num_clusters = sources.shape
    collar = int(round(asr_collar * sample_rate))
    out = sources.copy()
    for k in range(num_clusters):
        active = np.zeros(num_samples, dtype=bool)
        for seg, _, lbl in diarization.itertracks(yield_label=True):
            if lbl == k:
                i0 = int(seg.start * sample_rate)
                i1 = int(seg.end * sample_rate)
                active[max(0, i0):min(num_samples, i1)] = True
        if collar > 0:
            active = binary_dilation(active, structure=np.ones(2 * collar))
        out[~active, k] = 0.0
    return out
