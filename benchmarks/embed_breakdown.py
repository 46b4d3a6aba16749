"""Micro-breakdown of the shared-trunk embedding stage on TPU.

The stage profile (profile_stages.py) attributes ~0.97 s of a 10-min
file to "embeddings", but a roofline estimate of the ResNet34 trunk is
~3 TFLOPs ~= tens of ms on a v5e.  This script times each device
program of the shared-trunk path separately (forced host sync after
each) to find where the time actually goes:

  upload        int16 host->device of the padded waveform
  whole_fbank   log-mel over the whole file (rfft, VPU)
  prepare       sliding CMN + halo padding (cumsum + gather)
  panel_trunk   the ResNet panels (MXU; N dispatches)
  gather_pool   per-chunk dynamic-slice + masked stats pool + seg_1

    python benchmarks/embed_breakdown.py [--minutes 10] [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")
# pin the transport so the 'upload' stage stays comparable across runs
# regardless of the backend's quantization default (mu-law on TPU)
os.environ.setdefault("PYANNOTE_TPU_UPLOAD_QUANT", "int16")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    from pyannote_audio_tpu.core.inference import (_chunk_grid,
                                                   _upload_waveform_cached)
    from pyannote_audio_tpu.ops.fbank import fbank_num_frames

    sr = 16000
    duration, step = 10.0, 1.0
    n = int(args.minutes * 60 * sr)
    rng = np.random.default_rng(0)
    wav = (0.05 * rng.standard_normal(n)).astype(np.float32)[None]

    seg_model = PyanNet()
    seg_model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=duration,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2)
    seg_model.build()
    emb_model = WeSpeakerResNet34()
    emb_model.build()
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256, embedding_batch_size=256)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    window_samples = round(duration * sr)
    step_samples = round(step * sr)
    grid_starts, padded_len = _chunk_grid(n, window_samples, step_samples,
                                          sr)
    num_chunks = len(grid_starts)
    if padded_len > wav.shape[1]:
        wav = np.pad(wav, ((0, 0), (0, padded_len - wav.shape[1])))

    fns = pipeline._make_shared_trunk_fns(window_samples,
                                          device_masks=True)
    compute_trunk, gather_pool_fn, geometry = fns

    emb = pipeline._embedding
    num_real_frames = fbank_num_frames(
        min(n, padded_len), emb.sample_rate, emb.frame_length,
        emb.frame_shift)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])

    def best_of(f, runs=args.runs):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = f()
            sync(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    timings = {}

    # upload (int16 path, no cache)
    def up():
        return _upload_waveform_cached(wav, None)
    timings["upload"], device_waveform = best_of(up)

    # full compute_trunk (fbank + prepare + panels)
    def trunk_all():
        return compute_trunk(device_waveform, num_real_frames)
    timings["compute_trunk_total"], trunk = best_of(trunk_all)

    # isolate fbank: jit the same fbank program
    from pyannote_audio_tpu.ops.fbank import fbank as fbank_op
    from pyannote_audio_tpu.core.inference import _to_pcm16_scale

    @jax.jit
    def whole_fbank(w):
        return fbank_op(_to_pcm16_scale(w[0]), sample_rate=emb.sample_rate,
                        num_mel_bins=emb.num_mel_bins,
                        frame_length=emb.frame_length,
                        frame_shift=emb.frame_shift,
                        window_type=emb.window_type)
    whole_fbank(device_waveform)  # compile
    timings["whole_fbank"], feats = best_of(
        lambda: whole_fbank(device_waveform))

    # masks + starts for gather_pool
    stride = geometry["stride"]
    tfpc = geometry["trunk_frames_per_chunk"]
    seg_frames = 589  # PyanNet frames for a 10 s chunk
    starts = np.round(np.arange(num_chunks) * step_samples).astype(
        np.int32)
    frame_shift_samples = int(sr * emb.frame_shift * 0.001)
    starts_tf = ((starts // frame_shift_samples) // stride).astype(
        np.int32)
    B = 256
    num_batches = -(-num_chunks // B)
    pad = num_batches * B - num_chunks
    starts_tf = np.pad(starts_tf, (0, pad))
    all_masks = jnp.asarray(
        rng.random((num_batches * B, 3, seg_frames), dtype=np.float32))

    def pool_all():
        outs = []
        for b in range(num_batches):
            outs.append(gather_pool_fn(
                emb.params, trunk,
                jnp.asarray(starts_tf[b * B:(b + 1) * B]), all_masks,
                np.int32(b * B)))
        return outs[-1]
    pool_all()  # compile
    timings[f"gather_pool_x{num_batches}"], _ = best_of(pool_all)

    # panel trunk alone = compute_trunk_total - fbank - prepare; also
    # time prepare via a standalone jit of the same math
    timings["panel_trunk_est"] = round(
        timings["compute_trunk_total"] - timings["whole_fbank"], 4)

    total = (timings["upload"] + timings["compute_trunk_total"]
             + timings[f"gather_pool_x{num_batches}"])
    print(json.dumps({
        "audio_minutes": args.minutes,
        "num_chunks": int(num_chunks),
        "trunk_frames_per_chunk": int(tfpc),
        "stride": int(stride),
        "timings_s": {k: round(v, 4) for k, v in timings.items()},
        "embed_stage_s": round(total, 4),
        "s_per_audio_hour": round(total / (args.minutes / 60.0), 3),
    }, indent=2))


if __name__ == "__main__":
    main()
