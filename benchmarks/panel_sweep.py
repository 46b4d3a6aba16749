"""Sweep shared-trunk panel geometry on TPU (one config per run).

Halo overhead is 2*halo/(core+2*halo) of trunk compute; bigger cores
waste less but compile a bigger executable and quantize worse at file
tails. Run one config per process (remote compiles dominate; the
compilation cache keeps repeats cheap):

    python benchmarks/panel_sweep.py --core 512 --pbatch 8
    python benchmarks/panel_sweep.py --core 1024 --pbatch 8
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

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--core", type=int, default=512)
    ap.add_argument("--halo", type=int, default=64)
    ap.add_argument("--pbatch", type=int, default=8)
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--files", type=int, default=3)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--seg-bs", type=int, default=256)
    ap.add_argument("--emb-bs", type=int, default=256)
    args = ap.parse_args()

    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    SpeakerDiarization.TRUNK_PANEL_CORE = args.core
    SpeakerDiarization.TRUNK_PANEL_HALO = args.halo
    SpeakerDiarization.TRUNK_PANEL_BATCH = args.pbatch

    sr = 16000
    paths = []
    for k in range(args.files):
        rng = np.random.default_rng(k)
        n = int(args.minutes * 60 * sr)
        t = np.arange(n) / sr
        wav = 0.003 * rng.standard_normal(n).astype(np.float32)
        for i, start in enumerate(
                np.arange(0.0, args.minutes * 60 - 5.0, 7.0)):
            f0 = [140.0, 210.0, 320.0][(i + k) % 3]
            i0, i1 = int(start * sr), int((start + 5.0) * sr)
            wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0 * t[i0:i1])
                           ).astype(np.float32)
        wav = (np.round(wav * 32768.0).clip(-32768, 32767)
               / np.float32(32768.0)).astype(np.float32)
        p = f"/tmp/pat_panel_{k}.wav"
        write_wav(p, wav[None], sr)
        paths.append(p)

    seg = PyanNet()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    seg.build()
    emb = WeSpeakerResNet34()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=args.seg_bs,
        embedding_batch_size=args.emb_bs)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    def batch():
        return [{"audio": p, "uri": f"s{k}"}
                for k, p in enumerate(paths)]

    pipeline(batch(), max_speakers=4)   # warmup/compile
    audio_hours = args.files * args.minutes / 60.0
    times = []
    for _ in range(args.passes):
        t0 = time.perf_counter()
        pipeline(batch(), max_speakers=4)
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "core": args.core, "halo": args.halo, "pbatch": args.pbatch,
        "seg_bs": args.seg_bs, "emb_bs": args.emb_bs,
        "seconds_per_audio_hour": round(min(times) / audio_hours, 2),
    }))


if __name__ == "__main__":
    main()
