"""Multi-hour single-file diarization on one chip at bounded HBM.

VERDICT r4 item 4's acceptance run: a file far beyond the whole-file
HBM ceiling (~2 h at the default 6 GB resident budget) diarizes on one
chip through the bounded-HBM slice path (core/longfile.py), with the
live-array HBM high-water recorded DURING the passes to show memory
stays flat instead of scaling with duration. Output equality of the
slice path is pinned on CPU by tests/test_longfile.py; this run is the
scale + memory evidence on real hardware.

    python benchmarks/longfile_tpu.py --hours 4 --out LONGFILE_r05.json
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

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def build_file(hours: float, sr: int = 16000) -> str:
    path = Path(f"/tmp/pat_longfile_{hours:g}h.wav")
    if path.exists():
        return str(path)
    rng = np.random.default_rng(0)
    n = int(hours * 3600 * sr)
    wav = 0.003 * rng.standard_normal(n).astype(np.float32)
    t = np.arange(sr * 5) / sr
    for i, start in enumerate(np.arange(0.0, hours * 3600 - 5.0, 7.0)):
        f0 = [140.0, 210.0, 320.0][i % 3]
        i0 = int(start * sr)
        wav[i0:i0 + sr * 5] += (0.2 * np.sin(2 * np.pi * f0 * t)
                                ).astype(np.float32)
    wav = (np.round(wav * 32768.0).clip(-32768, 32767)
           / np.float32(32768.0)).astype(np.float32)
    from pyannote_audio_tpu.core.io import write_wav
    write_wav(path, wav[None], sr)
    return str(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=4.0)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--out", default="/tmp/pat_longfile_tpu.json")
    args = ap.parse_args()

    from benchmarks.relay_probes import relay_probes
    from pyannote_audio_tpu.core.longfile import (plan_slices,
                                                  segment_minutes)
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    path = build_file(args.hours)

    seg = PyanNet()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2)
    seg.build()
    emb = WeSpeakerResNet34()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256, embedding_batch_size=256)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    sr = 16000
    n = int(args.hours * 3600 * sr)
    minutes = segment_minutes(args.hours * 3600.0, sr)
    window, step = 10 * sr, 1 * sr
    starts = np.arange(0, max(1, n - window + step), step,
                       dtype=np.int64)
    plan = plan_slices(n, window, step, sr, starts)
    print(f"slice plan: {None if plan is None else len(plan)} slices "
          f"of ~{minutes} min", flush=True)

    from benchmarks.hbm_sampler import SOURCE, HbmSampler

    probes_before = relay_probes()
    sampler = HbmSampler().start()

    file = {"audio": path, "uri": "longfile"}
    walls = []
    for i in range(args.passes):
        t0 = time.perf_counter()
        out = pipeline(dict(file), max_speakers=4)
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"pass {i}: {walls[-1]} s "
              f"({walls[-1] / args.hours:.2f} s/audio-hour), "
              f"labels={len(out.speaker_diarization.labels())}",
              flush=True)
    peak_hbm = sampler.stop()
    probes_after = relay_probes()

    from pyannote_audio_tpu.utils.flops import \
        diarization_resident_hbm_bytes
    report = {
        "hours": args.hours,
        "walls_s": walls,
        "best_wall_s": min(walls[1:]) if len(walls) > 1 else walls[0],
        "seconds_per_audio_hour": round(min(walls[1:] or walls)
                                        / args.hours, 2),
        "slices": None if plan is None else len(plan),
        "slice_minutes": minutes,
        "hbm_budget_gb": float(os.environ.get(
            "PYANNOTE_TPU_HBM_BUDGET_GB", "6.0")),
        "peak_hbm_bytes": peak_hbm,
        "peak_hbm_source": SOURCE,
        "analytic_whole_file_hbm":
            diarization_resident_hbm_bytes(args.hours * 3600.0)["total"],
        "relay_before": probes_before,
        "relay_after": probes_after,
    }
    text = json.dumps(report, indent=1)
    print(text)
    Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()
