"""Benchmark: audio-hours diarized per minute per chip.

Runs the full diarization pipeline (PyanNet powerset segmentation +
WeSpeaker-ResNet34 embeddings + clustering) on synthetic audio on the real
chip, end to end — decode, chunking, NN, powerset decode, counting,
embeddings, clustering, reconstruction — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: community-1 at 31 s per audio-hour on one H100 (BASELINE.md)
= 60/31 audio-hours per minute; vs_baseline = ours / that.
"""

from __future__ import annotations

import json
import os
import time

# persistent compile cache: cold processes reuse previous executables
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    audio_minutes = float(os.environ.get("BENCH_AUDIO_MINUTES", "10"))
    num_files = int(os.environ.get("BENCH_NUM_FILES", "3"))
    # file-LENGTH diversity (round-2 review): the batch exercises several
    # shape buckets + the half-size tail batch, not 3x the same length.
    # Round 4: the default mix leads with a 60-MINUTE file — the
    # reference baseline's speed rows are ~1h files and the north star
    # is "diarize 1 hour in <5 s", so the headline artifact must measure
    # that length, not extrapolate from 10-min files (VERDICT r3 item 1;
    # first hour-scale measurement: 6.67 s wall in a LOADED window,
    # relay_probe 24 ms). Override with BENCH_FILE_MINUTES="10,10,10"
    # for a uniform batch. Explicit BENCH_AUDIO_MINUTES (the legacy
    # knob) without BENCH_FILE_MINUTES keeps its old meaning.
    lengths_env = os.environ.get("BENCH_FILE_MINUTES")
    if lengths_env is None:
        lengths_env = ",".join([str(audio_minutes)] * num_files) \
            if "BENCH_AUDIO_MINUTES" in os.environ else "60,20,10"
    file_minutes = [float(x) for x in lengths_env.split(",") if x]
    while len(file_minutes) < num_files:
        file_minutes.append(audio_minutes)
    file_minutes = file_minutes[:num_files]
    sr = 16000

    def synth(minutes: float, seed: int) -> np.ndarray:
        """Synthetic "conversation": harmonic speakers + silences."""
        rng = np.random.default_rng(seed)
        n = int(minutes * 60 * sr)
        t = np.arange(n) / sr
        wav = 0.003 * rng.standard_normal(n).astype(np.float32)
        segment = 5.0
        for i, start in enumerate(np.arange(0.0, minutes * 60 - segment,
                                            7.0)):
            f0 = [140.0, 210.0, 320.0][(i + seed) % 3]
            i0, i1 = int(start * sr), int((start + segment) * sr)
            tt = t[i0:i1]
            wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0 * tt)
                           * (0.5 + 0.5 * np.abs(
                               np.sin(2 * np.pi * 3 * tt)))
                           ).astype(np.float32)
        return np.round(wav * 32768.0).clip(-32768, 32767).astype(
            np.float32) / np.float32(32768.0)

    # real files are PCM16 on disk: write them and benchmark the full path
    # (C++ WAV decode -> int16 device upload -> pipeline). Multi-file =
    # production serving shape: the streaming _apply_batch decodes file
    # N+1 while the device runs file N, amortizing the per-file leading
    # span. The in-memory float path is available via BENCH_IN_MEMORY=1.
    from pyannote_audio_tpu.core.io import write_wav
    paths = []
    for k in range(num_files):
        wav = synth(file_minutes[k], seed=k)
        path = f"/tmp/pyannote_tpu_bench_{k}.wav"
        write_wav(path, wav[None], sr)
        paths.append(path)

    seg_model = PyanNet()
    seg_model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2)
    seg_model.build()
    emb_model = WeSpeakerResNet34()
    emb_model.build()

    pipeline = SpeakerDiarization(
        segmentation=seg_model,
        embedding=emb_model,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256,
        embedding_batch_size=256,
    )
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1},
    })

    # pre-synthesize in-memory waveforms OUTSIDE the timed loop; timed
    # passes only rebuild the (shallow) file dicts so per-pass state
    # (device-buffer cache entries) never leaks between passes
    mem_waves = [synth(file_minutes[k], seed=k)[None]
                 for k in range(num_files)] \
        if os.environ.get("BENCH_IN_MEMORY", "0") == "1" else None

    def batch():
        if mem_waves is not None:
            return [{"waveform": w, "sample_rate": sr,
                     "uri": f"bench{k}"}
                    for k, w in enumerate(mem_waves)]
        return [{"audio": p, "uri": f"bench{k}"}
                for k, p in enumerate(paths)]

    # warmup (compile); steady-state throughput is what production sees —
    # executables persist within the process after the first file. One
    # untimed batch pass also initializes the C++ pre-decode pool and the
    # staged batch path before timing starts.
    pipeline({"audio": paths[0], "uri": "warmup"}, max_speakers=4)
    pipeline(batch(), max_speakers=4)

    # live-array HBM high-water DURING the timed passes — catches the
    # transient whole-file buffers (sinc features, fbank, trunk panels);
    # RESIDENT arrays only (XLA fusion scratch excluded; see the
    # analytic model below for what that floor is made of). Shared
    # sampler: benchmarks/hbm_sampler.py stamps the same
    # "live_arrays@20Hz" for every artifact.
    from benchmarks.hbm_sampler import HbmSampler
    sampler = HbmSampler().start()

    # best of 8: the TPU sits behind a shared pool/relay whose load varies
    # minute to minute (observed 13 -> 57 s/audio-hour on identical code);
    # the minimum reflects achievable hardware throughput, and passes are
    # cheap (~3-12 s) next to the compile budget
    times = []
    for _ in range(int(os.environ.get("BENCH_PASSES", "8"))):
        t0 = time.perf_counter()
        pipeline(batch(), max_speakers=4)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    sampled_peak = sampler.stop()

    # window calibration (VERDICT r3 item 3): latency + chained-matmul
    # TFLOP/s + upload bandwidth from the SHARED recipe module — one
    # "chained-v2" implementation for all three perf tools so stamped
    # probe_version rows stay comparable (see benchmarks/relay_probes.py
    # for the recipe rationale and the single-v1 provenance note)
    import jax
    from benchmarks.relay_probes import relay_probes
    BENCH_SCHEMA_VERSION = 2
    relay = relay_probes(reps=5)

    # analytic device FLOPs for the exact files processed (utils/flops.py,
    # XLA-cost-analysis-cross-checked) -> achieved TFLOP/s + MFU. The
    # pipeline is transport/latency-bound on the relay, so end-to-end MFU
    # is small by design; the per-stage numbers locate the compute.
    from pyannote_audio_tpu.utils.flops import (V5E_BF16_PEAK,
                                                diarization_device_flops,
                                                total_flops)
    per_file = [diarization_device_flops(m * 60.0) for m in file_minutes]
    flops = sum(total_flops(s) for s in per_file)
    stage_flops = {k: sum(s[k] for s in per_file)
                   for k in ("sinc_whole_conv", "segmentation", "fbank",
                             "trunk", "pool_and_embed")}
    achieved_tflops = flops / elapsed / 1e12
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS",
                                       V5E_BF16_PEAK / 1e12))
    # peak-HBM fallback chain (VERDICT r4 item 5): device memory_stats
    # (authoritative; axon returns nothing) -> live-array sampling
    # during the timed passes (resident arrays, no XLA scratch) ->
    # analytic resident-buffer model for the largest file. Stamp which
    # source produced the number so artifacts are self-describing.
    from pyannote_audio_tpu.utils.flops import \
        diarization_resident_hbm_bytes
    hbm_model = diarization_resident_hbm_bytes(max(file_minutes) * 60.0)
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak_hbm = int(stats.get("peak_bytes_in_use", 0)) or None
    except Exception:
        peak_hbm = None
    peak_hbm_source = "memory_stats"
    if peak_hbm is None and sampled_peak > 0:
        peak_hbm = sampled_peak
        from benchmarks.hbm_sampler import SOURCE as peak_hbm_source
    if peak_hbm is None:
        peak_hbm = hbm_model["total"]
        peak_hbm_source = "analytic"

    audio_hours = sum(file_minutes) / 60.0
    hours_per_minute = audio_hours / (elapsed / 60.0)
    # reference community-1 on H100: 31 s per audio-hour
    baseline_hours_per_minute = 60.0 / 31.0
    print(json.dumps({
        "metric": "audio-hours diarized per minute per chip",
        "value": round(hours_per_minute, 3),
        "unit": "audio_hours/min/chip",
        "vs_baseline": round(hours_per_minute / baseline_hours_per_minute,
                             3),
        "detail": {
            "file_minutes": file_minutes,
            "num_files": num_files,
            "wall_seconds": round(elapsed, 3),
            "seconds_per_audio_hour": round(elapsed / audio_hours, 2),
            "flops": flops,
            "stage_flops": stage_flops,
            "achieved_tflops": round(achieved_tflops, 3),
            "mfu": round(achieved_tflops / peak_tflops, 5),
            "peak_tflops_assumed": peak_tflops,
            "relay_probe_ms": relay["probe_ms"],
            "relay_matmul_tflops": relay["tflops"],
            "relay_upload_mb_per_s": relay["upload_mb_per_s"],
            "probe_version": relay["probe_version"],
            "bench_schema_version": BENCH_SCHEMA_VERSION,
            "peak_hbm_bytes": peak_hbm,
            "peak_hbm_source": peak_hbm_source,
            "analytic_resident_hbm": hbm_model,
            "pass_seconds": [round(t, 3) for t in times],
        },
    }))


if __name__ == "__main__":
    main()
