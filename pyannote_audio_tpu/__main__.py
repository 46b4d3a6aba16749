"""Command-line interface: apply / benchmark / optimize / strip / export / download / serve.

Parity: /root/reference/src/pyannote/audio/__main__.py (typer app with the
same five commands; argparse here — typer is not in the image). Outputs
mirror the reference: per-file RTTM + JSON, DER report CSV/TXT, timing
yaml with seconds_per_hour and times_faster_than_realtime
(__main__.py:736-765), speaker-count confusion matrix (:778-812).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from enum import Enum
from pathlib import Path
from typing import Optional

import numpy as np
import yaml


class Subset(str, Enum):
    """Parity: Subset (reference __main__.py:53-56)."""
    train = "train"
    development = "development"
    test = "test"


class Device(str, Enum):
    """Parity: Device (reference __main__.py:59-63); MPS/CUDA do not
    exist on this stack — TPU replaces them."""
    CPU = "cpu"
    TPU = "tpu"
    AUTO = "auto"


class NumSpeakers(str, Enum):
    """Parity: NumSpeakers (reference __main__.py:66-68)."""
    ORACLE = "oracle"
    AUTO = "auto"


class Metric(str, Enum):
    """Parity: Metric (reference __main__.py:71-82)."""
    DiarizationErrorRate = "DiarizationErrorRate"
    JaccardErrorRate = "JaccardErrorRate"

    @classmethod
    def from_str(cls, metric: str, collar: float = 0.0,
                 skip_overlap: bool = False):
        """String -> accumulating metric instance."""
        from .metrics.der import DiarizationErrorRate, JaccardErrorRate
        if metric == "DiarizationErrorRate":
            return DiarizationErrorRate(collar=collar,
                                        skip_overlap=skip_overlap)
        if metric == "JaccardErrorRate":
            return JaccardErrorRate(collar=collar,
                                    skip_overlap=skip_overlap)
        raise ValueError(f"unknown metric {metric!r}")


def parse_device(device) -> str:
    """'auto' -> 'tpu' when an accelerator is attached, else 'cpu'.

    Parity: parse_device (reference __main__.py:85-96), with jax
    platforms instead of torch devices.
    """
    value = device.value if isinstance(device, Device) else str(device)
    if value == "auto":
        import jax
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        return "cpu" if platform == "cpu" else "tpu"
    return value


def get_diarization(prediction):
    """Extract the speaker-diarization Annotation from a pipeline output.

    Parity: get_diarization (reference __main__.py:99-117).
    """
    from .core.annotation import Annotation
    if isinstance(prediction, Annotation):
        return prediction
    if hasattr(prediction, "speaker_diarization"):
        return prediction.speaker_diarization
    raise ValueError(
        f"cannot extract a diarization from {type(prediction).__name__} — "
        "expected an Annotation or an object with a .speaker_diarization")


class MinDurationOffOptimizer:
    """Find the best `min_duration_off` collar post hoc.

    Parity: MinDurationOffOptimizer (reference __main__.py:430-510):
    hypothesis.support(collar) fills within-speaker gaps; bounded scalar
    minimization over the collar with a forced no-collar baseline; the
    best post-processed diarization is stored back on each file dict as
    'best_speaker_diarization'.
    """

    def _compute_metric(self, files, metric, collar: float) -> float:
        metric.reset()
        for file in files:
            file["temporary_speaker_diarization"] = \
                file["speaker_diarization"].support(collar=collar)
            metric(file["annotation"],
                   file["temporary_speaker_diarization"],
                   uem=file.get("annotated"))
        self._reports[collar] = metric.report()
        current = abs(metric)
        if current < self._best_metric:
            self._best_metric = current
            for file in files:
                file["best_speaker_diarization"] = file.pop(
                    "temporary_speaker_diarization")
        return current

    def __call__(self, files, metric, bounds=(0.0, 1.0)):
        from functools import partial

        from scipy.optimize import minimize_scalar

        self._best_metric = float("inf")
        self._reports = {}
        no_collar = self._compute_metric(files, metric, 0.0)
        res = minimize_scalar(partial(self._compute_metric, files, metric),
                              bounds=bounds, method="Bounded")
        best = 0.0 if no_collar == self._best_metric else float(res.x)
        return best, self._reports[best]


def _load_pipeline(pipeline_path: str, device: Optional[str] = None,
                   revision: Optional[str] = None,
                   token: Optional[str] = None,
                   cache: Optional[str] = None):
    from .core.pipeline import Pipeline
    if cache:
        os.environ["PYANNOTE_TPU_CACHE"] = cache
    pipeline = Pipeline.from_pretrained(pipeline_path, revision=revision,
                                        token=token)
    if pipeline is None:
        raise SystemExit(f"could not load pipeline from {pipeline_path}")
    if device:
        pipeline.to(parse_device(device))
    return pipeline


def _audio_files(path: Path):
    if path.is_dir():
        return sorted(p for p in path.rglob("*.wav"))
    return [path]


def cmd_apply(args) -> int:
    """Apply a pipeline to audio file(s); write RTTM + JSON.

    Multiple inputs go through the pipelined batch apply (parallel
    pre-decode + device-work staging) instead of one file at a time.
    """
    pipeline = _load_pipeline(args.pipeline, device=args.device,
                              revision=getattr(args, 'revision', None),
                              token=getattr(args, 'token', None),
                              cache=getattr(args, 'cache', None))
    into = Path(args.into) if args.into else None
    if into:
        into.mkdir(parents=True, exist_ok=True)
    audios = list(_audio_files(Path(args.audio)))
    stems = [a.stem for a in audios]
    if len(audios) > 1 and len(set(stems)) == len(stems):
        outputs = pipeline([str(a) for a in audios])
    else:
        # duplicate stems (same name in different subdirs) would trip
        # the batch's unique-URI check; process those sequentially
        outputs = [pipeline(str(a)) for a in audios]
    for audio, output in zip(audios, outputs):
        annotation = getattr(output, "speaker_diarization", output)
        if into:
            with open(into / f"{audio.stem}.rttm", "w") as f:
                annotation.write_rttm(f)
            if hasattr(output, "serialize"):
                with open(into / f"{audio.stem}.json", "w") as f:
                    json.dump(output.serialize(), f, indent=2)
        else:
            annotation.write_rttm(sys.stdout)
    return 0


def cmd_benchmark(args) -> int:
    """Evaluate a pipeline on a protocol subset; report DER + speed."""
    if getattr(args, "exact", False):
        # one-flag bit-exact mode for reference-parity runs: f32 uploads
        # stay exact (int16 LUT decode of PCM16 sources is bit-exact),
        # SincNet convs stay f32 (docs/REAL_CHECKPOINT_PARITY.md)
        os.environ["PYANNOTE_TPU_UPLOAD_QUANT"] = "int16"
        os.environ["PYANNOTE_TPU_SEG_BF16"] = "0"

    from .core.io import Audio
    from .metrics.der import DiarizationErrorRate
    from .utils.database import get_protocol, register_database

    if args.registry:
        register_database(args.registry)
    pipeline = _load_pipeline(args.pipeline, device=args.device,
                              revision=getattr(args, "revision", None),
                              token=getattr(args, "token", None),
                              cache=getattr(args, "cache", None))
    protocol = get_protocol(args.protocol)
    into = Path(args.into)
    into.mkdir(parents=True, exist_ok=True)

    metric = DiarizationErrorRate(collar=args.collar,
                                  skip_overlap=args.skip_overlap)
    audio = Audio()
    rows = []
    total_audio = 0.0
    total_wall = 0.0
    confusion = {}
    subset_iter = getattr(protocol, args.subset)()
    progress_hook = None
    if getattr(args, "progress", False):
        from .pipelines.utils.hook import ProgressHook
        progress_hook = ProgressHook()
    for file in subset_iter:
        t0 = time.perf_counter()
        kwargs = {}
        if progress_hook is not None:
            kwargs["hook"] = progress_hook
        if args.num_speakers == "oracle" and "annotation" in file:
            kwargs["num_speakers"] = len(file["annotation"].labels())
        output = pipeline(file, **kwargs)
        wall = time.perf_counter() - t0
        hypothesis = getattr(output, "speaker_diarization", output)
        with open(into / f"{file['uri']}.rttm", "w") as f:
            hypothesis.write_rttm(f)
        if hasattr(output, "serialize"):
            with open(into / f"{file['uri']}.json", "w") as f:
                json.dump(output.serialize(), f, indent=2)
        der = metric(file["annotation"], hypothesis,
                     uem=file.get("annotated"), detailed=True)
        duration = audio.get_duration(file)
        total_audio += duration
        total_wall += wall
        n_ref = len(file["annotation"].labels())
        n_hyp = len(hypothesis.labels())
        confusion[(n_ref, n_hyp)] = confusion.get((n_ref, n_hyp), 0) + 1
        rows.append({"uri": file["uri"], **der,
                     "wall_seconds": round(wall, 3)})
        print(f"{file['uri']}: DER="
              f"{der['diarization error rate']:.2%} ({wall:.1f}s)")

    # post-hoc min_duration_off optimization over stored hypotheses.
    # Parity: MinDurationOffOptimizer (reference __main__.py:430-510):
    # hypothesis.support(collar) fills within-speaker gaps, bounded
    # scalar minimization over [0, 1], forced no-collar baseline.
    if getattr(args, "optimize_min_duration_off", False):
        from .utils.rttm import load_rttm
        opt_files = []
        for file in getattr(protocol, args.subset)():
            hyp = load_rttm(into / f"{file['uri']}.rttm").get(file["uri"])
            if hyp is not None:
                opt_files.append({"annotation": file["annotation"],
                                  "annotated": file.get("annotated"),
                                  "speaker_diarization": hyp})
        optimizer = MinDurationOffOptimizer()
        best_collar, best_report = optimizer(
            opt_files, DiarizationErrorRate(collar=args.collar,
                                            skip_overlap=args.skip_overlap))
        best_der = best_report["diarization error rate"]
        print(f"optimal min_duration_off = {best_collar:.2f} "
              f"(DER {best_der:.2%})")
        with open(into / "min_duration_off.yml", "w") as f:
            yaml.safe_dump({"min_duration_off": float(best_collar),
                            "der": float(best_der)}, f)

    report = metric.report()
    seconds_per_hour = total_wall / (total_audio / 3600.0) \
        if total_audio else float("nan")
    speed = {
        "seconds_per_hour": round(seconds_per_hour, 1),
        "times_faster_than_realtime": round(
            total_audio / total_wall, 1) if total_wall else None,
    }
    with open(into / "speed.yml", "w") as f:
        yaml.safe_dump(speed, f)
    with open(into / "metric.txt", "w") as f:
        f.write(f"DER = {report['diarization error rate']:.2%}\n")
        for k in ("false alarm", "missed detection", "confusion", "total"):
            f.write(f"{k} = {report[k]:.1f}s\n")
    import csv
    with open(into / "metric.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    with open(into / "speaker_count_confusion.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["reference", "hypothesis", "count"])
        for (r, h), c in sorted(confusion.items()):
            writer.writerow([r, h, c])
    print(f"\nDER = {report['diarization error rate']:.2%}  "
          f"({seconds_per_hour:.1f}s per audio-hour)")
    return 0


def cmd_optimize(args) -> int:
    """TPE hyperparameter optimization with a resumable journal.

    Parity: the Optuna TPE loop of the reference (__main__.py:115-282):
    TPE sampler, journal-file resume, warm start from the pipeline's
    current parameters. Per-file segmentations/embeddings are cached
    across trials (pipeline.training=True on ONE file-dict instance per
    file, so trial N+1 reuses trial N's model forwards whenever the
    changed hyperparameters do not invalidate them).
    """
    from .core.optimizer import Optimizer, TPESampler
    from .utils.database import get_protocol, register_database

    if args.registry:
        register_database(args.registry)
    pipeline = _load_pipeline(args.pipeline)
    protocol = get_protocol(args.protocol)
    # ONE dict per file, reused across every trial: the training caches
    # (training_cache/segmentation, training_cache/embeddings) live in
    # these dicts — fresh copies per trial would defeat them
    files = [dict(file) for file in getattr(protocol, args.subset)()]
    journal = Path(args.into) / "journal.jsonl"

    warm_start = None
    try:
        warm_start = {name: value for name, value
                      in pipeline.parameters(instantiated=True).items()}
    except Exception:
        pass

    optimizer = Optimizer(pipeline.parameters(), journal=journal,
                          sampler=TPESampler(seed=args.seed),
                          warm_start=warm_start)

    was_training = getattr(pipeline, "training", False)
    pipeline.training = True
    try:
        metric_name = getattr(args, "metric", None) \
            or "DiarizationErrorRate"

        def objective_fn(params) -> float:
            pipeline.instantiate(params)
            # fresh accumulating metric per trial (reference optimize
            # passes Metric.from_str(metric) as get_metric,
            # __main__.py:210-214)
            metric = Metric.from_str(metric_name)
            for file in files:
                output = pipeline(file)
                metric(file["annotation"], get_diarization(output),
                       uem=file.get("annotated"))
            return abs(metric)

        for trial_idx, params in zip(
                range(len(optimizer.history),
                      len(optimizer.history) + args.trials),
                optimizer.suggestions(args.trials)):
            objective = objective_fn(params)
            optimizer.tell(params, objective)
            print(f"trial {trial_idx}: {objective:.4f} "
                  f"(best {optimizer.best[1]:.4f})")
    finally:
        pipeline.training = was_training

    best_params, best_objective = optimizer.best
    print(json.dumps({"best_params": best_params,
                      "best_objective": best_objective}, indent=2))
    return 0


def cmd_strip(args) -> int:
    """Slim a training checkpoint for inference-only distribution."""
    import shutil
    src, dst = Path(args.checkpoint), Path(args.into)
    dst.mkdir(parents=True, exist_ok=True)
    kept = 0
    for name in ("config.yaml", "params.msgpack"):
        if (src / name).exists():
            shutil.copy(src / name, dst / name)
            kept += 1
    if kept == 0:
        raise SystemExit(f"{src} does not look like a checkpoint dir")
    print(f"stripped checkpoint written to {dst}")
    return 0


def cmd_export(args) -> int:
    """Export a native checkpoint as a reference-format torch
    checkpoint (inverse of loading pytorch_model.bin)."""
    from .core.model import Model
    from .utils.torch_export import export_reference_checkpoint
    model = Model.from_pretrained(args.checkpoint)
    try:
        path = export_reference_checkpoint(model, args.into)
    except NotImplementedError as error:
        print(error)
        return 1
    print(f"reference checkpoint written to {path}")
    return 0


def cmd_serve(args) -> int:
    """Serve a pipeline over the pyannoteAI-shaped REST API
    (self-hosted: upload -> diarize job -> poll retrieve)."""
    from .serve import DiarizationServer
    pipeline = _load_pipeline(args.pipeline, device=args.device)
    server = DiarizationServer(pipeline, host=args.host, port=args.port,
                               token=args.token)
    server.start()
    print(f"serving {args.pipeline} at {server.api_url} "
          f"(Ctrl-C to stop)")
    try:
        import threading
        threading.Event().wait()
    except KeyboardInterrupt:
        print("shutting down")
        server.shutdown()
    return 0


def cmd_download(args) -> int:
    """Warm the local cache with a pretrained pipeline (parity:
    reference __main__.py:286-325 — download = Pipeline.from_pretrained
    for later offline use)."""
    from .core.pipeline import Pipeline
    if args.cache:
        os.environ["PYANNOTE_TPU_CACHE"] = args.cache
    try:
        pipeline = Pipeline.from_pretrained(
            args.model, revision=args.revision, token=args.token)
    except (ValueError, FileNotFoundError, OSError) as error:
        print(f"Could not load pretrained pipeline from {args.model}: "
              f"{error}")
        return 1
    if pipeline is None:
        print(f"Could not load pretrained pipeline from {args.model}.")
        return 1
    print(f"downloaded {args.model} ({type(pipeline).__name__})")
    return 0


# -- programmatic command entry points (parity: the typer command
# functions users can import from the reference __main__, e.g.
# `from pyannote.audio.__main__ import benchmark`) ----------------------

def apply(pipeline: str, audio: str, into: Optional[str] = None,
          device: Optional[str] = None, revision: Optional[str] = None,
          token: Optional[str] = None, cache: Optional[str] = None) -> int:
    """Parity: apply (reference __main__.py:328-427)."""
    return cmd_apply(argparse.Namespace(
        pipeline=pipeline, audio=audio, into=into, device=device,
        revision=revision, token=token, cache=cache))


def benchmark(pipeline: str, protocol: str, into: str,
              registry: Optional[str] = None, subset: str = "test",
              collar: float = 0.0, skip_overlap: bool = False,
              num_speakers: Optional[str] = None, exact: bool = False,
              optimize_min_duration_off: bool = False,
              progress: bool = False,
              device: Optional[str] = None) -> int:
    """Parity: benchmark (reference __main__.py:513-849)."""
    return cmd_benchmark(argparse.Namespace(
        pipeline=pipeline, protocol=protocol, into=into, registry=registry,
        subset=subset, collar=collar, skip_overlap=skip_overlap,
        num_speakers=num_speakers, exact=exact,
        optimize_min_duration_off=optimize_min_duration_off,
        progress=progress, device=device))


def optimize(pipeline: str, protocol: str, into: str,
             registry: Optional[str] = None, subset: str = "development",
             trials: int = 20, seed: int = 42,
             metric: str = "DiarizationErrorRate") -> int:
    """Parity: optimize (reference __main__.py:115-282)."""
    return cmd_optimize(argparse.Namespace(
        pipeline=pipeline, protocol=protocol, into=into, registry=registry,
        subset=subset, trials=trials, seed=seed, metric=metric))


def strip(checkpoint: str, into: str) -> int:
    """Parity: strip (reference __main__.py:852-902)."""
    return cmd_strip(argparse.Namespace(checkpoint=checkpoint, into=into))


def download(model: str, token: Optional[str] = None,
             revision: Optional[str] = None,
             cache: Optional[str] = None) -> int:
    """Parity: download (reference __main__.py:285-325)."""
    return cmd_download(argparse.Namespace(
        model=model, token=token, revision=revision, cache=cache))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="pyannote-audio-tpu",
        description="TPU-native speaker diarization toolkit")
    sub = parser.add_subparsers(dest="command", required=True)

    p_apply = sub.add_parser("apply", help="apply pipeline to audio")
    p_apply.add_argument("pipeline")
    p_apply.add_argument("audio")
    p_apply.add_argument("--into", default=None)
    p_apply.add_argument("--device", default=None)
    p_apply.add_argument("--revision", default=None,
                         help="pretrained pipeline revision (hub ids)")
    p_apply.add_argument("--token", default=None, help="Huggingface token")
    p_apply.add_argument("--cache", default=None,
                         help="hub download cache directory")
    p_apply.set_defaults(fn=cmd_apply)

    p_bench = sub.add_parser("benchmark", help="evaluate on a protocol")
    p_bench.add_argument("pipeline")
    p_bench.add_argument("protocol")
    p_bench.add_argument("into")
    p_bench.add_argument("--registry", default=None,
                         help="path to database.yml")
    p_bench.add_argument("--subset", default="test")
    p_bench.add_argument("--collar", type=float, default=0.0)
    p_bench.add_argument("--skip-overlap", action="store_true")
    p_bench.add_argument("--num-speakers", default=None,
                         choices=[None, "oracle"], nargs="?")
    p_bench.add_argument("--exact", action="store_true",
                         help="bit-exact transport + f32 convs (flips "
                              "every lossy accelerator default for "
                              "reference-parity runs)")
    p_bench.add_argument("--optimize-min-duration-off",
                         action="store_true")
    p_bench.add_argument("--progress", action="store_true",
                         help="show per-stage progress (ProgressHook)")
    p_bench.add_argument("--revision", default=None,
                         help="pretrained pipeline revision (hub ids)")
    p_bench.add_argument("--token", default=None, help="Huggingface token")
    p_bench.add_argument("--cache", default=None,
                         help="hub download cache directory")
    p_bench.add_argument("--device", default=None)
    p_bench.set_defaults(fn=cmd_benchmark)

    p_opt = sub.add_parser("optimize", help="tune hyperparameters")
    p_opt.add_argument("pipeline")
    p_opt.add_argument("protocol")
    p_opt.add_argument("into")
    p_opt.add_argument("--registry", default=None)
    p_opt.add_argument("--subset", default="development")
    p_opt.add_argument("--trials", type=int, default=20)
    p_opt.add_argument("--seed", type=int, default=42)
    p_opt.add_argument("--metric", default="DiarizationErrorRate",
                       choices=[m.value for m in Metric],
                       help="metric to optimize against")
    p_opt.set_defaults(fn=cmd_optimize)

    p_strip = sub.add_parser("strip", help="slim checkpoint")
    p_strip.add_argument("checkpoint")
    p_strip.add_argument("into")
    p_strip.set_defaults(fn=cmd_strip)

    p_exp = sub.add_parser(
        "export", help="write a reference-format torch checkpoint")
    p_exp.add_argument("checkpoint", help="native checkpoint directory")
    p_exp.add_argument("into", help="output directory or .bin path")
    p_exp.set_defaults(fn=cmd_export)

    p_srv = sub.add_parser(
        "serve", help="REST serving (pyannoteAI-shaped API)")
    p_srv.add_argument("pipeline")
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8046)
    p_srv.add_argument("--token", default=None)
    p_srv.add_argument("--device", default=None)
    p_srv.set_defaults(fn=cmd_serve)

    p_dl = sub.add_parser(
        "download", help="cache a pretrained pipeline for offline use")
    p_dl.add_argument("model")
    p_dl.add_argument("token", nargs="?", default=None,
                      help="Huggingface token")
    p_dl.add_argument("--revision", default=None)
    p_dl.add_argument("--cache", default=None,
                      help="download cache directory "
                           "(default: PYANNOTE_TPU_CACHE)")
    p_dl.set_defaults(fn=cmd_download)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
