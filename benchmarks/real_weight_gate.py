"""Mechanical A/B gate for every lossy accelerator default (VERDICT r3
item 5).

Given a pipeline checkpoint dir + a protocol, runs the CLI benchmark
once per configuration — the EXACT baseline, each lossy default flipped
on individually, and the shipped accelerator defaults — each in its own
subprocess (the flags resolve at trace time, so flipping them inside one
process would hit cached executables), then emits the DER-delta table
REAL_CHECKPOINT_PARITY.md promises.

Usage (the day real community-1 weights exist; the env dance keeps the
TPU session claimable by the CHILD benchmarks only — any python process
holding PALLAS_AXON_POOL_IPS claims it at interpreter start):

    env PAT_GATE_POOL_IPS="$PALLAS_AXON_POOL_IPS" PALLAS_AXON_POOL_IPS= \
        python benchmarks/real_weight_gate.py /ckpt \
        AMI.SpeakerDiarization.only_words \
        --registry /path/to/database.yml --subset test --out /tmp/gate \
        --device

Dry run on the synthetic debug corpus (no weights, CPU, works today):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/real_weight_gate.py --dry-run

Outputs <out>/gate_report.md + gate_report.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# the exact baseline: every lossy accelerator default off
EXACT = {
    "PYANNOTE_TPU_UPLOAD_QUANT": "int16",
    "PYANNOTE_TPU_SEG_BF16": "0",
    "PYANNOTE_TPU_SHARED_TRUNK": "0",
    "PYANNOTE_TPU_SHARED_SINC": "0",
    "PYANNOTE_TPU_CONV_FBANK": "0",
}

# each lossy default flipped on alone (vs EXACT), plus the shipped stack
CONFIGS = [
    ("exact", EXACT),
    ("+mulaw_upload", {**EXACT, "PYANNOTE_TPU_UPLOAD_QUANT": "mulaw"}),
    ("+dpcm4_upload", {**EXACT, "PYANNOTE_TPU_UPLOAD_QUANT": "dpcm4"}),
    ("+seg_bf16", {**EXACT, "PYANNOTE_TPU_SEG_BF16": "1"}),
    ("+shared_sinc", {**EXACT, "PYANNOTE_TPU_SHARED_SINC": "1"}),
    ("+shared_trunk", {**EXACT, "PYANNOTE_TPU_SHARED_TRUNK": "1"}),
    ("+conv_fbank", {**EXACT, "PYANNOTE_TPU_CONV_FBANK": "1"}),
    ("default", {}),          # shipped accelerator defaults, all on
]


def run_config(name: str, flags: dict, args, out_root: Path) -> dict:
    out = out_root / name.lstrip("+")
    env = dict(os.environ)
    for key in EXACT:
        env.pop(key, None)
    env.update(flags)
    if args.device:
        # the pool IPs travel via PAT_GATE_POOL_IPS (see main()): the
        # PARENT must never hold them or it claims the single TPU
        # session at interpreter start and every child deadlocks
        env["PALLAS_AXON_POOL_IPS"] = os.environ["PAT_GATE_POOL_IPS"]
        env.pop("JAX_PLATFORMS", None)
    else:
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   "/tmp/pyannote_tpu_jax_cache")
    cmd = [sys.executable, "-m", "pyannote_audio_tpu", "benchmark",
           str(args.pipeline), args.protocol, str(out),
           "--registry", str(args.registry), "--subset", args.subset]
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=args.timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"config {name!r} failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    metric = (out / "metric.txt").read_text()
    der = float(re.search(r"DER = ([\d.]+)%", metric).group(1)) / 100.0
    import yaml
    speed = yaml.safe_load((out / "speed.yml").read_text())
    return {"name": name, "der": der,
            "seconds_per_hour": speed["seconds_per_hour"]}


# ---------------------------------------------------------------------
# converter gate (VERDICT r4 next #6): convert a real SpeechBrain /
# NeMo / ONNX snapshot onto the native flax architectures and verify
# BEHAVIOR, not just key coverage — synthetic-speaker verification EER,
# embedding finiteness/dimension, too-short-sliver NaN contract, and
# (when the operator recorded them with the original runtime) cosine
# similarity against recorded activations. Dry-runnable end to end: tiny
# native models are exported through the per-architecture inverses into
# real archive formats, their own activations recorded, and the gate
# must reconstruct them at cos >= 0.999.
# ---------------------------------------------------------------------

GATE_SPEAKERS = ("alice", "bob", "carol")


def synth_utterances(seconds: float = 3.0, per_speaker: int = 3,
                     sr: int = 16000):
    """(B, 1, T) utterances + integer speaker labels, deterministic."""
    sys.path.insert(0, str(REPO / "tests"))
    from corpus import speaker_signal

    import numpy as np
    t = np.arange(int(seconds * sr)) / sr
    wavs, labels = [], []
    for s_idx, name in enumerate(GATE_SPEAKERS):
        for i in range(per_speaker):
            rng = np.random.default_rng(1000 * s_idx + i)
            sig = speaker_signal(name, t, rng).astype(np.float32)
            sig += 0.003 * rng.standard_normal(len(t)).astype(np.float32)
            wavs.append(sig[None])
            labels.append(s_idx)
    return np.stack(wavs), np.asarray(labels)


def converter_checks(backend: str, source, activations=None) -> dict:
    """Run the behavioral checks for one converted checkpoint."""
    import numpy as np

    from pyannote_audio_tpu.metrics.streaming import EqualErrorRate
    from pyannote_audio_tpu.pipelines.speaker_verification import \
        PretrainedSpeakerEmbedding

    model = PretrainedSpeakerEmbedding(str(source))
    wavs, labels = synth_utterances()
    embs = np.asarray(model(wavs))

    result = {"backend": backend, "source": str(source),
              "wrapper": type(model).__name__,
              "dimension": int(model.dimension),
              "embeddings_finite": bool(np.isfinite(embs).all()),
              "dimension_matches": embs.shape[1] == model.dimension}

    # synthetic-speaker verification EER over all pairs (same/diff)
    norm = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    scores, refs = [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            scores.append(float(norm[i] @ norm[j]))
            refs.append(int(labels[i] == labels[j]))
    metric = EqualErrorRate()
    metric.update(np.asarray(scores), np.asarray(refs))
    result["synthetic_eer"] = round(float(metric.compute()), 4)
    same = [s for s, r in zip(scores, refs) if r]
    diff = [s for s, r in zip(scores, refs) if not r]
    result["same_minus_diff_cos"] = round(float(np.mean(same)
                                                - np.mean(diff)), 4)

    # too-short compacted speech must NaN out (reference wrapper
    # contract), not embed 1-2 frames of near-garbage
    masks = np.ones((2, 100), np.float32)
    masks[1, 1:] = 0.0                      # ~30 ms of a 3 s chunk
    sliver = np.asarray(model(wavs[:2], masks=masks))
    result["short_sliver_nan"] = bool(np.isnan(sliver[1]).all()
                                      and np.isfinite(sliver[0]).all())

    # recorded activations from the ORIGINAL runtime (or, in dry-run,
    # from the pre-export native model): conversion must reproduce them
    if activations is not None:
        import numpy as np
        rec = np.load(activations)
        ours = np.asarray(model(rec["waveforms"].astype(np.float32)))
        theirs = rec["embeddings"]
        cos = np.sum(ours * theirs, axis=1) / (
            np.linalg.norm(ours, axis=1)
            * np.linalg.norm(theirs, axis=1))
        result["activation_cos_min"] = round(float(cos.min()), 6)
        result["activation_cos_mean"] = round(float(cos.mean()), 6)
        result["activations_match"] = bool(cos.min() >= 0.999)
    return result


def build_dry_backend_archives(root: Path) -> dict:
    """Tiny native models -> REAL archive formats via the export
    inverses, with their own activations recorded for the cosine check."""
    import numpy as np
    import torch

    wavs, _ = synth_utterances(per_speaker=1)
    sources = {}

    # speechbrain snapshot dir (hyperparams.yaml + embedding_model.ckpt)
    from pyannote_audio_tpu.models.embedding.ecapa import ECAPA_TDNN
    ecapa = ECAPA_TDNN(n_mels=24, channels=(32, 32, 32, 32, 96),
                       kernel_sizes=(5, 3, 3, 3, 1),
                       dilations=(1, 2, 3, 4, 1), attention_channels=16,
                       res2net_scale=4, se_channels=16,
                       global_context=True, lin_neurons=32)
    ecapa.build()
    sb = root / "speechbrain"
    sb.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                ecapa.export_speechbrain_state_dict().items()},
               sb / "embedding_model.ckpt")
    (sb / "hyperparams.yaml").write_text(
        "n_mels: 24\n"
        "embedding_model: !new:speechbrain.lobes.models.ECAPA_TDNN."
        "ECAPA_TDNN\n"
        "    channels: [32, 32, 32, 32, 96]\n"
        "    kernel_sizes: [5, 3, 3, 3, 1]\n"
        "    dilations: [1, 2, 3, 4, 1]\n"
        "    attention_channels: 16\n"
        "    lin_neurons: 32\n")
    np.savez(sb / "activations.npz", waveforms=wavs,
             embeddings=np.asarray(ecapa(wavs)))
    sources["speechbrain"] = (sb, sb / "activations.npz")

    # .nemo tar (model_config.yaml + model_weights.ckpt)
    from pyannote_audio_tpu.models.embedding.titanet import (
        TitaNet, export_nemo_checkpoint)
    blocks = [dict(filters=16, repeat=1, kernel=3, residual=False,
                   separable=True, se=True),
              dict(filters=16, repeat=2, kernel=7, residual=True,
                   separable=True, se=True),
              dict(filters=24, repeat=1, kernel=1, residual=False,
                   separable=False, se=True)]
    titanet = TitaNet(n_mels=12, blocks=blocks, emb_dim=16,
                      attention_channels=8)
    titanet.build()
    nemo_dir = root / "nemo"
    nemo_dir.mkdir(parents=True, exist_ok=True)
    nemo_path = export_nemo_checkpoint(titanet, nemo_dir)
    np.savez(nemo_dir / "activations.npz", waveforms=wavs,
             embeddings=np.asarray(titanet(wavs)))
    sources["nemo"] = (nemo_path, nemo_dir / "activations.npz")

    # wespeaker .onnx (torch.onnx.export initializer layout)
    sys.path.insert(0, str(REPO / "tests"))
    from test_onnx_wespeaker import _resnet34_state

    from pyannote_audio_tpu.utils.onnx import write_onnx_initializers
    onnx_dir = root / "onnx"
    onnx_dir.mkdir(parents=True, exist_ok=True)
    onnx_path = onnx_dir / "wespeaker-voxceleb-resnet34-LM.onnx"
    write_onnx_initializers(onnx_path, _resnet34_state(seed=3))
    sources["onnx"] = (onnx_path, None)
    return sources


def run_converter_gate(args, out_root: Path) -> int:
    requested = []
    if args.speechbrain_dir:
        requested.append(("speechbrain", Path(args.speechbrain_dir),
                          args.activations))
    if args.nemo_file:
        requested.append(("nemo", Path(args.nemo_file), args.activations))
    if args.onnx_file:
        requested.append(("onnx", Path(args.onnx_file), args.activations))
    if args.dry_run_backends:
        dry_root = Path(tempfile.mkdtemp(prefix="pat_gate_backends_"))
        for backend, (source, act) in \
                build_dry_backend_archives(dry_root).items():
            requested.append((backend, source, act))

    results = [converter_checks(b, s, a) for b, s, a in requested]
    failures = []
    for r in results:
        for check in ("embeddings_finite", "dimension_matches",
                      "short_sliver_nan"):
            if not r[check]:
                failures.append(f"{r['backend']}: {check}")
        if "activations_match" in r and not r["activations_match"]:
            failures.append(f"{r['backend']}: activation cosine "
                            f"{r['activation_cos_min']} < 0.999")

    out_root.mkdir(parents=True, exist_ok=True)
    lines = ["# Converter gate (external-runtime checkpoints -> native)",
             "",
             "| backend | wrapper | dim | EER (synthetic) | "
             "same-diff cos | sliver NaN | activation cos min |",
             "|---|---|---|---|---|---|---|"]
    for r in results:
        lines.append(
            f"| {r['backend']} | {r['wrapper']} | {r['dimension']} "
            f"| {r['synthetic_eer']} | {r['same_minus_diff_cos']} "
            f"| {r['short_sliver_nan']} "
            f"| {r.get('activation_cos_min', 'n/a')} |")
    lines += ["", "Gate rule: every check column must pass; on REAL "
              "weights additionally expect synthetic EER well below 0.5 "
              "with a clearly positive same-diff cosine margin, and "
              "record activations with the original runtime so the "
              "cosine row is meaningful (dry-run records them from the "
              "pre-export native model, pinning the export->import "
              "roundtrip)."]
    (out_root / "converter_gate.md").write_text("\n".join(lines) + "\n")
    (out_root / "converter_gate.json").write_text(
        json.dumps(results, indent=2))
    print(json.dumps({"gate": "converters",
                      "backends": [r["backend"] for r in results],
                      "failures": failures,
                      "report": str(out_root / "converter_gate.md")}))
    return 1 if failures else 0


def build_dry_fixture(root: Path) -> argparse.Namespace:
    """Debug pipeline checkpoint + 2-file corpus — the shared dry-run
    fixture (tests/corpus.py build_debug_corpus, same one the
    REAL_CHECKPOINT_PARITY harness §0 uses)."""
    sys.path.insert(0, str(REPO / "tests"))
    from corpus import build_debug_corpus

    protocol = build_debug_corpus(root)
    return argparse.Namespace(pipeline=root / "pipeline",
                              protocol=protocol,
                              registry=root / "database.yml")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("pipeline", nargs="?")
    parser.add_argument("protocol", nargs="?")
    parser.add_argument("--registry")
    parser.add_argument("--subset", default="test")
    parser.add_argument("--out", default=None)
    parser.add_argument("--device", action="store_true",
                        help="run each config on the accelerator. The "
                             "single TPU session is claimed by ANY "
                             "python process holding "
                             "PALLAS_AXON_POOL_IPS at interpreter "
                             "start, so launch the gate itself with "
                             "that var EMPTY and hand the pool to the "
                             "children via PAT_GATE_POOL_IPS: "
                             "env PAT_GATE_POOL_IPS=\"$PALLAS_AXON_POOL"
                             "_IPS\" PALLAS_AXON_POOL_IPS= python "
                             "benchmarks/real_weight_gate.py ... "
                             "--device")
    parser.add_argument("--configs", default=None,
                        help="comma-separated subset of config names")
    parser.add_argument("--timeout", type=int, default=3600,
                        help="per-config subprocess timeout (s)")
    parser.add_argument("--dry-run", action="store_true",
                        help="build the synthetic debug corpus + debug "
                             "pipeline and gate that (no weights needed)")
    parser.add_argument("--speechbrain-dir", default=None,
                        help="converter gate: a speechbrain snapshot "
                             "dir (hyperparams.yaml + "
                             "embedding_model.ckpt) to convert + verify")
    parser.add_argument("--nemo-file", default=None,
                        help="converter gate: a .nemo archive to "
                             "convert + verify")
    parser.add_argument("--onnx-file", default=None,
                        help="converter gate: a wespeaker .onnx file to "
                             "convert + verify")
    parser.add_argument("--activations", default=None,
                        help="npz with {waveforms (B,1,T) f32 @16k, "
                             "embeddings (B,D)} recorded with the "
                             "ORIGINAL runtime; the gate checks per-row "
                             "cosine >= 0.999 after conversion")
    parser.add_argument("--dry-run-backends", action="store_true",
                        help="export tiny native models into real "
                             "speechbrain/.nemo/.onnx archives, record "
                             "their activations, and gate those (CI, no "
                             "weights needed)")
    args = parser.parse_args(argv)

    if (args.speechbrain_dir or args.nemo_file or args.onnx_file
            or args.dry_run_backends):
        return run_converter_gate(
            args, Path(args.out or tempfile.mkdtemp(
                prefix="pat_gate_conv_")))

    if args.device:
        if os.environ.get("PALLAS_AXON_POOL_IPS"):
            parser.error(
                "--device: this parent process is holding "
                "PALLAS_AXON_POOL_IPS, which claims the single TPU "
                "session at interpreter start and deadlocks every "
                "child. Relaunch as: env "
                "PAT_GATE_POOL_IPS=\"$PALLAS_AXON_POOL_IPS\" "
                "PALLAS_AXON_POOL_IPS= python "
                "benchmarks/real_weight_gate.py ... --device")
        if not os.environ.get("PAT_GATE_POOL_IPS"):
            parser.error(
                "--device needs PAT_GATE_POOL_IPS=<pool ips> so the "
                "child benchmarks (and only them) can claim the TPU")

    tmp = None
    if args.dry_run:
        tmp = tempfile.mkdtemp(prefix="pat_gate_dry_")
        fixture = build_dry_fixture(Path(tmp))
        args.pipeline = fixture.pipeline
        args.protocol = fixture.protocol
        args.registry = fixture.registry
    elif not (args.pipeline and args.protocol and args.registry):
        parser.error("pipeline, protocol and --registry are required "
                     "(or use --dry-run)")

    out_root = Path(args.out or (Path(tmp or ".") / "gate_out"))
    out_root.mkdir(parents=True, exist_ok=True)

    wanted = set(args.configs.split(",")) if args.configs else None
    configs = [(n, f) for n, f in CONFIGS
               if wanted is None or n in wanted]
    results = [run_config(n, f, args, out_root) for n, f in configs]

    base = next((r for r in results if r["name"] == "exact"), results[0])
    lines = ["# Lossy-default DER gate", "",
             f"pipeline: `{args.pipeline}`  protocol: `{args.protocol}`  "
             f"subset: `{args.subset}`  device: {args.device}", "",
             "| config | DER | delta vs exact | s/audio-hour |",
             "|---|---|---|---|"]
    for r in results:
        r["der_delta"] = round(r["der"] - base["der"], 6)
        lines.append(f"| {r['name']} | {r['der']:.4f} "
                     f"| {r['der_delta']:+.4f} | {r['seconds_per_hour']} |")
    lines += ["", "Gate rule: every `+flag` row and `default` must sit "
              "within the DER noise floor of `exact` (document the "
              "accepted delta in docs/PARITY.md when run on real "
              "weights)."]
    (out_root / "gate_report.md").write_text("\n".join(lines) + "\n")
    (out_root / "gate_report.json").write_text(json.dumps(results,
                                                          indent=2))
    print(json.dumps({"gate": "lossy-defaults", "exact_der": base["der"],
                      "max_abs_delta": max(abs(r["der_delta"])
                                           for r in results),
                      "results": {r["name"]: r["der"] for r in results},
                      "report": str(out_root / "gate_report.md")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
