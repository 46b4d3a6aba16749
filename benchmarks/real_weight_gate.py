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
    args = parser.parse_args(argv)

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
