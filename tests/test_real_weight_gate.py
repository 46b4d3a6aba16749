"""The lossy-default A/B gate (benchmarks/real_weight_gate.py) is
dry-runnable end to end on the synthetic debug corpus — the mechanical
re-validation path for the day real community-1 weights exist
(VERDICT r3 item 5)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_gate_dry_run(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "real_weight_gate.py"),
         "--dry-run", "--configs", "exact,+mulaw_upload",
         "--out", str(tmp_path / "gate")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["gate"] == "lossy-defaults"
    assert set(line["results"]) == {"exact", "+mulaw_upload"}
    report = (tmp_path / "gate" / "gate_report.md").read_text()
    assert "| exact |" in report and "| +mulaw_upload |" in report
    rows = json.loads(
        (tmp_path / "gate" / "gate_report.json").read_text())
    assert all(0.0 <= r["der"] <= 2.0 for r in rows)
    # the per-config benchmark artifacts exist
    assert (tmp_path / "gate" / "exact" / "metric.txt").exists()
    assert (tmp_path / "gate" / "mulaw_upload" / "metric.txt").exists()


@pytest.mark.slow
def test_converter_gate_dry_run(tmp_path):
    """--dry-run-backends exports tiny native models into REAL
    speechbrain/.nemo/.onnx archives and gates the converters on them:
    behavior checks + recorded-activation cosine (VERDICT r4 next #6)."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "real_weight_gate.py"),
         "--dry-run-backends", "--out", str(tmp_path / "conv")],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["gate"] == "converters"
    assert set(line["backends"]) == {"speechbrain", "nemo", "onnx"}
    assert line["failures"] == []
    rows = json.loads(
        (tmp_path / "conv" / "converter_gate.json").read_text())
    by_backend = {r["backend"]: r for r in rows}
    # export->import roundtrip is numerically faithful
    assert by_backend["speechbrain"]["activation_cos_min"] >= 0.999
    assert by_backend["nemo"]["activation_cos_min"] >= 0.999
    for r in rows:
        assert r["embeddings_finite"] and r["dimension_matches"]
        assert r["short_sliver_nan"]
        assert 0.0 <= r["synthetic_eer"] <= 1.0
