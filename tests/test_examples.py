"""Smoke tests: the examples/ scripts run end to end.

Mirrors the reference's notebook smoke tests (SURVEY.md §4, papermill):
each example is executed as a real subprocess (CPU JAX — conftest already
exports PALLAS_AXON_POOL_IPS= / JAX_PLATFORMS=cpu, which child processes
inherit, so no concurrent TPU-session grab).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _run(args, timeout=540):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=EXAMPLES.parent)


def test_serve_streaming_batch_example():
    proc = _run([EXAMPLES / "serve_streaming_batch.py"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "warmup" in proc.stdout
    assert "batch of 3" in proc.stdout
    # per-file stage timings from TimingHook
    assert "segmentation=" in proc.stdout


def test_train_and_diarize_example():
    proc = _run([EXAMPLES / "train_and_diarize.py",
                 "--epochs", "1", "--files", "3"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "training:" in proc.stdout
    assert "overall DER" in proc.stdout


def test_finetune_and_adapt_example():
    proc = _run([EXAMPLES / "finetune_and_adapt.py",
                 "--epochs", "1", "--files", "3"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "pretrained pipeline checkpoint" in proc.stdout
    assert "adapted pipeline applied OK" in proc.stdout


def test_optimize_pipeline_example():
    proc = _run([EXAMPLES / "optimize_pipeline.py", "--trials", "2"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "optimize + journal resume OK" in proc.stdout


def test_export_to_reference_example():
    proc = _run([EXAMPLES / "export_to_reference.py"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PyanNet roundtrip exact" in proc.stdout
    assert "WeSpeaker roundtrip exact" in proc.stdout


def test_serve_and_sdk_example():
    proc = _run([EXAMPLES / "serve_and_sdk.py"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SDK round trip OK" in proc.stdout
