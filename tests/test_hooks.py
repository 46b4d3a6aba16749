"""Pipeline hook tests: Artifact, Timing, Hooks composition."""

import time

import numpy as np
import pytest

from pyannote_audio_tpu.pipelines.utils.hook import (ArtifactHook, Hooks,
                                                     ProgressHook,
                                                     TimingHook)


def test_artifact_hook_captures():
    file = {}
    with ArtifactHook("segmentation") as hook:
        hook("segmentation", np.ones(3), file=file)
        hook("embeddings", np.zeros(3), file=file)  # not requested
    assert "segmentation" in file["artifact"]
    assert "embeddings" not in file["artifact"]
    np.testing.assert_array_equal(file["artifact"]["segmentation"],
                                  np.ones(3))


def test_artifact_hook_all_steps():
    file = {}
    with ArtifactHook() as hook:
        hook("a", 1, file=file)
        hook("b", 2, file=file)
    assert file["artifact"] == {"a": 1, "b": 2}


def test_timing_hook():
    file = {}
    with TimingHook() as hook:
        hook("step1", None, file=file)
        time.sleep(0.05)
        hook("step2", None, file=file)
        time.sleep(0.01)
        hook("step2", None, file=file)
    assert "step1" in file["timing"]
    assert file["timing"]["step1"] >= 0.04


def test_hooks_composition():
    file = {}
    calls = []

    def spy(name, artifact, file=None, total=None, completed=None):
        calls.append(name)

    with Hooks(ArtifactHook(), spy) as hook:
        hook("x", 42, file=file)
    assert calls == ["x"]
    assert file["artifact"]["x"] == 42


def test_progress_hook_smoke(capsys):
    with ProgressHook(transient=True) as hook:
        hook("step", None, total=2, completed=1)
        hook("step", None, total=2, completed=2)
