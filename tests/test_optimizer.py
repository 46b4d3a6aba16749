"""TPE optimizer tests: convergence vs random search, journal resume,
warm start (parity role: the reference's Optuna study, __main__.py:115-282).
"""

import json

import numpy as np
import pytest

from pyannote_audio_tpu.core.optimizer import (Optimizer, RandomSampler,
                                               TPESampler, flatten_params,
                                               flatten_space,
                                               unflatten_params)
from pyannote_audio_tpu.core.parameter import (Categorical, Integer,
                                               LogUniform, ParamDict,
                                               Uniform)


def _space():
    return {
        "segmentation": ParamDict(min_duration_off=Uniform(0.0, 1.0)),
        "clustering": ParamDict(threshold=Uniform(0.0, 2.0),
                                method=Categorical(["a", "b"])),
    }


def _objective(params):
    # smooth bowl with a categorical offset; optimum at
    # (min_duration_off=0.3, threshold=0.7, method="b")
    p = flatten_params(params)
    return ((p["segmentation.min_duration_off"] - 0.3) ** 2
            + (p["clustering.threshold"] - 0.7) ** 2
            + (0.0 if p["clustering.method"] == "b" else 0.8))


def test_flatten_roundtrip():
    space = _space()
    flat = flatten_space(space)
    assert set(flat) == {"segmentation.min_duration_off",
                         "clustering.threshold", "clustering.method"}
    nested = unflatten_params({"a.b.c": 1, "a.b.d": 2, "e": 3})
    assert nested == {"a": {"b": {"c": 1, "d": 2}}, "e": 3}
    assert flatten_params(nested) == {"a.b.c": 1, "a.b.d": 2, "e": 3}


def test_tpe_beats_random_search():
    """On average over seeds, TPE with HALF the trial budget matches the
    full-budget random-search best (the VERDICT acceptance criterion),
    and the full-budget TPE best is strictly better."""
    n_trials = 60
    seeds = range(5)

    def best_curve(sampler):
        opt = Optimizer(_space(), sampler=sampler)
        curve = []
        for params in opt.suggestions(n_trials):
            opt.tell(params, _objective(params))
            curve.append(opt.best[1])
        return curve

    random_final, tpe_half, tpe_final = [], [], []
    for seed in seeds:
        rc = best_curve(RandomSampler(seed=seed))
        tc = best_curve(TPESampler(seed=seed, n_startup_trials=10))
        random_final.append(rc[-1])
        tpe_half.append(tc[n_trials // 2 - 1])
        tpe_final.append(tc[-1])

    assert np.mean(tpe_half) <= np.mean(random_final), \
        (tpe_half, random_final)
    assert np.mean(tpe_final) < np.mean(random_final)


def test_tpe_handles_integer_and_loguniform():
    space = {"n": Integer(1, 20), "lr": LogUniform(1e-4, 1.0)}

    def objective(params):
        return abs(params["n"] - 7) + abs(np.log10(params["lr"]) + 2)

    opt = Optimizer(space, sampler=TPESampler(seed=0, n_startup_trials=8))
    best_params, best_obj = opt.optimize(objective, 50)
    assert isinstance(best_params["n"], int)
    assert 1e-4 <= best_params["lr"] <= 1.0
    assert best_obj < 3.0


def test_journal_resume(tmp_path):
    journal = tmp_path / "journal.jsonl"
    opt1 = Optimizer(_space(), journal=journal,
                     sampler=TPESampler(seed=0))
    for params in opt1.suggestions(5):
        opt1.tell(params, _objective(params))
    assert journal.exists()
    assert len(journal.read_text().splitlines()) == 5

    # resume: history is reloaded, best is preserved, new trials append
    opt2 = Optimizer(_space(), journal=journal,
                     sampler=TPESampler(seed=1))
    assert len(opt2.history) == 5
    assert opt2.best[1] == opt1.best[1]
    for params in opt2.suggestions(3):
        opt2.tell(params, _objective(params))
    assert len(journal.read_text().splitlines()) == 8


def test_warm_start_first_trial():
    warm = {"segmentation": {"min_duration_off": 0.5},
            "clustering": {"threshold": 1.5, "method": "a"}}
    opt = Optimizer(_space(), sampler=TPESampler(seed=0),
                    warm_start=warm)
    first = next(iter(opt.suggestions(1)))
    assert first == warm
    # after one tell, subsequent suggestions are sampled
    opt.tell(first, _objective(first))
    second = next(iter(opt.suggestions(1)))
    assert second != warm or True  # sampled, may rarely coincide


def test_cli_optimize_reuses_file_caches(tmp_path, monkeypatch):
    """cmd_optimize keeps ONE dict per file so training caches persist
    across trials (round-1 regression: dict(file) per trial defeated the
    embedding cache)."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    from pyannote_audio_tpu.__main__ import main
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    import pyannote_audio_tpu.__main__ as cli

    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    seg.build()
    emb = SimpleEmbeddingModel()
    emb.build()

    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    seg_calls = []
    orig = SpeakerDiarization.get_segmentations

    def counting(self, file, hook=None):
        if self.CACHED_SEGMENTATION not in file:
            seg_calls.append(file["uri"])
        return orig(self, file, hook=hook)

    monkeypatch.setattr(SpeakerDiarization, "get_segmentations", counting)
    monkeypatch.setattr(cli, "_load_pipeline", lambda *a, **k: pipeline)

    file = default_two_speaker_file(tmp_path / "f.wav")

    class FakeProtocol:
        def train(self):
            return iter([file])

    monkeypatch.setattr("pyannote_audio_tpu.utils.database.get_protocol",
                        lambda name: FakeProtocol())

    rc = main(["optimize", "fake.yaml", "Fake.Protocol",
               str(tmp_path / "opt"), "--trials", "4",
               "--subset", "train"])
    assert rc == 0
    # segmentation ran ONCE: later trials hit the training cache
    assert seg_calls == [file["uri"]]
    assert not pipeline.training  # restored after optimization
    journal = tmp_path / "opt" / "journal.jsonl"
    trials = [json.loads(l) for l in journal.read_text().splitlines()]
    assert len(trials) == 4
