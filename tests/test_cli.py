"""CLI end-to-end tests (in-process main(), debug models)."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from pyannote_audio_tpu.__main__ import main
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel

from corpus import default_two_speaker_file, make_file


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ckpt")
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    seg.save_checkpoint(root / "segmentation")
    emb = SimpleEmbeddingModel()
    emb.build()
    emb.save_checkpoint(root / "embedding")
    config = {
        "pipeline": {
            "name": "pyannote_audio_tpu.pipelines.SpeakerDiarization",
            "params": {
                "segmentation": "$model/segmentation",
                "embedding": "$model/embedding",
                "clustering": "AgglomerativeClustering",
                "segmentation_batch_size": 8,
                "embedding_batch_size": 8,
            },
        },
        "params": {
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1},
        },
    }
    with open(root / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return root


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    files = [default_two_speaker_file(root / "f0.wav")]
    files.append(make_file(root / "f1.wav",
                           [("carol", 1.0, 6.0), ("dave", 7.0, 12.0)],
                           duration=14.0, seed=3))
    # write rttm/uem/lst sidecars + database.yml
    with open(root / "all.rttm", "w") as f:
        for file in files:
            file["annotation"].write_rttm(f)
    with open(root / "all.uem", "w") as f:
        for file in files:
            for seg in file["annotated"]:
                f.write(f"{file['uri']} 1 {seg.start:.3f} {seg.end:.3f}\n")
    (root / "database.yml").write_text(f"""
Databases:
  CliDB: {root}/{{uri}}.wav
Protocols:
  CliDB:
    SpeakerDiarization:
      P:
        test:
          annotation: {root}/all.rttm
          annotated: {root}/all.uem
        development:
          annotation: {root}/all.rttm
          annotated: {root}/all.uem
""")
    return root


def test_cli_apply(pipeline_dir, corpus_dir, tmp_path):
    out = tmp_path / "out"
    assert main(["apply", str(pipeline_dir),
                 str(corpus_dir / "f0.wav"), "--into", str(out)]) == 0
    assert (out / "f0.rttm").exists()
    data = json.loads((out / "f0.json").read_text())
    assert "diarization" in data


def test_cli_apply_directory_uses_batch(pipeline_dir, corpus_dir,
                                        tmp_path):
    """Multiple inputs route through the pipelined batch apply and every
    file gets its RTTM + JSON."""
    out = tmp_path / "outdir"
    assert main(["apply", str(pipeline_dir), str(corpus_dir),
                 "--into", str(out)]) == 0
    rttms = sorted(p.name for p in out.glob("*.rttm"))
    assert len(rttms) >= 2, rttms
    for rttm in out.glob("*.rttm"):
        data = json.loads(
            (out / f"{rttm.stem}.json").read_text())
        assert "diarization" in data


def test_cli_benchmark(pipeline_dir, corpus_dir, tmp_path):
    out = tmp_path / "bench"
    rc = main(["benchmark", str(pipeline_dir),
               "CliDB.SpeakerDiarization.P", str(out),
               "--registry", str(corpus_dir / "database.yml")])
    assert rc == 0
    assert (out / "metric.txt").exists()
    speed = yaml.safe_load((out / "speed.yml").read_text())
    assert "seconds_per_hour" in speed
    assert (out / "speaker_count_confusion.csv").exists()


def test_cli_strip(pipeline_dir, tmp_path):
    out = tmp_path / "stripped"
    assert main(["strip", str(pipeline_dir / "segmentation"),
                 str(out)]) == 0
    assert (out / "config.yaml").exists()
    assert (out / "params.msgpack").exists()


def test_cli_optimize(pipeline_dir, corpus_dir, tmp_path):
    out = tmp_path / "opt"
    rc = main(["optimize", str(pipeline_dir),
               "CliDB.SpeakerDiarization.P", str(out),
               "--registry", str(corpus_dir / "database.yml"),
               "--subset", "development", "--trials", "2"])
    assert rc == 0
    journal = (out / "journal.jsonl").read_text().splitlines()
    assert len(journal) == 2
    for line in journal:
        trial = json.loads(line)
        assert "objective" in trial


def test_cli_optimize_jaccard_metric(pipeline_dir, corpus_dir, tmp_path):
    """--metric JaccardErrorRate drives the TPE objective (parity:
    reference optimize's Metric option, __main__.py:159-165)."""
    out = tmp_path / "opt_jer"
    rc = main(["optimize", str(pipeline_dir),
               "CliDB.SpeakerDiarization.P", str(out),
               "--registry", str(corpus_dir / "database.yml"),
               "--subset", "development", "--trials", "1",
               "--metric", "JaccardErrorRate"])
    assert rc == 0
    trial = json.loads((out / "journal.jsonl").read_text().splitlines()[0])
    assert 0.0 <= trial["objective"] <= 1.0


def test_cli_benchmark_min_duration_off(pipeline_dir, corpus_dir, tmp_path):
    out = tmp_path / "bench2"
    rc = main(["benchmark", str(pipeline_dir),
               "CliDB.SpeakerDiarization.P", str(out),
               "--registry", str(corpus_dir / "database.yml"),
               "--optimize-min-duration-off"])
    assert rc == 0
    result = yaml.safe_load((out / "min_duration_off.yml").read_text())
    assert 0.0 <= result["min_duration_off"] <= 1.0


def test_cli_apply_stdout(pipeline_dir, corpus_dir, capsys):
    """apply without --into streams RTTM to stdout."""
    assert main(["apply", str(pipeline_dir),
                 str(corpus_dir / "f0.wav")]) == 0
    out = capsys.readouterr().out
    assert out.startswith("SPEAKER f0 1")
    fields = out.splitlines()[0].split()
    assert len(fields) == 10  # RTTM column count


def test_cli_download(pipeline_dir, tmp_path, monkeypatch, capsys):
    """download = warm the cache via Pipeline.from_pretrained (parity:
    reference __main__.py:286-325); local snapshot roots count."""
    monkeypatch.setenv("PYANNOTE_TPU_HUB", str(pipeline_dir.parent))
    assert main(["download", pipeline_dir.name]) == 0
    assert "SpeakerDiarization" in capsys.readouterr().out

    monkeypatch.setenv("PYANNOTE_TPU_HUB", "")
    monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:9")
    assert main(["download", "acme/nope"]) == 1
    assert "Could not load" in capsys.readouterr().out


def test_cli_export(pipeline_dir, tmp_path, capsys):
    """export = native checkpoint dir -> reference pytorch_model.bin."""
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet

    model = PyanNet()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=1)
    model.build()
    model.save_checkpoint(tmp_path / "native")

    assert main(["export", str(tmp_path / "native"),
                 str(tmp_path / "out")]) == 0
    out = capsys.readouterr().out
    assert "pytorch_model.bin" in out
    assert (tmp_path / "out" / "pytorch_model.bin").exists()

    # debug models have no exporter -> actionable failure
    assert main(["export", str(pipeline_dir / "segmentation"),
                 str(tmp_path / "out2")]) == 1
    assert "export_torch" in capsys.readouterr().out
