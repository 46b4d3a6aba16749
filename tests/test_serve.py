"""Self-hosted pyannoteAI-shaped serving: SDK client -> local server ->
TPU pipeline, full loop."""

import json
import numpy as np
import pytest

from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.pipelines.speaker_diarization import (
    DiarizeOutput, SpeakerDiarization)
from pyannote_audio_tpu.serve import DiarizationServer

from corpus import default_two_speaker_file


@pytest.fixture(scope="module")
def pipeline():
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    return pipeline


def test_sdk_against_local_server(pipeline, tmp_path):
    """The shipped SDK client drives the self-hosted server end to end:
    presigned upload, job queue, poll, DiarizeOutput deserialization."""
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK

    file = default_two_speaker_file(tmp_path / "serve_me.wav")
    with DiarizationServer(pipeline, token="tok") as server:
        sdk = SDK(token="tok")
        sdk._client = Client("tok", base_url=server.api_url,
                             poll_interval=0.05, timeout=300.0)
        output = sdk.apply(str(file["audio"]), max_speakers=3)

    assert isinstance(output, DiarizeOutput)
    assert 1 <= len(output.speaker_diarization.labels()) <= 3
    assert output.speaker_diarization.get_timeline().duration() > 0
    # exclusive variant really is overlap-free
    excl = output.exclusive_speaker_diarization
    assert excl.get_timeline().support().duration() == pytest.approx(
        sum(s.duration for s in excl.get_timeline()), abs=1e-6)


def test_server_auth_and_errors(pipeline, tmp_path):
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    import urllib.error

    with DiarizationServer(pipeline, token="right") as server:
        wrong = Client("wrong", base_url=server.api_url,
                       poll_interval=0.05)
        with pytest.raises(urllib.error.HTTPError) as err:
            wrong.diarize("media://nope")
        assert err.value.code == 401

        good = Client("right", base_url=server.api_url, poll_interval=0.05)
        # diarize before upload -> 400
        with pytest.raises(urllib.error.HTTPError) as err:
            good.diarize("media://never-uploaded")
        assert err.value.code == 400

        # corrupt media -> job reaches "failed" with an error message
        media = good.upload(b"this is not audio")
        job_id = good.diarize(media)
        from pyannote_audio_tpu.pipelines.pyannoteai.client import \
            PyannoteAIFailedJob
        with pytest.raises(PyannoteAIFailedJob):
            good.retrieve(job_id)


def test_server_batches_queued_jobs(pipeline, tmp_path, monkeypatch):
    """Jobs queued together drain through ONE pipelined batch apply."""
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    from corpus import make_file

    calls = {"batch": 0, "single": 0}
    original = pipeline.__class__.__call__

    def counting_call(self, file, *args, **kwargs):
        if isinstance(file, list):
            calls["batch"] += 1
        else:
            calls["single"] += 1
        return original(self, file, *args, **kwargs)

    monkeypatch.setattr(pipeline.__class__, "__call__", counting_call)

    files = [
        make_file(tmp_path / f"q{i}.wav",
                  [("alice", 0.5, 4.0 + i), ("bob", 5.0, 9.0)],
                  duration=12.0 + i, seed=i)
        for i in range(3)
    ]
    server = DiarizationServer(pipeline)
    # enqueue all three BEFORE the worker starts so one drain sees them
    client = Client("x", base_url="dummy")     # only for upload naming
    job_ids = []
    for i, f in enumerate(files):
        media = f"media://q{i}"
        server._media[media] = tmp_path / f"q{i}.wav"
        job_id = f"job{i}"
        server._jobs[job_id] = {"status": "created",
                                "request": {"url": media,
                                            "maxSpeakers": 3}}
        server._queue.put(job_id)
        job_ids.append(job_id)
    import threading
    worker = threading.Thread(target=server._worker, daemon=True)
    worker.start()
    server._queue.put(None)
    worker.join(timeout=120)

    assert calls["batch"] == 1 and calls["single"] == 0
    for job_id in job_ids:
        job = server._jobs[job_id]
        assert job["status"] == "succeeded", job.get("error")
        assert job["output"]["diarization"]


def test_server_rejects_path_escape(pipeline):
    """Upload keys and media registrations must stay inside the spool:
    bare startswith would let ../<spool-name>-suffix/ escape."""
    import urllib.request
    import urllib.error

    with DiarizationServer(pipeline) as server:
        base = server.api_url.rsplit("/v1", 1)[0]

        def put(path, payload=b"x"):
            req = urllib.request.Request(f"{base}{path}", data=payload,
                                         method="PUT")
            return urllib.request.urlopen(req)

        # PUT escaping the spool (sibling dir sharing the name prefix)
        with pytest.raises(urllib.error.HTTPError) as err:
            put("/upload/../" + server.spool.name + "evil/f.wav")
        assert err.value.code == 400
        # registration of an escaping media key -> 400
        req = urllib.request.Request(
            f"{server.api_url}/media/input",
            data=json.dumps({"url": "media://../../etc/passwd"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400
        # an honest key still works
        req = urllib.request.Request(
            f"{server.api_url}/media/input",
            data=json.dumps({"url": "media://ok.wav"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        assert urllib.request.urlopen(req).status == 200


def test_server_evicts_expired_media_and_jobs(pipeline):
    """media_ttl bounds spool disk and job memory."""
    import time as _time

    server = DiarizationServer(pipeline, media_ttl=0.05)
    key = server.spool / "old.wav"
    key.write_bytes(b"data")
    server._media["media://old.wav"] = key
    server._media_ts["media://old.wav"] = _time.time() - 1.0
    server._jobs["done"] = {"status": "succeeded", "output": {},
                            "ts": _time.time() - 1.0}
    server._jobs["pending"] = {"status": "created", "request": {}}
    server._purge_expired()
    assert "media://old.wav" not in server._media
    assert not key.exists()
    assert "done" not in server._jobs
    assert "pending" in server._jobs      # unfinished jobs never evicted
    server._httpd.server_close()
