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


def test_server_rejects_non_integer_speaker_fields(pipeline, tmp_path):
    """Unhashable speaker constraints used to reach the worker's batch
    dedup key and kill the worker thread with TypeError — a one-request
    permanent DoS. They are now rejected at POST time, and the worker
    key is repr-based so nothing client-controlled is ever hashed."""
    import urllib.error
    import urllib.request

    file = default_two_speaker_file(tmp_path / "kwargs.wav")
    with DiarizationServer(pipeline) as server:
        put = urllib.request.Request(
            f"http://{server._httpd.server_address[0]}:"
            f"{server._httpd.server_address[1]}/upload/kw.wav",
            data=(tmp_path / "kwargs.wav").read_bytes(), method="PUT")
        urllib.request.urlopen(put)
        reg = urllib.request.Request(
            f"{server.api_url}/media/input",
            data=json.dumps({"url": "media://kw.wav"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        urllib.request.urlopen(reg)
        for bad in ({"x": 1}, [2], 1.5, True, "3"):
            req = urllib.request.Request(
                f"{server.api_url}/diarize",
                data=json.dumps({"url": "media://kw.wav",
                                 "numSpeakers": bad}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(req)
            assert err.value.code == 400, bad
        # the worker is still alive: a valid job completes
        req = urllib.request.Request(
            f"{server.api_url}/diarize",
            data=json.dumps({"url": "media://kw.wav",
                             "maxSpeakers": 3}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        job_id = json.loads(urllib.request.urlopen(req).read())["jobId"]
        import time as _time
        for _ in range(600):
            status = json.loads(urllib.request.urlopen(
                f"{server.api_url}/jobs/{job_id}").read())
            if status["status"] in ("succeeded", "failed"):
                break
            _time.sleep(0.05)
        assert status["status"] == "succeeded"


def test_purge_keeps_media_of_unfinished_jobs(pipeline):
    """TTL eviction must not delete media an accepted job still needs —
    the job would fail with KeyError when the worker reached it."""
    import time as _time

    server = DiarizationServer(pipeline, media_ttl=0.05)
    key = server.spool / "busy.wav"
    key.write_bytes(b"data")
    server._media["media://busy.wav"] = key
    server._media_ts["media://busy.wav"] = _time.time() - 1.0
    server._jobs["j"] = {"status": "created",
                         "request": {"url": "media://busy.wav"}}
    server._purge_expired()
    assert "media://busy.wav" in server._media and key.exists()
    # once the job finishes (and ages out), the media goes too
    server._jobs["j"]["status"] = "succeeded"
    server._jobs["j"]["ts"] = _time.time() - 1.0
    server._purge_expired()
    assert "media://busy.wav" not in server._media
    assert not key.exists()
    server._httpd.server_close()


def test_handler_purge_is_rate_limited(pipeline, monkeypatch):
    """Request handlers sweep via _maybe_purge: at most one O(state)
    scan per _purge_every, so N pollers don't serialize behind the
    global lock on every GET. Direct _purge_expired stays unthrottled."""
    server = DiarizationServer(pipeline, media_ttl=10.0)
    calls = []
    monkeypatch.setattr(server, "_purge_expired",
                        lambda: calls.append(1))
    server._maybe_purge()
    server._maybe_purge()
    assert calls == [1]
    server._last_purge -= server._purge_every + 1.0
    server._maybe_purge()
    assert calls == [1, 1]
    server._httpd.server_close()
    # media_ttl=0.0 (immediate expiry) must purge on every request, not
    # TypeError on float < None
    zero = DiarizationServer(pipeline, media_ttl=0.0)
    zero._maybe_purge()
    zero._maybe_purge()
    zero._httpd.server_close()


def test_presigned_sig_is_single_use_and_writes_atomically(pipeline,
                                                           tmp_path):
    """A presigned upload URL works exactly once (replay without the
    bearer token is 401), and uploads leave no .part temp files."""
    import urllib.error
    import urllib.request

    default_two_speaker_file(tmp_path / "once.wav")
    with DiarizationServer(pipeline, token="tok") as server:
        reg = urllib.request.Request(
            f"{server.api_url}/media/input",
            data=json.dumps({"url": "media://once.wav"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer tok"}, method="POST")
        put_url = json.loads(urllib.request.urlopen(reg).read())["url"]
        body = (tmp_path / "once.wav").read_bytes()
        put = urllib.request.Request(put_url, data=body, method="PUT")
        # on failure report the actual code/body and the server's
        # signature state instead of a bare assert (see CHANGELOG
        # round 5 for the load-dependent flake this test once had)
        try:
            status = urllib.request.urlopen(put).status
        except urllib.error.HTTPError as first_err:
            pytest.fail(f"first presigned PUT -> {first_err.code}: "
                        f"{first_err.read()!r}; presigned keys: "
                        f"{list(server._presigned)}")
        assert status == 200
        # replay: signature was consumed, and there is no bearer header.
        # The body is deliberately LARGE (>> kernel socket buffers): a
        # server that 401s without draining it makes the kernel RST the
        # connection mid-send and this raises URLError instead of
        # HTTPError — the root cause of the round-5 flake
        big_body = body * max(1, (8 << 20) // len(body) + 1)
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(
                urllib.request.Request(put_url, data=big_body,
                                       method="PUT"))
        assert err.value.code == 401, (
            f"replay -> {err.value.code}: {err.value.read()!r}; "
            f"presigned keys: {list(server._presigned)}")
        assert (server.spool / "once.wav").read_bytes() == body
        assert not list(server.spool.glob(".*part"))
