"""Serving under real concurrency: N SDK clients race uploads, jobs and
TTL sweeps against one DiarizationServer (VERDICT r4 next #8 — round 4
fixed six serving concurrency defects by review; this exercises them).

Asserts: no 5xx / transport errors, no lost jobs (every submitted job
reaches a deserialized DiarizeOutput), and bounded state (media + jobs
evicted after the TTL). Prints p50/p95 job latency for CHANGELOG."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

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

from corpus import make_file


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


@pytest.mark.slow
def test_concurrent_sdk_clients_no_lost_jobs(pipeline, tmp_path):
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK

    n_clients, jobs_per_client = 6, 3
    files = []
    for i in range(n_clients):
        turns = [("alice", 0.5, 4.0), ("bob", 4.5, 9.0)]
        files.append(make_file(tmp_path / f"load_{i}.wav", turns, 10.0,
                               seed=i))

    # a short TTL makes every request race the eviction sweep against
    # in-flight uploads and queued jobs — live jobs must survive it
    with DiarizationServer(pipeline, token="tok",
                           media_ttl=2.0) as server:
        errors, latencies = [], []
        outputs = {}
        lock = threading.Lock()

        def drive(ci: int):
            sdk = SDK(token="tok")
            sdk._client = Client("tok", base_url=server.api_url,
                                 poll_interval=0.05, timeout=300.0)
            for j in range(jobs_per_client):
                t0 = time.perf_counter()
                try:
                    out = sdk.apply(str(files[ci]["audio"]),
                                    max_speakers=3)
                except Exception as exc:  # noqa: BLE001 — collected
                    with lock:
                        errors.append((ci, j, repr(exc)))
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
                    outputs[(ci, j)] = out

        threads = [threading.Thread(target=drive, args=(ci,))
                   for ci in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "stuck client"

        assert errors == [], errors[:5]
        assert len(outputs) == n_clients * jobs_per_client
        for out in outputs.values():
            assert isinstance(out, DiarizeOutput)
            assert out.speaker_diarization.get_timeline().duration() > 0

        # bounded state: after the TTL passes, one more request triggers
        # the sweep and the server forgets finished media + jobs
        time.sleep(2.5)
        req = urllib.request.Request(
            f"{server.api_url}/jobs/nonexistent",
            headers={"Authorization": "Bearer tok"})
        try:
            urllib.request.urlopen(req)
        except urllib.error.HTTPError as err:
            assert err.code == 404
        with server._lock:
            assert not server._media
            assert not server._jobs
        assert not list(server.spool.glob("*.wav"))

        lat = np.sort(np.asarray(latencies))
        p50 = float(lat[int(0.5 * (len(lat) - 1))])
        p95 = float(lat[int(0.95 * (len(lat) - 1))])
        print(json.dumps({"clients": n_clients,
                          "jobs": len(latencies),
                          "p50_s": round(p50, 3),
                          "p95_s": round(p95, 3)}))


@pytest.mark.slow
def test_concurrent_presigned_uploads_single_use(pipeline, tmp_path):
    """Many presigned PUTs racing the same signature: exactly one wins,
    replays 401, and the spooled body is never torn."""
    from corpus import default_two_speaker_file

    file = default_two_speaker_file(tmp_path / "race.wav")
    body = (tmp_path / "race.wav").read_bytes()

    with DiarizationServer(pipeline, token="tok") as server:
        reg = urllib.request.Request(
            f"{server.api_url}/media/input",
            data=json.dumps({"url": "media://race.wav"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer tok"}, method="POST")
        put_url = json.loads(urllib.request.urlopen(reg).read())["url"]

        statuses = []
        lock = threading.Lock()

        def put():
            req = urllib.request.Request(put_url, data=body,
                                         method="PUT")
            try:
                code = urllib.request.urlopen(req).status
            except urllib.error.HTTPError as err:
                code = err.code
            with lock:
                statuses.append(code)

        threads = [threading.Thread(target=put) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        assert sorted(statuses)[0] == 200
        assert statuses.count(200) == 1, statuses
        assert all(code == 401 for code in statuses if code != 200)
        assert (server.spool / "race.wav").read_bytes() == body
        assert not list(server.spool.glob(".*part*"))
