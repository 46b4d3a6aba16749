"""pyannoteAI wrappers: Local stand-in + SDK error contract."""

import numpy as np
import pytest

from pyannote_audio_tpu.core.io import Audio
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.pipelines.pyannoteai.local import Local
from pyannote_audio_tpu.pipelines.speaker_diarization import (
    DiarizeOutput, SpeakerDiarization)

from corpus import default_two_speaker_file


def _diarization_pipeline():
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


def test_local_wrapper_end_to_end(tmp_path):
    file = default_two_speaker_file(tmp_path / "x.wav")
    local = Local(_diarization_pipeline())
    output = local(dict(file), max_speakers=3)
    assert isinstance(output, DiarizeOutput)
    assert len(output.speaker_diarization.labels()) <= 3
    data = output.serialize()
    assert set(data) == {"diarization", "exclusive_diarization"}


def test_local_rejects_non_diarization_pipeline(tmp_path):
    import yaml
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0, classes=["speech"])
    seg.build()
    seg.save_checkpoint(tmp_path / "seg")
    config = {"pipeline": {
        "name": "pyannote_audio_tpu.pipelines.VoiceActivityDetection",
        "params": {"segmentation": "$model/seg", "batch_size": 8}},
        "params": {"onset": 0.5, "offset": 0.5,
                   "min_duration_on": 0.0, "min_duration_off": 0.0}}
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    with pytest.raises(ValueError):
        Local(str(tmp_path))


def test_sdk_requires_api_key():
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK
    with pytest.raises(Exception):
        sdk = SDK(token=None)
        sdk.diarize("/nonexistent.wav")


# -- native REST client against a local mock server (no egress needed) -----


class _MockPyannoteAIHandler:
    """Request handler factory closing over mutable server state."""

    @staticmethod
    def build(state):
        from http.server import BaseHTTPRequestHandler

        class Handler(BaseHTTPRequestHandler):
            def _send_json(self, obj, code=200):
                import json
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _read_body(self):
                length = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(length)

            def do_POST(self):
                import json
                state["auth"].append(self.headers.get("Authorization"))
                payload = json.loads(self._read_body() or b"{}")
                if self.path.endswith("/media/input"):
                    key = payload["url"].replace("media://", "")
                    host = f"http://{self.server.server_address[0]}:" \
                           f"{self.server.server_address[1]}"
                    self._send_json({"url": f"{host}/upload/{key}"})
                elif self.path.endswith("/diarize"):
                    state["diarize_payload"] = payload
                    self._send_json({"jobId": state["job_id"]})
                else:
                    self._send_json({"error": "not found"}, 404)

            def do_PUT(self):
                state["uploaded"] = self._read_body()
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):
                state["polls"] += 1
                if state["polls"] == 1:
                    self._send_json({"status": "processing"})
                else:
                    self._send_json(state["job_result"])

            def log_message(self, *args):
                pass

        return Handler


@pytest.fixture()
def mock_api():
    import threading
    from http.server import ThreadingHTTPServer

    state = {"auth": [], "polls": 0, "job_id": "job-1",
             "job_result": {"status": "succeeded", "output": {}},
             "uploaded": None, "diarize_payload": None}
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), _MockPyannoteAIHandler.build(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}/v1"
    try:
        yield base, state
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_sdk_end_to_end_against_mock_server(tmp_path, mock_api):
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK

    base, state = mock_api
    state["job_result"] = {
        "status": "succeeded",
        "output": {
            "diarization": [
                {"start": 0.0, "end": 1.5, "speaker": "SPEAKER_00"},
                {"start": 1.2, "end": 3.0, "speaker": "SPEAKER_01"}],
            "exclusiveDiarization": [
                {"start": 0.0, "end": 1.35, "speaker": "SPEAKER_00"},
                {"start": 1.35, "end": 3.0, "speaker": "SPEAKER_01"}]}}

    wav = default_two_speaker_file(tmp_path / "x.wav")["audio"]
    sdk = SDK(token="test-key")
    sdk._client = Client("test-key", base_url=base, poll_interval=0.01)
    output = sdk.apply(str(wav), num_speakers=2)

    assert isinstance(output, DiarizeOutput)
    labels = output.speaker_diarization.labels()
    assert set(labels) == {"SPEAKER_00", "SPEAKER_01"}
    # exclusive variant has no overlap
    excl = output.exclusive_speaker_diarization
    assert excl.get_timeline().support().duration() == pytest.approx(
        sum(s.duration for s in excl.get_timeline()))
    # the wav bytes really were PUT to the presigned url
    assert state["uploaded"] == (tmp_path / "x.wav").read_bytes()
    # auth header present on every API call; diarize payload faithful
    assert all(a == "Bearer test-key" for a in state["auth"])
    assert state["diarize_payload"]["numSpeakers"] == 2
    assert state["diarize_payload"]["model"] == "precision-2"
    assert state["diarize_payload"]["exclusive"] is True
    assert state["polls"] >= 2  # first poll returned "processing"


def test_client_failed_and_canceled_jobs(mock_api):
    from pyannote_audio_tpu.pipelines.pyannoteai.client import (
        Client, PyannoteAICanceledJob, PyannoteAIFailedJob)

    base, state = mock_api
    client = Client("k", base_url=base, poll_interval=0.01)

    state["job_result"] = {"status": "failed", "error": "boom"}
    with pytest.raises(PyannoteAIFailedJob, match="boom"):
        client.retrieve("job-1")

    state["polls"] = 1  # skip the "processing" first response
    state["job_result"] = {"status": "canceled"}
    with pytest.raises(PyannoteAICanceledJob):
        client.retrieve("job-1")


def test_client_requires_token():
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    with pytest.raises(ValueError, match="API key"):
        Client("")


def test_upload_keys_content_addressed(mock_api):
    """Same-stem same-size different-content uploads must not collide
    (the key is content-addressed, not (stem, size)-addressed)."""
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client

    base, state = mock_api
    client = Client("k", base_url=base, poll_interval=0.01)
    url_a = client.upload(b"A" * 100)
    url_b = client.upload(b"B" * 100)
    assert url_a != url_b
    # deterministic: re-uploading identical bytes reuses the same key
    assert client.upload(b"A" * 100) == url_a
