"""Direct unit coverage for small utility modules.

Covers utils/receptive_field.py (vs a torch conv oracle), utils/preprocessors,
utils/hf_hub, utils/preview and pipelines/utils/getter.py — the modules that
previously were only exercised indirectly through the model/pipeline stacks.
"""

from __future__ import annotations

import numpy as np
import pytest

import matplotlib

matplotlib.use("Agg")

from pyannote_audio_tpu import Annotation, Segment, Timeline
from pyannote_audio_tpu.core.segment import SlidingWindow, SlidingWindowFeature
from pyannote_audio_tpu.utils.receptive_field import (
    conv1d_num_frames,
    conv1d_receptive_field_center,
    conv1d_receptive_field_size,
    multi_conv_num_frames,
    multi_conv_receptive_field_center,
    multi_conv_receptive_field_size,
)

from corpus import default_two_speaker_file


# --------------------------------------------------------- receptive field

@pytest.mark.parametrize("kernel_size,stride,padding,dilation", [
    (5, 1, 0, 1), (3, 2, 1, 1), (251, 10, 0, 1), (3, 1, 0, 3), (7, 4, 2, 2),
])
def test_conv1d_num_frames_matches_torch(kernel_size, stride, padding,
                                         dilation):
    torch = pytest.importorskip("torch")
    for num_samples in (260, 400, 1000):
        conv = torch.nn.Conv1d(1, 1, kernel_size, stride=stride,
                               padding=padding, dilation=dilation)
        out = conv(torch.zeros(1, 1, num_samples))
        assert conv1d_num_frames(
            num_samples, kernel_size=kernel_size, stride=stride,
            padding=padding, dilation=dilation) == out.shape[-1]


def _conv_stack_support(frame, kernels, strides, paddings, dilations):
    """Oracle: input-index interval feeding one output frame of a conv stack.

    Propagates [first, last] input indices backwards one layer at a time
    (ignoring clipping at the signal edges, like the closed-form math).
    """
    first = last = frame
    for k, s, p, d in reversed(list(zip(kernels, strides, paddings,
                                        dilations))):
        first = first * s - p
        last = last * s - p + d * (k - 1)
    return first, last


@pytest.mark.parametrize("kernels,strides,paddings,dilations", [
    ([251, 3, 5, 3, 5, 3], [10, 3, 1, 3, 1, 3], [0] * 6, [1] * 6),  # SincNet
    ([5, 3, 3, 1, 1], [1, 1, 1, 1, 1], [0] * 5, [1, 2, 3, 1, 1]),   # XVector
    ([7, 3], [2, 2], [3, 1], [1, 1]),
])
def test_multi_conv_receptive_field_vs_interval_oracle(kernels, strides,
                                                       paddings, dilations):
    for frame in (0, 1, 17):
        first, last = _conv_stack_support(frame, kernels, strides, paddings,
                                          dilations)
        if paddings == [0] * len(kernels):
            # closed-form size ignores padding; the p=0 oracle must match
            size = multi_conv_receptive_field_size(
                1, kernel_size=kernels, stride=strides, dilation=dilations)
            assert size == last - first + 1
        center = multi_conv_receptive_field_center(
            frame, kernel_size=kernels, stride=strides, padding=paddings,
            dilation=dilations)
        # center sits inside the support interval
        assert first <= center <= last
        # and for span-1 frames, equals the closed-form midpoint layer by
        # layer: re-derive with the single-conv helpers
        c = frame
        for k, s, p, d in reversed(list(zip(kernels, strides, paddings,
                                            dilations))):
            c = conv1d_receptive_field_center(c, kernel_size=k, stride=s,
                                              padding=p, dilation=d)
        assert center == c


def test_multi_conv_num_frames_composes():
    kernels, strides = [251, 3, 5, 3, 5, 3], [10, 3, 1, 3, 1, 3]
    n = 80000
    expected = n
    for k, s in zip(kernels, strides):
        expected = conv1d_num_frames(expected, kernel_size=k, stride=s)
    assert multi_conv_num_frames(
        80000, kernel_size=kernels, stride=strides,
        padding=[0] * 6, dilation=[1] * 6) == expected


def test_conv1d_receptive_field_size_single():
    # kernel 5, dilation 2 -> effective 9; 3 frames at stride 4 span 9+8
    assert conv1d_receptive_field_size(1, kernel_size=5, dilation=2) == 9
    assert conv1d_receptive_field_size(3, kernel_size=5, stride=4,
                                       dilation=2) == 17


# --------------------------------------------------------- preprocessors

def _toy_file():
    ann = Annotation(uri="toy")
    ann[Segment(0.13, 1.07), 0] = "alice"
    ann[Segment(2.0, 3.0), 1] = "bob"
    ann[Segment(2.5, 3.5), 2] = "alice"
    return {"uri": "toy", "annotation": ann}


def test_lower_temporal_resolution():
    from pyannote_audio_tpu.utils.preprocessors import LowerTemporalResolution
    out = LowerTemporalResolution(resolution=0.5)(_toy_file())
    segments = sorted((s.start, s.end) for s, _ in out.itertracks())
    assert segments == [(0.0, 1.5), (2.0, 3.0), (2.5, 3.5)]
    # labels preserved
    assert set(out.labels()) == {"alice", "bob"}


def test_derive_meta_labels_mapping_union_intersection():
    from pyannote_audio_tpu.utils.preprocessors import DeriveMetaLabels
    file = _toy_file()
    # mapping: alice -> female, bob -> male
    pre = DeriveMetaLabels(classes=["female", "male"],
                           mapping={"alice": "female", "bob": "male"})
    out = pre(file)
    assert set(out.labels()) == {"female", "male"}
    assert out.label_duration("female") == pytest.approx(1.94, abs=1e-6)

    # union: anyone speaking
    pre = DeriveMetaLabels(classes=[], unions={"speech": ["alice", "bob"]})
    out = pre(file)
    assert out.labels() == ["speech"]

    # intersection: overlapped alice+bob regions
    pre = DeriveMetaLabels(classes=[],
                           intersections={"overlap": ["alice", "bob"]})
    out = pre(file)
    segments = [(s.start, s.end) for s, _ in out.itertracks()]
    assert segments == [(2.5, 3.0)]


def test_waveform_and_sample_rate_preprocessors(tmp_path):
    from pyannote_audio_tpu.utils.preprocessors import SampleRate, Waveform
    file = default_two_speaker_file(tmp_path / "two.wav")
    wav = Waveform(sample_rate=16000)({"audio": file["audio"]})
    assert wav.shape == (1, 480000)
    assert SampleRate(16000)({"audio": file["audio"]}) == 16000


# --------------------------------------------------------- hf_hub shim

def test_resolve_checkpoint_paths(tmp_path, monkeypatch):
    from pyannote_audio_tpu.utils.hf_hub import (
        AssetFileName, download_from_hf_hub, resolve_checkpoint)
    snap = tmp_path / "hub" / "acme" / "seg"
    (snap / "sub").mkdir(parents=True)
    (snap / "config.yaml").write_text("pipeline: {}\n")

    # direct path
    assert resolve_checkpoint(snap) == snap
    assert resolve_checkpoint(snap, subfolder="sub") == snap / "sub"

    # hub-id resolution through PYANNOTE_TPU_HUB roots
    monkeypatch.setenv("PYANNOTE_TPU_HUB",
                       f"/nonexistent:{tmp_path / 'hub'}")
    assert resolve_checkpoint("acme/seg") == snap
    path = download_from_hf_hub("acme/seg", AssetFileName.Pipeline)
    assert path == snap / "config.yaml"

    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("acme/unknown")
    # asset absent locally and the hub endpoint unreachable -> actionable
    # FileNotFoundError (dead local port so no real network is touched)
    monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:9")
    with pytest.raises(FileNotFoundError, match="unreachable"):
        download_from_hf_hub("acme/seg", AssetFileName.Model)


def test_download_from_hf_hub_http(tmp_path, monkeypatch):
    """Real HTTP download path against a local hub mock: resolve url
    layout, bearer auth, pyannoteAI-key filtering, cache reuse, and the
    gated-repo guidance on 401."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyannote_audio_tpu.utils.hf_hub import (AssetFileName,
                                                 download_from_hf_hub)

    state = {"requests": [], "auth": []}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            state["requests"].append(self.path)
            state["auth"].append(self.headers.get("Authorization"))
            if "gated" in self.path:
                self.send_response(401)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = b"pipeline: {params: {}}\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv(
            "HF_ENDPOINT",
            f"http://127.0.0.1:{server.server_address[1]}")
        monkeypatch.setenv("PYANNOTE_TPU_HUB", "")
        monkeypatch.setenv("PYANNOTE_TPU_CACHE", str(tmp_path / "cache"))

        path = download_from_hf_hub("acme/diar", AssetFileName.Pipeline,
                                    revision="v1", token="hf_secret")
        assert path.read_bytes() == b"pipeline: {params: {}}\n"
        assert state["requests"] == ["/acme/diar/resolve/v1/config.yaml"]
        assert state["auth"] == ["Bearer hf_secret"]
        # second call hits the cache, not the server
        again = download_from_hf_hub("acme/diar", AssetFileName.Pipeline,
                                     revision="v1")
        assert again == path and len(state["requests"]) == 1

        # a non-hf_ token (pyannoteAI key) is never sent to the hub;
        # subfolder joins into the resolve url
        download_from_hf_hub("acme/diar", AssetFileName.Pipeline,
                             subfolder="sub", token="pyannoteai-key")
        assert state["requests"][-1] == \
            "/acme/diar/resolve/main/sub/config.yaml"
        assert state["auth"][-1] is None

        # gated repo: 401 propagates (with printed guidance)
        import urllib.error
        with pytest.raises(urllib.error.HTTPError):
            download_from_hf_hub("acme/gated", AssetFileName.Pipeline)

        # a downloaded snapshot becomes resolvable as a checkpoint dir
        from pyannote_audio_tpu.utils.hf_hub import resolve_checkpoint
        assert resolve_checkpoint("acme/diar", revision="v1") == \
            path.parent
    finally:
        server.shutdown()


# --------------------------------------------------------- getters

def test_get_model_variants(tmp_path):
    from pyannote_audio_tpu.core.model import Model
    from pyannote_audio_tpu.core.task import (
        Problem, Resolution, Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import (
        SimpleSegmentationModel)
    from pyannote_audio_tpu.pipelines.utils.getter import get_model

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1"], powerset_max_classes=2)
    model.build()
    root = tmp_path / "ckpt"
    model.save_checkpoint(root / "segmentation")

    assert get_model(model) is model
    loaded = get_model({"checkpoint": str(root), "subfolder": "segmentation"})
    assert isinstance(loaded, Model)
    loaded2 = get_model(str(root / "segmentation"))
    np.testing.assert_array_equal(
        np.asarray(loaded.params["params"]["classifier"]["kernel"]),
        np.asarray(loaded2.params["params"]["classifier"]["kernel"]))


def test_get_calibration_variants(tmp_path):
    from pyannote_audio_tpu.core.calibration import Calibration
    from pyannote_audio_tpu.pipelines.utils.getter import get_calibration

    cal = Calibration()
    scores = np.linspace(0, 1, 50)
    cal.fit(scores, (scores > 0.4).astype(float))
    sub = tmp_path / "ck" / "calibration"
    sub.mkdir(parents=True)
    cal.save(sub / "calibration.safetensors")

    assert get_calibration(cal) is cal
    c1 = get_calibration({"checkpoint": str(tmp_path / "ck"),
                          "subfolder": "calibration"})
    c2 = get_calibration(str(sub / "calibration.safetensors"))
    x = np.linspace(0, 1, 7)
    np.testing.assert_allclose(c1.safe_transform(x), c2.safe_transform(x))


def test_get_augmentation_variants():
    from pyannote_audio_tpu.augmentation.registry import (
        register_augmentation, unregister_augmentation)
    from pyannote_audio_tpu.pipelines.utils.getter import get_augmentation

    assert get_augmentation(None) is None
    fn = lambda X, y: (X, y)  # noqa: E731
    assert get_augmentation(fn) is fn

    register_augmentation("flip_sign_test", lambda X, y: (-X, y))
    try:
        resolved = get_augmentation("flip_sign_test")
        X, y = resolved(np.ones(3), None)
        np.testing.assert_array_equal(X, -np.ones(3))
    finally:
        unregister_augmentation("flip_sign_test")
    with pytest.raises(ValueError):
        get_augmentation("never_registered_xyz")
    with pytest.raises(ValueError):
        get_augmentation(3.14)


def test_get_devices_round_robin():
    from pyannote_audio_tpu.pipelines.utils.getter import get_devices
    devices = get_devices(needs=10)
    assert len(devices) == 10


# --------------------------------------------------------- preview

def test_preview_figure(tmp_path):
    from pyannote_audio_tpu.utils.preview import listen, preview

    file = default_two_speaker_file(tmp_path / "two.wav")
    ann = file["annotation"]
    timeline = Timeline([s for s, _ in ann.itertracks()], uri="toy")
    window = SlidingWindow(start=0.0, duration=0.5, step=0.25)
    swf = SlidingWindowFeature(np.random.default_rng(0).random((8, 2)),
                               window)

    fig = preview({"audio": file["audio"]}, None, ann, timeline, swf)
    assert len(fig.axes) == 4  # waveform + 3 annotation rows
    # crop to a segment: x-limits follow the segment
    fig2 = preview({"audio": file["audio"]}, Segment(1.0, 2.0), ann)
    assert fig2.axes[-1].get_xlim() == (1.0, 2.0)

    import matplotlib.pyplot as plt
    plt.close(fig)
    plt.close(fig2)

    out = listen({"audio": file["audio"]}, Segment(0.5, 1.5))
    # IPython widget when available, otherwise the (waveform, rate) tuple
    if isinstance(out, tuple):
        waveform, rate = out
        assert waveform.shape == (1, 16000) and rate == 16000


def test_from_pretrained_hub_id(tmp_path, monkeypatch):
    """Model/Pipeline.from_pretrained resolve hub ids: snapshot roots
    first, HTTP download of the checkpoint assets second."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyannote_audio_tpu.core.model import (Model, Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.core.pipeline import Pipeline
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    # a real native checkpoint to serve
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION, resolution=Resolution.FRAME,
        duration=2.0, classes=["speech"])
    model.build()
    snap = tmp_path / "serve" / "seg"
    model.save_checkpoint(snap)

    # a VAD pipeline config (served as repo "acme/pipe") referencing the
    # model checkpoint by local path
    import yaml
    cfg_dir = tmp_path / "serve" / "pipe"
    cfg_dir.mkdir(parents=True)
    (cfg_dir / "config.yaml").write_text(yaml.safe_dump({
        "pipeline": {
            "name":
                "pyannote_audio_tpu.pipelines.VoiceActivityDetection",
            "params": {"segmentation": str(snap), "batch_size": 4}},
        "params": {"onset": 0.5, "offset": 0.5,
                   "min_duration_on": 0.0, "min_duration_off": 0.0}}))
    repos = {"acme/seg-tpu": snap, "acme/pipe": cfg_dir}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            # /{org}/{repo}/resolve/{revision}/{file}
            parts = self.path.lstrip("/").split("/")
            source = None
            if len(parts) >= 5 and parts[2] == "resolve":
                repo = repos.get("/".join(parts[:2]))
                if repo is not None:
                    source = repo / "/".join(parts[4:])
            if source is None or not source.exists():
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = source.read_bytes()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv(
            "HF_ENDPOINT",
            f"http://127.0.0.1:{server.server_address[1]}")
        monkeypatch.setenv("PYANNOTE_TPU_HUB", "")
        monkeypatch.setenv("PYANNOTE_TPU_CACHE", str(tmp_path / "cache"))

        loaded = Model.from_pretrained("acme/seg-tpu")
        assert isinstance(loaded, SimpleSegmentationModel)
        import numpy as np
        wav = np.zeros((1, 1, 16000), np.float32)
        np.testing.assert_allclose(np.asarray(loaded(wav)),
                                   np.asarray(model(wav)), atol=1e-6)

        pipeline = Pipeline.from_pretrained("acme/pipe")
        from pyannote_audio_tpu.pipelines.voice_activity_detection import \
            VoiceActivityDetection
        assert isinstance(pipeline, VoiceActivityDetection)

        # unknown id -> actionable error, no crash
        import pytest as _pytest
        with _pytest.raises(ValueError, match="resolvable hub id"):
            Pipeline.from_pretrained("acme/nope")
    finally:
        server.shutdown()


def test_preview_video_gif(tmp_path):
    """Animated preview renders a real multi-frame GIF with the
    reference's **views signature (no ffmpeg binary needed)."""
    from pyannote_audio_tpu.utils.preview import preview_video

    file = default_two_speaker_file(tmp_path / "pv.wav")
    ann = file["annotation"]
    path = preview_video({"uri": "pv", "audio": file["audio"]},
                         Segment(0.0, 3.0), zoom=2.0, video_fps=2,
                         display=False, reference=ann)
    assert path.endswith("pv.gif")
    from PIL import Image
    with Image.open(path) as gif:
        assert gif.format == "GIF"
        assert getattr(gif, "n_frames", 1) >= 2

    # unsupported ext without ffmpeg -> graceful GIF fallback
    with pytest.warns(UserWarning, match="ffmpeg"):
        path2 = preview_video({"uri": "pv", "audio": file["audio"]},
                              Segment(0.0, 1.0), video_fps=2,
                              video_ext="webm", display=False)
    assert path2.endswith(".gif")
