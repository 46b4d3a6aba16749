"""Regression tests for core-runtime review fixes (round 3, session 5):
extensible-WAV decoding, frozen_mask prefix semantics, training resume
with optimizer state, pipeline instantiate errors, ParamDict validity."""

import struct

import numpy as np
import pytest

from corpus import default_two_speaker_file, make_file


def _write_extensible_float_wav(path, waveform: np.ndarray,
                                sample_rate: int) -> None:
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) mono float32 WAV."""
    data = waveform.astype("<f4").tobytes()
    # SubFormat GUID for IEEE float: 03000000-0000-0010-8000-00aa00389b71
    subformat = (b"\x03\x00\x00\x00\x00\x00\x10\x00"
                 b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sample_rate,
                      sample_rate * 4, 4, 32)
    ext = struct.pack("<HHI", 22, 32, 0x4) + subformat
    fmt_chunk = b"fmt " + struct.pack("<I", len(fmt) + len(ext)) + fmt + ext
    data_chunk = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + fmt_chunk + data_chunk
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_extensible_float_wav_decodes_correctly(tmp_path):
    """0xFFFE float32 WAVs must read the real format code from the
    SubFormat GUID — not assume PCM and reinterpret float bytes as
    int32 garbage."""
    from pyannote_audio_tpu.core.io import Audio

    rng = np.random.default_rng(0)
    wav = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    path = tmp_path / "ext.wav"
    _write_extensible_float_wav(path, wav, 16000)
    waveform, sr = Audio(sample_rate=16000, mono="downmix")(str(path))
    assert sr == 16000
    np.testing.assert_allclose(np.asarray(waveform)[0], wav, atol=1e-6)


def test_frozen_mask_prefix_semantics():
    """'lstm' must freeze params/lstm/* but NOT a sibling whose name
    merely contains the substring (pre_lstm_proj)."""
    import jax.numpy as jnp
    from pyannote_audio_tpu.core.model import Model

    model = Model.__new__(Model)
    model.params = {"params": {
        "lstm": {"w": jnp.zeros(2)},
        "pre_lstm_proj": {"w": jnp.zeros(2)},
        "head": {"w": jnp.zeros(2)},
    }}
    mask = Model.frozen_mask(model, ["lstm"])
    assert mask["params"]["lstm"]["w"] is False       # frozen
    assert mask["params"]["pre_lstm_proj"]["w"] is True
    assert mask["params"]["head"]["w"] is True


def test_trainer_resume_continues_trajectory(tmp_path):
    """fit(resume_from=epoch_0) must restore params+optimizer state and
    produce the SAME final parameters as an uninterrupted 2-epoch run."""
    import jax
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.tasks.segmentation import \
        VoiceActivityDetection
    from pyannote_audio_tpu.train import Trainer
    from pyannote_audio_tpu.utils.database import Protocol

    root = tmp_path / "corpus"
    root.mkdir()
    protocol = Protocol(
        name="Debug.SpeakerDiarization.Debug",
        subsets={"train": [default_two_speaker_file(root / "trn.wav")],
                 "development": [make_file(
                     root / "dev.wav", [("alice", 1.0, 4.0)],
                     duration=10.0, seed=2)]})

    def run(ckpt_dir, max_epochs, resume_from=None):
        task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
        model = SimpleSegmentationModel(task=task)
        trainer = Trainer(max_epochs=max_epochs, limit_train_batches=2,
                          checkpoint_dir=ckpt_dir, seed=7)
        trainer.fit(model, task, resume_from=resume_from)
        return model, trainer

    full_model, full_trainer = run(tmp_path / "full", 2)
    assert (tmp_path / "full/epoch_0/train_state.msgpack").exists()
    assert len(full_trainer.history) == 2

    # interrupted run: 1 epoch, then resume for the second
    run(tmp_path / "half", 1)
    resumed_model, resumed_trainer = run(
        tmp_path / "half", 2, resume_from=tmp_path / "half/epoch_0")
    assert [r["epoch"] for r in resumed_trainer.history] == [1]
    for a, b in zip(jax.tree_util.tree_leaves(full_model.params),
                    jax.tree_util.tree_leaves(resumed_model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pipeline_without_defaults_raises_clearly():
    from pyannote_audio_tpu.core.parameter import Uniform
    from pyannote_audio_tpu.core.pipeline import Pipeline

    class NoDefaults(Pipeline):
        def __init__(self):
            super().__init__()
            self.threshold = Uniform(0.0, 1.0)

        def apply(self, file, **kwargs):      # pragma: no cover
            return file

    with pytest.raises(RuntimeError, match="instantiate"):
        NoDefaults()({"waveform": np.zeros((1, 16000), np.float32),
                      "sample_rate": 16000})


def test_paramdict_validity_contract():
    from pyannote_audio_tpu.core.parameter import ParamDict, Uniform

    p = ParamDict(onset=Uniform(0.0, 1.0), offset=Uniform(0.0, 1.0))
    assert {"onset": 0.5, "offset": 0.4} in p
    assert {"onset": 1.5, "offset": 0.4} not in p     # out of range
    assert {"onset": 0.5} not in p                    # missing key
    assert "onset" in p                               # plain key lookup


def test_vad_prepare_chunk_on_speech_free_file(tmp_path):
    """A speech-free file is a legitimate all-negative VAD example — the
    empty label axis must yield zeros, not a zero-size reduction crash."""
    from pyannote_audio_tpu.core.annotation import Annotation, Timeline
    from pyannote_audio_tpu.core.segment import Segment
    from pyannote_audio_tpu.tasks.segmentation import \
        VoiceActivityDetection
    from pyannote_audio_tpu.utils.database import Protocol

    silent = make_file(tmp_path / "sil.wav", [], duration=10.0, seed=3)
    silent["annotation"] = Annotation(uri=silent["uri"])
    silent["annotated"] = Timeline([Segment(0.0, 10.0)])
    spoken = default_two_speaker_file(tmp_path / "spk.wav")
    protocol = Protocol(name="Debug.SpeakerDiarization.Debug",
                        subsets={"train": [spoken, silent]})
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    task.setup()
    out = task.prepare_chunk(silent, Segment(1.0, 3.0),
                             np.random.default_rng(0))
    assert out["y"].shape[1] == 1
    assert float(out["y"].sum()) == 0.0


def test_serve_batched_jobs_get_completion_timestamp():
    """Batch-completed jobs must stamp 'ts' so media_ttl eviction works
    (without it a long-running server accumulates jobs forever)."""
    import time
    from pyannote_audio_tpu.serve import DiarizationServer

    class _FakePipeline:
        def __call__(self, files, **kwargs):
            from pyannote_audio_tpu.core.annotation import Annotation
            if isinstance(files, list):
                return [Annotation(uri="x") for _ in files]
            return Annotation(uri="x")

    server = DiarizationServer(_FakePipeline(), media_ttl=0.05)
    try:
        server.start()
        for i in range(2):
            p = server.spool / f"m{i}.wav"
            p.write_bytes(b"\0")
            server._media[f"media://m{i}.wav"] = p
            server._jobs[f"j{i}"] = {
                "status": "created",
                "request": {"url": f"media://m{i}.wav"}}
        # enqueue together so the worker drains BOTH into one batch
        server._queue.put("j0")
        server._queue.put("j1")
        deadline = time.time() + 10.0
        while time.time() < deadline:
            with server._lock:
                done = all(server._jobs.get(j, {}).get("status")
                           == "succeeded" for j in ("j0", "j1"))
            if done:
                break
            time.sleep(0.01)
        assert done
        with server._lock:
            # the batched success path must stamp ts for ttl eviction
            assert all("ts" in server._jobs[j] for j in ("j0", "j1"))
            for j in ("j0", "j1"):
                server._jobs[j]["ts"] -= 1.0    # age past media_ttl
        server._purge_expired()
        assert "j0" not in server._jobs and "j1" not in server._jobs
    finally:
        server.shutdown()


def test_prepared_cache_without_protocol_stamp_rebuilds(tmp_path):
    """A structurally-valid cache from an older layout (no 'protocol'
    entry) must return None -> rebuild, not crash with KeyError."""
    import numpy as np

    from pyannote_audio_tpu.core.task import _load_prepared_data

    path = tmp_path / "cache.npz"
    np.savez_compressed(
        path, **{"audio-path": np.array(["a.wav"]),
                 "metadata-values": np.array('{"database": []}')})
    assert _load_prepared_data(path) is None


def test_save_checkpoint_is_atomic_and_leaves_no_temp(tmp_path):
    """save_checkpoint publishes via tmp+replace: re-saving 'best' in
    place must never expose a torn file, and temp names are cleaned."""
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.core.model import Model, Problem, Resolution
    from pyannote_audio_tpu.core.model import Specifications

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0, classes=["a"])
    model.build()
    target = tmp_path / "best"
    model.save_checkpoint(target)
    model.save_checkpoint(target)          # in-place re-save
    reloaded = Model.from_pretrained(target)
    assert reloaded is not None
    leftovers = [p for p in target.iterdir() if p.name.startswith(".")]
    assert leftovers == []


def test_calibration_from_pretrained_hub_id(tmp_path, monkeypatch):
    """A non-path id routes through the hub download (reference
    calibration.py:158-220) instead of failing with a raw missing-file
    error."""
    import numpy as np

    from pyannote_audio_tpu.core.calibration import Calibration
    from pyannote_audio_tpu.utils import hf_hub

    cal = Calibration()
    cal.fit(np.linspace(0, 1, 32), (np.linspace(0, 1, 32) > 0.5)
            .astype(float))
    local = tmp_path / "calibration.safetensors"
    cal.save(local)

    seen = {}

    def fake_download(model_id, filename, revision=None, token=None,
                      cache_dir=None):
        seen["id"] = model_id
        seen["filename"] = str(filename)
        return local

    monkeypatch.setattr(hf_hub, "download_from_hf_hub", fake_download)
    loaded = Calibration.from_pretrained("org/calibrated-model")
    assert seen["id"] == "org/calibrated-model"
    assert seen["filename"].endswith("calibration.safetensors")
    ref = cal.transform(np.linspace(0, 1, 9))
    np.testing.assert_allclose(loaded.transform(np.linspace(0, 1, 9)),
                               ref, atol=1e-6)


def test_resolve_hub_id_heals_empty_cache_dir(tmp_path, monkeypatch):
    """An empty cache directory left by a failed download must not
    permanently block re-downloading the model."""
    from pyannote_audio_tpu.core.model import Model
    from pyannote_audio_tpu.utils import hf_hub

    monkeypatch.setenv("PYANNOTE_TPU_HUB_CACHE", str(tmp_path))
    # poison: empty dir exactly where resolve_checkpoint looks
    (tmp_path / "org--model" / "main").mkdir(parents=True)

    calls = []

    def fake_download(model_id, filename, subfolder=None, revision=None,
                      token=None, cache_dir=None):
        calls.append(str(filename))
        target = tmp_path / "org--model" / "main" / str(filename)
        if str(filename).endswith("params.msgpack"):
            target.write_bytes(b"x")
        else:
            target.write_text("name: test")
        return target

    import pyannote_audio_tpu.core.model as model_mod
    monkeypatch.setattr(model_mod, "download_from_hf_hub",
                        fake_download, raising=False)
    monkeypatch.setattr(hf_hub, "download_from_hf_hub", fake_download)
    resolved = Model._resolve_hub_id("org/model")
    assert calls, "empty cache dir blocked the re-download"
    assert resolved == tmp_path / "org--model" / "main"


# --------------------------------------------------- round-5 core review

def test_channel_selection_is_zero_indexed(tmp_path):
    """Reference io.py:69-70: {'channel': k} is ZERO-indexed; channel 0
    must select the first channel, not fall through to downmix."""
    from pyannote_audio_tpu.core.io import Audio, write_wav

    sr = 16000
    left = np.full((1, sr), 0.25, np.float32)
    right = np.full((1, sr), -0.5, np.float32)
    stereo = np.concatenate([left, right])
    path = tmp_path / "stereo.wav"
    write_wav(path, stereo, sr)

    audio = Audio(sample_rate=sr, mono="downmix")
    w0, _ = audio({"audio": str(path), "channel": 0})
    w1, _ = audio({"audio": str(path), "channel": 1})
    assert abs(float(w0.mean()) - 0.25) < 1e-3
    assert abs(float(w1.mean()) + 0.5) < 1e-3

    from pyannote_audio_tpu.core.segment import Segment
    c0, _ = audio.crop({"audio": str(path), "channel": 0},
                       Segment(0.0, 0.5), mode="pad")
    assert abs(float(c0.mean()) - 0.25) < 1e-3


def test_crop_pad_entirely_outside_file(tmp_path):
    """Requests fully past EOF / before 0 return exactly the requested
    width of ZEROS (unclamped math returned wrong widths and could slice
    real samples via a negative hi)."""
    from pyannote_audio_tpu.core.io import Audio, write_wav
    from pyannote_audio_tpu.core.segment import Segment

    sr = 16000
    wav = np.random.default_rng(0).standard_normal((1, sr)).astype(
        np.float32) * 0.1
    wav = np.round(wav * 32768.0).clip(-32768, 32767) / np.float32(32768.0)
    path = tmp_path / "one_sec.wav"
    write_wav(path, wav, sr)
    audio = Audio(sample_rate=None, mono="downmix")

    past, _ = audio.crop({"audio": str(path)}, Segment(1.5, 2.0),
                         mode="pad")
    assert past.shape[1] == sr // 2 and np.all(past == 0.0)

    mem = {"waveform": np.tile(wav, (1, 2)), "sample_rate": sr}
    before, _ = audio.crop(mem, Segment(-1.5, -1.0), mode="pad")
    assert before.shape[1] == sr // 2 and np.all(before == 0.0)

    # straddling the start: zeros only in the padded region
    strad, _ = audio.crop({"audio": str(path)}, Segment(-0.25, 0.25),
                          mode="pad")
    assert strad.shape[1] == sr // 2
    assert np.all(strad[:, : sr // 4] == 0.0)
    np.testing.assert_allclose(strad[:, sr // 4:], wav[:, : sr // 4],
                               atol=1e-6)


def test_freeze_excludes_from_search_space_and_resists_instantiate():
    from pyannote_audio_tpu.core.optimizer import flatten_space
    from pyannote_audio_tpu.core.pipeline import Pipeline
    from pyannote_audio_tpu.pipelines.parameter import ParamDict, Uniform

    class Toy(Pipeline):
        def __init__(self):
            super().__init__()
            self.threshold = Uniform(0.0, 1.0)
            self.block = ParamDict(onset=Uniform(0.0, 1.0),
                                   offset=Uniform(0.0, 1.0))

        def apply(self, file, **kwargs):
            return None

    p = Toy()
    p.freeze({"threshold": 0.7, "block": {"onset": 0.3}})
    space = flatten_space(p.parameters())
    assert "threshold" not in space
    assert "block.onset" not in space
    assert "block.offset" in space

    # optimizer-style instantiate cannot override the pinned values
    p.instantiate({"threshold": 0.1, "block": {"onset": 0.9,
                                               "offset": 0.4}})
    inst = p.parameters(instantiated=True)
    assert inst["threshold"] == 0.7
    assert inst["block"]["onset"] == 0.3
    assert inst["block"]["offset"] == 0.4


def test_pre_aggregation_hook_applies_to_permutation_invariant(tmp_path):
    """Reference inference.py:336-343 gates chunk-level output on
    'permutation_invariant AND no pre_aggregation_hook' — VAD's
    max-over-speakers hook must yield aggregated (frames, 1) scores even
    for permutation-invariant segmentation models."""
    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MULTI_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], permutation_invariant=True)
    model.build()
    wav = (0.1 * np.random.default_rng(0).standard_normal(
        (1, 16000 * 5))).astype(np.float32)
    inf = pat.Inference(model, duration=2.0, step=0.5, batch_size=4,
                        pre_aggregation_hook=lambda s: np.max(
                            s, axis=-1, keepdims=True))
    out = inf({"waveform": wav, "sample_rate": 16000, "uri": "x"})
    data = np.asarray(out.data)
    assert data.ndim == 2 and data.shape[1] == 1  # aggregated, hooked

    # without the hook the permutation-invariant fast path still returns
    # chunk-level device scores
    inf2 = pat.Inference(model, duration=2.0, step=0.5, batch_size=4)
    out2 = inf2({"waveform": wav, "sample_rate": 16000, "uri": "x"})
    assert np.asarray(out2.data).ndim == 3


def test_generic_batch_apply_binds_hook_file(tmp_path):
    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.utils.hook import TimingHook
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0, classes=["speech"])
    model.build()
    sr = 16000
    rng = np.random.default_rng(0)
    files = []
    for i in range(2):
        path = tmp_path / f"f{i}.wav"
        write_wav(path, 0.1 * rng.standard_normal((1, sr * 3)).astype(
            np.float32), sr)
        files.append({"audio": str(path), "uri": f"f{i}"})

    vad = VoiceActivityDetection(segmentation=model)
    vad.instantiate({"onset": 0.5, "offset": 0.5,
                     "min_duration_on": 0.0, "min_duration_off": 0.0})
    with TimingHook() as hook:
        vad(files, hook=hook)
    # the hook wrote per-file timings into each batch file dict
    assert all("timing" in f and f["timing"] for f in files)


def test_device_swf_repr_after_host_assignment():
    import jax.numpy as jnp

    from pyannote_audio_tpu.core.segment import (
        DeviceSlidingWindowFeature, SlidingWindow)

    swf = DeviceSlidingWindowFeature(
        jnp.zeros((4, 5, 2)), SlidingWindow(duration=1.0, step=0.5))
    assert "shape=(4, 5, 2)" in repr(swf)
    swf.data = np.ones((3, 5, 2), np.float32)
    assert "host" in repr(swf)         # printable, flags the host copy


def test_convert_powerset_handles_multitask_tuple():
    import jax.numpy as jnp

    from pyannote_audio_tpu.core.inference import Inference
    from pyannote_audio_tpu.ops.powerset import Powerset

    ps = Powerset(2, 1)   # 3 powerset states: {}, {0}, {1}
    fake = Inference.__new__(Inference)
    fake._powerset = (ps, None)
    fake.skip_conversion = False
    logits = jnp.log(jnp.asarray([[[0.1, 0.8, 0.1]]]))
    other = jnp.ones((1, 1, 4))
    out1, out2 = fake._convert_powerset((logits, other))
    assert out1.shape == (1, 1, 2)     # multilabel space
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(other))


def test_batch_decode_cache_does_not_reapply_channel(tmp_path):
    """The batch machinery caches an already channel-selected mono
    waveform into the file dict; Audio must not re-apply 'channel' to
    that cache (channel 1 of a mono cache slices it empty)."""
    from pyannote_audio_tpu.core.io import Audio, write_wav

    sr = 16000
    stereo = np.stack([np.full(sr, 0.2, np.float32),
                       np.full(sr, -0.4, np.float32)])
    path = tmp_path / "st.wav"
    write_wav(path, stereo, sr)
    audio = Audio(sample_rate=sr, mono="downmix")

    f = {"audio": str(path), "channel": 1}
    waveform, rate = audio(f)
    assert abs(float(waveform.mean()) + 0.4) < 1e-3
    # emulate _decode_into's cache
    f["waveform"] = waveform
    f["sample_rate"] = rate
    f["_batch_decoded"] = True
    again, _ = audio(f)
    assert again.shape == waveform.shape
    np.testing.assert_array_equal(again, waveform)
