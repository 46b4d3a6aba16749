"""Training stack tests: losses, tasks, trainer, multi-device DP."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_tpu.core.task import create_rng_for_worker
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.ops.losses import (binary_cross_entropy, nll_loss,
                                           powerset_pit_loss)
from pyannote_audio_tpu.ops.powerset import Powerset
from pyannote_audio_tpu.tasks.segmentation import (MultiLabelSegmentation,
                                                   SpeakerDiarization,
                                                   VoiceActivityDetection)
from pyannote_audio_tpu.train import Trainer
from pyannote_audio_tpu.utils.database import Protocol

from corpus import default_two_speaker_file, make_file


@pytest.fixture(scope="module")
def protocol(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_corpus")
    train_files = [
        default_two_speaker_file(root / "trn00.wav"),
        make_file(root / "trn01.wav",
                  [("carol", 0.5, 4.0), ("dave", 5.0, 9.5),
                   ("carol", 10.0, 14.0)], duration=15.0, seed=1),
    ]
    dev_files = [
        make_file(root / "dev00.wav",
                  [("alice", 1.0, 4.0), ("bob", 5.0, 9.0)],
                  duration=10.0, seed=2),
    ]
    return Protocol(name="Debug.SpeakerDiarization.Debug",
                    subsets={"train": train_files,
                             "development": dev_files})


# ------------------------------------------------------------------ losses

def test_bce_matches_numpy():
    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, (2, 5, 3)).astype(np.float32)
    t = (rng.uniform(size=(2, 5, 3)) > 0.5).astype(np.float32)
    ours = float(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t)))
    ref = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    assert abs(ours - ref) < 1e-5


def test_nll_loss():
    logp = jnp.log(jnp.asarray([[[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]]))
    target = jnp.asarray([[0, 1]])
    expected = -(np.log(0.7) + np.log(0.8)) / 2
    assert abs(float(nll_loss(logp, target)) - expected) < 1e-5


def test_powerset_pit_loss_permutation_invariant():
    ps = Powerset(3, 2)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 20, ps.num_powerset_classes))
    logp = jnp.asarray(
        logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
    target = (rng.uniform(size=(2, 20, 3)) > 0.6).astype(np.float32)
    # valid targets only: frames with more than max_set_size active
    # speakers map to their best-overlap SUBSET (reference argmax
    # semantics), which is tie-broken identically under any column
    # permutation — exact invariance genuinely holds only for targets
    # within capacity (the reference's training path behaves the same)
    over = target.sum(-1) > ps.max_set_size
    target[over] = np.array([1.0, 1.0, 0.0], np.float32)
    loss1, _ = powerset_pit_loss(logp, jnp.asarray(target), ps)
    # permuting target speakers must not change the loss
    perm_target = target[:, :, [2, 0, 1]]
    loss2, _ = powerset_pit_loss(logp, jnp.asarray(perm_target), ps)
    assert abs(float(loss1) - float(loss2)) < 1e-6


def test_to_powerset_overflow_maps_to_best_overlap_subset():
    """Multilabel vectors with more active classes than max_set_size map
    to the best-overlap state (reference one_hot(argmax(ml @ mapping^T)),
    powerset.py:146-168) — NOT to an all-zero row that argmax would turn
    into the empty set (training such frames toward silence)."""
    ps = Powerset(3, 2)
    one_hot = np.asarray(ps.to_powerset(
        jnp.asarray([[1.0, 1.0, 1.0]])))
    assert one_hot.shape == (1, 7)
    assert one_hot.sum() == 1.0               # a real one-hot, not zeros
    # best-overlap subset of {0,1,2} at cardinality <= 2: first pair {0,1}
    mapped = np.asarray(ps.mapping)[one_hot[0].argmax()]
    np.testing.assert_array_equal(mapped, [1.0, 1.0, 0.0])
    # reference permutation_mapping examples (powerset.py:216-231)
    np.testing.assert_array_equal(
        np.asarray(ps.permutation_mapping((1, 0, 2))),
        [0, 2, 1, 3, 4, 6, 5])
    np.testing.assert_array_equal(
        np.asarray(ps.permutation_mapping((1, 2, 0))),
        [0, 2, 3, 1, 6, 4, 5])


def test_powerset_pit_loss_perfect_prediction():
    ps = Powerset(2, 1)
    # target: speaker 0 active on all 4 frames
    target = jnp.asarray(np.tile([[1.0, 0.0]], (1, 4, 1)))
    perfect = np.full((1, 4, 3), -20.0, np.float32)
    perfect[:, :, 1] = 0.0  # log prob ~1 for state {0}
    loss, _ = powerset_pit_loss(jnp.asarray(perfect), target, ps)
    assert float(loss) < 1e-3


# ------------------------------------------------------------------ rng

def test_worker_rng_determinism():
    a = create_rng_for_worker(42, epoch=1).uniform(size=3)
    b = create_rng_for_worker(42, epoch=1).uniform(size=3)
    c = create_rng_for_worker(42, epoch=2).uniform(size=3)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


# ------------------------------------------------------------------ tasks

def test_diarization_task_batches(protocol):
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=4)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)
    assert task.max_speakers_per_chunk >= 2
    batch = next(iter(task.train_batches(epoch=0)))
    assert batch.X.shape == (4, 1, 32000)
    F = model.num_frames(32000)
    assert batch.y.shape == (4, F, task.max_speakers_per_chunk)
    assert set(np.unique(batch.y)) <= {0.0, 1.0}


def test_vad_task_batches(protocol):
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)
    batch = next(iter(task.train_batches(epoch=0)))
    assert batch.y.shape[-1] == 1


def test_threaded_input_pipeline(protocol):
    """num_workers > 1 round-robins deterministic per-worker streams:
    same count as inline and reproducible across runs."""
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              seed=7, num_workers=2)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)
    run1 = [b.X for b in task.train_batches_parallel(epoch=0)]
    run2 = [b.X for b in task.train_batches_parallel(epoch=0)]
    assert len(run1) == max(1, task.train__len__() // task.batch_size)
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)
    # batch i comes from worker i % num_workers's deterministic stream
    w0 = list(task.train_batches(epoch=0, worker_id=0))
    w1 = list(task.train_batches(epoch=0, worker_id=1))
    np.testing.assert_array_equal(run1[0], w0[0].X)
    np.testing.assert_array_equal(run1[1], w1[0].X)
    if len(run1) > 2:
        np.testing.assert_array_equal(run1[2], w0[1].X)


def test_threaded_input_pipeline_propagates_worker_errors(protocol):
    """A dying worker must FAIL the consumer (like the inline path),
    not stall queue.get() forever."""
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              num_workers=2)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)

    def boom(*a, **k):
        raise RuntimeError("corrupt training file")

    task.prepare_chunk = boom
    with pytest.raises(RuntimeError, match="corrupt training file"):
        list(task.train_batches_parallel(epoch=0))


def test_task_reproducibility(protocol):
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2, seed=7)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)
    b1 = next(iter(task.train_batches(epoch=0)))
    b2 = next(iter(task.train_batches(epoch=0)))
    np.testing.assert_array_equal(b1.X, b2.X)
    b3 = next(iter(task.train_batches(epoch=1)))
    assert not np.array_equal(b1.X, b3.X)


# ------------------------------------------------------------------ train

def test_trainer_fit_diarization(protocol):
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=4)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=2)
    trainer.fit(model, task)
    assert np.isfinite(trainer.history[0]["loss"])


def test_trainer_fit_multilabel(protocol):
    """Parity: reference test_train_multilabel_segmentation."""
    task = MultiLabelSegmentation(protocol, duration=2.0, batch_size=4)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=2)
    trainer.fit(model, task)
    assert np.isfinite(trainer.history[0]["loss"])
    # classes inferred from the training annotations
    assert set(task.classes) == {"alice", "bob", "carol", "dave"}


def test_trainer_fit_multidevice_dp(protocol):
    from jax.sharding import Mesh
    devices = jax.devices()
    assert len(devices) == 8, "conftest must force 8 cpu devices"
    mesh = Mesh(np.array(devices), axis_names=("data",))
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=8)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=2, mesh=mesh)
    trainer.fit(model, task)
    assert np.isfinite(trainer.history[0]["loss"])
    # XLA's inserted gradient all-reduce must reproduce the
    # single-device run exactly: same seed, same batches -> same losses
    # and same validation metrics
    task1 = SpeakerDiarization(protocol, duration=2.0, batch_size=8)
    model1 = SimpleSegmentationModel(task=task1)
    trainer1 = Trainer(max_epochs=1, limit_train_batches=2)
    trainer1.fit(model1, task1)
    rec8, rec1 = trainer.history[0], trainer1.history[0]
    assert rec8["loss"] == pytest.approx(rec1["loss"], rel=1e-4)
    for key in ("der/val", "der/val/optimal", "loss/val"):
        if key in rec1:
            assert rec8[key] == pytest.approx(rec1[key],
                                              rel=1e-4, abs=1e-5), key


def test_trainer_checkpoint_roundtrip(protocol, tmp_path):
    import pyannote_audio_tpu as pat
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=1,
                      checkpoint_dir=tmp_path)
    trainer.fit(model, task)
    loaded = pat.Model.from_pretrained(tmp_path / "epoch_0")
    assert type(loaded).__name__ == "SimpleSegmentationModel"
    chex = np.asarray(loaded(np.zeros((1, 1, 32000), np.float32)))
    assert np.isfinite(chex).all()


def test_transfer_learning_head_swap(protocol):
    """Fit VAD, then re-fit the same model on diarization (head swap)."""
    task1 = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task1)
    Trainer(max_epochs=1, limit_train_batches=1).fit(model, task1)
    frontend_before = np.asarray(
        model.params["params"]["frontend"]["kernel"])
    task2 = SpeakerDiarization(protocol, duration=2.0, batch_size=2)
    model.task = task2
    Trainer(max_epochs=1, limit_train_batches=1).fit(model, task2)
    # trunk weights were carried over (then updated by 1 step): same shape,
    # and the head dimension changed
    frontend_after = np.asarray(
        model.params["params"]["frontend"]["kernel"])
    assert frontend_before.shape == frontend_after.shape
    assert model.dimension == task2.powerset.num_powerset_classes


def test_early_stopping_and_best_checkpoint(protocol, tmp_path):
    """monitor= tracks the metric; best/ checkpoint refreshes on
    improvement; patience stops training early (parity role: lightning
    ModelCheckpoint + EarlyStopping in the reference recipes)."""
    import pyannote_audio_tpu as pat
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              seed=5)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=50, limit_train_batches=1,
                      learning_rate=0.0,     # loss can never improve
                      checkpoint_dir=tmp_path,
                      monitor=("loss", "min"),
                      early_stopping_patience=2)
    trainer.fit(model, task)
    # epoch 0 sets the best; epochs 1-2 don't improve -> stop at 3 epochs
    assert len(trainer.history) <= 4
    assert trainer.best_epoch == 0
    assert (tmp_path / "best" / "config.yaml").exists()
    loaded = pat.Model.from_pretrained(tmp_path / "best")
    out = np.asarray(loaded(np.zeros((1, 1, 32000), np.float32)))
    assert np.isfinite(out).all()


def test_finetune_freeze_with_cache(protocol, tmp_path):
    """Combined reference matrix case (test_train.py:213-254): load a
    trained checkpoint, freeze the trunk, fine-tune on a cached-data task;
    frozen weights must not move while the head trains."""
    import pyannote_audio_tpu as pat
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2,
                                  cache=str(tmp_path / "cache.npz"))
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=1,
                      checkpoint_dir=tmp_path / "ckpt")
    trainer.fit(model, task)

    pretrained = pat.Model.from_pretrained(tmp_path / "ckpt" / "epoch_0")
    task2 = VoiceActivityDetection(protocol, duration=2.0, batch_size=2,
                                   cache=str(tmp_path / "cache.npz"))
    trainer2 = Trainer(max_epochs=1, limit_train_batches=2)
    trainer2.frozen_prefixes = ()  # set after fit() resets it below

    class FreezeTrunk:
        def on_train_epoch_start(self, trainer, model, epoch):
            trainer.frozen_prefixes = ("frontend",)
    trainer2.callbacks.append(FreezeTrunk())
    frontend_before = np.asarray(
        pretrained.params["params"]["frontend"]["kernel"]).copy()
    head_before = np.asarray(
        pretrained.params["params"]["classifier"]["kernel"]).copy()
    trainer2.fit(pretrained, task2)
    frontend_after = np.asarray(
        pretrained.params["params"]["frontend"]["kernel"])
    head_after = np.asarray(
        pretrained.params["params"]["classifier"]["kernel"])
    np.testing.assert_array_equal(frontend_before, frontend_after)
    assert not np.array_equal(head_before, head_after)


def test_transfer_freeze_head_swap(protocol):
    """Reference matrix: transfer to a new task with a frozen trunk
    (test_train.py:257-282) — head swaps dimension, trunk is untouched."""
    task1 = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task1)
    Trainer(max_epochs=1, limit_train_batches=1).fit(model, task1)
    frontend_before = np.asarray(
        model.params["params"]["frontend"]["kernel"]).copy()

    task2 = SpeakerDiarization(protocol, duration=2.0, batch_size=2)
    trainer = Trainer(max_epochs=1, limit_train_batches=2)

    class FreezeTrunk:
        def on_train_epoch_start(self, trainer, model, epoch):
            trainer.frozen_prefixes = ("frontend",)
    trainer.callbacks.append(FreezeTrunk())
    trainer.fit(model, task2)
    np.testing.assert_array_equal(
        frontend_before,
        np.asarray(model.params["params"]["frontend"]["kernel"]))
    assert model.dimension == task2.powerset.num_powerset_classes


def test_arcface_task_training(protocol):
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.tasks.embedding import (
        SupervisedRepresentationLearningWithArcFace, arcface_loss)

    task = SupervisedRepresentationLearningWithArcFace(
        protocol, duration=2.0, min_duration=1.0,
        num_classes_per_batch=2, num_chunks_per_class=2)
    model = SimpleEmbeddingModel(task=task)
    task.setup(model)
    assert len(task.classes) >= 2
    batch = next(iter(task.train_batches(epoch=0)))
    assert batch.X.shape[0] == 4
    assert set(np.unique(batch.y)) <= set(range(len(task.classes)))

    trainer = Trainer(max_epochs=2, limit_train_batches=3,
                      learning_rate=3e-3)
    trainer.fit(model, task)
    losses = [h["loss"] for h in trainer.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning


def test_arcface_loss_prefers_correct_class():
    import jax
    from pyannote_audio_tpu.tasks.embedding import arcface_loss
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    emb_correct = W[jnp.asarray([0, 1, 2])] * 3.0
    labels = jnp.asarray([0, 1, 2])
    good = float(arcface_loss(emb_correct, labels, W))
    bad = float(arcface_loss(emb_correct, jnp.asarray([1, 2, 3]), W))
    assert good < bad


def test_task_prepared_data_cache(protocol, tmp_path):
    """cache= writes an npz on first prepare, reuses it on the next
    (parity: test_train_segmentation_with_cached_data_mono_device)."""
    cache = tmp_path / "prepared" / "meta.npz"
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              seed=7, cache=str(cache))
    task.setup(SimpleSegmentationModel(task=task))
    assert cache.exists()
    b1 = next(iter(task.train_batches(epoch=0)))

    # second task loads regions from the cache even if durations are
    # unreadable: poison get_duration to prove the scan is skipped
    task2 = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                               seed=7, cache=str(cache))

    def boom(file):
        raise RuntimeError("audio scan ran despite cache")
    task2.audio.get_duration = boom
    task2.setup(SimpleSegmentationModel(task=task2))
    b2 = next(iter(task2.train_batches(epoch=0)))
    np.testing.assert_array_equal(b1.X, b2.X)
    assert [f["_annotated_duration"] for f in task._train_files] == \
        [f["_annotated_duration"] for f in task2._train_files]


def test_trainer_logs_metrics_and_validation_figures(protocol, tmp_path):
    """log_dir= writes per-epoch metrics.jsonl (DER component family) and
    power-of-two-epoch sample figures (parity: mixins.py:302-437)."""
    import json
    log_dir = tmp_path / "logs"
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2, seed=1)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=3, limit_train_batches=2,
                      learning_rate=1e-3, log_dir=str(log_dir))
    trainer.fit(model, task)
    lines = [json.loads(l) for l in
             (log_dir / "metrics.jsonl").read_text().splitlines()]
    assert [l["epoch"] for l in lines] == [0, 1, 2]
    assert all("der/val" in l and "der/val/false_alarm" in l
               for l in lines)
    # epochs 0, 1, 2 are all power-of-two (or zero) -> all get figures
    for epoch in (0, 1, 2):
        assert (log_dir / f"samples_epoch{epoch}.png").exists()


def test_task_prepared_data_cache_is_protocol_free(protocol, tmp_path):
    """A warm cache rebuilds everything (annotations included) with ZERO
    protocol access — parity with the reference's compact-array
    prepared_data (core/task.py:308-597)."""
    cache = tmp_path / "meta.npz"
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              seed=7, cache=str(cache))
    task.setup(SimpleSegmentationModel(task=task))
    b1 = next(iter(task.train_batches(epoch=0)))
    # reference key layout present
    for key in ("protocol", "audio-path", "audio-metadata",
                "audio-annotated", "annotations-regions",
                "audio-regions-ids", "annotations-segments",
                "audio-segments-ids", "metadata-values",
                "metadata-labels"):
        assert key in task.prepared_data, key

    class PoisonProtocol:
        name = "Debug.SpeakerDiarization.Debug"  # must match the cache

        def train(self):
            raise RuntimeError("protocol scanned despite warm cache")

        def development(self):
            raise RuntimeError("protocol scanned despite warm cache")

    task2 = SpeakerDiarization(PoisonProtocol(), duration=2.0,
                               batch_size=2, seed=7, cache=str(cache))
    task2.setup(SimpleSegmentationModel(task=task2))
    b2 = next(iter(task2.train_batches(epoch=0)))
    np.testing.assert_array_equal(b1.X, b2.X)
    np.testing.assert_array_equal(b1.y, b2.y)
    # annotations were rebuilt from the segment arrays
    f1, f2 = task._train_files[0], task2._train_files[0]
    assert f1["annotation"].labels() == f2["annotation"].labels()
    assert f1["uri"] == f2["uri"]


def test_prepared_data_cache_rejects_other_protocol(protocol, tmp_path):
    """A cache built from one protocol must not be served for another
    (parity: reference prepare_data protocol-name check)."""
    import pytest
    from pyannote_audio_tpu.utils.database import Protocol as _Protocol
    cache = tmp_path / "meta.npz"
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2,
                              cache=str(cache))
    task.prepare_data()
    other = _Protocol(name="SomeOther.Protocol", subsets={"train": []})
    task2 = SpeakerDiarization(other, duration=2.0, batch_size=2,
                               cache=str(cache))
    with pytest.raises(ValueError, match="protocol"):
        task2.prepare_data()


def test_monitor_fallback_uses_min_direction(protocol):
    """With a max-direction monitor that never materializes (no dev
    subset), best-epoch tracking falls back to train loss with MIN
    direction — it must not invert and crown the first epoch."""
    from pyannote_audio_tpu.utils.database import Protocol as _Protocol
    train_only = _Protocol(
        name="Debug.SpeakerDiarization.Debug",
        subsets={"train": list(protocol.train())})
    task = VoiceActivityDetection(train_only, duration=2.0, batch_size=2,
                                  seed=3)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=4, limit_train_batches=2,
                      learning_rate=3e-3,
                      monitor=("auroc/val", "max"),
                      early_stopping_patience=3)
    trainer.fit(model, task)
    losses = [h["loss"] for h in trainer.history]
    # loss decreases -> best epoch must be a later epoch, not epoch 0
    assert trainer.best_epoch == int(np.argmin(losses))
    assert trainer.best_epoch != 0


def test_prepared_data_label_scopes(tmp_path):
    """database/global-scope label indices survive the cache round-trip
    (parity: metadata-{db}-labels / metadata-labels tables)."""
    from pyannote_audio_tpu.core.task import Task
    from pyannote_audio_tpu.utils.database import Protocol
    from tests.corpus import make_file

    files = []
    for i, uri in enumerate(("f1", "f2")):
        f = make_file(tmp_path / f"{uri}.wav",
                      [("alice", 0.5, 3.0), ("bob", 3.5, 7.0)], 8.0,
                      seed=i)
        f["scope"] = "global"
        f["database"] = "TestDB"
        f["domain"] = f"dom{i}"          # extra str metadata
        files.append(f)
    protocol = Protocol(name="scopes", subsets={"train": files})

    cache = tmp_path / "cache.npz"
    task = Task(protocol, duration=2.0, cache=str(cache))
    task.prepare_data()
    seg = task.prepared_data["annotations-segments"]
    assert set(seg["database_label_idx"]) <= {0, 1}
    assert (seg["global_label_idx"] >= 0).all()
    assert list(task.prepared_data["metadata-TestDB-labels"]) == \
        list(task.prepared_data["metadata-labels"])

    task2 = Task(protocol, duration=2.0, cache=str(cache))
    task2.prepare_data()
    assert list(task2.prepared_data["metadata-labels"]) == \
        list(task.prepared_data["metadata-labels"])
    np.testing.assert_array_equal(
        task2.prepared_data["annotations-segments"], seg)
    # extra metadata reconstructed onto the live dicts
    assert [f["domain"] for f in task2._train_files] == ["dom0", "dom1"]
    assert [f["database"] for f in task2._train_files] == ["TestDB"] * 2
    assert [f["scope"] for f in task2._train_files] == ["global"] * 2


def test_powerset_cardinality_and_weighted_loss():
    """Powerset.cardinality parity (build_cardinality, reference
    utils/powerset.py:111) and class-weighted PIT loss behavior."""
    import jax.numpy as jnp
    from pyannote_audio_tpu.ops.powerset import Powerset
    from pyannote_audio_tpu.ops.losses import powerset_pit_loss

    ps = Powerset(3, 2)   # {}, {0},{1},{2}, {01},{02},{12} -> 7 classes
    card = np.asarray(ps.cardinality)
    np.testing.assert_array_equal(card, [0, 1, 1, 1, 2, 2, 2])

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 8, 7)).astype(np.float32)
    log_probs = jnp.asarray(logits) - \
        jnp.log(jnp.sum(jnp.exp(logits), axis=-1, keepdims=True))
    target = (rng.uniform(size=(2, 8, 3)) > 0.6).astype(np.float32)

    plain, _ = powerset_pit_loss(log_probs, jnp.asarray(target), ps)
    weighted, _ = powerset_pit_loss(
        log_probs, jnp.asarray(target), ps,
        class_weight=jnp.maximum(ps.cardinality, 1))
    assert np.isfinite(float(plain)) and np.isfinite(float(weighted))
    # uniform class weights must reproduce the unweighted loss
    uniform, _ = powerset_pit_loss(log_probs, jnp.asarray(target), ps,
                                   class_weight=jnp.ones(7))
    np.testing.assert_allclose(float(uniform), float(plain), rtol=1e-5)


def test_trainer_fit_weigh_by_cardinality(protocol):
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=4,
                              weigh_by_cardinality=True)
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=2)
    trainer.fit(model, task)
    assert np.isfinite(trainer.history[0]["loss"])


def test_unknown_specifications_error(protocol):
    """Parity: reference tests/tasks/test_specifications.py."""
    from pyannote_audio_tpu.core.model import UnknownSpecificationsError
    task = SpeakerDiarization(protocol, duration=2.0, batch_size=2)
    with pytest.raises(UnknownSpecificationsError):
        _ = task.specifications
    model = SimpleSegmentationModel()
    model.task = task
    with pytest.raises(UnknownSpecificationsError):
        _ = model.specifications


# ------------------------------------------------- loss weighting / warm-up

class _FrameLogitModel:
    """Stub model: per-frame predictions = sigmoid(params), (B, F, 1)."""

    def __init__(self, num_frames):
        self.num_frames = num_frames

    def apply_fn(self, params, X):
        return jnp.broadcast_to(
            jax.nn.sigmoid(params)[None, :, None],
            (X.shape[0], self.num_frames, 1))


def test_warm_up_frames_do_not_affect_gradients(protocol):
    """Loss gradients are zero inside warm-up regions (ref task.py:732)."""
    from pyannote_audio_tpu.core.task import TrainingBatch

    duration, num_frames = 2.0, 20
    task = VoiceActivityDetection(protocol, duration=duration,
                                  warm_up=0.5)   # 0.5 s -> 5 frames/side
    model = _FrameLogitModel(num_frames)
    y = np.zeros((2, num_frames, 1), np.float32)
    y[:, ::2] = 1.0
    batch = TrainingBatch(X=np.zeros((2, 1, 100), np.float32), y=y)

    params = jnp.zeros((num_frames,))
    grads = jax.grad(lambda p: task.loss(model, p, batch))(params)
    grads = np.asarray(grads)
    assert (grads[:5] == 0).all() and (grads[-5:] == 0).all()
    assert (grads[5:-5] != 0).any()

    # changing targets inside warm-up must not change the loss
    y2 = y.copy()
    y2[:, :5] = 1.0 - y2[:, :5]
    loss1 = float(task.loss(model, params, batch))
    loss2 = float(task.loss(
        model, params,
        TrainingBatch(X=batch.X, y=y2)))
    assert loss1 == loss2


def test_per_frame_weight_is_used(protocol):
    """The `weight` file key threads into the loss; zero-weight frames
    cannot affect it (ref utils/loss.py:32)."""
    from pyannote_audio_tpu.core.task import TrainingBatch

    num_frames = 20
    task = VoiceActivityDetection(protocol, duration=2.0,
                                  weight="confidence")
    model = _FrameLogitModel(num_frames)
    y = np.zeros((1, num_frames, 1), np.float32)
    y[:, ::2] = 1.0
    w = np.ones((1, num_frames, 1), np.float32)
    w[:, :10] = 0.0
    params = jnp.linspace(-1.0, 1.0, num_frames)
    base = float(task.loss(
        model, params, TrainingBatch(X=np.zeros((1, 1, 100), np.float32),
                                     y=y, weight=w)))
    y2 = y.copy()
    y2[:, :10] = 1.0 - y2[:, :10]   # only zero-weight frames change
    changed = float(task.loss(
        model, params, TrainingBatch(X=np.zeros((1, 1, 100), np.float32),
                                     y=y2, weight=w)))
    assert base == changed

    y3 = y.copy()
    y3[:, 10:] = 1.0 - y3[:, 10:]   # weighted frames change
    moved = float(task.loss(
        model, params, TrainingBatch(X=np.zeros((1, 1, 100), np.float32),
                                     y=y3, weight=w)))
    assert moved != base


def test_chunk_weight_cropped_from_file(protocol):
    """prepare_chunk picks up the per-frame weight key from the file."""
    from pyannote_audio_tpu.core.segment import (Segment, SlidingWindow,
                                                 SlidingWindowFeature)

    task = VoiceActivityDetection(protocol, duration=2.0,
                                  weight="confidence")
    task.setup()
    file = dict(next(iter(protocol.train())))
    # 10 fps confidence track over the whole file
    dur = 15.0
    conf = SlidingWindowFeature(
        np.linspace(0, 1, int(dur * 10), dtype=np.float32)[:, None],
        SlidingWindow(duration=0.1, step=0.1))
    file["confidence"] = conf
    out = task.prepare_chunk(file, Segment(1.0, 3.0),
                             np.random.default_rng(0))
    assert "weight" in out
    assert out["weight"].shape[1] == 1
    assert (out["weight"] >= 0).all()


def test_nan_loss_batch_skip():
    """A NaN batch leaves params and optimizer state untouched."""
    import optax
    from pyannote_audio_tpu.train.trainer import make_train_step

    class MeanTask:
        def loss(self, model, params, batch):
            return jnp.mean(batch.X) * jnp.sum(params["w"] ** 2)

    params = {"w": jnp.asarray([1.0, 2.0])}
    optimizer = optax.adam(1e-1)
    opt_state = optimizer.init(params)
    step = make_train_step(MeanTask(), model=None, optimizer=optimizer)

    X_good = jnp.ones((2, 4))
    y = jnp.zeros((2, 1))
    # the step donates params/opt_state buffers (aliased in place), so
    # snapshot host copies BEFORE each call for the comparisons
    w0 = np.asarray(params["w"]).copy()
    p1, o1, loss1 = step(params, opt_state, X_good, y, None, None)
    assert np.isfinite(float(loss1))
    w1 = np.asarray(p1["w"]).copy()
    assert not np.allclose(w1, w0)

    o1_host = [np.asarray(le).copy()
               for le in jax.tree_util.tree_leaves(o1)]
    X_nan = X_good.at[0, 0].set(jnp.nan)
    p2, o2, loss2 = step(p1, o1, X_nan, y, None, None)
    assert not np.isfinite(float(loss2))
    np.testing.assert_array_equal(np.asarray(p2["w"]), w1)
    # optimizer state (including step count) is also untouched
    for a, b in zip(o1_host, jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_evaluate_helper(protocol):
    """tasks.segmentation.evaluate (reference typer helper parity):
    frame-level DER over a subset with a per-file report."""
    from pyannote_audio_tpu.tasks.segmentation import evaluate
    model = SimpleSegmentationModel()
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    der = evaluate(protocol, subset="development", model=model,
                   display=False)
    assert np.isfinite(der) and der >= 0.0


# --------------------------------------------------- round-5 review fixes

def test_train_step_threads_meta_and_weight(protocol):
    """make_train_step must deliver batch.meta (PixIT's drawn MoMs) and a
    traced weight array to task.loss — meta was dropped (the loss fell
    into the even/odd fallback) and loss_weight crashed on np.asarray of
    a tracer."""
    import optax

    from pyannote_audio_tpu.train.trainer import make_train_step

    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task)
    task.setup(model)
    model.build(rng=jax.random.PRNGKey(0))

    batch = next(iter(task.train_batches(epoch=0)))
    num_frames = model.num_frames(batch.X.shape[-1])

    class Probe:
        def __init__(self, inner):
            self.inner = inner
            self.meta_probe = []

        def loss(self, model_, p, b):
            # record trace-time facts (loss runs under jit: the list
            # append happens at trace time, once)
            self.meta_probe.append(
                (b.meta is not None, b.weight is not None))
            base = self.inner.loss(model_, p, b)
            extra = 0.0 if b.meta is None else 0.0 * jnp.sum(b.meta["m"])
            return base + extra

    probe = Probe(task)
    step = make_train_step(probe, model, optax.adam(1e-3))
    opt_state = optax.adam(1e-3).init(model.params)
    w = jnp.ones((batch.X.shape[0], num_frames, 1), jnp.float32) * 0.7
    meta = {"m": jnp.ones((batch.X.shape[0], 4), jnp.float32)}
    _, _, loss = step(model.params, opt_state,
                      jnp.asarray(batch.X), jnp.asarray(batch.y), w, meta)
    assert np.isfinite(float(loss))
    assert probe.meta_probe == [(True, True)]


def test_vad_weighted_training_through_fit(protocol):
    """End to end: weight key present on SOME files only — collate must
    fill neutral weights and the jitted step must interpolate the traced
    array (TracerArrayConversionError regression)."""
    files = list(protocol._subsets["train"])
    total = files[0]["annotated"].extent().end
    n = int(total * 10)
    files[0]["confidence"] = np.linspace(0.2, 1.0, n).astype(np.float32)
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2,
                                  weight="confidence")
    model = SimpleSegmentationModel(task=task)
    trainer = Trainer(max_epochs=1, limit_train_batches=3)
    trainer.fit(model, task)
    assert np.isfinite([h["loss"] for h in trainer.history]).all()


def test_chunk_weight_fixed_slice_length(protocol):
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2,
                                  weight="confidence")
    from pyannote_audio_tpu.core.segment import Segment
    file = {"confidence": np.arange(100, dtype=np.float32),
            "duration": 15.0}
    lengths = {task.chunk_weight(file, Segment(s, s + 2.0)).shape[0]
               for s in (0.0, 0.3, 7.77, 12.99, 13.0)}
    assert len(lengths) == 1           # identical across chunk starts


def test_arcface_batches_quantized_duration_and_turn_bounded(protocol):
    """Durations snap to a 0.25 s grid (jit shape reuse) and short turns
    are zero-padded, never extended into neighboring speakers' audio."""
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.tasks.embedding import \
        SupervisedRepresentationLearningWithArcFace

    task = SupervisedRepresentationLearningWithArcFace(
        protocol, duration=3.5, min_duration=1.0,
        num_classes_per_batch=2, num_chunks_per_class=2)
    model = SimpleEmbeddingModel(task=task)
    task.setup(model)
    sizes = set()
    for i, batch in enumerate(task.train_batches(epoch=0)):
        sizes.add(batch.X.shape[-1])
        if i >= 5:
            break
    assert all(s % 4000 == 0 for s in sizes), sizes   # 0.25 s * 16 kHz

    # short-turn bound: a turn shorter than the drawn duration yields a
    # chunk with silence padding, not neighboring audio. dave [5.0, 9.5]
    # in trn01 is adjacent to carol [10.0, 14.0]; with duration > turn
    # length the old code read into carol's speech.
    rng = np.random.default_rng(0)
    turns = task._speech_turns[task.classes[0]]
    file, seg = turns[0]
    # emulate the short-turn branch directly
    duration = seg.duration + 1.0
    num_samples = int(round(duration * task.audio.sample_rate))
    waveform, _ = task.audio.crop(file, seg)
    assert waveform.shape[1] < num_samples


def test_mixit_loss_weight_masks_fabricated_pairs():
    from pyannote_audio_tpu.tasks.separation import mixit_loss

    rng = np.random.default_rng(0)
    est = jnp.asarray(rng.standard_normal((2, 400, 3)).astype(np.float32))
    m1 = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    m2 = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    full = float(mixit_loss(est, m1, m2))
    only_first = float(mixit_loss(est[:1], m1[:1], m2[:1]))
    weighted = float(mixit_loss(est, m1, m2,
                                weight=jnp.asarray([1.0, 0.0])))
    assert abs(weighted - only_first) < 1e-4
    assert abs(weighted - full) > 1e-6 or abs(only_first - full) < 1e-6


def test_pixit_validation_keeps_most_talkative_speakers(protocol):
    from pyannote_audio_tpu.core.segment import Segment
    from pyannote_audio_tpu.tasks.separation import PixIT

    task = PixIT(protocol, duration=2.0, max_speakers_per_chunk=1)
    task.setup()
    # trn00: alice & bob overlap region — keep the dominant one, not the
    # alphabetically first
    file = dict(protocol._subsets["train"][0])
    chunk = Segment(0.0, 2.0)
    cropped = file["annotation"].crop(chunk)
    if len(cropped.labels()) >= 2:
        kept = max(cropped.labels(),
                   key=lambda l: cropped.label_duration(l))
        prepared = task.prepare_chunk(file, chunk,
                                      np.random.default_rng(0))
        # target column 0 belongs to the most talkative label
        expected = task._frame_targets(file, chunk, [kept])
        np.testing.assert_array_equal(prepared["y"], expected)
