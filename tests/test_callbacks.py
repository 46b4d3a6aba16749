"""GraduallyUnfreeze + augmentation-in-collate tests."""

import numpy as np
import pytest

from pyannote_audio_tpu.core.callback import GraduallyUnfreeze


class _FakeTrainer:
    pass


class _FakeModel:
    params = {"params": {"sincnet": {}, "lstm": {}, "linear_0": {},
                         "classifier": {}}}


def test_gradually_unfreeze_schedule_list():
    cb = GraduallyUnfreeze(schedule=["linear_0", "lstm", "sincnet"],
                           epochs_per_stage=2)
    trainer, model = _FakeTrainer(), _FakeModel()
    cb.on_fit_start(trainer, model)
    assert set(trainer.frozen_prefixes) == {"linear_0", "lstm", "sincnet"}
    cb.on_train_epoch_start(trainer, model, 2)
    assert set(trainer.frozen_prefixes) == {"lstm", "sincnet"}
    cb.on_train_epoch_start(trainer, model, 4)
    assert set(trainer.frozen_prefixes) == {"sincnet"}
    cb.on_train_epoch_start(trainer, model, 6)
    assert trainer.frozen_prefixes == []


def test_gradually_unfreeze_dict_schedule():
    cb = GraduallyUnfreeze(schedule={"trunk": 3})
    trainer, model = _FakeTrainer(), _FakeModel()
    cb.on_fit_start(trainer, model)
    assert trainer.frozen_prefixes == ["trunk"]
    cb.on_train_epoch_start(trainer, model, 3)
    assert trainer.frozen_prefixes == []


def test_gradually_unfreeze_default_everything_but_head():
    cb = GraduallyUnfreeze()
    trainer, model = _FakeTrainer(), _FakeModel()
    cb.on_fit_start(trainer, model)
    assert "classifier" not in trainer.frozen_prefixes
    assert set(trainer.frozen_prefixes) == {"sincnet", "lstm", "linear_0"}


def test_trainer_respects_frozen_prefixes(tmp_path):
    """Frozen subtree stays bit-identical through a training step."""
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.tasks.segmentation import VoiceActivityDetection
    from pyannote_audio_tpu.train import Trainer
    from pyannote_audio_tpu.utils.database import Protocol

    protocol = Protocol(name="d", subsets={
        "train": [default_two_speaker_file(tmp_path / "t.wav")]})
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
    model = SimpleSegmentationModel(task=task)
    cb = GraduallyUnfreeze(schedule={"frontend": 100})  # frozen throughout
    trainer = Trainer(max_epochs=1, limit_train_batches=2, callbacks=[cb])
    task.setup(model)
    model.build()
    before = np.asarray(model.params["params"]["frontend"]["kernel"]).copy()
    trainer.fit(model, task)
    after = np.asarray(model.params["params"]["frontend"]["kernel"])
    np.testing.assert_array_equal(before, after)
    # but the classifier moved
    assert not np.array_equal(
        np.zeros(1), np.asarray(
            model.params["params"]["classifier"]["bias"]))


def test_augmentation_in_collate(tmp_path):
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.augmentation.registry import (
        register_augmentation, unregister_augmentation)
    from pyannote_audio_tpu.tasks.segmentation import VoiceActivityDetection
    from pyannote_audio_tpu.utils.database import Protocol

    calls = []

    def noisy(X, y):
        calls.append(X.shape)
        return X + 0.01, y

    register_augmentation("test_noise", noisy)
    try:
        protocol = Protocol(name="d", subsets={
            "train": [default_two_speaker_file(tmp_path / "t.wav")]})
        task = VoiceActivityDetection(protocol, duration=2.0, batch_size=2)
        task.setup(None)
        next(iter(task.train_batches(epoch=0)))
        assert calls and calls[0][0] == 2
    finally:
        unregister_augmentation("test_noise")
