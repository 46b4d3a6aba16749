"""Training callbacks: gradual unfreezing.

Parity: /root/reference/src/pyannote/audio/core/callback.py
(GraduallyUnfreeze :31, schedule resolution :82-107). Functional stacks
freeze via optimizer masks: the callback rebuilds the optax mask at epoch
boundaries and asks the Trainer to re-init the masked optimizer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

Schedule = Union[List[Union[str, List[str]]], Dict[str, int]]


class GraduallyUnfreeze:
    """Unfreeze parameter groups on an epoch schedule.

    schedule: either a list (one group unfrozen per ``epochs_per_stage``),
    e.g. ``["classifier", ["linear_0", "linear_1"], "lstm", "sincnet"]``,
    or a dict {prefix: epoch_at_which_to_unfreeze}.
    """

    def __init__(self, schedule: Optional[Schedule] = None,
                 epochs_per_stage: int = 1):
        self.schedule = schedule
        self.epochs_per_stage = epochs_per_stage
        self._plan: Dict[str, int] = {}

    def _resolve(self, model) -> Dict[str, int]:
        schedule = self.schedule
        if schedule is None:
            # default: everything but the classifier head starts frozen and
            # unfreezes depth-first over epochs
            top_level = [k for k in model.params.get("params", {})
                         if k != "classifier"]
            schedule = list(reversed(top_level))
        if isinstance(schedule, dict):
            return dict(schedule)
        plan: Dict[str, int] = {}
        for stage, group in enumerate(schedule):
            prefixes = [group] if isinstance(group, str) else list(group)
            for prefix in prefixes:
                plan[prefix] = (stage + 1) * self.epochs_per_stage
        return plan

    def on_fit_start(self, trainer, model):
        self._plan = self._resolve(model)
        self._apply(trainer, model, epoch=0)

    def on_train_epoch_start(self, trainer, model, epoch: int):
        self._apply(trainer, model, epoch)

    def frozen_prefixes(self, epoch: int) -> List[str]:
        return [prefix for prefix, at in self._plan.items()
                if epoch < at]

    def _apply(self, trainer, model, epoch: int):
        frozen = self.frozen_prefixes(epoch)
        trainer.frozen_prefixes = frozen
