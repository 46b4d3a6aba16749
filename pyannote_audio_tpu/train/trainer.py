"""Training loop: optax + pjit data parallelism over a device mesh.

Replaces the reference's pytorch-lightning ``Trainer`` + DDP strategy
(SURVEY.md §2.8): data parallelism is a batch-axis NamedSharding under jit —
XLA inserts the gradient all-reduce over ICI automatically; there is no
NCCL, no rank loop, no gradient hooks. The host-side loop only feeds numpy
batches and checkpoints.

Checkpoints use the Model directory format (config.yaml + params.msgpack)
with an extra optimizer-state file, so ``Model.from_pretrained`` can load
any training checkpoint directly (parity with the reference's vendor block,
core/model.py:244-262; ``strip`` = just don't copy the optimizer file).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.model import Model
from ..core.task import Task, TrainingBatch


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_train_step(task: Task, model: Model, optimizer,
                    mesh: Optional[Mesh] = None,
                    frozen_prefixes: Optional[Tuple[str, ...]] = None
                    ) -> Callable:
    """Build the jitted (params, opt_state, batch) -> updated step.

    With a mesh, batches are sharded over the 'data' axis and parameters
    replicated; XLA emits the psum for gradients. ``frozen_prefixes``
    zeroes updates for matching parameter paths (functional analogue of
    the reference's requires_grad freezing, core/model.py:359-495).
    """

    def _freeze(updates):
        if not frozen_prefixes:
            return updates

        def mask(path, leaf):
            parts = [str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path]
            path_str = "/".join(parts)
            # PREFIX semantics on path components: 'lstm' freezes
            # params/lstm/* but never 'pre_lstm_proj' or 'sincnet'
            # (substring matching silently froze unrelated parameters)
            if any(path_str == prefix
                   or path_str.startswith(prefix + "/")
                   or any(part == prefix for part in parts)
                   for prefix in frozen_prefixes):
                return jnp.zeros_like(leaf)
            return leaf
        return jax.tree_util.tree_map_with_path(mask, updates)

    def step_fn(params, opt_state, X, y, w, meta):
        # int16 batch transport (Trainer.fit uploads PCM16-representable
        # crops as int16 — half the relay bytes; transfers don't overlap
        # compute, so upload is a hard serial per-step cost): expand back
        # to f32 on device before the forward
        from ..core.inference import _dequantize
        X = _dequantize(X)

        def loss_fn(p):
            return task.loss(model, p,
                             TrainingBatch(X=X, y=y, weight=w, meta=meta))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, _freeze(updates))
        # NaN-loss batch skip (parity: reference
        # tasks/segmentation/speaker_diarization.py:425-433,
        # embedding/mixins.py:231-233): a non-finite loss leaves params
        # and optimizer state untouched, branch-free under jit
        good = jnp.isfinite(loss)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, old)
        return keep(new_params, params), keep(new_opt_state, opt_state), \
            loss

    # donate params/opt_state: they are returned (updated) every step, so
    # XLA can alias the buffers instead of allocating + copying ~3x the
    # model size per step; fit() rebinds both on every call
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1))

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded,
                      batch_sharded, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1),
    )


class Trainer:
    """Minimal epoch-driven training loop."""

    def __init__(
        self,
        max_epochs: int = 1,
        limit_train_batches: Optional[int] = None,
        learning_rate: float = 1e-3,
        optimizer: Optional[Any] = None,
        mesh: Optional[Mesh] = None,
        checkpoint_dir: Optional[Union[str, Path]] = None,
        gradient_clip_val: Optional[float] = None,
        callbacks: Optional[List] = None,
        seed: int = 42,
        log_dir: Optional[Union[str, Path]] = None,
        monitor: Optional[Tuple[str, str]] = None,
        early_stopping_patience: Optional[int] = None,
        limit_val_chunks: Optional[int] = None,
    ):
        #: OPT-IN cap on validation chunks (strided subsample). Default
        #: None = the FULL fixed validation grid every epoch, matching
        #: the reference (mixins.py:254-289) so early stopping and best-
        #: checkpoint selection ride on the whole dev set.
        self.limit_val_chunks = limit_val_chunks
        #: (metric name, "min"|"max") tracked for best-checkpointing and
        #: early stopping; None = the task's ``val_monitor`` (parity role:
        #: lightning ModelCheckpoint(monitor=...) + EarlyStopping as used
        #: by the reference training recipes)
        self.monitor = monitor
        self.early_stopping_patience = early_stopping_patience
        self.max_epochs = max_epochs
        self.limit_train_batches = limit_train_batches
        self.mesh = mesh
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir \
            else None
        #: metrics.jsonl + samples_epoch{N}.png land here (parity role:
        #: the reference's TensorBoard/MLflow loggers, mixins.py:302-437)
        self.log_dir = Path(log_dir) if log_dir else None
        self.callbacks = callbacks or []
        tx = optimizer or optax.adam(learning_rate)
        if gradient_clip_val:
            tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val),
                             tx)
        self.optimizer = tx
        self.seed = seed
        self.history: List[Dict] = []
        self.best_epoch: Optional[int] = None

    def fit(self, model: Model, task: Optional[Task] = None,
            resume_from: Optional[Union[str, Path]] = None) -> Model:
        """Train ``model`` on ``task``.

        ``resume_from`` points at an epoch checkpoint directory written by
        a previous fit (``checkpoint_dir/epoch_N``): the FULL training
        state — parameters (including task-owned state such as ArcFace
        prototypes), optimizer state, epoch counter and the
        best-score/early-stopping bookkeeping — is restored from its
        ``train_state.msgpack``, so the trajectory continues exactly
        where it stopped (``strip``/``Model.from_pretrained`` keep
        ignoring that extra file).
        """
        task = task or model.task
        if task is None:
            raise ValueError("no task to fit on")
        task.setup(model)
        model.task = task
        if model.module is None or model.params is None:
            model.build(rng=jax.random.PRNGKey(self.seed))
        else:
            # task may have changed the head dimension: rebuild module and
            # reconcile parameters (parity: core/model.py:200-227)
            old_params = model.params
            model.params = None
            model.build(rng=jax.random.PRNGKey(self.seed))
            model.params = _reconcile(old_params, model.params)

        model_keys = set(model.params.keys())
        params = task.augment_params(
            model.params, jax.random.PRNGKey(self.seed + 1), model)
        # donation guard: the first train step donates `params`
        # (donate_argnums=(0,1) in make_train_step); augment_params may
        # return model.params' own arrays, and donating those would leave
        # model.params pointing at deleted buffers for the rest of fit
        # (callbacks reading model.params, or any mid-fit exception, would
        # hit 'Array has been deleted'). Copy every leaf so donated
        # buffers are never aliased by model.params.
        params = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        opt_state = self.optimizer.init(params)
        start_epoch = 0
        best_state = None
        if resume_from is not None:
            from flax import serialization
            blob = (Path(resume_from) / "train_state.msgpack").read_bytes()
            target = {"params": params, "opt_state": opt_state,
                      "epoch": 0, "best_score": 0.0,
                      "epochs_since_best": 0, "best_epoch": 0}
            restored = serialization.from_bytes(target, blob)
            params = restored["params"]
            opt_state = restored["opt_state"]
            start_epoch = int(restored["epoch"]) + 1
            best_state = restored
        # seed from the model's stateful freeze_by_name/up_to API
        # (core/model.py; reference model.py:359-495); callbacks such as
        # GraduallyUnfreeze may overwrite per epoch
        self.frozen_prefixes: Tuple[str, ...] = tuple(
            getattr(model, "frozen_modules", ()) or ())
        _step_cache: Dict[Tuple[str, ...], Callable] = {}

        def get_step_fn():
            key = tuple(self.frozen_prefixes)
            if key not in _step_cache:
                _step_cache[key] = make_train_step(
                    task, model, self.optimizer, mesh=self.mesh,
                    frozen_prefixes=key)
            return _step_cache[key]

        opt = opt_state
        for cb in self.callbacks:
            if hasattr(cb, "on_fit_start"):
                cb.on_fit_start(self, model)
        monitor_name, monitor_mode = self.monitor or task.val_monitor
        sign = 1.0 if monitor_mode == "min" else -1.0
        best_score = math.inf
        epochs_since_best = 0
        if best_state is not None:
            best_score = float(best_state["best_score"])
            epochs_since_best = int(best_state["epochs_since_best"])
            self.best_epoch = int(best_state["best_epoch"])
        # the monitor-fallback decision is per-FIT: a reused Trainer must
        # re-decide against the new task's metrics, not inherit a stale
        # train-loss fallback from a previous validation-less run
        if hasattr(self, "_monitor_key"):
            del self._monitor_key
        for epoch in range(start_epoch, self.max_epochs):
            for cb in self.callbacks:
                if hasattr(cb, "on_train_epoch_start"):
                    cb.on_train_epoch_start(self, model, epoch)
            step_fn = get_step_fn()
            # device losses accumulate WITHOUT per-step host syncs: a
            # float(loss) each step would stall dispatch until the step
            # finishes, serializing host batch prep with device compute.
            # One stacked transfer at epoch end closes the async chain.
            device_losses = []
            batches = task.train_batches_parallel(epoch=epoch) \
                if hasattr(task, "train_batches_parallel") \
                else task.train_batches(epoch=epoch)
            for i, batch in enumerate(batches):
                if self.limit_train_batches is not None and \
                        i >= self.limit_train_batches:
                    break
                y = batch.y if batch.y is not None else np.zeros(
                    (len(batch.X), 1), np.float32)
                w = None if batch.weight is None \
                    else jnp.asarray(batch.weight)
                # task-specific extras (e.g. PixIT's drawn mixture pairs)
                # must reach the loss inside the jitted step
                meta = None if batch.meta is None else {
                    k: jnp.asarray(v) for k, v in batch.meta.items()}
                from ..core.inference import _upload_waveform
                params, opt, loss = step_fn(params, opt,
                                            _upload_waveform(
                                                batch.X, quant="int16"),
                                            jnp.asarray(y), w, meta)
                device_losses.append(loss)
            loss_values = np.asarray(jnp.stack(device_losses)) \
                if device_losses else np.zeros(0)
            losses = loss_values[np.isfinite(loss_values)]
            if len(losses) < len(loss_values):
                # params/opt were left untouched by the jitted step
                import warnings
                bad = np.nonzero(~np.isfinite(loss_values))[0]
                warnings.warn(
                    f"skipped {len(bad)} batch(es) of epoch {epoch} "
                    f"with non-finite loss (indices {bad.tolist()})")
            record = {"epoch": epoch,
                      "loss": float(np.mean(losses)) if len(losses)
                      else np.nan}
            record.update(self.validate(
                model, task, params, max_chunks=self.limit_val_chunks,
                epoch=epoch))
            self.history.append(record)
            if self.log_dir is not None:
                import json
                self.log_dir.mkdir(parents=True, exist_ok=True)
                with open(self.log_dir / "metrics.jsonl", "a") as f:
                    f.write(json.dumps(
                        {k: (None if isinstance(v, float)
                             and math.isnan(v) else v)
                         for k, v in record.items()}) + "\n")
            if self.checkpoint_dir is not None:
                # host copies, NOT the live `params` leaves: the next
                # epoch's first step donates those buffers, and aliasing
                # them here would leave model.params holding deleted
                # arrays after any mid-epoch interrupt (the exact hazard
                # the fit-start copy guard documents)
                model.params = jax.tree_util.tree_map(
                    np.asarray, {k: v for k, v in params.items()
                                 if k in model_keys})
                ckpt = self.checkpoint_dir / f"epoch_{epoch}"
                model.save_checkpoint(ckpt)
            # best-checkpoint + early stopping on the monitored metric.
            # When the metric is absent (no validation subset), fall back
            # to train loss — with MIN direction, regardless of the
            # metric's direction, and never mix the two scales across
            # epochs (the fallback decision is made once).
            if not hasattr(self, "_monitor_key"):
                self._monitor_key = monitor_name \
                    if monitor_name in record else "loss"
            use_fallback = self._monitor_key == "loss" \
                and monitor_name != "loss"
            score = record.get(self._monitor_key)
            effective_sign = 1.0 if use_fallback else sign
            if score is not None and not (
                    isinstance(score, float) and math.isnan(score)):
                if effective_sign * float(score) < best_score:
                    best_score = effective_sign * float(score)
                    epochs_since_best = 0
                    self.best_epoch = epoch
                    if self.checkpoint_dir is not None:
                        model.params = jax.tree_util.tree_map(
                            np.asarray,
                            {k: v for k, v in params.items()
                             if k in model_keys})
                        model.save_checkpoint(self.checkpoint_dir
                                              / "best")
                else:
                    epochs_since_best += 1
            else:
                # a NaN/missing monitored score is NOT an improvement:
                # diverged training must still trip early stopping
                # (lightning's EarlyStopping check_finite parity)
                epochs_since_best += 1
            if self.checkpoint_dir is not None:
                # full training state alongside the model checkpoint
                # (written AFTER the monitor update so resume continues
                # the exact trajectory): params incl. task-owned state
                # (ArcFace prototypes), optimizer moments, and the
                # early-stopping bookkeeping — everything
                # fit(resume_from=ckpt) needs
                import os
                import uuid

                from flax import serialization
                state_path = ckpt / "train_state.msgpack"
                # atomic publish: a kill mid-write must not leave a
                # truncated msgpack that makes resume_from crash deep
                # inside flax instead of rebuilding
                tmp = state_path.with_name(
                    f".{state_path.name}."
                    f"{os.getpid()}-{uuid.uuid4().hex[:8]}")
                try:
                    tmp.write_bytes(serialization.to_bytes(
                        {"params": params, "opt_state": opt,
                         "epoch": epoch, "best_score": best_score,
                         "epochs_since_best": epochs_since_best,
                         "best_epoch": getattr(self, "best_epoch", 0)}))
                    os.replace(tmp, state_path)
                finally:
                    tmp.unlink(missing_ok=True)
            if self.early_stopping_patience is not None and \
                    epochs_since_best >= self.early_stopping_patience:
                break
        model.params = {k: v for k, v in params.items() if k in model_keys}
        model._jitted_apply = None
        return model


    def validate(self, model: Model, task: Task, params,
                 max_chunks: Optional[int] = None, epoch: int = 0,
                 eval_batch_size: int = 32) -> Dict:
        """Validation pass over the FULL fixed grid, batched + jitted.

        Parity role: the reference's validation_step family
        (tasks/segmentation/speaker_diarization.py:487-571 DER metric
        family incl. components and optimal threshold, mixins.py:302-437
        AUROC) over the whole validation grid (mixins.py:254-289 — the
        reference never subsamples). ``max_chunks`` is an explicit
        OPT-IN cap (strided subsample) for expensive dev sets.

        The DER family streams through one jitted eval step per batch
        (train/evaluate.py): `der/val` + components on the hard powerset
        decode at 0.5 (reference parity) and `der/val/optimal` sweeping
        51 thresholds over the SOFT per-class marginals in the same
        dispatch. Under ``self.mesh`` the step runs sharded over the
        data axis with an in-step psum — multi-device values match
        single-device exactly.
        """
        chunks = getattr(task, "prepare_validation", lambda: [])()
        if not chunks:
            return {}
        from ..metrics.streaming import (DetectionErrorRate,
                                         DiarizationErrorRate,
                                         DiarizationPrecision,
                                         DiarizationRecall,
                                         FalseAlarmRate,
                                         MissedDetectionRate,
                                         OptimalDiarizationErrorRate,
                                         SpeakerConfusionRate,
                                         unpack_der_components)
        from ..ops.powerset import Powerset
        from .evaluate import (DEFAULT_THRESHOLDS, make_eval_step,
                               pad_eval_batch)

        powerset: Optional[Powerset] = getattr(task, "_powerset", None)
        model_params = {k: v for k, v in params.items()
                        if k in model.params.keys()} \
            if isinstance(params, dict) else params
        if max_chunks:
            # stride for corpus coverage, then hard-cap (floor-division
            # stride alone admits up to ~2x max_chunks)
            step = max(1, len(chunks) // max_chunks)
            selected = chunks[::step][:max_chunks]
        else:
            selected = chunks

        # jitted callables are keyed on (model identity, module, powerset,
        # mesh): a rebuilt model (new head), a DIFFERENT model of equal
        # config (flax modules compare by value — reusing the old closure
        # would pin the previous model's params alive), a task swap, or a
        # mesh change must not reuse a stale executable
        val_key = (id(model), model.module, powerset, self.mesh)
        if getattr(self, "_val_apply_key", None) != val_key:
            self._val_apply = jax.jit(model.apply_fn)
            self._val_eval_step = make_eval_step(
                model.apply_fn, powerset=powerset, mesh=self.mesh)
            self._val_loss_fns = {}
            self._val_apply_key = val_key

        # jitted validation loss: an eager task.loss would re-dispatch the
        # full model forward op-by-op per batch (orders of magnitude
        # slower than the compiled step). Falls back to eager only if a
        # task's loss is genuinely untraceable.
        loss_fn = self._val_loss_fns.get(id(task))
        if loss_fn is None:
            jitted = jax.jit(lambda p, X, y: task.loss(
                model, p, TrainingBatch(X=X, y=y, weight=None)))
            state = {"fn": jitted, "fallback": False}

            def loss_fn(p, X, y):
                if not state["fallback"]:
                    try:
                        return state["fn"](p, jnp.asarray(X),
                                           jnp.asarray(y))
                    except Exception:
                        state["fallback"] = True
                return task.loss(model, p,
                                 TrainingBatch(X=X, y=y, weight=None))
            self._val_loss_fns[id(task)] = loss_fn

        if self.mesh is not None:
            n_dev = int(np.prod([s for s in self.mesh.devices.shape]))
            eval_batch_size = max(eval_batch_size // n_dev, 1) * n_dev

        # the reference's full default_metric family at threshold 0.5
        # (tasks/segmentation/speaker_diarization.py:487-501)
        metrics = {
            "der/val": DiarizationErrorRate(),
            "der/val/false_alarm": FalseAlarmRate(),
            "der/val/missed_detection": MissedDetectionRate(),
            "der/val/confusion": SpeakerConfusionRate(),
            "der/val/precision": DiarizationPrecision(),
            "der/val/recall": DiarizationRecall(),
            "der/val/detection": DetectionErrorRate(),
        }
        optimal = OptimalDiarizationErrorRate()
        from ..metrics.auroc import BinnedAUROC
        auroc = BinnedAUROC()
        loss_sum, loss_n = 0.0, 0
        have_der = have_auroc = False
        plot_pred = plot_y = None
        # the sample-figure forward is EXTRA device work (the eval step
        # only returns packed metric components) — run it only on epochs
        # that will actually write a figure
        want_plot = self.log_dir is not None \
            and _is_power_of_two_or_zero(epoch)

        def flush(batch_X, batch_y):
            nonlocal loss_sum, loss_n, have_der, have_auroc
            nonlocal plot_pred, plot_y
            if batch_y[0] is None:
                return           # nothing to score without targets
            X = np.stack(batch_X)
            y = np.stack(batch_y).astype(np.float32)
            # non-powerset permutation-invariant tasks (PixIT) opt into
            # the same DER eval step over their raw sigmoid multilabels
            # (reference default_metric: Optimal* family,
            # tasks/separation/PixIT.py:1030-1042)
            if powerset is not None or getattr(task, "val_optimal_der",
                                               False):
                Xp, yp, valid = pad_eval_batch(X, y, eval_batch_size)
                hard4, softp = self._val_eval_step(
                    model_params, jnp.asarray(Xp), jnp.asarray(yp),
                    jnp.asarray(valid))
                hard4 = np.asarray(hard4)
                for m in metrics.values():
                    m.update_from_components(*hard4)
                optimal.update_from_components(*unpack_der_components(
                    np.asarray(softp), len(DEFAULT_THRESHOLDS)))
                have_der = True
                if want_plot and plot_pred is None:
                    preds = self._val_apply(model_params, jnp.asarray(X))
                    if isinstance(preds, (tuple, list)):
                        preds = preds[0]
                    plot_pred = np.asarray(
                        powerset.to_multilabel(preds)
                        if powerset is not None else preds)
                    plot_y = y
            else:
                preds = np.asarray(
                    self._val_apply(model_params, jnp.asarray(X)))
                if preds.ndim == 3:
                    # VAD / multilabel: frame-level AUROC
                    # (parity: mixins.py:302-437)
                    n = min(preds.shape[1], y.shape[1])
                    auroc.update(preds[:, :n], y[:, :n])
                    have_auroc = True
                    if plot_pred is None:
                        plot_pred, plot_y = preds, y
            loss_sum += float(loss_fn(
                params, X, np.stack(batch_y))) * len(batch_X)
            loss_n += len(batch_X)

        batch_X, batch_y = [], []
        for file, chunk in selected:
            try:
                prepared = task.prepare_chunk(
                    file, chunk, np.random.default_rng(0))
            except NotImplementedError:
                return {}
            if prepared is None:
                continue
            batch_X.append(prepared["X"])
            batch_y.append(prepared.get("y"))
            if len(batch_X) == eval_batch_size:
                flush(batch_X, batch_y)
                batch_X, batch_y = [], []
        if batch_X:
            flush(batch_X, batch_y)

        out: Dict = {}
        if have_der:
            for name, metric in metrics.items():
                out[name] = metric.compute()
            out["der/val/optimal"] = optimal.compute()
            out["der/val/optimal_threshold"] = optimal.optimal_threshold
        if have_auroc:
            out["auroc/val"] = auroc.compute()
        if loss_n:
            out["loss/val"] = loss_sum / loss_n
        if self.log_dir is not None and plot_pred is not None and \
                plot_y is not None and _is_power_of_two_or_zero(epoch):
            self._log_validation_figure(
                epoch, plot_pred, plot_y,
                warm_up=getattr(task, "warm_up", (0.0, 0.0)),
                duration=task.duration)
        return out

    def _log_validation_figure(self, epoch: int, y_pred: np.ndarray,
                               y: np.ndarray, warm_up=(0.0, 0.0),
                               duration: float = 1.0) -> None:
        """3x3 target/prediction grid PNG for the first validation batch.

        Parity: the reference logs the same figure to TensorBoard/MLflow
        every 2^n epochs (tasks/segmentation/mixins.py:374-437) — here it
        lands in ``log_dir/samples_epoch{N}.png``.
        """
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        num_frames = y_pred.shape[1]
        warm_up_left = round(warm_up[0] / duration * num_frames)
        warm_up_right = round(warm_up[1] / duration * num_frames)
        num_samples = min(len(y_pred), 9)
        nrows = math.ceil(math.sqrt(num_samples))
        ncols = math.ceil(num_samples / nrows)
        fig, axes = plt.subplots(nrows=2 * nrows, ncols=ncols,
                                 figsize=(8, 5), squeeze=False)
        y = y.astype(np.float32).copy()
        y[y == 0] = np.nan
        if y.ndim == 2:
            y = y[:, :, None]
        y = y * np.arange(y.shape[2])
        for sample_idx in range(num_samples):
            row_idx, col_idx = sample_idx // nrows, sample_idx % ncols
            ax_ref = axes[row_idx * 2 + 0, col_idx]
            ax_ref.plot(y[sample_idx])
            ax_ref.set_xlim(0, y.shape[1])
            ax_ref.set_ylim(-1, y.shape[2])
            ax_ref.get_xaxis().set_visible(False)
            ax_ref.get_yaxis().set_visible(False)
            ax_hyp = axes[row_idx * 2 + 1, col_idx]
            if warm_up_left:
                ax_hyp.axvspan(0, warm_up_left, color="k", alpha=0.5,
                               lw=0)
            if warm_up_right:
                ax_hyp.axvspan(num_frames - warm_up_right, num_frames,
                               color="k", alpha=0.5, lw=0)
            ax_hyp.plot(y_pred[sample_idx])
            ax_hyp.set_ylim(-0.1, 1.1)
            ax_hyp.set_xlim(0, y.shape[1])
            ax_hyp.get_xaxis().set_visible(False)
        plt.tight_layout()
        self.log_dir.mkdir(parents=True, exist_ok=True)
        fig.savefig(self.log_dir / f"samples_epoch{epoch}.png", dpi=72)
        plt.close(fig)


def _is_power_of_two_or_zero(epoch: int) -> bool:
    """Figure-logging cadence parity (mixins.py:374-377): epochs 0, 1, 2,
    4, 8, ... get a sample figure."""
    return epoch == 0 or (epoch & (epoch - 1)) == 0


def _reconcile(old_params, new_params):
    """Copy matching-shape leaves from old into new (head swaps keep the
    trunk; parity with state-dict reconciliation, core/model.py:205-222)."""
    flat_old, _ = jax.tree_util.tree_flatten_with_path(old_params)
    old_by_path = {jax.tree_util.keystr(path): leaf
                   for path, leaf in flat_old}

    def pick(path, new_leaf):
        old_leaf = old_by_path.get(jax.tree_util.keystr(path))
        if old_leaf is not None and \
                getattr(old_leaf, "shape", None) == new_leaf.shape:
            return old_leaf
        return new_leaf

    return jax.tree_util.tree_map_with_path(pick, new_params)
