"""Training losses, fully jittable.

Parity: /root/reference/src/pyannote/audio/utils/loss.py (frame-weighted
binary_cross_entropy :59, mse_loss :97, nll_loss :137, weight interpolate
:32) plus the permutation-invariant powerset loss of the diarization task
(tasks/segmentation/speaker_diarization.py:402-485).

TPU-native PIT: the reference converts powerset->multilabel, runs a host
Hungarian per sample, then lifts the permutation back to powerset space.
Here the K! multilabel permutations are pre-lifted to powerset index tables
(ops/powerset.py) and the loss is the min over K! gathered NLLs — exact,
branch-free, no host sync, and it directly minimizes the training loss over
permutations instead of a surrogate MSE matching.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .powerset import Powerset


def interpolate_weight(weight: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Nearest-interpolate (batch, frames', 1) weights to num_frames."""
    src = weight.shape[1]
    if src == num_frames:
        return weight
    idx = (jnp.arange(num_frames) * src) // num_frames
    return weight[:, idx]


def interpolate(target: jnp.ndarray,
                weight: Optional[jnp.ndarray] = None
                ) -> Optional[jnp.ndarray]:
    """Reference-signature weight interpolation.

    Parity: interpolate (reference utils/loss.py:32-56): resample a
    (batch, frames', 1) frame weight to ``target``'s frame axis; None
    passes through. Thin wrapper over :func:`interpolate_weight`, which
    the losses below call directly.
    """
    if weight is None:
        return None
    return interpolate_weight(weight, target.shape[1])


def binary_cross_entropy(prediction: jnp.ndarray, target: jnp.ndarray,
                         weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frame-weighted BCE on probabilities (batch, frames, classes)."""
    eps = 1e-7
    p = jnp.clip(prediction, eps, 1.0 - eps)
    loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    if weight is None:
        return jnp.mean(loss)
    w = interpolate_weight(weight, prediction.shape[1])
    return jnp.sum(loss * w) / (jnp.sum(w) * loss.shape[-1] + 1e-8)


def mse_loss(prediction: jnp.ndarray, target: jnp.ndarray,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    loss = jnp.square(prediction - target)
    if weight is None:
        return jnp.mean(loss)
    w = interpolate_weight(weight, prediction.shape[1])
    return jnp.sum(loss * w) / (jnp.sum(w) * loss.shape[-1] + 1e-8)


def nll_loss(prediction: jnp.ndarray, target: jnp.ndarray,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Negative log-likelihood.

    prediction: (batch, frames, classes) log-probabilities
    target: (batch, frames) integer class indices
    """
    picked = jnp.take_along_axis(prediction, target[..., None],
                                 axis=-1)[..., 0]
    loss = -picked
    if weight is None:
        return jnp.mean(loss)
    w = interpolate_weight(weight, prediction.shape[1])[..., 0]
    return jnp.sum(loss * w) / (jnp.sum(w) + 1e-8)


def powerset_pit_loss(
    log_probs: jnp.ndarray,        # (batch, frames, K_powerset) log-softmax
    multilabel_target: jnp.ndarray,  # (batch, frames, K) binary
    powerset: Powerset,
    weight: Optional[jnp.ndarray] = None,
    class_weight: Optional[jnp.ndarray] = None,  # (K_powerset,)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant powerset NLL.

    ``class_weight`` reweights each frame by the weight of its (permuted)
    target powerset class — weighted mean as in torch nll_loss — used by
    the diarization task's weigh_by_cardinality option.

    Returns (loss, best_perm_index (batch,)).
    """
    perm_tables = powerset.all_permutation_mappings()   # (P, Kp)
    target_idx = jnp.argmax(powerset.to_powerset(multilabel_target),
                            axis=-1)                     # (B, F)

    # per-permutation target index: applying perm p to the multilabel
    # classes maps powerset state s to perm_tables[p, s]
    permuted_targets = perm_tables[:, target_idx]        # (P, B, F)
    picked = jnp.take_along_axis(
        log_probs[None], permuted_targets[..., None], axis=-1)[..., 0]
    # (P, B, F) log-prob of each permuted target
    w = None                                             # (P, B, F) or None
    if class_weight is not None:
        w = class_weight[permuted_targets].astype(log_probs.dtype)
    if weight is not None:
        fw = interpolate_weight(weight, log_probs.shape[1])[..., 0]
        w = fw[None] if w is None else w * fw[None]
    if w is not None:
        per_perm = -jnp.sum(picked * w, axis=-1) / \
            (jnp.sum(w, axis=-1) + 1e-8)
    else:
        per_perm = -jnp.mean(picked, axis=-1)            # (P, B)
    best = jnp.argmin(per_perm, axis=0)                  # (B,)
    loss = jnp.mean(jnp.min(per_perm, axis=0))
    return loss, best
