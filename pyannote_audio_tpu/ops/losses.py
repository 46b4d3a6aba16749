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
    """Linearly interpolate (batch, frames', 1) weights to num_frames.

    Matches torch ``F.interpolate(mode="linear", align_corners=False)``
    exactly (reference utils/loss.py:49-55): output position ``i`` samples
    source coordinate ``(i + 0.5) * src / dst - 0.5`` with edge clamping.
    """
    src = weight.shape[1]
    if src == num_frames:
        return weight
    x = (jnp.arange(num_frames, dtype=jnp.float32) + 0.5) \
        * (src / num_frames) - 0.5
    x = jnp.clip(x, 0.0, src - 1.0)
    lo = jnp.floor(x).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src - 1)
    frac = (x - lo.astype(jnp.float32)).astype(weight.dtype)
    shape = (1, num_frames) + (1,) * (weight.ndim - 2)
    frac = frac.reshape(shape)
    wl = weight[:, lo]
    wh = weight[:, hi]
    return wl + (wh - wl) * frac


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
    """Frame-weighted BCE on probabilities (batch, frames, classes).

    Normalization parity (reference utils/loss.py:59-94): torch
    ``F.binary_cross_entropy(weight=w)`` with mean reduction divides the
    weighted sum by ``numel`` — i.e. ``mean(w * bce)`` — NOT by ``sum(w)``
    (which is what mse_loss/nll_loss do; the asymmetry is the reference's).
    """
    if target.ndim == 2:
        target = target[..., None]
    eps = 1e-7
    p = jnp.clip(prediction, eps, 1.0 - eps)
    loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    if weight is None:
        return jnp.mean(loss)
    w = interpolate_weight(weight, prediction.shape[1])
    return jnp.mean(loss * w)


def mse_loss(prediction: jnp.ndarray, target: jnp.ndarray,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Frame-weighted MSE: ``sum(loss * w) / sum(w_expanded)``
    (reference utils/loss.py:97-134; the weight is expanded over the class
    axis, so the denominator is ``sum(w) * num_classes``)."""
    if target.ndim == 2:
        target = target[..., None]
    loss = jnp.square(prediction - target)
    if weight is None:
        return jnp.mean(loss)
    w = interpolate_weight(weight, prediction.shape[1])
    return jnp.sum(loss * w) / (jnp.sum(w) * loss.shape[-1] + 1e-8)


def nll_loss(prediction: jnp.ndarray, target: jnp.ndarray,
             class_weight: Optional[jnp.ndarray] = None,
             weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Negative log-likelihood (reference utils/loss.py:137-183).

    prediction: (batch, frames, classes) log-probabilities
    target: (batch, frames) integer class indices
    class_weight: (classes,) per-class scale, applied multiplicatively
        (torch ``F.nll_loss(weight=cw, reduction="none")`` semantics)
    weight: (batch, frames, 1) frame weight

    Normalization parity: unweighted -> mean over (batch, frames) of the
    class-weighted losses; frame-weighted -> ``sum(loss * w) / sum(w)``
    (the class weight never enters the denominator).
    """
    picked = jnp.take_along_axis(prediction, target[..., None],
                                 axis=-1)[..., 0]
    loss = -picked
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight)[target]
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
    target powerset class — torch nll_loss(weight=cw) semantics, used by
    the diarization task's weigh_by_cardinality option.

    Normalization matches :func:`nll_loss` applied to the best-permutation
    targets (the reference computes exactly that after its host Hungarian,
    speaker_diarization.py:447-458): frame-weighted -> global
    ``sum(cw * nll * fw) / sum(fw)``; unweighted -> global mean of
    ``cw * nll``. The class weight never enters the denominator. The best
    permutation is chosen per sample (the per-sample denominator is
    permutation-independent, so argmin over weighted sums is exact).

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
    nll = -picked
    if class_weight is not None:
        nll = nll * jnp.asarray(class_weight)[permuted_targets].astype(
            log_probs.dtype)
    if weight is not None:
        fw = interpolate_weight(weight, log_probs.shape[1])[..., 0]
        per_perm = jnp.sum(nll * fw[None], axis=-1)      # (P, B)
        denom = jnp.sum(fw) + 1e-8
    else:
        per_perm = jnp.sum(nll, axis=-1)                 # (P, B)
        denom = float(nll.shape[1] * nll.shape[2])       # B * F
    best = jnp.argmin(per_perm, axis=0)                  # (B,)
    loss = jnp.sum(jnp.min(per_perm, axis=0)) / denom
    return loss, best
