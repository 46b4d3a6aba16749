"""Golden numeric parity of ops/losses.py vs torch replicas of the
reference loss functions (reference utils/loss.py:32-183).

The replicas below are built from torch.nn.functional primitives with the
exact normalization the reference uses:
- interpolate: F.interpolate(mode="linear", align_corners=False)
- binary_cross_entropy: F.binary_cross_entropy(weight=w) -> mean reduction
  divides by numel
- mse_loss: sum(loss * w_expanded) / sum(w_expanded)
- nll_loss: F.nll_loss(weight=class_weight, reduction="none"), then
  mean (unweighted) or sum(loss * w) / sum(w) (frame-weighted)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.ops.losses import (binary_cross_entropy,
                                           interpolate_weight, mse_loss,
                                           nll_loss, powerset_pit_loss)
from pyannote_audio_tpu.ops.powerset import Powerset

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_interpolate(weight: torch.Tensor, num_frames: int):
    if weight.shape[1] == num_frames:
        return weight
    return F.interpolate(weight.transpose(1, 2), size=num_frames,
                         mode="linear", align_corners=False).transpose(1, 2)


def _rand_weight(rng, batch, frames):
    w = rng.uniform(0.0, 1.0, (batch, frames, 1)).astype(np.float32)
    w[:, :3] = 0.0        # warm-up-style masking
    w[:, -2:] = 0.0
    return w


@pytest.mark.parametrize("wf", [10, 17, 33])
def test_interpolate_weight_matches_torch_linear(wf):
    rng = np.random.default_rng(0)
    w = rng.uniform(size=(2, wf, 1)).astype(np.float32)
    for out_frames in (5, 10, 16, 64):
        ours = np.asarray(interpolate_weight(jnp.asarray(w), out_frames))
        ref = _torch_interpolate(torch.from_numpy(w), out_frames).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_bce_weighted_matches_torch():
    rng = np.random.default_rng(1)
    p = rng.uniform(0.01, 0.99, (3, 20, 4)).astype(np.float32)
    t = (rng.uniform(size=(3, 20, 4)) > 0.5).astype(np.float32)
    w = _rand_weight(rng, 3, 15)    # different frame resolution
    ours = float(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t),
                                      weight=jnp.asarray(w)))
    tw = _torch_interpolate(torch.from_numpy(w), 20)
    ref = F.binary_cross_entropy(
        torch.from_numpy(p), torch.from_numpy(t),
        weight=tw.expand(3, 20, 4)).item()
    assert ours == pytest.approx(ref, abs=1e-6)


def test_mse_weighted_matches_torch():
    rng = np.random.default_rng(2)
    p = rng.uniform(size=(2, 16, 3)).astype(np.float32)
    t = rng.uniform(size=(2, 16, 3)).astype(np.float32)
    w = _rand_weight(rng, 2, 16)
    ours = float(mse_loss(jnp.asarray(p), jnp.asarray(t),
                          weight=jnp.asarray(w)))
    losses = F.mse_loss(torch.from_numpy(p), torch.from_numpy(t),
                        reduction="none")
    tw = torch.from_numpy(w).expand(losses.shape)
    ref = (torch.sum(losses * tw) / torch.sum(tw)).item()
    assert ours == pytest.approx(ref, abs=1e-6)


@pytest.mark.parametrize("use_cw,use_fw", [(False, True), (True, False),
                                           (True, True)])
def test_nll_matches_torch(use_cw, use_fw):
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 12, 5)).astype(np.float32)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    target = rng.integers(0, 5, (2, 12))
    cw = rng.uniform(0.5, 2.0, 5).astype(np.float32) if use_cw else None
    fw = _rand_weight(rng, 2, 12) if use_fw else None
    ours = float(nll_loss(
        jnp.asarray(logp), jnp.asarray(target),
        class_weight=None if cw is None else jnp.asarray(cw),
        weight=None if fw is None else jnp.asarray(fw)))
    losses = F.nll_loss(
        torch.from_numpy(logp).reshape(-1, 5),
        torch.from_numpy(target).reshape(-1),
        weight=None if cw is None else torch.from_numpy(cw),
        reduction="none").reshape(2, 12)
    if fw is None:
        ref = losses.mean().item()
    else:
        tw = torch.from_numpy(fw)[..., 0]
        ref = (torch.sum(losses * tw) / torch.sum(tw)).item()
    assert ours == pytest.approx(ref, abs=1e-6)


def test_powerset_pit_loss_matches_nll_of_best_permutation():
    """The PIT loss must equal nll_loss evaluated on the loss-minimizing
    permuted targets — tying its normalization to the (torch-verified)
    nll_loss semantics above."""
    import itertools

    ps = Powerset(3, 2)
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((3, 24, ps.num_powerset_classes))
    logp = jnp.asarray(
        (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
         ).astype(np.float32))
    target = (rng.uniform(size=(3, 24, 3)) > 0.6).astype(np.float32)
    target[target.sum(-1) > ps.max_set_size] = [1.0, 1.0, 0.0]
    fw = jnp.asarray(_rand_weight(rng, 3, 24))
    cw = jnp.maximum(jnp.asarray(ps.cardinality, jnp.float32), 1.0)

    loss, best = powerset_pit_loss(logp, jnp.asarray(target), ps,
                                   weight=fw, class_weight=cw)

    # brute-force: per-sample best permutation by the weighted cost, then
    # ONE global nll_loss over the permuted targets
    perms = list(itertools.permutations(range(3)))
    tables = np.asarray(ps.all_permutation_mappings())
    tgt_idx = np.argmax(np.asarray(ps.to_powerset(jnp.asarray(target))), -1)
    fw_np = np.asarray(fw)[..., 0]
    cw_np = np.asarray(cw)
    logp_np = np.asarray(logp)
    chosen = np.zeros_like(tgt_idx)
    for b in range(3):
        costs = []
        for p in range(len(perms)):
            pt = tables[p][tgt_idx[b]]
            nll = -np.take_along_axis(logp_np[b], pt[:, None], 1)[:, 0]
            costs.append(np.sum(nll * cw_np[pt] * fw_np[b]))
        chosen[b] = tables[int(np.argmin(costs))][tgt_idx[b]]
    ref = float(nll_loss(logp, jnp.asarray(chosen),
                         class_weight=cw, weight=fw))
    assert float(loss) == pytest.approx(ref, abs=1e-6)
