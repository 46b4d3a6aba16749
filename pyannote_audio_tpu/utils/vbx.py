"""VBx: variational Bayes x-vector clustering (GMM variant, no HMM).

Own implementation of the published VBx algorithm (Landini, Profant, Diez,
Burget: "Bayesian HMM clustering of x-vector sequences (VBx) in speaker
diarization", Computer Speech & Language 2022) as used by the reference's
VBxClustering (/root/reference/src/pyannote/audio/utils/vbx.py — behavioral
parity, fresh implementation).

Model: latent speaker vectors with zero mean, diagonal across-class
covariance ``phi`` and identity within-class covariance. The EM loop
alternates speaker-model posteriors (precision ``inv_l``, mean ``mu``) with
frame responsibilities ``gamma``, scaled by Fa (statistics scale) and Fb
(speaker-count regularizer); redundant speakers' priors decay to ~0.

Host numpy by design: inputs are (num_embeddings <= few k, ~128) — tiny next
to the NN stages; determinism beats device offload here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.special import logsumexp, softmax


def vbx_em(
    x: np.ndarray,                 # (T, D) latent-space features
    phi: np.ndarray,               # (D,) across-class covariance diagonal
    fa: float = 1.0,
    fb: float = 1.0,
    gamma: Optional[np.ndarray] = None,   # (T, S) initial responsibilities
    max_speakers: Optional[int] = None,
    max_iters: int = 10,
    epsilon: float = 1e-4,
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Run the VBx EM loop.

    Returns (gamma (T, S), pi (S,), elbo_trace).
    """
    t_frames, dim = x.shape
    if gamma is None:
        if max_speakers is None:
            raise ValueError("provide gamma or max_speakers")
        rng = np.random.default_rng(0)
        gamma = rng.gamma(1.0, size=(t_frames, max_speakers))
        gamma = gamma / gamma.sum(axis=1, keepdims=True)
    num_speakers = gamma.shape[1]
    pi = np.full(num_speakers, 1.0 / num_speakers)

    # constant per-frame term of the log-likelihood
    const = -0.5 * (np.sum(x ** 2, axis=1, keepdims=True)
                    + dim * np.log(2 * np.pi))
    rho = x * np.sqrt(phi)          # projected first-order stats

    trace = []
    prev_elbo = -np.inf
    for _ in range(max_iters):
        # speaker-model update: posterior precision and mean per speaker
        occupancy = gamma.sum(axis=0)                       # (S,)
        inv_l = 1.0 / (1.0 + (fa / fb) * occupancy[:, None] * phi)  # (S, D)
        mu = (fa / fb) * inv_l * (gamma.T @ rho)            # (S, D)

        # per-frame per-speaker log-likelihood
        log_p = fa * (rho @ mu.T
                      - 0.5 * (inv_l + mu ** 2) @ phi
                      + const)

        log_joint = log_p + np.log(pi + 1e-8)
        log_marginal = logsumexp(log_joint, axis=-1)
        gamma = np.exp(log_joint - log_marginal[:, None])
        pi = gamma.sum(axis=0)
        pi = pi / pi.sum()

        elbo = log_marginal.sum() + fb * 0.5 * np.sum(
            np.log(inv_l) - inv_l - mu ** 2 + 1.0)
        trace.append(elbo)
        if elbo - prev_elbo < epsilon and len(trace) > 1:
            break
        prev_elbo = elbo
    return gamma, pi, trace


def vbx_em_jax(x, phi, fa: float = 1.0, fb: float = 1.0, gamma=None,
               max_iters: int = 10, max_speakers: Optional[int] = None,
               seed: int = 0):
    """Jittable VBx EM: fixed-iteration lax.scan on device.

    Same updates as :func:`vbx_em` with the early-stopping test replaced
    by a fixed iteration count (compiler-friendly control flow; extra
    iterations only tighten the ELBO). Inputs are tiny, so this exists for
    end-to-end on-device pipelines rather than raw speed. Like
    :func:`vbx_em`, ``gamma=None`` requires ``max_speakers`` and draws
    the random Dirichlet-style initial responsibilities on host.
    """
    import jax
    import jax.numpy as jnp

    if gamma is None:
        if max_speakers is None:
            raise ValueError("provide gamma or max_speakers")
        rng = np.random.default_rng(seed)
        gamma = rng.gamma(1.0, size=(np.asarray(x).shape[0],
                                     max_speakers))
        gamma = gamma / gamma.sum(axis=1, keepdims=True)

    x = jnp.asarray(x, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)
    t_frames, dim = x.shape

    const = -0.5 * (jnp.sum(x ** 2, axis=1, keepdims=True)
                    + dim * jnp.log(2 * jnp.pi))
    rho = x * jnp.sqrt(phi)

    def step(carry, _):
        gamma, pi = carry
        occupancy = gamma.sum(axis=0)
        inv_l = 1.0 / (1.0 + (fa / fb) * occupancy[:, None] * phi)
        mu = (fa / fb) * inv_l * (gamma.T @ rho)
        log_p = fa * (rho @ mu.T - 0.5 * (inv_l + mu ** 2) @ phi + const)
        log_joint = log_p + jnp.log(pi + 1e-8)
        log_marginal = jax.scipy.special.logsumexp(log_joint, axis=-1)
        gamma = jnp.exp(log_joint - log_marginal[:, None])
        pi = gamma.sum(axis=0)
        pi = pi / pi.sum()
        elbo = log_marginal.sum() + fb * 0.5 * jnp.sum(
            jnp.log(inv_l) - inv_l - mu ** 2 + 1.0)
        return (gamma, pi), elbo

    num_speakers = gamma.shape[1]
    pi0 = jnp.full((num_speakers,), 1.0 / num_speakers)
    (gamma, pi), elbos = jax.lax.scan(step, (gamma, pi0), None,
                                      length=max_iters)
    return gamma, pi, elbos


def cluster_vbx(
    init_clusters: np.ndarray,     # (T,) integer AHC initialization
    features: np.ndarray,          # (T, D) PLDA latent features
    phi: np.ndarray,
    fa: float,
    fb: float,
    max_iters: int = 20,
    init_smoothing: float = 7.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """AHC-initialized VBx; returns (gamma (T, S), pi (S,))."""
    num_init = int(init_clusters.max()) + 1
    one_hot = np.zeros((len(init_clusters), num_init))
    one_hot[np.arange(len(init_clusters)), init_clusters.astype(int)] = 1.0
    gamma0 = one_hot if init_smoothing < 0 else \
        softmax(one_hot * init_smoothing, axis=1)
    from .runtime import device_flag
    if device_flag("PYANNOTE_TPU_DEVICE_VBX", accelerator_default=False):
        gamma, pi, _ = vbx_em_jax(features, phi, fa=fa, fb=fb,
                                  gamma=gamma0, max_iters=max_iters)
        return np.asarray(gamma), np.asarray(pi)
    gamma, pi, _ = vbx_em(features, phi, fa=fa, fb=fb, gamma=gamma0,
                          max_iters=max_iters)
    return gamma, pi
