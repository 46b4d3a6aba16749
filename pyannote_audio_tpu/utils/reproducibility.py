"""Numerical-reproducibility guards.

Parity: /root/reference/src/pyannote/audio/utils/reproducibility.py: the
reference guards against TF32 matmuls silently changing results
(fix_reproducibility is called at every Inference/Pipeline entry). The JAX
analogue is the default-matmul-precision knob: TPUs default to bfloat16
MXU passes; ``fix_reproducibility`` pins the default to 'highest' (f32)
and warns once, mirroring the reference's behavior of forcing
deterministic math at inference entry. Recurrences (LSTM) and statistics
pooling already pin f32 locally regardless of this global.
"""

from __future__ import annotations

import warnings

import jax

_WARNED = [False]


class ReproducibilityError(Exception):
    pass


class ReproducibilityWarning(UserWarning):
    pass


def fix_reproducibility(precision=None) -> None:
    """Pin the global default matmul precision.

    Called at every pipeline entry (parity with the reference's TF32
    guard). By default this is a no-op unless
    ``PYANNOTE_TPU_STRICT_REPRO=1`` (or an explicit precision is given):
    the numerically-sensitive paths (LSTM recurrence, statistics pooling)
    already pin f32 locally, and pinning everything would forfeit the
    bf16 trunk throughput.
    """
    import os
    if precision is None:
        if os.environ.get("PYANNOTE_TPU_STRICT_REPRO", "0") != "1":
            return
        precision = "highest"
    current = jax.config.jax_default_matmul_precision
    if current != precision:
        if not _WARNED[0]:
            warnings.warn(
                f"Setting jax_default_matmul_precision={precision!r} for "
                "reproducible inference (was "
                f"{current!r}). Set it yourself to silence this warning.",
                ReproducibilityWarning)
            _WARNED[0] = True
        jax.config.update("jax_default_matmul_precision", precision)


def lower_precision_for_speed() -> None:
    """Opt back into fast bf16 MXU matmuls (benchmarking)."""
    jax.config.update("jax_default_matmul_precision", "default")


def _low_precision_matmuls(device=None) -> bool:
    """Is the default matmul precision below full f32 on an accelerator?

    ``device`` accepts a jax.Device, a backend name string, or None
    (default backend) — the analogue of the reference's torch.device
    argument.
    """
    backend = getattr(device, "platform", device) or jax.default_backend()
    if backend == "cpu":
        return False
    return jax.config.jax_default_matmul_precision in (None, "default",
                                                       "fastest", "low")


_GUIDANCE = (
    "The accelerator backend defaults to reduced-precision (bf16-input) "
    "matmul passes, the JAX analogue of TF32. Call\n"
    "   >>> from pyannote_audio_tpu.utils.reproducibility import "
    "fix_reproducibility\n"
    "   >>> fix_reproducibility('highest')\n"
    "or set PYANNOTE_TPU_STRICT_REPRO=1 for bit-reproducible math "
    "(slower), or you might face reproducibility issues and obtain "
    "slightly different results across backends.")


def raise_reproducibility(device=None) -> None:
    """Raise when reduced-precision matmuls are active on an accelerator.

    Parity: raise_reproducibility (reference utils/reproducibility.py:
    38-49, the TF32 guard), re-targeted at the JAX default-matmul-
    precision knob."""
    if _low_precision_matmuls(device):
        raise ReproducibilityError(_GUIDANCE)


def warn_reproducibility(device=None) -> None:
    """Warn when reduced-precision matmuls are active on an accelerator.

    Parity: warn_reproducibility (reference utils/reproducibility.py:
    52-64)."""
    if _low_precision_matmuls(device):
        warnings.warn(ReproducibilityWarning(_GUIDANCE))
