"""Runtime backend helpers shared by the opt-in/opt-out device gates."""

from __future__ import annotations

import os


def device_flag(name: str, accelerator_default: bool = True) -> bool:
    """Resolve a PYANNOTE_TPU_* feature gate.

    Explicit "1"/"0" wins. When unset and ``accelerator_default``, the
    gate is on iff jax's default backend is an accelerator (TPU), off on
    CPU; otherwise it is off everywhere (pure opt-in).
    """
    value = os.environ.get(name)
    if value is not None:
        return value == "1"
    if not accelerator_default:
        return False
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False
