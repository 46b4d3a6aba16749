"""Runtime backend helpers shared by the opt-in/opt-out device gates."""

from __future__ import annotations

import os


def device_flag(name: str) -> bool:
    """Resolve a PYANNOTE_TPU_DEVICE_* gate.

    Explicit "1"/"0" wins; unset defaults to on-device when jax's default
    backend is an accelerator (TPU) and to the bit-exact host
    implementation on CPU. Decided by the round-2 DER A/B
    (benchmarks/clustering_ab.py, recorded in docs/PARITY.md): device
    and host clustering produce identical DER, so accelerator
    deployments default to the host-free post-NN path.
    """
    value = os.environ.get(name)
    if value is not None:
        return value == "1"
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False
