"""Feature taps on any model trunk.

Parity: /root/reference/src/pyannote/audio/utils/probe.py (probe :29+,
torch forward hooks). Functional JAX models have no mutable hooks;
flax's ``capture_intermediates`` provides the same capability: ``probe``
returns a function that runs the model and also returns the requested
intermediate activations by module path.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple


def probe(model, targets: Iterable[str]) -> Callable:
    """Build ``fn(waveforms) -> (output, {name: activation})``.

    ``targets`` are module-path substrings, e.g. ["lstm", "sincnet"].
    """
    targets = list(targets)
    if model.module is None:
        model.build()

    def match(mdl, _method) -> bool:
        joined = "/".join(str(p) for p in mdl.path)
        return any(t in joined for t in targets)

    def fn(waveforms):
        import jax.numpy as jnp
        output, state = model.module.apply(
            model.params, jnp.asarray(waveforms),
            capture_intermediates=match, mutable=["intermediates"])
        raw = state.get("intermediates", {})

        def flatten(node, prefix=""):
            out = {}
            for key, value in node.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    out.update(flatten(value, path))
                else:
                    out[path] = value[0] if isinstance(value, tuple) \
                        else value
            return out

        return output, flatten(raw)

    return fn
