"""On-device hysteresis thresholding as an associative scan.

The hysteresis recurrence ``state[t] = cmd[t] if cmd[t] != 0 else
state[t-1]`` (cmd: +1 above onset, -1 below offset, 0 in between) is a
forward-fill — associative under "last non-zero wins" — so it runs in
O(log T) depth on the VPU via jax.lax.associative_scan instead of a
sequential loop. Used by the VAD / multilabel pipelines to keep
binarization on device before the final segment extraction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("initial_on",))
def hysteresis(
    scores: jnp.ndarray,        # (frames, ...) scores in [0, 1]
    onset: jnp.ndarray,
    offset: jnp.ndarray,
    initial_on: Optional[bool] = None,
) -> jnp.ndarray:
    """Binary activation with hysteresis along axis 0.

    Reference semantics (signal.py:108-111): NaN -> 0.0 first (a NaN run
    turns the state OFF rather than freezing it), and an undecided
    frame 0 takes the hysteresis-band midpoint decision
    ``scores[0] >= (onset + offset) / 2``.
    """
    scores = jnp.nan_to_num(scores)
    cmd = jnp.where(scores > onset, 1,
                    jnp.where(scores < offset, -1, 0)).astype(jnp.int8)
    if initial_on is None:
        init = scores[0] >= 0.5 * (onset + offset)
    else:
        init = jnp.full(cmd.shape[1:], initial_on, dtype=bool)
    cmd = cmd.at[0].set(jnp.where(cmd[0] == 0,
                                  jnp.where(init, 1, -1),
                                  cmd[0]).astype(jnp.int8))

    def combine(a, b):
        return jnp.where(b == 0, a, b)

    filled = jax.lax.associative_scan(combine, cmd, axis=0)
    return filled > 0
