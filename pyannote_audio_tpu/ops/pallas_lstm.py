"""Fused LSTM recurrence as a Pallas TPU kernel.

The scan-based LSTM (ops/lstm.py) dispatches one tiny (B,H)x(H,4H) matmul
per timestep through XLA's while-loop. This kernel keeps the recurrent
weights and the (h, c) state resident in VMEM for the whole sequence and
double-buffers the precomputed input projections from HBM, so each step is
one MXU matmul + VPU gate math with no loop overhead or weight re-fetch
(pallas_guide.md: double-buffering pattern).

Layout: xw (T, B, 4H) f32 in HBM (the hoisted ``x @ W_ih^T + biases``),
w_hh (H, 4H) f32 in VMEM, out (T, B, H) written back per step via DMA.
Gate order i, f, g, o matches torch (and ops/lstm.py).

Falls back to the scan implementation off-TPU; validated against it in
tests (interpret mode on CPU, compiled on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xw_hbm, w_hh_ref, out_hbm, h_ref, c_ref, xw_buf,
                 out_buf, in_sems, out_sems, *, seq_len: int,
                 reverse: bool):
    """One program: full recurrence with double-buffered input DMA."""

    def in_dma(slot, t):
        idx = seq_len - 1 - t if reverse else t
        return pltpu.make_async_copy(xw_hbm.at[idx], xw_buf.at[slot],
                                     in_sems.at[slot])

    def out_dma(slot, t):
        idx = seq_len - 1 - t if reverse else t
        return pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[idx],
                                     out_sems.at[slot])

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)
    in_dma(0, 0).start()

    def step(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < seq_len)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        gates = xw_buf[slot] + jnp.dot(
            h_ref[:], w_hh_ref[:], preferred_element_type=jnp.float32)
        H = h_ref.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h

        # wait for the previous write of this slot before reuse
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_buf[slot] = h
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, seq_len, step, 0)
    # drain outstanding writes
    @pl.when(seq_len >= 2)
    def _():
        out_dma((seq_len - 2) % 2, seq_len - 2).wait()
    out_dma((seq_len - 1) % 2, seq_len - 1).wait()


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def pallas_lstm_cell(xw: jnp.ndarray, w_hh: jnp.ndarray,
                     reverse: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """(T, B, 4H) hoisted inputs + (4H, H) torch-layout weights -> (T, B, H).

    Equivalent to ops.lstm.lstm_cell_scan.
    """
    T, B, H4 = xw.shape
    H = H4 // 4
    w_hh_t = jnp.asarray(w_hh, jnp.float32).T    # (H, 4H)
    kernel = functools.partial(_lstm_kernel, seq_len=T, reverse=reverse)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # xw stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w_hh resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),           # h
            pltpu.VMEM((B, H), jnp.float32),           # c
            pltpu.VMEM((2, B, H4), jnp.float32),       # xw double buffer
            pltpu.VMEM((2, B, H), jnp.float32),        # out double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(xw, jnp.float32), w_hh_t)


def pallas_lstm_single_direction(x, w_ih, w_hh, b_ih, b_hh,
                                 reverse: bool = False,
                                 interpret: bool = False):
    """Drop-in replacement for ops.lstm.lstm_single_direction."""
    xw = jnp.einsum("btd,hd->bth", x, w_ih,
                    precision=jax.lax.Precision.HIGHEST) + b_ih + b_hh
    hs = pallas_lstm_cell(jnp.swapaxes(xw, 0, 1), w_hh, reverse=reverse,
                          interpret=interpret)
    return jnp.swapaxes(hs, 0, 1)
