"""Pallas LSTM kernel vs the scan implementation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyannote_audio_tpu.ops.lstm import lstm_single_direction
from pyannote_audio_tpu.ops.pallas_lstm import pallas_lstm_single_direction


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_lstm_matches_scan(reverse):
    rng = np.random.default_rng(0)
    B, T, D, H = 8, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    w_ih = jnp.asarray(rng.standard_normal((4 * H, D)).astype(np.float32)
                       * 0.2)
    w_hh = jnp.asarray(rng.standard_normal((4 * H, H)).astype(np.float32)
                       * 0.2)
    b_ih = jnp.asarray(rng.standard_normal(4 * H).astype(np.float32) * 0.1)
    b_hh = jnp.zeros(4 * H, jnp.float32)

    expected = lstm_single_direction(x, w_ih, w_hh, b_ih, b_hh,
                                     reverse=reverse)
    ours = pallas_lstm_single_direction(x, w_ih, w_hh, b_ih, b_hh,
                                        reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-5)


def test_pallas_bidirectional_layer_matches_scan():
    from pyannote_audio_tpu.ops.lstm import lstm_bidirectional_layer
    from pyannote_audio_tpu.ops.pallas_lstm import \
        pallas_lstm_bidirectional_layer
    rng = np.random.default_rng(2)
    B, T, D, H = 8, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    layer = {}
    for name, shape in [("w_ih", (4 * H, D)), ("w_hh", (4 * H, H)),
                        ("b_ih", (4 * H,)), ("b_hh", (4 * H,)),
                        ("w_ih_r", (4 * H, D)), ("w_hh_r", (4 * H, H)),
                        ("b_ih_r", (4 * H,)), ("b_hh_r", (4 * H,))]:
        layer[name] = jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * 0.2)
    expected = lstm_bidirectional_layer(x, layer)
    ours = pallas_lstm_bidirectional_layer(x, layer, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-5)


def test_pallas_lstm_short_sequence():
    rng = np.random.default_rng(1)
    B, T, D, H = 8, 1, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    w_ih = jnp.asarray(rng.standard_normal((4 * H, D)).astype(np.float32))
    w_hh = jnp.asarray(rng.standard_normal((4 * H, H)).astype(np.float32))
    b = jnp.zeros(4 * H, jnp.float32)
    expected = lstm_single_direction(x, w_ih, w_hh, b, b)
    ours = pallas_lstm_single_direction(x, w_ih, w_hh, b, b,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               atol=1e-5)
