"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from lrp_imagecaptioning_tpu.models.cells import LSTMState, lstm_init, lstm_step
from lrp_imagecaptioning_tpu.ops.lrp_core import lrp_linear
from lrp_imagecaptioning_tpu.ops.pallas_kernels import lrp_linear_pallas, lstm_gates_pallas


def test_lrp_linear_pallas_matches_reference(rng):
    M, Din, Dout = 24, 128, 256
    x = jnp.asarray(rng.normal(size=(M, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, Dout)).astype(np.float32))
    z = x @ w
    r = jnp.asarray(rng.normal(size=(M, Dout)).astype(np.float32))
    ref = lrp_linear(r, x, z, w)
    got = lrp_linear_pallas(r, x, z, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lrp_linear_pallas_nd_batch(rng):
    B, T, Din, Dout = 2, 3, 16, 8
    x = jnp.asarray(rng.normal(size=(B, T, Din)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(Din, Dout)).astype(np.float32))
    z = x @ w
    r = jnp.asarray(rng.normal(size=(B, T, Dout)).astype(np.float32))
    ref = lrp_linear(r, x, z, w)
    got = lrp_linear_pallas(r, x, z, w)
    assert got.shape == (B, T, Din)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_lstm_gates_pallas_matches_cell(rng):
    B, H, In = 4, 32, 16
    params = lstm_init(jax.random.PRNGKey(0), In, H)
    x = jnp.asarray(rng.normal(size=(B, In)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    state, cache = lstm_step(params, x, LSTMState(h0, c0))
    h2, c2 = lstm_gates_pallas(cache.z_pre, c0)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(state.h), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(state.c), rtol=1e-6, atol=1e-6)
