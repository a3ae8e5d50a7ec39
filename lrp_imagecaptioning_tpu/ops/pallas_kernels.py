"""Pallas TPU kernels for the explanation hot path.

Two fusions the XLA graph path leaves on the table:

* ``lrp_linear_pallas`` — the epsilon-LRP linear rule
  rel = x * ((r / stab(z)) @ W^T) as ONE kernel: the stabilized divide feeds
  the MXU matmul from VMEM and the input re-weighting happens on the result
  tile before it ever leaves VMEM. The XLA version materializes s and the
  matmul result in HBM between fusions when the word-batched explanation
  vmaps this over hundreds of (word, location) seeds.
* ``lstm_gates_pallas`` — the LSTM elementwise tail (4-way gate split,
  sigmoid/tanh, cell update) fused into one VPU pass over the (B, 4H) gate
  pre-activation block.

Both have exact jnp reference semantics (ops.lrp_core.lrp_linear /
models.cells.lstm_step) and fall back to interpreter mode off-TPU, so tests
validate parity on CPU. EPS matches K.epsilon() (explainers.py:141-144).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lrp_core import EPS_KERAS


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# lrp_linear: rel = x * ((r / (z + sign(z) eps)) @ W^T)
# ---------------------------------------------------------------------------


def _lrp_linear_kernel(r_ref, z_ref, x_ref, wt_ref, out_ref, *, eps: float):
    z = z_ref[:]
    s = r_ref[:] / (z + jnp.where(z >= 0, eps, -eps))
    acc = jnp.dot(s, wt_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = x_ref[:] * acc


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _lrp_linear_call(r2, z2, x2, wt, eps: float, interpret: bool):
    M, Dout = r2.shape
    Din = x2.shape[1]
    TM = min(_round_up(M, 8), 256)
    grid = (pl.cdiv(M, TM),)
    return pl.pallas_call(
        functools.partial(_lrp_linear_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, Din), x2.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Din), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Dout, Din), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, Din), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * Din * Dout + 3 * M * Dout + M * Din,
            bytes_accessed=4 * (2 * M * Dout + 2 * M * Din + Dout * Din),
            transcendentals=0,
        ),
        interpret=interpret,
    )(r2, z2, x2, wt)


def lrp_linear_pallas(r: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray, w: jnp.ndarray,
                      eps: float = EPS_KERAS) -> jnp.ndarray:
    """Drop-in replacement for ops.lrp_core.lrp_linear (same signature).

    Leading dims of r/z/x are flattened into the M (sublane) axis."""
    batch_shape = x.shape[:-1]
    Din = x.shape[-1]
    Dout = r.shape[-1]
    M = 1
    for d in batch_shape:
        M *= d
    r2 = r.reshape(M, Dout).astype(jnp.float32)
    z2 = z.reshape(M, Dout).astype(jnp.float32)
    x2 = x.reshape(M, Din).astype(jnp.float32)
    wt = w.T.astype(jnp.float32)  # (Dout, Din)
    out = _lrp_linear_call(r2, z2, x2, wt, eps, not _on_tpu())
    return out.reshape(*batch_shape, Din)


# ---------------------------------------------------------------------------
# LSTM gate tail: (z_pre (B,4H), c_prev (B,H)) -> (h, c)
# ---------------------------------------------------------------------------


def _lstm_gates_kernel(z_ref, c_prev_ref, h_ref, c_ref, *, H: int):
    z = z_ref[:]
    i = jax.nn.sigmoid(z[:, :H])
    f = jax.nn.sigmoid(z[:, H : 2 * H])
    g = jnp.tanh(z[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H :])
    c = f * c_prev_ref[:] + i * g
    h_ref[:] = o * jnp.tanh(c)
    c_ref[:] = c


@functools.partial(jax.jit, static_argnames=("H", "interpret"))
def _lstm_gates_call(z_pre, c_prev, H: int, interpret: bool):
    B = z_pre.shape[0]
    out_shape = jax.ShapeDtypeStruct((B, H), z_pre.dtype)
    return pl.pallas_call(
        functools.partial(_lstm_gates_kernel, H=H),
        out_shape=(out_shape, out_shape),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(z_pre, c_prev)


def lstm_gates_pallas(z_pre: jnp.ndarray, c_prev: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused gate nonlinearities + cell update; returns (h, c).

    Equivalent to the tail of models.cells.lstm_step after the two matmuls."""
    H = c_prev.shape[-1]
    return _lstm_gates_call(z_pre, c_prev, H, not _on_tpu())
