"""Core LRP primitives, vectorized for TPU.

The reference implements exactly one linear LRP rule used everywhere in the
decoder backward pass (explainers.py:156-165):

    relevance_j = sum_k  W[j,k] * x_j / (z_k + sign(z_k)*eps) * r_k

with ``bias_factor=0`` (the bias term never receives relevance) and a
sign-aligned stabilizer where sign(0) = +1 (explainers.py:141-144).

Here that one-neuron-at-a-time numpy loop becomes two fused TPU ops:

* matrix weight:   rel = x * ((r / stab(z)) @ W^T)      — one MXU matmul
* identity weight: rel = x * r / stab(z)                — one VPU elementwise

Both batch trivially under ``vmap`` over words / samples / grid locations.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_KERAS = 1e-7  # K.epsilon() default used by the reference rule


def sign_stabilizer(z: jnp.ndarray, eps: float = EPS_KERAS) -> jnp.ndarray:
    """z + sign(z)*eps with sign(0) = +1 (explainers.py:141-144)."""
    return z + jnp.where(z >= 0, eps, -eps)


def safe_divide(a: jnp.ndarray, b: jnp.ndarray, factor: float = EPS_KERAS) -> jnp.ndarray:
    """a / b with exact zeros in b replaced by ``factor``
    (iNNvestigate SafeDivide, layers.py:446-458)."""
    return a / (b + (b == 0).astype(b.dtype) * factor)


def lrp_linear(
    r: jnp.ndarray,
    x: jnp.ndarray,
    z: jnp.ndarray,
    w: jnp.ndarray,
    eps: float = EPS_KERAS,
) -> jnp.ndarray:
    """epsilon-LRP through ``z = x @ w (+ b)`` with bias_factor=0.

    Args:
      r: relevance at the output, shape (..., Dout)
      x: forward input, shape (..., Din)
      z: forward pre-activation output (including bias), shape (..., Dout)
      w: weight, shape (Din, Dout)
    Returns:
      relevance at the input, shape (..., Din)

    Equivalent to _propagate_relevance_linear_lrp (explainers.py:156-165)
    vectorized: the per-(j,k) attribution matrix is never materialized.
    """
    s = r / sign_stabilizer(z, eps)
    return x * (s @ w.T)


def lrp_identity(r: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray, eps: float = EPS_KERAS) -> jnp.ndarray:
    """lrp_linear with an identity weight: rel_j = x_j * r_j / stab(z_j).

    Used for all the sum/split/gate steps of the decoder backward where the
    reference passes ``weight=np.identity(...)`` (e.g. explainers.py:576-601).
    """
    return x * r / sign_stabilizer(z, eps)
