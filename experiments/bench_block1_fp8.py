"""Probe: does fp8 storage buy anything on the block1 LRP backward chain?

bf16 storage already halves the HBM traffic of the bandwidth-wall-bound
block1 backward (BASELINE.md). fp8 (e4m3 / e5m2) would halve it again IF
XLA:TPU runs the conv + elementwise chain natively at 1 byte/elem on v5e.
This measures (a) whether the chain compiles/runs with fp8-resident
tensors, (b) its time vs the bf16 chain, and (c) the numeric error vs an
f32 oracle — LRP relevance has high dynamic range, so e4m3's 4-bit
exponent is the expected accuracy risk.

Run: python experiments/bench_block1_fp8.py  (TPU backend)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os_p
import sys as _sys_p
_sys_p.path.insert(0, _os_p.path.dirname(_os_p.path.dirname(_os_p.path.abspath(__file__))))

W, H, C = 20, 224, 64
ITERS = 8


def conv2d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain(r, z, x, k, dtype):
    """r/z -> convT(k) -> *x, all tensors held in `dtype`."""
    r = r.astype(dtype)
    z = z.astype(dtype)
    x = x.astype(dtype)
    k = k.astype(dtype)
    s = r / jnp.where(z == 0, jnp.asarray(0.01, dtype), z)
    kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    out = conv2d(s, kf) * x
    return out.astype(jnp.float32)


def timed(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    sums = [o.sum() for o in outs]
    _ = [np.asarray(s) for s in sums]
    return (time.perf_counter() - t0) / ITERS * 1e3, out


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.normal(size=(W, H, H, C)).astype(np.float32))
    z = jnp.asarray((rng.normal(size=(1, H, H, C)) + 2.0).astype(np.float32))
    x = jnp.asarray(np.abs(rng.normal(size=(1, H, H, C))).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)

    oracle = jax.jit(lambda *a: chain(*a, dtype=jnp.float32))
    ms32, ref = timed(oracle, r, z, x, k)
    print(json.dumps({"dtype": "f32", "ms": round(ms32, 2)}), flush=True)

    for name, dt in (("bf16", jnp.bfloat16),
                     ("f8_e4m3", jnp.float8_e4m3fn),
                     ("f8_e5m2", jnp.float8_e5m2)):
        try:
            fn = jax.jit(lambda *a, _dt=dt: chain(*a, dtype=_dt))
            ms, out = timed(fn, r, z, x, k)
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            print(json.dumps({"dtype": name, "ms": round(ms, 2),
                              "rel_err_vs_f32": round(rel, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"dtype": name, "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
