"""Grouped-conv vs block-diagonal dense kernels for the lane-packed block1 tail.

The shipped lane-pack (cnn_lrp.py lane_pack=True) fills the 128-lane channel
tiles by packing TWO words into the channel dim and running the rule convs
with BLOCK-DIAGONAL dense kernels (3,3,2C,2C) — full lanes, but half the MAC
grid multiplies the zero off-diagonal blocks (BASELINE.md: 1.8 ms measured vs
a ~1.0 ms waste-free floor for the conv1_2 chain).

XLA's native grouped convolution (``feature_group_count=2``) expresses exactly
this block-diagonal structure without materializing the zeros: kernel
(3,3,C,2C) where output group j reads only input group j. This script measures
whether TPU lowering actually realizes the 2x MAC saving or pads the groups
back out, using the sound K-slope protocol (experiments/bench_sound.py — host
fetch inside the timed window; block_until_ready is unsound on this relay
backend).

Variants, all at the conv1_2 packed chain shape (10, 224, 224, 128):
  BD   block-diagonal dense kernel (shipped lane_pack path)
  G2   feature_group_count=2 grouped kernel, same packed layout
  G2T  grouped, transposed conv obtained via jax.vjp (as the rule uses)

Run on the real TPU: python experiments/bench_grouped.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

W2, H, C = 10, 224, 64  # 20 words packed in pairs -> 10 rows of 128 channels
DT = jnp.bfloat16


def conv(x, k, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def convT(x_shape, k, s, groups=1):
    primal = jnp.zeros(x_shape, s.dtype)
    _, vjp = jax.vjp(lambda x: conv(x, k, groups), primal)
    (dx,) = vjp(s)
    return dx


def slope_time(make_prog, arg, K1=2, K2=8, reps=4):
    res = {}
    for K in (K1, K2):
        f = jax.jit(make_prog(K))
        float(f(arg))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(arg))
            ts.append(time.perf_counter() - t0)
        res[K] = min(ts)
    return (res[K2] - res[K1]) / (K2 - K1)


def main():
    rng = np.random.default_rng(0)
    # packed activations / denominators: (W2, H, H, 2C)
    x2 = jnp.abs(jnp.asarray(rng.normal(size=(1, H, H, 2 * C)).astype(np.float32))).astype(DT)
    z2 = (jnp.asarray(rng.normal(size=(1, H, H, 2 * C)).astype(np.float32)) + 3.0).astype(DT)
    k = jnp.abs(jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)).astype(DT)
    r0 = jnp.asarray(rng.normal(size=(W2, H, H, 2 * C)).astype(np.float32)).astype(DT)

    # block-diagonal dense kernel (3,3,128,128)
    kb = jnp.zeros((3, 3, 2 * C, 2 * C), DT)
    kb = kb.at[:, :, :C, :C].set(k)
    kb = kb.at[:, :, C:, C:].set(k)
    # grouped kernel (3,3,64,128): out group j uses in group j, weights k both
    kg = jnp.concatenate([k, k], axis=3)

    def chain_bd(c):
        s = c / jnp.where(z2 == 0, jnp.asarray(0.01, DT), z2)
        t = convT(c.shape, kb, s)
        return ((x2 * t) / jnp.asarray(4.0, DT)).astype(DT)

    def chain_g2(c):
        s = c / jnp.where(z2 == 0, jnp.asarray(0.01, DT), z2)
        t = convT(c.shape, kg, s, groups=2)
        return ((x2 * t) / jnp.asarray(4.0, DT)).astype(DT)

    def chain_g2_fwd(c):
        # forward-direction grouped conv (the z+ compute direction)
        s = c / jnp.where(z2 == 0, jnp.asarray(0.01, DT), z2)
        t = conv(s, kg, groups=2)
        return ((x2 * t) / jnp.asarray(4.0, DT)).astype(DT)

    def chain_bd_fwd(c):
        s = c / jnp.where(z2 == 0, jnp.asarray(0.01, DT), z2)
        t = conv(s, kb)
        return ((x2 * t) / jnp.asarray(4.0, DT)).astype(DT)

    def mk(chain):
        def make(K):
            def f(c):
                for _ in range(K):
                    c = chain(c)
                return c.astype(jnp.float32)[::3, ::7, ::7, ::17].sum()
            return f
        return make

    # numerical equivalence check first (f32)
    kb32, kg32 = kb.astype(jnp.float32), kg.astype(jnp.float32)
    r32 = r0.astype(jnp.float32)
    bd = convT(r32.shape, kb32, r32)
    g2 = convT(r32.shape, kg32, r32, groups=2)
    err = float(jnp.max(jnp.abs(bd - g2)) / (jnp.max(jnp.abs(bd)) + 1e-9))
    print(f"convT block-diag vs grouped max rel err: {err:.2e}")

    results = {"equiv_rel_err": err}
    gf_dense = W2 * H * H * (2 * C) * (2 * C) * 9 * 2 / 1e9   # dense MACs
    gf_group = gf_dense / 2                                    # useful MACs
    for name, chain in [("BD_convT", chain_bd), ("G2_convT", chain_g2),
                        ("BD_fwd", chain_bd_fwd), ("G2_fwd", chain_g2_fwd)]:
        s = slope_time(mk(chain), r0)
        useful = gf_group / s / 1e3
        print(f"{name:10s} {s*1e3:7.3f} ms/chain   useful {gf_group:5.1f} GF -> {useful:5.1f} TF/s")
        results[name + "_ms"] = s * 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
