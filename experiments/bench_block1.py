"""Microbenchmark: the block1 CNN-LRP backward chain (the 48% hot spot).

Per BASELINE.md's profile, the two block1 convs (224x224x64) are 258 ms of
the 533 ms CNN-LRP stage at bench shapes (56 images x 20 words), sitting
3-4x above a pass-count bandwidth floor. This script times isolated variants
of the conv1_2 backward chain (r -> safe_divide by z -> convT(k+) -> x*)
at exactly those shapes to find where the time goes:

  A  current rule (vjp-lowered convT), bf16
  B  direct flipped-kernel conv (no vjp lowering)
  C  2-words-packed-into-128-channels block-diagonal conv
  D  bare convT only (no divide / no reweight)
  E  pure elementwise pass over the word-batched tensor (traffic floor)
  F  f32 variant of A (bf16 sanity check)

Each variant is iterated K times inside ONE jitted lax.scan (the chain is
shape-preserving), so the measurement has one dispatch and no host round
trips. Run on the real TPU: python experiments/bench_block1.py

*** 2026-08-18 CAVEAT: this script's timing protocol (block_until_ready, no
host fetch) is UNSOUND on this relay-attached backend — block_until_ready
returns before execution finishes, and the absolute ms numbers it printed
(and the "~60 GB/s wall" interpretation built on them) are unreliable. Use
experiments/bench_sound.py (K-slope + host-fetched checksum) instead; its
corrected per-variant numbers are in BASELINE.md "MEASUREMENT CORRECTION".
The variant C insight (2-words-into-128-lanes is the right layout for C=64)
survived and is shipped as cnn_lrp.py lane_pack=True. ***
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os_p
import sys as _sys_p
_sys_p.path.insert(0, _os_p.path.dirname(_os_p.path.dirname(_os_p.path.abspath(__file__))))

W = 20          # words
H = Wd = 224
C = 64
K_ITERS = 8     # chain iterations inside the scan

DTYPE = jnp.bfloat16


def safe_divide(a, b, factor=0.01):
    den = jnp.where(b == 0, factor, b)
    return a / den


def conv2d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convT_vjp(x_shape, k, s):
    primal = jnp.zeros(x_shape, s.dtype)
    _, vjp = jax.vjp(lambda x: conv2d(x, k), primal)
    (dx,) = vjp(s)
    return dx


def convT_flip(k, s):
    # input-grad of stride-1 SAME 3x3 conv == conv with spatially flipped,
    # IO-transposed kernel, same padding
    kf = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    return conv2d(s, kf)


def chain_A(z, x, kp, r):
    s = safe_divide(r, z)
    t = convT_vjp(r.shape, kp, s)
    return x * t


def chain_B(z, x, kp, r):
    s = safe_divide(r, z)
    t = convT_flip(kp, s)
    return x * t


def chain_D(z, x, kp, r):
    return convT_vjp(r.shape, kp, r)


def chain_E(z, x, kp, r):
    return x * safe_divide(r, z) + 0.5


def make_packed(kp):
    """(3,3,64,64) -> block-diag (3,3,128,128) for 2-words-in-channels."""
    kb = jnp.zeros((3, 3, 2 * C, 2 * C), kp.dtype)
    kb = kb.at[:, :, :C, :C].set(kp)
    kb = kb.at[:, :, C:, C:].set(kp)
    return kb


def chain_C(z2, x2, kb, r):
    # r: (W, H, W, 64) -> (W//2, H, W, 128)
    rp = r.reshape(W // 2, 2, H, Wd, C).transpose(0, 2, 3, 1, 4).reshape(W // 2, H, Wd, 2 * C)
    s = safe_divide(rp, z2)
    t = convT_vjp(rp.shape, kb, s)
    out = x2 * t
    return out.reshape(W // 2, H, Wd, 2, C).transpose(0, 3, 1, 2, 4).reshape(W, H, Wd, C)


def time_variant(name, fn, consts, r0, iters=3):
    @jax.jit
    def run(r):
        def body(r, _):
            return fn(*consts, r), ()
        r, _ = jax.lax.scan(body, r, None, length=K_ITERS)
        return r

    out = run(r0); jax.block_until_ready(out)          # compile+warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(r0); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    per_chain_ms = min(ts) / K_ITERS * 1e3
    print(f"{name:40s} {per_chain_ms:8.3f} ms/chain  (x56 imgs = {per_chain_ms*56:7.1f} ms)")
    return per_chain_ms


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, H, Wd, C)).astype(np.float32)).astype(DTYPE)
    x = jnp.abs(x)  # post-relu
    kp = jnp.abs(jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32))).astype(DTYPE)
    r0 = jnp.asarray(rng.normal(size=(W, H, Wd, C)).astype(np.float32)).astype(DTYPE)
    z = conv2d(x, kp) + 0.1
    z, x, kp, r0 = jax.device_put((z, x, kp, r0))

    results = {}
    results["E_elementwise_floor"] = time_variant("E pure elementwise pass", chain_E, (z, x, kp), r0)
    results["D_bare_convT"] = time_variant("D bare convT (vjp)", chain_D, (z, x, kp), r0)
    results["A_current_vjp"] = time_variant("A divide+convT(vjp)+reweight", chain_A, (z, x, kp), r0)
    results["B_flipped_conv"] = time_variant("B divide+conv(flipped k)+reweight", chain_B, (z, x, kp), r0)

    kb = make_packed(kp)
    x2 = jnp.concatenate([x, x], axis=-1)
    z2 = jnp.concatenate([z, z], axis=-1)
    results["C_packed128"] = time_variant("C 2-words-in-128-channels", chain_C, (z2, x2, kb), r0)

    # f32 comparison
    xf, kf, rf, zf = x.astype(jnp.float32), kp.astype(jnp.float32), r0.astype(jnp.float32), z.astype(jnp.float32)
    results["F_f32_current"] = time_variant("F A in f32", chain_A, (zf, xf, kf), rf)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
