"""Sound microbenchmark protocol for the tunnel-attached TPU backend.

WHY THIS EXISTS. On this environment's relay-attached chip,
``jax.block_until_ready`` returns without waiting for device execution —
timings built on it are garbage (they can show 4600 TFLOP/s on a ~197 TFLOP/s
chip). Only a host fetch (``float(x)``, ``np.asarray(x)``) forces completion,
and a single fetch carries ~25-30 ms of relay round-trip. The earlier
bench_block1.py / pallas_block1_v2.py numbers (and the "~60 GB/s streaming
wall" conclusion they produced) were distorted by this; bench.py and
bench_stages.py were always sound because they fetch checksums inside the
timed window.

THE PROTOCOL. For a shape-preserving op ``f``:
  1. build TWO jitted programs that apply f K1 and K2 times UNROLLED
     (python loop, NOT lax.scan — scan-of-big-carry programs have hung this
     backend's remote-compile path) and end in a tiny strided checksum;
  2. host-fetch the checksum (forces execution);
  3. per-op cost = (min-total(K2) - min-total(K1)) / (K2 - K1).
The slope cancels both the dispatch+fetch overhead and any constant program
prologue. Caveat: if f is purely elementwise, XLA fuses the K iterations
into ONE pass — use distinct-traffic ops (convs) or interpret the slope as
the fused cost.

MEASURED on this chip (v5e via axon tunnel, 2026-08-18, recorded in
BASELINE.md "MEASUREMENT CORRECTION"):
  - HBM streaming (f32/bf16, 64-512 MB):        ~600 GB/s
  - matmul 4096^3 bf16:                          ~192 TFLOP/s
  - conv-LRP chain (divide->convT->reweight, bf16, (20,HxH,C)):
      block1 (224^2, 64)   2.31 ms  (32 TF/s — lane-padded C=64)
      block1 lane-packed   1.80 ms  (82 TF/s actual, 41 useful)
      pallas v3 same layout 2.06 ms (the kernel LOSES under sound timing)
      block2 (112^2, 128)  0.50 ms  (149 TF/s)
      block4 (28^2, 512)   0.48 ms  (155 TF/s)
      block5 (14^2, 512)   0.14 ms  (130 TF/s)

Run: python experiments/bench_sound.py [stream|matmul|blocks]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(make_prog, arg, K1=2, K2=8, reps=4):
    """Per-iteration cost of the op inside make_prog(K), via the K-slope."""
    res = {}
    for K in (K1, K2):
        f = jax.jit(make_prog(K))
        float(f(arg))  # compile + force one full execution
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(arg))
            ts.append(time.perf_counter() - t0)
        res[K] = min(ts)
    return (res[K2] - res[K1]) / (K2 - K1)


def bench_stream():
    n = 512 * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    def mk(K):
        def f(x):
            c = x
            for _ in range(K):
                c = c * 1.000001 + 0.5
            return c[::65536].sum()
        return f

    # NOTE: elementwise iterations fuse — this measures ONE fused pass of
    # read+write regardless of K, so use K2-K1 = 1 effective pass? No: the
    # chain is sequential on c, but XLA fuses ALL K iterations into one
    # kernel with K fma's per element — traffic is ONE pass. To measure
    # streaming, compare K=1 against a no-op program instead.
    def mk_noop(_K):
        def f(x):
            return x[::65536].sum()
        return f

    f1 = jax.jit(mk(1))
    f0 = jax.jit(mk_noop(0))
    float(f1(x)); float(f0(x))
    t1 = min(_t(f1, x) for _ in range(4))
    t0 = min(_t(f0, x) for _ in range(4))
    dt = t1 - t0
    print(f"stream f32 512MB: {dt*1e3:.2f} ms -> {2*n*4/dt/1e9:.0f} GB/s (read+write)")


def _t(f, *a):
    t0 = time.perf_counter()
    float(f(*a))
    return time.perf_counter() - t0


def bench_matmul():
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    def mk(K):
        def f(a):
            c = a
            for _ in range(K):
                c = (c @ a) / jnp.bfloat16(64.0)
            return c.astype(jnp.float32)[::512, ::512].sum()
        return f

    s = slope_time(mk, a, K1=2, K2=8)
    print(f"matmul 4096^3 bf16: {s*1e3:.3f} ms -> {2*4096**3/s/1e12:.1f} TFLOP/s")


def bench_blocks():
    DT = jnp.bfloat16

    def run_shape(Wn, H, C, tag):
        rng = np.random.default_rng(0)
        x = jnp.abs(jnp.asarray(rng.normal(size=(Wn, H, H, C)).astype(np.float32))).astype(DT)
        z = (jnp.asarray(rng.normal(size=(Wn, H, H, C)).astype(np.float32)) + 3.0).astype(DT)
        k = jnp.abs(jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05)).astype(DT)
        kt = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)
        r0 = jnp.asarray(rng.normal(size=(Wn, H, H, C)).astype(np.float32)).astype(DT)

        def chain(c):
            s = c / jnp.where(z == 0, jnp.asarray(0.01, DT), z)
            t = jax.lax.conv_general_dilated(
                s, kt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return ((x * t) / jnp.asarray(4.0, DT)).astype(DT)

        def mk(K):
            def f(c):
                for _ in range(K):
                    c = chain(c)
                return c.astype(jnp.float32)[::3, ::7, ::7, ::17].sum()
            return f

        s = slope_time(mk, r0)
        gf = Wn * H * H * C * C * 9 * 2 / 1e9
        print(f"{tag}: {s*1e3:7.3f} ms/chain  convT {gf:5.1f} GF -> {gf/s/1e3:5.1f} TF/s")

    run_shape(20, 224, 64, "block1 conv1_2 (224^2, 64) ")
    run_shape(20, 112, 128, "block2 conv2_2 (112^2,128) ")
    run_shape(20, 28, 512, "block4 conv4_x (28^2, 512) ")
    run_shape(20, 14, 512, "block5 conv5_x (14^2, 512) ")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stream", "all"):
        bench_stream()
    if which in ("matmul", "all"):
        bench_matmul()
    if which in ("blocks", "all"):
        bench_blocks()
