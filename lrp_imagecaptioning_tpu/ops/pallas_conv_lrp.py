"""Fused Pallas kernels for the alpha1beta0 conv-LRP hot path.

For a post-ReLU layer (x >= 0 — every VGG conv but the input one), the rule
collapses to two passes (ops/lrp_conv.py:lrp_conv_alpha_beta):

    pass 1 (divide):    s   = r / stab(conv(x, W+) + b)
    pass 2 (multiply):  out = x * conv(s, flipT(W+))

Both are "3x3 SAME conv + elementwise" — the transposed conv of a stride-1
SAME 3x3 conv is itself a 3x3 SAME conv with the kernel spatially flipped and
channel-transposed. ``conv3x3_fused`` is therefore ONE kernel with an
elementwise mode:

  * the conv input rides in HBM and each grid cell DMAs its (Th+2, W+2) halo
    tile into VMEM (inputs are pre-padded by one pixel so no boundary code);
  * the 9 taps are 9 MXU matmuls (Th*W, Cin) @ (Cin, Cout) accumulating f32;
  * divide / multiply fuses on the accumulator before the tile leaves VMEM —
    the z / conv-transpose intermediates never touch HBM.

This eliminates the two HBM round-trips (z and the transposed-conv result)
the XLA graph path materializes per layer per word-batch. Row-tile height
adapts to the layer (divisor of H, VMEM-bounded). Falls back to interpret
mode off-TPU so parity tests run on CPU.

MEASURED (v5e, 20-word batches, f32). Two methodologies, very different
stories. Per-dispatch timing (sync each call) reads as parity: block4
(28x28x512) 31.2ms vs XLA's 31.0ms, block2 (112x112x128) 33.6 vs 31.9,
block1 (224x224x64) 49.7 vs 42.6 — but those numbers are dominated by ~27ms
of host->device dispatch latency on this tunnel. With 10 calls chained
inside one jit (fori_loop, data-dependent), the true per-call kernel times
are: block1 16.9ms vs XLA 7.5, block2 6.5 vs 4.4, block4 4.3 vs 4.0 — XLA
WINS outright. block1 loses 2x because the <128-channel zero-padding
(Mosaic lane requirement, below) doubles this kernel's FLOPs where XLA
tiles 64 channels natively. A bf16-operand variant was also measured: no
gain at block4 (4.0ms, matching XLA's own bf16 non-gain — the divide pass
is VPU/HBM-bound, not MXU-bound) and further Mosaic failures at the wider
shapes, so it was dropped rather than shipped half-working.

Two hard-won Mosaic constraints are encoded: halo DMA rows must be
sublane-aligned (the unaligned version FAULTED the TPU worker) and the
conv-input channel (lane) dim must be >= 128 (sub-lane Cin fails
compilation; zero-padding channels is an identity fix). Kept as validated
infrastructure (exact-parity tests in tests/test_pallas_conv.py) — the XLA
path (ops/lrp_conv.py) is the production route, on the measurements above.
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


def _row_tile(H: int, W: int, cin: int, budget_bytes: int = 3 << 20) -> int:
    """Largest divisor of H whose padded x-tile fits the VMEM budget."""
    best = 1
    for th in range(1, H + 1):
        if H % th:
            continue
        if (th + 2) * (W + 2) * cin * 4 <= budget_bytes:
            best = th
    return best


def _conv3x3_kernel(x_hbm, ew_ref, k_ref, b_ref, out_ref, x_tile, sem, *,
                    Th: int, W: int, mode: str, eps: float):
    """One grid cell: rows [i*Th, i*Th+Th) of sample n.

    x_hbm:  (N, H+2, W+2, Cin) padded conv input, HBM
    ew_ref: (1, Th, W, Ce) elementwise operand tile (r for divide, x for
            multiply), VMEM
    k_ref:  (9, Cin, Cout) taps, VMEM;  b_ref: (1, Cout) bias, VMEM
    out_ref: (1, Th, W, Cout) result tile
    x_tile: (Th+2, W+2, Cin) VMEM scratch
    """
    n = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * Th, Th + 2)], x_tile, sem
    )
    dma.start()
    dma.wait()

    cout = out_ref.shape[-1]
    acc = jnp.zeros((Th, W, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = x_tile[dy : dy + Th, dx : dx + W, :]       # (Th, W, Cin)
            acc = acc + jax.lax.dot_general(
                window, k_ref[dy * 3 + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    ew = ew_ref[0]
    if mode == "divide":
        z = acc + b_ref[0]
        z = z + (z == 0).astype(z.dtype) * eps                  # SafeDivide
        out_ref[0] = ew / z
    else:  # multiply
        out_ref[0] = ew * acc


@functools.partial(jax.jit, static_argnames=("W", "mode", "eps", "interpret"))
def _conv3x3_fused_call(x_padded, ew, taps, bias2, W: int, mode: str, eps: float, interpret: bool):
    N, Hp, Wp, cin = x_padded.shape
    H = Hp - 2
    cout = taps.shape[-1]
    Th = _row_tile(H, W, cin)
    grid = (N, H // Th)
    return pl.pallas_call(
        functools.partial(_conv3x3_kernel, Th=Th, W=W, mode=mode, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x stays in HBM
            pl.BlockSpec((1, Th, W, ew.shape[-1]), lambda n, i: (n, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # taps
            pl.BlockSpec(memory_space=pltpu.VMEM),          # bias
        ],
        out_specs=pl.BlockSpec((1, Th, W, cout), lambda n, i: (n, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Th + 2, Wp, cin), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * cin * cout,
            bytes_accessed=4 * N * H * W * (cin + ew.shape[-1] + cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_padded, ew, taps, bias2)


def conv3x3_fused(x, ew, kernel, bias=None, mode: str = "divide", eps: float = EPS_KERAS,
                  interpret: bool | None = None):
    """Fused '3x3 SAME conv then elementwise' (see module docstring).

    x: (N,H,W,Cin) conv input; ew: (N,H,W,Ce) elementwise operand
    (Ce == Cout for divide, Ce == Cout for multiply where ew multiplies the
    conv result); kernel: (3,3,Cin,Cout); bias: (Cout,) or None (divide only).
    """
    N, H, W, cin = x.shape
    cout = kernel.shape[-1]
    # Mosaic requires the conv-input channel (lane) dim >= 128 here: sub-lane
    # channel counts (e.g. VGG block1's 64) fail its compiler. Zero-padding
    # channels is a mathematical identity for the conv.
    if cin < 128:
        pad_c = 128 - cin
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        cin = 128
    # pad: +1 halo each side, right-pad width to a sublane multiple (8) so
    # the HBM->VMEM halo DMA rows stay aligned
    wp = (W + 2 + 7) // 8 * 8
    x_padded = jnp.pad(x.astype(jnp.float32),
                       ((0, 0), (1, 1), (1, wp - W - 1), (0, 0)))
    taps = kernel.reshape(9, cin, cout).astype(jnp.float32)
    bias2 = (jnp.zeros((1, cout), jnp.float32) if bias is None
             else bias.reshape(1, cout).astype(jnp.float32))
    if interpret is None:
        interpret = not _on_tpu()
    return _conv3x3_fused_call(x_padded, ew.astype(jnp.float32),
                               taps, bias2, W, mode, eps, interpret)


def flip_transpose_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) -> (3,3,Cout,Cin) spatially flipped: the kernel of the
    transposed conv as a plain SAME conv."""
    return jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)


def lrp_conv_a1b0_pallas(r: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray | None, eps: float = EPS_KERAS,
                         interpret: bool | None = None) -> jnp.ndarray:
    """alpha1beta0 conv LRP for non-negative x via the two fused passes.

    Drop-in for ops.lrp_conv.lrp_conv_alpha_beta(..., alpha=1, beta=0,
    input_nonneg=True) on 3x3 SAME stride-1 convs."""
    kp = kernel * (kernel >= 0)
    # z bias: bp + bn == bias (the signs split then re-add, lrp_conv.py)
    s = conv3x3_fused(x, r, kp, bias, mode="divide", eps=eps, interpret=interpret)
    return conv3x3_fused(s, x, flip_transpose_kernel(kp), None, mode="multiply",
                         interpret=interpret)
