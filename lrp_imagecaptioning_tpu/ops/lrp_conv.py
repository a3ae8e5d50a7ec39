"""LRP rules for conv / pool layers, as fused XLA programs.

Reproduces the iNNvestigate rules the reference actually uses
(innvestigate/analyzer/relevance_based/relevance_rule.py):

* ``lrp_conv_epsilon``    — EpsilonRule (relevance_rule.py:113-144): sign-
  aligned stabilizer, optional bias in z.
* ``lrp_conv_alpha_beta`` — AlphaBetaRule (relevance_rule.py:216-322):
  inputs split +/-, weights split +/- (bias split by sign too, since the rule
  signs *all* layer weights, relevance_rule.py:252-260); zero denominators
  replaced via SafeDivide (layers.py:446-458). alpha=1, beta=0 is the conv
  rule of LRPSequentialPresetA (relevance_analyzer.py:695-721).
* ``lrp_maxpool_wta``     — max pooling reversed by its gradient
  (winner-take-all), the LRP analyzer's default mapping for MaxPooling
  (relevance_analyzer.py:459-482).

Design note (TPU): relevance redistribution through a conv is a transposed
convolution; we obtain it as the VJP of the *same* forward conv so XLA picks
the optimal conv-transpose algorithm on the MXU and fuses the surrounding
elementwise ops (split/divide/multiply) into it. The word-batched explanation
path vmaps these with a leading (words,) dim, turning per-word backward passes
into one batched conv per layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lrp_core import EPS_KERAS, safe_divide, sign_stabilizer


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1, padding: str = "SAME",
           compute_dtype=None) -> jnp.ndarray:
    """NHWC conv with HWIO kernel (VGG uses 3x3 SAME stride 1).

    ``compute_dtype`` (e.g. bfloat16) casts the operands for the MXU while
    accumulating in f32 (preferred_element_type) — the TPU fast path."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if compute_dtype is not None else None,
    )


def conv2d_input_vjp(x_shape, kernel, cotangent, stride: int = 1, padding: str = "SAME",
                     compute_dtype=None):
    """Gradient of conv2d wrt its input for a given cotangent (transposed conv)."""
    if compute_dtype is not None:
        primal = jnp.zeros(x_shape, dtype=compute_dtype)
        _, vjp = jax.vjp(
            lambda x: conv2d(x, kernel.astype(compute_dtype), stride, padding), primal
        )
        (dx,) = vjp(cotangent.astype(compute_dtype))
        return dx.astype(jnp.float32)
    primal = jnp.zeros(x_shape, dtype=cotangent.dtype)
    _, vjp = jax.vjp(lambda x: conv2d(x, kernel, stride, padding), primal)
    (dx,) = vjp(cotangent)
    return dx


def lrp_conv_epsilon(
    r: jnp.ndarray,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    eps: float = EPS_KERAS,
    stride: int = 1,
    padding: str = "SAME",
) -> jnp.ndarray:
    """EpsilonRule for a conv layer: rel = x * conv^T(r / stab(z), W).

    ``bias=None`` reproduces EpsilonProxyRule(bias=False) of PresetA's dense
    branch (relevance_analyzer.py:706-712); pass the bias for bias=True rules.
    """
    z = conv2d(x, kernel, stride, padding)
    if bias is not None:
        z = z + bias
    s = r / sign_stabilizer(z, eps)
    return x * conv2d_input_vjp(x.shape, kernel, s, stride, padding)


def lrp_conv_alpha_beta(
    r: jnp.ndarray,
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    alpha: float = 1.0,
    beta: float = 0.0,
    stride: int = 1,
    padding: str = "SAME",
    factor: float = EPS_KERAS,
    compute_dtype=None,
    input_nonneg: bool = False,
) -> jnp.ndarray:
    """AlphaBetaRule for a conv layer (alpha - beta = 1).

    activator  = x+*W+ + x-*W- contributions, inhibitor = x+*W- + x-*W+;
    result = alpha*activator - beta*inhibitor (skipped when beta == 0,
    as in the reference, relevance_rule.py:313-322).

    ``compute_dtype=bfloat16`` runs the four convs on the MXU fast path with
    f32 accumulation; the divide/re-weighting stays f32. The z+ denominators
    are sums of same-sign terms, so bf16 relative error stays ~1e-2 with no
    catastrophic cancellation.

    ``input_nonneg=True`` declares x >= 0 (true for every post-ReLU VGG
    activation, i.e. all layers but the input image): x- is identically zero,
    so the x-/W pair of convs — exactly half the FLOPs — is elided. XLA
    cannot infer this sign invariant itself.
    """
    kp = kernel * (kernel >= 0)
    kn = kernel * (kernel < 0)
    bp = bn = None
    if bias is not None:
        bp = bias * (bias >= 0)
        bn = bias * (bias < 0)
    xp = x if input_nonneg else jnp.maximum(x, 0)
    xn = None if input_nonneg else jnp.minimum(x, 0)

    def f(k1, b1, k2, b2):
        z1 = conv2d(xp, k1, stride, padding, compute_dtype)
        if b1 is not None:
            z1 = z1 + b1
        if xn is not None:
            z2 = conv2d(xn, k2, stride, padding, compute_dtype)
            if b2 is not None:
                z2 = z2 + b2
            z1 = z1 + z2
        elif b2 is not None:
            z1 = z1 + b2
        s = safe_divide(r, z1, factor)
        t1 = xp * conv2d_input_vjp(x.shape, k1, s, stride, padding, compute_dtype)
        if xn is not None:
            t1 = t1 + xn * conv2d_input_vjp(x.shape, k2, s, stride, padding, compute_dtype)
        return t1

    activator = f(kp, bp, kn, bn)
    if beta:
        inhibitor = f(kn, bn, kp, bp)
        return alpha * activator - beta * inhibitor
    return alpha * activator if alpha != 1.0 else activator


def lrp_conv_wsquare(r: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                     stride: int = 1, padding: str = "SAME", factor: float = EPS_KERAS) -> jnp.ndarray:
    """WSquareRule (relevance_rule.py:156-183): weights squared, input ones —
    relevance redistributes by squared-weight share, input-independent."""
    k2 = kernel * kernel
    ones = jnp.ones_like(x)
    z = conv2d(ones, k2, stride, padding)
    s = safe_divide(r, z, factor)
    return conv2d_input_vjp(x.shape, k2, s, stride, padding)


def lrp_conv_flat(r: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                  stride: int = 1, padding: str = "SAME", factor: float = EPS_KERAS) -> jnp.ndarray:
    """FlatRule (relevance_rule.py:186-211): all weights one — relevance
    spreads uniformly over the receptive field (WSquare with ones kernel)."""
    k1 = jnp.ones_like(kernel)
    ones = jnp.ones_like(x)
    z = conv2d(ones, k1, stride, padding)
    s = safe_divide(r, z, factor)
    return conv2d_input_vjp(x.shape, k1, s, stride, padding)


def lrp_conv_zplus(r: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray | None = None, stride: int = 1, padding: str = "SAME") -> jnp.ndarray:
    """ZPlusRule == AlphaBetaRule(alpha=1, beta=0) (relevance_rule.py:445-462)."""
    return lrp_conv_alpha_beta(r, x, kernel, bias, alpha=1.0, beta=0.0, stride=stride, padding=padding)


def lrp_conv_bounded(r: jnp.ndarray, x: jnp.ndarray, kernel: jnp.ndarray,
                     low: float, high: float, stride: int = 1, padding: str = "SAME",
                     factor: float = EPS_KERAS) -> jnp.ndarray:
    """BoundedRule / zB input-layer rule (relevance_rule.py:372-441):
    z = conv(x,W) - conv(lo,W+) - conv(hi,W-); rel = x*c - lo*c+ - hi*c-
    with c = conv^T(r/z, .). ``low``/``high`` are the input value bounds
    (e.g. the mean-subtracted pixel range)."""
    kp = kernel * (kernel >= 0)
    kn = kernel * (kernel < 0)
    lo = jnp.full_like(x, low)
    hi = jnp.full_like(x, high)
    z = conv2d(x, kernel, stride, padding) - conv2d(lo, kp, stride, padding) - conv2d(hi, kn, stride, padding)
    s = safe_divide(r, z, factor)
    c = conv2d_input_vjp(x.shape, kernel, s, stride, padding)
    cp = conv2d_input_vjp(x.shape, kp, s, stride, padding)
    cn = conv2d_input_vjp(x.shape, kn, s, stride, padding)
    return x * c - lo * cp - hi * cn


def deeplift_conv_linear(r: jnp.ndarray, x: jnp.ndarray, x_ref: jnp.ndarray,
                         z: jnp.ndarray, z_ref: jnp.ndarray, kernel: jnp.ndarray,
                         stride: int = 1, padding: str = "SAME",
                         approximate: bool = True, factor: float = EPS_KERAS) -> jnp.ndarray:
    """DeepLIFT LinearRule for a bias-free conv (deeplift.py:77-116):
    divide incoming relevance by the output delta (SafeDivide), backprop
    through the conv VJP, re-weight by the input delta; where |dx| < eps
    fall back to the plain gradient (``approximate`` = the reference's
    approximate_gradient=True default)."""
    dx = x - x_ref
    dz = z - z_ref
    s = safe_divide(r, dz, factor)
    contrib = dx * conv2d_input_vjp(x.shape, kernel, s, stride, padding)
    if not approximate:
        return contrib
    grad = conv2d_input_vjp(x.shape, kernel, r, stride, padding)
    return jnp.where(jnp.abs(dx) < factor, grad, contrib)


def deeplift_relu_rescale(r: jnp.ndarray, x: jnp.ndarray, x_ref: jnp.ndarray,
                          approximate: bool = True, factor: float = EPS_KERAS) -> jnp.ndarray:
    """DeepLIFT RescaleRule for a standalone relu Activation layer
    (deeplift.py:44-73): relevance scales by dy/dx, falling back to the
    relu gradient where |dx| < eps. The non-approximate branch reproduces
    the reference's unstabilized ``a*(dy/(dx+eps))`` verbatim (deeplift.py:
    50-52) — including its blow-up when dx ~= -eps; that is the reference's
    behavior, not a deviation."""
    dx = x - x_ref
    dy = jax.nn.relu(x) - jax.nn.relu(x_ref)
    if not approximate:
        return r * dy / (dx + factor)
    resc = r * dy / jnp.where(jnp.abs(dx) < factor, 1.0, dx)
    grad = jnp.where(x > 0, r, 0.0)
    return jnp.where(jnp.abs(dx) < factor, grad, resc)


def maxpool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pool, NHWC.

    For the non-overlapping case (window == stride, dims divisible — every
    VGG pool) this is a reshape + reduce-max: its autodiff VJP is an
    elementwise tie-splitting mask, whereas ``reduce_window``'s VJP lowers to
    ``select_and_scatter``, which executes catastrophically slowly on TPU
    (~100x; measured on v5e). Falls back to reduce_window otherwise."""
    B, H, W, C = x.shape
    if window == stride and H % window == 0 and W % window == 0:
        xr = x.reshape(B, H // window, window, W // window, window, C)
        return xr.max(axis=(2, 4))
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def lrp_maxpool_wta(r: jnp.ndarray, x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Winner-take-all relevance redistribution = gradient of max-pool with
    cotangent r (the LRP default for MaxPooling, relevance_analyzer.py:472).
    Ties split the relevance equally (jax reduce-max VJP semantics)."""
    _, vjp = jax.vjp(partial(maxpool2d, window=window, stride=stride), x)
    (dx,) = vjp(r)
    return dx


def avgpool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    B, H, W, C = x.shape
    if window == stride and H % window == 0 and W % window == 0:
        xr = x.reshape(B, H // window, window, W // window, window, C)
        return xr.mean(axis=(2, 4))
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / float(window * window)


def lrp_avgpool(r: jnp.ndarray, x: jnp.ndarray, window: int = 2, stride: int = 2, eps: float = EPS_KERAS) -> jnp.ndarray:
    """AveragePoolingReverseLayer: treat the pool as a linear layer and apply
    the z-rule (relevance_analyzer.py:262-291): rel = x * grad(sum-pool)(r/stab(z))/n."""
    z = avgpool2d(x, window, stride)
    s = r / sign_stabilizer(z, eps)
    _, vjp = jax.vjp(partial(avgpool2d, window=window, stride=stride), x)
    (dx,) = vjp(s)
    return x * dx


def lrp_maxpool_overlapping_wta(r: jnp.ndarray, x: jnp.ndarray, window: int = 3,
                                stride: int = 2, padding: str = "VALID") -> jnp.ndarray:
    """Winner-take-all relevance for OVERLAPPING max pools without
    ``select_and_scatter`` (which executes ~100x below peak on TPU).

    Tie-splitting semantics matching jax's reduce-max VJP: each output's
    relevance divides equally among the window entries equal to the max, and
    an input sums contributions from every window covering it. Implemented as
    window*window strided-slice taps — pure VPU elementwise work.

    VALID padding only (the resnet stem / inception reduction pools)."""
    if padding != "VALID":
        raise NotImplementedError("overlapping WTA implemented for VALID padding")
    B, H, W, C = x.shape
    Ho = (H - window) // stride + 1
    Wo = (W - window) // stride + 1
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, window, window, 1), (1, stride, stride, 1), padding)

    def tap(arr, dy, dx):
        """arr slice aligned so tap(o) = arr[stride*o + d] for all outputs."""
        return jax.lax.slice(
            arr, (0, dy, dx, 0),
            (B, dy + (Ho - 1) * stride + 1, dx + (Wo - 1) * stride + 1, C),
            (1, stride, stride, 1),
        )

    # ties per output: count of window entries equal to the max
    ties = jnp.zeros_like(y)
    for dy in range(window):
        for dx in range(window):
            ties = ties + (tap(x, dy, dx) == y).astype(y.dtype)
    r_scaled = r / ties

    # scatter back: out[p] += (x[p] == y[o]) * r_scaled[o] for each covering o
    out = jnp.zeros_like(x)
    for dy in range(window):
        for dx in range(window):
            contrib = jnp.where(tap(x, dy, dx) == y, r_scaled, 0.0)
            # inverse of tap: place contrib at input positions stride*o + d
            pad_cfg = [(0, 0, 0),
                       (dy, H - (dy + (Ho - 1) * stride + 1), stride - 1),
                       (dx, W - (dx + (Wo - 1) * stride + 1), stride - 1),
                       (0, 0, 0)]
            out = out + jax.lax.pad(contrib, jnp.array(0.0, contrib.dtype), pad_cfg)
    return out
