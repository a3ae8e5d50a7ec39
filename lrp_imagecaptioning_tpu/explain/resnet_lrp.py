"""Rule-based LRP through ResNet (BatchNorm + residual Add reverse rules).

Implements the vendored iNNvestigate special reverse layers the VGG path
never needs (relevance_analyzer.py:197-316):

* BatchNorm:  Rin = x * (y - beta) * R / stab((x - mu) * y)
  — BN decomposes into subtract / scale / add; the scale is LRP-transparent,
  the mean-shift and beta-shift reweight (BatchNormalizationReverseLayer).
* Add:        Rin_i = x_i * (R / stab(sum_j x_j))
  — relevance splits proportionally to contributions (AddReverseLayer).
* Conv:       alpha1beta0 (PresetA), bias-free in resnet.
* relu passes relevance unchanged; the overlapping 3x3/2 stem max pool
  reverses winner-take-all via its VJP (correctness-grade: overlapping
  reduce_window VJP is slow on TPU — this path is for analysis, not the
  benchmark loop).

This EXCEEDS the reference's practical surface: its explainers hardcode
VGG/Inception grids and cannot explain resnet captioners at all
(explainers.py:236-241).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.resnet import BN_EPS, _stages
from ..ops.lrp_conv import lrp_conv_alpha_beta
from ..ops.lrp_core import EPS_KERAS, safe_divide, sign_stabilizer

# canonical stabilizer (sign(0) = +1) — one definition for every LRP rule
_sign_stab = sign_stabilizer


def lrp_bn(r, x, y, mean, beta, eps=EPS_KERAS):
    """BatchNormalizationReverseLayer.apply (relevance_analyzer.py:239-256)."""
    num = x * (y - beta) * r
    den = _sign_stab((x - mean) * y, eps)
    return safe_divide(num, den, eps)


def lrp_add(r, xs, eps=EPS_KERAS):
    """AddReverseLayer.apply: proportional split over the summands."""
    z = sum(xs)
    s = safe_divide(r, _sign_stab(z, eps), eps)
    return [x * s for x in xs]


def _maxpool_3x3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _lrp_maxpool_3x3s2(r, x):
    # strided-tap WTA (ops/lrp_conv.py): exact VJP semantics without the
    # select_and_scatter slow path
    from ..ops.lrp_conv import lrp_maxpool_overlapping_wta

    return lrp_maxpool_overlapping_wta(r, x, 3, 2)


def _forward_cached(params, image, depth):
    """Forward pass caching every tensor the backward needs.

    cache[name] = {'in': conv input, 'z': conv out (pre-BN), 'bn': BN out}
    plus structural tensors keyed by stage/block."""
    from ..models.resnet import _bn, _conv

    cache = {}

    def conv_bn(name, bn_name, x, stride, padding, relu=True):
        z = _conv(params[name], x, stride, padding)
        y = _bn(params[bn_name], z)
        cache[name] = {"in": x, "z": z, "bn": y}
        return jax.nn.relu(y) if relu else y

    x = jnp.pad(image, ((0, 0), (3, 3), (3, 3), (0, 0)))
    cache["_stem_pad_in"] = image
    x = conv_bn("conv1", "bn_conv1", x, 2, "VALID")
    cache["_stem_pool_in"] = x
    x = _maxpool_3x3s2(x)

    for stage, blocks, _, stage_stride in _stages(depth):
        for bi, block in enumerate(blocks):
            s = stage_stride if bi == 0 else 1
            base = f"res{stage}{block}_branch"
            bn = f"bn{stage}{block}_branch"
            cache[f"_blockin_{stage}{block}"] = x
            if bi == 0:
                shortcut = conv_bn(base + "1", bn + "1", x, s, "VALID", relu=False)
            else:
                shortcut = x
            y = conv_bn(base + "2a", bn + "2a", x, s, "VALID")
            y = conv_bn(base + "2b", bn + "2b", y, 1, "SAME")
            y = conv_bn(base + "2c", bn + "2c", y, 1, "VALID", relu=False)
            cache[f"_add_{stage}{block}"] = (y, shortcut)
            x = jax.nn.relu(y + shortcut)
    return x, cache


def _rev_conv_bn(params, cache, name, bn_name, r, stride, padding, nonneg):
    """Reverse relu (identity) -> BN rule -> alpha1beta0 conv rule."""
    c = cache[name]
    p = params[bn_name]
    r = lrp_bn(r, c["z"], c["bn"], p["moving_mean"], p["beta"])
    return lrp_conv_alpha_beta(
        r, c["in"], params[name]["kernel"], None, alpha=1.0, beta=0.0,
        stride=stride, padding=padding, input_nonneg=nonneg,
    )


def _backward(params, cache, relevance_seed, depth):
    r = relevance_seed

    for stage, blocks, _, stage_stride in reversed(_stages(depth)):
        for bi, block in reversed(list(enumerate(blocks))):
            s = stage_stride if bi == 0 else 1
            base = f"res{stage}{block}_branch"
            bn = f"bn{stage}{block}_branch"
            y, shortcut = cache[f"_add_{stage}{block}"]
            r_branch, r_short = lrp_add(r, [y, shortcut])
            # main branch: 2c -> 2b -> 2a (inputs of 2b/2c are post-relu)
            r_branch = _rev_conv_bn(params, cache, base + "2c", bn + "2c", r_branch, 1, "VALID", True)
            r_branch = _rev_conv_bn(params, cache, base + "2b", bn + "2b", r_branch, 1, "SAME", True)
            block_in_nonneg = True  # every block input is post-relu/post-pool
            r_branch = _rev_conv_bn(params, cache, base + "2a", bn + "2a", r_branch, s, "VALID", block_in_nonneg)
            if bi == 0:
                r_short = _rev_conv_bn(params, cache, base + "1", bn + "1", r_short, s, "VALID", block_in_nonneg)
            r = r_branch + r_short

    # stem: maxpool WTA, then conv1+BN back through the zero-pad (crop)
    r = _lrp_maxpool_3x3s2(r, cache["_stem_pool_in"])
    r = _rev_conv_bn(params, cache, "conv1", "bn_conv1", r, 2, "VALID", False)
    return r[:, 3:-3, 3:-3, :]


def _backward_deep_taylor(params, cache, relevance_seed, depth):
    """DeepTaylor rule walk (reference: deeptaylor.py:52-137) on resnet.

    Keras resnet convs carry no fused activation (relu lives in separate
    Activation layers), so every kernel layer takes the WSquareRule branch
    (deeptaylor.py:62-67); BatchNorm is do_nothing (78-82); relu / Add /
    max-pool reverse via the gradient mapping (70-76, 83-98) — relu masks,
    Add passes the full relevance to both summands, pool is winner-take-all.
    """
    from ..ops.lrp_conv import lrp_conv_wsquare

    r = relevance_seed
    for stage, blocks, _, stage_stride in reversed(_stages(depth)):
        for bi, block in reversed(list(enumerate(blocks))):
            s = stage_stride if bi == 0 else 1
            base = f"res{stage}{block}_branch"
            y, shortcut = cache[f"_add_{stage}{block}"]
            r = jnp.where(y + shortcut > 0, r, 0.0)   # post-add relu: gradient
            r_branch = r                              # Add: gradient to both
            r_short = r
            r_branch = lrp_conv_wsquare(r_branch, cache[base + "2c"]["in"],
                                        params[base + "2c"]["kernel"], 1, "VALID")
            r_branch = jnp.where(cache[base + "2b"]["bn"] > 0, r_branch, 0.0)
            r_branch = lrp_conv_wsquare(r_branch, cache[base + "2b"]["in"],
                                        params[base + "2b"]["kernel"], 1, "SAME")
            r_branch = jnp.where(cache[base + "2a"]["bn"] > 0, r_branch, 0.0)
            r_branch = lrp_conv_wsquare(r_branch, cache[base + "2a"]["in"],
                                        params[base + "2a"]["kernel"], s, "VALID")
            if bi == 0:
                r_short = lrp_conv_wsquare(r_short, cache[base + "1"]["in"],
                                           params[base + "1"]["kernel"], s, "VALID")
            r = r_branch + r_short
    r = _lrp_maxpool_3x3s2(r, cache["_stem_pool_in"])
    r = jnp.where(cache["conv1"]["bn"] > 0, r, 0.0)
    r = lrp_conv_wsquare(r, cache["conv1"]["in"], params["conv1"]["kernel"], 2, "VALID")
    return r[:, 3:-3, 3:-3, :]


def _backward_deeplift(params, cache, cache_ref, relevance_seed, depth,
                       approximate=True):
    """DeepLIFT-rescale walk (reference: deeplift.py:120-197) on resnet.

    Kernel layers (the convs) take the LinearRule (deeplift.py:77-116):
    R/Δz through the conv VJP, re-weighted by Δx, with a plain-gradient
    fallback where |Δx| < eps. Separate relu Activation layers take the
    RescaleRule (deeplift.py:44-73): R·Δy/Δx with the same fallback. BN,
    Add, max-pool and the stem pad have neither kernel nor activation and
    reverse via the default gradient mapping.
    """
    from ..ops.lrp_conv import deeplift_conv_linear, deeplift_relu_rescale

    def conv_linear(r, name, stride, padding):
        c, cr = cache[name], cache_ref[name]
        return deeplift_conv_linear(r, c["in"], cr["in"], c["z"], cr["z"],
                                    params[name]["kernel"], stride, padding,
                                    approximate)

    def relu_rescale(r, x, x_ref):
        return deeplift_relu_rescale(r, x, x_ref, approximate)

    def bn_gradient(r, bn_name):
        p = params[bn_name]
        return r * (p["gamma"] * jax.lax.rsqrt(p["moving_var"] + BN_EPS))

    def rev_unit(r, name, bn_name, stride, padding, relu=True):
        if relu:
            r = relu_rescale(r, cache[name]["bn"], cache_ref[name]["bn"])
        r = bn_gradient(r, bn_name)
        return conv_linear(r, name, stride, padding)

    r = relevance_seed
    for stage, blocks, _, stage_stride in reversed(_stages(depth)):
        for bi, block in reversed(list(enumerate(blocks))):
            s = stage_stride if bi == 0 else 1
            base = f"res{stage}{block}_branch"
            bn = f"bn{stage}{block}_branch"
            y, shortcut = cache[f"_add_{stage}{block}"]
            y_ref, shortcut_ref = cache_ref[f"_add_{stage}{block}"]
            r = relu_rescale(r, y + shortcut, y_ref + shortcut_ref)
            r_branch = r                              # Add: gradient to both
            r_short = r
            r_branch = rev_unit(r_branch, base + "2c", bn + "2c", 1, "VALID", relu=False)
            r_branch = rev_unit(r_branch, base + "2b", bn + "2b", 1, "SAME")
            r_branch = rev_unit(r_branch, base + "2a", bn + "2a", s, "VALID")
            if bi == 0:
                r_short = rev_unit(r_short, base + "1", bn + "1", s, "VALID", relu=False)
            r = r_branch + r_short
    r = _lrp_maxpool_3x3s2(r, cache["_stem_pool_in"])
    r = relu_rescale(r, cache["conv1"]["bn"], cache_ref["conv1"]["bn"])
    r = bn_gradient(r, "bn_conv1")
    r = conv_linear(r, "conv1", 2, "VALID")
    return r[:, 3:-3, 3:-3, :]


def resnet_deep_taylor_wordbatched(params, image, relevance_seeds,
                                   depth: str = "resnet50"):
    """Per-word DeepTaylor sharing one forward: image (1, H, W, 3),
    seeds (W, H/32, W/32, 2048) -> (W, H, W, 3). The seed is clamped
    through a relu first (the reference's positive-output preparation,
    deeptaylor.py:144-153)."""
    _, cache = _forward_cached(params, image, depth)

    def one(seed):
        return _backward_deep_taylor(params, cache, jax.nn.relu(seed)[None], depth)[0]

    return jax.vmap(one)(relevance_seeds)


def resnet_deeplift_wordbatched(params, image, relevance_seeds,
                                depth: str = "resnet50", reference_inputs=0.0,
                                approximate_gradient: bool = True):
    """Per-word DeepLIFT sharing one actual + one reference forward
    (``reference_inputs`` scalar or image, default 0 — deeplift.py:123)."""
    ref = jnp.broadcast_to(jnp.asarray(reference_inputs, image.dtype), image.shape)
    _, cache = _forward_cached(params, image, depth)
    _, cache_ref = _forward_cached(params, ref, depth)

    def one(seed):
        return _backward_deeplift(params, cache, cache_ref, seed[None], depth,
                                  approximate_gradient)[0]

    return jax.vmap(one)(relevance_seeds)


def resnet_lrp_preset_a(params, image, relevance_seed, depth: str = "resnet50"):
    """PresetA-style LRP from the final conv5 relu back to the input image.

    image: (B, H, W, 3); relevance_seed: (B, H/32, W/32, 2048).
    Returns (B, H, W, 3)."""
    _, cache = _forward_cached(params, image, depth)
    return _backward(params, cache, relevance_seed, depth)


def resnet_lrp_wordbatched(params, image, relevance_seeds, depth: str = "resnet50"):
    """Per-word LRP sharing one forward: image (1, H, W, 3),
    seeds (W, H/32, W/32, 2048) -> (W, H, W, 3)."""
    _, cache = _forward_cached(params, image, depth)

    def one(seed):
        return _backward(params, cache, seed[None], depth)[0]

    return jax.vmap(one)(relevance_seeds)
