"""Rule-based LRP through InceptionV3 (PresetA semantics).

The reference DOES explain inception captioners (its explainers carry
mixed10/8x8-grid branches, explainers.py:236-241; LRPSequentialPresetA over
the inception image model). This module provides the equivalent: a reverse
walk over the declarative op list in models/inception.py applying

* conv (+BN +relu): BatchNorm reverse rule then alpha1beta0 (PresetA conv);
* max pool: winner-take-all (pool VJP);
* avg pool: z-rule (AveragePoolingReverseLayer semantics — divide by the
  pool output, pool-transpose, re-weight by the input);
* concat: relevance splits back onto the branches by channel slices.

Overlapping 3x3 pools reverse through reduce_window VJPs — correctness-grade
(slow on TPU), same caveat as the resnet path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.inception import _CHANNELS, _SPEC
from ..ops.lrp_conv import lrp_conv_alpha_beta
from ..ops.lrp_core import EPS_KERAS, safe_divide
from .resnet_lrp import _sign_stab, lrp_bn


def _pool(t, kind, w, s, p):
    if kind == "max":
        return jax.lax.reduce_window(t, -jnp.inf, jax.lax.max,
                                     (1, w, w, 1), (1, s, s, 1), p)
    summed = jax.lax.reduce_window(t, 0.0, jax.lax.add,
                                   (1, w, w, 1), (1, s, s, 1), p)
    ones = jnp.ones_like(t[..., :1])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                                   (1, w, w, 1), (1, s, s, 1), p)
    return summed / counts


def _forward_cached(params, image, until="mixed10"):
    """Forward caching per-op inputs (+ conv pre-BN z and BN out)."""
    from ..models.inception import BN_EPS

    tensors = {"input": image}
    cache = {}
    for op in _SPEC:
        if op[0] == "conv":
            _, name, src, f, (kh, kw), s, p = op
            t = tensors[src]
            z = jax.lax.conv_general_dilated(
                t, params[name]["kernel"], (s, s), p,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            pn = params[name]
            inv = jax.lax.rsqrt(pn["bn_var"] + BN_EPS)
            y = (z - pn["bn_mean"]) * inv * pn["bn_gamma"] + pn["bn_beta"]
            cache[name] = {"in": t, "z": z, "bn": y, "src": src}
            tensors[name] = jax.nn.relu(y)
        elif op[0] == "pool":
            _, name, src, kind, w, s, p = op
            cache[name] = {"in": tensors[src], "src": src, "kind": kind, "w": w, "s": s, "p": p}
            tensors[name] = _pool(tensors[src], kind, w, s, p)
        else:
            _, name, srcs = op
            cache[name] = {"srcs": srcs}
            tensors[name] = jnp.concatenate([tensors[s] for s in srcs], axis=-1)
        if op[1] == until:
            break
    return tensors, cache


def _backward(params, cache, relevance_seed, until="mixed10"):
    """PresetA relevance walk: BN reverse rule then alpha1beta0 per conv,
    WTA / z-rule per pool (shared skeleton: :func:`_walk_backward`)."""

    def conv_rev(r, op):
        _, name, src, f, (kh, kw), s, p = op
        c = cache[name]
        pn = params[name]
        r = lrp_bn(r, c["z"], c["bn"], pn["bn_mean"], pn["bn_beta"])
        # inputs are post-relu except the image itself
        return lrp_conv_alpha_beta(
            r, c["in"], pn["kernel"], None, alpha=1.0, beta=0.0,
            stride=s, padding=p, input_nonneg=(src != "input"),
        )

    def pool_rev(r, op):
        c = cache[op[1]]
        x = c["in"]
        if c["kind"] == "max":
            if c["p"] == "VALID":
                from ..ops.lrp_conv import lrp_maxpool_overlapping_wta

                return lrp_maxpool_overlapping_wta(r, x, c["w"], c["s"])
            _, vjp = jax.vjp(lambda t: _pool(t, "max", c["w"], c["s"], c["p"]), x)
            return vjp(r)[0]
        # AveragePoolingReverseLayer: z-rule through the linear pool
        z = _pool(x, "avg", c["w"], c["s"], c["p"])
        s_t = safe_divide(r, _sign_stab(z, EPS_KERAS), EPS_KERAS)
        _, vjp = jax.vjp(lambda t: _pool(t, "avg", c["w"], c["s"], c["p"]), x)
        return x * vjp(s_t)[0]

    return _walk_backward(relevance_seed, until, conv_rev, pool_rev)


def _walk_backward(relevance_seed, until, conv_rev, pool_rev):
    """Shared reverse walk over _SPEC: conv_rev(r, op) / pool_rev(r, op)
    return the source relevance; concat splits by channel slices."""
    rel = {until: relevance_seed}
    seen_until = False
    for op in reversed(_SPEC):
        name = op[1]
        if not seen_until:
            if name != until:
                continue
            seen_until = True
        r = rel.pop(name, None)
        if r is None:
            continue
        if op[0] == "conv":
            src = op[2]
            rel[src] = rel.get(src, 0.0) + conv_rev(r, op)
        elif op[0] == "pool":
            src = op[2]
            rel[src] = rel.get(src, 0.0) + pool_rev(r, op)
        else:
            off = 0
            for s_name in op[2]:
                ch = _CHANNELS[s_name]
                rel[s_name] = rel.get(s_name, 0.0) + r[..., off : off + ch]
                off += ch
    return rel["input"]


def _pool_gradient(cache):
    """Default/DeepTaylor gradient reverse for pools: WTA for max, plain
    VJP for average (deeptaylor.py:83-92; DeepLIFT default mapping)."""

    def rev(r, op):
        c = cache[op[1]]
        x = c["in"]
        if c["kind"] == "max" and c["p"] == "VALID":
            from ..ops.lrp_conv import lrp_maxpool_overlapping_wta

            return lrp_maxpool_overlapping_wta(r, x, c["w"], c["s"])
        _, vjp = jax.vjp(lambda t: _pool(t, c["kind"], c["w"], c["s"], c["p"]), x)
        return vjp(r)[0]

    return rev


def inception_deep_taylor_wordbatched(params, image, relevance_seeds,
                                      until: str = "mixed10"):
    """Per-word DeepTaylor (reference: deeptaylor.py:52-137) through
    InceptionV3. Keras inception convs carry no fused activation, so kernel
    layers take the WSquareRule branch (deeptaylor.py:62-67); BN is
    do_nothing (78-82); relu / pools / Concatenate reverse via the gradient
    mapping. Seeds are relu-clamped (positive-output prep, 144-153)."""
    from ..ops.lrp_conv import lrp_conv_wsquare

    _, cache = _forward_cached(params, image, until)
    pool_rev = _pool_gradient(cache)

    def conv_rev(r, op):
        _, name, _, _, _, s, p = op
        c = cache[name]
        r = jnp.where(c["bn"] > 0, r, 0.0)        # relu: gradient mask
        return lrp_conv_wsquare(r, c["in"], params[name]["kernel"], s, p)

    def one(seed):
        return _walk_backward(jax.nn.relu(seed)[None], until, conv_rev, pool_rev)[0]

    return jax.vmap(one)(relevance_seeds)


def inception_deeplift_wordbatched(params, image, relevance_seeds,
                                   until: str = "mixed10", reference_inputs=0.0,
                                   approximate_gradient: bool = True):
    """Per-word DeepLIFT-rescale (reference: deeplift.py:120-197) through
    InceptionV3: LinearRule on convs, RescaleRule on the separate relu
    Activations, default gradient on BN / pools / Concatenate. One actual and
    one reference forward shared across all word seeds."""
    from ..models.inception import BN_EPS
    from ..ops.lrp_conv import deeplift_conv_linear, deeplift_relu_rescale

    ref = jnp.broadcast_to(jnp.asarray(reference_inputs, image.dtype), image.shape)
    _, cache = _forward_cached(params, image, until)
    _, cache_ref = _forward_cached(params, ref, until)
    pool_rev = _pool_gradient(cache)

    def conv_rev(r, op):
        _, name, _, _, _, s, p = op
        c, cr = cache[name], cache_ref[name]
        pn = params[name]
        # relu Activation: RescaleRule (deeplift.py:44-73)
        r = deeplift_relu_rescale(r, c["bn"], cr["bn"], approximate_gradient)
        # BN: default gradient mapping (pure scale in inference mode)
        r = r * (pn["bn_gamma"] * jax.lax.rsqrt(pn["bn_var"] + BN_EPS))
        # conv: LinearRule (deeplift.py:77-116)
        return deeplift_conv_linear(r, c["in"], cr["in"], c["z"], cr["z"],
                                    pn["kernel"], s, p, approximate_gradient)

    def one(seed):
        return _walk_backward(seed[None], until, conv_rev, pool_rev)[0]

    return jax.vmap(one)(relevance_seeds)


def inception_lrp_preset_a(params, image, relevance_seed, until: str = "mixed10"):
    """image (B, 299, 299, 3), seed (B, 8, 8, 2048) -> (B, 299, 299, 3)."""
    _, cache = _forward_cached(params, image, until)
    return _backward(params, cache, relevance_seed, until)


def inception_lrp_wordbatched(params, image, relevance_seeds, until: str = "mixed10"):
    """Per-word LRP sharing one forward (image (1,...), seeds (W, 8, 8, 2048))."""
    _, cache = _forward_cached(params, image, until)

    def one(seed):
        return _backward(params, cache, seed[None], until)[0]

    return jax.vmap(one)(relevance_seeds)
