"""Unified analyzer registry — the ``create_analyzer`` equivalent.

The vendored iNNvestigate exposes every analyzer through a name registry
(reference: innvestigate/analyzer/__init__.py:35-99, ``analyzers`` dict +
``create_analyzer(name, model, **kwargs)``). This module provides the same
catalogue over this framework's functional analyzers: ``create_analyzer``
returns a callable ``(image, relevance_seed, **kw) -> attribution`` closed
over the encoder params.

Every reference registry name is covered:

* utility: ``input``, ``random`` (misc.py:33-64)
* gradient family: ``gradient``, ``gradient.baseline``, ``input_t_gradient``,
  ``deconvnet``, ``guided_backprop``, ``integrated_gradients``,
  ``smoothgrad`` (gradient_based.py) — ``gradient.baseline`` is numerically
  identical to ``gradient`` here because JAX autodiff *is* the built-in
  gradient (the reference keeps both only to cross-check its graph-reversal
  engine against ``tf.gradients``, gradient_based.py:52-100).
* relevance family: ``lrp.z``, ``lrp.z_IB``, ``lrp.epsilon``,
  ``lrp.epsilon_IB``, ``lrp.w_square``, ``lrp.flat``, ``lrp.alpha_beta``,
  ``lrp.alpha_2_beta_1(_IB)``, ``lrp.alpha_1_beta_0(_IB)``, ``lrp.z_plus``,
  ``lrp.z_plus_fast``, ``lrp.sequential_preset_a/b(_flat)``
  (relevance_analyzer.py:173-770).
* deep taylor: ``deep_taylor``, ``deep_taylor.bounded`` (deeptaylor.py).
* deeplift: ``deep_lift``; ``deep_lift.wrapper`` aliases the same rescale
  implementation (the reference's wrapper shells out to the external
  ``deeplift`` pip package with the same rescale rule, deeplift.py:257-366).
* pattern based: ``pattern.net``, ``pattern.attribution`` (pattern_based.py)
  — require ``patterns=`` from :func:`..explain.patterns.compute_vgg_patterns`.

Wrapper analyzers (reference: analyzer/wrapper.py) are provided as
combinators that lift any registry analyzer: :func:`augment_reduce`
(AugmentReduceBase), :func:`gaussian_smoother` (GaussianSmoother) and
:func:`path_integrator` (PathIntegrator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_apply_with_acts
from ..ops.lrp_conv import (
    lrp_conv_flat,
    lrp_conv_wsquare,
)
from .cnn_lrp import (
    _vgg_lrp_backward,
    vgg_deep_taylor,
    vgg_deep_taylor_bounded,
    vgg_lrp_epsilon,
    vgg_lrp_preset_a,
    vgg_lrp_preset_a_flat,
    vgg_lrp_preset_b,
    vgg_lrp_preset_b_flat,
)
from .cnn_deeplift import vgg_deeplift
from .cnn_gradient import (
    vgg_deconvnet,
    vgg_gradient,
    vgg_guided_backprop,
    vgg_input_times_gradient,
    vgg_integrated_gradients,
    vgg_smoothgrad,
)
from .patterns import vgg_pattern_attribution, vgg_patternnet

# K.epsilon(): the ZRule's SafeDivide fuzz and LRPEpsilon's default epsilon
# (relevance_rule.py:74-98, relevance_analyzer.py:438-450).
_K_EPSILON = 1e-7


def _vgg_lrp_generic(params, image, relevance_seed, conv_rule,
                     arch="vgg16", until="block5_conv3"):
    """One rule on every conv layer, WTA on pools — the single-rule LRP
    analyzers (LRPZ/LRPWSquare/LRPFlat/LRPAlphaBeta..., each of which sets
    ``rule=<X>`` for the whole model, relevance_analyzer.py:428-692)."""
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, conv_rule)


def vgg_lrp_alpha_beta(params, image, relevance_seed, alpha, beta, bias=True,
                       arch="vgg16", until="block5_conv3"):
    """LRPAlphaBeta with arbitrary (alpha, beta), alpha − beta = 1
    (relevance_analyzer.py:528-560; *_IB variants pass bias=False)."""
    from ..ops.lrp_conv import lrp_conv_alpha_beta

    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(
        r, x, k, b if bias else None, alpha=alpha, beta=beta, input_nonneg=nn)
    return _vgg_lrp_generic(params, image, relevance_seed, rule, arch, until)


def _analyzer_input(params, image, relevance_seed, **kw):
    """Input analyzer: the analysis is the input itself (misc.py:33-38)."""
    return image


def _analyzer_random(params, image, relevance_seed, rng_key=None, stddev=1.0, **kw):
    """Random analyzer: input-shaped gaussian noise (misc.py:41-52)."""
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    return stddev * jax.random.normal(key, image.shape, image.dtype)


def _eps_rule(bias: bool, eps: float):
    return lambda params, image, seed, **kw: vgg_lrp_epsilon(
        params, image, seed, eps=eps, bias=bias, **kw)


_REGISTRY = {
    # Utility.
    "input": _analyzer_input,
    "random": _analyzer_random,
    # Gradient based.
    "gradient": vgg_gradient,
    "gradient.baseline": vgg_gradient,
    "input_t_gradient": vgg_input_times_gradient,
    "deconvnet": vgg_deconvnet,
    "guided_backprop": vgg_guided_backprop,
    "integrated_gradients": vgg_integrated_gradients,
    "smoothgrad": vgg_smoothgrad,
    # Relevance based.
    "lrp.z": _eps_rule(bias=True, eps=_K_EPSILON),
    "lrp.z_IB": _eps_rule(bias=False, eps=_K_EPSILON),
    "lrp.epsilon": lambda params, image, seed, epsilon=_K_EPSILON, **kw:
        vgg_lrp_epsilon(params, image, seed, eps=epsilon, bias=True, **kw),
    "lrp.epsilon_IB": lambda params, image, seed, epsilon=_K_EPSILON, **kw:
        vgg_lrp_epsilon(params, image, seed, eps=epsilon, bias=False, **kw),
    "lrp.w_square": lambda params, image, seed, **kw: _vgg_lrp_generic(
        params, image, seed, lambda r, x, k, b, nn: lrp_conv_wsquare(r, x, k), **kw),
    "lrp.flat": lambda params, image, seed, **kw: _vgg_lrp_generic(
        params, image, seed, lambda r, x, k, b, nn: lrp_conv_flat(r, x, k), **kw),
    "lrp.alpha_beta": vgg_lrp_alpha_beta,
    "lrp.alpha_2_beta_1": functools.partial(vgg_lrp_alpha_beta, alpha=2.0, beta=1.0),
    "lrp.alpha_2_beta_1_IB": functools.partial(vgg_lrp_alpha_beta, alpha=2.0, beta=1.0, bias=False),
    "lrp.alpha_1_beta_0": functools.partial(vgg_lrp_alpha_beta, alpha=1.0, beta=0.0),
    "lrp.alpha_1_beta_0_IB": functools.partial(vgg_lrp_alpha_beta, alpha=1.0, beta=0.0, bias=False),
    # ZPlus == alpha1beta0 (relevance_rule.py:445-448); the "fast" variant is
    # the same rule computed with the positive-weights shortcut, which the
    # alpha-beta kernel already takes when beta == 0 and x >= 0.
    "lrp.z_plus": functools.partial(vgg_lrp_alpha_beta, alpha=1.0, beta=0.0),
    "lrp.z_plus_fast": functools.partial(vgg_lrp_alpha_beta, alpha=1.0, beta=0.0),
    "lrp.sequential_preset_a": vgg_lrp_preset_a,
    "lrp.sequential_preset_b": vgg_lrp_preset_b,
    "lrp.sequential_preset_a_flat": vgg_lrp_preset_a_flat,
    "lrp.sequential_preset_b_flat": vgg_lrp_preset_b_flat,
    # Deep Taylor.
    "deep_taylor": vgg_deep_taylor,
    "deep_taylor.bounded": vgg_deep_taylor_bounded,
    # DeepLIFT.
    "deep_lift": vgg_deeplift,
    "deep_lift.wrapper": vgg_deeplift,
    # Pattern based.
    "pattern.net": lambda params, image, seed, patterns=None, **kw:
        vgg_patternnet(params, patterns, image, seed, **kw),
    "pattern.attribution": lambda params, image, seed, patterns=None, **kw:
        vgg_pattern_attribution(params, patterns, image, seed, **kw),
}


def analyzer_names():
    return sorted(_REGISTRY)


def create_analyzer(name, params, **fixed_kwargs):
    """Reference-parity convenience interface (analyzer/__init__.py:88-99):
    address analyzers by name; returns ``analyze(image, relevance_seed,
    **kw)`` closed over ``params`` and ``fixed_kwargs``."""
    try:
        fn = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown analyzer {name!r}; available: {analyzer_names()}") from None

    def analyze(image, relevance_seed, **kwargs):
        return fn(params, image, relevance_seed, **{**fixed_kwargs, **kwargs})

    analyze.analyzer_name = name
    return analyze


# --- wrapper analyzers (reference: analyzer/wrapper.py) ---

def augment_reduce(analyze_fn, image, relevance_seed, augment_fn, n: int, reduce="mean"):
    """AugmentReduceBase (wrapper.py:78-166): run the sub-analyzer on ``n``
    augmented copies of the input and reduce the analyses over the copies.
    ``reduce``: "mean" | "sum" | "stack" (no reduction) | a callable applied
    to the (n, ...) stacked maps along axis 0."""
    maps = [analyze_fn(augment_fn(image, i), relevance_seed) for i in range(n)]
    stacked = jnp.stack(maps)
    if callable(reduce):
        return reduce(stacked, 0)
    if reduce == "mean":
        return stacked.mean(0)
    if reduce == "sum":
        return stacked.sum(0)
    if reduce == "stack":
        return stacked
    raise ValueError(f"reduce must be 'mean', 'sum', 'stack' or callable, got {reduce!r}")


def gaussian_smoother(analyze_fn, image, relevance_seed, rng_key,
                      noise_scale: float = 1.0, n: int = 16):
    """GaussianSmoother (wrapper.py: SmoothGrad generalized to any
    sub-analyzer): augment with N(0, noise_scale) noise, average."""
    keys = jax.random.split(rng_key, n)

    def aug(img, i):
        return img + noise_scale * jax.random.normal(keys[i], img.shape, img.dtype)

    return augment_reduce(analyze_fn, image, relevance_seed, aug, n)


def path_integrator(analyze_fn, image, relevance_seed, steps: int = 16,
                    reference_inputs=0.0):
    """PathIntegrator (wrapper.py: IntegratedGradients generalized): average
    the sub-analysis along the straight path from the reference input, then
    re-weight by (input − reference). Uses the same midpoint alpha grid as
    vgg_integrated_gradients so PathIntegrator(gradient) == IntegratedGradients
    exactly."""
    ref = jnp.broadcast_to(jnp.asarray(reference_inputs, image.dtype), image.shape)
    alphas = (jnp.arange(steps, dtype=image.dtype) + 0.5) / steps
    maps = [analyze_fn(ref + a * (image - ref), relevance_seed) for a in alphas]
    return (image - ref) * jnp.stack(maps).mean(0)
