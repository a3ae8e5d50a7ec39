"""DeepLIFT (rescale rule) over the VGG conv stack, TPU-native.

Equivalent of the vendored ``innvestigate/analyzer/deeplift.py`` analyzer
(reference: deeplift.py:44-255), rebuilt as one jitted backward walk instead
of a reversed Keras graph:

* Reference activations are a second forward pass on ``reference_inputs``
  (default 0, matching ``DeepLIFT.__init__`` deeplift.py:123) with every
  op's input cached — the JAX analogue of ``_create_reference_activations``
  (deeplift.py:135-172).
* Kernel layers (conv+bias+relu units here) use the **LinearRule**
  (deeplift.py:77-116): divide incoming relevance by the output difference
  Δy, backpropagate through the layer's VJP at the *actual* input, re-weight
  by the input difference Δx; where |Δx| < eps fall back to the plain
  gradient (``approximate_gradient=True`` default, deeplift.py:78-86).
  NOTE the unit boundary is deliberate: the reference assigns rules per
  KERAS LAYER (deeplift.py:180-193 — ``contains_kernel`` → LinearRule), and
  Keras VGG16 convs carry a FUSED relu, so the reference's LinearRule there
  divides by the post-relu Δy and its GradientWRT runs through the relu —
  reproduced here exactly. Encoders whose convs have SEPARATE Activation
  layers (resnet/inception) instead get RescaleRule on the relu and
  LinearRule on the bare conv (see resnet_lrp/inception_lrp and
  ops/lrp_conv.deeplift_conv_linear) — that per-encoder difference is the
  reference's own layer-structure-dependent behavior, not a deviation.
* Layers without kernels (maxpool) fall to the default gradient reverse —
  winner-take-all at the actual input, as in the reference's
  ``_default_reverse_mapping``.
* The head seed is the caller's explicit relevance tensor: the reference's
  ``_head_mapping`` (deeplift.py:217-218) seeds with (output − output_ref);
  this framework's seeded 'replace' design (see cnn_lrp.py) makes the seed
  an argument so decoder relevance can be injected at the tapped layer.
  :func:`vgg_deeplift_standalone` reproduces the standalone analyzer.

``approximate_gradient=False`` reproduces the reference's alternative branch:
``a·(Δy/(Δx+eps))`` for activations and plain Δx re-weighting for kernels
(deeplift.py:50-52, 83-86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_apply_with_acts, vgg_layers
from ..ops.lrp_conv import conv2d, lrp_maxpool_wta
from ..ops.lrp_core import EPS_KERAS, safe_divide

# K.epsilon() — the Keras fuzz factor used by the reference's switch and
# SafeDivide (deeplift.py:49, ilayers.SafeDivide default); one constant
# shared with every other rule (ops.lrp_core.EPS_KERAS).
_K_EPSILON = EPS_KERAS


def _deeplift_backward(params, relevance_seed, ops, inputs, inputs_ref,
                       out, out_ref, approximate_gradient):
    # Per-op outputs = next op's input; final outputs are the tapped features.
    outputs = inputs[1:] + [out]
    outputs_ref = inputs_ref[1:] + [out_ref]

    r = relevance_seed
    for op, x, x_ref, y, y_ref in zip(
        reversed(ops), reversed(inputs), reversed(inputs_ref),
        reversed(outputs), reversed(outputs_ref)
    ):
        if op[0] == "conv":
            p = params[op[1]]
            dx = x - x_ref
            dy = y - y_ref

            def unit(inp):
                return jax.nn.relu(conv2d(inp, p["kernel"]) + p["bias"])

            _, vjp = jax.vjp(unit, x)
            # LinearRule: R/Δy → VJP at actual input → ×Δx (deeplift.py:98-109)
            contrib = dx * vjp(safe_divide(r, dy, factor=_K_EPSILON))[0]
            if approximate_gradient:
                grad = vjp(r)[0]
                r = jnp.where(jnp.abs(dx) < _K_EPSILON, grad, contrib)
            else:
                r = contrib
        else:
            # No kernel, no activation → default gradient reverse (WTA).
            r = lrp_maxpool_wta(r, x)
    return r


def vgg_deeplift(params, image, relevance_seed, arch="vgg16", until="block5_conv3",
                 reference_inputs=0.0, approximate_gradient=True):
    """DeepLIFT-rescale attribution, seeded at the tapped feature grid.

    image: (B, H, W, 3) preprocessed; relevance_seed: (B, h, w, C) at
    ``until``; reference_inputs: scalar or (B, H, W, 3) baseline image.
    Returns input-space attribution (B, H, W, 3).
    """
    ref_img = jnp.broadcast_to(jnp.asarray(reference_inputs, image.dtype), image.shape)
    out, inputs = vgg_apply_with_acts(params, image, arch, until)
    out_ref, inputs_ref = vgg_apply_with_acts(params, ref_img, arch, until)
    return _deeplift_backward(params, relevance_seed, vgg_layers(arch, until),
                              inputs, inputs_ref, out, out_ref, approximate_gradient)


def vgg_deeplift_standalone(params, image, arch="vgg16", until="block5_conv3",
                            reference_inputs=0.0, approximate_gradient=True):
    """The reference's standalone head: seed = features − reference features
    (``_head_mapping``, deeplift.py:217-218). Shares one pair of forward
    passes between the seed and the backward walk."""
    ref_img = jnp.broadcast_to(jnp.asarray(reference_inputs, image.dtype), image.shape)
    out, inputs = vgg_apply_with_acts(params, image, arch, until)
    out_ref, inputs_ref = vgg_apply_with_acts(params, ref_img, arch, until)
    return _deeplift_backward(params, out - out_ref, vgg_layers(arch, until),
                              inputs, inputs_ref, out, out_ref, approximate_gradient)
