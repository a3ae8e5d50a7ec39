"""Gradient-family CNN explanations sharing the same engine surface.

Equivalents of innvestigate/analyzer/gradient_based.py with
neuron_selection_mode='replace':

* ``vgg_gradient``        — Gradient (gradient_based.py:52-100): d(features)/
  d(image) contracted with the relevance seed == one VJP.
* input*gradient          — InputTimesGradient: gradient * input image.
* ``vgg_guided_backprop`` — GuidedBackprop (gradient_based.py:228-265): the
  backward relu additionally zeroes negative *upstream* gradients; realized
  with a custom-VJP relu.
* ``grad_cam`` / guided-GradCAM — explainers.py:930-949: CAM = relu of
  grad-mean-weighted 14x14 feature map, pyramid-expanded x16; Guided-GradCAM
  multiplies the guided-backprop map by the CAM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_layers
from ..ops.lrp_conv import conv2d, maxpool2d


@jax.custom_vjp
def _guided_relu(x):
    return jax.nn.relu(x)


def _guided_relu_fwd(x):
    return jax.nn.relu(x), x


def _guided_relu_bwd(x, g):
    # guided backprop: pass gradient only where input > 0 AND gradient > 0
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


_guided_relu.defvjp(_guided_relu_fwd, _guided_relu_bwd)


def _vgg_forward(params, x, arch, until, relu_fn):
    for op in vgg_layers(arch, until):
        if op[0] == "conv":
            p = params[op[1]]
            x = relu_fn(conv2d(x, p["kernel"]) + p["bias"])
        else:
            x = maxpool2d(x)
    return x


def vgg_gradient(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """d(sum(features * seed))/d(image) — the 'replace'-mode Gradient analyzer."""
    def f(img):
        return _vgg_forward(params, img, arch, until, jax.nn.relu)

    _, vjp = jax.vjp(f, image)
    (grad,) = vjp(relevance_seed)
    return grad


def vgg_input_times_gradient(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    return image * vgg_gradient(params, image, relevance_seed, arch, until)


def vgg_guided_backprop(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    def f(img):
        return _vgg_forward(params, img, arch, until, _guided_relu)

    _, vjp = jax.vjp(f, image)
    (grad,) = vjp(relevance_seed)
    return grad


@jax.custom_vjp
def _deconv_relu(x):
    return jax.nn.relu(x)


def _deconv_relu_fwd(x):
    return jax.nn.relu(x), None


def _deconv_relu_bwd(_, g):
    # deconvnet: relu applied to the BACKPROPAGATED signal only, ignoring the
    # forward input sign (gradient_based.py:171-216)
    return (jnp.maximum(g, 0.0),)


_deconv_relu.defvjp(_deconv_relu_fwd, _deconv_relu_bwd)


def vgg_deconvnet(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """Deconvnet analyzer: relu on the backward signal (gradient_based.py:171-216)."""
    def f(img):
        return _vgg_forward(params, img, arch, until, _deconv_relu)

    _, vjp = jax.vjp(f, image)
    (grad,) = vjp(relevance_seed)
    return grad


def vgg_integrated_gradients(params, image, relevance_seed, arch="vgg16", until="block5_conv3",
                             steps: int = 16, baseline=None):
    """IntegratedGradients (gradient_based.py:269-299 via PathIntegrator,
    wrapper.py): mean gradient along the straight path from baseline to the
    image, times (image - baseline)."""
    if baseline is None:
        baseline = jnp.zeros_like(image)

    def grad_at(alpha):
        point = baseline + alpha * (image - baseline)
        return vgg_gradient(params, point, relevance_seed, arch, until)

    alphas = (jnp.arange(steps, dtype=image.dtype) + 0.5) / steps
    grads = jax.lax.map(grad_at, alphas)          # (steps, ...) sequential: bounds memory
    return grads.mean(axis=0) * (image - baseline)


def vgg_smoothgrad(params, image, relevance_seed, rng_key, arch="vgg16", until="block5_conv3",
                   n: int = 16, noise_scale: float = 16.0):
    """SmoothGrad (gradient_based.py:302-319 via GaussianSmoother): gradient
    averaged over Gaussian-perturbed inputs; noise_scale in input units
    (the reference uses a fraction of the 255 input range)."""
    keys = jax.random.split(rng_key, n)

    def grad_at(key):
        noisy = image + noise_scale * jax.random.normal(key, image.shape, image.dtype)
        return vgg_gradient(params, noisy, relevance_seed, arch, until)

    return jax.lax.map(grad_at, keys).mean(axis=0)


def pyramid_expand(img: jnp.ndarray, upscale: int = 16, sigma: float = 20.0) -> jnp.ndarray:
    """skimage.transform.pyramid_expand replacement (skimage is unavailable):
    bilinear upsample x``upscale`` followed by a gaussian blur of the given
    sigma. img: (H, W) -> (H*upscale, W*upscale)."""
    h, w = img.shape
    out = jax.image.resize(img, (h * upscale, w * upscale), method="bilinear")
    # separable gaussian blur
    radius = int(4 * sigma + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kern = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    kern = kern / kern.sum()
    pad = radius
    padded = jnp.pad(out, ((pad, pad), (0, 0)), mode="reflect")
    out = jax.vmap(lambda col: jnp.convolve(col, kern, mode="valid"), in_axes=1, out_axes=1)(padded)
    padded = jnp.pad(out, ((0, 0), (pad, pad)), mode="reflect")
    out = jax.vmap(lambda row: jnp.convolve(row, kern, mode="valid"))(padded)
    return out


def grad_cam(feat_grid_hw: jnp.ndarray, grads_hw: jnp.ndarray, upscale: int = 16) -> jnp.ndarray:
    """GradCAM heatmap (explainers.py:938-949): channel weights = grad means,
    weighted feature sum, pyramid-expand, relu, normalize by max|.|.

    feat_grid_hw/grads_hw: (14, 14, D). Returns (224, 224)."""
    weights = grads_hw.mean(axis=(0, 1))                 # (D,)
    cam = jnp.einsum("hwd,d->hw", feat_grid_hw, weights)
    cam = pyramid_expand(cam, upscale=upscale, sigma=20.0)
    cam = jnp.maximum(cam, 0.0)
    return cam / (jnp.max(jnp.abs(cam)) + 1e-6)


def vgg_guided_gradcam(params, image, relevance_seed, feat_grid_hw, arch="vgg16", until="block5_conv3"):
    """Guided-GradCAM = guided-backprop map x CAM (explainers.py:925-935)."""
    guided = vgg_guided_backprop(params, image, relevance_seed, arch, until)  # (B,224,224,3)
    cam = grad_cam(feat_grid_hw, relevance_seed[0])                           # (224,224)
    return guided * cam[None, :, :, None]
