"""PatternNet / PatternAttribution over the VGG conv stack, TPU-native.

Equivalent of the vendored ``innvestigate/analyzer/pattern_based.py`` plus the
pattern estimator in ``innvestigate/tools/pattern.py``, rebuilt as explicit
JAX statistics + a jitted backward walk:

* **Pattern computation** (tools/pattern.py:220-306, ``LinearPattern``):
  per kernel layer, treating the conv as a dense map over im2col patches,
  accumulate E[x], E[y], E[xy] over (optionally masked) samples and form
      A = cov(x, y) / diag(Wᵀ · cov(x, y))        (pattern.py:277-305)
  with the reference's ``safe_divide(a, b) = a/(b + (b==0))``. The layer's
  *no-bias pre-activation* is used for y (``copy_layer_wo_activation(
  keep_bias=False)``, pattern.py:234-236). Masks select which samples count
  per output unit: ``linear`` → all ones (pattern.py:222-230), ``relu`` →
  post-activation > 0, ``relu.negative`` → post-activation ≤ 0
  (pattern.py:308-325). Statistics stream over batches exactly like the
  reference's ``RunningMeans`` layers (sums + counts, normalized at the end).

* **PatternNet backward** (pattern_based.py:68-126): per kernel layer,
  relevance passes the layer's ReLU gradient at the *actual* pre-activation,
  then backpropagates through a conv whose weights are replaced by the
  pattern A. Max-pooling reverses by winner-take-all gradient (no kernel →
  default gradient mapping).

* **PatternAttribution** (pattern_based.py:260-280): identical, with the
  backward conv weights A ⊙ W (``np.multiply(pattern, weight)``).

The reference forces ``reverse_project_bottleneck_layers=True``
(pattern_based.py:177-183) to keep values in ±1 through bottlenecks; the
tapped VGG stack is purely sequential (no fan-out bottlenecks), so there is
nothing to project — the walk here is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_layers
from ..ops.lrp_conv import conv2d, conv2d_input_vjp, maxpool2d, lrp_maxpool_wta

PATTERN_TYPES = ("linear", "relu", "relu.negative")


def _conv_patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """im2col for a 3x3 SAME stride-1 conv, flattened in (kh, kw, cin) order
    so that ``patches @ kernel.reshape(-1, cout) == conv2d(x, kernel)``.

    Only used as the spec/oracle in tests: materializing (B, H, W, 9*cin)
    costs ~115 MB per image at block1 shapes, so the statistics pass uses
    :func:`_patch_correlate` instead."""
    H, W = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, i:i + H, j:j + W, :] for i in range(3) for j in range(3)]
    return jnp.concatenate(parts, axis=-1)


def _patch_correlate(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """``_conv_patches_3x3(x).reshape(-1, 9*cin).T @ m.reshape(-1, cout)``
    WITHOUT materializing the patch tensor: one (cin, cout) contraction per
    3x3 tap over the padded input — peak memory is the padded x instead of
    a 9x im2col copy (the wide early VGG layers are where that matters)."""
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [jnp.einsum("bhwc,bhwo->co", xp[:, i:i + H, j:j + W, :], m)
             for i in range(3) for j in range(3)]
    return jnp.concatenate(parts, axis=0)           # (9*cin, cout)


def init_pattern_stats(params, arch="vgg16", until="block5_conv3"):
    """Zeroed running statistics, one entry per kernel layer
    (the ``RunningMeans`` state, pattern.py:246-266)."""
    stats = {}
    for op in vgg_layers(arch, until):
        if op[0] != "conv":
            continue
        _, name, cin, cout = op
        d = 9 * cin
        stats[name] = {
            "sum_x": jnp.zeros((d, cout)),     # Σ x·mask        (d per unit)
            "sum_xy": jnp.zeros((d, cout)),    # Σ x·y·mask
            "cnt": jnp.zeros((cout,)),         # Σ mask          (per unit)
            "sum_y": jnp.zeros((cout,)),       # Σ y over ALL samples
            "cnt_all": jnp.zeros(()),          # N
        }
    return stats


def update_pattern_stats(stats, params, images, pattern_type="linear",
                         arch="vgg16", until="block5_conv3"):
    """Accumulate one batch of images into the running statistics. Jittable;
    mirrors ``LinearPattern.get_stats_from_batch`` (pattern.py:232-275)."""
    if pattern_type not in PATTERN_TYPES:
        raise ValueError(f"pattern_type must be one of {PATTERN_TYPES}")
    new = dict(stats)
    x = images
    for op in vgg_layers(arch, until):
        if op[0] == "conv":
            _, name, cin, cout = op
            p = params[name]
            # y_nobias as a conv (== im2col patches @ W2D, pinned by
            # test_conv_patches_match_conv); the X.T-reductions as per-tap
            # correlations — no (N, 9*cin) patch tensor is materialized
            y_nobias = conv2d(x, p["kernel"])                    # (B,H,W,cout)
            post = jax.nn.relu(y_nobias + p["bias"])             # actual output
            if pattern_type == "linear":
                mask = jnp.ones_like(post)
            elif pattern_type == "relu":
                mask = (post > 0).astype(x.dtype)
            else:  # relu.negative
                mask = (post <= 0).astype(x.dtype)
            n_samples = y_nobias.shape[0] * y_nobias.shape[1] * y_nobias.shape[2]
            s = stats[name]
            new[name] = {
                "sum_x": s["sum_x"] + _patch_correlate(x, mask),
                "sum_xy": s["sum_xy"] + _patch_correlate(x, y_nobias * mask),
                "cnt": s["cnt"] + mask.sum(axis=(0, 1, 2)),
                "sum_y": s["sum_y"] + y_nobias.sum(axis=(0, 1, 2)),
                "cnt_all": s["cnt_all"] + jnp.asarray(n_samples, jnp.float32),
            }
            x = post
        else:
            x = maxpool2d(x)
    return new


def _safe_divide_ref(a, b):
    """The pattern computer's divide: a / (b + (b == 0)) (pattern.py:279-281)."""
    return a / (b + (b == 0))


def compute_patterns(stats, params, arch="vgg16", until="block5_conv3"):
    """Finalize statistics into per-layer patterns A with the reference
    formula (``LinearPattern.compute_pattern``, pattern.py:277-305)."""
    patterns = {}
    for op in vgg_layers(arch, until):
        if op[0] != "conv":
            continue
        _, name, cin, cout = op
        s = stats[name]
        w2d = params[name]["kernel"].reshape(-1, cout)
        mean_x = _safe_divide_ref(s["sum_x"], s["cnt"][None, :])
        mean_xy = _safe_divide_ref(s["sum_xy"], s["cnt"][None, :])
        mean_y = _safe_divide_ref(s["sum_y"], s["cnt_all"])
        cov_xy = mean_xy - mean_x * mean_y[None, :]
        w_cov_xy = jnp.einsum("do,do->o", w2d, cov_xy)           # diag(WᵀC)
        A = _safe_divide_ref(cov_xy, w_cov_xy[None, :])
        patterns[name] = A.reshape(params[name]["kernel"].shape)
    return patterns


def compute_vgg_patterns(params, image_batches, pattern_type="linear",
                         arch="vgg16", until="block5_conv3"):
    """Convenience one-shot: stream ``image_batches`` (iterable of
    (B,H,W,3) arrays) and return {layer_name: pattern} — the
    ``PatternComputer.compute`` equivalent (pattern.py:452-524)."""
    stats = init_pattern_stats(params, arch, until)
    step = jax.jit(
        lambda st, im: update_pattern_stats(st, params, im, pattern_type, arch, until)
    )
    for images in image_batches:
        stats = step(stats, jnp.asarray(images))
    return compute_patterns(stats, params, arch, until)


def _pattern_backward(params, patterns, image, relevance_seed, arch, until,
                      attribution: bool):
    from ..models.vgg import vgg_apply_with_acts

    ops = vgg_layers(arch, until)
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    r = relevance_seed
    for op, xin in zip(reversed(ops), reversed(inputs)):
        if op[0] == "conv":
            p = params[op[1]]
            pre = conv2d(xin, p["kernel"]) + p["bias"]
            r = r * (pre > 0)                 # ReLU grad at actual activation
            back_k = patterns[op[1]] * p["kernel"] if attribution else patterns[op[1]]
            r = conv2d_input_vjp(xin.shape, back_k, r)
        else:
            r = lrp_maxpool_wta(r, xin)
    return r


def vgg_patternnet(params, patterns, image, relevance_seed,
                   arch="vgg16", until="block5_conv3"):
    """PatternNet: backward signal estimation — gradient with kernels
    replaced by patterns (pattern_based.py:105-126)."""
    return _pattern_backward(params, patterns, image, relevance_seed, arch, until, False)


def vgg_pattern_attribution(params, patterns, image, relevance_seed,
                            arch="vgg16", until="block5_conv3"):
    """PatternAttribution: kernels replaced by pattern ⊙ weight
    (pattern_based.py:274-280)."""
    return _pattern_backward(params, patterns, image, relevance_seed, arch, until, True)
