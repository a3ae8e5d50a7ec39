"""CNN-side LRP: rule-tagged backward over the VGG conv stack.

Equivalent of the vendored iNNvestigate analyzers with the local
``neuron_selection_mode='replace'`` modification (innvestigate/analyzer/
base.py:330-401, utils/keras/graph.py:894-941): the relevance seed is an
arbitrary (14,14,512) tensor injected at the tapped layer (here: the decoder
LRP's feature-grid relevance) and propagated back to the input image.

Presets (relevance_analyzer.py:695-748):
* PresetA — epsilon(bias=False) on dense, alpha1beta0 on conv. The VGG
  sub-model up to block5_conv3 has no dense layers, so PresetA == alpha1beta0
  on every conv; maxpool reversed by winner-take-all gradient
  (relevance_analyzer.py:459-482); relu passes relevance unchanged (rules act
  on the layer without its activation).
* PresetB — epsilon(bias=True) on dense, alpha2beta1 on conv.

TPU design: one jitted program runs the whole backward; the engine vmaps a
leading ``words`` dim over the relevance seed while the forward activations
are computed once per image and broadcast — per-word heatmaps cost one batched
conv-transpose chain instead of the reference's per-word Keras predict calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_apply_with_acts, vgg_layers
from ..ops.lrp_conv import lrp_conv_alpha_beta, lrp_conv_epsilon, lrp_maxpool_wta


def _vgg_lrp_backward(params, inputs, relevance, arch, until, conv_rule,
                      input_rule=None):
    """Walk vgg_layers(...) in reverse applying ``conv_rule`` per conv and WTA
    per pool. ``inputs[i]`` is the forward input of op i.

    ``conv_rule(r, x, kernel, bias, nonneg)`` — every conv input except the
    image itself is post-ReLU, so rules exploiting the sign invariant get
    ``nonneg=True`` for all but the first layer. ``input_rule(r, x, kernel,
    bias)``, when given, replaces the rule on the input (image) layer — the
    *Flat / zB preset variants differ only there."""
    ops = vgg_layers(arch, until)
    r = relevance
    for idx, (op, x) in enumerate(zip(reversed(ops), reversed(inputs))):
        is_input_layer = idx == len(ops) - 1
        if op[0] == "conv":
            p = params[op[1]]
            if is_input_layer and input_rule is not None:
                r = input_rule(r, x, p["kernel"], p["bias"])
            else:
                r = conv_rule(r, x, p["kernel"], p["bias"], not is_input_layer)
        else:
            r = lrp_maxpool_wta(r, x)
    return r


def vgg_lrp_preset_a(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """LRPSequentialPresetA with epsilon=0.01 (the reference's EPS, model.py:23).

    image: (B, 224, 224, 3) preprocessed; relevance_seed: (B, 14, 14, 512)
    (or vmapped with an extra leading words dim on the seed only).
    Returns input-space relevance (B, 224, 224, 3).
    """
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(r, x, k, b, alpha=1.0, beta=0.0, input_nonneg=nn)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, rule)


def vgg_lrp_preset_b(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """LRPSequentialPresetB: alpha2beta1 on conv (relevance_analyzer.py:724-748)."""
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(r, x, k, b, alpha=2.0, beta=1.0, input_nonneg=nn)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, rule)


def vgg_lrp_epsilon(params, image, relevance_seed, arch="vgg16", until="block5_conv3", eps=0.01, bias=True):
    """Plain epsilon-rule LRP over the conv stack (LRPEpsilon analyzer)."""
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_epsilon(r, x, k, b if bias else None, eps=eps)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, rule)


def vgg_lrp_preset_a_debug(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """PresetA backward with per-layer relevance diagnostics.

    Numerical-sanitizing parity with iNNvestigate's opt-in debug tensors
    (reverse_check_finite / reverse_check_min_max_values, base.py:753-802):
    returns (relevance, stats) where stats[op_name] = dict(sum, min, max,
    nonfinite_count) for the relevance AFTER reversing that op, in backward
    order. Conservation drift and NaN origin are readable directly."""
    ops = vgg_layers(arch, until)
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    r = relevance_seed
    stats = {}
    for idx, (op, x) in enumerate(zip(reversed(ops), reversed(inputs))):
        is_input_layer = idx == len(ops) - 1
        if op[0] == "conv":
            p = params[op[1]]
            r = lrp_conv_alpha_beta(r, x, p["kernel"], p["bias"], alpha=1.0, beta=0.0,
                                    input_nonneg=not is_input_layer)
        else:
            r = lrp_maxpool_wta(r, x)
        stats[op[1]] = {
            "sum": r.sum(),
            "min": r.min(),
            "max": r.max(),
            "nonfinite_count": (~jnp.isfinite(r)).sum(),
        }
    return r, stats


def vgg_lrp_preset_a_flat(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """LRPSequentialPresetAFlat: PresetA with the FlatRule on the input layer
    (relevance_analyzer.py:755-762)."""
    from ..ops.lrp_conv import lrp_conv_flat

    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(r, x, k, b, alpha=1.0, beta=0.0, input_nonneg=nn)
    flat = lambda r, x, k, b: lrp_conv_flat(r, x, k)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, rule,
                             input_rule=flat)


def vgg_lrp_preset_b_flat(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """LRPSequentialPresetBFlat (relevance_analyzer.py:765-770)."""
    from ..ops.lrp_conv import lrp_conv_flat

    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(r, x, k, b, alpha=2.0, beta=1.0, input_nonneg=nn)
    flat = lambda r, x, k, b: lrp_conv_flat(r, x, k)
    return _vgg_lrp_backward(params, inputs, relevance_seed, arch, until, rule,
                             input_rule=flat)


def vgg_lrp_preset_a_imgword_batched(params, images, relevance_seeds,
                                     arch="vgg16", until="block5_conv3",
                                     compute_dtype=None, storage_dtype=None):
    """PresetA backward batched over images AND words in one program.

    images: (B, H, W, 3); relevance_seeds: (B, Wd, h, w, C) -> (B, Wd, H, W, 3).

    Same semantics as vmapping :func:`vgg_lrp_preset_a_wordbatched` over the
    image axis, but the nested vmap flattens the transposed convs to batch
    B*Wd while the word-independent z+ convs stay at batch B (vmap only
    batches ops whose operands carry the mapped axis).

    MEASURED on v5e at bench shapes (56 images x 20 words, bf16 storage):
    the flattened form is SLOWER than a lax.map of the per-image function —
    536 ms (map, conv batch 20) vs 798-856 ms (chunks of 2/4/8/14 images,
    conv batch 40-280). The MXU-underutilization hypothesis is falsified:
    the stage is HBM-bound, and flattening makes XLA re-broadcast the
    per-image x / z tensors across the word axis instead of keeping them
    resident per map step. The benchmark pipeline therefore keeps
    lax.map + vgg_lrp_preset_a_wordbatched; this function stays as
    parity-tested infrastructure (ulp-exact vs the per-image path) and as
    the record of the measurement.
    """
    if storage_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(storage_dtype), params)
        images = images.astype(storage_dtype)
        relevance_seeds = relevance_seeds.astype(storage_dtype)
        compute_dtype = None
    _, inputs = vgg_apply_with_acts(params, images, arch, until)

    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(
        r, x, k, b, alpha=1.0, beta=0.0, compute_dtype=compute_dtype, input_nonneg=nn
    )

    def per_img(inputs_i, seeds_i):
        def one(seed):
            return _vgg_lrp_backward(params, [x[None] for x in inputs_i],
                                     seed[None], arch, until, rule)[0]

        return jax.vmap(one)(seeds_i)

    out = jax.vmap(per_img)(inputs, relevance_seeds)
    return out.astype(jnp.float32) if storage_dtype is not None else out


def _upsample_window(w: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Nearest-neighbour window upsample (B, H, W, C) -> (B, H*k, W*k, C)."""
    B, H, Wd, C = w.shape
    out = jnp.broadcast_to(w[:, :, None, :, None, :], (B, H, window, Wd, window, C))
    return out.reshape(B, H * window, Wd * window, C)


def vgg_lrp_preset_a_wordbatched_fused(params, image, relevance_seeds,
                                       arch="vgg16", until="block5_conv3",
                                       storage_dtype=None):
    """PresetA word-batched backward with the per-word elementwise chain
    algebraically folded into word-independent factors.

    Identity used: each interior step computes r_prev = x ⊙ convT(k⁺, r/z)
    with x ≥ 0 (post-ReLU) and z, x word-independent. Writing r = m ⊙ w with
    m word-independent and w word-batched, the chain becomes

        a = safe_divide(m, z)          (once per image per layer)
        w' = convT(k⁺, w ⊙ a)          (per word: ONE multiply + one conv)
        m' = x

    and the pool WTA backward factors as m' = wta(m), w' = upsample(w)
    (the tie-splitting mask rides on m, the scale-free copy on w). Compared
    to the direct rule (divide + convT + re-weight per word) this removes a
    full elementwise pass over the activations per conv per word and makes
    the divides word-independent — the backward is HBM-bound at the wide
    early VGG layers, so the saved traffic is wall-clock.

    Semantics match vgg_lrp_preset_a_wordbatched up to float reassociation
    (r/z vs r·(m/z)); the input (signed) layer still runs the exact
    alpha1beta0 split rule. Returns (W, 224, 224, 3) f32.

    MEASURED on v5e at bench shapes (56 images x 20 words, bf16 storage):
    556.5 ms vs 561.0 ms direct — ~0.8%, within run-to-run noise. XLA's
    fusion emitters already fold the divide/re-weight chains into the conv
    reads/writes, so the hand-folded factorization buys almost nothing; the
    direct rule stays the default (same conclusion as the Pallas conv-LRP
    experiment, see ops/pallas_conv_lrp.py). Kept as parity-tested
    infrastructure: it documents the m/w factorization identity and gives a
    second independent implementation for cross-checking.
    """
    if storage_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(storage_dtype), params)
        image = image.astype(storage_dtype)
        relevance_seeds = relevance_seeds.astype(storage_dtype)
    from ..ops.lrp_conv import conv2d, conv2d_input_vjp
    from ..ops.lrp_core import safe_divide

    ops = vgg_layers(arch, until)
    _, inputs = vgg_apply_with_acts(params, image, arch, until)

    n_words = relevance_seeds.shape[0]
    w = relevance_seeds                                   # (W, h, w, C) word-batched
    m = jnp.ones((1,) + relevance_seeds.shape[1:], relevance_seeds.dtype)
    for idx, (op, x) in enumerate(zip(reversed(ops), reversed(inputs))):
        is_input_layer = idx == len(ops) - 1
        if op[0] == "conv":
            p = params[op[1]]
            kp = p["kernel"] * (p["kernel"] >= 0)
            if not is_input_layer:
                # z = conv(x, k+) + full bias, as in lrp_conv_alpha_beta's
                # activator branch with input_nonneg=True
                z = conv2d(x, kp) + p["bias"]
                a = safe_divide(m, z)
                s = w * a
                w = conv2d_input_vjp((n_words,) + x.shape[1:], kp, s)
                m = x
            else:
                # image layer: signed input -> exact alpha1beta0 split
                kn = p["kernel"] * (p["kernel"] < 0)
                bp = p["bias"] * (p["bias"] >= 0)
                bn = p["bias"] * (p["bias"] < 0)
                xp = jnp.maximum(x, 0)
                xn = jnp.minimum(x, 0)
                z = conv2d(xp, kp) + bp + conv2d(xn, kn) + bn
                s = safe_divide(m * w, z)
                r = xp * conv2d_input_vjp((n_words,) + x.shape[1:], kp, s) \
                    + xn * conv2d_input_vjp((n_words,) + x.shape[1:], kn, s)
                w, m = r, None
        else:
            m = lrp_maxpool_wta(m, x)
            w = _upsample_window(w)
    return w.astype(jnp.float32) if storage_dtype is not None else w


def vgg_deep_taylor(params, image, relevance_seed, arch="vgg16", until="block5_conv3"):
    """DeepTaylor decomposition (reference: innvestigate/analyzer/deeptaylor.py:38-153).

    Rule wiring per the reference's conditional mappings: kernel layers with
    ReLU -> Alpha1Beta0 (deeptaylor.py:56-61), max-pooling -> gradient/WTA
    (deeptaylor.py:85-89). Every conv in the tapped VGG stack carries a ReLU,
    so the walk is alpha1beta0 throughout — the WSquare branch for
    kernel-without-relu layers (deeptaylor.py:62-67) never fires here.

    The reference's ``_prepare_model`` clamps model outputs through a ReLU so
    only positive relevance enters the decomposition (deeptaylor.py:144-153);
    in this seeded design that is a relu on the seed itself.
    """
    seed = jax.nn.relu(relevance_seed)
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(r, x, k, b, alpha=1.0, beta=0.0, input_nonneg=nn)
    return _vgg_lrp_backward(params, inputs, seed, arch, until, rule)


def vgg_deep_taylor_bounded(params, image, relevance_seed, low, high,
                            arch="vgg16", until="block5_conv3"):
    """BoundedDeepTaylor: DeepTaylor with the Z^B (bounded) rule on the input
    layer (reference: deeptaylor.py:157-200 — BoundedProxyRule at priority 10
    on the first kernel layer; low/high are the input value range and are
    mandatory, deeptaylor.py:170-173)."""
    from ..ops.lrp_conv import lrp_conv_bounded

    seed = jax.nn.relu(relevance_seed)
    ops = vgg_layers(arch, until)
    _, inputs = vgg_apply_with_acts(params, image, arch, until)
    r = seed
    for idx, (op, x) in enumerate(zip(reversed(ops), reversed(inputs))):
        is_input_layer = idx == len(ops) - 1
        if op[0] == "conv":
            p = params[op[1]]
            if is_input_layer:
                r = lrp_conv_bounded(r, x, p["kernel"], low=low, high=high)
            else:
                r = lrp_conv_alpha_beta(r, x, p["kernel"], p["bias"], alpha=1.0, beta=0.0, input_nonneg=True)
        else:
            r = lrp_maxpool_wta(r, x)
    return r


def _lane_pack(r):
    """(W, h, w, C) word-batched -> (W//2, h, w, 2C): two words side-by-side
    in the channel (lane) dim. W must be even."""
    Wn, h, w, C = r.shape
    return (r.reshape(Wn // 2, 2, h, w, C).transpose(0, 2, 3, 1, 4)
             .reshape(Wn // 2, h, w, 2 * C))


def _lane_unpack(r):
    """Inverse of :func:`_lane_pack`."""
    Wn, h, w, C2 = r.shape
    C = C2 // 2
    return (r.reshape(Wn, h, w, 2, C).transpose(0, 3, 1, 2, 4)
             .reshape(2 * Wn, h, w, C))


def _block_diag_kernel(k):
    """(kh, kw, ci, co) -> (kh, kw, 2ci, 2co) with two copies of ``k`` on the
    block diagonal: a conv of lane-packed inputs with this kernel computes the
    original conv on each word's lane half independently."""
    kh, kw, ci, co = k.shape
    kb = jnp.zeros((kh, kw, 2 * ci, 2 * co), k.dtype)
    kb = kb.at[:, :, :ci, :co].set(k)
    kb = kb.at[:, :, ci:, co:].set(k)
    return kb


def vgg_lrp_preset_a_wordbatched(params, image, relevance_seeds, arch="vgg16", until="block5_conv3",
                                 compute_dtype=None, storage_dtype=None, lane_pack=True):
    """Per-word LRP with the forward pass shared across words.

    image: (1, 224, 224, 3); relevance_seeds: (W, 14, 14, 512) — one seed per
    caption word. The forward activations are computed once and the backward
    is vmapped over W, so all W heatmaps come out of one XLA program.
    ``compute_dtype=bfloat16`` runs the conv chains on the MXU fast path
    (f32 accumulate) — ~1e-2 relative heatmap deviation for ~3x throughput.

    ``storage_dtype=bfloat16`` goes further: params/activations/relevances
    are HELD in bf16, halving the HBM traffic of the elementwise
    divide/re-weight chains. Convs then run natively in bf16 (the MXU still
    accumulates f32 internally). Measured on v5e at batch 32x20 words: 343ms
    vs 385ms for compute_dtype alone, max deviation 0.9% of the map scale
    (corr 0.99999 vs f32). Returns (W, 224, 224, 3) in f32.

    ``lane_pack=True`` (vgg16/vgg19 only): the C<=64 tail of the backward —
    conv2_1's rule, pool1 WTA, conv1_2's rule, conv1_1's input rule — runs
    with TWO WORDS PACKED into the 128-lane channel dim via block-diagonal
    kernels. Rationale (measured, BASELINE.md round-2 corrected profile):
    TPU tiles are (.., 128) in the minor dim, so 64-channel bf16 tensors pad
    half their lanes — every block1 op pays 2x HBM traffic and the conv1_2
    transposed conv runs at 32 TF/s vs the 149 TF/s XLA reaches at the
    identical-FLOPs block2 shapes. Packing restores full lanes using the
    SAME rule code (the block-diagonal kernel doubles MAC count but the MXU
    was half-idle anyway). Semantics are exact up to conv summation order;
    a zero pad row is added when W is odd. The packed region is skipped when
    ``until`` stops before block2_conv1.

    Round-3 measured dead end (experiments/bench_grouped.py, sound K-slope
    protocol, v5e): expressing the block-diagonal structure as XLA grouped
    convolution (``feature_group_count=2``, which does only the useful MACs)
    is ~2x SLOWER than the dense block-diagonal kernel on this hardware —
    convT 3.29 vs 1.67 ms/chain, fwd 2.13 vs 1.87 ms at the conv1_2 packed
    shape. TPU conv lowering does not exploit the group sparsity at C=64
    groups; the "1.8 ms vs 1.0 ms waste-free floor" gap is therefore closed
    as path-measured-worse, and the dense block-diagonal kernel stays.
    """
    if storage_dtype is not None:
        params = jax.tree.map(lambda a: a.astype(storage_dtype), params)
        image = image.astype(storage_dtype)
        relevance_seeds = relevance_seeds.astype(storage_dtype)
        compute_dtype = None  # ops run natively in storage_dtype
    _, inputs = vgg_apply_with_acts(params, image, arch, until)

    rule = lambda r, x, k, b, nn: lrp_conv_alpha_beta(
        r, x, k, b, alpha=1.0, beta=0.0, compute_dtype=compute_dtype, input_nonneg=nn
    )

    ops = vgg_layers(arch, until)
    # the C<=64 tail: conv1_1, conv1_2, pool1, conv2_1 (identical in vgg16/19)
    tail_len = 4
    packable = (
        lane_pack
        and arch in ("vgg16", "vgg19")
        and len(ops) > tail_len
        and ops[tail_len - 1][:2] == ("conv", "block2_conv1")
    )

    if not packable:
        def one(seed):
            return _vgg_lrp_backward(params, inputs, seed[None], arch, until, rule)[0]

        out = jax.vmap(one)(relevance_seeds)
        return out.astype(jnp.float32) if storage_dtype is not None else out

    head_ops, head_inputs = ops[tail_len:], inputs[tail_len:]

    def one_head(seed):
        r = seed[None]
        for op, x in zip(reversed(head_ops), reversed(head_inputs)):
            if op[0] == "conv":
                p = params[op[1]]
                r = rule(r, x, p["kernel"], p["bias"], True)
            else:
                r = lrp_maxpool_wta(r, x)
        return r[0]

    r = jax.vmap(one_head)(relevance_seeds)         # (W, 112, 112, 128)
    W = r.shape[0]
    if W % 2:
        r = jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)
    rp = _lane_pack(r)                               # (ceil(W/2), 112, 112, 256)

    def packed(x):
        return jnp.concatenate([x, x], axis=-1)

    p21, p12, p11 = params["block2_conv1"], params["block1_conv2"], params["block1_conv1"]
    x21p, xpoolp, x12p, x11p = (packed(inputs[3]), packed(inputs[2]),
                                packed(inputs[1]), packed(inputs[0]))
    k21, k12, k11 = (_block_diag_kernel(p21["kernel"]),
                     _block_diag_kernel(p12["kernel"]),
                     _block_diag_kernel(p11["kernel"]))
    b21, b12, b11 = (jnp.tile(p21["bias"], 2), jnp.tile(p12["bias"], 2),
                     jnp.tile(p11["bias"], 2))

    def one_tail(rl):
        r = rl[None]
        r = rule(r, x21p, k21, b21, True)            # conv2_1: 256 -> 128 lanes
        r = lrp_maxpool_wta(r, xpoolp)               # pool1 WTA at 128 lanes
        r = rule(r, x12p, k12, b12, True)            # conv1_2 at 128 lanes
        r = rule(r, x11p, k11, b11, False)           # conv1_1 input rule -> 6 lanes
        return r[0]

    out = _lane_unpack(jax.vmap(one_tail)(rp))[:W]   # (W, 224, 224, 3)
    return out.astype(jnp.float32) if storage_dtype is not None else out
