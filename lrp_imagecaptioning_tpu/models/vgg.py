"""VGG16 / VGG19 encoders in pure JAX (NHWC), Keras-name-compatible.

The reference taps keras.applications VGG16 at ``block5_conv3`` giving a
14x14x512 feature grid (reference: models/model.py:418-436, config.py:39-41).
We rebuild the conv stack as a flat list of (conv|pool) ops over a params
pytree keyed by the same Keras layer names so (a) published HDF5 checkpoints
import one-to-one and (b) the explanation engine can cite rules per layer.

TPU notes: with ``compute_dtype`` (bfloat16) both conv operands are cast for
the MXU — which accumulates f32 internally and rounds each conv output to
bf16 once — and the output is upcast so bias-add/relu run f32 (grad-safe;
``preferred_element_type`` would skip the rounding but breaks jax.grad's conv
transpose rule). The explanation backward keeps f32 end-to-end for parity
with the numpy reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lrp_conv import conv2d, maxpool2d

# (block, n_convs, channels)
_VGG_CFG = {
    "vgg16": [(1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512)],
    "vgg19": [(1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512)],
}


def vgg_layers(arch: str = "vgg16", until: str = "block5_conv3"):
    """Ordered op list [('conv', name, cin, cout) | ('pool', name)] cut at ``until``."""
    ops = []
    cin = 3
    for block, n_convs, ch in _VGG_CFG[arch]:
        for i in range(1, n_convs + 1):
            name = f"block{block}_conv{i}"
            ops.append(("conv", name, cin, ch))
            cin = ch
            if name == until:
                return ops
        ops.append(("pool", f"block{block}_pool"))
    if until is not None:
        raise ValueError(f"layer {until!r} not in {arch}")
    return ops


def init_vgg_params(key, arch: str = "vgg16", until: str = "block5_conv3", dtype=jnp.float32):
    """Glorot-uniform init (Keras default) for each conv layer."""
    params = {}
    for op in vgg_layers(arch, until):
        if op[0] != "conv":
            continue
        _, name, cin, cout = op
        key, sub = jax.random.split(key)
        fan_in, fan_out = 3 * 3 * cin, 3 * 3 * cout
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        params[name] = {
            "kernel": jax.random.uniform(sub, (3, 3, cin, cout), dtype, -limit, limit),
            "bias": jnp.zeros((cout,), dtype),
        }
    return params


def vgg_apply(params, x, arch: str = "vgg16", until: str = "block5_conv3", compute_dtype=None,
              relu_fn=None):
    """Forward pass -> feature map (B, 14, 14, 512) at ``until``."""
    if relu_fn is None:
        relu_fn = jax.nn.relu
    for op in vgg_layers(arch, until):
        if op[0] == "conv":
            p = params[op[1]]
            if compute_dtype is not None:
                # mixed precision, grad-safe: BOTH conv operands cast to bf16
                # for the MXU (which accumulates f32 internally and rounds
                # the output once), then upcast so bias-add / relu / the next
                # layer's input run in f32. preferred_element_type=f32 would
                # avoid even that single rounding but breaks jax.grad's conv
                # transpose rule (f32 cotangent vs bf16 kernel TypeError).
                x = conv2d(x.astype(compute_dtype),
                           p["kernel"].astype(compute_dtype)).astype(jnp.float32)
            else:
                x = conv2d(x, p["kernel"])
            x = relu_fn(x + p["bias"].astype(x.dtype))
        else:
            x = maxpool2d(x)
    return x


def vgg_apply_with_acts(params, x, arch: str = "vgg16", until: str = "block5_conv3"):
    """Forward pass that also returns each op's input activation.

    The LRP/gradient backward needs, per layer, its forward *input* (conv
    rules re-weight by it; pool WTA re-computes the argmax from it). f32.
    Returns (features, inputs) with inputs[i] = input of vgg_layers(...)[i].
    """
    inputs = []
    for op in vgg_layers(arch, until):
        inputs.append(x)
        if op[0] == "conv":
            p = params[op[1]]
            x = jax.nn.relu(conv2d(x, p["kernel"]) + p["bias"])
        else:
            x = maxpool2d(x)
    return x, inputs


def load_keras_vgg_h5(path: str, arch: str = "vgg16", until: str = "block5_conv3"):
    """Import conv weights from a Keras HDF5 file (weights-only or full model).

    Handles both layouts: keras.applications weight files
    (``f[name][name + '_W_1:0']``) and model checkpoints saved by the
    reference training loop (``f['model_weights'][name][...]``, train.py:79-88).
    Keras stores conv kernels HWIO — same as ours, no transpose needed.
    """
    import h5py

    params = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def find_layer(name):
            if name in root:
                return root[name]
            for k in root:  # nested (e.g. model_1/block1_conv1)
                g = root[k]
                if isinstance(g, h5py.Group) and name in g:
                    return g[name]
            return None

        for op in vgg_layers(arch, until):
            if op[0] != "conv":
                continue
            name = op[1]
            g = find_layer(name)
            if g is None:
                raise KeyError(f"layer {name} not found in {path}")
            while isinstance(g, h5py.Group) and name in g:  # name/name/kernel:0
                g = g[name]
            kernel = bias = None
            def walk(group):
                nonlocal kernel, bias
                for k, v in group.items():
                    if isinstance(v, h5py.Group):
                        walk(v)
                        continue
                    # dataset names: 'kernel:0' / 'bias:0' (checkpoints) or
                    # '<layer>_W_1:0' / '<layer>_b_1:0' (keras.applications);
                    # match on underscore tokens so 'b' finds '..._b_1'
                    toks = k.split(":")[0].split("_")
                    if "kernel" in toks or "W" in toks:
                        kernel = np.asarray(v)
                    elif "bias" in toks or "b" in toks:
                        bias = np.asarray(v)
            if isinstance(g, h5py.Group):
                walk(g)
            if kernel is None or bias is None:
                raise KeyError(f"kernel/bias not found under layer {name}")
            params[name] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    return params
