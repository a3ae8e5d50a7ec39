"""ResNet50 encoder (Keras-applications v1 architecture), pure JAX NHWC.

The reference lists resnet50/resnet101 as alternative encoders (config.py:36-45,
123-126: tap 'activation_49' => 7x7x2048 for 224 inputs) and wires them into
the model builders (model.py:418-429, 613-628) — but its explainers hardcode
VGG/Inception grid shapes, so resnet there supports training/captioning only.
This module matches that scope: encoder forward + Keras H5 weight import;
explanations for resnet go through the engine's autodiff-gradient path.

Architecture (Keras 'resnet50'): 7x7/2 conv ('conv1') + BN + relu, 3x3/2
maxpool, then bottleneck stages [3, 4, 6, 3] with filters
(64,64,256)/(128,128,512)/(256,256,1024)/(512,512,2048); 'a' blocks carry a
projection shortcut ('branch1'). Layer names follow Keras
(res{stage}{block}_branch2a..., bn...) so published checkpoints import 1:1.
BatchNorm runs in inference mode (moving statistics) — the reference trains
the encoder with Keras BN in training mode, a known deviation documented in
the captioner; for pretrained-weight captioning the paths agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1.001e-5  # keras.applications resnet epsilon

def _block_names(n: int):
    """Keras/caffe block naming: 'a'..'f' for <=6 blocks, else 'a','b1','b2',…
    (the caffe-style scheme resnet101's 23-block stage uses)."""
    if n <= 6:
        return ["abcdef"[i] for i in range(n)]
    return ["a"] + [f"b{i}" for i in range(1, n)]


def _stages(depth: str):
    counts = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}[depth]
    filters = [(64, 64, 256), (128, 128, 512), (256, 256, 1024), (512, 512, 2048)]
    return [
        (stage_idx + 2, _block_names(counts[stage_idx]), filters[stage_idx],
         1 if stage_idx == 0 else 2)
        for stage_idx in range(4)
    ]


# default resnet50 topology kept as the module constant
_STAGES = _stages("resnet50")


def _conv_names(depth: str = "resnet50"):
    """Ordered (conv_name, bn_name, kernel_shape_fn, stride) description."""
    out = [("conv1", "bn_conv1", (7, 7, 3, 64), 2)]
    cin = 64
    for stage, blocks, (f1, f2, f3), stage_stride in _stages(depth):
        for bi, block in enumerate(blocks):
            s = stage_stride if bi == 0 else 1
            base = f"res{stage}{block}_branch"
            bn = f"bn{stage}{block}_branch"
            if bi == 0:
                out.append((base + "1", bn + "1", (1, 1, cin, f3), s))
            out.append((base + "2a", bn + "2a", (1, 1, cin if bi == 0 else f3, f1), s))
            out.append((base + "2b", bn + "2b", (3, 3, f1, f2), 1))
            out.append((base + "2c", bn + "2c", (1, 1, f2, f3), 1))
            cin = f3
    return out


def init_resnet50_params(key, dtype=jnp.float32, depth: str = "resnet50"):
    params = {}
    for conv_name, bn_name, kshape, _ in _conv_names(depth):
        key, sub = jax.random.split(key)
        fan_in = kshape[0] * kshape[1] * kshape[2]
        std = float(np.sqrt(2.0 / fan_in))  # He init
        params[conv_name] = {"kernel": jax.random.normal(sub, kshape, dtype) * std}
        cout = kshape[-1]
        params[bn_name] = {
            "gamma": jnp.ones((cout,), dtype),
            "beta": jnp.zeros((cout,), dtype),
            "moving_mean": jnp.zeros((cout,), dtype),
            "moving_var": jnp.ones((cout,), dtype),
        }
    return params


def _bn(p, x):
    inv = jax.lax.rsqrt(p["moving_var"] + BN_EPS)
    return (x - p["moving_mean"]) * inv * p["gamma"] + p["beta"]


def _conv(p, x, stride, padding, compute_dtype=None):
    # compute_dtype (bf16), grad-safe: BOTH operands cast for the MXU (f32
    # internal accumulation, one bf16 rounding of the output), then upcast so
    # BN/relu/residual adds run f32. preferred_element_type=f32 would skip
    # the rounding but breaks jax.grad's conv transpose rule.
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(jnp.float32) if compute_dtype is not None else y


def _bottleneck(params, x, stage: int, block: str, first: bool, stride: int,
                relu_fn=jax.nn.relu, compute_dtype=None):
    base = f"res{stage}{block}_branch"
    bn = f"bn{stage}{block}_branch"
    if first:
        shortcut = _bn(params[bn + "1"], _conv(params[base + "1"], x, stride, "VALID", compute_dtype))
    else:
        shortcut = x
    y = relu_fn(_bn(params[bn + "2a"], _conv(params[base + "2a"], x, stride, "VALID", compute_dtype)))
    y = relu_fn(_bn(params[bn + "2b"], _conv(params[base + "2b"], y, 1, "SAME", compute_dtype)))
    y = _bn(params[bn + "2c"], _conv(params[base + "2c"], y, 1, "VALID", compute_dtype))
    return relu_fn(y + shortcut)


def resnet50_apply(params, x, compute_dtype=None, depth: str = "resnet50", relu_fn=None):
    """(B, 224, 224, 3) preprocessed -> (B, 7, 7, 2048) at 'activation_49'.

    ``depth='resnet101'`` runs the [3,4,23,3] topology (the reference's
    second resnet option, config.py:41-45)."""
    if relu_fn is None:
        relu_fn = jax.nn.relu
    # keras: ZeroPadding2D(3) + 7x7/2 VALID conv
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    x = relu_fn(_bn(params["bn_conv1"], _conv(params["conv1"], x, 2, "VALID", compute_dtype)))
    # 3x3/2 max pool, SAME-from-valid via explicit pad like keras (valid here)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for stage, blocks, _, stage_stride in _stages(depth):
        for bi, block in enumerate(blocks):
            x = _bottleneck(params, x, stage, block, first=(bi == 0),
                            stride=stage_stride if bi == 0 else 1, relu_fn=relu_fn,
                            compute_dtype=compute_dtype)
    return x.astype(jnp.float32)


def load_keras_resnet50_h5(path: str, depth: str = "resnet50"):
    """Import conv + BN weights from a Keras resnet50/101 HDF5 file."""
    import h5py

    params = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def find(name):
            if name in root:
                return root[name]
            for k in root:
                g = root[k]
                if hasattr(g, "keys") and name in g:
                    return g[name]
            raise KeyError(name)

        def datasets(group, out):
            for k, v in group.items():
                if hasattr(v, "keys"):
                    datasets(v, out)
                else:
                    out[k] = np.asarray(v)

        for conv_name, bn_name, _, _ in _conv_names(depth):
            cw: dict = {}
            datasets(find(conv_name), cw)
            kernel = next(v for k, v in cw.items() if "kernel" in k or k.endswith("W:0") or "_W" in k)
            params[conv_name] = {"kernel": jnp.asarray(kernel)}
            bw: dict = {}
            datasets(find(bn_name), bw)

            def pick(*subs):
                return jnp.asarray(next(v for k, v in bw.items() if any(s in k for s in subs)))

            params[bn_name] = {
                "gamma": pick("gamma"),
                "beta": pick("beta"),
                "moving_mean": pick("moving_mean", "running_mean"),
                "moving_var": pick("moving_var", "running_var", "moving_variance"),
            }
    return params
