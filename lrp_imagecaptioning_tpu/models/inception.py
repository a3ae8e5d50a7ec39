"""InceptionV3 encoder (keras.applications topology), pure JAX NHWC.

The reference's third encoder option: tapped at 'mixed10' => 8x8x2048 for
299x299 inputs (config.py:36-37; model builders model.py:422-424; the
explainers carry inception grid branches, explainers.py:236-241,
evaluate_bbox.py:52-56). Supported here for training/captioning and
gradient-family explanations (the engine's generic autodiff path); rule-based
LRP stays VGG-only, as in this framework's resnet support.

The network is encoded as a declarative op list replaying the exact
keras.applications.inception_v3 creation order, so the sequentially numbered
Keras layers (conv2d_1..94 / batch_normalization_1..94) map 1:1 onto our
semantic names for H5 import. Every conv is bias-free + BatchNorm + relu;
BN runs in inference mode (moving statistics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # keras.applications inception_v3 BN epsilon


def _spec():
    """[(name, cin_key|None, filters, (kh, kw), stride, padding)] conv ops plus
    structural ops, in keras creation order. Structural entries:
    ('maxpool'|'avgpool', window, stride, padding), ('concat', [branch names]),
    ('input',). Branch wiring is by named intermediate tensors."""
    ops = []

    def conv(name, src, f, kh, kw, s=1, p="VALID"):
        ops.append(("conv", name, src, f, (kh, kw), s, p))

    def pool(name, src, kind, w, s, p):
        ops.append(("pool", name, src, kind, w, s, p))

    def concat(name, srcs):
        ops.append(("concat", name, srcs))

    # stem
    conv("stem1", "input", 32, 3, 3, 2)
    conv("stem2", "stem1", 32, 3, 3)
    conv("stem3", "stem2", 64, 3, 3, 1, "SAME")
    pool("stem_pool1", "stem3", "max", 3, 2, "VALID")
    conv("stem4", "stem_pool1", 80, 1, 1)
    conv("stem5", "stem4", 192, 3, 3)
    pool("stem_pool2", "stem5", "max", 3, 2, "VALID")

    # inception-A x3 (mixed0..2)
    prev = "stem_pool2"
    for i, pf in enumerate([32, 64, 64]):
        m = f"mixed{i}"
        conv(f"{m}_b1x1", prev, 64, 1, 1, 1, "SAME")
        conv(f"{m}_b5x5_1", prev, 48, 1, 1, 1, "SAME")
        conv(f"{m}_b5x5_2", f"{m}_b5x5_1", 64, 5, 5, 1, "SAME")
        conv(f"{m}_b3x3dbl_1", prev, 64, 1, 1, 1, "SAME")
        conv(f"{m}_b3x3dbl_2", f"{m}_b3x3dbl_1", 96, 3, 3, 1, "SAME")
        conv(f"{m}_b3x3dbl_3", f"{m}_b3x3dbl_2", 96, 3, 3, 1, "SAME")
        pool(f"{m}_pool", prev, "avg", 3, 1, "SAME")
        conv(f"{m}_bpool", f"{m}_pool", pf, 1, 1, 1, "SAME")
        concat(m, [f"{m}_b1x1", f"{m}_b5x5_2", f"{m}_b3x3dbl_3", f"{m}_bpool"])
        prev = m

    # reduction-A (mixed3)
    conv("mixed3_b3x3", prev, 384, 3, 3, 2)
    conv("mixed3_b3x3dbl_1", prev, 64, 1, 1, 1, "SAME")
    conv("mixed3_b3x3dbl_2", "mixed3_b3x3dbl_1", 96, 3, 3, 1, "SAME")
    conv("mixed3_b3x3dbl_3", "mixed3_b3x3dbl_2", 96, 3, 3, 2)
    pool("mixed3_pool", prev, "max", 3, 2, "VALID")
    concat("mixed3", ["mixed3_b3x3", "mixed3_b3x3dbl_3", "mixed3_pool"])
    prev = "mixed3"

    # inception-B x4 (mixed4..7)
    for i, c7 in zip(range(4, 8), [128, 160, 160, 192]):
        m = f"mixed{i}"
        conv(f"{m}_b1x1", prev, 192, 1, 1, 1, "SAME")
        conv(f"{m}_b7x7_1", prev, c7, 1, 1, 1, "SAME")
        conv(f"{m}_b7x7_2", f"{m}_b7x7_1", c7, 1, 7, 1, "SAME")
        conv(f"{m}_b7x7_3", f"{m}_b7x7_2", 192, 7, 1, 1, "SAME")
        conv(f"{m}_b7x7dbl_1", prev, c7, 1, 1, 1, "SAME")
        conv(f"{m}_b7x7dbl_2", f"{m}_b7x7dbl_1", c7, 7, 1, 1, "SAME")
        conv(f"{m}_b7x7dbl_3", f"{m}_b7x7dbl_2", c7, 1, 7, 1, "SAME")
        conv(f"{m}_b7x7dbl_4", f"{m}_b7x7dbl_3", c7, 7, 1, 1, "SAME")
        conv(f"{m}_b7x7dbl_5", f"{m}_b7x7dbl_4", 192, 1, 7, 1, "SAME")
        pool(f"{m}_pool", prev, "avg", 3, 1, "SAME")
        conv(f"{m}_bpool", f"{m}_pool", 192, 1, 1, 1, "SAME")
        concat(m, [f"{m}_b1x1", f"{m}_b7x7_3", f"{m}_b7x7dbl_5", f"{m}_bpool"])
        prev = m

    # reduction-B (mixed8)
    conv("mixed8_b3x3_1", prev, 192, 1, 1, 1, "SAME")
    conv("mixed8_b3x3_2", "mixed8_b3x3_1", 320, 3, 3, 2)
    conv("mixed8_b7x7x3_1", prev, 192, 1, 1, 1, "SAME")
    conv("mixed8_b7x7x3_2", "mixed8_b7x7x3_1", 192, 1, 7, 1, "SAME")
    conv("mixed8_b7x7x3_3", "mixed8_b7x7x3_2", 192, 7, 1, 1, "SAME")
    conv("mixed8_b7x7x3_4", "mixed8_b7x7x3_3", 192, 3, 3, 2)
    pool("mixed8_pool", prev, "max", 3, 2, "VALID")
    concat("mixed8", ["mixed8_b3x3_2", "mixed8_b7x7x3_4", "mixed8_pool"])
    prev = "mixed8"

    # inception-C x2 (mixed9, mixed10)
    for i in (9, 10):
        m = f"mixed{i}"
        conv(f"{m}_b1x1", prev, 320, 1, 1, 1, "SAME")
        conv(f"{m}_b3x3_1", prev, 384, 1, 1, 1, "SAME")
        conv(f"{m}_b3x3_2a", f"{m}_b3x3_1", 384, 1, 3, 1, "SAME")
        conv(f"{m}_b3x3_2b", f"{m}_b3x3_1", 384, 3, 1, 1, "SAME")
        concat(f"{m}_b3x3", [f"{m}_b3x3_2a", f"{m}_b3x3_2b"])
        conv(f"{m}_b3x3dbl_1", prev, 448, 1, 1, 1, "SAME")
        conv(f"{m}_b3x3dbl_2", f"{m}_b3x3dbl_1", 384, 3, 3, 1, "SAME")
        conv(f"{m}_b3x3dbl_3a", f"{m}_b3x3dbl_2", 384, 1, 3, 1, "SAME")
        conv(f"{m}_b3x3dbl_3b", f"{m}_b3x3dbl_2", 384, 3, 1, 1, "SAME")
        concat(f"{m}_b3x3dbl", [f"{m}_b3x3dbl_3a", f"{m}_b3x3dbl_3b"])
        pool(f"{m}_pool", prev, "avg", 3, 1, "SAME")
        conv(f"{m}_bpool", f"{m}_pool", 192, 1, 1, 1, "SAME")
        concat(m, [f"{m}_b1x1", f"{m}_b3x3", f"{m}_b3x3dbl", f"{m}_bpool"])
        prev = m
    return ops


_SPEC = _spec()
CONV_ORDER = [op[1] for op in _SPEC if op[0] == "conv"]  # keras numbering order


def _channels():
    """Resolve cin/cout per conv by walking the spec."""
    ch = {"input": 3}
    dims = {}
    for op in _SPEC:
        if op[0] == "conv":
            _, name, src, f, _, _, _ = op
            dims[name] = (ch[src], f)
            ch[name] = f
        elif op[0] == "pool":
            _, name, src, _, _, _, _ = op
            ch[name] = ch[src]
        else:
            _, name, srcs = op
            ch[name] = sum(ch[s] for s in srcs)
    return dims, ch


_CONV_DIMS, _CHANNELS = _channels()
MIXED10_CHANNELS = _CHANNELS["mixed10"]  # 2048


def init_inception_v3_params(key, dtype=jnp.float32):
    params = {}
    for op in _SPEC:
        if op[0] != "conv":
            continue
        _, name, _, f, (kh, kw), _, _ = op
        cin, cout = _CONV_DIMS[name]
        key, sub = jax.random.split(key)
        fan_in = kh * kw * cin
        std = float(np.sqrt(2.0 / fan_in))
        params[name] = {
            "kernel": jax.random.normal(sub, (kh, kw, cin, cout), dtype) * std,
            "bn_gamma": jnp.ones((cout,), dtype),
            "bn_beta": jnp.zeros((cout,), dtype),
            "bn_mean": jnp.zeros((cout,), dtype),
            "bn_var": jnp.ones((cout,), dtype),
        }
    return params


def inception_v3_apply(params, x, compute_dtype=None, until: str = "mixed10", relu_fn=None):
    """(B, 299, 299, 3) preprocessed ([-1,1]) -> (B, 8, 8, 2048) at mixed10."""
    if relu_fn is None:
        relu_fn = jax.nn.relu
    tensors = {"input": x}
    for op in _SPEC:
        if op[0] == "conv":
            _, name, src, f, (kh, kw), s, p = op
            t = tensors[src]
            # compute_dtype (bf16), grad-safe: both operands cast for the MXU
            # (f32 internal accumulation, one bf16 output rounding), upcast so
            # BN/relu run f32 (see models/vgg.py for why not
            # preferred_element_type)
            if compute_dtype is not None:
                t = t.astype(compute_dtype)
            y = jax.lax.conv_general_dilated(
                t, params[name]["kernel"].astype(t.dtype), (s, s), p,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if compute_dtype is not None:
                y = y.astype(jnp.float32)
            pn = params[name]
            inv = jax.lax.rsqrt(pn["bn_var"] + BN_EPS)
            y = (y - pn["bn_mean"]) * inv * pn["bn_gamma"] + pn["bn_beta"]
            tensors[name] = relu_fn(y)
        elif op[0] == "pool":
            _, name, src, kind, w, s, p = op
            t = tensors[src]
            if kind == "max":
                tensors[name] = jax.lax.reduce_window(
                    t, -jnp.inf, jax.lax.max, (1, w, w, 1), (1, s, s, 1), p)
            else:
                summed = jax.lax.reduce_window(
                    t, 0.0, jax.lax.add, (1, w, w, 1), (1, s, s, 1), p)
                ones = jnp.ones_like(t[..., :1])
                counts = jax.lax.reduce_window(
                    ones, 0.0, jax.lax.add, (1, w, w, 1), (1, s, s, 1), p)
                tensors[name] = summed / counts
        else:
            _, name, srcs = op
            tensors[name] = jnp.concatenate([tensors[s] for s in srcs], axis=-1)
        if op[1] == until:
            return tensors[until].astype(jnp.float32)
    return tensors["mixed10"].astype(jnp.float32)


def inception_preprocess(img_rgb: np.ndarray) -> np.ndarray:
    """keras inception preprocess_input: RGB 0..255 -> [-1, 1]."""
    return np.asarray(img_rgb, np.float32) / 127.5 - 1.0


def load_keras_inception_v3_h5(path: str):
    """Import from a keras.applications inception_v3 HDF5: the numbered layers
    (conv2d_N / batch_normalization_N) map onto CONV_ORDER by creation order."""
    import h5py

    params = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def datasets(group, out):
            for k, v in group.items():
                if hasattr(v, "keys"):
                    datasets(v, out)
                else:
                    out[k] = np.asarray(v)

        def layer(name):
            out: dict = {}
            datasets(root[name], out)
            return out

        # keras numbers layers from 1; files from newer keras drop the suffix
        # on the first layer ('conv2d' not 'conv2d_1') — handle both
        def nth(prefix, n):
            if n == 1 and prefix in root:
                return layer(prefix)
            return layer(f"{prefix}_{n}")

        for idx, name in enumerate(CONV_ORDER, start=1):
            cw = nth("conv2d", idx)
            bw = nth("batch_normalization", idx)
            kernel = next(v for k, v in cw.items() if "kernel" in k or "_W" in k)

            def pick(*subs):
                return jnp.asarray(next(v for k, v in bw.items() if any(s in k for s in subs)))

            params[name] = {
                "kernel": jnp.asarray(kernel),
                "bn_gamma": pick("gamma"),
                "bn_beta": pick("beta"),
                "bn_mean": pick("moving_mean"),
                "bn_var": pick("moving_var", "moving_variance"),
            }
    return params
