"""Import reference Keras HDF5 checkpoints into our param pytrees.

The reference publishes pretrained .hdf5 weight files (README.md:33) saved by
``keras_model.save_weights`` (train.py:79-88); importing them enables
bit-for-rule parity checks of captions and relevance maps.

Keras layer/weight naming (model.py):
* ``image_features`` / ``global_img_feature`` / ``output`` — Dense
  kernel/bias (model.py:446-466)
* ``embedding_*`` — embedding table (model.py:80-93)
* adaptive wrapper ``external_attention_rnn_wrapper_local_attention_v3_*`` —
  wrapped LSTM kernel/recurrent_kernel/bias plus attention weights suffixed
  ``_Wv,_Wg,_V,_Wx,_Wh,_Ws`` (model.py:555-571)
* grid-TD wrapper ``external_bottom_up_attention_adaptive_*`` — language-LSTM
  kernel/recurrent_kernel/bias, manual TD-LSTM weights
  ``_top_down_lstm_weight_i/_h/_bias`` and attention weights
  ``_W_va,_W_ha,_W_a,_W_x,_W_h,_W_s`` (model.py:702-743)

Keras LSTM gate order is [i, f, c(g), o] — identical to models/cells.py, so
kernels transfer without permutation. Conv kernels are HWIO on both sides.
"""

from __future__ import annotations

import numpy as np


def _collect_datasets(group, out, prefix=""):
    import h5py

    for k, v in group.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, h5py.Group):
            _collect_datasets(v, out, name)
        else:
            out[name] = np.asarray(v)


def _layer_weights(root, match: str) -> dict:
    """All datasets under the first layer group whose name contains
    ``match`` -> {full_weight_name: array}."""
    for layer_name in root:
        if match in layer_name:
            out: dict = {}
            _collect_datasets(root[layer_name], out)
            return out
    raise KeyError(f"no layer matching {match!r} in checkpoint")


def _pick(weights: dict, *substrings, exclude=()):
    for name, arr in sorted(weights.items()):
        if all(s in name for s in substrings) and not any(e in name for e in exclude):
            return arr
    raise KeyError(f"no weight matching {substrings} (have {list(weights)})")


def _dense(weights: dict) -> dict:
    import jax.numpy as jnp

    return {
        "kernel": jnp.asarray(_pick(weights, "kernel")),
        "bias": jnp.asarray(_pick(weights, "bias")),
    }


def load_reference_decoder_h5(path: str, model_type: str) -> dict:
    """Decoder params pytree from a reference checkpoint."""
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        params: dict = {
            "embedding": jnp.asarray(_pick(_layer_weights(root, "embedding"), "embedding")),
            "image_features": _dense(_layer_weights(root, "image_features")),
            "global_img_feature": _dense(_layer_weights(root, "global_img_feature")),
            "output": _dense(_layer_weights(root, "output")),
        }
        if model_type == "adaptiveattention":
            w = _layer_weights(root, "external_attention_rnn_wrapper_local_attention_v3")
            params["lstm"] = {
                "wi": jnp.asarray(_pick(w, "kernel", exclude=("recurrent",))),
                "wh": jnp.asarray(_pick(w, "recurrent_kernel")),
                "b": jnp.asarray(_pick(w, "bias", exclude=("_Wv", "_Wg", "_Wx", "_Wh", "_Ws"))),
            }
            params["attn"] = {
                "Wv": jnp.asarray(_pick(w, "_Wv")),
                "Wg": jnp.asarray(_pick(w, "_Wg")),
                "Wx": jnp.asarray(_pick(w, "_Wx")),
                "Wh": jnp.asarray(_pick(w, "_Wh")),
                "Ws": jnp.asarray(_pick(w, "_Ws")),
                "V": jnp.asarray(_pick(w, "_V", exclude=("_Wv",))),
            }
        elif model_type == "gridTD":
            w = _layer_weights(root, "external_bottom_up_attention_adaptive")
            params["lang_lstm"] = {
                "wi": jnp.asarray(_pick(w, "kernel", exclude=("recurrent", "top_down"))),
                "wh": jnp.asarray(_pick(w, "recurrent_kernel")),
                "b": jnp.asarray(_pick(w, "bias", exclude=("top_down", "_W"))),
            }
            params["td_lstm"] = {
                "wi": jnp.asarray(_pick(w, "top_down_lstm_weight_i")),
                "wh": jnp.asarray(_pick(w, "top_down_lstm_weight_h")),
                "b": jnp.asarray(_pick(w, "top_down_lstm_bias")),
            }
            params["attn"] = {
                "W_va": jnp.asarray(_pick(w, "_W_va")),
                "W_ha": jnp.asarray(_pick(w, "_W_ha")),
                "W_a": jnp.asarray(_pick(w, "_W_a", exclude=("_W_va", "_W_ha"))),
                "W_x": jnp.asarray(_pick(w, "_W_x")),
                "W_h": jnp.asarray(_pick(w, "_W_h", exclude=("_W_ha",))),
                "W_s": jnp.asarray(_pick(w, "_W_s")),
            }
        else:
            raise ValueError(f"unknown model_type {model_type!r}")
    return params


def load_reference_checkpoint_h5(path: str, model_type: str, arch: str = "vgg16",
                                 until: str = "block5_conv3") -> dict:
    """Full captioner params ({'vgg', 'decoder'}) from a reference HDF5."""
    if arch == "resnet50":
        from .resnet import load_keras_resnet50_h5

        enc = load_keras_resnet50_h5(path)
    else:
        from .vgg import load_keras_vgg_h5

        enc = load_keras_vgg_h5(path, arch, until)
    return {
        "vgg": enc,
        "decoder": load_reference_decoder_h5(path, model_type),
    }
