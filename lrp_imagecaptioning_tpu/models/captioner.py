"""Full captioning model assembly: CNN encoder + decoder + losses.

Equivalent of ImgCaptioningAdaptiveAttentionModel (model.py:415-472) and
ImgCaptioninggridTDAdaptiveModel (model.py:609-664), with both loss variants:

* ``masked_ce_from_logits`` — softmax-CE on logits, last timestep discarded,
  all-zero label rows contribute zero loss (model.py:95-103). Used by the
  adaptive model and by the ``from_logits`` config mode.
* ``keras_categorical_ce`` — the reference grid-TD quirk: Keras
  ``categorical_crossentropy`` applied DIRECTLY to logits, i.e. the logits are
  renormalized to sum 1 and clipped before log (model.py:662-664). Provided
  for training parity with published grid-TD checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import adaptive, aoa, gridtd, vgg


def masked_ce_from_logits(logits, y_onehot):
    """(B,T,V) logits, (B,T,V) one-hot (all-zero rows = padding) -> scalar.

    Mirrors categorical_crossentropy_from_logits (model.py:95-103): the last
    timestep is discarded; tf.nn.softmax_cross_entropy_with_logits on all-zero
    labels yields 0, so padding rows vanish. Keras then means over (B,T-1).
    """
    logits = logits[:, :-1, :]
    y = y_onehot[:, :-1, :].astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(y * logp).sum(-1)
    return ce.mean()


def keras_categorical_ce(logits, y_onehot, eps: float = 1e-7):
    """Keras categorical_crossentropy applied to raw logits (grid-TD quirk,
    model.py:662-664): output renormalized to sum 1, clipped, then -y*log(p).

    The renormalizing division follows Keras' raw ``output /= sum`` —
    negative sums stay negative (the target prob then clips to eps and the
    loss is -log(eps), the regime that actually drives this quirk loss).
    The only deviation is a sign-PRESERVING stabilizer on the denominator so
    an exactly-zero sum cannot NaN the jit gradient; a max(sum, eps) guard
    here would instead zero the loss whenever a timestep's logits sum went
    negative."""
    y = y_onehot.astype(logits.dtype)
    s = logits.sum(-1, keepdims=True)
    s = s + jnp.where(s >= 0, eps, -eps)
    p = logits / s
    p = jnp.clip(p, eps, 1.0 - eps)
    ce = -(y * jnp.log(p)).sum(-1)
    return ce.mean()


def masked_accuracy(logits, y_onehot):
    """categorical_accuracy_with_variable_timestep (model.py:105-123)."""
    logits = logits[:, :-1, :]
    y = y_onehot[:, :-1, :]
    valid = y.sum(-1) > 0
    match = jnp.argmax(logits, -1) == jnp.argmax(y, -1)
    return (match & valid).sum() / jnp.maximum(valid.sum(), 1)


@dataclass
class Captioner:
    """Bundles encoder + decoder fns over one params pytree.

    params = {'vgg': {...}, 'decoder': {...}}
    """

    model_type: str            # 'adaptiveattention' | 'gridTD'
    cfg: Any
    vocab_size: int
    decoder: Any               # module: adaptive | gridtd

    def init_params(self, key, vocab_words=None, word_vector_path=None,
                    encoder_params=None):
        """``vocab_words`` (model-id order) + ``cfg.pretrained_word_vector``
        ('glove'|'fasttext') seed the embedding table from a vector file
        (reference _build_word_embedding, model.py:80-93).

        ``encoder_params``: reuse an already-built encoder tree (e.g. loaded
        imagenet weights, or a shared random tree) instead of re-initializing
        — encoder init is hundreds of eager random ops (~7-12 s for
        resnet/inception on a slow host) and is the dominant cost of building
        a captioner."""
        k1, k2 = jax.random.split(key)
        if encoder_params is not None:
            enc = encoder_params
        elif self.cfg.img_encoder in ("vgg16", "vgg19"):
            enc = vgg.init_vgg_params(k1, self.cfg.img_encoder, self.cfg.layer_name)
        elif self.cfg.img_encoder in ("resnet50", "resnet101"):
            from . import resnet

            enc = resnet.init_resnet50_params(k1, depth=self.cfg.img_encoder)
        elif self.cfg.img_encoder == "inception_v3":
            from . import inception

            enc = inception.init_inception_v3_params(k1)
        else:
            raise NotImplementedError(f"encoder {self.cfg.img_encoder!r}")
        decoder_params = self.decoder.init_params(k2, self.vocab_size, self.cfg)
        if self.cfg.pretrained_word_vector and vocab_words is not None:
            from .word_vectors import init_embedding

            decoder_params["embedding"] = jnp.asarray(init_embedding(
                k2, list(vocab_words), self.cfg.embedding_dim,
                pretrained=self.cfg.pretrained_word_vector,
                path=word_vector_path,
            ))
        return {
            "vgg": enc,  # key kept for checkpoint compatibility across encoders
            "decoder": decoder_params,
        }

    def _cfg_compute_dtype(self):
        """cfg.compute_dtype ('bfloat16') -> dtype for the encoder matmuls.

        Mixed precision the TPU way: conv/matmul OPERANDS cast to bf16 for
        the MXU fast path (the MXU accumulates f32 internally; each conv
        output is rounded to bf16 once, then upcast so bias/BN/relu run f32),
        while the params pytree and the optimizer state remain f32 master
        copies — gradients come back f32 through the cast."""
        cd = getattr(self.cfg, "compute_dtype", "float32")
        if cd in (None, "float32", "f32"):
            return None
        if cd in ("bfloat16", "bf16"):
            return jnp.bfloat16
        raise ValueError(f"unsupported compute_dtype {cd!r}")

    def encode(self, params, images, compute_dtype=None, relu_fn=None):
        """images (B,224,224,3) preprocessed -> (B, L, D) feature grid.

        Encoder dispatch mirrors the reference builders (model.py:418-429):
        vgg16/vgg19 tap ``cfg.layer_name``; resnet50 taps the final conv5
        relu ('activation_49', 7x7x2048, config.py:37).

        ``compute_dtype`` defaults to ``cfg.compute_dtype`` (f32 unless
        configured); pass it explicitly to override per call site."""
        if compute_dtype is None:
            compute_dtype = self._cfg_compute_dtype()
        if self.cfg.img_encoder in ("vgg16", "vgg19"):
            feats = vgg.vgg_apply(
                params["vgg"], images, self.cfg.img_encoder, self.cfg.layer_name,
                compute_dtype, relu_fn=relu_fn,
            )
        elif self.cfg.img_encoder == "inception_v3":
            from . import inception

            feats = inception.inception_v3_apply(
                params["vgg"], images, compute_dtype, until=self.cfg.layer_name,
                relu_fn=relu_fn,
            )
        else:
            from . import resnet

            feats = resnet.resnet50_apply(params["vgg"], images, compute_dtype,
                                          depth=self.cfg.img_encoder, relu_fn=relu_fn)
        B = feats.shape[0]
        return feats.reshape(B, self.cfg.img_feature_length, self.cfg.img_feature_dim).astype(jnp.float32)

    def prepare_consts(self, params, feat_grid):
        return self.decoder.prepare_consts(params["decoder"], feat_grid)

    def forward_train(self, params, images, captions_in, dropout_rng=None):
        if getattr(self.cfg, "remat_encoder", False):
            # rematerialize the CNN in the backward pass: trades encoder
            # recompute for not storing its activations — enables much larger
            # per-chip batches (jax.checkpoint)
            encode = jax.checkpoint(lambda p, im: self.encode(p, im))
            feat_grid = encode(params, images)
        else:
            feat_grid = self.encode(params, images)
        drop = self.cfg.drop_rate if dropout_rng is not None else 0.0
        return self.decoder.forward_train(
            params["decoder"], feat_grid, captions_in, self.cfg, dropout_rng, drop
        )

    def loss_fn(self) -> Callable:
        if self.cfg.loss_mode == "keras_categorical" and self.model_type == "gridTD":
            return keras_categorical_ce
        return masked_ce_from_logits

    def loss(self, params, images, captions_in, y_onehot, dropout_rng=None):
        logits = self.forward_train(params, images, captions_in, dropout_rng)
        return self.loss_fn()(logits, y_onehot)


def build_captioner(model_type: str, cfg, vocab_size: int) -> Captioner:
    """MODELTYPE registry equivalent (train.py:676-682). 'AOA' maps to the
    working reimplementation of the reference's commented-out model
    (model.py:828-1250; see models/aoa.py)."""
    if model_type == "adaptiveattention":
        return Captioner(model_type, cfg, vocab_size, adaptive)
    if model_type == "gridTD":
        return Captioner(model_type, cfg, vocab_size, gridtd)
    if model_type in ("AOA", "aoa"):
        return Captioner("aoa", cfg, vocab_size, aoa)
    raise ValueError(f"unknown model type {model_type!r} (choose adaptiveattention|gridTD|aoa)")
