"""lrp_imagecaptioning_tpu — a TPU-native JAX framework for explainable image captioning.

A from-scratch rebuild of the capabilities of SunJiamei/LRP-ImageCaptioning
(arXiv:2001.01037) designed for TPU hardware:

* VGG16/VGG19 encoders and two attention LSTM decoders (adaptive-attention,
  grid-TD) written as pure-functional JAX models; one decoder *step function*
  per model is reused by training (``lax.scan``), greedy/beam decode
  (``lax.scan`` with carried state, encoder runs once) and the explanation
  engine (state-caching scan + reverse-scan LRP).
* LRP (epsilon / alpha-beta rules), Gradient, Gradient*Input, GuidedBackprop,
  GradCAM and Guided-GradCAM explanation passes sharing one engine, running
  fully on device (no host/device ping-pong per word).
* LRP-inference finetuning (relevance-weighted dual loss) data-parallel over a
  ``jax.sharding.Mesh``.
* Caption metrics (BLEU/CIDEr/ROUGE-L/METEOR) and explanation-quality metrics
  (bbox correctness, per-word mAP / ROC-AUC).

Reference parity notes cite ``/root/reference`` file:line in docstrings.
"""

__version__ = "0.1.0"

# Lazy top-level API: `from lrp_imagecaptioning_tpu import build_captioner`
# without importing the heavy submodules at package-import time.
_LAZY = {
    "build_captioner": ("lrp_imagecaptioning_tpu.models.captioner", "build_captioner"),
    "Captioner": ("lrp_imagecaptioning_tpu.models.captioner", "Captioner"),
    "Explainer": ("lrp_imagecaptioning_tpu.explain.engine", "Explainer"),
    "Trainer": ("lrp_imagecaptioning_tpu.train.trainer", "Trainer"),
    "LRPFinetuner": ("lrp_imagecaptioning_tpu.train.lrp_finetune", "LRPFinetuner"),
    "CaptionService": ("lrp_imagecaptioning_tpu.infer.serving", "CaptionService"),
    "DatasetProvider": ("lrp_imagecaptioning_tpu.data.provider", "DatasetProvider"),
    "FlickrConfig": ("lrp_imagecaptioning_tpu.config", "FlickrConfig"),
    "COCOConfig": ("lrp_imagecaptioning_tpu.config", "COCOConfig"),
    "COCO2014Config": ("lrp_imagecaptioning_tpu.config", "COCO2014Config"),
    "make_mesh": ("lrp_imagecaptioning_tpu.parallel.mesh", "make_mesh"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
