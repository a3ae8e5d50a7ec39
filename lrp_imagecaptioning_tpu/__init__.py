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
