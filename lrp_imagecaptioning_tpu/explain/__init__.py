from .decoder_lrp import explain_word_adaptive, explain_word_gridtd  # noqa: F401
from .cnn_lrp import vgg_lrp_preset_a, vgg_lrp_preset_b  # noqa: F401
from .cnn_gradient import vgg_gradient, vgg_guided_backprop  # noqa: F401
from .engine import Explainer, Explanation, METHODS  # noqa: F401
from .decoder_grad import grad_word_adaptive, grad_word_gridtd  # noqa: F401
from .cnn_gradient import grad_cam, vgg_input_times_gradient, vgg_guided_gradcam  # noqa: F401
