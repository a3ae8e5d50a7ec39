from .vgg import (  # noqa: F401
    init_vgg_params,
    vgg_apply,
    vgg_apply_with_acts,
    vgg_layers,
    load_keras_vgg_h5,
)
from .captioner import build_captioner, Captioner  # noqa: F401
