from .vgg import (  # noqa: F401
    init_vgg_params,
    vgg_apply,
    vgg_apply_with_acts,
    vgg_layers,
    load_keras_vgg_h5,
)
from .captioner import build_captioner, Captioner  # noqa: F401
from .weights_io import load_reference_checkpoint_h5, load_reference_decoder_h5  # noqa: F401
from .word_vectors import Fasttext, Glove, init_embedding  # noqa: F401
