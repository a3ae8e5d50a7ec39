from .lrp_core import lrp_linear, lrp_identity, sign_stabilizer, safe_divide  # noqa: F401
from .lrp_conv import (  # noqa: F401
    lrp_conv_alpha_beta,
    lrp_conv_epsilon,
    lrp_maxpool_wta,
)
