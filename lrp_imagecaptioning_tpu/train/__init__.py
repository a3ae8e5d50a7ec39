from .optimizer import get_learning_rate, make_optimizer, set_learning_rate  # noqa: F401
from .step import (  # noqa: F401
    make_eval_step,
    make_multi_train_step,
    make_sharded_multi_train_step,
    make_sharded_train_step,
    make_train_step,
)
from .trainer import MODELTYPE, Trainer, main_attention  # noqa: F401
from .lrp_finetune import LRPFinetuner, lrp_weights, make_lrp_finetune_step  # noqa: F401
