from .metrics import BLEU, CIDEr, ROUGE, METEOR, SPICE, BERT, default_metrics  # noqa: F401
from .bbox import EvaluationBbox, analyze_results, correctness, evaluate_dataset  # noqa: F401
from .words import (  # noqa: F401
    COCO_CATEGORY,
    COCO_FREQUENT_OBJECT,
    FLICKR_CATEGORY,
    FREQUENT_OBJECT,
    beta_roc_auc,
    collect_word_stats,
    frequent_object_map,
    mean_roc_auc,
)
