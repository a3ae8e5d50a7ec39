from .metrics import BLEU, CIDEr, ROUGE, METEOR, SPICE, BERT, default_metrics  # noqa: F401
