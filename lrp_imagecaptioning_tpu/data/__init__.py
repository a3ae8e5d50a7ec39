from .tokenizer import KerasCompatTokenizer, CaptionPreprocessor  # noqa: F401
from .images import ImagePreprocessor, vgg_preprocess  # noqa: F401
from .datasets import (  # noqa: F401
    Datum,
    Flickr30kDataset,
    COCODataset,
    COCODatasetKarpathy,
    SyntheticDataset,
)
from .provider import DatasetProvider  # noqa: F401
