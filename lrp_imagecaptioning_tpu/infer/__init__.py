from .greedy import greedy_decode  # noqa: F401
from .beam import beam_search  # noqa: F401
from .api import BasicInference, BeamSearchInference  # noqa: F401
from .serving import CaptionService  # noqa: F401
from .http_server import CaptionHTTPServer  # noqa: F401
