from .greedy import greedy_decode  # noqa: F401
from .beam import beam_search  # noqa: F401
from .api import BasicInference, BeamSearchInference  # noqa: F401
from .serving import CaptionService  # noqa: F401
from .http_server import CaptionHTTPServer  # noqa: F401


def __getattr__(name):
    # lazy: grpc_server imports grpcio only when actually used
    if name in ("CaptionGrpcServer", "CaptionGrpcClient", "CaptionGrpcTypedClient"):
        from . import grpc_server

        return getattr(grpc_server, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
