"""Vendored wire contract of the serving surface: caption_service.proto and
its pre-generated Python stubs (see the .proto header for regeneration)."""

from . import caption_service_pb2, caption_service_pb2_grpc  # noqa: F401
