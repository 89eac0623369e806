"""Wire-level gRPC endpoint for NSDb — stdlib-only HTTP/2 + HPACK +
protobuf implementation of reference nsdb-rpc/src/main/protobuf/*.proto
(service, streaming, health, init, restore). See server.py for the
service surface and semantics parity notes."""
from .client import GrpcError, NsdbGrpcClient
from .server import NsdbGrpcServer, parse_duration_ms, serve_grpc

__all__ = [
    "GrpcError",
    "NsdbGrpcClient",
    "NsdbGrpcServer",
    "parse_duration_ms",
    "serve_grpc",
]
