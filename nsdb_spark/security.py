"""Pluggable authorization seam, mirroring the reference's
NSDbAuthorizationProvider (nsdb-security/src/main/java/io/radicalbit/nsdb/
security/NSDbAuthorizationProvider.java): a payload extractor per
transport plus db/namespace/metric-level check hooks, each returning an
AuthorizationResponse. The default provider allows everything (the
reference's EmptyNSDbAuthorizationProvider); servers call the checks and
turn a failure into 403 (HTTP) or a SubscriptionByQueryStringFailed
message (WebSocket, WsResources.scala:88-103).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class AuthorizationResponse:
    success: bool
    fail_reason: str = ""


class NSDbAuthorizationProvider:
    """Default-allow provider; override any hook for a real policy.

    Payload extractors mirror the reference: HTTP carries the security
    token in a header, the WebSocket upgrade carries it as a requested
    subprotocol (extractHttpSecurityPayload / extractWsSecurityPayload).
    """

    #: header the HTTP payload extractor reads (reference implementations
    #: commonly use Authorization)
    http_header = "Authorization"

    #: request-metadata key the gRPC interceptor reads
    #: (NSDbAuthorizationProvider.getGrpcSecurityHeader)
    grpc_security_header = "authorization"

    def extract_http_security_payload(self, headers: dict[str, str]) -> str:
        for k, v in headers.items():
            if k.lower() == self.http_header.lower():
                return v
        return ""

    def extract_ws_security_payload(self, subprotocols: list[str]) -> str:
        return subprotocols[0] if subprotocols else ""

    def check_db_auth(
        self, db: str, payload: str, write_permission: bool
    ) -> AuthorizationResponse:
        return AuthorizationResponse(True)

    def check_namespace_auth(
        self, db: str, namespace: str, payload: str, write_permission: bool
    ) -> AuthorizationResponse:
        return AuthorizationResponse(True)

    def check_metric_auth(
        self, db: str, namespace: str, metric: str, payload: str, write_permission: bool
    ) -> AuthorizationResponse:
        return AuthorizationResponse(True)
