"""Minimal stdlib gRPC client for the NSDb endpoint — the test-side
counterpart of `server.py` (the container has no grpcio, so wire-level
tests drive the server with this; it speaks the same public HTTP/2 +
HPACK + gRPC framing, mirroring GRPCClient.scala's call surface).
"""
from __future__ import annotations

import socket
import struct
import threading

from . import proto
from .http2 import ConnectionClosed, Http2Connection, PREFACE, RST_STREAM


class GrpcError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(f"grpc-status {code}: {message}")
        self.code = code
        self.message = message


class NsdbGrpcClient:
    def __init__(self, host: str, port: int, metadata: list[tuple[str, str]] | None = None):
        sock = socket.create_connection((host, port), timeout=30)
        self.conn = Http2Connection(sock, is_server=False)
        self.authority = f"{host}:{port}"
        self.metadata = metadata or []
        self._next_sid = 1
        self._sid_lock = threading.Lock()
        self.conn.sock.sendall(PREFACE)
        self.conn.send_settings({})
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self) -> None:
        try:
            while True:
                ftype, flags, sid, payload = self.conn.read_frame()
                self.conn.handle_frame(ftype, flags, sid, payload, lambda *a: None)
        except Exception:
            # not just ConnectionClosed/OSError: an HpackError (or any
            # decode error) must also tear the connection down, else every
            # pending read_message waiter blocks until its own timeout
            self.conn.close()

    def _new_stream(self):
        with self._sid_lock:
            sid = self._next_sid
            self._next_sid += 2
        return sid, self.conn.get_stream(sid)

    def _start_call(self, path: str, body: bytes, end_stream: bool = True):
        sid, stream = self._new_stream()
        headers = [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", self.authority),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
            *self.metadata,
        ]
        self.conn.send_headers(sid, headers)
        self.conn.send_data(sid, b"\x00" + struct.pack(">I", len(body)) + body, end_stream=end_stream)
        return sid, stream

    def _check_trailers(self, stream) -> None:
        meta = dict(stream.headers) | dict(stream.trailers)
        code = int(meta.get("grpc-status", "0"))
        if code != 0:
            # grpc-message is percent-encoded UTF-8 per the gRPC spec
            from urllib.parse import unquote

            raise GrpcError(code, unquote(meta.get("grpc-message", "")))

    def call(self, path: str, req_desc, resp_desc, request: dict, timeout: float = 30.0) -> dict:
        sid, stream = self._start_call(path, proto.encode(req_desc, request))
        msg = stream.read_message(timeout=timeout)
        if msg is None:
            self._check_trailers(stream)
            raise GrpcError(2, "stream ended without a response message")
        # drain to end-of-stream so trailers are in
        while stream.read_message(timeout=timeout) is not None:
            pass
        self._check_trailers(stream)
        self.conn.release_stream(sid)
        return proto.decode(resp_desc, msg)

    # ------------------------------------------------------- NSDb surface
    def insert_bit(self, request: dict) -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.NSDBServiceSQL/InsertBit",
                         proto.RPC_INSERT, proto.RPC_INSERT_RESULT, request)

    def execute_sql(self, db: str, namespace: str, statement: str, metric: str = "") -> dict:
        return self.call(
            "/io.radicalbit.nsdb.rpc.NSDBServiceSQL/executeSQLStatement",
            proto.SQL_REQUEST_STATEMENT, proto.SQL_STATEMENT_RESPONSE,
            {"db": db, "namespace": namespace, "metric": metric, "statement": statement},
        )

    def show_namespaces(self, db: str) -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.NSDBServiceCommand/showNamespaces",
                         proto.SHOW_NAMESPACES, proto.NAMESPACES, {"db": db})

    def show_metrics(self, db: str, namespace: str) -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.NSDBServiceCommand/showMetrics",
                         proto.SHOW_METRICS, proto.METRICS_GOT,
                         {"db": db, "namespace": namespace})

    def describe_metric(self, db: str, namespace: str, metric: str) -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.NSDBServiceCommand/describeMetric",
                         proto.DESCRIBE_METRIC, proto.DESCRIBE_METRIC_RESPONSE,
                         {"db": db, "namespace": namespace, "metric": metric})

    def health_check(self, service: str = "") -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.Health/Check",
                         proto.HEALTH_CHECK_REQUEST, proto.HEALTH_CHECK_RESPONSE,
                         {"service": service})

    def init_metric(self, db: str, namespace: str, metric: str,
                    shard_interval: str = "", retention: str = "") -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.InitMetric/InitMetric",
                         proto.INIT_METRIC_REQUEST, proto.INIT_METRIC_RESPONSE,
                         {"db": db, "namespace": namespace, "metric": metric,
                          "shardInterval": shard_interval, "retention": retention})

    def restore(self, source_path: str) -> dict:
        return self.call("/io.radicalbit.nsdb.rpc.Restore/Restore",
                         proto.RESTORE_REQUEST, proto.RESTORE_RESPONSE,
                         {"sourcePath": source_path})

    def stream_sql(self, db: str, namespace: str, statement: str):
        """Open streamSQL; returns (stream_handle, next_fn, cancel_fn).
        next_fn(timeout) → decoded SQLStreamingResponse dict or None."""
        body = proto.encode(proto.SQL_REQUEST_STATEMENT,
                            {"db": db, "namespace": namespace, "statement": statement})
        sid, stream = self._start_call(
            "/io.radicalbit.nsdb.rpc.NSDbStreaming/streamSQL", body)

        def next_msg(timeout: float = 10.0):
            msg = stream.read_message(timeout=timeout)
            return None if msg is None else proto.decode(proto.SQL_STREAMING_RESPONSE, msg)

        def cancel() -> None:
            self.conn.send_frame(RST_STREAM, 0, sid, struct.pack(">I", 8))  # CANCEL
            self.conn.release_stream(sid)

        return stream, next_msg, cancel

    def close(self) -> None:
        self.conn.close()
