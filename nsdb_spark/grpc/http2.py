"""Minimal HTTP/2 (RFC 7540) framing layer — stdlib sockets only.

Implements the subset a gRPC endpoint needs: connection preface,
SETTINGS exchange + ack, HEADERS (+CONTINUATION, PADDED/PRIORITY flags),
DATA with both-direction flow control (connection + stream windows,
WINDOW_UPDATE), PING ack, RST_STREAM, GOAWAY. Frames are read by one
reader thread per connection; writes are serialized by a lock and DATA
writes block on the peer's flow-control windows.

Used by `nsdb_spark.grpc.server` (accept side) and
`nsdb_spark.grpc.client` (test client). The layer is transport-only —
gRPC message framing and semantics live in server.py/client.py.
"""
from __future__ import annotations

import socket
import struct
import threading

from .hpack import Decoder, Encoder, HpackError

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS, PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = range(10)

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5

DEFAULT_WINDOW = 65535
#: per-stream receive-buffer cap: stop replenishing the stream window once
#: Stream.body holds this much unconsumed COMPLETE-message data (gRPC
#: messages here are dashboard-sized; 4 MiB is generous for any legitimate
#: insert batch). Withheld window bytes are repaid when the consumer
#: drains the buffer.
MAX_BUFFERED_BODY = 4 * 1024 * 1024
#: absolute single-message ceiling: a peer declaring a larger gRPC message
#: (or streaming one without ever completing it) is killed with
#: FLOW_CONTROL_ERROR rather than buffered — the in-flight-message
#: exemption above must not become an unbounded-memory loophole
MAX_MESSAGE_SIZE = 64 * 1024 * 1024

# RFC 7540 §7 error codes we emit
ERR_PROTOCOL = 0x1
ERR_FLOW_CONTROL = 0x3
ERR_FRAME_SIZE = 0x6
ERR_COMPRESSION = 0x9


class ConnectionClosed(Exception):
    pass


class UnsupportedCompression(Exception):
    """gRPC message arrived with the compressed flag set but no
    grpc-encoding was negotiated (we never negotiate one)."""


class Stream:
    """Receive-side state of one HTTP/2 stream."""

    def __init__(self, sid: int):
        self.sid = sid
        self.headers: list[tuple[str, str]] = []
        self.trailers: list[tuple[str, str]] = []
        self.body = bytearray()
        self.body_cond = threading.Condition()
        self.end_stream = False
        self.reset = False
        # send-side flow-control window (peer's receive budget for us)
        self.send_window = DEFAULT_WINDOW
        # receive-side backpressure bookkeeping: bytes whose stream-window
        # replenishment was withheld while the buffer sat over the cap —
        # repaid when read_message drains the buffer (set by the owning
        # Http2Connection so a consumer catching up un-stalls the peer)
        self.withheld = 0
        # offset of the first not-fully-buffered message in `body` — the
        # flow-control decision resumes its message-boundary walk here
        # instead of rescanning the whole buffer on every DATA frame
        # (body is append-only between read_message pops)
        self.scan_off = 0
        self._conn: "Http2Connection | None" = None

    def feed(self, data: bytes, end: bool) -> None:
        with self.body_cond:
            self.body += data
            if end:
                self.end_stream = True
            self.body_cond.notify_all()

    def close_recv(self) -> None:
        with self.body_cond:
            self.end_stream = True
            self.body_cond.notify_all()

    def mark_reset(self) -> None:
        with self.body_cond:
            self.reset = True
            self.end_stream = True
            self.body_cond.notify_all()

    def read_message(self, timeout: float | None = None):
        """Pop one length-prefixed gRPC message (flag + 4-byte len) from
        the body buffer; None at clean end-of-stream. Withheld window
        repayment is decided under body_cond but SENT after releasing it
        — a blocking send while holding the condition would wedge every
        other consumer of this stream behind a peer that stopped
        reading."""
        msg, repay = None, 0
        with self.body_cond:
            while True:
                if len(self.body) >= 5:
                    if self.body[0] not in (0,):
                        raise UnsupportedCompression(
                            "compressed gRPC message without negotiated encoding"
                        )
                    ln = struct.unpack(">I", self.body[1:5])[0]
                    if len(self.body) >= 5 + ln:
                        msg = bytes(self.body[5 : 5 + ln])
                        del self.body[: 5 + ln]
                        self.scan_off = max(0, self.scan_off - (5 + ln))
                        repay = self._drain_repay_locked()
                        break
                if self.end_stream:
                    break
                if not self.body_cond.wait(timeout=timeout):
                    raise TimeoutError("no gRPC message within timeout")
        if repay:
            self._send_repay(repay)
        return msg

    def _drain_repay_locked(self) -> int:
        """Withheld stream-window bytes to grant back once the consumer
        has drained the buffer below the cap — without this, a reader
        that temporarily fell behind would leave the peer stalled at a
        permanent window deficit. Called under body_cond; returns the
        byte count for the caller to send AFTER releasing the lock."""
        if (
            self.withheld > 0
            and len(self.body) <= MAX_BUFFERED_BODY
            and self._conn is not None
            and not self.reset
        ):
            n, self.withheld = self.withheld, 0
            return n
        return 0

    def _send_repay(self, n: int) -> None:
        try:
            self._conn.send_frame(
                WINDOW_UPDATE, 0, self.sid, struct.pack(">I", n)
            )
        except (OSError, ConnectionClosed):  # peer already gone
            pass


class Http2Connection:
    """Frame I/O over one socket. `is_server` flips preface handling."""

    def __init__(self, sock: socket.socket, is_server: bool):
        self.sock = sock
        # a unary RPC response is 3+ separate sends (HEADERS, DATA,
        # trailers) — with Nagle on, the later sends stall behind the
        # peer's delayed ACK (~40 ms/rpc on loopback). gRPC over HTTP/2
        # does its own buffering; disable Nagle like every gRPC runtime.
        try:
            sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        except OSError:  # pragma: no cover - non-TCP test doubles
            pass
        self.is_server = is_server
        self.write_lock = threading.Lock()
        self.hpack_dec = Decoder()
        self.hpack_enc = Encoder()
        self.streams: dict[int, Stream] = {}
        self.streams_lock = threading.Lock()
        self.send_window = DEFAULT_WINDOW
        self.window_cond = threading.Condition()
        self.peer_max_frame = 16384
        self.peer_initial_window = DEFAULT_WINDOW
        self.closed = False
        self._recv_consumed_conn = 0
        self._pending_header_block: bytearray | None = None
        self._pending_header_sid = 0
        self._pending_header_flags = 0

    # ------------------------------------------------------------ raw I/O
    def _read_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionClosed()
            buf += chunk
        return bytes(buf)

    def read_frame(self) -> tuple[int, int, int, bytes]:
        hdr = self._read_exact(9)
        length = int.from_bytes(hdr[:3], "big")
        ftype = hdr[3]
        flags = hdr[4]
        sid = int.from_bytes(hdr[5:9], "big") & 0x7FFFFFFF
        payload = self._read_exact(length) if length else b""
        return ftype, flags, sid, payload

    def send_frame(self, ftype: int, flags: int, sid: int, payload: bytes = b"") -> None:
        frame = len(payload).to_bytes(3, "big") + bytes([ftype, flags]) + sid.to_bytes(4, "big") + payload
        with self.write_lock:
            self.sock.sendall(frame)

    # ------------------------------------------------------------ helpers
    def send_settings(self, settings: dict[int, int] | None = None, ack: bool = False) -> None:
        payload = b"".join(struct.pack(">HI", k, v) for k, v in (settings or {}).items())
        self.send_frame(SETTINGS, FLAG_ACK if ack else 0, 0, payload)

    def send_headers(self, sid: int, headers: list[tuple[str, str]], end_stream: bool = False) -> None:
        block = self.hpack_enc.encode(headers)
        flags = FLAG_END_HEADERS | (FLAG_END_STREAM if end_stream else 0)
        self.send_frame(HEADERS, flags, sid, block)

    def send_data(self, sid: int, data: bytes, end_stream: bool = False) -> None:
        """Chunk by peer max-frame-size and block on flow-control windows."""
        stream = self.get_stream(sid)
        view = memoryview(data)
        offset = 0
        while offset < len(data) or (end_stream and len(data) == 0 and offset == 0):
            with self.window_cond:
                while not self.closed and (self.send_window <= 0 or stream.send_window <= 0) and len(data) > 0:
                    self.window_cond.wait(timeout=10.0)
                if self.closed:
                    raise ConnectionClosed()
                budget = min(self.peer_max_frame, self.send_window, stream.send_window) if len(data) else 0
                chunk = bytes(view[offset : offset + max(budget, 0)])
                self.send_window -= len(chunk)
                stream.send_window -= len(chunk)
            offset += len(chunk)
            last = offset >= len(data)
            self.send_frame(DATA, FLAG_END_STREAM if (end_stream and last) else 0, sid, chunk)
            if last:
                return

    def get_stream(self, sid: int) -> Stream:
        with self.streams_lock:
            st = self.streams.get(sid)
            if st is None:
                st = Stream(sid)
                st.send_window = self.peer_initial_window
                st._conn = self
                self.streams[sid] = st
            return st

    def release_stream(self, sid: int) -> None:
        with self.streams_lock:
            self.streams.pop(sid, None)

    def goaway(self, last_sid: int, code: int) -> None:
        try:
            self.send_frame(GOAWAY, 0, 0, struct.pack(">II", last_sid, code))
        except OSError:
            pass

    def close(self) -> None:
        with self.window_cond:
            self.closed = True
            self.window_cond.notify_all()
        # wake every blocked read_message waiter — a reader-thread death
        # (e.g. an HPACK decode error) must fail pending calls NOW, not
        # after each one's own timeout
        with self.streams_lock:
            streams = list(self.streams.values())
        for st in streams:
            st.mark_reset()
        try:
            self.sock.close()
        except OSError:
            pass

    # ----------------------------------------------------- frame dispatch
    def handle_frame(self, ftype: int, flags: int, sid: int, payload: bytes, on_headers) -> None:
        """Shared receive-side dispatch. `on_headers(stream, headers,
        end_stream, is_trailers)` fires when a header block completes."""
        if self._pending_header_block is not None and ftype != CONTINUATION:
            raise HpackError("header block interleaved with other frames")
        if ftype == SETTINGS:
            if flags & FLAG_ACK:
                return
            for i in range(0, len(payload) - 5, 6):
                k, v = struct.unpack(">HI", payload[i : i + 6])
                if k == SETTINGS_MAX_FRAME_SIZE:
                    self.peer_max_frame = max(16384, min(v, (1 << 24) - 1))
                elif k == SETTINGS_INITIAL_WINDOW_SIZE:
                    with self.window_cond:
                        delta = v - self.peer_initial_window
                        self.peer_initial_window = v
                        with self.streams_lock:
                            for st in self.streams.values():
                                st.send_window += delta
                        self.window_cond.notify_all()
                elif k == SETTINGS_HEADER_TABLE_SIZE:
                    # RFC 7541 §4.2: the peer's SETTINGS_HEADER_TABLE_SIZE
                    # bounds the table OUR ENCODER may use toward the peer
                    # (our encoder is stateless, so nothing to do); our
                    # DECODER is bounded by the size WE advertised (4096
                    # default). Applying the peer's value to the decoder
                    # let a peer arbitrarily raise our memory cap or force
                    # spurious COMPRESSION_ERRORs on valid size updates.
                    pass
            self.send_settings(ack=True)
        elif ftype == PING:
            if not flags & FLAG_ACK:
                self.send_frame(PING, FLAG_ACK, 0, payload)
        elif ftype == WINDOW_UPDATE:
            inc = struct.unpack(">I", payload)[0] & 0x7FFFFFFF
            with self.window_cond:
                if sid == 0:
                    self.send_window += inc
                else:
                    self.get_stream(sid).send_window += inc
                self.window_cond.notify_all()
        elif ftype == HEADERS:
            body = payload
            if flags & FLAG_PADDED:
                pad = body[0]
                body = body[1:-pad] if pad else body[1:]
            if flags & FLAG_PRIORITY:
                body = body[5:]
            if flags & FLAG_END_HEADERS:
                self._complete_headers(sid, body, flags, on_headers)
            else:
                self._pending_header_block = bytearray(body)
                self._pending_header_sid = sid
                self._pending_header_flags = flags
        elif ftype == CONTINUATION:
            if self._pending_header_block is None or sid != self._pending_header_sid:
                raise HpackError("unexpected CONTINUATION")
            # CONTINUATION flood guard: header blocks here are a handful of
            # small gRPC headers; an endless un-END_HEADERS'd stream of
            # CONTINUATION frames must not grow driver memory unboundedly
            if len(self._pending_header_block) + len(payload) > 64 * 1024:
                raise HpackError("header block exceeds 64 KiB")
            self._pending_header_block += payload
            if flags & FLAG_END_HEADERS:
                block = bytes(self._pending_header_block)
                hflags = self._pending_header_flags
                self._pending_header_block = None
                self._complete_headers(sid, block, hflags, on_headers)
        elif ftype == DATA:
            body = payload
            if flags & FLAG_PADDED:
                pad = body[0]
                body = body[1:-pad] if pad else body[1:]
            st = self.get_stream(sid)
            st.feed(body, bool(flags & FLAG_END_STREAM))
            # replenish receive windows for the full frame (incl. padding).
            # The CONNECTION window always replenishes (one flooding stream
            # must not starve the others). The STREAM window withholds its
            # replenishment only while the buffer BOTH exceeds the cap AND
            # ends on a message boundary (all buffered messages complete
            # and unconsumed) — a legitimately large message still in
            # flight leaves a PARTIAL tail, even behind earlier small
            # unread messages, and keeps flowing. Withheld bytes are
            # repaid when read_message drains the buffer, so a
            # slow-but-live consumer un-stalls its peer. Exceeding
            # cap + 2 windows (or the 64 MiB message ceiling) is a
            # flow-control violation → RST_STREAM. The decision is made
            # under body_cond but frames are sent AFTER releasing it —
            # a blocking send under the condition would wedge every
            # read_message consumer behind a peer that stopped reading.
            if payload:
                self.send_frame(WINDOW_UPDATE, 0, 0, struct.pack(">I", len(payload)))
                if not flags & FLAG_END_STREAM:
                    action = self._stream_window_decision(st, len(payload))
                    if action == "rst":
                        self.send_frame(
                            RST_STREAM, 0, sid,
                            struct.pack(">I", ERR_FLOW_CONTROL),
                        )
                        st.mark_reset()
                        return
                    if action == "replenish":
                        self.send_frame(
                            WINDOW_UPDATE, 0, sid,
                            struct.pack(">I", len(payload)),
                        )
        elif ftype == RST_STREAM:
            with self.streams_lock:
                st = self.streams.get(sid)
            if st is not None:
                st.mark_reset()
        elif ftype == GOAWAY:
            raise ConnectionClosed()
        # PRIORITY / PUSH_PROMISE / unknown frame types: ignored

    def _stream_window_decision(self, st: Stream, n: int) -> str:
        """Flow-control verdict for n freshly-buffered DATA bytes:
        'replenish' (grant the stream window back), 'withhold' (flood
        backpressure — repay on drain), or 'rst' (violation). Walks the
        buffer's message boundaries from the cached scan offset so a
        partial message ANYWHERE at the tail — including behind earlier
        complete-but-unread messages on a streaming RPC — is recognized
        as in-flight and exempted. No frames are sent here (called with
        body_cond held only long enough to decide)."""
        with st.body_cond:
            buffered = len(st.body)
            off = st.scan_off
            oversize = partial = False
            while off + 5 <= buffered:
                declared = int.from_bytes(st.body[off + 1 : off + 5], "big")
                if declared > MAX_MESSAGE_SIZE:
                    oversize = True
                    break
                if off + 5 + declared > buffered:
                    partial = True
                    break
                off += 5 + declared
            st.scan_off = off
            if not (oversize or partial) and off < buffered:
                partial = True  # a 1-4 byte length-prefix fragment
            if oversize or buffered > MAX_MESSAGE_SIZE + 5 + MAX_BUFFERED_BODY:
                return "rst"
            if buffered > MAX_BUFFERED_BODY and not partial:
                if buffered > MAX_BUFFERED_BODY + 2 * DEFAULT_WINDOW:
                    return "rst"
                st.withheld += n
                return "withhold"
            return "replenish"

    def _complete_headers(self, sid: int, block: bytes, flags: int, on_headers) -> None:
        headers = self.hpack_dec.decode(block)
        st = self.get_stream(sid)
        is_trailers = bool(st.headers)
        if is_trailers:
            st.trailers = headers
        else:
            st.headers = headers
        end = bool(flags & FLAG_END_STREAM)
        if end:
            st.close_recv()
        on_headers(st, headers, end, is_trailers)
