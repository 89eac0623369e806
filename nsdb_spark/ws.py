"""RFC 6455 WebSocket transport for query subscriptions — stdlib only.

Wire parity with the reference's /ws-stream (WsResources.scala:45-160,
docs/Websocket.md):

- upgrade at GET /ws-stream?refresh_period=N&retention_size=M; a period
  below the configured floor is rejected 400 BEFORE the upgrade
  (WsResources.scala:157-160); the first requested subprotocol is echoed
  back and doubles as the security payload
  (extractWsSecurityPayload).
- the client sends a RegisterQuery JSON text frame {db, namespace,
  metric, queryString, from?, to?, filters?} — from/to/filters are ANDed
  into the statement exactly like POST /query (engine.enrich_statement).
- success answer: {"queryString", "quid", "records": historical}; then
  every matching insert is pushed as {"quid", "metric", "records"}.
- invalid query / failed auth: {"db", "namespace", "metric",
  "queryString", "reason"} (SubscriptionByQueryStringFailed).
- refresh_period batches pushes: per-quid buffers flush at most once per
  period (StreamActor's publish cycle); retention_size bounds each
  buffer, dropping new records beyond it (OverflowStrategy.dropNew).

Framing: text/close/ping frames handled; masked client payloads are
unmasked per RFC 6455 §5.3; server frames sent unmasked.
"""
from __future__ import annotations

import base64
import hashlib
import json
import struct
import threading
import time

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x8, 0x9, 0xA


#: max accepted frame payload (16 MiB) — a client-declared 64-bit length
#: must never drive the server's allocation
MAX_FRAME_BYTES = 16 * 1024 * 1024


class FrameTooLarge(Exception):
    def __init__(self, n: int):
        super().__init__(f"frame payload of {n} bytes exceeds {MAX_FRAME_BYTES}")
        self.n = n


def accept_key(sec_websocket_key: str) -> str:
    digest = hashlib.sha1((sec_websocket_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(opcode: int, payload: bytes, mask: bool = False, fin: bool = True) -> bytes:
    """One frame (FIN set unless fin=False for fragmented messages).
    Servers send unmasked; test clients pass mask=True."""
    head = bytes([(0x80 if fin else 0x00) | opcode])
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < (1 << 16):
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if mask:
        key = struct.pack(">I", (hash((id(payload), n, time.monotonic())) & 0xFFFFFFFF))
        masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return head + key + masked
    return head + payload


def read_frame(rfile) -> tuple[int, bytes] | None:
    """(opcode, unmasked payload) of the next frame, None on EOF."""
    f = read_frame_ex(rfile)
    return None if f is None else (f[1], f[3])


def read_frame_ex(rfile) -> tuple[bool, int, bool, bytes] | None:
    """(fin, opcode, masked, unmasked payload) of the next frame."""
    h = rfile.read(2)
    if len(h) < 2:
        return None
    fin = bool(h[0] & 0x80)
    opcode = h[0] & 0x0F
    masked = bool(h[1] & 0x80)
    n = h[1] & 0x7F
    if n == 126:
        n = struct.unpack(">H", rfile.read(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", rfile.read(8))[0]
    if n > MAX_FRAME_BYTES:
        # a 10-byte header may not demand an arbitrary allocation
        # (RFC 6455 servers enforce a max message size — 1009 close)
        raise FrameTooLarge(n)
    key = rfile.read(4) if masked else None
    payload = rfile.read(n) if n else b""
    if masked and key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return fin, opcode, masked, payload


class WsSession:
    """One upgraded connection: register-queries in, pushes out."""

    def __init__(
        self,
        connection,
        rfile,
        engine,
        subs,
        refresh_period_ms: int,
        retention_size: int,
        subprotocols: list[str],
        auth=None,
    ) -> None:
        self.connection = connection
        self.rfile = rfile
        self.engine = engine
        self.subs = subs
        self.refresh_period_ms = refresh_period_ms
        self.retention_size = retention_size
        self.subprotocols = subprotocols
        self.auth = auth
        self.quids: list[str] = []
        self.metric_of: dict[str, str] = {}
        self.buffers: dict[str, list[dict]] = {}
        self.lock = threading.Lock()
        self.closed = threading.Event()

    # ------------------------------------------------------------ sending
    def _send_json(self, payload: dict) -> None:
        data = encode_frame(OP_TEXT, json.dumps(payload).encode())
        with self.lock:
            try:
                self.connection.sendall(data)
            except OSError:
                self.closed.set()

    def _flusher(self) -> None:
        """Per-quid buffered pushes, at most one message per quid per
        refresh period (StreamActor publish cycle)."""
        while not self.closed.wait(self.refresh_period_ms / 1000.0):
            for quid in list(self.buffers):
                with self.lock:
                    records = self.buffers.get(quid)
                    if records:
                        self.buffers[quid] = []
                    else:
                        continue
                self._send_json(
                    {"quid": quid, "metric": self.metric_of.get(quid), "records": records}
                )

    # ------------------------------------------------------------ protocol
    def _register(self, req: dict) -> None:
        db = req.get("db", "default")
        ns = req.get("namespace", "default")
        metric = req.get("metric", "")
        qs = req.get("queryString", "")

        def fail(reason: str) -> None:
            self._send_json(
                {"db": db, "namespace": ns, "metric": metric,
                 "queryString": qs, "reason": reason}
            )

        if self.auth is not None:
            # gate on the metric the statement EXECUTES against, not the
            # client-supplied metric field (same rule as HTTP /query)
            try:
                from .sql.parser import parse as _parse

                exec_metric = _parse(qs).metric
            except Exception:
                exec_metric = metric
            payload = self.auth.extract_ws_security_payload(self.subprotocols)
            res = self.auth.check_metric_auth(db, ns, exec_metric, payload, False)
            if not res.success:
                fail(f"unauthorized {res.fail_reason}")
                return
        try:
            filters = [
                (f["dimension"], f["value"], f["operator"])
                for f in req.get("filters") or []
            ]
            stmt = self.engine.enrich_statement(
                qs, db=db, ns=ns,
                from_ts=req.get("from"), to_ts=req.get("to"), filters=filters,
            )
        except Exception as e:
            fail(f"{type(e).__name__}: {e}")
            return

        first: list = []
        pending: list = []
        pending_lock = threading.Lock()
        quid_ready = threading.Event()

        def _buffer(quid: str, records: list[dict]) -> None:
            with self.lock:
                buf = self.buffers.setdefault(quid, [])
                room = self.retention_size - len(buf)
                if room > 0:
                    buf.extend(records[:room])  # dropNew beyond retention

        def cb(records: list[dict]) -> None:
            if not first:
                first.append(records)
                return
            # subscribe() flushes batches buffered during the historical
            # scan through this callback INLINE, on the registration
            # thread — quid isn't assigned yet, and blocking here would
            # deadlock registration. Park them and flush after the quid
            # exists; a live publisher racing registration takes the same
            # path (double-checked under pending_lock so nothing lands in
            # an already-drained list).
            if not quid_ready.is_set():
                with pending_lock:
                    if not quid_ready.is_set():
                        pending.append(records)
                        return
            _buffer(cb_quid[0], records)

        cb_quid: list[str] = []
        try:
            quid = self.subs.subscribe(qs, cb, db=db, ns=ns, statement=stmt)
        except Exception as e:
            fail(f"{type(e).__name__}: {e}")
            return
        cb_quid.append(quid)
        self.quids.append(quid)
        self.metric_of[quid] = stmt.metric
        # the registration ANSWER must go out before the buffer path
        # opens: the flusher wakes every refresh period, and a live push
        # delivered first would carry a quid the client has never seen
        # (and, before metric_of was set above, a null metric)
        self._send_json(
            {"queryString": qs, "quid": quid, "records": first[0] if first else []}
        )
        # flush parked batches and only THEN open the direct path, inside
        # one critical section: setting quid_ready before the flush would
        # let a racing publisher buffer a newer batch ahead of older
        # parked ones (out-of-order delivery to the client)
        with pending_lock:
            for records in pending:
                _buffer(quid, records)
            pending.clear()
            quid_ready.set()

    def run(self) -> None:
        flusher = threading.Thread(target=self._flusher, daemon=True)
        flusher.start()
        fragments: list[bytes] = []
        try:
            while not self.closed.is_set():
                try:
                    frame = read_frame_ex(self.rfile)
                except FrameTooLarge:
                    with self.lock:
                        try:
                            self.connection.sendall(
                                encode_frame(OP_CLOSE, struct.pack(">H", 1009))
                            )
                        except OSError:
                            pass
                    break
                if frame is None:
                    break
                fin, opcode, masked, payload = frame
                if opcode == OP_CLOSE:
                    with self.lock:
                        try:
                            self.connection.sendall(encode_frame(OP_CLOSE, payload[:2]))
                        except OSError:
                            pass
                    break
                if opcode == OP_PING:
                    with self.lock:
                        try:
                            self.connection.sendall(encode_frame(OP_PONG, payload))
                        except OSError:
                            # peer vanished mid-ping: end the session
                            # cleanly like every other guarded send — an
                            # unguarded raise would bubble into do_GET's
                            # handler, which writes an HTTP 400 onto the
                            # already-upgraded (dead) socket
                            self.closed.set()
                            break
                    continue
                if opcode == OP_PONG:
                    continue
                if opcode in (OP_TEXT, OP_CONT):
                    # RFC 6455 §5.1: client data frames MUST be masked —
                    # protocol-error close 1002 otherwise
                    if not masked:
                        with self.lock:
                            try:
                                self.connection.sendall(
                                    encode_frame(OP_CLOSE, struct.pack(">H", 1002))
                                )
                            except OSError:
                                pass
                        break
                    if opcode == OP_CONT and not fragments:
                        continue  # stray continuation: drop
                    fragments.append(payload)
                    if not fin:
                        continue  # wait for the rest of the message
                    data, fragments = b"".join(fragments), []
                    try:
                        req = json.loads(data.decode())
                    except Exception:
                        self._send_json({"reason": f"Message {data[:80]!r} not handled by receiver"})
                        continue
                    self._register(req)
        finally:
            self.closed.set()
            for quid in self.quids:
                self.subs.unsubscribe(quid)
