"""HPACK (RFC 7541) header compression — stdlib-only.

Decoder: full instruction set (indexed, literal with/without/never
indexing, dynamic-table size update), dynamic table with eviction, and
Huffman decoding for the printable-ASCII portion of the RFC 7541
Appendix B code (the symbols HTTP/2 header names/values use in practice;
gRPC metadata is ASCII, binary metadata travels base64 in `-bin` keys).
A Huffman code outside the embedded table raises HpackError → the
connection answers COMPRESSION_ERROR, per RFC 7541 §5.2.

Encoder: emits literal header fields without indexing, using an indexed
*name* when the static table has it and raw (non-Huffman) string
literals otherwise — always-valid HPACK that keeps the encoder stateless
(no dynamic-table synchronization with the peer).

The decode path is validated in tests against the published RFC 7541
Appendix C vectors (C.2.1, C.3.1-3, C.4.1-3, C.6.1), which exercise both
the plain and the Huffman-coded literal forms plus dynamic-table
indexing/eviction.
"""
from __future__ import annotations


class HpackError(ValueError):
    pass


# RFC 7541 Appendix A — static table (index 1..61).
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]

_STATIC_NAME_IDX = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE, start=1):
    _STATIC_NAME_IDX.setdefault(_n, _i)

# RFC 7541 Appendix B — Huffman code for the symbols that occur in header
# text: printable ASCII. (code, bit-length) per symbol. Verified against
# the Appendix C encoded vectors in tests/test_grpc.py.
_HUFFMAN_CODES: dict[int, tuple[int, int]] = {
    ord("0"): (0x0, 5), ord("1"): (0x1, 5), ord("2"): (0x2, 5),
    ord("a"): (0x3, 5), ord("c"): (0x4, 5), ord("e"): (0x5, 5),
    ord("i"): (0x6, 5), ord("o"): (0x7, 5), ord("s"): (0x8, 5),
    ord("t"): (0x9, 5),
    ord(" "): (0x14, 6), ord("%"): (0x15, 6), ord("-"): (0x16, 6),
    ord("."): (0x17, 6), ord("/"): (0x18, 6), ord("3"): (0x19, 6),
    ord("4"): (0x1A, 6), ord("5"): (0x1B, 6), ord("6"): (0x1C, 6),
    ord("7"): (0x1D, 6), ord("8"): (0x1E, 6), ord("9"): (0x1F, 6),
    ord("="): (0x20, 6), ord("A"): (0x21, 6), ord("_"): (0x22, 6),
    ord("b"): (0x23, 6), ord("d"): (0x24, 6), ord("f"): (0x25, 6),
    ord("g"): (0x26, 6), ord("h"): (0x27, 6), ord("l"): (0x28, 6),
    ord("m"): (0x29, 6), ord("n"): (0x2A, 6), ord("p"): (0x2B, 6),
    ord("r"): (0x2C, 6), ord("u"): (0x2D, 6),
    ord(":"): (0x5C, 7), ord("B"): (0x5D, 7), ord("C"): (0x5E, 7),
    ord("D"): (0x5F, 7), ord("E"): (0x60, 7), ord("F"): (0x61, 7),
    ord("G"): (0x62, 7), ord("H"): (0x63, 7), ord("I"): (0x64, 7),
    ord("J"): (0x65, 7), ord("K"): (0x66, 7), ord("L"): (0x67, 7),
    ord("M"): (0x68, 7), ord("N"): (0x69, 7), ord("O"): (0x6A, 7),
    ord("P"): (0x6B, 7), ord("Q"): (0x6C, 7), ord("R"): (0x6D, 7),
    ord("S"): (0x6E, 7), ord("T"): (0x6F, 7), ord("U"): (0x70, 7),
    ord("V"): (0x71, 7), ord("W"): (0x72, 7), ord("Y"): (0x73, 7),
    ord("j"): (0x74, 7), ord("k"): (0x75, 7), ord("q"): (0x76, 7),
    ord("v"): (0x77, 7), ord("w"): (0x78, 7), ord("x"): (0x79, 7),
    ord("y"): (0x7A, 7), ord("z"): (0x7B, 7),
    ord("&"): (0xF8, 8), ord("*"): (0xF9, 8), ord(","): (0xFA, 8),
    ord(";"): (0xFB, 8), ord("X"): (0xFC, 8), ord("Z"): (0xFD, 8),
    ord("!"): (0x3F8, 10), ord('"'): (0x3F9, 10), ord("("): (0x3FA, 10),
    ord(")"): (0x3FB, 10), ord("?"): (0x3FC, 10),
    ord("'"): (0x7FA, 11), ord("+"): (0x7FB, 11), ord("|"): (0x7FC, 11),
    ord("#"): (0xFFA, 12), ord(">"): (0xFFB, 12),
    0: (0x1FF8, 13), ord("$"): (0x1FF9, 13), ord("@"): (0x1FFA, 13),
    ord("["): (0x1FFB, 13), ord("]"): (0x1FFC, 13), ord("~"): (0x1FFD, 13),
    ord("^"): (0x3FFC, 14), ord("}"): (0x3FFD, 14),
    ord("<"): (0x7FFC, 15), ord("`"): (0x7FFD, 15), ord("{"): (0x7FFE, 15),
}
_HUFFMAN_DECODE = {(code, bits): sym for sym, (code, bits) in _HUFFMAN_CODES.items()}
_MIN_BITS = 5
_MAX_BITS = 15
_EOS_PREFIX_OK = 30  # all-ones padding ≤7 bits is a prefix of the 30-bit EOS


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= _MIN_BITS:
            matched = False
            for ln in range(_MIN_BITS, min(nbits, _MAX_BITS) + 1):
                code = acc >> (nbits - ln)
                sym = _HUFFMAN_DECODE.get((code, ln))
                if sym is not None:
                    out.append(sym)
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    matched = True
                    break
            if not matched:
                if nbits > _MAX_BITS:
                    raise HpackError("Huffman code outside the embedded printable-ASCII table")
                break  # need more bits
    # Remaining bits must be a (≤7-bit) all-ones EOS prefix (RFC 7541 §5.2)
    if nbits > 7 or acc != (1 << nbits) - 1:
        raise HpackError("invalid Huffman padding")
    return bytes(out)


def _read_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    """RFC 7541 §5.1 integer decoding."""
    mask = (1 << prefix_bits) - 1
    val = data[pos] & mask
    pos += 1
    if val < mask:
        return val, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise HpackError("truncated integer")
        b = data[pos]
        pos += 1
        val += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return val, pos
        if shift > 35:
            raise HpackError("integer too large")


def _write_int(val: int, prefix_bits: int, first_byte: int, out: bytearray) -> None:
    mask = (1 << prefix_bits) - 1
    if val < mask:
        out.append(first_byte | val)
        return
    out.append(first_byte | mask)
    val -= mask
    while val >= 0x80:
        out.append((val & 0x7F) | 0x80)
        val >>= 7
    out.append(val)


def _read_string(data: bytes, pos: int) -> tuple[str, int]:
    if pos >= len(data):
        raise HpackError("truncated string")
    huff = bool(data[pos] & 0x80)
    ln, pos = _read_int(data, pos, 7)
    raw = data[pos : pos + ln]
    if len(raw) != ln:
        raise HpackError("truncated string literal")
    pos += ln
    if huff:
        raw = huffman_decode(raw)
    return raw.decode("latin-1"), pos


class Decoder:
    """Per-connection HPACK decoding context (dynamic table + max size)."""

    def __init__(self, max_table_size: int = 4096):
        self.max_size = max_table_size
        self.protocol_max = max_table_size
        self.table: list[tuple[str, str]] = []  # newest first
        self.size = 0

    def _entry_size(self, name: str, value: str) -> int:
        return len(name) + len(value) + 32  # RFC 7541 §4.1

    def _evict(self) -> None:
        while self.size > self.max_size and self.table:
            n, v = self.table.pop()
            self.size -= self._entry_size(n, v)

    def _add(self, name: str, value: str) -> None:
        self.table.insert(0, (name, value))
        self.size += self._entry_size(name, value)
        self._evict()

    def _lookup(self, idx: int) -> tuple[str, str]:
        if idx <= 0:
            raise HpackError("index 0 is invalid")
        if idx <= len(STATIC_TABLE):
            return STATIC_TABLE[idx - 1]
        didx = idx - len(STATIC_TABLE) - 1
        if didx >= len(self.table):
            raise HpackError(f"index {idx} beyond tables")
        return self.table[didx]

    def decode(self, data: bytes) -> list[tuple[str, str]]:
        headers: list[tuple[str, str]] = []
        pos = 0
        while pos < len(data):
            b = data[pos]
            if b & 0x80:  # indexed header field
                idx, pos = _read_int(data, pos, 7)
                headers.append(self._lookup(idx))
            elif b & 0x40:  # literal with incremental indexing
                idx, pos = _read_int(data, pos, 6)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _read_string(data, pos)
                value, pos = _read_string(data, pos)
                self._add(name, value)
                headers.append((name, value))
            elif b & 0x20:  # dynamic table size update
                new_size, pos = _read_int(data, pos, 5)
                if new_size > self.protocol_max:
                    raise HpackError("table size update beyond SETTINGS limit")
                self.max_size = new_size
                self._evict()
            else:  # literal without indexing (0x00) / never indexed (0x10)
                idx, pos = _read_int(data, pos, 4)
                name = self._lookup(idx)[0] if idx else None
                if name is None:
                    name, pos = _read_string(data, pos)
                value, pos = _read_string(data, pos)
                headers.append((name, value))
        return headers


class Encoder:
    """Stateless encoder: literal-without-indexing, raw string literals."""

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = _STATIC_NAME_IDX.get(name, 0)
            # exact static (name, value) match → pure indexed field
            exact = 0
            scan = idx
            while scan and scan <= len(STATIC_TABLE) and STATIC_TABLE[scan - 1][0] == name:
                if STATIC_TABLE[scan - 1][1] == value:
                    exact = scan
                    break
                scan += 1
            if exact:
                _write_int(exact, 7, 0x80, out)
                continue
            _write_int(idx, 4, 0x00, out)
            if not idx:
                raw = name.encode("latin-1")
                _write_int(len(raw), 7, 0x00, out)
                out += raw
            raw = value.encode("latin-1")
            _write_int(len(raw), 7, 0x00, out)
            out += raw
        return bytes(out)
