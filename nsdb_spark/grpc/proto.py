"""Hand-rolled proto3 wire codec for the NSDb gRPC surface.

The container has no `google.protobuf` / `grpcio`, so the reference's
protobuf messages (reference nsdb-rpc/src/main/protobuf/{common,request,
response,requestSQL,responseSQL,requestCommand,responseCommand,health,
init,restore,streaming}.proto) are encoded/decoded here with a small
descriptor-driven codec implementing the public protobuf wire format
(varint / 64-bit / length-delimited; proto3 implicit presence; maps as
repeated nested (key=1, value=2) entries; oneof = explicit presence).

Messages are plain dicts: `{"database": "db", "longValue": 3, ...}`.
Singular proto3 fields at their default value are omitted on the wire
(and may be absent after decode — use ``.get`` with the proto3 default);
oneof members are serialized whenever the key is present, even at the
zero value, which is how protobuf distinguishes `longValue: 0` from
"value not set".
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5

_U64 = 1 << 64


def write_varint(n: int, out: bytearray) -> None:
    if n < 0:
        n &= _U64 - 1  # two's-complement int64 → 10-byte varint
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _to_i64(u: int) -> int:
    return u - _U64 if u >= 1 << 63 else u


@dataclass(frozen=True)
class Field:
    """One field of a message descriptor.

    kind: 'string' | 'bytes' | 'int64' | 'int32' | 'bool' | 'double' |
          'enum' | 'message' | 'map'
    msg:  nested message descriptor for kind in ('message', 'map')
          (for 'map' it is the descriptor of the VALUE; keys are strings,
          the only map key type the NSDb protos use).
    oneof: name of the oneof group, or None. Presence of the dict key
          decides serialization for oneof members.
    """

    num: int
    name: str
    kind: str
    msg: "Message | None" = None
    repeated: bool = False
    oneof: str | None = None


@dataclass(frozen=True)
class Message:
    name: str
    fields: tuple[Field, ...]

    def by_num(self) -> dict[int, Field]:
        return {f.num: f for f in self.fields}

    def by_name(self) -> dict[str, Field]:
        return {f.name: f for f in self.fields}


_DEFAULTS = {"string": "", "bytes": b"", "int64": 0, "int32": 0, "bool": False, "double": 0.0, "enum": 0}


def _encode_scalar(f: Field, v, out: bytearray) -> None:
    if f.kind in ("int64", "int32", "enum"):
        write_varint((f.num << 3) | _WT_VARINT, out)
        write_varint(int(v), out)
    elif f.kind == "bool":
        write_varint((f.num << 3) | _WT_VARINT, out)
        write_varint(1 if v else 0, out)
    elif f.kind == "double":
        write_varint((f.num << 3) | _WT_FIXED64, out)
        out += struct.pack("<d", float(v))
    elif f.kind == "string":
        raw = v.encode("utf-8")
        write_varint((f.num << 3) | _WT_LEN, out)
        write_varint(len(raw), out)
        out += raw
    elif f.kind == "bytes":
        write_varint((f.num << 3) | _WT_LEN, out)
        write_varint(len(v), out)
        out += v
    else:  # pragma: no cover - descriptor bug
        raise TypeError(f"unknown scalar kind {f.kind}")


def encode(desc: Message, obj: dict) -> bytes:
    out = bytearray()
    for f in desc.fields:
        if f.name not in obj:
            continue
        v = obj[f.name]
        if v is None:
            continue
        if f.kind == "map":
            # map<string, V> = repeated entry{ key=1: string, value=2: V }
            for k in sorted(v):
                entry = bytearray()
                kf = Field(1, "key", "string")
                _encode_scalar(kf, k, entry)
                sub = encode(f.msg, v[k])
                write_varint((2 << 3) | _WT_LEN, entry)
                write_varint(len(sub), entry)
                entry += sub
                write_varint((f.num << 3) | _WT_LEN, out)
                write_varint(len(entry), out)
                out += entry
        elif f.kind == "message":
            items = v if f.repeated else [v]
            for item in items:
                sub = encode(f.msg, item)
                write_varint((f.num << 3) | _WT_LEN, out)
                write_varint(len(sub), out)
                out += sub
        else:
            items = v if f.repeated else [v]
            for item in items:
                if not f.repeated and f.oneof is None and item == _DEFAULTS[f.kind]:
                    continue  # proto3 implicit presence
                _encode_scalar(f, item, out)
    return bytes(out)


def _skip(wt: int, data: bytes, pos: int) -> int:
    if wt == _WT_VARINT:
        _, pos = read_varint(data, pos)
        return pos
    if wt == _WT_FIXED64:
        return pos + 8
    if wt == _WT_FIXED32:
        return pos + 4
    if wt == _WT_LEN:
        ln, pos = read_varint(data, pos)
        return pos + ln
    raise ValueError(f"unsupported wire type {wt}")


def decode(desc: Message, data: bytes) -> dict:
    by_num = desc.by_num()
    obj: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        f = by_num.get(num)
        if f is None:
            pos = _skip(wt, data, pos)
            continue
        if f.kind in ("int64", "int32", "enum", "bool"):
            raw, pos = read_varint(data, pos)
            v = bool(raw) if f.kind == "bool" else (_to_i64(raw) if f.kind == "int64" else raw)
        elif f.kind == "double":
            if pos + 8 > len(data):
                # keep the error contract uniform: malformed wire bytes
                # raise ValueError, never struct.error
                raise ValueError("truncated double field")
            v = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif f.kind in ("string", "bytes", "message", "map"):
            ln, pos = read_varint(data, pos)
            raw = data[pos : pos + ln]
            if len(raw) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
            if f.kind == "string":
                v = raw.decode("utf-8")
            elif f.kind == "bytes":
                v = raw
            elif f.kind == "message":
                v = decode(f.msg, raw)
            else:  # map entry
                entry = decode(_MAP_ENTRY_STR(f.msg), raw)
                obj.setdefault(f.name, {})[entry.get("key", "")] = entry.get("value", {})
                continue
        else:  # pragma: no cover - descriptor bug
            raise TypeError(f.kind)
        if f.repeated:
            obj.setdefault(f.name, []).append(v)
        else:
            if f.oneof is not None:
                # last oneof member on the wire wins; drop earlier siblings
                for sib in desc.fields:
                    if sib.oneof == f.oneof and sib.name in obj:
                        del obj[sib.name]
            obj[f.name] = v
    return obj


def _MAP_ENTRY_STR(value_desc: Message) -> Message:
    return Message("map_entry", (Field(1, "key", "string"), Field(2, "value", "message", value_desc)))


# --------------------------------------------------------------------------
# NSDb message descriptors (field numbers mirror the reference .proto files)
# --------------------------------------------------------------------------

# common.proto
DIMENSION = Message(
    "Dimension",
    (
        Field(1, "decimalValue", "double", oneof="value"),
        Field(2, "longValue", "int64", oneof="value"),
        Field(3, "stringValue", "string", oneof="value"),
    ),
)
TAG = Message(
    "Tag",
    (
        Field(1, "decimalValue", "double", oneof="value"),
        Field(2, "longValue", "int64", oneof="value"),
        Field(3, "stringValue", "string", oneof="value"),
    ),
)
BIT = Message(
    "Bit",
    (
        Field(1, "timestamp", "int64"),
        Field(2, "decimalValue", "double", oneof="value"),
        Field(3, "longValue", "int64", oneof="value"),
        Field(4, "dimensions", "map", DIMENSION),
        Field(5, "tags", "map", TAG),
    ),
)

# request.proto / response.proto
RPC_INSERT = Message(
    "RPCInsert",
    (
        Field(1, "database", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "timestamp", "int64"),
        Field(5, "decimalValue", "double", oneof="value"),
        Field(6, "longValue", "int64", oneof="value"),
        Field(7, "dimensions", "map", DIMENSION),
        Field(8, "tags", "map", TAG),
    ),
)
RPC_INSERT_RESULT = Message(
    "RPCInsertResult",
    (Field(1, "completedSuccessfully", "bool"), Field(2, "errors", "string")),
)

# requestSQL.proto / responseSQL.proto
SQL_REQUEST_STATEMENT = Message(
    "SQLRequestStatement",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "statement", "string"),
    ),
)
SQL_STATEMENT_RESPONSE = Message(
    "SQLStatementResponse",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "completedSuccessfully", "bool"),
        Field(5, "reason", "string"),
        Field(6, "message", "string"),
        Field(7, "records", "message", BIT, repeated=True),
    ),
)

# requestCommand.proto / responseCommand.proto
SHOW_NAMESPACES = Message("ShowNamespaces", (Field(1, "db", "string"),))
NAMESPACES = Message(
    "Namespaces",
    (
        Field(1, "db", "string"),
        Field(2, "namespaces", "string", repeated=True),
        Field(3, "completedSuccessfully", "bool"),
        Field(4, "errors", "string"),
    ),
)
SHOW_METRICS = Message(
    "ShowMetrics", (Field(1, "db", "string"), Field(2, "namespace", "string"))
)
METRICS_GOT = Message(
    "MetricsGot",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metrics", "string", repeated=True),
        Field(4, "completedSuccessfully", "bool"),
        Field(5, "errors", "string"),
    ),
)
DESCRIBE_METRIC = Message(
    "DescribeMetric",
    (Field(1, "db", "string"), Field(2, "namespace", "string"), Field(3, "metric", "string")),
)
METRIC_FIELD = Message(
    "MetricField",
    (
        Field(1, "name", "string"),
        Field(2, "fieldClassType", "enum"),  # TIMESTAMP=0 VALUE=1 DIMENSION=2 TAG=3
        Field(3, "indexType", "string"),
    ),
)
FIELD_CLASS_TYPE = {"TIMESTAMP": 0, "VALUE": 1, "DIMENSION": 2, "TAG": 3}
METRIC_INFO = Message(
    "MetricInfo", (Field(1, "shardInterval", "int64"), Field(2, "retention", "int64"))
)
DESCRIBE_METRIC_RESPONSE = Message(
    "DescribeMetricResponse",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "fields", "message", METRIC_FIELD, repeated=True),
        Field(5, "metricInfo", "message", METRIC_INFO),
        Field(6, "completedSuccessfully", "bool"),
        Field(7, "errors", "string"),
    ),
)

# health.proto (SERVING=1)
HEALTH_CHECK_REQUEST = Message("HealthCheckRequest", (Field(1, "service", "string"),))
HEALTH_CHECK_RESPONSE = Message("HealthCheckResponse", (Field(1, "status", "enum"),))
SERVING_STATUS = {"UNKNOWN": 0, "SERVING": 1, "NOT_SERVING": 2}

# init.proto (shardInterval / retention are duration STRINGS, e.g. "1d")
INIT_METRIC_REQUEST = Message(
    "InitMetricRequest",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "shardInterval", "string"),
        Field(5, "retention", "string"),
    ),
)
INIT_METRIC_RESPONSE = Message(
    "InitMetricResponse",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "completedSuccessfully", "bool"),
        Field(5, "errorMsg", "string"),
    ),
)

# restore.proto
RESTORE_REQUEST = Message("RestoreRequest", (Field(1, "sourcePath", "string"),))
RESTORE_RESPONSE = Message(
    "RestoreResponse",
    (
        Field(1, "completedSuccessfully", "bool"),
        Field(2, "path", "string"),
        Field(3, "errorMsg", "string"),
    ),
)

# streaming.proto
SUBSCRIBED_BY_QUERY_STRING = Message(
    "SubscribedByQueryString",
    (Field(1, "quid", "string"), Field(2, "records", "message", BIT, repeated=True)),
)
SUBSCRIPTION_FAILED = Message(
    "SubscriptionByQueryStringFailed",
    (Field(1, "queryString", "string"), Field(2, "reason", "string"), Field(3, "message", "string")),
)
RECORDS_PUBLISHED = Message(
    "RecordsPublished",
    (Field(1, "quid", "string"), Field(2, "records", "message", BIT, repeated=True)),
)
SQL_STREAMING_RESPONSE = Message(
    "SQLStreamingResponse",
    (
        Field(1, "db", "string"),
        Field(2, "namespace", "string"),
        Field(3, "metric", "string"),
        Field(4, "subscribedByQueryString", "message", SUBSCRIBED_BY_QUERY_STRING, oneof="payload"),
        Field(5, "subscriptionByQueryStringFailed", "message", SUBSCRIPTION_FAILED, oneof="payload"),
        Field(6, "recordsPublished", "message", RECORDS_PUBLISHED, oneof="payload"),
    ),
)


def bit_to_proto(record: dict, schema) -> dict:
    """Engine result row dict → proto Bit dict (GrpcBitConverters.asGrpcBit
    parity: numeric class decides decimalValue vs longValue; dimensions and
    tags keep their declared class). Aggregated rows carry no `value`
    column — the reference's read coordinator folds the aggregate into
    Bit.value (ReadCoordinator returns Bit(value = agg)); we mirror that
    by promoting the first non-schema numeric column (e.g. `sum_value`)
    to the value slot and keeping any further aggregates as dimensions."""
    out: dict = {"timestamp": int(record.get("timestamp", 0))}
    value = record.get("value")
    consumed = {"timestamp", "value"}
    if value is None:
        # aggregate alias names (count_value, sum_value, ...) take
        # priority; the temporal rows also carry lower_bound/upper_bound
        # axis columns which must stay dimensions
        candidates = [
            k for k, v in record.items()
            if k not in consumed
            and not (schema is not None and k in schema.fields)
            and isinstance(v, (int, float))
            and not isinstance(v, bool)
        ]
        preferred = [k for k in candidates if k.endswith("_value")]
        pick = preferred[0] if preferred else (candidates[0] if candidates else None)
        if pick is not None:
            value = record[pick]
            consumed.add(pick)
    if value is not None:
        if isinstance(value, float):
            out["decimalValue"] = value
        else:
            out["longValue"] = int(value)
    dims: dict = {}
    tags: dict = {}
    for k, v in record.items():
        if k in consumed or v is None:
            continue
        slot = _typed_value(v)
        fclass = None
        if schema is not None and k in schema.fields:
            fclass = schema.fields[k].field_class.value
        (tags if fclass == "tag" else dims)[k] = slot
    if dims:
        out["dimensions"] = dims
    if tags:
        out["tags"] = tags
    return out


def _typed_value(v) -> dict:
    if isinstance(v, bool):
        return {"longValue": int(v)}
    if isinstance(v, float):
        return {"decimalValue": v}
    if isinstance(v, int):
        return {"longValue": v}
    return {"stringValue": str(v)}


def proto_value(slot: dict):
    """Dimension/Tag/Bit oneof dict → python value."""
    if "decimalValue" in slot:
        return slot["decimalValue"]
    if "longValue" in slot:
        return slot["longValue"]
    return slot.get("stringValue", "")
