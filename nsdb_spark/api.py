"""Fluent client API, mirroring the reference Scala/Java builder surface
(nsdb-scala-api/.../NSDB.scala:109-160,204-373): connect → db → namespace →
bit builder → write / execute.
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from .engine import NsdbEngine
from .model import Bit


class BitBuilder:
    """bit().timestamp(t).value(v).dimension(k, v).tag(k, v) — builder for
    one record (NSDB.scala bit DSL parity)."""

    def __init__(self, metric: str):
        self.metric = metric
        self._timestamp: int | None = None
        self._value: int | float | None = None
        self._dimensions: dict[str, Any] = {}
        self._tags: dict[str, Any] = {}

    def timestamp(self, ts: int) -> "BitBuilder":
        self._timestamp = ts
        return self

    def value(self, v: int | float) -> "BitBuilder":
        self._value = v
        return self

    def dimension(self, name: str, v: Any) -> "BitBuilder":
        self._dimensions[name] = v
        return self

    def tag(self, name: str, v: Any) -> "BitBuilder":
        self._tags[name] = v
        return self

    def build(self, default_ts: int) -> Bit:
        if self._value is None:
            raise ValueError("bit requires a value")
        ts = self._timestamp if self._timestamp is not None else default_ts
        return Bit(ts, self._value, dict(self._dimensions), dict(self._tags))


class NSDB:
    """Entry point: NSDB(spark, warehouse).db("d").namespace("n")."""

    def __init__(self, spark: SparkSession, warehouse_dir: str, engine: NsdbEngine | None = None):
        self.engine = engine or NsdbEngine(spark, warehouse_dir)
        self._db = "default"
        self._namespace = "default"

    def db(self, name: str) -> "NSDB":
        self._db = name
        return self

    def namespace(self, name: str) -> "NSDB":
        self._namespace = name
        return self

    def metric(self, name: str) -> BitBuilder:
        return BitBuilder(name)

    def write(self, bit_builder: BitBuilder) -> int:
        bit = bit_builder.build(self.engine.now_fn())
        return self.engine.insert_bits(self._db, self._namespace, bit_builder.metric, [bit])

    def write_bits(self, metric: str, bits: list[Bit]) -> int:
        return self.engine.insert_bits(self._db, self._namespace, metric, bits)

    def execute(self, sql: str, **kwargs):
        return self.engine.execute(sql, db=self._db, ns=self._namespace, **kwargs)

    def query(self, sql: str, **kwargs):
        return self.engine.query(sql, db=self._db, ns=self._namespace, **kwargs)


class NSDBGrpc:
    """gRPC-backed fluent client — the reference's actual public entry
    point shape (NSDB.scala:109 `connect(host, port)` builds a
    GRPCClient; every write/execute is an rpc). Same builder DSL as the
    engine-backed NSDB, but nothing engine-side runs in this process:

        client = connect("127.0.0.1", 7817).db("d").namespace("n")
        client.write(client.metric("m").timestamp(1).value(2.5)
                     .dimension("city", "rome"))
        res = client.execute("select * from m limit 10")

    write() returns the RPCInsertResult dict; execute() returns the
    SQLStatementResponse dict with `records` as proto Bit dicts.
    """

    def __init__(self, host: str, port: int, metadata: list[tuple[str, str]] | None = None):
        from .grpc import NsdbGrpcClient

        self.client = NsdbGrpcClient(host, port, metadata=metadata)
        self._db = "default"
        self._namespace = "default"

    def db(self, name: str) -> "NSDBGrpc":
        self._db = name
        return self

    def namespace(self, name: str) -> "NSDBGrpc":
        self._namespace = name
        return self

    def metric(self, name: str) -> BitBuilder:
        return BitBuilder(name)

    @staticmethod
    def _slot(v: Any) -> dict:
        if isinstance(v, bool):
            return {"longValue": int(v)}
        if isinstance(v, float):
            return {"decimalValue": v}
        if isinstance(v, int):
            return {"longValue": v}
        return {"stringValue": str(v)}

    def write(self, bit_builder: BitBuilder) -> dict:
        import time as _time

        if bit_builder._value is None:
            raise ValueError("bit requires a value")
        ts = (
            bit_builder._timestamp
            if bit_builder._timestamp is not None
            else int(_time.time() * 1000)
        )
        req: dict = {
            "database": self._db,
            "namespace": self._namespace,
            "metric": bit_builder.metric,
            "timestamp": ts,
        }
        v = bit_builder._value
        if isinstance(v, float):
            req["decimalValue"] = v
        else:
            req["longValue"] = int(v)
        if bit_builder._dimensions:
            req["dimensions"] = {
                k: self._slot(x) for k, x in bit_builder._dimensions.items()
            }
        if bit_builder._tags:
            req["tags"] = {
                k: self._slot(x) for k, x in bit_builder._tags.items()
            }
        return self.client.insert_bit(req)

    def execute(self, sql: str) -> dict:
        return self.client.execute_sql(self._db, self._namespace, sql)

    def subscribe(self, sql: str):
        """streamSQL: returns (next_fn, cancel_fn) over SQLStreamingResponse
        dicts — SubscribedByQueryString first, then RecordsPublished."""
        _, next_msg, cancel = self.client.stream_sql(
            self._db, self._namespace, sql
        )
        return next_msg, cancel

    def close(self) -> None:
        self.client.close()


def connect(host: str, port: int, metadata: list[tuple[str, str]] | None = None) -> NSDBGrpc:
    """NSDB.connect(host, port) parity (NSDB.scala:109)."""
    return NSDBGrpc(host, port, metadata=metadata)
