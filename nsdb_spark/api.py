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
