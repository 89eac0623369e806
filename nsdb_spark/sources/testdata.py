"""Adapters for the driver-generated testdata tables (TESTDATA.md).

`events` is exposed as an NSDb metric frame: timestamp (epoch ms BIGINT),
value (DECIMAL/double), tags event_type + user_id, dimensions event_id +
props — so the whole NSDb query surface runs against it through the regular
parse → analyze → compile pipeline.

Timestamp determinism: events.ts is parquet TIMESTAMP(NANOS, naive).
Depending on the Spark build it surfaces either as BIGINT nanos (legacy
nanosAsLong) or as TIMESTAMP_NTZ truncated to micros; `ts_ms` floors either
representation to epoch ms (session tz pinned to UTC so the NTZ cast is the
identity instant), bit-identical to DuckDB's epoch_ms(ts) truncation.
"""
from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..analyzer import analyze
from ..compiler import QueryCompiler, TimeContext
from ..model import FieldClass, MetricSchema, NsdbType, SchemaField
from ..sql.parser import parse

EVENTS_SCHEMA = MetricSchema(
    NsdbType.DECIMAL,
    {
        "event_id": SchemaField("event_id", FieldClass.DIMENSION, NsdbType.BIGINT),
        "event_type": SchemaField("event_type", FieldClass.TAG, NsdbType.VARCHAR),
        "props": SchemaField("props", FieldClass.DIMENSION, NsdbType.VARCHAR),
        "user_id": SchemaField("user_id", FieldClass.TAG, NsdbType.BIGINT),
    },
)

#: default NSDb shard interval (30 d) — governs temporal bucket alignment
SHARD_INTERVAL_MS = 30 * 24 * 3600 * 1000


def _configure(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # removed in newer Spark builds; ts then reads as TIMESTAMP_NTZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def ts_ms(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-ms (floor) from a raw testdata timestamp column, whatever type
    the Spark build read it as (BIGINT nanos vs TIMESTAMP/TIMESTAMP_NTZ)."""
    # `div` truncates toward zero, but DuckDB's epoch_ms FLOORS — they
    # differ on pre-1970 rows, so subtract the (nonnegative) pmod first:
    # (a - pmod(a, b)) div b == floor(a / b) exactly, all in bigint
    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"({col} - pmod({col}, 1000000)) div 1000000")
    us = f"unix_micros(cast({col} as timestamp))"
    return F.expr(f"({us} - pmod({us}, 1000)) div 1000")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _configure(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a metric frame (timestamp ms, value, tags/dims)."""
    df = table(spark, sf_dir, "events")
    return df.select(
        ts_ms(df).alias("timestamp"),
        F.col("value"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("props"),
        F.col("user_id"),
    )


def events_max_ts(spark: SparkSession, sf_dir: str) -> int:
    """Deterministic `now` for relative-time queries: the data's max ms."""
    return events_metric(spark, sf_dir).agg(F.max("timestamp")).first()[0]


def run_nsdb_on_events(
    spark: SparkSession,
    sf_dir: str,
    sql: str,
    now_ms: int | None = None,
) -> DataFrame:
    """Full NSDb pipeline (parse → analyze → compile) over the events
    metric frame."""
    stmt = parse(sql)
    parsed = analyze(stmt, EVENTS_SCHEMA)
    ctx = TimeContext(now_ms) if now_ms is not None else TimeContext(0)
    compiler = QueryCompiler(spark, shard_interval_ms=SHARD_INTERVAL_MS)
    return compiler.compile(events_metric(spark, sf_dir), EVENTS_SCHEMA, parsed, ctx)
