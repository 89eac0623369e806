"""Adapters for the driver-generated testdata tables (TESTDATA.md).

`events` is exposed as an NSDb metric frame: timestamp (epoch ms BIGINT),
value (DECIMAL/double), tags event_type + user_id, dimensions event_id +
props — so the whole NSDb query surface runs against it through the regular
parse → analyze → compile pipeline.

Timestamp determinism: events.ts is parquet TIMESTAMP(NANOS, naive), which
Spark only reads via spark.sql.legacy.parquet.nanosAsLong; epoch ms is then
the exact integer `ts div 1_000_000`, bit-identical to DuckDB's
epoch_ms(ts) truncation.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _configure(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a metric frame (timestamp ms, value, tags/dims)."""
    df = table(spark, sf_dir, "events")
    return df.select(
        F.expr("ts div 1000000").alias("timestamp"),
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
