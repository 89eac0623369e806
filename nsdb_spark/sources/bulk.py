"""Bulk file ingestion: CSV / JSON-lines / parquet → metric frames.

The reference ingests one Bit at a time over HTTP/gRPC/WS
(`DataApi.scala:39,75-96`, `service.proto:31`); a Spark-native engine also
wants a bulk path where rows never touch the driver. These helpers turn an
arbitrary Spark-readable file set into a frame conforming to a
`MetricSchema`, with the same inference/union/conflict semantics as the
record path (Schema.scala:101-129 parity, applied to column types instead
of per-bit values).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import (
    FieldClass,
    MetricSchema,
    NsdbType,
    SchemaError,
    SchemaField,
    SHARD_COL,
)

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "true"},
    "json": {},
    "parquet": {},
}


def read_bulk(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    options: dict[str, str] | None = None,
) -> DataFrame:
    if fmt not in _READ_DEFAULTS:
        raise SchemaError(f"unsupported bulk format {fmt!r} (csv/json/parquet)")
    opts = {**_READ_DEFAULTS[fmt], **(options or {})}
    return spark.read.options(**opts).format(fmt).load(path)


def _nsdb_type_of(dt: T.DataType, widen_ints: bool) -> NsdbType | None:
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return NsdbType.BIGINT if widen_ints else NsdbType.INT
    if isinstance(dt, T.LongType):
        return NsdbType.BIGINT
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return NsdbType.DECIMAL
    if isinstance(dt, T.StringType):
        return NsdbType.VARCHAR
    return None


def frame_schema(
    df: DataFrame,
    tags: tuple[str, ...],
    widen_ints: bool,
    known_classes: dict[str, FieldClass] | None = None,
) -> tuple[MetricSchema, DataFrame]:
    """Infer a MetricSchema from a frame's columns (timestamp + value
    required; everything else dimension, or tag when listed) and return the
    frame with columns cast to the inferred NSDb types.

    known_classes: field classes already registered for this metric —
    a column not named in `tags` inherits its registered class instead of
    defaulting to dimension, so re-ingesting into an existing metric never
    manufactures a tag-vs-dimension conflict."""
    cols = {f.name: f.dataType for f in df.schema.fields}
    if "timestamp" not in cols or "value" not in cols:
        raise SchemaError("bulk frames must carry `timestamp` and `value` columns")
    unknown = set(tags) - set(cols)
    if unknown:
        raise SchemaError(f"tag columns not in the frame: {sorted(unknown)}")
    ts_t = _nsdb_type_of(cols["timestamp"], widen_ints=True)
    if ts_t not in (NsdbType.INT, NsdbType.BIGINT):
        raise SchemaError("timestamp must be an integer epoch-millis column")
    val_t = _nsdb_type_of(cols["value"], widen_ints)
    if val_t is None or not val_t.is_numeric:
        raise SchemaError("value must be a numeric column")
    fields: dict[str, SchemaField] = {}
    casts = [
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("value").cast(val_t.spark_type).alias("value"),
    ]
    for name, dt in cols.items():
        if name in ("timestamp", "value"):
            continue
        t = _nsdb_type_of(dt, widen_ints)
        if t is None:
            raise SchemaError(
                f"column {name}: unsupported type {dt.simpleString()} "
                "(INT/BIGINT/DECIMAL/VARCHAR only)"
            )
        if name in tags:
            fc = FieldClass.TAG
        elif known_classes and name in known_classes:
            fc = known_classes[name]
        else:
            fc = FieldClass.DIMENSION
        fields[name] = SchemaField(name, fc, t)
        casts.append(F.col(name).cast(t.spark_type).alias(name))
    return MetricSchema(val_t, fields), df.select(*casts)


def conform_frame(df: DataFrame, schema: MetricSchema, shard_interval_ms: int) -> DataFrame:
    """Project the frame onto the (merged) registry schema — absent fields
    become NULL columns — and add the natural-time shard partition column.
    Pure projection: no shuffle."""
    have = set(df.columns)
    cols = [
        F.col(n).cast(schema.field_type(n).spark_type).alias(n)
        if n in have
        else F.lit(None).cast(schema.field_type(n).spark_type).alias(n)
        for n in schema.all_field_names()
    ]
    shard = (F.col("timestamp") - F.pmod(F.col("timestamp"), F.lit(shard_interval_ms))).alias(
        SHARD_COL
    )
    return df.select(*cols, shard)
