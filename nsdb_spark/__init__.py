"""nsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of radicalbit/NSDb (reference studied at
/root/reference; re-designed Spark-first, not ported).

Layers:
  sql/       NSDb dialect parser → AST
  analyzer   validation (exact reference error strings) → ParsedQuery
  compiler   ParsedQuery → DataFrame plan (Catalyst does the physical work)
  catalog    warehouse layout + union-merged schema registry
  engine     facade: execute/insert/delete/query-enrichment
  streaming  ingestion + query subscriptions (Structured Streaming)
  operators  scale extensions: dedup, similarity search, text analysis,
             multimodal plumbing
"""
from .model import Bit, FieldClass, MetricSchema, NsdbType, SchemaField
from .engine import NsdbEngine
from .compiler import QueryCompiler, TimeContext
from .analyzer import analyze
from .sql.parser import parse

__all__ = [
    "Bit",
    "FieldClass",
    "MetricSchema",
    "NsdbType",
    "SchemaField",
    "NsdbEngine",
    "QueryCompiler",
    "TimeContext",
    "analyze",
    "parse",
]
