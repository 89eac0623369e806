"""Logical plan layer (public re-exports).

The analyzer classifies every SELECT into one of four plan classes — the
same split the reference planner makes in
nsdb-core/.../statement/StatementParser.scala:49-148 — and the compiler
lowers each to a DataFrame pipeline:

- ParsedSimpleQuery            filter/project/sort/limit scan
- ParsedGlobalAggregatedQuery  aggregates over the whole metric
                               (optionally mixed with plain fields)
- ParsedAggregatedQuery        single-tag GROUP BY
- ParsedTemporalAggregatedQuery GROUP BY INTERVAL with backward-aligned
                               buckets and SINCE grace clipping

Time-range extraction (partition pruning ≡ NSDb location filtering,
TimeRangeManager.scala:33-63) and the per-statement TimeContext live here
too.
"""
from ..analyzer import (
    ParsedAggregatedQuery,
    ParsedGlobalAggregatedQuery,
    ParsedSimpleQuery,
    ParsedTemporalAggregatedQuery,
    analyze,
)
from ..compiler import TimeContext, envelope, extract_time_range

__all__ = [
    "ParsedAggregatedQuery",
    "ParsedGlobalAggregatedQuery",
    "ParsedSimpleQuery",
    "ParsedTemporalAggregatedQuery",
    "analyze",
    "TimeContext",
    "envelope",
    "extract_time_range",
]
