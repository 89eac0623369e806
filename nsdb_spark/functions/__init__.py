"""Reusable column-expression primitives (public re-exports).

The NSDb dialect itself has no scalar function surface
(SQLStatementParser.scala:34-46 — the only computed value is relative-time
`now ± n unit`), so this package collects the engine's own shared
column-level building blocks instead: portable hashing, shingling, vector
math, and the LIKE-dialect translation. All are pure pyspark.sql
expressions unless noted.
"""
from ..compiler import agg_alias, like_to_regex
from ..operators.dedup import portable_word_hash, shingle_array
from ..operators.similarity import (
    deterministic_hyperplanes,
    rhp_signature,
)

__all__ = [
    "agg_alias",
    "like_to_regex",
    "portable_word_hash",
    "shingle_array",
    "deterministic_hyperplanes",
    "rhp_signature",
]
