"""Compatibility shim — the driver-facing query registry now lives in
nsdb_spark/registry/ (split per operator family in round 7; this module
had grown to 8.2k lines). Same contract, same names: build_queries(),
build_oracles(), and the driver-check rotation lists are re-exported so
__spark_entry__.py, bench.py, and tools/ keep importing from here."""
from __future__ import annotations

from .registry import (  # noqa: F401
    _CHECK_PREFIX_R5,
    _CHECK_PREFIX_R6,
    _CHECK_PREFIX_R7,
    _CHECK_PREFIX_R8,
    _ROTATION_QUEUE,
    build_oracles,
    build_queries,
)
from .registry.common import (  # noqa: F401 — shared test/tool constants
    BM25_PHRASE,
    BM25_TERMS,
    MCNEMAR_SPLIT_MS,
    SHARD,
)
