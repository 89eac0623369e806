"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The reference engine's only physical layout axis is natural time
(`Location.scala:32-33` — shard = time interval); every non-time predicate
scans whole shards. At 100 TB a second-axis predicate (user, tenant,
source...) wants files whose min/max ranges are narrow on BOTH columns so
parquet row-group/file statistics can skip. Sorting by a Z-order key
interleaves the bits of several quantized columns, giving every file a
bounded hyper-rectangle in key space — the standard lakehouse layout trick
(Delta/Iceberg OPTIMIZE ZORDER) expressed as plain columnar expressions.

All pure JVM expressions (shifts/masks), no UDFs, no shuffle beyond the
final range-partitioned sort-write.
"""
from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave the low `bits` bits of each (already-quantized,
    non-negative integer) column: bit j of column i lands at position
    j*len(cols) + i. With c columns at b bits the key is a c*b-bit long —
    keep c*b <= 63.

    Quantization is the caller's job (modulo, width_bucket, rank bucket...)
    because it is domain knowledge; this function is just the interleave.
    """
    ncols = len(cols)
    terms = []
    for i, c in enumerate(cols):
        q = c.cast("long")
        for j in range(bits):
            # ((q >> j) & 1) << (j*ncols + i)
            terms.append(
                F.shiftleft(
                    F.shiftright(q, j).bitwiseAND(F.lit(1)), j * ncols + i
                )
            )
    return functools.reduce(operator.add, terms).alias("zkey")


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Return `df` re-ordered for writing: range-partitioned and sorted by
    the Z-order key of `cols`, so each output file covers a compact
    hyper-rectangle of the key space and parquet min/max stats prune on
    every participating column. `num_files` caps the output file count
    (defaults to the current parallelism)."""
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
