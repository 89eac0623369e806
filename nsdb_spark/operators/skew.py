"""Skew-resilient aggregation: salted two-phase groupBy.

A plain `groupBy(key)` shuffles every row of a hot key to one reducer —
at 100 TB one pathological key (empty string, null-ish sentinel, bot
user-id) serializes the stage. Salting splits each key into
`salt_buckets` sub-groups, partially aggregates per (key, salt) — so the
hot key's rows spread across `salt_buckets` reducers — then combines the
per-salt partials in a second, tiny aggregation keyed by the original key.

Same two-phase algebra Spark's partial/final HashAggregate already does
within a stage; salting extends it across the shuffle boundary, which
AQE's skew-join handling does not do for aggregations.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (partial expression, final combiner) per aggregation kind
_ALGEBRA = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 64,
) -> DataFrame:
    """groupBy(keys) with salted two-phase execution.

    aggs: (column, kind, alias) with kind in {count, sum, min, max, avg}.
    Result is bit-identical to the plain groupBy for count/sum/min/max;
    avg combines exact sum+count partials (same decomposition the
    reference carries in its partial Bits, post_proc/package.scala:177-196).
    """
    # deterministic salt: spread rows of one key across buckets by hashing
    # the full row (identical rows sharing a bucket is fine — partials
    # still combine exactly)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial_cols, final_cols = [], []
    for col, kind, alias in aggs:
        if kind == "avg":
            partial_cols += [
                F.sum(col).alias(f"__s_{alias}"),
                F.count(col).alias(f"__c_{alias}"),
            ]
            final_cols.append(
                (F.sum(f"__s_{alias}") / F.sum(f"__c_{alias}")).alias(alias)
            )
        else:
            p, f = _ALGEBRA[kind]
            partial_cols.append(p(col).alias(f"__p_{alias}"))
            final_cols.append(f(f"__p_{alias}").alias(alias))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)
