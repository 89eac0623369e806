"""Skew-resilient aggregation: salted two-phase groupBy; Misra-Gries
heavy hitters.

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


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT top-k most frequent values of `col` with a bounded shuffle.

    A plain `groupBy(col).count()` over a huge-cardinality column (corpus
    tokens, URLs, shingles) shuffles one row per DISTINCT value — at
    100 TB that is the dominant cost and a skew hazard. This runs
    batched Misra-Gries summaries per partition (capacity counters each,
    pure pandas value_counts merges — no per-row Python), so the only
    data that ever crosses the wire is:

      1. ≤ capacity candidate values per partition (the MG guarantee:
         every value with global count > N/(capacity+1) survives at
         least one partition's summary);
      2. the exact re-count of rows matching the candidate set, which a
         broadcast semi join prunes BEFORE the shuffle.

    Exactness: if the k-th re-counted frequency exceeds N/(capacity+1)
    the MG bound proves no non-candidate can beat it and the result is
    exact; otherwise (adversarially flat data) fall back to the plain
    full groupBy. Either way the OUTPUT is exact — the sketch only
    decides how much data moves. Ties rank by value ascending.

    Output: (<col>, n, rank).
    """
    import pandas as pd

    spark = df.sparkSession
    # NULLs are excluded up front on BOTH paths: pandas value_counts
    # drops NaN, so the MG candidates could never contain NULL while the
    # groupBy fallback would emit it — same data, different answers —
    # and an un-countable NULL candidate would silently void the
    # exactness certificate (total counts nulls, candidates can't).
    vals = df.select(col).filter(F.col(col).isNotNull())
    # the candidate/result schema follows the column's ACTUAL type —
    # a hardcoded string schema crashes Arrow on numeric columns
    col_t = df.schema[col].dataType.simpleString()

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                # batched MG decrement: subtract the (capacity+1)-th
                # largest count from everyone, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {v: c - cut for v, c in counters.items() if c > cut}
        yield pd.DataFrame({col: list(counters.keys())})

    candidates = vals.mapInPandas(mg, f"{col} {col_t}").distinct()
    exact = (
        vals.join(F.broadcast(candidates), col, "semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = exact.orderBy(F.desc("n"), F.asc(col)).limit(k).collect()
    total = vals.count()
    if len(top) < k or min(r["n"] for r in top) * (capacity + 1) <= total:
        # MG bound can't certify exactness -> full groupBy fallback
        exact = vals.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
        top = exact.orderBy(F.desc("n"), F.asc(col)).limit(k).collect()

    out = spark.createDataFrame(
        [(r[col], r["n"], i + 1) for i, r in enumerate(top)],
        f"{col} {col_t}, n long, rank int",
    )
    return out


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: the fact side's join key extends with a
    deterministic salt (hash of `salt_on`, a unique-ish fact column, so
    re-runs replay identically), and the dimension side REPLICATES
    salt_buckets× with every salt value — a hot fact key's rows spread
    across salt_buckets reducers instead of serializing one. The result
    set is row-for-row identical to the plain join (every fact row meets
    its dim row exactly once, under exactly one salt).

    This is the join-side sibling of salted_groupby_agg: AQE's skew-join
    splitting handles sort-merge skew after the fact at runtime, but
    salting is the portable pre-planned form that also works when the
    dim side is too big to broadcast yet small enough to replicate
    (replication cost = |dim|·salt_buckets rows, the explicit trade).

    Output: the plain join's columns (salt dropped).
    """
    if salt_buckets <= 0:
        raise ValueError("salt_buckets must be positive")
    salt_src = F.col(salt_on if salt_on is not None else key)
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).cast("int")
    )
    d = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("int"), F.lit(salt_buckets - 1).cast("int")
            )
        ),
    )
    return f.join(d, [key, "__salt"]).drop("__salt")
