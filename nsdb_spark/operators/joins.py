"""Scale-conscious join helpers.

`broadcast_enrich_agg` is the canonical fact⋈dim pattern at 100 TB: the
dimension side is broadcast explicitly (`F.broadcast`), so the fact table
is NEVER shuffled for the join — each task hash-probes the dim in memory
and the downstream aggregation is the only exchange, carrying one partial
row per (task, group). Without the hint Spark falls back to sort-merge
once the dim outgrows `spark.sql.autoBroadcastJoinThreshold` estimates,
which shuffles the full fact table — the single most expensive avoidable
shuffle in a star-schema scan. Decimal accumulation keeps the revenue sum
exact (FP sum order varies with partitioning; decimal doesn't).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich_agg(
    fact: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    group_col: str,
    aggs: list[Column],
) -> DataFrame:
    """fact ⋈(broadcast dim) → groupBy(dim attribute).agg(...)."""
    fk, dk = on
    joined = fact.join(F.broadcast(dim), fact[fk] == dim[dk])
    return joined.groupBy(group_col).agg(*aggs)


def revenue_by_part_type(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue sum(extendedprice·(1-discount)) per p_type — TPC-H-shaped
    probe of the broadcast path. Decimal(18,2) term math → exact,
    order-independent sum → cast once to double for the contract."""
    term = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return broadcast_enrich_agg(
        lineitem,
        part,
        on=("l_partkey", "p_partkey"),
        group_col="p_type",
        aggs=[
            F.sum(term).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        ],
    )


def revenue_chain(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """Three-table chain with one strategy per join class (the canonical
    warehouse topology): lineitem ⋈ orders is big-big — an orderkey-keyed
    shuffle join (at 100 TB: pre-bucket both on orderkey, see
    sources/bucketed.py, and even this exchange disappears) — while
    customer enters as an explicit BROADCAST hash join, so the joined
    fact flow never re-shuffles on custkey.

    The aggregate is pushed BELOW the joins: lineitem reduces to one row
    per orderkey (map-side-combinable sum) before joining, so the
    big-big join carries |orders| rows, not |lineitem|. Revenue sums run
    in decimal(18,2)-derived types end-to-end (exact, order-independent)
    and cast to double once at the output contract.

    Output: (c_mktsegment, o_orderpriority, n_orders, revenue).
    """
    per_order = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("rev")
        )
    )
    joined = (
        per_order.join(
            orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
            per_order["l_orderkey"] == orders["o_orderkey"],
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return (
        joined.groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


def band_self_count(
    df: DataFrame, id_col: str, x: str, delta: float
) -> DataFrame:
    """Numeric band self-join, aggregated: for every row, how many
    OTHER rows have |x − x'| ≤ delta — the "price collision" /
    near-duplicate-amount screen (fraud rings quoting near-identical
    amounts, duplicate invoices with cent-level jitter) that an
    equi-join can't express.

    NOT the naive theta join: `ON abs(a.x − b.x) <= δ` explodes to the
    full cross product before filtering (10¹² intermediate rows at
    100 TB — the asof_join docstring math). Instead the standard
    BUCKETED band rewrite: both sides key on floor(x/δ); a pair within
    δ can differ by at most one bucket, so each probe row fans out to
    exactly 3 candidate buckets (b−1, b, b+1) and the join is a plain
    hash equi-join on the bucket key with the |diff| ≤ δ check as a
    codegen row filter. Shuffle volume = 3× rows, candidate volume =
    Σ per-bucket products — inspect the bucket histogram for skew,
    exactly like interval_join's bucket-width note. Self-pairs drop
    arithmetically (count − 1).

    Output: (id_col, x, n_within bigint), one row per input row.
    """
    d = df.filter(
        F.col(id_col).isNotNull() & F.col(x).isNotNull()
    ).select(id_col, F.col(x).cast("double").alias("__x"))
    b = F.floor(F.col("__x") / F.lit(float(delta))).cast("long")
    rgt = d.select(
        F.col("__x").alias("__rx"), b.alias("__b")
    )
    probes = d.withColumn(
        "__pb", F.explode(F.array(b - 1, b, b + 1))
    )
    j = probes.join(rgt, probes["__pb"] == rgt["__b"]).filter(
        F.abs(F.col("__rx") - F.col("__x")) <= F.lit(float(delta))
    )
    return j.groupBy(id_col).agg(
        F.first("__x").alias(x),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_within"),
    )
