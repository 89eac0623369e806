"""Iterative graph operators over edge DataFrames.

Training-data pipelines use link analysis for corpus quality weighting
(e.g. harmonic-centrality / PageRank priors over a web-crawl link graph
feed retention decisions). The operator here is plain power iteration
expressed as DataFrame joins — the same distributed shape as
dedup.connected_components: per round one co-partitioned join + one
aggregate, rank state never touches the driver.

Scale notes: ranks and out-degrees co-shuffle on the node key each round
(Catalyst reuses the exchange), dangling-node mass is a 1-row aggregate
broadcast into the update, and localCheckpoint caps the plan depth so
round N doesn't re-execute rounds 1..N-1.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """PageRank by power iteration: (node, rank rounded to 6).

    edges: directed (src, dst) pairs; nodes: the full vertex set (isolated
    vertices keep the teleport mass). Dangling-node mass is redistributed
    uniformly each round (standard stochastic-matrix fix), so total rank
    mass stays 1 and results match the textbook formulation.
    """
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.select(F.col(node_col), F.lit(0.0).alias("rank"))
    # Fold the static per-source 1/out_degree weight into the edge set ONCE
    # (the reference-to-this was a per-round edges⋈out_deg join); persist so
    # an expensive edge upstream (e.g. a near-dup pair join) runs one time.
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    weighted = (
        edges.join(out_deg, src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.lit(1.0) / F.col("__deg")).alias("__w"),
        )
        # pre-hash on the join key: the per-round join reuses this layout
        # instead of re-exchanging the (large) edge set every iteration
        .repartition("__src")
        .persist()
    )
    weighted.count()
    ranks = nodes.select(node_col, F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(iters):
        contribs = (
            weighted.join(ranks, F.col("__src") == F.col(node_col))
            .groupBy(F.col("__dst"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("in_mass"))
            .withColumnRenamed("__dst", node_col)
        )
        # dangling mass = 1 - mass that flowed along edges. `contribs`
        # appears twice in the plan but shares one shuffle (ReuseExchange),
        # so there's no driver action and no second aggregation pass.
        dmass = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("in_mass"), F.lit(0.0))).alias("__dm")
        )
        ranks = (
            nodes.join(contribs, node_col, "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                node_col,
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.col("__dm") / n)
                ).alias("rank"),
            )
            # eager: one job per round, plan depth capped at 1 round
            .localCheckpoint(eager=True)
        )
    out = ranks.select(node_col, F.round("rank", 6).alias("rank"))
    weighted.unpersist()
    nodes.unpersist()
    return out
