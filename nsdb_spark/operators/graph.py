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
    # pin inputs: the edge set is often an expensive upstream (e.g. a
    # near-dup pair join) and every iteration references it twice —
    # without a persist the whole upstream would re-execute 2×iters times
    edges = edges.persist()
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return nodes.select(F.col(node_col), F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select(node_col, F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            edges.join(out_deg, src)
            .join(ranks, F.col(src) == F.col(node_col))
            .select(F.col(dst).alias(node_col), (F.col("rank") / F.col("__deg")).alias("c"))
            .groupBy(node_col)
            .agg(F.sum("c").alias("in_mass"))
        )
        # dangling mass = 1 - mass that flowed along edges
        flowed = contribs.agg(F.sum("in_mass")).first()[0] or 0.0
        dangling = 1.0 - float(flowed)
        ranks = (
            nodes.join(contribs, node_col, "left")
            .select(
                node_col,
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + dangling / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select(node_col, F.round("rank", 6).alias("rank"))
    # materialize before releasing the pinned inputs (the lazy checkpoints
    # above still hold lineage into `edges` until first action)
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    nodes.unpersist()
    return out
