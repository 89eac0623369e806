"""graph registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    DataFrame, F, SparkSession, _bfs_oracle, _docs, _hits_oracle,
    _kcore_oracle, _label_prop_oracle, _modularity_oracle,
    _pagerank_oracle, _pair_guard_limit, _shingles_cte, dedup, graph,
    testdata,
)


def register(q):

    # --- link analysis over the near-dup graph (iterative: rows-only) ---
    def _pagerank(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        nodes = _docs(spark, sf).select(F.col("doc_id").alias("node"))
        return graph.pagerank(edges, nodes, iters=5)

    q["graph_pagerank"] = _pagerank

    def _label_prop(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        nodes = _docs(spark, sf).select(F.col("doc_id").alias("node"))
        return graph.label_propagation(edges, nodes, iters=4)

    q["graph_label_prop"] = _label_prop
    q["graph_assortativity"] = lambda spark, sf: graph.degree_assortativity(
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
        ),
    )

    def _triangles(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        return graph.triangle_counts(pairs, _docs(spark, sf).select("doc_id"))

    q["graph_triangles"] = _triangles

    def _clustering_coeff(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        return graph.clustering_coefficient(
            pairs, _docs(spark, sf).select("doc_id")
        )

    q["graph_clustering_coeff"] = _clustering_coeff

    def _graph_modularity(spark, sf):
        pairs = dedup.ngram_jaccard_pairs(
            _docs(spark, sf), n=3, threshold=0.5,
            stop_shingle_df_limit=_pair_guard_limit(spark, sf),
        )
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        nodes = _docs(spark, sf).select(F.col("doc_id").alias("node"))
        return graph.modularity(
            edges, graph.label_propagation(edges, nodes, iters=4)
        )

    q["graph_modularity"] = _graph_modularity
    q["graph_bfs_hops"] = lambda spark, sf: graph.bfs_hops(
        # same prefixed supplier–customer bipartite as graph_kcore
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        ),
        source="s1", rounds=3,
    )
    q["graph_rich_club"] = lambda spark, sf: graph.rich_club(
        # same supplier–customer bipartite as the other graph entries
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        ),
        ks=(4, 8, 16),
    )
    q["graph_knn_degree"] = lambda spark, sf: graph.avg_neighbor_degree(
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        ),
    )

    def _cust_supp_edges(spark: SparkSession, sf: str) -> DataFrame:
        # bipartite customer–supplier edges via the order line items;
        # suppliers shift by 1e6 so the two id spaces can't collide in
        # the undirected least/greatest canonicalization
        li = testdata.table(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        o_ = testdata.table(spark, sf, "orders").select(
            "o_orderkey", "o_custkey"
        )
        return li.join(
            o_, li.l_orderkey == o_.o_orderkey
        ).select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("dst"),
        )

    q["graph_degree_dist"] = lambda spark, sf: graph.degree_distribution(
        _cust_supp_edges(spark, sf)
    )
    q["graph_common_neighbors"] = lambda spark, sf: graph.common_neighbor_similarity(
        # suppliers sharing customers: per-customer supplier degree is
        # bounded (~40), so the per-dst wedge fan-out stays degree²-small
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
        ),
        min_common=40,
    )
    q["graph_hits"] = lambda spark, sf: graph.hits_scores(
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
        ),
        iters=4,
    )
    q["graph_adamic_adar"] = lambda spark, sf: graph.adamic_adar(
        # same supplier–customer bipartite graph as graph_common_neighbors
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("l_suppkey").alias("src"), F.col("o_custkey").alias("dst")
        ),
        min_common=40,
    )
    q["graph_kcore"] = lambda spark, sf: graph.kcore_peel(
        # supplier–customer bipartite; prefixes disjoin the key spaces
        testdata.table(spark, sf, "lineitem")
        .join(
            testdata.table(spark, sf, "orders").select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        ),
        k=8, rounds=4,
    )

    def _supplier_customer_edges(spark, sf):
        return (
            testdata.table(spark, sf, "lineitem")
            .join(
                testdata.table(spark, sf, "orders").select(
                    "o_orderkey", "o_custkey"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
                F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
            )
        )

    q["graph_pref_attachment"] = lambda spark, sf: graph.preferential_attachment(
        _supplier_customer_edges(spark, sf), top_n=50, k=20
    )

    def _katz(spark, sf):
        # simple graph: repeat (s, c) purchases are one endorsement
        edges = _supplier_customer_edges(spark, sf).distinct()
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        return graph.katz_centrality(edges, nodes, iters=4, alpha=0.05)

    q["graph_katz"] = _katz


def register_oracles(o):
    # ordered-wedge triangle counting over the guarded jaccard pair graph
    o["graph_triangles"] = f"""
WITH {_shingles_cte(capped=True)},
prs AS (
  SELECT doc_a, doc_b
  FROM p JOIN c ca ON p.doc_a = ca.doc_id JOIN c cb ON p.doc_b = cb.doc_id
  WHERE round(common / (ca.n_sh + cb.n_sh - common), 6) >= 0.5
),
e AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
      FROM prs WHERE doc_a <> doc_b),
wed AS (SELECT x.u, x.v, y.v AS w FROM e x JOIN e y
        ON x.u = y.u AND x.v < y.v),
tr AS (SELECT wed.u, wed.v, wed.w FROM wed
       JOIN e ON e.u = wed.v AND e.v = wed.w),
m AS (SELECT u AS doc_id FROM tr UNION ALL SELECT v FROM tr
      UNION ALL SELECT w FROM tr),
pc AS (SELECT doc_id, count(*) AS n_triangles FROM m GROUP BY doc_id)
SELECT d.doc_id, coalesce(pc.n_triangles, 0) AS n_triangles
FROM documents d LEFT JOIN pc USING (doc_id)
"""
    # triangles oracle + per-node degrees; coeff undefined below deg 2
    o["graph_clustering_coeff"] = f"""
WITH {_shingles_cte(capped=True)},
prs AS (
  SELECT doc_a, doc_b
  FROM p JOIN c ca ON p.doc_a = ca.doc_id JOIN c cb ON p.doc_b = cb.doc_id
  WHERE round(common / (ca.n_sh + cb.n_sh - common), 6) >= 0.5
),
e AS (SELECT DISTINCT least(doc_a, doc_b) AS u, greatest(doc_a, doc_b) AS v
      FROM prs WHERE doc_a <> doc_b),
wed AS (SELECT x.u, x.v, y.v AS w FROM e x JOIN e y
        ON x.u = y.u AND x.v < y.v),
tr AS (SELECT wed.u, wed.v, wed.w FROM wed
       JOIN e ON e.u = wed.v AND e.v = wed.w),
m AS (SELECT u AS doc_id FROM tr UNION ALL SELECT v FROM tr
      UNION ALL SELECT w FROM tr),
pc AS (SELECT doc_id, count(*) AS n_triangles FROM m GROUP BY doc_id),
dg AS (SELECT doc_id, cast(count(*) AS bigint) AS degree
       FROM (SELECT u AS doc_id FROM e UNION ALL SELECT v FROM e)
       GROUP BY 1)
SELECT d.doc_id,
       cast(coalesce(pc.n_triangles, 0) AS bigint) AS n_triangles,
       coalesce(dg.degree, 0) AS degree,
       CASE WHEN dg.degree >= 2
            THEN round(2.0 * coalesce(pc.n_triangles, 0)
                       / (dg.degree * (dg.degree - 1)), 6)
       END AS coeff
FROM documents d LEFT JOIN pc USING (doc_id) LEFT JOIN dg USING (doc_id)
"""
    # fixed damping + fixed iteration count over the same guarded pair
    # graph: SQL-expressible after all (unrolled steps), converting one
    # of the two remaining rows-only entries to a hash-checked one
    o["graph_pagerank"] = _pagerank_oracle(iters=5, damping=0.85)
    o["graph_label_prop"] = _label_prop_oracle(iters=4)
    o["graph_modularity"] = _modularity_oracle(iters=4)
    o["graph_knn_degree"] = """
WITH e AS (SELECT DISTINCT least('s' || l_suppkey, 'c' || o_custkey) AS u,
                  greatest('s' || l_suppkey, 'c' || o_custkey) AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
dg AS (SELECT nx AS n, cast(count(*) AS bigint) AS dg FROM
       (SELECT u AS nx FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
bidi AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
j AS (SELECT b.u, du.dg AS du, dv.dg AS dv
      FROM bidi b JOIN dg du ON b.u = du.n JOIN dg dv ON b.v = dv.n),
pn AS (SELECT u, max(du) AS du, avg(dv) AS knn FROM j GROUP BY 1),
cnt AS (SELECT dg AS degree, cast(count(*) AS bigint) AS n_nodes
        FROM dg GROUP BY 1),
cv AS (SELECT du AS degree, round(avg(knn), 6) AS avg_neighbor_degree
       FROM pn GROUP BY 1)
SELECT cv.degree, cnt.n_nodes, cv.avg_neighbor_degree
FROM cv JOIN cnt USING (degree)
"""
    _rc_edges = """
e AS (SELECT DISTINCT least('s' || l_suppkey, 'c' || o_custkey) AS u,
             greatest('s' || l_suppkey, 'c' || o_custkey) AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
dg AS (SELECT nn2 AS n, cast(count(*) AS bigint) AS dg FROM
       (SELECT u AS nn2 FROM e UNION ALL SELECT v FROM e) GROUP BY 1)"""
    _rc_cells = []
    for _k in (4, 8, 16):
        _rc_cells.append(f"""
SELECT cast({_k} AS int) AS k,
       (SELECT cast(count(*) AS bigint) FROM dg WHERE dg > {_k})
         AS n_nodes,
       (SELECT cast(count(*) AS bigint) FROM e
        JOIN dg x ON e.u = x.n AND x.dg > {_k}
        JOIN dg y ON e.v = y.n AND y.dg > {_k}) AS n_edges""")
    o["graph_rich_club"] = f"""
WITH {_rc_edges},
cells AS ({" UNION ALL ".join(_rc_cells)})
SELECT k, n_nodes, n_edges,
       CASE WHEN n_nodes >= 2
            THEN round(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6)
       END AS phi
FROM cells
"""
    o["graph_assortativity"] = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ds AS (SELECT s, cast(count(*) AS double) AS dega FROM e GROUP BY 1),
dd AS (SELECT d, cast(count(*) AS double) AS degb FROM e GROUP BY 1),
j AS (SELECT dega AS a, degb AS b FROM e JOIN ds USING (s)
      JOIN dd USING (d)),
m AS (SELECT cast(count(*) AS bigint) AS n_edges, sum(a) AS sa,
             sum(b) AS sb, sum(a * a) AS saa, sum(b * b) AS sbb,
             sum(a * b) AS sab
      FROM j)
SELECT n_edges,
       round((cast(n_edges AS double) * sab - sa * sb)
             / sqrt((cast(n_edges AS double) * saa - sa * sa)
                    * (cast(n_edges AS double) * sbb - sb * sb)), 6)
         AS assortativity
FROM m
"""
    # R(t) = A(t)^2 / (n*n1*n2) with A = s1*n - s*rn over integer-scaled
    # values: exact hugeint intermediates, then the identical double
    # division as the Spark side — bit-deterministic argmax, ties to the
    # earliest split
    o["graph_common_neighbors"] = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (SELECT s, count(*) AS deg FROM e GROUP BY 1),
p AS (SELECT a.s AS node_a, b.s AS node_b, count(*) AS n_common
      FROM e a JOIN e b ON a.d = b.d AND a.s < b.s
      GROUP BY 1, 2 HAVING count(*) >= 40)
SELECT node_a, node_b, n_common,
       round(n_common / cast(da.deg + db.deg - n_common AS double), 6)
           AS jaccard
FROM p JOIN deg da ON node_a = da.s JOIN deg db ON node_b = db.s
"""
    o["graph_hits"] = _hits_oracle(iters=4)
    o["graph_adamic_adar"] = """
WITH e AS (SELECT DISTINCT l_suppkey AS s, o_custkey AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
degd AS (SELECT d, count(*) AS degd FROM e GROUP BY 1)
SELECT a.s AS node_a, b.s AS node_b, count(*) AS n_common,
       round(sum(1.0 / ln(degd)), 6) AS aa_score
FROM e a JOIN e b ON a.d = b.d AND a.s < b.s JOIN degd ON a.d = degd.d
GROUP BY 1, 2 HAVING count(*) >= 40
"""
    o["graph_kcore"] = _kcore_oracle(k=8, rounds=4)
    o["graph_bfs_hops"] = _bfs_oracle(source="s1", rounds=3)
    o["graph_degree_dist"] = """
WITH e AS (SELECT DISTINCT least(o_custkey, l_suppkey + 1000000) AS u,
                  greatest(o_custkey, l_suppkey + 1000000) AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (SELECT node, count(*) AS degree
        FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY 1),
hist AS (SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1),
tot AS (SELECT cast(sum(n_nodes) AS double) AS t FROM hist)
SELECT degree, n_nodes, round(n_nodes / t, 6) AS pct_nodes FROM hist, tot
"""
    o["graph_pref_attachment"] = """
WITH e AS (SELECT DISTINCT 's' || l_suppkey AS s, 'c' || o_custkey AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
deg AS (SELECT s, cast(count(*) AS bigint) AS deg FROM e GROUP BY s),
top AS (SELECT s, deg FROM deg ORDER BY deg DESC, s LIMIT 50),
pairs AS (SELECT a.s AS node_a, b.s AS node_b, a.deg AS deg_a,
                 b.deg AS deg_b, (a.deg * b.deg)::BIGINT AS pa_score
          FROM top a JOIN top b ON a.s < b.s),
common AS (SELECT DISTINCT x.s AS node_a, y.s AS node_b
           FROM e x JOIN e y ON x.d = y.d AND x.s < y.s)
SELECT pairs.node_a, pairs.node_b, deg_a, deg_b, pa_score,
       common.node_a IS NOT NULL AS has_common
FROM pairs LEFT JOIN common
  ON pairs.node_a = common.node_a AND pairs.node_b = common.node_b
ORDER BY pa_score DESC, pairs.node_a, pairs.node_b LIMIT 20
"""
    o["graph_katz"] = """
WITH e AS (SELECT DISTINCT 's' || l_suppkey AS s, 'c' || o_custkey AS d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
x0 AS (SELECT node, 1.0 AS katz FROM nodes),
s1 AS (SELECT e.d AS node, sum(x0.katz) AS in_sum
        FROM e JOIN x0 ON e.s = x0.node GROUP BY e.d),
x1 AS (SELECT n.node, 1.0 + 0.05 * coalesce(s1.in_sum, 0) AS katz
        FROM nodes n LEFT JOIN s1 ON n.node = s1.node),
s2 AS (SELECT e.d AS node, sum(x1.katz) AS in_sum
        FROM e JOIN x1 ON e.s = x1.node GROUP BY e.d),
x2 AS (SELECT n.node, 1.0 + 0.05 * coalesce(s2.in_sum, 0) AS katz
        FROM nodes n LEFT JOIN s2 ON n.node = s2.node),
s3 AS (SELECT e.d AS node, sum(x2.katz) AS in_sum
        FROM e JOIN x2 ON e.s = x2.node GROUP BY e.d),
x3 AS (SELECT n.node, 1.0 + 0.05 * coalesce(s3.in_sum, 0) AS katz
        FROM nodes n LEFT JOIN s3 ON n.node = s3.node),
s4 AS (SELECT e.d AS node, sum(x3.katz) AS in_sum
        FROM e JOIN x3 ON e.s = x3.node GROUP BY e.d),
x4 AS (SELECT n.node, 1.0 + 0.05 * coalesce(s4.in_sum, 0) AS katz
        FROM nodes n LEFT JOIN s4 ON n.node = s4.node)
SELECT node, round(katz, 6) AS katz FROM x4
"""
