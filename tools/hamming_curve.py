"""Sign-bit sketch recall curve: hamming shortlist size vs recall@10.

The two-stage sketch search (hamming_rerank_topk) has one knob — the
shortlist size the 1-bit stage passes to the exact-cosine stage. This
measures recall@10 against the exact brute-force top-10 across
shortlist sizes over MANY probe queries at sf0.1, plus the pure
hamming ranking (shortlist == k, no rerank) as the floor — so
BASELINE.md can record where recall saturates, the measured
justification for the registry default (shortlist = 100), exactly
like the interval-join bucket-width and exact-vs-LSH crossover curves.

Run: python tools/hamming_curve.py [sf_dir] [n_queries]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nsdb_spark.operators import similarity
from nsdb_spark.sources import testdata

SHORTLISTS = [10, 20, 50, 100, 200]
K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("hamming-curve")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = testdata.table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=True
    )
    n_vec = emb.count()
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < n_queries)
        .orderBy("vec_id")
        .collect()
    ]
    print(f"# corpus {n_vec} vectors, {len(queries)} probe queries")

    exact = {}
    t0 = time.time()
    for i, q in enumerate(queries):
        exact[i] = {
            r["vec_id"]
            for r in similarity.cosine_topk(emb, q, k=K).collect()
        }
    t_exact = (time.time() - t0) / len(queries)
    print(f"# exact top-{K}: {t_exact:.3f} s/query (the fp32 full-scan floor)")

    for sl in SHORTLISTS:
        hits = 0
        t0 = time.time()
        for i, q in enumerate(queries):
            got = {
                r["vec_id"]
                for r in similarity.hamming_rerank_topk(
                    emb, q, k=K, shortlist=sl
                ).collect()
            }
            hits += len(got & exact[i])
        dt = (time.time() - t0) / len(queries)
        recall = hits / (K * len(queries))
        print(
            f"shortlist={sl:4d}  recall@{K}={recall:.3f}  "
            f"{dt:.3f} s/query"
        )
    spark.stop()


if __name__ == "__main__":
    main()
