"""Dedup scale crossover: exact n-gram-Jaccard join vs MinHash-LSH.

Generates corpora of m x sf0.1-size (m in SCALES) from the SAME text
distribution as the driver's documents table (same vocabulary, matched
length distribution, fresh random sequences — so shingle doc-frequency
grows ~linearly with corpus size, the saturated-shingle-space regime a
real large corpus is in), then times both pair generators at each scale.

Expected shape (recorded in BASELINE.md): the exact join's work is
sum_over_shingles(df^2), so ~quadratic in corpus size here; MinHash-LSH
shuffles O(docs x bands) signatures and verifies only banded candidates,
so ~linear. Run: python tools/scale_curve.py [max_scale]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from nsdb_spark.operators import dedup

BASE = "/root/testdata/sf0.1/documents.parquet"
WORK = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".scale_bench")
SCALES = [1, 2, 4, 8]


def synth_corpus(spark, m: int) -> str:
    """m x sf0.1 docs: the originals plus (m-1) blocks of fresh docs drawn
    from the same vocabulary/length distribution (seeded, reproducible)."""
    out = os.path.join(WORK, f"docs_x{m}.parquet")
    if os.path.isdir(out):
        return out
    base = spark.read.parquet(BASE).select("doc_id", "text")
    rows = base.collect()
    vocab = sorted({w for r in rows for w in r["text"].split(" ") if w})
    lengths = [len(r["text"].split(" ")) for r in rows]
    n = len(rows)
    rng = np.random.default_rng(7)
    extra = []
    for block in range(1, m):
        for i in range(n):
            k = lengths[rng.integers(0, n)]
            words = rng.choice(vocab, size=k)
            extra.append((block * n + i, " ".join(words)))
    df = base
    if extra:
        df = df.unionByName(
            spark.createDataFrame(extra, "doc_id long, text string")
        )
    df.repartition(8).write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    max_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scales = [m for m in SCALES if m <= max_scale]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(WORK, exist_ok=True)

    # warm codegen paths once, untimed
    docs1 = spark.read.parquet(synth_corpus(spark, 1))
    dedup.ngram_jaccard_pairs(docs1, n=3, threshold=0.5).count()
    dedup.minhash_lsh_pairs(docs1, n=3, num_hashes=128, bands=32, threshold=0.5).count()
    spark.catalog.clearCache()

    results = []
    for m in scales:
        docs = spark.read.parquet(synth_corpus(spark, m))
        n_docs = docs.count()
        t0 = time.time()
        lsh_pairs = dedup.minhash_lsh_pairs(
            docs, n=3, num_hashes=128, bands=32, threshold=0.5
        ).count()
        t_lsh = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        # the registry's default: stop-shingle guard at max(10, 0.5% docs)
        cap = max(10, -(-n_docs // 200))
        t0 = time.time()
        guarded_pairs = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, stop_shingle_df_limit=cap
        ).count()
        t_guard = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        t0 = time.time()
        exact_pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).count()
        t_exact = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        results.append(
            {"scale": m, "docs": n_docs, "exact_raw_s": t_exact,
             "exact_guarded_s": t_guard, "lsh_s": t_lsh,
             "exact_pairs": exact_pairs, "guarded_pairs": guarded_pairs,
             "lsh_pairs": lsh_pairs}
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"curve": results}))


if __name__ == "__main__":
    main()
