"""Scale-factor ladder: measure headline entries at sf0.1 vs a generated
sf1 (10x) dataset and record the per-entry scaling exponent.

The driver ships sf{0.001,0.01,0.1}; the 100 TB story needs at least one
measured DECADE of scaling per operator family (VERDICT r4 item 6). This
tool synthesizes an sf1 directory from the sf0.1 tables with the SAME
schema and distributions (deterministic, seed=7):

- region/nation: copied (fixed dimension tables at every TPC-H SF).
- customer/supplier/part/orders/lineitem/events: 10x by key-offset block
  replication — each block shifts every key column by block*max_key, so
  joins keep their fan-in (one order still has the same lineitems, a user
  still has the same event count) while distinct-key cardinality grows
  10x. Value/timestamp distributions are exactly the originals'.
- documents: originals + 9 blocks of FRESH text drawn from the original
  vocabulary with matched length distribution (the scale_curve.py corpus
  recipe) — block replication would inject exact duplicates and turn the
  dedup entries into a different (cluster-explosion) workload.
- embeddings: originals + 9 blocks sampled per-label from each label's
  fitted diagonal Gaussian — preserves the cluster structure ANN entries
  probe without creating near-duplicate copies of existing vectors.

Scaling exponent: e = log10(t_sf1 / t_sf0.1); e ~ 1 is linear scaling,
e ~ 2 quadratic, e < 1 sublinear (fixed overheads still amortizing).
Single-run times on a warm session, min of 2 for the timed SF run.

Run: python tools/sf1_ladder.py [entry ...]   (default: HEADLINE)
Output: one JSON line per entry + a markdown table for BASELINE.md.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nsdb_spark import entry_queries

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1"
)
BLOCKS = 10

#: one decade per operator family: dedup (shingle/LSH/simhash/SRP/CC),
#: ANN (IVF / IVF-PQ stored indexes), text (postings BM25), graph
#: (pagerank), temporal (sessionize, rollup serving), sampling, packing,
#: skew-safe aggregation, and the NSDb temporal class itself.
HEADLINE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_h3",
    "dedup_embedding_srp",
    "dedup_semantic",
    "sim_topk_ivf",
    "sim_topk_ivfpq",
    "text_bm25_postings",
    "graph_pagerank",
    "events_sessionize",
    "rollup_temporal_sum",
    "sample_stratified",
    "pack_sequences",
    "scale_salted_groupby_sum",
    "nsdb_temporal_count",
]


def _key_cols(name: str) -> list[str]:
    return {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }[name]


def generate(spark) -> str:
    if os.path.isdir(SF1) and os.path.isfile(os.path.join(SF1, "_DONE")):
        return SF1
    os.makedirs(SF1, exist_ok=True)
    for t in ["region", "nation"]:
        spark.read.parquet(f"{SF01}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{t}.parquet")
    # fact tables: key-offset block replication (pure column arithmetic —
    # one scan per block, no driver materialization)
    for t in ["customer", "supplier", "part", "orders", "lineitem", "events"]:
        base = spark.read.parquet(f"{SF01}/{t}.parquet")
        keys = _key_cols(t)
        offsets = {
            k: base.agg(F.max(k)).collect()[0][0] + 1 for k in keys
        }
        parts = [base]
        for b in range(1, BLOCKS):
            blk = base
            for k in keys:
                blk = blk.withColumn(k, F.col(k) + F.lit(b * offsets[k]))
            parts.append(blk)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{SF1}/{t}.parquet"
        )
    _gen_documents(spark)
    _gen_embeddings(spark)
    with open(os.path.join(SF1, "_DONE"), "w") as fh:
        fh.write("ok")
    return SF1


def _gen_documents(spark) -> None:
    base = spark.read.parquet(f"{SF01}/documents.parquet")
    rows = base.collect()
    vocab = sorted({w for r in rows for w in r["text"].split(" ") if w})
    lengths = [len(r["text"].split(" ")) for r in rows]
    langs = [r["lang"] for r in rows]
    sources = [r["source"] for r in rows]
    n = len(rows)
    rng = np.random.default_rng(7)
    extra = []
    for b in range(1, BLOCKS):
        for i in range(n):
            k = lengths[int(rng.integers(0, n))]
            text = " ".join(rng.choice(vocab, size=k))
            extra.append(
                (
                    b * n + i,
                    text,
                    langs[int(rng.integers(0, n))],
                    sources[int(rng.integers(0, n))],
                    len(text),
                )
            )
    df = base.unionByName(
        spark.createDataFrame(
            extra, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    df.repartition(32).write.mode("overwrite").parquet(
        f"{SF1}/documents.parquet"
    )


def _gen_embeddings(spark) -> None:
    base = spark.read.parquet(f"{SF01}/embeddings.parquet")
    rows = base.collect()
    by_label: dict[int, list[np.ndarray]] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    stats = {
        lbl: (np.mean(vs, axis=0), np.std(vs, axis=0) + 1e-9)
        for lbl, vs in by_label.items()
    }
    n = len(rows)
    labels = [r["label"] for r in rows]
    rng = np.random.default_rng(7)
    extra = []
    for b in range(1, BLOCKS):
        for i in range(n):
            lbl = labels[int(rng.integers(0, n))]
            mu, sd = stats[lbl]
            v = rng.normal(mu, sd)
            extra.append(
                (b * n + i, [float(x) for x in v.astype(np.float32)], int(lbl))
            )
    df = base.unionByName(
        spark.createDataFrame(
            extra, "vec_id long, embedding array<float>, label int"
        )
    )
    df.repartition(32).write.mode("overwrite").parquet(
        f"{SF1}/embeddings.parquet"
    )


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sf1-ladder")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)
    q = entry_queries.build_queries()
    # Ladder-only variant: the registry's dedup_simhash (max_hamming=6)
    # has a QUADRATIC TRUE RESULT on this synthetic corpus — same-vocab
    # random docs land within hamming 6 for ~10.6% of ALL pairs (13,238
    # of 124,750 at sf0.01), so its sf1 time measures output size, not
    # candidate efficiency. hamming≤3 keeps the result sparse and
    # measures the banded path itself.
    from nsdb_spark.operators import dedup
    from nsdb_spark.sources import testdata as _td

    q["dedup_simhash_h3"] = lambda s, d: dedup.simhash_pairs(
        s.read.parquet(f"{d}/documents.parquet"), max_hamming=3, banded=True
    )
    table = []
    for name in names:
        out = {"entry": name}
        for sf_dir, key in [(SF01, "t_sf0.1"), (SF1, "t_sf1")]:
            q[name](spark, sf_dir).collect()  # warm (JIT + codegen)
            spark.catalog.clearCache()
            best = math.inf
            for _ in range(2):
                t0 = time.time()
                q[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            out[key] = round(best, 3)
        out["exponent"] = round(
            math.log10(max(out["t_sf1"], 1e-3) / max(out["t_sf0.1"], 1e-3)), 3
        )
        table.append(out)
        print(json.dumps(out), flush=True)
    print("\n| entry | sf0.1 (s) | sf1 (s) | exponent |")
    print("| --- | --- | --- | --- |")
    for r in table:
        print(
            f"| {r['entry']} | {r['t_sf0.1']} | {r['t_sf1']} | {r['exponent']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
