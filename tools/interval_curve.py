"""Interval-join bucket-size trade-off curve.

The bucketed-range rewrite's one knob is the cell width: interval-side
replication is avg_span/bucket + 1 copies, while the post-join exact
BETWEEN filter's wasted work grows as cells get wider (more non-matching
pairs share a cell). This measures the same lineitem/orders interval
join the registry benches (join_interval_lineitem_orders: spans =
l_quantity days, 1..50, median ~25) across bucket widths at sf0.1, so
BASELINE.md can record where the curve bottoms out — the measured
justification for the default, like the dedup exact-vs-LSH crossover
and the incremental-MinHash flat-batch curves.

Run: python tools/interval_curve.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nsdb_spark.operators import temporal_join
from nsdb_spark.sources import testdata

BUCKETS = [1, 3, 7, 14, 30, 90]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("interval-curve")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = testdata.table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000").alias("start_d"),
        (
            F.expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
            + F.col("l_quantity").cast("long")
        ).alias("end_d"),
    ).persist()
    od = testdata.table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(
        F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias("pt_d")
    ).persist()
    n_iv, n_pt = li.count(), od.count()
    span = li.select(F.avg(F.col("end_d") - F.col("start_d"))).first()[0]
    print(f"# intervals={n_iv} points={n_pt} avg_span={span:.1f} days")

    def run(bucket: int) -> dict:
        out = (
            temporal_join.interval_join(od, li, "pt_d", "start_d", "end_d", bucket)
            .groupBy("l_orderkey", "l_linenumber")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.time()
        rows = out.count()
        t = time.time() - t0
        # exploded interval rows = replication the shuffle actually pays
        repl = li.select(
            F.sum(
                F.floor(F.col("end_d") / bucket) - F.floor(F.col("start_d") / bucket) + 1
            )
        ).first()[0]
        return {"bucket_days": bucket, "sec": round(t, 2),
                "exploded_rows": int(repl),
                "replication": round(repl / n_iv, 2), "out_rows": rows}

    for b in BUCKETS:
        run(b)  # warm-up: JIT + codegen outside the timed run
    results = [run(b) for b in BUCKETS]
    assert len({r["out_rows"] for r in results}) == 1, "bucket must not change results"
    for r in results:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
