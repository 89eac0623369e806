"""Skew-join curve: plain equi-join vs salted_join as ONE key heats up.

Builds a fact table of FACT_ROWS rows over DIM_KEYS dimension keys where
a single hot key owns `hot_frac` of all rows (the bot-user / empty-string
/ sentinel-key shape), joins it to a DIM_KEYS-row dimension with
auto-broadcast DISABLED (at real scale the dim side is assumed too big to
broadcast — that is the regime salting exists for; with broadcast on,
neither plan shuffles and there is nothing to measure), and times the
plain SortMergeJoin against skew.salted_join at increasing hot fractions.

Expected shape (recorded in BASELINE.md): the plain join's wall clock
tracks the hot key's share — one reducer sorts/joins hot_frac of the
fact side — while the salted join stays ~flat: the hot key's rows spread
across salt_buckets reducers at the cost of replicating the dimension
salt_buckets x. Run: python tools/skew_curve.py [fact_rows]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nsdb_spark.operators import skew

FACT_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
DIM_KEYS = 10_000
HOT_FRACS = [0.0, 0.5, 0.9]
SALT = 16


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")  # no AQE skew rescue:
        # measure the raw partition-skew effect salting addresses; AQE's
        # skew-join split only helps sort-merge joins AFTER a stats pass,
        # and the point here is the portable pre-planned form
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "100g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    dim = (
        spark.range(DIM_KEYS)
        .select(F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("attr"))
        .localCheckpoint(eager=True)
    )
    # warmup join so the first measured point doesn't pay JVM/codegen
    # first-run costs
    spark.range(1000).select(F.col("id").alias("k")).join(dim, "k").count()
    results = {}
    for hf in HOT_FRACS:
        # row i is hot with probability hf (deterministic via hash mod)
        fact = (
            spark.range(FACT_ROWS)
            .select(
                F.col("id").alias("rid"),
                F.when(
                    F.pmod(F.xxhash64("id"), 1000) < int(hf * 1000), F.lit(0)
                )
                .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), DIM_KEYS))
                .alias("k"),
            )
            .localCheckpoint(eager=True)
        )
        def timed(thunk):
            # min of 2: the machine also runs tests/benches, so single
            # samples carry multi-second scheduler noise
            best, n = None, None
            for _ in range(2):
                t0 = time.time()
                n = thunk()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return round(best, 2), n

        t_plain, n_plain = timed(lambda: fact.join(dim, "k").count())
        t_salted, n_salted = timed(
            lambda: skew.salted_join(
                fact, dim, "k", salt_buckets=SALT, salt_on="rid"
            ).count()
        )
        assert n_plain == n_salted, (n_plain, n_salted)
        results[hf] = {"plain_s": t_plain, "salted_s": t_salted}
        print(f"hot_frac={hf}: plain {t_plain}s salted {t_salted}s "
              f"({n_plain} rows)")
    print(json.dumps({"fact_rows": FACT_ROWS, "salt": SALT,
                      "curve": results}))


if __name__ == "__main__":
    main()
