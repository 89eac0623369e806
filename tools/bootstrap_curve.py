"""Measure bootstrap_mean_ci cost vs n_replicates at a fixed SF.

The operator's scale claim: the R-fold explode collapses map-side into a
(replicate -> sum,count) partial aggregate, so the shuffle carries R rows
per task and total cost grows ~linearly in R as pure scan-side CPU — no
extra exchanges, no resampled corpus copies. This times the claim:

    python tools/bootstrap_curve.py [sf_dir] [R ...]

Prints one row per R (min of 2 timed runs after a warm-up) plus the
replicate-invariance check that the overall mean column is identical at
every R (it is computed from the base frame, not the replicates).
"""
from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rs = [int(a) for a in sys.argv[2:]] or [8, 32, 128]

    from nsdb_spark.operators import analytics
    from nsdb_spark.sources import testdata

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bootstrap-curve")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    ev = testdata.events_metric(spark, sf_dir)
    means = set()
    print(f"{'R':>5}  {'sec (min of 2)':>14}")
    for r in rs:
        analytics.bootstrap_mean_ci(ev, "value", "event_id", r).collect()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            row = analytics.bootstrap_mean_ci(
                ev, "value", "event_id", r
            ).collect()[0]
            best = min(best, time.time() - t0)
        means.add(row["mean"])
        print(f"{r:>5}  {best:>14.2f}")
    assert len(means) == 1, f"overall mean must be R-invariant, got {means}"
    print(f"mean (R-invariant): {means.pop()}")
    spark.stop()


if __name__ == "__main__":
    main()
