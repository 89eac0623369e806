"""Interleaved A/B for the serving floor (VERDICT r8 item 1).

Measures, in ONE process, the bench's serving scenarios:
  gatling_100_point_queries — 100x collect() of events.limit(1) on the
                              analytics session (bench.py:482 shape)
  grpc_100_point_queries    — 100 identical rpcs (statement cache path)
  grpc_100_distinct_queries — 100 unique-LIMIT rpcs (shape cache path)
  grpc_100_distinct_shapes  — 100 unique-filter rpcs (full plan path)

Variant knobs (env):
  SPARK_GRAFT_CPUS     — core count (the 32-vs-8 axis)
  SERVING_MODE         — interp (current code), interp-nocap (reset the
                         r9 partition caps to the r8 defaults), codegen
                         (disable the point route: plans stay on the
                         codegen session)

Run it alternately across variants from a driver shell; each invocation
prints one JSON line. 20-iteration warmup per scenario before timing
(the bench's gatling loop runs JVM-warm after 347 entries).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mode = os.environ.get("SERVING_MODE", "interp")

    from nsdb_spark.session import tuned_builder

    spark = (
        tuned_builder(f"local[{cpus}]", "serving-ab")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from nsdb_spark.engine import NsdbEngine
    from nsdb_spark.grpc import NsdbGrpcClient, serve_grpc
    from nsdb_spark.model import Bit
    from nsdb_spark.sources import testdata

    res: dict[str, float] = {}

    # --- gatling shape (analytics session, like bench.py) ---
    point = testdata.events_metric(spark, sf_dir).limit(1)
    for _ in range(20):
        point.collect()
    t0 = time.time()
    for _ in range(100):
        point.collect()
    res["gatling_100_point_queries"] = round(time.time() - t0, 3)

    # --- grpc engine scenarios ---
    engine = NsdbEngine(spark, tempfile.mkdtemp(prefix="grpc_ab_"))
    if mode == "codegen":
        engine._point_route = lambda *a, **k: False  # type: ignore
    engine.insert_bits(
        "default", "default", "points",
        [Bit(t, t % 97, {}, {"k": f"g{t % 5}"}) for t in range(200)],
    )
    if mode == "interp-nocap":
        s = engine._serving_session()
        s.conf.set("spark.sql.files.minPartitionNum", str(cpus))
        s.conf.set("spark.sql.leafNodeDefaultParallelism", str(cpus))
        s.conf.set("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
    server = serve_grpc(engine, port=0)
    client = NsdbGrpcClient(server.host, server.port)
    try:
        for _ in range(20):
            client.execute_sql("default", "default",
                               "select * from points limit 1")
        t0 = time.time()
        ok = 0
        for _ in range(100):
            r = client.execute_sql("default", "default",
                                   "select * from points limit 1")
            if r.get("completedSuccessfully") and r.get("records"):
                ok += 1
        res["grpc_100_point_queries"] = round(time.time() - t0, 3)

        for i in range(20):
            client.execute_sql("default", "default",
                               f"select * from points limit {101 + i}")
        t0 = time.time()
        for i in range(100):
            client.execute_sql("default", "default",
                               f"select * from points limit {i + 1}")
        res["grpc_100_distinct_queries"] = round(time.time() - t0, 3)

        for i in range(20):
            client.execute_sql(
                "default", "default",
                f"select * from points where timestamp >= {100 + i} limit 5")
        t0 = time.time()
        for i in range(100):
            client.execute_sql(
                "default", "default",
                f"select * from points where timestamp >= {i} limit 5")
        res["grpc_100_distinct_shapes"] = round(time.time() - t0, 3)
        res["ok"] = ok
    finally:
        client.close()
        server.stop()
    print(json.dumps({"cpus": int(cpus), "mode": mode, **res}))
    spark.stop()


if __name__ == "__main__":
    main()
