"""Physical-plan regression tests: the scale properties the engine relies
on (SURVEY.md §4) must be visible in the executed plan, not assumed.

- WHERE compiles into the parquet scan (≡ NSDb predicate pushdown,
  ExpressionParser.scala:39-235).
- timestamp ranges prune shard partitions (≡ location filtering,
  ReadNodesSelection.scala:40-49).
- aggregations split partial/final with map-side combine (≡ the
  shard→node reduce tree, post_proc/package.scala).
"""
import pytest

from nsdb_spark.model import Bit
from nsdb_spark.sources import testdata

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def sharded_engine(engine):
    engine.warehouse.init_metric("default", "default", "planm", 10000)
    engine.insert_bits(
        "default", "default", "planm",
        [Bit(t, t, {}, {"g": "x"}) for t in range(0, 100000, 5000)],
    )
    return engine


def test_filter_pushdown_reaches_parquet_scan(spark):
    # cached subtrees from other tests would replace the FileScan with an
    # InMemoryRelation and hide the pushdown we're asserting on
    spark.catalog.clearCache()
    # plan rendering elides filter lists at 100 chars by default
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = testdata.run_nsdb_on_events(
        spark, SF_DIR,
        "select event_id from events where value >= 150 and event_type = purchase",
    )
    scan = plan_of(df).split("FileScan", 1)[1]
    assert ">= 150" in scan.split("ReadSchema")[0]
    assert "purchase" in scan.split("ReadSchema")[0]


def test_column_pruning_reads_only_projected(spark):
    spark.catalog.clearCache()
    df = testdata.run_nsdb_on_events(
        spark, SF_DIR, "select event_type from events limit 5"
    )
    scan = plan_of(df).split("FileScan", 1)[1]
    # projection = timestamp, value, event_type → props/user_id not read
    assert "props" not in scan.split("ReadSchema")[0]


def test_shard_partition_pruning(sharded_engine):
    df = sharded_engine.execute("select * from planm where timestamp in (42000, 58000)")
    plan = plan_of(df)
    i = plan.find("PartitionFilters")
    assert i >= 0
    assert "shard_start" in plan[i : i + 120]
    assert sorted(r[0] for r in df.collect()) == [45000, 50000, 55000]


def test_groupby_partial_final_split(sharded_engine):
    df = sharded_engine.execute("select sum(value) from planm group by g")
    plan = plan_of(df)
    assert "partial_sum" in plan
    # exactly one shuffle: the final aggregation exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_temporal_bucket_join_is_broadcast(sharded_engine):
    df = sharded_engine.execute("select sum(value) from planm group by interval 20s")
    assert "BroadcastExchange" in plan_of(df)
