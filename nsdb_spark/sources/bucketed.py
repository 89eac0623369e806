"""Bucketed warehouse tables: shuffle-free co-located joins.

NSDb co-locates a metric's index shards with their data on one node
(ClusterListener.scala shard-allocation, SURVEY.md §4) so per-shard reads
never cross the network. The Spark-first analogue for JOIN-heavy layouts
is BUCKETING: both sides of a recurring equi-join are written pre-hashed
into the same number of buckets on the join key, so every future join is
a zipped per-bucket sort-merge with NO Exchange on either side — at
100 TB the shuffle that normally dominates a fact-to-fact join simply
never happens, every run, forever, for one write-time cost.

Bucket files also pin `spark.sql.shuffle.partitions`-independent
parallelism: each bucket is a task, so size bucket count to the target
cluster (e.g. 4096 buckets ≈ 25 GB/bucket at 100 TB).

These are Spark-native managed tables (`bucketBy().sortBy().
saveAsTable()`), readable by any Spark session sharing the warehouse dir
— no Hive metastore required for the native catalog.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _clear_stale_location(spark: SparkSession, name: str) -> None:
    """Delete the managed-table directory a previous session may have
    left behind. The default in-memory catalog loses table METADATA
    between sessions while the warehouse DIRECTORY persists, so a bare
    saveAsTable fails with LOCATION_ALREADY_EXISTS on the next session.

    Goes through the Hadoop FileSystem resolved FROM the warehouse URI
    (same discipline as streaming/ingest.py's committed-batch marker):
    os.path/shutil silently no-op on hdfs:// or s3a:// warehouses, which
    is exactly where the 100 TB deployment lives. Handles db-qualified
    names ('db.tbl' → <wh>/db.db/tbl, the managed-table layout)."""
    wh = spark.conf.get("spark.sql.warehouse.dir")
    parts = name.lower().split(".")
    rel = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    stale = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + rel)
    fs = stale.getFileSystem(hconf)
    if fs.exists(stale):
        fs.delete(stale, True)


def write_partitioned(
    df: DataFrame, name: str, key: str, coalesce_per_partition: bool = True
) -> None:
    """Persist df as a managed table DIRECTORY-PARTITIONED on `key` — the
    layout for stored-assignment serving (ANN cell/sig): a probe's
    `key IN (...)` becomes a PartitionFilter, and the file index opens
    only the probed directories. Unlike bucketing, partition pruning is
    applied unconditionally (no DisableUnnecessaryBucketedScan heuristic
    — a filter-only probe query gets its buckets un-pruned, measured),
    which is exactly the reference's shard-pruning discipline
    (ReadNodesSelection.scala:40-49) on a non-time axis.

    coalesce_per_partition pre-shuffles rows by `key` so each partition
    directory holds one file per holding task (small-file hygiene); at
    real scale leave the natural task layout or size with AQE.
    Same stale-location cleanup contract as write_bucketed."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    _clear_stale_location(spark, name)
    if coalesce_per_partition:
        df = df.repartition(F.col(key))
    df.write.mode("overwrite").format("parquet").partitionBy(key).saveAsTable(name)


def append_partitioned(df: DataFrame, name: str, key: str) -> None:
    """Append a batch into an existing write_partitioned table: rows land
    in their key's directory (new keys create new directories), existing
    files untouched — the incremental-ingest path for stored-assignment
    layouts. Same one-file-per-partition-per-batch hygiene.

    Survives a PROCESS RESTART: the default in-memory catalog loses the
    table metadata while the warehouse directory persists, and a bare
    append-saveAsTable would then take the CREATE path and fail with
    LOCATION_ALREADY_EXISTS. The write_* siblings fix that by deleting
    the stale directory — here that would destroy the very index being
    appended to, so instead the table is RE-REGISTERED over its
    surviving location (external table + partition recovery) and the
    append proceeds normally."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(name):
        _reregister_surviving_location(spark, name)
    df.repartition(F.col(key)).write.mode("append").format("parquet").partitionBy(
        key
    ).saveAsTable(name)


def _reregister_surviving_location(spark: SparkSession, name: str) -> None:
    """Re-attach a catalog entry to a table directory left by a previous
    session (schema + partitioning inferred from the files; partitions
    recovered from the directory names). No-op when the location is
    absent too — the subsequent saveAsTable then legitimately creates."""
    wh = spark.conf.get("spark.sql.warehouse.dir")
    parts = name.lower().split(".")
    rel = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
    loc = wh.rstrip("/") + "/" + rel
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(loc)
    if not p.getFileSystem(hconf).exists(p):
        return
    spark.catalog.createTable(name, path=loc, source="parquet")
    spark.catalog.recoverPartitions(name)


def write_bucketed(
    df: DataFrame, name: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist df as a managed table pre-hashed into `buckets` files on
    `key` (and sorted within each bucket, enabling merge-join without
    even a per-bucket sort).

    The default in-memory catalog loses table METADATA between sessions
    while the warehouse DIRECTORY persists, which makes a bare
    saveAsTable fail with LOCATION_ALREADY_EXISTS on the next session —
    so stale unregistered locations are cleared first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    _clear_stale_location(spark, name)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(name)


def cohort_order_stats(
    spark: SparkSession,
    orders: DataFrame,
    customer: DataFrame,
    buckets: int = 8,
    table_prefix: str = "bkt",
) -> DataFrame:
    """Per-market-segment order statistics via a CO-LOCATED join.

    Writes both sides bucketed on the customer key, then joins the
    bucketed tables: the physical plan has no Exchange under the join —
    each task merge-joins one (orders-bucket, customer-bucket) pair read
    straight off storage (asserted in tests/test_plans.py). The only
    shuffle in the whole query is the final tiny per-segment aggregate.

    Output: (c_mktsegment, n_orders, sum_price, n_customers); the price
    sum runs in decimal(18,2) so it is exact and addition-order
    independent (same contract as the oracle), cast once to double.
    """
    ot, ct = f"{table_prefix}_orders", f"{table_prefix}_customer"
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        ot,
        "o_custkey",
        buckets,
    )
    write_bucketed(
        customer.select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        ),
        ct,
        "o_custkey",
        buckets,
    )
    joined = spark.table(ot).join(spark.table(ct), "o_custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )
