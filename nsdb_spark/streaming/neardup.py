"""Streaming near-duplicate alerts: every arriving micro-batch of
documents is appended to the stored incremental MinHash index and probed
against the FULL history, and each detected near-dup pair is landed as a
first-class bit in an alert metric — which makes the alert channel
queryable, retained, and live-subscribable over the existing WebSocket /
HTTP transports with zero new wire surface (a WS client registered on
`select * from <alert_metric>` receives each pair as it is detected).

This is the join-up of three proven pieces, not a new algorithm:
- `dedup.append_minhash_index`-shaped signature appends (here with an
  `ingest_batch` column so batch membership is a partition-prunable
  predicate, never a driver-side id list);
- `dedup.minhash_incremental_pairs` — only the new batch's band buckets
  probe the index, so per-batch cost is O(batch × bands + collisions),
  independent of history size (the measured flat curve in BASELINE.md);
- the metric ingest/publish path (`engine.insert_bits` +
  `SubscriptionManager.publish`), the same route every streamed bit
  takes to a subscriber.

Scale shape: signature computation and the band-bucket probe are fully
distributed; the only driver-side materialization is the verified alert
pairs themselves — the channel's output, which an alerting design bounds
by construction (a threshold low enough to flood the driver would flood
the human downstream first). Replays are guarded by the same
CommittedBatchMarker as warehouse ingest: a replayed batch neither
re-appends signatures nor re-fires alerts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..model import Bit
from ..operators import dedup
from .ingest import CommittedBatchMarker


def start_neardup_alerts(
    engine,
    stream_df: DataFrame,
    index_name: str,
    checkpoint_dir: str,
    db: str = "default",
    ns: str = "default",
    alert_metric: str = "neardup_alerts",
    subscription_manager=None,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    trigger_seconds: int = 15,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the alert stream over a (doc_id, text) source.

    Each alert bit: timestamp = detection time (engine.now_fn),
    value = exact jaccard on the stored shingle sets, dimensions
    doc_a/doc_b (doc_a < doc_b). The index table is created on the first
    batch (with the `ingest_batch` column) and appended thereafter; an
    existing `write_minhash_index` table lacks that column and is not a
    valid target — point this at its own index name.
    """
    spark = engine.spark
    marker = CommittedBatchMarker(spark, checkpoint_dir)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= marker.last():
            return  # replayed batch: signatures + alerts already applied
        sigs = dedup.minhash_signatures(batch_df, n, num_hashes).withColumn(
            "ingest_batch", F.lit(batch_id)
        )
        # The index is PARTITIONED BY ingest_batch and each batch lands
        # via dynamic partition overwrite (replacing only its own
        # partition), NOT a plain append: a crash between this write and
        # marker.commit replays the batch, and an append would leave
        # every doc with duplicate signature rows FOREVER — each future
        # candidate pair involving them would then multiply through the
        # verify join and re-fire alerts on every batch. Overwrite makes
        # the replay idempotent; the marker still skips the re-probe
        # (so alerts don't re-fire) and bounds re-work to one batch.
        # Bonus: the is_new batch filter becomes a partition-pruned scan.
        if not spark.catalog.tableExists(index_name):
            from ..sources.bucketed import _clear_stale_location

            # dropped-table leftovers block saveAsTable (same hygiene as
            # write_minhash_index)
            _clear_stale_location(spark, index_name)
            sigs.write.mode("overwrite").partitionBy(
                "ingest_batch"
            ).saveAsTable(index_name)
        else:
            # the conf must be set on the BATCH df's session: foreachBatch
            # plans writes under a CLONED session with isolated conf, so
            # setting it on the outer session is invisible here, and
            # insertInto ignores writer options (verified on this Spark)
            # — either mistake degrades to a STATIC overwrite that
            # silently truncates the whole history on every batch
            bspark = sigs.sparkSession
            prev = bspark.conf.get("spark.sql.sources.partitionOverwriteMode")
            bspark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                sigs.select(*spark.table(index_name).columns).write.mode(
                    "overwrite"
                ).insertInto(index_name)
            finally:
                bspark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.catalog.refreshTable(index_name)
        pairs = dedup.minhash_incremental_pairs(
            spark,
            index_name,
            F.col("ingest_batch") == batch_id,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        )
        alerts = pairs.collect()  # bounded: the alert channel's output
        now = engine.now_fn()
        if alerts:
            engine.insert_bits(
                db, ns, alert_metric,
                [
                    Bit(
                        now,
                        float(r["jaccard"]),
                        {"doc_a": int(r["doc_a"]), "doc_b": int(r["doc_b"])},
                        {},
                    )
                    for r in alerts
                ],
            )
        marker.commit(batch_id)
        if subscription_manager is not None and alerts:
            subscription_manager.publish(
                db, ns, alert_metric,
                [
                    {
                        "timestamp": now,
                        "value": float(r["jaccard"]),
                        "doc_a": int(r["doc_a"]),
                        "doc_b": int(r["doc_b"]),
                    }
                    for r in alerts
                ],
            )

    writer = stream_df.writeStream.foreachBatch(probe_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
