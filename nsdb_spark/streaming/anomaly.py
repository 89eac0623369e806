"""Streaming seasonal-anomaly alerts: score every arriving event against
a seasonal baseline fitted ONCE from history (per-(key, phase) mean +
per-key residual stddev — the batch operator tsa.seasonal_anomalies'
model, frozen), land each |z| > threshold event as a first-class bit in
an alert metric, and push it over the existing subscription transports —
the "de-weekly before alerting" story the batch operator documents,
running live. The alert channel is queryable, retained, and
WS-subscribable with zero new wire surface (the neardup.py pattern).

Scale shape: the baseline is keys × phases rows — broadcast-sized at any
event volume — so per-batch scoring is a narrow projection plus one
broadcast join; the only driver-side materialization is the alerts
themselves (the channel's output, bounded by the threshold by
construction). Replays are guarded by CommittedBatchMarker: a replayed
batch re-scores nothing and re-fires nothing.

The baseline is deliberately FROZEN (fit once, score forever): an alert
threshold that adapts to the data it is alarming on suppresses exactly
the regime changes it exists to catch. Refresh = re-fit + restart, the
same invalidate-and-rebuild rule as the engine's rollups.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..model import Bit
from .ingest import CommittedBatchMarker


def fit_seasonal_baseline(
    history: DataFrame,
    period_ms: int,
    bucket_ms: int,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
) -> list[dict]:
    """Fit the frozen baseline from a historical frame: one row per
    (key, phase) with the phase's seasonal mean and the key's residual
    sample stddev. Returned COLLECTED (keys × phases rows — model
    metadata, not data) so the scorer can rebuild it inside any session,
    including foreachBatch's cloned one."""
    phase = (
        (F.floor(F.col(ts) / F.lit(bucket_ms)) * F.lit(bucket_ms))
        % F.lit(period_ms)
    ).cast("long")
    base = history.filter(
        F.col(key).isNotNull() & F.col(value).isNotNull()
    ).select(
        F.col(key).alias("k"), F.col(value).alias("v"), phase.alias("phase")
    )
    pm = base.groupBy("k", "phase").agg(F.avg("v").alias("seasonal"))
    resid = base.join(pm, ["k", "phase"]).withColumn(
        "r", F.col("v") - F.col("seasonal")
    )
    sg = resid.groupBy("k").agg(F.stddev_samp("r").alias("sigma"))
    rows = pm.join(sg, "k").collect()
    return [
        {
            "k": r["k"],
            "phase": int(r["phase"]),
            "seasonal": float(r["seasonal"]),
            "sigma": float(r["sigma"]) if r["sigma"] is not None else None,
        }
        for r in rows
    ]


def start_seasonal_anomaly_alerts(
    engine,
    stream_df: DataFrame,
    baseline: list[dict],
    checkpoint_dir: str,
    db: str = "default",
    ns: str = "default",
    alert_metric: str = "anomaly_alerts",
    subscription_manager=None,
    period_ms: int = 604800000,
    bucket_ms: int = 86400000,
    z: float = 3.0,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
    trigger_seconds: int = 15,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the alert stream over a metric-shaped source. Each alert
    bit: timestamp = the EVENT's timestamp (event time, so the alert
    metric supports temporal queries over when anomalies happened),
    value = the z-score, dimensions src_id (the event's id) and grp (its
    key). Events whose (key, phase) has no baseline row, or whose key's
    sigma is NULL/0 (constant or single-sample history), never alert —
    an unknown regime is an ingest-coverage problem, not a page.
    """
    marker = CommittedBatchMarker(engine.spark, checkpoint_dir)
    stats = [
        b for b in baseline if b["sigma"] is not None and b["sigma"] > 0
    ]

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= marker.last():
            return  # replayed batch: alerts already fired
        alerts: list = []
        if stats:
            # rebuild the tiny baseline frame on the BATCH's session —
            # foreachBatch runs under a cloned session, and joining a
            # frame owned by the outer session across that boundary is
            # undefined (the neardup.py conf lesson, applied to data)
            bspark = batch_df.sparkSession
            sdf = bspark.createDataFrame(
                [
                    (b["k"], b["phase"], b["seasonal"], b["sigma"])
                    for b in stats
                ],
                "k string, ph long, seasonal double, sigma double",
            )
            phase = (
                (F.floor(F.col(ts) / F.lit(bucket_ms)) * F.lit(bucket_ms))
                % F.lit(period_ms)
            ).cast("long")
            zc = F.round(
                (F.col(value) - F.col("seasonal")) / F.col("sigma"), 4
            )
            alerts = (
                batch_df.filter(
                    F.col(key).isNotNull() & F.col(value).isNotNull()
                )
                .withColumn("__phase", phase)
                .join(
                    F.broadcast(sdf),
                    (F.col(key) == F.col("k"))
                    & (F.col("__phase") == F.col("ph")),
                )
                .withColumn("__z", zc)
                .filter(F.abs(F.col("__z")) > F.lit(z))
                .select(id_col, key, ts, "__z")
                .collect()  # bounded: the alert channel's output
            )
        if alerts:
            engine.insert_bits(
                db, ns, alert_metric,
                [
                    Bit(
                        int(r[ts]),
                        float(r["__z"]),
                        {"src_id": int(r[id_col]), "grp": str(r[key])},
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
                        "timestamp": int(r[ts]),
                        "value": float(r["__z"]),
                        "src_id": int(r[id_col]),
                        "grp": str(r[key]),
                    }
                    for r in alerts
                ],
            )

    writer = stream_df.writeStream.foreachBatch(score_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
