"""Custom stateful streaming operator: NSDb-style temporal buckets with
amended re-pushes, built on applyInPandasWithState.

Why not plain `groupBy(window(...))`: Spark's windowed aggregation covers
the common case (streaming/ingest.stream_temporal_agg), but NSDb's
PublisherActor semantics (PublisherActor.scala:220-298) re-push a bucket's
FULL recomputed aggregate every time late data lands in it, and the bucket
state must survive engine restarts. applyInPandasWithState gives exactly
that: per-bucket running partials (count/sum/min/max) in the state store —
checkpointed, restored on restart — with one amended output row per bucket
per batch that touched it.

Scale shape: state is keyed by bucket upper-bound; each key holds four
numbers regardless of event volume (running partials, not raw rows). A
1000-executor cluster shards the state store by key like any streaming
aggregation.
"""
from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "upper_bound long, lower_bound long, count_value long, sum_value double, "
    "min_value double, max_value double, avg_value double"
)
STATE_SCHEMA = "cnt long, sm double, mn double, mx double"


def stream_temporal_agg_stateful(
    stream_df: DataFrame,
    interval_ms: int,
    anchor_ms: int = 0,
    value_col: str = "value",
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Per-bucket running aggregates with amended re-emission.

    Input: a streaming frame with (timestamp BIGINT ms, value numeric).
    Output (update mode): one row per bucket per batch that touched it,
    carrying the bucket's FULL current aggregates — the re-pushed amended
    result a subscriber sees. Buckets are [lb, ub) anchored at anchor_ms
    (NSDb anchors at subscription time, SURVEY.md §2.8).

    State is BOUNDED: a bucket untouched for `state_ttl_ms` of processing
    time is evicted (its amendment horizon — NSDb's grace analogue; with
    NoTimeout every bucket ever opened would live in the state store for
    the stream's lifetime). A late row for an evicted bucket re-opens it
    with partials counted from that row on. Null timestamps are dropped
    (a NULL bucket key would poison the state function on every replay).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    iv = int(interval_ms)
    ttl = int(state_ttl_ms)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        ub = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cnt, sm, mn, mx = state.get
        else:
            cnt, sm, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            # NULL values arrive as NaN: len() would count them while
            # sum/min/max skip them (count/avg diverge), and an all-NaN
            # batch would seed mn/mx with NaN, which min()/max() then
            # propagate forever — drop them, matching the batch path's
            # count(value)/avg semantics
            v = pdf[value_col].astype("float64").dropna()
            if not len(v):
                continue
            cnt += int(len(v))
            sm += float(v.sum())
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((cnt, sm, mn, mx))
        state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "upper_bound": [ub],
                "lower_bound": [ub - iv],
                "count_value": [cnt],
                "sum_value": [sm],
                "min_value": [mn],
                "max_value": [mx],
                "avg_value": [sm / cnt if cnt else 0.0],
            }
        )

    # upper-INCLUSIVE buckets (lb, ub]: k = ceil((ts - anchor)/iv), the
    # same formula as SubscriptionManager's live path and the compiled
    # historical axis. floor(...)+1 differs exactly at interval
    # multiples — a boundary timestamp would land one bucket later here
    # than a historical re-query or re-subscription reports it.
    keyed = stream_df.filter(F.col("timestamp").isNotNull()).withColumn(
        "__ub",
        (
            F.lit(anchor_ms)
            - F.floor((F.lit(anchor_ms) - F.col("timestamp")) / F.lit(iv))
            * F.lit(iv)
        ).cast("long"),
    )
    return keyed.groupBy("__ub").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
