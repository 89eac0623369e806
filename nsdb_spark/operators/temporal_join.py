"""Temporal join operators: as-of join and gap sessionization.

The reference dialect has no joins at all (SQLStatementParser.scala — a
single-metric FROM only), but a time-series store at training-pipeline
scale constantly needs "align this stream with the latest state of that
one". Two Spark-first operators:

- `asof_join`: for each left row, the most recent right row with
  right_ts <= left_ts per join key. NOT implemented as a range join —
  a `l.key = r.key AND r.ts <= l.ts` join explodes to the per-key
  cartesian product before the "latest" filter (at 100 TB a hot key
  with 1 M rows each side is 10^12 intermediate rows). Instead the
  union-tag pattern: tag both sides, union, single hash-shuffle on the
  key, sort each partition by (ts, side), and carry the right payload
  forward with `last(..., ignorenulls=True)` over a running window.
  Cost: ONE shuffle + ONE sort, zero row amplification, streaming
  window state of O(payload) per partition. This is the same plan
  Flink's event-time temporal join executes (sorted per-key state,
  latest-value lookup).

- `sessionize`: gap-based sessions (new session when the gap to the
  previous event of the same key exceeds `gap_ms`): lag → boundary
  flag → running sum = session index, then one aggregation per
  session. Batch twin of Structured Streaming's
  `session_window(ts, gap)` (use that + watermark for the streaming
  path; this operator exists so the batch/backfill result is
  bit-identical to a SQL oracle).

Skew note: both shuffle on the key; a pathological hot key (bot user)
serializes its partition. The salting pattern in `operators/skew.py`
composes: salt the left side and replicate the right side's rows into
every salt bucket, then union-tag within (key, salt).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    ts: tuple[str, str],
    payload: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
    salt: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: latest right row with r_ts <= l_ts per key
    (direction='backward', the default), or EARLIEST right row with
    r_ts >= l_ts (direction='forward' — "the next shipment after the
    order", the other half of DuckDB/pandas merge_asof semantics; same
    single-exchange plan, the running carry just scans time reversed).

    on=(left_key, right_key), ts=(left_ts, right_ts); payload = right
    columns carried onto matching left rows (null when no prior right
    row). tie_break: right column whose max wins among right rows
    sharing (key, ts) — makes the result deterministic (DuckDB's ASOF
    JOIN leaves the choice open; we pin it on both sides). Both
    directions are INCLUSIVE: a right row exactly at l_ts matches.

    salt=N splits each key's LEFT rows across N buckets (deterministic
    ts-hash) and replicates the RIGHT rows into every bucket, so one hot
    key (bot user) parallelizes N-ways instead of serializing its
    partition — results are bit-identical to unsalted (each bucket still
    sees the key's complete right stream; asserted in tests). Cost:
    right-side rows shuffle ×N — size N to the hot-key headroom needed,
    per the skew.py salting discipline.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', "
            f"got {direction!r}"
        )
    lk, rk = on
    lts, rts = ts
    if tie_break is not None:
        # deterministic dedupe: one right row per (key, ts), arg-max by
        # tie_break (map-side combinable groupBy, tiny vs the union)
        aggs = [F.max(tie_break).alias(tie_break)] + [
            F.max_by(c, tie_break).alias(c) for c in payload if c != tie_break
        ]
        right = right.groupBy(rk, rts).agg(*aggs)
        pay_cols = payload
    else:
        pay_cols = payload

    left_cols = left.columns
    rtypes = dict(right.dtypes)
    # the payload travels as ONE struct per right row: a right row whose
    # payload columns are legitimately NULL is still a non-null struct,
    # so last(ignorenulls) cannot skip past it to stale older state —
    # per-column carry-forward conflated "no prior right row" with
    # "prior right row with a NULL value"
    pay_struct_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in pay_cols) + ">"
    l_salt = (
        F.pmod(F.xxhash64(F.col(lts)), F.lit(salt)) if salt else F.lit(0)
    ).alias("__salt")
    l_side = left.select(
        F.col(lk).alias("__key"),
        F.col(lts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_salt,
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(pay_struct_t).alias("__pay"),
    )
    ltypes = dict(left.dtypes)
    r_side = right.select(
        F.col(rk).alias("__key"),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(0).alias("__salt"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_cols],
        F.struct(*[F.col(c).alias(c) for c in pay_cols]).alias("__pay"),
    )
    if salt:
        # right rows replicate into every salt bucket: each bucket holds
        # the key's COMPLETE right stream
        r_side = r_side.withColumn(
            "__salt", F.explode(F.array(*[F.lit(s) for s in range(salt)]))
        )
    # rights sort before lefts at equal ts (__side 0 < 1) → an exactly
    # simultaneous right row DOES match (at-or-before semantics);
    # forward scans time descending with the same side order, so the
    # carry holds the EARLIEST right row at-or-after each left row
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__key", "__salt")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_side.unionByName(r_side).withColumn(
        "__pay", F.last("__pay", ignorenulls=True).over(w)
    )
    for c in pay_cols:
        unioned = unioned.withColumn(f"{prefix}{c}", F.col(f"__pay.{c}"))
    return unioned.filter(F.col("__side") == 1).drop(
        "__key", "__ts", "__side", "__salt", "__pay"
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    ts: tuple[str, str],
    payload: list[str],
    tie_break: str,
    tolerance: int | None = None,
    prefix: str = "near_",
) -> DataFrame:
    """Nearest-neighbor temporal join: for each left row, the right row
    of the same key whose timestamp is CLOSEST to the left timestamp in
    EITHER direction, optionally within `tolerance` (inclusive). The
    backward candidate wins exact distance ties (and at distance 0 both
    directions resolve to the same deduped right row, so the choice is
    moot there).

    Completes the temporal-join family: asof_join is "latest at-or-
    before", window_agg_join is "aggregate over [t, t+w)", interval_join
    is "point in [start, end]" — this is "closest either side", the
    sensor-alignment shape ("pair each reading with the nearest
    calibration sample").

    NOT a |l_ts - r_ts| theta join (BroadcastNestedLoopJoin, O(n*m)).
    Two as-of passes instead: the backward pass as-is, the forward pass
    as the SAME asof_join over a negated time axis (latest negated
    r_ts <= negated l_ts == earliest r_ts >= l_ts). Each pass is one
    union-tag shuffle + sort with zero row amplification; the
    distance arg-min is a per-row expression afterwards.

    tie_break: right column whose max pins the choice among right rows
    sharing (key, ts) — required, so both passes (and a SQL oracle)
    dedupe identically. Appends `{prefix}{c}` for each payload column
    plus `{prefix}dist` (null where no right row within tolerance).
    """
    lk, rk = on
    lts, rts = ts
    # carry the right timestamp as payload so the distance is computable
    # after the as-of; __nb/__nf are the negated axes for the forward pass
    rpay = right.withColumn("__rts_pay", F.col(rts).cast("long"))
    pay = payload + ["__rts_pay"]
    b = asof_join(
        left, rpay, on=on, ts=(lts, rts), payload=pay,
        tie_break=tie_break, prefix="__b_",
    )
    b = b.withColumn("__nlts", -F.col(lts).cast("long"))
    rneg = rpay.withColumn("__nrts", -F.col(rts).cast("long"))
    both = asof_join(
        b, rneg, on=on, ts=("__nlts", "__nrts"), payload=pay,
        tie_break=tie_break, prefix="__f_",
    )
    db = F.col(lts).cast("long") - F.col("__b___rts_pay")
    df_ = F.col("__f___rts_pay") - F.col(lts).cast("long")
    b_ok = db.isNotNull() if tolerance is None else (
        db.isNotNull() & (db <= F.lit(tolerance))
    )
    f_ok = df_.isNotNull() if tolerance is None else (
        df_.isNotNull() & (df_ <= F.lit(tolerance))
    )
    use_b = b_ok & (~f_ok | (db <= df_))
    use_f = f_ok & ~use_b
    out = both
    for c in payload:
        out = out.withColumn(
            f"{prefix}{c}",
            F.when(use_b, F.col(f"__b_{c}")).when(use_f, F.col(f"__f_{c}")),
        )
    out = out.withColumn(
        f"{prefix}dist", F.when(use_b, db).when(use_f, df_)
    )
    drop = ["__nlts"] + [f"__b_{c}" for c in pay] + [f"__f_{c}" for c in pay]
    return out.drop(*drop)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_ms: int,
    order_tie: str,
    value: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: one output row per (key, session).

    Session boundary: gap to the previous row of the same key > gap_ms
    (ordering tie-broken by `order_tie` so the running sum is
    deterministic). Returns key, session_id (0-based per key),
    session_start/end, n_events, and sum_<value> if value is given.

    Plan shape: one hash-shuffle on `key` for the two windows (lag +
    running sum share the sort), then a partial+final HashAggregate on
    (key, session_id) — the partial side collapses each session to one
    row before the second (tiny) shuffle.
    """
    w_order = Window.partitionBy(key).orderBy(ts, order_tie)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(w_order)
    boundary = F.when(
        prev.isNull() | (F.col(ts) - prev > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = df.withColumn(
        "session_id", F.sum(boundary).over(w_run) - F.lit(1)
    )
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value is not None:
        aggs.append(F.sum(value).alias(f"sum_{value}"))
    return with_sess.groupBy(key, "session_id").agg(*aggs)


def session_depth_histogram(
    df: DataFrame,
    key: str,
    ts: str,
    gap_ms: int,
    order_tie: str,
    cap: int = 20,
) -> DataFrame:
    """Distribution of session DEPTH (events per session) under the
    same gap rule as sessionize — the engagement-shape readout ("are
    sessions one-shot bounces or long journeys?") that per-session
    rows bury at scale: billions of sessions collapse to ≤ cap+1
    histogram rows here.

    Depths above `cap` fold into the cap bucket (reported as depth =
    cap, the "cap or more" bin), keeping the output frame
    constant-size regardless of outlier sessions. Counts and depths
    are integers; only the share is rounded.

    Plan: sessionize's single key-shuffle (lag + running sum share the
    sort), partial+final aggregate to (key, session) rows, then a
    map-side-combinable groupBy on the folded depth and one broadcast
    total join.

    Output: (depth int, n_sessions bigint, share r6), ascending depth.
    """
    sess = sessionize(df, key=key, ts=ts, gap_ms=gap_ms, order_tie=order_tie)
    hist = (
        sess.select(
            F.least(F.col("n_events"), F.lit(cap)).cast("int").alias("depth")
        )
        .groupBy("depth")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    tot = hist.agg(F.sum("n_sessions").alias("__tot"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "depth",
            "n_sessions",
            F.round(
                F.try_divide(F.col("n_sessions"), F.col("__tot").cast("double")), 6
            ).alias("share"),
        )
        .orderBy("depth")
    )


def session_paths(
    df: DataFrame,
    key: str,
    ts: str,
    gap_ms: int,
    order_tie: str,
    label: str,
    k: int = 20,
) -> DataFrame:
    """Top-k session paths: the most frequent ordered sequences of
    `label` values within gap-based sessions — trajectory mining over
    an event log ("which page/event flows dominate?"), the sequence
    sibling of transition_counts (which only sees adjacent pairs and
    loses everything about full journeys).

    Same session-boundary window as sessionize (one hash-shuffle on
    `key`, lag + running sum share the sort). Each session then
    collapses to one path string via a per-group collect_list sorted by
    (ts, order_tie) — bounded by session length, the same per-group
    bound sessionize's aggregates rely on, NOT corpus-sized. Path
    counting is a map-side-combinable groupBy on the path string, and
    the final ORDER BY n DESC LIMIT k sorts only the distinct-path
    frame with a k-row TakeOrdered. Ties break on path ASC so the
    result is deterministic.

    Output: (path string, n_sessions bigint), k rows.
    """
    w_order = Window.partitionBy(key).orderBy(ts, order_tie)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(w_order)
    boundary = F.when(
        prev.isNull() | (F.col(ts) - prev > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = df.withColumn(
        "session_id", F.sum(boundary).over(w_run) - F.lit(1)
    )
    # sort key rides inside the collected struct: field order
    # (ts, order_tie, label) makes array_sort reproduce the session's
    # event order without a second window
    paths = with_sess.groupBy(key, "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(ts, order_tie, label))
                ),
                lambda s: s[label],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def window_agg_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    ts: tuple[str, str],
    window_ms: int,
    value_col: str,
    right_id: str,
    n_alias: str = "n_right",
    sum_alias: str = "sum_value",
    salt: int | None = None,
) -> DataFrame:
    """Attribution-window join: for EVERY left row, the count and value
    sum of right rows with the same key in [l_ts, l_ts + window_ms) —
    the conversion-window shape ("events within 7 d after each order").

    NOT a range join: `l.key = r.key AND r.ts BETWEEN ...` explodes to
    the per-key cross product before aggregation (the asof_join docstring
    math — 10^12 intermediate rows for one hot key at 100 TB). Instead
    PREFIX SUMS + two as-of probes: the right stream becomes per-key
    cumulative (n, sum) ordered by (ts, id) — one window sort — and each
    left row reads the cumulative at (l_ts + window - 1) and (l_ts - 1);
    the window aggregate is their difference. Two probe rows per left
    row ride the SAME union-tag shuffle as asof_join: one sort, zero row
    amplification, any window width for free.

    Columns of `left` are preserved; results append (n_alias, sum_alias)
    with 0 for empty windows. The sum is a same-sequence cumulative
    difference — deterministic given the (ts, id) order.

    CONTRACT: left rows must be unique as tuples (they are the final
    group key — two identical left rows would collapse into one output
    row with doubled aggregates). Real fact rows carry a unique id
    (o_orderkey here); attach one upstream otherwise.
    """
    lk, rk = on
    lts, rts = ts
    cum_w = (
        Window.partitionBy(rk)
        .orderBy(rts, right_id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = right.select(
        rk,
        rts,
        F.col(right_id).alias("__rid"),
        F.count(F.lit(1)).over(cum_w).alias("cum_n"),
        F.sum(value_col).over(cum_w).alias("cum_sum"),
    )
    # one row per (key, ts): the LAST cumulative of that timestamp
    cum = cum.groupBy(rk, rts).agg(
        F.max_by(F.col("cum_n"), F.col("__rid")).alias("cum_n"),
        F.max_by(F.col("cum_sum"), F.col("__rid")).alias("cum_sum"),
    )
    probes = left.select(
        "*",
        F.explode(
            F.array(
                F.struct(
                    (F.col(lts) - 1).alias("__p"), F.lit(-1).alias("__sign")
                ),
                F.struct(
                    (F.col(lts) + F.lit(window_ms) - 1).alias("__p"),
                    F.lit(1).alias("__sign"),
                ),
            )
        ).alias("__pr"),
    ).select("*", F.col("__pr.__p").alias("__p"), F.col("__pr.__sign").alias("__sign")).drop("__pr")
    joined = asof_join(
        probes, cum, on=(lk, rk), ts=("__p", rts), payload=["cum_n", "cum_sum"],
        prefix="__w_", salt=salt,
    )
    group_cols = [c for c in left.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.sum(F.col("__sign") * F.coalesce(F.col("__w_cum_n"), F.lit(0))).alias(n_alias),
            F.sum(
                F.col("__sign") * F.coalesce(F.col("__w_cum_sum"), F.lit(0.0))
            ).alias(sum_alias),
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Inner join of point rows onto VARIABLE-length interval rows with
    start <= ts <= end (both inclusive, the SQL BETWEEN shape) — the
    general range join window_agg_join can't express (that operator needs
    a fixed window width; here every interval row carries its own
    [start, end]).

    NOT a theta join: `ON ts BETWEEN start AND end` plans as
    BroadcastNestedLoopJoin — O(points x intervals) comparisons, dead at
    scale. The bucketed-range-join rewrite instead: quantize the time
    axis into `bucket`-sized cells, explode each interval into the cells
    it covers, map each point to its single cell, EQUI-join on the cell
    id (SortMergeJoin — shuffle is linear in rows), then apply the exact
    BETWEEN as a post-join filter. A point matches an interval in
    exactly one cell (the point's own), so no dedup pass is needed.

    Cost knob: replication = avg_interval_span/bucket + 1 copies of the
    interval side. Pick `bucket` near the median interval length (~2x
    replication); the same trick underpins Databricks' range-join hints
    and every spatial grid join. Both inputs' column sets must be
    disjoint (standard join hygiene — rename upstream).
    """
    p = points.withColumn("__cell", F.floor(F.col(ts_col) / bucket))
    # an empty interval (end < start) matches nothing under BETWEEN —
    # drop it BEFORE sequence(), which would otherwise count DOWN and
    # emit bogus cells
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket),
                F.floor(F.col(end_col) / bucket),
            )
        ),
    )
    # Explicit co-partitioning on the cell key: the join's OUTPUT is the
    # per-cell points x intervals product — orders of magnitude more rows
    # than its inputs — but AQE coalesces the exchanges on INPUT bytes,
    # squeezing the expansion onto a handful of tasks (measured 8 tasks /
    # 4.6 s on the sf0.1 lineitem-orders entry). Explicit repartitions
    # are exempt from coalescing and the join reuses them (same key,
    # same count) — no extra exchange, just an uncoalesced one.
    par = points.sparkSession.sparkContext.defaultParallelism
    return (
        p.repartition(par, "__cell")
        .join(iv.repartition(par, "__cell"), "__cell")
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__cell")
    )


def interval_concurrency(
    intervals: DataFrame, start: str, end: str
) -> DataFrame:
    """Peak concurrency over a set of [start, end] (inclusive, epoch-ms)
    intervals — "how many sessions were open at the busiest instant,
    and when" — the capacity-planning sweep-line. Classic single-node
    form sorts all boundaries and scans; at 100 TB that's the global
    sort this repo never pays: boundaries collapse to per-distinct-ts
    deltas (map-side combinable), the running count comes from the
    range-partition + local-cumsum + broadcast-P-offsets discipline
    (packing.partition_offsets), and the argmax is a bounded top-1.

    Ties resolve to the EARLIEST instant attaining the peak. Output one
    row: (peak_concurrent, at_ts, n_intervals). Empty input raises.
    """
    iv = intervals.filter(
        F.col(start).isNotNull() & F.col(end).isNotNull()
    ).select(F.col(start).alias("s"), F.col(end).alias("e"))
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    per = deltas.groupBy("t").agg(F.sum("d").cast("long").alias("d"))
    # checkpoint BEFORE deriving offsets (partition_offsets contract)
    p = (
        per.repartitionByRange("t")
        .sortWithinPartitions("t")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = p.withColumn("lc", F.sum("d").over(w))
    subtotals = {
        r["pid"]: r["sd"] or 0
        for r in p.groupBy("pid").agg(F.sum("d").alias("sd")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(subtotals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += subtotals.get(pid, 0)
    if not subtotals:
        raise ValueError("interval_concurrency: no intervals")
    off = intervals.sparkSession.createDataFrame(
        offsets, "pid int, off long"
    )
    run = p.join(F.broadcast(off), "pid").select(
        "t", (F.col("lc") + F.col("off")).alias("c")
    )
    n_iv = iv.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return (
        run.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(1)
        .crossJoin(F.broadcast(n_iv))
        .select(
            F.col("c").alias("peak_concurrent"),
            F.col("t").alias("at_ts"),
            "n_intervals",
        )
    )
