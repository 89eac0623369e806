"""Time-series analytics over metric frames: rate/derivative, LOCF
gap-fill, rolling z-score, min/max decimation.

NSDb's dialect stops at tumbling-window aggregates (SURVEY.md §2.5-2.6);
these are the next four queries every TSDB user asks for (PromQL `rate`,
Grafana gap-filling, anomaly bands, dashboard decimation), expressed as
Spark window/groupBy primitives:

- every per-key operator shares ONE hash-partition exchange on the key
  (window sorts happen within partitions — no extra shuffle);
- decimation and gap-fill reduce at the bucket grain with
  map-side-combinable aggregates (min/max of (value, ts, id) structs),
  so the shuffle carries buckets, not points;
- deterministic under timestamp ties everywhere: orderings and argmin/
  argmax structs always extend with event id.

At 100 TB these run per-key in parallel with partial aggregation before
the exchange; none of them materializes more than (keys × buckets) rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_rate(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key first difference and per-second rate (PromQL `rate` shape,
    without counter-reset healing): for each sample with a predecessor,
    delta = value - prev_value and rate_per_s = delta / (dt_ms/1000).
    rate is NULL when two samples share a timestamp. Rounded 6."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(id_col).asc())
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(ts).over(w)
    dt = F.col(ts) - prev_t
    delta = F.col(value) - prev_v
    return (
        df.select(
            key,
            ts,
            id_col,
            # + 0.0 canonicalizes IEEE negative zero after rounding
            (F.round(delta, 6) + F.lit(0.0)).alias("delta"),
            (F.round(F.when(dt > 0, delta / (dt / F.lit(1000.0))), 6) + F.lit(0.0)).alias(
                "rate_per_s"
            ),
            prev_t.alias("__pt"),
        )
        .filter(F.col("__pt").isNotNull())
        .drop("__pt")
    )


def rolling_zscore(
    df: DataFrame,
    n: int = 5,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Rolling anomaly score per key: mean/stddev over the trailing n+1
    samples (rows frame), z = (x - mu) / sigma — NULL until the frame has
    variance. The anomaly-band primitive behind alerting UIs. mu/sigma/z
    rounded 4 (stddev differs between engines only in final ulps)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(id_col).asc())
        .rowsBetween(-n, 0)
    )
    mu = F.avg(value).over(w)
    sigma = F.stddev_samp(value).over(w)
    return df.select(
        key,
        ts,
        id_col,
        F.round(mu, 4).alias("mu"),
        F.round(sigma, 4).alias("sigma"),
        (
            F.round(F.when(sigma > 0, (F.col(value) - mu) / sigma), 4) + F.lit(0.0)
        ).alias("z"),
    )


def locf_fill(
    df: DataFrame,
    interval_ms: int,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-filled per-key bucket series, last observation carried forward:
    one row per (key, bucket) over each key's [first, last] bucket range;
    empty buckets inherit the most recent earlier value and are flagged
    is_gap. The bucket representative is the LAST sample in the bucket
    (ties by id). Output (key, bucket_start, value_filled rounded 6,
    is_gap)."""
    k = F.floor(F.col(ts) / F.lit(interval_ms)).cast("long")
    last_s = F.max(
        F.struct(F.col(ts).alias("t"), F.col(id_col).alias("i"), F.col(value).alias("v"))
    )
    per = df.groupBy(F.col(key), k.alias("k")).agg(last_s.alias("last"))
    axis = (
        per.groupBy(key)
        .agg(F.min("k").alias("k0"), F.max("k").alias("k1"))
        .select(key, F.explode(F.sequence("k0", "k1")).alias("k"))
    )
    joined = axis.join(per, [key, "k"], "left")
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("k").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        (F.col("k") * interval_ms).alias("bucket_start"),
        F.round(
            F.last(F.col("last.v"), ignorenulls=True).over(wf), 6
        ).alias("value_filled"),
        F.col("last").isNull().alias("is_gap"),
    )


def ema_last(
    df: DataFrame,
    alpha: float,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key exponentially-weighted moving average, final smoothed value:
    y_0 = x_0; y_t = alpha*x_t + (1-alpha)*y_{t-1} over the key's samples in
    (ts, id) order. The recurrence is inherently sequential per key, so this
    is the canonical applyInPandas case (SURVEY.md §7: Pandas-UDF-backed
    operator where DataFrame ops can't express the semantics) — Arrow-batch
    transfer, one hash exchange on the key, each group reduced to one row.

    Output: (key, n, ema rounded 6, last_ts). The fold uses exactly the
    textbook fma order so any engine replaying the same order reproduces
    it to well past 6 decimals.
    """
    import pandas as pd

    # the key's ACTUAL type rides into the output schema — a hardcoded
    # `long` (plus int() coercion) crashed string/any non-integer keys
    key_t = df.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_t}, n long, ema double, last_ts long"

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([ts, id_col])
        acc = None
        for x in pdf[value].to_numpy():
            acc = float(x) if acc is None else alpha * float(x) + (1.0 - alpha) * acc
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n": [len(pdf)],
                "ema": [round(acc, 6)],
                "last_ts": [int(pdf[ts].iloc[-1])],
            }
        )

    return df.select(key, ts, id_col, value).groupBy(key).applyInPandas(fn, out_schema)


def decimate_minmax(
    df: DataFrame,
    interval_ms: int,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Dashboard decimation: per (key, bucket) keep only the extreme
    points — (min_value, its ts) and (max_value, its ts) — the lossy
    rendering-safe reduction (a line through min/max points bounds the
    true series). Ties break on (ts, id) so the result is deterministic.
    One map-side-combinable aggregate; output rows = keys × buckets."""
    k = F.floor(F.col(ts) / F.lit(interval_ms)).cast("long")
    s = F.struct(F.col(value).alias("v"), F.col(ts).alias("t"), F.col(id_col).alias("i"))
    agg = df.groupBy(F.col(key), k.alias("k")).agg(
        F.min(s).alias("mn"), F.max(s).alias("mx")
    )
    return agg.select(
        key,
        (F.col("k") * interval_ms).alias("bucket_start"),
        F.col("mn.v").alias("min_value"),
        F.col("mn.t").alias("min_ts"),
        F.col("mx.v").alias("max_value"),
        F.col("mx.t").alias("max_ts"),
    )


def cusum_summary(
    df: DataFrame,
    threshold_sigmas: float = 3.0,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key CUSUM change-point summary (Page '54): the one-sided
    upward statistic S_t = max(0, S_{t-1} + (x_t - mean_key)), alarm
    when S_t exceeds threshold_sigmas·stddev_key — the standard drift
    detector for metric streams.

    NOT a sequential fold: the recurrence has the prefix-sum closed form
    S_t = P_t - min(0, min_{j<=t} P_j) with P_t the running sum of
    deviations, so the whole statistic is window expressions over ONE
    key exchange (running sum + running min + per-key mean/stddev all
    share the same partition sort) — pure JVM, no applyInPandas, and
    order-deterministic because every aggregate folds in (ts, id) order.

    Output: (key, n, final_s, max_s, n_alarms) rounded 6.
    """
    # per-key mean/stddev as a separate aggregate joined back (nesting a
    # window inside another window's argument is ill-defined); both the
    # running sum and running min then ride ONE (key)-partitioned sort
    stats = df.groupBy(key).agg(
        F.avg(value).alias("__mu"),
        (F.lit(threshold_sigmas) * F.stddev_samp(value)).alias("__h"),
    )
    df = df.join(stats, key)
    seq = (
        Window.partitionBy(key)
        .orderBy(ts, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(F.col(value) - F.col("__mu")).over(seq)
    s = p - F.least(F.lit(0.0), F.min(p).over(seq))
    h = F.col("__h")
    # final S needs no last-row lookup: P_n = Σ(x - mean) ≡ 0, so
    # S_n = P_n - min(0, min_j P_j) = max(0, -min P) — an order-free
    # aggregate (no composite order key to overflow, nothing for the
    # oracle's arg_max to disagree on). NULL-safe alarm count: a
    # single-event key has stddev NULL → the comparison is NULL → the
    # CASE yields 0, matching the oracle's CASE WHEN semantics.
    scored = df.select(
        F.col(key),
        p.alias("__p"),
        s.alias("__s"),
        F.when(s > h, 1).otherwise(0).alias("__alarm"),
    )
    return scored.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.greatest(F.lit(0.0), -F.min("__p")), 6
        ).alias("final_s"),
        F.round(F.max("__s"), 6).alias("max_s"),
        F.sum("__alarm").alias("n_alarms"),
    )


def autocorr(
    df: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3),
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key autocorrelation function at the given ROW lags:
    r_k = Σ (x_t − x̄)(x_{t−k} − x̄) / Σ (x_t − x̄)² over the key's
    series in (ts, id) order — the seasonality/persistence probe that
    decides resampling grain and drift-test windowing for a metric
    before heavier modeling. Returns (key, lag, acf) rows.

    Plan: the per-key mean (unordered window), every lag column (one
    ordered window), and the final covariance sums all share ONE hash
    exchange on the key — adding a lag adds a projection, not a
    shuffle. NULL values are excluded up front; a lag that reaches
    before the series start contributes nothing (sum skips the NULL
    product), matching the standard ACF denominator convention. A
    constant or single-sample key has zero deviation sum — its acf is
    NULL (undefined), not an ANSI divide-by-zero that kills the query
    (Spark 4 defaults spark.sql.ansi.enabled=true; DuckDB's x/0 is
    NULL, so the oracle agrees without a rewrite).
    """
    w_full = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, id_col)
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).alias("__v"))
        .withColumn("__dev", F.col("__v") - F.avg("__v").over(w_full))
    )
    for k in lags:
        d = d.withColumn(f"__l{k}", F.lag("__dev", k).over(w_ord))
    agg = d.groupBy(key).agg(
        F.sum(F.col("__dev") * F.col("__dev")).alias("__den"),
        *[
            F.sum(F.col("__dev") * F.col(f"__l{k}")).alias(f"__n{k}")
            for k in lags
        ],
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.when(
                        F.col("__den") != 0,
                        F.round(F.col(f"__n{k}") / F.col("__den"), 6),
                    ).alias("acf"),
                )
                for k in lags
            ]
        )
    ).alias("__p")
    return agg.select(key, pairs).select(
        key, F.col("__p.lag").alias("lag"), F.col("__p.acf").alias("acf")
    )


def acf_pacf(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key ACF and PARTIAL autocorrelation at lags 1-3 — the
    AR-order identification pair (ACF tails off / PACF cuts off at the
    AR order): PACF(k) removes the shorter-lag correlation that makes
    raw ACF ambiguous between AR(1) persistence and true lag-k
    structure.

    At a fixed max lag of 3 the Durbin-Levinson recursion unrolls to
    CLOSED FORMS over (r₁, r₂, r₃):
      pacf₁ = r₁
      pacf₂ = (r₂ − r₁²) / (1 − r₁²)
      φ₂₁  = r₁ − pacf₂·r₁
      pacf₃ = (r₃ − φ₂₁r₂ − pacf₂r₁) / (1 − φ₂₁r₁ − pacf₂r₂)
    — written with the SAME operation order in the DuckDB oracle, so
    the doubles agree bit-for-bit without any driver-side math. Any
    zero denominator (constant series, |r₁| = 1) yields NULL via
    try_divide, matching SQL's x/NULLIF(0).

    Plan: identical to autocorr — per-key mean, the three lag columns,
    and the covariance sums share ONE hash exchange; the closed forms
    are projections on the k-row aggregate frame.

    Output: (key, lag int, acf r6, pacf r6), lags 1-3 per key.
    """
    w_full = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, id_col)
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).alias("__v"))
        .withColumn("__dev", F.col("__v") - F.avg("__v").over(w_full))
    )
    for k in (1, 2, 3):
        d = d.withColumn(f"__l{k}", F.lag("__dev", k).over(w_ord))
    agg = d.groupBy(key).agg(
        F.sum(F.col("__dev") * F.col("__dev")).alias("__den"),
        *[
            F.sum(F.col("__dev") * F.col(f"__l{k}")).alias(f"__n{k}")
            for k in (1, 2, 3)
        ],
    )
    r1 = F.try_divide(F.col("__n1"), F.col("__den"))
    r2 = F.try_divide(F.col("__n2"), F.col("__den"))
    r3 = F.try_divide(F.col("__n3"), F.col("__den"))
    p2 = F.try_divide(r2 - r1 * r1, F.lit(1.0) - r1 * r1)
    f21 = r1 - p2 * r1
    p3 = F.try_divide(
        r3 - f21 * r2 - p2 * r1, F.lit(1.0) - f21 * r1 - p2 * r2
    )
    pairs = F.explode(
        F.array(
            F.struct(F.lit(1).alias("lag"), F.round(r1, 6).alias("acf"),
                     F.round(r1, 6).alias("pacf")),
            F.struct(F.lit(2).alias("lag"), F.round(r2, 6).alias("acf"),
                     F.round(p2, 6).alias("pacf")),
            F.struct(F.lit(3).alias("lag"), F.round(r3, 6).alias("acf"),
                     F.round(p3, 6).alias("pacf")),
        )
    ).alias("__p")
    return agg.select(key, pairs).select(
        key, F.col("__p.lag").alias("lag"),
        F.col("__p.acf").alias("acf"), F.col("__p.pacf").alias("pacf"),
    )


def seasonal_adjust(
    df: DataFrame,
    period_ms: int = 604800000,
    bucket_ms: int = 86400000,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key additive seasonal decomposition on a fixed calendar
    period: phase = (floor(ts / bucket) · bucket) mod period (e.g. the
    day-of-week slot for daily buckets in a weekly period), seasonal
    component = per-(key, phase) mean, adjusted = value − seasonal +
    per-key grand mean — the classic "remove the weekly shape before
    alerting" step upstream of cusum_summary / rolling_zscore, which
    otherwise fire on every Monday peak.

    Plan: both means are unordered windows over the SAME hash exchange
    on the key (phase is a derived column, not a second shuffle), so the
    corpus moves once and every row gets its (seasonal, adjusted) pair
    without a join. NULL values pass through with NULL outputs (they
    contribute to neither mean). Output: (id_col, key, ts, phase,
    seasonal round 4, adjusted round 4).
    """
    phase = (
        (F.floor(F.col(ts) / F.lit(bucket_ms)) * F.lit(bucket_ms))
        % F.lit(period_ms)
    ).cast("long")
    w_key = Window.partitionBy(key)
    w_phase = Window.partitionBy(key, "phase")
    return (
        df.filter(F.col(key).isNotNull())
        .select(id_col, key, ts, F.col(value).alias("__v"))
        .withColumn("phase", phase)
        # key-window FIRST: its exchange on `key` also satisfies the
        # (key, phase) clustering, so the second window adds only a
        # sort — windows in the other order would exchange twice
        .withColumn("__grand", F.avg("__v").over(w_key))
        .withColumn("__seasonal", F.avg("__v").over(w_phase))
        .select(
            id_col,
            key,
            ts,
            "phase",
            F.round("__seasonal", 4).alias("seasonal"),
            F.round(
                F.col("__v") - F.col("__seasonal") + F.col("__grand"), 4
            ).alias("adjusted"),
        )
    )


def seasonal_anomalies(
    df: DataFrame,
    period_ms: int = 604800000,
    bucket_ms: int = 86400000,
    z: float = 3.0,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """The alerting step seasonal_adjust exists for: flag rows whose
    residual (value − per-(key, phase) seasonal mean) sits more than `z`
    sample standard deviations from its key's residual distribution.
    De-seasonalizing first is what stops the Monday peak from paging —
    a plain rolling_zscore on seasonal data alarms every period.

    The per-key residual mean is exactly 0 by construction (the mean of
    the per-phase means, weighted by phase counts, IS the grand mean),
    so z_score = residual / stddev_samp(residual). All three window
    aggregates — phase mean, residual stddev — share the ONE hash
    exchange on the key (subset-clustering reuse, as seasonal_adjust).
    NULL values never flag (NULL comparisons are false). Thresholding
    compares the ROUNDED z on both engines so the SQL oracle keeps the
    identical boundary; a true z within 5e-5 of the threshold is the
    measure-zero caveat shared by every thresholded float entry.

    Output: (id_col, key, ts, phase, value, z_score rounded 4), anomalous
    rows only.
    """
    phase = (
        (F.floor(F.col(ts) / F.lit(bucket_ms)) * F.lit(bucket_ms))
        % F.lit(period_ms)
    ).cast("long")
    w_key = Window.partitionBy(key)
    w_phase = Window.partitionBy(key, "phase")
    base = (
        df.filter(F.col(key).isNotNull())
        .select(id_col, key, ts, F.col(value).alias("__v"))
        .withColumn("phase", phase)
        # __anchor pins a key-partitioned window BELOW the (key, phase)
        # one. Dependency order alone would plan phase-window first →
        # Exchange(key, phase), and the later key-window (sigma depends
        # on __resid) would then need a SECOND corpus exchange — with the
        # anchor the single Exchange(key) satisfies all three windows
        # (subset clustering). Measured: 1 exchange vs 2. It is an exact
        # 0.0 folded into z below — an output dependency, because an
        # UNUSED column is pruned and the 2-exchange plan comes back
        # (regression-guarded in tests/test_operators.py). coalesce keeps
        # an all-NULL key's anchor at 0.0 instead of poisoning its z.
        .withColumn(
            "__anchor",
            F.coalesce(F.avg("__v").over(w_key) * 0, F.lit(0.0)),
        )
        .withColumn("__resid", F.col("__v") - F.avg("__v").over(w_phase))
        .withColumn(
            "__z", F.round(
                F.try_divide(
                    F.col("__resid"), F.stddev_samp("__resid").over(w_key)
                ), 4
            ) + F.col("__anchor")
        )
    )
    return (
        base.filter(F.abs(F.col("__z")) > F.lit(z))
        .select(
            id_col,
            key,
            ts,
            "phase",
            F.col("__v").alias(value),
            F.col("__z").alias("z_score"),
        )
    )


def changepoint_single(
    df: DataFrame,
    scale: int = 100,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key best single mean-shift changepoint: the split position t
    (in (ts, id) order) maximizing the between-segment sum of squares
    R(t) = n₁(m₁−m)² + n₂(m₂−m)² — the first step of binary-segmentation
    changepoint detection (Scott & Knott '74 shape), and the "when did
    this metric's level shift" question CUSUM alarms but doesn't locate.

    EXACT arithmetic end to end: values scale to integers (×`scale`,
    e.g. cents), running/total sums stay integral, and R(t) collapses
    algebraically to A(t)²/(n·n₁·n₂) with A = s₁·n − s·n₁ — s₁+s₂=s
    makes the right-segment term the same A, so ONE integer per split
    decides the argmax. A is computed in decimal(38,0) (the bigint
    product dies near 1e9-row keys) and the final score division is the
    identical double expression on both engines — bit-deterministic, no
    FP-accumulation drift, ties broken by the earliest split. Same
    window discipline as cusum_summary: running sum, row_number, and
    the per-key totals all share ONE hash exchange on the key.

    Output: (key, n, split_rn, split_ts, score r6, mean_left r6,
    mean_right r6) — the split is AFTER row split_rn; keys with n < 2
    drop (no valid split).
    """
    v = F.round(F.col(value) * scale).cast("long")
    base = df.filter(F.col(value).isNotNull() & F.col(key).isNotNull()).select(
        key, ts, id_col, v.alias("__v")
    )
    w_key = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, id_col)
    run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        base
        # unordered window FIRST so the single Exchange(key) also serves
        # the ordered windows (seasonal_adjust's subset-clustering rule)
        .withColumn("__n", F.count(F.lit(1)).over(w_key))
        .withColumn("__s", F.sum("__v").over(w_key))
        .withColumn("__rn", F.row_number().over(w_ord))
        .withColumn("__s1", F.sum("__v").over(run))
    )
    dec = "decimal(38,0)"
    a = (
        F.col("__s1").cast(dec) * F.col("__n").cast(dec)
        - F.col("__s").cast(dec) * F.col("__rn").cast(dec)
    )
    n1 = F.col("__rn").cast("double")
    n2 = (F.col("__n") - F.col("__rn")).cast("double")
    scaled2 = float(scale) * scale
    score = (
        a.cast("double") * a.cast("double")
        / (F.col("__n").cast("double") * n1 * n2)
        / F.lit(scaled2)
    )
    cand = d.filter(F.col("__rn") < F.col("__n")).select(
        F.col(key),
        F.col("__n").alias("n"),
        F.col("__rn").alias("rn"),
        F.col(ts).alias("__ts"),
        score.alias("__score"),
        (F.col("__s1").cast("double") / (n1 * scale)).alias("__m1"),
        (
            (F.col("__s") - F.col("__s1")).cast("double") / (n2 * scale)
        ).alias("__m2"),
    )
    best = cand.groupBy(key, "n").agg(
        F.max_by(
            F.struct("rn", "__ts", "__score", "__m1", "__m2"),
            # unique ordering: score desc, then EARLIEST split wins ties
            F.struct(F.col("__score"), (-F.col("rn")).alias("__neg")),
        ).alias("__b")
    )
    return best.select(
        key,
        "n",
        F.col("__b.rn").alias("split_rn"),
        F.col("__b.__ts").alias("split_ts"),
        F.round(F.col("__b.__score"), 6).alias("score"),
        F.round(F.col("__b.__m1"), 6).alias("mean_left"),
        F.round(F.col("__b.__m2"), 6).alias("mean_right"),
    )


def rolling_quantiles(
    df: DataFrame,
    n: int = 5,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key trailing exact rolling median and p90 over the last n+1
    samples (rows frame) — the robust anomaly band next to
    rolling_zscore's mean/σ (one wild sample drags a rolling mean for n
    rows; the rolling median shrugs it off, which is why latency
    dashboards band on p50/p90).

    Both quantiles come from ONE array-percentile window aggregate (one
    value buffer per frame, not one per quantile — the group_percentiles
    lesson applied to frames), riding the same single key exchange as
    every per-key operator here. Exact linear interpolation (Spark
    `percentile` ≡ DuckDB `quantile_cont`); order statistics over ≤ n+1
    values are engine-exact, rounded 6 for the interpolation halves.
    Output: (key, ts, id, value, roll_p50 r6, roll_p90 r6).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(id_col).asc())
        .rowsBetween(-n, 0)
    )
    qs = F.expr(f"percentile({value}, array(0.5, 0.9))").over(w)
    return df.select(
        key,
        ts,
        id_col,
        value,
        F.round(qs[0], 6).alias("roll_p50"),
        F.round(qs[1], 6).alias("roll_p90"),
    )


def periodogram(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    periods_ms: tuple[int, ...] = (
        3_600_000, 21_600_000, 86_400_000, 604_800_000
    ),
) -> DataFrame:
    """Normalized DFT periodogram per key at a fixed set of candidate
    periods — "does this metric have an hourly / daily / weekly cycle,
    and how strong?" The power at period p is the squared projection of
    the (mean-centered) series onto cos/sin at frequency 1/p, divided by
    the total sum of squares: power_frac in ~[0, 1], the fraction of
    variance that cycle explains. The seasonal operators (seasonal_adjust,
    seasonal_anomalies) REQUIRE the period as input; this is the operator
    that finds it.

    Single-shuffle plan: rows fan out |periods|x against a broadcast
    (period, angular-frequency) frame, then ONE map-side-combinable
    groupBy(key, period) accumulates the six sufficient sums
    (sum x-cos, sum cos, sum x-sin, sum sin, sum x, sum x**2, n); the
    centering folds in algebraically (C = sum x-cos - mean * sum cos), so
    no second pass and no join-back. Irregular sampling is handled the
    Lomb way-station: real timestamps enter the trig args, not row
    indexes. At 100 TB: partial aggregation collapses each partition to
    keys x periods rows before the exchange.

    Output: (key, period_ms, power_frac rounded 6, n) per key x period.
    """
    import math

    spark = df.sparkSession
    freqs = spark.createDataFrame(
        [(int(p), 2.0 * math.pi / p) for p in periods_ms],
        "period_ms long, w double",
    )
    pts = df.filter(
        F.col(value).isNotNull()
        & F.col(ts).isNotNull()
        & F.col(key).isNotNull()
    ).select(
        F.col(key),
        # `ts` is epoch-ms (the metric-frame convention, sources/
        # testdata.ts_ms) — exact in double up to 2^53 ms (~285,000 yr)
        F.col(ts).cast("double").alias("t"),
        F.col(value).alias("x"),
    )
    ang = F.col("w") * F.col("t")
    g = (
        pts.crossJoin(F.broadcast(freqs))
        .groupBy(key, "period_ms")
        .agg(
            F.sum(F.col("x") * F.cos(ang)).alias("sxc"),
            F.sum(F.cos(ang)).alias("sc"),
            F.sum(F.col("x") * F.sin(ang)).alias("sxs"),
            F.sum(F.sin(ang)).alias("ss"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    xbar = F.col("sx") / F.col("n")
    c = F.col("sxc") - xbar * F.col("sc")
    s = F.col("sxs") - xbar * F.col("ss")
    sst = F.col("sxx") - F.col("sx") * xbar
    return g.select(
        key,
        "period_ms",
        # R-squared of the two-column {cos, sin} fit: the factor 2 makes a
        # pure full-cycle sinusoid score 1.0 (each quadrature carries half
        # the projection mass)
        F.when(
            sst > 0,
            F.round(F.lit(2.0) * (c * c + s * s) / (F.col("n") * sst), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("power_frac"),
        "n",
    )


def cross_correlation(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 60_000,
    max_lag: int = 5,
) -> DataFrame:
    """Lagged cross-correlation (CCF) between two keys' series: Pearson
    correlation of key_a's bucket-average series against key_b's shifted
    by each lag in [-max_lag, +max_lag] buckets — "does checkout follow
    page_view, and by how many minutes?" A positive peak at lag k means
    key_b LEADS by k buckets. autocorr is the self-pair special case.

    Plan: ONE map-side-combinable bucket aggregate per key (shuffle on
    (key, bucket), carrying buckets not points), the b-side fans out
    2·max_lag+1 ways against a broadcast lag frame with the bucket index
    shifted, an equi-join on bucket aligns the series (co-partitioned:
    both sides arrive hashed on the bucket), and one tiny groupBy(lag)
    forms the correlation from raw sufficient sums. Buckets without both
    series drop (pairwise-complete). A constant series in the overlap
    yields ccf = 0.0, never NULL/NaN; a lag whose shift leaves NO
    overlapping buckets emits no row at all (there is no n to correlate
    over) — consumers iterating the full lag range must treat a missing
    lag as no-overlap, not zero correlation.

    Output: (lag, n_buckets, ccf rounded 6), one row per lag with
    overlap.
    """
    spark = df.sparkSession
    lags = spark.createDataFrame(
        [(int(l),) for l in range(-max_lag, max_lag + 1)], "lag long"
    )
    base = df.filter(
        F.col(value).isNotNull() & F.col(ts).isNotNull()
    )
    bucket = (F.col(ts).cast("long") - F.pmod(F.col(ts).cast("long"), F.lit(bucket_ms))) / F.lit(bucket_ms)

    def series(k: str) -> DataFrame:
        return (
            base.filter(F.col(key) == k)
            .groupBy(bucket.cast("long").alias("b"))
            .agg((F.sum(value) / F.count(F.lit(1))).alias("v"))
        )
    sa = series(key_a)
    sb = (
        series(key_b)
        .crossJoin(F.broadcast(lags))
        .select("lag", (F.col("b") + F.col("lag")).alias("b"), F.col("v").alias("vb"))
    )
    j = sa.join(sb, "b").select("lag", F.col("v").alias("va"), "vb")
    g = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("va").alias("suma"),
        F.sum("vb").alias("sumb"),
        F.sum(F.col("va") * F.col("vb")).alias("sab"),
        F.sum(F.col("va") * F.col("va")).alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).alias("sbb"),
    )
    n = F.col("n_buckets")
    cov = F.col("sab") - F.col("suma") * (F.col("sumb") / n)
    vara = F.col("saa") - F.col("suma") * (F.col("suma") / n)
    varb = F.col("sbb") - F.col("sumb") * (F.col("sumb") / n)
    return g.select(
        "lag",
        "n_buckets",
        F.when(
            (vara > 0) & (varb > 0),
            F.round(cov / F.sqrt(vara * varb), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("ccf"),
    ).orderBy("lag")


def ljung_box(
    df: DataFrame,
    h: int = 5,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key Ljung-Box portmanteau statistic at lags 1..h:
    Q = n(n+2) · Σ_k ρ_k² / (n−k) (Ljung & Box 1978) — the ONE-NUMBER
    "is this series white noise?" screen on top of autocorr's per-lag
    view: large Q means SOME autocorrelation up to lag h is present,
    which is the gate before trusting i.i.d.-assuming tests (ks/cvm/
    psi treat rows as exchangeable; a strongly autocorrelated metric
    violates that silently).

    Exactly autocorr's single-hash-exchange plan (per-key mean, h lag
    columns and the covariance sums all share one shuffle on `key`) —
    plus a row count per key; the Q arithmetic runs on the k-row
    aggregate frame. ρ_k uses the standard full-sample denominator
    (lag products before the series start drop out of the numerator).
    A constant series has zero deviation sum → NULL Q (undefined),
    NULL-safe on both engines via /0 → NULL semantics.

    Output: (key, n bigint, q_stat r6), one row per key.
    """
    w_full = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, id_col)
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).alias("__v"))
        .withColumn("__dev", F.col("__v") - F.avg("__v").over(w_full))
    )
    lags = range(1, h + 1)
    for k in lags:
        d = d.withColumn(f"__l{k}", F.lag("__dev", k).over(w_ord))
    agg = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__dev") * F.col("__dev")).alias("__den"),
        *[
            F.sum(F.col("__dev") * F.col(f"__l{k}")).alias(f"__n{k}")
            for k in lags
        ],
    )
    rho2_terms = None
    for k in lags:
        # try_divide: a constant series has __den = 0 → NULL Q, and a
        # series shorter than k has n − k ≤ 0 handled by the numerator
        # already being NULL (no lag pairs exist)
        rk = F.try_divide(F.col(f"__n{k}"), F.col("__den"))
        term = F.try_divide(rk * rk, (F.col("n") - F.lit(k)))
        rho2_terms = term if rho2_terms is None else rho2_terms + term
    return agg.select(
        key,
        "n",
        F.round(
            F.col("n") * (F.col("n") + 2) * rho2_terms, 6
        ).alias("q_stat"),
    )


def kpss_stat(
    df: DataFrame,
    q: int = 4,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key KPSS level-stationarity statistic (Kwiatkowski,
    Phillips, Schmidt & Shin 1992): η = n⁻² Σ_t S_t² / σ̂²_lr, where
    S_t is the running sum of the demeaned series and σ̂²_lr is the
    Bartlett-window long-run variance estimate
    (γ₀ + 2 Σ_{j≤q} (1 − j/(q+1)) γ_j)/n. Large η rejects "stationary
    around a level" — the complement of ljung_box's white-noise view:
    LB asks "is there structure?", KPSS asks "does the level wander?"
    (a drifting metric violates every fixed-baseline alert threshold
    downstream).

    Plan: the per-key mean, the running sum, and the q lag columns all
    ride ONE hash exchange on the key (the cusum/autocorr window
    discipline); the closing statistic is arithmetic on a k-row
    aggregate. A constant series has σ̂²_lr = 0 → NULL (undefined) via
    try_divide.

    Output: (key, n bigint, kpss_stat r6).
    """
    w_full = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, id_col)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).cast("double").alias("__v"))
        .withColumn("__e", F.col("__v") - F.avg("__v").over(w_full))
        .withColumn("__s", F.sum("__e").over(w_run))
    )
    for j in range(1, q + 1):
        d = d.withColumn(f"__l{j}", F.lag("__e", j).over(w_ord))
    agg = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__s") * F.col("__s")).alias("ss"),
        F.sum(F.col("__e") * F.col("__e")).alias("g0"),
        *[
            F.sum(F.col("__e") * F.col(f"__l{j}")).alias(f"g{j}")
            for j in range(1, q + 1)
        ],
    )
    gamma_tail = None
    for j in range(1, q + 1):
        t = F.lit(1.0 - j / (q + 1.0)) * F.col(f"g{j}")
        gamma_tail = t if gamma_tail is None else gamma_tail + t
    nd = F.col("n").cast("double")
    lrv = (F.col("g0") + 2.0 * gamma_tail) / nd
    return agg.select(
        key,
        "n",
        F.round(F.try_divide(F.col("ss") / (nd * nd), lrv), 6).alias(
            "kpss_stat"
        ),
    )


def seasonal_strength(
    df: DataFrame,
    period_ms: int = 604800000,
    bucket_ms: int = 86400000,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
) -> DataFrame:
    """Per-key seasonal STRENGTH on seasonal_adjust's phase grid: the
    fraction of variance the phase-mean model explains,
    strength = 1 − SS_within / SS_total (the ANOVA η² of the phase
    grouping) — the go/no-go number for seasonal_adjust itself
    (strength ≈ 0: there is no weekly shape, de-seasonalizing just
    adds noise; ≈ 1: alerts MUST run on the adjusted series).

    ONE map-side-combinable (key, phase) moment aggregate; the per-key
    rollup and the closing ratio run on keys×phases rows. A constant
    series (SS_total = 0) → NULL via try_divide.

    Output: (key, n bigint, n_phases bigint, strength r6).
    """
    phase = (
        (F.floor(F.col(ts) / F.lit(bucket_ms)) * F.lit(bucket_ms))
        % F.lit(period_ms)
    ).cast("long")
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(
            key, F.col(value).cast("double").alias("__v"), phase.alias("__p")
        )
    )
    g = d.groupBy(key, "__p").agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum("__v").alias("sp"),
        F.sum(F.col("__v") * F.col("__v")).alias("ssp"),
    )
    per = g.groupBy(key).agg(
        F.sum("np").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_phases"),
        F.sum(F.col("ssp") - F.col("sp") * F.col("sp") / F.col("np")).alias(
            "__ssw"
        ),
        (
            F.sum("ssp")
            - F.sum("sp") * F.sum("sp") / F.sum("np")
        ).alias("__sst"),
    )
    return per.select(
        key,
        "n",
        "n_phases",
        F.round(
            F.lit(1.0) - F.try_divide(F.col("__ssw"), F.col("__sst")), 6
        ).alias("strength"),
    )


def holt_last(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend),
    final state: l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}),
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, seeded l₀ = x₀, b₀ = 0 —
    what ema_last can't give a drifting series: EMA lags a trend
    forever, Holt tracks it and yields the one-step forecast l + b
    (Holt 1957 / the ETS(A,A,N) recursion).

    The coupled recurrence is inherently sequential per key — the
    applyInPandas contract exactly like ema_last (Arrow batches, one
    hash exchange, one output row per key). The textbook operation
    order is pinned so the DuckDB oracle's struct-accumulator
    list_reduce replays bit-identical arithmetic.

    Output: (key, n, level r6, trend r6, forecast_1 r6, last_ts).
    """
    import pandas as pd  # noqa: F401

    key_t = df.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, n long, level double, trend double, "
        "forecast_1 double, last_ts long"
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        pdf = pdf.sort_values([ts, id_col])
        xs = pdf[value].to_numpy()
        level, trend = float(xs[0]), 0.0
        for x in xs[1:]:
            l_new = alpha * float(x) + (1.0 - alpha) * (level + trend)
            trend = beta * (l_new - level) + (1.0 - beta) * trend
            level = l_new
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n": [len(pdf)],
                "level": [round(level, 6)],
                "trend": [round(trend, 6)],
                "forecast_1": [round(level + trend, 6)],
                "last_ts": [int(pdf[ts].iloc[-1])],
            }
        )

    sel = df.select(key, ts, id_col, value).filter(
        F.col(value).isNotNull() & F.col(key).isNotNull()
    )
    # Explicit hash repartition on the key: the per-key recursion is
    # interpreted Python, so the stage's wall time is the rows of its
    # FATTEST task — AQE's advisory-size coalescing sees only a few MB
    # and squeezes the exchange to ~4 partitions, serializing the Python
    # work. An explicit repartition is not coalesced; same key hashing,
    # same per-key groups, so results are unchanged.
    par = sel.sparkSession.sparkContext.defaultParallelism
    return sel.repartition(par, key).groupBy(key).applyInPandas(fn, out_schema)


def max_drawdown(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key maximum drawdown: the largest peak-to-trough drop of the
    (ts, id)-ordered series, max_t (running_max_t − x_t) — the
    worst-case-regression number for any cumulative metric (model
    eval score across checkpoints, cache hit rate, account balance)
    where variance alone hides one catastrophic dip.

    Two window expressions on ONE key exchange (running max shares
    the sort with the outer max via the plain aggregate); reported
    with the peak value for context. Never negative — a monotone
    series scores exactly 0.

    Output: (key, n bigint, peak r6, max_drawdown r6).
    """
    w = Window.partitionBy(key).orderBy(ts, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).cast("double").alias("__v"))
        .withColumn("__rm", F.max("__v").over(w))
    )
    return d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.max("__v"), 6).alias("peak"),
        F.round(F.max(F.col("__rm") - F.col("__v")), 6).alias(
            "max_drawdown"
        ),
    )


def variance_ratio(
    df: DataFrame,
    q: int = 4,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key Lo-MacKinlay variance ratio VR(q) =
    Var(x_t − x_{t−q}) / (q · Var(x_t − x_{t−1})) (population
    variances, no small-sample correction — documented): the
    random-walk diagnostic. VR ≈ 1: increments are uncorrelated
    (differencing is safe); VR > 1: positive drift/momentum
    (aggregation amplifies variance); VR < 1: mean reversion (the
    metric snaps back — alerts on single-step jumps overfire).

    Both lag columns ride ONE hash exchange on the key (the
    autocorr/kpss window discipline); variances come from sum/sumsq
    over the defined lags only. Constant series → NULL via
    try_divide.

    Output: (key, n bigint, vr r6).
    """
    w = Window.partitionBy(key).orderBy(ts, id_col)
    d = (
        df.filter(F.col(value).isNotNull() & F.col(key).isNotNull())
        .select(key, ts, id_col, F.col(value).cast("double").alias("__v"))
        .withColumn("__d1", F.col("__v") - F.lag("__v", 1).over(w))
        .withColumn("__dq", F.col("__v") - F.lag("__v", q).over(w))
    )
    agg = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("__d1").alias("n1"),
        F.sum("__d1").alias("a1"),
        F.sum(F.col("__d1") * F.col("__d1")).alias("b1"),
        F.count("__dq").alias("nq"),
        F.sum("__dq").alias("aq"),
        F.sum(F.col("__dq") * F.col("__dq")).alias("bq"),
    )
    v1 = (F.col("b1") - F.col("a1") * F.col("a1") / F.col("n1")) / F.col("n1")
    vq = (F.col("bq") - F.col("aq") * F.col("aq") / F.col("nq")) / F.col("nq")
    return agg.select(
        key,
        "n",
        F.round(F.try_divide(vq, F.lit(float(q)) * v1), 6).alias("vr"),
    )


def burstiness(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "timestamp",
) -> DataFrame:
    """Per-key burstiness of inter-arrival gaps:
    B = (σ − μ)/(σ + μ) (Goh & Barabási 2008) — one number per key on
    the Poisson↔bursty axis: B ≈ −1 metronome-regular, B ≈ 0
    Poisson-like, B → 1 heavy-tailed bursts. The per-key companion of
    the pooled events_poisson_check, cheap enough to run on every
    entity (bot heuristics love it: humans are bursty, cron jobs are
    not).

    One lag window per key (gap multiset tie-invariant) and a
    sum/sumsq aggregate — a single hash exchange. Keys with < 2 gaps
    or zero mean drop the score to NULL via try_divide.

    Output: (key, n_gaps bigint, mean_gap r6, b r6).
    """
    w = Window.partitionBy(key).orderBy("__t")
    d = (
        df.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .select(key, F.col(ts).alias("__t"))
        .withColumn("__g", (F.col("__t") - F.lag("__t").over(w)).cast("double"))
        .filter(F.col("__g").isNotNull())
    )
    agg = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("__g").alias("mu"),
        F.sum(F.col("__g") * F.col("__g")).alias("ss"),
        F.sum("__g").alias("s1"),
    )
    var = (F.col("ss") - F.col("s1") * F.col("s1") / F.col("n_gaps")) / (
        F.col("n_gaps") - 1
    )
    sig = F.sqrt(var)
    return agg.filter(F.col("n_gaps") >= 2).select(
        key,
        "n_gaps",
        F.round(F.col("mu"), 6).alias("mean_gap"),
        F.round(F.try_divide(sig - F.col("mu"), sig + F.col("mu")), 6).alias(
            "b"
        ),
    )


def hurst_rs(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 3_600_000,
    windows: tuple[int, ...] = (8, 16, 32),
) -> DataFrame:
    """Rescaled-range (R/S) Hurst exponent per key: bucket the series,
    chunk it into windows of w buckets, compute R/S per chunk
    (R = range of the cumulative mean-deviation walk, S = population σ),
    average log₂(R/S) per w, and fit the slope of log₂(R/S) on log₂(w)
    — H ≈ 0.5 random walk, > 0.5 trending/persistent, < 0.5 mean-
    reverting. The long-memory diagnostic behind "will this load spike
    persist?" that variance_ratio only answers at one lag.

    Plan: ONE bucket aggregate over the raw rows (map-side combinable),
    then the chunk machinery runs on the (key × buckets) frame fanned
    |windows|× — cumulative sums window-partitioned by (key, w, chunk),
    so no sort ever exceeds w rows per chunk. Incomplete chunks are
    dropped (R/S needs the full window). Degenerate chunks (σ = 0)
    are excluded from the log-mean, matching the classical estimator.

    Output: (key, n_windows int, hurst r6) — slope of the 2-column OLS
    on the |windows| mean points.
    """
    spark = df.sparkSession
    wins = spark.createDataFrame([(int(w),) for w in windows], "w int")
    b = (
        df.filter(
            F.col(key).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(value).isNotNull()
        )
        .groupBy(
            key, F.expr(f"({ts} div {bucket_ms})").cast("long").alias("bk")
        )
        .agg(F.sum(value).alias("x"))
    )
    idx = F.row_number().over(Window.partitionBy(key).orderBy("bk")) - 1
    seq = b.select(key, F.col("x"), idx.alias("i"))
    fan = seq.crossJoin(F.broadcast(wins)).withColumn(
        "chunk", (F.col("i") / F.col("w")).cast("long")
    )
    per_chunk_n = F.count(F.lit(1)).over(
        Window.partitionBy(key, "w", "chunk")
    )
    mean_c = F.avg("x").over(Window.partitionBy(key, "w", "chunk"))
    cum = F.sum(F.col("x") - mean_c).over(
        Window.partitionBy(key, "w", "chunk").orderBy("i")
    )
    walked = fan.select(
        key, "w", "chunk", "x",
        per_chunk_n.alias("cn"),
        cum.alias("c"),
    ).filter(F.col("cn") == F.col("w"))
    rs = (
        walked.groupBy(key, "w", "chunk")
        .agg(
            (F.max("c") - F.min("c")).alias("r"),
            F.stddev_pop("x").alias("s"),
        )
        .filter(F.col("s") > 0)
        .select(key, "w", (F.log2(F.col("r") / F.col("s"))).alias("lrs"))
    )
    pts = rs.groupBy(key, "w").agg(F.avg("lrs").alias("y")).select(
        key, F.log2("w").alias("lx"), "y"
    )
    g = pts.groupBy(key).agg(
        F.count(F.lit(1)).cast("int").alias("n_windows"),
        F.avg("lx").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("lx") * F.col("y")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum("lx").alias("sx"),
        F.sum("y").alias("sy"),
    )
    n = F.col("n_windows").cast("double")
    slope = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / n,
        F.col("sxx") - F.col("sx") * F.col("sx") / n,
    )
    return g.select(key, "n_windows", F.round(slope, 6).alias("hurst"))


def durbin_watson(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Durbin-Watson statistic on the residuals of a per-key linear
    trend: DW = Σ(eₜ − eₜ₋₁)² / Σeₜ² ∈ [0, 4] — ≈2 means the trend
    residuals are serially uncorrelated, < 2 positive autocorrelation
    (the "my linear fit is lying about its error bars" alarm for every
    stats_linreg consumer), > 2 negative.

    The daily series collapses first (ONE map-side-combinable bucket
    aggregate); the closed-form OLS (β from the five sufficient sums)
    joins back as a broadcast |keys|-row frame, and the lag runs on the
    (key × buckets) frame. Residuals are rounded 6 BEFORE the DW sums
    so both engines difference identical doubles.

    Output: (key, n bigint, slope r6, dw r6).
    """
    b = (
        df.filter(
            F.col(key).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(value).isNotNull()
        )
        .groupBy(
            key, F.expr(f"({ts} div {bucket_ms})").cast("double").alias("t")
        )
        .agg(F.avg(value).alias("y"))
    )
    fit = b.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
    )
    nd = F.col("n").cast("double")
    slope = F.try_divide(
        F.col("sty") - F.col("st") * F.col("sy") / nd,
        F.col("stt") - F.col("st") * F.col("st") / nd,
    )
    params = fit.select(
        key, "n",
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mt"), 6).alias("icept"),
    )
    j = b.join(F.broadcast(params), key)
    e = F.round(F.col("y") - (F.col("icept") + F.col("slope") * F.col("t")), 6)
    lag_e = F.lag(e).over(Window.partitionBy(key).orderBy("t"))
    rows = j.select(
        key, "n", "slope",
        e.alias("e"),
        ((e - lag_e) * (e - lag_e)).alias("d2"),
    )
    out = rows.groupBy(key).agg(
        F.first("n").alias("n"),
        F.first("slope").alias("slope"),
        F.sum("d2").alias("sd2"),
        F.sum(F.col("e") * F.col("e")).alias("se2"),
    )
    return out.select(
        key, "n", "slope",
        F.round(F.try_divide(F.col("sd2"), F.col("se2")), 6).alias("dw"),
    )


def granger_f(
    df: DataFrame,
    cause: str,
    effect: str,
    key: str = "event_type",
    ts: str = "timestamp",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Lag-1 Granger-causality F-test between two event-count series:
    does knowing xₜ₋₁ (hourly `cause` count) improve the prediction of
    yₜ (hourly `effect` count) beyond yₜ₋₁ alone?
    F = (n−3)(R²ᵤ − R²ᵣ)/(1 − R²ᵤ) with R²ᵣ = corr(yₜ, yₜ₋₁)² and the
    two-regressor R²ᵤ from the correlation identity
    (r₁² + r₂² − 2r₁r₂r₁₂)/(1 − r₁₂²) — exact for OLS with intercept,
    so the whole test reduces to THREE corr() aggregates, no matrix
    solve and no iteration.

    The hour grid is dense (missing hours = 0 counts) via a bucket
    spine from min to max hour — sequence() on an 800-hour month is a
    bounded driver-side array, exploded distributed. One window lag
    per series on the |hours|-row frame.

    Output: one row (n bigint, r2_restricted r6, r2_unrestricted r6,
    f_stat r6).
    """
    base = df.filter(
        F.col(ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.expr(f"({ts} div {bucket_ms})").cast("long").alias("h"),
        F.col(key).alias("k"),
    )
    counts = base.groupBy("h").agg(
        F.sum((F.col("k") == cause).cast("long")).alias("x"),
        F.sum((F.col("k") == effect).cast("long")).alias("y"),
    )
    span = counts.groupBy().agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("h")
    )
    dense = spine.join(counts, "h", "left").select(
        "h",
        F.coalesce("x", F.lit(0)).cast("double").alias("x"),
        F.coalesce("y", F.lit(0)).cast("double").alias("y"),
    )
    w = Window.orderBy("h")
    lagged = dense.select(
        "y",
        F.lag("y").over(w).alias("y1"),
        F.lag("x").over(w).alias("x1"),
    ).filter(F.col("y1").isNotNull())
    g = lagged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.corr("y", "y1").alias("r1"),
        F.corr("y", "x1").alias("r2"),
        F.corr("y1", "x1").alias("r12"),
    )
    r1, r2, r12 = F.col("r1"), F.col("r2"), F.col("r12")
    r2r = r1 * r1
    r2u = F.try_divide(
        r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12, 1 - r12 * r12
    )
    f = F.try_divide(
        (F.col("n").cast("double") - 3) * (r2u - r2r), 1 - r2u
    )
    return g.select(
        "n",
        F.round(r2r, 6).alias("r2_restricted"),
        F.round(r2u, 6).alias("r2_unrestricted"),
        F.round(f, 6).alias("f_stat"),
    )


def spectral_entropy(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 3_600_000,
    n_freqs: int = 12,
) -> DataFrame:
    """Normalized spectral entropy per key: DFT power at the first
    n_freqs harmonics of the bucketed series, normalized to a
    distribution, H = −Σ p·ln p / ln(n_freqs) ∈ [0, 1] — 0 means one
    dominant cycle (pure rhythm), 1 means white-noise-flat spectrum.
    The single-number "how seasonal is this key?" complement to
    periodogram's per-period table.

    Same sufficient-sums plan as periodogram: the bucketed series fans
    out n_freqs× against a broadcast harmonic frame, ONE
    map-side-combinable aggregate accumulates the centered cos/sin
    projections per (key, harmonic), and the entropy folds over the
    |keys × harmonics| frame.

    Output: (key, n_buckets bigint, entropy r6).
    """
    import math

    spark = df.sparkSession
    b = (
        df.filter(
            F.col(key).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(value).isNotNull()
        )
        .groupBy(
            key, F.expr(f"({ts} div {bucket_ms})").cast("long").alias("bk")
        )
        .agg(F.sum(value).alias("x"))
    )
    idx = F.row_number().over(Window.partitionBy(key).orderBy("bk")) - 1
    nn = F.count(F.lit(1)).over(Window.partitionBy(key))
    mean_k = F.avg("x").over(Window.partitionBy(key))
    seq = b.select(
        key,
        idx.alias("i"),
        nn.alias("n"),
        (F.col("x") - mean_k).alias("xc"),
    )
    harm = spark.createDataFrame(
        [(h,) for h in range(1, n_freqs + 1)], "h int"
    )
    ang = (
        F.lit(2.0 * math.pi)
        * F.col("h").cast("double")
        * F.col("i").cast("double")
        / F.col("n").cast("double")
    )
    proj = (
        seq.crossJoin(F.broadcast(harm))
        .groupBy(key, "h")
        .agg(
            F.sum(F.col("xc") * F.cos(ang)).alias("c"),
            F.sum(F.col("xc") * F.sin(ang)).alias("s"),
            F.first("n").alias("n"),
        )
        .select(
            key, "n",
            F.round(
                F.col("c") * F.col("c") + F.col("s") * F.col("s"), 6
            ).alias("p"),
        )
    )
    tot = Window.partitionBy(key)
    pk = F.try_divide(F.col("p"), F.sum("p").over(tot))
    ent = proj.select(
        key, "n",
        F.when(pk > 0, -pk * F.log(pk)).otherwise(F.lit(0.0)).alias("e"),
    )
    return ent.groupBy(key).agg(
        F.first("n").cast("long").alias("n_buckets"),
        F.round(F.sum("e") / math.log(n_freqs), 6).alias("entropy"),
    )


def mann_kendall(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Mann-Kendall monotone-trend test per key on the bucketed series:
    S = Σᵢ<ⱼ sign(yⱼ − yᵢ), tie-corrected variance
    (n(n−1)(2n+5) − Σ tₖ(tₖ−1)(2tₖ+5))/18, and the continuity-corrected
    z — the nonparametric "is there ANY monotone drift?" companion to
    durbin_watson's linear-residual view (MK needs no linearity and
    shrugs at outliers). Kendall (1975) / Mann (1945).

    The series collapses to per-bucket means first (ONE map-side-
    combinable aggregate, buckets rounded 6 so both engines compare
    identical doubles); the pair join runs on the (key × buckets)
    frame co-partitioned on key — a month of daily buckets is ~31
    rows/key, so the census is bounded by the calendar, not the data.

    Output: (key, n bigint, s bigint, var_s r6, z r6).
    """
    b = (
        df.filter(
            F.col(key).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(value).isNotNull()
        )
        .groupBy(
            key, F.expr(f"({ts} div {bucket_ms})").cast("long").alias("t")
        )
        .agg(F.round(F.avg(value), 6).alias("y"))
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a." + key) == F.col("b." + key))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a." + key).alias("k"))
        .agg(
            F.sum(F.signum(F.col("b.y") - F.col("a.y")))
            .cast("long")
            .alias("s")
        )
    )
    ties = b.groupBy(F.col(key).alias("k"), "y").agg(
        F.count(F.lit(1)).cast("double").alias("tk")
    )
    var = ties.groupBy("k").agg(
        F.sum("tk").alias("n"),
        F.sum(F.col("tk") * (F.col("tk") - 1) * (2 * F.col("tk") + 5)).alias(
            "tie_term"
        ),
    )
    j = pairs.join(var, "k")
    n = F.col("n")
    vs = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18.0
    sd = F.col("s").cast("double")
    z = F.when(F.col("s") > 0, (sd - 1) / F.sqrt(vs)).when(
        F.col("s") < 0, (sd + 1) / F.sqrt(vs)
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("k").alias(key),
        n.cast("long").alias("n"),
        "s",
        F.round(vs, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )


def dickey_fuller(
    df: DataFrame,
    key: str = "event_type",
    ts: str = "timestamp",
    value: str = "value",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Dickey-Fuller unit-root t-statistic per key (lag-0, with
    intercept): regress Δyₜ on yₜ₋₁; γ̂'s t-ratio far below ~−2.9 rejects
    the unit root ⇒ the series is mean-reverting. The complement to
    tsa_kpss (KPSS null = stationary, DF null = unit root; run both and
    read the quadrant). Compare against the Dickey-Fuller table, not the
    normal — the statistic is the distributed part, the critical value
    is a constant lookup.

    Bucket means collapse first (rounded 6 — both engines difference the
    identical doubles); the lag is one window on the (key × buckets)
    frame; γ̂, its standard error, and the t-ratio are closed form on the
    five OLS sufficient sums.

    Output: (key, n bigint, gamma_hat r6, t_stat r6).
    """
    b = (
        df.filter(
            F.col(key).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(value).isNotNull()
        )
        .groupBy(
            key, F.expr(f"({ts} div {bucket_ms})").cast("long").alias("t")
        )
        .agg(F.round(F.avg(value), 6).alias("y"))
    )
    w = Window.partitionBy(key).orderBy("t")
    lagged = b.select(
        key,
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("y1"),
    ).filter(F.col("y1").isNotNull())
    g = lagged.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dy").alias("sd"),
        F.sum("y1").alias("s1"),
        F.sum(F.col("dy") * F.col("y1")).alias("sd1"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("dy") * F.col("dy")).alias("sdd"),
    )
    n = F.col("n").cast("double")
    sxx = F.col("s11") - F.col("s1") * F.col("s1") / n
    sxy = F.col("sd1") - F.col("s1") * F.col("sd") / n
    syy = F.col("sdd") - F.col("sd") * F.col("sd") / n
    gamma = F.try_divide(sxy, sxx)
    rss = syy - gamma * sxy
    se = F.sqrt(F.try_divide(rss, (n - 2) * sxx))
    return g.select(
        key,
        "n",
        F.round(gamma, 6).alias("gamma_hat"),
        F.round(F.try_divide(gamma, se), 6).alias("t_stat"),
    )


def engle_granger(
    df: DataFrame,
    x_kind: str,
    y_kind: str,
    key: str = "event_type",
    ts: str = "timestamp",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Engle-Granger two-step cointegration check between two event-count
    series: OLS yₜ = α + β·xₜ, then the lag-0 Dickey-Fuller t-statistic
    on the residuals (no intercept — residuals are centered by
    construction). A strongly negative adf_t says the two series share a
    long-run equilibrium (the spread mean-reverts) even when each is
    individually a random walk — the pairs-trading / shared-driver
    diagnostic that plain correlation fakes on trending series.

    Both series come from ONE bucket aggregate; the OLS is closed form
    on the joined |buckets| frame; residuals round 6 before differencing
    so both engines difference identical doubles.

    Output: one row (n bigint, beta r6, alpha r6, adf_t r6).
    """
    base = df.filter(
        F.col(ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.expr(f"({ts} div {bucket_ms})").cast("long").alias("h"),
        F.col(key).alias("k"),
    )
    counts = base.groupBy("h").agg(
        F.sum((F.col("k") == x_kind).cast("long")).cast("double").alias("x"),
        F.sum((F.col("k") == y_kind).cast("long")).cast("double").alias("y"),
    )
    fit = counts.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    nd = F.col("n").cast("double")
    beta = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / nd,
        F.col("sxx") - F.col("sx") * F.col("sx") / nd,
    )
    params = fit.select(
        "n",
        F.round(beta, 6).alias("beta"),
        F.round(F.col("my") - beta * F.col("mx"), 6).alias("alpha"),
    )
    e = F.round(F.col("y") - (F.col("alpha") + F.col("beta") * F.col("x")), 6)
    resid = counts.crossJoin(F.broadcast(params)).select(
        "h", "n", "beta", "alpha", e.alias("e")
    )
    w = Window.orderBy("h")
    lagged = resid.select(
        "n", "beta", "alpha",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
        F.lag("e").over(w).alias("e1"),
    ).filter(F.col("e1").isNotNull())
    g = lagged.groupBy().agg(
        F.first("n").alias("n"),
        F.first("beta").alias("beta"),
        F.first("alpha").alias("alpha"),
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("de") * F.col("e1")).alias("sde1"),
        F.sum(F.col("e1") * F.col("e1")).alias("s11"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
    )
    gamma = F.try_divide(F.col("sde1"), F.col("s11"))
    rss = F.col("sdd") - gamma * F.col("sde1")
    se = F.sqrt(F.try_divide(rss, (F.col("m") - 1) * F.col("s11")))
    return g.select(
        "n", "beta", "alpha",
        F.round(F.try_divide(gamma, se), 6).alias("adf_t"),
    )


def rolling_corr(
    df: DataFrame,
    x_kind: str,
    y_kind: str,
    key: str = "event_type",
    ts: str = "timestamp",
    bucket_ms: int = 3_600_000,
    window: int = 24,
) -> DataFrame:
    """Rolling Pearson correlation between two event-count series over a
    trailing `window` of buckets — "is the view↔purchase coupling
    stable, or did it decouple this week?" The time-resolved companion
    to tsa_crosscorr's single global number; regime changes show up as
    the rolling r crossing zero.

    Both series come from ONE bucket aggregate on a dense spine; the
    five sufficient sums run in a single trailing window frame (one
    sort of |buckets| rows), so r is exact per window — no
    re-aggregation per position. Windows shorter than `window` (the
    head) are emitted with their actual n.

    Output: (bucket bigint, n int, r r6).
    """
    base = df.filter(
        F.col(ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.expr(f"({ts} div {bucket_ms})").cast("long").alias("h"),
        F.col(key).alias("k"),
    )
    counts = base.groupBy("h").agg(
        F.sum((F.col("k") == x_kind).cast("long")).cast("double").alias("x"),
        F.sum((F.col("k") == y_kind).cast("long")).cast("double").alias("y"),
    )
    span = counts.groupBy().agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("h"))
    dense = spine.join(counts, "h", "left").select(
        "h",
        F.coalesce("x", F.lit(0.0)).alias("x"),
        F.coalesce("y", F.lit(0.0)).alias("y"),
    )
    w = Window.orderBy("h").rowsBetween(-(window - 1), 0)
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    num = sxy - sx * sy / n
    den = F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return dense.select(
        F.col("h").alias("bucket"),
        n.cast("int").alias("n"),
        F.round(F.try_divide(num, den), 6).alias("r"),
    )


def snaive_backtest(
    df: DataFrame,
    ts_col: str = "timestamp",
    season_days: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest over daily event counts: the
    forecast for day d is the actual of day d − season_days; evaluated
    where both exist. The capacity-planning sanity baseline every
    fancier forecaster must beat — run it before trusting a model.

    Output: one row per evaluated day (day, actual, forecast, abs_err,
    pct_err) plus the span-level MAE/MAPE/bias duplicated per row (one
    frame keeps the oracle a single result set).

    Scale shape: raw events collapse to the day-count frame in ONE
    aggregate; the lag join is a self-equi-join on the tiny day frame
    (days, not events). Missing days count 0 (dense spine via sequence).
    """
    days = (
        df.filter(F.col(ts_col).isNotNull())
        .select((F.col(ts_col) / 86400000).cast("long").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("double").alias("actual"))
    )
    span = days.groupBy().agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = span.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    dense = spine.join(days, "day", "left").select(
        "day", F.coalesce("actual", F.lit(0.0)).alias("actual")
    )
    fc = dense.select(
        (F.col("day") + season_days).alias("day"),
        F.col("actual").alias("forecast"),
    )
    ev = dense.join(fc, "day").select(
        "day", "actual", "forecast",
        F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
        F.round(
            F.try_divide(
                F.abs(F.col("actual") - F.col("forecast")), F.col("actual")
            ),
            6,
        ).alias("pct_err"),
    )
    summ = ev.agg(
        F.round(F.avg("abs_err"), 6).alias("mae"),
        F.round(F.avg(F.try_divide("abs_err", "actual")), 6).alias("mape"),
        F.round(F.avg(F.col("forecast") - F.col("actual")), 6).alias("bias"),
    )
    return (
        ev.crossJoin(F.broadcast(summ))
        .orderBy("day")
    )
