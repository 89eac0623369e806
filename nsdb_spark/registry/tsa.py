"""tsa registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    F, testdata, tsa,
)


def register(q):

    # --- time-series analytics (PromQL/Grafana-shaped extensions) ---
    q["tsa_rate"] = lambda spark, sf: tsa.counter_rate(
        testdata.events_metric(spark, sf)
    )
    q["tsa_zscore"] = lambda spark, sf: tsa.rolling_zscore(
        testdata.events_metric(spark, sf), n=5
    )
    q["tsa_cusum"] = lambda spark, sf: tsa.cusum_summary(
        testdata.events_metric(spark, sf)
    )
    q["tsa_autocorr"] = lambda spark, sf: tsa.autocorr(
        testdata.events_metric(spark, sf), lags=(1, 2, 3)
    )
    q["tsa_acf_pacf"] = lambda spark, sf: tsa.acf_pacf(
        testdata.events_metric(spark, sf)
    )
    q["tsa_locf"] = lambda spark, sf: tsa.locf_fill(
        testdata.events_metric(spark, sf), 86400000
    ).withColumn("is_gap", F.col("is_gap").cast("int"))
    q["tsa_decimate"] = lambda spark, sf: tsa.decimate_minmax(
        testdata.events_metric(spark, sf), 86400000
    )
    q["tsa_ljung_box"] = lambda spark, sf: tsa.ljung_box(
        testdata.table(spark, sf, "events"), h=5,
        key="event_type", ts="ts", value="value", id_col="event_id",
    )

    q["tsa_ema"] = lambda spark, sf: tsa.ema_last(
        testdata.events_metric(spark, sf), alpha=0.3
    )
    q["tsa_kpss"] = lambda spark, sf: tsa.kpss_stat(
        testdata.table(spark, sf, "events"), q=4,
        key="event_type", ts="ts", value="value", id_col="event_id",
    )
    q["tsa_seasonal_strength"] = lambda spark, sf: tsa.seasonal_strength(
        testdata.events_metric(spark, sf)
    )
    q["tsa_holt"] = lambda spark, sf: tsa.holt_last(
        testdata.events_metric(spark, sf), alpha=0.5, beta=0.3
    )
    q["tsa_drawdown"] = lambda spark, sf: tsa.max_drawdown(
        testdata.events_metric(spark, sf)
    )
    q["tsa_variance_ratio"] = lambda spark, sf: tsa.variance_ratio(
        testdata.table(spark, sf, "events"), q=4,
        key="event_type", ts="ts", value="value", id_col="event_id",
    )
    q["tsa_burstiness"] = lambda spark, sf: tsa.burstiness(
        testdata.events_metric(spark, sf)
    )
    q["tsa_seasonal"] = lambda spark, sf: tsa.seasonal_adjust(
        testdata.events_metric(spark, sf),
        period_ms=604800000, bucket_ms=86400000,
    )
    q["tsa_anomaly"] = lambda spark, sf: tsa.seasonal_anomalies(
        testdata.events_metric(spark, sf),
        period_ms=604800000, bucket_ms=86400000, z=3.0,
    )
    q["tsa_rolling_quantiles"] = lambda spark, sf: tsa.rolling_quantiles(
        testdata.events_metric(spark, sf).select(
            "user_id", "timestamp", "event_id", "value"
        ),
        n=5,
    )
    q["tsa_changepoint"] = lambda spark, sf: tsa.changepoint_single(
        testdata.events_metric(spark, sf), scale=100,
        key="event_type", ts="timestamp", value="value",
        id_col="event_id",
    )
    q["tsa_periodogram"] = lambda spark, sf: tsa.periodogram(
        testdata.events_metric(spark, sf), key="event_type",
        ts="timestamp", value="value",
    )
    q["tsa_crosscorr"] = lambda spark, sf: tsa.cross_correlation(
        testdata.events_metric(spark, sf), key_a="view", key_b="purchase",
        key="event_type", ts="timestamp", value="value",
        bucket_ms=3_600_000, max_lag=5,
    )
    q["tsa_rolling_corr"] = lambda spark, sf: tsa.rolling_corr(
        testdata.events_metric(spark, sf), x_kind="view", y_kind="purchase"
    )
    q["tsa_cointegration"] = lambda spark, sf: tsa.engle_granger(
        testdata.events_metric(spark, sf), x_kind="view", y_kind="purchase"
    )
    q["tsa_dickey_fuller"] = lambda spark, sf: tsa.dickey_fuller(
        testdata.events_metric(spark, sf)
    )
    q["tsa_mann_kendall"] = lambda spark, sf: tsa.mann_kendall(
        testdata.events_metric(spark, sf)
    )
    q["tsa_hurst"] = lambda spark, sf: tsa.hurst_rs(
        testdata.events_metric(spark, sf)
    )
    q["tsa_durbin_watson"] = lambda spark, sf: tsa.durbin_watson(
        testdata.events_metric(spark, sf)
    )
    q["tsa_granger"] = lambda spark, sf: tsa.granger_f(
        testdata.events_metric(spark, sf), cause="view", effect="purchase"
    )
    q["tsa_spectral_entropy"] = lambda spark, sf: tsa.spectral_entropy(
        testdata.events_metric(spark, sf)
    )
    q["tsa_snaive_backtest"] = lambda spark, sf: tsa.snaive_backtest(
        testdata.events_metric(spark, sf), "timestamp", season_days=7
    )


def register_oracles(o):
    _bw = {j: 1.0 - j / 5.0 for j in (1, 2, 3, 4)}
    o["tsa_kpss"] = f"""
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS eid,
                  value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT *, avg(v) OVER (PARTITION BY k) AS mean FROM e),
d AS (SELECT k, t, eid, v - mean AS dev FROM m),
sq AS (SELECT k, dev,
              sum(dev) OVER (PARTITION BY k ORDER BY t, eid
                             ROWS UNBOUNDED PRECEDING) AS s,
              lag(dev, 1) OVER (PARTITION BY k ORDER BY t, eid) AS l1,
              lag(dev, 2) OVER (PARTITION BY k ORDER BY t, eid) AS l2,
              lag(dev, 3) OVER (PARTITION BY k ORDER BY t, eid) AS l3,
              lag(dev, 4) OVER (PARTITION BY k ORDER BY t, eid) AS l4
       FROM d),
agg AS (SELECT k, cast(count(*) AS bigint) AS n, sum(s * s) AS ss,
               sum(dev * dev) AS g0, sum(dev * l1) AS g1,
               sum(dev * l2) AS g2, sum(dev * l3) AS g3,
               sum(dev * l4) AS g4
        FROM sq GROUP BY k)
SELECT k AS event_type, n,
       round((ss / (cast(n AS double) * n))
             / ((g0 + 2.0 * ({_bw[1]!r} * g1 + {_bw[2]!r} * g2
                             + {_bw[3]!r} * g3 + {_bw[4]!r} * g4))
                / cast(n AS double)), 6) AS kpss_stat
FROM agg
"""
    o["tsa_rate"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events),
l AS (SELECT user_id, timestamp, event_id,
             value - lag(value) OVER w AS delta,
             timestamp - lag(timestamp) OVER w AS dt
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY timestamp ASC, event_id ASC))
SELECT user_id, timestamp, event_id, round(delta, 6) + 0.0 AS delta,
       round(CASE WHEN dt > 0 THEN delta / (dt / 1000.0) END, 6) + 0.0 AS rate_per_s
FROM l WHERE dt IS NOT NULL
"""
    o["tsa_zscore"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events)
SELECT user_id, timestamp, event_id,
       round(avg(value) OVER w, 4) AS mu,
       round(stddev_samp(value) OVER w, 4) AS sigma,
       round(CASE WHEN stddev_samp(value) OVER w > 0
                  THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
             END, 4) + 0.0 AS z
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY timestamp ASC, event_id ASC
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
"""
    o["tsa_locf"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events),
b AS (SELECT user_id, timestamp // 86400000 AS k,
             max({'t': timestamp, 'i': event_id, 'v': value}) AS last
      FROM e GROUP BY 1, 2),
ax AS (SELECT user_id, unnest(generate_series(min(k), max(k))) AS k
       FROM b GROUP BY user_id),
j AS (SELECT ax.user_id, ax.k, b.last FROM ax LEFT JOIN b USING (user_id, k))
SELECT user_id, k * 86400000 AS bucket_start,
       round(last_value(struct_extract(last, 'v') IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY k ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS value_filled,
       cast(last IS NULL AS INT) AS is_gap
FROM j
"""
    o["tsa_decimate"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events),
a AS (SELECT user_id, timestamp // 86400000 AS k,
             min({'v': value, 't': timestamp, 'i': event_id}) AS mn,
             max({'v': value, 't': timestamp, 'i': event_id}) AS mx
      FROM e GROUP BY 1, 2)
SELECT user_id, k * 86400000 AS bucket_start,
       struct_extract(mn, 'v') AS min_value, struct_extract(mn, 't') AS min_ts,
       struct_extract(mx, 'v') AS max_value, struct_extract(mx, 't') AS max_ts
FROM a
"""
    o["tsa_autocorr"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS eid, value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT *, avg(v) OVER (PARTITION BY k) AS mean FROM e),
d AS (SELECT k, t, eid, v - mean AS dev FROM m),
lagd AS (SELECT k, dev,
        lag(dev, 1) OVER (PARTITION BY k ORDER BY t, eid) AS l1,
        lag(dev, 2) OVER (PARTITION BY k ORDER BY t, eid) AS l2,
        lag(dev, 3) OVER (PARTITION BY k ORDER BY t, eid) AS l3 FROM d),
agg AS (SELECT k, sum(dev*dev) AS den, sum(dev*l1) AS n1,
               sum(dev*l2) AS n2, sum(dev*l3) AS n3
        FROM lagd GROUP BY k)
SELECT k AS event_type, 1 AS lag, round(n1/den, 6) AS acf FROM agg
UNION ALL SELECT k, 2, round(n2/den, 6) FROM agg
UNION ALL SELECT k, 3, round(n3/den, 6) FROM agg
"""
    o["tsa_acf_pacf"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS eid, value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT *, avg(v) OVER (PARTITION BY k) AS mean FROM e),
d AS (SELECT k, t, eid, v - mean AS dev FROM m),
lagd AS (SELECT k, dev,
        lag(dev, 1) OVER (PARTITION BY k ORDER BY t, eid) AS l1,
        lag(dev, 2) OVER (PARTITION BY k ORDER BY t, eid) AS l2,
        lag(dev, 3) OVER (PARTITION BY k ORDER BY t, eid) AS l3 FROM d),
agg AS (SELECT k, sum(dev*dev) AS den, sum(dev*l1) AS s1,
               sum(dev*l2) AS s2, sum(dev*l3) AS s3
        FROM lagd GROUP BY k),
r AS (SELECT k, s1 / nullif(den, 0) AS r1, s2 / nullif(den, 0) AS r2,
             s3 / nullif(den, 0) AS r3 FROM agg),
p AS (SELECT k, r1, r2, r3,
             (r2 - r1 * r1) / nullif(1.0 - r1 * r1, 0) AS p2
      FROM r),
q AS (SELECT *, r1 - p2 * r1 AS f21 FROM p),
x AS (SELECT *, (r3 - f21 * r2 - p2 * r1)
                / nullif(1.0 - f21 * r1 - p2 * r2, 0) AS p3 FROM q)
SELECT k AS event_type, 1 AS lag, round(r1, 6) AS acf, round(r1, 6) AS pacf
FROM x
UNION ALL SELECT k, 2, round(r2, 6), round(p2, 6) FROM x
UNION ALL SELECT k, 3, round(r3, 6), round(p3, 6) FROM x
"""
    o["tsa_ljung_box"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS eid,
                  value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
m AS (SELECT *, avg(v) OVER (PARTITION BY k) AS mean FROM e),
d AS (SELECT k, t, eid, v - mean AS dev FROM m),
lagd AS (SELECT k, dev,
        lag(dev, 1) OVER (PARTITION BY k ORDER BY t, eid) AS l1,
        lag(dev, 2) OVER (PARTITION BY k ORDER BY t, eid) AS l2,
        lag(dev, 3) OVER (PARTITION BY k ORDER BY t, eid) AS l3,
        lag(dev, 4) OVER (PARTITION BY k ORDER BY t, eid) AS l4,
        lag(dev, 5) OVER (PARTITION BY k ORDER BY t, eid) AS l5 FROM d),
agg AS (SELECT k, cast(count(*) AS bigint) AS n, sum(dev*dev) AS den,
               sum(dev*l1) AS n1, sum(dev*l2) AS n2, sum(dev*l3) AS n3,
               sum(dev*l4) AS n4, sum(dev*l5) AS n5
        FROM lagd GROUP BY k)
SELECT k AS event_type, n,
       round(n * (n + 2)
             * ((n1/den)*(n1/den)/(n-1) + (n2/den)*(n2/den)/(n-2)
                + (n3/den)*(n3/den)/(n-3) + (n4/den)*(n4/den)/(n-4)
                + (n5/den)*(n5/den)/(n-5)), 6) AS q_stat
FROM agg
"""
    o["tsa_burstiness"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT user_id,
             cast(t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
               AS double) AS gp
      FROM e),
gg AS (SELECT user_id, gp FROM g WHERE gp IS NOT NULL),
a AS (SELECT user_id, cast(count(*) AS bigint) AS n_gaps, avg(gp) AS mu,
             sum(gp * gp) AS ss, sum(gp) AS s1 FROM gg GROUP BY 1)
SELECT user_id, n_gaps, round(mu, 6) AS mean_gap,
       round((sqrt((ss - s1 * s1 / n_gaps) / (n_gaps - 1)) - mu)
             / (sqrt((ss - s1 * s1 / n_gaps) / (n_gaps - 1)) + mu), 6)
         AS b
FROM a WHERE n_gaps >= 2
"""
    o["tsa_variance_ratio"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id AS eid,
                  value AS v
           FROM events
           WHERE value IS NOT NULL AND event_type IS NOT NULL),
l AS (SELECT k, v,
             v - lag(v, 1) OVER (PARTITION BY k ORDER BY t, eid) AS d1,
             v - lag(v, 4) OVER (PARTITION BY k ORDER BY t, eid) AS dq
      FROM e),
a AS (SELECT k, cast(count(*) AS bigint) AS n,
             count(d1) AS n1, sum(d1) AS a1, sum(d1 * d1) AS b1,
             count(dq) AS nq, sum(dq) AS aq, sum(dq * dq) AS bq
      FROM l GROUP BY 1)
SELECT k AS event_type, n,
       round(((bq - aq * aq / nq) / nq)
             / (4.0 * ((b1 - a1 * a1 / n1) / n1)), 6) AS vr
FROM a
"""
    o["tsa_holt"] = """
WITH RECURSIVE
e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL),
seq AS (SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY timestamp, event_id) AS i
        FROM e),
meta AS (SELECT user_id, cast(count(*) AS bigint) AS n,
                max(timestamp) AS last_ts
         FROM e GROUP BY 1),
rec(user_id, i, l, b) AS (
  SELECT user_id, 1::BIGINT, value::DOUBLE, 0.0::DOUBLE
  FROM seq WHERE i = 1
  UNION ALL
  SELECT r.user_id, r.i + 1,
         0.5 * s.value + 0.5 * (r.l + r.b),
         0.3 * ((0.5 * s.value + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
)
SELECT m.user_id, m.n, round(r.l, 6) AS level, round(r.b, 6) AS trend,
       round(r.l + r.b, 6) AS forecast_1, m.last_ts
FROM rec r JOIN meta m ON r.user_id = m.user_id AND r.i = m.n
"""
    o["tsa_drawdown"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_id AS eid,
                  value AS v
           FROM events
           WHERE value IS NOT NULL AND user_id IS NOT NULL),
r AS (SELECT user_id, v,
             max(v) OVER (PARTITION BY user_id ORDER BY t, eid
                          ROWS UNBOUNDED PRECEDING) AS rm
      FROM e)
SELECT user_id, cast(count(*) AS bigint) AS n, round(max(v), 6) AS peak,
       round(max(rm - v), 6) AS max_drawdown
FROM r GROUP BY 1
"""
    o["tsa_ema"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events),
l AS (SELECT user_id, count(*) AS n, max(timestamp) AS last_ts,
             list(value ORDER BY timestamp, event_id) AS xs
      FROM e GROUP BY user_id)
SELECT user_id, n,
       round(list_reduce(xs, (acc, x) ->
             (0.3::DOUBLE)*x + (1::DOUBLE - 0.3::DOUBLE)*acc), 6) AS ema,
       last_ts
FROM l
"""
    # CUSUM via its prefix-sum closed form — identical window framing
    o["tsa_cusum"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_id, value FROM events),
ks AS (SELECT user_id, avg(value) AS mu, 3.0 * stddev_samp(value) AS h
       FROM e GROUP BY user_id),
st AS (SELECT e.user_id, t, event_id, ks.h,
       sum(value - ks.mu)
         OVER (PARTITION BY e.user_id ORDER BY t, event_id
               ROWS UNBOUNDED PRECEDING) AS p
       FROM e JOIN ks USING (user_id)),
cs AS (SELECT user_id, t, event_id, h, p,
       p - least(0.0, min(p) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS s
       FROM st)
-- final S = max(0, -min P): P_n = sum of mean-deviations = 0 identically
SELECT user_id, count(*) AS n,
       round(greatest(0.0, -min(p)), 6) AS final_s,
       round(max(s), 6) AS max_s,
       cast(sum(CASE WHEN s > h THEN 1 ELSE 0 END) AS bigint) AS n_alarms
FROM cs GROUP BY user_id
"""
    o["tsa_seasonal"] = """
WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS timestamp, value
           FROM events WHERE event_type IS NOT NULL),
p AS (SELECT *, ((timestamp // 86400000) * 86400000) % 604800000 AS phase
      FROM e)
SELECT event_id, event_type, timestamp, phase,
       round(avg(value) OVER (PARTITION BY event_type, phase), 4) AS seasonal,
       round(value
             - avg(value) OVER (PARTITION BY event_type, phase)
             + avg(value) OVER (PARTITION BY event_type), 4) AS adjusted
FROM p
"""
    o["tsa_anomaly"] = """
WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS timestamp, value
           FROM events WHERE event_type IS NOT NULL),
p AS (SELECT *, ((timestamp // 86400000) * 86400000) % 604800000 AS phase
      FROM e),
r AS (SELECT *,
             value - avg(value) OVER (PARTITION BY event_type, phase) AS resid
      FROM p),
z AS (SELECT *,
             round(resid / stddev_samp(resid)
                           OVER (PARTITION BY event_type), 4) AS z_score
      FROM r)
SELECT event_id, event_type, timestamp, phase, value, z_score
FROM z WHERE abs(z_score) > 3.0
"""
    import math as _math

    _pg_vals = ", ".join(
        f"({p}, {2.0 * _math.pi / p!r})"
        for p in (3_600_000, 21_600_000, 86_400_000, 604_800_000)
    )
    # the angular frequencies are embedded as shortest-round-trip float
    # literals so both engines multiply the IDENTICAL double w; only the
    # final cos/sin differ (<= 1 ulp), washed out by the variance
    # normalization + round(6)
    o["tsa_periodogram"] = f"""
WITH pts AS (SELECT event_type, epoch_ms(ts) AS t, value AS x
             FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
               AND event_type IS NOT NULL),
per(period_ms, w) AS (VALUES {_pg_vals}),
g AS (SELECT event_type, period_ms,
             sum(x * cos(w * t)) AS sxc, sum(cos(w * t)) AS sc,
             sum(x * sin(w * t)) AS sxs, sum(sin(w * t)) AS ss,
             sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
      FROM pts CROSS JOIN per GROUP BY 1, 2)
SELECT event_type, cast(period_ms AS bigint) AS period_ms,
       CASE WHEN sxx - sx * (sx / n) > 0 THEN round(
         2.0 * ((sxc - sx / n * sc) * (sxc - sx / n * sc)
                + (sxs - sx / n * ss) * (sxs - sx / n * ss))
         / (n * (sxx - sx * (sx / n))), 6) ELSE 0.0 END AS power_frac,
       cast(n AS bigint) AS n
FROM g
"""
    o["tsa_crosscorr"] = """
WITH pts AS (SELECT event_type, epoch_ms(ts) AS t, value AS x
             FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
sa AS (SELECT (t - t % 3600000) / 3600000 AS b, sum(x) / count(*) AS v
       FROM pts WHERE event_type = 'view' GROUP BY 1),
sbase AS (SELECT (t - t % 3600000) / 3600000 AS b, sum(x) / count(*) AS v
          FROM pts WHERE event_type = 'purchase' GROUP BY 1),
lags(lag) AS (VALUES (-5), (-4), (-3), (-2), (-1), (0),
                     (1), (2), (3), (4), (5)),
j AS (SELECT l.lag, sa.v AS va, sb.v AS vb
      FROM sbase sb CROSS JOIN lags l
      JOIN sa ON sa.b = sb.b + l.lag),
g AS (SELECT lag, cast(count(*) AS bigint) AS n_buckets,
             sum(va) AS suma, sum(vb) AS sumb, sum(va * vb) AS sab,
             sum(va * va) AS saa, sum(vb * vb) AS sbb
      FROM j GROUP BY 1)
SELECT cast(lag AS bigint) AS lag, n_buckets,
       CASE WHEN saa - suma * (suma / n_buckets) > 0
             AND sbb - sumb * (sumb / n_buckets) > 0
            THEN round((sab - suma * (sumb / n_buckets))
                       / sqrt((saa - suma * (suma / n_buckets))
                              * (sbb - sumb * (sumb / n_buckets))), 6)
            ELSE 0.0 END AS ccf
FROM g ORDER BY lag
"""
    o["tsa_seasonal_strength"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, value AS v
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
p AS (SELECT k, (t // 86400000 * 86400000) % 604800000 AS ph, v FROM e),
g AS (SELECT k, ph, cast(count(*) AS bigint) AS np, sum(v) AS sp,
             sum(v * v) AS ssp FROM p GROUP BY 1, 2),
per AS (SELECT k, cast(sum(np) AS bigint) AS n,
               cast(count(*) AS bigint) AS n_phases,
               sum(ssp - sp * sp / np) AS ssw,
               sum(ssp) - sum(sp) * sum(sp) / sum(np) AS sst
        FROM g GROUP BY 1)
SELECT k AS event_type, n, n_phases,
       round(1.0 - ssw / sst, 6) AS strength
FROM per
"""
    o["tsa_rolling_quantiles"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value
           FROM events)
SELECT user_id, timestamp, event_id, value,
       round(q[1], 6) AS roll_p50, round(q[2], 6) AS roll_p90
FROM (SELECT *,
             quantile_cont(value, [0.5, 0.9])
                 OVER (PARTITION BY user_id ORDER BY timestamp, event_id
                       ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS q
      FROM e)
"""
    o["tsa_changepoint"] = """
WITH base AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id,
                     cast(round(value * 100) AS bigint) AS v
              FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL),
d AS (SELECT k, t, event_id, v,
             count(*) OVER (PARTITION BY k) AS n,
             sum(v) OVER (PARTITION BY k) AS s,
             row_number() OVER w AS rn,
             sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS s1
      FROM base WINDOW w AS (PARTITION BY k ORDER BY t, event_id)),
c AS (SELECT k, n, rn, t,
             cast(s1 AS hugeint) * n - cast(s AS hugeint) * rn AS a,
             s, s1
      FROM d WHERE rn < n),
sc AS (SELECT k, n, rn, t,
              cast(a AS double) * cast(a AS double)
                / (n * cast(rn AS double) * (n - rn)) / 10000.0 AS score,
              cast(s1 AS double) / (rn * 100.0) AS m1,
              cast(s - s1 AS double) / ((n - rn) * 100.0) AS m2
       FROM c)
SELECT k AS event_type, n, rn AS split_rn, t AS split_ts,
       round(score, 6) AS score, round(m1, 6) AS mean_left,
       round(m2, 6) AS mean_right
FROM sc
QUALIFY row_number() OVER (PARTITION BY k ORDER BY score DESC, rn ASC) = 1
"""
    o["tsa_rolling_corr"] = """
WITH base AS (SELECT epoch_ms(ts) // 3600000 AS h, event_type AS k
              FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
counts AS (SELECT h,
                  sum(CASE WHEN k = 'view' THEN 1 ELSE 0 END)::DOUBLE AS x,
                  sum(CASE WHEN k = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
                    AS y
           FROM base GROUP BY h),
spine AS (SELECT unnest(range((SELECT min(h) FROM counts),
                              (SELECT max(h) FROM counts) + 1)) AS h),
dense AS (SELECT spine.h, coalesce(x, 0) AS x, coalesce(y, 0) AS y
          FROM spine LEFT JOIN counts ON spine.h = counts.h),
win AS (SELECT h,
               count(*) OVER w AS n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        FROM dense
        WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
SELECT h AS bucket, cast(n AS int) AS n,
       round((sxy - sx * sy / n)
             / nullif(sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 0),
             6) AS r
FROM win
"""
    o["tsa_cointegration"] = """
WITH base AS (SELECT epoch_ms(ts) // 3600000 AS h, event_type AS k
              FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
counts AS (SELECT h,
                  sum(CASE WHEN k = 'view' THEN 1 ELSE 0 END)::DOUBLE AS x,
                  sum(CASE WHEN k = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
                    AS y
           FROM base GROUP BY h),
fit AS (SELECT cast(count(*) AS bigint) AS n, avg(x) AS mx, avg(y) AS my,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(x) AS sx,
               sum(y) AS sy
        FROM counts),
par AS (SELECT n,
               round((sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0), 6)
                 AS beta,
               round(my - (sxy - sx * sy / n)
                          / nullif(sxx - sx * sx / n, 0) * mx, 6) AS alpha
        FROM fit),
resid AS (SELECT h, n, beta, alpha,
                 round(y - (alpha + beta * x), 6) AS e
          FROM counts, par),
lagged AS (SELECT n, beta, alpha,
                  e - lag(e) OVER (ORDER BY h) AS de,
                  lag(e) OVER (ORDER BY h) AS e1
           FROM resid),
g AS (SELECT any_value(n) AS n, any_value(beta) AS beta,
             any_value(alpha) AS alpha, count(*)::DOUBLE AS m,
             sum(de * e1) AS sde1, sum(e1 * e1) AS s11,
             sum(de * de) AS sdd
      FROM lagged WHERE e1 IS NOT NULL)
SELECT n, beta, alpha,
       round((sde1 / nullif(s11, 0))
             / nullif(sqrt((sdd - (sde1 / nullif(s11, 0)) * sde1)
                           / ((m - 1) * s11)), 0), 6) AS adf_t
FROM g
"""
    o["tsa_dickey_fuller"] = """
WITH b AS (SELECT event_type AS k, epoch_ms(ts) // 86400000 AS t,
                  round(avg(value), 6) AS y
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
l AS (SELECT k, y - lag(y) OVER (PARTITION BY k ORDER BY t) AS dy,
             lag(y) OVER (PARTITION BY k ORDER BY t) AS y1
      FROM b),
f AS (SELECT k, cast(count(*) AS bigint) AS n, sum(dy) AS sd,
             sum(y1) AS s1, sum(dy * y1) AS sd1, sum(y1 * y1) AS s11,
             sum(dy * dy) AS sdd
      FROM l WHERE y1 IS NOT NULL GROUP BY k),
x AS (SELECT k, n,
             (sd1 - s1 * sd / n) / nullif(s11 - s1 * s1 / n, 0) AS gamma,
             s11 - s1 * s1 / n AS sxx,
             sdd - sd * sd / n
               - (sd1 - s1 * sd / n) / nullif(s11 - s1 * s1 / n, 0)
                 * (sd1 - s1 * sd / n) AS rss
      FROM f)
SELECT k AS event_type, n, round(gamma, 6) AS gamma_hat,
       round(gamma / nullif(sqrt(rss / ((n - 2) * sxx)), 0), 6) AS t_stat
FROM x
"""
    o["tsa_mann_kendall"] = """
WITH b AS (SELECT event_type AS k, epoch_ms(ts) // 86400000 AS t,
                  round(avg(value), 6) AS y
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
pairs AS (SELECT a.k, sum(sign(b.y - a.y))::BIGINT AS s
          FROM b a JOIN b b ON a.k = b.k AND a.t < b.t GROUP BY a.k),
ties AS (SELECT k, y, count(*)::DOUBLE AS tk FROM b GROUP BY k, y),
var AS (SELECT k, sum(tk) AS n,
               sum(tk * (tk - 1) * (2 * tk + 5)) AS tie_term
        FROM ties GROUP BY k),
j AS (SELECT pairs.k, n, s,
             (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0 AS vs
      FROM pairs JOIN var ON pairs.k = var.k)
SELECT k AS event_type, cast(n AS bigint) AS n, s, round(vs, 6) AS var_s,
       round(CASE WHEN s > 0 THEN (s - 1) / sqrt(vs)
                  WHEN s < 0 THEN (s + 1) / sqrt(vs)
                  ELSE 0.0 END, 6) AS z
FROM j
"""
    o["tsa_hurst"] = """
WITH b AS (SELECT event_type AS k, epoch_ms(ts) // 3600000 AS bk,
                  sum(value) AS x
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
seq AS (SELECT k, x,
               row_number() OVER (PARTITION BY k ORDER BY bk) - 1 AS i
        FROM b),
fan AS (SELECT k, x, i, w, i // w AS chunk
        FROM seq, (VALUES (8), (16), (32)) ws(w)),
pre AS (SELECT k, w, chunk, x, i,
               count(*) OVER (PARTITION BY k, w, chunk) AS cn,
               avg(x) OVER (PARTITION BY k, w, chunk) AS mc
        FROM fan),
walked AS (SELECT k, w, chunk, x, cn,
                  sum(x - mc)
                    OVER (PARTITION BY k, w, chunk ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c
           FROM pre),
rs AS (SELECT k, w, chunk, max(c) - min(c) AS r, stddev_pop(x) AS s
       FROM walked WHERE cn = w GROUP BY k, w, chunk),
pts AS (SELECT k, log2(w) AS lx, avg(log2(r / s)) AS y
        FROM rs WHERE s > 0 GROUP BY k, w),
g AS (SELECT k, cast(count(*) AS int) AS n_windows,
             sum(lx * y) AS sxy, sum(lx * lx) AS sxx,
             sum(lx) AS sx, sum(y) AS sy, count(*)::DOUBLE AS n
      FROM pts GROUP BY k)
SELECT k AS event_type, n_windows,
       round((sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0), 6) AS hurst
FROM g
"""
    o["tsa_durbin_watson"] = """
WITH b AS (SELECT event_type AS k,
                  cast(epoch_ms(ts) // 86400000 AS DOUBLE) AS t,
                  avg(value) AS y
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
fit AS (SELECT k, cast(count(*) AS bigint) AS n, avg(t) AS mt, avg(y) AS my,
               sum(t * y) AS sty, sum(t * t) AS stt, sum(t) AS st,
               sum(y) AS sy
        FROM b GROUP BY k),
par AS (SELECT k, n,
               round((sty - st * sy / n) / nullif(stt - st * st / n, 0), 6)
                 AS slope,
               round(my - (sty - st * sy / n)
                          / nullif(stt - st * st / n, 0) * mt, 6) AS icept
        FROM fit),
res AS (SELECT b.k, n, slope,
               round(y - (icept + slope * t), 6) AS e,
               round(y - (icept + slope * t), 6)
               - lag(round(y - (icept + slope * t), 6))
                   OVER (PARTITION BY b.k ORDER BY t) AS de
        FROM b JOIN par ON b.k = par.k)
SELECT k AS event_type, any_value(n) AS n, any_value(slope) AS slope,
       round(sum(de * de) / nullif(sum(e * e), 0), 6) AS dw
FROM res GROUP BY k
"""
    o["tsa_granger"] = """
WITH base AS (SELECT epoch_ms(ts) // 3600000 AS h, event_type AS k
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL),
counts AS (SELECT h,
                  sum(CASE WHEN k = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
                  sum(CASE WHEN k = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
           FROM base GROUP BY h),
spine AS (SELECT unnest(range((SELECT min(h) FROM counts),
                              (SELECT max(h) FROM counts) + 1)) AS h),
dense AS (SELECT spine.h, coalesce(x, 0)::DOUBLE AS x,
                 coalesce(y, 0)::DOUBLE AS y
          FROM spine LEFT JOIN counts ON spine.h = counts.h),
lagged AS (SELECT y, lag(y) OVER (ORDER BY h) AS y1,
                  lag(x) OVER (ORDER BY h) AS x1
           FROM dense),
g AS (SELECT cast(count(*) AS bigint) AS n,
             corr(y, y1) AS r1, corr(y, x1) AS r2, corr(y1, x1) AS r12
      FROM lagged WHERE y1 IS NOT NULL)
SELECT n, round(r1 * r1, 6) AS r2_restricted,
       round((r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12)
             / nullif(1 - r12 * r12, 0), 6) AS r2_unrestricted,
       round((n - 3) * ((r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12)
                        / nullif(1 - r12 * r12, 0) - r1 * r1)
             / nullif(1 - (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12)
                          / nullif(1 - r12 * r12, 0), 0), 6) AS f_stat
FROM g
"""
    o["tsa_spectral_entropy"] = """
WITH b AS (SELECT event_type AS k, epoch_ms(ts) // 3600000 AS bk,
                  sum(value) AS x
           FROM events
           WHERE event_type IS NOT NULL AND ts IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
seq AS (SELECT k,
               row_number() OVER (PARTITION BY k ORDER BY bk) - 1 AS i,
               count(*) OVER (PARTITION BY k) AS n,
               x - avg(x) OVER (PARTITION BY k) AS xc
        FROM b),
proj AS (SELECT k, h, any_value(n) AS n,
                round(pow(sum(xc * cos(2 * pi() * h * i / n)), 2)
                      + pow(sum(xc * sin(2 * pi() * h * i / n)), 2), 6) AS p
         FROM seq, range(1, 13) hs(h)
         GROUP BY k, h),
ent AS (SELECT k, n, p / nullif(sum(p) OVER (PARTITION BY k), 0) AS pk
        FROM proj)
SELECT k AS event_type, cast(any_value(n) AS bigint) AS n_buckets,
       round(sum(CASE WHEN pk > 0 THEN -pk * ln(pk) ELSE 0 END) / ln(12), 6)
         AS entropy
FROM ent GROUP BY k
"""
    o["tsa_snaive_backtest"] = """
WITH m AS (SELECT epoch_ms(ts) AS timestamp FROM events WHERE ts IS NOT NULL),
days AS (SELECT timestamp // 86400000 AS day, count(*)::DOUBLE AS actual
         FROM m GROUP BY 1),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM span),
dense AS (SELECT s.day, coalesce(d.actual, 0.0) AS actual
          FROM spine s LEFT JOIN days d USING (day)),
fc AS (SELECT day + 7 AS day, actual AS forecast FROM dense),
ev AS (SELECT d.day, d.actual, f.forecast,
              abs(d.actual - f.forecast) AS abs_err,
              round(CASE WHEN d.actual = 0 THEN NULL
                    ELSE abs(d.actual - f.forecast) / d.actual END, 6) AS pct_err
       FROM dense d JOIN fc f USING (day)),
summ AS (SELECT round(avg(abs_err), 6) AS mae,
                round(avg(CASE WHEN actual = 0 THEN NULL
                          ELSE abs_err / actual END), 6) AS mape,
                round(avg(forecast - actual), 6) AS bias
         FROM ev)
SELECT ev.day, ev.actual, ev.forecast, ev.abs_err, ev.pct_err,
       s.mae, s.mape, s.bias
FROM ev, summ s ORDER BY ev.day
"""
