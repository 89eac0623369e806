"""events registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    DataFrame, F, M, MCNEMAR_SPLIT_MS, SparkSession, _round, analytics,
    temporal_join, testdata,
)


def register(q):

    q["events_sessionize"] =lambda spark, sf: _round(
        temporal_join.sessionize(
            testdata.events_metric(spark, sf).select(
                "user_id", "timestamp", "event_id", "value"
            ),
            key="user_id",
            ts="timestamp",
            gap_ms=4 * 3600 * 1000,
            order_tie="event_id",
            value="value",
        ),
        {"sum_value": 3},
    )
    q["events_session_depth"] = lambda spark, sf: temporal_join.session_depth_histogram(
        testdata.events_metric(spark, sf).select(
            "user_id", "timestamp", "event_id"
        ),
        key="user_id",
        ts="timestamp",
        gap_ms=4 * 3600 * 1000,
        order_tie="event_id",
        cap=20,
    )
    q["win_topk_per_group"] = lambda spark, sf: analytics.topk_per_group(
        testdata.table(spark, sf, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        ),
        part="o_custkey",
        order_col="o_totalprice",
        k=2,
        tie="o_orderkey",
    )
    q["win_moving_agg"] = lambda spark, sf: analytics.moving_aggregate(
        testdata.events_metric(spark, sf).select(
            "user_id", "timestamp", "event_id", "value"
        ),
        key="user_id",
        ts="timestamp",
        value="value",
        tie="event_id",
        preceding=3,
    )
    q["events_funnel"] = lambda spark, sf: analytics.funnel(
        testdata.events_metric(spark, sf),
        steps=["signup", "click", "purchase"],
    )
    q["events_funnel_windowed"] = lambda spark, sf: analytics.funnel(
        testdata.events_metric(spark, sf),
        steps=["signup", "click", "purchase"],
        within_ms=604800000,
    )
    q["events_paths"] = lambda spark, sf: temporal_join.session_paths(
        testdata.events_metric(spark, sf).select(
            "user_id", "timestamp", "event_id", "event_type"
        ),
        key="user_id", ts="timestamp", gap_ms=14_400_000,
        order_tie="event_id", label="event_type", k=20,
    )
    q["events_active_users"] = lambda spark, sf: analytics.active_users(
        testdata.events_metric(spark, sf), bucket_ms=86400000, window_buckets=7
    )
    q["events_transitions"] = lambda spark, sf: analytics.transition_counts(
        testdata.events_metric(spark, sf)
    )
    q["events_markov"] = lambda spark, sf: analytics.markov_transition_probs(
        testdata.events_metric(spark, sf), alpha=1.0
    )
    q["events_kaplan_meier"] = lambda spark, sf: analytics.kaplan_meier(
        testdata.table(spark, sf, "orders"),
        subject="o_custkey", ts="o_orderdate",
    )

    # --- cohort / distribution analytics ---
    q["events_retention"] = lambda spark, sf: analytics.retention_cohorts(
        testdata.events_metric(spark, sf), bucket_ms=604800000
    )
    q["events_json_stats"] = lambda spark, sf: analytics.json_field_stats(
        testdata.table(spark, sf, "events"),
        json_col="props", path="$.k", group="event_type",
    )
    q["events_entropy_rate"] = (
        lambda spark, sf: analytics.markov_entropy_rate(
            testdata.events_metric(spark, sf)
        )
    )
    q["events_mcnemar"] = lambda spark, sf: analytics.mcnemar_paired(
        testdata.table(spark, sf, "events").select(
            "user_id", testdata.ts_ms(testdata.table(spark, sf, "events"))
            .alias("t")
        ),
        split_ms=MCNEMAR_SPLIT_MS, user="user_id", ts="t",
    )
    q["win_longest_streaks"] = lambda spark, sf: analytics.longest_streaks(
        testdata.events_metric(spark, sf), min_len=3
    )
    q["events_poisson_check"] = lambda spark, sf: analytics.poisson_check(
        testdata.events_metric(spark, sf), user="user_id", ts="timestamp"
    )
    q["win_latest_percentile"] = lambda spark, sf: analytics.latest_percentile(
        testdata.events_metric(spark, sf), key="user_id",
        ts="timestamp", value="value", id_col="event_id",
    )

    def _gone_quiet(spark, sf):
        orders = testdata.table(spark, sf, "orders").select(
            F.col("o_custkey").alias("user_id"),
            testdata.ts_ms(
                testdata.table(spark, sf, "orders"), "o_orderdate"
            ).alias("t"),
        )
        now = orders.agg(F.max("t")).first()[0]
        return analytics.gone_quiet(
            orders, now_ms=now, silent_ms=15_552_000_000,
            active_window_ms=31_536_000_000, user="user_id", ts="t",
        )

    q["events_gone_quiet"] = _gone_quiet
    q["events_user_overlap"] = lambda spark, sf: analytics.audience_overlap(
        testdata.events_metric(spark, sf)
    )
    q["events_growth_accounting"] = (
        lambda spark, sf: analytics.growth_accounting(
            testdata.events_metric(spark, sf), bucket_ms=604800000
        )
    )
    q["win_time_in_state"] = lambda spark, sf: analytics.time_in_state(
        testdata.events_metric(spark, sf)
    )
    q["events_load_factor"] = lambda spark, sf: analytics.load_factor(
        testdata.events_metric(spark, sf), bucket_ms=3600000
    )
    q["win_running_records"] = lambda spark, sf: analytics.running_records(
        testdata.events_metric(spark, sf), key="user_id",
        ts="timestamp", value="value", id_col="event_id",
    )
    q["events_wow_growth"] = lambda spark, sf: analytics.wow_growth(
        testdata.events_metric(spark, sf), bucket_ms=604800000
    )
    q["events_hourly_profile"] = lambda spark, sf: analytics.hourly_profile(
        testdata.events_metric(spark, sf)
    )
    q["events_stickiness"] = lambda spark, sf: analytics.stickiness(
        testdata.events_metric(spark, sf), bucket_ms=86400000,
        window_buckets=30,
    )
    q["win_order_gaps"] = lambda spark, sf: analytics.order_gaps(
        testdata.table(spark, sf, "orders").select(
            "o_custkey", "o_orderkey",
            # o_orderdate is TIMESTAMP_NTZ; session tz is UTC
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 1000"
            ).alias("odate_ms"),
        ),
        key="o_custkey", seq_col="odate_ms", id_col="o_orderkey",
    )

    def _rfm(spark: SparkSession, sf: str) -> DataFrame:
        o_ = testdata.table(spark, sf, "orders").select(
            "o_custkey",
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 1000"
            ).alias("__ots"),
            "o_totalprice",
        )
        # "now" = the data's own max order instant: deterministic across
        # runs/engines, unlike wall-clock now (one tiny driver scalar,
        # the psi bounds discipline)
        now_ms = int(o_.agg(F.max("__ots")).first()[0])
        return analytics.rfm_segments(
            o_, cust="o_custkey", ts_col="__ots", amount="o_totalprice",
            now_ms=now_ms, nseg=5,
        )

    q["events_rfm"] = _rfm

    def _events_concurrency(spark, sf):
        sess = temporal_join.sessionize(
            testdata.events_metric(spark, sf).select(
                "user_id", "timestamp", "event_id"
            ),
            key="user_id", ts="timestamp", gap_ms=14_400_000,
            order_tie="event_id",
        )
        return temporal_join.interval_concurrency(
            sess, start="session_start", end="session_end"
        )

    q["events_concurrency"] = _events_concurrency
    q["events_new_vs_returning"] = lambda spark, sf: analytics.new_vs_returning(
        testdata.events_metric(spark, sf)
    )
    q["events_funnel_timing"] = lambda spark, sf: analytics.funnel_step_timing(
        testdata.events_metric(spark, sf),
        steps=["view", "click", "purchase"],
    )
    q["events_pareto_share"] = lambda spark, sf: analytics.pareto_share(
        testdata.table(spark, sf, "events")
    )
    q["events_conversion_latency"] = lambda spark, sf: analytics.conversion_latency(
        testdata.events_metric(spark, sf)
    )
    q["events_dow_hour"] = lambda spark, sf: analytics.dow_hour_profile(
        testdata.events_metric(spark, sf)
    )
    q["events_interevent_exp"] = lambda spark, sf: analytics.interevent_exponential(
        testdata.events_metric(spark, sf)
    )
    q["events_attribution"] = lambda spark, sf: analytics.attribution_touch(
        testdata.events_metric(spark, sf)
    )
    q["events_cohort_ltv"] = lambda spark, sf: analytics.cohort_ltv(
        testdata.events_metric(spark, sf)
    )
    q["events_rolling_wau"] = lambda spark, sf: analytics.rolling_active_users(
        testdata.events_metric(spark, sf), window_days=7
    )


def register_oracles(o):
    o["events_json_stats"] = """
WITH x AS (SELECT event_type,
                  cast(json_extract_string(props, '$.k') AS bigint) AS v
           FROM events WHERE event_type IS NOT NULL)
SELECT event_type, cast(count(*) AS bigint) AS n,
       round(avg(v), 6) AS avg_val,
       min(v) AS min_val, max(v) AS max_val
FROM x WHERE v IS NOT NULL GROUP BY 1
"""
    o["events_wow_growth"] = f"""
{M},
per AS (SELECT event_type,
               (timestamp // 604800000) * 604800000 AS bucket_start,
               cast(count(*) AS bigint) AS n
        FROM m WHERE event_type IS NOT NULL AND timestamp IS NOT NULL
        GROUP BY 1, 2)
SELECT event_type, bucket_start, n,
       lag(n) OVER (PARTITION BY event_type ORDER BY bucket_start)
         AS prev_n,
       round((n - lag(n) OVER (PARTITION BY event_type
                               ORDER BY bucket_start))
             / lag(n) OVER (PARTITION BY event_type
                            ORDER BY bucket_start) * 100.0, 6)
         AS growth_pct
FROM per
"""
    o["events_hourly_profile"] = f"""
{M},
per AS (SELECT event_type,
               cast((timestamp % 86400000) // 3600000 AS int) AS hour,
               cast(count(*) AS bigint) AS n
        FROM m WHERE event_type IS NOT NULL AND timestamp IS NOT NULL
        GROUP BY 1, 2),
tot AS (SELECT event_type, sum(n) AS t FROM per GROUP BY 1)
SELECT per.event_type, hour, n, round(n / cast(t.t AS double), 6) AS share
FROM per JOIN tot t USING (event_type)
"""
    o["events_load_factor"] = f"""
{M},
per AS (SELECT event_type, (timestamp // 3600000) * 3600000 AS b,
               cast(count(*) AS bigint) AS c
        FROM m WHERE event_type IS NOT NULL AND timestamp IS NOT NULL
        GROUP BY 1, 2),
pk AS (SELECT event_type, c AS peak_count, b AS peak_bucket,
              row_number() OVER (PARTITION BY event_type
                                 ORDER BY c DESC, b ASC) AS rn
       FROM per),
ag AS (SELECT event_type, cast(count(*) AS bigint) AS n_buckets,
              round(avg(c), 6) AS mean_per_bucket,
              max(c) AS peak_count,
              round(max(c) / avg(c), 6) AS load_factor
       FROM per GROUP BY 1)
SELECT ag.event_type, ag.n_buckets, ag.mean_per_bucket, ag.peak_count,
       cast(pk.peak_bucket AS bigint) AS peak_bucket, ag.load_factor
FROM ag JOIN pk ON ag.event_type = pk.event_type AND pk.rn = 1
"""
    o["win_running_records"] = f"""
{M},
d AS (SELECT user_id, timestamp, event_id, value FROM m
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
r AS (SELECT user_id, timestamp, value,
             max(value) OVER (PARTITION BY user_id
                              ORDER BY timestamp, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pm
      FROM d),
bt AS (SELECT user_id, value AS best, timestamp AS best_ts,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY value DESC, timestamp ASC) AS rn
       FROM d)
SELECT r.user_id, cast(count(*) AS bigint) AS n,
       cast(sum(CASE WHEN pm IS NULL OR value > pm THEN 1 ELSE 0 END)
         AS bigint) AS n_records,
       round(max(bt.best), 6) AS best,
       cast(max(bt.best_ts) AS bigint) AS best_ts
FROM r JOIN bt ON r.user_id = bt.user_id AND bt.rn = 1
GROUP BY 1
"""
    o["win_time_in_state"] = f"""
{M},
d AS (SELECT event_type,
             lead(timestamp) OVER (PARTITION BY user_id
                                   ORDER BY timestamp, event_id)
             - timestamp AS dur
      FROM m WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
per AS (SELECT event_type, cast(sum(dur) AS bigint) AS total_ms,
               cast(count(dur) AS bigint) AS n_intervals
        FROM d WHERE dur IS NOT NULL GROUP BY 1),
t AS (SELECT cast(sum(total_ms) AS bigint) AS tt FROM per)
SELECT event_type, total_ms, n_intervals,
       round(total_ms / cast(t.tt AS double), 6) AS share
FROM per, t
"""
    o["events_growth_accounting"] = f"""
{M},
ub AS (SELECT DISTINCT user_id AS u,
              (timestamp // 604800000) * 604800000 AS b
       FROM m WHERE user_id IS NOT NULL AND timestamp IS NOT NULL),
f AS (SELECT u, min(b) AS fb FROM ub GROUP BY 1)
SELECT b AS bucket_start, cast(count(*) AS bigint) AS n_active,
       cast(sum(CASE WHEN b = fb THEN 1 ELSE 0 END) AS bigint) AS n_new,
       cast(sum(CASE WHEN b <> fb THEN 1 ELSE 0 END) AS bigint)
         AS n_returning
FROM ub JOIN f USING (u) GROUP BY 1
"""
    o["events_mcnemar"] = f"""
WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
per AS (SELECT user_id,
               max(CASE WHEN t < {MCNEMAR_SPLIT_MS} THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN t >= {MCNEMAR_SPLIT_MS} THEN 1 ELSE 0 END) AS p2
        FROM e GROUP BY 1),
a AS (SELECT cast(count(*) AS bigint) AS n_users,
             cast(sum(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END)
               AS bigint) AS n_both,
             cast(sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
               AS bigint) AS n_only_before,
             cast(sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)
               AS bigint) AS n_only_after,
             cast(sum(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END)
               AS bigint) AS n_neither
      FROM per)
SELECT n_users, n_both, n_only_before, n_only_after, n_neither,
       round((abs(n_only_before - n_only_after) - 1)
             * (abs(n_only_before - n_only_after) - 1)
             / cast(n_only_before + n_only_after AS double), 6) AS chi2
FROM a
"""
    o["events_entropy_rate"] = f"""
{M},
s AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY timestamp, event_id) AS prev_type,
             event_type AS next_type
      FROM m),
c AS (SELECT prev_type, next_type, cast(count(*) AS bigint) AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT prev_type, cast(sum(n) AS bigint) AS rt FROM c GROUP BY 1),
al AS (SELECT cast(sum(rt) AS bigint) AS steps,
              cast(count(*) AS bigint) AS nt FROM tot),
j AS (SELECT c.n, tot.rt, al.steps, al.nt
      FROM c JOIN tot USING (prev_type) CROSS JOIN al)
SELECT max(steps) AS n_steps, max(nt) AS n_types,
       round(-sum((rt / cast(steps AS double))
                  * (n / cast(rt AS double))
                  * ln(n / cast(rt AS double))), 6) AS entropy_rate,
       round(ln(cast(max(nt) AS double)), 6) AS max_entropy
FROM j
"""
    o["events_sessionize"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, value, event_id FROM events),
lagd AS (SELECT *, lag(timestamp) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id) AS prev FROM e),
flag AS (SELECT *, CASE WHEN prev IS NULL OR timestamp - prev > 14400000
                        THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (SELECT *, CAST(sum(new_s) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id FROM flag)
SELECT user_id, session_id, min(timestamp) AS session_start,
       max(timestamp) AS session_end, count(*) AS n_events,
       round(sum(value), 3) AS sum_value
FROM sess GROUP BY 1, 2
"""
    o["win_topk_per_group"] = """
WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
SELECT o_custkey, o_orderkey, o_totalprice, cast(rn AS int) AS rn
FROM r WHERE rn <= 2
"""
    o["win_moving_agg"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, value FROM events)
SELECT user_id, timestamp, event_id, value,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY timestamp, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY timestamp, event_id
                              ROWS UNBOUNDED PRECEDING), 3) AS cum_sum,
       cast(row_number() OVER (PARTITION BY user_id ORDER BY timestamp, event_id)
            AS int) AS rn
FROM e
"""
    o["events_funnel"] = """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts FROM events),
s1 AS (SELECT user_id, min(ts) AS ts_signup FROM e
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(ts) AS ts_click FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > ts_signup GROUP BY 1),
s3 AS (SELECT e.user_id, min(ts) AS ts_purchase FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > ts_click GROUP BY 1)
SELECT s1.user_id, ts_signup, ts_click, ts_purchase
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""
    o["events_funnel_windowed"] = """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts FROM events),
s1 AS (SELECT user_id, min(ts) AS ts_signup FROM e
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(ts) AS ts_click FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND ts > ts_signup
         AND ts <= ts_signup + 604800000 GROUP BY 1),
s3 AS (SELECT e.user_id, min(ts) AS ts_purchase FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND ts > ts_click
         AND ts <= ts_click + 604800000 GROUP BY 1)
SELECT s1.user_id, ts_signup, ts_click, ts_purchase
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""
    o["events_active_users"] = f"""
{M},
p AS (SELECT DISTINCT user_id, timestamp // 86400000 AS b FROM m),
d AS (SELECT b, count(*) AS dau FROM p GROUP BY b),
bounds AS (SELECT max(b) AS hi FROM p),
c AS (SELECT DISTINCT p.user_id, u.b2 AS b
      FROM p, bounds, unnest(generate_series(p.b, least(p.b + 6, bounds.hi))) u(b2)),
w AS (SELECT b, count(*) AS wau FROM c GROUP BY b)
SELECT w.b * 86400000 AS bucket_start,
       coalesce(dau, 0) AS dau, wau
FROM w LEFT JOIN d USING (b)
"""
    o["events_transitions"] = f"""
{M},
s AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY timestamp, event_id) AS prev_type,
             event_type AS next_type
      FROM m)
SELECT prev_type, next_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""
    o["events_markov"] = f"""
{M},
s AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY timestamp, event_id) AS prev_type,
             event_type AS next_type
      FROM m),
c AS (SELECT prev_type, next_type, cast(count(*) AS bigint) AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type AS t FROM events
       WHERE event_type IS NOT NULL),
nv AS (SELECT cast(count(*) AS double) AS v FROM ty),
tot AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
SELECT g1.t AS prev_type, g2.t AS next_type,
       coalesce(c.n, 0) AS n,
       round((coalesce(c.n, 0) + 1.0)
             / (coalesce(tot.tot, 0) + 1.0 * nv.v), 6) AS p
FROM ty g1 CROSS JOIN ty g2 CROSS JOIN nv
LEFT JOIN c ON g1.t = c.prev_type AND g2.t = c.next_type
LEFT JOIN tot ON g1.t = tot.prev_type
"""
    # KM: at_risk = N - cum_before over distinct durations; survival =
    # exp of the running sum of ln(1 - d/n); a final all-events row is
    # the only ln(0) case, guarded to 0 exactly as the Spark side
    o["events_kaplan_meier"] = """
WITH o AS (SELECT o_custkey AS s, cast(o_orderdate AS date) AS d
           FROM orders
           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
mx AS (SELECT max(d) AS m FROM o),
seq AS (SELECT s, d, lead(d) OVER (PARTITION BY s ORDER BY d) AS nd
        FROM o),
dur AS (SELECT CASE WHEN nd IS NOT NULL THEN date_diff('day', d, nd)
                    ELSE date_diff('day', d, (SELECT m FROM mx))
               END AS t,
               CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM seq),
g AS (SELECT t, cast(sum(e) AS bigint) AS de,
             cast(count(*) AS bigint) AS ct
      FROM dur GROUP BY 1),
tt AS (SELECT sum(ct) AS n FROM g),
c AS (SELECT t, de, ct,
             sum(ct) OVER (ORDER BY t) - ct AS cum_before FROM g),
km AS (SELECT t, de,
              cast((SELECT n FROM tt) - cum_before AS bigint) AS at_risk,
              exp(sum(CASE WHEN de < (SELECT n FROM tt) - cum_before
                           THEN ln(1 - de / cast((SELECT n FROM tt)
                                                 - cum_before AS double))
                           ELSE 0 END) OVER (ORDER BY t)) AS surv
       FROM c)
SELECT t, at_risk AS n_risk, de AS n_events,
       round(CASE WHEN de = at_risk THEN 0.0 ELSE surv END, 6) AS survival
FROM km WHERE de > 0
"""
    o["events_retention"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp FROM events),
f AS (SELECT user_id, min(timestamp // 604800000) AS cohort FROM e GROUP BY 1),
a AS (SELECT DISTINCT user_id, timestamp // 604800000 AS b FROM e)
SELECT cohort * 604800000 AS cohort_start, b - cohort AS "offset",
       count(*) AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2
"""
    o["events_gone_quiet"] = """
WITH o AS (SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS t
           FROM orders
           WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
mx AS (SELECT max(t) AS m FROM o),
per AS (SELECT user_id, max(t) AS last_ts FROM o GROUP BY 1)
SELECT user_id, last_ts, mx.m - last_ts AS silent_ms_actual
FROM per, mx
WHERE last_ts < mx.m - 15552000000
  AND last_ts >= mx.m - 15552000000 - 31536000000
"""
    o["events_user_overlap"] = """
WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
sz AS (SELECT t, cast(count(*) AS bigint) AS sz FROM tu GROUP BY 1),
p AS (SELECT a.t AS type_a, b.t AS type_b,
             cast(count(*) AS bigint) AS n_both
      FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
SELECT type_a, type_b, n_both,
       round(n_both / cast(sa.sz + sb.sz - n_both AS double), 6)
         AS jaccard
FROM p JOIN sz sa ON p.type_a = sa.t JOIN sz sb ON p.type_b = sb.t
"""
    o["events_poisson_check"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS t FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
gp AS (SELECT cast(t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
              AS double) AS g
       FROM e),
gg AS (SELECT g FROM gp WHERE g IS NOT NULL),
st AS (SELECT cast(count(*) AS bigint) AS n, avg(g) AS mg FROM gg),
c AS (SELECT g, cast(count(*) AS bigint) AS ct FROM gg GROUP BY 1),
cc AS (SELECT g, ct, sum(ct) OVER (ORDER BY g) AS cum FROM c)
SELECT max(st.n) AS n_gaps, round(1.0 / max(st.mg), 6) AS lambda_hat,
       round(max(greatest(
          abs(cum / cast(st.n AS double)
              - (1.0 - exp(-(1.0 / st.mg) * g))),
          abs((cum - ct) / cast(st.n AS double)
              - (1.0 - exp(-(1.0 / st.mg) * g))))), 6) AS ks_dist
FROM cc, st
"""
    o["win_latest_percentile"] = f"""
{M},
d AS (SELECT user_id, value, timestamp, event_id FROM m
      WHERE user_id IS NOT NULL AND value IS NOT NULL),
r AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY timestamp DESC, event_id DESC)
               AS rn
      FROM d),
lv AS (SELECT user_id, value AS lastv FROM r WHERE rn = 1)
SELECT d.user_id, cast(count(*) AS bigint) AS n,
       round(max(lv.lastv), 6) AS last_value,
       round((sum(CASE WHEN d.value < lv.lastv THEN 1 ELSE 0 END)
              + (sum(CASE WHEN d.value = lv.lastv THEN 1 ELSE 0 END)
                 + 1) / 2.0)
             / count(*), 6) AS pct_rank
FROM d JOIN lv USING (user_id) GROUP BY 1
"""
    o["events_paths"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id, event_type
           FROM events),
lagd AS (SELECT *, lag(timestamp) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id) AS prev
         FROM e),
flag AS (SELECT *, CASE WHEN prev IS NULL OR timestamp - prev > 14400000
                        THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (SELECT *, sum(new_s) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id
            ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flag),
p AS (SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY timestamp, event_id)
               AS path
      FROM sess GROUP BY 1, 2)
SELECT path, cast(count(*) AS bigint) AS n_sessions
FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20
"""
    o["events_stickiness"] = f"""
{M},
p AS (SELECT DISTINCT user_id, timestamp // 86400000 AS b FROM m),
d AS (SELECT b, count(*) AS dau FROM p GROUP BY b),
bounds AS (SELECT max(b) AS hi FROM p),
c AS (SELECT DISTINCT p.user_id, u.b2 AS b
      FROM p, bounds, unnest(generate_series(p.b, least(p.b + 29, bounds.hi))) u(b2)),
w AS (SELECT b, count(*) AS mau FROM c GROUP BY b)
SELECT w.b * 86400000 AS bucket_start,
       coalesce(dau, 0) AS dau, mau,
       round(coalesce(dau, 0) / mau, 6) AS stickiness
FROM w LEFT JOIN d USING (b)
"""
    o["events_concurrency"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id
           FROM events),
lagd AS (SELECT *, lag(timestamp) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id) AS prev
         FROM e),
flag AS (SELECT *, CASE WHEN prev IS NULL OR timestamp - prev > 14400000
                        THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (SELECT *, CAST(sum(new_s) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
         FROM flag),
s2 AS (SELECT user_id, session_id, min(timestamp) AS ss,
              max(timestamp) AS se
       FROM sess GROUP BY 1, 2),
deltas AS (SELECT ss AS t, 1 AS d FROM s2
           UNION ALL SELECT se + 1, -1 FROM s2),
per AS (SELECT t, sum(d) AS d FROM deltas GROUP BY 1),
run AS (SELECT t, sum(d) OVER (ORDER BY t) AS c FROM per),
n AS (SELECT cast(count(*) AS bigint) AS n_intervals FROM s2)
SELECT cast(c AS bigint) AS peak_concurrent, t AS at_ts, n_intervals
FROM run, n ORDER BY c DESC, t ASC LIMIT 1
"""
    o["win_longest_streaks"] = f"""
{M},
d AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY timestamp, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY timestamp, event_id) AS isl
      FROM m WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
r AS (SELECT user_id, event_type, isl, cast(count(*) AS bigint) AS len
      FROM d GROUP BY 1, 2, 3)
SELECT event_type, max(len) AS max_streak,
       cast(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS bigint)
         AS n_streaks,
       cast(count(DISTINCT CASE WHEN len >= 3 THEN user_id END) AS bigint)
         AS n_users
FROM r GROUP BY 1
"""
    o["events_rfm"] = """
WITH o AS (SELECT o_custkey, epoch_ms(o_orderdate) AS ots, o_totalprice
           FROM orders),
nowt AS (SELECT max(ots) AS nw FROM o),
p AS (SELECT o_custkey, max(nw) - max(ots) AS recency_ms,
             count(*) AS frequency,
             round(sum(o_totalprice), 3) AS monetary
      FROM o, nowt GROUP BY o_custkey),
e AS (SELECT
        list_transform(quantile_cont(recency_ms, [0.2, 0.4, 0.6, 0.8]),
                       x -> round(x, 6)) AS er,
        list_transform(quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]),
                       x -> round(x, 6)) AS ef,
        list_transform(quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]),
                       x -> round(x, 6)) AS em
      FROM p),
s AS (SELECT o_custkey, recency_ms, frequency, monetary,
             cast(5 - len(list_filter(er, x -> recency_ms > x)) AS int)
                 AS r_score,
             cast(1 + len(list_filter(ef, x -> frequency > x)) AS int)
                 AS f_score,
             cast(1 + len(list_filter(em, x -> monetary > x)) AS int)
                 AS m_score
      FROM p, e)
SELECT o_custkey, recency_ms, frequency, monetary, r_score, f_score,
       m_score, cast(r_score * 100 + f_score * 10 + m_score AS int) AS rfm
FROM s
"""
    o["win_order_gaps"] = """
WITH d AS (SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms
           FROM orders)
SELECT o_custkey, o_orderkey, odate_ms,
       lag(odate_ms) OVER w AS prev_seq,
       odate_ms - lag(odate_ms) OVER w AS gap,
       cast(row_number() OVER w AS int) AS rn
FROM d WINDOW w AS (PARTITION BY o_custkey ORDER BY odate_ms, o_orderkey)
"""
    o["events_new_vs_returning"] = """
WITH ub AS (SELECT DISTINCT user_id AS u,
                   (epoch_ms(ts) // 86400000) * 86400000 AS b
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
fs AS (SELECT u, min(b) AS fb FROM ub GROUP BY u)
SELECT ub.b AS bucket_start, cast(count(*) AS bigint) AS n_active,
       sum(CASE WHEN ub.b = fs.fb THEN 1 ELSE 0 END)::BIGINT AS n_new,
       (count(*) - sum(CASE WHEN ub.b = fs.fb THEN 1 ELSE 0 END))::BIGINT
         AS n_returning,
       round(sum(CASE WHEN ub.b = fs.fb THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 6) AS new_share
FROM ub JOIN fs ON ub.u = fs.u
GROUP BY ub.b
"""
    o["events_funnel_timing"] = """
WITH per AS (SELECT user_id,
                    min(CASE WHEN event_type = 'view'
                        THEN epoch_ms(ts) END) AS t0,
                    min(CASE WHEN event_type = 'click'
                        THEN epoch_ms(ts) END) AS t1,
                    min(CASE WHEN event_type = 'purchase'
                        THEN epoch_ms(ts) END) AS t2
             FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
             GROUP BY user_id),
s1 AS (SELECT cast(t1 - t0 AS DOUBLE) AS lat FROM per
       WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0),
s2 AS (SELECT cast(t2 - t1 AS DOUBLE) AS lat FROM per
       WHERE t1 IS NOT NULL AND t2 IS NOT NULL AND t2 >= t1)
SELECT 'view' AS step_from, 'click' AS step_to,
       cast(count(*) AS bigint) AS n_users,
       round(quantile_cont(lat, 0.5), 6) AS p50_ms,
       round(quantile_cont(lat, 0.9), 6) AS p90_ms,
       round(avg(lat), 6) AS mean_ms
FROM s1
UNION ALL
SELECT 'click', 'purchase', cast(count(*) AS bigint),
       round(quantile_cont(lat, 0.5), 6), round(quantile_cont(lat, 0.9), 6),
       round(avg(lat), 6)
FROM s2
"""
    o["events_pareto_share"] = """
WITH per AS (SELECT user_id, cast(count(*) AS bigint) AS n FROM events
             WHERE user_id IS NOT NULL GROUP BY user_id),
rk AS (SELECT n,
              row_number() OVER (ORDER BY n DESC, user_id ASC) AS r,
              sum(n) OVER (ORDER BY n DESC, user_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
       FROM per),
tot AS (SELECT cast(count(*) AS bigint) AS n_keys,
               sum(n)::BIGINT AS n_total
        FROM per)
SELECT n_keys, n_total,
       round(max(CASE WHEN r = ceil(n_keys * 0.1) THEN cum END)
             / n_total::DOUBLE, 6) AS top10_share,
       round(max(CASE WHEN r = ceil(n_keys * 0.2) THEN cum END)
             / n_total::DOUBLE, 6) AS top20_share
FROM rk, tot GROUP BY n_keys, n_total
"""
    o["events_conversion_latency"] = """
WITH m AS (SELECT user_id, event_type, epoch_ms(ts) AS t FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
per AS (SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN t END) AS t0
        FROM m GROUP BY user_id),
conv AS (SELECT m.user_id,
                cast(min(m.t) - any_value(per.t0) AS DOUBLE) AS lat
         FROM m JOIN per ON m.user_id = per.user_id
         WHERE m.event_type = 'purchase' AND per.t0 IS NOT NULL
           AND m.t >= per.t0
         GROUP BY m.user_id)
SELECT cast(count(*) AS bigint) AS n_converted,
       round(avg(lat), 6) AS mean_ms,
       round(quantile_cont(lat, 0.5), 6) AS p50_ms,
       round(quantile_cont(lat, 0.9), 6) AS p90_ms,
       round(quantile_cont(lat, 0.99), 6) AS p99_ms
FROM conv
"""
    o["events_dow_hour"] = """
WITH base AS (SELECT cast(((epoch_ms(ts) // 86400000) + 4) % 7 AS int)
                AS dow,
              cast((epoch_ms(ts) // 3600000) % 24 AS int) AS hour
              FROM events WHERE ts IS NOT NULL),
grid AS (SELECT dow, hour, cast(count(*) AS bigint) AS n
         FROM base GROUP BY dow, hour),
rm AS (SELECT dow, sum(n) AS nr FROM grid GROUP BY dow),
cm AS (SELECT hour, sum(n) AS nc FROM grid GROUP BY hour),
tt AS (SELECT sum(n)::DOUBLE AS nt FROM grid)
SELECT grid.dow, grid.hour, n,
       round(nr * nc / nt, 6) AS expected,
       round((n - nr * nc / nt) * (n - nr * nc / nt)
             / (nr * nc / nt), 6) AS chi2_cell
FROM grid JOIN rm ON grid.dow = rm.dow JOIN cm ON grid.hour = cm.hour, tt
"""
    o["events_interevent_exp"] = """
WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS t, event_id
           FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT k,
             cast(t - lag(t) OVER (PARTITION BY k ORDER BY t, event_id)
                  AS DOUBLE) AS gp
      FROM e),
gaps AS (SELECT k, gp FROM g WHERE gp IS NOT NULL),
st AS (SELECT k, cast(count(*) AS bigint) AS n_gaps, avg(gp) AS mu
       FROM gaps GROUP BY k),
rk AS (SELECT gaps.k, n_gaps, mu, gp,
              row_number() OVER (PARTITION BY gaps.k ORDER BY gp)::DOUBLE AS i
       FROM gaps JOIN st ON gaps.k = st.k),
d AS (SELECT k, n_gaps, mu,
             greatest(i / n_gaps - round(1.0 - exp(-gp / mu), 6),
                      round(1.0 - exp(-gp / mu), 6) - (i - 1) / n_gaps) AS dd
      FROM rk)
SELECT k AS event_type, any_value(n_gaps) AS n_gaps,
       round(any_value(mu), 6) AS mean_gap_ms,
       round(1000.0 / any_value(mu), 6) AS lambda_per_s,
       round(max(dd), 6) AS ks_stat
FROM d GROUP BY k
"""
    o["events_attribution"] = """
WITH m AS (SELECT user_id, event_type, epoch_ms(ts) AS t, event_id
           FROM events),
conv AS (SELECT user_id, min(t) AS conv_ts FROM m
         WHERE event_type = 'purchase' GROUP BY user_id),
pre AS (SELECT m.user_id, m.event_type, m.t, m.event_id
        FROM m JOIN conv ON m.user_id = conv.user_id
        WHERE m.event_type <> 'purchase' AND m.t < conv.conv_ts),
rk AS (SELECT user_id, event_type,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS rf,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY t DESC, event_id DESC) AS rl
       FROM pre),
firsts AS (SELECT event_type AS channel, cast(count(*) AS bigint)
             AS n_first_touch
           FROM rk WHERE rf = 1 GROUP BY 1),
lasts AS (SELECT event_type AS channel, cast(count(*) AS bigint)
            AS n_last_touch
          FROM rk WHERE rl = 1 GROUP BY 1)
SELECT coalesce(firsts.channel, lasts.channel) AS channel,
       coalesce(n_first_touch, 0) AS n_first_touch,
       coalesce(n_last_touch, 0) AS n_last_touch
FROM firsts FULL JOIN lasts ON firsts.channel = lasts.channel
"""
    o["events_cohort_ltv"] = """
WITH m AS (SELECT epoch_ms(ts) AS timestamp, user_id, value::DOUBLE AS v
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
ev AS (SELECT timestamp // 604800000 AS w, user_id AS u, v FROM m),
first AS (SELECT u, min(w) AS cohort FROM ev GROUP BY u),
sizes AS (SELECT cohort, count(*) AS cohort_users FROM first GROUP BY cohort),
cells AS (SELECT f.cohort, e.w - f.cohort AS week_index, sum(e.v) AS pv
          FROM ev e JOIN first f USING (u) GROUP BY 1, 2)
SELECT c.cohort, c.week_index, s.cohort_users,
       round(c.pv, 3) AS period_value,
       round(sum(c.pv) OVER (PARTITION BY c.cohort ORDER BY c.week_index
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / s.cohort_users, 6) AS cum_value_per_user
FROM cells c JOIN sizes s USING (cohort)
ORDER BY c.cohort, c.week_index
"""
    o["events_rolling_wau"] = """
WITH m AS (SELECT epoch_ms(ts) AS timestamp, user_id FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
pairs AS (SELECT DISTINCT timestamp // 86400000 AS day, user_id AS u FROM m),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM pairs),
contrib AS (SELECT DISTINCT p.u,
                   unnest(generate_series(p.day,
                          least(p.day + 6, s.hi))) AS d
            FROM pairs p CROSS JOIN span s)
SELECT d AS day, count(*) AS active_users
FROM contrib GROUP BY d ORDER BY day
"""
    o["events_session_depth"] = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS timestamp, event_id FROM events),
lagd AS (SELECT *, lag(timestamp) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id) AS prev FROM e),
flag AS (SELECT *, CASE WHEN prev IS NULL OR timestamp - prev > 14400000
                        THEN 1 ELSE 0 END AS new_s FROM lagd),
sess AS (SELECT *, CAST(sum(new_s) OVER
           (PARTITION BY user_id ORDER BY timestamp, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id FROM flag),
per AS (SELECT user_id, session_id, count(*) AS n_events
        FROM sess GROUP BY 1, 2),
hist AS (SELECT cast(least(n_events, 20) AS int) AS depth,
                count(*)::BIGINT AS n_sessions
         FROM per GROUP BY 1),
tot AS (SELECT sum(n_sessions) AS t FROM hist)
SELECT depth, n_sessions,
       round(n_sessions / nullif(t::DOUBLE, 0), 6) AS share
FROM hist CROSS JOIN tot ORDER BY depth
"""
