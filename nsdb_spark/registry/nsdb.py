"""nsdb registry entries — split from the monolithic entry_queries.py
(round 7). Same content, same order; aggregated by registry.__init__."""
from __future__ import annotations

from .common import (  # noqa: F401
    M, _nsdb, _temporal_multi_oracle, _temporal_oracle,
)


def register(q):

    # --- NSDb query classes over the events metric ---
    q["nsdb_scan_order_limit"] = _nsdb("select * from events order by event_id limit 50")
    q["nsdb_projection_filter"] = _nsdb(
        "select event_id, event_type from events "
        "where value >= 150 and event_type = purchase order by event_id limit 100"
    )
    q["nsdb_range_between"] = _nsdb(
        "select * from events where timestamp in (1704844800000, 1705708800000) "
        "order by event_id limit 200"
    )
    q["nsdb_like_wildcard"] = _nsdb(
        "select * from events where event_type like '$ror' order by event_id limit 100"
    )
    # NOT's scope is bounded with parens: unparenthesized NOT is greedy
    # (reference parity) and would negate the whole condition
    q["nsdb_bool_logic"] = _nsdb(
        "select * from events where (not event_type = error) and value < 50 "
        "or value >= 950 order by event_id limit 500"
    )
    q["nsdb_distinct"] = _nsdb("select distinct event_type from events")
    q["nsdb_global_aggs"] = _nsdb(
        "select count(*), count(distinct event_type), sum(value), min(value), "
        "max(value), avg(value) from events",
        rounds={"sum_value": 3, "avg_value": 3},
    )
    q["nsdb_mixed_plain_agg"] = _nsdb(
        "select event_type, count(*), sum(value) from events "
        "where timestamp >= 1705708800000 order by timestamp limit 20",
        rounds={"sum_value": 3},
    )
    q["nsdb_groupby_sum"] = _nsdb(
        "select sum(value) from events group by event_type", rounds={"sum_value": 3}
    )
    q["nsdb_groupby_count"] = _nsdb(
        "select count(*) from events group by event_type order by value desc"
    )
    q["nsdb_groupby_min"] = _nsdb("select min(value) from events group by event_type")
    q["nsdb_groupby_max"] = _nsdb("select max(value) from events group by event_type")
    q["nsdb_groupby_avg"] = _nsdb(
        "select avg(value) from events group by event_type", rounds={"avg_value": 3}
    )
    q["nsdb_groupby_first"] = _nsdb("select first(value) from events group by event_type")
    q["nsdb_groupby_last"] = _nsdb("select last(value) from events group by event_type")
    q["nsdb_groupby_numeric_tag"] = _nsdb("select count(*) from events group by user_id")
    q["nsdb_groupby_count_distinct"] = _nsdb(
        "select count(distinct *) from events group by event_type"
    )
    q["nsdb_temporal_count"] = _nsdb("select count(*) from events group by interval 1d")
    q["nsdb_temporal_sum"] = _nsdb(
        "select sum(value) from events group by interval 12h", rounds={"sum_value": 3}
    )
    q["nsdb_temporal_avg"] = _nsdb(
        "select avg(value) from events group by interval 1d", rounds={"avg_value": 3}
    )
    q["nsdb_temporal_count_distinct"] = _nsdb(
        "select count(distinct event_type) from events group by interval 2d"
    )
    q["nsdb_temporal_limit"] = _nsdb(
        "select count(*) from events group by interval 1d limit 5"
    )
    q["nsdb_temporal_min"] = _nsdb("select min(value) from events group by interval 7d")
    q["nsdb_temporal_max"] = _nsdb("select max(value) from events group by interval 7d")
    q["nsdb_temporal_since"] = _nsdb(
        "select count(*) from events group by interval 1d since 10 d",
        relative_now=True,
    )
    # disjoint WHERE intervals → one backward-aligned bucket axis PER
    # interval (TimeRangeManager.scala:102-124), no zero-buckets in the gap
    q["nsdb_temporal_not_range"] = _nsdb(
        "select count(*) from events "
        "where not timestamp in (1705017600000, 1705622400000) "
        "group by interval 2d"
    )
    q["nsdb_temporal_or_ranges"] = _nsdb(
        "select sum(value) from events "
        "where timestamp in (1704067200000, 1704672000000) "
        "or timestamp in (1705276800000, 1705881600000) "
        "group by interval 3d",
        rounds={"sum_value": 3},
    )
    q["nsdb_relative_time"] = _nsdb(
        "select count(*) from events where timestamp >= now - 10 d", relative_now=True
    )
    q["nsdb_nullable_predicates"] = _nsdb(
        "select * from events where value is not null and props is not null "
        "and value >= 480 order by event_id limit 100"
    )
    q["nsdb_like_infix_count"] = _nsdb(
        "select count(*) from events where props like '$: 1$'"
    )
    q["nsdb_distinct_order"] = _nsdb(
        "select distinct user_id from events order by user_id desc limit 20"
    )


def register_oracles(o):
    o["nsdb_scan_order_limit"] = f"{M} SELECT * FROM m ORDER BY event_id LIMIT 50"
    o["nsdb_projection_filter"] = (
        f"{M} SELECT timestamp, value, event_id, event_type FROM m "
        "WHERE value >= 150 AND event_type = 'purchase' ORDER BY event_id LIMIT 100"
    )
    o["nsdb_range_between"] = (
        f"{M} SELECT * FROM m WHERE timestamp BETWEEN 1704844800000 AND 1705708800000 "
        "ORDER BY event_id LIMIT 200"
    )
    o["nsdb_like_wildcard"] = (
        f"{M} SELECT * FROM m WHERE event_type LIKE '%ror' ORDER BY event_id LIMIT 100"
    )
    o["nsdb_bool_logic"] = (
        f"{M} SELECT * FROM m WHERE (NOT event_type = 'error') "
        "AND (value < 50 OR value >= 950) ORDER BY event_id LIMIT 500"
    )
    o["nsdb_distinct"] = "SELECT DISTINCT event_type FROM events"
    o["nsdb_global_aggs"] = (
        "SELECT count(*) AS count_value, "
        "count(DISTINCT event_type) AS count_distinct_event_type, "
        "round(sum(value), 3) AS sum_value, min(value) AS min_value, "
        "max(value) AS max_value, round(avg(value), 3) AS avg_value FROM events"
    )
    o["nsdb_mixed_plain_agg"] = f"""
{M},
f AS (SELECT * FROM m WHERE timestamp >= 1705708800000),
a AS (SELECT least(count(*), 20) AS count_value, round(sum(value), 3) AS sum_value FROM f)
SELECT f.timestamp, f.value, f.event_type, a.count_value, a.sum_value
FROM f, a ORDER BY f.timestamp LIMIT 20
"""
    o["nsdb_groupby_sum"] = (
        "SELECT event_type, round(sum(value), 3) AS sum_value FROM events GROUP BY event_type"
    )
    o["nsdb_groupby_count"] = (
        "SELECT event_type, count(*) AS count_value FROM events GROUP BY event_type"
    )
    o["nsdb_groupby_min"] = (
        "SELECT event_type, min(value) AS min_value FROM events GROUP BY event_type"
    )
    o["nsdb_groupby_max"] = (
        "SELECT event_type, max(value) AS max_value FROM events GROUP BY event_type"
    )
    o["nsdb_groupby_avg"] = (
        "SELECT event_type, round(avg(value), 3) AS avg_value FROM events GROUP BY event_type"
    )
    o["nsdb_groupby_first"] = (
        f"{M} SELECT event_type, arg_min(value, timestamp) AS first_value, "
        "min(timestamp) AS timestamp FROM m GROUP BY event_type"
    )
    o["nsdb_groupby_last"] = (
        f"{M} SELECT event_type, arg_max(value, timestamp) AS last_value, "
        "max(timestamp) AS timestamp FROM m GROUP BY event_type"
    )
    o["nsdb_groupby_numeric_tag"] = (
        "SELECT user_id, count(*) AS count_value FROM events GROUP BY user_id"
    )
    o["nsdb_groupby_count_distinct"] = (
        "SELECT event_type, count(DISTINCT value) AS count_distinct_value "
        "FROM events GROUP BY event_type"
    )
    o["nsdb_temporal_count"] = _temporal_oracle(86400000, "count(*)", "count_value")
    o["nsdb_temporal_sum"] = _temporal_oracle(
        43200000, "round(sum(value), 3)", "sum_value"
    )
    o["nsdb_temporal_avg"] = _temporal_oracle(
        86400000, "round(avg(value), 3)", "avg_value"
    )
    o["nsdb_temporal_count_distinct"] = _temporal_oracle(
        172800000, "count(DISTINCT event_type)", "count_distinct_event_type"
    )
    o["nsdb_temporal_limit"] = _temporal_oracle(86400000, "count(*)", "count_value", limit=5)
    o["nsdb_temporal_min"] = _temporal_oracle(
        604800000, "min(value)", "min_value", min_two_level=True
    )
    o["nsdb_temporal_max"] = _temporal_oracle(604800000, "max(value)", "max_value")
    o["nsdb_temporal_since"] = _temporal_oracle(
        86400000, "count(*)", "count_value", grace_ms=864000000
    )
    o["nsdb_temporal_not_range"] = _temporal_multi_oracle(
        172800000,
        "count(*)",
        "count_value",
        # NOT timestamp IN (a, b) ⇒ [0, a-1] ∪ [b+1, ∞), extent-clipped
        [(None, 1705017599999), (1705622400001, None)],
    )
    o["nsdb_temporal_or_ranges"] = _temporal_multi_oracle(
        259200000,
        "round(sum(value), 3)",
        "sum_value",
        [(1704067200000, 1704672000000), (1705276800000, 1705881600000)],
    )
    o["nsdb_relative_time"] = (
        f"{M} SELECT count(*) AS count_value FROM m "
        "WHERE timestamp >= (SELECT max(timestamp) FROM m) - 864000000"
    )
    o["nsdb_nullable_predicates"] = (
        f"{M} SELECT * FROM m WHERE value IS NOT NULL AND props IS NOT NULL "
        "AND value >= 480 ORDER BY event_id LIMIT 100"
    )
    o["nsdb_like_infix_count"] = (
        f"{M} SELECT count(*) AS count_value FROM m WHERE props LIKE '%: 1%'"
    )
    o["nsdb_distinct_order"] = (
        "SELECT DISTINCT user_id FROM events ORDER BY user_id DESC LIMIT 20"
    )
