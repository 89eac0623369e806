"""Compile ParsedQuery descriptors into DataFrame plans.

Design (SURVEY.md §7.0): build the plan declaratively with pyspark.sql
functions only — Catalyst then does predicate/partition pruning, column
pruning, partial+final aggregation and top-k limit for free (SURVEY.md §4).
No RDDs, no Python UDFs anywhere on this path: every expression stays inside
whole-stage codegen.

Semantics parity notes (reference, studied not copied):
- projections always include timestamp+value      (docs/SQL_doc.md:39)
- LIKE wildcard `$`; `?` is a literal             (ExpressionParser.scala:110-120)
- IN (a,b) = inclusive BETWEEN                    (SQLStatement.scala:96-101)
- relative `now ± n unit` resolved once per query (TimeContext, ExpressionParser.scala:45-53)
- temporal buckets aligned BACKWARD from the shard-interval upper bound,
  first (oldest) bucket truncated+closed          (TimeRangeManager.scala:74-90, SURVEY.md §4.3)
- empty temporal buckets ARE emitted with 0       (ReadCoordinatorTemporalAggregatedStatementsSpec)
- temporal LIMIT keeps the *most recent* n buckets when sorted asc, the
  oldest n when sorted desc (takeRight)           (post_proc/package.scala:62-66)
- global count is clamped to LIMIT                (post_proc/package.scala:344-347)
- mixed plain+agg: every returned row carries the final aggregate values
                                                  (post_proc/package.scala:387-394)
- first/last = min_by/max_by(value, timestamp)    (post_proc/package.scala:297-298)
"""
from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyzer import (
    ParsedAggregatedQuery,
    ParsedGlobalAggregatedQuery,
    ParsedQuery,
    ParsedSimpleQuery,
    ParsedTemporalAggregatedQuery,
)
from .model import DEFAULT_SHARD_INTERVAL_MS, SHARD_COL, MetricSchema
from .sql import ast


@dataclass
class TimeContext:
    """Fixed per-query `now` (parity: nsdb-core/.../model/TimeContext.scala)."""

    current_time: int


def agg_alias(agg: ast.Aggregation) -> str:
    """Canonical output column for an aggregation (NSDb uses tag keys like
    `count(*)`; we use SQL-safe names, same information)."""
    if agg.kind == ast.AGG_COUNT_DISTINCT:
        return f"count_distinct_{agg.target}"
    return f"{agg.kind}_{agg.target}"


# ------------------------------------------------------------------ predicates


def _resolve_value(v: ast.ComparisonValue, ctx: TimeContext):
    if isinstance(v, ast.RelativeComparisonValue):
        return v.resolve(ctx.current_time)
    return v.value


def like_to_regex(pattern: str) -> str:
    """NSDb LIKE → anchored regex: `$` = any sequence, everything else literal
    (parity with the Lucene wildcard translation, `?` kept literal —
    ExpressionParser.scala:115 escapes only `?`).

    Deliberate deviation on another unpinned artifact of that line: the
    reference passes a raw `*` (and `\\`) through to Lucene's
    WildcardQuery UNescaped, so a literal `*` in a user pattern silently
    acts as a second any-sequence wildcard there. The documented SQL
    surface defines `$` as THE wildcard (docs/SQL_doc.md), so we treat
    `*` as a literal character; no reference test pins the passthrough."""
    parts = [re.escape(p) for p in pattern.split("$")]
    return "^" + ".*".join(parts) + "$"


def compile_expression(e: ast.Expression, ctx: TimeContext) -> Column:
    if isinstance(e, ast.EqualityExpression):
        return F.col(e.dimension) == F.lit(_resolve_value(e.value, ctx))
    if isinstance(e, ast.ComparisonExpression):
        c, v = F.col(e.dimension), F.lit(_resolve_value(e.value, ctx))
        return {">": c > v, ">=": c >= v, "<": c < v, "<=": c <= v}[e.operator]
    if isinstance(e, ast.RangeExpression):
        return F.col(e.dimension).between(
            F.lit(_resolve_value(e.value1, ctx)), F.lit(_resolve_value(e.value2, ctx))
        )
    if isinstance(e, ast.LikeExpression):
        return F.col(e.dimension).rlike(like_to_regex(e.value))
    if isinstance(e, ast.NullableExpression):
        c = F.col(e.dimension)
        return c.isNotNull() if e.negated else c.isNull()
    if isinstance(e, ast.NotExpression):
        inner = compile_expression(e.expression, ctx)
        # SQL three-valued NOT would drop NULL rows; NSDb's NOT is index
        # complement: rows where the inner predicate is not satisfied.
        return ~F.coalesce(inner, F.lit(False))
    if isinstance(e, ast.TupledLogicalExpression):
        l = compile_expression(e.expression1, ctx)
        r = compile_expression(e.expression2, ctx)
        return (l & r) if e.operator == "and" else (l | r)
    raise TypeError(f"unknown expression {e!r}")


# ------------------------------------------------- parameterized-SQL serving

def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def sql_expression(e: ast.Expression, ctx: TimeContext, args: dict) -> str:
    """compile_expression's parameterized-SQL twin, for the point-serving
    route: renders the SAME predicate as Spark SQL text with named
    parameter markers — every literal travels in `args` and is typed
    JVM-side by spark.sql, so no user value is ever string-interpolated.
    Building one SQL string costs ONE py4j roundtrip at spark.sql() time,
    versus ~2 roundtrips per Column node here (the uncached point-query
    floor was dominated by that chatter, BASELINE.md decomposition).
    Kept adjacent to compile_expression so the two stay reviewably in
    lockstep; tests/test_engine.py grid + the hypothesis parity test in
    test_properties.py pin route equivalence clause by clause."""

    def bind(v) -> str:
        return bind_named(args, v)

    if isinstance(e, ast.EqualityExpression):
        return f"{_sql_ident(e.dimension)} = {bind(_resolve_value(e.value, ctx))}"
    if isinstance(e, ast.ComparisonExpression):
        return (
            f"{_sql_ident(e.dimension)} {e.operator} "
            f"{bind(_resolve_value(e.value, ctx))}"
        )
    if isinstance(e, ast.RangeExpression):
        lo = bind(_resolve_value(e.value1, ctx))
        hi = bind(_resolve_value(e.value2, ctx))
        return f"{_sql_ident(e.dimension)} BETWEEN {lo} AND {hi}"
    if isinstance(e, ast.LikeExpression):
        return f"{_sql_ident(e.dimension)} RLIKE {bind(like_to_regex(e.value))}"
    if isinstance(e, ast.NullableExpression):
        return f"{_sql_ident(e.dimension)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, ast.NotExpression):
        # index-complement NOT, exactly as compile_expression: NULL
        # inner verdicts count as "not satisfied", not as unknown
        inner = sql_expression(e.expression, ctx, args)
        return f"(NOT coalesce(({inner}), false))"
    if isinstance(e, ast.TupledLogicalExpression):
        l = sql_expression(e.expression1, ctx, args)
        r = sql_expression(e.expression2, ctx, args)
        return f"(({l}) {'AND' if e.operator == 'and' else 'OR'} ({r}))"
    raise TypeError(f"unknown expression {e!r}")


def serving_sql(
    parsed: ParsedSimpleQuery,
    schema: MetricSchema,
    ctx: TimeContext,
    view: str,
    shard_ivs: list[tuple[int, int | None]],
    shard_interval_ms: int,
) -> tuple[str, dict]:
    """One parameterized SQL statement equivalent to the plain
    non-DISTINCT pipeline compile()/_simple builds Column-by-Column:
    projection (timestamp+value always), shard conjunct ANDed into the
    SAME WHERE as the condition, ORDER BY, LIMIT. The engine's point
    route feeds this to serving_session.sql(text, args) — a single py4j
    roundtrip replaces the per-node Column construction chatter that
    dominated the uncached point-statement floor."""
    stmt = parsed.statement
    args: dict = {}
    fields = parsed.fields
    if not fields:
        cols = schema.all_field_names()
    else:
        cols = ["timestamp", "value"]
        cols += [f for f in fields if f not in ("timestamp", "value")]
    parts = [f"SELECT {', '.join(_sql_ident(c) for c in cols)} FROM {_sql_ident(view)}"]
    conjuncts = []
    if shard_ivs:
        ors = []
        for lo, hi in shard_ivs:
            p = f"{_sql_ident(SHARD_COL)} >= {bind_named(args, (lo // shard_interval_ms) * shard_interval_ms)}"
            if hi is not None:
                p = (
                    f"({p} AND {_sql_ident(SHARD_COL)} <= "
                    f"{bind_named(args, (hi // shard_interval_ms) * shard_interval_ms)})"
                )
            ors.append(p)
        conjuncts.append("(" + " OR ".join(ors) + ")")
    if stmt.condition is not None:
        conjuncts.append(f"({sql_expression(stmt.condition.expression, ctx, args)})")
    if conjuncts:
        parts.append("WHERE " + " AND ".join(conjuncts))
    if stmt.order is not None:
        parts.append(
            f"ORDER BY {_sql_ident(stmt.order.dimension)} "
            + ("DESC" if stmt.order.descending else "ASC")
        )
    if stmt.limit is not None:
        parts.append(f"LIMIT {int(stmt.limit.value)}")
    return " ".join(parts), args


def bind_named(args: dict, v) -> str:
    """Append v under the next positional name and return its marker."""
    k = f"p{len(args)}"
    args[k] = v
    return ":" + k


# ------------------------------------------------------- time-range extraction

_UNBOUNDED = (0, None)  # timestamps are non-negative in NSDb (Interval lower 0)

#: The provably-empty interval SET (Spire's Interval.empty analogue,
#: TimeRangeManager.scala:56-59: a contradictory AND reduces to the empty
#: interval, which computeRanges then filters out — yielding an EMPTY
#: result, not an unconstrained one). [] keeps meaning "no time
#: constraint"; this marker means "no timestamp can match". Chosen in the
#: negative range so every consumer treats it correctly without a special
#: case: no shard_start (>= 0) falls inside it (pruning drops every shard,
#: DELETE's affected set is empty) and the temporal axis clip yields
#: upper <= lower (empty bucket frame).
_EMPTY_IVS = [(-1, -2)]


def extract_time_range(e: ast.Expression | None, ctx: TimeContext) -> list[tuple[int, int | None]]:
    """Closed intervals over `timestamp` implied by a WHERE expression.

    Mirrors TimeRangeManager.extractTimeRange (TimeRangeManager.scala:33-63):
    =, <, >, <=, >=, IN-range; NOT via complement; AND intersect; OR union.
    Intervals are [lo, hi] with hi=None meaning unbounded above; used for
    partition pruning and temporal bucket bounds. Returns [] for "no time
    constraint" and _EMPTY_IVS for a provably-unsatisfiable constraint
    (e.g. `timestamp >= 60000 and timestamp <= 5000`) — conflating the
    two turned contradictions into full-axis scans: a temporal query
    emitted the entire zero-bucket axis and DELETE rewrote every shard.

    Two DELIBERATE deviations from the reference, both on OR paths its
    own test suite never pins (TimeRangeManagerSpec has no
    disjoint-timestamp-OR case):

    - OR of two DISJOINT timestamp ranges: the reference reduces with
      Spire's `Interval.union` (TimeRangeManager.scala:58-60), whose
      result for disjoint operands is the CONVEX HULL — one interval
      spanning the excluded gap, so its temporal axis emits zero-filled
      buckets inside a range the WHERE excludes, and its shard pruning
      keeps gap-only shards. We keep the TRUE disjoint set (one
      backward-aligned axis per interval, same as the reference's own
      NOT-complement path, which flatMaps `~i` WITHOUT reducing and so
      stays disjoint). Internally consistent, strictly less I/O.
    - OR where one side carries no time constraint (`timestamp >= 2 OR
      name = 'john'`): the reference keeps the time side's interval
      (`l ++ r` of one element reduces to itself,
      TimeRangeManager.scala:51-60) and would prune shards that hold
      `name = 'john'` rows with ts < 2 — a row-losing bug. We treat the
      union with an unconstrained side as unconstrained (the only sound
      reading of OR).
    """
    if e is None:
        return []
    if isinstance(e, ast.EqualityExpression) and e.dimension == "timestamp":
        v = int(_resolve_value(e.value, ctx))
        return [(v, v)]
    if isinstance(e, ast.ComparisonExpression) and e.dimension == "timestamp":
        v = int(_resolve_value(e.value, ctx))
        # `< 0` is empty, not [0, -1] (reference: Interval.openUpper(0, 0))
        if e.operator == "<" and v <= 0:
            return list(_EMPTY_IVS)
        return {
            ">": [(v + 1, None)],
            ">=": [(v, None)],
            "<": [(0, v - 1)],
            "<=": [(0, v)],
        }[e.operator]
    if isinstance(e, ast.RangeExpression) and e.dimension == "timestamp":
        lo = int(_resolve_value(e.value1, ctx))
        hi = int(_resolve_value(e.value2, ctx))
        # inverted BETWEEN bounds: Spire's Interval.closed(v1, v2) with
        # v1 > v2 is the empty interval
        return [(lo, hi)] if lo <= hi else list(_EMPTY_IVS)
    if isinstance(e, ast.NotExpression):
        # complementing is only sound when the inner extraction is EXACT.
        # For a mixed predicate like NOT (timestamp > t AND host = 'a')
        # the inner extraction is an over-approximation (the host side is
        # treated as always-true), and the complement of an
        # over-approximation UNDER-approximates — pruning shards that
        # hold matching rows (wrong SELECTs, rows DELETE never rewrites).
        # A NOT over anything non-time-only is therefore unconstrained.
        if not _is_time_only(e.expression):
            return []
        inner = extract_time_range(e.expression, ctx)
        if not inner:
            return []
        return _complement(inner)
    if isinstance(e, ast.TupledLogicalExpression):
        l = extract_time_range(e.expression1, ctx)
        r = extract_time_range(e.expression2, ctx)
        if not l and not r:
            return []
        if e.operator == "and":
            if not l:
                return r
            if not r:
                return l
            return _intersect(l, r)
        # or: if either side is unconstrained the union is unconstrained
        if not l or not r:
            return []
        return _union(l + r)
    return []


def _is_time_only(e: ast.Expression) -> bool:
    """True iff every leaf predicate constrains `timestamp` — the
    precondition for an exact (complement-safe) interval extraction."""
    if isinstance(
        e, (ast.EqualityExpression, ast.ComparisonExpression, ast.RangeExpression)
    ):
        return e.dimension == "timestamp"
    if isinstance(e, ast.LikeExpression):
        return False
    if isinstance(e, ast.NullableExpression):
        return False
    if isinstance(e, ast.NotExpression):
        return _is_time_only(e.expression)
    if isinstance(e, ast.TupledLogicalExpression):
        return _is_time_only(e.expression1) and _is_time_only(e.expression2)
    return False


def _union(ivs: list[tuple[int, int | None]]) -> list[tuple[int, int | None]]:
    # degenerate (empty-interval) members contribute nothing to a union;
    # a union of ONLY empties is the empty set, not "unconstrained"
    real = [iv for iv in ivs if iv[1] is None or iv[0] <= iv[1]]
    if ivs and not real:
        return list(_EMPTY_IVS)
    out: list[tuple[int, int | None]] = []
    for lo, hi in sorted(real, key=lambda t: t[0]):
        if out:
            plo, phi = out[-1]
            if phi is None or lo <= phi + 1:
                out[-1] = (plo, None if (phi is None or hi is None) else max(phi, hi))
                continue
        out.append((lo, hi))
    return out


def _intersect(a: list[tuple[int, int | None]], b: list[tuple[int, int | None]]):
    out = []
    for lo1, hi1 in a:
        for lo2, hi2 in b:
            lo = max(lo1, lo2)
            hi = hi1 if hi2 is None else hi2 if hi1 is None else min(hi1, hi2)
            if hi is None or lo <= hi:
                out.append((lo, hi))
    # disjoint operands (or an empty operand) intersect to the EMPTY set —
    # returning [] here would read as "unconstrained" upstream
    return _union(out) if out else list(_EMPTY_IVS)


def _complement(ivs: list[tuple[int, int | None]]) -> list[tuple[int, int | None]]:
    ivs = _union(ivs)
    if ivs == _EMPTY_IVS:
        return [_UNBOUNDED]  # complement of the empty set is everything
    out: list[tuple[int, int | None]] = []
    cursor = 0
    for lo, hi in ivs:
        if lo > cursor:
            out.append((cursor, lo - 1))
        if hi is None:
            return out if out else list(_EMPTY_IVS)
        cursor = hi + 1
    out.append((cursor, None))
    return out


def envelope(ivs: list[tuple[int, int | None]]) -> tuple[int | None, int | None]:
    """(lowest lower bound, highest upper bound) of a set of intervals."""
    if not ivs:
        return (None, None)
    lo = min(iv[0] for iv in ivs)
    hi = None if any(iv[1] is None for iv in ivs) else max(iv[1] for iv in ivs)
    return (lo, hi)


# ------------------------------------------------------------------- compiler


class QueryCompiler:
    """Compiles ParsedQuery → DataFrame over a metric frame.

    The metric frame has columns: timestamp BIGINT, value numeric, plus one
    flat column per dimension/tag (absent field = NULL).
    """

    def __init__(
        self,
        spark: SparkSession,
        shard_interval_ms: int = DEFAULT_SHARD_INTERVAL_MS,
        approx_count_distinct: bool = False,
    ):
        self.spark = spark
        self.shard_interval_ms = shard_interval_ms
        # opt-in extension (SURVEY.md §7.3): COUNT DISTINCT via HyperLogLog++
        # partials instead of the exact expand+shuffle — at 100 TB the exact
        # distinct's shuffle width is the cost; the reference is always
        # exact, so this is off by default for parity.
        self.approx_count_distinct = approx_count_distinct

    # -- public --------------------------------------------------------
    def compile(
        self,
        df: DataFrame,
        schema: MetricSchema,
        parsed: ParsedQuery,
        ctx: TimeContext | None = None,
        locations: list[int] | None = None,
        pre_filter: Column | None = None,
    ) -> DataFrame:
        """locations: known shard_start values (partition listing). For
        temporal queries they give the bucket upper bound without a data
        scan — at scale this is a metadata lookup, parity with NSDb's
        location filtering (ReadCoordinator.scala:210-214).

        pre_filter: an extra predicate (the engine's shard-pruning
        conjunct) ANDed into the SAME filter as the WHERE condition —
        one Dataset fewer on the point-serving path, where every eager
        analysis pass is measurable."""
        ctx = ctx or TimeContext(_now_ms())
        stmt = parsed.statement
        cond = (
            compile_expression(stmt.condition.expression, ctx)
            if stmt.condition is not None
            else None
        )
        if pre_filter is not None:
            cond = pre_filter if cond is None else (pre_filter & cond)
        filtered = df if cond is None else df.filter(cond)

        if isinstance(parsed, ParsedSimpleQuery):
            return self._simple(filtered, schema, parsed)
        if isinstance(parsed, ParsedGlobalAggregatedQuery):
            return self._global_agg(filtered, schema, parsed)
        if isinstance(parsed, ParsedAggregatedQuery):
            return self._standard_agg(filtered, parsed)
        if isinstance(parsed, ParsedTemporalAggregatedQuery):
            return self._temporal_agg(filtered, parsed, ctx, locations)
        raise TypeError(f"unknown parsed query {parsed!r}")

    # -- simple ---------------------------------------------------------
    def _projection(self, schema: MetricSchema, fields: list[str]) -> list[str]:
        if not fields:
            return schema.all_field_names()
        # timestamp & value are always included (docs/SQL_doc.md:39)
        cols = ["timestamp", "value"]
        cols += [f for f in fields if f not in ("timestamp", "value")]
        return cols

    def _simple(self, df: DataFrame, schema: MetricSchema, q: ParsedSimpleQuery) -> DataFrame:
        stmt = q.statement
        if q.distinct:
            out = df.select(q.fields[0]).distinct()
        else:
            out = df.select(*self._projection(schema, q.fields))
        out = _order(out, stmt.order)
        if stmt.limit:
            out = out.limit(stmt.limit.value)
        return out

    # -- global ----------------------------------------------------------
    def _agg_columns(self, aggs: list[ast.Aggregation]) -> list[Column]:
        cols = []
        for a in aggs:
            alias = agg_alias(a)
            if a.kind == ast.AGG_COUNT:
                c = F.count(a.target)
            elif a.kind == ast.AGG_COUNT_DISTINCT:
                if self.approx_count_distinct:
                    c = F.approx_count_distinct(a.target)
                else:
                    c = F.count_distinct(F.col(a.target))
            elif a.kind == ast.AGG_SUM:
                c = F.coalesce(F.sum(a.target), F.lit(0))
            elif a.kind == ast.AGG_MIN:
                c = F.min(a.target)
            elif a.kind == ast.AGG_MAX:
                c = F.max(a.target)
            elif a.kind == ast.AGG_AVG:
                # empty input → 0 (globalAggregationReduce avg zero case)
                c = F.coalesce(F.avg(a.target), F.lit(0.0))
            elif a.kind == ast.AGG_FIRST:
                c = F.min_by(a.target, "timestamp")
            elif a.kind == ast.AGG_LAST:
                c = F.max_by(a.target, "timestamp")
            else:  # pragma: no cover
                raise ValueError(a.kind)
            cols.append(c.alias(alias))
        return cols

    def _global_agg(
        self, df: DataFrame, schema: MetricSchema, q: ParsedGlobalAggregatedQuery
    ) -> DataFrame:
        stmt = q.statement
        agg_row = df.agg(*self._agg_columns(q.aggregations))
        # global count(*) is clamped to LIMIT (post_proc/package.scala:344-347)
        if stmt.limit:
            for a in q.aggregations:
                if a.kind == ast.AGG_COUNT:
                    alias = agg_alias(a)
                    agg_row = agg_row.withColumn(
                        alias, F.least(F.col(alias), F.lit(stmt.limit.value).cast("long"))
                    )
        if not q.plain_fields:
            return agg_row
        # mixed plain+agg: every row carries the final aggregates
        # (post_proc/package.scala:387-394); single-row broadcast join.
        rows = df.select(*self._projection(schema, q.plain_fields))
        rows = _order(rows, stmt.order)
        if stmt.limit:
            rows = rows.limit(stmt.limit.value)
        return rows.crossJoin(F.broadcast(agg_row))

    # -- standard group-by ----------------------------------------------
    def _standard_agg(self, df: DataFrame, q: ParsedAggregatedQuery) -> DataFrame:
        stmt = q.statement
        alias = agg_alias(q.aggregation)
        aggc = self._agg_columns([q.aggregation])[0]
        aggs = [aggc]
        if q.aggregation.kind == ast.AGG_FIRST:
            aggs.append(F.min("timestamp").alias("timestamp"))
        elif q.aggregation.kind == ast.AGG_LAST:
            aggs.append(F.max("timestamp").alias("timestamp"))
        out = df.groupBy(q.group_field).agg(*aggs)
        if stmt.order:
            # ORDER BY value sorts by the aggregated value
            # (post_proc/package.scala:67-80); else by the group field.
            target = alias if stmt.order.dimension == "value" else q.group_field
            out = out.orderBy(F.col(target).desc() if stmt.order.descending else F.col(target).asc())
        if stmt.limit:
            out = out.limit(stmt.limit.value)
        return out

    # -- temporal group-by ------------------------------------------------
    def _temporal_agg(
        self,
        df: DataFrame,
        q: ParsedTemporalAggregatedQuery,
        ctx: TimeContext,
        locations: list[int] | None,
    ) -> DataFrame:
        stmt = q.statement
        interval = q.interval_ms
        si = self.shard_interval_ms

        # bucket bounds: shard-aligned data extent clipped by the WHERE range
        # (ReadCoordinator.scala:256-272 + TimeRangeManager.computeRangesFor...)
        cond = stmt.condition.expression if stmt.condition else None
        ivs = extract_time_range(cond, ctx)
        if locations:
            data_lower = min(locations)
            data_upper = max(locations) + si
        else:
            # metadata-only fallback: min/max over the (already filtered)
            # frame; against parquet this reads footers, not rows.
            row = df.agg(F.min("timestamp"), F.max("timestamp")).first()
            if row[0] is None:
                return self._empty_temporal(q, df)
            data_lower = (row[0] // si) * si
            data_upper = (row[1] // si) * si + si
        glo = data_lower
        if q.grace_period_ms is not None:
            glo = max(glo, ctx.current_time - q.grace_period_ms)
        # Per-interval axes (TimeRangeManager.computeRangesForIntervalAndCondition,
        # TimeRangeManager.scala:102-124): ONE backward-aligned bucket axis per
        # extracted WHERE interval — a disjoint range (e.g. a NOT-complement)
        # yields disjoint axes with NO zero-filled buckets inside the excluded
        # gap, each aligned backward from its own interval's top. CLIP each
        # interval to the data extent, not the reference's verbatim bounds:
        # shards only exist where data is (ReadNodesSelection.scala:40-49), and
        # taking the WHERE bounds verbatim would generate a bucket row for
        # every interval of an arbitrarily wide range (`timestamp > 0` ⇒ ~10^9
        # empty buckets joined and emitted).
        if not ivs:
            eff = [(glo, data_upper)]
        else:
            eff = []
            for ilo, ihi in ivs:
                u = data_upper if ihi is None else min(ihi, data_upper)
                l = max(ilo, glo)
                # u == l is a DEGENERATE but non-empty interval ([x, x]
                # contains x): the reference emits one inclusive bucket
                # for it (computeRangeForInterval with upper == lower,
                # TimeRangeManager.scala:96-99) — dropping it would lose
                # rows that match the WHERE (e.g. `timestamp = x` or a
                # NOT-complement whose edge lands on the data extent)
                if u >= l:
                    eff.append((l, u))
        if not eff:
            return self._empty_temporal(q, df)

        # segments ordered by DESCENDING upper bound: the global __bucket index
        # (per-interval offset + local backward bucket) is then monotone in
        # DESCENDING upper_bound, which the temporal-LIMIT takeRight below
        # relies on. Intervals are disjoint (extract_time_range unions), so
        # the order is total.
        eff.sort(key=lambda t: t[1], reverse=True)
        segs = []  # (offset, lower, upper, n_buckets)
        off = 0
        for l, u in eff:
            # ceil; a degenerate [x, x] interval still gets its one bucket
            nb = max(1, -((u - l) // -interval))
            segs.append((off, l, u, nb))
            off += nb
        n = off  # total buckets across all interval axes
        alias = agg_alias(q.aggregation)

        if len(segs) == 1:
            _, lower, upper, _ = segs[0]
            rows = df.filter(
                (F.col("timestamp") >= lower) & (F.col("timestamp") <= upper)
            )
            k = F.least(
                F.floor((F.lit(upper) - F.col("timestamp")) / F.lit(interval)),
                F.lit(n - 1),
            ).alias("__bucket")
        else:
            in_any = None
            key = None
            for soff, l, u, nb in segs:
                seg_pred = (F.col("timestamp") >= l) & (F.col("timestamp") <= u)
                local = F.lit(soff) + F.least(
                    F.floor((F.lit(u) - F.col("timestamp")) / F.lit(interval)),
                    F.lit(nb - 1),
                )
                in_any = seg_pred if in_any is None else (in_any | seg_pred)
                key = (
                    F.when(seg_pred, local)
                    if key is None
                    else key.when(seg_pred, local)
                )
            rows = df.filter(in_any)
            k = key.alias("__bucket")
        if q.aggregation.kind == ast.AGG_MIN:
            # ⚠ reference quirk (post_proc/package.scala:170-176): the
            # cross-shard temporal-min reduce drops ZERO shard partials
            # unless every partial is zero. Observable only when a bucket
            # spans shards (or replicas) and one shard's minimum is 0.
            # Reproduce exactly: per-(bucket, shard) partial min, then a
            # zero-skipping combine. Two map-side-combinable aggregations,
            # same shuffle volume class as the plain min.
            shard = (F.floor(F.col("timestamp") / F.lit(si)) * si).alias("__shard")
            partials = rows.groupBy(k, shard).agg(
                F.min(q.aggregation.target).alias("__pmin")
            )
            per_bucket = partials.groupBy("__bucket").agg(
                F.coalesce(
                    F.min(F.when(F.col("__pmin") != 0, F.col("__pmin"))),
                    F.lit(0),
                ).alias(agg_alias(q.aggregation))
            )
        else:
            per_bucket = rows.groupBy(k).agg(self._agg_columns([q.aggregation])[0])

        # bucket axis including empty buckets (spec emits them with 0);
        # one range frame per interval axis, unioned — still a handful of
        # driver-known segments, each a codegen'd Range, no data scan
        seg_frames = []
        for soff, l, u, nb in segs:
            seg_frames.append(
                self.spark.range(nb).select(
                    (F.col("id") + F.lit(soff)).alias("__bucket"),
                    (F.lit(u) - F.col("id") * interval).alias("upper_bound"),
                    F.greatest(
                        F.lit(u) - (F.col("id") + 1) * interval, F.lit(l)
                    ).alias("lower_bound"),
                )
            )
        buckets = seg_frames[0]
        for extra in seg_frames[1:]:
            buckets = buckets.unionByName(extra)
        # broadcast only while the axis is dashboard-sized: per_bucket has
        # up to n rows, and n scales as data-extent/interval — a 1 s
        # interval over a year of shards is ~31M buckets, which would
        # OOM the driver as a broadcast. Past the threshold both sides
        # are equally-sized n-row frames; let AQE pick the join.
        pb = F.broadcast(per_bucket) if n <= 1_000_000 else per_bucket
        joined = buckets.join(pb, "__bucket", "left")
        value_col = F.coalesce(F.col(alias), F.lit(0)).alias(alias)
        out = joined.select(
            F.col("upper_bound").alias("timestamp"),
            "lower_bound",
            "upper_bound",
            value_col,
            "__bucket",
        )

        # temporal LIMIT = takeRight of the sorted axis (post_proc:62-66)
        desc = bool(stmt.order and stmt.order.descending and stmt.order.dimension == "timestamp")
        if stmt.limit:
            v = stmt.limit.value
            out = out.filter(F.col("__bucket") < v) if not desc else out.filter(
                F.col("__bucket") >= n - v
            )
        out = out.drop("__bucket")
        order_col = F.col("timestamp").desc() if desc else F.col("timestamp").asc()
        return out.orderBy(order_col)

    def _empty_temporal(
        self, q: ParsedTemporalAggregatedQuery, df: DataFrame
    ) -> DataFrame:
        """Zero-row frame with EXACTLY the populated path's schema: the
        aggregate column's type is derived by running the same aggregate
        expression over an empty slice of the input, so a count stays
        bigint (a hardcoded double here made the type flip between an
        empty-range run and a populated one — breaking unions and the
        HTTP/WS serialized shape)."""
        alias = agg_alias(q.aggregation)
        aggc = self._agg_columns([q.aggregation])[0]
        return (
            df.limit(0)
            .groupBy()
            .agg(aggc)  # global agg over empty input = one row; types right
            .select(
                F.lit(None).cast("bigint").alias("timestamp"),
                F.lit(None).cast("bigint").alias("lower_bound"),
                F.lit(None).cast("bigint").alias("upper_bound"),
                F.coalesce(F.col(alias), F.lit(0)).alias(alias),
            )
            .limit(0)
        )


def _order(df: DataFrame, order: ast.OrderOperator | None) -> DataFrame:
    if order is None:
        return df
    c = F.col(order.dimension)
    return df.orderBy(c.desc() if order.descending else c.asc())


def _now_ms() -> int:
    import time

    return int(time.time() * 1000)
