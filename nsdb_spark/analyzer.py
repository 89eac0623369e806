"""Statement analyzer/validator: AST + MetricSchema → ParsedQuery descriptor.

Rule parity with nsdb-core/src/main/scala/io/radicalbit/nsdb/statement/StatementParser.scala:49-148
and FieldsParser.scala:30-57, with exact error strings (errors.py).

The output descriptors mirror the reference's ParsedQuery hierarchy
(ParsedSimpleQuery / ParsedGlobalAggregatedQuery / ParsedAggregatedQuery /
ParsedTemporalAggregatedQuery) but carry only logical info — the physical
strategy is Catalyst's job (SURVEY.md §4).
"""
from __future__ import annotations

from dataclasses import dataclass

from .model import FieldClass, MetricSchema, NsdbType
from .sql import ast
from .sql.errors import (
    AGGREGATION_NOT_ALLOWED,
    GRACE_PERIOD_NOT_ALLOWED,
    GROUP_BY_DISTINCT,
    MORE_FIELDS_DISTINCT,
    MORE_FIELDS_GROUP_BY,
    MULTIPLE_COUNT_AGGREGATIONS,
    NO_AGGREGATION_GROUP_BY,
    NO_GROUP_BY_AGGREGATION,
    SIMPLE_AGGREGATION_NOT_ON_TAG,
    SORT_DIMENSION_NOT_IN_GROUP,
    StatementValidationError,
    non_compatible_operator,
    not_existing_field,
    not_existing_fields,
)


@dataclass
class ParsedSimpleQuery:
    statement: ast.SelectSQLStatement
    fields: list[str]  # projected plain fields ([] = all)
    distinct: bool = False


@dataclass
class ParsedGlobalAggregatedQuery:
    statement: ast.SelectSQLStatement
    plain_fields: list[str]
    aggregations: list[ast.Aggregation]


@dataclass
class ParsedAggregatedQuery:
    statement: ast.SelectSQLStatement
    group_field: str
    aggregation: ast.Aggregation


@dataclass
class ParsedTemporalAggregatedQuery:
    statement: ast.SelectSQLStatement
    interval_ms: int
    aggregation: ast.Aggregation
    grace_period_ms: int | None = None


ParsedQuery = (
    ParsedSimpleQuery
    | ParsedGlobalAggregatedQuery
    | ParsedAggregatedQuery
    | ParsedTemporalAggregatedQuery
)


def _check_expression(e: ast.Expression, schema: MetricSchema) -> None:
    """Field existence + operator/type compatibility (ExpressionParser.scala:39-235)."""
    if isinstance(e, ast.NotExpression):
        _check_expression(e.expression, schema)
        return
    if isinstance(e, ast.TupledLogicalExpression):
        _check_expression(e.expression1, schema)
        _check_expression(e.expression2, schema)
        return
    name = e.dimension
    ftype = schema.field_type(name)
    if ftype is None:
        raise StatementValidationError(not_existing_field(name))
    if isinstance(e, ast.ComparisonExpression):
        if not ftype.is_numeric:
            raise StatementValidationError(non_compatible_operator("comparison", "numerical"))
        _check_value_type(e.value, ftype, "comparison")
    elif isinstance(e, ast.LikeExpression):
        if ftype is not NsdbType.VARCHAR:
            raise StatementValidationError(non_compatible_operator("Like", "VARCHAR"))
    elif isinstance(e, ast.EqualityExpression):
        _check_value_type(e.value, ftype, "equality")
    elif isinstance(e, ast.RangeExpression):
        if not ftype.is_numeric:
            raise StatementValidationError(non_compatible_operator("range", "numerical"))
        _check_value_type(e.value1, ftype, "range")
        _check_value_type(e.value2, ftype, "range")


def _check_value_type(v: ast.ComparisonValue, ftype: NsdbType, op: str) -> None:
    if isinstance(v, ast.RelativeComparisonValue):
        if not ftype.is_numeric:
            raise StatementValidationError(non_compatible_operator(op, ftype.value))
        return
    raw = v.value
    if ftype is NsdbType.VARCHAR:
        if not isinstance(raw, str):
            raise StatementValidationError(non_compatible_operator(op, ftype.value))
    else:
        if isinstance(raw, str):
            raise StatementValidationError(non_compatible_operator(op, ftype.value))
        if ftype in (NsdbType.INT, NsdbType.BIGINT) and isinstance(raw, float):
            raise StatementValidationError(non_compatible_operator(op, ftype.value))


def _check_aggregation_target(agg: ast.Aggregation, schema: MetricSchema) -> None:
    """FieldsParser.scala:30-37 — count/count-distinct on value or a tag;
    everything else only on value."""
    target = agg.target
    if target == "value":
        return
    cls = schema.field_class(target)
    if cls is None:
        raise StatementValidationError(not_existing_field(target))
    if agg.kind in (ast.AGG_COUNT, ast.AGG_COUNT_DISTINCT):
        if cls is not FieldClass.TAG:
            raise StatementValidationError(AGGREGATION_NOT_ALLOWED)
    else:
        raise StatementValidationError(AGGREGATION_NOT_ALLOWED)


def analyze(statement: ast.SelectSQLStatement, schema: MetricSchema) -> ParsedQuery:
    """Validate and classify a SELECT (StatementParser.parseStatement parity)."""
    fields = statement.fields
    is_all = isinstance(fields, ast.AllFields)
    field_list: list[ast.Field] = [] if is_all else list(fields)

    # unknown plain projection fields → notExistingField(s)
    unknown = [
        f.name for f in field_list
        if f.aggregation is None and f.name != "*" and not schema.has_field(f.name)
    ]
    if unknown:
        raise StatementValidationError(
            not_existing_field(unknown[0]) if len(unknown) == 1 else not_existing_fields(unknown)
        )

    aggregations = [f.aggregation for f in field_list if f.aggregation is not None]
    plain_fields = [f.name for f in field_list if f.aggregation is None]

    # at most one count + one count distinct (FieldsParser.scala:42-45)
    if sum(1 for a in aggregations if a.kind == ast.AGG_COUNT) > 1 or sum(
        1 for a in aggregations if a.kind == ast.AGG_COUNT_DISTINCT
    ) > 1:
        raise StatementValidationError(MULTIPLE_COUNT_AGGREGATIONS)
    for a in aggregations:
        _check_aggregation_target(a, schema)

    if statement.condition is not None:
        _check_expression(statement.condition.expression, schema)

    order = statement.order
    if order is not None and not schema.has_field(order.dimension):
        raise StatementValidationError(not_existing_field(order.dimension))

    group_by = statement.group_by

    # grace period only with temporal group by (StatementParser GRACE check)
    if statement.grace_period is not None and not isinstance(group_by, ast.TemporalGroupBy):
        raise StatementValidationError(GRACE_PERIOD_NOT_ALLOWED)

    if isinstance(group_by, ast.SimpleGroupBy):
        if statement.distinct:
            raise StatementValidationError(GROUP_BY_DISTINCT)
        if not aggregations:
            raise StatementValidationError(NO_AGGREGATION_GROUP_BY)
        if len(aggregations) > 1 or plain_fields:
            raise StatementValidationError(MORE_FIELDS_GROUP_BY)
        gf = group_by.field
        cls = schema.field_class(gf)
        if cls is None:
            raise StatementValidationError(not_existing_field(gf))
        if cls is not FieldClass.TAG:
            raise StatementValidationError(SIMPLE_AGGREGATION_NOT_ON_TAG)
        # sort field must be `value` or the group field (StatementParser.scala:74-79)
        if order is not None and order.dimension not in ("value", gf):
            raise StatementValidationError(SORT_DIMENSION_NOT_IN_GROUP)
        return ParsedAggregatedQuery(statement, gf, aggregations[0])

    if isinstance(group_by, ast.TemporalGroupBy):
        if statement.distinct:
            raise StatementValidationError(GROUP_BY_DISTINCT)
        if not aggregations:
            raise StatementValidationError(NO_AGGREGATION_GROUP_BY)
        if len(aggregations) > 1 or plain_fields:
            raise StatementValidationError(MORE_FIELDS_GROUP_BY)
        agg = aggregations[0]
        if agg.kind not in ast.TEMPORAL_AGGREGATIONS:
            raise StatementValidationError(NO_GROUP_BY_AGGREGATION)
        # the grammar accepts any integer ("interval 0 s"); a zero-width
        # bucket would reach the compiler's axis division as a raw
        # ZeroDivisionError — reject it as a validation error instead
        # (no reference parity string: the reference grammar shares the
        # gap, so this is our dialect's own guard)
        if group_by.interval_ms <= 0:
            raise StatementValidationError("interval must be a positive duration")
        grace = statement.grace_period.interval_ms if statement.grace_period else None
        return ParsedTemporalAggregatedQuery(statement, group_by.interval_ms, agg, grace)

    # no group by ------------------------------------------------------
    if statement.distinct:
        if is_all or len(field_list) != 1 or aggregations:
            raise StatementValidationError(MORE_FIELDS_DISTINCT)
        return ParsedSimpleQuery(statement, plain_fields, distinct=True)

    if aggregations:
        # aggregation without group-by must be global (StatementParser.scala:114-115)
        non_global = [a for a in aggregations if a.kind not in ast.GLOBAL_AGGREGATIONS]
        if non_global:
            raise StatementValidationError(NO_GROUP_BY_AGGREGATION)
        return ParsedGlobalAggregatedQuery(statement, plain_fields, aggregations)

    return ParsedSimpleQuery(statement, plain_fields)
