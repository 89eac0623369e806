"""AST dataclasses for the NSDb SQL dialect.

Shape parity with nsdb-common/src/main/scala/io/radicalbit/nsdb/common/statement/SQLStatement.scala
(Field/Expression/Aggregation/GroupBy/Order/Limit/GracePeriod/RelativeComparisonValue).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Union

# ---------------------------------------------------------------- aggregations

AGG_COUNT = "count"
AGG_COUNT_DISTINCT = "count_distinct"
AGG_SUM = "sum"
AGG_MIN = "min"
AGG_MAX = "max"
AGG_AVG = "avg"
AGG_FIRST = "first"
AGG_LAST = "last"

#: aggregations legal in a global (no GROUP BY) query (SQLStatement.scala:217-227)
GLOBAL_AGGREGATIONS = {AGG_COUNT, AGG_COUNT_DISTINCT, AGG_SUM, AGG_MIN, AGG_MAX, AGG_AVG}
#: aggregations legal in a temporal GROUP BY (StatementParser.scala:99-113)
TEMPORAL_AGGREGATIONS = {AGG_COUNT, AGG_COUNT_DISTINCT, AGG_SUM, AGG_MIN, AGG_MAX, AGG_AVG}


@dataclass(frozen=True)
class Aggregation:
    """kind ∈ AGG_*; target is the aggregated field ('value' for agg(*))."""

    kind: str
    target: str = "value"


@dataclass(frozen=True)
class Field:
    """A projected field, optionally aggregated (SQLStatement.scala Field)."""

    name: str
    aggregation: Aggregation | None = None


@dataclass(frozen=True)
class AllFields:
    pass


SelectFields = Union[AllFields, list]  # list[Field]

# ---------------------------------------------------------------- values

TIME_UNIT_MS = {
    "d": 86_400_000,
    "h": 3_600_000,
    "min": 60_000,
    "m": 60_000,
    "s": 1_000,
}


@dataclass(frozen=True)
class AbsoluteComparisonValue:
    value: Any  # int | float | str


@dataclass(frozen=True)
class RelativeComparisonValue:
    """`now ± quantity unit` — resolved against a fixed per-query now
    (SQLStatement.scala:302-314, ExpressionParser.scala:45-53)."""

    operator: str  # '+' | '-' | '' (bare now)
    quantity: int
    unit: str

    def resolve(self, now_ms: int) -> int:
        offset = self.quantity * TIME_UNIT_MS[self.unit.lower()] if self.unit else 0
        if self.operator == "-":
            return now_ms - offset
        if self.operator == "+":
            return now_ms + offset
        return now_ms


ComparisonValue = Union[AbsoluteComparisonValue, RelativeComparisonValue]

# ---------------------------------------------------------------- expressions


@dataclass(frozen=True)
class EqualityExpression:
    dimension: str
    value: ComparisonValue


@dataclass(frozen=True)
class ComparisonExpression:
    dimension: str
    operator: str  # '>' '>=' '<' '<='
    value: ComparisonValue


@dataclass(frozen=True)
class RangeExpression:
    """`field IN (a, b)` — inclusive BETWEEN (SQLStatement.scala:96-101)."""

    dimension: str
    value1: ComparisonValue
    value2: ComparisonValue


@dataclass(frozen=True)
class LikeExpression:
    """`field LIKE pattern` — `$` is the any-sequence wildcard."""

    dimension: str
    value: str


@dataclass(frozen=True)
class NullableExpression:
    """IS NULL (negated=False) / IS NOT NULL (negated=True)."""

    dimension: str
    negated: bool = False


@dataclass(frozen=True)
class NotExpression:
    expression: "Expression"


@dataclass(frozen=True)
class TupledLogicalExpression:
    expression1: "Expression"
    operator: str  # 'and' | 'or'
    expression2: "Expression"


Expression = Union[
    EqualityExpression,
    ComparisonExpression,
    RangeExpression,
    LikeExpression,
    NullableExpression,
    NotExpression,
    TupledLogicalExpression,
]


def expression_fields(e: Expression) -> list[str]:
    """All field names referenced by an expression."""
    if isinstance(e, (EqualityExpression, ComparisonExpression, RangeExpression,
                      LikeExpression, NullableExpression)):
        return [e.dimension]
    if isinstance(e, NotExpression):
        return expression_fields(e.expression)
    if isinstance(e, TupledLogicalExpression):
        return expression_fields(e.expression1) + expression_fields(e.expression2)
    return []


# ---------------------------------------------------------------- clauses


@dataclass(frozen=True)
class Condition:
    expression: Expression


@dataclass(frozen=True)
class SimpleGroupBy:
    field: str


@dataclass(frozen=True)
class TemporalGroupBy:
    """GROUP BY INTERVAL n unit."""

    interval_ms: int
    quantity: int
    unit: str


@dataclass(frozen=True)
class OrderOperator:
    dimension: str
    descending: bool = False


@dataclass(frozen=True)
class LimitOperator:
    value: int


@dataclass(frozen=True)
class GracePeriod:
    """SINCE n unit (SQLStatement.scala:255-261)."""

    interval_ms: int
    quantity: int
    unit: str


# ---------------------------------------------------------------- statements


@dataclass
class SelectSQLStatement:
    metric: str
    distinct: bool = False
    fields: SelectFields = dc_field(default_factory=AllFields)
    condition: Condition | None = None
    group_by: SimpleGroupBy | TemporalGroupBy | None = None
    order: OrderOperator | None = None
    limit: LimitOperator | None = None
    grace_period: GracePeriod | None = None
    db: str | None = None
    namespace: str | None = None


@dataclass
class InsertSQLStatement:
    metric: str
    timestamp: int | None
    dimensions: dict[str, Any]
    tags: dict[str, Any]
    value: int | float
    db: str | None = None
    namespace: str | None = None


@dataclass
class DeleteSQLStatement:
    metric: str
    condition: Condition
    db: str | None = None
    namespace: str | None = None


@dataclass
class DropSQLStatement:
    metric: str
    db: str | None = None
    namespace: str | None = None


# CLI-style commands (CommandStatement.scala:27-42)


@dataclass
class ShowNamespaces:
    pass


@dataclass
class UseNamespace:
    namespace: str


@dataclass
class ShowMetrics:
    pass


@dataclass
class DescribeMetric:
    metric: str


Statement = Union[
    SelectSQLStatement,
    InsertSQLStatement,
    DeleteSQLStatement,
    DropSQLStatement,
    ShowNamespaces,
    UseNamespace,
    ShowMetrics,
    DescribeMetric,
]
