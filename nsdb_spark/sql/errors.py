"""Exact validation error strings.

Parity with nsdb-core/src/main/scala/io/radicalbit/nsdb/statement/StatementParserErrors.scala:21-39.
"""
from __future__ import annotations

NO_AGGREGATION_GROUP_BY = "cannot execute a groupField by query without an aggregation"
MORE_FIELDS_GROUP_BY = "cannot execute a groupField by query with more than a aggregateField"
MORE_FIELDS_DISTINCT = "cannot execute a select distinct projecting more than one field"
NO_GROUP_BY_AGGREGATION = (
    "cannot execute a query with a non global aggregation without a groupBy field"
)
GROUP_BY_DISTINCT = "cannot execute a query with a group by and a distinct clause"
SIMPLE_AGGREGATION_NOT_ON_TAG = (
    "cannot execute a groupBy query grouping by a field that is not a tag"
)
AGGREGATION_NOT_ALLOWED = (
    "Count And Count Distinct Aggregation can be applied to the value and to a tag. "
    "Other aggregations can be applied only on the value"
)
MULTIPLE_COUNT_AGGREGATIONS = "Only one Count and one Count Distinct is allowed"
SORT_DIMENSION_NOT_IN_GROUP = (
    "cannot sort group by query result by a field not in group by clause"
)
GRACE_PERIOD_NOT_ALLOWED = "grace period clause is allowed only in temporal group by queries"

DISTINCT_ONLY_COUNT = "Distinct clause is only applicable to the count aggregation"


def not_existing_field(field: str) -> str:
    return f"field {field} does not exist"


def not_existing_fields(fields: list[str]) -> str:
    return f"field [{','.join(fields)}] does not exist"


def non_compatible_operator(operator: str, dim_type_allowed: str) -> str:
    return f"cannot use {operator} operator on dimension different from {dim_type_allowed}"


class StatementValidationError(Exception):
    """Raised by the analyzer with one of the exact messages above."""


class SQLParseError(Exception):
    """Raised by the dialect parser on malformed statements."""
