"""Analyzer/validation tests — modelled on StatementParserSpec,
StatementParserAggregationsSpec and ReadCoordinatorValidateStatementsSpec,
asserting the exact reference error strings (StatementParserErrors.scala:21-39)."""
import pytest

from nsdb_spark.analyzer import (
    ParsedAggregatedQuery,
    ParsedGlobalAggregatedQuery,
    ParsedSimpleQuery,
    ParsedTemporalAggregatedQuery,
    analyze,
)
from nsdb_spark.model import FieldClass, MetricSchema, NsdbType, SchemaField
from nsdb_spark.sql.errors import StatementValidationError
from nsdb_spark.sql.parser import parse


@pytest.fixture()
def schema():
    return MetricSchema(
        NsdbType.BIGINT,
        {
            "surname": SchemaField("surname", FieldClass.DIMENSION, NsdbType.VARCHAR),
            "name": SchemaField("name", FieldClass.TAG, NsdbType.VARCHAR),
            "age": SchemaField("age", FieldClass.TAG, NsdbType.BIGINT),
            "height": SchemaField("height", FieldClass.TAG, NsdbType.DECIMAL),
        },
    )


def _an(sql, schema):
    return analyze(parse(sql), schema)


def test_simple_classification(schema):
    assert isinstance(_an("select * from m", schema), ParsedSimpleQuery)
    assert isinstance(_an("select name from m where value > 1", schema), ParsedSimpleQuery)


def test_global_classification(schema):
    q = _an("select count(*), sum(value) from m", schema)
    assert isinstance(q, ParsedGlobalAggregatedQuery)
    q2 = _an("select name, count(*) from m", schema)
    assert isinstance(q2, ParsedGlobalAggregatedQuery)
    assert q2.plain_fields == ["name"]


def test_standard_agg_classification(schema):
    q = _an("select sum(value) from m group by name", schema)
    assert isinstance(q, ParsedAggregatedQuery)
    assert q.group_field == "name"


def test_temporal_classification(schema):
    q = _an("select count(*) from m group by interval 30s", schema)
    assert isinstance(q, ParsedTemporalAggregatedQuery)
    assert q.interval_ms == 30_000


def test_unknown_projection_field(schema):
    with pytest.raises(StatementValidationError, match="field unknown does not exist"):
        _an("select unknown from m", schema)


def test_unknown_fields_plural(schema):
    with pytest.raises(StatementValidationError, match=r"field \[a,b\] does not exist"):
        _an("select a, b from m", schema)


def test_unknown_condition_field(schema):
    with pytest.raises(StatementValidationError, match="field nope does not exist"):
        _an("select * from m where nope = 1", schema)


def test_group_by_without_aggregation(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a groupField by query without an aggregation",
    ):
        _an("select name from m group by name", schema)


def test_group_by_more_than_one_aggregation(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a groupField by query with more than a aggregateField",
    ):
        _an("select sum(value), min(value) from m group by name", schema)


def test_group_by_on_dimension_rejected(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a groupBy query grouping by a field that is not a tag",
    ):
        _an("select sum(value) from m group by surname", schema)


def test_distinct_multiple_fields(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a select distinct projecting more than one field",
    ):
        _an("select distinct name, surname from m", schema)
    with pytest.raises(StatementValidationError):
        _an("select distinct * from m", schema)


def test_group_by_distinct(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a query with a group by and a distinct clause",
    ):
        _an("select distinct sum(value) from m group by name", schema)


def test_first_without_group_by(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot execute a query with a non global aggregation without a groupBy field",
    ):
        _an("select first(value) from m", schema)


def test_sort_field_not_in_group(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot sort group by query result by a field not in group by clause",
    ):
        _an("select sum(value) from m group by name order by timestamp", schema)
    # value and the group field are fine
    _an("select sum(value) from m group by name order by value", schema)
    _an("select sum(value) from m group by name order by name", schema)


def test_aggregation_on_dimension_rejected(schema):
    with pytest.raises(
        StatementValidationError,
        match="Count And Count Distinct Aggregation can be applied",
    ):
        _an("select sum(height) from m group by name", schema)


def test_count_on_tag_allowed(schema):
    q = _an("select count(name) from m", schema)
    assert q.aggregations[0].target == "name"


def test_count_on_dimension_rejected(schema):
    with pytest.raises(StatementValidationError, match="Count And Count Distinct"):
        _an("select count(surname) from m", schema)


def test_multiple_counts_rejected(schema):
    with pytest.raises(StatementValidationError, match="Only one Count and one Count Distinct"):
        _an("select count(*), count(name) from m", schema)


def test_grace_period_only_temporal(schema):
    with pytest.raises(
        StatementValidationError, match="grace period clause is allowed only in temporal"
    ):
        _an("select * from m since 2h", schema)
    _an("select count(*) from m group by interval 30s since 2h", schema)


def test_comparison_on_varchar_rejected(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot use comparison operator on dimension different from numerical",
    ):
        _an("select * from m where name > 'a'", schema)


def test_like_on_numeric_rejected(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot use Like operator on dimension different from VARCHAR",
    ):
        _an("select * from m where age like 'a$'", schema)


def test_equality_type_mismatch(schema):
    with pytest.raises(
        StatementValidationError,
        match="cannot use equality operator on dimension different from BIGINT",
    ):
        _an("select * from m where age = 'abc'", schema)


def test_order_by_unknown_field(schema):
    with pytest.raises(StatementValidationError, match="field nope does not exist"):
        _an("select * from m order by nope", schema)


def test_zero_interval_rejected(schema):
    # grammar accepts "interval 0 s"; a zero-width bucket must be a
    # validation error, not a ZeroDivisionError in the compiler
    with pytest.raises(StatementValidationError, match="positive duration"):
        _an("select count(*) from m group by interval 0 s", schema)


def test_shard_col_is_reserved_field_name():
    from nsdb_spark.model import SchemaError

    with pytest.raises(SchemaError, match="reserved"):
        MetricSchema(
            NsdbType.BIGINT,
            {"shard_start": SchemaField(
                "shard_start", FieldClass.DIMENSION, NsdbType.BIGINT)},
        )
