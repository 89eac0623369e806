"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (NSDb group-by through the full engine
                 pipeline) on /root/testdata/sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 training-data extensions); see nsdb_spark/entry_queries.py.
oracle_sql()   — equivalent DuckDB SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nsdb_spark import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tag group-by aggregation through parse→analyze→compile."""
    fn = entry_queries.build_queries()["nsdb_groupby_sum"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.build_queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.build_oracles()
