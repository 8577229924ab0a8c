"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship LEFT JOIN ON TIMEOUT on sf0.001 (smoke).
queries()     — name -> fn(spark, sf_dir) -> DataFrame, one per operator
                implemented from SURVEY.md §2 (+ driver extensions).
oracle_sql()  — matching DuckDB SQL per query (omitted for ops that are
                not SQL-expressible; driver falls back to rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from left_join_on_timeout_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["timeout_left_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLE)
