"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``datamodel_clinicaldata_spark.registry``: the engine's
query inventory (one entry per implemented operator from SURVEY.md §2 plus
the extension surface) and the matching DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datamodel_clinicaldata_spark.pipeline import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001", cohort="week")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datamodel_clinicaldata_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datamodel_clinicaldata_spark.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
