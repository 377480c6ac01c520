"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over kafka_streams_homework_spark.queries — the named-query
registry holding every implemented operator from SURVEY.md §2/§7, each
with a DuckDB oracle twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_homework_spark import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's full alert pipeline) on sf0.001."""
    return Q.q_price_alerts(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
