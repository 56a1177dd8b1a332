"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC delta on sf0.001; ``queries`` /
``oracle_sql`` expose one entry per implemented operator from SURVEY.md §2
with a DuckDB-equivalent ANSI-SQL oracle (see
``bcdc2bcdc_spark/driver_queries.py`` for the side-by-side definitions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bcdc2bcdc_spark.driver_queries import ORACLES, QUERIES, q_cdc_delta


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: CDC snapshot delta (full-outer diff + digest
    classification) over the change-event view derived from lineitem."""
    return q_cdc_delta(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
