"""Driver contract for the spark-graft builder (PySpark target).

Thin view over `dynamodb_to_datalake_project_spark.catalog`: every
operator from SURVEY.md §2 (plus LLM north-star ops) registers a
builder and, when SQL-expressible, a DuckDB oracle there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamodb_to_datalake_project_spark import catalog
from dynamodb_to_datalake_project_spark.session import tune

catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    tune(spark)
    return catalog.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE)
