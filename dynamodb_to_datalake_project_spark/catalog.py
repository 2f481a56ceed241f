"""Query catalog: named operators → (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 (and the LLM north-star set) registers
here; `__spark_entry__.py::queries()/oracle_sql()` is a thin view over
this registry. Builders take `(spark, sf_dir)` and return a DataFrame;
oracle SQL is ANSI SQL DuckDB runs over the same parquet fixtures
(views: region nation customer supplier part orders lineitem events
documents embeddings).

Contract discipline (driver compares by sorted-column value hash):
- alias every computed column IDENTICALLY on both sides;
- round double aggregates on both sides (same ndigits) so accumulation
  order can't flip a bit;
- cast integer-ish computed outputs to BIGINT on both sides (DuckDB
  sum(int) is HUGEINT, len() is BIGINT; Spark size() is INT);
- every LIMIT/top-k query carries a full deterministic ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder, optionally with its DuckDB oracle SQL.

    Builders registered without oracle SQL get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops:
    minhash/simhash banding, LSH bucketing, streaming state).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import dynamodb_to_datalake_project_spark.queries  # noqa: F401
    import dynamodb_to_datalake_project_spark.transform  # noqa: F401
    import dynamodb_to_datalake_project_spark.dedup  # noqa: F401
    import dynamodb_to_datalake_project_spark.merge  # noqa: F401
    import dynamodb_to_datalake_project_spark.diff  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.text  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.dedup  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.similarity  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.multimodal  # noqa: F401
