"""PySpark-native analytics & CDC-lake engine.

A brand-new engine with the query and data-processing capabilities of
MacHu-GWU/dynamodb_to_datalake-project (see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst/AQE, Structured
Streaming for CDC, and partition-parallel LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Nothing here is a port of the reference's Lambda/Glue/Athena topology;
the reference defines *what* to compute (operator inventory in
SURVEY.md §2), this package defines *how* on Spark.
"""

from dynamodb_to_datalake_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
