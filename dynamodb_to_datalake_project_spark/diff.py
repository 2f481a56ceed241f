"""Differential table comparison (J1) — the reference's correctness
oracle, distributed.

The reference collects BOTH full tables to the driver, sorts, and zips
row-by-row (compare.py:50-79) — O(table) driver memory, impossible at
scale. Here the same report derives from `exceptAll` in both directions
(bag semantics, so duplicate rows are counted correctly), which Catalyst
executes as a single hash-partition exchange per side; nothing larger
than the mismatch set ever leaves the executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def diff_report(source: DataFrame, lake: DataFrame, side_col: str = "side") -> DataFrame:
    """Rows present on exactly one side, tagged `source_only`/`lake_only`.

    Empty result == tables identical (as bags). Column sets must match.
    """
    cols = source.columns
    lake = lake.select(*cols)
    return (
        source.exceptAll(lake)
        .withColumn(side_col, F.lit("source_only"))
        .unionByName(lake.exceptAll(source).withColumn(side_col, F.lit("lake_only")))
    )


@dataclass
class DiffSummary:
    source_rows: int
    lake_rows: int
    source_only: int
    lake_only: int

    @property
    def identical(self) -> bool:
        return self.source_only == 0 and self.lake_only == 0


def compare(source: DataFrame, lake: DataFrame, sample: int = 10) -> tuple[DiffSummary, list]:
    """Reference-compatible compare: counts + first N mismatches
    (compare.py prints first 10 diffs). One job for the counts, one
    bounded `take` for the sample."""
    d = diff_report(source, lake).cache()
    try:
        by_side = {r["side"]: r["n"] for r in d.groupBy("side").agg(F.count("*").alias("n")).collect()}
        summary = DiffSummary(
            source_rows=source.count(),
            lake_rows=lake.count(),
            source_only=by_side.get("source_only", 0),
            lake_only=by_side.get("lake_only", 0),
        )
        return summary, d.take(sample)
    finally:
        d.unpersist()


@query(
    "j1_full_diff",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), lake AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
    )
    SELECT *, 'source_only' AS side FROM (SELECT * FROM src EXCEPT ALL SELECT * FROM lake)
    UNION ALL
    SELECT *, 'lake_only' AS side FROM (SELECT * FROM lake EXCEPT ALL SELECT * FROM src)
    """,
)
def q_full_diff(spark, sf_dir):
    """J1 over a deterministic perturbation: `lake` drops every 97th key
    (missing rows) and corrupts every 101st price (value drift); the
    diff report must surface exactly those."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    lake = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return diff_report(src, lake)
