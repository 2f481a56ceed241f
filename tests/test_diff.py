"""Differential compare (J1): the reference's oracle strategy
(compare.py:50-79) as a distributed report."""

from __future__ import annotations

from dynamodb_to_datalake_project_spark import diff


def test_identical_tables_clean(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    summary, samples = diff.compare(a, a)
    assert summary.identical
    assert samples == []


def test_detects_missing_extra_and_changed(spark):
    src = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["id", "v"])
    lake = spark.createDataFrame([(1, "x"), (2, "CHANGED"), (4, "extra")], ["id", "v"])
    summary, _ = diff.compare(src, lake)
    assert not summary.identical
    assert summary.source_rows == 3 and summary.lake_rows == 3
    # 2:y missing + 3:z missing = 2 source_only; 2:CHANGED + 4:extra = 2 lake_only
    assert summary.source_only == 2 and summary.lake_only == 2


def test_duplicate_rows_counted_as_bag(spark):
    src = spark.createDataFrame([(1, "x"), (1, "x")], ["id", "v"])
    lake = spark.createDataFrame([(1, "x")], ["id", "v"])
    summary, _ = diff.compare(src, lake)
    assert summary.source_only == 1 and summary.lake_only == 0
