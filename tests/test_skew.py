"""Salting primitives: skewed computations must produce exactly the
unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import skew


def _skewed(spark):
    # 10k rows for the hot key, a few for others
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_aggregate_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in skew.salted_aggregate(
            df,
            ["k"],
            partial_aggs=[F.count("*").alias("c"), F.sum("v").alias("s")],
            final_aggs=[F.sum("c").alias("n"), F.sum("s").alias("total")],
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("c1", "c1-dim"), ("c3", "c3-dim")], ["k", "label"]
    )
    direct = sorted(
        (r.k, r.v, r.label) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.label)
        for r in skew.salted_broadcast_join(fact, dim, ["k"]).collect()
    )
    assert salted == direct
    assert len(direct) == 10000 + 10 + 10  # HOT + c1 + c3 matches


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([("HOT", 1.0), ("orphan", 2.0)], ["k", "v"])
    dim = spark.createDataFrame([("HOT", "d")], ["k", "label"])
    out = {(r.k, r.label) for r in skew.salted_broadcast_join(fact, dim, ["k"], how="left").collect()}
    assert out == {("HOT", "d"), ("orphan", None)}
