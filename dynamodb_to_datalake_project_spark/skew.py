"""Skew mitigation primitives.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these helpers cover the two cases it can't:

- `salted_aggregate`: a single hot group key overwhelms one reducer
  during a shuffle aggregation. Two-phase: aggregate on (key, salt)
  first (spreads the hot key over `n_salts` reducers with map-side
  partial aggregation), then combine partials per key. Works for any
  algebraic aggregate given its (partial, combine) pair.
- `salted_broadcast_join`: a large fact side with hot join keys
  against a small-but-not-tiny dim. The dim is exploded n_salts times
  (replicated per salt), the fact side gets a random-but-deterministic
  salt from a row hash — every fact row still meets its dim row exactly
  once, but a hot key's rows are spread across n_salts tasks.

At 100 TB, skew is the difference between a 20-minute job and a
6-hour straggler; these keep the hot-key path O(rows/n_salts) per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) from a full-row hash
    (no rand(): deterministic across retries, which a recomputed task
    requires for correctness)."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
    return df.withColumn(salt_col, (h % n_salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with `partial_aggs`,
    then groupBy(keys) with `final_aggs` over the partial columns.

    Example (count + sum):
        partial = [F.count("*").alias("c"), F.sum("v").alias("s")]
        final   = [F.sum("c").alias("n"), F.sum("s").alias("total")]
    """
    # Mix a per-row ordinal into the salt: a hot key of fully-identical
    # rows would otherwise hash to ONE salt and not spread at all. Any
    # salt assignment yields correct aggregates (the final phase
    # re-combines), so the ordinal's partition-layout sensitivity is
    # harmless here — do NOT reuse this for joins.
    h = F.abs(F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in df.columns]))
    salted = df.withColumn("__salt", (h % n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot fact keys: replicate the dim once per
    salt, salt the fact rows, join on (keys + salt). `how` supports
    'inner' and 'left' (fact side preserved; each fact row meets its
    dim row in exactly one salt replica, so no duplication either way)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_broadcast_join supports inner/left, got {how}")
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    fact_s = with_salt(fact, n_salts)
    return fact_s.join(F.broadcast(dim_rep), on + ["__salt"], how).drop("__salt")


@query(
    "skew_salted_event_stats",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q_skew_salted_event_stats(spark, sf_dir):
    """Hot-key aggregation through the salted two-phase path: the
    events table's handful of event_type keys is the canonical skew
    shape (every row lands on ≤5 reducers in a naive groupBy). The
    salt spreads phase 1 across n_salts × keys reducers; phase 2
    recombines the bounded partials. The DuckDB oracle computes the
    plain group-by — salting must be a pure execution detail with zero
    semantic footprint, and the hash compare proves it (decimal sums
    keep the two accumulation orders bit-identical)."""
    from dynamodb_to_datalake_project_spark.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev.select("event_type", "value"),
        keys=["event_type"],
        partial_aggs=[
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("s"),
        ],
        final_aggs=[
            F.sum("c").alias("n"),
            F.sum("s").cast("double").alias("total_value"),
        ],
    )
