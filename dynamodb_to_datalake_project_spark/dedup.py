"""Keyed deduplication: latest-wins (W1) and top-k per key (W2).

Reference semantics: partition by record key, order by precombine column
descending, keep row 1 (glue_jobs/incremental.py:154-163) — the Hudi
precombine contract. Generalized here to arbitrary key/order columns.

Scale: `row_number` over `Window.partitionBy(keys)` is a single hash
shuffle on the keys with partial in-memory sort per partition — the same
shuffle the subsequent merge join needs, so AQE can reuse the exchange.
Skewed keys are handled by AQE skew-join splitting at the merge, not
here (a skewed dedup window means a hot entity key; salting would break
latest-wins, so the mitigation is upstream bucketing by key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def _sort_cols(order_by: list[str | Column]) -> list[Column]:
    """Bare column names mean 'greatest wins' (DESC); pass Column
    expressions (`F.col(c).asc()`) for explicit directions."""
    return [F.col(c).desc() if isinstance(c, str) else c for c in order_by]


def latest_wins(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
) -> DataFrame:
    """W1: keep exactly one row per key — the greatest `order_by` tuple.

    `order_by` should end with a unique tiebreaker so the result is
    deterministic (the reference relies on update_at alone;
    FIXTURES.md's "same key twice in one minute" case needs the
    tiebreak).
    """
    w = Window.partitionBy(*keys).orderBy(*_sort_cols(order_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """W2: k greatest rows per key (reference: '3 most recent
    transactions of an account', data_faker.py:104-111)."""
    w = Window.partitionBy(*keys).orderBy(*_sort_cols(order_by))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def salted_top_k_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
    k: int,
    n_salts: int = 32,
    rank_col: str = "rnk",
) -> DataFrame:
    """Skew-safe W2: identical output to `top_k_per_key`, for the case
    where key cardinality is far below the core count (or one key is
    hot) and a single window task per key would serialize the scan.

    Phase 1 ranks within (key, salt) — n_salts× the parallelism — and
    keeps k rows per salt group: any row in a key's global top-k is
    necessarily in its own salt group's top-k, so no qualifying row is
    lost. Phase 2 re-ranks only the ≤ n_salts·k survivors per key.
    The salt is a deterministic row hash (`skew.with_salt`), so
    recomputed tasks rank identical groups; which salt a row lands in
    cannot change the final rank (phase 2 orders globally per key)."""
    from dynamodb_to_datalake_project_spark.skew import with_salt

    order = _sort_cols(order_by)
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    partial = (
        with_salt(df, n_salts)
        .withColumn("__prn", F.row_number().over(w1))
        .filter(F.col("__prn") <= k)
        .drop("__salt", "__prn")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return partial.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )


@query(
    "w1_latest_wins",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_wins(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return latest_wins(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


@query(
    "w2_topk_per_key",
    oracle="""
    SELECT event_type, rnk, event_id, user_id, value
    FROM (
      SELECT event_type, event_id, user_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
)
def q_topk_per_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ranked = top_k_per_key(
        ev, ["event_type"], [F.col("value").desc(), F.col("event_id").asc()], k=3
    )
    return ranked.select("event_type", "rnk", "event_id", "user_id", "value")
