"""Keyed upsert with precombine semantics (S8) — the Hudi-merge
equivalent without Hudi.

Reference contract (glue_jobs/incremental.py:172-194): upsert on record
key `id` with precombine field `update_at` — an incoming row replaces
the stored row only if its precombine tuple is greater; late-arriving
older updates must lose; the operation is idempotent (T9 snapshot/stream
overlap reconciliation, README.rst:42-43).

Two implementations:
- `upsert_dataframes`: pure-DataFrame merge for in-memory pipelines and
  `foreachBatch` sinks. union + latest-wins window = one shuffle on the
  key; no driver-side data movement.
- `merge_into_parquet`: lake-table merge that rewrites ONLY the
  partitions touched by the incoming batch (dynamic partition
  overwrite). At 100 TB the target table is huge but a CDC batch
  touches a handful of time partitions — reading and rewriting just
  those keeps merge cost proportional to the batch, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import dedup
from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def upsert_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    precombine: list[str],
) -> DataFrame:
    """Latest-wins merge of `source` into `target`.

    Equivalent to
    `MERGE INTO t USING s ON keys WHEN MATCHED AND s.pc > t.pc THEN
    UPDATE WHEN NOT MATCHED THEN INSERT` — expressed as
    union + windowed dedup so in-batch duplicate keys (FIXTURES.md case
    'same key twice in one partition') collapse in the same pass.
    Precombine ties break toward `source` (`__src` ordinal), matching
    upsert-overwrites-on-equal semantics.
    """
    cols = target.columns
    tagged = target.select(*cols).withColumn("__src", F.lit(0)).unionByName(
        source.select(*cols).withColumn("__src", F.lit(1))
    )
    order = [F.col(c).desc() for c in precombine] + [F.col("__src").desc()]
    return dedup.latest_wins(tagged, keys, order).drop("__src")


def touched_partitions(source: DataFrame, partition_cols: list[str]) -> list[dict]:
    """Distinct partition tuples present in the incoming batch.

    The collect is bounded by the number of partitions in ONE batch
    (minutes of data), not table size — safe at scale.
    """
    return [
        r.asDict() for r in source.select(*partition_cols).distinct().collect()
    ]


def merge_into_parquet(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    precombine: list[str],
    partition_cols: list[str],
    max_touched_partitions: int = 2000,
) -> None:
    """Merge a batch into a partitioned parquet lake table, rewriting
    only touched partitions.

    1. derive touched partition tuples from the batch (small collect);
    2. read only those partitions of the target (partition pruning via
       predicate on partition columns);
    3. union + latest-wins dedup;
    4. dynamic-partition-overwrite write-back — untouched partitions'
       files are never read or rewritten.

    NOTE: assumes the partition columns are derived from immutable key
    fields (the reference partitions the lake by create_at — immutable
    per README.rst:137 — exactly so updates can't move a row across
    partitions).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    parts = touched_partitions(source, partition_cols)
    if not parts:
        return
    if len(parts) > max_touched_partitions:
        # A batch touching thousands of partitions (e.g. a backfill)
        # degrades to a full-table merge: one OR-clause per partition
        # would bloat analysis and the write rewrites most of the table
        # anyway. Correctness is identical; only pruning is skipped.
        parts = None
    from pyspark.errors import AnalysisException

    try:
        target = spark.read.parquet(table_path)
    except AnalysisException as e:
        # ONLY a missing/uninitialized table means "first batch": write
        # the deduped batch as the table. Any other failure (transient
        # IO, permissions, corrupt footer) must propagate — treating it
        # as first-batch would overwrite real partitions with batch-only
        # rows.
        cond = getattr(e, "getErrorClass", lambda: "")() or str(e)
        if not ("PATH_NOT_FOUND" in cond or "UNABLE_TO_INFER_SCHEMA" in cond):
            raise
        deduped = dedup.latest_wins(source, keys, [F.col(c).desc() for c in precombine])
        deduped.write.mode("overwrite").partitionBy(*partition_cols).parquet(table_path)
        return
    if parts is None:
        existing = target
    else:
        pred = F.lit(False)
        for p in parts:
            clause = F.lit(True)
            for c in partition_cols:
                # eqNullSafe: a null partition value (e.g. from an
                # unparseable timestamp) must still match its existing
                # partition — plain == excludes those rows and the
                # dynamic overwrite would then drop them.
                clause = clause & F.col(c).eqNullSafe(F.lit(p[c]))
            pred = pred | clause
        existing = target.filter(pred)
    merged = upsert_dataframes(existing, source.select(*target.columns), keys, precombine)
    (
        merged.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(table_path)
    )


@query(
    "s8_upsert_merge",
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
def q_upsert_merge(spark, sf_dir):
    """S8 as a checkable batch query: snapshot = latest state per user
    before a cutoff; CDC batch = all later events; merged table must
    equal the independent 'global latest per user' oracle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cutoff = "2024-01-15 00:00:00"
    snapshot = dedup.latest_wins(
        ev.filter(F.col("ts") < cutoff), ["user_id"], ["ts", "event_id"]
    )
    cdc = ev.filter(F.col("ts") >= cutoff)
    return upsert_dataframes(
        snapshot, cdc, keys=["user_id"], precombine=["ts", "event_id"]
    )
