"""Deterministic insert/update workload generator — the engine-side
equivalent of the reference's faker workload
(dynamodb_to_datalake/data_faker.py:131-163: ~70% inserts / 30%
updates, updates touch only note+update_at, amounts 1-1000).

Everything is derived from the row index with hash arithmetic (no RNG
state), so the same call always produces the same event log AND the
expected final table state is independently computable — which is what
the differential test strategy (SURVEY §5) needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import dedup

#: ISO format used by the reference for all timestamps
#: (dynamodb_table.py:11); lexicographic order == chronological order.
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

BASE_EPOCH = 1690000000  # 2023-07-22T05:06:40 UTC


def _account(col) -> F.Column:
    """DDD-DDD-DDDD account numbers (data_faker.py:36-43 shape)."""
    h = F.abs(F.xxhash64(col, F.lit("acct")))
    return F.format_string(
        "%03d-%03d-%04d",
        (h % 900 + 100).cast("int"),
        ((h / F.lit(1000)).cast("long") % 900 + 100).cast("int"),
        ((h / F.lit(1000000)).cast("long") % 9000 + 1000).cast("int"),
    )


def _iso(epoch_col) -> F.Column:
    return F.date_format(F.timestamp_seconds(epoch_col), ISO_FMT)


def generate_events(
    spark: SparkSession,
    n_base: int = 1000,
    updates_per_txn: int = 2,
    update_fraction_mod: int = 10,
    update_fraction_hits: int = 3,
    remove_every: int = 50,
) -> DataFrame:
    """Event log for the `transactions` table.

    - `n_base` INSERT events (one per key), create_at spaced 7s apart;
    - every key with index % update_fraction_mod < update_fraction_hits
      gets `updates_per_txn` MODIFY events (new update_at + note — the
      only mutable fields, README.rst:137);
    - every `remove_every`-th key gets a REMOVE event (must be ignored
      by the pipeline, README.rst:62).

    Columns: account, create_at, update_at, entity, amount, is_credit,
    note, event_name, seq (global event order).
    """
    base = (
        spark.range(n_base)
        .withColumn("account", _account(F.col("id")))
        .withColumn("create_epoch", F.lit(BASE_EPOCH) + F.col("id") * 7)
        .withColumn("create_at", _iso("create_epoch"))
        .withColumn(
            "entity",
            F.concat(F.lit("Entity "), (F.abs(F.xxhash64("id", F.lit("e"))) % 500).cast("string")),
        )
        .withColumn("amount", (F.abs(F.xxhash64("id", F.lit("amt"))) % 1000 + 1))
        .withColumn("is_credit", (F.abs(F.xxhash64("id", F.lit("cr"))) % 2))
    )
    inserts = base.select(
        "id",
        "account",
        "create_at",
        F.col("create_at").alias("update_at"),
        "entity",
        "amount",
        "is_credit",
        F.lit("insert v0").alias("note"),
        F.lit("INSERT").alias("event_name"),
        (F.col("id") * 100).alias("seq"),
    )
    events = inserts
    upd_base = base.filter(F.col("id") % update_fraction_mod < update_fraction_hits)
    for k in range(1, updates_per_txn + 1):
        upd = upd_base.select(
            "id",
            "account",
            "create_at",
            _iso(F.col("create_epoch") + k * 3600).alias("update_at"),
            "entity",
            "amount",
            "is_credit",
            F.concat(F.lit(f"update v{k} note "), (F.abs(F.xxhash64("id", F.lit(k))) % 1000).cast("string")).alias("note"),
            F.lit("MODIFY").alias("event_name"),
            (F.col("id") * 100 + k).alias("seq"),
        )
        events = events.unionByName(upd)
    removes = base.filter(F.col("id") % remove_every == 0).select(
        "id",
        "account",
        "create_at",
        _iso(F.col("create_epoch") + 99 * 3600).alias("update_at"),
        "entity",
        "amount",
        "is_credit",
        F.lit(None).cast("string").alias("note"),
        F.lit("REMOVE").alias("event_name"),
        (F.col("id") * 100 + 99).alias("seq"),
    )
    return events.unionByName(removes).drop("id")


def expected_final_state(events: DataFrame) -> DataFrame:
    """Oracle: latest non-REMOVE event per (account, create_at) — what
    the lake table must equal after the full pipeline (deletes are
    ignored by design, T8)."""
    live = events.filter(F.col("event_name") != "REMOVE")
    return dedup.latest_wins(
        live, ["account", "create_at"], ["update_at", "seq"]
    ).drop("event_name", "seq")
