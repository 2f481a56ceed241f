"""Streaming continuous-aggregate maintenance: a tiny versioned rollup
table with exactly-once additive refresh and time travel.

Why this exists: `foreachBatch` + additive merge is NOT naturally
idempotent — a micro-batch replayed after a crash would be added
TWICE (unlike the latest-wins upsert sink, where re-merge is a no-op).
The fix is an epoch fence: each refresh writes a new immutable version
directory and commits `{version, last_epoch}` in ONE atomic pointer
swap; a replayed epoch ≤ `last_epoch` is skipped. Old versions remain
readable (time travel) until vacuumed.

At 100 TB the rollup table is the SMALL side (bounded by key
cardinality, e.g. hours × event types), so full-version rewrites are
cheap; the raw event history is never rescanned — each refresh costs
one micro-batch aggregation plus one rollup-sized union-agg.

Reference parity: the reference rescans raw data per Athena query
(README.rst "Analytics query") and its Hudi timeline provides the
commit atomicity this pointer swap mirrors.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.timeseries import combine_rollup_partials

_POINTER = "_latest.json"


def _read_pointer(path: str) -> dict:
    p = os.path.join(path, _POINTER)
    if not os.path.isfile(p):
        return {"version": -1, "last_epoch": -1}
    with open(p) as f:
        return json.load(f)


def _commit_pointer(path: str, version: int, last_epoch: int) -> None:
    """Single atomic commit: version visibility and the epoch fence
    move together, so a crash can never double-apply a batch (pointer
    not swapped → replay re-runs on the OLD version; swapped → replay
    is fenced out by `last_epoch`). The orphaned version directory a
    pre-swap crash leaves behind is inert garbage for `vacuum`."""
    tmp = os.path.join(path, f".{_POINTER}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "last_epoch": last_epoch}, f)
    os.replace(tmp, os.path.join(path, _POINTER))


def read_rollup(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read the current (or a time-travel `version`) rollup snapshot."""
    v = _read_pointer(path)["version"] if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed rollup version at {path}")
    return spark.read.parquet(os.path.join(path, f"v{v}"))


def list_versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(path) if d.startswith("v") and d[1:].isdigit()
    )


def vacuum_rollup(path: str, keep: int = 2) -> list[int]:
    """Drop all but the newest `keep` versions (never the committed
    one). Returns the removed version numbers."""
    committed = _read_pointer(path)["version"]
    versions = list_versions(path)
    drop = [v for v in versions[:-keep] if v != committed] if keep else []
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v{v}"), ignore_errors=True)
    return drop


def make_rollup_batch_fn(rollup_path: str, keys: list[str], partials_fn, merge_agg=None):
    """foreachBatch body: exactly-once mergeable refresh.

    `partials_fn(batch_df) -> DataFrame` aggregates a micro-batch to
    mergeable partials keyed by `keys` — additive columns (counts,
    exact-decimal sums) by default, non-additive mergeable summaries
    (e.g. HLL sketch columns) via `merge_agg` (see
    `combine_rollup_partials`)."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        os.makedirs(rollup_path, exist_ok=True)
        meta = _read_pointer(rollup_path)
        if epoch_id <= meta["last_epoch"]:
            return  # replayed batch — already folded into a committed version
        delta = partials_fn(batch_df)
        if meta["version"] >= 0:
            stored = batch_df.sparkSession.read.parquet(
                os.path.join(rollup_path, f"v{meta['version']}")
            )
            merged = combine_rollup_partials(stored, delta, keys, merge_agg)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            os.path.join(rollup_path, f"v{epoch_id}")
        )
        _commit_pointer(rollup_path, int(epoch_id), int(epoch_id))

    return process_batch


def start_rollup_maintenance(
    spark: SparkSession,
    cdc_dir: str,
    schema,
    rollup_path: str,
    checkpoint_dir: str,
    keys: list[str],
    partials_fn,
    max_files_per_trigger: int = 100,
    processing_time: str = "0 seconds",
    merge_agg=None,
):
    """Continuous-aggregate pipeline: CDC file stream → per-batch
    partial aggregation → exactly-once mergeable merge into the
    versioned rollup table. Restart-safe from `checkpoint_dir` (a
    replayed batch is fenced by its epoch)."""
    from dynamodb_to_datalake_project_spark.cdc import read_cdc_stream

    stream = read_cdc_stream(spark, cdc_dir, schema, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(
            make_rollup_batch_fn(rollup_path, keys, partials_fn, merge_agg)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_time)
        .start()
    )


def hourly_event_partials(batch: DataFrame) -> DataFrame:
    """The standard events-table partial set: per (hour, event_type)
    exact count + exact-decimal value sum (additive, order-free)."""
    return batch.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )


def hourly_user_sketch_partials(batch: DataFrame) -> DataFrame:
    """Distinct-user partials: per (hour, event_type) count + a
    DataSketches HLL sketch of user_id. COUNT(DISTINCT) is not
    mergeable — a stored distinct count cannot absorb a new batch
    without rescanning raw history — so the rollup stores the sketch
    (binary, ≤ 2^lgK bytes/key) and each refresh unions the batch's
    sketch in via `SKETCH_MERGE` (`F.hll_union_agg`). Any grain
    coarsening (hour→day→month) likewise unions stored sketches, raw
    rows never rescanned."""
    return batch.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.hll_sketch_agg("user_id", F.lit(12)).alias("users_hll"),
    )


#: merge_agg mapping for `hourly_user_sketch_partials` rollups
SKETCH_MERGE = {"users_hll": F.hll_union_agg}


def cms_user_partials(batch: DataFrame) -> DataFrame:
    """Frequency-sketch partials: ONE count-min table (depth, bucket,
    cnt) over the batch's user_id stream. CMS counts are additive, so
    the default `F.sum` merge in `combine_rollup_partials` maintains
    the GLOBAL sketch exactly-once with BOUNDED state: the stored
    rollup never exceeds depth*width rows (2k cells) no matter how
    many distinct users raw history holds — point-frequency estimates
    over an unbounded key universe from stored aggregates alone, raw
    rows never rescanned. Same md5 hash as the batch
    `llm.sketch.cms_build`, so the maintained table equals a
    one-shot sketch of all history cell-for-cell (asserted in
    test_cdc.py) and stays DuckDB-replayable."""
    from dynamodb_to_datalake_project_spark.llm.sketch import cms_build

    return cms_build(
        batch.select(F.col("user_id").cast("string").alias("item")), "item"
    )


def quantile_grid_partials(batch: DataFrame) -> DataFrame:
    """Quantile-sketch partials: one 256-bucket grid over the batch's
    value column (known fixture range [0, 1000)). Like
    `cms_user_partials`, grid counts are additive, so the default SUM
    merge maintains the GLOBAL quantile sketch exactly-once with
    bounded (<= 256 rows) state — percentiles over all history read
    from stored aggregates, raw rows never rescanned (exact
    percentiles cannot be maintained this way: rank queries are not
    additive)."""
    from dynamodb_to_datalake_project_spark.llm.sketch import quantile_grid_build

    return quantile_grid_build(batch, "value", 0.0, 1000.0, 256)
