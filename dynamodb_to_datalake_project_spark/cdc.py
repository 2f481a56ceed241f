"""CDC micro-batch streaming (SURVEY.md §2.8 T1-T9) on Structured
Streaming.

The reference implements streaming *manually*: a consumer Lambda
buffers DynamoDB Stream records (100 records / 10 s), writes
minute-partitioned JSON drops, and a 330-line tracker state machine
(incremental_load_orchestration.py:39-154) plus a cron loop schedules
bounded Glue runs with a 2-minute late-data lag. All of that collapses
into one Structured Streaming query:

- T1 trigger            → `trigger(processingTime=...)`
- T2 event-time windows → `F.window(ts, "1 minute")`
- T3 late-data lag      → `withWatermark(ts, "2 minutes")`
- T4 offset tracker     → `option("checkpointLocation", ...)`
- T5 single-flight      → one streaming query = serial micro-batches
- T6 bounded batches    → `maxFilesPerTrigger`
- T7 stateful upsert    → `foreachBatch(merge)`
- T8 delete policy      → REMOVE filter inside the batch fn
- T9 snapshot handoff   → overlap safe because the merge is idempotent
                          on (key, precombine)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark import merge as merge_mod


def read_cdc_stream(
    spark: SparkSession,
    cdc_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """S6: file-source CDC stream over JSON drops (the reference's
    Lambda output layout). In AWS this source swaps for Kinesis; the
    downstream plan is identical."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .json(cdc_dir)
    )


def start_cdc_merge(
    spark: SparkSession,
    cdc_dir: str,
    schema: T.StructType,
    table_path: str,
    keys: list[str],
    precombine: list[str],
    partition_cols: list[str],
    checkpoint_dir: str,
    event_type_col: str | None = None,
    drop_event_types: tuple[str, ...] = ("REMOVE",),
    max_files_per_trigger: int = 100,
    processing_time: str = "0 seconds",
    batch_transform=None,
    delete_mode: str = "drop",
):
    """The whole incremental pipeline as one streaming query.

    Each micro-batch: filter deletes (T8/F1, policy per `delete_mode`)
    → optional `batch_transform` (derive surrogate key / partition
    columns) → in-batch latest-wins dedup happens inside the merge →
    partition-pruned upsert into the lake table (T7). Restarting from
    `checkpoint_dir` neither loses nor re-applies batches beyond
    idempotent re-merge (T4/T9).
    """
    stream = read_cdc_stream(spark, cdc_dir, schema, max_files_per_trigger)
    process_batch = make_merge_batch_fn(
        table_path, keys, precombine, partition_cols,
        event_type_col=event_type_col,
        drop_event_types=drop_event_types,
        batch_transform=batch_transform,
        delete_mode=delete_mode,
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_time)
        .start()
    )


def make_merge_batch_fn(
    table_path: str,
    keys: list[str],
    precombine: list[str],
    partition_cols: list[str],
    event_type_col: str | None = None,
    drop_event_types: tuple[str, ...] = ("REMOVE",),
    batch_transform=None,
    delete_mode: str = "drop",
):
    """The single foreachBatch body both incremental pipelines share
    (flat drops and wire-level records) — one place for the T8 delete
    policy and the merge call, so fixes can't drift between copies.

    T8 delete policy, two modes:
    - "drop" (default, reference parity README.rst:62): delete events
      are filtered out of the batch — the lake keeps the last pre-delete
      image of the row.
    - "hard": delete events flow into the merge as `WHEN MATCHED AND
      op IN drop_event_types THEN DELETE` — a delete newer than the
      stored row removes the key from the lake (late older deletes are
      no-ops; see `merge.upsert_dataframes`).

    NULL event types are KEPT: ~isin() alone is three-valued NULL for
    them, which filter() would silently drop — only the listed types
    are deletes (T8).
    """
    if delete_mode not in ("drop", "hard"):
        raise ValueError(f"delete_mode must be 'drop' or 'hard', got {delete_mode!r}")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        op_col = None
        if event_type_col and event_type_col in batch_df.columns:
            if delete_mode == "drop":
                batch_df = batch_df.filter(
                    (~F.col(event_type_col).isin(*drop_event_types))
                    | F.col(event_type_col).isNull()
                ).drop(event_type_col)
            else:
                op_col = event_type_col
        if batch_transform is not None:
            batch_df = batch_transform(batch_df)
            if op_col is not None and op_col not in batch_df.columns:
                # in hard mode the transform sees the op column (unlike
                # drop mode, where it's stripped first); a transform
                # that projects a fixed column list would silently
                # disable deletes — fail loudly instead
                raise ValueError(
                    f"batch_transform dropped {op_col!r}; delete_mode='hard' "
                    "requires the transform to preserve the event-type column"
                )
        merge_mod.merge_into_parquet(
            batch_df.sparkSession,
            table_path,
            batch_df,
            keys=keys,
            precombine=precombine,
            partition_cols=partition_cols,
            op_col=op_col,
            delete_types=drop_event_types,
        )

    return process_batch


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """T2+T3: tumbling event-time aggregation with late-data watermark —
    the reference's minute-bucketing of CDC records
    (dynamodb_stream_consumer.py:61-68) plus its 2-minute on-the-fly
    allowance (incremental_load_orchestration.py:204), natively."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n",
        )
    )


def stateful_latest(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
):
    """Custom stateful streaming operator: per-key latest (ts, value),
    maintained in GroupState across micro-batches via
    `applyInPandasWithState` — the arbitrary-stateful escape hatch for
    semantics `groupBy(window)` can't express (here: emit the CURRENT
    winner per key every batch, late/stale events never regress state).

    Unlike the foreachBatch+merge sink (which persists state in the
    lake table itself), this keeps state in the streaming state store —
    the shape a low-latency materialized view uses.
    """
    import pandas as pd

    out_schema = f"{key_col} string, {ts_col} string, {value_col} string"
    state_schema = f"{ts_col} string, {value_col} string"

    def update_fn(key, pdfs, state):
        best_ts, best_val = state.get if state.exists else (None, None)
        for pdf in pdfs:
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                if best_ts is None or ts > best_ts:
                    best_ts, best_val = ts, val
        state.update((best_ts, best_val))
        yield pd.DataFrame(
            {key_col: [key[0]], ts_col: [best_ts], value_col: [best_val]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stream_pattern_detect(
    stream: DataFrame,
    steps: "list[str]",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int = 3600,
):
    """CEP-lite ordered-sequence detection on a STREAM: emit one row
    per key each time its events complete `steps` in order within
    `within_s` seconds of the matched first step — the streaming twin
    of the batch `timeseries.funnel_conversion` (which measures
    completed funnels at rest; this fires as they complete). Built on
    `applyInPandasWithState`: per-key GroupState holds (stage,
    started_ts) — a few bytes per key, independent of event volume.

    Semantics: a per-key state machine advances on events processed in
    (ts, type) order WITHIN each micro-batch and batch-arrival order
    across batches (the standard stateful-streaming contract — events
    that arrive in a later batch with earlier timestamps are late by
    definition and do not rewind the machine). An event matching
    step 0 (re)arms the machine when it is idle; an over-deadline
    event resets it, immediately re-arming if that event is itself a
    step-0 match. On completion the machine emits (key, started_ts,
    matched_ts, elapsed_s) and resets, so repeated journeys keep
    firing. State survives query restarts through the checkpointed
    state store (asserted in test_cdc.py: a pattern STARTED before a
    restart completes after it)."""
    import pandas as pd

    if not steps:
        raise ValueError("stream_pattern_detect: empty step list")
    out_schema = (
        f"{key_col} string, started_ts string, matched_ts string, elapsed_s long"
    )
    state_schema = "stage int, started string"

    def update_fn(key, pdfs, state):
        stage, started = state.get if state.exists else (0, None)
        hits = {"k": [], "s": [], "m": [], "e": []}
        rows = []
        for pdf in pdfs:
            # columnar extraction (astype(str) + zip) — iterrows() here
            # would rebuild a Series per event and negate the Arrow
            # batching this operator's scale story relies on (ADVICE r6)
            rows.extend(
                zip(pdf[ts_col].astype(str), pdf[type_col].astype(str))
            )
        for ts, etype in sorted(rows):
            if started is not None and _iso_delta_s(started, ts) > within_s:
                stage, started = 0, None  # deadline blown: reset...
            if stage == 0:
                if etype == steps[0]:  # ...and possibly re-arm
                    stage, started = 1, ts
            elif etype == steps[stage]:
                stage += 1
            if stage == len(steps):
                hits["k"].append(str(key[0]))
                hits["s"].append(started)
                hits["m"].append(ts)
                hits["e"].append(int(_iso_delta_s(started, ts)))
                stage, started = 0, None
        state.update((stage, started))
        yield pd.DataFrame(
            {key_col: hits["k"], "started_ts": hits["s"],
             "matched_ts": hits["m"], "elapsed_s": hits["e"]}
        )

    return stream.withColumn(ts_col, F.col(ts_col).cast("string")).groupBy(
        key_col
    ).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def start_session_windows(
    spark: SparkSession,
    cdc_dir: str,
    schema: T.StructType,
    out_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    agg_col: str | None = None,
    max_files_per_trigger: int = 100,
):
    """Streaming gap-sessionization — the streaming twin of the batch
    `timeseries` sessionize family (same gap semantics: an event within
    `gap` of the session extends it; session_end = last event + gap).
    `F.session_window` merges events into variable-length sessions per
    key inside the state store; the watermark finalizes a session once
    event time passes its close, and append mode emits each FINALIZED
    session exactly once. The sink is Spark's transactional parquet
    file sink (`_spark_metadata` commit log), so a restart from
    `checkpoint_dir` neither loses nor re-emits sessions — the T4/T9
    contract extended to sessions.

    Scale shape: state is ONE open session row per active key
    (start/end/aggregates), independent of event volume, and the
    watermark bounds its lifetime. The batch twin re-shuffles all
    history every run; this holds only open sessions — the only viable
    shape at 100 TB/day of events."""
    stream = read_cdc_stream(spark, cdc_dir, schema, max_files_per_trigger)
    aggs = [F.count("*").alias("n_events")]
    extra = []
    if agg_col is not None:
        aggs.append(F.sum(agg_col).alias(f"sum_{agg_col}"))
        extra = [f"sum_{agg_col}"]
    sessions = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *extra,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _iso_delta_s(a: str, b: str) -> float:
    """Seconds between two ISO/'YYYY-MM-DD HH:MM:SS' timestamp strings
    (state-store-friendly string timestamps, like `stateful_latest`)."""
    from datetime import datetime

    fmt = "%Y-%m-%d %H:%M:%S"
    return (
        datetime.strptime(b[:19].replace("T", " "), fmt)
        - datetime.strptime(a[:19].replace("T", " "), fmt)
    ).total_seconds()


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join (attribution shape): each
    right event matches left events of the same key that happened at or
    before it, within `max_delay`.

    Both sides carry watermarks plus the time-range predicate — exactly
    what Spark requires to BOUND the join state store: a buffered left
    row is evictable once the right watermark passes its
    `left_ts + max_delay`, so state is O(key-rate × window), never
    O(stream). Without the range condition the state store grows
    unboundedly — that shape is refused here rather than deployed."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
