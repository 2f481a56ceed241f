"""The reference's end-to-end topology, Spark-native (SURVEY §3):

initial load   export typed-JSON  →  decode → hudify → partitioned lake
               (one batch job — replaces DynamoDB Export + coordinator/
               worker Lambdas + glue_jobs/initial_load.py)
incremental    CDC JSON drops     →  stream → derive → keyed merge
               (one Structured Streaming query — replaces consumer
               Lambda + cron orchestrator + tracker + incremental.py)
analytics      spark.sql over the registered lake table (replaces
               Athena polling + CSV hop, athena.py)
validation     differential compare (compare.py), distributed

The lake table carries the reference's exact derived schema: surrogate
`id` = "account:{account},create_at:{create_at}" plus zero-padded
create_year/month/day/hour/minute partition strings — 13 columns
(glue_jobs/initial_load.py:124-154, README.rst:171-192).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark import cdc, ddbjson, diff, lake, transform

#: source schema of the `transactions` table (dynamodb_table.py:13-29);
#: N decodes via DecimalType — lossless, unlike the reference's int cast
TXN_SCHEMA = T.StructType(
    [
        T.StructField("account", T.StringType()),
        T.StructField("create_at", T.StringType()),
        T.StructField("update_at", T.StringType()),
        T.StructField("entity", T.StringType()),
        T.StructField("amount", T.DecimalType(38, 9)),
        T.StructField("is_credit", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)

#: CDC drop schema = flat row + stream event type
CDC_SCHEMA = T.StructType(
    list(TXN_SCHEMA.fields) + [T.StructField("event_name", T.StringType())]
)

#: Reference-faithful 5-level partition layout
#: (glue_jobs/initial_load.py:169-170). Minute grain is right for the
#: reference's CDC selection trick but produces one partition per
#: active minute — at 100 TB prefer `partition_levels=4` (hourly) or 3
#: (daily): merge pruning stays effective and file counts drop ~60x
#: (see lake.compact_partitions for the complementary rewrite).
PARTITION_LEVELS = ["year", "month", "day", "hour", "minute"]
PARTITION_COLS = [f"create_{lvl}" for lvl in PARTITION_LEVELS]


def partition_cols(levels: int = 5) -> list[str]:
    """First `levels` of the create-time partition hierarchy."""
    return PARTITION_COLS[:levels]

RECORD_KEY = ["id"]
PRECOMBINE = ["update_at"]


def hudify(df: DataFrame, levels: int = 5) -> DataFrame:
    """Derive the lake-side columns (P2+P3): surrogate id + partition
    strings (initial_load.py:124-154; mirrors dynamodb_table.py:31-44)."""
    df = df.withColumn(
        "id",
        transform.surrogate_key(("account", F.col("account")), ("create_at", F.col("create_at"))),
    )
    return transform.with_partition_columns(
        df, "create_at", prefix="create_",
        levels=tuple(PARTITION_LEVELS[:levels]),
    )


def initial_load(
    spark: SparkSession,
    export_dir: str | None,
    lake_path: str,
    table_name: str | None = None,
    levels: int = 5,
    source: dict | None = None,
) -> None:
    """Snapshot ingestion (S1/S4/P1-P3/S7 + S12): full-table source →
    relational rows → derived columns → partitioned parquet lake table,
    optionally registered in the catalog. `levels` picks the partition
    grain (5 = reference-faithful minute, 4 = hourly for large
    deployments — see SCALE.md).

    The source goes through the S5 seam (`lake.read_source`): by
    default the gz typed-JSON export at `export_dir`; pass `source`
    (e.g. `{"format": "parquet", "path": ...}`, or a registered live
    connector format) to ingest from any other full-table scan."""
    spec = source or {
        "format": "ddb-export",
        "path": export_dir,
        "schema": TXN_SCHEMA,
        "recursive": True,
    }
    rows = lake.read_source(spark, spec)
    lake.write_table(
        hudify(rows, levels), lake_path, partition_by=partition_cols(levels)
    )
    if table_name:
        lake.register_table(spark, table_name, lake_path)


def start_incremental(
    spark: SparkSession,
    cdc_dir: str,
    lake_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 100,
    levels: int = 5,
    delete_mode: str = "drop",
):
    """CDC micro-batch stream (T1-T9): each batch is filtered
    (REMOVE policy per `delete_mode` — 'drop' is reference parity,
    'hard' removes deleted keys from the lake), hudified, and merged
    into only the partitions it touches. `levels` must match the grain
    the table was created with."""
    return cdc.start_cdc_merge(
        spark,
        cdc_dir,
        CDC_SCHEMA,
        lake_path,
        keys=RECORD_KEY,
        precombine=PRECOMBINE,
        partition_cols=partition_cols(levels),
        checkpoint_dir=checkpoint_dir,
        event_type_col="event_name",
        max_files_per_trigger=max_files_per_trigger,
        batch_transform=lambda df: hudify(df, levels),
        delete_mode=delete_mode,
    )


def preview(spark: SparkSession, lake_path: str, limit: int = 10):
    """Analytics preview (athena.py:67-90): total count + first rows by
    id — no Athena polling, no CSV hop."""
    t = spark.read.parquet(lake_path)
    return t.count(), t.orderBy("id").limit(limit)


def validate(spark: SparkSession, source_truth, lake_path: str):
    """Differential correctness check (compare.py:50-79): canonical
    column order, compare as bags; returns (summary, sample_diffs).

    `source_truth` is a DataFrame, or an S5 source spec dict — the
    reference's oracle side scans the actual DynamoDB table
    (compare.py:17-26); here that scan is `lake.read_source`, so a live
    connector slots in without changing the validation."""
    if isinstance(source_truth, dict):
        source_truth = lake.read_source(spark, source_truth)
    lake_df = spark.read.parquet(lake_path)
    cols = source_truth.columns
    return diff.compare(source_truth.select(*cols), lake_df.select(*cols))


def start_incremental_raw(
    spark: SparkSession,
    stream_dir: str,
    lake_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 100,
    levels: int = 5,
    delete_mode: str = "drop",
):
    """§3.2 at full wire fidelity: raw DynamoDB Streams records (typed
    NewImage JSON) → streaming decode → REMOVE filter → hudify →
    partition-pruned merge. The flat-drop variant (`start_incremental`)
    models the reference's intermediate S3 layout; this one consumes
    what the stream itself carries. Shares the exact batch body with
    the flat-drop path (cdc.make_merge_batch_fn) so the delete/null
    policy cannot drift between the two pipelines."""
    stream = ddbjson.read_stream_records(
        spark,
        stream_dir,
        TXN_SCHEMA,
        streaming=True,
        max_files_per_trigger=max_files_per_trigger,
    )
    process_batch = cdc.make_merge_batch_fn(
        lake_path,
        keys=RECORD_KEY,
        precombine=PRECOMBINE,
        partition_cols=partition_cols(levels),
        event_type_col="event_name",
        batch_transform=lambda df: hudify(df, levels),
        delete_mode=delete_mode,
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
