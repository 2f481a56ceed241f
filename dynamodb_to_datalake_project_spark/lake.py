"""Lake-table IO: scans, sinks, catalog registration.

Covers SURVEY.md §2.1 S1-S12 Spark-first:

- S1/S3/S4  JSON scans (gzip transparent, explicit schema, multi-path,
  recursive) — `read_json_lines`.
- S5 + test fixtures — `load_table` over the driver parquet fixtures.
- S7/S8     partitioned lake writes — `write_table` (overwrite) here;
  keyed upsert lives in `merge.py`.
- S9/S10    partitioned / gzip JSON sinks — `write_json_lines`.
- S11       CSV scan/sink — `read_csv` / `write_csv`.
- S12       catalog registration — `register_table`.

Scale notes: all readers take explicit schemas (no inference job over
100 TB), writers always `partitionBy` the lake layout so partition
pruning works for downstream readers, and `repartition` before write
controls the small-file problem (reference: 1-minute CDC drops
compacted by Hudi COW rewrite — SURVEY §4 "small-file problem").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table as parquet.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark only
    reads as a long (nanosAsLong); normalize to a µs TimestampType column
    the same way DuckDB does (truncation), so both engines see identical
    values. All other tables pass through untouched — column pruning and
    predicate pushdown reach the parquet scan.
    """
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


# ---------------------------------------------------------------------------
# S5: pluggable full-table source seam
# ---------------------------------------------------------------------------

SOURCE_FORMATS: dict[str, object] = {}


def register_source_format(name: str, reader) -> None:
    """Register a source format: `reader(spark, spec) -> DataFrame`.

    This is the connector plug point for S5 — the reference's oracle
    side scans the live DynamoDB table (dynamodb_to_datalake/
    compare.py:17-26); a live-connector deployment registers e.g. a
    spark-dynamodb or DynamoDB-export-triggering reader here without
    touching any pipeline code."""
    SOURCE_FORMATS[name] = reader


def read_source(spark: SparkSession, spec: dict) -> DataFrame:
    """S5 full-table scan behind a format-dispatched seam.

    `spec` is `{"format": <name>, ...format-specific keys}`. Shipped
    formats (all exercisable in-sandbox):
    - `parquet`: `{"path"}` — lake/fixture parquet snapshot.
    - `ddb-export`: `{"path", "schema", "ts_format"?, "recursive"?}` —
      gzip typed-JSON DynamoDB table export, decoded through the
      Catalyst typed-JSON unwrap (`ddbjson.read_export`).
    - `jsonl`: `{"path", "schema"?, "recursive"?}` — plain JSON lines.
    A future live connector is one `register_source_format` call; every
    pipeline entry point that takes a source spec then works against
    the live table unchanged.
    """
    fmt = spec["format"]
    try:
        reader = SOURCE_FORMATS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown source format {fmt!r}; registered: {sorted(SOURCE_FORMATS)}"
        ) from None
    return reader(spark, spec)


def _read_source_parquet(spark: SparkSession, spec: dict) -> DataFrame:
    tune(spark)
    return spark.read.parquet(spec["path"])


def _read_source_ddb_export(spark: SparkSession, spec: dict) -> DataFrame:
    from dynamodb_to_datalake_project_spark import ddbjson

    return ddbjson.read_export(
        spark,
        spec["path"],
        spec["schema"],
        ts_format=spec.get("ts_format"),
        recursive=bool(spec.get("recursive", False)),
    )


def _read_source_jsonl(spark: SparkSession, spec: dict) -> DataFrame:
    return read_json_lines(
        spark,
        spec["path"],
        schema=spec.get("schema"),
        recursive=bool(spec.get("recursive", False)),
    )


register_source_format("parquet", _read_source_parquet)
register_source_format("ddb-export", _read_source_ddb_export)
register_source_format("jsonl", _read_source_jsonl)


def read_json_lines(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType | str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """JSON-lines scan (S1/S3/S4). gzip (`.json.gz`) is transparent.

    Explicit schema avoids a full inference pass — mandatory at scale;
    `recursive` subsumes the reference's prefix walk
    (glue_jobs/initial_load.py:95-106).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if isinstance(paths, str):
        return reader.json(paths)
    return reader.json(paths)


def write_json_lines(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    gzip: bool = False,
    mode: str = "overwrite",
) -> None:
    """Partitioned JSON-lines sink (S9) / gz JSON sink (S10).

    The reference names each CDC drop `uuid4().hex + '.json'`
    (lambda_functions/dynamodb_stream_consumer.py:74-90); Spark task
    files are already unique, so the naming trick disappears.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)


def manifest_paths(spark: SparkSession, manifest_file: str, base_dir: str | None = None) -> list[str]:
    """S2: manifest-driven file enumeration. DynamoDB exports ship a
    `manifest-files.json` (one `{"dataFileS3Key": …, "itemCount": …,
    "md5Checksum": …}` per line — vendor/aws_dynamodb_export_to_s3.py:
    348-375); return the data-file paths it lists so a scan reads
    exactly the manifest's files (not whatever happens to be in the
    prefix). The manifest itself is tiny — a driver-side read is
    correct at any scale."""
    import os as _os

    rows = spark.read.json(manifest_file).select("dataFileS3Key").collect()
    base = base_dir or _os.path.dirname(manifest_file)
    return [_os.path.join(base, r.dataFileS3Key) for r in rows]


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_files_per_partition: int | None = None,
) -> None:
    """Initial-load lake write (S7): partitioned parquet, overwrite.

    Equivalent of the reference's Hudi bulk-insert
    (glue_jobs/initial_load.py:163-186) minus Hudi: plain partitioned
    parquet + (optionally) catalog registration via `register_table`.
    `target_files_per_partition` repartitions by the partition columns to
    bound output file count (small-file control).
    """
    if partition_by and target_files_per_partition:
        df = df.repartition(target_files_per_partition, *partition_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    shuffle_parallelism: int | None = None,
    partition_filter=None,
) -> None:
    """Small-file compaction (the reference's Hudi-COW rewrite concern,
    SURVEY §4): rewrite each (selected) partition into ONE file. CDC
    micro-batches drop many tiny files per minute partition; scan cost
    at 100 TB is dominated by file count, so periodic compaction keeps
    the table scannable.

    Hash-repartitioning on the partition columns puts every row of a
    partition value into exactly one task (tasks may hold several
    values), so each partition value is written as a single file while
    the rewrite itself runs `shuffle_parallelism`-wide. Dynamic
    partition overwrite rewrites only partitions present in the
    (optionally filtered) input.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    par = shuffle_parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.read.parquet(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    (
        df.repartition(par, *partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed catalog table: co-locates rows by hash(bucket_cols) at
    WRITE time so later equi-joins/aggregations on those columns need no
    shuffle — the scale lever for repeatedly-joined big tables (two
    tables bucketed the same way join with zero Exchange)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def register_table(
    spark: SparkSession, name: str, path: str, database: str = "default"
) -> None:
    """Catalog sync (S12): register a parquet path as a queryable table.

    Replaces the reference's Hudi hive-sync options
    (glue_jobs/initial_load.py:171-177) and Glue-catalog database create
    (glue_catalog.py:87-97) with the Spark catalog.
    """
    from pyspark.errors import AnalysisException

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
    spark.sql(
        f"CREATE TABLE {database}.{name} USING PARQUET LOCATION '{path}'"
    )
    try:
        spark.sql(f"MSCK REPAIR TABLE {database}.{name}")
    except AnalysisException as e:
        # only the unpartitioned-layout case is benign; a real repair
        # failure on a partitioned table must surface (a silently
        # partitionless registration reads as 0 rows downstream)
        cond = getattr(e, "getErrorClass", lambda: "")() or str(e)
        if "NOT_A_PARTITIONED_TABLE" not in cond:
            raise
