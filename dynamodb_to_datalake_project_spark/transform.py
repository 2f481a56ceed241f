"""Row-shaping transforms: surrogate keys, partition derivation (P1-P4).

Reference behavior being reproduced (Spark-first, not ported):
- P2 surrogate key `id = "account:{account},create_at:{create_at}"`
  (glue_jobs/initial_load.py:124-133, dynamodb_table.py:33-36).
- P3 lake-side partition columns `create_year/month/day/hour/minute` as
  zero-padded substrings of an ISO timestamp string
  (glue_jobs/initial_load.py:134-154).
- P4 CDC-side partition derivation from parsed update time with manual
  zero-padding (lambda_functions/dynamodb_stream_consumer.py:62-68) —
  here `date_format` emits the padding directly.

All are pure Catalyst column expressions (whole-stage codegen; no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

#: partition component -> date_format pattern (zero-padded, string-typed,
#: matching the reference's folder-name encoding year=YYYY/.../minute=MM)
PARTITION_PATTERNS = {
    "year": "yyyy",
    "month": "MM",
    "day": "dd",
    "hour": "HH",
    "minute": "mm",
}


def surrogate_key(*pairs: tuple[str, Column | str]) -> Column:
    """`"k1:{v1},k2:{v2}"` surrogate key (P2 generalized).

    surrogate_key(("account", col), ("create_at", col)) reproduces the
    reference's `id`. String-concat keys keep the reference's property
    that lexicographic order == (key, time) order, which the
    differential compare relies on (compare.py:42).
    """
    parts: list[Column] = []
    for i, (name, c) in enumerate(pairs):
        c = F.col(c) if isinstance(c, str) else c
        prefix = ("," if i else "") + f"{name}:"
        parts += [F.lit(prefix), c.cast("string")]
    return F.concat(*parts)


def with_partition_columns(
    df: DataFrame,
    ts_col: str,
    prefix: str = "",
    levels: tuple[str, ...] = ("year", "month", "day", "hour", "minute"),
) -> DataFrame:
    """Add zero-padded string partition columns derived from `ts_col`.

    Works on TimestampType directly; on ISO-string columns it parses
    first (the reference's substring trick is equivalent but fails on
    non-ISO layouts; date_format is layout-independent).
    """
    c = F.col(ts_col)
    if dict(df.dtypes)[ts_col] == "string":
        c = F.to_timestamp(c)
    for lvl in levels:
        df = df.withColumn(prefix + lvl, F.date_format(c, PARTITION_PATTERNS[lvl]))
    return df


# ---------------------------------------------------------------------------
# Catalog entries
# ---------------------------------------------------------------------------


@query(
    "p2_surrogate_key",
    oracle="""
    SELECT concat('user:', CAST(user_id AS VARCHAR),
                  ',ts:', strftime(ts, '%Y-%m-%d %H:%M:%S')) AS id,
           event_id, user_id, event_type
    FROM events
    """,
)
def q_surrogate_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        surrogate_key(
            ("user", F.col("user_id")),
            ("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")),
        ).alias("id"),
        "event_id",
        "user_id",
        "event_type",
    )


@query(
    "p3_partition_derive",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y') AS year,
           strftime(ts, '%m') AS month,
           strftime(ts, '%d') AS day,
           strftime(ts, '%H') AS hour,
           strftime(ts, '%M') AS minute
    FROM events
    """,
)
def q_partition_derive(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    return with_partition_columns(ev, "ts").drop("ts")


@query(
    "p1_ddb_decode_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def q_ddb_decode_roundtrip(spark, sf_dir):
    """P1: typed-JSON decode, validated as encode→JSON→decode round-trip.

    The oracle sees the original rows; the Spark side detours through the
    DynamoDB export wire format `{"Item":{"o_orderkey":{"N":"…"}}}` and
    must land on identical values — proving the decoder (including
    N-via-declared-type and ISO timestamp handling) end-to-end.
    """
    from pyspark.sql import types as T

    from dynamodb_to_datalake_project_spark import ddbjson

    target = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    orders = load_table(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    wire = ddbjson.encode_export_json(orders, ts_format=fmt)
    return ddbjson.decode_export_json(wire, target, ts_format=fmt)


@query(
    "p1_variant_decode",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def q_variant_decode_roundtrip(spark, sf_dir):
    """P1 via Spark 4 VariantType: the same encode→wire→decode
    round-trip as `p1_ddb_decode_roundtrip`, but the decode side is
    `parse_json` → binary variant → per-column `variant_get` path
    extraction instead of a `from_json` mirror schema
    (`ddbjson.decode_export_variant`). Same oracle — the original
    relational rows — so the two decode paths are independently proven
    equivalent. This is the schema-light scan path: wide items where a
    query touches few attributes pay per-path lookup cost instead of
    full-schema materialization, and variant shredding at rest turns
    the hot paths back into pruned parquet columns."""
    from pyspark.sql import types as T

    from dynamodb_to_datalake_project_spark import ddbjson

    target = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    orders = load_table(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    wire = ddbjson.encode_export_json(orders, ts_format=fmt)
    return ddbjson.decode_export_variant(wire, target, ts_format=fmt)
