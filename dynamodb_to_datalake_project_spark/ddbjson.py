"""DynamoDB typed-JSON codec as pure Catalyst column expressions.

The reference decodes `{"Item": {"account": {"S": "..."}, "amount":
{"N": "592"}}}` rows with per-row Python in two Lambdas
(lambda_functions/dynamodb_export_to_s3_post_processor_worker.py:39-56,
lambda_functions/dynamodb_stream_consumer.py:42-59) and only handles the
`S`/`N` tags, truncating `N` (arbitrary-precision decimal) to int.

Here the decoder is *schema-driven expression generation*: given the
target relational `StructType`, we derive the typed-JSON mirror schema,
parse with `from_json`, and unwrap with nested-struct access /
`transform` — zero Python UDFs, fully inside whole-stage codegen, and
covering the complete DynamoDB type system
(S / N / B / BOOL / NULL / M / L / SS / NS / BS). `N` decodes through
the declared type (LongType / DecimalType / DoubleType) instead of a
lossy int cast (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tag sets a target Spark type may arrive under. Decoder coalesces in
# this order when several could carry the value.
_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def attr_schema(dt: T.DataType) -> T.StructType:
    """Typed-JSON attribute-value struct schema mirroring Spark type `dt`.

    e.g. LongType -> struct<N:string>, ArrayType(StringType) ->
    struct<L:array<struct<S:string>>, SS:array<string>> (either tag
    accepted), StructType -> struct<M:struct<...recursive...>>.
    """
    fields: list[T.StructField] = []
    if isinstance(dt, T.StringType):
        fields.append(T.StructField("S", T.StringType()))
    elif isinstance(dt, _NUMERIC_TYPES):
        fields.append(T.StructField("N", T.StringType()))
    elif isinstance(dt, T.BooleanType):
        fields.append(T.StructField("BOOL", T.BooleanType()))
    elif isinstance(dt, T.BinaryType):
        fields.append(T.StructField("B", T.StringType()))  # base64
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        # reference carries timestamps as ISO-8601 strings (dynamodb_table.py:11)
        fields.append(T.StructField("S", T.StringType()))
    elif isinstance(dt, T.ArrayType):
        elem = dt.elementType
        fields.append(
            T.StructField("L", T.ArrayType(attr_schema(elem)))
        )
        if isinstance(elem, T.StringType):
            fields.append(T.StructField("SS", T.ArrayType(T.StringType())))
        elif isinstance(elem, _NUMERIC_TYPES):
            fields.append(T.StructField("NS", T.ArrayType(T.StringType())))
        elif isinstance(elem, T.BinaryType):
            fields.append(T.StructField("BS", T.ArrayType(T.StringType())))
    elif isinstance(dt, T.StructType):
        fields.append(
            T.StructField(
                "M",
                T.StructType(
                    [T.StructField(f.name, attr_schema(f.dataType)) for f in dt.fields]
                ),
            )
        )
    elif isinstance(dt, T.MapType):
        # open-schema map: values all share one attr schema
        fields.append(
            T.StructField("M", T.MapType(T.StringType(), attr_schema(dt.valueType)))
        )
    else:
        raise TypeError(f"unsupported target type for DynamoDB decode: {dt}")
    fields.append(T.StructField("NULL", T.BooleanType()))
    return T.StructType(fields)


def item_schema(target: T.StructType) -> T.StructType:
    """Schema for the whole `Item` typed map, mirroring `target`."""
    return T.StructType(
        [T.StructField(f.name, attr_schema(f.dataType)) for f in target.fields]
    )


def export_schema(target: T.StructType) -> T.StructType:
    """Schema of one export JSON line: {"Item": {...}}."""
    return T.StructType([T.StructField("Item", item_schema(target))])


def _decode_attr(attr: Column, dt: T.DataType, ts_format: str | None) -> Column:
    """Decode one typed attribute-value struct column to target type."""
    if isinstance(dt, T.StringType):
        out = attr["S"]
    elif isinstance(dt, _NUMERIC_TYPES):
        out = attr["N"].cast(dt)
    elif isinstance(dt, T.BooleanType):
        out = attr["BOOL"]
    elif isinstance(dt, T.BinaryType):
        out = F.unbase64(attr["B"])
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        out = (
            F.to_timestamp(attr["S"], ts_format) if ts_format else F.to_timestamp(attr["S"])
        )
        if isinstance(dt, T.TimestampNTZType):
            # session TZ is pinned UTC, so LTZ->NTZ cast is the identity
            out = out.cast(dt)
    elif isinstance(dt, T.DateType):
        out = F.to_date(attr["S"], ts_format) if ts_format else F.to_date(attr["S"])
    elif isinstance(dt, T.ArrayType):
        elem = dt.elementType
        from_l = F.transform(attr["L"], lambda x: _decode_attr(x, elem, ts_format))
        if isinstance(elem, T.StringType):
            out = F.coalesce(from_l, attr["SS"])
        elif isinstance(elem, _NUMERIC_TYPES):
            out = F.coalesce(
                from_l, F.transform(attr["NS"], lambda x: x.cast(elem))
            )
        elif isinstance(elem, T.BinaryType):
            out = F.coalesce(
                from_l, F.transform(attr["BS"], lambda x: F.unbase64(x))
            )
        else:
            out = from_l
    elif isinstance(dt, T.StructType):
        out = F.struct(
            *[
                _decode_attr(attr["M"][f.name], f.dataType, ts_format).alias(f.name)
                for f in dt.fields
            ]
        )
        # an absent M must stay NULL, not a struct of NULLs
        out = F.when(attr["M"].isNotNull(), out)
    elif isinstance(dt, T.MapType):
        out = F.transform_values(
            attr["M"], lambda _, v: _decode_attr(v, dt.valueType, ts_format)
        )
    else:  # pragma: no cover - guarded by attr_schema
        raise TypeError(f"unsupported target type: {dt}")
    # explicit NULL tag wins
    return F.when(attr["NULL"] == F.lit(True), F.lit(None).cast(dt)).otherwise(out)


def decode_item(item: Column, target: T.StructType, ts_format: str | None = None) -> list[Column]:
    """Flatten a parsed typed `Item` struct column into target columns."""
    return [
        _decode_attr(item[f.name], f.dataType, ts_format).alias(f.name)
        for f in target.fields
    ]


def decode_export_json(
    df: DataFrame,
    target: T.StructType,
    json_col: str = "value",
    ts_format: str | None = None,
) -> DataFrame:
    """Decode a DataFrame of raw export JSON strings (one `{"Item":…}`
    per row) into flat relational rows typed per `target`.

    Scale: `from_json` + struct access run entirely JVM-side under
    whole-stage codegen; schema is static so no inference pass.
    """
    parsed = df.select(
        F.from_json(F.col(json_col), export_schema(target)).alias("_rec")
    )
    return parsed.select(*decode_item(F.col("_rec.Item"), target, ts_format))


def decode_export_variant(
    df: DataFrame,
    target: T.StructType,
    json_col: str = "value",
    ts_format: str | None = None,
) -> DataFrame:
    """Variant-based decode of the same export wire format: `parse_json`
    → binary VariantType → one `variant_get` path extraction per target
    column. Semantically equivalent to `decode_export_json` for scalar
    targets (asserted by the `p1_variant_decode` oracle, which compares
    against the original relational rows).

    Why a second path: `from_json` needs the full typed-JSON mirror
    schema up front and pays to materialize EVERY declared attribute;
    variant parses once into a binary encoding and each `variant_get`
    is an O(log fields) path lookup, so wide items where a query reads
    a few columns skip the cost of the rest — and with variant
    shredding in the parquet writer the extracted paths become ordinary
    pruned/pushed-down columns at rest. Both paths are map-only inside
    whole-stage codegen. Scalar targets only (S/N/BOOL tags); nested
    M/L/sets stay on the schema-driven `decode_export_json` path, which
    remains the full-type-system decoder.
    """
    def col_for(f: T.StructField) -> Column:
        path_s = f"$.Item.{f.name}.S"
        if isinstance(f.dataType, _NUMERIC_TYPES):
            return F.variant_get("_v", f"$.Item.{f.name}.N", f.dataType.simpleString())
        if isinstance(f.dataType, T.BooleanType):
            return F.variant_get("_v", f"$.Item.{f.name}.BOOL", "boolean")
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            s = F.variant_get("_v", path_s, "string")
            if isinstance(f.dataType, T.DateType):
                return F.to_date(s, ts_format) if ts_format else F.to_date(s)
            out = F.to_timestamp(s, ts_format) if ts_format else F.to_timestamp(s)
            return out.cast(f.dataType)
        if isinstance(f.dataType, T.BinaryType):
            return F.unbase64(F.variant_get("_v", f"$.Item.{f.name}.B", "string"))
        if isinstance(f.dataType, T.StringType):
            return F.variant_get("_v", path_s, "string")
        raise TypeError(
            f"variant decode path supports scalar targets only, got {f.dataType}; "
            "use decode_export_json for nested types"
        )

    parsed = df.select(F.parse_json(F.col(json_col)).alias("_v"))
    return parsed.select(*[col_for(f).alias(f.name) for f in target.fields])


def read_export(spark, paths, target: T.StructType, ts_format: str | None = None, recursive: bool = False) -> DataFrame:
    """S1/S4: read DynamoDB export data files (`.json.gz` JSON-lines of
    `{"Item": {...}}`) straight into typed relational rows.

    Replaces the reference's coordinator/worker Lambda fan-out
    (dynamodb_export_to_s3_post_processor_coordinator.py:44-81) — Spark
    file splits are the fan-out; gzip decompression is transparent.
    """
    reader = spark.read.schema(export_schema(target))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.json(paths)
    return df.select(*decode_item(F.col("Item"), target, ts_format))


# ---------------------------------------------------------------------------
# Encoder (inverse): used by tests/fixture generation and the oracle
# round-trip query. Kept expression-only for the same codegen reasons.
# ---------------------------------------------------------------------------


def _encode_attr(col: Column, dt: T.DataType, ts_format: str | None) -> Column:
    if isinstance(dt, T.StringType):
        return F.struct(col.alias("S"))
    if isinstance(dt, _NUMERIC_TYPES):
        return F.struct(col.cast("string").alias("N"))
    if isinstance(dt, T.BooleanType):
        return F.struct(col.alias("BOOL"))
    if isinstance(dt, T.BinaryType):
        return F.struct(F.base64(col).alias("B"))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        s = F.date_format(col, ts_format) if ts_format else col.cast("string")
        return F.struct(s.alias("S"))
    if isinstance(dt, T.ArrayType):
        return F.struct(
            F.transform(col, lambda x: _encode_attr(x, dt.elementType, ts_format)).alias("L")
        )
    if isinstance(dt, T.StructType):
        inner = F.struct(
            *[
                _encode_attr(col[f.name], f.dataType, ts_format).alias(f.name)
                for f in dt.fields
            ]
        )
        # a NULL struct must encode as an absent attribute, not a
        # struct of nulls (decode's isNotNull guard relies on it)
        return F.struct(F.when(col.isNotNull(), inner).alias("M"))
    if isinstance(dt, T.MapType):
        return F.struct(
            F.transform_values(
                col, lambda _, v: _encode_attr(v, dt.valueType, ts_format)
            ).alias("M")
        )
    raise TypeError(f"unsupported type for DynamoDB encode: {dt}")


def encode_export_json(
    df: DataFrame, columns: list[str] | None = None, ts_format: str | None = None
) -> DataFrame:
    """Inverse of `decode_export_json`: flat rows → one `{"Item":…}`
    JSON string per row (column `value`)."""
    columns = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    item = F.struct(
        *[_encode_attr(F.col(c), schema[c], ts_format).alias(c) for c in columns]
    )
    return df.select(
        F.to_json(F.struct(item.alias("Item")), {"ignoreNullFields": "true"}).alias("value")
    )


# ---------------------------------------------------------------------------
# DynamoDB Streams record shape (distinct from the export shape): the
# stream consumer receives {"eventID", "eventName",
# "dynamodb": {"Keys": {...}, "NewImage": {...typed item...}}}
# (lambda_functions/dynamodb_stream_consumer.py:31-49).
# ---------------------------------------------------------------------------


def stream_record_schema(target: T.StructType) -> T.StructType:
    """Schema of one raw DynamoDB Streams record carrying a NewImage."""
    return T.StructType(
        [
            T.StructField("eventID", T.StringType()),
            T.StructField("eventName", T.StringType()),
            T.StructField(
                "dynamodb",
                T.StructType([T.StructField("NewImage", item_schema(target))]),
            ),
        ]
    )


def decode_stream_records(
    df: DataFrame,
    target: T.StructType,
    ts_format: str | None = None,
) -> DataFrame:
    """Decode a DataFrame of parsed stream records (schema =
    `stream_record_schema(target)`, e.g. from `spark.read.json` or a
    `readStream` file/Kinesis source) into flat relational rows plus
    `event_name` — the reference's consumer unwrap
    (dynamodb_stream_consumer.py:42-59), minus the REMOVE filter, which
    belongs to the sink policy (T8)."""
    return df.select(
        F.col("eventName").alias("event_name"),
        *decode_item(F.col("dynamodb.NewImage"), target, ts_format),
    )


def read_stream_records(
    spark,
    paths,
    target: T.StructType,
    ts_format: str | None = None,
    streaming: bool = False,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """S6 at the wire level: read raw DynamoDB Streams JSON records
    (batch or as a Structured Streaming file source) straight into
    typed rows + event_name."""
    schema = stream_record_schema(target)
    if streaming:
        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .option("recursiveFileLookup", "true")
        )
    else:
        reader = spark.read.schema(schema).option("recursiveFileLookup", "true")
    return decode_stream_records(reader.json(paths), target, ts_format)
