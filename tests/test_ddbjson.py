"""Decoder unit tests: the full DynamoDB type system
(S/N/B/BOOL/NULL/M/L/SS/NS/BS), lossless N decoding, and the
encode→decode round-trip. Mirrors the reference's export wire format
(vendor/aws_dynamodb_export_to_s3.py:63-64, README.rst:162-167) plus
the FIXTURES.md edge rows (missing note, int32-overflow N, decimal N).
"""

from __future__ import annotations

import json
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark import ddbjson

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

LINE = (
    '{"Item":{"account":{"S":"651-232-2439"},'
    '"create_at":{"S":"2023-07-27T22:14:26.066612+0000"},'
    '"update_at":{"S":"2023-07-27T22:14:26.066612+0000"},'
    '"entity":{"S":"Brown, Christian and Becker"},'
    '"note":{"S":"Three way peace sing town."},'
    '"amount":{"N":"592"},"is_credit":{"N":"0"}}}'
)


def _decode(spark, lines, schema):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    return ddbjson.decode_export_json(df, schema)


def test_reference_wire_format(spark):
    row = _decode(spark, [LINE], TXN_SCHEMA).first()
    assert row.account == "651-232-2439"
    assert row.entity == "Brown, Christian and Becker"
    assert row.amount == Decimal("592.000000000")
    assert row.is_credit == 0
    assert row.note == "Three way peace sing town."


def test_missing_and_null_attributes(spark):
    # absent `note`, explicit NULL `entity`
    line = json.dumps(
        {
            "Item": {
                "account": {"S": "a"},
                "create_at": {"S": "t"},
                "update_at": {"S": "t"},
                "entity": {"NULL": True},
                "amount": {"N": "1"},
                "is_credit": {"N": "1"},
            }
        }
    )
    row = _decode(spark, [line], TXN_SCHEMA).first()
    assert row.note is None
    assert row.entity is None
    assert row.is_credit == 1


def test_n_decodes_losslessly(spark):
    """The reference truncates N to int (SURVEY §1.3); we must not.
    int32-overflow and fractional decimals survive exactly."""
    line = json.dumps(
        {
            "Item": {
                "account": {"S": "a"},
                "create_at": {"S": "t"},
                "update_at": {"S": "t"},
                "entity": {"S": "e"},
                "amount": {"N": "92233720368.123456789"},
                "is_credit": {"N": "1"},
            }
        }
    )
    row = _decode(spark, [line], TXN_SCHEMA).first()
    assert row.amount == Decimal("92233720368.123456789")


def test_full_type_system(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BinaryType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("nums", T.ArrayType(T.LongType())),
            T.StructField("blobs", T.ArrayType(T.BinaryType())),
            T.StructField("lst", T.ArrayType(T.StringType())),
            T.StructField(
                "m",
                T.StructType(
                    [
                        T.StructField("x", T.LongType()),
                        T.StructField("y", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    line = json.dumps(
        {
            "Item": {
                "s": {"S": "hello"},
                "n": {"N": "42"},
                "d": {"N": "2.5"},
                "b": {"B": "aGk="},  # "hi"
                "flag": {"BOOL": True},
                "tags": {"SS": ["a", "b"]},
                "nums": {"NS": ["1", "2", "3"]},
                "blobs": {"BS": ["aGk="]},
                "lst": {"L": [{"S": "x"}, {"S": "y"}]},
                "m": {"M": {"x": {"N": "7"}, "y": {"S": "z"}}},
            }
        }
    )
    row = _decode(spark, [line], schema).first()
    assert row.s == "hello" and row.n == 42 and row.d == 2.5
    assert bytes(row.b) == b"hi"
    assert row.flag is True
    assert row.tags == ["a", "b"]
    assert row.nums == [1, 2, 3]
    assert [bytes(x) for x in row.blobs] == [b"hi"]
    assert row.lst == ["x", "y"]
    assert row.m.x == 7 and row.m.y == "z"


def test_nested_m_in_l(spark):
    schema = T.StructType(
        [
            T.StructField(
                "items",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("id", T.LongType()),
                            T.StructField("name", T.StringType()),
                        ]
                    )
                ),
            )
        ]
    )
    line = json.dumps(
        {
            "Item": {
                "items": {
                    "L": [
                        {"M": {"id": {"N": "1"}, "name": {"S": "a"}}},
                        {"M": {"id": {"N": "2"}, "name": {"S": "b"}}},
                    ]
                }
            }
        }
    )
    row = _decode(spark, [line], schema).first()
    assert [(i.id, i.name) for i in row.items] == [(1, "a"), (2, "b")]


def test_encode_decode_roundtrip(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    src = spark.createDataFrame(
        [(1, "a", 1.5, True, ["t1", "t2"]), (2, None, -2.25, False, [])],
        schema,
    )
    wire = ddbjson.encode_export_json(src)
    back = ddbjson.decode_export_json(wire, schema)
    assert sorted(back.collect()) == sorted(src.collect())


def test_read_export_gzip_files(spark, tmp_path):
    """S1/S4: gzipped JSON-lines export files read transparently,
    recursive prefix walk included."""
    import gzip

    d = tmp_path / "AWSDynamoDB" / "data"
    d.mkdir(parents=True)
    with gzip.open(d / "part-0.json.gz", "wt") as f:
        f.write(LINE + "\n")
    out = ddbjson.read_export(
        spark, str(tmp_path), TXN_SCHEMA, recursive=True
    )
    assert out.count() == 1
    assert out.first().account == "651-232-2439"


def test_null_struct_roundtrips_as_null(spark):
    """Regression: encoding a NULL struct column must produce an absent
    attribute, not a struct of nulls."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.StructType([T.StructField("x", T.LongType())])),
    ])
    src = spark.createDataFrame([(1, None), (2, (7,))], schema)
    back = ddbjson.decode_export_json(ddbjson.encode_export_json(src), schema)
    got = {r.k: r.m for r in back.collect()}
    assert got[1] is None
    assert got[2].x == 7


def test_map_type_roundtrip(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    src = spark.createDataFrame([(1, {"a": 10, "b": 20})], schema)
    back = ddbjson.decode_export_json(ddbjson.encode_export_json(src), schema)
    assert back.first().m == {"a": 10, "b": 20}


def test_variant_decode_agrees_with_from_json_path(spark):
    """decode_export_variant (parse_json -> variant_get paths) must land
    on exactly the rows decode_export_json (from_json mirror schema)
    produces, including NULL/absent attributes, for scalar targets."""
    import datetime

    schema = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = spark.createDataFrame(
        [
            (1, "alpha", 1.5, True, datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (2, None, None, False, None),
            (3, "gamma", -0.25, None, datetime.datetime(2024, 6, 7, 8, 9, 10)),
        ],
        schema,
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    wire = ddbjson.encode_export_json(src, ts_format=fmt)
    via_struct = ddbjson.decode_export_json(wire, schema, ts_format=fmt)
    via_variant = ddbjson.decode_export_variant(wire, schema, ts_format=fmt)
    assert via_variant.schema == via_struct.schema
    assert sorted(map(tuple, via_variant.collect())) == sorted(
        map(tuple, via_struct.collect())
    )


def test_variant_decode_rejects_nested_targets(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("m", T.StructType([T.StructField("x", T.LongType())])),
    ])
    src = spark.createDataFrame([(1, (7,))], schema)
    wire = ddbjson.encode_export_json(src)
    import pytest as _pytest

    with _pytest.raises(TypeError, match="scalar targets only"):
        ddbjson.decode_export_variant(wire, schema)
