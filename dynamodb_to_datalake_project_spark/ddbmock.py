"""S5 live-connector leg, proven against a mock: a DynamoDB-shaped
table whose `scan` API mirrors the real one (Segment/TotalSegments
parallel scan, attribute projection, per-segment limit), wired into
the `read_source` seam as the `"dynamodb"` format.

The reference's oracle side scans the live table item-by-item
(dynamodb_to_datalake/compare.py:17-26, PynamoDB `Transaction.scan()`);
a real deployment swaps `MockDynamoTable` for a boto3/SDK-backed
client with the SAME scan contract — every pipeline entry point that
takes a source spec then works against the live table unchanged.

Scan contract the mock enforces (and tests assert):
- segment parallelism: one Spark partition per scan segment; segments
  partition the keyspace disjointly by key hash (DynamoDB semantics);
- projection pushdown: only requested attributes leave the "table";
- limit pushdown: per-segment item cap, applied at the source.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def _key_segment(key: str, total_segments: int) -> int:
    """Deterministic hash-partition of the item keyspace, mirroring
    how a DynamoDB parallel scan shards items across segments."""
    h = int.from_bytes(hashlib.md5(str(key).encode()).digest()[:4], "big")
    return h % total_segments


class MockDynamoTable:
    """In-memory DynamoDB-shaped table: items are plain attribute
    dicts keyed by `key_attr`. Pickles to executors, so each Spark
    partition can issue its own segment scan — the same topology a
    real connector has (one segment scan per task)."""

    def __init__(self, items: list[dict], key_attr: str = "id"):
        self.key_attr = key_attr
        self.items = sorted(items, key=lambda it: str(it[key_attr]))

    def scan(
        self,
        segment: int = 0,
        total_segments: int = 1,
        projection: list[str] | None = None,
        limit: int | None = None,
    ):
        """DynamoDB `Scan(Segment, TotalSegments, ProjectionExpression,
        Limit)` semantics: yields only this segment's items, only the
        projected attributes, at most `limit` of them."""
        if not (0 <= segment < total_segments):
            raise ValueError(f"segment {segment} not in [0, {total_segments})")
        n = 0
        for it in self.items:
            if _key_segment(str(it[self.key_attr]), total_segments) != segment:
                continue
            if limit is not None and n >= limit:
                break
            n += 1
            yield {k: it.get(k) for k in projection} if projection else dict(it)


def read_source_dynamodb(spark: SparkSession, spec: dict) -> DataFrame:
    """`read_source` reader for `{"format": "dynamodb", "table":
    MockDynamoTable, "schema": DDL, "total_segments"?, "projection"?,
    "segment_limit"?}`.

    One RDD partition per scan segment — the imperative per-partition
    IO of a connector is the one place RDDs are the right tool — then
    `createDataFrame` with the explicit schema (no inference pass).
    Projection is pushed INTO the scan (the mock returns only those
    attributes), so the contract a real connector must honor is
    exercised, not just the happy path.
    """
    table: MockDynamoTable = spec["table"]
    schema = spec["schema"]
    total_segments = int(spec.get("total_segments", 4))
    projection = spec.get("projection")
    segment_limit = spec.get("segment_limit")

    if projection is not None and table.key_attr not in projection:
        # a connector always fetches the key — mirrors how the
        # reference's scan materializes full items keyed by id
        projection = [table.key_attr, *projection]

    schema_fields = [f.name for f in spark.createDataFrame([], schema).schema.fields]
    if projection is not None:
        unknown = [p for p in projection if p not in schema_fields]
        if unknown:
            # fail at spec-validation time with the actual problem, not
            # mid-job with a tuple/schema arity mismatch
            raise ValueError(
                f"projection attributes not in schema: {unknown}; "
                f"schema has {schema_fields}"
            )

    field_order = projection if projection is not None else schema_fields

    def scan_segment(seg_iter):
        for seg in seg_iter:
            for item in table.scan(
                segment=seg,
                total_segments=total_segments,
                projection=projection,
                limit=segment_limit,
            ):
                yield tuple(item.get(k) for k in field_order)

    rdd = spark.sparkContext.parallelize(
        range(total_segments), total_segments
    ).mapPartitions(scan_segment)
    if projection is not None:
        full = spark.createDataFrame([], schema).schema
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for name in field_order
            for f in full.fields
            if f.name == name
        )
    return spark.createDataFrame(rdd, schema)
