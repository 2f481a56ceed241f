"""The reference's own correctness strategy, end-to-end (SURVEY §5):
a deterministic insert/update/delete workload runs through the full
pipeline — typed-JSON export → initial load → CDC drops → streaming
incremental merge — and the lake table must differentially match the
independently-computed expected state. Includes the T9 snapshot/stream
overlap (events present in BOTH the export and the CDC drops) which
idempotent merge must reconcile.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import pipeline, transform, workload


@pytest.fixture(scope="module")
def events(spark):
    return workload.generate_events(spark, n_base=200, updates_per_txn=2).cache()


def test_workload_shape(events):
    by_type = {r.event_name: r.n for r in events.groupBy("event_name").agg(F.count("*").alias("n")).collect()}
    assert by_type["INSERT"] == 200
    assert by_type["MODIFY"] == 2 * 60  # 30% of 200 keys, 2 updates each
    assert by_type["REMOVE"] == 4
    # keys are unique per INSERT
    assert events.filter("event_name = 'INSERT'").select("account", "create_at").distinct().count() == 200


def test_full_pipeline_differential(spark, tmp_path, events):
    export_dir = tmp_path / "export"
    cdc_dir = tmp_path / "cdc"
    lake_path = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    # --- snapshot at T0 = 60% into the insert timeline -----------------
    t0_epoch = workload.BASE_EPOCH + int(200 * 7 * 0.6)
    t0_iso = spark.range(1).select(
        F.date_format(F.timestamp_seconds(F.lit(t0_epoch)), workload.ISO_FMT)
    ).first()[0]

    snap_events = events.filter(
        (F.col("update_at") <= t0_iso) & (F.col("event_name") != "REMOVE")
    )
    snapshot_state = workload.expected_final_state(
        events.filter(F.col("update_at") <= t0_iso)
    )
    # export = typed-JSON gz of the snapshot table state (S1 wire format)
    from dynamodb_to_datalake_project_spark import ddbjson

    wire = ddbjson.encode_export_json(
        snapshot_state.select([f.name for f in pipeline.TXN_SCHEMA.fields])
    )
    wire.write.option("compression", "gzip").text(str(export_dir / "data"))
    assert glob.glob(str(export_dir / "data" / "*.txt.gz")) or glob.glob(
        str(export_dir / "data" / "*.gz")
    )

    # --- CDC drops: everything after T0 minus 30min (overlap with the
    # snapshot exercises T9 idempotent reconciliation), minute-partitioned
    overlap_iso = t0_iso[:17] + "00.000000"  # pull back to minute start
    stream_events = events.filter(F.col("update_at") >= overlap_iso).drop("seq")
    drops = transform.with_partition_columns(stream_events, "update_at", prefix="u_")
    drops.write.partitionBy("u_year", "u_month", "u_day", "u_hour", "u_minute").json(
        str(cdc_dir)
    )

    # --- run the pipeline ----------------------------------------------
    pipeline.initial_load(spark, str(export_dir), lake_path)
    assert spark.read.parquet(lake_path).count() == snapshot_state.count()

    q = pipeline.start_incremental(spark, str(cdc_dir), lake_path, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # --- differential validation (compare.py parity) -------------------
    expected = workload.expected_final_state(events).withColumn(
        "amount", F.col("amount").cast("decimal(38,9)")
    )
    summary, samples = pipeline.validate(spark, expected, lake_path)
    assert summary.identical, (summary, samples)

    # lake schema is the reference's 13-column shape
    lake_df = spark.read.parquet(lake_path)
    assert len(lake_df.columns) == 13
    assert set(pipeline.PARTITION_COLS) <= set(lake_df.columns)
    # surrogate id format (initial_load.py:124-133)
    row = lake_df.first()
    assert row.id == f"account:{row.account},create_at:{row.create_at}"

    # preview (athena.py parity)
    n, head = pipeline.preview(spark, lake_path, limit=5)
    assert n == expected.count()
    assert head.count() == 5


def test_s5_source_seam(spark, tmp_path, events):
    """S5: initial_load/validate go through lake.read_source, so the
    same pipeline ingests from a parquet full-table snapshot (the
    stand-in for the reference's live-table scan, compare.py:17-26) and
    a live connector is one register_source_format call away."""
    from dynamodb_to_datalake_project_spark import lake

    state = workload.expected_final_state(events)
    snap = str(tmp_path / "snap")
    state.write.parquet(snap)
    lake_path = str(tmp_path / "lake")
    pipeline.initial_load(
        spark, None, lake_path, source={"format": "parquet", "path": snap}
    )
    summary, samples = pipeline.validate(
        spark, {"format": "parquet", "path": snap}, lake_path
    )
    assert summary.identical, (summary, samples)

    # the connector plug point: any callable (spark, spec) -> DataFrame
    lake.register_source_format(
        "unit-test-src", lambda sp, spec: sp.range(3).withColumnRenamed("id", "k")
    )
    assert lake.read_source(spark, {"format": "unit-test-src"}).count() == 3
    with pytest.raises(ValueError, match="unknown source format"):
        lake.read_source(spark, {"format": "no-such-format"})


def test_s5_dynamodb_connector_contract(spark):
    """S5 live-connector leg against the DynamoDB-shaped mock: the
    scan contract a real connector must honor — segment-parallel scan
    (one Spark partition per segment, disjoint complete coverage),
    projection pushdown (only requested attributes leave the table),
    per-segment limit pushdown — through the same read_source seam
    (reference scan: compare.py:17-26)."""
    from dynamodb_to_datalake_project_spark import ddbmock, lake

    items = [
        {"id": f"t-{i:04d}", "account": f"acc-{i % 7}", "amount": i * 10, "note": "x" * i}
        for i in range(100)
    ]
    table = ddbmock.MockDynamoTable(items, key_attr="id")
    schema = "id string, account string, amount long, note string"

    # full scan: every item exactly once, one partition per segment
    df = lake.read_source(
        spark,
        {"format": "dynamodb", "table": table, "schema": schema, "total_segments": 8},
    )
    assert df.rdd.getNumPartitions() == 8
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(it["id"] for it in items)
    assert df.columns == ["id", "account", "amount", "note"]

    # segments are disjoint AND every partition does real work
    from pyspark.sql import functions as F

    per_part = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert sum(r["count"] for r in per_part) == 100
    assert len(per_part) == 8  # no empty segment at this size

    # projection pushdown: the mock only emits projected attributes;
    # key is always fetched (connector invariant)
    proj = lake.read_source(
        spark,
        {
            "format": "dynamodb",
            "table": table,
            "schema": schema,
            "total_segments": 4,
            "projection": ["amount"],
        },
    )
    assert proj.columns == ["id", "amount"]
    assert proj.count() == 100
    assert proj.agg(F.sum("amount")).first()[0] == sum(i * 10 for i in range(100))

    # per-segment limit pushdown caps items AT THE SOURCE
    lim = lake.read_source(
        spark,
        {
            "format": "dynamodb",
            "table": table,
            "schema": schema,
            "total_segments": 4,
            "segment_limit": 5,
        },
    )
    assert lim.count() == 20  # 4 segments x 5 items


def test_incremental_raw_wire_format(spark, tmp_path, events):
    """§3.2 full fidelity: encode a slice of the workload as raw
    Streams records (typed NewImage), run the raw incremental pipeline
    against an empty lake, and differentially match the expected state."""
    import json as _json

    from pyspark.sql import functions as F2

    from dynamodb_to_datalake_project_spark import ddbjson

    slice_df = events.filter(F2.col("seq") < 3000).drop("seq")
    wire = ddbjson.encode_export_json(
        slice_df.drop("event_name"), ts_format=None
    )
    # wrap each Item as a stream record with its event name
    items = [r.value for r in wire.collect()]
    names = [r.event_name for r in slice_df.select("event_name").collect()]
    src = tmp_path / "raw_records"
    src.mkdir()
    lines = []
    for i, (item_json, name) in enumerate(zip(items, names)):
        item = _json.loads(item_json)["Item"]
        lines.append(_json.dumps({
            "eventID": f"e{i}", "eventName": name,
            "dynamodb": {"NewImage": item},
        }))
    (src / "records.json").write_text("\n".join(lines))

    lake_path = str(tmp_path / "raw_lake")
    q = pipeline.start_incremental_raw(
        spark, str(src), lake_path, str(tmp_path / "raw_ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    expected = workload.expected_final_state(
        events.filter(F2.col("seq") < 3000)
    ).withColumn("amount", F2.col("amount").cast("decimal(38,9)"))
    summary, samples = pipeline.validate(spark, expected, lake_path)
    assert summary.identical, (summary, samples)


def test_pipeline_hourly_grain(spark, tmp_path, events):
    """The levels=4 (hourly) partition grain works end-to-end: fewer
    partition directories, same differential correctness."""
    import glob as _glob

    from pyspark.sql import functions as F2

    from dynamodb_to_datalake_project_spark import ddbjson

    slice_ev = events.filter(F2.col("seq") < 2000)
    state = workload.expected_final_state(slice_ev)
    wire = ddbjson.encode_export_json(
        state.select([f.name for f in pipeline.TXN_SCHEMA.fields])
    )
    export = tmp_path / "h_export"
    wire.write.option("compression", "gzip").text(str(export / "data"))

    lake_path = str(tmp_path / "h_lake")
    pipeline.initial_load(spark, str(export), lake_path, levels=4)

    # partition tree is 4 levels deep (no create_minute directory)
    assert _glob.glob(f"{lake_path}/create_year=*/create_month=*/create_day=*/create_hour=*/*.parquet")
    assert not _glob.glob(f"{lake_path}/**/create_minute=*", recursive=True)

    expected = state.withColumn("amount", F2.col("amount").cast("decimal(38,9)"))
    summary, samples = pipeline.validate(spark, expected, lake_path)
    assert summary.identical, (summary, samples)
