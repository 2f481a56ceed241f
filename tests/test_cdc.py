"""CDC streaming end-to-end (T1-T9): file-source stream over JSON
drops, foreachBatch merge into a partitioned lake table, checkpoint
restart without duplicates, REMOVE filtering, windowed aggregation with
watermark — the reference's whole incremental pipeline
(dynamodb_stream_consumer.py + incremental_load_orchestration.py +
glue_jobs/incremental.py) as one streaming query.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark import cdc, diff

CDC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("update_at", T.StringType()),
        T.StructField("note", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("event_name", T.StringType()),
    ]
)


def _write_drop(cdc_dir, name, records):
    cdc_dir.mkdir(parents=True, exist_ok=True)
    (cdc_dir / name).write_text(
        "\n".join(json.dumps(r) for r in records) + "\n"
    )


def _run_stream(spark, cdc_dir, table, ckpt):
    q = cdc.start_cdc_merge(
        spark,
        str(cdc_dir),
        CDC_SCHEMA,
        str(table),
        keys=["id"],
        precombine=["update_at"],
        partition_cols=["day"],
        checkpoint_dir=str(ckpt),
        event_type_col="event_name",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_cdc_stream_merge_and_restart(spark, tmp_path):
    cdc_dir = tmp_path / "cdc"
    table = tmp_path / "lake"
    ckpt = tmp_path / "ckpt"

    # epoch snapshot (initial load, S7)
    snapshot = spark.createDataFrame(
        [
            ("a", "2023-01-01T00:00:00", "v1", "2023-01-01"),
            ("b", "2023-01-01T00:00:00", "v1", "2023-01-01"),
        ],
        ["id", "update_at", "note", "day"],
    )
    snapshot.write.partitionBy("day").parquet(str(table))

    # batch 1: update a (newer), REMOVE b (must be ignored), insert c
    _write_drop(
        cdc_dir,
        "b1.json",
        [
            {"id": "a", "update_at": "2023-01-01T01:00:00", "note": "v2",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "b", "update_at": "2023-01-01T01:00:00", "note": "gone",
             "day": "2023-01-01", "event_name": "REMOVE"},
            {"id": "c", "update_at": "2023-01-01T01:00:00", "note": "new",
             "day": "2023-01-02", "event_name": "INSERT"},
        ],
    )
    _run_stream(spark, cdc_dir, table, ckpt)

    state = {r.id: r.note for r in spark.read.parquet(str(table)).collect()}
    assert state == {"a": "v2", "b": "v1", "c": "new"}

    # batch 2 after restart: late stale update for a (loses), new d
    _write_drop(
        cdc_dir,
        "b2.json",
        [
            {"id": "a", "update_at": "2023-01-01T00:30:00", "note": "stale",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "d", "update_at": "2023-01-01T02:00:00", "note": "late-add",
             "day": "2023-01-02", "event_name": "INSERT"},
        ],
    )
    _run_stream(spark, cdc_dir, table, ckpt)  # same checkpoint -> only b2 processed

    final = spark.read.parquet(str(table))
    state = {r.id: (r.update_at, r.note) for r in final.collect()}
    assert state == {
        "a": ("2023-01-01T01:00:00", "v2"),
        "b": ("2023-01-01T00:00:00", "v1"),
        "c": ("2023-01-01T01:00:00", "new"),
        "d": ("2023-01-01T02:00:00", "late-add"),
    }
    assert final.count() == 4  # no duplicate rows from restart

    # differential check (J1): lake vs expected oracle state is clean
    expected = spark.createDataFrame(
        [
            ("a", "2023-01-01T01:00:00", "v2", "2023-01-01"),
            ("b", "2023-01-01T00:00:00", "v1", "2023-01-01"),
            ("c", "2023-01-01T01:00:00", "new", "2023-01-02"),
            ("d", "2023-01-01T02:00:00", "late-add", "2023-01-02"),
        ],
        ["id", "update_at", "note", "day"],
    )
    summary, samples = diff.compare(expected, final.select("id", "update_at", "note", "day"))
    assert summary.identical, samples


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """T2/T3: tumbling 1-minute windows + 2-minute watermark over a
    file-source stream."""
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"id": "x", "ts": "2024-01-01T00:00:10", "event_type": "click"},
        {"id": "y", "ts": "2024-01-01T00:00:50", "event_type": "click"},
        {"id": "z", "ts": "2024-01-01T00:01:10", "event_type": "view"},
        {"id": "w", "ts": "2024-01-01T00:10:00", "event_type": "view"},  # advances watermark
    ]
    (src / "f1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ts", T.StringType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    agg = cdc.windowed_event_counts(stream, group_cols=("event_type",))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r.window_start), r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # windows closed by the watermark (last event 00:10 - 2min = 00:08)
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 00:01:00", "view")] == 1


def test_stateful_latest_across_batches(spark, tmp_path):
    """Custom stateful operator: state survives micro-batches; stale
    updates never regress it."""
    src = tmp_path / "stateful_src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("update_at", T.StringType()),
            T.StructField("note", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    out = cdc.stateful_latest(stream, "id", "update_at", "note")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_state")
        .option("checkpointLocation", str(tmp_path / "st_ck"))
        .start()
    )
    try:
        (src / "b1.json").write_text(
            '{"id": "a", "update_at": "2023-01-01T10:00:00", "note": "v1"}\n'
            '{"id": "b", "update_at": "2023-01-01T10:00:00", "note": "v1"}\n'
        )
        q.processAllAvailable()
        # batch 2: newer for a, STALE for b
        (src / "b2.json").write_text(
            '{"id": "a", "update_at": "2023-01-01T12:00:00", "note": "v2"}\n'
            '{"id": "b", "update_at": "2023-01-01T09:00:00", "note": "stale"}\n'
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM latest_state").collect()
    # memory sink in update mode appends each update; take last per key
    last = {}
    for r in rows:
        last[r.id] = (r.update_at, r.note)
    assert last["a"] == ("2023-01-01T12:00:00", "v2")
    assert last["b"] == ("2023-01-01T10:00:00", "v1")


def test_raw_stream_records_end_to_end(spark, tmp_path):
    """Full wire-level CDC: raw DynamoDB Streams records (typed-JSON
    NewImage) -> streaming decode -> merge. INSERT/MODIFY applied,
    REMOVE ignored."""
    from dynamodb_to_datalake_project_spark import ddbjson, merge

    target = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("update_at", T.StringType()),
            T.StructField("amount", T.LongType()),
        ]
    )
    src = tmp_path / "raw_stream"
    src.mkdir()

    def rec(eid, name, id_, ts, amount):
        return json.dumps(
            {
                "eventID": eid,
                "eventName": name,
                "dynamodb": {
                    "NewImage": {
                        "id": {"S": id_},
                        "update_at": {"S": ts},
                        "amount": {"N": str(amount)},
                    }
                },
            }
        )

    (src / "r1.json").write_text(
        "\n".join(
            [
                rec("e1", "INSERT", "a", "2023-01-01T00:00:00", 10),
                rec("e2", "INSERT", "b", "2023-01-01T00:00:00", 20),
                rec("e3", "MODIFY", "a", "2023-01-01T01:00:00", 11),
                rec("e4", "REMOVE", "b", "2023-01-01T02:00:00", 0),
            ]
        )
    )
    table = str(tmp_path / "raw_lake")
    spark.createDataFrame([], "id string, update_at string, amount long, day string").write.partitionBy("day").parquet(table)

    stream = ddbjson.read_stream_records(spark, str(src), target, streaming=True)

    def apply_batch(batch_df, _epoch):
        batch = (
            batch_df.filter(F.col("event_name") != "REMOVE")
            .drop("event_name")
            .withColumn("day", F.substring("update_at", 1, 10))
        )
        merge.merge_into_parquet(
            batch.sparkSession, table, batch,
            keys=["id"], precombine=["update_at"], partition_cols=["day"],
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "raw_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = {r.id: (r.update_at, r.amount) for r in spark.read.parquet(table).collect()}
    assert state == {
        "a": ("2023-01-01T01:00:00", 11),
        "b": ("2023-01-01T00:00:00", 20),
    }


def test_hard_delete_mode_batch_fn(spark, tmp_path):
    """T8 'hard' delete mode: the shared batch fn routes REMOVE events
    into the merge as deletes — a newer REMOVE removes the key from the
    lake, while the default 'drop' mode keeps the pre-delete image."""
    from dynamodb_to_datalake_project_spark import cdc

    schema = "id string, update_at string, note string, day string, event_name string"
    initial = spark.createDataFrame(
        [
            ("a", "2023-01-01T00:00:00", "v1", "2023-01-01", "INSERT"),
            ("b", "2023-01-01T00:00:00", "v1", "2023-01-01", "INSERT"),
        ],
        schema,
    )
    batch = spark.createDataFrame(
        [
            ("a", "2023-01-02T00:00:00", "v2", "2023-01-01", "MODIFY"),
            ("b", "2023-01-02T00:00:00", None, "2023-01-01", "REMOVE"),
        ],
        schema,
    )
    for mode, expect in (
        ("hard", {"a": "v2"}),
        ("drop", {"a": "v2", "b": "v1"}),
    ):
        table = str(tmp_path / f"lake_{mode}")
        fn = cdc.make_merge_batch_fn(
            table, ["id"], ["update_at"], ["day"],
            event_type_col="event_name", delete_mode=mode,
        )
        fn(initial, 0)
        fn(batch, 1)
        state = {r.id: r.note for r in spark.read.parquet(table).collect()}
        assert state == expect, (mode, state)


def test_stream_drop_duplicates_within_watermark(spark, tmp_path):
    """Exactly-once-per-id streaming dedup: duplicate CDC records inside
    the watermark window are emitted once."""
    src = tmp_path / "dup_src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    (src / "f.json").write_text(
        "\n".join(
            [
                '{"id": "a", "ts": "2024-01-01T00:00:10"}',
                '{"id": "a", "ts": "2024-01-01T00:00:10"}',  # exact dup
                '{"id": "b", "ts": "2024-01-01T00:00:20"}',
                '{"id": "a", "ts": "2024-01-01T00:00:30"}',  # same id, later ts (kept by id-dedup? no: within watermark dropped)
            ]
        )
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT id FROM dedup_stream").collect()
    assert sorted(r.id for r in rows) == ["a", "b"]


def test_null_event_name_is_kept(spark, tmp_path):
    """Regression: a CDC record with missing/null event_name is an
    upsert, not a silent drop (three-valued ~isin)."""
    cdc_dir = tmp_path / "nullev"
    table = tmp_path / "nullev_lake"
    spark.createDataFrame(
        [("x", "2023-01-01T00:00:00", "v0", "2023-01-01")],
        ["id", "update_at", "note", "day"],
    ).write.partitionBy("day").parquet(str(table))
    _write_drop(cdc_dir, "b.json", [
        {"id": "y", "update_at": "2023-01-01T01:00:00", "note": "no-event-name",
         "day": "2023-01-01"},
    ])
    _run_stream(spark, cdc_dir, table, tmp_path / "nullev_ck")
    assert {r.id for r in spark.read.parquet(str(table)).collect()} == {"x", "y"}


def test_session_window_streaming(spark, tmp_path):
    """session_window(ts, gap): dynamic-length session aggregation in a
    stream — two bursts for user a separated by > gap become two
    sessions once the watermark closes them."""
    src = tmp_path / "sess_src"
    src.mkdir()
    rows = [
        {"uid": "a", "ts": "2024-01-01T00:00:00"},
        {"uid": "a", "ts": "2024-01-01T00:00:30"},   # same session (gap 30s < 1m)
        {"uid": "a", "ts": "2024-01-01T00:05:00"},   # new session (gap 4m30s)
        {"uid": "b", "ts": "2024-01-01T00:00:10"},
        {"uid": "w", "ts": "2024-01-01T01:00:00"},   # watermark pusher
    ]
    (src / "f.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [T.StructField("uid", T.StringType()), T.StructField("ts", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "2 minutes")
        .groupBy(F.session_window("ts", "1 minute").alias("w"), "uid")
        .agg(F.count("*").alias("n"))
        .select("uid", F.col("w.start").alias("start"), "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.uid, str(r.start)): r.n
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got[("a", "2024-01-01 00:00:00")] == 2
    assert got[("a", "2024-01-01 00:05:00")] == 1
    assert got[("b", "2024-01-01 00:00:10")] == 1


def test_session_windows_restart_exactly_once(spark, tmp_path):
    """Restart-safe streaming sessionization through the REAL entry
    point (`start_session_windows`): an OPEN session must survive a
    checkpoint restart and keep absorbing events (state store
    continuity), every finalized session is emitted exactly once into
    the transactional parquet sink, and a second restart with no new
    data re-emits nothing."""
    import os as _os

    src = tmp_path / "sess_cdc"
    out = tmp_path / "sessions"
    ckpt = tmp_path / "sess_ck"
    schema = T.StructType(
        [
            T.StructField("uid", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def run():
        q = cdc.start_session_windows(
            spark,
            str(src),
            schema,
            str(out),
            str(ckpt),
            key_col="uid",
            ts_col="ts",
            gap="1 minute",
            watermark="2 minutes",
            agg_col="value",
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_drop(
        src,
        "d0.json",
        [
            {"uid": "u1", "ts": "2024-01-01T00:00:00", "value": 1.0},
            {"uid": "u1", "ts": "2024-01-01T00:00:30", "value": 2.0},
            {"uid": "u2", "ts": "2024-01-01T00:00:10", "value": 5.0},
        ],
    )
    _os.utime(src / "d0.json", (1_700_000_000, 1_700_000_000))
    run()
    # watermark has not passed any session close yet: nothing emitted,
    # all sessions still OPEN in the state store (the file sink may
    # commit empty part files — rows are the contract)
    assert spark.read.parquet(str(out)).count() == 0

    # u1's 00:01:15 event lands within the gap of its pre-restart open
    # session (which closes at 00:01:30) — extending it proves the
    # session state crossed the restart; the 01:00 pusher advances the
    # watermark past every earlier session close
    _write_drop(
        src,
        "d1.json",
        [
            {"uid": "u1", "ts": "2024-01-01T00:01:15", "value": 4.0},
            {"uid": "u3", "ts": "2024-01-01T00:05:00", "value": 7.0},
            {"uid": "wm", "ts": "2024-01-01T01:00:00", "value": 0.0},
        ],
    )
    _os.utime(src / "d1.json", (1_700_000_001, 1_700_000_001))
    run()

    def snapshot():
        return {
            (r.uid, str(r.session_start), str(r.session_end)): (
                r.n_events,
                r.sum_value,
            )
            for r in spark.read.parquet(str(out)).collect()
        }

    got = snapshot()
    assert got == {
        # one session spanning the restart, emitted once with all 3 events
        ("u1", "2024-01-01 00:00:00", "2024-01-01 00:02:15"): (3, 7.0),
        ("u2", "2024-01-01 00:00:10", "2024-01-01 00:01:10"): (1, 5.0),
        ("u3", "2024-01-01 00:05:00", "2024-01-01 00:06:00"): (1, 7.0),
        # the watermark pusher's own session is still open: not emitted
    }

    # second restart, no new data: the commit log must re-emit nothing
    run()
    assert snapshot() == got


def test_hard_delete_mode_end_to_end_stream(spark, tmp_path):
    """T8 hard mode through the REAL entry point (`start_cdc_merge`,
    not a hand-built batch fn): a newer REMOVE deletes the key from the
    lake; an older late REMOVE is a no-op; restart processes only new
    batches and deletes survive the restart."""
    cdc_dir = tmp_path / "cdc"
    table = tmp_path / "lake"
    ckpt = tmp_path / "ckpt"

    spark.createDataFrame(
        [
            ("a", "2023-01-01T00:00:00", "v1", "2023-01-01"),
            ("b", "2023-01-01T00:00:00", "v1", "2023-01-01"),
        ],
        ["id", "update_at", "note", "day"],
    ).write.partitionBy("day").parquet(str(table))

    _write_drop(
        cdc_dir,
        "b1.json",
        [
            {"id": "a", "update_at": "2023-01-01T01:00:00", "note": None,
             "day": "2023-01-01", "event_name": "REMOVE"},   # newer -> gone
            {"id": "b", "update_at": "2022-12-31T00:00:00", "note": None,
             "day": "2023-01-01", "event_name": "REMOVE"},   # older -> no-op
            {"id": "c", "update_at": "2023-01-01T01:00:00", "note": "new",
             "day": "2023-01-02", "event_name": "INSERT"},
        ],
    )

    def run():
        q = cdc.start_cdc_merge(
            spark,
            str(cdc_dir),
            CDC_SCHEMA,
            str(table),
            keys=["id"],
            precombine=["update_at"],
            partition_cols=["day"],
            checkpoint_dir=str(ckpt),
            event_type_col="event_name",
            delete_mode="hard",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    state = {r.id: r.note for r in spark.read.parquet(str(table)).collect()}
    assert state == {"b": "v1", "c": "new"}

    # restart: resurrect a, delete c; a's tombstone must not replay
    _write_drop(
        cdc_dir,
        "b2.json",
        [
            {"id": "a", "update_at": "2023-01-01T02:00:00", "note": "back",
             "day": "2023-01-01", "event_name": "INSERT"},
            {"id": "c", "update_at": "2023-01-01T02:00:00", "note": None,
             "day": "2023-01-02", "event_name": "REMOVE"},
        ],
    )
    run()
    state = {r.id: r.note for r in spark.read.parquet(str(table)).collect()}
    assert state == {"a": "back", "b": "v1"}


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream event-time interval join (attribution): each click
    joins the view it followed within 5 minutes, per user; clicks with
    no preceding view (or too late) don't match. Watermarks + the
    range predicate bound the join state store."""
    views_dir = tmp_path / "views"
    clicks_dir = tmp_path / "clicks"
    _write_drop(
        views_dir,
        "v1.json",
        [
            {"user_id": "u1", "view_ts": "2023-01-01T00:00:00", "page": "home"},
            {"user_id": "u2", "view_ts": "2023-01-01T00:10:00", "page": "docs"},
        ],
    )
    _write_drop(
        clicks_dir,
        "c1.json",
        [
            {"user_id": "u1", "click_ts": "2023-01-01T00:03:00", "target": "buy"},
            {"user_id": "u1", "click_ts": "2023-01-01T00:09:00", "target": "late"},
            {"user_id": "u2", "click_ts": "2023-01-01T00:11:00", "target": "api"},
            {"user_id": "u3", "click_ts": "2023-01-01T00:01:00", "target": "lost"},
        ],
    )
    vschema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("view_ts", T.TimestampType()),
            T.StructField("page", T.StringType()),
        ]
    )
    cschema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("click_ts", T.TimestampType()),
            T.StructField("target", T.StringType()),
        ]
    )
    views = spark.readStream.schema(vschema).json(str(views_dir))
    clicks = spark.readStream.schema(cschema).json(str(clicks_dir))
    joined = cdc.stream_interval_join(
        views, clicks, key="user_id", left_ts="view_ts", right_ts="click_ts",
        max_delay="5 minutes",
    ).select("user_id", "page", "target", "click_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.page, r.target)
        for r in spark.sql("SELECT * FROM attrib_sink").collect()
    }
    assert got == {("u1", "home", "buy"), ("u2", "docs", "api")}


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _event_rows(start_id, hour, n, etype="click"):
    return [
        {
            "event_id": start_id + i,
            "ts": f"2024-01-01T{hour:02d}:{i % 60:02d}:00",
            "event_type": etype,
            "value": float(i) + 0.25,
        }
        for i in range(n)
    ]


def test_streaming_rollup_maintenance_exactly_once(spark, tmp_path):
    """Continuous aggregate end-to-end: three CDC drops stream into the
    versioned rollup; a RESTART from checkpoint (which replays nothing
    new but exercises the epoch fence) plus a fourth drop must leave
    the rollup equal to a from-scratch batch aggregation of all drops —
    no double counting, no loss. Time travel: an earlier committed
    version equals the batch aggregation of the prefix."""
    from dynamodb_to_datalake_project_spark import rollup as R

    cdc_dir = tmp_path / "events_cdc"
    rpath = tmp_path / "rollup"
    ckpt = tmp_path / "rckpt"

    drops = [
        _event_rows(0, 1, 30, "click"),
        _event_rows(100, 1, 20, "purchase"),
        _event_rows(200, 2, 25, "click"),
    ]
    import os as _os

    for i, recs in enumerate(drops):
        _write_drop(cdc_dir, f"d{i}.json", recs)
        # distinct mtimes pin the file-source batch order (oldest first)
        _os.utime(cdc_dir / f"d{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    def run():
        q = R.start_rollup_maintenance(
            spark,
            str(cdc_dir),
            EVENTS_SCHEMA,
            str(rpath),
            str(ckpt),
            keys=["hour", "event_type"],
            partials_fn=R.hourly_event_partials,
            max_files_per_trigger=1,  # one drop per micro-batch
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    versions_after_first = R.list_versions(str(rpath))
    assert len(versions_after_first) == 3  # one committed version per batch

    # restart (epoch fence must not double-apply) + one more drop
    _write_drop(cdc_dir, "d3.json", _event_rows(300, 2, 15, "purchase"))
    run()

    def batch_rollup(rows):
        df = spark.createDataFrame(
            [(r["event_id"], r["ts"].replace("T", " "), r["event_type"], r["value"]) for r in rows],
            ["event_id", "ts_s", "event_type", "value"],
        ).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
        )
        return R.hourly_event_partials(df)

    expect_all = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch_rollup([r for d in drops for r in d] + _event_rows(300, 2, 15, "purchase")).collect()
    }
    got_all = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in R.read_rollup(spark, str(rpath)).collect()
    }
    assert got_all == expect_all

    # time travel: version committed after the first two drops == prefix rollup
    v_prefix = versions_after_first[1]
    expect_prefix = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch_rollup(drops[0] + drops[1]).collect()
    }
    got_prefix = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in R.read_rollup(spark, str(rpath), version=v_prefix).collect()
    }
    assert got_prefix == expect_prefix

    # vacuum keeps the committed head readable
    removed = R.vacuum_rollup(str(rpath), keep=1)
    assert v_prefix in removed
    assert R.read_rollup(spark, str(rpath)).count() == len(expect_all)


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: each micro-batch of the CDC event stream
    enriches against a STATIC dimension read from the lake (the
    region-lookup shape). The static side re-resolves per batch, joins
    as a broadcast hash join (no stream state), and the windowed
    counts per enriched attribute must match a batch recompute."""
    cdc_dir = tmp_path / "ss_cdc"
    ckpt = tmp_path / "ss_ckpt"
    dim_path = tmp_path / "dim"
    out = []

    spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert")],
        ["event_type", "category"],
    ).write.parquet(str(dim_path))

    rows = _event_rows(0, 1, 30, "click") + _event_rows(100, 1, 10, "purchase")
    _write_drop(cdc_dir, "d0.json", rows)

    stream = cdc.read_cdc_stream(spark, str(cdc_dir), EVENTS_SCHEMA, 100)
    dim = spark.read.parquet(str(dim_path))
    enriched = stream.join(F.broadcast(dim), "event_type")

    def sink(batch_df, epoch_id):
        out.extend(
            batch_df.groupBy("category")
            .agg(F.count("*").alias("n"), F.sum("event_id").alias("sum_id"))
            .collect()
        )

    q = (
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["category"]: (r["n"], r["sum_id"]) for r in out}
    assert got == {
        "engage": (30, sum(range(30))),
        "convert": (10, sum(range(100, 110))),
    }


def test_streaming_sketch_rollup_distinct_users(spark, tmp_path):
    """Incrementally-maintained DISTINCT counts: the rollup stores HLL
    sketch partials per (hour, event_type) and each micro-batch UNIONS
    its sketch in — plain COUNT(DISTINCT) cannot be maintained this way
    (distinct is not additive). After three drops + a fenced restart +
    a fourth drop, per-key estimates must equal exact batch
    COUNT(DISTINCT) over all drops (HLL list-mode is exact at this
    cardinality), and unioning the stored sketches up to hour grain
    must equal exact hour-level distincts — no raw-history rescan in
    either case."""
    from dynamodb_to_datalake_project_spark import rollup as R

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )

    def rows(start_id, hour, n, etype, user0):
        return [
            {
                "event_id": start_id + i,
                "ts": f"2024-01-01T{hour:02d}:{i % 60:02d}:00",
                "event_type": etype,
                # overlapping user ranges across drops: the union must
                # dedup users seen in earlier batches of the same key
                "user_id": user0 + (i % 25),
            }
            for i in range(n)
        ]

    cdc_dir = tmp_path / "ev_cdc"
    rpath = tmp_path / "sk_rollup"
    ckpt = tmp_path / "sk_ckpt"
    drops = [
        rows(0, 1, 30, "click", 100),
        rows(100, 1, 40, "click", 110),  # users 110-134 overlap 100-124
        rows(200, 2, 25, "view", 500),
    ]
    import os as _os

    for i, recs in enumerate(drops):
        _write_drop(cdc_dir, f"d{i}.json", recs)
        _os.utime(cdc_dir / f"d{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    def run():
        q = R.start_rollup_maintenance(
            spark,
            str(cdc_dir),
            schema,
            str(rpath),
            str(ckpt),
            keys=["hour", "event_type"],
            partials_fn=R.hourly_user_sketch_partials,
            max_files_per_trigger=1,
            merge_agg=R.SKETCH_MERGE,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    # restart (epoch fence: replay must not union the same sketch twice,
    # which WOULD be harmless for HLL but MUST still be fenced for the
    # additive n_events beside it) + one more drop
    extra = rows(300, 2, 15, "view", 510)
    _write_drop(cdc_dir, "d3.json", extra)
    run()

    all_rows = [r for d in drops for r in d] + extra
    exact = spark.createDataFrame(
        [(r["event_id"], r["ts"].replace("T", " "), r["event_type"], r["user_id"]) for r in all_rows],
        ["event_id", "ts_s", "event_type", "user_id"],
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "user_id")

    expect = {
        (r["hour"], r["event_type"]): (r["n"], r["u"])
        for r in exact.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.count_distinct("user_id").alias("u"))
        .collect()
    }
    stored = R.read_rollup(spark, str(rpath))
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["est_users"])
        for r in stored.select(
            "hour",
            "event_type",
            "n_events",
            F.round(F.hll_sketch_estimate("users_hll")).cast("long").alias("est_users"),
        ).collect()
    }
    assert got == expect

    # grain coarsening from STORED sketches only: hour-level distincts
    expect_h = {
        (r["hour"],): r["u"]
        for r in exact.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    got_h = {
        (r["hour"],): r["est"]
        for r in stored.groupBy("hour")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("users_hll")))
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert got_h == expect_h


def test_streaming_cms_rollup_bounded_state(spark, tmp_path):
    """Incrementally-maintained point-FREQUENCY estimates: the rollup
    stores one count-min table and each micro-batch SUMS its cells in
    (CMS counts are additive — no custom merge needed). After three
    drops + a fenced restart + a fourth drop: (a) the stored table
    equals a one-shot cms_build over ALL history cell-for-cell —
    exactly-once through the epoch fence; (b) state stays bounded at
    <= depth*width rows however many distinct users arrive; (c) the
    estimate for every user is >= its exact count (CMS can only
    overestimate)."""
    from dynamodb_to_datalake_project_spark import rollup as R
    from dynamodb_to_datalake_project_spark.llm.sketch import (
        cms_build,
        cms_estimate,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )

    def rows(start_id, n, user0, stride):
        return [
            {
                "event_id": start_id + i,
                "ts": f"2024-01-01T01:{i % 60:02d}:00",
                "event_type": "click",
                "user_id": user0 + (i % stride),
            }
            for i in range(n)
        ]

    cdc_dir = tmp_path / "cms_cdc"
    rpath = tmp_path / "cms_rollup"
    ckpt = tmp_path / "cms_ckpt"
    drops = [
        rows(0, 60, 100, 7),  # users 100-106, skewed
        rows(100, 50, 100, 25),  # overlap + new users
        rows(200, 40, 900, 40),  # all-new users
    ]
    import os as _os

    for i, recs in enumerate(drops):
        _write_drop(cdc_dir, f"d{i}.json", recs)
        _os.utime(cdc_dir / f"d{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    def run():
        q = R.start_rollup_maintenance(
            spark,
            str(cdc_dir),
            schema,
            str(rpath),
            str(ckpt),
            keys=["depth", "bucket"],
            partials_fn=R.cms_user_partials,
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    extra = rows(300, 30, 100, 3)
    _write_drop(cdc_dir, "d3.json", extra)
    run()

    all_rows = [r for d in drops for r in d] + extra
    hist = spark.createDataFrame(
        [(r["user_id"],) for r in all_rows], ["user_id"]
    ).select(F.col("user_id").cast("string").alias("item"))
    direct = {
        (r.depth, r.bucket): r.cnt for r in cms_build(hist, "item").collect()
    }
    stored = R.read_rollup(spark, str(rpath))
    got = {(r.depth, r.bucket): r.cnt for r in stored.collect()}
    assert got == direct  # exactly-once: no double-fold through restart
    assert stored.count() <= 4 * 512  # bounded state
    exact = hist.groupBy("item").agg(F.count("*").cast("long").alias("exact_cnt"))
    est = cms_estimate(stored, exact, "item").collect()
    assert est and all(r.cms_est >= r.exact_cnt for r in est)


def test_stream_pattern_detect_cep(spark, tmp_path):
    """Streaming ordered-sequence (CEP) detection: in-order completion
    fires once per journey, over-deadline sequences reset (and re-arm
    on a step-0 event), wrong-order events never match — and a pattern
    STARTED before a query restart COMPLETES after it, proving the
    state machine lives in the checkpointed state store."""
    import os as _os

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    cdc_dir = tmp_path / "cep_cdc"
    ckpt = tmp_path / "cep_ckpt"
    out_dir = tmp_path / "cep_out"
    steps = ["signup", "view", "purchase"]

    def ev(i, minute, etype, user):
        return {
            "event_id": i,
            "ts": f"2024-01-01T10:{minute:02d}:00",
            "event_type": etype,
            "user_id": user,
        }

    drops = [
        # user 1: clean completion within the hour
        [ev(0, 0, "signup", 1), ev(1, 5, "view", 1)],
        # user 2: wrong order (purchase first) — never matches;
        # user 3: starts here, completes after the restart
        [ev(2, 1, "purchase", 2), ev(3, 2, "view", 2),
         ev(4, 3, "signup", 3), ev(5, 4, "view", 3),
         ev(6, 9, "purchase", 1)],
    ]
    for i, recs in enumerate(drops):
        _write_drop(cdc_dir, f"d{i}.json", recs)
        _os.utime(cdc_dir / f"d{i}.json", (1_700_000_000 + i,) * 2)

    def run():
        stream = cdc.read_cdc_stream(spark, str(cdc_dir), schema, 1)
        q = (
            cdc.stream_pattern_detect(stream, steps, within_s=3600)
            .writeStream.format("json")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    # restart + user 3 completes; user 4 blows the 1h deadline then
    # re-arms and completes a FRESH journey
    _write_drop(
        cdc_dir,
        "d2.json",
        [ev(7, 20, "purchase", 3),
         ev(8, 0, "signup", 4)],
    )
    _write_drop(
        cdc_dir,
        "d3.json",
        [
            {"event_id": 9, "ts": "2024-01-01T12:00:00", "event_type": "signup", "user_id": 4},
            {"event_id": 10, "ts": "2024-01-01T12:01:00", "event_type": "view", "user_id": 4},
            {"event_id": 11, "ts": "2024-01-01T12:02:00", "event_type": "purchase", "user_id": 4},
        ],
    )
    _os.utime(cdc_dir / "d2.json", (1_700_000_100,) * 2)
    _os.utime(cdc_dir / "d3.json", (1_700_000_101,) * 2)
    run()

    got = {
        (r.user_id, r.started_ts[:19], r.matched_ts[:19], r.elapsed_s)
        for r in spark.read.json(str(out_dir)).collect()
    }
    assert got == {
        ("1", "2024-01-01 10:00:00", "2024-01-01 10:09:00", 540),
        ("3", "2024-01-01 10:03:00", "2024-01-01 10:20:00", 1020),
        ("4", "2024-01-01 12:00:00", "2024-01-01 12:02:00", 120),
    }


def test_streaming_quantile_grid_rollup(spark, tmp_path):
    """Incrementally-maintained QUANTILES: the rollup stores one
    256-bucket grid and each micro-batch sums its cells in. After
    three drops + a fenced restart + a fourth: the stored grid equals
    a one-shot grid over all history cell-for-cell, and quantiles
    read from it land within one bucket width of exact percentiles
    over the full history."""
    from dynamodb_to_datalake_project_spark import rollup as R
    from dynamodb_to_datalake_project_spark.llm.sketch import (
        quantile_grid_build,
        quantile_grid_read,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def rows(start_id, n, base):
        return [
            {
                "event_id": start_id + i,
                "ts": f"2024-01-01T01:{i % 60:02d}:00",
                "value": float((base + i * 37) % 1000),
            }
            for i in range(n)
        ]

    cdc_dir = tmp_path / "qg_cdc"
    rpath = tmp_path / "qg_rollup"
    ckpt = tmp_path / "qg_ckpt"
    drops = [rows(0, 80, 3), rows(100, 60, 411), rows(200, 70, 777)]
    import os as _os

    for i, recs in enumerate(drops):
        _write_drop(cdc_dir, f"d{i}.json", recs)
        _os.utime(cdc_dir / f"d{i}.json", (1_700_000_000 + i,) * 2)

    def run():
        q = R.start_rollup_maintenance(
            spark,
            str(cdc_dir),
            schema,
            str(rpath),
            str(ckpt),
            keys=["bucket"],
            partials_fn=R.quantile_grid_partials,
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    extra = rows(300, 50, 55)
    _write_drop(cdc_dir, "d3.json", extra)
    run()

    all_rows = [r for d in drops for r in d] + extra
    hist = spark.createDataFrame([(r["value"],) for r in all_rows], ["value"])
    direct = {
        r.bucket: r.cnt for r in quantile_grid_build(hist, "value", 0.0, 1000.0, 256).collect()
    }
    stored = R.read_rollup(spark, str(rpath))
    got = {r.bucket: r.cnt for r in stored.collect()}
    assert got == direct
    qs = [0.5, 0.95]
    est = {
        r.q: r.est
        for r in quantile_grid_read(stored, qs, 0.0, 1000.0, 256).collect()
    }
    exact = hist.selectExpr(
        *[f"percentile(value, {q}) AS q{i}" for i, q in enumerate(qs)]
    ).collect()[0]
    width = 1000.0 / 256
    for i, q in enumerate(qs):
        assert abs(est[q] - exact[i]) <= width + 1e-9


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _doc(doc_id, text):
    return {
        "doc_id": doc_id, "text": text, "lang": "en",
        "source": f"src{doc_id % 3}", "n_chars": len(text),
    }


def test_kafka_segment_cdc_merge_exactly_once(spark, tmp_path):
    """Round-9 S6 generalization: the incremental pipeline fed by RAW
    Kafka v2 segment files — CRC-verified batch walk, JSON values
    parsed against the CDC schema, the same foreachBatch merge as the
    JSON-drop leg. Restart from the same checkpoint processes only new
    segments; stale updates lose on precombine; REMOVE is dropped per
    the reference delete policy."""
    import os

    from dynamodb_to_datalake_project_spark.llm.kafkabatch import (
        encode_kafka_batch,
        start_kafka_segment_merge,
    )

    seg_dir = tmp_path / "segments"
    table = tmp_path / "klake"
    ckpt = tmp_path / "kckpt"
    seg_dir.mkdir(parents=True)

    def write_segment(name, events, base_offset, mtime):
        recs = [
            {
                "key": e["id"].encode(),
                "value": json.dumps(e).encode(),
                "ts_delta": i,
            }
            for i, e in enumerate(events)
        ]
        (seg_dir / name).write_bytes(
            encode_kafka_batch(recs, base_offset=base_offset)
        )
        os.utime(seg_dir / name, (mtime, mtime))

    def run():
        q = start_kafka_segment_merge(
            spark, str(seg_dir), CDC_SCHEMA, str(table),
            keys=["id"], precombine=["update_at"],
            partition_cols=["day"], checkpoint_dir=str(ckpt),
            event_type_col="event_name", max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_segment(
        "00000000.log",
        [
            {"id": "a", "update_at": "2023-01-01T00:00:00", "note": "v1",
             "day": "2023-01-01", "event_name": "INSERT"},
            {"id": "a", "update_at": "2023-01-01T01:00:00", "note": "v2",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "b", "update_at": "2023-01-01T00:00:00", "note": "b1",
             "day": "2023-01-02", "event_name": "INSERT"},
            {"id": "b", "update_at": "2023-01-01T02:00:00", "note": "gone",
             "day": "2023-01-02", "event_name": "REMOVE"},
        ],
        base_offset=0,
        mtime=1_700_000_000,
    )
    run()
    state = {r.id: r.note for r in spark.read.parquet(str(table)).collect()}
    assert state == {"a": "v2", "b": "b1"}  # REMOVE dropped, latest wins

    # restart with a second segment: a stale update (loses), one new key
    write_segment(
        "00000004.log",
        [
            {"id": "a", "update_at": "2023-01-01T00:30:00", "note": "stale",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "c", "update_at": "2023-01-01T03:00:00", "note": "new",
             "day": "2023-01-02", "event_name": "INSERT"},
        ],
        base_offset=4,
        mtime=1_700_000_001,
    )
    run()
    final = spark.read.parquet(str(table))
    assert {r.id: (r.update_at, r.note) for r in final.collect()} == {
        "a": ("2023-01-01T01:00:00", "v2"),
        "b": ("2023-01-01T00:00:00", "b1"),
        "c": ("2023-01-01T03:00:00", "new"),
    }
    assert final.count() == 3  # restart re-processed nothing

    # a third run with no new segments is a no-op (checkpoint fence)
    run()
    assert spark.read.parquet(str(table)).count() == 3


def test_streaming_near_dup_ingest_exactly_once(spark, tmp_path):
    """Streaming twin of corpus_ingest_novel: micro-batches of crawled
    documents are deduped against themselves AND all accepted history
    via a persisted manifest store; a restart from checkpoint (epoch
    fence) plus one more drop must leave the store equal to the batch
    twin that applies ingest_novel_batch drop-by-drop — no double
    appends, no lost batches."""
    import os

    from dynamodb_to_datalake_project_spark.llm import dedup as D

    src = tmp_path / "crawl"
    store = tmp_path / "store"
    ckpt = tmp_path / "ickpt"

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about spark shuffles and parquet files"
    third = "a third unrelated document mentioning tokenizers and embeddings here"
    drops = [
        # drop 0: two novel docs
        [_doc(1, base), _doc(2, other)],
        # drop 1: near-dup of base (shares the 32-char block prefix,
        # jaccard > 0.8), exact dup of other, one novel doc
        [_doc(3, base + " extra"), _doc(4, other), _doc(5, third)],
        # drop 2: within-batch near-dup pair (9 dropped against 8)
        # plus a near-dup of history and a novel doc
        [
            _doc(6, third + " more"),
            _doc(7, "fresh unseen text with enough tokens to pass every stage fine"),
            _doc(8, "identical within batch content that repeats in this very drop"),
            _doc(9, "identical within batch content that repeats in this very drop ok"),
        ],
    ]
    for i, recs in enumerate(drops):
        _write_drop(src, f"c{i}.json", recs)
        os.utime(src / f"c{i}.json", (1_700_000_000 + i, 1_700_000_000 + i))

    def run():
        q = D.start_streaming_ingest(
            spark, str(src), DOC_SCHEMA, str(store), str(ckpt),
            max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    meta1 = D._read_ingest_pointer(str(store))
    assert meta1["last_epoch"] == 2 and len(meta1["files"]) == 3

    # restart: replays nothing new (fence) + a fourth drop with one
    # exact dup of drop-0 history and one novel doc
    _write_drop(src, "c3.json", [_doc(10, base), _doc(11, "final novel doc closing out the stream with plenty of words")])
    os.utime(src / "c3.json", (1_700_000_003, 1_700_000_003))
    run()

    got = {
        r["doc_id"]: r["text"]
        for r in D.read_ingest_store(spark, str(store)).collect()
    }
    # batch twin: same helper applied drop-by-drop
    store_df = None
    for recs in drops + [[_doc(10, base), _doc(11, "final novel doc closing out the stream with plenty of words")]]:
        batch = spark.createDataFrame(
            [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"]) for r in recs],
            DOC_SCHEMA,
        )
        novel = D.ingest_novel_batch(store_df, batch)
        store_df = novel if store_df is None else store_df.unionByName(novel)
    expect = {r["doc_id"]: r["text"] for r in store_df.collect()}
    assert got == expect
    # and the dedup actually dropped things: 3, 4, 6, 9, 10 rejected
    assert set(got) == {1, 2, 5, 7, 8, 11}


def test_zstd_json_cdc_merge_exactly_once(spark, tmp_path):
    """Round-9: S6 with `.json.zst` drops as the wire — the engine's
    own RFC 8878 decoder in the streaming scan, same foreachBatch
    merge, exactly-once through restart; stale updates lose on
    precombine; REMOVE dropped per the reference delete policy."""
    import os

    from dynamodb_to_datalake_project_spark.lake import (
        start_zstd_json_merge,
    )
    from dynamodb_to_datalake_project_spark.llm.zstd import zstd_compress

    drop_dir = tmp_path / "drops"
    table = tmp_path / "zlake"
    ckpt = tmp_path / "zckpt"
    drop_dir.mkdir(parents=True)

    def write_drop(name, events, mtime):
        payload = (
            "\n".join(json.dumps(e) for e in events) + "\n"
        ).encode("utf-8")
        (drop_dir / name).write_bytes(zstd_compress(payload))
        os.utime(drop_dir / name, (mtime, mtime))

    def run():
        q = start_zstd_json_merge(
            spark, str(drop_dir), CDC_SCHEMA, str(table),
            keys=["id"], precombine=["update_at"],
            partition_cols=["day"], checkpoint_dir=str(ckpt),
            event_type_col="event_name", max_files_per_trigger=1,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_drop(
        "d0.json.zst",
        [
            {"id": "a", "update_at": "2023-01-01T00:00:00", "note": "v1",
             "day": "2023-01-01", "event_name": "INSERT"},
            {"id": "a", "update_at": "2023-01-01T01:00:00", "note": "v2",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "b", "update_at": "2023-01-01T00:00:00", "note": "b1",
             "day": "2023-01-02", "event_name": "INSERT"},
            {"id": "b", "update_at": "2023-01-01T02:00:00", "note": "gone",
             "day": "2023-01-02", "event_name": "REMOVE"},
        ],
        mtime=1_700_000_000,
    )
    run()
    state = {r.id: r.note for r in spark.read.parquet(str(table)).collect()}
    assert state == {"a": "v2", "b": "b1"}

    write_drop(
        "d1.json.zst",
        [
            {"id": "a", "update_at": "2023-01-01T00:30:00", "note": "stale",
             "day": "2023-01-01", "event_name": "MODIFY"},
            {"id": "c", "update_at": "2023-01-01T03:00:00", "note": "new",
             "day": "2023-01-02", "event_name": "INSERT"},
        ],
        mtime=1_700_000_001,
    )
    run()
    final = spark.read.parquet(str(table))
    assert {r.id: (r.update_at, r.note) for r in final.collect()} == {
        "a": ("2023-01-01T01:00:00", "v2"),
        "b": ("2023-01-01T00:00:00", "b1"),
        "c": ("2023-01-01T03:00:00", "new"),
    }
    run()  # no new drops: checkpoint fence, no re-processing
    assert spark.read.parquet(str(table)).count() == 3


# ---------------------------------------------------------------------------
# Round 10: Kinesis-shaped shard-parallel source (S6 hot side)
# ---------------------------------------------------------------------------


def test_kinesis_mock_shard_contract(spark, tmp_path):
    """The S5-style connector contract for the hot side: records
    route to shards by MD5(partition_key) (the Kinesis hash-range
    rule), each shard is read by its OWN Spark task (shard fan-out =
    InputPartition per shard), per-shard sequence order is total,
    and the payload parses through the normal schema path."""
    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    stream = km.MockKinesisStream(root, n_shards=3)
    put = {}
    for i in range(60):
        pk = f"user-{i % 17}"
        seq = stream.put_record(pk, {"id": i, "v": f"x{i}"})
        put[seq] = pk

    payload = "id long, v string"
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = km.read_kinesis_stream(
        spark, root, T._parse_datatype_string(payload), n_shards=3
    ).withColumn("task", F.spark_partition_id())
    out_rows = []
    q = (
        df.writeStream.format("memory")
        .queryName("kin_contract")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM kin_contract").collect()
    assert len(rows) == 60
    # routing rule holds for every record
    for r in rows:
        want = km.shard_for_key(r.partition_key, 3)
        assert r.shard_id == f"shard-{want}"
        assert put[r.sequence_number] == r.partition_key
    # shard fan-out: each shard read by exactly one task, and no task
    # mixed two shards (within the batch)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, set()).add(r.task)
    assert all(len(tasks) == 1 for tasks in by_shard.values())
    tasks_used = [t for s in by_shard.values() for t in s]
    assert len(tasks_used) == len(set(tasks_used))
    # payload parsed
    assert {r.id for r in rows} == set(range(60))


def test_kinesis_mock_resume_from_sequence_exactly_once(spark, tmp_path):
    """Restart contract: a second run with the same checkpoint must
    consume ONLY records put after the committed per-shard sequence
    numbers, and the merged table stays exactly-once (the
    glue-job-retry / Lambda-redelivery case the reference's tracker
    state machine guards; here Spark's offset log + idempotent merge
    carry it)."""
    from dynamodb_to_datalake_project_spark import kinesismock as km
    from dynamodb_to_datalake_project_spark import merge as merge_mod

    root = str(tmp_path / "stream")
    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    stream = km.MockKinesisStream(root, n_shards=2)

    from pyspark.sql import types as T

    payload_t = T._parse_datatype_string(
        "id string, update_at string, note string, day string"
    )

    def run_once():
        df = km.read_kinesis_stream(spark, root, payload_t, n_shards=2)

        def batch_fn(bdf, epoch_id):
            src = bdf.select("id", "update_at", "note", "day")
            if src.isEmpty():
                return
            merge_mod.merge_into_parquet(
                bdf.sparkSession, table, src,
                keys=["id"], precombine=["update_at"],
                partition_cols=["day"],
            )

        q = (
            df.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

    for i in range(10):
        stream.put_record(
            f"k{i}", {"id": f"k{i}", "update_at": f"2023-01-01T00:0{i % 10}:00",
                      "note": "v1", "day": "2023-01-01"},
        )
    run_once()
    got = {r.id: r.note for r in spark.read.parquet(table).collect()}
    assert len(got) == 10 and set(got.values()) == {"v1"}

    # second wave: updates for half the keys + new keys
    for i in range(5):
        stream.put_record(
            f"k{i}", {"id": f"k{i}", "update_at": "2023-01-02T00:00:00",
                      "note": "v2", "day": "2023-01-01"},
        )
    for i in range(10, 13):
        stream.put_record(
            f"k{i}", {"id": f"k{i}", "update_at": "2023-01-02T00:00:00",
                      "note": "new", "day": "2023-01-02"},
        )
    run_once()
    got = {r.id: r.note for r in spark.read.parquet(table).collect()}
    assert len(got) == 13
    assert all(got[f"k{i}"] == "v2" for i in range(5))
    assert all(got[f"k{i}"] == "v1" for i in range(5, 10))
    assert all(got[f"k{i}"] == "new" for i in range(10, 13))

    # third run with NOTHING new: no batch merges, table unchanged
    from dynamodb_to_datalake_project_spark import deltatable

    v_before = deltatable.current_version(table)
    run_once()
    assert deltatable.current_version(table) == v_before


def test_kinesis_mock_concurrent_producers_no_lost_sequences(tmp_path):
    """ADVICE r10: `_next_seq` was a read-modify-write race. The
    O_EXCL claim makes sequence allocation atomic — N concurrent
    producers (separate handles, same directory) must produce N×M
    records with distinct dense sequences and no overwritten files."""
    from concurrent.futures import ThreadPoolExecutor

    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    km.MockKinesisStream(root, n_shards=2)

    def produce(i):
        handle = km.MockKinesisStream(root, n_shards=2)
        return [
            handle.put_record(f"key-{i}-{j}", {"p": i, "j": j})
            for j in range(25)
        ]

    with ThreadPoolExecutor(8) as ex:
        seqs = [q for r in ex.map(produce, range(8)) for q in r]
    assert sorted(seqs) == list(range(200)), "dup or lost sequence"
    import os as _os

    durable = sum(
        1
        for s in range(2)
        for f in _os.listdir(_os.path.join(root, f"shard-{s}"))
        if f.endswith(".json")
    )
    assert durable == 200
    ends = km.MockKinesisStream(root, n_shards=2).shard_sequences()
    # every sequence below each shard's end is readable exactly once
    assert max(ends.values()) == 200


def test_kinesis_mock_pending_claim_fences_batch_end(tmp_path):
    """ADVICE r10: a sequence claimed but not yet durable when a
    batch boundary passes must NOT be skipped forever — batch end
    offsets stay below the pending-claim floor until the record
    lands (or its producer is declared dead)."""
    import json as _json
    import os as _os

    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    s = km.MockKinesisStream(root, n_shards=1)
    s.put_record("a", {"v": 1})  # seq 0
    s.put_record("b", {"v": 2})  # seq 1
    pending = s._next_seq(0)     # seq 2 claimed, record NOT durable
    assert pending == 2
    s.put_record("c", {"v": 3})  # seq 3, durable PAST the gap

    # end offset is fenced at the pending claim: 3 is not yet visible
    assert s.shard_sequences() == {"shard-0": 2}

    # the slow producer's record lands: the fence lifts, nothing lost
    with open(_os.path.join(root, "shard-0", f"{pending:012d}.json"), "w") as f:
        _json.dump({"partition_key": "slow", "data": {"v": 9}}, f)
    assert s.shard_sequences() == {"shard-0": 4}


def test_kinesis_mock_batch_cap_paces_without_dropping(tmp_path):
    """`max_records_per_shard_per_batch` is a PACING knob applied in
    latestOffset (what Spark commits), never in partitions: capping
    inside partitions would read less than [start, end) while Spark
    still commits `end`, skipping the gap forever. Walk the reader
    protocol by hand and assert the capped batch ends tile the
    sequence space with no holes."""
    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    stream = km.MockKinesisStream(root, n_shards=1)
    for i in range(5):
        stream.put_record(f"k{i}", {"v": i})

    rd = km._KinesisMockStreamReader(
        {"path": root, "n_shards": "1", "max_records_per_shard_per_batch": "2"}
    )
    start = rd.initialOffset()
    covered = []
    prev = start
    # first batch after (re)start is uncapped by design
    end1 = rd.latestOffset()
    assert end1 == {"shard-0": 5}
    covered += [
        (p.start, p.end) for p in rd.partitions(prev, end1)
    ]
    prev = end1
    for i in range(5, 10):
        stream.put_record(f"k{i}", {"v": i})
    # subsequent batches are paced at <= cap, anchored to last end
    end2 = rd.latestOffset()
    assert end2 == {"shard-0": 7}
    covered += [(p.start, p.end) for p in rd.partitions(prev, end2)]
    prev = end2
    end3 = rd.latestOffset()
    assert end3 == {"shard-0": 9}
    covered += [(p.start, p.end) for p in rd.partitions(prev, end3)]
    prev = end3
    end4 = rd.latestOffset()
    assert end4 == {"shard-0": 10}
    covered += [(p.start, p.end) for p in rd.partitions(prev, end4)]
    # the slices tile [0, 10) exactly: no drops, no overlaps
    seen = sorted(covered)
    assert seen[0][0] == 0 and seen[-1][1] == 10
    for (s0, e0), (s1, _e1) in zip(seen, seen[1:]):
        assert e0 == s1


def test_kinesis_mock_reshard_split_routing_and_registry(tmp_path):
    """SplitShard closes the parent at its durable end and opens two
    children over its hash-range halves; subsequent puts for keys in
    the parent's range land in the children, never the closed parent."""
    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    s = km.MockKinesisStream(root, n_shards=2)
    keys = [f"k{i}" for i in range(40)]
    for k in keys:
        s.put_record(k, {"k": k})
    parent = "shard-0"
    pre_end = s._durable_end(parent)
    c1, c2 = s.split_shard(parent)
    assert s.registry["shards"][parent]["status"] == "CLOSED"
    assert s.registry["shards"][parent]["final_seq_end"] == pre_end
    for kid in (c1, c2):
        assert s.registry["shards"][kid]["parents"] == [parent]

    for k in keys:
        seq = s.put_record(k, {"k": k})
        sid = s.route(k)
        assert sid != parent or km.key_hash(k) >= s.registry[
            "shards"
        ][parent]["range"][1], "closed parent must receive nothing"
    # parent dir gained no records past its final end
    assert s._durable_end(parent) == pre_end
    # children partition the parent's range exactly
    pr = km._load_registry(root, 2)["shards"]
    assert pr[c1]["range"][1] == pr[c2]["range"][0]
    assert (
        pr[c1]["range"][0] == pr[parent]["range"][0]
        and pr[c2]["range"][1] == pr[parent]["range"][1]
    )


def test_kinesis_reshard_resume_exactly_once_parent_before_child(
    spark, tmp_path
):
    """The real DynamoDB-Streams contract the Lambda seam hides
    (round-10 verdict item 3): restart across a SPLIT boundary. The
    checkpointed consumer must (a) resume without re-consuming
    pre-split records, (b) drain the closed parent to final_seq_end
    BEFORE committing any child batch, and (c) end exactly-once in
    the merged table."""
    import json as _json
    import os as _os

    from dynamodb_to_datalake_project_spark import kinesismock as km
    from dynamodb_to_datalake_project_spark import merge as merge_mod
    from pyspark.sql import types as T

    root = str(tmp_path / "stream")
    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    stream = km.MockKinesisStream(root, n_shards=2)
    payload_t = T._parse_datatype_string(
        "id string, update_at string, note string, day string"
    )

    def put(i, note):
        stream.put_record(
            f"k{i}",
            {"id": f"k{i}", "update_at": f"2023-01-01T00:{i:02d}:00",
             "note": note, "day": "2023-01-01"},
        )

    def run_once():
        df = km.read_kinesis_stream(spark, root, payload_t, n_shards=2)

        def batch_fn(bdf, epoch_id):
            src = bdf.select("id", "update_at", "note", "day")
            if src.isEmpty():
                return
            merge_mod.merge_into_parquet(
                bdf.sparkSession, table, src,
                keys=["id"], precombine=["update_at"],
                partition_cols=["day"],
            )

        q = (
            df.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()

    for i in range(10):
        put(i, "v1")
    run_once()
    assert spark.read.parquet(table).count() == 10

    # SPLIT shard-0 between runs, then produce post-split records
    stream.split_shard("shard-0")
    for i in range(10, 20):
        put(i, "v2")
    # one restarted run suffices: the closed parent's tail and the
    # children drain (parent never AFTER child — see latestOffset)
    run_once()

    got = {r.id: r.note for r in spark.read.parquet(table).collect()}
    assert len(got) == 20
    assert all(got[f"k{i}"] == "v1" for i in range(10))
    assert all(got[f"k{i}"] == "v2" for i in range(10, 20))

    # offset-log audit: in every committed batch, any child progress
    # implies its parent was already at final_seq_end in that SAME
    # batch's end offsets (parent-before-child, exactly the KCL rule)
    reg = km._load_registry(root, 2)["shards"]
    odir = _os.path.join(ckpt, "offsets")
    for fname in sorted(_os.listdir(odir)):
        if fname.startswith("."):
            continue
        lines = open(_os.path.join(odir, fname)).read().splitlines()
        payload = _json.loads(lines[-1])
        if not isinstance(payload, dict) or "version" in payload.get("", {}):
            pass
        try:
            offsets = payload
        except Exception:
            continue
        if not isinstance(offsets, dict):
            continue
        for sid, pos in offsets.items():
            info = reg.get(sid)
            if not info or not info["parents"] or not pos:
                continue
            for p in info["parents"]:
                fin = reg[p]["final_seq_end"]
                assert offsets.get(p, 0) >= (fin or 0), (
                    f"batch {fname}: child {sid} advanced before "
                    f"parent {p} drained"
                )


def test_kinesis_reshard_strict_parent_drain_in_steady_state(tmp_path):
    """Manual protocol walk of the steady-state rule: a child shard
    is exposed only after a PRIOR batch drained its parent to
    final_seq_end — with the per-batch cap slowing the parent, the
    child waits exactly until the parent catches up."""
    from dynamodb_to_datalake_project_spark import kinesismock as km

    root = str(tmp_path / "stream")
    s = km.MockKinesisStream(root, n_shards=1)
    for i in range(20):
        s.put_record(f"k{i}", {"i": i})

    rd = km._KinesisMockStreamReader(
        {"path": root, "n_shards": "1",
         "max_records_per_shard_per_batch": "10"}
    )
    start = rd.initialOffset()
    e1 = rd.latestOffset()  # first batch: uncapped -> parent at 20
    assert e1["shard-0"] == 20
    # split AFTER batch 1; evidence says parent drained (20 >= 20)
    c1, c2 = s.split_shard("shard-0")
    for i in range(20, 30):
        s.put_record(f"k{i}", {"i": i})
    e2 = rd.latestOffset()
    assert c1 in e2 and c2 in e2, "drained parent frees the children"

    # now the slow-parent case: fresh stream, cap forces two batches
    root2 = str(tmp_path / "stream2")
    s2 = km.MockKinesisStream(root2, n_shards=1)
    for i in range(20):
        s2.put_record(f"k{i}", {"i": i})
    rd2 = km._KinesisMockStreamReader(
        {"path": root2, "n_shards": "1",
         "max_records_per_shard_per_batch": "10"}
    )
    rd2.initialOffset()
    b1 = rd2.latestOffset()          # 20 (first batch uncapped)
    s2.put_record("late", {"i": 99})  # parent grows to 21
    c1, c2 = s2.split_shard("shard-0")  # final_seq_end = 21
    for i in range(30, 35):
        s2.put_record(f"k{i}", {"i": i})
    b2 = rd2.latestOffset()
    # parent capped at 20+10 >= 21 -> reaches final; children gated
    # because the PRIOR batch (b1=20) had not drained it
    assert b2["shard-0"] == 21
    assert c1 not in b2 and c2 not in b2
    b3 = rd2.latestOffset()
    assert c1 in b3 and c2 in b3, "drain evidence from b2 frees them"
