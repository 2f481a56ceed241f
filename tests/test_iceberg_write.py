"""Iceberg v2 snapshot writer (`icebergtable`): metadata chain,
manifest reuse, partition-replacement commits, bounds, and the cold
read-back through the in-repo resolver (`llm.tablemeta`) — the
symmetric closure of the Iceberg READ path (round-10 verdict item 1).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import icebergtable as it
from dynamodb_to_datalake_project_spark.llm.avrofile import parse_avro
from dynamodb_to_datalake_project_spark.llm.tablemeta import (
    iceberg_scan_plan,
    parse_iceberg_metadata,
    resolve_iceberg_snapshot,
)


def _mk(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("day", (F.col("id") / 100).cast("int").cast("string"))
        .withColumn("payload", F.concat(F.lit("p"), F.col("id")))
    )


def _ml_paths(table, snapshot_meta):
    with open(os.path.join(table, snapshot_meta["manifest-list"]), "rb") as f:
        return [r["manifest_path"] for r in parse_avro(f.read())["records"]]


def test_append_then_resolve_cold(spark, tmp_path):
    """One append: the resolver (cross-checking every redundant count
    the format carries) agrees with a live Spark read, and
    parse_iceberg_metadata sees the schema/spec/summary."""
    t = str(tmp_path / "tbl")
    sid = it.append(_mk(spark, 0, 500), t, "day")
    assert sid == 1 and it.current_version(t) == 1

    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["live_records"] == 500
    assert res["n_partitions"] == 5
    assert res["deleted_files"] == 0
    assert it.read_table_df(spark, t).count() == 500

    meta = parse_iceberg_metadata(it.metadata_text(t))
    assert meta["schema_cols"] == ["id", "day", "payload"]
    assert meta["partition_fields"] == ["day"]
    assert meta["total_records"] == 500
    assert meta["operation"] == "append"


def test_append_reuses_prior_manifests(spark, tmp_path):
    """The scale property: a second append's manifest list carries the
    first commit's manifest file UNCHANGED (same path, same bytes) —
    append cost is O(new files), never O(table)."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 300), t, "day")
    ml1 = _ml_paths(t, it.read_metadata(t, 1)["snapshots"][0])
    it.append(_mk(spark, 1000, 1300), t, "day")
    meta2 = it.read_metadata(t)
    cur2 = next(
        s
        for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    )
    ml2 = _ml_paths(t, cur2)
    assert set(ml1) < set(ml2), "prior manifest must be carried forward"
    assert len(ml2) == len(ml1) + 1
    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["live_records"] == 600


def test_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """Partition replacement: days in the batch are replaced
    wholesale (old files DELETED this snapshot), other days'
    files survive as EXISTING; final content equals latest-write-wins
    per day."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 500), t, "day")  # days 0-4, 100 rows each
    # replace days 2-3 with HALF the rows (50-99 of each hundred)
    b2 = _mk(spark, 0, 500).filter(
        F.col("day").isin("2", "3") & (F.col("id") % 100 >= 50)
    )
    it.overwrite_partitions(b2, t, "day")

    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["live_records"] == 300 + 100  # days 0,1,4 full + 2,3 half
    assert res["deleted_files"] > 0
    df = it.read_table_df(spark, t)
    assert df.count() == 400
    per_day = {r["day"]: r["cnt"] for r in
               df.groupBy("day").agg(F.count("*").alias("cnt")).collect()}
    assert per_day == {"0": 100, "1": 100, "2": 50, "3": 50, "4": 100}
    assert it.partition_census(t, "day") == {
        "0": 100, "1": 100, "2": 50, "3": 50, "4": 100
    }


def test_deleted_entries_compacted_on_next_commit(spark, tmp_path):
    """Spec rule: DELETED entries are visible only in the snapshot
    that deleted them. The commit AFTER an overwrite must carry the
    affected manifest with its deletes dropped (and the resolver must
    see deleted_files == 0 again)."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 300), t, "day")
    it.overwrite_partitions(
        _mk(spark, 0, 300).filter(F.col("day") == "1"), t, "day"
    )
    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["deleted_files"] > 0  # the overwrite snapshot shows them
    it.append(_mk(spark, 5000, 5100), t, "day")
    res2 = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res2["deleted_files"] == 0
    assert res2["live_records"] == 400


def test_time_travel_via_metadata_versions(spark, tmp_path):
    """Each vN.metadata.json resolves to its exact historical state;
    files are never deleted by commits, so old snapshots stay
    readable."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 200), t, "day")
    it.overwrite_partitions(
        _mk(spark, 0, 200).filter(
            (F.col("day") == "0") & (F.col("id") < 10)
        ),
        t,
        "day",
    )
    files = it.storage_files(t)
    v1 = resolve_iceberg_snapshot(it.metadata_text(t, 1), files)
    v2 = resolve_iceberg_snapshot(it.metadata_text(t, 2), files)
    assert v1["live_records"] == 200
    assert v2["live_records"] == 110
    assert v1["snapshot_id"] == 1 and v2["snapshot_id"] == 2
    m = it.read_metadata(t)
    cur = next(
        s
        for s in m["snapshots"]
        if s["snapshot-id"] == m["current-snapshot-id"]
    )
    assert cur["parent-snapshot-id"] == 1
    assert m["last-sequence-number"] == 2


def test_manifest_bounds_prune_narrow_scan(spark, tmp_path):
    """Footer statistics become manifest column_bounds: a narrow id
    probe scans ~1 file and skips the rest; a probe below the domain
    skips everything."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 1000), t, "day")  # monotone id per day
    files = it.storage_files(t)
    meta_txt = it.metadata_text(t)
    fid = next(
        f["id"]
        for f in json.loads(meta_txt)["schemas"][0]["fields"]
        if f["name"] == "id"
    )
    total = iceberg_scan_plan(meta_txt, files, fid, -(10**9), 10**9)
    narrow = iceberg_scan_plan(meta_txt, files, fid, 250, 260)
    below = iceberg_scan_plan(meta_txt, files, fid, -100, -1)
    assert total["scanned"] == total["total"] > 0
    assert narrow["skipped"] >= total["total"] - 2
    assert narrow["scanned_rows"] < 1000
    assert below["skipped"] == below["total"]


def test_string_columns_ship_no_long_bounds(spark, tmp_path):
    """Bounds are emitted only for columns whose physical type
    decodes to a long; string columns carry none and the planner must
    scan files for them (conservative missing-stats rule)."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 100), t, "day")
    for df in it.live_files(t):
        ids = {b["field_id"] for b in df["column_bounds"]}
        assert ids == {1}, "only the long `id` column has bounds"


def test_corrupted_manifest_length_rejected(spark, tmp_path):
    """The resolver's cross-checks are real: tampering with a
    manifest blob makes the cold read fail loudly."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 100), t, "day")
    files = it.storage_files(t)
    mf = next(k for k in files if "/mf-" in k)
    files[mf] = files[mf] + b"x"
    with pytest.raises(ValueError, match="bytes"):
        resolve_iceberg_snapshot(it.metadata_text(t), files)


def test_schema_evolution_stable_field_ids(spark, tmp_path):
    """An append with a new column + a widened type evolves the
    schema: existing columns KEEP their field ids (bounds in prior
    manifests stay resolvable), the new column gets a fresh id, the
    metadata chain accumulates both schemas with current-schema-id
    bumped, and reads NULL-backfill old files."""
    t = str(tmp_path / "tbl")
    b1 = (
        spark.range(0, 200)
        .withColumn("day", (F.col("id") / 100).cast("int").cast("string"))
        .withColumn("n", F.col("id").cast("int"))
    )
    it.append(b1, t, "day")
    meta1 = it.read_metadata(t)
    ids1 = {
        f["name"]: f["id"] for f in meta1["schemas"][0]["fields"]
    }

    b2 = (
        spark.range(1000, 1100)
        .withColumn("day", F.lit("9"))
        .withColumn("n", F.col("id"))          # int -> long widening
        .withColumn("score", F.lit(0.5))       # new column
    )
    it.append(b2, t, "day")
    meta2 = it.read_metadata(t)
    assert len(meta2["schemas"]) == 2
    assert meta2["current-schema-id"] == 1
    cur = next(
        sc for sc in meta2["schemas"] if sc["schema-id"] == 1
    )
    by_name = {f["name"]: f for f in cur["fields"]}
    for name, fid in ids1.items():
        assert by_name[name]["id"] == fid, "existing ids must be stable"
    assert by_name["n"]["type"] == "long"
    assert by_name["score"]["id"] == max(ids1.values()) + 1
    assert meta2["last-column-id"] == by_name["score"]["id"]

    df = it.read_table_df(spark, t)
    assert df.schema["n"].dataType.simpleString() == "bigint"
    got = df.groupBy(F.isnull("score").alias("no_score")).count().collect()
    counts = {r.no_score: r["count"] for r in got}
    assert counts == {True: 200, False: 100}

    # resolver still green across the evolution
    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["live_records"] == 300

    # rejections mirror the Delta leg
    dropped = spark.range(0, 5).withColumn("day", F.lit("1"))
    with pytest.raises(ValueError, match="never drops"):
        it.append(dropped, t, "day")
    bad = (
        spark.range(0, 5)
        .withColumn("day", F.lit("1"))
        .withColumn("n", F.lit("x"))
        .withColumn("score", F.lit(0.5))
    )
    with pytest.raises(ValueError, match="incompatible"):
        it.append(bad, t, "day")


def test_schema_evolution_time_travel_schema(spark, tmp_path):
    """Pre-evolution metadata versions keep the old schema (schemas
    list + current-schema-id are per-version files)."""
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 100), t, "day")
    b2 = _mk(spark, 1000, 1100).withColumn("extra", F.lit(1))
    it.append(b2, t, "day")
    m1 = it.read_metadata(t, 1)
    m2 = it.read_metadata(t, 2)
    assert m1["current-schema-id"] == 0 and len(m1["schemas"]) == 1
    assert m2["current-schema-id"] == 1 and len(m2["schemas"]) == 2
    assert it.spark_schema_of(t, 1).fieldNames() == ["id", "day", "payload"]


def test_position_delete_write_and_mor_read(spark, tmp_path):
    """delete_where writes v2 position deletes (content=1 manifest +
    sorted delete parquet, NO data rewrite): the MOR scan drops
    exactly the matching rows, the independent tablemeta walk agrees,
    the plain resolver still counts every physical row, a LATER
    append is untouched by the older delete (sequence rule), and an
    overwrite drops the replaced partition's now-dangling deletes."""
    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        read_iceberg_with_deletes,
        resolve_iceberg_snapshot,
    )

    t = str(tmp_path / "tbl")
    df = spark.range(0, 500).withColumn(
        "day", (F.col("id") / 100).cast("int").cast("string")
    )
    it.append(df, t, "day")
    sid = it.delete_where(spark, t, "id", set(range(0, 500, 7)), "day")
    assert sid == 2
    expect = 500 - len(range(0, 500, 7))

    mor = it.read_table_df_mor(spark, t)
    assert mor.count() == expect
    assert mor.filter(F.col("id") % 7 == 0).count() == 0

    # physical census unchanged — deletes are metadata
    res = resolve_iceberg_snapshot(it.metadata_text(t), it.storage_files(t))
    assert res["live_records"] == 500

    # the independent spec-rule walk agrees row-for-row
    files = it.storage_files(t)
    for f in it.live_files(t, content=0) + it.live_files(t, content=1):
        with open(os.path.join(t, f["file_path"]), "rb") as fh:
            files[f["file_path"]] = fh.read()
    out = read_iceberg_with_deletes(it.metadata_text(t), files, "id")
    assert sum(len(v) for v in out.values()) == expect
    assert all(v % 7 != 0 for vals in out.values() for v in vals)

    # sequence rule: a post-delete append is NOT affected
    it.append(spark.range(0, 14).withColumn("day", F.lit("9")), t, "day")
    mor2 = it.read_table_df_mor(spark, t)
    assert mor2.count() == expect + 14
    assert mor2.filter(
        (F.col("day") == "9") & (F.col("id") % 7 == 0)
    ).count() == 2

    # overwrite drops the replaced partition's dangling deletes; the
    # strict tablemeta walk (which REJECTS dangling refs) stays green
    it.overwrite_partitions(
        spark.range(0, 50).withColumn("day", F.lit("0")), t, "day"
    )
    files3 = it.storage_files(t)
    for f in it.live_files(t, content=0) + it.live_files(t, content=1):
        with open(os.path.join(t, f["file_path"]), "rb") as fh:
            files3[f["file_path"]] = fh.read()
    out3 = read_iceberg_with_deletes(it.metadata_text(t), files3, "id")
    assert it.read_table_df_mor(spark, t).count() == sum(
        len(v) for v in out3.values()
    )


def test_delete_where_no_match_is_noop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_mk(spark, 0, 100), t, "day")
    v = it.current_version(t)
    assert it.delete_where(spark, t, "id", {10**9}, "day") is None
    assert it.current_version(t) == v


def test_equality_delete_write_strictly_older_rule(spark, tmp_path):
    """delete_equal writes a content=2 equality delete (just the
    doomed values — no data scan at all): rows with those values in
    OLDER data files disappear from the MOR scan, a LATER append
    re-inserting a deleted value survives (the spec's strictly-<
    rule — the CDC tombstone semantics), and the independent
    tablemeta walk agrees."""
    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        read_iceberg_with_deletes,
    )

    t = str(tmp_path / "tbl")
    df = spark.range(0, 300).withColumn(
        "day", (F.col("id") / 100).cast("int").cast("string")
    )
    it.append(df, t, "day")
    sid = it.delete_equal(spark, t, "id", {5, 105, 205, 250}, "day")
    assert sid == 2
    mor = it.read_table_df_mor(spark, t)
    assert mor.count() == 296
    assert mor.filter(F.col("id").isin(5, 105, 205, 250)).count() == 0

    # re-insert two deleted values in a LATER append: they survive
    it.append(
        spark.createDataFrame([(5, "9"), (205, "9")], "id long, day string"),
        t,
        "day",
    )
    mor2 = it.read_table_df_mor(spark, t)
    assert mor2.count() == 298
    assert mor2.filter(F.col("id") == 5).count() == 1
    got_days = {
        r.day for r in mor2.filter(F.col("id") == 5).collect()
    }
    assert got_days == {"9"}, "only the post-delete copy survives"

    # independent walk agrees
    files = it.storage_files(t)
    for f in (
        it.live_files(t, content=0)
        + it.live_files(t, content=1)
        + it.live_files(t, content=2)
    ):
        with open(os.path.join(t, f["file_path"]), "rb") as fh:
            files[f["file_path"]] = fh.read()
    out = read_iceberg_with_deletes(it.metadata_text(t), files, "id")
    assert sum(len(v) for v in out.values()) == 298


def test_position_and_equality_deletes_compose(spark, tmp_path):
    """Both delete kinds on one table: positions drop specific rows,
    equality drops a value everywhere older — the MOR scan applies
    both with their distinct sequence rules."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 100).withColumn("day", F.lit("d"))
    it.append(df, t, "day")
    it.delete_where(spark, t, "id", {1, 2, 3}, "day")
    it.delete_equal(spark, t, "id", {50, 51}, "day")
    mor = it.read_table_df_mor(spark, t)
    assert mor.count() == 95
    assert mor.filter(F.col("id").isin(1, 2, 3, 50, 51)).count() == 0
