"""Hudi COW writer (`huditable`): timeline states, file-group-scoped
rewrites, latest-slice reads, write-stat accounting through the
in-repo replay, meta columns, and crash/idempotency behavior.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import huditable as ht


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id string, update_at string, note string, day string"
    )


def test_insert_then_upsert_latest_slice_wins(spark, tmp_path):
    t = str(tmp_path / "hudi")
    i1 = ht.upsert(
        _df(spark, [
            ("a", "2023-01-01T10:00:00", "v1", "d1"),
            ("b", "2023-01-01T11:00:00", "v1", "d2"),
        ]),
        t, "id", "update_at", "day",
    )
    i2 = ht.upsert(
        _df(spark, [
            ("a", "2023-01-01T12:00:00", "v2", "d1"),
            ("c", "2023-01-01T12:00:00", "new", "d1"),
        ]),
        t, "id", "update_at", "day",
    )
    assert i2 > i1
    got = {r.id: r.note for r in ht.read_table_df(spark, t).collect()}
    assert got == {"a": "v2", "b": "v1", "c": "new"}

    state = ht.table_state(t)
    assert state["n_commits"] == 2
    assert state["live_records"] == 3
    assert state["total_updates"] == 1
    assert state["total_inserts"] == 3
    # d2's slice was NOT touched by commit 2
    d2 = next(
        f for f in state["live_files"].values() if f["partition"] == "day=d2"
    )
    assert d2["instant"] == i1
    # superseded d1 slice from i1 still on disk (COW history)
    assert any(
        fn.endswith(f"{i1}.parquet")
        for fn in os.listdir(os.path.join(t, "day=d1"))
    )


def test_file_group_scoped_rewrite(spark, tmp_path):
    """With 4 groups, an upsert touching ONE key rewrites only that
    key's group slice — the other groups keep their instant."""
    t = str(tmp_path / "hudi")
    rows = [
        (f"k{i}", "2023-01-01T10:00:00", "v1", "d1") for i in range(40)
    ]
    i1 = ht.upsert(_df(spark, rows), t, "id", "update_at", "day",
                   n_file_groups=4)
    i2 = ht.upsert(
        _df(spark, [("k0", "2023-01-01T12:00:00", "v2", "d1")]),
        t, "id", "update_at", "day", n_file_groups=4,
    )
    state = ht.table_state(t)
    instants = sorted(f["instant"] for f in state["live_files"].values())
    assert instants.count(i2) == 1 and instants.count(i1) == 3
    got = {r.id: r.note for r in ht.read_table_df(spark, t).collect()}
    assert got["k0"] == "v2" and len(got) == 40
    assert state["live_records"] == 40


def test_commit_stats_cross_checked_by_replay(spark, tmp_path):
    """numWrites / numInserts / numUpdateWrites in the commit JSON
    must reconcile: replay sums them and the live read agrees."""
    t = str(tmp_path / "hudi")
    ht.upsert(
        _df(spark, [
            ("a", "2023-01-01T10:00:00", "v1", "d1"),
            ("b", "2023-01-01T10:00:00", "v1", "d1"),
        ]),
        t, "id", "update_at", "day",
    )
    ht.upsert(
        _df(spark, [
            ("a", "2023-01-01T12:00:00", "v2", "d1"),  # update
            ("c", "2023-01-01T12:00:00", "new", "d1"),  # insert
        ]),
        t, "id", "update_at", "day",
    )
    tl = ht.timeline(t)
    assert len(tl) == 2
    c2 = json.loads(tl[1][1])
    st = c2["partitionToWriteStats"]["day=d1"][0]
    assert st["numWrites"] == 3
    assert st["numUpdateWrites"] == 1
    assert st["numInserts"] == 1
    assert st["prevCommit"] == tl[0][0]
    state = ht.table_state(t)
    assert state["live_records"] == ht.read_table_df(spark, t).count() == 3


def test_incomplete_instant_ignored(spark, tmp_path):
    """A crash before the completed rename leaves requested/inflight
    markers; replay and reads ignore them (the timeline defines the
    table)."""
    t = str(tmp_path / "hudi")
    ht.upsert(
        _df(spark, [("a", "2023-01-01T10:00:00", "v1", "d1")]),
        t, "id", "update_at", "day",
    )
    # hand-plant a dangling inflight instant
    hd = os.path.join(t, ".hoodie")
    open(os.path.join(hd, "20990101000000000.commit.requested"), "w").close()
    open(os.path.join(hd, "20990101000000000.inflight"), "w").close()
    state = ht.table_state(t)
    assert state["n_commits"] == 1
    assert ht.read_table_df(spark, t).count() == 1


def test_meta_columns_shape(spark, tmp_path):
    """The five _hoodie_* columns carry the real-Hudi shapes: commit
    instant, per-slice ordinal seqno, stringified key, hive partition
    path, and the slice's actual file name."""
    t = str(tmp_path / "hudi")
    instant = ht.upsert(
        _df(spark, [
            ("a", "2023-01-01T10:00:00", "v1", "d1"),
            ("b", "2023-01-01T10:00:00", "v1", "d1"),
        ]),
        t, "id", "update_at", "day",
    )
    rows = ht.read_table_df(spark, t, with_meta=True).collect()
    state = ht.table_state(t)
    by_key = {r._hoodie_record_key: r for r in rows}
    assert set(by_key) == {"a", "b"}
    for r in rows:
        assert r._hoodie_commit_time == instant
        assert r._hoodie_partition_path == "day=d1"
        assert r._hoodie_commit_seqno.startswith(instant + "_")
        rel = f"day=d1/{r._hoodie_file_name}"
        assert any(
            f["path"] == rel for f in state["live_files"].values()
        ), "file_name must be the slice's real name"
        assert os.path.isfile(os.path.join(t, rel))


def test_idempotent_reapply(spark, tmp_path):
    """T9: re-upserting the same batch is a no-op on table content
    (same rows, same counts) — only the timeline grows."""
    t = str(tmp_path / "hudi")
    batch = _df(spark, [
        ("a", "2023-01-01T10:00:00", "v1", "d1"),
        ("b", "2023-01-01T10:00:00", "v1", "d2"),
    ])
    ht.upsert(batch, t, "id", "update_at", "day")
    before = {
        (r.id, r.update_at, r.note)
        for r in ht.read_table_df(spark, t).collect()
    }
    ht.upsert(batch, t, "id", "update_at", "day")
    after = {
        (r.id, r.update_at, r.note)
        for r in ht.read_table_df(spark, t).collect()
    }
    assert before == after
    assert ht.table_state(t)["n_commits"] == 2


def test_mor_timeline_rejected_by_replay(spark, tmp_path):
    """The reader's honest boundary: a compaction instant (MOR)
    raises rather than mis-folding."""
    t = str(tmp_path / "hudi")
    ht.upsert(
        _df(spark, [("a", "2023-01-01T10:00:00", "v1", "d1")]),
        t, "id", "update_at", "day",
    )
    with open(
        os.path.join(t, ".hoodie", "20990101000000001.commit"), "w"
    ) as f:
        json.dump({"operationType": "compact", "partitionToWriteStats": {}}, f)
    with pytest.raises(NotImplementedError, match="compaction"):
        ht.table_state(t)
