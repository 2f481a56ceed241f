"""Streaming reads over the Delta log (`deltastream.read_delta_tail`):
version-granular offsets through Spark's checkpoint, dataChange
filtering, restart exactly-once, and schema-evolution backfill.
"""

from __future__ import annotations

from dynamodb_to_datalake_project_spark import deltastream, merge


def _merge_rows(spark, path, rows, schema=None, **kw):
    cols = schema or "id string, update_at string, note string, day string"
    merge.merge_into_parquet(
        spark, path, spark.createDataFrame(rows, cols),
        ["id"], ["update_at"], ["day"], **kw,
    )


def _drain_fresh(spark, table, name):
    """One-shot full-history read (no checkpoint)."""
    q = (
        deltastream.read_delta_tail(spark, table)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _drain_checkpointed(spark, table, ckpt):
    """Checkpointed incremental read: returns the rows of THIS run
    only (restart resumes after the last committed version)."""
    seen = []

    def batch_fn(bdf, epoch_id):
        seen.extend(tuple(r) for r in bdf.collect())

    q = (
        deltastream.read_delta_tail(spark, table)
        .writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return seen


def test_delta_tail_streams_adds_and_resumes(spark, tmp_path):
    """Two merges -> one drain sees both versions' adds; a restart
    with the same checkpoint consumes ONLY versions committed after
    the stop (exactly-once at version granularity); an OPTIMIZE
    commit (dataChange=false) emits nothing."""
    table = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    _merge_rows(spark, table, [("a", "2023-01-01T10:00:00", "v1", "2023-01-01")])
    _merge_rows(spark, table, [("b", "2023-01-02T10:00:00", "v1", "2023-01-02")])

    rows1 = _drain_checkpointed(spark, table, ckpt)
    # v0 add: a; v1 add: b (day=02 is a new partition, day=01 untouched)
    assert sorted((r[0], r[3]) for r in rows1) == [
        ("a", "2023-01-01"), ("b", "2023-01-02"),
    ]

    # a merge REWRITING day=01 re-emits that partition (the
    # ignoreChanges contract); day=02 is untouched and silent;
    # the restarted run must NOT re-consume versions 0-1
    _merge_rows(spark, table, [("a", "2023-01-01T12:00:00", "v2", "2023-01-01")])
    rows2 = _drain_checkpointed(spark, table, ckpt)
    assert sorted((r[0], r[2]) for r in rows2) == [("a", "v2")]

    # a fresh (uncheckpointed) drain replays surviving history: the
    # swap-mode rewrite physically deleted v0's day=01 file, so its
    # add is skipped (ignoreMissingFiles semantics) — the rewrite's
    # own add carries a's current row
    rows_all = _drain_fresh(spark, table, "dt_tail_all")
    assert sorted((r.id, r.note) for r in rows_all) == [
        ("a", "v2"), ("b", "v1"),
    ]

    # OPTIMIZE: dataChange=false -> nothing streams on the
    # checkpointed tail (the entire point of the dataChange flag)
    merge.optimize_table(spark, table, ["day"], max_files_ok=0)
    assert _drain_checkpointed(spark, table, ckpt) == []


def test_delta_tail_schema_evolution_backfill(spark, tmp_path):
    """Files written before an evolution lack the new column; the
    stream NULL-backfills them while post-evolution adds carry it."""
    table = str(tmp_path / "lake")
    _merge_rows(spark, table, [("a", "2023-01-01T10:00:00", "v1", "2023-01-01")])
    _merge_rows(
        spark, table,
        [("b", "2023-01-02T10:00:00", "v1", "2023-01-02", 7)],
        schema="id string, update_at string, note string, day string, "
               "score bigint",
        evolve_schema=True,
    )
    rows = _drain_fresh(spark, table, "dt_evo")
    got = {r.id: r.score for r in rows}
    assert got == {"a": None, "b": 7}


def test_delta_tail_downstream_merge_exactly_once(spark, tmp_path):
    """The CDF-lite composition: tail one Delta table INTO another via
    foreachBatch merge; re-emitted rewrite rows dedup through the
    idempotent (key, precombine) merge — the T9 discipline."""
    src_table = str(tmp_path / "src")
    dst_table = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")

    _merge_rows(spark, src_table, [
        ("a", "2023-01-01T10:00:00", "v1", "2023-01-01"),
        ("b", "2023-01-02T10:00:00", "v1", "2023-01-02"),
    ])
    _merge_rows(spark, src_table, [
        ("a", "2023-01-01T12:00:00", "v2", "2023-01-01"),
    ])

    def batch_fn(bdf, epoch_id):
        if bdf.isEmpty():
            return
        merge.merge_into_parquet(
            bdf.sparkSession, dst_table, bdf,
            keys=["id"], precombine=["update_at"], partition_cols=["day"],
        )

    q = (
        deltastream.read_delta_tail(spark, src_table)
        .writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    got = {r.id: r.note for r in spark.read.parquet(dst_table).collect()}
    assert got == {"a": "v2", "b": "v1"}
