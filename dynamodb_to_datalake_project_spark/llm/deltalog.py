"""Delta Lake transaction-log replay — zero-dep table-state audit.

The public Delta protocol stores a table's state as JSON-lines action
files under `_delta_log/` (protocol / metaData / add / remove /
commitInfo actions); the current snapshot is a pure fold over them in
version order: the LAST add/remove per file path wins. This module
replays that fold without Spark or delta-spark — the audit a lake
operator runs against a Delta table nobody can open ("how many active
files/rows, which schema, which writer protocol?"), and the honest
zero-dep companion to `merge_delta.py` (whose Delta MERGE leg needs
the real delta-spark package).

Subset contract: JSON commits only (parquet checkpoints raise
NotImplementedError — reading them is `llm.parquetmeta`'s job),
unknown action types are ignored per the protocol's forward-compat
rule, malformed JSON or out-of-order versions raise ValueError.
"""

from __future__ import annotations

import json


def replay_delta_log(commits: "list[tuple[int, str]]") -> dict:
    """Fold JSON commit files (version, content) into the table
    snapshot: {"version", "protocol", "schema_cols", "partition_cols",
    "active_files": {path: {"size", "num_records"}}, "n_removed",
    "total_bytes", "total_rows"}. Versions must be contiguous from 0
    (the protocol requires it for a cold read)."""
    commits = sorted(commits)
    if [v for v, _ in commits] != list(range(len(commits))):
        raise ValueError("delta: commit versions not contiguous from 0")
    protocol = None
    schema_cols: "list[str]" = []
    partition_cols: "list[str]" = []
    active: "dict[str, dict]" = {}
    n_removed = 0
    for version, content in commits:
        for line in content.splitlines():
            if not line.strip():
                continue
            try:
                action = json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(
                    f"delta: malformed action in commit {version}: {exc}"
                )
            if not isinstance(action, dict) or len(action) != 1:
                raise ValueError(
                    f"delta: action must be a single-key object "
                    f"(commit {version})"
                )
            (kind, body), = action.items()
            if kind == "protocol":
                protocol = (
                    body.get("minReaderVersion"),
                    body.get("minWriterVersion"),
                )
            elif kind == "metaData":
                try:
                    schema = json.loads(body["schemaString"])
                except (KeyError, json.JSONDecodeError) as exc:
                    raise ValueError(f"delta: bad metaData schema: {exc}")
                schema_cols = [f["name"] for f in schema.get("fields", [])]
                partition_cols = body.get("partitionColumns", [])
            elif kind == "add":
                path = body["path"]
                stats = {}
                if body.get("stats"):
                    try:
                        stats = json.loads(body["stats"])
                    except json.JSONDecodeError as exc:
                        raise ValueError(f"delta: bad add stats: {exc}")
                active[path] = {
                    "size": body.get("size", 0),
                    "num_records": stats.get("numRecords"),
                }
            elif kind == "remove":
                if active.pop(body["path"], None) is not None:
                    n_removed += 1
            elif kind in ("commitInfo", "txn", "cdc", "domainMetadata"):
                continue  # forward-compat: recognized-and-ignored
            elif kind == "checkpointMetadata":
                raise NotImplementedError(
                    "delta: parquet checkpoints not implemented"
                )
            # unknown keys: ignored (protocol forward-compat rule)
    return {
        "version": len(commits) - 1,
        "protocol": protocol,
        "schema_cols": schema_cols,
        "partition_cols": partition_cols,
        "active_files": active,
        "n_removed": n_removed,
        "total_bytes": sum(f["size"] for f in active.values()),
        "total_rows": sum(
            f["num_records"] or 0 for f in active.values()
        ),
    }


def replay_delta_checkpoint(
    checkpoint: bytes, version: int, commits: "list[tuple[int, str]]"
) -> dict:
    """Cold-start the snapshot from a parquet CHECKPOINT (the real
    Delta read path — `_last_checkpoint` points here so a reader
    never replays the whole JSON history), then fold the JSON
    commits after it. The checkpoint is a parquet file with one
    action per row (struct columns add/remove/metaData/protocol);
    it is read by the zero-dep nested-column reader — closing the
    boundary `replay_delta_log` declares for checkpoints.

    Subset: add.path/size/stats, remove.path, protocol.min*Version,
    metaData.schemaString (partitionColumns is a LIST — repeated
    columns stay an honest reader boundary, so partition columns
    resolve only from post-checkpoint metaData actions)."""
    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )

    add_path = read_parquet_column_full(checkpoint, "add.path")
    add_size = read_parquet_column_full(checkpoint, "add.size")
    add_stats = read_parquet_column_full(checkpoint, "add.stats")
    rem_path = read_parquet_column_full(checkpoint, "remove.path")
    proto_r = read_parquet_column_full(
        checkpoint, "protocol.minReaderVersion"
    )
    proto_w = read_parquet_column_full(
        checkpoint, "protocol.minWriterVersion"
    )
    meta_schema = read_parquet_column_full(
        checkpoint, "metaData.schemaString"
    )

    active: "dict[str, dict]" = {}
    protocol = None
    schema_cols: "list[str]" = []
    for i in range(len(add_path)):
        filled = [
            add_path[i] is not None,
            rem_path[i] is not None,
            proto_r[i] is not None,
            meta_schema[i] is not None,
        ]
        if sum(filled) != 1:
            raise ValueError(
                f"delta: checkpoint row {i} must hold exactly one action"
            )
        if add_path[i] is not None:
            stats = {}
            if add_stats[i]:
                try:
                    stats = json.loads(add_stats[i].decode("utf-8"))
                except json.JSONDecodeError as exc:
                    raise ValueError(f"delta: bad checkpoint stats: {exc}")
            active[add_path[i].decode("utf-8")] = {
                "size": add_size[i] or 0,
                "num_records": stats.get("numRecords"),
            }
        elif proto_r[i] is not None:
            protocol = (proto_r[i], proto_w[i])
        elif meta_schema[i] is not None:
            try:
                schema = json.loads(meta_schema[i].decode("utf-8"))
            except json.JSONDecodeError as exc:
                raise ValueError(f"delta: bad checkpoint schema: {exc}")
            schema_cols = [f["name"] for f in schema.get("fields", [])]
        # remove rows in a checkpoint are expired tombstones: ignored

    commits = sorted(commits)
    if [v for v, _ in commits] != list(
        range(version + 1, version + 1 + len(commits))
    ):
        raise ValueError(
            "delta: post-checkpoint commits not contiguous from "
            f"version {version + 1}"
        )
    partition_cols: "list[str]" = []
    n_removed = 0
    for v, content in commits:
        for line in content.splitlines():
            if not line.strip():
                continue
            try:
                action = json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(f"delta: malformed action in {v}: {exc}")
            (kind, body), = action.items()
            if kind == "protocol":
                protocol = (
                    body.get("minReaderVersion"),
                    body.get("minWriterVersion"),
                )
            elif kind == "metaData":
                schema = json.loads(body["schemaString"])
                schema_cols = [f["name"] for f in schema.get("fields", [])]
                partition_cols = body.get("partitionColumns", [])
            elif kind == "add":
                stats = json.loads(body["stats"]) if body.get("stats") else {}
                active[body["path"]] = {
                    "size": body.get("size", 0),
                    "num_records": stats.get("numRecords"),
                }
            elif kind == "remove":
                if active.pop(body["path"], None) is not None:
                    n_removed += 1
    return {
        "version": version + len(commits),
        "protocol": protocol,
        "schema_cols": schema_cols,
        "partition_cols": partition_cols,
        "active_files": active,
        "n_removed": n_removed,
        "total_bytes": sum(f["size"] for f in active.values()),
        "total_rows": sum(
            f["num_records"] or 0 for f in active.values()
        ),
    }


def delta_checkpoint_stats(docs):
    """Per doc: a REAL parquet checkpoint (pyarrow struct columns,
    one action per row: protocol + metaData + 4+id%4 adds) at
    version 2, then two JSON commits (an add + a remove, then an
    add) folded on top — the cold-start path every production Delta
    reader takes. The census is a pure function of the formulas."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("version", T.LongType()),
            T.StructField("n_active", T.LongType()),
            T.StructField("n_removed", T.LongType()),
            T.StructField("total_bytes", T.LongType()),
            T.StructField("total_rows", T.LongType()),
            T.StructField("proto_reader", T.LongType()),
        ]
    )

    def op(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        add_t = pa.struct(
            [("path", pa.string()), ("size", pa.int64()),
             ("stats", pa.string())]
        )
        rem_t = pa.struct([("path", pa.string())])
        meta_t = pa.struct([("schemaString", pa.string())])
        proto_t = pa.struct(
            [("minReaderVersion", pa.int64()),
             ("minWriterVersion", pa.int64())]
        )

        out: dict[str, list] = {f.name: [] for f in schema_t.fields}
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                k = 4 + did % 4
                rows_add = [None, None] + [
                    {
                        "path": f"part-{i:03d}.parquet",
                        "size": 1000 * (i + 1) + did % 7,
                        "stats": json.dumps(
                            {"numRecords": 50 + (did + i) % 9}
                        ),
                    }
                    for i in range(k)
                ]
                rows_rem = [None] * (k + 2)
                rows_meta = [None, {
                    "schemaString": json.dumps({
                        "type": "struct",
                        "fields": [{"name": "pk"}, {"name": "val"}],
                    })
                }] + [None] * k
                rows_proto = [
                    {"minReaderVersion": 1, "minWriterVersion": 2}
                ] + [None] * (k + 1)
                t = pa.table({
                    "add": pa.array(rows_add, add_t),
                    "remove": pa.array(rows_rem, rem_t),
                    "metaData": pa.array(rows_meta, meta_t),
                    "protocol": pa.array(rows_proto, proto_t),
                })
                buf = io.BytesIO()
                pq.write_table(t, buf)
                commits = [
                    (3, json.dumps({"add": {
                        "path": "part-new3.parquet", "size": 5000,
                        "stats": json.dumps({"numRecords": 70}),
                    }}) + "\n" + json.dumps({"remove": {
                        "path": "part-001.parquet"}})),
                    (4, json.dumps({"add": {
                        "path": "part-new4.parquet", "size": 7000,
                        "stats": json.dumps({"numRecords": 90}),
                    }})),
                ]
                res = replay_delta_checkpoint(buf.getvalue(), 2, commits)
                assert res["schema_cols"] == ["pk", "val"]
                out["doc_id"].append(did)
                out["version"].append(res["version"])
                out["n_active"].append(len(res["active_files"]))
                out["n_removed"].append(res["n_removed"])
                out["total_bytes"].append(res["total_bytes"])
                out["total_rows"].append(res["total_rows"])
                out["proto_reader"].append(res["protocol"][0])
        yield _pd.DataFrame(out)

    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return docs.select("doc_id").repartition(par).mapInPandas(op, schema_t)


def delta_log_stats(docs):
    """Per doc: a synthetic 2-commit Delta log — commit 0 writes
    protocol + metaData + (2 + id%4) files of formula sizes/rows;
    commit 1 removes every 3rd file and adds one compaction file
    holding the removed rows — replayed to the snapshot."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("snapshot_version", T.LongType()),
            T.StructField("n_active", T.LongType()),
            T.StructField("n_removed", T.LongType()),
            T.StructField("total_rows", T.LongType()),
            T.StructField("total_bytes", T.LongType()),
            T.StructField("n_schema_cols", T.LongType()),
        ]
    )

    def op(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        out: dict[str, list] = {f.name: [] for f in schema_t.fields}
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                k = 2 + did % 4
                schema_str = json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": n, "type": "long", "nullable": True,
                             "metadata": {}}
                            for n in ("id", "payload", "ts")
                        ],
                    }
                )
                c0_lines = [
                    json.dumps({"protocol": {"minReaderVersion": 1,
                                             "minWriterVersion": 2}}),
                    json.dumps({"metaData": {
                        "id": f"tbl-{did}",
                        "schemaString": schema_str,
                        "partitionColumns": ["ts"],
                        "format": {"provider": "parquet"},
                    }}),
                ]
                rows = [100 + 7 * (did + i) % 50 for i in range(k)]
                sizes = [1000 + 13 * (did + i) % 500 for i in range(k)]
                for i in range(k):
                    c0_lines.append(json.dumps({"add": {
                        "path": f"part-{i:05d}.parquet",
                        "size": sizes[i],
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": rows[i]}),
                    }}))
                removed = [i for i in range(k) if i % 3 == 0]
                compact_rows = sum(rows[i] for i in removed)
                c1_lines = [
                    json.dumps({"commitInfo": {"operation": "OPTIMIZE"}})
                ]
                for i in removed:
                    c1_lines.append(json.dumps({"remove": {
                        "path": f"part-{i:05d}.parquet",
                        "deletionTimestamp": 1,
                        "dataChange": False,
                    }}))
                c1_lines.append(json.dumps({"add": {
                    "path": "compact-00000.parquet",
                    "size": 4096,
                    "dataChange": False,
                    "stats": json.dumps({"numRecords": compact_rows}),
                }}))
                state = replay_delta_log(
                    [(0, "\n".join(c0_lines)), (1, "\n".join(c1_lines))]
                )
                assert state["protocol"] == (1, 2)
                assert state["partition_cols"] == ["ts"]
                out["doc_id"].append(did)
                out["snapshot_version"].append(state["version"])
                out["n_active"].append(len(state["active_files"]))
                out["n_removed"].append(state["n_removed"])
                out["total_rows"].append(state["total_rows"])
                out["total_bytes"].append(state["total_bytes"])
                out["n_schema_cols"].append(len(state["schema_cols"]))
        yield _pd.DataFrame(out)

    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        docs.select("doc_id").repartition(par).mapInPandas(op, schema_t)
    )


def _register() -> None:
    from dynamodb_to_datalake_project_spark.catalog import query
    from dynamodb_to_datalake_project_spark.lake import load_table

    @query(
        "delta_checkpoint_replay",
        oracle="""
        WITH d AS (
          SELECT doc_id, 4 + doc_id % 4 AS k, doc_id % 7 AS m
          FROM documents
        ), a AS (
          SELECT doc_id, k, m,
                 (SELECT SUM(1000 * (i + 1) + m)
                  FROM unnest(range(0, k)) u(i)) AS cp_bytes,
                 (SELECT SUM(50 + (doc_id + i) % 9)
                  FROM unnest(range(0, k)) u(i)) AS cp_rows
          FROM d
        )
        SELECT doc_id,
               CAST(4 AS BIGINT) AS version,
               CAST(k + 1 AS BIGINT) AS n_active,
               CAST(1 AS BIGINT) AS n_removed,
               CAST(cp_bytes - (2000 + m) + 12000 AS BIGINT)
                 AS total_bytes,
               CAST(cp_rows - (50 + (doc_id + 1) % 9) + 160 AS BIGINT)
                 AS total_rows,
               CAST(1 AS BIGINT) AS proto_reader
        FROM a
        """,
    )
    def q_delta_checkpoint_replay(spark, sf_dir):
        """Delta cold start from a REAL parquet checkpoint: struct
        columns add/remove/metaData/protocol read by the zero-dep
        nested-column reader (definition levels at depth, dotted
        paths), then JSON commits folded on top — the read path
        `_last_checkpoint` mandates. Oracle replays the arithmetic;
        the exactly-one-action-per-row rule rejects malformed rows."""
        docs = load_table(spark, sf_dir, "documents")
        return delta_checkpoint_stats(docs)

    @query(
        "delta_log_replay",
        oracle="""
        WITH t AS (
          SELECT doc_id, 2 + doc_id % 4 AS k FROM documents
        ), f AS (
          SELECT doc_id, k, u.i,
                 100 + 7 * (doc_id + u.i) % 50 AS rows_,
                 1000 + 13 * (doc_id + u.i) % 500 AS size_,
                 CASE WHEN u.i % 3 = 0 THEN 1 ELSE 0 END AS removed
          FROM t, LATERAL (SELECT unnest(range(0, k)) AS i) u
        )
        SELECT doc_id,
               CAST(1 AS BIGINT) AS snapshot_version,
               CAST(COUNT(*) FILTER (removed = 0) + 1 AS BIGINT)
                 AS n_active,
               CAST(COUNT(*) FILTER (removed = 1) AS BIGINT) AS n_removed,
               CAST(SUM(rows_) AS BIGINT) AS total_rows,
               CAST(SUM(CASE WHEN removed = 0 THEN size_ ELSE 0 END)
                    + 4096 AS BIGINT) AS total_bytes,
               CAST(3 AS BIGINT) AS n_schema_cols
        FROM f GROUP BY doc_id
        """,
    )
    def q_delta_log_replay(spark, sf_dir):
        """Delta log replay over synthetic 2-commit tables: commit 0
        adds 2-5 formula files, commit 1 OPTIMIZEs every 3rd away into
        a compaction file — the snapshot fold (last action per path,
        stats-JSON row counts, protocol/schema capture) must land the
        exact censuses the oracle computes from the same formulas.
        total_rows is conserved across the rewrite by construction —
        the invariant a real OPTIMIZE audit checks."""
        docs = load_table(spark, sf_dir, "documents")
        return delta_log_stats(docs)


_register()
