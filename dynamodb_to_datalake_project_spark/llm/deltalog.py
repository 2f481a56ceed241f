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
