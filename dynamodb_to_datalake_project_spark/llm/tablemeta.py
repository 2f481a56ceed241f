"""Hudi timeline + Iceberg metadata audits — the remaining two of the
three open table formats (Delta's log replay lives in
`llm.deltalog`). The reference pipeline writes an Apache Hudi
COPY_ON_WRITE table (`glue_jobs/initial_load.py:163-186`, SURVEY §2
S7/S8), so auditing a Hudi timeline is reference-adjacent: it answers
"what did each commit write, and which file slice is current?"
without Hudi, Spark-SQL extensions, or Hive — just the public
`.hoodie/` commit JSON.

Both parsers follow the module-family contract: JSON actions only
(Hudi's avro-serialized compaction plans and Iceberg's avro manifest
files raise NotImplementedError — `llm.avrofile` is the stepping
stone there), malformed content raises ValueError, unknown fields are
ignored per both formats' forward-compat behavior.
"""

from __future__ import annotations

import json


def replay_hudi_timeline(commits: "list[tuple[str, str]]") -> dict:
    """Fold Hudi commit metadata files (instant_time, content) into
    the COW table state. Each commit's `partitionToWriteStats` maps
    partition → write-stat list ({fileId, path, numWrites, numDeletes,
    numInserts, numUpdateWrites, totalWriteBytes}); in COPY_ON_WRITE
    the LATEST file slice per fileId wins. Returns per-table censuses
    + the live file set. Instants must be strictly increasing."""
    ordered = sorted(commits)
    if [t for t, _ in ordered] != [t for t, _ in commits] or len(
        {t for t, _ in commits}
    ) != len(commits):
        raise ValueError(
            "hudi: commit instants must be unique and in order"
        )
    live: "dict[str, dict]" = {}  # fileId -> latest slice
    n_commits = 0
    total_inserts = total_updates = total_deletes = 0
    partitions: "set[str]" = set()
    for instant, content in ordered:
        try:
            body = json.loads(content)
        except json.JSONDecodeError as exc:
            raise ValueError(f"hudi: malformed commit {instant}: {exc}")
        if body.get("operationType") == "compact":
            raise NotImplementedError(
                "hudi: MOR compaction timelines not implemented (COW only)"
            )
        stats = body.get("partitionToWriteStats")
        if not isinstance(stats, dict):
            raise ValueError(f"hudi: commit {instant} missing write stats")
        n_commits += 1
        for partition, entries in stats.items():
            partitions.add(partition)
            for st in entries:
                fid = st["fileId"]
                live[fid] = {
                    "partition": partition,
                    "path": st.get("path"),
                    "instant": instant,
                    "num_writes": st.get("numWrites", 0),
                    "bytes": st.get("totalWriteBytes", 0),
                }
                total_inserts += st.get("numInserts", 0)
                total_updates += st.get("numUpdateWrites", 0)
                total_deletes += st.get("numDeletes", 0)
    return {
        "n_commits": n_commits,
        "latest_instant": ordered[-1][0] if ordered else None,
        "n_file_groups": len(live),
        "n_partitions": len(partitions),
        "live_files": live,
        "total_inserts": total_inserts,
        "total_updates": total_updates,
        "total_deletes": total_deletes,
        "live_records": sum(f["num_writes"] for f in live.values()),
        "live_bytes": sum(f["bytes"] for f in live.values()),
    }


def parse_iceberg_metadata(content: str) -> dict:
    """Audit an Iceberg `vN.metadata.json`: format version, current
    schema column names, partition spec fields, snapshot census with
    the current snapshot resolved, and the current snapshot's summary
    counters (total-records / total-data-files — the audit numbers).
    Manifest lists are Avro and not chased here (honest boundary)."""
    try:
        m = json.loads(content)
    except json.JSONDecodeError as exc:
        raise ValueError(f"iceberg: malformed metadata JSON: {exc}")
    if m.get("format-version") not in (1, 2):
        raise NotImplementedError(
            f"iceberg: format-version {m.get('format-version')!r}"
        )
    schemas = {s.get("schema-id"): s for s in m.get("schemas", [])}
    cur_schema = schemas.get(m.get("current-schema-id"))
    if cur_schema is None:
        if "schema" in m:  # v1 inline schema
            cur_schema = m["schema"]
        else:
            raise ValueError("iceberg: current schema not found")
    snapshots = m.get("snapshots", [])
    cur_id = m.get("current-snapshot-id")
    cur = next(
        (s for s in snapshots if s.get("snapshot-id") == cur_id), None
    )
    if snapshots and cur is None:
        raise ValueError("iceberg: current-snapshot-id not in snapshots")
    summary = (cur or {}).get("summary", {})
    return {
        "format_version": m["format-version"],
        "table_uuid": m.get("table-uuid"),
        "schema_cols": [
            f["name"] for f in cur_schema.get("fields", [])
        ],
        "partition_fields": [
            f["name"]
            for spec in m.get("partition-specs", [])
            if spec.get("spec-id") == m.get("default-spec-id")
            for f in spec.get("fields", [])
        ],
        "n_snapshots": len(snapshots),
        "current_snapshot_id": cur_id,
        "total_records": int(summary.get("total-records", 0)),
        "total_data_files": int(summary.get("total-data-files", 0)),
        "operation": summary.get("operation"),
    }


def table_format_stats(docs):
    """Per doc: a 2-commit Hudi COW timeline (insert commit then an
    upsert rewriting every 2nd file group) AND an Iceberg metadata
    file with (2 + id%3) snapshots — both replayed/parsed and their
    censuses emitted side by side."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("hudi_file_groups", T.LongType()),
            T.StructField("hudi_live_records", T.LongType()),
            T.StructField("hudi_inserts", T.LongType()),
            T.StructField("hudi_updates", T.LongType()),
            T.StructField("ice_snapshots", T.LongType()),
            T.StructField("ice_total_records", T.LongType()),
            T.StructField("ice_cols", T.LongType()),
        ]
    )

    def op(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        out: dict[str, list] = {f.name: [] for f in schema_t.fields}
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                k = 2 + did % 4  # file groups
                rows = [50 + (did + i) % 20 for i in range(k)]
                def pstats(indices, slice_no):
                    by_part: "dict[str, list]" = {}
                    for i in indices:
                        part = f"dt=2024-01-{1 + i % 2:02d}"
                        by_part.setdefault(part, []).append({
                            "fileId": f"fg-{i}",
                            "path": f"{part}/fg-{i}_{slice_no}.parquet",
                            "numWrites": rows[i] + 5 * slice_no,
                            "numInserts": rows[i] if slice_no == 0 else 5,
                            "numDeletes": 0,
                            "numUpdateWrites": rows[i] if slice_no else 0,
                            "totalWriteBytes": (1000 + 100 * slice_no)
                            * (i + 1),
                        })
                    return by_part

                c0 = json.dumps({
                    "operationType": "insert",
                    "partitionToWriteStats": pstats(range(k), 0),
                })
                upd = [i for i in range(k) if i % 2 == 0]
                c1 = json.dumps({
                    "operationType": "upsert",
                    "partitionToWriteStats": pstats(upd, 1),
                })
                hudi = replay_hudi_timeline(
                    [("20240101000000", c0), ("20240102000000", c1)]
                )
                n_snap = 2 + did % 3
                total_recs = sum(rows) + 5 * len(upd)
                ice = parse_iceberg_metadata(json.dumps({
                    "format-version": 2,
                    "table-uuid": f"uuid-{did}",
                    "current-schema-id": 0,
                    "schemas": [{
                        "schema-id": 0,
                        "fields": [
                            {"id": j + 1, "name": nm, "type": "long"}
                            for j, nm in enumerate(("id", "payload", "ts"))
                        ],
                    }],
                    "default-spec-id": 0,
                    "partition-specs": [{
                        "spec-id": 0,
                        "fields": [{"name": "dt", "source-id": 3,
                                    "transform": "day"}],
                    }],
                    "current-snapshot-id": n_snap - 1,
                    "snapshots": [
                        {
                            "snapshot-id": s,
                            "summary": {
                                "operation": "append",
                                "total-records": str(
                                    total_recs if s == n_snap - 1 else s
                                ),
                                "total-data-files": str(k),
                            },
                        }
                        for s in range(n_snap)
                    ],
                }))
                out["doc_id"].append(did)
                out["hudi_file_groups"].append(hudi["n_file_groups"])
                out["hudi_live_records"].append(hudi["live_records"])
                out["hudi_inserts"].append(hudi["total_inserts"])
                out["hudi_updates"].append(hudi["total_updates"])
                out["ice_snapshots"].append(ice["n_snapshots"])
                out["ice_total_records"].append(ice["total_records"])
                out["ice_cols"].append(len(ice["schema_cols"]))
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
        "table_format_audit",
        oracle="""
        WITH t AS (
          SELECT doc_id, 2 + doc_id % 4 AS k FROM documents
        ), f AS (
          SELECT doc_id, k, u.i,
                 50 + (doc_id + u.i) % 20 AS rows_,
                 CASE WHEN u.i % 2 = 0 THEN 1 ELSE 0 END AS upd
          FROM t, LATERAL (SELECT unnest(range(0, k)) AS i) u
        )
        SELECT doc_id,
               CAST(k AS BIGINT) AS hudi_file_groups,
               CAST(SUM(rows_ + CASE WHEN upd = 1 THEN 5 ELSE 0 END)
                 AS BIGINT) AS hudi_live_records,
               CAST(SUM(rows_) + 5 * SUM(upd) AS BIGINT) AS hudi_inserts,
               CAST(SUM(CASE WHEN upd = 1 THEN rows_ ELSE 0 END)
                 AS BIGINT) AS hudi_updates,
               CAST(2 + doc_id % 3 AS BIGINT) AS ice_snapshots,
               CAST(SUM(rows_) + 5 * SUM(upd) AS BIGINT)
                 AS ice_total_records,
               CAST(3 AS BIGINT) AS ice_cols
        FROM f GROUP BY doc_id, k
        """,
    )
    def q_table_format_audit(spark, sf_dir):
        """Hudi + Iceberg audit over synthetic tables: a COW timeline
        (insert commit + an upsert rewriting every 2nd file group —
        the reference pipeline's own write pattern, SURVEY §2 S7/S8)
        folded to its live file slices, and an Iceberg v2 metadata
        file resolved to its current snapshot. Every census the oracle
        recomputes from the commit formulas; the Hudi fold's
        last-slice-wins semantics is exactly what COPY_ON_WRITE
        requires."""
        docs = load_table(spark, sf_dir, "documents")
        return table_format_stats(docs)


_register()
