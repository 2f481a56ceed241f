"""Deterministic execution-shape probe for catalog queries: runs each
named query once in this session and reports, from the Spark UI REST
API, the number of jobs/stages it launched and the total shuffle
read/write and input bytes. These counts are invariant under CPU steal
and host noise, so they are the primary A/B evidence channel on noisy
hosts (wall-clock best-of-N is the secondary).

Usage: python tools/job_probe.py <query> [query ...] [--sf SF_DIR] [--detail]
Prints one JSON line per query:
  {"query": ..., "jobs": N, "stages": N, "shuffle_write": B,
   "shuffle_read": B, "input_bytes": B, "sec": wall}
With --detail, additionally prints one line per job (description, task
count, per-job shuffle/input bytes) so a protocol-heavy query's job
budget can be attributed to its phases.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    detail = "--detail" in args
    if detail:
        args.remove("--detail")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args

    from dynamodb_to_datalake_project_spark import catalog, get_spark

    catalog.load_all()
    spark = get_spark("job-probe")
    spark.range(1).count()  # warm the session
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("job_probe needs the Spark UI (spark.ui.enabled)")
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        before_jobs = {j["jobId"] for j in _api(base, "/jobs")}
        before_stages = {s["stageId"] for s in _api(base, "/stages")}
        t0 = time.time()
        n = catalog.QUERIES[name](spark, sf_dir).count()
        sec = time.time() - t0
        jobs = [j for j in _api(base, "/jobs") if j["jobId"] not in before_jobs]
        stages = [
            s
            for s in _api(base, "/stages")
            if s["stageId"] not in before_stages
        ]
        rec = {
            "query": name,
            "rows": n,
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
            "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
            "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
            "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
            "sec": round(sec, 3),
        }
        print(json.dumps(rec), flush=True)
        if detail:
            by_stage = {s["stageId"]: s for s in stages}
            for j in sorted(jobs, key=lambda j: j["jobId"]):
                js = [
                    by_stage[sid]
                    for sid in j.get("stageIds", [])
                    if sid in by_stage
                ]
                print(
                    json.dumps(
                        {
                            "job": j["jobId"],
                            "desc": (j.get("description") or j.get("name", ""))[
                                :120
                            ],
                            "tasks": sum(
                                s.get("numCompleteTasks", 0) for s in js
                            ),
                            "shuffle_write": sum(
                                s.get("shuffleWriteBytes", 0) for s in js
                            ),
                            "input_bytes": sum(
                                s.get("inputBytes", 0) for s in js
                            ),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
