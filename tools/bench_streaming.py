"""Streaming throughput benchmark: rows/sec through the CDC pipeline
shapes, measured from Structured Streaming's own progress metrics.

Two paths, both fed by the built-in `rate` source (deterministic
generator, no disk bottleneck on the input side):

1. `transform`: rate → CDC-event synthesis (the same surrogate-key /
   partition-derivation expression shapes as `pipeline.hudify`) →
   1-minute windowed counts with watermark → memory sink. This is the
   T2/T3 hot path with zero lake I/O — pure engine throughput.
2. `merge`: rate → CDC-event synthesis → `cdc.make_merge_batch_fn`
   foreachBatch upsert into a real partitioned parquet table (the full
   T7 path including the atomic commit protocol and lake rewrite).

Reference anchor (BASELINE.md): the reference's observed end-to-end
scale is 58,318 rows in a ~5-minute cadence window ≈ 194 rows/s.

Usage: python tools/bench_streaming.py [seconds_per_path]
Prints ONE JSON line:
  {"metric": "streaming_rows_per_sec", "transform": N, "merge": M, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynamodb_to_datalake_project_spark import cdc, get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RATE = 500_000  # rows/sec offered load; the engine takes what it can


def _events(spark, rows_per_second: int):
    """CDC-shaped event stream off the rate source."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            (F.col("value") % 100_000).cast("string").alias("id"),
            F.col("timestamp").cast("string").alias("update_at"),
            F.sha2(F.col("value").cast("string"), 256).alias("note"),
            F.date_format("timestamp", "yyyy-MM-dd").alias("day"),
            F.when(F.col("value") % 20 == 0, "REMOVE")
            .otherwise("MODIFY")
            .alias("event_name"),
            F.col("timestamp").alias("ts"),
        )
    )


def _drain(q, seconds: float) -> tuple[float, int]:
    """Let the query run `seconds` of STEADY streaming, then return
    (rows_per_sec, rows) from its progress history (input rows /
    trigger wall time). Startup — Python-worker forks plus the first
    micro-batch's planning — is excluded by waiting (bounded) for the
    first completed non-empty trigger before the measured window
    starts: on a slow or stolen host that cold path alone can exceed
    a short window and the old fixed sleep then measured zero
    triggers (observed as a test failure on a host where cold
    `spark.range(1).count()` takes ~10 s). Same principle as
    bench.py's excluded `startup_sec`."""
    deadline = time.time() + 120.0
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.5)
    time.sleep(seconds)
    prog = list(q.recentProgress)
    q.stop()
    rows = sum(p["numInputRows"] for p in prog)
    ms = sum(
        p["durationMs"].get("triggerExecution", 0)
        for p in prog
        if p["numInputRows"] > 0
    )
    return (rows * 1000.0 / ms if ms else 0.0), rows


def bench_transform(spark, seconds: float, tmp: str) -> tuple[float, int]:
    ev = _events(spark, RATE)
    agg = (
        ev.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute"), "day", "event_name")
        .agg(F.count("*").alias("n"), F.sum(F.length("note")).alias("bytes"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("bench_transform_sink")
        .option("checkpointLocation", os.path.join(tmp, "ckpt_transform"))
        .start()
    )
    return _drain(q, seconds)


def bench_merge(spark, seconds: float, tmp: str) -> tuple[float, int]:
    table = os.path.join(tmp, "lake")
    ev = _events(spark, RATE).drop("ts")
    process = cdc.make_merge_batch_fn(
        table,
        keys=["id"],
        precombine=["update_at"],
        partition_cols=["day"],
        event_type_col="event_name",
    )
    q = (
        ev.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(tmp, "ckpt_merge"))
        .start()
    )
    return _drain(q, seconds)


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    seconds = float(argv[0]) if argv else 15.0
    spark = get_spark(
        "bench-streaming", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    tmp = tempfile.mkdtemp(prefix="bench_streaming_")
    try:
        t_rate, t_rows = bench_transform(spark, seconds, tmp)
        m_rate, m_rows = bench_merge(spark, seconds, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_rows_per_sec",
                "transform": round(t_rate),
                "transform_rows": t_rows,
                "merge": round(m_rate),
                "merge_rows": m_rows,
                "offered_rows_per_sec": RATE,
                "seconds_per_path": seconds,
                "reference_rows_per_sec": 194,
            }
        )
    )


if __name__ == "__main__":
    main()
