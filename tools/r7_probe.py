"""Round-7 additions probe: x1/x10/x100 back-to-back for the new
operators (ts_gapfill, jpeg_exif, mp3 sideinfo/tags, flac_tags) —
same protocol as tools/scale10_probe.py (localCheckpoint'ed frames,
best-of-N, GC-settled), reported as a SCALING.md prose subsection.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from dynamodb_to_datalake_project_spark import get_spark
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.multimodal import (
        flac_tags_stats,
        gif_meta_stats,
        jpeg_exif_stats,
        mp3_sideinfo_stats,
        mp3_tags_stats,
        mp4_tags_stats,
        wav_tags_stats,
    )
    from dynamodb_to_datalake_project_spark.timeseries import gapfill_resample

    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3

    spark = get_spark("r7-probe")
    spark.range(1).count()

    docs1 = load_table(spark, SF_DIR, "documents")
    n1 = docs1.count()

    def times(base, k, off, col="doc_id"):
        out = base
        for i in range(1, k):
            out = out.unionByName(base.withColumn(col, F.col(col) + F.lit(i * off)))
        return out

    docs10 = times(docs1, 10, 10_000_000).localCheckpoint(eager=True)
    docs100 = times(docs10, 10, 1_000_000_000).localCheckpoint(eager=True)
    frames = {"x1": docs1, "x10": docs10, "x100": docs100}

    ev1 = load_table(spark, SF_DIR, "events")

    def times_ev(base, kk, off):
        out = base
        for i in range(1, kk):
            out = out.unionByName(
                base.withColumn("event_id", F.col("event_id") + F.lit(i * off))
                .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
            )
        return out

    ev10 = times_ev(ev1, 10, 10_000_000).localCheckpoint(eager=True)
    ev100 = times_ev(ev10, 10, 1_000_000_000).localCheckpoint(eager=True)
    evs = {"x1": ev1, "x10": ev10, "x100": ev100}

    def _gapfill(e):
        return gapfill_resample(e, "user_id", "ts", "value", 6 * 3600 * 1_000_000)

    probes = [
        ("ts_gapfill (bucket agg + spine fill)", _gapfill, evs),
        ("jpeg_exif (APP1 build + IFD walk)", jpeg_exif_stats, frames),
        ("mp3_sideinfo (bit pack/unpack)", mp3_sideinfo_stats, frames),
        ("mp3_tags (ID3v2 walk)", mp3_tags_stats, frames),
        ("flac_tags (chain splice + decode)", flac_tags_stats, frames),
        ("wav_tags (RIFF INFO walk)", wav_tags_stats, frames),
        ("mp4_tags (udta splice + re-demux)", mp4_tags_stats, frames),
        ("gif_meta (extension splice + decode)", gif_meta_stats, frames),
    ]

    for name, build, fr in probes:
        ts = {}
        for label in ("x1", "x10", "x100"):
            best = float("inf")
            for _ in range(reps):
                t0 = time.time()
                build(fr[label]).count()
                best = min(best, time.time() - t0)
            ts[label] = best
        r10 = ts["x10"] / ts["x1"]
        r100 = ts["x100"] / ts["x10"]
        print(
            f"| {name} | {ts['x1']:.2f}s | {ts['x10']:.2f}s | {ts['x100']:.2f}s"
            f" | {r10:.1f} | {r100:.1f} |"
        )
    print(f"# docs rows: {n1:,} -> {n1*10:,} -> {n1*100:,}", file=sys.stderr)


if __name__ == "__main__":
    main()
