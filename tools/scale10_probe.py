"""Within-session x10 scale probe → SCALING.md appendix.

`scaling_probe.py` compares across the sf0.001/0.01/0.1 fixture
ladder; this tool pushes ONE more decade (an sf1-equivalent row count)
without writing any fixtures: the sf0.1 documents/embeddings tables
are unioned 10x with remapped ids, entirely in-plan. Because x1 and
x10 run back-to-back in the same session, the ratio is immune to the
host-level variance documented in SCALE.md — it is the reliable
measurement shape on this machine.

Only NON-PAIRING operators are probed (scan/agg/window/model-scoring
shapes): content duplicated by the union would degenerately explode
any pairwise dedup op, so those are excluded rather than reported
misleadingly. Ratio ≈ 10 means linear data cost; << 10 means the
fixed floor still dominates; >> 10 would flag super-linear behavior.
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
    from dynamodb_to_datalake_project_spark.llm.bpe import (
        SHIPPED_MERGES,
        bpe_encode_stats,
    )
    from dynamodb_to_datalake_project_spark.llm.lm import lm_score_docs
    from dynamodb_to_datalake_project_spark.llm.multimodal import (
        bmp_roundtrip_stats,
    )
    from dynamodb_to_datalake_project_spark.llm.text import add_text_stats
    from dynamodb_to_datalake_project_spark.sampling import epoch_shuffle

    spark = get_spark("scale10-probe")
    spark.range(1).count()

    docs1 = load_table(spark, SF_DIR, "documents")
    n1 = docs1.count()

    # x10 / x100: remap ids so they stay unique; content duplication is
    # fine for every probed (non-pairing) operator. The x100 frame is
    # built as 10 unions of the x10 frame so the plan stays shallow,
    # then localCheckpoint'ed so probes measure the OPERATOR, not the
    # repeated union fan-in.
    def times(base, k, off):
        out = base
        for i in range(1, k):
            out = out.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * off))
            )
        return out

    docs10 = times(docs1, 10, 10_000_000).localCheckpoint(eager=True)
    docs100 = times(docs10, 10, 1_000_000_000).localCheckpoint(eager=True)

    emb1 = load_table(spark, SF_DIR, "embeddings")
    emb10 = times(
        emb1.withColumnRenamed("vec_id", "doc_id"), 10, 10_000_000
    ).localCheckpoint(eager=True)
    emb100 = times(emb10, 10, 1_000_000_000).localCheckpoint(eager=True)
    embs = {
        "x1": emb1.withColumnRenamed("vec_id", "doc_id"),
        "x10": emb10,
        "x100": emb100,
    }

    from dynamodb_to_datalake_project_spark.llm.similarity import (
        as_double_vec,
        assign_centroids,
        pq_codebook,
        pq_encode,
    )

    codebook = pq_codebook(emb1, m=4, k=8)
    cents = emb1.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), as_double_vec("embedding").alias("cv")
    )

    probes = [
        ("text_stats (scan-speed projection)", lambda d: add_text_stats(d)),
        ("bpe_encode (literal-merge fold)", lambda d: bpe_encode_stats(d, SHIPPED_MERGES)),
        ("bmp_codec (Arrow mapInPandas)", lambda d: bmp_roundtrip_stats(d)),
        ("lm_perplexity (train+score)", lambda d: lm_score_docs(d)),
        (
            "epoch_shuffle (per-shard window)",
            lambda d: epoch_shuffle(d.select("doc_id"), "doc_id", "s", n_shards=64),
        ),
        (
            "doc_packing (shard-local running sum)",
            lambda d: _packing(d),
        ),
    ]

    # embedding-table probes (the ANN building blocks — all map-only)
    emb_probes = [
        (
            "pq_encode (literal codebook folds)",
            lambda e: pq_encode(codebook=codebook, embeddings=e, id_col="doc_id"),
        ),
        (
            "centroid_assign (broadcast argmin fold)",
            lambda e: assign_centroids(e, cents, id_col="doc_id"),
        ),
        (
            "int8_quantize (per-row scale + cast)",
            lambda e: e.select(
                "doc_id",
                F.transform(
                    as_double_vec("embedding"),
                    lambda x: F.round(
                        x
                        / F.array_max(
                            F.transform(as_double_vec("embedding"), F.abs)
                        )
                        * 127
                    ).cast("int"),
                ).alias("q"),
            ),
        ),
    ]

    def _packing(d):
        from pyspark.sql import Window

        from dynamodb_to_datalake_project_spark.llm.text import tokens

        t = d.select(
            "doc_id",
            (F.col("doc_id") % 16).cast("long").alias("shard"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        w = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return t.withColumn("run", F.sum("n_tokens").over(w))

    lines = [
        "",
        "## x10 / x100 within-session probe (no fixtures)",
        "",
        "Generated by `tools/scale10_probe.py`: sf0.1 documents unioned",
        "with remapped ids (x10 and x100 frames localCheckpoint'ed so",
        "the probe times the OPERATOR, not the union fan-in), all sizes",
        "timed BACK-TO-BACK in one session — immune to the host-level",
        f"variance documented in SCALE.md. Rows: {n1:,} -> {n1 * 10:,} ->",
        f"{n1 * 100:,}. Non-pairing operators only (content duplication",
        "would degenerately explode pairwise dedup). r10/r100 are the",
        "per-decade cost ratios; ~10 at the last decade = linear data",
        "cost has taken over from the fixed floor.",
        "",
        "| operator | x1 | x10 | x100 | r10 | r100 |",
        "|---|---|---|---|---|---|",
    ]
    frames = {"x1": docs1, "x10": docs10, "x100": docs100}
    all_probes = [(n, b, frames) for n, b in probes] + [
        (n, b, embs) for n, b in emb_probes
    ]
    for name, build, fr in all_probes:
        ts = {}
        for label, d in (("x1", fr["x1"]), ("x10", fr["x10"]), ("x100", fr["x100"])):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                build(d).count()
                best = min(best, time.time() - t0)
            ts[label] = best
        r10 = ts["x10"] / ts["x1"]
        r100 = ts["x100"] / ts["x10"]
        print(
            f"# {name}: {ts['x1']:.2f}s -> {ts['x10']:.2f}s -> {ts['x100']:.2f}s"
            f" (r10 {r10:.1f}, r100 {r100:.1f})",
            file=sys.stderr,
        )
        lines.append(
            f"| {name} | {ts['x1']:.2f}s | {ts['x10']:.2f}s | {ts['x100']:.2f}s"
            f" | {r10:.1f} | {r100:.1f} |"
        )

    replace_section(
        "SCALING.md", "## x10 / x100 within-session probe", lines
    )
    print("wrote x10 probe section to SCALING.md")


def replace_section(path: str, header: str, lines: "list[str]") -> None:
    """Rewrite the section starting at `header` (through the next
    `## `-level header or EOF) in place, so repeated probe runs
    REPLACE their table instead of accumulating stale duplicates
    (ADVICE r4). Appends the section if the header is absent."""
    try:
        with open(path) as f:
            text = f.read()
    except FileNotFoundError:
        text = ""
    start = text.find(header)
    block = "\n".join(lines) + "\n"
    if start < 0:
        out = text + block
    else:
        # back up over ONE preceding newline (our block carries its own
        # leading blank line), keep the section separator intact
        if start > 0 and text[start - 1] == "\n":
            start -= 1
        nxt = text.find("\n## ", start + len(header))
        tail = "" if nxt < 0 else text[nxt:]
        out = text[:start] + block + tail
    with open(path, "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
