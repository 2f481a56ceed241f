"""Within-session x10/x100 scale probe for the PAIRING operators
(minhash-LSH, simhash, connected components) → SCALING.md section.

`scale10_probe.py` deliberately excludes these: naive content
duplication makes every copy of a document an exact dup of every other
copy, so cluster size grows with the scale factor and the pair stage
degenerates quadratically — the probe would measure the degenerate
input, not the engine. Here the scaled corpora keep the DUP STRUCTURE
CONSTANT while rows grow 10x per decade (the shape a real corpus has:
more data = more clusters, not bigger clusters):

  scale k spawns k variants of each base document; variant j belongs
  to family j//2, and every token is salted with the family id — so
  documents from different families share (almost) no shingles. Within
  a family, member j%2==1 perturbs ~1/40 of token positions
  (deterministic xxhash coin), leaving 3-gram-shingle Jaccard ≈ 0.85:
  each base doc contributes k/2 independent near-dup PAIRS. Cluster
  size stays 2 at every scale; pairs grow linearly with rows.

x1 = k=2, x10 = k=20, x100 = k=200 — all built in-plan from the sf0.1
documents table (no fixtures), localCheckpoint'ed so probes time the
OPERATOR, not the variant fan-out, and timed back-to-back in ONE
session (immune to the host-level variance documented in SCALE.md).
r10/r100 ≈ 10 means linear scaling of the candidate+verify pipeline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
MAX_TOKENS = 96  # uniform text-length cap at every scale


def build_corpus(docs, k: int):
    """k salted variants per base doc (see module docstring) — ONE
    plan via a broadcast range cross join (the earlier k-way union
    built a k-branch plan; at k=2000 that's a Catalyst planning
    problem, and a real corpus generator wouldn't shape it that way
    either). Variant j: every token salted with its family id j//2;
    odd members perturb ~1/40 of positions deterministically."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    toks = F.slice(
        F.filter(F.split("text", " "), lambda t: t != F.lit("")),
        1,
        MAX_TOKENS,
    )
    base = docs.select("doc_id", toks.alias("toks"))
    js = spark.range(k).select(F.col("id").alias("j"))
    fam = F.floor(F.col("j") / 2)
    member = F.pmod(F.col("j"), 2)
    salted = F.transform(
        "toks", lambda t: F.concat(t, F.lit("_f"), fam.cast("string"))
    )
    # perturb ~1/40 of positions, deterministically per
    # (doc, position, family) — no RNG, retry-stable
    perturbed = F.transform(
        salted,
        lambda t, p: F.when(
            (member == 1)
            & (F.pmod(F.xxhash64(F.col("doc_id"), p, fam), 40) == 0),
            F.concat(t, F.lit("x")),
        ).otherwise(t),
    )
    return base.crossJoin(F.broadcast(js)).select(
        (F.col("doc_id") * 10000 + F.col("j")).alias("doc_id"),
        F.concat_ws(" ", perturbed).alias("text"),
    )


def build_embedding_corpus(emb, k: int):
    """k variants per base embedding with CONSTANT near-dup structure
    (the embedding analogue of `build_corpus`): variant j belongs to
    family j//2 and is the base vector under that family's
    deterministic Rademacher sign pattern (xxhash(fam, pos) coin) —
    cross-family cosine ~ N(0, d^-1/2), i.e. far below threshold;
    member j%2==1 additionally scales ~1/100 of positions by 1.05, so
    each family is one planted near-dup pair (cosine ≈ 1). Cells stay
    meaningful, cluster size stays 2, pairs grow linearly with rows."""
    from pyspark.sql import functions as F

    spark = emb.sparkSession
    js = spark.range(k).select(F.col("id").alias("j"))
    fam = F.floor(F.col("j") / 2)
    member = F.pmod(F.col("j"), 2)
    v = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        * F.when(F.pmod(F.xxhash64(fam, i), 2) == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
        * F.when(
            (member == 1)
            & (F.pmod(F.xxhash64(F.col("vec_id"), i, fam), 100) == 0),
            F.lit(1.05),
        ).otherwise(F.lit(1.0)),
    )
    return emb.crossJoin(F.broadcast(js)).select(
        (F.col("vec_id") * 10000 + F.col("j")).alias("vec_id"), v.alias("v")
    )


def semantic_probe() -> None:
    """Scale probe for SemDeDup over TRAINED cells: cost model is
    O(train) + O(Σ|cell|²), so k (cell count) must grow WITH the
    corpus to keep cells bounded — k ∝ n holds |cell| ≈ 250 constant
    here, which is the configuration whose total cost is linear.
    Training at large k exercises the packed-broadcast assignment
    path (`cluster._assign_with_vec` beyond `_LITERAL_LIMIT`)."""
    from pyspark.sql import functions as F  # noqa: F401

    from dynamodb_to_datalake_project_spark import get_spark
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.cluster import (
        _assign_with_vec,
        kmeans_train,
    )
    from dynamodb_to_datalake_project_spark.llm.dedup import semantic_cell_dedup
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale10_probe import replace_section

    spark = get_spark("scale-semantic-probe")
    spark.range(1).count()
    emb = load_table(spark, SF_DIR, "embeddings")
    n1 = emb.count()

    # (label, variants/vec, cells, shuffle partitions, timed runs)
    scales = [
        ("x1", 2, 8, 32, 2),
        ("x10", 20, 80, 64, 2),
        ("x100", 200, 800, 256, 1),
    ]
    labels = [s[0] for s in scales]
    ts, dens = {}, {}
    for label, k, cells, parts, runs in scales:
        corpus = build_embedding_corpus(emb, k).localCheckpoint(eager=True)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        best, dropped = float("inf"), 0
        for _ in range(runs):
            t0 = time.time()
            cents, _ = kmeans_train(
                corpus, k=cells, n_iters=2, id_col="vec_id", vec_col="v"
            )
            assigned = _assign_with_vec(
                corpus.select("vec_id", "v"), cents
            ).select("vec_id", F.col("cid").alias("cell"))
            # threshold 0.8: planted family pairs sit at cosine ≈
            # 0.999; accidental 64-d crowding (random ±cos ~ N(0,
            # 1/8)) is 6.4σ away — at 0.4 the crowding term grows
            # with corpus density and masks the planted rate
            cell_rows = semantic_cell_dedup(
                corpus.select("vec_id", "v"), assigned, threshold=0.8
            ).collect()
            best = min(best, time.time() - t0)
            dropped = sum(r["n_dropped"] for r in cell_rows)
        ts[label] = best
        dens[label] = dropped / (n1 * k)
        print(
            f"# semantic_trained {label}: {best:.2f}s"
            f" (dropped/row {dens[label]:.3f})",
            file=sys.stderr,
        )
    lines = [
        "",
        "## Semantic-dedup (trained cells) scale probe",
        "",
        "Generated by `tools/scale_pairing_probe.py --semantic`: sf0.1",
        "embeddings expanded k={2,20,200} variants/vector with",
        "family-Rademacher sign patterns + 1/100 member perturbation",
        "(cross-family cosine ~ N(0, d^-1/2); one planted near-dup",
        "pair per family), timed back-to-back in one session. The",
        "SemDeDup cost model is O(train) + O(Σ|cell|²), so the cell",
        "count scales WITH the corpus (k = 8/80/800, |cell| ≈ 250",
        "constant) — the configuration whose total cost is linear, and",
        "the reason `kmeans_train` needed the Arrow/BLAS assignment",
        "path (k·d ≥ ~5k: literal-plan codegen JITs poorly and the",
        "HOF fold is ~100x slower than a batch matmul — the first run",
        "of this probe timed out in the fold form). Threshold 0.8:",
        "planted pairs sit at cosine ≈ 0.999, accidental 64-d",
        "crowding 6.4σ below. Timed per decade: full train (2 Lloyd",
        "iterations) + routing + within-cell cosine dedup.",
        "dropped/row ≈ 0.5 flat = planted structure held (one drop",
        "per 2-member family).",
        "",
        "| stage | " + " | ".join(labels)
        + " | r10 | r100 | dropped/row x1 -> x100 |",
        "|---" * (len(labels) + 4) + "|",
        (
            "| train+route+dedup | "
            + " | ".join(f"{ts[lb]:.2f}s" for lb in labels)
            + f" | {ts['x10'] / ts['x1']:.1f} | {ts['x100'] / ts['x10']:.1f}"
            + f" | {dens['x1']:.3f} -> {dens['x100']:.3f} |"
        ),
    ]
    replace_section(
        "SCALING.md", "## Semantic-dedup (trained cells) scale probe", lines
    )
    print("wrote semantic-dedup probe section to SCALING.md")


def main(argv: "list[str] | None" = None) -> None:
    from pyspark.sql import functions as F

    from dynamodb_to_datalake_project_spark import get_spark
    from dynamodb_to_datalake_project_spark.graph import connected_components
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.dedup import (
        _shingle_sets,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale10_probe import replace_section
    from scaling_probe import parse_flags

    argv = sys.argv[1:] if argv is None else argv
    flags = parse_flags(argv)
    sf_dir = flags.get("sf", [SF_DIR])[-1]
    out_path = flags.get("out", ["SCALING.md"])[-1]
    probe_filter = flags.get("probe", [])  # substring match, empty = all
    max_scale = flags.get("max-scale", [None])[-1]

    spark = get_spark("scale-pairing-probe")
    spark.range(1).count()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n1 = docs.count()

    # (label, variants/doc, shuffle partitions sized to the data,
    # timed runs — x1000 is best-of-1: ~10M docs, the second run would
    # only re-measure what one run already shows)
    scales = [
        ("x1", 2, 32, 2),
        ("x10", 20, 64, 2),
        ("x100", 200, 256, 2),
        ("x1000", 2000, 512, 1),
    ]
    if "--no-x1000" in argv:
        scales = scales[:3]
    if max_scale is not None:
        scales = scales[: [s[0] for s in scales].index(max_scale) + 1]
    labels = [s[0] for s in scales]
    kmap = {s[0]: s[1] for s in scales}
    partitions = {s[0]: s[2] for s in scales}
    runs = {s[0]: s[3] for s in scales}

    corpora = {}
    for label in labels:
        corpora[label] = build_corpus(docs, kmap[label]).localCheckpoint(
            eager=True
        )

    probes = [
        (
            "minhash_lsh (sig+band+verify)",
            lambda d: minhash_lsh_pairs(
                _shingle_sets(d), num_hashes=64, bands=4, threshold=0.8
            ),
        ),
        (
            # 16-bit bands (round-5 finding): 8-bit bands give only 256
            # buckets/band, so at 1M docs EVERY bucket overflows the
            # 1000-doc cap and the operator silently finds nothing.
            # bits=64/band_bits=16 keeps the ham<=3 pigeonhole AND a
            # 65k-bucket space that scales.
            "simhash (64-bit, 16-bit bands)",
            lambda d: simhash_pairs(
                _shingle_sets(d), bits=64, max_hamming=3, band_bits=16
            ),
        ),
        (
            # the 10M+-doc scale config (second round-5 finding): 65k
            # buckets saturate at ~150 docs/bucket by 10M rows and
            # in-bucket pair expansion goes quadratic (measured
            # r1000 = 24). Wide signatures (array<bigint>) with 32-bit
            # bands keep the ham<=3 pigeonhole (4 bands) and a 2^32
            # bucket space — occupancy ~1 through 10^9 docs.
            "simhash (128-bit, 32-bit bands)",
            lambda d: simhash_pairs(
                _shingle_sets(d), bits=128, max_hamming=3, band_bits=32
            ),
        ),
    ]
    kdesc = ",".join(str(kmap[lb]) for lb in labels)
    pdesc = "/".join(str(partitions[lb]) for lb in labels)
    rowdesc = " -> ".join(f"{n1 * kmap[lb]:,}" for lb in labels)
    lines = [
        "",
        "## x10 / x100 pairing-operator probe (perturbed near-dups)",
        "",
        "Generated by `tools/scale_pairing_probe.py`: sf0.1 documents",
        f"expanded k={{{kdesc}}} variants/doc with family-salted tokens +",
        "1/40 deterministic perturbation, so rows grow 10x/decade while",
        "cluster size stays 2 (near-dup RATE constant — the shape a",
        "real corpus has). All sizes timed back-to-back in one session,",
        f"with shuffle partitions sized to the data ({pdesc}) as a",
        "real cluster would be. simhash runs twice: bits=64/16-bit",
        "bands (the 1M-doc config) and bits=128/32-bit bands (the",
        "10M+ scale config — see finding 3 and 4). pair edges for",
        "the CC row are the minhash output.",
        f"Rows: {rowdesc}. pairs/row is",
        "the found-duplicate density (flat = structure held). Per-decade",
        "cost ratios ~10 = linear candidate+verify cost (x1000, when",
        "present, is best-of-1; smaller sizes best-of-2).",
        "",
        "Three findings from the first (fixed-config) run of this",
        "probe, all three now designed around — measured x100 minhash",
        "A/B, same data, consecutive sessions: 548s (32 partitions,",
        "string-shingle verify) -> 304s (256 partitions, strings) ->",
        "**40s** (256 partitions, hashed verify):",
        "",
        "1. **String shingle arrays were the dominant shuffle**: the",
        "   exact-Jaccard verify shuffled every candidate doc's shingle",
        "   set as strings (~40-60 B/shingle). `minhash_lsh_pairs` and",
        "   `blocked_jaccard_pairs` now hash shingles to 64-bit longs",
        "   BEFORE the verify shuffle (~6x fewer bytes; Jaccard on",
        "   injectively-hashed sets is numerically identical, so the",
        "   md5-twin oracle still matches — re-verified). This took",
        "   minhash x100 from super-linear (r100 = 36) to linear.",
        "2. **Fixed 32 shuffle partitions spill at 1M docs** — but only",
        "   in the string-verify regime: 548s -> 304s from partitions",
        "   alone pre-fix, while AFTER the hashed verify par=32 and",
        "   par=256 are within noise (39-46s), and AQE",
        "   initialPartitionNum=256 adds nothing (37-40s, measured) —",
        "   the byte reduction removed the spill regime entirely, so no",
        "   engine config change is warranted. Partition count remains",
        "   the standard cluster-sizing knob at real scale.",
        "3. **8-bit simhash bands stop scaling at ~100k docs**: byte",
        "   bands give only 256 buckets/band, so at 1M docs every",
        "   bucket exceeds the 1000-doc cap and is dropped — the",
        "   operator silently found ZERO pairs (pairs/row 0.234 at",
        "   x10 -> 0.000 at x100). `simhash_pairs` now takes",
        "   `band_bits`; bits=64/band_bits=16 keeps the ham<=3",
        "   pigeonhole guarantee with a 65k-bucket space per band",
        "   (measured x100: 20.5s, 197k pairs found vs 0 before).",
        "4. **...and 16-bit bands saturate at ~10M docs** (the x1000",
        "   decade, first measured r1000 = 24): 10M docs / 65k buckets",
        "   = ~150 docs/bucket, so in-bucket pair expansion grows",
        "   quadratically in corpus size. The scale config is a WIDE",
        "   signature — bits=128 as array<bigint> words (independent",
        "   per-word token hashes) with band_bits=32: still 4 bands",
        "   (ham<=3 pigeonhole intact, brute-force-equality-tested),",
        "   but 2^32 buckets/band keeps occupancy ~1 through 10^9",
        "   docs. Measured: the quadratic in-bucket term vanishes and",
        "   the wide config's r1000 drops into the same spill-bound",
        "   band as minhash (see 5) despite paying 2x signature",
        "   compute. Trade-off: ham<=3 over 128 bits is a ~2x stricter",
        "   per-bit error threshold than over 64, so the weakest",
        "   near-dups drop out (pairs/row 0.197 -> 0.165; the planted",
        "   strong dups all survive).",
        "5. **the last decade is single-disk spill, not algorithm**:",
        "   for minhash AND wide simhash, pairs/row is flat and the",
        "   shuffled bytes are linear in rows, but at 10M docs the",
        "   shuffle (~60+ GB) exceeds RAM-backed buffers and",
        "   serializes on ONE local disk (local[32] has one /tmp).",
        "   A 512-executor cluster spreads the same bytes over",
        "   hundreds of disks; the per-partition work is constant by",
        "   design. (Operationally this run also needed explicit",
        "   JVM-GC + settle between decades — Spark's ContextCleaner",
        "   frees finished shuffle files only after a GC, and 3",
        "   decades of accumulated spill otherwise exhaust the disk.)",
        "",
        "| operator | "
        + " | ".join(labels)
        + " | "
        + " | ".join(f"r{lb[1:]}" for lb in labels[1:])
        + f" | pairs/row {labels[0]} -> {labels[-1]} |",
        "|---" * (2 * len(labels) + 1) + "|",
    ]

    def row(name, ts, tail):
        cells = " | ".join(f"{ts[lb]:.2f}s" for lb in labels)
        ratios = " | ".join(
            f"{ts[b] / ts[a]:.1f}" for a, b in zip(labels, labels[1:])
        )
        return f"| {name} | {cells} | {ratios} | {tail} |"

    if probe_filter:
        probes = [
            (n, b) for n, b in probes if any(sub in n for sub in probe_filter)
        ]
    pair_frames: dict[str, object] = {}
    for name, build in probes:
        ts, dens = {}, {}
        for label in labels:
            d = corpora[label]
            spark.conf.set("spark.sql.shuffle.partitions", str(partitions[label]))
            best, n_pairs = float("inf"), 0
            for i in range(runs[label]):
                res = build(d)
                if i == runs[label] - 1 and name.startswith("minhash"):
                    # persist inside the last timed run (pairs are tiny;
                    # the write cost is noise) so the CC probe below
                    # reads real edges without a third full execution
                    res = res.persist()
                    pair_frames[label] = res
                t0 = time.time()
                n_pairs = res.count()
                best = min(best, time.time() - t0)
            ts[label] = best
            dens[label] = n_pairs / (n1 * kmap[label])
            print(
                f"# {name} {label}: {best:.2f}s"
                f" (pairs/row {dens[label]:.3f})",
                file=sys.stderr,
            )
            # release finished shuffle files NOW: the x1000 verify
            # shuffles tens of GB, and Spark's ContextCleaner only
            # deletes them after a JVM GC notices the dropped RDD refs
            # — without this the decades' spill accumulates on the one
            # local disk and the x1000 stage runs it out (observed
            # twice before this hygiene). Only needed once the decades
            # are big enough to spill (x100+); skipping it below that
            # keeps narrowed smoke runs fast.
            if kmap[label] >= 200:
                import gc as _gc

                _gc.collect()
                spark.sparkContext._jvm.System.gc()
                # let the cleaner's file deletion drain before the next
                # timed run — deleting ~60 GB of spill competes with the
                # small decades' I/O (observed: simhash x1 0.7s -> 13s
                # when timed during the post-x1000 deletion churn)
                time.sleep(15)
        lines.append(
            row(name, ts, f"{dens[labels[0]]:.3f} -> {dens[labels[-1]]:.3f}")
        )

    # CC over the REAL minhash pair edges (materialized above, so this
    # times component resolution alone; edge count grows linearly).
    # Skipped when a probe filter excluded minhash (no edges to read).
    ts = {}
    for label in labels if pair_frames else []:
        pairs = pair_frames[label]
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions[label]))
        best = float("inf")
        for _ in range(runs[label]):
            t0 = time.time()
            connected_components(pairs, "a_id", "b_id").count()
            best = min(best, time.time() - t0)
        ts[label] = best
        print(f"# connected_components {label}: {best:.2f}s", file=sys.stderr)
    if pair_frames:
        lines.append(row("connected_components (on minhash edges)", ts, "—"))

    replace_section(
        out_path, "## x10 / x100 pairing-operator probe", lines
    )
    print(f"wrote pairing probe section to {out_path}")


if __name__ == "__main__":
    if "--semantic" in sys.argv:
        semantic_probe()
    else:
        main()
