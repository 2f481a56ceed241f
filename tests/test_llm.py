"""LLM-pipeline operator tests: dedup sketches find planted
duplicates, similarity search ranks true neighbors first, text stats
compute exact values, multimodal plumbing round-trips bytes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.llm import dedup as ldedup
from dynamodb_to_datalake_project_spark.llm import multimodal, similarity
from dynamodb_to_datalake_project_spark.llm import text as ltext

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the dog dreams of bones all night long"
)
NEAR = BASE.replace("warm fire", "cold floor")  # near-dup of BASE
OTHER = (
    "completely different content about spark query engines and large "
    "scale distributed data processing with columnar storage formats"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER), (4, BASE)],  # 4 = exact dup of 1
        ["doc_id", "text"],
    )


def test_exact_dedup_keeps_min_id(spark, corpus):
    out = ldedup.exact_dedup(corpus, "doc_id", "text").collect()
    by_hash = {r.text_hash: (r.keep_id, r.n_copies) for r in out}
    assert len(by_hash) == 3
    assert (1, 2) in by_hash.values()  # BASE kept as doc 1, two copies


def test_minhash_finds_planted_near_dup(spark, corpus):
    pairs = ldedup.minhash_lsh_pairs(
        ldedup._shingle_sets(corpus), num_hashes=64, bands=4, threshold=0.5
    ).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert (1, 2) in got  # near-dup pair
    assert (1, 4) in got  # exact dup pair
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_near_dup_and_jvm_minhash_agree(spark, corpus):
    sh = ldedup.simhash_pairs(ldedup._shingle_sets(corpus), bits=48, max_hamming=0)
    got = {(r.a_id, r.b_id): r.hamming for r in sh.collect()}
    assert got[(1, 4)] == 0  # identical docs -> identical simhash
    # signature distances order by similarity: near-dup < unrelated
    sigs = {
        r.doc_id: r.simhash
        for r in ldedup.simhash_signatures(ldedup._shingle_sets(corpus), 48).collect()
    }
    ham = lambda a, b: bin(sigs[a] ^ sigs[b]).count("1")  # noqa: E731
    assert ham(1, 2) < ham(1, 3)
    # JVM expression path produces the same verified pairs as pandas path
    jvm = ldedup.minhash_lsh_pairs(
        ldedup._shingle_sets(corpus), 64, 4, threshold=0.5, use_pandas=False
    )
    pd_pairs = ldedup.minhash_lsh_pairs(
        ldedup._shingle_sets(corpus), 64, 4, threshold=0.5, use_pandas=True
    )
    assert {(r.a_id, r.b_id) for r in jvm.collect()} == {
        (r.a_id, r.b_id) for r in pd_pairs.collect()
    }


def test_md5_hash60_bridge_matches_duckdb(spark):
    """The cross-engine hash contract behind dedup_simhash_md5 /
    dedup_minhash_md5: Spark's conv(substring(md5,1,15),16,10) and
    DuckDB's CAST('0x'||substring(md5,1,15) AS BIGINT) are
    bit-identical, so the oracles replay the exact same token hashes."""
    import duckdb

    toks = ["hello", "a b", "", "ünïcode", "the quick brown fox", "42"]
    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT " + ldedup.MD5_HASH60_DUCK.format(t="?"), [t]
        ).fetchone()[0]
        for t in toks
    ]
    con.close()
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    spk = [r[0] for r in df.select(ldedup.md5_hash60(F.col("t"))).collect()]
    assert spk == duck


def test_simhash_md5_exact_pair_set(spark, corpus):
    """Uncapped md5-simhash output == brute-force hamming≤k pair set
    (the pigeonhole guarantee the dedup_simhash_md5 oracle relies on)."""
    shingled = ldedup._shingle_sets(corpus)
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in ldedup.simhash_pairs(
            shingled, bits=32, max_hamming=3,
            token_hash=ldedup.md5_hash60, max_bucket=1 << 30,
        ).collect()
    }
    sigs = {
        r.doc_id: r.simhash
        for r in ldedup.simhash_signatures(
            shingled, 32, token_hash=ldedup.md5_hash60
        ).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == want


def test_blocked_jaccard(spark, corpus):
    pairs = ldedup.blocked_jaccard_pairs(
        corpus, F.substring("text", 1, 16), threshold=0.5
    ).collect()
    got = {(r.a_id, r.b_id): r.jaccard for r in pairs}
    assert got[(1, 4)] == 1.0
    assert 0.5 <= got[(1, 2)] < 1.0


def test_prefix_filter_jaccard_complete_vs_brute_force(spark):
    """Round-9: the SSJoin/PPJoin prefix-filter join is LOSSLESS —
    over a random corpus with planted near-dups, its result equals
    the brute-force all-pairs answer exactly (same pairs, same
    integer intersections), at two different rational thresholds;
    an exactly-at-threshold pair is kept; the plan contains no
    cartesian product."""
    import random

    rnd = random.Random(42)
    vocab = [f"tok{i}" for i in range(300)]
    rows = []
    for i in range(50):
        rows.append((i, rnd.sample(vocab, rnd.randrange(8, 25))))
    for i in range(10):  # planted near-dup: drop 1-2 elements
        base_set = rows[i][1]
        rows.append((100 + i, base_set[: len(base_set) - 1 - (i % 2)]))
    rows.append((500, ["a", "b", "c", "d", "e"]))
    rows.append((501, ["a", "b", "c", "d", "x"]))  # jaccard = 4/6 = 2/3
    sets = spark.createDataFrame(rows, ["doc_id", "toks"])

    def brute(p, q):
        want = {}
        for i, (ai, at) in enumerate(rows):
            for bi, bt in rows[i + 1 :]:
                a_id, b_id = min(ai, bi), max(ai, bi)
                sa, sb = set(at), set(bt)
                inter = len(sa & sb)
                if q * inter >= p * (len(sa) + len(sb) - inter):
                    want[(a_id, b_id)] = inter
        return want

    for p, q in ((4, 5), (2, 3)):
        got = {
            (r.a_id, r.b_id): r.inter
            for r in ldedup.prefix_filter_jaccard_pairs(
                sets, p=p, q=q
            ).collect()
        }
        assert got == brute(p, q), (p, q)
    # the 2/3 threshold keeps the exactly-at-threshold (500, 501) pair
    assert (500, 501) in brute(2, 3)
    plan = (
        ldedup.prefix_filter_jaccard_pairs(sets)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_blocked_jaccard_caps_degenerate_block(spark):
    """A boilerplate prefix shared by many docs must NOT expand
    quadratically: with max_block below the degenerate block's size,
    the block is dropped (and reported by oversized_buckets) while
    normal-size blocks still dedup."""
    boiler = "SHARED LICENSE HEADER boilerplate prefix " * 2
    rows = [(i, boiler + f"unique tail content number {i} " * 3) for i in range(50)]
    rows += [(100, BASE), (101, BASE)]  # normal block: exact dup pair
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    blk = F.substring("text", 1, 32)
    pairs = ldedup.blocked_jaccard_pairs(
        docs, blk, threshold=0.5, max_block=40
    ).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    assert got == {(100, 101)}  # degenerate block dropped, real dup kept
    over = ldedup.oversized_buckets(
        docs.select(blk.alias("blk"), "doc_id"), ["blk"], max_bucket=40
    ).collect()
    assert len(over) == 1 and over[0].n == 50
    # raising the cap re-admits the block without quadratic hazard
    pairs2 = ldedup.blocked_jaccard_pairs(docs, blk, threshold=0.99, max_block=1000)
    assert pairs2.count() >= 1


def test_knn_ranks_true_neighbor_first(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # query
        (10, [0.9, 0.1, 0.0, 0.0]),      # near neighbor
        (11, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (12, [-1.0, 0.0, 0.0, 0.0]),     # opposite
    ]
    e = spark.createDataFrame(rows, ["vec_id", "v"]).withColumn(
        "v", F.col("v").cast("array<double>")
    )
    out = similarity.knn_bruteforce(
        e.filter("vec_id = 0"), e.filter("vec_id > 0"), k=3
    ).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)]
    assert ranked == [10, 11, 12]
    assert abs(out[0].cosine - 0.993884) < 1e-5


def test_ann_lsh_subset_of_bruteforce_universe(spark):
    from dynamodb_to_datalake_project_spark.lake import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    ann = similarity.ann_lsh(emb, query_ids_below=4, k=3).collect()
    assert len(ann) > 0
    assert all(r.neighbor_id >= 4 and r.query_id < 4 for r in ann)
    assert all(-1.0 <= r.cosine <= 1.0 for r in ann)


def test_text_stats_exact_values(spark):
    df = spark.createDataFrame([(1, "the cat and the hat ")], ["doc_id", "text"])
    row = ltext.add_text_stats(df).first()
    assert row.n_tokens == 5
    assert row.n_uniq_tokens == 4  # the, cat, and, hat
    assert row.n_stopwords == 3    # the, and, the
    assert abs(row.stopword_ratio - 0.6) < 1e-12
    assert row.fingerprint == hashlib.md5(b"the cat and the hat").hexdigest()


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    rows = df.select(ltext.shingle_set(F.col("text"), 3).alias("s")).collect()
    assert rows[0].s == ["a b c", "b c d"]
    assert rows[1].s == ["a b"]  # shorter than n -> whole text


def test_multimodal_roundtrip_and_stub(spark):
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    bin_docs = multimodal.to_binary_docs(docs)
    meta = bin_docs.first().meta
    assert meta.n_bytes == 11
    assert meta.checksum == hashlib.md5(b"hello world").hexdigest()
    feat = multimodal.extract_features(bin_docs).first()
    assert feat.n_bytes == 11
    assert feat.checksum == meta.checksum
    assert feat.fake_feature == (11 * 7 + ord("h")) % 997
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFFxxxxMP3 ")  # non-WAV container


def test_wav_codec_roundtrip():
    """The stdlib WAV codec is real: encode 16-bit PCM, decode_audio
    dispatches on the RIFF/WAVE magic, and every header field and
    sample statistic survives the container round trip."""
    samples = [0, 1000, -1000, 32767, -32768, 7]
    payload = multimodal.encode_wav(samples, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) == 44 + 2 * len(samples)  # standard PCM header
    feat = multimodal.decode_audio(payload)
    assert feat == {
        "n_channels": 1,
        "sample_rate": 8000,
        "n_samples": 6,
        "sum_abs": sum(abs(s) for s in samples),
        "peak": 32768,
    }
    # empty payload (zero frames) decodes cleanly
    empty = multimodal.encode_wav([])
    assert multimodal.decode_wav(empty)["n_samples"] == 0
    assert multimodal.decode_wav(empty)["sum_abs"] == 0


def test_bmp_codec_roundtrip():
    """The stdlib BMP codec is real: 24-bit BI_RGB with bottom-up BGR
    rows and 4-byte row padding, all reversed exactly on decode.
    Width 7 pads each 21-byte row to 24, so the padding logic runs."""
    px = [(p % 256, (p * 3) % 256, (p * 7) % 256) for p in range(7 * 3)]
    payload = multimodal.encode_bmp(px, 7, 3)
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + 24 * 3  # padded rows: 21 -> 24 bytes
    img = multimodal.decode_image(payload)  # dispatch on BM magic
    assert (img["width"], img["height"]) == (7, 3)
    assert img["pixels"] == px  # exact pixel round trip incl. BGR flip
    # top-down (negative height) rows decode to the same logical image
    import struct

    neg = bytearray(payload)
    rows = [payload[54 + 24 * r : 54 + 24 * (r + 1)] for r in range(3)]
    neg[54:] = b"".join(reversed(rows))
    struct.pack_into("<i", neg, 22, -3)
    assert multimodal.decode_bmp(bytes(neg))["pixels"] == px


def test_bmp_resize_nearest_neighbor():
    """resize_image is a real transform now: decode -> nearest-neighbor
    (src = dst*src_dim//dst_dim) -> re-encode, verified per pixel."""
    w, h = 5, 4
    px = [((x * 40) % 256, (y * 60) % 256, (x + y) % 256) for y in range(h) for x in range(w)]
    out = multimodal.resize_image(multimodal.encode_bmp(px, w, h), 3, 2)
    rimg = multimodal.decode_bmp(out)
    expected = [
        px[(y * h // 2) * w + (x * w // 3)] for y in range(2) for x in range(3)
    ]
    assert rimg["pixels"] == expected
    # 1x1 collapse picks the top-left source pixel
    one = multimodal.decode_bmp(
        multimodal.resize_image(multimodal.encode_bmp(px, w, h), 1, 1)
    )
    assert one["pixels"] == [px[0]]


def test_ann_ivf_recall_against_bruteforce(spark):
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        ann_ivf, as_double_vec, knn_bruteforce)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    e = emb.select("vec_id", as_double_vec("embedding").alias("v"))
    exact = knn_bruteforce(
        e.filter(F.col("vec_id") < 4), e.filter(F.col("vec_id") >= 4), k=3
    ).collect()
    approx = ann_ivf(emb, query_ids_below=4, k=3, n_lists=8, n_probe=3).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    # probing 3/8 cells must recover a meaningful fraction of true top-3
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, (recall, exact_set, approx_set)
    assert all(r.query_id < 4 and r.neighbor_id >= 4 for r in approx)


def test_pca_invariants(spark):
    """PCA math invariants: orthonormal components, descending
    eigenvalues, per-component projection variance ≈ eigenvalue, and
    reconstruction error monotone in k."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        pca_components,
        pca_project,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    comps, vals, mu = pca_components(emb, k=8)
    c = np.array(comps)
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-8)  # orthonormal
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))  # sorted desc
    assert all(v >= -1e-10 for v in vals)  # PSD covariance

    proj = pca_project(emb, comps, mu).toPandas()
    x = np.array([list(r) for r in emb.toPandas()["embedding"]], dtype=np.float64)
    for j in (0, 3, 7):
        assert abs(proj[f"pc{j}"].var(ddof=0) - vals[j]) < 1e-6 * max(1.0, vals[j])

    # reconstruction error strictly improves as components are added
    xc = x - np.array(mu)
    errs = []
    for k in (1, 4, 8):
        p = xc @ c[:k].T
        errs.append(float(((xc - p @ c[:k]) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]


def test_shingle_explode_no_inferred_filter_reinline(spark):
    """Pin the Generate plan shape: with InferFiltersFromGenerate
    excluded (session.py), the tokenize split() must appear ONCE in the
    optimized plan — the inferred `size(w)>0` filter used to re-inline
    the whole shingle expression below the materialization exchange
    (3 evaluations/row, measured 10x wall-clock on the novelty query)."""
    from pyspark.sql import functions as F

    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.dedup import _shingle_sets

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = _shingle_sets(docs.select("doc_id", "text"))
    x = sh.select("doc_id", F.explode("w").alias("s"))
    plan = x._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_heavy_hitters_exact_on_skewed_stream(spark):
    """Misra-Gries + exact-verify must return EXACTLY the phi-heavy
    items on an adversarial distribution: a few true heavy hitters
    drowned in a long tail of near-threshold distractors, spread
    across many partitions so no single partition sees the global
    picture."""
    from pyspark.sql import functions as F

    from dynamodb_to_datalake_project_spark.llm.sketch import heavy_hitters

    # 3 heavy items (4%/3%/2%) + 2000-item uniform tail, 100k rows
    rows = (
        spark.range(100_000)
        .select(
            F.when(F.col("id") % 100 < 4, F.lit("hh_a"))
            .when(F.col("id") % 100 < 7, F.lit("hh_b"))
            .when(F.col("id") % 100 < 9, F.lit("hh_c"))
            .otherwise(F.concat(F.lit("tail_"), (F.col("id") % 2000).cast("string")))
            .alias("item")
        )
        .repartition(16)  # scatter so locality can't help the sketch
    )
    got = {
        r["item"]: r["cnt"] for r in heavy_hitters(rows, "item", phi=0.015).collect()
    }
    exact = {
        r["item"]: r["n"]
        for r in rows.groupBy("item")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 0.015 * 100_000)
        .collect()
    }
    assert got == exact and set(got) == {"hh_a", "hh_b", "hh_c"}


def test_ivfpq_recall(spark):
    """IVF-PQ (probe → code-only ADC shortlist → exact rerank) must
    recover a meaningful fraction of the true top-3, and with a full
    probe + generous shortlist must MATCH exact search (the lossy step
    is candidate selection, not the rerank)."""
    from pyspark.sql import functions as F

    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        ann_ivf_pq, as_double_vec, knn_bruteforce)

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    e = emb.select("vec_id", as_double_vec("embedding").alias("v"))
    exact = knn_bruteforce(
        e.filter(F.col("vec_id") < 4), e.filter(F.col("vec_id") >= 4), k=3
    ).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}

    approx = ann_ivf_pq(
        emb, query_ids_below=4, k=3, n_lists=8, n_probe=3, adc_keep=15
    ).collect()
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, (recall, exact_set, approx_set)
    assert all(r.query_id < 4 and r.neighbor_id >= 4 for r in approx)

    # full probe + wide shortlist ⇒ rerank sees every true neighbor
    full = ann_ivf_pq(
        emb, query_ids_below=4, k=3, n_lists=8, n_probe=8, adc_keep=10_000
    ).collect()
    assert {(r.query_id, r.neighbor_id) for r in full} == exact_set


# ---------------------------------------------------------------- round 3


def test_segment_dedup_drops_repeated_segments(spark):
    """Doc 2 opens with doc 1's first 20 tokens (boilerplate), then
    diverges: its first segment must be dropped, the rest kept; doc 3
    is a full exact dup of doc 1 and loses everything."""
    w = [f"w{i}" for i in range(40)]
    d1 = " ".join(w)
    d2 = " ".join(w[:20] + [f"x{i}" for i in range(20)])
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d1)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in ldedup.segment_dedup(docs, 20).collect()}
    assert (out[1].n_segs, out[1].n_kept) == (2, 2)
    assert (out[2].n_segs, out[2].n_kept) == (2, 1)
    assert (out[3].n_segs, out[3].n_kept) == (2, 0)
    assert out[3].kept_hash is None  # fully-duplicated doc
    assert out[2].kept_hash == hashlib.md5(
        " ".join(f"x{i}" for i in range(20)).encode()
    ).hexdigest()


def test_collapse_repeats_keeps_first_of_each_run(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c a"), (2, "x y z")], ["doc_id", "text"]
    )
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = docs.select("doc_id", ltext.tokens(F.col("text")).alias("tk")).repartition(
        par, "doc_id"
    )
    kept = ltext.collapse_repeats(F.col("tk"), F.col("tk"))
    got = {r.doc_id: r.k for r in base.select("doc_id", kept.alias("k")).collect()}
    assert got[1] == ["a", "b", "c", "a"]  # runs collapsed, non-adjacent kept
    assert got[2] == ["x", "y", "z"]


def _ref_bpe(texts: list[str], n_merges: int, min_count: int):
    """Pure-Python reference for `train_bpe_merges`: same counting,
    same (count desc, left asc, right asc) tie-break, same greedy
    left-to-right merge."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: (list(w), f) for w, f in wf.items()}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        for w, (syms, f) in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = (out, f)
    return merges


def test_bpe_matches_reference(spark, corpus):
    """BOTH trainer paths — driver-side (vocab fits the gate) and
    distributed (gate forced to 0) — must produce the identical full
    merge table, equal to the pure-Python replay."""
    from dynamodb_to_datalake_project_spark.llm import bpe

    texts = [BASE, NEAR, OTHER, BASE]
    want = _ref_bpe(texts, 12, 2)
    driver = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe.train_bpe_merges(corpus, n_merges=12, min_count=2).collect()
    ]
    distributed = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe.train_bpe_merges(
            corpus, n_merges=12, min_count=2, driver_vocab_limit=0
        ).collect()
    ]
    assert driver == want
    assert distributed == want
    assert len(want) == 12  # corpus is repetitive enough to fill 12 merges


def test_bpe_merge_step_is_greedy_non_overlapping(spark):
    from dynamodb_to_datalake_project_spark.llm.bpe import _merge_step

    df = spark.createDataFrame([(["a", "a", "a", "a", "a"],)], ["syms"])
    out = df.select(_merge_step(F.col("syms"), "a", "a").alias("m")).collect()[0].m
    assert out == ["aa", "aa", "a"]  # left-to-right, no overlap


def test_overlap_matrix_staging_gate(spark):
    """source_overlap_matrix stages the distinct (source, gram) frame
    ONCE (localCheckpoint -> ExistingRDD scans) when the driver-side
    Catalyst size estimate exceeds the threshold, stays lazy below it,
    and produces identical results either way."""
    import io
    from contextlib import redirect_stdout

    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.decontam import source_overlap_matrix

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def plan(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    lazy = source_overlap_matrix(docs)  # default threshold >> bench size
    assert "ExistingRDD" not in plan(lazy)  # barrier-free at bench scale
    staged = source_overlap_matrix(docs, stage_threshold_bytes=0)
    # every branch reads the one checkpointed materialization
    assert plan(staged).count("Scan ExistingRDD") >= 2
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, staged.collect())
    )


def test_png_codec_roundtrip_all_filters():
    """The stdlib PNG codec is real: chunk framing with CRC32, zlib
    IDAT, and all five scanline filters — encoded with each filter
    type, decoded through the matching defilter path."""
    import numpy as np

    rng = [(p * 37 % 256, p * 91 % 256, p * 53 % 256) for p in range(7 * 3)]
    arr = np.array(rng, np.uint8).reshape(3, 7, 3)
    for ft in range(5):
        payload = multimodal.encode_png(arr, 7, 3, filter_type=ft)
        assert payload[:8] == multimodal.PNG_SIG
        img = multimodal.decode_image(payload)  # dispatch on PNG magic
        assert (img["width"], img["height"]) == (7, 3)
        assert img["pixels"] == rng, f"filter {ft}"
    # corrupt a byte inside IDAT -> CRC check must catch it
    bad = bytearray(multimodal.encode_png(arr, 7, 3))
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(bad))


def test_png_golden_sub_filter_decode():
    """Hand-built PNG bytes (filter 1 = Sub, spec-computed deltas)
    decode to the expected pixels — proves the decoder against the
    spec, not merely against our own encoder."""
    import struct
    import zlib

    px = [(10, 20, 30), (250, 0, 5)]
    raw = bytes([1, 10, 20, 30, (250 - 10) % 256, (0 - 20) % 256, (5 - 30) % 256])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    payload = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw))
        + multimodal._png_chunk(b"IEND", b"")
    )
    assert multimodal.decode_png(payload)["pixels"] == px
    # unsupported subset raises the honest stub, not garbage pixels
    ihdr16 = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    p16 = (
        multimodal.PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr16)
        + multimodal._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(p16)
    # truncated file with no IHDR: clean ValueError, not a TypeError
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.decode_png(multimodal.PNG_SIG + multimodal._png_chunk(b"IEND", b""))


def test_resize_dispatches_on_format():
    """resize_image round-trips BOTH stdlib formats and re-encodes in
    the SAME container; unsupported formats raise the honest stub."""
    import numpy as np

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    for enc, dec, magic in (
        (multimodal.encode_bmp_array, multimodal.decode_bmp, b"BM"),
        (multimodal.encode_png, multimodal.decode_png, multimodal.PNG_SIG),
    ):
        out = multimodal.resize_image(enc(px, 5, 4), 2, 2)
        assert out[: len(magic)] == magic  # same container back
        rimg = dec(out)
        expected = [
            tuple(int(c) for c in px[y * 4 // 2][x * 5 // 2])
            for y in range(2)
            for x in range(2)
        ]
        assert rimg["pixels"] == expected
    # jpeg is now a REAL codec: a truncated fragment is a corrupt
    # payload (ValueError), not an unsupported format
    with pytest.raises(ValueError):
        multimodal.resize_image(b"\xff\xd8\xff jpeg", 2, 2)
    # lossless WebP is now a REAL codec too; only lossy VP8 remains
    # the honest stub (well-formed RIFF with a lossy VP8 chunk)
    lossy = b"RIFF" + (16).to_bytes(4, "little") + b"WEBP"
    lossy += b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        multimodal.resize_image(lossy, 2, 2)


def test_gif_codec_golden_and_roundtrip():
    """The GIF codec is real: the decoder handles the canonical
    real-world 1x1 GIF byte string (produced by a wild encoder — pins
    the early-change LZW width convention and container parsing
    against reality, not our own encoder), and encode -> decode
    round-trips exactly through LZW width growth, a full 256-color
    palette, and the 4096-entry dictionary overflow/CLEAR path."""
    import base64

    import numpy as np

    golden = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    img = multimodal.decode_image(golden)  # dispatch on GIF89a magic
    assert (img["width"], img["height"]) == (1, 1)
    assert img["pixels"] == [(0, 0, 0)]  # palette entry 0

    w, h = 64, 48
    px = [((p * 37) % 256, (p * 91) % 256, (p * 53) % 250) for p in range(w * h)]
    # cap distinct colors at 256 for the indexed format
    px = [px[i % 250] for i in range(w * h)]
    arr = np.array(px, np.uint8).reshape(h, w, 3)
    out = multimodal.decode_gif(multimodal.encode_gif(arr, w, h))
    assert out["pixels"] == px
    # run-heavy image large enough to overflow the 12-bit dictionary
    px2 = [((i // 13) % 3 * 90, 0, 0) for i in range(100 * 90)]
    arr2 = np.array(px2, np.uint8).reshape(90, 100, 3)
    assert multimodal.decode_gif(multimodal.encode_gif(arr2, 100, 90))["pixels"] == px2
    # resize re-encodes in the same container
    rs = multimodal.resize_image(multimodal.encode_gif(arr, w, h), 3, 2)
    assert rs[:6] == b"GIF89a"
    assert multimodal.decode_gif(rs)["pixels"] == [
        px[(y * h // 2) * w + (x * w // 3)] for y in range(2) for x in range(3)
    ]
    # >256 distinct colors: honest error, GIF is indexed
    big = np.array(
        [(i % 256, i // 256, 7) for i in range(17 * 17)], np.uint8
    ).reshape(17, 17, 3)
    with pytest.raises(ValueError, match="256"):
        multimodal.encode_gif(big, 17, 17)


def test_gif_corrupt_payloads_fail_with_clean_valueerror():
    """ADVICE r4: corrupt/truncated GIFs must fail with the module's
    ValueError contract — never a bare IndexError from an unchecked
    table index or sub-block walk off the end of the payload."""
    import numpy as np

    arr = np.zeros((2, 2, 3), np.uint8)
    good = multimodal.encode_gif(arr, 2, 2)

    # 1. first LZW code beyond the table: hand-build a stream whose
    #    first code (after the encoder's leading CLEAR) is out of range
    bad_code = bytes([0b11111111, 0b1111])  # all-ones codes, width 3+
    with pytest.raises(ValueError, match="LZW"):
        multimodal._lzw_decode(bad_code, 2)
    # 2. truncated mid-sub-block: cut the payload before the trailer
    for cut in (len(good) - 2, len(good) - 4, 14, 20):
        try:
            multimodal.decode_gif(good[:cut])
        except ValueError:
            pass  # clean contract
        # anything else (IndexError, struct.error) propagates = failure
    # 3. sub-block length running past the end
    trunc = bytearray(good)
    # find the image-data section: after descriptor(10)+min_code(1)
    # lives the first sub-block length byte; inflate it past the end
    idx = good.index(b"\x2c") + 11
    trunc[idx] = 0xFF
    with pytest.raises(ValueError):
        multimodal.decode_gif(bytes(trunc[: idx + 3]))


def test_jpeg_codec_golden_and_roundtrip():
    """The JPEG codec is real baseline T.81: the decoder handles a
    wild-encoder-produced 331-byte grayscale 2x2 JPEG (standard
    Annex-K Huffman tables in-file; scan = DC category 0 + EOB, i.e. a
    uniform mid-gray block — hand-verified against the code tables),
    and encode -> decode round-trips within a tight PSNR bound (JPEG
    is lossy; byte-exactness is not the contract)."""
    import base64

    import numpy as np

    golden = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8U"
        "HRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA"
        "/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
        "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJico"
        "KSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKT"
        "lJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo"
        "6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
    )
    img = multimodal.decode_image(golden)  # dispatch on 0xFFD8 magic
    assert (img["width"], img["height"]) == (2, 2)
    assert img["pixels"] == [(128, 128, 128)] * 4

    # color round-trip: gradient exercising DC prediction across MCUs,
    # AC runs, and non-multiple-of-8 edge padding
    h, w = 24, 31
    px = np.zeros((h, w, 3), np.uint8)
    for yy in range(h):
        for xx in range(w):
            px[yy, xx] = ((yy * 8) % 256, (xx * 8) % 256, ((yy + xx) * 4) % 256)
    enc = multimodal.encode_jpeg(px, w, h, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = multimodal.decode_jpeg_array(enc)
    assert (dec["width"], dec["height"]) == (w, h)
    mse = float(((dec["px"].astype(float) - px.astype(float)) ** 2).mean())
    psnr = 10 * np.log10(255 * 255 / mse)
    assert psnr > 35, psnr  # smooth gradient should reconstruct well

    # flat block: quantizes to DC-only, reconstructs exactly
    solid = np.full((8, 8, 3), 200, np.uint8)
    d2 = multimodal.decode_jpeg_array(multimodal.encode_jpeg(solid, 8, 8, 95))
    assert int(np.abs(d2["px"].astype(int) - 200).max()) == 0

    # resize re-encodes in the same container
    rs = multimodal.resize_image(enc, 8, 6)
    assert rs[:2] == b"\xff\xd8"
    assert multimodal.decode_jpeg_array(rs)["px"].shape == (6, 8, 3)


def test_jpeg_corrupt_and_unsupported_fail_cleanly():
    import numpy as np

    px = np.full((8, 8, 3), 99, np.uint8)
    enc = bytearray(multimodal.encode_jpeg(px, 8, 8))
    # progressive (SOF2) is an honest NotImplementedError, not garbage
    sof = enc.find(b"\xff\xc0")
    prog = enc[:sof] + b"\xff\xc2" + enc[sof + 2 :]
    with pytest.raises(NotImplementedError, match="baseline"):
        multimodal.decode_jpeg_array(bytes(prog))
    # truncated scan: clean ValueError
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_array(bytes(enc[: sof + 8]))
    # not a JPEG at all
    with pytest.raises(ValueError, match="JPEG"):
        multimodal.decode_jpeg_array(b"\x00\x01rubbish")


def _mini_restart_jpeg(entropy: bytes) -> bytes:
    """Hand-built 16x8 grayscale baseline JPEG with DRI=1 (restart
    after every MCU) and trivial tables: quant all-ones, DC table =
    single 1-bit code '0' -> category 0, AC table = single 1-bit code
    '0' -> EOB. Each MCU is the 2 bits '00' padded to byte 0x3F; the
    caller supplies the entropy bytes so the restart-marker error
    paths can be pinned too."""
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += struct.pack("BBB", 1, 0x11, 0)
    dc_bits = [1] + [0] * 15
    out += b"\xff\xc4" + struct.pack(">HB", 20, 0x00)
    out += bytes(dc_bits) + bytes([0])
    out += b"\xff\xc4" + struct.pack(">HB", 20, 0x10)
    out += bytes(dc_bits) + bytes([0x00])
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack("BB", 1, 0x00) + b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_restart_interval_decode_and_errors():
    """Restart-marker handling of the segment-based entropy decoder
    (r11): a DRI=1 stream decodes across RST0 with DC prediction
    resets (all-zero coefficients -> exact mid-gray), a stream whose
    restart marker is missing fails with the documented error, and a
    marker hit mid-entropy-segment fails cleanly."""
    import numpy as np

    good = _mini_restart_jpeg(b"\x3f\xff\xd0\x3f")
    d = multimodal.decode_jpeg_array(good)
    assert (d["width"], d["height"]) == (16, 8)
    assert d["px"].shape == (8, 16, 3)
    assert int(np.abs(d["px"].astype(int) - 128).max()) == 0

    # data where the RST0 should be: restart() must fail
    with pytest.raises(ValueError, match="restart"):
        multimodal.decode_jpeg_array(_mini_restart_jpeg(b"\x3f\x3f\x3f"))
    # marker arrives EARLY (mid-MCU): read crosses the segment end
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_array(_mini_restart_jpeg(b"\xff\xd0\x3f"))


class _VP8LWriter:
    """Spec bit writer for hand-building golden VP8L streams — LSB
    first within bytes, prefix codes MSB-first — kept independent of
    llm.webp's internals so the goldens pin the spec, not the
    implementation."""

    def __init__(self):
        self.b = bytearray()
        self.n = 0

    def w(self, v, nbits):
        for i in range(nbits):
            if self.n % 8 == 0:
                self.b.append(0)
            if (v >> i) & 1:
                self.b[-1] |= 1 << (self.n % 8)
            self.n += 1

    def code(self, c, ln):
        for i in range(ln - 1, -1, -1):
            self.w((c >> i) & 1, 1)

    def simple(self, syms):
        """Simple prefix code (1 or 2 symbols)."""
        self.w(1, 1)
        self.w(len(syms) - 1, 1)
        if syms[0] <= 1:
            self.w(0, 1)
            self.w(syms[0], 1)
        else:
            self.w(1, 1)
            self.w(syms[0], 8)
        if len(syms) == 2:
            self.w(syms[1], 8)

    def header(self, w, h):
        self.w(0x2F, 8)
        self.w(w - 1, 14)
        self.w(h - 1, 14)
        self.w(0, 1)  # alpha hint
        self.w(0, 3)  # version


def _wrap_vp8l(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_webp_roundtrip_lossless():
    """encode_webp -> decode_webp is exact (the format is lossless),
    across random, constant (simple-code) and two-value images, and
    the resize/decode_image dispatchers route RIFF/WEBP payloads."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.llm import webp

    rng = np.random.default_rng(11)
    for w, h in [(1, 1), (3, 2), (16, 16), (33, 9)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        d = webp.decode_webp_array(webp.encode_webp(px, w, h))
        assert (d["width"], d["height"]) == (w, h)
        assert (d["px"] == px).all()
    const = np.full((4, 4, 3), 200, np.uint8)
    assert (
        webp.decode_webp_array(webp.encode_webp(const, 4, 4))["px"] == const
    ).all()
    # dispatchers
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    payload = webp.encode_webp(px, 6, 4)
    img = multimodal.decode_image(payload)
    assert (img["width"], img["height"]) == (6, 4)
    rs = multimodal.resize_image(payload, 3, 2)
    assert rs[:4] == b"RIFF" and rs[8:12] == b"WEBP"
    rimg = webp.decode_webp_array(rs)
    assert (rimg["px"] == px[[0, 2]][:, [0, 2, 4]]).all()


def test_webp_golden_cache_lz77_and_codelength_code():
    """Spec-built golden: a 4x1 VP8L stream using a NORMAL green code
    emitted through the code-length code (repeat-18 zero runs + the
    max_symbol truncation), a 4-entry color cache, and an LZ77
    backward reference through the 2D distance map — none of which
    our own encoder emits, so this pins the decoder against the spec,
    not against encode_webp."""
    from dynamodb_to_datalake_project_spark.llm import webp

    p0 = (255 << 24) | (10 << 16) | (20 << 8) | 30  # ARGB(255,10,20,30)
    ci = ((0x1E35A7BD * p0) & 0xFFFFFFFF) >> 30  # 2-bit cache index
    cache_sym = 280 + ci
    w = _VP8LWriter()
    w.header(4, 1)
    w.w(0, 1)  # no transforms
    w.w(1, 1)
    w.w(2, 4)  # color cache, 2 bits
    w.w(0, 1)  # no meta prefix codes
    # --- green: normal code, lengths 2 for {20, 40, 256, cache_sym}
    w.w(0, 1)  # normal form
    w.w(1, 4)  # num_code_lengths = 5 (through order pos of CL sym 2)
    for ln in (2, 2, 0, 0, 1):  # CL lens for order [17, 18, 0, 1, 2]
        w.w(ln, 3)
    w.w(1, 1)  # use max_symbol
    w.w(1, 3)  # length_nbits = 4
    w.w(7, 4)  # max_symbol = 2 + 7 = 9 CL symbols follow
    cl2 = lambda: w.code(0b0, 1)  # noqa: E731
    cl18 = lambda: w.code(0b11, 2)  # noqa: E731
    cl18(); w.w(9, 7)  # 20 zeros
    cl2()  # symbol 20 -> length 2
    cl18(); w.w(8, 7)  # 19 zeros -> cursor 40
    cl2()  # symbol 40
    cl18(); w.w(127, 7)  # 138 zeros -> cursor 179
    cl18(); w.w(66, 7)  # 77 zeros -> cursor 256
    cl2()  # symbol 256 (LZ77 length code 0)
    cl18(); w.w(12 + ci, 7)  # 23+ci zeros -> cursor 280+ci
    cl2()  # the cache symbol
    # --- red/blue: simple 2-symbol codes; alpha/distance: 1-symbol
    w.simple([10, 50])
    w.simple([30, 60])
    w.simple([255])
    w.simple([1])  # distance prefix 1 -> value 2 -> map (1,0) -> dist 1
    # --- pixels: canonical green codes 20=00, 40=01, 256=10, cache=11
    w.code(0b00, 2); w.code(0, 1); w.code(0, 1)  # P0 literal (10,20,30)
    w.code(0b10, 2)  # P1: LZ77 len 1 dist 1 (copy of P0)
    w.code(0b11, 2)  # P2: cache hit (P0 again)
    w.code(0b01, 2); w.code(1, 1); w.code(1, 1)  # P3 literal (50,40,60)
    img = webp.decode_webp(_wrap_vp8l(bytes(w.b)))
    assert (img["width"], img["height"]) == (4, 1)
    assert img["pixels"] == [(10, 20, 30)] * 3 + [(50, 40, 60)]


def test_webp_golden_transforms():
    """Spec-built goldens for all four inverse transforms."""
    from dynamodb_to_datalake_project_spark.llm import webp

    def zero_bit_codes(w, g, r, b, a=255):
        """Five 1-symbol codes: every pixel is (a, r, g, b) at 0 bits."""
        w.simple([g]); w.simple([r]); w.simple([b]); w.simple([a])
        w.simple([0])

    # SUBTRACT_GREEN: stored (r=5, g=200, b=7) -> (205, 200, 207)
    w = _VP8LWriter()
    w.header(1, 1)
    w.w(1, 1); w.w(2, 2)  # transform: subtract green (no data)
    w.w(0, 1)  # end transforms
    w.w(0, 1); w.w(0, 1)  # no cache, no meta
    zero_bit_codes(w, g=200, r=5, b=7)
    assert webp.decode_webp(_wrap_vp8l(bytes(w.b)))["pixels"] == [(205, 200, 207)]

    # PREDICTOR: 2x2, one block, mode 1 (L); residuals (1,1,1) per px.
    # (0,0) predicts opaque black; top row L; left column T; block L.
    w = _VP8LWriter()
    w.header(2, 2)
    w.w(1, 1); w.w(0, 2)  # transform: predictor
    w.w(0, 3)  # size_bits = 2 -> 1x1 mode image
    w.w(0, 1)  # mode image: no cache
    zero_bit_codes(w, g=1, r=0, b=0, a=0)  # mode byte lives in green
    w.w(0, 1)  # end transforms
    w.w(0, 1); w.w(0, 1)
    zero_bit_codes(w, g=1, r=1, b=1, a=0)
    assert webp.decode_webp(_wrap_vp8l(bytes(w.b)))["pixels"] == [
        (1, 1, 1), (2, 2, 2), (2, 2, 2), (3, 3, 3)
    ]

    # COLOR transform: element (g2r=64, g2b=32, r2b=16), stored
    # (r=10, g=100, b=20): r' = 10 + (64*100 >> 5) = 210;
    # b' = 20 + (32*100 >> 5) + (16*int8(210) >> 5) = 20+100-23 = 97
    w = _VP8LWriter()
    w.header(1, 1)
    w.w(1, 1); w.w(1, 2)  # transform: color
    w.w(0, 3)  # size_bits = 2
    w.w(0, 1)  # element image: no cache
    zero_bit_codes(w, g=32, r=64, b=16, a=0)
    w.w(0, 1)
    w.w(0, 1); w.w(0, 1)
    zero_bit_codes(w, g=100, r=10, b=20)
    assert webp.decode_webp(_wrap_vp8l(bytes(w.b)))["pixels"] == [(210, 100, 97)]

    # COLOR_INDEXING with sub-byte bundling: 5x1, 2-color palette
    # (red, green), indices [1,0,1,1,0] packed LSB-first into one
    # green byte (0b01101 = 13); palette is delta-coded.
    w = _VP8LWriter()
    w.header(5, 1)
    w.w(1, 1); w.w(3, 2)  # transform: color indexing
    w.w(1, 8)  # n_colors - 1 = 1
    w.w(0, 1)  # palette image: no cache
    w.simple([0, 255])  # greens of the two delta pixels
    w.simple([1, 255])  # reds
    w.simple([0])  # blues
    w.simple([0, 255])  # alphas
    w.simple([0])  # distance (unused)
    # palette px 1: ARGB(255,255,0,0); px 2 delta: ARGB(0,1,255,0)
    w.code(0, 1); w.code(1, 1); w.code(1, 1)  # g=0, r=255, a=255
    w.code(1, 1); w.code(0, 1); w.code(0, 1)  # g=255, r=1, a=0
    w.w(0, 1)  # end transforms
    w.w(0, 1); w.w(0, 1)  # packed 1x1 image: no cache, no meta
    zero_bit_codes(w, g=13, r=0, b=0, a=0)
    assert webp.decode_webp(_wrap_vp8l(bytes(w.b)))["pixels"] == [
        (0, 255, 0), (255, 0, 0), (0, 255, 0), (0, 255, 0), (255, 0, 0)
    ]


def test_webp_golden_meta_prefix_codes():
    """Spec-built golden: meta prefix codes (entropy image) select a
    different code group per 4-pixel block of an 8x1 image."""
    from dynamodb_to_datalake_project_spark.llm import webp

    w = _VP8LWriter()
    w.header(8, 1)
    w.w(0, 1)  # no transforms
    w.w(0, 1)  # no cache
    w.w(1, 1)  # meta prefix codes
    w.w(0, 3)  # meta bits = 2 -> 2x1 entropy image
    w.w(0, 1)  # entropy image: no cache
    w.simple([0, 1])  # greens = group ids
    w.simple([0]); w.simple([0]); w.simple([0]); w.simple([0])
    w.code(0, 1)  # block 0 -> group 0
    w.code(1, 1)  # block 1 -> group 1
    # group 0: constant green 7; group 1: constant green 9
    for g in (7, 9):
        w.simple([g]); w.simple([0]); w.simple([0]); w.simple([255])
        w.simple([0])
    img = webp.decode_webp(_wrap_vp8l(bytes(w.b)))
    assert img["pixels"] == [(0, 7, 0)] * 4 + [(0, 9, 0)] * 4


def test_webp_corrupt_payloads_fail_cleanly():
    """Corrupt/unsupported WebP payloads keep the module's clean
    error contract: ValueError for damage, NotImplementedError only
    for genuinely out-of-scope formats (lossy VP8)."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.llm import webp

    good = webp.encode_webp(np.zeros((2, 2, 3), np.uint8), 2, 2)
    with pytest.raises(ValueError, match="WebP"):
        webp.decode_webp_array(b"not a webp at all")
    with pytest.raises(ValueError):
        webp.decode_webp_array(good[:20])  # truncated chunk
    bad_sig = bytearray(good)
    bad_sig[20] ^= 0xFF  # clobber the 0x2f VP8L signature byte
    with pytest.raises(ValueError, match="signature"):
        webp.decode_webp_array(bytes(bad_sig))
    for cut in range(21, len(good) - 1, 7):  # truncated bitstream
        try:
            webp.decode_webp_array(good[:cut])
        except (ValueError, NotImplementedError):
            pass  # clean contract; anything else propagates = failure
    # LZ77 reference before the image start
    w = _VP8LWriter()
    w.header(2, 1)
    w.w(0, 1); w.w(0, 1); w.w(0, 1)
    # green: simple 2-symbol code over {0, 255}? distances need a
    # length symbol >= 256 which simple codes cannot carry — instead
    # reuse the golden's normal-code machinery minimally: emit a
    # 1-symbol green {256}: normal form via code-length code
    w.w(0, 1)  # normal form
    w.w(1, 4)  # num_code_lengths = 5
    for ln in (2, 2, 0, 0, 1):
        w.w(ln, 3)
    w.w(1, 1); w.w(1, 3); w.w(1, 4)  # max_symbol = 3 CL reads
    w.code(0b11, 2); w.w(127, 7)  # 138 zeros
    w.code(0b11, 2); w.w(107, 7)  # 118 zeros -> cursor 256
    w.code(0b0, 1)  # symbol 256 gets length 2 (sole symbol -> 0 bits)
    w.simple([0]); w.simple([0]); w.simple([255]); w.simple([1])
    # first symbol is the LZ77 length code with nothing decoded yet
    with pytest.raises(ValueError, match="before the image"):
        webp.decode_webp_array(_wrap_vp8l(bytes(w.b)))


class _FlacWriter:
    """MSB-first bit writer for hand-building golden FLAC streams —
    independent of llm.flac's internals (including its CRCs), so the
    goldens pin the spec."""

    def __init__(self):
        self.b = bytearray()
        self.n = 0

    def w(self, v, nbits):
        for i in range(nbits - 1, -1, -1):
            if self.n % 8 == 0:
                self.b.append(0)
            if (v >> i) & 1:
                self.b[-1] |= 1 << (7 - self.n % 8)
            self.n += 1

    def sw(self, v, nbits):  # signed, two's complement
        self.w(v & ((1 << nbits) - 1), nbits)

    def align(self):
        while self.n % 8:
            self.w(0, 1)


def _flac_crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _flac_stream(n_channels, bps, total, frames: bytes) -> bytes:
    si = _FlacWriter()
    si.w(8, 16); si.w(8, 16)  # min/max block size
    si.w(0, 24); si.w(0, 24)
    si.w(16000, 20)
    si.w(n_channels - 1, 3)
    si.w(bps - 1, 5)
    si.w(total, 36)
    return (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.b)
        + b"\x00" * 16  # md5 unknown
        + frames
    )


def _flac_frame_header(w, n_channels_code, block_size):
    w.w(0b11111111111110, 14)
    w.w(0, 1); w.w(0, 1)  # reserved, fixed-blocksize strategy
    w.w(7, 4)  # block size: 16 bits at end
    w.w(0, 4)  # sample rate from STREAMINFO
    w.w(n_channels_code, 4)
    w.w(4, 3)  # 16-bit samples
    w.w(0, 1)
    w.w(0, 8)  # frame number 0 (UTF-8 single byte)
    w.w(block_size - 1, 16)
    w.w(_flac_crc8(bytes(w.b)), 8)


def test_flac_bit_primitives_match_references():
    """The r12 vectorized bit primitives (table CRCs, multi-bit
    reader, int-accumulator writer) are value-identical to literal
    per-bit references on random streams — the internals-changed
    regression gate for the codec rewrite."""
    import random

    from dynamodb_to_datalake_project_spark.llm import flac

    rng = random.Random(12)

    def crc8_ref(data):
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        return crc

    def crc16_ref(data):
        crc = 0
        for b in data:
            crc ^= b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        return crc

    for _ in range(50):
        d = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        assert flac._crc8(d) == crc8_ref(d)
        assert flac._crc16(d) == crc16_ref(d)

    # writer/reader round-trip over random (value, width) sequences,
    # byte-compared against a per-bit reference writer
    for _ in range(30):
        fields = [
            (rng.randrange(1 << n), n)
            for n in (rng.randrange(1, 24) for _ in range(rng.randrange(1, 60)))
        ]
        w = flac._Writer()
        ref_bits = []
        for v, n in fields:
            w.write(v, n)
            ref_bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))
        w.align()
        while len(ref_bits) % 8:
            ref_bits.append(0)
        ref = bytes(
            sum(bit << (7 - j) for j, bit in enumerate(ref_bits[i : i + 8]))
            for i in range(0, len(ref_bits), 8)
        )
        assert bytes(w.out) == ref
        r = flac._Reader(bytes(w.out))
        for v, n in fields:
            assert r.read(n) == v
    # unary scan across byte boundaries + truncation behavior
    w = flac._Writer()
    for q in (0, 1, 7, 8, 9, 30):
        w.unary(q)
    w.align()
    r = flac._Reader(bytes(w.out))
    assert [r.unary() for _ in range(6)] == [0, 1, 7, 8, 9, 30]
    import pytest as _pt

    with _pt.raises(ValueError, match="truncated"):
        flac._Reader(b"\x01").read(9)
    with _pt.raises(ValueError, match="truncated"):
        flac._Reader(b"\x00").unary()


def test_ogg_crc_zlib_mapping_matches_reference():
    """The zlib-mapped ogg_crc (r12) equals the literal RFC 3533
    table loop on random buffers and the empty buffer."""
    import random

    rng = random.Random(33)
    assert multimodal.ogg_crc(b"") == multimodal._ogg_crc_ref(b"") == 0
    for _ in range(60):
        d = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 1200)))
        assert multimodal.ogg_crc(d) == multimodal._ogg_crc_ref(d)


def test_flac_roundtrip_lossless():
    """encode_flac -> decode is exact across random, smooth (FIXED
    predictors engage), constant, stereo, multi-frame, and empty
    streams; decode_audio dispatches fLaC payloads."""
    import math
    import random

    from dynamodb_to_datalake_project_spark.llm import flac

    rng = random.Random(5)
    cases = [
        [rng.randint(-32768, 32767) for _ in range(3000)],
        [int(3000 * math.sin(i / 30)) for i in range(5000)],
        [123] * 2000,
        [],
    ]
    for s in cases:
        d = flac.decode_flac_samples(flac.encode_flac(s, block_size=1024))
        assert d["samples"] == s
    stereo = [v for i in range(900) for v in (i % 251 - 125, rng.randint(-9, 9))]
    p = flac.encode_flac(stereo, n_channels=2, block_size=256)
    d = flac.decode_flac_samples(p)
    assert d["samples"] == stereo and d["n_channels"] == 2
    feat = multimodal.decode_audio(p)
    assert feat["n_samples"] == len(stereo)
    assert feat["sum_abs"] == sum(abs(v) for v in stereo)


def test_flac_golden_lpc_rice_partitions():
    """Spec-built golden (independent writer + CRCs): an LPC order-1
    subframe (coef 1, shift 0 — prediction = previous sample) with a
    partition-order-1 Rice residual — paths our encoder never emits.
    Residuals are the deltas; partition 1 holds blocksize/2 - order
    samples, partition 2 blocksize/2."""
    from dynamodb_to_datalake_project_spark.llm import flac

    samples = [10, 12, 11, 11, 15, 20, 6, 6]
    deltas = [b - a for a, b in zip(samples, samples[1:])]
    w = _FlacWriter()
    _flac_frame_header(w, 0, 8)  # mono, block size 8
    w.w(0, 1)
    w.w(32, 6)  # LPC order 1 (1xxxxx with xxxxx = 0)
    w.w(0, 1)  # no wasted bits
    w.sw(samples[0], 16)  # warm-up
    w.w(14, 4)  # qlp precision 15
    w.sw(0, 5)  # shift 0
    w.sw(1, 15)  # coefficient = 1
    w.w(0, 2)  # residual method: 4-bit Rice
    w.w(1, 4)  # partition order 1 -> two partitions (3 + 4 residuals)
    for part, k in ((deltas[:3], 1), (deltas[3:], 3)):
        w.w(k, 4)
        for v in part:
            u = (v << 1) ^ (v >> 63)
            for _ in range(u >> k):
                w.w(0, 1)
            w.w(1, 1)
            w.w(u & ((1 << k) - 1), k)
    w.align()
    w.w(_flac_crc16(bytes(w.b)), 16)
    payload = _flac_stream(1, 16, 8, bytes(w.b))
    assert flac.decode_flac_samples(payload)["samples"] == samples


def test_flac_golden_mid_side_and_wasted_bits():
    """Spec-built goldens: mid/side stereo decorrelation (side channel
    carries 17 bits) and the wasted-bits path."""
    from dynamodb_to_datalake_project_spark.llm import flac

    left, right = [4, 6, 8, 2], [2, 2, 10, 2]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]
    w = _FlacWriter()
    _flac_frame_header(w, 10, 4)  # mid/side, block size 4
    w.w(0, 1); w.w(1, 6); w.w(0, 1)  # VERBATIM mid, 16 bits
    for v in mid:
        w.sw(v, 16)
    w.w(0, 1); w.w(1, 6); w.w(0, 1)  # VERBATIM side, 17 bits
    for v in side:
        w.sw(v, 17)
    w.align()
    w.w(_flac_crc16(bytes(w.b)), 16)
    d = flac.decode_flac_samples(_flac_stream(2, 16, 4, bytes(w.b)))
    assert d["samples"] == [v for lr in zip(left, right) for v in lr]

    # wasted bits: stored values >> 1 at 15 bits, flag + unary count 0
    w = _FlacWriter()
    _flac_frame_header(w, 0, 2)
    w.w(0, 1); w.w(1, 6)  # VERBATIM mono
    w.w(1, 1)  # wasted-bits flag
    w.w(1, 1)  # unary 0 -> wasted = 1
    w.sw(2, 15)
    w.sw(-3, 15)
    w.align()
    w.w(_flac_crc16(bytes(w.b)), 16)
    d = flac.decode_flac_samples(_flac_stream(1, 16, 2, bytes(w.b)))
    assert d["samples"] == [4, -6]


def test_avi_mjpeg_video_roundtrip_and_sampling():
    """The video leg is real end-to-end: AVI/RIFF container with
    avih/strh/strf headers and an idx1 index, MJPEG frames through the
    zero-dep T.81 codec, frame sampling that decodes ONLY sampled
    frames; flat frames at quality 95 round-trip bit-exactly."""
    import numpy as np

    frames = [
        np.broadcast_to(
            np.array([17 + f * 10, 30 + f * 5, 200 - f * 20], np.uint8), (8, 8, 3)
        ).copy()
        for f in range(5)
    ]
    p = multimodal.encode_avi_mjpeg(frames, 8, 8, quality=95)
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    d = multimodal.decode_avi_frames(p)
    assert (d["width"], d["height"], d["n_frames"]) == (8, 8, 5)
    for f, px in zip(frames, d["frames"]):
        assert (px == f).all()
    d2 = multimodal.decode_avi_frames(p, every=2)
    assert d2["sampled_idx"] == [0, 2, 4]
    assert (d2["frames"][1] == frames[2]).all()
    # dispatcher: AVI real, mp4/webm honest stubs
    assert multimodal.decode_video(p)["n_frames"] == 5
    with pytest.raises(NotImplementedError, match="mp4"):
        multimodal.decode_video(b"\x00\x00\x00\x18ftypmp42 not supported")
    # corrupt payloads keep the ValueError contract
    with pytest.raises(ValueError):
        multimodal.decode_avi_frames(p[:100])
    with pytest.raises(ValueError, match="AVI"):
        multimodal.decode_avi_frames(b"RIFFxxxxWAVE")
    # frame-count/chunk mismatch is detected via the avih header
    import struct

    bad = bytearray(p)
    avih_off = p.index(b"avih") + 8
    struct.pack_into("<I", bad, avih_off + 16, 7)  # claim 7 frames
    with pytest.raises(ValueError, match="frame count"):
        multimodal.decode_avi_frames(bytes(bad))


def test_flac_corrupt_payloads_fail_cleanly():
    """Damage anywhere — magic, metadata, header CRC, frame CRC,
    sample bytes (MD5) — fails with the module's ValueError contract."""
    from dynamodb_to_datalake_project_spark.llm import flac

    good = flac.encode_flac([7, -9, 300, 12, 5, 5, 5, -1], block_size=4)
    with pytest.raises(ValueError, match="FLAC"):
        flac.decode_flac_samples(b"not flac")
    with pytest.raises(ValueError):
        flac.decode_flac_samples(good[:30])  # truncated metadata/frames
    dmg = bytearray(good)
    dmg[-3] ^= 0x10  # flip a bit near the tail: CRC-16 or MD5 trips
    with pytest.raises(ValueError):
        flac.decode_flac_samples(bytes(dmg))
    hdr = bytearray(good)
    hdr[4 + 4 + 34 + 2] ^= 0x04  # damage the first frame header
    with pytest.raises(ValueError):
        flac.decode_flac_samples(bytes(hdr))
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"OggS rest-of-an-ogg-container")


def test_simhash_band_bits_preserves_pigeonhole_exactness(spark, corpus):
    """Round-5 scale knob: with uncapped buckets, 16-bit bands must
    find EXACTLY the same ham<=3 pair set as 8-bit bands at the same
    signature width — the pigeonhole guarantee holds for any band
    width with n_bands-1 >= max_hamming. Also pins the config guards."""
    import pytest as _pytest

    sh = ldedup._shingle_sets(corpus)
    byte_bands = {
        (r.a_id, r.b_id, r.hamming)
        for r in ldedup.simhash_pairs(
            sh, bits=64, max_hamming=3, max_bucket=1 << 30
        ).collect()
    }
    wide_bands = {
        (r.a_id, r.b_id, r.hamming)
        for r in ldedup.simhash_pairs(
            sh, bits=64, max_hamming=3, max_bucket=1 << 30, band_bits=16
        ).collect()
    }
    assert byte_bands == wide_bands and byte_bands
    with _pytest.raises(ValueError, match="multiple"):
        ldedup.simhash_pairs(sh, bits=48, band_bits=13)
    with _pytest.raises(ValueError, match="pigeonhole"):
        ldedup.simhash_pairs(sh, bits=64, max_hamming=4, band_bits=16)


def test_simhash_wide_signature_matches_bruteforce(spark, corpus):
    """The 10M+-doc scale config (bits=128 / band_bits=32, array-of-
    words signatures): with uncapped buckets the operator must find
    EXACTLY the ham<=3 pairs a brute-force popcount over its own
    signatures finds — banding, word extraction, and the zip_with
    hamming fold all pinned at once."""
    import itertools

    import pytest as _pytest

    sh = ldedup._shingle_sets(corpus)
    sigs = {
        r.doc_id: tuple(r.simhash_words)
        for r in ldedup.simhash_signatures(sh, bits=128).collect()
    }
    assert all(len(w) == 2 for w in sigs.values())
    expected = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        ham = sum(bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b]))
        if ham <= 3:
            expected.add((a, b, ham))
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in ldedup.simhash_pairs(
            sh, bits=128, max_hamming=3, max_bucket=1 << 30, band_bits=32
        ).collect()
    }
    assert got == expected
    # the duplicated corpus plants exact dups (hamming 0): must be found
    assert any(h == 0 for _, _, h in got)
    with _pytest.raises(ValueError, match="64 % band_bits|multiple"):
        ldedup.simhash_pairs(sh, bits=128, band_bits=24)
    with _pytest.raises(ValueError, match="bits % 64"):
        ldedup.simhash_signatures(sh, bits=96)
    with _pytest.raises(ValueError, match="per-word"):
        ldedup.simhash_signatures(sh, bits=128, token_hash=F.md5)


def test_hll_sketch_matches_exact_at_fixture_scale(spark):
    """At fixture cardinality (<=150 distinct users/day) DataSketches
    HLL is still in exact list mode, so the sketch rollup must equal
    the exact COUNT(DISTINCT) twin row-for-row."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    sk = {tuple(r) for r in QUERIES["sketch_hll_daily_users"](spark, sf).collect()}
    ex = {tuple(r) for r in QUERIES["sketch_hll_exact_twin"](spark, sf).collect()}
    assert sk == ex


def test_hll_sketch_union_accuracy_at_scale(spark):
    """At 100k distinct (far past list mode) the estimate must stay
    within 5% relative error (3 sigma of
    HLL lgK=12's ~1.6% RSE), and unioning 32 per-partition sketches
    must agree with sketching the whole input directly — the property
    that makes stored sketches reaggregatable."""
    from pyspark.sql import functions as F

    n = 100_000
    df = spark.range(n)
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id", F.lit(12)))
    ).collect()[0][0]
    merged = (
        df.withColumn("p", F.col("id") % 32)
        .groupBy("p")
        .agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .collect()[0][0]
    )
    assert abs(direct - n) / n < 0.05
    assert abs(merged - n) / n < 0.05


def _mp4_two_track(did=6):
    nv, na = 3 + did % 5, 4 + did % 7
    vs = [
        bytes([(did * 3 + i * 17) % 256]) + b"\x01" * (49 + (did * 7 + i * 13) % 100)
        for i in range(nv)
    ]
    asmp = [
        bytes([(did * 11 + i * 19) % 256]) + b"\x02" * (19 + (did * 5 + i * 11) % 50)
        for i in range(na)
    ]
    return multimodal.encode_mp4_container(
        [
            {
                "handler": "vide",
                "codec": "avc1",
                "timescale": 1000,
                "sample_delta": 40,
                "samples": vs,
                "width": 32,
                "height": 16,
            },
            {
                "handler": "soun",
                "codec": "mp4a",
                "timescale": 48000,
                "sample_delta": 1024,
                "samples": asmp,
            },
        ]
    ), vs, asmp


def test_mp4_container_roundtrip():
    """ISO-BMFF demux is real end-to-end: two-track encode, box walk,
    per-track sample-table resolution, duration math, and first-byte
    checksum prove the resolved stco/stsz offsets point at the actual
    mdat payload bytes."""
    p, vs, asmp = _mp4_two_track()
    d = multimodal.parse_mp4_boxes(p)
    assert d["brand"] == "isom"
    v, a = d["tracks"]
    assert (v["track_id"], v["handler"], v["codec"]) == (1, "vide", "avc1")
    assert (v["width"], v["height"]) == (32, 16)
    assert v["n_samples"] == len(vs)
    assert v["sample_bytes"] == sum(len(s) for s in vs)
    assert v["duration"] == len(vs) * 40 and v["timescale"] == 1000
    assert v["first_byte_sum"] == sum(s[0] for s in vs)
    assert (a["track_id"], a["handler"], a["codec"]) == (2, "soun", "mp4a")
    assert a["n_samples"] == len(asmp)
    assert a["first_byte_sum"] == sum(s[0] for s in asmp)
    # dispatcher: demux-available stub message for frame decode
    with pytest.raises(NotImplementedError, match="parse_mp4_boxes"):
        multimodal.decode_video(p)
    # no ctts/elst: PTS degenerates to DTS, everything presented
    assert v["n_presented"] == len(vs) and v["n_reordered"] == 0
    assert v["pts_max"] == 40 * (len(vs) - 1)
    assert v["pts_sum"] == 40 * len(vs) * (len(vs) - 1) // 2


def test_mp4_ctts_elst_presentation_timing():
    """DTS -> CTS -> PTS through ctts + elst, v0 AND v1 boxes,
    negative composition offsets, lead-trim and empty edits — against
    hand-computed expectations from ISO 14496-12 §8.6."""

    def build(ctts_offsets, edits, **kw):
        return multimodal.encode_mp4_container(
            [
                {
                    "handler": "vide",
                    "codec": "avc1",
                    "timescale": 1000,
                    "sample_delta": 40,
                    "samples": [b"\x01" * 8] * 4,
                    "width": 16,
                    "height": 16,
                    "ctts_offsets": ctts_offsets,
                    "edits": edits,
                    **kw,
                }
            ]
        )

    # v0 ctts, no edits: classic IPBB order. DTS 0,40,80,120; offsets
    # +80,0,+40,0 -> CTS/PTS 80,40,120,120... use distinct: 80,40,120,160
    t = multimodal.parse_mp4_boxes(
        build([80, 0, 40, 40], None)
    )["tracks"][0]
    assert t["n_presented"] == 4 and t["n_reordered"] == 3
    assert (t["pts_min"], t["pts_max"]) == (40, 160)
    assert t["pts_sum"] == 80 + 40 + 120 + 160

    # v1 ctts (negative offsets) + to-end lead-trim edit: DTS 0..120,
    # offsets -40,+40,0,0 -> CTS -40,80,80,120; media_time 40 trims the
    # first sample; PTS = CTS - 40 for the rest
    t = multimodal.parse_mp4_boxes(
        build([-40, 40, 0, 0], [(0, 40)])
    )["tracks"][0]
    assert t["n_presented"] == 3 and t["n_reordered"] == 2
    assert (t["pts_min"], t["pts_max"], t["pts_sum"]) == (40, 80, 160)

    # empty edit (media_time -1) inserts leading presentation time:
    # 200ms gap then the whole track
    t = multimodal.parse_mp4_boxes(
        build(None, [(200, -1), (0, 0)])
    )["tracks"][0]
    assert (t["pts_min"], t["pts_max"]) == (200, 320)

    # v1 elst (64-bit entries) must parse identically
    t = multimodal.parse_mp4_boxes(
        build([-40, 40, 0, 0], [(0, 40)], elst_version=1)
    )["tracks"][0]
    assert (t["pts_min"], t["pts_max"], t["pts_sum"]) == (40, 80, 160)

    # bounded edit: present only media [40, 120) -> CTS 40,80 kept
    t = multimodal.parse_mp4_boxes(build(None, [(80, 40)]))["tracks"][0]
    assert t["n_presented"] == 2 and (t["pts_min"], t["pts_max"]) == (0, 40)

    # movie-timescale conversion: edit durations are in MOVIE units.
    # media_ts 1000 = movie_ts 1000 here, so a 3-entry list with two
    # empty edits accumulates exactly their sum
    t = multimodal.parse_mp4_boxes(
        build(None, [(100, -1), (100, -1), (0, 0)])
    )["tracks"][0]
    assert t["pts_min"] == 200

    # stss sync samples: 1-based indices; only PRESENTED keyframes
    # count, and an absent stss means every sample is sync (§8.6.2)
    t = multimodal.parse_mp4_boxes(
        build([-40, 40, 0, 0], [(0, 40)], sync_samples=[1, 3])
    )["tracks"][0]
    # sample 1 (cts -40) is trimmed by the edit; sample 3 (cts 80,
    # pts 40) survives — exactly one presented keyframe
    assert (t["n_sync"], t["pts_sum_sync"]) == (1, 40)
    t = multimodal.parse_mp4_boxes(build([80, 0, 40, 40], None))["tracks"][0]
    assert t["n_sync"] == 4 and t["pts_sum_sync"] == t["pts_sum"]
    with pytest.raises(ValueError, match="stss sample index"):
        build(None, None, sync_samples=[5])

    # MUST-reject paths
    with pytest.raises(NotImplementedError, match="dwell"):
        multimodal._apply_edit_list([0], [(100, 0, 0.0)], 1000, 1000)
    with pytest.raises(NotImplementedError, match="rate-scaled"):
        multimodal._apply_edit_list([0], [(100, 0, 2.0)], 1000, 1000)
    with pytest.raises(ValueError, match="zero-duration edit"):
        multimodal._apply_edit_list(
            [0], [(0, 0, 1.0), (100, 0, 1.0)], 1000, 1000
        )
    with pytest.raises(ValueError, match="ctts_offsets length"):
        build([1, 2], None)
    with pytest.raises(ValueError, match="negative ctts offsets"):
        build([-40, 0, 0, 0], None, ctts_version=0)
    # ctts/stts count mismatch on a hand-corrupted stream: drop one
    # sample from stsz/stts by patching counts is intricate — instead
    # corrupt the ctts run count directly
    import struct as _s

    p = build([80, 0, 40, 40], None)
    i = p.index(b"ctts")
    bad = bytearray(p)
    _s.pack_into(">I", bad, i + 8, 1)  # declare 1 run (1 sample) of 4
    with pytest.raises(ValueError, match="ctts/stts sample count"):
        multimodal.parse_mp4_boxes(bytes(bad))


def test_fmp4_trun_composition_offsets_and_tfdt():
    """Fragment PTS: per-sample trun composition offsets (v0 unsigned
    and v1 signed/negative) against tfdt decode anchors, continuing
    across fragments."""
    frags = [
        [(b"\x01" * 6, 40, 80), (b"\x02" * 6, 40, 0)],
        [(b"\x03" * 6, 40, 40), (b"\x04" * 6, 40, 0)],
    ]
    p = multimodal.encode_mp4_fragmented(
        [
            {
                "handler": "vide",
                "codec": "avc1",
                "timescale": 1000,
                "sample_delta": 40,
                "width": 16,
                "height": 16,
                "fragments": frags,
            }
        ]
    )
    t = multimodal.parse_mp4_boxes(p)["tracks"][0]
    # DTS 0,40 | 80,120 (tfdt anchors); CTS 80,40 | 120,120
    assert t["n_samples"] == 4 and t["n_reordered"] == 2
    assert (t["pts_min"], t["pts_max"]) == (40, 120)
    assert t["pts_sum"] == 80 + 40 + 120 + 120

    # v1 signed: a negative offset anywhere flips the whole track to
    # version-1 truns
    frags_neg = [[(b"\x01" * 6, 40, -40), (b"\x02" * 6, 40, 40)]]
    p2 = multimodal.encode_mp4_fragmented(
        [
            {
                "handler": "vide",
                "codec": "avc1",
                "timescale": 1000,
                "sample_delta": 40,
                "width": 16,
                "height": 16,
                "fragments": frags_neg,
            }
        ]
    )
    assert b"trun" in p2
    i = p2.index(b"trun")
    assert p2[i + 4] == 1  # version byte after the fourcc
    t2 = multimodal.parse_mp4_boxes(p2)["tracks"][0]
    assert (t2["pts_min"], t2["pts_max"]) == (-40, 80)

    # 2-tuples mixed with 3-tuples: missing offsets read as 0
    mixed = [[(b"\x01" * 6, 40), (b"\x02" * 6, 40, 80)]]
    t3 = multimodal.parse_mp4_boxes(
        multimodal.encode_mp4_fragmented(
            [
                {
                    "handler": "vide",
                    "codec": "avc1",
                    "timescale": 1000,
                    "sample_delta": 40,
                    "width": 16,
                    "height": 16,
                    "fragments": mixed,
                }
            ]
        )
    )["tracks"][0]
    assert (t3["pts_min"], t3["pts_max"]) == (0, 120) and t3["n_reordered"] == 1


def test_mp4_parser_paths_the_encoder_never_emits():
    """Golden, spec-built streams pinning decoder paths our encoder
    does not produce: 64-bit largesize boxes, co64 chunk offsets,
    uniform stsz, and multi-chunk/multi-run stsc expansion."""
    import struct

    box = multimodal._mp4_box
    full = multimodal._mp4_full

    def largesize(fourcc, payload):
        return (
            struct.pack(">I", 1) + fourcc + struct.pack(">Q", 16 + len(payload))
            + payload
        )

    # one video track: 5 uniform 3-byte samples over 3 chunks
    # (stsc runs: chunks 1-2 carry 2 samples each, chunk 3 carries 1)
    tkhd = full(
        b"tkhd", 0, 3,
        struct.pack(">IIII", 0, 0, 9, 0) + struct.pack(">II", 0, 0)
        + struct.pack(">IHHHH", 0, 0, 0, 0, 0) + multimodal._MP4_MATRIX
        + struct.pack(">II", 8 << 16, 4 << 16),
    )
    mdhd = full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 90000, 450, 0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"x\x00")
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + box(b"mp4v", b"\x00" * 78))
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, 5, 90))
    stsc = full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)  # chunks 1-2: 2 samples each
        + struct.pack(">III", 3, 1, 1),  # chunk 3: 1 sample
    )
    stsz = full(b"stsz", 0, 0, struct.pack(">II", 3, 5))  # uniform size 3
    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")

    # mdat: 3 chunks of samples, bytes chosen so checksum is checkable
    chunks = [b"\x0a__\x0b__", b"\x0c__\x0d__", b"\x0e__"]

    def build(co64=False):
        def stbl_with(offsets):
            co = (
                full(
                    b"co64", 0, 0,
                    struct.pack(">I", 3)
                    + b"".join(struct.pack(">Q", o) for o in offsets),
                )
                if co64
                else full(
                    b"stco", 0, 0,
                    struct.pack(">I", 3)
                    + b"".join(struct.pack(">I", o) for o in offsets),
                )
            )
            return box(b"stbl", stsd + stts + stsc + stsz + co)

        def moov_with(offsets):
            minf = box(b"minf", full(b"vmhd", 0, 1, b"\x00" * 8) + stbl_with(offsets))
            trak = box(b"trak", tkhd + box(b"mdia", mdhd + hdlr + minf))
            mvhd = full(
                b"mvhd", 0, 0,
                struct.pack(">IIII", 0, 0, 1000, 5)
                + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                + multimodal._MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
            )
            # moov as a LARGESIZE box — a real 64-bit-capable writer shape
            return largesize(b"moov", mvhd + trak)

        probe = moov_with([0, 0, 0])
        base = len(ftyp) + len(probe) + 8
        offs = [base, base + 6, base + 12]
        moov = moov_with(offs)
        assert len(moov) == len(probe)
        return ftyp + moov + box(b"mdat", b"".join(chunks))

    for co64 in (False, True):
        d = multimodal.parse_mp4_boxes(build(co64))
        (t,) = d["tracks"]
        assert t["n_samples"] == 5 and t["sample_bytes"] == 15
        assert t["codec"] == "mp4v" and (t["width"], t["height"]) == (8, 4)
        assert t["duration"] == 450 and t["timescale"] == 90000
        # samples at chunk offsets 0,3 / 0,3 / 0 -> first bytes 0a 0b 0c 0d 0e
        assert t["first_byte_sum"] == 0x0A + 0x0B + 0x0C + 0x0D + 0x0E


def test_mp4_corrupt_payloads_fail_cleanly():
    import struct

    p, _, _ = _mp4_two_track()
    with pytest.raises(ValueError, match="ftyp"):
        multimodal.parse_mp4_boxes(b"\x00\x00\x00\x08free" + p)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.parse_mp4_boxes(p[:-40])
    # mdat removed -> clean error
    mdat_at = p.index(b"mdat") - 4
    with pytest.raises(ValueError, match="no mdat"):
        multimodal.parse_mp4_boxes(p[:mdat_at])
    # an stco offset pushed past EOF -> span validation trips
    bad = bytearray(p)
    stco_at = p.index(b"stco") + 12
    struct.pack_into(">I", bad, stco_at, len(p))
    with pytest.raises(ValueError, match="outside the file"):
        multimodal.parse_mp4_boxes(bytes(bad))


def test_cms_overestimates_and_merges_linearly(spark):
    """Count-min invariants on the full fixture vocabulary (not just
    the oracle's top-20): (a) est >= exact for EVERY token — CMS can
    only overestimate; (b) mean overestimate within 4x the eps*N
    expectation for width=512; (c) merging two per-half sketches with
    cms_merge equals sketching the concatenated stream exactly —
    counts are linear, which is what lets per-source/per-day sketches
    roll up without re-scanning raw data."""
    from dynamodb_to_datalake_project_spark.llm import sketch as lsk
    from dynamodb_to_datalake_project_spark.llm.text import tokens as toks_fn

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(toks_fn(F.col("text"))).alias("token"))
    cms = lsk.cms_build(toks, "token", depth=4, width=512)
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("exact_cnt"))
    est = lsk.cms_estimate(cms, exact, "token", depth=4, width=512)
    rows = est.collect()
    assert rows and all(r.cms_est >= r.exact_cnt for r in rows)
    n_total = toks.count()
    mean_over = sum(r.cms_est - r.exact_cnt for r in rows) / len(rows)
    assert mean_over <= 4 * (2 * n_total / 512)
    # merge linearity: split the stream by row hash, sketch halves,
    # merge — must equal the direct sketch cell-for-cell
    h = toks.withColumn("half", (F.xxhash64("token") % 2 == 0).cast("int"))
    halves = [
        lsk.cms_build(h.filter(F.col("half") == i).drop("half"), "token")
        for i in (0, 1)
    ]
    merged = {
        (r.depth, r.bucket): r.cnt
        for r in lsk.cms_merge(halves[0].unionAll(halves[1])).collect()
    }
    direct = {(r.depth, r.bucket): r.cnt for r in cms.collect()}
    assert merged == direct


def test_mp3_frame_walk_roundtrip():
    """Encoder→parser agreement on a VBR stream with both tag kinds,
    plus the exact ISO 11172-3 frame-length arithmetic."""
    frames = [(1 + i % 14, i % 2, bytes([i * 7 % 256])) for i in range(12)]
    p = multimodal.encode_mp3_stream(frames, 0, id3v2=b"\x00" * 33, id3v1=True)
    d = multimodal.parse_mp3_frames(p)
    assert d["n_frames"] == 12
    assert d["sample_rate"] == 44100
    assert d["has_id3v2"] == 1
    assert d["frame_bytes"] == sum(
        144000 * multimodal._MP3_BITRATES[bi - 1] // 44100 + pad
        for bi, pad, _ in frames
    )
    assert d["first_byte_sum"] == sum(h[0] for _, _, h in frames)
    assert d["duration_ms"] == 12 * 1152 * 1000 // 44100
    assert d["padded_frames"] == sum(pad for _, pad, _ in frames)
    # bare CBR stream, no tags, each samplerate
    for sr_idx, sr in enumerate((44100, 48000, 32000)):
        d2 = multimodal.parse_mp3_frames(
            multimodal.encode_mp3_stream([(9, 0, b"\x05")] * 4, sr_idx)
        )
        assert d2["sample_rate"] == sr and d2["n_frames"] == 4
        assert d2["has_id3v2"] == 0


def test_mp3_corrupt_streams_fail_cleanly():
    """Every validation branch raises (quarantine behavior for a
    100 TB audio-ingest filter): lost sync, truncation, free-format
    and forbidden bitrates, reserved samplerate, mid-stream samplerate
    change, and a non-syncsafe ID3v2 size."""
    frames = [(5, 0, b"\x01")] * 3
    p = multimodal.encode_mp3_stream(frames, 1)
    bad = bytearray(p)
    bad[0] = 0x00
    with pytest.raises(ValueError, match="lost frame sync"):
        multimodal.parse_mp3_frames(bytes(bad))
    with pytest.raises(ValueError, match="past end"):
        multimodal.parse_mp3_frames(p[:-10])
    with pytest.raises(ValueError, match="free-format"):
        multimodal.parse_mp3_frames(bytes((0xFF, 0xFB, 0x04, 0x40)) + b"\x00" * 100)
    with pytest.raises(ValueError, match="forbidden bitrate"):
        multimodal.parse_mp3_frames(bytes((0xFF, 0xFB, 0xF4, 0x40)) + b"\x00" * 100)
    with pytest.raises(ValueError, match="reserved samplerate"):
        multimodal.parse_mp3_frames(bytes((0xFF, 0xFB, 0x1C, 0x40)) + b"\x00" * 100)
    two_rates = multimodal.encode_mp3_stream(
        [(5, 0, b"\x01")], 0
    ) + multimodal.encode_mp3_stream([(5, 0, b"\x01")], 1)
    with pytest.raises(ValueError, match="samplerate changes"):
        multimodal.parse_mp3_frames(two_rates)
    with pytest.raises(ValueError, match="non-syncsafe"):
        multimodal.parse_mp3_frames(
            b"ID3" + bytes((3, 0, 0)) + b"\xff\x00\x00\x00" + p
        )
    with pytest.raises(ValueError, match="no frames"):
        multimodal.parse_mp3_frames(b"ID3" + bytes((3, 0, 0)) + multimodal._syncsafe(0))


def _ogg_page(htype, granule, serial, seq, lacing, body):
    import struct

    page = bytearray(
        b"OggS"
        + bytes((0, htype))
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + b"\x00\x00\x00\x00"
        + bytes([len(lacing)])
        + bytes(lacing)
        + body
    )
    struct.pack_into("<I", page, 22, multimodal.ogg_crc(bytes(page)))
    return bytes(page)


def test_ogg_roundtrip_and_cross_page_continuation():
    """Encoder→parser agreement (multi-lacing packets, exact-255
    terminating-zero lacing), plus a hand-built stream exercising the
    one path the encoder never emits: a packet continuing across a
    page boundary via the continuation flag."""
    pages = [[b"\x07" * 300, b"\x09" * 255], [b"\x0b" * 10]]
    p = multimodal.encode_ogg_stream(pages, 42, [100, 200])
    d = multimodal.parse_ogg_pages(p)
    assert d == {
        "n_pages": 2,
        "n_packets": 3,
        "payload_bytes": 565,
        "last_granule": 200,
        "serial": 42,
        "first_byte_sum": 0x07 + 0x09 + 0x0B,
        "bos_eos_ok": 1,
        "first_packet": b"\x07" * 300,
        "second_packet": b"\x09" * 255,
    }
    # cross-page packet: page 0 ends mid-packet (lacing 255), page 1
    # carries the continuation flag and terminates it
    cont = _ogg_page(0x02, -1, 7, 0, [255], b"\x21" * 255) + _ogg_page(
        0x05, 50, 7, 1, [10], b"\x22" * 10
    )
    d2 = multimodal.parse_ogg_pages(cont)
    assert d2["n_packets"] == 1 and d2["n_pages"] == 2
    assert d2["payload_bytes"] == 265 and d2["first_byte_sum"] == 0x21
    assert d2["bos_eos_ok"] == 1 and d2["last_granule"] == 50
    # first-packet reassembly must cross the page boundary too
    assert d2["first_packet"] == b"\x21" * 255 + b"\x22" * 10


def test_ogg_id_header_goldens_and_validation():
    """Spec-built goldens for the Vorbis/Opus identification headers
    (hand-packed from Vorbis I §4.2.2 / RFC 7845 §5.1 field layouts —
    the exact bytes libvorbis/opusenc emit), plus every MUST-validate
    rejection path."""
    import struct

    # golden OpusHead: 48 kHz stereo, pre-skip 312, gain 0, family 0 —
    # the header opusenc writes for a default stereo encode
    golden_opus = b"OpusHead" + bytes(
        [1, 2, 0x38, 0x01, 0x80, 0xBB, 0x00, 0x00, 0x00, 0x00, 0]
    )
    d = multimodal.parse_opus_id_header(golden_opus)
    assert (d["codec"], d["sample_rate"], d["channels"], d["pre_skip"]) == (
        "opus", 48000, 2, 312,
    )
    assert multimodal.encode_opus_id_header(2, 312, 48000) == golden_opus

    # golden Vorbis ID: 44.1 kHz mono, nominal 128 kbps, blocksizes
    # 256/2048 -> exponent byte (11<<4)|8 = 0xB8, framing byte 0x01
    golden_vorbis = (
        b"\x01vorbis"
        + struct.pack("<IBIiii", 0, 1, 44100, 0, 128000, 0)
        + b"\xb8\x01"
    )
    d = multimodal.parse_vorbis_id_header(golden_vorbis)
    assert (d["codec"], d["sample_rate"], d["channels"]) == ("vorbis", 44100, 1)
    assert (d["bitrate_nominal"], d["blocksize_0"], d["blocksize_1"]) == (
        128000, 256, 2048,
    )
    assert multimodal.encode_vorbis_id_header(44100, 1, 128000) == golden_vorbis

    # dispatch sniff
    assert multimodal.identify_ogg_codec(golden_opus)["codec"] == "opus"
    assert multimodal.identify_ogg_codec(golden_vorbis)["codec"] == "vorbis"
    with pytest.raises(ValueError, match="not a known identification"):
        multimodal.identify_ogg_codec(b"\x02vorbis" + b"\x00" * 23)

    # Vorbis MUST-rejects: version, zero rate/channels, unordered or
    # out-of-range blocksizes, framing bit
    bad = bytearray(golden_vorbis)
    bad[7] = 1  # version
    with pytest.raises(ValueError, match="version"):
        multimodal.parse_vorbis_id_header(bytes(bad))
    bad = bytearray(golden_vorbis)
    bad[11] = 0  # channels
    with pytest.raises(ValueError, match="zero channels"):
        multimodal.parse_vorbis_id_header(bytes(bad))
    bad = bytearray(golden_vorbis)
    bad[28] = (8 << 4) | 11  # bs0 > bs1
    with pytest.raises(ValueError, match="illegal blocksizes"):
        multimodal.parse_vorbis_id_header(bytes(bad))
    bad = bytearray(golden_vorbis)
    bad[28] = (11 << 4) | 3  # 2^3 < 64
    with pytest.raises(ValueError, match="illegal blocksizes"):
        multimodal.parse_vorbis_id_header(bytes(bad))
    bad = bytearray(golden_vorbis)
    bad[29] = 0
    with pytest.raises(ValueError, match="framing bit"):
        multimodal.parse_vorbis_id_header(bytes(bad))

    # Opus MUST-rejects: incompatible major version, surround family
    # (honest NotImplementedError), channel bounds, truncation
    bad = bytearray(golden_opus)
    bad[8] = 0x10
    with pytest.raises(ValueError, match="incompatible version"):
        multimodal.parse_opus_id_header(bytes(bad))
    bad = bytearray(golden_opus)
    bad[18] = 1
    with pytest.raises(NotImplementedError, match="family 1"):
        multimodal.parse_opus_id_header(bytes(bad))
    bad = bytearray(golden_opus)
    bad[9] = 3
    with pytest.raises(ValueError, match="1-2 channels"):
        multimodal.parse_opus_id_header(bytes(bad))
    with pytest.raises(ValueError, match="not an identification"):
        multimodal.parse_opus_id_header(golden_opus[:10])
    with pytest.raises(NotImplementedError, match="surround"):
        multimodal.encode_opus_id_header(6, 312)

    # end-to-end: ID header alone on the BOS page (both specs REQUIRE
    # this), identified through the full demux path
    stream = multimodal.encode_ogg_stream(
        [[golden_opus], [b"\xfc" * 40]], 9, [0, 960]
    )
    parsed = multimodal.parse_ogg_pages(stream)
    ident = multimodal.identify_ogg_codec(parsed["first_packet"])
    assert ident["pre_skip"] == 312 and parsed["n_packets"] == 2


def test_ogg_comment_headers_golden_and_validation():
    """Spec-built comment/tags headers (RFC 7845 §5.2 / Vorbis I §5):
    hand-packed golden bytes, key-case normalization, multi-'=' values,
    and every truncation/validation rejection path."""
    import struct

    # golden OpusTags: vendor 'libopus', TITLE=x — byte-for-byte
    golden = (
        b"OpusTags"
        + struct.pack("<I", 7) + b"libopus"
        + struct.pack("<I", 1)
        + struct.pack("<I", 7) + b"TITLE=x"
    )
    d = multimodal.parse_ogg_comments(golden)
    assert d == {"vendor": "libopus", "n_comments": 1,
                 "comments": [("TITLE", "x")]}
    assert multimodal.encode_opus_tags("libopus", [("TITLE", "x")]) == golden

    # vorbis variant carries the framing bit; keys normalize to upper,
    # values keep '=' after the first
    vc = multimodal.encode_vorbis_comment_header(
        "xiph", [("title", "a=b"), ("Language", "en")]
    )
    d = multimodal.parse_ogg_comments(vc)
    assert d["comments"] == [("TITLE", "a=b"), ("LANGUAGE", "en")]

    with pytest.raises(ValueError, match="framing bit"):
        multimodal.parse_ogg_comments(vc[:-1] + b"\x00")
    with pytest.raises(ValueError, match="not a comment"):
        multimodal.parse_ogg_comments(b"OpusHead" + b"\x00" * 12)
    with pytest.raises(ValueError, match="vendor string overruns"):
        multimodal.parse_ogg_comments(
            b"OpusTags" + struct.pack("<I", 99) + b"short"
        )
    with pytest.raises(ValueError, match="comment list truncated"):
        multimodal.parse_ogg_comments(
            b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 2)
            + struct.pack("<I", 3) + b"A=b"
        )
    with pytest.raises(ValueError, match="field overruns"):
        multimodal.parse_ogg_comments(
            b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 1)
            + struct.pack("<I", 99) + b"A=b"
        )
    with pytest.raises(ValueError, match="without '='"):
        multimodal.parse_ogg_comments(
            b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 1)
            + struct.pack("<I", 3) + b"abc"
        )

    # full conformant stream: OpusHead page, OpusTags page, audio —
    # second-packet reassembly across a lacing boundary (tags > 255 B)
    tags = multimodal.encode_opus_tags(
        "v", [("TITLE", "t" * 300)]
    )
    stream = multimodal.encode_ogg_stream(
        [[multimodal.encode_opus_id_header(2, 312)], [tags], [b"\xaa" * 30]],
        5,
        [0, 0, 960],
    )
    parsed = multimodal.parse_ogg_pages(stream)
    got = multimodal.parse_ogg_comments(parsed["second_packet"])
    assert got["comments"][0][1] == "t" * 300


def test_ogg_corrupt_streams_fail_cleanly():
    """CRC verification must reject ANY payload byte flip; sequence
    gaps, serial changes, bad capture, missing continuation flags,
    truncation, and mid-packet stream end all raise."""
    p = multimodal.encode_ogg_stream([[b"\x07" * 30], [b"\x09" * 20]], 5, [1, 2])
    bad = bytearray(p)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        multimodal.parse_ogg_pages(bytes(bad))
    with pytest.raises(ValueError, match="lost capture"):
        multimodal.parse_ogg_pages(b"XXXX" + p[4:])
    with pytest.raises(ValueError, match="past end"):
        multimodal.parse_ogg_pages(p[:-5])
    gap = _ogg_page(0x02, 1, 5, 0, [3], b"abc") + _ogg_page(
        0x04, 2, 5, 2, [3], b"def"
    )
    with pytest.raises(ValueError, match="sequence gap"):
        multimodal.parse_ogg_pages(gap)
    two_serials = _ogg_page(0x02, 1, 5, 0, [3], b"abc") + _ogg_page(
        0x04, 2, 6, 1, [3], b"def"
    )
    with pytest.raises(ValueError, match="serial changes"):
        multimodal.parse_ogg_pages(two_serials)
    no_cont_flag = _ogg_page(0x02, -1, 7, 0, [255], b"\x21" * 255) + _ogg_page(
        0x04, 50, 7, 1, [10], b"\x22" * 10
    )
    with pytest.raises(ValueError, match="continuation flag"):
        multimodal.parse_ogg_pages(no_cont_flag)
    with pytest.raises(ValueError, match="mid-packet"):
        multimodal.parse_ogg_pages(_ogg_page(0x06, -1, 7, 0, [255], b"\x21" * 255))
    with pytest.raises(ValueError, match="version"):
        v = bytearray(_ogg_page(0x06, 1, 5, 0, [3], b"abc"))
        v[4] = 9
        multimodal.parse_ogg_pages(bytes(v))
    with pytest.raises(ValueError, match="no pages"):
        multimodal.parse_ogg_pages(b"")


def _fmp4_two_frag(did=5):
    def vs(f):
        nv = 1 + (did + f) % 3
        return [
            (
                bytes([(did * 3 + f * 17 + i * 19) % 256]) + b"\x01" * 30,
                30 + i,
            )
            for i in range(nv)
        ]

    return multimodal.encode_mp4_fragmented(
        [
            {
                "handler": "vide",
                "codec": "avc1",
                "timescale": 1000,
                "sample_delta": 40,
                "width": 32,
                "height": 16,
                "fragments": [vs(0), vs(1)],
            },
            {
                "handler": "soun",
                "codec": "mp4a",
                "timescale": 48000,
                "sample_delta": 1024,
                "fragments": [
                    [(b"\x09" * 10, 1024)],
                    [(b"\x0a" * 12, 1024), (b"\x0b" * 8, 1024)],
                ],
            },
        ]
    )


def test_fmp4_roundtrip():
    """Fragment demux totals: trun sizes/durations accumulate across
    moofs, per-sample first bytes prove default-base-is-moof offset
    resolution lands inside the right mdat."""
    d = multimodal.parse_mp4_boxes(_fmp4_two_frag())
    v, a = d["tracks"]
    nv0, nv1 = 1 + 5 % 3, 1 + 6 % 3
    assert v["n_samples"] == nv0 + nv1
    assert v["sample_bytes"] == 31 * (nv0 + nv1)
    assert v["duration"] == sum(30 + i for i in range(nv0)) + sum(
        30 + i for i in range(nv1)
    )
    assert v["first_byte_sum"] == sum(
        (5 * 3 + f * 17 + i * 19) % 256
        for f, n in ((0, nv0), (1, nv1))
        for i in range(n)
    )
    assert (v["width"], v["height"], v["codec"]) == (32, 16, "avc1")
    assert a["n_samples"] == 3 and a["sample_bytes"] == 30
    assert a["duration"] == 3 * 1024 and a["first_byte_sum"] == 0x09 + 0x0A + 0x0B


def _frag_stream(tfhd_flags, tfhd_extra, trun_flags, trun_body, trex_dur=0, trex_size=0):
    """Hand-build a minimal one-track fMP4 exercising parser paths the
    encoder never emits (tfhd/trex defaults, base-data-offset)."""
    import struct

    m = multimodal
    p = _fmp4_two_frag()
    # reuse a real ftyp+moov (track 1 video) but hand-roll the fragment
    moov_end = p.index(b"moof") - 4  # index points at the fourcc
    head = bytearray(p[:moov_end])
    if trex_dur or trex_size:
        # patch trex (track 1) defaults in place: [tid, sdi, dur, size, flags]
        i = head.index(b"trex") + 8
        struct.pack_into(">II", head, i + 8, trex_dur, trex_size)
    tfhd = m._mp4_full(b"tfhd", 0, tfhd_flags, struct.pack(">I", 1) + tfhd_extra)
    trun = m._mp4_full(b"trun", 0, trun_flags, trun_body)
    moof = m._mp4_box(
        b"moof",
        m._mp4_full(b"mfhd", 0, 0, struct.pack(">I", 1))
        + m._mp4_box(b"traf", tfhd + trun),
    )
    return bytes(head), moof


def test_fmp4_default_resolution_paths():
    """trun > tfhd > trex default resolution, plus explicit
    base-data-offset addressing — none of which the encoder emits."""
    import struct

    m = multimodal
    # (a) sizes/durations entirely from TFHD defaults (trun carries
    # only count + data_offset)
    head, moof = _frag_stream(
        0x020000 | 0x8 | 0x10,  # default-base-is-moof + both defaults
        struct.pack(">II", 100, 7),  # default dur, size
        0x1,
        struct.pack(">Ii", 3, 0),  # 3 samples, offset resolved below
    )
    # data offset -> first byte after moof+mdat header
    moof = bytearray(moof)
    doff_at = moof.index(b"trun") + 12
    struct.pack_into(">i", moof, doff_at, len(moof) + 8)
    p = head + bytes(moof) + m._mp4_box(b"mdat", b"\x21\x00\x00\x00\x00\x00\x00" * 3)
    t = m.parse_mp4_boxes(p)["tracks"][0]
    assert (t["n_samples"], t["sample_bytes"], t["duration"]) == (3, 21, 300)
    assert t["first_byte_sum"] == 3 * 0x21
    # (b) sizes/durations from TREX when tfhd has none
    head2, moof2 = _frag_stream(
        0x020000, b"", 0x1, struct.pack(">Ii", 2, 0), trex_dur=50, trex_size=5
    )
    moof2 = bytearray(moof2)
    struct.pack_into(">i", moof2, moof2.index(b"trun") + 12, len(moof2) + 8)
    p2 = head2 + bytes(moof2) + m._mp4_box(b"mdat", b"\x31\x00\x00\x00\x00" * 2)
    t2 = m.parse_mp4_boxes(p2)["tracks"][0]
    assert (t2["n_samples"], t2["sample_bytes"], t2["duration"]) == (2, 10, 100)
    # (c) explicit base-data-offset (absolute file addressing)
    head3, moof3 = _frag_stream(
        0x1 | 0x8 | 0x10,
        struct.pack(">QII", 0, 60, 4),  # base patched below
        0x1,
        struct.pack(">Ii", 1, 0),
    )
    moof3 = bytearray(moof3)
    base_at = moof3.index(b"tfhd") + 12  # payload at +8, base at +12
    mdat_body = len(head3) + len(moof3) + 8
    struct.pack_into(">Q", moof3, base_at, mdat_body)
    struct.pack_into(">i", moof3, moof3.index(b"trun") + 12, 0)
    p3 = head3 + bytes(moof3) + m._mp4_box(b"mdat", b"\x41\x00\x00\x00")
    t3 = m.parse_mp4_boxes(p3)["tracks"][0]
    assert (t3["n_samples"], t3["first_byte_sum"], t3["duration"]) == (1, 0x41, 60)


def test_fmp4_corrupt_fragments_fail_cleanly():
    import struct

    import pytest as _pt

    m = multimodal
    p = _fmp4_two_frag()
    # fragment sequence gap: bump the second mfhd
    bad = bytearray(p)
    i = bad.index(b"mfhd", bad.index(b"mfhd") + 4) + 8  # seq at payload start
    struct.pack_into(">I", bad, i, 9)
    with _pt.raises(ValueError, match="fragment sequence gap"):
        m.parse_mp4_boxes(bytes(bad))
    # moof referencing an unknown track id
    bad2 = bytearray(p)
    j = bad2.index(b"tfhd") + 8  # track_id at payload start
    struct.pack_into(">I", bad2, j, 77)
    with _pt.raises(ValueError, match="unknown track"):
        m.parse_mp4_boxes(bytes(bad2))
    # trun span walking past the end of the file
    bad3 = bytearray(p)
    k = bad3.index(b"trun") + 16  # first (dur, size) entry: size field
    struct.pack_into(">I", bad3, k + 4, 1 << 24)
    with _pt.raises(ValueError, match="outside the file"):
        m.parse_mp4_boxes(bytes(bad3))
    # trun without a data offset is ambiguous
    head4, moof4 = _frag_stream(0x020000, b"", 0x300, struct.pack(">I", 1) + struct.pack(">II", 10, 4))
    with _pt.raises(ValueError, match="without data-offset"):
        m.parse_mp4_boxes(head4 + moof4 + m._mp4_box(b"mdat", b"\x00" * 4))
    # no size at ANY default level
    head5, moof5 = _frag_stream(0x020000 | 0x8, struct.pack(">I", 10), 0x1, struct.pack(">Ii", 1, 0))
    with _pt.raises(ValueError, match="no size/duration at any"):
        m.parse_mp4_boxes(head5 + moof5 + m._mp4_box(b"mdat", b"\x00" * 4))
    # traf missing tfhd entirely
    tr = m._mp4_full(b"trun", 0, 0x301, struct.pack(">Ii", 0, 0))
    moof6 = m._mp4_box(
        b"moof",
        m._mp4_full(b"mfhd", 0, 0, struct.pack(">I", 1)) + m._mp4_box(b"traf", tr),
    )
    head6 = _fmp4_two_frag()[: _fmp4_two_frag().index(b"moof") - 4]
    with _pt.raises(ValueError, match="traf without tfhd"):
        m.parse_mp4_boxes(head6 + moof6 + m._mp4_box(b"mdat", b""))


def test_webm_roundtrip_and_unknown_size():
    """EBML encoder→parser agreement, wide-VINT track numbers (127
    must widen to a 2-byte VINT because all-ones is reserved), and
    the live-stream idiom the encoder never emits: an unknown-size
    master element running to its parent's end."""
    from dynamodb_to_datalake_project_spark.llm import ebml

    clusters = [
        {"timestamp": 0, "blocks": [(1, 0, b"\x11" * 20), (127, 5, b"\x22" * 7)]},
        {"timestamp": 100, "blocks": [(1, 0, b"\x33" * 30)]},
    ]
    p = ebml.encode_webm(
        [
            {"number": 1, "type": 1, "codec": "V_VP9", "width": 64, "height": 48},
            {"number": 127, "type": 2, "codec": "A_OPUS", "rate": 48000},
        ],
        clusters,
    )
    d = ebml.parse_webm(p)
    assert d["doctype"] == "webm" and d["n_clusters"] == 2
    v, a = d["tracks"]
    assert (v["n_blocks"], v["frame_bytes"], v["first_byte_sum"]) == (2, 50, 0x11 + 0x33)
    assert (v["width"], v["height"], v["codec"]) == (64, 48, "V_VP9")
    assert (a["number"], a["n_blocks"], a["frame_bytes"]) == (127, 1, 7)
    assert a["rate"] == 48000 and d["duration_ms"] == 200
    # unknown-size Segment: patch the Segment size VINT to all-ones
    # (the Segment here uses an N-byte size VINT; replace with same-
    # width all-ones so offsets don't shift)
    seg_id = bytes.fromhex("18538067")
    i = p.index(seg_id) + 4
    first = p[i]
    n = 8 - first.bit_length() + 1
    p2 = p[:i] + bytes([first | 0x7F]) + b"\xff" * (n - 1) + p[i + n :]
    d2 = ebml.parse_webm(p2)
    assert d2["tracks"][0]["frame_bytes"] == 50 and d2["n_clusters"] == 2


def test_webm_corrupt_streams_fail_cleanly():
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import ebml

    p = ebml.encode_webm(
        [{"number": 1, "type": 1, "codec": "V_VP9", "width": 16, "height": 16}],
        [{"timestamp": 0, "blocks": [(1, 0, b"\x44" * 10)]}],
    )
    # zero lead byte = invalid VINT
    with _pt.raises(ValueError, match="zero lead byte"):
        ebml.parse_webm(p[:4] + b"\x00" + p[5:])
    # truncation mid-element
    with _pt.raises(ValueError, match="overruns|truncated"):
        ebml.parse_webm(p[:-4])
    # wrong doctype
    with _pt.raises(ValueError, match="not webm"):
        ebml.parse_webm(p.replace(b"webm", b"mkv3", 1))
    # block referencing an undeclared track
    i = p.index(b"\xa3\x8e\x81")  # SimpleBlock id + size(14) + track-1 VINT
    bad = bytearray(p)
    bad[i + 2] = 0x85  # track VINT 1 -> 5
    with _pt.raises(ValueError, match="undeclared track"):
        ebml.parse_webm(bytes(bad))
    # unknown-size on a NON-master element is illegal
    j = p.index(b"\xe7\x81\x00")  # cluster Timestamp (uint, 1-byte size)
    bad2 = bytearray(p)
    bad2[j + 1] = 0xFF
    with _pt.raises(ValueError, match="unknown-size non-master"):
        ebml.parse_webm(bytes(bad2))


def test_mpegts_roundtrip_and_packet_math():
    """TS mux→demux agreement: PES-header-net byte accounting, the
    ceil-divide packet count, PAT→PMT registry, and stream typing."""
    from dynamodb_to_datalake_project_spark.llm import mpegts

    v_pes = [b"\x10" + b"\x00" * 400, b"\x20" + b"\x00" * 175]  # 2nd fits one pkt
    a_pes = [b"\x30" + b"\x00" * 50]
    d = mpegts.parse_mpegts(
        mpegts.encode_mpegts(
            [
                {"pid": 0x100, "stream_type": 0x1B, "stream_id": 0xE0, "pes": v_pes},
                {"pid": 0x101, "stream_type": 0x0F, "stream_id": 0xC0, "pes": a_pes},
            ]
        )
    )
    assert d["programs"] == {1: 0x1000}
    v, a = d["streams"]
    assert (v["pid"], v["stream_type"], v["n_pes"]) == (0x100, 0x1B, 2)
    assert v["es_bytes"] == 401 + 176
    assert v["ts_packets"] == (9 + 401 + 183) // 184 + (9 + 176 + 183) // 184
    assert v["first_byte_sum"] == 0x10 + 0x20
    assert (a["n_pes"], a["es_bytes"], a["ts_packets"]) == (1, 51, 1)


def test_mpegts_corrupt_streams_fail_cleanly():
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import mpegts

    streams = [
        {"pid": 0x100, "stream_type": 0x1B, "stream_id": 0xE0, "pes": [b"\x10" * 500]}
    ]
    p = mpegts.encode_mpegts(streams)
    assert len(p) == 5 * 188  # PAT, PMT, 3 ES packets
    with _pt.raises(ValueError, match="multiple of 188"):
        mpegts.parse_mpegts(p[:-10])
    with _pt.raises(ValueError, match="lost sync"):
        mpegts.parse_mpegts(b"\x00" + p[1:])
    # drop the MIDDLE ES packet: continuity gap on that PID (dropping
    # the first would legitimately parse — mid-stream tune-in)
    with _pt.raises(ValueError, match="continuity gap"):
        mpegts.parse_mpegts(p[:564] + p[752:])
    # flip a PAT section byte (the payload rides at the packet TAIL,
    # after adaptation stuffing): PSI CRC must catch it
    bad = bytearray(p)
    bad[187] ^= 0x01
    with _pt.raises(ValueError, match="CRC mismatch"):
        mpegts.parse_mpegts(bytes(bad))
    # retarget an ES packet to an undeclared PID
    bad2 = bytearray(p)
    import struct as _s

    _s.pack_into(">H", bad2, 376 + 1, 0x4000 | 0x555)
    with _pt.raises(ValueError, match="undeclared PID|continuity"):
        mpegts.parse_mpegts(bytes(bad2))
    # corrupt the PES start code in the first ES packet
    bad3 = bytearray(p)
    bad3[376 + 4] = 0xFF
    with _pt.raises(ValueError, match="PES start code"):
        mpegts.parse_mpegts(bytes(bad3))
    # inflate the PAT's declared section_length past the packet payload:
    # must be rejected as an overrun, not silently clamped (ADVICE r6).
    # The PAT rides at the tail of packet 0 after adaptation stuffing;
    # locate its pointer_field + table_id + length-field prefix.
    i = p.index(b"\x00\x00\xb0", 4, 188) + 2  # -> the 0xB0 length-hi byte
    bad4 = bytearray(p)
    bad4[i + 1] = 0xFF  # section_length low byte -> way past the payload
    with _pt.raises(ValueError, match="overruns"):
        mpegts.parse_mpegts(bytes(bad4))


def test_mpegts_psi_section_length_is_spec_exact():
    """ISO 13818-1 §2.4.4.3: section_length counts the bytes after the
    length field itself — the 5 generic header bytes ARE part of the
    body and must not be double-counted (ADVICE r6: PAT with one
    program entry declares 13, not 18)."""
    import struct as _s

    from dynamodb_to_datalake_project_spark.llm import mpegts

    pat_body = _s.pack(">HBBB", 1, 0xC1, 0, 0) + _s.pack(">HH", 1, 0xE000 | 0x1000)
    sec = mpegts._psi_section(0x00, pat_body)
    sl = _s.unpack_from(">H", sec, 1)[0] & 0x0FFF
    assert sl == len(pat_body) + 4 == 13
    # total section bytes = 3-byte header + declared length, exactly
    assert len(sec) == 3 + sl
    assert mpegts.mpeg_crc32(sec[:-4]) == _s.unpack(">I", sec[-4:])[0]


def test_id3v2_goldens_and_validation():
    """ID3v2 text-frame parse: hand-built v2.3 (plain frame sizes) and
    v2.4 (syncsafe) tags, all three text encodings, padding stop,
    non-text-frame skip, and the rejection paths."""
    import struct

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    body = m.encode_id3v2_frames([("TIT2", "hello"), ("TLAN", "en")])
    tag = b"ID3" + bytes((3, 0, 0)) + m._syncsafe(len(body)) + body
    d = m.parse_id3v2(tag + b"\xff\xfb")  # audio may follow
    assert d == {"version": 3, "frames": [("TIT2", "hello"), ("TLAN", "en")]}

    # v2.4: syncsafe frame sizes — a v2.3-style plain size > 0x7F in
    # any byte would be rejected
    body4 = m.encode_id3v2_frames([("TIT2", "x" * 200)], version=4)
    tag4 = b"ID3" + bytes((4, 0, 0)) + m._syncsafe(len(body4)) + body4
    assert m.parse_id3v2(tag4)["frames"] == [("TIT2", "x" * 200)]

    # latin-1 and UTF-16-with-BOM encodings, trailing NUL stripped
    f_l1 = b"TALB" + struct.pack(">I", 5) + b"\x00\x00" + b"\x00ab\xe9\x00"
    f_u16 = (
        b"TPE1"
        + struct.pack(">I", 1 + len("hi".encode("utf-16")))
        + b"\x00\x00"
        + b"\x01"
        + "hi".encode("utf-16")
    )
    # a non-text frame (APIC) that must be SKIPPED by size, then padding
    f_apic = b"APIC" + struct.pack(">I", 3) + b"\x00\x00" + b"\x01\x02\x03"
    body = f_apic + f_l1 + f_u16 + b"\x00" * 8
    tag = b"ID3" + bytes((3, 0, 0)) + m._syncsafe(len(body)) + body
    assert m.parse_id3v2(tag)["frames"] == [("TALB", "ab\xe9"), ("TPE1", "hi")]

    import pytest as _pt

    with _pt.raises(ValueError, match="no ID3v2 tag"):
        m.parse_id3v2(b"\xff\xfb\x90\x40")
    with _pt.raises(ValueError, match="unsupported ID3v2.2"):
        m.parse_id3v2(b"ID3" + bytes((2, 0, 0)) + m._syncsafe(0))
    with _pt.raises(ValueError, match="overruns the tag"):
        bad = b"TIT2" + struct.pack(">I", 99) + b"\x00\x00" + b"\x03x"
        m.parse_id3v2(b"ID3" + bytes((3, 0, 0)) + m._syncsafe(len(bad)) + bad)
    with _pt.raises(ValueError, match="unknown text encoding"):
        bad = b"TIT2" + struct.pack(">I", 2) + b"\x00\x00" + b"\x07x"
        m.parse_id3v2(b"ID3" + bytes((3, 0, 0)) + m._syncsafe(len(bad)) + bad)
    with _pt.raises(ValueError, match="tag size overruns"):
        m.parse_id3v2(b"ID3" + bytes((3, 0, 0)) + m._syncsafe(999))


def test_hll_overlap_equals_exact_at_fixture_scale(spark):
    """At fixture cardinality HLL stays in exact list mode, so the
    sketch-algebra overlap must equal the exact twin row-for-row —
    including the inclusion-exclusion intersection."""
    from dynamodb_to_datalake_project_spark.catalog import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    sk = {tuple(r) for r in QUERIES["sketch_hll_overlap"](spark, sf).collect()}
    ex = {tuple(r) for r in QUERIES["sketch_hll_overlap_exact"](spark, sf).collect()}
    assert sk == ex and len(sk) == 10  # C(5,2) event-type pairs


def test_quantile_grid_accuracy_and_merge(spark):
    """Grid-sketch invariants: (a) every read is within one bucket
    width of the exact quantile; (b) merging per-half grids by SUM
    equals the direct grid cell-for-cell; (c) out-of-range values
    clamp to edge buckets instead of growing state."""
    from dynamodb_to_datalake_project_spark.llm import sketch as lsk

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lo, hi, nb = 0.0, 1000.0, 256
    width = (hi - lo) / nb
    grid = lsk.quantile_grid_build(ev, "value", lo, hi, nb)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {r.q: r.est for r in lsk.quantile_grid_read(grid, qs, lo, hi, nb).collect()}
    exact = ev.selectExpr(
        *[f"percentile(value, {q}) AS q{i}" for i, q in enumerate(qs)]
    ).collect()[0]
    for i, q in enumerate(qs):
        assert abs(got[q] - exact[i]) <= width + 1e-9, (q, got[q], exact[i])
    # merge = direct
    h = ev.withColumn("half", (F.xxhash64("event_id") % 2 == 0).cast("int"))
    halves = [
        lsk.quantile_grid_build(h.filter(F.col("half") == i), "value", lo, hi, nb)
        for i in (0, 1)
    ]
    merged = {
        (r.bucket,): r.cnt
        for r in lsk.cms_merge(
            halves[0].unionAll(halves[1]).withColumnRenamed("bucket", "depth")
            .withColumn("bucket", F.lit(0))
        ).select(F.col("depth").alias("bucket"), "cnt").collect()
    }
    direct = {(r.bucket,): r.cnt for r in grid.collect()}
    assert merged == direct
    # clamping: a value far outside the range lands in the last bucket
    wild = spark.createDataFrame([(1e9,), (-5.0,)], ["value"])
    rows = {r.bucket: r.cnt for r in lsk.quantile_grid_build(wild, "value", lo, hi, nb).collect()}
    assert rows == {nb - 1: 1, 0: 1}


def test_linear_fit_recovers_known_line(spark):
    """OLS on exact synthetic data: y = 3x + 7 (in 2-dp units) must
    recover slope 3, intercept 7, r2 = 1 exactly; a constant-y group
    reports slope 0 with NULL r2 (degenerate variance -> NULL, never
    an ANSI divide-by-zero)."""
    from dynamodb_to_datalake_project_spark.audit import linear_fit

    rows = [("a", float(x), 3.0 * x + 7.0) for x in range(1, 30)] + [
        ("b", float(x), 42.0) for x in range(1, 30)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.g: r for r in linear_fit(df, "x", "y", ["g"]).collect()}
    assert abs(got["a"].slope - 3.0) < 1e-9
    assert abs(got["a"].intercept - 7.0) < 1e-9
    assert abs(got["a"].r2 - 1.0) < 1e-12
    assert abs(got["b"].slope) < 1e-12 and got["b"].r2 is None


def test_hdr_sketch_accuracy_and_merge(spark):
    """HDR-sketch invariants (round 9 — unknown-range quantiles):
    (a) every read is within a factor (1 + 1/S) of the exact quantile
    even though the sketch was never told the range; (b) per-half
    sketches SUM-merged equal the direct sketch cell-for-cell and
    read identically; (c) nulls drop, non-positives land in the zero
    bucket, and state stays bounded under wild magnitudes."""
    from dynamodb_to_datalake_project_spark.llm import sketch as lsk

    S, scale = 32, 1_000_000
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    grid = lsk.hdr_sketch_build(ev, "value", scale, S)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {
        r.q: r.est_ticks
        for r in lsk.hdr_sketch_read(grid, qs, S).collect()
    }
    # compare against the exact ORDER STATISTIC the sketch targets
    # (rank = ceil(q*N)) — NOT interpolated percentile(), which can sit
    # an arbitrary value gap above the rank statistic
    vals = sorted(
        r.value for r in ev.select("value").collect() if r.value is not None
    )
    import math as _math

    for q in qs:
        t_r = int(_math.floor(vals[_math.ceil(q * len(vals)) - 1] * scale))
        # upper-edge convention: the bucket holding the rank tick ends
        # strictly above it, at most one sub-bucket (t_r/S) higher
        assert t_r < got[q] <= t_r * (1 + 1.0 / S) + 1, (q, got[q], t_r)

    # merge = direct, and merged reads match
    h = ev.withColumn("half", (F.xxhash64("event_id") % 2 == 0).cast("int"))
    halves = [
        lsk.hdr_sketch_build(h.filter(F.col("half") == i), "value", scale, S)
        for i in (0, 1)
    ]
    merged = (
        halves[0].unionAll(halves[1])
        .groupBy("e", "sub").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert {(r.e, r.sub): r.cnt for r in merged.collect()} == {
        (r.e, r.sub): r.cnt for r in grid.collect()
    }
    assert [
        r.est_ticks for r in lsk.hdr_sketch_read(merged, qs, S).collect()
    ] == [r.est_ticks for r in lsk.hdr_sketch_read(grid, qs, S).collect()]

    # edge behavior: null drops, <=0 clamps to the zero bucket,
    # huge magnitudes stay one bounded bucket each
    wild = spark.createDataFrame(
        [(None,), (-3.5,), (0.0,), (1e12,)], "value double"
    )
    cells = {
        (r.e, r.sub): r.cnt
        for r in lsk.hdr_sketch_build(wild, "value", scale, S).collect()
    }
    assert cells[(-1, 0)] == 2 and len(cells) == 2
    assert sum(cells.values()) == 3  # the null row dropped

    import pytest as _pt
    with _pt.raises(ValueError, match="power of two"):
        lsk.hdr_sketch_build(wild, "value", scale, 31)


def test_kmv_accuracy_exact_path_and_merge(spark):
    """KMV invariants: (a) below k distinct the estimate is EXACT;
    (b) at 20k distinct a KMV(256) estimate lands within 5 standard
    errors (5/sqrt(254) ≈ 31%... use 20%: 3 SE) of truth; (c) merging
    two sketches by unioning kept hashes and re-taking the k smallest
    equals sketching the union directly."""
    from dynamodb_to_datalake_project_spark.llm import sketch as lsk

    small = spark.range(10).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    r = lsk.kmv_distinct(small, "v", ["g"], k=32).collect()[0]
    assert r.n_kept == 10 and r.est_distinct == 10.0
    big = spark.range(20_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    r2 = lsk.kmv_distinct(big, "v", ["g"], k=256).collect()[0]
    assert abs(r2.est_distinct - 20_000) / 20_000 < 0.20
    # merge: halves' kept hashes unioned, k smallest re-taken == direct
    h1 = lsk.kmv_distinct(
        big.filter(F.col("v") % 2 == 0), "v", ["g"], k=256
    )
    from dynamodb_to_datalake_project_spark.llm.dedup import md5_hash60

    kept = (
        big.select("g", md5_hash60(F.col("v").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(256)
        .agg(F.max("h"))
        .collect()[0][0]
    )
    halves_kept = (
        big.withColumn("half", (F.col("v") % 2).cast("int"))
        .select("half", md5_hash60(F.col("v").cast("string")).alias("h"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("half").orderBy("h")
    merged_kth = (
        halves_kept.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 256)
        .orderBy("h")
        .limit(256)
        .agg(F.max("h"))
        .collect()[0][0]
    )
    assert merged_kth == kept


def test_kmv_jaccard_tracks_exact(spark):
    """KMV(128) pairwise source similarity lands within 3/sqrt(128)
    (~27%) absolute of the exact token-set Jaccard for every source
    pair — and ranks identical sets at exactly 1.0."""
    from dynamodb_to_datalake_project_spark.llm import sketch as lsk
    from dynamodb_to_datalake_project_spark.llm.text import tokens as toks_fn

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r.src_a, r.src_b): r.jaccard_est
        for r in lsk.kmv_jaccard_sources(docs, k=128).collect()
    }
    t = docs.select("source", F.explode(toks_fn(F.col("text"))).alias("tok")).distinct()
    sets = {
        r.source: set(r.toks)
        for r in t.groupBy("source").agg(F.collect_set("tok").alias("toks")).collect()
    }
    assert got
    for (a, b), est in got.items():
        ex = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert abs(est - ex) <= 3 / (128 ** 0.5), (a, b, est, ex)
    # identical sets -> exactly 1.0
    twin = docs.selectExpr("doc_id", "text", "'x' AS source").unionByName(
        docs.selectExpr("doc_id", "text", "'y' AS source")
    )
    r = lsk.kmv_jaccard_sources(twin, k=64).collect()[0]
    assert r.jaccard_est == 1.0 and r.n_both == r.k_used


def test_corr_matrix_known_relationships(spark):
    """Pearson r on constructed data: an exact linear pair reads 1.0,
    an exact inverse pair -1.0, and a constant column yields NULL —
    the degenerate-variance contract shared with linear_fit."""
    from dynamodb_to_datalake_project_spark.audit import corr_matrix

    rows = [(float(x), 2.0 * x + 1.0, -3.0 * x, 7.0) for x in range(1, 40)]
    df = spark.createDataFrame(rows, ["a", "b", "c", "d"])
    got = {(r.col_a, r.col_b): r.pearson_r for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert abs(got[("a", "b")] - 1.0) < 1e-12
    assert abs(got[("a", "c")] + 1.0) < 1e-12
    assert got[("a", "d")] is None and got[("b", "d")] is None


def test_exif_goldens_and_validation():
    """TIFF IFD walk: both byte orders, inline SHORT packing, offset
    ASCII/RATIONAL values, ExifIFD chase, and every reject path."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    def wrap(app1):
        # minimal but marker-valid JPEG skeleton around the APP1
        return b"\xff\xd8" + app1 + b"\xff\xd9"

    for big, bo in ((False, "II"), (True, "MM")):
        e = ">" if big else "<"
        ifd0 = [
            (0x010E, *m._exif_ascii("hello world")),
            (0x0112, 3, 1, struct.pack(e + "H", 6)),
        ]
        exif = [(0x829A, 5, 1, struct.pack(e + "II", 1, 125))]
        d = m.parse_jpeg_exif(wrap(m.encode_exif_app1(ifd0, exif, big)))
        assert (d["byte_order"], d["orientation"]) == (bo, 6)
        assert d["description"] == "hello world"
        assert (d["exposure_num"], d["exposure_den"]) == (1, 125)
        assert d["n_ifd0"] == 3  # 2 tags + ExifIFD pointer

    # the walk skips non-Exif APP segments and restart markers
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    app1 = m.encode_exif_app1([(0x0112, 3, 1, struct.pack("<H", 3))], [])
    assert m.parse_jpeg_exif(b"\xff\xd8" + app0 + app1)["orientation"] == 3

    with _pt.raises(ValueError, match="no SOI"):
        m.parse_jpeg_exif(b"II\x2a\x00")
    with _pt.raises(ValueError, match="no APP1 Exif"):
        m.parse_jpeg_exif(b"\xff\xd8" + app0 + b"\xff\xd9")
    bad = bytearray(app1)
    bad[10:12] = b"XX"  # byte-order mark
    with _pt.raises(ValueError, match="bad byte-order mark"):
        m.parse_jpeg_exif(wrap(bytes(bad)))
    bad = bytearray(app1)
    bad[12:14] = struct.pack("<H", 43)
    with _pt.raises(ValueError, match="bad TIFF magic"):
        m.parse_jpeg_exif(wrap(bytes(bad)))
    # ASCII value whose offset points past the TIFF stream
    trunc = m.encode_exif_app1([(0x010E, 2, 64, b"\x00")], [])
    hacked = bytearray(trunc)
    hacked[0:0] = b""  # keep segment; corrupt the count via direct IFD edit
    ent = 10 + 8 + 2  # APP1 hdr(4)+Exif\0\0(6) -> TIFF hdr(8) -> count(2)
    hacked[ent + 4 : ent + 8] = struct.pack("<I", 4096)  # count -> overrun
    with _pt.raises(ValueError, match="overruns the stream"):
        m.parse_jpeg_exif(wrap(bytes(hacked)))
    # unterminated ASCII
    unterm = m.encode_exif_app1([(0x010E, 2, 8, b"abcdefgh")], [])
    with _pt.raises(ValueError, match="unterminated"):
        m.parse_jpeg_exif(wrap(unterm))


def test_mp3_side_info_bit_layout_and_rejects():
    """ISO 11172-3 §2.4.1.7 side-info packing: a hand-verified bit
    layout golden, mono/stereo sizes, write-overflow, short-input and
    window-switching rejects."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    zero_gr = {
        "part2_3_length": 0, "big_values": 0, "global_gain": 0,
        "scalefac_compress": 0, "table_select": [0, 0, 0],
        "region0_count": 0, "region1_count": 0, "preflag": 0,
        "scalefac_scale": 0, "count1table_select": 0,
    }
    si = {
        "main_data_begin": 5, "private_bits": 0, "scfsi": [0, 0],
        "granules": [[dict(zero_gr), dict(zero_gr)] for _ in range(2)],
    }
    blob = m.encode_mp3_side_info(si, channels=2)
    # 9 bits of 5 = 000000101, then all-zero: bytes 0x02 0x80 0x00...
    assert blob == bytes([0x02, 0x80]) + bytes(30)
    assert m.parse_mp3_side_info(blob, channels=2) == si

    mono = {
        "main_data_begin": 511, "private_bits": 31, "scfsi": [15],
        "granules": [[dict(zero_gr)], [dict(zero_gr)]],
    }
    mb = m.encode_mp3_side_info(mono, channels=1)
    assert len(mb) == 17 and mb[0] == 0xFF  # 511 = nine 1-bits
    assert m.parse_mp3_side_info(mb, channels=1) == mono

    with _pt.raises(ValueError, match="overflows"):
        bad = dict(si, main_data_begin=512)
        m.encode_mp3_side_info(bad, channels=2)
    with _pt.raises(ValueError, match="need 32 bytes"):
        m.parse_mp3_side_info(blob[:31], channels=2)
    # flip the granule-0/channel-0 window_switching_flag (bit 53)
    ws = bytearray(blob)
    ws[6] |= 0x04
    with _pt.raises(ValueError, match="window-switching"):
        m.parse_mp3_side_info(bytes(ws), channels=2)


def test_flac_metadata_chain_and_comment_block():
    """FLAC metadata splice + walk: last-flag rewrite across a
    multi-block chain, STREAMINFO-first enforcement, comment-body
    parse without magic/framing, audio decode unchanged."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m
    from dynamodb_to_datalake_project_spark.llm.flac import (
        decode_flac_samples,
        encode_flac,
    )

    samples = [100, -200, 300, -400]
    plain = encode_flac(samples, n_channels=1, block_size=64)
    body = m._encode_comment_body("v", [("TITLE", "t"), ("Lang", "en")])
    pad = bytes(16)  # a PADDING block rides along, exercising multi-append
    tagged = m.flac_insert_metadata(plain, [(4, body), (1, pad)])
    d = m.parse_flac_metadata(tagged)
    assert d["block_types"] == [0, 4, 1]
    assert d["streaminfo"]["n_channels"] == 1
    assert d["streaminfo"]["total_samples"] == 4
    # keys uppercase per the case-insensitive field-name rule
    assert d["comments"]["comments"] == [("TITLE", "t"), ("LANG", "en")]
    assert decode_flac_samples(tagged)["samples"] == samples

    with _pt.raises(ValueError, match="bad stream marker"):
        m.parse_flac_metadata(b"OggS")
    with _pt.raises(ValueError, match="truncated metadata block"):
        m.parse_flac_metadata(tagged[: len(plain) + 3])
    # a chain whose first block is not STREAMINFO violates the spec
    forged = b"fLaC" + bytes([0x84]) + len(body).to_bytes(3, "big") + body
    with _pt.raises(ValueError, match="must be STREAMINFO"):
        m.parse_flac_metadata(forged)


def test_png_text_chunks_and_rejects():
    """PNG ancillary walk: tEXt/iTXt (plain + compressed)/pHYs
    goldens, CRC enforcement, keyword-length and compression-method
    rejects, pixel decode unchanged after splice."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    plain = m.encode_png(px, 2, 2)
    itxt = b"Comment\x00\x01\x00fr\x00tk\x00" + zlib.compress("héllo".encode())
    tagged = m.png_insert_chunks(
        plain,
        [
            (b"tEXt", b"Title\x00t1"),
            (b"iTXt", itxt),
            (b"pHYs", struct.pack(">IIB", 2835, 2836, 1)),
        ],
    )
    d = m.parse_png_metadata(tagged)
    assert (d["width"], d["height"], d["n_chunks"]) == (2, 2, 6)
    assert d["texts"] == [("Title", "", "t1"), ("Comment", "fr", "héllo")]
    assert d["phys"] == {"ppu_x": 2835, "ppu_y": 2836, "unit": 1}
    assert (m.decode_png_array(tagged)["px"] == px).all()
    # uncompressed iTXt path
    d2 = m.parse_png_metadata(
        m.png_insert_chunks(plain, [(b"iTXt", b"K\x00\x00\x00en\x00\x00v")])
    )
    assert d2["texts"] == [("K", "en", "v")]

    with _pt.raises(ValueError, match="not a PNG"):
        m.parse_png_metadata(b"\x89PNX" + bytes(8))
    corrupt = bytearray(tagged)
    corrupt[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with _pt.raises(ValueError, match="CRC mismatch"):
        m.parse_png_metadata(bytes(corrupt))
    with _pt.raises(ValueError, match="keyword separator"):
        m.parse_png_metadata(m.png_insert_chunks(plain, [(b"tEXt", b"nokw")]))
    with _pt.raises(ValueError, match="keyword length"):
        m.parse_png_metadata(
            m.png_insert_chunks(plain, [(b"tEXt", b"\x00v")])
        )
    with _pt.raises(ValueError, match="reserved iTXt compression"):
        m.parse_png_metadata(
            m.png_insert_chunks(plain, [(b"iTXt", b"K\x00\x00\x07en\x00\x00v")])
        )
    with _pt.raises(ValueError, match="bad pHYs length"):
        m.parse_png_metadata(m.png_insert_chunks(plain, [(b"pHYs", bytes(5))]))


def test_wav_info_chunk_walk_and_rejects():
    """RIFF LIST/INFO: size patch, word-aligned stepping (odd-length
    value pads), stdlib decode unchanged, and the reject paths."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    samples = [1, -2, 3]
    plain = m.encode_wav(samples)
    tagged = m.wav_append_info(plain, [("INAM", "t"), ("ILNG", "en")])
    d = m.parse_wav_info(tagged)
    assert d["fmt"] == {
        "format": 1, "n_channels": 1, "sample_rate": 16000, "bits": 16,
    }
    assert d["data_bytes"] == 6 and d["n_chunks"] == 3
    assert d["info"] == [("INAM", "t"), ("ILNG", "en")]
    # RIFF size patched: declared size spans the whole file minus 8
    assert struct.unpack_from("<I", tagged, 4)[0] == len(tagged) - 8
    assert m.decode_wav(tagged)["n_samples"] == 3
    # odd-length value ("abc" + NUL = 4... use "ab" + NUL = 3 -> pad)
    d2 = m.parse_wav_info(m.wav_append_info(plain, [("INAM", "ab"), ("X2__", "y")]))
    assert d2["info"] == [("INAM", "ab"), ("X2__", "y")]

    with _pt.raises(ValueError, match="not a RIFF/WAVE"):
        m.parse_wav_info(b"RIFX" + plain[4:])
    with _pt.raises(ValueError, match="RIFF size overruns"):
        m.parse_wav_info(tagged[:-4])
    corrupt = bytearray(tagged)
    # inflate the LIST chunk's declared length past the buffer
    at = tagged.find(b"LIST")
    corrupt[at + 4 : at + 8] = struct.pack("<I", 10_000)
    with _pt.raises(ValueError, match="overruns"):
        m.parse_wav_info(bytes(corrupt))
    with _pt.raises(ValueError, match="no fmt chunk"):
        m.parse_wav_info(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_mp4_udta_tag_surgery_and_rejects():
    """ilst tag splice into a finished file: moov size patch, stco
    shift (re-demux equality is the proof), meta FullBox skip, type-0
    trkn decode, and the reject paths."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    plain = m.encode_mp4_container(
        [
            {
                "handler": "vide", "codec": "avc1", "timescale": 1000,
                "sample_delta": 40, "width": 16, "height": 16,
                "samples": [b"\x05abc", b"\x07defg", b"\x02x"],
            },
            {
                "handler": "soun", "codec": "mp4a", "timescale": 48000,
                "sample_delta": 1024, "samples": [b"\x09xy", b"\x01z"],
            },
        ]
    )
    udta = m.encode_mp4_udta_tags(
        [("©nam", "t"), ("©ART", "a")], trkn=(3, 12)
    )
    tagged = m.mp4_insert_udta(plain, udta)
    # the strongest check: full demux of the tagged file equals the
    # untagged demux — sample offsets still land on the same bytes
    assert m.parse_mp4_boxes(tagged) == m.parse_mp4_boxes(plain)
    d = m.parse_mp4_tags(tagged)
    assert d == {
        "texts": [("©nam", "t"), ("©ART", "a")], "trkn": (3, 12), "n_items": 3,
    }

    with _pt.raises(ValueError, match="no moov"):
        m.mp4_insert_udta(plain[: plain.index(b"moov") - 4], udta)
    with _pt.raises(ValueError, match="no udta"):
        m.parse_mp4_tags(plain)
    with _pt.raises(ValueError, match="item code must be 4 bytes"):
        m.encode_mp4_udta_tags([("nam", "x")])
    # unknown data type indicator quarantines
    bad = bytearray(tagged)
    at = tagged.index(b"data", tagged.index(b"ilst"))
    struct.pack_into(">I", bad, at + 4, 7)
    with _pt.raises(ValueError, match="unknown data type"):
        m.parse_mp4_tags(bytes(bad))
    # an ilst item whose child is not a data box
    ilst = m._mp4_box(b"ilst", m._mp4_box(b"\xa9nam", m._mp4_box(b"blob", b"")))
    meta = m._mp4_full(b"meta", 0, 0, ilst)
    forged = m.mp4_insert_udta(plain, m._mp4_box(b"udta", meta))
    with _pt.raises(ValueError, match="has no data box"):
        m.parse_mp4_tags(forged)


def test_gif_extensions_walk_and_rejects():
    """GIF89a comment/NETSCAPE splice: sub-block reassembly across the
    255-byte boundary, loop-count decode, image skip without LZW, LZW
    decode unchanged, and the reject paths."""
    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    plain = m.encode_gif(px, 2, 2)
    long_comment = "x" * 300  # forces two comment sub-blocks
    tagged = m.gif_insert_extensions(plain, comment=long_comment, loop_count=7)
    d = m.parse_gif_extensions(tagged)
    assert d == {
        "width": 2, "height": 2, "comment": long_comment,
        "loop_count": 7, "n_images": 1,
    }
    assert m.decode_gif(tagged)["pixels"] == m.decode_gif(plain)["pixels"]
    # extensions are optional independently
    assert m.parse_gif_extensions(plain)["comment"] is None
    assert (
        m.parse_gif_extensions(m.gif_insert_extensions(plain, comment="c"))[
            "loop_count"
        ]
        is None
    )

    with _pt.raises(ValueError, match="bad signature"):
        m.parse_gif_extensions(b"JIF89a" + plain[6:])
    with _pt.raises(ValueError, match="extensions require GIF89a"):
        m.gif_insert_extensions(b"GIF87a" + plain[6:], comment="c")
    with _pt.raises(ValueError, match="missing trailer"):
        m.parse_gif_extensions(tagged[:-1])
    with _pt.raises(ValueError, match="sub-block overruns"):
        at = m._gif_gct_end(tagged)
        m.parse_gif_extensions(tagged[: at + 2] + b"\xff" + b"z" * 10)
    with _pt.raises(ValueError, match="malformed NETSCAPE"):
        bad = b"\x21\xff\x0bNETSCAPE2.0\x03\x02\x07\x00\x00"
        at = m._gif_gct_end(plain)
        m.parse_gif_extensions(plain[:at] + bad + plain[at:])


def test_corrupt_upload_quarantine_is_uniform_valueerror():
    """Round-8 hardening: truncated/corrupt metadata payloads raise the
    documented ValueError — never IndexError/struct.error/zlib.error —
    so the quarantine contract holds uniformly across parsers."""
    import struct

    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    # GIF: 0x21 introducer as the LAST byte; truncated LSD; truncated
    # image descriptor
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    plain = m.encode_gif(px, 2, 2)
    at = m._gif_gct_end(plain)
    with _pt.raises(ValueError, match="truncated extension introducer"):
        m.parse_gif_extensions(plain[:at] + b"\x21")
    with _pt.raises(ValueError, match="truncated logical screen"):
        m.parse_gif_extensions(b"GIF89a\x02\x00\x02\x00")
    with _pt.raises(ValueError, match="truncated image descriptor"):
        m.parse_gif_extensions(plain[:at] + b"\x2c\x00\x00")

    # PNG: compressed iTXt whose chunk CRC is VALID but whose zlib
    # stream is garbage must quarantine, not raise zlib.error
    png = m.encode_png(px, 2, 2)
    forged = m.png_insert_chunks(
        png, [(b"iTXt", b"K\x00\x01\x00en\x00\x00notzlib")]
    )
    with _pt.raises(ValueError, match="corrupt iTXt zlib"):
        m.parse_png_metadata(forged)

    # Exif: APP1 whose TIFF body is shorter than one header
    seg = b"Exif\x00\x00" + b"II\x2a\x00"
    jpg = b"\xff\xd8\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg
    with _pt.raises(ValueError, match="truncated TIFF header"):
        m.parse_jpeg_exif(jpg)


def test_wav_append_info_validates_declared_riff_size():
    """wav_append_info refuses payloads whose declared RIFF size does
    not span the buffer exactly — patching a stale size would declare
    an inconsistent length while LIST sits at the true end."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    plain = m.encode_wav([1, -2, 3])
    with _pt.raises(ValueError, match="does not match the buffer"):
        m.wav_append_info(plain + b"\x00\x00", [("INAM", "t")])  # trailing bytes
    stale = plain[:4] + struct.pack(
        "<I", struct.unpack_from("<I", plain, 4)[0] + 4
    ) + plain[8:]
    with _pt.raises(ValueError, match="does not match the buffer"):
        m.wav_append_info(stale, [("INAM", "t")])
    # the happy path still patches to exactly len-8
    tagged = m.wav_append_info(plain, [("INAM", "t")])
    assert struct.unpack_from("<I", tagged, 4)[0] == len(tagged) - 8


def test_id3v24_utf16be_encoding_byte():
    """Encoding byte 0x02 (UTF-16BE, no BOM) is legal ID3v2.4 text —
    decoded there, still rejected in v2.3 where it is undefined."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    body = "héllo".encode("utf-16-be")
    frame = b"TIT2" + m._syncsafe(1 + len(body)) + b"\x00\x00\x02" + body
    tag4 = b"ID3" + bytes((4, 0, 0)) + m._syncsafe(len(frame)) + frame
    assert m.parse_id3v2(tag4)["frames"] == [("TIT2", "héllo")]

    frame3 = b"TIT2" + struct.pack(">I", 1 + len(body)) + b"\x00\x00\x02" + body
    tag3 = b"ID3" + bytes((3, 0, 0)) + m._syncsafe(len(frame3)) + frame3
    with _pt.raises(ValueError, match="unknown text encoding"):
        m.parse_id3v2(tag3)


def test_edit_list_repeat_presentation_raises():
    """ISO 14496-12 allows an edit list to present the same media range
    twice; one pts per sample can't represent that, so it must raise
    (honest-stub policy) instead of silently keeping the first pts."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    # single trim edit: samples at cts 0/100 present, 200 trimmed
    assert m._apply_edit_list([0, 100, 200], [(200, 0, 1.0)], 1000, 1000) == [
        0, 100, None,
    ]
    # two edits re-presenting the same range → honest raise
    with _pt.raises(NotImplementedError, match="re-presents"):
        m._apply_edit_list(
            [0, 100], [(100, 0, 1.0), (100, 0, 1.0)], 1000, 1000
        )


def test_aac_adts_framing_and_rejects():
    """ADTS goldens: header bit layout, CRC recompute/verify, frame
    stepping, and the corrupt-upload quarantine paths."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    payloads = [b"\x11" * 30, b"\x22" * 45, b"\x33" * 7]
    plain = m.encode_aac_adts(payloads, profile=1, sf_idx=4, channels=2)
    d = m.parse_aac_adts(plain)
    assert d == {
        "n_frames": 3, "profile": 1, "sample_rate": 44100, "channels": 2,
        "stream_bytes": 21 + 82, "payload_bytes": 82,
        "duration_ms": 3 * 1024 * 1000 // 44100, "crc_frames": 0,
        "first_byte_sum": 0x11 + 0x22 + 0x33,
    }
    # CRC variant: 9-byte headers, all frames verified
    prot = m.encode_aac_adts(payloads, profile=0, sf_idx=3, channels=1, crc=True)
    dp = m.parse_aac_adts(prot)
    assert (dp["crc_frames"], dp["stream_bytes"]) == (3, 27 + 82)
    # flipping one header bit breaks the CRC check
    corrupt = bytearray(prot)
    corrupt[2] ^= 0x04  # sampling_frequency_index bit
    with _pt.raises(ValueError, match="CRC mismatch"):
        m.parse_aac_adts(bytes(corrupt))
    # flipping a payload byte does NOT (CRC covers the header)
    corrupt2 = bytearray(prot)
    corrupt2[10] ^= 0xFF
    assert m.parse_aac_adts(bytes(corrupt2))["n_frames"] == 3

    with _pt.raises(ValueError, match="lost frame sync"):
        m.parse_aac_adts(b"\xfe" + plain[1:])
    with _pt.raises(ValueError, match="truncated ADTS header"):
        m.parse_aac_adts(plain[:5])
    with _pt.raises(ValueError, match="extends past end"):
        m.parse_aac_adts(plain[:-3])
    with _pt.raises(ValueError, match="reserved/escape frequency"):
        bad = bytearray(plain)
        bad[2] = (bad[2] & 0xC3) | (15 << 2)
        m.parse_aac_adts(bytes(bad))
    with _pt.raises(ValueError, match="layer bits"):
        bad = bytearray(plain)
        bad[1] |= 0x06
        m.parse_aac_adts(bytes(bad))
    with _pt.raises(ValueError, match="parameters change mid-stream"):
        two = m.encode_aac_adts([b"x" * 10], 1, 4, 2) + m.encode_aac_adts(
            [b"y" * 10], 2, 4, 2
        )
        m.parse_aac_adts(two)
    with _pt.raises(ValueError, match="no frames"):
        m.parse_aac_adts(b"")
    with _pt.raises(ValueError, match="out of range"):
        m.encode_aac_adts([b"x"], 1, 14, 2)
    with _pt.raises(ValueError, match="overflows the 13-bit"):
        m.encode_aac_adts([b"x" * 9000], 1, 4, 2)


def test_h264_annexb_walk_sps_and_rejects():
    """Annex-B goldens: exp-Golomb SPS round trip across profiles and
    crop shapes, EPB insert/strip on adversarial byte runs, 3- vs
    4-byte start codes, and the corrupt-upload quarantine paths.
    Slice decode is the only NotImplementedError."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import h264 as h

    # EPB: RBSP containing raw start-code-ish runs survives the trip
    hot = b"\x00\x00\x01\x00\x00\x00\x02\x00\x00\x03ab\x00\x00"
    assert h.ebsp_to_rbsp(h.rbsp_to_ebsp(hot)) == hot
    assert h.rbsp_to_ebsp(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    with _pt.raises(ValueError, match="corrupt encapsulation"):
        h.ebsp_to_rbsp(b"\x00\x00\x03\x99")

    # SPS: interlaced (frame_mbs_only=0) doubles map units
    w = h._BitWriter()
    w.bits(77, 8); w.bits(0, 8); w.bits(30, 8)
    w.ue(0); w.ue(4); w.ue(2)  # sps_id, frame_num, poc_type 2
    w.ue(3); w.bits(0, 1)  # refs, gaps
    w.ue(19); w.ue(8)  # 320 x (2*144)
    w.bits(0, 1)  # frame_mbs_only = 0 (interlaced)
    w.bits(0, 1)  # mb_adaptive
    w.bits(1, 1)  # direct_8x8
    w.bits(0, 1); w.bits(0, 1)  # no crop, no vui
    d = h.parse_sps(w.trailing())
    assert (d["width"], d["height"], d["frame_mbs_only"]) == (320, 288, 0)

    # poc_type 1 branch with a ref-frame offset list parses through
    w = h._BitWriter()
    w.bits(66, 8); w.bits(0, 8); w.bits(10, 8)
    w.ue(0); w.ue(4); w.ue(1)
    w.bits(0, 1); w.ue(2); w.ue(3)  # always_zero, 2 se values (ue-coded +2/-2... se reads)
    w.ue(2); w.ue(1); w.ue(2)  # num_offsets=2? -> careful: se() reads ue then maps
    w.ue(3); w.bits(0, 1)
    w.ue(9); w.ue(5); w.bits(1, 1); w.bits(1, 1); w.bits(0, 1); w.bits(0, 1)
    d1 = h.parse_sps(w.trailing())
    assert (d1["width"], d1["height"]) == (160, 96)

    # full-stream rejects
    sps = h.encode_sps(66, 30, 10, 6)
    ok = h.encode_h264_annexb([(3, 7, sps), (3, 5, b"\x40\x41")])
    assert h.parse_h264_annexb(ok)["n_idr"] == 1
    with _pt.raises(ValueError, match="does not begin with a start code"):
        h.parse_h264_annexb(b"\x00\x01" + ok)
    with _pt.raises(ValueError, match="forbidden_zero_bit"):
        bad = bytearray(ok); bad[4] |= 0x80
        h.parse_h264_annexb(bytes(bad))
    with _pt.raises(ValueError, match="reserved nal_unit_type"):
        bad = bytearray(ok); bad[4] = (bad[4] & 0xE0) | 24
        h.parse_h264_annexb(bytes(bad))
    with _pt.raises(ValueError, match="no SPS"):
        h.parse_h264_annexb(h.encode_h264_annexb([(3, 5, b"\x40")]))
    with _pt.raises(ValueError, match="bit read past end"):
        h.parse_sps(sps[:4])
    with _pt.raises(NotImplementedError, match="scaling"):
        # high-profile SPS with seq_scaling_matrix_present_flag forged on
        w = h._BitWriter()
        w.bits(100, 8); w.bits(0, 8); w.bits(40, 8)
        w.ue(0); w.ue(1); w.ue(0); w.ue(0); w.bits(0, 1); w.bits(1, 1)
        h.parse_sps(w.trailing())
    with _pt.raises(NotImplementedError, match="slice decode"):
        h.decode_h264_slices(ok)


def test_subtitle_parsing_dialects_and_rejects():
    """WebVTT vs SRT goldens: header/NOTE/identifier/settings handling,
    comma vs dot milliseconds, short MM:SS.mmm form, CRLF tolerance,
    and the malformed-cue quarantine paths."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    cues = [(100, 1200, ["hello", "world"]), (2000, 3500, ["bye"])]
    vtt = m.encode_subtitles(
        cues, "vtt", note="meta", idents=True, settings="align:start"
    )
    d = m.parse_subtitles(vtt)
    assert d == {
        "format": "vtt", "n_cues": 2, "first_start_ms": 100,
        "last_end_ms": 3500, "total_dur_ms": 1100 + 1500, "gap_ms": 800,
        "text_chars": 10 + 3,
    }
    srt = m.encode_subtitles(cues, "srt")
    assert "," in srt.split("\n")[1] and m.parse_subtitles(srt) == {
        **d, "format": "srt",
    }
    # CRLF + short VTT timestamp form
    short = "WEBVTT\r\n\r\n01:02.500 --> 01:03.000\r\nhi\r\n"
    ds = m.parse_subtitles(short)
    assert (ds["first_start_ms"], ds["last_end_ms"]) == (62500, 63000)
    # VTT header may carry metadata after the magic
    assert m.parse_subtitles(
        "WEBVTT - with description\nKind: captions\n\n"
        "00:00:00.000 --> 00:00:01.000\nx\n"
    )["n_cues"] == 1

    with _pt.raises(ValueError, match="malformed timestamp"):
        m.parse_subtitles("WEBVTT\n\n0:0.5 --> 00:00:01.000\nx\n")
    with _pt.raises(ValueError, match="out-of-range timestamp"):
        m.parse_subtitles("WEBVTT\n\n00:99:00.000 --> 01:40:00.000\nx\n")
    with _pt.raises(ValueError, match="ends at"):
        m.parse_subtitles("WEBVTT\n\n00:00:02.000 --> 00:00:01.000\nx\n")
    with _pt.raises(ValueError, match="counter expected"):
        m.parse_subtitles("one\n00:00:00,000 --> 00:00:01,000\nx\n")
    with _pt.raises(ValueError, match="out of order"):
        m.parse_subtitles(
            "1\n00:00:00,000 --> 00:00:01,000\nx\n\n"
            "3\n00:00:02,000 --> 00:00:03,000\ny\n"
        )
    with _pt.raises(ValueError, match="cue without text"):
        m.parse_subtitles("WEBVTT\n\n00:00:00.000 --> 00:00:01.000\n")
    with _pt.raises(ValueError, match="no cues"):
        m.parse_subtitles("WEBVTT\n\nNOTE just a comment\n")
    with _pt.raises(ValueError, match="unknown format"):
        m.encode_subtitles(cues, "ass")


def test_unicode_repair_branches_and_safety():
    """Repair branches: single/double mojibake, NFD -> NFC, NBSP,
    zero-width/BOM/control strip — and the safety property that
    genuinely-correct text is NEVER altered (UTF-8 validity check)."""
    from dynamodb_to_datalake_project_spark.llm.text import (
        _fix_mojibake_once,
        repair_unicode,
    )

    assert _fix_mojibake_once("cafÃ©") == "café"
    assert _fix_mojibake_once("plain") is None
    assert _fix_mojibake_once("café") is None  # E9 is never valid UTF-8
    # cp1252 branch: curly apostrophe mojibake (â€™ -> ’)
    moji = "it’s".encode("utf-8").decode("cp1252")
    d = repair_unicode(moji)
    assert d["text"] == "it’s" and d["mojibake_rounds"] == 1
    # double-encode needs two rounds
    dbl = "é".encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    d2 = repair_unicode(dbl)
    assert d2["text"] == "é" and d2["mojibake_rounds"] == 2
    # NFD -> NFC, NBSP, zero-width, control
    d3 = repair_unicode("café\xa0x​﻿\x07\n\tok")
    assert d3["text"] == "café x\n\tok"
    assert (d3["nfc_fixed"], d3["nbsp_fixed"], d3["removed_chars"]) == (1, 1, 3)
    # idempotence: repairing clean output changes nothing
    again = repair_unicode(d3["text"])
    assert again["text"] == d3["text"] and again["mojibake_rounds"] == 0


def test_exif_gps_parse_and_scrub():
    """GPS sub-IFD goldens: exact milliarcsecond decode in all four
    hemispheres, both endians; scrub removes GPS + pointer while
    preserving every other tag bit-for-bit and the image stream."""
    import struct

    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    for big in (False, True):
        e = ">" if big else "<"
        # 12° 30' 15.5" S, 45° 0' 0.25" W
        lat = struct.pack(e + "6I", 12, 1, 30, 1, 155, 10)
        lon = struct.pack(e + "6I", 45, 1, 0, 1, 25, 100)
        gps = [
            (0x0001, 2, 2, b"S\x00"), (0x0002, 5, 3, lat),
            (0x0003, 2, 2, b"W\x00"), (0x0004, 5, 3, lon),
        ]
        ifd0 = [(0x010E, *m._exif_ascii("t"))]
        exif = [(0xA002, 4, 1, struct.pack(e + "I", 8))]
        app1 = m.encode_exif_app1(ifd0, exif, big_endian=big, gps_ifd=gps)
        px = np.full((8, 8, 3), 99, dtype=np.uint8)
        jpg = m.encode_jpeg(px, 8, 8)
        payload = jpg[:2] + app1 + jpg[2:]
        d = m.parse_jpeg_exif(payload)
        assert d["gps"]["lat_mas"] == -(12 * 3_600_000 + 30 * 60_000 + 15_500)
        assert d["gps"]["lon_mas"] == -(45 * 3_600_000 + 250)
        assert (d["gps"]["lat_ref"], d["gps"]["lon_ref"]) == ("S", "W")
        scrubbed, had = m.strip_exif_gps(payload)
        assert had
        d2 = m.parse_jpeg_exif(scrubbed)
        assert d2["gps"] is None and d2["n_ifd0"] == d["n_ifd0"] - 1
        assert d2["description"] == "t" and d2["pixel_x"] == 8
        # image stream and pixels untouched
        assert scrubbed.endswith(jpg[2:])
        assert (
            m.decode_jpeg_array(scrubbed)["px"] == m.decode_jpeg_array(payload)["px"]
        ).all()
        # idempotent: scrubbing again is a no-op
        again, had2 = m.strip_exif_gps(scrubbed)
        assert not had2 and again == scrubbed

    # a JPEG with no Exif passes through
    plain = m.encode_jpeg(px, 8, 8)
    out, had = m.strip_exif_gps(plain)
    assert not had and out == plain
    with _pt.raises(ValueError, match="no SOI"):
        m.strip_exif_gps(b"nope")


def test_wav_pcm_quality_features():
    """Quality features off the PCM decode: hand-computed goldens for
    peak/clipping/sum-sq/DC/zero-crossings, and the empty reject."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    samples = [0, 100, -50, 32767, -32768, 20, -20, 0, 5]
    d = m.wav_pcm_quality(m.encode_wav(samples))
    assert d == {
        "n_samples": 9,
        "peak": 32768,
        "n_clipped": 2,
        "sum_sq": sum(s * s for s in samples),
        "dc_sum": sum(samples),
        # strict sign changes: 100/-50, -50/32767, 32767/-32768,
        # -32768/20, 20/-20  (zeros never cross)
        "zero_crossings": 5,
    }
    with _pt.raises(ValueError, match="no samples"):
        m.wav_pcm_quality(m.encode_wav([]))


def test_sft_dialogue_validation():
    """Chat-schema gate: valid shapes parse; every violation class
    (bad JSON, wrong keys, unknown role, empty content, system
    mid-conversation, broken alternation, trailing user) raises."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.text import parse_dialogue

    ok = [
        {"role": "system", "content": "s"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "more"},
        {"role": "assistant", "content": "sure"},
    ]
    d = parse_dialogue(json.dumps(ok))
    assert d == {
        "n_messages": 5, "n_turns": 2, "has_system": 1,
        "system_chars": 1, "user_chars": 6, "assistant_chars": 9,
    }
    assert parse_dialogue(
        '[{"role":"user","content":"q"},{"role":"assistant","content":"a"}]'
    )["has_system"] == 0

    cases = [
        ("not json", "invalid JSON"),
        ("[]", "non-empty message array"),
        ('[{"role":"user"}]', "malformed message"),
        ('[{"role":"tool","content":"x"}]', "unknown role"),
        ('[{"role":"user","content":""}]', "empty/non-string"),
        ('[{"role":"user","content":"q"},{"role":"system","content":"s"}]',
         "not at the start"),
        ('[{"role":"assistant","content":"a"}]', "expected 'user'"),
        ('[{"role":"user","content":"q"},{"role":"user","content":"q2"}]',
         "expected 'assistant'"),
        ('[{"role":"user","content":"q"}]', "end on an assistant"),
        ('[{"role":"system","content":"s"}]', "no conversation turns"),
    ]
    for raw, msg in cases:
        with _pt.raises(ValueError, match=msg):
            parse_dialogue(raw)


def test_fim_transform_spans_and_plan(spark):
    """FIM split invariants: spans partition the text, PSM/SPM orders
    reassemble to the original, and the plan is a pure projection
    (zero exchanges — Catalyst only)."""
    from dynamodb_to_datalake_project_spark.llm.text import fim_transform

    df = spark.createDataFrame(
        [(0, "0123456789abcdefghij"), (1, "xyzzy plugh and magic words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_transform(df).collect()}
    for did, text in ((0, "0123456789abcdefghij"), (1, "xyzzy plugh and magic words")):
        r = rows[did]
        L = len(text)
        p1 = L * (1 + did % 2) // 5
        p2 = L * (3 + did % 2) // 5
        assert (r["prefix_chars"], r["middle_chars"], r["suffix_chars"]) == (
            p1, p2 - p1, L - p2,
        )
        pre, mid, suf = text[:p1], text[p1:p2], text[p2:]
        if did % 2 == 0:
            assert r["fim_text"] == f"<PRE>{pre}<SUF>{suf}<MID>{mid}"
        else:
            assert r["fim_text"] == f"<SUF>{suf}<PRE>{pre}<MID>{mid}"
    plan = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pdf_parse_structure_and_rejects():
    """PDF chain goldens: string escapes (parens, backslash, octal,
    nesting), xref offset validation, stream length/filter handling,
    and the honest-subset rejects."""
    import re
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import pdf as P

    pdf = P.encode_pdf([("a(b)c\\d ", "x", "y")])
    d = P.parse_pdf(pdf)
    assert d["text"] == "a(b)c\\d xy" and d["n_pages"] == 1

    # octal escape + nested parens survive the string parser
    s, at = P._parse_pdf_string(b"(a\\050b\\051 (nested) \\101)", 0)
    assert s == "a(b) (nested) A"
    # content tokenizer: TJ kern numbers ignored, ops counted
    text, ops = P._content_text(
        b"BT /F1 9 Tf (one) Tj [(two) -40 (three)] TJ ET"
    )
    assert text == "onetwothree" and ops == 2

    with _pt.raises(ValueError, match="missing %PDF"):
        P.parse_pdf(b"not a pdf")
    with _pt.raises(ValueError, match="missing startxref"):
        P.parse_pdf(b"%PDF-1.4\n no tail")
    with _pt.raises(ValueError, match="offset for object"):
        # corrupt the first xref offset so it points at garbage
        bad = bytearray(pdf)
        at = pdf.index(b"xref")
        row = pdf.index(b"0000000000 65535", at) + 20
        bad[row : row + 10] = b"0000000003"
        P.parse_pdf(bytes(bad))
    with _pt.raises(ValueError, match="corrupt Flate"):
        bad = bytearray(pdf)
        at = pdf.index(b"stream\n") + 7
        bad[at : at + 4] = b"\x00\x00\x00\x00"
        P.parse_pdf(bytes(bad))
    with _pt.raises(NotImplementedError, match="cross-reference streams"):
        # forge startxref to point at a non-'xref' byte
        forged = pdf.replace(
            b"startxref\n" + str(pdf.rindex(b"xref\n0")).encode(),
            b"startxref\n0",
        )
        P.parse_pdf(forged)
    with _pt.raises(ValueError, match="unterminated string"):
        P._parse_pdf_string(b"(never closed", 0)
    with _pt.raises(ValueError, match="non-Latin-1"):
        P.encode_pdf([("日本語", "x", "y")])


def test_tar_webdataset_walk_and_rejects():
    """ustar goldens: checksum verify, 512-block stepping with odd
    sizes, terminator handling, sample grouping, and quarantine."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm import multimodal as m

    members = [
        ("0001.txt", b"hello"),
        ("0001.bin", bytes(513)),  # spills into a second data block
        ("0002.txt", b""),         # zero-size member
        ("0002.json", b"{}"),
    ]
    tar = m.encode_tar(members)
    assert m.parse_tar(tar) == members
    groups = m.group_webdataset(m.parse_tar(tar))
    assert set(groups) == {"0001", "0002"}
    assert groups["0001"]["bin"] == bytes(513)
    assert groups["0002"] == {"txt": b"", "json": b"{}"}

    with _pt.raises(ValueError, match="checksum mismatch"):
        bad = bytearray(tar)
        bad[0] ^= 0xFF  # flip a name byte: checksum no longer matches
        m.parse_tar(bytes(bad))
    with _pt.raises(ValueError, match="bad magic"):
        bad = bytearray(tar)
        bad[257] = 0x58
        m.parse_tar(bytes(bad))
    with _pt.raises(ValueError, match="truncated header"):
        m.parse_tar(tar[:100])
    with _pt.raises(ValueError, match="extends past end"):
        m.parse_tar(tar[:512] + b"x")
    with _pt.raises(ValueError, match="missing second terminator"):
        m.parse_tar(tar[:-512])
    with _pt.raises(ValueError, match="no extension"):
        m.group_webdataset([("plainname", b"")])
    with _pt.raises(ValueError, match="duplicate field"):
        m.group_webdataset([("a.txt", b"1"), ("a.txt", b"2")])
    with _pt.raises(ValueError, match="100-byte"):
        m.encode_tar([("x" * 101, b"")])


def test_code_quality_filter_rules(spark):
    """Gate rules on hand-built code: long lines, single-line files,
    and autogen markers are dropped; the plan stays Python-free."""
    from dynamodb_to_datalake_project_spark.llm.text import (
        AUTOGEN_MARKER,
        code_line_features,
    )

    rows = [
        (0, "short line\nanother line"),            # keep
        (1, "x" * 200 + "\nok"),                     # max line > 120
        (2, "single line only"),                     # < 2 lines
        (3, AUTOGEN_MARKER + "\nreal code\nmore"),   # marker
    ]
    df = spark.createDataFrame(rows, "doc_id long, code string")
    got = {r["doc_id"]: r for r in code_line_features(df).collect()}
    assert [got[i]["keep"] for i in range(4)] == [1, 0, 0, 0]
    assert got[0]["n_lines"] == 2 and got[0]["max_line_chars"] == 12
    assert got[1]["max_line_chars"] == 200
    assert got[3]["autogen"] == 1
    assert got[0]["sum_line_chars"] == len("short line") + len("another line")
    plan = code_line_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_strip_markdown_branches():
    """Every markdown feature the stripper claims: fences keep their
    body, ATX headers / list bullets / blockquotes strip at line
    level, images become alt text, links their anchor, bold / italic /
    strikethrough unwrap, code spans unwrap — with counts."""
    from dynamodb_to_datalake_project_spark.llm.text import strip_markdown

    md = (
        "## Title\n"
        "- item one\n"
        "> quoted\n"
        "A **bold** and *ital* and ~~gone~~ word.\n"
        "See [anchor](https://x.example/u?q=1) and ![alt text](img.png).\n"
        "Inline `code()` span.\n"
        "```python\nkeep this body\n```"
    )
    d = strip_markdown(md)
    assert d["text"] == (
        "Title\n"
        "item one\n"
        "quoted\n"
        "A bold and ital and gone word.\n"
        "See anchor and alt text.\n"
        "Inline code() span.\n"
        "keep this body\n"
    )
    assert d["headers"] == 1 and d["list_items"] == 1 and d["quotes"] == 1
    assert d["emphasis"] == 3 and d["links"] == 1 and d["images"] == 1
    assert d["code_spans"] == 1 and d["fences"] == 1
    # fence body is immune to inline rules even if it looks like markdown
    d2 = strip_markdown("```\n**not bold** [not](a link)\n```")
    assert d2["fences"] == 1
    # plain text passes through unchanged
    d3 = strip_markdown("no markdown here at all")
    assert d3["text"] == "no markdown here at all"
    assert sum(v for k, v in d3.items() if k != "text") == 0


def test_preference_pair_validation():
    """DPO-schema gate: a valid prompt/chosen/rejected row parses with
    exact char counts; every violation class (bad JSON, non-object,
    wrong/extra/missing keys, empty fields, identical pair) raises
    with its PREF_ERROR_CLASSES prefix."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.text import (
        PREF_ERROR_CLASSES,
        parse_preference_pair,
    )

    ok = {"prompt": "2+2?", "chosen": "4", "rejected": "5"}
    assert parse_preference_pair(json.dumps(ok)) == {
        "prompt_chars": 4, "chosen_chars": 1, "rejected_chars": 1,
    }

    cases = [
        ("not json", "invalid_json"),
        ('["prompt"]', "not_object"),
        ('{"prompt":"p","chosen":"c"}', "bad_keys"),
        ('{"prompt":"p","chosen":"c","rejected":"r","extra":1}', "bad_keys"),
        ('{"prompt":"","chosen":"c","rejected":"r"}', "empty_prompt"),
        ('{"prompt":"p","chosen":null,"rejected":"r"}', "empty_chosen"),
        ('{"prompt":"p","chosen":"c","rejected":""}', "empty_rejected"),
        ('{"prompt":"p","chosen":"same","rejected":"same"}',
         "identical_pair"),
    ]
    for raw, cls in cases:
        assert cls in PREF_ERROR_CLASSES
        with _pt.raises(ValueError, match=f"^{cls}"):
            parse_preference_pair(raw)


def test_image_dhash_known_bits():
    """dHash on hand-built gradients: a strictly increasing horizontal
    ramp sets every bit (all comparisons right > left); a decreasing
    ramp sets none; gray pixels (R=G=B=v) map to luma exactly v."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.llm.imagehash import (
        gray_u8,
        image_ahash,
        image_dhash,
    )

    ramp = np.repeat(
        np.tile(np.arange(0, 90, 5, dtype=np.uint8), (16, 1))[:, :, None],
        3, axis=2,
    )  # 16 rows × 18 cols, +5 per col
    assert image_dhash(ramp) == (0xFFFFFFFF, 0xFFFFFFFF)
    assert image_dhash(ramp[:, ::-1]) == (0, 0)
    v = np.full((4, 4, 3), 200, dtype=np.uint8)
    assert int(gray_u8(v)[0, 0]) == 200
    # aHash of a flat image: no cell exceeds the mean -> all zero
    assert image_ahash(v) == (0, 0)


def test_image_neardup_pairs_planted(spark):
    """Banded near-dup join finds a planted ≤4-bit pair, excludes a
    far pair, and the plan is equi-join only (no BNLJ/cartesian)."""
    from dynamodb_to_datalake_project_spark.llm.imagehash import (
        image_neardup_pairs,
    )

    rows = [
        # a/b differ in 2 low bits of dhash_lo; c is ~32 bits away
        (1, 0x12345678, 0x9ABCDEF0),
        (2, 0x12345678, 0x9ABCDEF3),
        (3, 0x76543210, 0x0FEDCBA9),
    ]
    hashes = spark.createDataFrame(rows, "doc_id long, dhash_hi long, dhash_lo long")
    got = image_neardup_pairs(hashes, max_hamming=4).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in got] == [(1, 2, 2)]
    plan = (
        image_neardup_pairs(hashes)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    import pytest as _pt

    with _pt.raises(ValueError, match="max_hamming"):
        image_neardup_pairs(hashes, max_hamming=8)


def test_image_hashes_roundtrip(spark):
    """image_hashes decodes REAL BMP payloads: a ramp image through
    encode_bmp_array yields the all-ones dhash and a correct bit
    count."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.llm.imagehash import image_hashes
    from dynamodb_to_datalake_project_spark.llm.multimodal import (
        encode_bmp_array,
    )

    ramp = np.repeat(
        np.tile(np.arange(0, 90, 5, dtype=np.uint8), (16, 1))[:, :, None],
        3, axis=2,
    )
    payload = encode_bmp_array(ramp, 18, 16)
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id long, payload binary")
    row = image_hashes(df).collect()[0]
    assert (row.dhash_hi, row.dhash_lo) == (0xFFFFFFFF, 0xFFFFFFFF)
    assert row.dhash_bits == 64


def test_zip_roundtrip_and_interop():
    """encode_zip → parse_zip roundtrips (deflate + stored), and both
    directions interoperate with stdlib zipfile (our archives read by
    zipfile; zipfile's archives read by our parse)."""
    import io
    import zipfile

    from dynamodb_to_datalake_project_spark.llm.ziparc import (
        encode_zip,
        parse_zip,
    )

    m = [("a.txt", b"hello world" * 10), ("b.bin", bytes(range(256)))]
    z = encode_zip(m, deflate={"a.txt"})
    d = parse_zip(z)
    assert d["members"] == m
    assert (d["n_deflated"], d["n_stored"]) == (1, 1)

    zf = zipfile.ZipFile(io.BytesIO(z))
    assert zf.read("a.txt") == m[0][1]
    assert zf.testzip() is None

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        w.writestr("x.txt", "some text payload " * 20)
    got = dict(parse_zip(buf.getvalue())["members"])
    assert got["x.txt"] == b"some text payload " * 20


def test_zip_corruption_rejects():
    """Every quarantine class: missing EOCD, bad comment length, CRC
    mismatch, central/local name mismatch, truncated member data,
    central-directory count mismatch — ValueError; encryption,
    data-descriptor, zip64 and exotic methods — NotImplementedError."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.ziparc import (
        encode_zip,
        parse_zip,
    )

    z = bytearray(encode_zip([("f.txt", b"payload bytes here")]))

    with _pt.raises(ValueError, match="end-of-central-directory"):
        parse_zip(b"PK\x03\x04 not a real zip")
    bad_comment = bytes(z) + b"trailing junk"  # comment_len says 0
    with _pt.raises(ValueError, match="comment length"):
        parse_zip(bad_comment)

    flipped = bytearray(z)
    flipped[30 + 5 + 3] ^= 0xFF  # a data byte of the stored member
    with _pt.raises(ValueError, match="CRC-32 mismatch"):
        parse_zip(bytes(flipped))

    renamed = bytearray(z)
    renamed[30] = ord("g")  # local header name only
    with _pt.raises(ValueError, match="name mismatch"):
        parse_zip(bytes(renamed))

    # corrupt the central count: EOCD total-entries field -> 2
    eocd = bytes(z).rfind(b"PK\x05\x06")
    counted = bytearray(z)
    struct.pack_into("<HH", counted, eocd + 8, 2, 2)
    with _pt.raises(ValueError, match="bad central directory"):
        parse_zip(bytes(counted))

    # flags: encrypted / data descriptor (patch central entry flags)
    cdir = bytes(z).find(b"PK\x01\x02")
    for flag, msg in ((0x1, "encrypted"), (0x8, "data descriptors")):
        patched = bytearray(z)
        struct.pack_into("<H", patched, cdir + 8, flag)
        with _pt.raises(NotImplementedError, match=msg):
            parse_zip(bytes(patched))
    patched = bytearray(z)
    struct.pack_into("<H", patched, cdir + 10, 9)  # method 9 (deflate64)
    with _pt.raises(NotImplementedError, match="method 9"):
        parse_zip(bytes(patched))


def test_wiki_dump_parse_and_rejects():
    """Export-XML walk: entity-escaped titles/text roundtrip, redirect
    attribute extraction, multi-page walks; malformed dumps (missing
    root, unclosed page/revision/text, missing title, non-integer ns,
    unknown entity) raise ValueError."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.wikidump import (
        encode_wiki_dump,
        parse_wiki_dump,
    )

    pages = [
        {"title": "A & B <x>", "ns": 0, "id": 1,
         "text": 'body with "quotes" & <tags>'},
        {"title": "R", "ns": 4, "id": 2, "redirect": "A & B <x>",
         "text": "#REDIRECT [[A]]"},
    ]
    got = parse_wiki_dump(encode_wiki_dump(pages))
    assert [p["title"] for p in got] == ["A & B <x>", "R"]
    assert got[0]["text"] == pages[0]["text"]
    assert got[0]["redirect"] is None
    assert got[1]["redirect"] == "A & B <x>"
    assert got[1]["ns"] == 4

    ok = encode_wiki_dump(pages[:1])
    cases = [
        ("no root at all", "missing <mediawiki>"),
        (ok.replace("</mediawiki>", ""), "unclosed <mediawiki>"),
        (ok.replace("</page>", ""), "unclosed <page>"),
        (ok.replace("<title>", "<notitle>").replace("</title>", "</notitle>"),
         "missing title/ns/id"),
        (ok.replace("<ns>0</ns>", "<ns>zero</ns>"), "non-integer <ns>"),
        (ok.replace("</revision>", ""), "unclosed <revision>"),
        (ok.replace("&amp;", "&bogus;"), "unknown XML entity"),
    ]
    for xml, msg in cases:
        with _pt.raises(ValueError, match=msg):
            parse_wiki_dump(xml)


def test_strip_wikitext_branches():
    """Every strip rule: refs (paired + self-closing), templates,
    plain and piped links, headings, bold, italic, redirect."""
    from dynamodb_to_datalake_project_spark.llm.wikidump import (
        strip_wikitext,
    )

    d = strip_wikitext(
        "== Top ==\n"
        "See [[plain]] and [[Target|piped]] text<ref>cite</ref> "
        "with {{tmpl|arg}}word '''bold''' and ''ital''<ref name=x/> end"
    )
    assert d["text"] == (
        "Top\nSee plain and piped text with word bold and ital end"
    )
    assert (d["links"], d["templates"], d["refs"]) == (2, 1, 2)
    assert (d["bold"], d["italic"], d["headings"]) == (1, 1, 1)
    r = strip_wikitext("#REDIRECT [[Elsewhere]]")
    assert r["redirect"] == 1 and r["text"] == ""


def test_warc_to_wet_conversion():
    """WET product: 200/text-html responses become text/plain
    conversion records with WARC-Refers-To; decoys (404, text/plain)
    yield none; an empty WARC yields just the warcinfo record."""
    from dynamodb_to_datalake_project_spark.llm.warc import (
        encode_http_response,
        encode_warc,
        iter_warc_records,
    )
    from dynamodb_to_datalake_project_spark.llm.web import (
        synth_html,
        warc_to_wet,
    )

    text = "alpha beta gamma delta " * 8
    page = synth_html(3, text, "web").encode("utf-8")
    raw = encode_warc(
        [
            {"type": "warcinfo", "block": b"software: t\r\n"},
            {"type": "response", "uri": "https://a.example/p",
             "block": encode_http_response(200, "text/html", page)},
            {"type": "response", "uri": "https://a.example/404",
             "block": encode_http_response(404, "text/html", b"x")},
        ]
    )
    wet = warc_to_wet(raw)
    recs = list(iter_warc_records(wet))
    convs = [r for r in recs if r[0].get("warc-type") == "conversion"]
    assert len(recs) == 2 and len(convs) == 1
    headers, block = convs[0]
    assert headers["content-type"] == "text/plain"
    assert headers["warc-target-uri"] == "https://a.example/p"
    assert "urn:uuid" in headers["warc-refers-to"]
    assert block.decode("utf-8") == text

    empty = warc_to_wet(encode_warc(
        [{"type": "warcinfo", "block": b"software: t\r\n"}]
    ))
    assert len(list(iter_warc_records(empty))) == 1


def test_bitext_mine_planted(spark):
    """Margin mining on hand-built vectors: a planted identical pair
    is mutual-best with a high margin; a hub vector close to
    everything is suppressed by the top-k normalization; non-mutual
    bests never surface."""
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        bitext_mine,
    )

    # src 1 == tgt 10 (planted); src 2 near-orthogonal to everything;
    # tgt 11/12 are decoys correlated with BOTH src vectors (hubs get
    # normalized away by the top-k divisor)
    src = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    tgt = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [0.5, 0.5, 0.1, 0.0]),
            (12, [0.4, 0.6, 0.0, 0.1]),
        ],
        "vec_id long, v array<double>",
    )
    got = bitext_mine(src, tgt, k=2, threshold_ppm=1_050_000).collect()
    rows = {(r.src_id, r.tgt_id): r for r in got}
    assert (1, 10) in rows
    r = rows[(1, 10)]
    assert r.cos_ppm == 1_000_000
    assert r.margin_ppm > 1_050_000
    # src 2's best (tgt 12, cos .8) is mutual too but margin-weak vs
    # its own top-2 sum — verify anything else surfacing passed the
    # threshold honestly
    for key, row in rows.items():
        assert row.margin_ppm > 1_050_000


def test_extract_html_tables_branches():
    """Table lift: header detection (all-th first row), attribute
    noise ignored, entity decode, multiple tables; nested tables and
    colspan/rowspan raise NotImplementedError; ragged and cell-less
    rows raise ValueError."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.web import (
        extract_html_tables,
    )

    html = (
        "<p>x</p><table id=t1><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1 &amp; 2</td><td align=r>2</td></tr></table>"
        "<table><tr><td>only</td></tr></table>"
    )
    t1, t2 = extract_html_tables(html)
    assert t1["header"] == ["a", "b"]
    assert t1["rows"] == [["1 & 2", "2"]]
    assert (t1["n_rows"], t1["n_cols"]) == (1, 2)
    assert t2["header"] is None and t2["rows"] == [["only"]]

    with _pt.raises(NotImplementedError, match="nested"):
        extract_html_tables(
            "<table><tr><td><table><tr><td>x</td></tr></table>"
            "</td></tr></table>"
        )
    with _pt.raises(NotImplementedError, match="colspan"):
        extract_html_tables(
            '<table><tr><td colspan="2">x</td></tr></table>'
        )
    with _pt.raises(ValueError, match="ragged"):
        extract_html_tables(
            "<table><tr><td>a</td></tr><tr><td>b</td><td>c</td></tr></table>"
        )
    with _pt.raises(ValueError, match="no th/td"):
        extract_html_tables("<table><tr>bare</tr></table>")


def test_audio_energy_fingerprint():
    """Envelope hash: a strictly loudening staircase (energy rises
    every frame) sets all 64 bits; reversing it clears them; too-short
    signals raise; a one-frame bump moves only the adjacent bits."""
    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.audiofp import (
        audio_energy_fingerprint,
    )

    up = np.repeat(np.arange(1, 66, dtype=np.int64) * 10, 10)
    assert audio_energy_fingerprint(up) == (0xFFFFFFFF, 0xFFFFFFFF)
    assert audio_energy_fingerprint(up[::-1]) == (0, 0)
    with _pt.raises(ValueError, match="need"):
        audio_energy_fingerprint(np.arange(10))

    from dynamodb_to_datalake_project_spark.llm.audiofp import (
        _fixture_samples,
    )

    h0 = audio_energy_fingerprint(_fixture_samples(0))
    h1 = audio_energy_fingerprint(_fixture_samples(1))
    h4 = audio_energy_fingerprint(_fixture_samples(4))
    ham = lambda a, b: bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")  # noqa: E731
    assert ham(h0, h1) <= 2
    assert ham(h0, h4) > 7


def test_detect_scene_cuts():
    """Cut scan on hand-built frames: identical frames yield no cuts,
    a hard color jump fires exactly one at the right index, jitter
    below threshold stays quiet, diffs are integer-exact."""
    import numpy as np

    from dynamodb_to_datalake_project_spark.llm.multimodal import (
        detect_scene_cuts,
    )

    flat = lambda v: np.full((8, 8, 3), v, dtype=np.uint8)  # noqa: E731
    d = detect_scene_cuts([flat(100), flat(100), flat(101)])
    assert d["cuts"] == [] and d["sum_diff"] == 3 and d["max_diff"] == 3
    d = detect_scene_cuts([flat(100), flat(100), flat(200), flat(200)])
    assert d["cuts"] == [2] and d["max_diff"] == 300
    assert detect_scene_cuts([flat(5)]) == {
        "cuts": [], "sum_diff": 0, "max_diff": 0,
    }


def test_banded_hamming_band_widths(spark):
    """The corpus-size dial: 8-bit bands (recall ≤ 7) and 16-bit
    bands (recall ≤ 3) find the same close pair; out-of-range
    max_hamming and bad widths raise."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.imagehash import (
        banded_hamming_pairs,
    )

    rows = [
        (1, 0x12345678, 0x9ABCDEF0),
        (2, 0x12345678, 0x9ABCDEF3),  # 2 bits off doc 1
        (3, 0x76543210, 0x0FEDCBA9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, dhash_hi long, dhash_lo long")
    for bb, mh in ((8, 4), (16, 3)):
        got = banded_hamming_pairs(df, max_hamming=mh, band_bits=bb).collect()
        assert [(r.doc_a, r.doc_b, r.hamming) for r in got] == [(1, 2, 2)]
    with _pt.raises(ValueError, match=r"\[0, 3\]"):
        banded_hamming_pairs(df, max_hamming=4, band_bits=16)
    with _pt.raises(ValueError, match="band_bits"):
        banded_hamming_pairs(df, band_bits=32)


def test_kneser_ney_hand_computed(spark):
    """KN probabilities on a tiny corpus, hand-computed: corpus
    'a b a b a c' gives bigrams ab:2, ba:2, ac:1; P_KN sums to 1 over
    each context's followers (the interpolation identity), and the
    scored avg_nll matches the closed-form."""
    import math

    from dynamodb_to_datalake_project_spark.llm.lm import kn_score_docs

    docs = spark.createDataFrame(
        [(0, "a b a b a c")], "doc_id long, text string"
    )
    got = kn_score_docs(docs).collect()[0]
    assert got.n_bigrams == 5
    # model: c_ab=2 c_ba=2 c_ac=1; c_a=3 c_b=2; N1+(a·)=2 N1+(b·)=1
    # N1+(·a)=1 N1+(·b)=1 N1+(·c)=1; N1+(··)=3; D=3/4
    def p(c_xy, c_x, nfx, npw):
        return (max(c_xy - 0.75, 0) + 0.75 * nfx * (npw / 3)) / c_x

    p_ab = p(2, 3, 2, 1)
    p_ba = p(2, 2, 1, 1)
    p_ac = p(1, 3, 2, 1)
    # interpolation identity: P(a|a)+P(b|a)+P(c|a) = 1 (unseen 'a a'
    # gets pure continuation mass)
    assert abs(p_ab + p_ac + p(0, 3, 2, 1) - 1.0) < 1e-12
    expect = -(2 * math.log(p_ab) + 2 * math.log(p_ba)
               + math.log(p_ac)) / 5
    assert abs(got.avg_nll - round(expect, 6)) < 2e-6


def test_gopher_rules_flags(spark):
    """Each Gopher rule on a crafted doc: a clean 60-word doc with
    stopwords passes all; symbol/bullet/ellipsis/digit/short/
    stopword-free variants fail exactly their rule. Plan stays
    Python-free."""
    from dynamodb_to_datalake_project_spark.llm.text import gopher_rules

    clean = "the of " + " ".join(f"word{i:02d}" for i in range(58))
    rows = [
        (0, clean),
        (1, "the of " + " ".join("#w%d" % i for i in range(58))),
        (2, "\n".join("- the of " + " ".join(["wordy"] * 15)
                      for _ in range(4))),
        (3, "\n".join("the of " + " ".join(["wordy"] * 15) + "..."
                      for _ in range(4))),
        (4, "the of " + " ".join(str(1000 + i) for i in range(58))),
        (5, "the of tiny doc"),
        (6, " ".join(f"word{i:02d}" for i in range(60))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert out[0].keep == 1
    assert out[1].r_symbol == 0 and out[1].keep == 0
    assert out[2].r_bullet == 0
    assert out[3].r_ellipsis == 0
    assert out[4].r_alpha == 0
    assert out[5].r_wordcount == 0
    assert out[6].r_stopword == 0 and out[6].r_wordcount == 1
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_parquet_handwriter_three_readers():
    """Round-9: the zero-dep parquet WRITER — thrift compact footer,
    PLAIN v1 pages, RLE def levels, multi row group, all four codecs
    the zero-dep reader decodes (SNAPPY and ZSTD pages via the
    engine's own encoders, GZIP via RFC 1952 members), per-chunk
    min/max/null_count statistics with TypeDefinedOrder column_orders
    — opened by pyarrow, DuckDB and the zero-dep reader; nulls
    round-trip; pyarrow trusts the stats (has_min_max); a NaN DOUBLE
    chunk carries no min/max; subset boundaries raise."""
    import io

    import duckdb
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        parse_parquet_footer,
        read_parquet_column_full,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        write_parquet,
    )

    words = "pack my box with five dozen liquor jugs".split() * 9
    idx = list(range(len(words)))
    opt = [i if i % 4 else None for i in idx]
    dbl = [i * 0.25 for i in idx]
    for codec in ("UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4_RAW"):
        payload = write_parquet(
            {
                "idx": ("INT64", idx),
                "word": ("BYTE_ARRAY", words),
                "score": ("DOUBLE", dbl),
                "opt": ("INT64", opt),
            },
            codec=codec,
            row_group_size=23,
        )
        pf = pq.ParquetFile(io.BytesIO(payload))
        t = pf.read()
        assert t.column("idx").to_pylist() == idx
        assert t.column("word").to_pylist() == words
        assert t.column("score").to_pylist() == dbl
        assert t.column("opt").to_pylist() == opt
        assert read_parquet_column_full(payload, "idx") == idx
        meta = parse_parquet_footer(payload)
        assert meta["num_rows"] == len(words)
        # pyarrow (independent impl) trusts the hand-written chunk
        # statistics: min/max in type order, null counts exact.
        md = pf.metadata
        for rg in range(md.num_row_groups):
            lo, hi = rg * 23, min(rg * 23 + 23, len(words))
            st = md.row_group(rg).column(0).statistics
            assert st.has_min_max and (st.min, st.max) == (lo, hi - 1)
            assert st.null_count == 0
            stw = md.row_group(rg).column(1).statistics
            assert (stw.min, stw.max) == (
                min(words[lo:hi]),
                max(words[lo:hi]),
            )
            sto = md.row_group(rg).column(3).statistics
            assert sto.null_count == sum(
                1 for v in opt[lo:hi] if v is None
            )
        # a DOUBLE chunk containing NaN must carry no min/max
        nan_payload = write_parquet(
            {"x": ("DOUBLE", [1.0, float("nan"), 3.0])}, codec=codec
        )
        stn = (
            pq.ParquetFile(io.BytesIO(nan_payload))
            .metadata.row_group(0)
            .column(0)
            .statistics
        )
        assert not (stn and stn.has_min_max)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM read_parquet(?)",
            [_write_tmp(payload)],
        )
        got = con.execute(
            "SELECT count(*), sum(idx), count(opt) FROM t"
        ).fetchone()
        assert got == (len(words), sum(idx), sum(1 for v in opt if v is not None))
        con.close()

    with _pt.raises(NotImplementedError, match="codec"):
        write_parquet({"a": ("INT64", [1])}, codec="BROTLI")
    with _pt.raises(NotImplementedError, match="type"):
        write_parquet({"a": ("INT96", [1])})
    with _pt.raises(ValueError, match="ragged"):
        write_parquet({"a": ("INT64", [1]), "b": ("INT64", [1, 2])})


def test_parquet_handwriter_int32_float_boolean():
    """Round-9: the writer/reader pair over the remaining practical
    primitives — INT32 (dates), FLOAT (embeddings), BOOLEAN
    (bit-packed PLAIN, never dictionary-encoded) — incl. nullable
    columns, across all five codecs and dictionary on/off; pyarrow,
    DuckDB and the zero-dep reader all agree; INT32 stats trusted."""
    import io

    import duckdb
    import pyarrow.parquet as pq

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        write_parquet,
    )

    n = 240
    i32 = [i - 120 for i in range(n)]
    f32 = [float(i % 9) * 0.5 for i in range(n)]
    bl = [i % 3 == 0 for i in range(n)]
    obl = [bool(i % 2) if i % 5 else None for i in range(n)]
    oi32 = [i * 2 if i % 4 else None for i in range(n)]
    for codec in ("UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4_RAW"):
        for dic in (False, True):
            payload = write_parquet(
                {
                    "i32": ("INT32", i32),
                    "f32": ("FLOAT", f32),
                    "b": ("BOOLEAN", bl),
                    "ob": ("BOOLEAN", obl),
                    "oi": ("INT32", oi32),
                },
                codec=codec,
                row_group_size=77,
                dictionary=dic,
            )
            pf = pq.ParquetFile(io.BytesIO(payload))
            t = pf.read()
            assert t.column("i32").to_pylist() == i32, (codec, dic)
            assert t.column("f32").to_pylist() == f32
            assert t.column("b").to_pylist() == bl
            assert t.column("ob").to_pylist() == obl
            assert t.column("oi").to_pylist() == oi32
            assert read_parquet_column_full(payload, "i32") == i32
            assert read_parquet_column_full(payload, "f32") == f32
            assert read_parquet_column_full(payload, "b") == bl
            assert read_parquet_column_full(payload, "ob") == obl
            con = duckdb.connect()
            got = con.execute(
                "SELECT count(*), sum(i32),"
                " sum(CASE WHEN b THEN 1 ELSE 0 END), count(ob)"
                " FROM read_parquet(?)",
                [_write_tmp(payload)],
            ).fetchone()
            assert got == (
                n,
                sum(i32),
                sum(bl),
                sum(1 for v in obl if v is not None),
            )
            con.close()
            st = pf.metadata.row_group(0).column(0).statistics
            assert st.has_min_max and st.min == -120


def test_parquet_v2_pages_and_delta_encodings():
    """Round-9: the zero-dep reader over parquet v2 files written by
    pyarrow (the independent implementation) — DataPageV2 (levels
    uncompressed and un-prefixed ahead of the compressed value
    section), DELTA_BINARY_PACKED (INT32+INT64, negative deltas,
    nulls), DELTA_LENGTH_BYTE_ARRAY and front-coded DELTA_BYTE_ARRAY
    — across all four codecs and both page versions; v2 pages with
    dictionary encoding; malformed delta streams raise."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _delta_binary_packed,
        _delta_byte_array,
        read_parquet_column_full,
    )

    n = 3000
    idx = list(range(n))
    neg = [(-1) ** i * i * 7 for i in idx]
    words = [f"prefix_shared_{i // 5}_{i % 5}" for i in idx]
    opt = [w if i % 4 else None for i, w in enumerate(words)]
    oint = [i * 3 if i % 5 else None for i in idx]
    t = pa.table(
        {
            "idx": pa.array(idx, pa.int64()),
            "i32": pa.array(idx, pa.int32()),
            "neg": pa.array(neg, pa.int64()),
            "word": pa.array(words, pa.string()),
            "opt": pa.array(opt, pa.string()),
            "oint": pa.array(oint, pa.int64()),
        }
    )
    enc = {
        "idx": "DELTA_BINARY_PACKED",
        "i32": "DELTA_BINARY_PACKED",
        "neg": "DELTA_BINARY_PACKED",
        "word": "DELTA_BYTE_ARRAY",
        "opt": "DELTA_LENGTH_BYTE_ARRAY",
        "oint": "DELTA_BINARY_PACKED",
    }
    for comp in ("NONE", "SNAPPY", "GZIP", "ZSTD"):
        for dpv in ("1.0", "2.0"):
            buf = io.BytesIO()
            pq.write_table(
                t, buf, use_dictionary=False, version="2.6",
                compression=comp, data_page_version=dpv,
                row_group_size=700, column_encoding=enc,
            )
            payload = buf.getvalue()
            assert read_parquet_column_full(payload, "idx") == idx
            assert read_parquet_column_full(payload, "i32") == idx
            assert read_parquet_column_full(payload, "neg") == neg
            assert read_parquet_column_full(payload, "word") == [
                w.encode() for w in words
            ]
            assert read_parquet_column_full(payload, "opt") == [
                None if v is None else v.encode() for v in opt
            ]
            assert read_parquet_column_full(payload, "oint") == oint
    # v2 pages with pyarrow's default dictionary encoding
    buf = io.BytesIO()
    pq.write_table(
        t, buf, version="2.6", data_page_version="2.0",
        compression="SNAPPY", row_group_size=700,
    )
    payload = buf.getvalue()
    assert read_parquet_column_full(payload, "idx") == idx
    assert read_parquet_column_full(payload, "opt") == [
        None if v is None else v.encode() for v in opt
    ]
    # malformed delta streams raise, never mis-decode
    with _pt.raises(ValueError, match="truncated varint"):
        _delta_binary_packed(b"\x80", 0, 1)
    with _pt.raises(ValueError, match="bad delta-binary-packed"):
        _delta_binary_packed(b"\x80\x01\x00\x05\x02", 0, 1)  # 0 minis
    with _pt.raises(ValueError, match="holds"):
        _delta_binary_packed(b"\x80\x01\x04\x01\x02", 0, 5)  # 1 < 5
    # prefix length exceeding the prior value: prefixes [0, 10] but
    # value0 is only 2 bytes. Streams hand-built: block=128 (varint
    # 80 01), 4 miniblocks, total=2, first (zigzag), then one block
    # header min_delta (zigzag) + 4 zero width bytes (no data).
    prefixes = b"\x80\x01\x04\x02\x00" + b"\x14" + b"\x00" * 4
    suffixes = b"\x80\x01\x04\x02\x04" + b"\x03" + b"\x00" * 4 + b"ab"
    with _pt.raises(ValueError, match="prefix exceeds"):
        _delta_byte_array(prefixes + suffixes, 0, 2)


def test_parquet_byte_stream_split():
    """Round-9: BYTE_STREAM_SPLIT decode — stream j carries byte j of
    every value — over pyarrow-written float64/float32/int64 columns
    (incl. nulls) across codecs and both page versions; truncated
    sections raise."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _byte_stream_split,
        read_parquet_column_full,
    )

    n = 2000
    f64 = [i * 0.125 - 40.0 for i in range(n)]
    f32 = [float(i % 97) for i in range(n)]
    of64 = [v if i % 3 else None for i, v in enumerate(f64)]
    i64 = [i * 11 - 500 for i in range(n)]
    t = pa.table(
        {
            "f64": pa.array(f64, pa.float64()),
            "f32": pa.array(f32, pa.float32()),
            "of64": pa.array(of64, pa.float64()),
            "i64": pa.array(i64, pa.int64()),
        }
    )
    enc = {c: "BYTE_STREAM_SPLIT" for c in t.column_names}
    for comp in ("NONE", "SNAPPY", "ZSTD"):
        for dpv in ("1.0", "2.0"):
            buf = io.BytesIO()
            pq.write_table(
                t, buf, use_dictionary=False, version="2.6",
                compression=comp, data_page_version=dpv,
                row_group_size=450, column_encoding=enc,
            )
            payload = buf.getvalue()
            assert read_parquet_column_full(payload, "f64") == f64
            assert read_parquet_column_full(payload, "f32") == f32
            assert read_parquet_column_full(payload, "of64") == of64
            assert read_parquet_column_full(payload, "i64") == i64
    assert _byte_stream_split(
        bytes([1, 2, 0, 0, 0, 0, 0, 0]), 0, 2, 1
    ) == [1, 2]
    with _pt.raises(ValueError, match="truncated"):
        _byte_stream_split(b"\x00" * 7, 0, 2, 1)
    with _pt.raises(NotImplementedError, match="BYTE_STREAM_SPLIT"):
        _byte_stream_split(b"\x00" * 8, 0, 1, 6)


def test_parquet_handwriter_dictionary_pages():
    """Round-9: dictionary-encoded writes — PLAIN dictionary page in
    first-occurrence order + RLE_DICTIONARY data pages (1-byte bit
    width, hybrid runs: bit-packed groups of 8, RLE for runs >= 8,
    length-1 RLE remainders), dictionary_page_offset in the footer —
    across all four codecs, multi row group, nullable columns; read
    back by pyarrow, DuckDB and the zero-dep reader."""
    import io

    import duckdb
    import pyarrow.parquet as pq

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        write_parquet,
    )

    words = "pack my box with five dozen liquor jugs".split() * 30
    idx = list(range(len(words)))
    rep = [i // 37 for i in idx]  # long runs exercise the RLE branch
    opt = [w if i % 4 else None for i, w in enumerate(words)]
    dbl = [float(i % 9) * 0.5 for i in idx]
    for codec in ("UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD"):
        for rg in (77, None):
            payload = write_parquet(
                {
                    "idx": ("INT64", idx),
                    "word": ("BYTE_ARRAY", words),
                    "rep": ("INT64", rep),
                    "opt": ("BYTE_ARRAY", opt),
                    "score": ("DOUBLE", dbl),
                },
                codec=codec,
                row_group_size=rg,
                dictionary=True,
            )
            pf = pq.ParquetFile(io.BytesIO(payload))
            t = pf.read()
            assert t.column("idx").to_pylist() == idx
            assert t.column("word").to_pylist() == words
            assert t.column("rep").to_pylist() == rep
            assert t.column("opt").to_pylist() == opt
            assert t.column("score").to_pylist() == dbl
            assert read_parquet_column_full(payload, "word") == [
                w.encode() for w in words
            ]
            assert read_parquet_column_full(payload, "opt") == [
                None if v is None else v.encode() for v in opt
            ]
            con = duckdb.connect()
            got = con.execute(
                "SELECT count(*), sum(idx), count(opt), sum(score) "
                "FROM read_parquet(?)",
                [_write_tmp(payload)],
            ).fetchone()
            assert got == (
                len(idx),
                sum(idx),
                sum(1 for v in opt if v),
                sum(dbl),
            )
            con.close()
            st = pf.metadata.row_group(0).column(0).statistics
            assert st.has_min_max and st.min == 0
    # dictionary actually shrinks the repetitive table
    dict_sz = len(
        write_parquet({"word": ("BYTE_ARRAY", words)}, dictionary=True)
    )
    plain_sz = len(write_parquet({"word": ("BYTE_ARRAY", words)}))
    assert dict_sz < plain_sz / 2, (dict_sz, plain_sz)


def test_parquet_handwriter_read_by_spark(spark):
    """Round-9: parquet-mr (Spark's JVM reader — a THIRD independent
    parquet implementation after pyarrow and DuckDB) reads the
    hand-written files: every codec incl. our-snappy/our-lz4/our-zstd
    pages, dictionary encoding, bit-packed booleans, nullable
    columns; values match the source exactly."""
    import tempfile

    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        write_parquet,
    )

    n = 180
    idx = list(range(n))
    words = [f"w{i % 13}" for i in range(n)]
    opt = [i if i % 4 else None for i in idx]
    bl = [i % 3 == 0 for i in range(n)]
    dbl = [i * 0.25 for i in idx]
    for codec in ("UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4_RAW"):
        for dic in (False, True):
            payload = write_parquet(
                {
                    "idx": ("INT64", idx),
                    "word": ("BYTE_ARRAY", words),
                    "opt": ("INT64", opt),
                    "b": ("BOOLEAN", bl),
                    "score": ("DOUBLE", dbl),
                },
                codec=codec,
                row_group_size=77,
                dictionary=dic,
            )
            d = tempfile.mkdtemp()
            with open(f"{d}/part-0.parquet", "wb") as f:
                f.write(payload)
            rows = sorted(
                spark.read.parquet(d).collect(), key=lambda r: r.idx
            )
            assert [r.idx for r in rows] == idx, (codec, dic)
            assert [r.word for r in rows] == words
            assert [r.opt for r in rows] == opt
            assert [r.b for r in rows] == bl
            assert [r.score for r in rows] == dbl


def test_snappy_encoder_cross_implementations():
    """Round-9: the pure-Python snappy block ENCODER — varint
    preamble, greedy 4-byte-hash matches as 2-byte-offset copies
    chunked at 64, 1/2-byte literal lengths — decoded back by BOTH
    the engine's own `snappy_decompress` and pyarrow's snappy (an
    independent implementation), over empty/short/repetitive/random/
    long-match inputs; repetitive input actually shrinks."""
    import random

    import pyarrow as pa

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        snappy_decompress,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        snappy_compress,
    )

    rnd = random.Random(7)
    cases = [
        b"",
        b"a",
        b"abc",
        b"abcd" * 500,
        b"hello world " * 100,
        bytes(rnd.randrange(256) for _ in range(5000)),
        (b"the quick brown fox " * 7 + b"jumps over") * 40,
        bytes(rnd.randrange(4) for _ in range(70000)),
        b"x" * 100_000,  # one literal + a long chunked RLE-style copy
    ]
    for i, d in enumerate(cases):
        c = snappy_compress(d)
        assert snappy_decompress(c) == d, i
        assert (
            pa.decompress(
                c, decompressed_size=len(d), codec="snappy", asbytes=True
            )
            == d
        ), i
    assert len(snappy_compress(b"abcd" * 500)) < 120
    # max copy element is 64 bytes for 3 tag bytes -> ~4.7k floor
    assert len(snappy_compress(b"x" * 100_000)) < 5000


def test_lz4_encoder_cross_implementations():
    """Round-9: the pure-Python LZ4 block ENCODER — token nibbles,
    255-byte extensions, 2-byte offsets, spec end rules (no match in
    the last 12 bytes, matches end 5+ bytes before block end, final
    sequence literals-only) — decoded back by BOTH the engine's own
    `lz4_block_decompress` and pyarrow's lz4_raw, over empty/short/
    repetitive/random/long-run inputs; unbounded match lengths make
    the 100k run tiny."""
    import random

    import pyarrow as pa

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        lz4_block_decompress,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        lz4_block_compress,
    )

    rnd = random.Random(11)
    cases = [
        b"",
        b"a",
        b"abcd" * 500,
        b"hello world " * 100,
        bytes(rnd.randrange(256) for _ in range(5000)),
        (b"the quick brown fox " * 7 + b"jumps over") * 40,
        bytes(rnd.randrange(4) for _ in range(70000)),
        b"x" * 100_000,
        b"short12bytes",  # too short for any match per the end rule
        b"abcdabcdabcdabcd",  # matches exist but end rules bind
    ]
    for i, d in enumerate(cases):
        c = lz4_block_compress(d)
        assert lz4_block_decompress(c, len(d)) == d, i
        assert (
            pa.decompress(
                c, decompressed_size=len(d), codec="lz4_raw", asbytes=True
            )
            == d
        ), i
    assert len(lz4_block_compress(b"x" * 100_000)) < 500


def _write_tmp(payload: bytes) -> str:
    import tempfile

    f = tempfile.NamedTemporaryFile(suffix=".parquet", delete=False)
    f.write(payload)
    f.close()
    return f.name


def test_parquet_footer_vs_pyarrow():
    """The hand-rolled Thrift-compact footer parse agrees with
    pyarrow's own metadata object field-for-field on REAL files: the
    driver's fixture lake (snappy + dictionary encodings) and an
    in-memory multi-row-group write; corrupt magic/length raise."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        parse_parquet_footer,
    )

    for path in (
        "/root/testdata/sf0.001/documents.parquet",
        "/root/testdata/sf0.001/orders.parquet",
    ):
        payload = open(path, "rb").read()
        d = parse_parquet_footer(payload)
        m = pq.ParquetFile(path).metadata
        assert d["num_rows"] == m.num_rows
        assert len(d["row_groups"]) == m.num_row_groups
        assert [c["name"] for c in d["columns"]] == list(m.schema.names)
        assert d["created_by"] == m.created_by
        for i, rg in enumerate(d["row_groups"]):
            mrg = m.row_group(i)
            assert rg["num_rows"] == mrg.num_rows
            for j, c in enumerate(rg["columns"]):
                mc = mrg.column(j)
                assert c["num_values"] == mc.num_values
                assert c["codec"].lower() == mc.compression.lower()
                assert c["path"] == mc.path_in_schema

    table = pa.table({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    buf = io.BytesIO()
    pq.write_table(table, buf, row_group_size=30, compression="zstd")
    d = parse_parquet_footer(buf.getvalue())
    assert len(d["row_groups"]) == 4
    assert d["row_groups"][-1]["num_rows"] == 10
    assert d["row_groups"][0]["columns"][0]["codec"] == "ZSTD"

    with _pt.raises(ValueError, match="PAR1"):
        parse_parquet_footer(b"not parquet at all")
    good = buf.getvalue()
    bad = good[:-8] + (2**31 - 1).to_bytes(4, "little") + good[-4:]
    with _pt.raises(ValueError, match="footer length"):
        parse_parquet_footer(bad)


def test_parquet_column_scan_subset():
    """Zero-dep value read: int64/double/byte_array roundtrip across
    multiple row groups; unsupported shapes raise NotImplementedError
    (snappy codec, dictionary encoding, nulls) and a missing column
    raises ValueError."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column,
    )

    t = pa.table(
        {
            "a": pa.array(range(500), pa.int64()),
            "s": pa.array([f"w{i}" for i in range(500)], pa.string()),
            "d": pa.array([i / 4 for i in range(500)], pa.float64()),
        }
    )

    def wr(**kw):
        buf = io.BytesIO()
        pq.write_table(t, buf, **kw)
        return buf.getvalue()

    plain = wr(compression="NONE", use_dictionary=False, row_group_size=123)
    assert read_parquet_column(plain, "a") == list(range(500))
    assert read_parquet_column(plain, "s")[499] == b"w499"
    assert read_parquet_column(plain, "d")[8] == 2.0
    with _pt.raises(ValueError, match="no leaf column"):
        read_parquet_column(plain, "zz")
    with _pt.raises(NotImplementedError, match="UNCOMPRESSED"):
        read_parquet_column(
            wr(compression="snappy", use_dictionary=False), "a"
        )
    with _pt.raises(NotImplementedError, match="dictionary"):
        read_parquet_column(wr(compression="NONE"), "a")
    tn = pa.table({"a": pa.array([1, None, 3], pa.int64())})
    buf = io.BytesIO()
    pq.write_table(tn, buf, compression="NONE", use_dictionary=False)
    with _pt.raises(NotImplementedError, match="null"):
        read_parquet_column(buf.getvalue(), "a")


def test_snappy_decompress_and_lake_read():
    """Pure-Python snappy agrees with real compressed data (roundtrip
    through pyarrow's snappy writer via a real lake file), handles
    overlapping-copy RLE idioms, and rejects malformed streams; the
    full reader matches DuckDB on lineitem (600k rows via sf0.001's
    6k) including dictionary + snappy pages."""
    import duckdb
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
        snappy_decompress,
    )

    # overlapping copy: literal 'ab' + copy(offset 2, len 6) = 'abababab'
    # tag for copy-1: kind 1, len 6 -> (6-4)<<2 | 1; offset 2
    lit = bytes([8, (1 << 2) | 0]) + b"ab" + bytes([((6 - 4) << 2) | 1 | 0, 2])
    assert snappy_decompress(lit) == b"abababab"
    with _pt.raises(ValueError, match="offset out of range"):
        snappy_decompress(bytes([4, (1 << 2) | 0]) + b"ab" + bytes([1, 9]))
    with _pt.raises(ValueError, match="header says"):
        snappy_decompress(bytes([99, (1 << 2) | 0]) + b"ab")

    for table, col in (("lineitem", "l_orderkey"), ("customer", "c_name")):
        payload = open(f"/root/testdata/sf0.001/{table}.parquet", "rb").read()
        vals = read_parquet_column_full(payload, col)
        ref = [
            r[0] for r in duckdb.sql(
                f"SELECT {col} FROM "
                f"'/root/testdata/sf0.001/{table}.parquet'"
            ).fetchall()
        ]
        dec = [v.decode() if isinstance(v, bytes) else v for v in vals]
        assert dec == ref


def test_avro_container_roundtrip_and_rejects():
    """Avro container: all field types + optional unions roundtrip
    through both codecs and multi-block framing; corruption classes
    (bad magic, sync mismatch, union branch OOB, trailing block
    bytes, bad schema JSON) raise ValueError; unsupported schema
    shapes raise NotImplementedError."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.avrofile import (
        encode_avro,
        parse_avro,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "y", "type": "bytes"},
            {"name": "o", "type": ["null", "long"]},
        ],
    }
    recs = [
        {"i": -5, "b": True, "d": 1.5, "s": "héllo", "y": b"\x00\xff",
         "o": None},
        {"i": 2**40, "b": False, "d": -0.25, "s": "", "y": b"", "o": 7},
    ] * 5
    for codec in ("null", "deflate"):
        z = encode_avro(recs, schema, codec=codec, records_per_block=3)
        d = parse_avro(z)
        assert d["records"] == recs
        assert d["codec"] == codec
        assert d["n_blocks"] == 4  # ceil(10/3)

    z = bytearray(encode_avro(recs, schema))
    with _pt.raises(ValueError, match="bad magic"):
        parse_avro(b"Obj\x02" + bytes(z[4:]))
    corrupt = bytearray(z)
    corrupt[-1] ^= 0xFF  # last sync byte
    with _pt.raises(ValueError, match="sync marker"):
        parse_avro(bytes(corrupt))
    # arrays/maps/enums/fixed landed in round 9 (see
    # test_avro_arrays_and_iceberg_bounds_pruning); the remaining
    # honest boundary is nested complex types inside arrays
    with _pt.raises(NotImplementedError, match="not implemented"):
        encode_avro([], {"type": "record", "name": "x",
                        "fields": [{"name": "a",
                                    "type": {"type": "array",
                                             "items": {
                                                 "type": "map",
                                                 "values": "long"}}}]})
    with _pt.raises(NotImplementedError, match="codec"):
        encode_avro(recs, schema, codec="snappy")


def test_delta_log_replay():
    """Snapshot fold semantics: last action per path wins (re-add
    after remove is active), unknown actions ignored, non-contiguous
    versions / malformed JSON / checkpoint markers raise."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.deltalog import (
        replay_delta_log,
    )

    schema = json.dumps({"type": "struct", "fields": [
        {"name": "a", "type": "long", "nullable": True, "metadata": {}}]})
    c0 = "\n".join([
        json.dumps({"protocol": {"minReaderVersion": 1,
                                 "minWriterVersion": 2}}),
        json.dumps({"metaData": {"id": "t", "schemaString": schema,
                                 "partitionColumns": []}}),
        json.dumps({"add": {"path": "a.parquet", "size": 10,
                            "stats": json.dumps({"numRecords": 4})}}),
        json.dumps({"add": {"path": "b.parquet", "size": 20,
                            "stats": json.dumps({"numRecords": 6})}}),
        json.dumps({"futureAction": {"x": 1}}),  # forward-compat
    ])
    c1 = "\n".join([
        json.dumps({"remove": {"path": "a.parquet"}}),
        json.dumps({"add": {"path": "a.parquet", "size": 11,
                            "stats": json.dumps({"numRecords": 5})}}),
        json.dumps({"remove": {"path": "never-existed.parquet"}}),
    ])
    s = replay_delta_log([(1, c1), (0, c0)])  # order-insensitive input
    assert s["version"] == 1
    assert sorted(s["active_files"]) == ["a.parquet", "b.parquet"]
    assert s["active_files"]["a.parquet"]["num_records"] == 5
    assert s["total_rows"] == 11 and s["total_bytes"] == 31
    assert s["n_removed"] == 1  # phantom remove doesn't count
    assert s["schema_cols"] == ["a"]

    with _pt.raises(ValueError, match="contiguous"):
        replay_delta_log([(0, c0), (2, c1)])
    with _pt.raises(ValueError, match="malformed action"):
        replay_delta_log([(0, "not json")])
    with _pt.raises(NotImplementedError, match="checkpoint"):
        replay_delta_log([(0, json.dumps({"checkpointMetadata": {}}))])


def test_hudi_timeline_and_iceberg_metadata():
    """Hudi COW fold: latest file slice wins, censuses accumulate;
    compaction timelines and out-of-order instants raise. Iceberg:
    current snapshot resolved, v1 inline schema accepted, dangling
    current-snapshot-id and unknown format versions raise."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        parse_iceberg_metadata,
        replay_hudi_timeline,
    )

    c0 = json.dumps({"operationType": "insert", "partitionToWriteStats": {
        "p=1": [{"fileId": "fg-0", "path": "p=1/a.parquet",
                 "numWrites": 10, "numInserts": 10, "numDeletes": 0,
                 "numUpdateWrites": 0, "totalWriteBytes": 100}],
    }})
    c1 = json.dumps({"operationType": "upsert", "partitionToWriteStats": {
        "p=1": [{"fileId": "fg-0", "path": "p=1/b.parquet",
                 "numWrites": 12, "numInserts": 2, "numDeletes": 0,
                 "numUpdateWrites": 10, "totalWriteBytes": 120}],
    }})
    s = replay_hudi_timeline([("001", c0), ("002", c1)])
    assert s["n_file_groups"] == 1
    assert s["live_files"]["fg-0"]["path"] == "p=1/b.parquet"
    assert s["live_records"] == 12 and s["total_updates"] == 10
    with _pt.raises(ValueError, match="unique and in order"):
        replay_hudi_timeline([("002", c1), ("001", c0)])
    with _pt.raises(NotImplementedError, match="compaction"):
        replay_hudi_timeline([("001", json.dumps(
            {"operationType": "compact", "partitionToWriteStats": {}}))])

    v1 = {"format-version": 1, "schema": {"fields": [{"name": "x"}]},
          "snapshots": [], "current-snapshot-id": None}
    assert parse_iceberg_metadata(json.dumps(v1))["schema_cols"] == ["x"]
    with _pt.raises(ValueError, match="not in snapshots"):
        parse_iceberg_metadata(json.dumps({
            "format-version": 2, "schemas": [{"schema-id": 0, "fields": []}],
            "current-schema-id": 0, "current-snapshot-id": 99,
            "snapshots": [{"snapshot-id": 1}]}))
    with _pt.raises(NotImplementedError, match="format-version"):
        parse_iceberg_metadata(json.dumps({"format-version": 9}))


def test_tiff_codec_roundtrip_and_rejects():
    """Round-9 TIFF leg: lossless roundtrip across compression x byte
    order x strip layouts; PackBits replicate/literal/no-op paths; the
    honest boundaries (tiles, planar, LZW) and corruption rejects."""
    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.tiff import (
        decode_tiff_array,
        encode_tiff_array,
        packbits_decode,
        packbits_encode,
    )

    # PackBits unit semantics (TIFF 6.0 §9 worked example family)
    assert packbits_decode(packbits_encode(b"aaaa"), 4) == b"aaaa"
    assert packbits_decode(packbits_encode(b"abcd"), 4) == b"abcd"
    run_heavy = b"\x00" * 300 + b"xyz" + b"\xff" * 130
    enc = packbits_encode(run_heavy)
    assert len(enc) < len(run_heavy) // 3  # replicate runs compress
    assert packbits_decode(enc, len(run_heavy)) == run_heavy
    assert packbits_decode(b"\x80\x00a", 1) == b"a"  # 128 is a no-op
    with _pt.raises(ValueError, match="truncated literal"):
        packbits_decode(b"\x05ab", 6)
    with _pt.raises(ValueError, match="truncated replicate"):
        packbits_decode(b"\xfe", 3)
    with _pt.raises(ValueError, match="strip expects"):
        packbits_decode(packbits_encode(b"aaaa"), 5)

    rng = np.random.RandomState(9)
    for h, w in ((1, 3), (5, 7), (9, 2)):
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for comp in ("none", "packbits"):
            for be in (False, True):
                p = encode_tiff_array(arr, w, h, comp, 4, be)
                d = decode_tiff_array(p)
                assert np.array_equal(d["px"], arr), (h, w, comp, be)
                assert d["n_strips"] == -(-h // 4)
                assert d["byte_order"] == ("MM" if be else "II")

    flat = np.zeros((4, 4, 3), np.uint8)  # run-heavy image
    p = encode_tiff_array(flat, 4, 4, "packbits")
    assert len(p) < encode_tiff_array(flat, 4, 4, "none").__len__()
    assert np.array_equal(decode_tiff_array(p)["px"], flat)

    good = encode_tiff_array(flat, 4, 4, "none")
    with _pt.raises(ValueError, match="byte-order"):
        decode_tiff_array(b"XX" + good[2:])
    with _pt.raises(ValueError, match="bad magic"):
        decode_tiff_array(good[:2] + b"\x00\x00" + good[4:])
    with _pt.raises(ValueError, match="overruns"):
        decode_tiff_array(good[:40])  # strips cut off
    import struct as _st

    # tiled layout is an honest boundary: splice a TileWidth tag in
    tiled = encode_tiff_array(flat, 4, 4, "none", big_endian=False)
    ifd_at = _st.unpack_from("<I", tiled, 4)[0]
    n = _st.unpack_from("<H", tiled, ifd_at)[0]
    patched = bytearray(tiled)
    # overwrite the last entry's tag with TileWidth (322)
    _st.pack_into("<H", patched, ifd_at + 2 + 12 * (n - 1), 322)
    with _pt.raises(NotImplementedError, match="til"):
        decode_tiff_array(bytes(patched))


def test_iceberg_manifest_resolution():
    """Round-9: nested-record Avro roundtrip (manifest entries) and
    the full metadata → manifest-list → manifests walk; every
    redundant count the format carries rejects on mismatch."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.avrofile import (
        encode_avro,
        parse_avro,
    )
    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        MANIFEST_LIST_SCHEMA,
        MANIFEST_SCHEMA,
        resolve_iceberg_snapshot,
    )

    def entry(i, status, rec):
        return {
            "status": status,
            "snapshot_id": 7 if status == 1 else None,
            "data_file": {
                "file_path": f"data/f{i}.parquet",
                "file_format": "PARQUET",
                "partition": {"dt": f"2024-01-{1 + i % 2:02d}"},
                "record_count": rec,
                "file_size_in_bytes": 1000 * (i + 1),
            },
        }

    entries = [entry(0, 1, 10), entry(1, 1, 20), entry(2, 2, 5)]
    blob = encode_avro(entries, MANIFEST_SCHEMA, codec="deflate",
                       records_per_block=2)
    assert parse_avro(blob)["records"] == entries  # nested roundtrip

    ml_row = {
        "manifest_path": "meta/m0.avro", "manifest_length": len(blob),
        "partition_spec_id": 0, "added_snapshot_id": 7,
        "added_files_count": 2, "existing_files_count": 0,
        "deleted_files_count": 1, "added_rows_count": 30,
        "existing_rows_count": 0, "deleted_rows_count": 5,
    }
    files = {
        "meta/ml.avro": encode_avro([ml_row], MANIFEST_LIST_SCHEMA),
        "meta/m0.avro": blob,
    }
    meta = {
        "format-version": 2, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "fields": [{"name": "id"}]}],
        "current-snapshot-id": 7,
        "snapshots": [{
            "snapshot-id": 7, "manifest-list": "meta/ml.avro",
            "summary": {"total-records": "30", "total-data-files": "2"},
        }],
    }
    res = resolve_iceberg_snapshot(json.dumps(meta), files)
    assert res["live_files"] == 2 and res["live_records"] == 30
    assert res["deleted_files"] == 1 and res["live_bytes"] == 3000
    assert res["n_manifests"] == 1 and res["n_partitions"] == 2

    # manifest_length mismatch
    bad = dict(files, **{"meta/m0.avro": blob + b"x"})
    with _pt.raises(ValueError, match="manifest list says"):
        resolve_iceberg_snapshot(json.dumps(meta), bad)
    # per-manifest count drift
    lied = dict(ml_row, added_files_count=3)
    bad = dict(files, **{
        "meta/ml.avro": encode_avro([lied], MANIFEST_LIST_SCHEMA)})
    with _pt.raises(ValueError, match="entries say"):
        resolve_iceberg_snapshot(json.dumps(meta), bad)
    # summary drift
    meta_bad = json.loads(json.dumps(meta))
    meta_bad["snapshots"][0]["summary"]["total-records"] = "31"
    with _pt.raises(ValueError, match="manifest walk found"):
        resolve_iceberg_snapshot(json.dumps(meta_bad), files)
    # missing manifest file
    with _pt.raises(ValueError, match="missing"):
        resolve_iceberg_snapshot(
            json.dumps(meta), {"meta/ml.avro": files["meta/ml.avro"]})
    # v1 inline manifests stay an honest boundary
    meta_v1 = json.loads(json.dumps(meta))
    del meta_v1["snapshots"][0]["manifest-list"]
    with _pt.raises(NotImplementedError, match="manifest-list"):
        resolve_iceberg_snapshot(json.dumps(meta_v1), files)


def test_linkage_em_fit_properties():
    """Round-9: Fellegi-Sunter EM — on a cleanly separated census
    the learned parameters recover the planted structure (m high on
    agreeing-fields-among-matches, u low, λ near the match rate),
    and the SQL generator replays the Python evaluator bit-for-bit
    in DuckDB."""
    import duckdb

    from dynamodb_to_datalake_project_spark.llm.linkage import (
        _ROUNDS,
        em_fit,
        em_round_ctes,
    )

    counts = [40, 0, 3, 0, 25, 1, 0, 30]  # mostly patterns 0/4/7
    fit = em_fit(counts)
    assert 0.2 < fit["lam"] < 0.8
    assert fit["m"][2] < fit["m"][0]  # exact-match field rarer than first-char
    assert fit["u"][2] < 0.05  # non-matches almost never exact-equal
    assert fit["posterior"][7] > 0.95 and fit["posterior"][0] < 0.05

    con = duckdb.connect()
    c_defs = ", ".join(
        f"CAST({c} AS DOUBLE) AS c{p}" for p, c in enumerate(counts)
    )
    nn = "0.0"
    for p in range(8):
        nn = f"({nn} + c{p})"
    rounds, prev = "", "cc"
    for r in range(1, _ROUNDS + 1):
        rounds += f", r{r} AS ({em_round_ctes(prev, r)})"
        prev = f"r{r}"
    db = con.execute(
        f"WITH pp AS (SELECT 1 AS doc_id, [1] AS pats, 1 AS n), "
        f"cc AS (SELECT doc_id, pats, n, {c_defs}, {nn} AS nn FROM pp)"
        f"{rounds} SELECT lam, m1, m2, m3, u1, u2, u3, "
        + ", ".join(f"q{p}" for p in range(8))
        + f" FROM r{_ROUNDS}"
    ).fetchone()
    py = [fit["lam"]] + fit["m"] + fit["u"] + fit["posterior"]
    assert all(a == b for a, b in zip(py, db)), "EM not bit-identical"


def test_ingest_encoding_and_csv_sniff():
    """Round-9: the ingest front door — the UTF-16-before-UTF-8
    ordering trap, BOM table, cp1252/latin-1 split, RFC 4180 quoting
    edge cases, deterministic dialect choice and the header rule."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.ingest import (
        detect_encoding,
        parse_csv_rfc4180,
        sniff_csv_dialect,
    )

    text = "the quick brown fox 123"
    cases = [
        (text.encode("utf-8"), "utf-8", False),
        (b"\xef\xbb\xbf" + text.encode("utf-8"), "utf-8", True),
        (b"\xff\xfe" + text.encode("utf-16-le"), "utf-16-le", True),
        (b"\xfe\xff" + text.encode("utf-16-be"), "utf-16-be", True),
        # the trap: UTF-16 ASCII bytes are VALID UTF-8
        (text.encode("utf-16-le"), "utf-16-le", False),
        (text.encode("utf-16-be"), "utf-16-be", False),
        ("café naïve".encode("utf-8"), "utf-8", False),
        ("café".encode("cp1252") + b" \x93quoted\x94", "cp1252", False),
        ("plain café".encode("latin-1"), "latin-1", False),
    ]
    for raw, enc, bom in cases:
        d = detect_encoding(raw)
        assert (d["encoding"], d["had_bom"]) == (enc, bom), raw[:16]
    assert detect_encoding(text.encode("utf-16-le"))["text"] == text

    # RFC 4180: embedded delimiter, doubled quote, embedded newline
    csv_text = 'a,"b,with ""q"" and\nnewline",c\r\n1,2,3\r\n'
    rows = parse_csv_rfc4180(csv_text)
    assert rows == [["a", 'b,with "q" and\nnewline', "c"],
                    ["1", "2", "3"]]
    with _pt.raises(ValueError, match="unterminated"):
        parse_csv_rfc4180('a,"open\n')

    for d in (",", ";", "\t", "|"):
        t = d.join(["name", "count"]) + "\n" + d.join(["x", "5"]) + "\n"
        got = sniff_csv_dialect(t)
        assert got["delimiter"] == d and got["has_header"]
    # no numeric signal anywhere -> no header claimed
    assert not sniff_csv_dialect("a,b\nc,d\n")["has_header"]


def test_parquet_nested_struct_and_null_reads():
    """Round-9: the reader's struct-nesting + NULL upgrade — dotted
    paths, definition levels at depth, null reassembly, ambiguity
    rejection, flat-file regression — against pyarrow-written files."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )

    n = 200
    add = [
        {"path": f"f{i}.parquet", "size": i * 10} if i % 3 else None
        for i in range(n)
    ]
    remove = [{"path": f"g{i}"} if i % 7 == 0 else None for i in range(n)]
    flat = [i if i % 4 else None for i in range(n)]
    t = pa.table({
        "add": pa.array(add, pa.struct(
            [("path", pa.string()), ("size", pa.int64())])),
        "remove": pa.array(remove, pa.struct([("path", pa.string())])),
        "flat": pa.array(flat, pa.int64()),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=61)
    p = buf.getvalue()
    assert read_parquet_column_full(p, "add.path") == [
        d["path"].encode() if d else None for d in add]
    assert read_parquet_column_full(p, "add.size") == [
        d["size"] if d else None for d in add]
    assert read_parquet_column_full(p, "flat") == flat
    with _pt.raises(ValueError, match="ambiguous"):
        read_parquet_column_full(p, "path")
    assert read_parquet_column_full(p, "size") == \
        read_parquet_column_full(p, "add.size")
    # lists stay an honest boundary
    t2 = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    buf2 = io.BytesIO()
    pq.write_table(t2, buf2)
    with _pt.raises(NotImplementedError, match="repeated"):
        read_parquet_column_full(buf2.getvalue(), "l.list.element")


def test_delta_checkpoint_replay_rules():
    """Round-9: checkpoint cold start — adds/protocol/metaData from
    the parquet rows, post-checkpoint commits folded, contiguity and
    one-action-per-row enforced."""
    import io
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.deltalog import (
        replay_delta_checkpoint,
    )

    add_t = pa.struct([("path", pa.string()), ("size", pa.int64()),
                       ("stats", pa.string())])
    rem_t = pa.struct([("path", pa.string())])
    meta_t = pa.struct([("schemaString", pa.string())])
    proto_t = pa.struct([("minReaderVersion", pa.int64()),
                         ("minWriterVersion", pa.int64())])

    def checkpoint(rows):
        t = pa.table({
            "add": pa.array([r.get("add") for r in rows], add_t),
            "remove": pa.array([r.get("remove") for r in rows], rem_t),
            "metaData": pa.array([r.get("metaData") for r in rows], meta_t),
            "protocol": pa.array([r.get("protocol") for r in rows], proto_t),
        })
        buf = io.BytesIO()
        pq.write_table(t, buf)
        return buf.getvalue()

    cp = checkpoint([
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"schemaString": json.dumps(
            {"fields": [{"name": "pk"}]})}},
        {"add": {"path": "a.parquet", "size": 100,
                 "stats": json.dumps({"numRecords": 10})}},
        {"add": {"path": "b.parquet", "size": 200,
                 "stats": json.dumps({"numRecords": 20})}},
        {"remove": {"path": "old.parquet"}},  # expired tombstone
    ])
    res = replay_delta_checkpoint(cp, 2, [
        (3, json.dumps({"remove": {"path": "a.parquet"}})),
        (4, json.dumps({"add": {"path": "c.parquet", "size": 300,
                                "stats": json.dumps({"numRecords": 30})}})),
    ])
    assert res["version"] == 4
    assert sorted(res["active_files"]) == ["b.parquet", "c.parquet"]
    assert res["total_rows"] == 50 and res["total_bytes"] == 500
    assert res["n_removed"] == 1 and res["protocol"] == (1, 2)
    assert res["schema_cols"] == ["pk"]

    # non-contiguous post-checkpoint commits
    with _pt.raises(ValueError, match="contiguous"):
        replay_delta_checkpoint(cp, 2, [(5, "{}")])
    # two actions in one checkpoint row
    bad = checkpoint([
        {"add": {"path": "x", "size": 1, "stats": None},
         "protocol": {"minReaderVersion": 1, "minWriterVersion": 1}},
    ])
    with _pt.raises(ValueError, match="exactly one action"):
        replay_delta_checkpoint(bad, 0, [])


def test_avro_arrays_and_iceberg_bounds_pruning():
    """Round-9: the Avro subset's ARRAY support (block framing,
    array-of-record, empty arrays, both codecs) and the manifest-
    bounds scan planner built on it — stat-less files always scan."""
    import json

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.avrofile import (
        encode_avro,
        parse_avro,
    )
    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        MANIFEST_LIST_V2_SCHEMA,
        MANIFEST_V2_SCHEMA,
        iceberg_scan_plan,
    )

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "pts", "type": {"type": "array", "items": {
            "type": "record", "name": "p", "fields": [
                {"name": "x", "type": "long"},
                {"name": "y", "type": "long"}]}}},
    ]}
    recs = [
        {"tags": ["a", "b", "c"], "pts": [{"x": 1, "y": 2}]},
        {"tags": [], "pts": []},
    ]
    for codec in ("null", "deflate"):
        assert parse_avro(
            encode_avro(recs, schema, codec=codec)
        )["records"] == recs
    with _pt.raises(NotImplementedError, match="array items"):
        encode_avro([], {"type": "record", "name": "r", "fields": [
            {"name": "m", "type": {"type": "array", "items": {
                "type": "array", "items": "long"}}}]})

    # maps (sorted deterministic bytes), enums, fixed
    s2 = {"type": "record", "name": "r2", "fields": [
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "k",
                                  "symbols": ["A", "B"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "f", "size": 3}},
    ]}
    recs2 = [{"props": {"b": 2, "a": 1}, "kind": "B", "fx": b"xyz"}]
    blob2 = encode_avro(recs2, s2)
    assert parse_avro(blob2)["records"] == [
        {"props": {"a": 1, "b": 2}, "kind": "B", "fx": b"xyz"}]
    assert blob2 == encode_avro(
        [{"props": {"a": 1, "b": 2}, "kind": "B", "fx": b"xyz"}], s2
    )  # key order canonicalized
    with _pt.raises(ValueError, match="enum symbol"):
        encode_avro([{"props": {}, "kind": "Z", "fx": b"xyz"}], s2)
    with _pt.raises(ValueError, match="fixed size"):
        encode_avro([{"props": {}, "kind": "A", "fx": b"x"}], s2)

    def entry(j, bounds):
        return {
            "status": 1, "snapshot_id": 7,
            "data_file": {
                "content": 0, "file_path": f"f{j}", "file_format": "PARQUET",
                "partition": {"dt": "d"}, "record_count": 10 + j,
                "file_size_in_bytes": 1, "column_bounds": bounds,
            },
        }

    m0 = encode_avro(
        [entry(0, [{"field_id": 1, "lo": 0, "hi": 99}]),
         entry(1, [{"field_id": 1, "lo": 100, "hi": 199}]),
         entry(2, []),  # no stats -> must scan
         entry(3, [{"field_id": 2, "lo": 0, "hi": 5}])],  # other column
        MANIFEST_V2_SCHEMA)
    files = {"meta/m0.avro": m0}
    files["meta/ml.avro"] = encode_avro([{
        "manifest_path": "meta/m0.avro", "manifest_length": len(m0),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "added_snapshot_id": 7, "added_files_count": 4,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": 46, "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }], MANIFEST_LIST_V2_SCHEMA)
    meta = json.dumps({
        "format-version": 2, "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "manifest-list": "meta/ml.avro"}],
    })
    plan = iceberg_scan_plan(meta, files, 1, 150, 160)
    # f1 intersects; f2 (no stats) and f3 (no bounds for col 1) scan
    assert (plan["scanned"], plan["skipped"]) == (3, 1)
    assert plan["scanned_rows"] == 11 + 12 + 13
    plan2 = iceberg_scan_plan(meta, files, 1, 500, 600)
    assert (plan2["scanned"], plan2["skipped"]) == (2, 2)


def test_avro_schema_resolution_rules():
    """Round-9: Avro spec Schema Resolution — aliases, promotions
    (incl. inside [null, T] unions), defaults, dropped fields, and
    every unresolvable shape rejected up front."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.avrofile import (
        encode_avro,
        resolve_avro,
    )

    v1 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "int"},
        {"name": "s", "type": "string"},
        {"name": "opt", "type": ["null", "int"]},
        {"name": "gone", "type": "double"},
    ]}
    recs = [
        {"id": 1, "s": "a", "opt": None, "gone": 9.0},
        {"id": 2, "s": "b", "opt": 7, "gone": 8.0},
    ]
    blob = encode_avro(recs, v1)

    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "key", "type": "long", "aliases": ["id"]},
        {"name": "s", "type": "bytes"},         # string -> bytes
        {"name": "opt", "type": ["null", "double"]},  # union promote
        {"name": "w", "type": "double", "default": 2.5},
    ]}
    got = resolve_avro(blob, v2)["records"]
    assert got == [
        {"key": 1, "s": b"a", "opt": None, "w": 2.5},
        {"key": 2, "s": b"b", "opt": 7.0, "w": 2.5},
    ]

    # required writer value fits a [null, T] reader union
    v3 = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": ["null", "long"]},
    ]}
    assert [r["id"] for r in resolve_avro(blob, v3)["records"]] == [1, 2]

    # missing field without default
    with _pt.raises(ValueError, match="no default"):
        resolve_avro(blob, {"type": "record", "name": "r", "fields": [
            {"name": "nope", "type": "int"}]})
    # illegal promotion (double -> int)
    with _pt.raises(ValueError, match="promote"):
        resolve_avro(blob, {"type": "record", "name": "r", "fields": [
            {"name": "gone", "type": "int"}]})
    # optional writer into required reader: fails on the null ROW
    v4 = {"type": "record", "name": "r", "fields": [
        {"name": "opt", "type": "long"}]}
    with _pt.raises(ValueError, match="requires a value"):
        resolve_avro(blob, v4)


def test_arrow_ipc_reader_vs_pyarrow():
    """Round-9: the zero-dep Arrow IPC stream reader vs pyarrow (the
    format's reference implementation) — 7 primitive types, nulls,
    multi-batch streams, plus framing/subset rejects."""
    import io
    import random

    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.arrowipc import (
        read_arrow_stream,
    )

    rnd = random.Random(2)
    n = 300
    cols = {
        "idx": pa.array([None if i % 7 == 0 else i for i in range(n)],
                        pa.int64()),
        "word": pa.array([f"w{i}" for i in range(n)], pa.string()),
        "flag": pa.array([bool(i % 3) if i % 11 else None
                          for i in range(n)], pa.bool_()),
        "score": pa.array([i * 0.5 if i % 5 else None for i in range(n)],
                          pa.float64()),
        "f32": pa.array([float(i) for i in range(n)], pa.float32()),
        "i8": pa.array([rnd.randrange(-128, 128) for _ in range(n)],
                       pa.int8()),
        "u32": pa.array([i * 3 for i in range(n)], pa.uint32()),
    }
    t = pa.table(cols)
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        for b in t.to_batches(max_chunksize=77):
            w.write_batch(b)
    got = read_arrow_stream(buf.getvalue())
    for name, arr in cols.items():
        assert got[name] == arr.to_pylist(), name

    # empty table, single batch
    buf2 = io.BytesIO()
    with ipc.new_stream(buf2, t.schema) as w:
        pass
    got2 = read_arrow_stream(buf2.getvalue())
    assert all(v == [] for v in got2.values())

    # rejects: truncation, garbage, dictionary encoding
    with _pt.raises(ValueError):
        read_arrow_stream(buf.getvalue()[: len(buf.getvalue()) // 3])
    with _pt.raises(ValueError):
        read_arrow_stream(b"\x00" * 32)
    d = pa.table({"s": pa.array(["a", "b", "a"]).dictionary_encode()})
    buf3 = io.BytesIO()
    with ipc.new_stream(buf3, d.schema) as w:
        w.write_table(d)
    with _pt.raises(NotImplementedError, match="dictionary"):
        read_arrow_stream(buf3.getvalue())


def test_roaring_portable_format():
    """Round-9: portable roaring — spec-layout byte vector, all three
    container kinds, chunk boundaries, the 64-bit wrapper, DV
    application, and corrupt rejects."""
    import random

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.roaring import (
        apply_delete_vector,
        roaring64_deserialize,
        roaring64_serialize,
        roaring_deserialize,
        roaring_serialize,
    )

    rnd = random.Random(3)
    cases = [
        [],
        [0],
        [65535, 65536],  # chunk boundary split
        list(range(1000, 1200)),  # run container
        sorted(rnd.sample(range(100000), 500)),  # array containers
        sorted(rnd.sample(range(70000), 60000)),  # bitmap containers
        sorted(set(range(5000)) | set(rnd.sample(range(1 << 31), 100))),
    ]
    for vals in cases:
        blob = roaring_serialize(vals)
        assert roaring_deserialize(blob) == sorted(set(vals))

    # exact spec layout: {1,2,3} = no-run cookie 12346, count 1,
    # key 0 / card-1 = 2, offset 16, three LE uint16 values
    blob = roaring_serialize([1, 2, 3])
    assert blob == (
        (12346).to_bytes(4, "little") + (1).to_bytes(4, "little")
        + (0).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(4, "little") + b"\x01\x00\x02\x00\x03\x00"
    )
    # run-cookie layout: a long run flips to cookie 12347 with flags
    run_blob = roaring_serialize(list(range(100, 400)))
    assert int.from_bytes(run_blob[0:2], "little") == 12347

    vals64 = [5, (1 << 33) + 7, (1 << 33) + 8, (1 << 40)]
    assert roaring64_deserialize(roaring64_serialize(vals64)) == vals64

    assert apply_delete_vector(
        list("abcdef"), roaring_serialize([1, 4])
    ) == ["a", "c", "d", "f"]
    with _pt.raises(ValueError, match="out of range"):
        apply_delete_vector(["a"], roaring_serialize([5]))
    for bad in (b"", b"\x00" * 8, blob[:10]):
        with _pt.raises(ValueError):
            roaring_deserialize(bad)
    with _pt.raises(ValueError, match="uint32"):
        roaring_serialize([1 << 33])


def test_json_schema_infer_lattice(spark):
    """Round-9: the type lattice on hand-planted conflicts —
    int+float -> DOUBLE, bool+string -> VARCHAR, NULL is the bottom,
    arrays of objects recurse, malformed rows quarantine as
    $ MALFORMED instead of failing the scan."""
    from dynamodb_to_datalake_project_spark.llm.jsoninfer import (
        infer_json_schema,
    )

    rows = [
        ("g1", '{"a": 1, "b": [{"x": true}], "c": null}'),
        ("g1", '{"a": 2.5, "b": [{"x": "yes"}], "c": 7}'),
        ("g1", '{"a": 3}'),
        ("g2", 'not json at all {'),
        ("g2", '{"a": "s"}'),
    ]
    df = spark.createDataFrame(rows, "src string, js string")
    got = {
        (r.grp, r.path): (r.n_present, r.n_types, r.merged_type)
        for r in infer_json_schema(df, "src", "js").collect()
    }
    assert got[("g1", "$.a")] == (3, 2, "DOUBLE")  # BIGINT+DOUBLE
    assert got[("g1", "$.b")] == (2, 1, "ARRAY")
    assert got[("g1", "$.b[*]")] == (2, 1, "OBJECT")
    assert got[("g1", "$.b[*].x")] == (2, 2, "VARCHAR")  # bool+str
    assert got[("g1", "$.c")] == (2, 2, "BIGINT")  # NULL is bottom
    assert got[("g1", "$")] == (3, 1, "OBJECT")
    assert got[("g2", "$")][2] in ("VARCHAR",)  # OBJECT+MALFORMED
    # element dedup: one row observes each array path once
    df2 = spark.createDataFrame(
        [("g", '{"t": ["a", "b", "c"]}')], "src string, js string"
    )
    got2 = {
        r.path: r.n_present
        for r in infer_json_schema(df2, "src", "js").collect()
    }
    assert got2["$.t[*]"] == 1


def test_iceberg_position_delete_read():
    """Round-9: Iceberg v2 merge-on-read — position-delete parquet
    files applied to data parquet files via content-routed Avro
    manifests, everything read by the zero-dep readers; every
    integrity violation the spec lets a reader catch, rejected."""
    import io
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.avrofile import encode_avro
    from dynamodb_to_datalake_project_spark.llm.tablemeta import (
        MANIFEST_LIST_V2_SCHEMA,
        MANIFEST_V2_SCHEMA,
        read_iceberg_with_deletes,
    )

    def pq_bytes(**cols):
        arrays = {}
        for k, v in cols.items():
            typ = (
                pa.int64()
                if v and isinstance(v[0], int)
                else pa.string()
            )
            arrays[k] = pa.array(v, typ)
        buf = io.BytesIO()
        pq.write_table(pa.table(arrays), buf)
        return buf.getvalue()

    words0 = [f"a{i}" for i in range(10)]
    words1 = [f"b{i}" for i in range(7)]
    del_rows = [("data/f0.parquet", 2), ("data/f0.parquet", 5),
                ("data/f1.parquet", 0)]

    def build(del_rows, f0_count=10, unsorted=False, content=1):
        files = {
            "data/f0.parquet": pq_bytes(word=words0),
            "data/f1.parquet": pq_bytes(word=words1),
            "data/del.parquet": pq_bytes(
                file_path=[r[0] for r in del_rows],
                pos=[r[1] for r in del_rows],
            ),
        }
        def df(path, content, rec):
            return {
                "status": 1, "snapshot_id": 7,
                "data_file": {
                    "content": content, "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {"dt": "2024-01-01"},
                    "record_count": rec,
                    "file_size_in_bytes": len(files[path]),
                },
            }
        m0 = encode_avro(
            [df("data/f0.parquet", 0, f0_count),
             df("data/f1.parquet", 0, 7)], MANIFEST_V2_SCHEMA)
        m1 = encode_avro(
            [df("data/del.parquet", content, len(del_rows))],
            MANIFEST_V2_SCHEMA)
        files["meta/m0.avro"] = m0
        files["meta/m1.avro"] = m1
        def ml(path, content, blob):
            return {
                "manifest_path": path, "manifest_length": len(blob),
                "partition_spec_id": 0, "content": content,
                "sequence_number": 1 if content == 0 else 2,
                "added_snapshot_id": 7, "added_files_count": 1,
                "existing_files_count": 0, "deleted_files_count": 0,
                "added_rows_count": 0, "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        files["meta/ml.avro"] = encode_avro(
            [ml("meta/m0.avro", 0, m0), ml("meta/m1.avro", content, m1)],
            MANIFEST_LIST_V2_SCHEMA)
        meta = {
            "format-version": 2, "current-snapshot-id": 7,
            "snapshots": [
                {"snapshot-id": 7, "manifest-list": "meta/ml.avro"}],
        }
        return json.dumps(meta), files

    meta, files = build(del_rows)
    got = read_iceberg_with_deletes(meta, files, "word")
    assert [w.decode() for w in got["data/f0.parquet"]] == [
        w for i, w in enumerate(words0) if i not in (2, 5)]
    assert [w.decode() for w in got["data/f1.parquet"]] == words1[1:]

    # record_count that disagrees with the parquet footer
    meta, files = build(del_rows, f0_count=11)
    with _pt.raises(ValueError, match="manifest\n? *says|rows, manifest"):
        read_iceberg_with_deletes(meta, files, "word")
    # out-of-range position
    meta, files = build([("data/f0.parquet", 99)])
    with _pt.raises(ValueError, match="out of range"):
        read_iceberg_with_deletes(meta, files, "word")
    # dangling file reference
    meta, files = build([("data/nope.parquet", 0)])
    with _pt.raises(ValueError, match="unknown file"):
        read_iceberg_with_deletes(meta, files, "word")
    # unsorted delete file
    meta, files = build([("data/f0.parquet", 5), ("data/f0.parquet", 2)])
    with _pt.raises(ValueError, match="not sorted"):
        read_iceberg_with_deletes(meta, files, "word")
    # equality deletes: values die in older files, survive in newer
    # ones (strict < rule) — f0 is seq 1, f1 seq... both data files
    # share seq 1 here, the eq manifest is seq 2, so matches die in
    # both; a value absent from the table is a no-op
    meta, files = build([])
    files["data/eqdel.parquet"] = pq_bytes(word=["a3", "b2", "zz"])
    from dynamodb_to_datalake_project_spark.llm.avrofile import (
        parse_avro as _pa,
    )

    eq_entry = {
        "status": 1, "snapshot_id": 7,
        "data_file": {
            "content": 2, "file_path": "data/eqdel.parquet",
            "file_format": "PARQUET",
            "partition": {"dt": "2024-01-01"},
            "record_count": 3,
            "file_size_in_bytes": len(files["data/eqdel.parquet"]),
        },
    }
    m3 = encode_avro([eq_entry], MANIFEST_V2_SCHEMA)
    files["meta/m3.avro"] = m3
    ml_rows = _pa(files["meta/ml.avro"])["records"]
    ml_rows.append({
        "manifest_path": "meta/m3.avro", "manifest_length": len(m3),
        "partition_spec_id": 0, "content": 2, "sequence_number": 2,
        "added_snapshot_id": 7, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": 0, "existing_rows_count": 0,
        "deleted_rows_count": 0,
    })
    files["meta/ml.avro"] = encode_avro(ml_rows, MANIFEST_LIST_V2_SCHEMA)
    got = read_iceberg_with_deletes(meta, files, "word")
    assert [w.decode() for w in got["data/f0.parquet"]] == [
        w for w in words0 if w != "a3"]
    assert [w.decode() for w in got["data/f1.parquet"]] == [
        w for w in words1 if w != "b2"]


def test_tfrecord_crc_and_example_roundtrip():
    """CRC32C matches the published check value; TFRecord frames
    verify and reject corruption; tf.Example roundtrips bytes/int64/
    float features incl. negative ints and unpacked encodings."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.tfrecord import (
        crc32c,
        encode_tf_example,
        encode_tfrecord,
        parse_tf_example,
        parse_tfrecord,
    )

    # the canonical CRC-32C check value
    assert crc32c(b"123456789") == 0xE3069283

    exs = [
        encode_tf_example({"text": "hi", "idx": [0, 1, -5],
                           "score": [1.5, -0.25]}),
        encode_tf_example({"text": b"\x00\xff"}),
    ]
    shard = encode_tfrecord(exs)
    back = parse_tfrecord(shard)
    assert back == exs
    d = parse_tf_example(back[0])
    assert d["text"] == b"hi"
    assert d["idx"] == [0, 1, -5]
    assert d["score"] == [1.5, -0.25]

    corrupt = bytearray(shard)
    corrupt[14] ^= 0xFF  # inside the first record payload
    with _pt.raises(ValueError, match="data CRC"):
        parse_tfrecord(bytes(corrupt))
    with _pt.raises(ValueError, match="truncated"):
        parse_tfrecord(shard[:-2])

    # unpacked int64_list (legal alternative encoding): field 1,
    # wire 0 varints inside Int64List
    from dynamodb_to_datalake_project_spark.llm.tfrecord import (
        _pb_len,
        _pb_tag,
        _pb_varint,
    )

    unpacked = _pb_tag(1, 0) + _pb_varint(7) + _pb_tag(1, 0) + _pb_varint(9)
    feature = _pb_len(3, unpacked)
    entry = _pb_len(1, b"n") + _pb_len(2, feature)
    ex = _pb_len(1, _pb_len(1, entry))
    assert parse_tf_example(ex) == {"n": [7, 9]}


def test_safetensors_and_npy():
    """safetensors: roundtrip + every validation class (gapped
    offsets, span/dtype disagreement, overrun header, unknown dtype,
    half-precision value read); .npy: roundtrip incl. v1 header,
    fortran-order and byte-count rejects."""
    import json
    import struct

    import numpy as np
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.tensorfile import (
        encode_npy,
        encode_safetensors,
        parse_npy,
        parse_safetensors,
        read_safetensor,
    )

    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    st = encode_safetensors(
        {"w": ("F32", [3, 4], w.tobytes()),
         "b": ("I64", [3], np.array([1, 2, 3]).tobytes()),
         "h": ("F16", [2], b"\x00" * 4)},
        metadata={"k": "v"},
    )
    d = parse_safetensors(st)
    assert d["total_params"] == 12 + 3 + 2
    assert d["metadata"] == {"k": "v"}
    assert (read_safetensor(st, "w") == w).all()
    with _pt.raises(NotImplementedError, match="value read"):
        read_safetensor(st, "h")

    # gap: move b's offsets up by 8 without moving the data
    hdr_len = struct.unpack_from("<Q", st, 0)[0]
    hdr = json.loads(st[8 : 8 + hdr_len])
    hdr["b"]["data_offsets"] = [hdr["b"]["data_offsets"][0] + 8,
                                hdr["b"]["data_offsets"][1] + 8]
    bad = json.dumps(hdr, separators=(",", ":")).encode()
    with _pt.raises(ValueError, match="gaps|covered|range"):
        parse_safetensors(struct.pack("<Q", len(bad)) + bad
                          + st[8 + hdr_len:])
    with _pt.raises(ValueError, match="dtype\\*shape"):
        encode_safetensors({"x": ("F32", [5], b"\x00" * 4)})
    with _pt.raises(ValueError, match="header overruns"):
        parse_safetensors(struct.pack("<Q", 10 ** 6) + b"{}")

    a = np.arange(10, dtype=np.int64)
    npy = encode_npy(a)
    nd = parse_npy(npy)
    assert nd["shape"] == (10,) and (nd["values"] == a).all()
    assert np.load.__name__  # sanity: numpy itself reads our bytes
    import io

    assert (np.load(io.BytesIO(npy)) == a).all()
    with _pt.raises(ValueError, match="bad magic"):
        parse_npy(b"NOTNPY" + npy[6:])
    with _pt.raises(ValueError, match="header implies"):
        parse_npy(npy[:-4])
    f = npy.replace(b"'fortran_order': False", b"'fortran_order': True ")
    with _pt.raises(NotImplementedError, match="fortran"):
        parse_npy(f)


def test_kafka_batch_roundtrip_and_rejects():
    """v2 batch: null keys/values/header-values roundtrip, offsets and
    timestamps reconstruct from deltas, multi-batch segments walk;
    CRC corruption, magic != 2, compression bits, and framing drift
    raise."""
    import struct

    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.kafkabatch import (
        encode_kafka_batch,
        parse_kafka_batch,
        parse_kafka_segment,
    )

    recs = [
        {"key": b"k0", "value": b"v0", "ts_delta": 0,
         "headers": [("op", b"I")]},
        {"key": None, "value": None, "ts_delta": 5,
         "headers": [("op", b"D"), ("n", None)]},
    ]
    b = encode_kafka_batch(recs, base_offset=100,
                           base_timestamp=1_000_000)
    d = parse_kafka_batch(b)
    assert [r["offset"] for r in d["records"]] == [100, 101]
    assert d["records"][1]["timestamp"] == 1_000_005
    assert d["records"][1]["key"] is None
    assert d["records"][1]["headers"] == [("op", b"D"), ("n", None)]
    assert d["max_timestamp"] == 1_000_005

    seg = b + encode_kafka_batch(recs, base_offset=102)
    assert [x["base_offset"] for x in parse_kafka_segment(seg)] == [100, 102]

    corrupt = bytearray(b)
    corrupt[-1] ^= 0xFF
    with _pt.raises(ValueError, match="CRC32C"):
        parse_kafka_batch(bytes(corrupt))
    magic1 = bytearray(b)
    magic1[16] = 1
    with _pt.raises(NotImplementedError, match="magic 1"):
        parse_kafka_batch(bytes(magic1))
    # set a compression codec bit INSIDE the crc'd region, re-crc
    from dynamodb_to_datalake_project_spark.llm.tfrecord import crc32c

    gz = bytearray(b)
    struct.pack_into(">h", gz, 21, 1)  # attributes: gzip
    struct.pack_into(">I", gz, 17, crc32c(bytes(gz[21:])))
    with _pt.raises(NotImplementedError, match="compressed"):
        parse_kafka_batch(bytes(gz))


def test_orc_tail_vs_pyarrow():
    """The protobuf tail parse agrees with pyarrow's ORCFile on rows,
    stripes (multi-stripe at 5000 rows: 1024-row batches), field
    names and ZLIB tails; corrupt magic and truncation raise."""
    import io

    import pyarrow as pa
    import pytest as _pt
    from pyarrow import orc

    from dynamodb_to_datalake_project_spark.llm.orcmeta import (
        parse_orc_tail,
    )

    t = pa.table(
        {
            "idx": pa.array(range(5000), pa.int64()),
            "word": pa.array([f"w{i}" for i in range(5000)], pa.string()),
        }
    )
    for kw in ({}, {"stripe_size": 2048}, {"compression": "zlib"}):
        buf = io.BytesIO()
        orc.write_table(t, buf, **kw)
        d = parse_orc_tail(buf.getvalue())
        f = orc.ORCFile(io.BytesIO(buf.getvalue()))
        assert d["num_rows"] == f.nrows == 5000
        assert d["n_stripes"] == f.nstripes
        assert sum(d["stripe_rows"]) == 5000
        assert d["field_names"] == ["idx", "word"]
        assert d["column_kinds"] == ["STRUCT", "LONG", "STRING"]
        want = "NONE" if f.compression == "UNCOMPRESSED" else f.compression
        assert d["compression"] == want

    buf = io.BytesIO()
    orc.write_table(t, buf)
    good = buf.getvalue()
    with _pt.raises(ValueError, match="magic"):
        parse_orc_tail(good[:-4] + b"XXX" + good[-1:])
    with _pt.raises(ValueError, match="too short|postscript"):
        parse_orc_tail(b"OR")


def test_fleiss_kappa_known_values(spark):
    """Kappa on hand-checkable data: perfect agreement gives kappa 1;
    a two-category balanced random-ish table lands at the textbook
    value; unequal vote counts yield NULL p_bar (guard)."""
    from dynamodb_to_datalake_project_spark.llm.text import fleiss_kappa

    perfect = spark.createDataFrame(
        [(i, "x") for i in range(4) for _ in range(3)]
        + [(i, "y") for i in range(4, 8) for _ in range(3)],
        "item_id long, category string",
    )
    row = fleiss_kappa(perfect).collect()[0]
    assert row.p_bar == 1.0 and row.kappa == 1.0
    assert row.n_raters == 3

    ragged = spark.createDataFrame(
        [(0, "x"), (0, "x"), (1, "y")], "item_id long, category string"
    )
    assert fleiss_kappa(ragged).collect()[0].p_bar is None


def test_bradley_terry_recovers_order(spark):
    """BT on a dominance chain: item 2 beats 1 beats 0 consistently;
    estimated strengths must be strictly increasing in true skill,
    and strengths sum to 1."""
    from dynamodb_to_datalake_project_spark.llm.text import bradley_terry

    matches = []
    for _ in range(6):
        matches += [(1, 0, 1), (2, 1, 2), (2, 0, 2)]
    matches += [(0, 1, 0)]  # one upset so item 0 has a win
    df = spark.createDataFrame(matches, "a long, b long, winner long")
    got = {r.item_id: r for r in bradley_terry(df).collect()}
    assert got[0].strength < got[1].strength < got[2].strength
    assert abs(sum(r.strength for r in got.values()) - 1.0) < 1e-5
    assert got[2].n_wins == 12 and got[2].n_games == 12


def test_lz4_block_and_parquet_lz4_read():
    """Pure-Python LZ4 block decode: overlap-copy RLE, 255-extension
    lengths, malformed-stream rejects; the full parquet reader then
    reads LZ4_RAW files (plain + dictionary, multi row group) that
    pyarrow wrote, matching its values exactly."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        lz4_block_decompress,
        read_parquet_column_full,
    )

    # literal 'ab' + match(offset 2, len 6): token 0x22, lits, off LE
    blk = bytes([0x22]) + b"ab" + bytes([2, 0])
    assert lz4_block_decompress(blk, 8) == b"abababab"
    with _pt.raises(ValueError, match="offset out of range"):
        lz4_block_decompress(bytes([0x12]) + b"a" + bytes([9, 0]), 7)
    with _pt.raises(ValueError, match="page header says"):
        lz4_block_decompress(bytes([0x20]) + b"ab", 99)

    t = pa.table(
        {
            "a": pa.array(range(5000), pa.int64()),
            "s": pa.array([f"word{i % 37}" for i in range(5000)],
                          pa.string()),
        }
    )
    for dic in (False, True):
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="lz4", use_dictionary=dic,
                       row_group_size=1234)
        p = buf.getvalue()
        assert read_parquet_column_full(p, "a") == list(range(5000))
        assert read_parquet_column_full(p, "s")[40] == b"word3"


def test_parquet_gzip_pages():
    """GZIP codec (round-9): pyarrow-written gzip pages decode through
    the RFC 1952 member path, with and without dictionary encoding;
    malformed streams and size mismatches reject with ValueError."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        gzip_member_decompress,
        read_parquet_column_full,
    )

    import gzip as _gz

    body = b"page payload " * 50
    member = _gz.compress(body)
    assert gzip_member_decompress(member, len(body)) == body
    with _pt.raises(ValueError, match="malformed"):
        gzip_member_decompress(member[:-4], len(body))  # truncated CRC
    with _pt.raises(ValueError, match="malformed"):
        gzip_member_decompress(b"\x00" + member, len(body))  # bad magic
    with _pt.raises(ValueError, match="page header says"):
        gzip_member_decompress(member, len(body) + 1)

    t = pa.table(
        {
            "a": pa.array(range(5000), pa.int64()),
            "s": pa.array([f"word{i % 37}" for i in range(5000)],
                          pa.string()),
        }
    )
    for dic in (False, True):
        buf = io.BytesIO()
        pq.write_table(t, buf, compression="gzip", use_dictionary=dic,
                       row_group_size=1234)
        p = buf.getvalue()
        assert read_parquet_column_full(p, "a") == list(range(5000))
        assert read_parquet_column_full(p, "s")[40] == b"word3"


def test_cdc_chunks_properties():
    """Content-defined chunking: chunks reassemble exactly, an edit
    early in the buffer leaves later chunk boundaries aligned (the
    CDC selling point vs fixed-size blocks), short inputs yield one
    chunk, empty yields none."""
    from dynamodb_to_datalake_project_spark.llm.dedup import cdc_chunks

    base = ("the quick brown fox jumps over the lazy dog " * 30).encode()
    chunks = cdc_chunks(base)
    assert b"".join(chunks) == base
    assert len(chunks) > 1

    edited = b"XYZ" + base
    echunks = cdc_chunks(edited)
    assert b"".join(echunks) == edited
    # all boundaries after the edit point shift by exactly +3, i.e.
    # the CONTENT positions are stable (fixed-size blocks would
    # reshuffle everything)
    def cuts(cs):
        out, at = [], 0
        for c in cs[:-1]:
            at += len(c)
            out.append(at)
        return out

    tail_base = {c for c in cuts(chunks) if c > 32}
    tail_edit = {c - 3 for c in cuts(echunks) if c > 35}
    assert tail_base & tail_edit  # shared content-aligned boundaries

    assert cdc_chunks(b"short") == [b"short"]
    assert cdc_chunks(b"") == []


def test_linkage_em_stats_empty_doc(spark):
    """Round-10 advice fix: a document whose text splits to zero
    words used to raise ZeroDivisionError inside em_fit and fail the
    whole stage. It must instead yield the same sentinel row the
    DuckDB oracle produces (NULL parameters — DOUBLE 0/0 is NULL
    there — with n_pairs = 0, n_match_pred = 0)."""
    import duckdb
    import pandas as _pd

    from dynamodb_to_datalake_project_spark.llm.linkage import (
        _oracle_sql,
        linkage_em_stats,
    )

    pdf = _pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["alpha beta alpha gamma", "", "   "]}
    )
    docs = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r.asDict()
        for r in linkage_em_stats(docs).collect()
    }
    assert set(got) == {1, 2, 3}
    for did in (2, 3):
        row = got[did]
        assert all(row[c] is None for c in ("lam", "m1", "u3"))
        assert row["n_pairs"] == 0 and row["n_match_pred"] == 0

    con = duckdb.connect()
    con.register("documents", pdf)
    for doc_id, lam, m1, m2, m3, u1, u2, u3, n_pairs, pred in con.execute(
        _oracle_sql()
    ).fetchall():
        row = got[doc_id]
        assert row["n_pairs"] == n_pairs and row["n_match_pred"] == pred
        assert (row["lam"] is None) == (lam is None)
        if lam is not None:
            assert abs(row["lam"] - lam) == 0.0  # bit-identical


def test_roaring64_noncanonical_embedded_bitmaps():
    """Round-10 advice fix: roaring64_deserialize used to delimit
    each embedded 32-bit bitmap by canonical re-serialization, so a
    valid portable bitmap from a writer with different container
    choices (Java Roaring64NavigableMap without runOptimize emits an
    ARRAY where our runOptimize picks a RUN container) was rejected.
    The extent must come from cursor tracking instead."""
    from dynamodb_to_datalake_project_spark.llm.roaring import (
        roaring64_deserialize,
        roaring_serialize,
    )

    # 0..99 contiguous: our serializer picks a RUN container (6 bytes
    # beats a 200-byte array). Hand-write the ARRAY form a
    # no-runOptimize writer emits: NORUN cookie, 1 container,
    # key 0 / card-1 = 99, offset header, 100 LE uint16 values.
    vals = list(range(100))
    array_form = (
        (12346).to_bytes(4, "little")
        + (1).to_bytes(4, "little")
        + (0).to_bytes(2, "little")
        + (99).to_bytes(2, "little")
        + (16).to_bytes(4, "little")
        + b"".join(v.to_bytes(2, "little") for v in vals)
    )
    assert array_form != roaring_serialize(vals)  # truly non-canonical

    # two buckets, the second followed by nothing: both the embedded
    # extent AND the trailing-bytes check must hold
    blob = (
        (2).to_bytes(8, "little")
        + (0).to_bytes(4, "little") + array_form
        + (5).to_bytes(4, "little") + array_form
    )
    want = vals + [(5 << 32) | v for v in vals]
    assert roaring64_deserialize(blob) == want

    # truncated / trailing garbage still raise
    import pytest as _pt
    with _pt.raises(ValueError):
        roaring64_deserialize(blob + b"\x00")
    with _pt.raises(ValueError):
        roaring64_deserialize(blob[:-1])


def test_kll_rank_error_bound_and_merge():
    """Round-10: KLL sketch guarantees — (1) every quantile read from
    a compacted sketch is within the accumulated deterministic error
    bound of the exact rank; (2) the bound is far below n (the sketch
    is useful); (3) a UNION of two sketches is a valid sketch whose
    error is within the sum of the parts' bounds; (4) state stays
    near k*log(n/k), not n."""
    import random

    from dynamodb_to_datalake_project_spark.llm.sketch import (
        kll_build_values,
    )

    rnd = random.Random(10)
    n = 50_000
    data = [rnd.uniform(0, 1000) for _ in range(n)]
    items, bound = kll_build_values(data, k=256)
    assert bound < n * 0.05, f"bound {bound} too loose to be useful"
    assert len(items) < 256 * 12, f"state {len(items)} not bounded"
    assert sum(w for _, w in items) == n, "weight must be conserved"

    exact = sorted(data)

    def read(its, q):
        total = sum(w for _, w in its)
        rank = -(-int(q * total) // 1)
        cum = 0
        for v, w in sorted(its):
            cum += w
            if cum >= max(1, int(q * total + 0.999999)):
                return v
        return its and sorted(its)[-1][0]

    def true_rank(v):
        import bisect

        return bisect.bisect_right(exact, v)

    for q in (0.05, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = read(items, q)
        r = true_rank(est)
        target = q * n
        assert abs(r - target) <= bound + 1, (
            f"q={q}: rank {r} vs target {target}, bound {bound}"
        )

    # merge = union of parts; bound adds
    a_items, a_bound = kll_build_values(data[: n // 2], k=256)
    b_items, b_bound = kll_build_values(data[n // 2:], k=256)
    union = a_items + b_items
    for q in (0.25, 0.5, 0.9):
        est = read(union, q)
        r = true_rank(est)
        assert abs(r - q * n) <= a_bound + b_bound + 2


def test_kll_exact_config_is_partition_invariant(spark):
    """With k above every partition's row count the KLL pipeline
    never compacts: the read must be the exact rank quantile and
    identical under any repartitioning."""
    import random

    from dynamodb_to_datalake_project_spark.llm.sketch import (
        kll_quantile_read,
        kll_sketch_build,
    )

    rnd = random.Random(4)
    rows = [(rnd.uniform(0, 100),) for _ in range(2000)]
    df = spark.createDataFrame(rows, "value double")
    out = {}
    for parts in (3, 13):
        sk = kll_sketch_build(df.repartition(parts), "value", k=1 << 20)
        out[parts] = [
            (r.q, r.rank, r.est)
            for r in kll_quantile_read(sk, [0.1, 0.5, 0.9]).collect()
        ]
    assert out[3] == out[13]
    # exact check vs sorted data
    vals = sorted(v for (v,) in rows)
    for q, rank, est in out[3]:
        want = vals[max(0, -(-int(q * 2000)) - 1)]
        import math

        want = vals[math.ceil(q * 2000) - 1]
        assert est == want, (q, est, want)


def test_parquet_v2_write_matrix():
    """Round-10: DataPageV2 write parity — DELTA_BINARY_PACKED ints
    (negative deltas, multi-block, padded miniblocks),
    DELTA_LENGTH_BYTE_ARRAY strings, PLAIN doubles/bools, nullable
    column (uncompressed v2 levels, no length prefix), dictionary
    rotation, four codecs, multi row group — read back by BOTH
    pyarrow and the zero-dep reader, with pyarrow's metadata showing
    the delta encodings and DuckDB as a third reader."""
    import io
    import random

    import duckdb
    import pyarrow.parquet as pq

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        delta_binary_packed_encode,
        write_parquet,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _delta_binary_packed,
    )

    # encoder <-> own decoder on nasty int shapes
    cases = [
        [],
        [7],
        [0, 0, 0],
        list(range(1000)),
        [(-1) ** i * (i**3) for i in range(517)],  # sign-alternating
        [2**62, -(2**62), 0, 2**62 - 1],
        [random.Random(3).randrange(-(2**40), 2**40) for _ in range(129)],
    ]
    for vals in cases:
        enc = delta_binary_packed_encode(vals)
        got, _ = _delta_binary_packed(enc, 0, len(vals))
        assert got == vals

    rnd = random.Random(5)
    n = 1000
    cols = {
        "a": ("INT64", [rnd.randrange(-(10**12), 10**12) for _ in range(n)]),
        "b": ("INT32", [rnd.randrange(-50000, 50000) for _ in range(n)]),
        "s": ("BYTE_ARRAY", [f"word-{rnd.randrange(200)}" for _ in range(n)]),
        "d": ("DOUBLE", [rnd.uniform(-5, 5) for _ in range(n)]),
        "nl": ("INT64", [i if i % 7 else None for i in range(n)]),
        "bo": ("BOOLEAN", [bool(i % 3) for i in range(n)]),
    }
    for codec in ("UNCOMPRESSED", "SNAPPY", "ZSTD", "GZIP"):
        for dic in (False, True):
            blob = write_parquet(
                cols, codec=codec, row_group_size=300,
                dictionary=dic, page_version=2,
            )
            pf = pq.ParquetFile(io.BytesIO(blob))
            t = pf.read()
            for name, (pt, vals) in cols.items():
                assert t.column(name).to_pylist() == vals, (codec, dic, name)
                got = read_parquet_column_full(blob, name)
                if pt == "BYTE_ARRAY":
                    got = [g.decode() if g is not None else None for g in got]
                assert got == vals, (codec, dic, name, "own reader")
            if not dic:
                encs = pf.metadata.row_group(0).column(0).encodings
                assert "DELTA_BINARY_PACKED" in encs
    # DuckDB third-reader check on one representative file
    import tempfile

    blob = write_parquet(cols, codec="ZSTD", row_group_size=300,
                         dictionary=False, page_version=2)
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        f.write(blob)
        f.flush()
        got = duckdb.sql(
            f"SELECT sum(a), count(*), min(s), sum(CASE WHEN nl IS NULL "
            f"THEN 1 ELSE 0 END) FROM '{f.name}'"
        ).fetchone()
        assert got[0] == sum(cols["a"][1])
        assert got[1] == n
        assert got[2] == min(cols["s"][1])
        assert got[3] == sum(1 for v in cols["nl"][1] if v is None)


def test_parquet_v2_front_coded_and_bss_write():
    """Round-10 completion of the v2 write family: front-coded
    DELTA_BYTE_ARRAY strings (parquet-mr's real v2 default) and
    BYTE_STREAM_SPLIT floats/doubles, cross-read by pyarrow and the
    zero-dep reader, encodings pinned in the metadata."""
    import io
    import random
    import struct

    import pyarrow.parquet as pq

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        delta_byte_array_encode,
        write_parquet,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _delta_byte_array,
    )

    # encoder <-> own decoder on prefix-heavy shapes
    for vals in (
        [],
        [b"a"],
        [b"", b"", b"x"],
        sorted(f"common/prefix/{i // 7}/{i}".encode() for i in range(300)),
        [b"abc", b"abc", b"abcd", b"ab", b"zz"],
    ):
        enc = delta_byte_array_encode(vals)
        got, _ = _delta_byte_array(enc, 0, len(vals))
        assert got == vals

    rnd = random.Random(11)
    n = 600
    floats = [struct.unpack("<f", struct.pack("<f", rnd.uniform(-9, 9)))[0]
              for _ in range(n)]
    cols = {
        "s": ("BYTE_ARRAY",
              sorted(f"shared-stem-{rnd.randrange(40)}-{i}" for i in range(n))),
        "f": ("FLOAT", floats),
        "d": ("DOUBLE", [rnd.uniform(-9, 9) for _ in range(n)]),
        "nd": ("DOUBLE", [float(i) if i % 5 else None for i in range(n)]),
    }
    blob = write_parquet(
        cols, codec="SNAPPY", row_group_size=200,
        page_version=2, v2_byte_array="delta",
    )
    pf = pq.ParquetFile(io.BytesIO(blob))
    t = pf.read()
    for name, (pt, vals) in cols.items():
        assert t.column(name).to_pylist() == vals, name
        got = read_parquet_column_full(blob, name)
        if pt == "BYTE_ARRAY":
            got = [g.decode() for g in got]
        assert got == vals, (name, "own reader")
    md = pf.metadata.row_group(0)
    names = [md.column(i).path_in_schema for i in range(md.num_columns)]
    encs = {names[i]: md.column(i).encodings for i in range(md.num_columns)}
    assert "DELTA_BYTE_ARRAY" in encs["s"]
    assert "BYTE_STREAM_SPLIT" in encs["f"]
    assert "BYTE_STREAM_SPLIT" in encs["nd"]


def test_bitext_ann_recall(spark):
    """The LSH shortlist bitext path vs the broadcast bruteforce on
    the real embeddings fixture: (a) the lossless n_planes=0 config
    equals bitext_mine EXACTLY; (b) the banded 8x6 config recovers
    every planted identical-vector pair (identical vectors collide in
    every table by construction) and >= 90% of all bruteforce pairs."""
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.similarity import (
        as_double_vec,
        bitext_mine,
        bitext_mine_ann,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    e = emb.select("vec_id", as_double_vec("embedding").alias("v"))
    t = e.select(
        "vec_id",
        F.when(F.col("vec_id") % 3 == 0, F.col("v"))
        .otherwise(F.reverse(F.col("v")))
        .alias("v"),
    )
    exact = {
        (r.src_id, r.tgt_id, r.cos_ppm, r.margin_ppm)
        for r in bitext_mine(e, t, k=4).collect()
    }
    lossless = {
        (r.src_id, r.tgt_id, r.cos_ppm, r.margin_ppm)
        for r in bitext_mine_ann(
            e, t, dim=64, k=4, n_planes=0, n_tables=1
        ).collect()
    }
    assert lossless == exact

    banded = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine_ann(
            e, t, dim=64, k=4, n_planes=8, n_tables=6
        ).collect()
    }
    planted = {
        (s, g) for s, g, _c, _m in exact if s == g and s % 3 == 0
    }
    assert planted <= banded, "identical-vector pairs must never drop"
    # the LSH envelope: recall is a function of pair cosine — pairs
    # at translation-grade similarity are recovered essentially
    # completely; the near-noise-floor mutual pairs (cos ~0.35 on
    # this fixture: reversed-vector decoys that are 'best' only
    # relatively) are what banding trades away. Measured on this
    # fixture: 1.000 at cos>=0.8, 0.994 at >=0.6, 0.647 overall.
    def recall_at(thr):
        sub = {(s, g) for s, g, c, _m in exact if c >= thr}
        return len(sub & banded) / max(1, len(sub))

    assert recall_at(800_000) == 1.0
    assert recall_at(600_000) >= 0.95
    assert recall_at(0) >= 0.5
