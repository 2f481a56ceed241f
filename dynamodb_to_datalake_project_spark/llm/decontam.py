"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap, scaled here to 4-grams for the short synthetic docs):
any training document that shares at least one distinct n-gram with the
benchmark is contaminated and reported with its overlap count.

Scale shape: both sides reduce to DISTINCT n-grams before the join —
the train side per-document (array_distinct inside the row, before the
explode, so duplicate shingles never hit the shuffle), the benchmark
side globally. The join is a plain equi-join on the n-gram string;
benchmark n-gram sets are small (benchmarks are thousands of docs, not
billions) so AQE converts it to a broadcast at runtime — no forced
broadcast hint (an unbounded hint OOMs if someone passes a huge
"benchmark"). One shuffle keyed by doc_id aggregates overlap counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import tokens


def doc_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ngram) with per-document DISTINCT word n-grams; documents
    shorter than n tokens emit nothing."""
    tk = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__tk")).filter(
        F.size("__tk") >= n
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("__tk", i, n)),
        )
    )
    return tk.select(id_col, F.explode(grams).alias("ngram"))


def decontaminate(
    train: DataFrame, benchmark: DataFrame, id_col: str, text_col: str, n: int = 4
) -> DataFrame:
    """(id, n_shared) for every training doc sharing ≥1 distinct
    n-gram with the benchmark corpus."""
    train_g = doc_ngrams(train, id_col, text_col, n)
    bench_g = doc_ngrams(benchmark, id_col, text_col, n).select("ngram").distinct()
    return (
        train_g.join(bench_g, "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


#: shared by the exact and bloom-prefiltered variants — the bloom
#: sketch only prunes (exact confirmation follows), so both emit
#: identical rows.
ORACLE_NGRAMS = """
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' ')
             ))) AS ngram
      FROM tk WHERE len(tk) >= 4
    ), bench AS (
      SELECT DISTINCT ngram FROM g WHERE source = 'src0'
    )
    SELECT g.doc_id, count(*) AS n_shared
    FROM g JOIN bench USING (ngram)
    WHERE g.source <> 'src0'
    GROUP BY g.doc_id
    """


@query("decontaminate_ngrams", oracle=ORACLE_NGRAMS)
def q_decontaminate(spark, sf_dir):
    """Decontamination sweep: `src0` documents stand in for the
    benchmark; every other document is reported with its count of
    distinct 4-grams that also occur anywhere in the benchmark."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontaminate(train, bench, "doc_id", "text", n=4)


@query(
    "decontaminate_exact_substring",
    oracle="""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), needles AS (
      SELECT DISTINCT array_to_string(tk[1:5], ' ') AS needle
      FROM tk WHERE source = 'src0' AND len(tk) >= 5
    )
    SELECT d.doc_id, CAST(count(DISTINCT n.needle) AS BIGINT) AS n_hits
    FROM (
      SELECT doc_id, source,
             array_to_string(list_filter(string_split(text, ' '), x -> x <> ''),
                             ' ') AS norm_text
      FROM documents
    ) d JOIN needles n
      ON contains(' ' || d.norm_text || ' ', ' ' || n.needle || ' ')
    WHERE d.source <> 'src0'
    GROUP BY d.doc_id
    """,
)
def q_decontaminate_exact_substring(spark, sf_dir):
    """Exact-substring decontamination — the third contamination mode
    real eval hygiene runs alongside n-gram overlap and bloom
    prefiltering: a training document is contaminated if a benchmark
    NEEDLE (here each src0 document's leading 5-token phrase) appears
    verbatim, token-boundary-anchored, anywhere in its text.

    Spark-first equivalence: boundary-anchored substring containment
    of a 5-token needle in the WHITESPACE-NORMALIZED text == one of
    the document's token 5-grams equals the needle — so the plan is a
    pure 5-gram EQUI-JOIN against the broadcast needle set (per-doc
    distinct grams bound the explode; no contains() scan, no cross
    join; candidates shuffle on the gram key). The DuckDB oracle
    deliberately uses the OTHER formulation — string `contains` with
    boundary padding over the token-rejoined text (normalization
    makes the equivalence hold under irregular whitespace too) — so
    the hash match proves the two are equivalent, not just
    mirrored."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        "source",
        F.filter(F.split("text", " "), lambda x: x != "").alias("tk"),
    )
    needles = (
        tk.filter((F.col("source") == "src0") & (F.size("tk") >= 5))
        .select(F.concat_ws(" ", F.slice("tk", 1, 5)).alias("needle"))
        .distinct()
    )
    train = tk.filter(F.col("source") != "src0").filter(F.size("tk") >= 5)
    grams = train.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 4),
                    lambda i: F.concat_ws(" ", F.slice("tk", i, 5)),
                )
            )
        ).alias("needle"),
    )
    return (
        grams.join(F.broadcast(needles), "needle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: for benchmark sets too large to
# broadcast EXACTLY (100M+ n-grams), a fixed-size bit sketch still
# broadcasts. The sketch only PRUNES; an exact join confirms every
# candidate, so output is identical to `decontaminate` (same oracle).
# ---------------------------------------------------------------------------


def build_bloom(hashes: DataFrame, m_bits: int = 1 << 23, k: int = 4) -> bytes:
    """OR-merge per-partition Bloom bitmaps over a column pair
    (`h1`,`h2`) of xxhash64 values (double hashing: bit_i = h1 + i*h2).

    Distribution shape: each partition builds ONE m_bits-wide bitmap in
    numpy (mapInPandas, Arrow batches) and emits a single binary row;
    the driver ORs n_partitions bitmaps. Driver traffic is
    n_partitions × m_bits/8 bytes — bounded by the sketch size chosen,
    never by the data. (Spark's own bloom_filter_agg is not exposed to
    SQL/PySpark, hence the explicit two-level build.)"""
    n_words = (m_bits + 63) // 64

    def make(batches):
        bitmap = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bitmap, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = hashes.mapInPandas(make, schema="bitmap binary").collect()
    merged = np.zeros(n_words, dtype=np.uint64)
    for row in parts:
        merged |= np.frombuffer(row.bitmap, dtype=np.uint64)
    return merged.tobytes()


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> DataFrame:
    """`decontaminate` with a Bloom pre-filter on the training side.

    At 100 TB the benchmark n-gram set can exceed any broadcast-hash
    budget while its BLOOM SKETCH stays ~m_bits/8 bytes regardless of
    item count. Train-side shingles are hashed JVM-side (xxhash64 ×2
    for double hashing), probed against the broadcast bitmap by a
    vectorized numpy lookup (Arrow batches, no string ever crosses to
    Python), and only surviving candidates — true matches plus the
    sketch's ~(1-e^{-kn/m})^k false positives — reach the exact
    equi-join verify. Output is therefore IDENTICAL to the exact
    operator; the sketch only cuts the shuffle volume of the join to
    candidates."""
    from pyspark.sql.functions import pandas_udf

    spark = train.sparkSession
    bench_g = doc_ngrams(benchmark, id_col, text_col, n).select("ngram").distinct()
    bloom = build_bloom(
        bench_g.select(
            F.xxhash64("ngram").alias("h1"),
            F.xxhash64("ngram", F.lit(1)).alias("h2"),
        ),
        m_bits=m_bits,
        k=k,
    )
    bc = spark.sparkContext.broadcast(bloom)

    @pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint64)
        a = h1.to_numpy(dtype=np.int64).astype(np.uint64)
        b = h2.to_numpy(dtype=np.int64).astype(np.uint64)
        hit = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(hit)

    train_g = doc_ngrams(train, id_col, text_col, n)
    cand = train_g.filter(
        might_contain(F.xxhash64("ngram"), F.xxhash64("ngram", F.lit(1)))
    )
    return (
        cand.join(bench_g, "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


@query("decontaminate_bloom", oracle=ORACLE_NGRAMS)
def q_decontaminate_bloom(spark, sf_dir):
    """Bloom-prefiltered decontamination sweep — same semantics (and
    oracle) as `decontaminate_ngrams`; the sketch is a pure pruning
    layer with exact confirmation."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return decontaminate_bloom(train, bench, "doc_id", "text", n=4)


@query(
    "source_overlap_matrix",
    oracle="""
    WITH t AS (
      SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ), g AS (
      SELECT DISTINCT source, gram FROM (
        SELECT source,
               unnest(list_distinct(list_transform(range(1, len(tk) - 3),
                      i -> array_to_string(array_slice(tk, i, i + 4), ' ')))) AS gram
        FROM t WHERE len(tk) >= 5
      )
    ), tot AS (
      SELECT source, count(*) AS n FROM g GROUP BY source
    ), pr AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT pr.src_a, pr.src_b,
           CAST(pr.shared AS BIGINT) AS shared_grams,
           CAST(ta.n AS BIGINT) AS grams_a,
           CAST(tb.n AS BIGINT) AS grams_b,
           round(CAST(pr.shared AS DOUBLE) / least(ta.n, tb.n), 6)
             AS containment
    FROM pr
    JOIN tot ta ON ta.source = pr.src_a
    JOIN tot tb ON tb.source = pr.src_b
    ORDER BY pr.src_a, pr.src_b
    """,
)
def q_source_overlap_matrix(spark, sf_dir):
    """Catalog entry for `source_overlap_matrix` (see that function for
    the full design discussion)."""
    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(docs)


def source_overlap_matrix(
    docs: DataFrame, n: int = 5, stage_threshold_bytes: int = 256 << 20
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, how many distinct n-grams they share and the containment
    ratio shared/min(|A|,|B|) — the diagnostic that tells a curation
    pipeline which feeds are mirrors/scrapes of each other BEFORE
    document-level dedup spends a corpus-wide pass (cf. the per-pair
    analysis decontamination runs train-vs-benchmark, here
    source-vs-source).

    Scale shape: reduce to DISTINCT (source, gram) first (bounded by
    vocabulary, not corpus rows), then within-gram pair expansion via
    the bucket walk (`_bucket_pairs`). The expansion runs UNCAPPED
    here, unlike the doc-dedup callers: the frame is distinct
    (source, gram), so a gram-bucket is bounded by SOURCE CARDINALITY
    by construction — at most sources² pairs per gram, and the matrix
    must count every shared gram to be exact (a cap would silently
    undercount `shared_grams` for grams present in >cap sources,
    diverging from the oracle). A run with pathologically many
    sources should pre-aggregate sources into families, or use
    `dedup.oversized_buckets(grams, ["ngram"], cap)` as the opt-in
    diagnostic — the cap is a knob for degenerate BLOCKING keys, and
    `source` is a true dimension, not a blocking key. Per-pair counts
    and the 20-row totals join are bounded-key aggregations.

    The distinct (source, gram) frame feeds TWO branches (totals, pair
    expansion) and n-gram sets are corpus-sized, so recomputing it per
    branch doubles the dominant cost at 100 TB. Gate (mirrors the AQE
    runtime-size pattern, driver-side and job-free): when Catalyst's
    optimizer ESTIMATE for the corpus input exceeds
    `stage_threshold_bytes`, the distinct frame is materialized once
    with `localCheckpoint` and both branches read that one
    materialization (plan shows a single `Scan ExistingRDD`); below
    the threshold — every bench/test scale — the frame stays lazy and
    the plan stays barrier-free. Pinned by
    `tests/test_llm.py::test_overlap_matrix_staging_gate`."""
    from dynamodb_to_datalake_project_spark.llm.dedup import _bucket_pairs

    grams = doc_ngrams(docs, "source", "text", n).distinct()
    est = int(docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if est > stage_threshold_bytes:
        grams = grams.localCheckpoint(eager=True)
    tot = grams.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (
        _bucket_pairs(
            grams, ["ngram"], "source", max_bucket=2**31 - 1, dedup=False
        )
        .groupBy(F.col("a_id").alias("src_a"), F.col("b_id").alias("src_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(tot.select(F.col("source").alias("src_a"), F.col("n").alias("grams_a"))),
            "src_a",
        )
        .join(
            F.broadcast(tot.select(F.col("source").alias("src_b"), F.col("n").alias("grams_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("shared").cast("long").alias("shared_grams"),
            F.col("grams_a").cast("long").alias("grams_a"),
            F.col("grams_b").cast("long").alias("grams_b"),
            F.round(
                F.col("shared").cast("double") / F.least("grams_a", "grams_b"), 6
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )
